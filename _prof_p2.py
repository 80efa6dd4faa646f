import time, sys
import numpy as np, jax, jax.numpy as jnp
from smalt_tpu.devcache import ensure_compile_cache
ensure_compile_cache()
from tests.test_device_pass2 import gen_case, default_matrix
from smalt_tpu.align.core import AliBand, BandError
from smalt_tpu.parallel.exact_pass2 import _swq_call

rng = np.random.default_rng(11)
matrix = default_matrix(); gi, ge = 4, 3
Qp, Sp, W = 128, 256, 2048
qa = np.full((W, Qp), 7, np.int32); sj = np.full((W, Sp), 7, np.int32)
par = np.zeros((W, 8), np.int32)
k = 0
while k < W:
    qlen, qalpha, subj, slen, cqs, cqe, bl, br, W8 = gen_case(rng, matrix, gi, ge)
    if slen > Sp or qlen > Qp: continue
    try: band = AliBand.make(bl, br, cqs, cqe, qlen, 0, slen-1, slen)
    except BandError: continue
    qa[k,:qlen]=qalpha; sj[k,:len(subj)]=subj
    par[k] = [band.l_edge, band.r_edge, band.q_left, band.q_len, band.s_len, 1, band.s_left, 0]
    k += 1
par_v = np.zeros((W, 8), np.int32)
par_v[:,0] = par[:,4]; par_v[:,1:5] = par[:,0:4]; par_v[:,5] = par[:,6]
sm = np.asarray([[gi, ge]], np.int32)
args = (jnp.asarray(qa), jnp.asarray(sj), jnp.asarray(par_v), jnp.asarray(matrix), jnp.asarray(sm))
for mode in (1, 0):
    t0=time.time()
    outs = [np.asarray(x) for x in _swq_call(*args, Sp, interpret=False, mode=mode)]
    tc = time.time()-t0
    t0=time.time()
    for _ in range(5):
        outs = [np.asarray(x) for x in _swq_call(*args, Sp, interpret=False, mode=mode)]
    dt=(time.time()-t0)/5
    print(f"mode={mode}: compile {tc:.0f}s warm {dt*1000:.1f} ms -> {W/dt:.0f} win/s", flush=True)
