"""Real-TPU revalidation of the Pallas kernels' track mode.

The round-3 device-anchored fast tail (ops/sw.py track=True: short-read
full-matrix kernel AND the skewed-band long-read kernel) was committed
while the device tunnel was down, so its Mosaic compile + bit-parity on
real TPU hardware is the one unvalidated piece.  This script runs the
checks the interpret-mode tests pin (tests/test_sw_kernel.py,
tests/test_sw_band_kernel.py:111) on the live backend, using the
interpret-mode result as the oracle (the suite validates interpret mode
against the cell-by-cell numpy/C oracles), and prints ONE JSON line per
check plus a summary line.

Run it the moment the tunnel is back, BEFORE bench.py:
    timeout 1800 python tpu_validate.py
Self-test on the CPU backend (interpret vs interpret, exercises the
harness only):
    PYTHONPATH= JAX_PLATFORMS=cpu SMALT_VALIDATE_ALLOW_CPU=1 \\
        python tpu_validate.py
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    t0 = time.time()
    devs = jax.devices()
    backend = jax.default_backend()
    print(json.dumps({"check": "backend", "backend": backend,
                      "devices": len(devs),
                      "init_s": round(time.time() - t0, 1)}), flush=True)
    if backend != "tpu" and not os.environ.get("SMALT_VALIDATE_ALLOW_CPU"):
        print(json.dumps({"check": "FAIL", "why": "backend is not tpu"}))
        sys.exit(2)

    from smalt_tpu.ops.sw import (sw_score_batch, sw_band_score_batch,
                                  band_width_for)
    from smalt_tpu.align import core as ali

    m, go, ge = ali.make_score_matrix()
    m = np.asarray(m, np.int32)
    rng = np.random.default_rng(7)
    ok = True

    small = bool(os.environ.get("SMALT_VALIDATE_SMALL"))

    # --- short-read kernel, track mode (the fast-tail anchor path) ---
    B, Q, S = (8, 64, 128) if small else (64, 128, 256)
    qs = rng.integers(0, 4, (B, Q)).astype(np.int32)
    ss = rng.integers(0, 4, (B, S)).astype(np.int32)
    for b in range(B):        # plant noisy copies: real anchors dominate
        p = int(rng.integers(0, S - Q))
        ss[b, p:p + Q] = qs[b]
        for _ in range(4):
            ss[b, int(rng.integers(p, p + Q))] = int(rng.integers(0, 4))
    slens = np.full(B, S, np.int32)
    t0 = time.time()
    dev = [np.asarray(x) for x in sw_score_batch(
        qs, ss, slens, m, -go, -ge, track=True)]
    t_compile = time.time() - t0
    ora = [np.asarray(x) for x in sw_score_batch(
        qs, ss, slens, m, -go, -ge, interpret=True, track=True)]
    bad = int(sum(np.sum(d != o) for d, o in zip(dev, ora)))
    print(json.dumps({"check": "short_track_tpu", "B": B, "Q": Q, "S": S,
                      "mismatches": bad,
                      "compile_s": round(t_compile, 1)}), flush=True)
    ok &= bad == 0

    # --- banded kernel, track mode, long-read scale ---
    B, Q = (4, 256) if small else (8, 2048)
    pad = max(60, Q // 10)
    W = band_width_for(Q, pad)
    S = Q + 2 * pad
    qs = rng.integers(0, 4, (B, Q)).astype(np.int32)
    ss = rng.integers(0, 4, (B, S)).astype(np.int32)
    for b in range(B):
        ss[b, pad:pad + Q] = qs[b]
        for _ in range(Q // 12):
            ss[b, int(rng.integers(pad, pad + Q))] = int(rng.integers(0, 4))
    slens = np.full(B, S, np.int32)
    t0 = time.time()
    dev = [np.asarray(x) for x in sw_band_score_batch(
        qs, ss, slens, m, -go, -ge, pad, W, track=True)]
    t_band = time.time() - t0
    ora = [np.asarray(x) for x in sw_band_score_batch(
        qs, ss, slens, m, -go, -ge, pad, W, interpret=True, track=True)]
    band_bad = int(sum(np.sum(d != o) for d, o in zip(dev, ora)))
    # steady-state banded rate: timed with a HOST FETCH per repeat —
    # on the tunnel-attached backend block_until_ready returns before
    # the device finishes, so fetch-based timing is the honest clock.
    # Also record the batch-scaling curve: each dispatch costs ~100 ms
    # of tunnel latency whatever the batch, so the per-cell rate is a
    # property of the amortization, not the kernel.
    curve = {}
    for mult in (1, 16, 64, 128):
        qs_m = np.tile(qs, (mult, 1))
        ss_m = np.tile(ss, (mult, 1))
        sl_m = np.tile(slens, mult)
        _ = [np.asarray(x) for x in sw_band_score_batch(
            qs_m, ss_m, sl_m, m, -go, -ge, pad, W, track=True)]
        t0 = time.time()
        for _ in range(3):
            r = [np.asarray(x) for x in sw_band_score_batch(
                qs_m, ss_m, sl_m, m, -go, -ge, pad, W, track=True)]
        dt = (time.time() - t0) / 3
        curve[str(mult * B)] = {"ms": round(dt * 1e3, 0),
                                "gcups": round(
                                    mult * B * S * W / dt / 1e9, 2)}
    print(json.dumps({"check": "banded_track_tpu", "B": B, "Q": Q,
                      "W": W, "mismatches": band_bad,
                      "compile_s": round(t_band, 1),
                      "batch_curve": curve}), flush=True)
    ok &= band_bad == 0

    print(json.dumps({"check": "SUMMARY",
                      "result": "PASS" if ok else "FAIL"}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
