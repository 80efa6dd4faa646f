"""Per-batch breakdown of the --device-pass1 exact engine.

VERDICT r3 item 2: `--device-pass1` measured 0.40x the pure-C exact
lane it is supposed to accelerate.  This tool isolates where each
batch's wall clock goes so the loss can be pinned on a component:

  pass1_host   fl_pass1_block: seeding + collation + candidate state
  pad_reads    building the padded [batch, qcap] device read block
  dispatch     _score_windows call (async dispatch incl. H2D transfer)
  device_wait  block_until_ready on the score array (device compute +
               any synchronous transfer the tunnel imposes)
  fetch        np.asarray of the scores (D2H if not already resident)
  pass2_host   fl_pass2_block: score replay + exact pass-2 + SAM text

Also times the pure-C lane on the same corpus for the reference point,
and a device-only leg (same windows re-dispatched back to back) to
separate steady-state device throughput from per-dispatch latency.

Usage: python tools/diag_dp1.py [N_READS] [BATCH]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    os.environ["SMALT_DP1_BATCH"] = str(batch)

    import bench
    from smalt_tpu import rand
    from smalt_tpu.seq.refset import RefSet
    from smalt_tpu.index.table import build_index
    from smalt_tpu.map.engine import MapEngine, MapParams
    from smalt_tpu.map.fastlane import DevicePass1, codec_encode_bulk
    from smalt_tpu.map.fastmode import iter_fastq_batches
    import jax

    import sys as _s
    def log(m):
        print(f"# {m}", file=_s.stderr, flush=True)
    log("gen genome")
    rng = np.random.default_rng(123)
    genome = bench._gen_genome(rng)
    reads, _ = bench._gen_reads(rng, genome, n_reads)
    import tempfile
    d = tempfile.mkdtemp()
    fa = os.path.join(d, "ref.fa")
    with open(fa, "w") as f:
        f.write(">chr\n")
        for i in range(0, len(genome), 80):
            f.write(genome[i : i + 80] + "\n")
    fq = os.path.join(d, "reads.fq")
    with open(fq, "w") as f:
        for i, s in enumerate(reads):
            f.write(f"@x{i}\n{s}\n+\n{'5' * len(s)}\n")

    log("build index")
    refset = RefSet.from_fasta(fa)
    idx = build_index(refset, bench.KMER, bench.NSKIP)
    _ = idx.addrs
    log("index ready")

    rand.ranseed(1)
    eng = MapEngine(refset, idx, MapParams())
    dp1 = DevicePass1.make(eng, "sam", True, False, False, False,
                           batch=batch)
    assert dp1 is not None

    # ---- instrumented run (same logic as run_raw_fastq, no overlap) ----
    stats = {k: 0.0 for k in ("pass1_host", "pad_reads", "dispatch",
                              "device_wait", "fetch", "pass2_host")}
    nwin_total = 0
    nbatches = 0
    warm = True
    batches = list(iter_fastq_batches(fq, batch))
    out_parts = []
    t_all0 = time.time()
    for names, seqs, quals in batches:
        n = len(names)
        read_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum([len(s) for s in seqs], out=read_offs[1:])
        name_offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum([len(x) for x in names], out=name_offs[1:])
        qmax = int((read_offs[1:] - read_offs[:-1]).max())
        has_qual = np.ones(n, dtype=np.uint8)
        codes = np.frombuffer(b"".join(seqs), np.uint8)
        qarr = np.frombuffer(b"".join(quals), np.uint8)
        narr = np.frombuffer(b"".join(names), np.uint8)

        t0 = time.time()
        st = dp1._pass1(n, qmax, codes, read_offs, qarr, has_qual,
                        ascii_codes=True)
        t1 = time.time()
        state, state_offs, win_desc = st
        nwin_total += len(win_desc)
        fwd, qlens = dp1._padded_reads(
            np.frombuffer(codec_encode_bulk(codes), np.uint8),
            read_offs, n, qmax)
        t2 = time.time()
        scores, nw = dp1._score_windows(win_desc, fwd, qlens)
        t3 = time.time()
        scores.block_until_ready()
        t4 = time.time()
        sc_np = np.asarray(scores)[:nw]
        t5 = time.time()
        text = dp1._pass2(n, qmax, codes, read_offs, qarr, has_qual,
                          narr, name_offs, state, state_offs, sc_np,
                          ascii_codes=True, names_raw=True)
        t6 = time.time()
        log(f"batch n={n} p1={t1-t0:.2f} pad={t2-t1:.2f} disp={t3-t2:.2f} wait={t4-t3:.2f} fetch={t5-t4:.2f} p2={t6-t5:.2f}")
        out_parts.append(text)
        if warm:            # first batch pays the jit compile: drop it
            warm = False
            t_all0 = time.time()
            # re-run this batch timed (state must be rebuilt: pass2
            # consumed the RNG, so only stage times are re-recorded,
            # the text is NOT re-emitted)
            continue
        nbatches += 1
        stats["pass1_host"] += t1 - t0
        stats["pad_reads"] += t2 - t1
        stats["dispatch"] += t3 - t2
        stats["device_wait"] += t4 - t3
        stats["fetch"] += t5 - t4
        stats["pass2_host"] += t6 - t5
    wall = time.time() - t_all0
    n_timed = n_reads - batch  # minus warm batch

    # ---- pure-C lane on the same reads (warm) ----
    from smalt_tpu.map.pipeline import run_pipeline_raw_fastq
    import io
    rand.ranseed(1)
    eng2 = MapEngine(refset, idx, MapParams())
    log("pure-C lane")
    sink = io.StringIO()
    t0 = time.time()
    run_pipeline_raw_fastq(eng2, fq, sink, refset)
    c_wall = time.time() - t0

    # byte-parity sanity on the shared suffix is checked by bench.py;
    # here just confirm line counts match
    assert sum(len(p.splitlines()) for p in out_parts) == \
        len([l for l in sink.getvalue().splitlines()
             if not l.startswith("@")]) , "record count mismatch"

    # ---- device-only steady state: redispatch the LAST batch 5x ----
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        s, _nw = dp1._score_windows(win_desc, fwd, qlens)
    s.block_until_ready()
    dev_steady = (time.time() - t0) / reps

    out = {
        "n_reads": n_reads, "batch": batch,
        "nbatches_timed": nbatches,
        "windows_total": int(nwin_total),
        "windows_per_read": round(nwin_total / n_reads, 2),
        "stage_s_per_batch": {k: round(v / max(nbatches, 1), 4)
                              for k, v in stats.items()},
        "stage_pct": {k: round(100 * v / max(sum(stats.values()), 1e-9), 1)
                      for k, v in stats.items()},
        "dp1_serial_reads_per_s": round(n_timed / wall, 1),
        "pure_c_lane_reads_per_s": round(n_reads / c_wall, 1),
        "device_steady_s_per_batch": round(dev_steady, 4),
        "wcap": dp1._wcap, "scap": dp1._scap, "qcap": dp1._qcap,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
