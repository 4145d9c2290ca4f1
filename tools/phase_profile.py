#!/usr/bin/env python3
"""Per-phase timing of the production chunk path on the live backend.

Times each stage of TpuEngine's per-chunk work SERIALLY (no pipeline
overlap) over the medium fixture, so the cost of every phase is
attributable: wall stage (C++), rel pack (C++), device dispatch,
device wait + result fetch, fw/bw reconcile + exactness guard,
finish_batch (C++ relaxation + expansion), string decode.  Then runs
the real pipelined stream for the steady-state number the phases must
explain.

Usage: python3 tools/phase_profile.py [--batch 200] [--passes 5]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=200)
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--root", default=None,
                    help="dataset root (default: the medium fixture)")
    ap.add_argument("--nreads", type=int, default=0,
                    help="limit to the first N reads (0 = all)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)

    from classpro_tpu.estimation import build_global_model
    from classpro_tpu.io.fastk import load_histogram, open_profiles
    from classpro_tpu.io.fastx import read_fastx
    from classpro_tpu.tpu.device_pipeline import reconcile_fwbw
    from classpro_tpu.tpu.engine import TpuEngine

    root = args.root or str(REPO / "tests" / "fixtures" / "medium" /
                            "reads")
    gm = build_global_model(load_histogram(root))
    P = open_profiles(root)
    fa = root + (".fasta.gz" if pathlib.Path(root + ".fasta.gz").exists()
                 else ".fasta")
    n = P.nreads if args.nreads <= 0 else min(args.nreads, P.nreads)
    seqs = []
    for i, r in enumerate(read_fastx(fa)):
        if i >= n:
            break
        seqs.append(r.seq)
    profs = [P.fetch(i) for i in range(n)]
    total_kmers = sum(len(p) for p in profs)

    eng = TpuEngine(gm, batch_size=args.batch)
    B = eng.batch_size
    chunks = [(seqs[i:i + B], profs[i:i + B])
              for i in range(0, len(seqs), B)]

    # warm every shape bucket once (compile + first-execution penalty)
    for sq, pf in chunks:
        eng.classify_chunk(sq, pf)

    acc: dict[str, float] = {}
    nch = 0

    def tick(name, t0):
        t1 = time.perf_counter()
        acc[name] = acc.get(name, 0.0) + (t1 - t0)
        return t1

    for _ in range(args.passes):
        for sq, pf in chunks:
            nch += 1
            t = time.perf_counter()
            st = eng._stage(sq, pf)
            t = tick("wall_stage(C++)", t)
            if "_plens" not in st:
                continue
            fb, ib = eng._pack_st(st, st["_R"], st["_mm"])
            t = tick("pack_rel(C++)", t)
            out = eng._rel_exec(st["_R"], st["_mm"],
                                eng._next_device())(fb, ib)
            t = tick("dispatch", t)
            from classpro_tpu.tpu.device_pipeline import unpack_out
            v, risky, resc, mmh = unpack_out(np.asarray(out),
                                             st["max_m"])
            t = tick("device wait+fetch", t)
            from classpro_tpu.tpu.device_pipeline import demote_host
            v = demote_host(v, resc, st["rel_b"], st["rel_e"],
                            st["rel_ccb"], st["rel_cce"], st["rel_m"],
                            int(gm.cov[2]), int(gm.cov[3]))
            rel_out = reconcile_fwbw(v, st["rel_ccb"], st["rel_cce"],
                                     st["rel_m"])
            st["box"] = {"v": v, "mm": mmh, "risky": risky}
            eng._exact_guard(st, rel_out)
            t = tick("reconcile+guard", t)
            g, n = st["g"], len(st["g"])
            out_off = np.zeros(n + 1, np.int64)
            out_off[1:] = np.cumsum([len(sq[i]) for i in g])
            buf = eng.wall.finish_batch(st["slab"], st["slot"],
                                        st["n_out"], st["n_rel"], rel_out,
                                        st["max_m"], out_off,
                                        threads=eng.threads)
            if hasattr(eng.wall, "release_slab"):
                eng.wall.release_slab(st["slab"])
            t = tick("finish_batch(C++)", t)
            mv = memoryview(buf)
            res = [str(mv[out_off[r]: out_off[r + 1]], "ascii")
                   for r in range(n)]
            assert len(res) == n
            t = tick("str decode", t)

    tot = sum(acc.values())
    print(f"\nserial per-chunk phases ({nch} chunks, "
          f"{total_kmers * args.passes / 1e6:.1f} Mk):")
    for k, v in acc.items():
        print(f"  {k:20s}: {v / nch * 1e3:8.2f} ms/chunk "
              f"({100 * v / tot:4.1f}%)")
    print(f"  {'TOTAL':20s}: {tot / nch * 1e3:8.2f} ms/chunk "
          f"-> serial rate {total_kmers * args.passes / tot / 1e6:.1f} Mk/s")

    # the pipelined stream the phases must explain
    def stream_iter(reps):
        for _ in range(reps):
            for c in chunks:
                yield c

    for _ in eng.classify_stream(stream_iter(1)):  # warm stream path
        pass
    t0 = time.perf_counter()
    for _ in eng.classify_stream(stream_iter(args.passes)):
        pass
    dt = time.perf_counter() - t0
    print(f"pipelined stream        : {dt / (args.passes * len(chunks)) * 1e3:8.2f} "
          f"ms/chunk -> {total_kmers * args.passes / dt / 1e6:.1f} Mk/s")


if __name__ == "__main__":
    main()
