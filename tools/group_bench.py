#!/usr/bin/env python3
"""Steady-state throughput sweep over grouped device dispatch.

Measures the production stream on the medium fixture for group sizes
G=1 (the default path) vs G>1 (rel_multi_dev: G chunks' rel DPs in one
device program — amortizes the platform's fixed per-execution cost if
tools/device_probe.py shows that cost is per-program).

Usage: python3 tools/group_bench.py [--groups 1,2,4] [--windows 3]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", default="1,2,4")
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--batch", type=int, default=200)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)

    from classpro_tpu.estimation import build_global_model
    from classpro_tpu.io.fastk import load_histogram, open_profiles
    from classpro_tpu.io.fastx import read_fastx
    from classpro_tpu.tpu.engine import TpuEngine

    fx = REPO / "tests" / "fixtures" / "medium"
    gm = build_global_model(load_histogram(str(fx / "reads")))
    P = open_profiles(str(fx / "reads"))
    reads = list(read_fastx(str(fx / "reads.fasta.gz")))
    profs = [P.fetch(i) for i in range(P.nreads)]
    seqs = [r.seq for r in reads]
    total = sum(len(p) for p in profs)
    golden = None

    for gs in args.groups.split(","):
        G = int(gs)
        eng = TpuEngine(gm, batch_size=args.batch, group=G)

        def run(reps: int):
            B = eng.batch_size
            chunks = ((seqs[i:i + B], profs[i:i + B])
                      for _ in range(reps)
                      for i in range(0, len(seqs), B))
            out = []
            for classes in eng.classify_stream(chunks):
                out.append(classes)
            return out

        out = run(1)                       # warm + correctness anchor
        flat = [c for ch in out for c in ch]
        if golden is None:
            golden = flat
        elif flat != golden:
            print(f"G={G}: OUTPUT MISMATCH vs G=1 — do not use")
            continue
        t0 = time.time()
        run(2)
        est = (time.time() - t0) / 2
        reps = max(2, int(round(4.0 / max(est, 1e-3))))
        rates = []
        for _ in range(args.windows):
            t0 = time.time()
            run(reps)
            rates.append(reps * total / (time.time() - t0))
        med = sorted(rates)[len(rates) // 2]
        print(f"G={G}: {med / 1e6:8.1f} Mk/s   "
              f"(windows: {', '.join(f'{r / 1e6:.1f}' for r in rates)})")


if __name__ == "__main__":
    main()
