#!/usr/bin/env python3
"""Real-backend parity battery — run next to bench.py every round.

bench.py's `parity_ok` covers 64 reads of one fixture; this script is
the full-strength check on whatever backend the process gets (the live
TPU when the tunnel is up): the ENTIRE medium fixture vs its committed
reference golden, plus N randomized parity_fuzz datasets byte-compared
against the reference binary (/tmp/refbuild, tools/build_reference.py).
A Mosaic/axon numeric regression in the device ops (e.g. `_div_cr`'s
FMA-sensitive Dekker product, gather semantics) fails HERE, loudly,
instead of surfacing as an unexplained bench anomaly (VERDICT r2 #5).

Writes a JSON artifact (default TPU_PARITY.json) recording the
platform, per-dataset mismatch counts and the engine's exactness-guard
telemetry.

Usage: python3 tools/tpu_parity.py [--seeds 32] [--out TPU_PARITY.json]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import pathlib
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def classify_dataset(eng, root: str, seqs: list[str]) -> list[str]:
    """All reads of one dataset through the engine, chunked."""
    from classpro_tpu.io.fastk import open_profiles

    P = open_profiles(root)
    profs = [P.fetch(i) for i in range(P.nreads)]
    out: list[str] = []
    B = eng.batch_size
    for i in range(0, len(seqs), B):
        out.extend(eng.classify_chunk(seqs[i:i + B], profs[i:i + B]))
    return out


def ref_classes(class_path: str) -> list[str]:
    """Class strings (4th line per record) from a reference .class."""
    lines = pathlib.Path(class_path).read_text().split("\n")
    return [lines[4 * i + 3] for i in range(len(lines) // 4)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=32,
                    help="number of parity_fuzz datasets (0 = medium only)")
    ap.add_argument("--seed0", type=int, default=990000,
                    help="first fuzz seed (disjoint from the committed "
                         "corpus by default)")
    ap.add_argument("--out", default=str(REPO / "TPU_PARITY.json"))
    ap.add_argument("--ref", default="/tmp/refbuild/ClassPro")
    ap.add_argument("--extreme", action="store_true",
                    help="use the discrete-underflow-directed generator "
                         "(branch_probe._extreme_batch) for the fuzz "
                         "half: stresses the backend's emulated-f64 "
                         "exp/log behavior at the reference's "
                         "exp()-underflow kill lines end-to-end")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    platform = jax.devices()[0].platform

    from classpro_tpu.estimation import build_global_model
    from classpro_tpu.io.fastk import load_histogram
    from classpro_tpu.io.fastx import read_fastx
    from classpro_tpu.tpu.engine import TpuEngine

    rec: dict = {"platform": platform, "ts": time.time(),
                 "datasets": [], "ok": True}

    # ---- 1. full medium fixture vs committed reference golden ----------
    fx = REPO / "tests" / "fixtures" / "medium"
    gm = build_global_model(load_histogram(str(fx / "reads")))
    eng = TpuEngine(gm, batch_size=200)
    seqs = [r.seq for r in read_fastx(str(fx / "reads.fasta.gz"))]
    ours = classify_dataset(eng, str(fx / "reads"), seqs)
    golden = gzip.decompress(
        (fx / "golden.class.gz").read_bytes()).decode().split("\n")
    mism = sum(golden[4 * i + 3] != ours[i] for i in range(len(ours)))
    rec["datasets"].append({"name": "medium", "reads": len(ours),
                            "mismatches": mism})
    rec["guard_flagged_medium"] = int(eng.guard_flagged)
    print(f"medium: {len(ours)} reads, {mism} mismatches "
          f"[{platform}]", flush=True)
    rec["ok"] &= mism == 0

    # ---- 2. randomized fuzz datasets vs the reference binary -----------
    if args.seeds and not os.path.exists(args.ref):
        print(f"reference binary {args.ref} missing — run "
              f"tools/build_reference.py; skipping fuzz half", flush=True)
        rec["fuzz_skipped"] = "no reference binary"
    elif args.seeds:
        import tools.branch_probe as bp
        import tools.parity_fuzz as pf

        if args.extreme:
            pf._GEN = bp._extreme_batch
            rec["generator"] = "extreme"
        for seed in range(args.seed0, args.seed0 + args.seeds):
            d = f"/tmp/tpupar_{seed}"
            shutil.rmtree(d, ignore_errors=True)
            try:
                K, fname = pf.build(seed, d)
                subprocess.run([args.ref, "-T1", f"-P{d}", fname],
                               cwd=d, check=True, capture_output=True)
                ref = ref_classes(f"{d}/reads.class")
                gm_s = build_global_model(
                    load_histogram(f"{d}/reads"))
                eng_s = TpuEngine(gm_s, batch_size=200)
                seqs_s = [r.seq for r in
                          read_fastx(os.path.join(d, fname))]
                ours_s = classify_dataset(eng_s, f"{d}/reads", seqs_s)
                mism = sum(a != b for a, b in zip(ref, ours_s))
                mism += abs(len(ref) - len(ours_s))
                rec["datasets"].append(
                    {"name": f"fuzz{seed}", "reads": len(ours_s),
                     "mismatches": mism,
                     "guard_flagged": int(eng_s.guard_flagged)})
                print(f"fuzz seed {seed}: {len(ours_s)} reads, "
                      f"{mism} mismatches", flush=True)
                rec["ok"] &= mism == 0
            finally:
                shutil.rmtree(d, ignore_errors=True)

    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(("PARITY OK" if rec["ok"] else "*** PARITY FAILURES ***")
          + f" -> {args.out}", flush=True)
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
