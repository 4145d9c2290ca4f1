#!/usr/bin/env python3
"""Decision-margin sweep (VERDICT r1 item 7).

The production path evaluates Skellam/binomial terms through
interpolation tables whose error vs the C doubles is ~1e-9 (inside the
reference Bessel's own ~1e-7 truncation noise, tpu/skellam_dev.py).  A
classification flips only if some argmax margin is smaller than that
error.  This tool runs the EXACT oracle (f64, exact Bessel) over the
committed fixtures + crafted branch datasets, recording every argmax
margin |best - runner_up| in the reliable-interval DP and the
relaxation, and prints the distribution.  A minimum margin orders of
magnitude above 1e-7 is the safety argument; anything approaching it
would call for an exact-recompute fallback on near-ties.

Usage: python3 tools/margin_sweep.py          # ~2 min, CPU only
"""

from __future__ import annotations

import gzip
import math
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import classpro_tpu.exact.rel as relmod  # noqa: E402
import classpro_tpu.exact.unrel as unrelmod  # noqa: E402
from classpro_tpu.estimation import build_global_model  # noqa: E402
from classpro_tpu.exact.pipeline import ReadClassifier  # noqa: E402
from classpro_tpu.io.fastk import load_histogram, open_profiles  # noqa: E402
from classpro_tpu.io.fastx import read_fastx  # noqa: E402

FIX = os.path.join(REPO, "tests", "fixtures")


def sweep_dataset(d: str, limit: int | None = None) -> int:
    with tempfile.TemporaryDirectory() as td:
        for fn in os.listdir(d):
            p = os.path.join(d, fn)
            if fn == "reads.fasta.gz":
                shutil.copy(p, td)
            elif fn.endswith(".gz"):
                with gzip.open(p, "rb") as f:
                    open(os.path.join(td, fn[:-3]), "wb").write(f.read())
            else:
                shutil.copy(p, td)
        root = os.path.join(td, "reads")
        gm = build_global_model(load_histogram(root))
        P = open_profiles(root)
        rc = ReadClassifier(gm)
        fa = root + (".fasta.gz" if os.path.exists(root + ".fasta.gz")
                     else ".fasta")
        n = 0
        for rid, rec in enumerate(read_fastx(fa)):
            if limit is not None and rid >= limit:
                break
            prof = P.fetch(rid)
            if len(prof):
                rc.classify(rec.seq, prof)
            n += 1
        return n


def main() -> None:
    margins: list[float] = []
    relmod.MARGINS = margins
    unrelmod.MARGINS = margins

    datasets = [(os.path.join(FIX, "tiny"), None)]
    branch = os.path.join(FIX, "branch")
    for name in sorted(os.listdir(branch)):
        d = os.path.join(branch, name)
        if os.path.isdir(d):
            datasets.append((d, None))
    # CP_SWEEP_FULL=1: all 398 medium reads (the default 60 keeps the
    # committed quick run ~2 min; the full sweep backs COVERAGE.md)
    lim_med = None if os.environ.get("CP_SWEEP_FULL") == "1" else 60
    datasets.append((os.path.join(FIX, "medium"), lim_med))

    total_reads = 0
    for d, lim in datasets:
        total_reads += sweep_dataset(d, lim)
        print(f"{os.path.relpath(d, FIX)}: cumulative margins "
              f"{len(margins)}", file=sys.stderr)

    m = np.asarray(margins)
    m = m[np.isfinite(m)]
    nz = m[m > 0]
    print(f"reads swept: {total_reads}")
    print(f"margins recorded: {len(m)} (exact ties: {int((m == 0).sum())})")
    edges = [0, 1e-12, 1e-9, 1e-7, 1e-5, 1e-3, 1e-1, 1, 10, math.inf]
    hist, _ = np.histogram(nz, bins=edges)
    for lo, hi, c in zip(edges, edges[1:], hist):
        print(f"  ({lo:g}, {hi:g}]: {int(c)}")
    print(f"min nonzero margin: {nz.min():.3e}")
    print(f"p1/p50: {np.percentile(nz, 1):.3e} / {np.percentile(nz, 50):.3e}")


if __name__ == "__main__":
    main()
