#!/usr/bin/env python3
"""Generate committed test fixtures (dev-time only).

Builds seeded synthetic datasets with classpro_tpu.tools.simulate, then runs
the *reference* ClassPro/ClassGS binaries (built from /root/reference/src
into /tmp/refbuild) to capture golden outputs.  Committed under
tests/fixtures/{tiny,medium}/ so the test suite never needs the C binary.

Files per fixture:
  reads.fasta.gz        input reads
  reads.hist            FASTK histogram (our writer)
  reads.prof, .reads.pidx.1, .reads.prof.1   FASTK profiles (our writer)
  reads.truth.class.gz  ground truth classes (prof2class semantics)
  golden.class.gz       reference ClassPro output (byte-identity target)
  golden.gs.class.gz    reference ClassGS output at fixed thresholds
  meta.json             config + reference-reported coverage estimates
"""

from __future__ import annotations

import gzip
import json
import os
import re
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from classpro_tpu.tools.simulate import SimConfig, generate_dataset  # noqa: E402

REF = "/tmp/refbuild"
FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

FIXTURES = {
    "tiny": SimConfig(seed=11, genome_len=30_000, coverage=30.0,
                      read_len_mean=4_000, read_len_sd=800, read_len_min=2_000),
    "medium": SimConfig(seed=7, genome_len=100_000, coverage=40.0,
                        read_len_mean=10_000, read_len_sd=2_000, read_len_min=3_000),
}

# ClassGS thresholds (E/H, H/D, D/R) per fixture, picked from histogram shape
GS_THRES = {"tiny": (6, 21, 41), "medium": (7, 28, 55)}


def gz(src: str, dst: str) -> None:
    with open(src, "rb") as f, open(dst, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as g:
            shutil.copyfileobj(f, g)


def main() -> None:
    for name, cfg in FIXTURES.items():
        work = f"/tmp/fixture_{name}"
        shutil.rmtree(work, ignore_errors=True)
        info = generate_dataset(work, cfg)
        print(name, info)

        r = subprocess.run(
            [f"{REF}/ClassPro", "-v", "-T1", f"-P{work}", "reads.fasta"],
            cwd=work, capture_output=True, text=True, check=True)
        est = re.search(r"Estimated \(H,D\) cov\s*=\s*\((\d+),(\d+)\)", r.stderr)
        rthres = re.search(r"Estimated R-threshold\s*=\s*(\d+)", r.stderr)
        hcov, dcov = int(est.group(1)), int(est.group(2))

        t = GS_THRES[name]
        subprocess.run(
            [f"{REF}/ClassGS", "reads", str(t[0]), str(t[1]), str(t[2])],
            cwd=work, capture_output=True, text=True, check=True)

        out = os.path.join(FIXDIR, name)
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out)
        gz(f"{work}/reads.fasta", f"{out}/reads.fasta.gz")
        for f in ["reads.hist", "reads.prof", ".reads.pidx.1", ".reads.prof.1"]:
            shutil.copy(f"{work}/{f}", f"{out}/{f}")
        gz(f"{work}/reads.truth.class", f"{out}/reads.truth.class.gz")
        gz(f"{work}/reads.class", f"{out}/golden.class.gz")
        gz(f"{work}/reads.GS.class", f"{out}/golden.gs.class.gz")
        meta = dict(config=cfg.__dict__, ref_hcov=hcov, ref_dcov=dcov,
                    ref_rthres=int(rthres.group(1)), gs_thres=t, **info)
        meta["root"] = None
        with open(f"{out}/meta.json", "w") as f:
            json.dump(meta, f, indent=1)
        print(f"  -> {out}: H={hcov} D={dcov}")


if __name__ == "__main__":
    main()
