"""ClassGS: global-threshold k-mer classifier (ref ClassGS.c).

Per k-mer: count < T_EH -> E, < T_HD -> H, < T_DR -> D, else R.
Thresholds typically come from a GenomeScope model fit
(ref scripts/genomescope_thresholds.sh).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from classpro_tpu.io.classfile import ClassRecord, class_header
from classpro_tpu.io.fastk import open_profiles
from classpro_tpu.io.fastx import read_fastx

_LUT_STATES = np.frombuffer(b"EHDR", dtype=np.uint8)


def classify_gs_profile(profile: np.ndarray, thres: tuple[int, int, int]) -> str:
    """Vectorized threshold classification (ref ClassGS.c:236-245)."""
    t = np.asarray(thres)
    idx = (profile >= t[0]).astype(np.int8) + (profile >= t[1]) + (profile >= t[2])
    return _LUT_STATES[idx].tobytes().decode("ascii")


def classify_gs_file(fastx_path: str, fastk_root: str,
                     thres: tuple[int, int, int]) -> Iterator[ClassRecord]:
    P = open_profiles(fastk_root)
    K = P.kmer
    for rid, rec in enumerate(read_fastx(fastx_path)):
        prof = P.fetch(rid)
        classes = "N" * (K - 1) + classify_gs_profile(prof, thres)
        header = class_header(rec.name, rec.comment)
        yield ClassRecord(header, rec.seq, classes)


def genomescope_thresholds(gs_path: str) -> list[int]:
    """Count thresholds from a GenomeScope --fitted_hist output
    (exact translation of scripts/genomescope_thresholds.sh:8):

        awk -F',' 'prev != $1 {print NR-1} {prev = $1}' lookup_table.txt

    i.e. the 0-based line numbers of lookup_table.txt where the first
    comma-separated field (the maximum-likelihood component label)
    changes.  ``gs_path`` is the GenomeScope output directory or the
    lookup table itself.  The caller takes fields and adds one, as
    test/1-run.sh:26-31 does."""
    import os

    path = gs_path
    if os.path.isdir(path):
        path = os.path.join(path, "lookup_table.txt")
    out = []
    prev = ""   # awk: uninitialized prev compares as empty string
    with open(path) as f:
        for nr, line in enumerate(f):
            first = line.rstrip("\n").split(",")[0]
            if first != prev:
                out.append(nr)
            prev = first
    return out
