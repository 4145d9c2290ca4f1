"""ClassGS: global-threshold k-mer classifier (ref ClassGS.c).

Per k-mer: count < T_EH -> E, < T_HD -> H, < T_DR -> D, else R.
Thresholds typically come from a GenomeScope model fit
(ref scripts/genomescope_thresholds.sh).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from classpro_tpu.io.classfile import ClassRecord
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
        header = f"@{rec.name} {rec.comment}"
        yield ClassRecord(header, rec.seq, classes)


def genomescope_thresholds(lookup_table_path: str) -> tuple[int, int, int]:
    """Extract E/H, H/D, D/R count thresholds from a GenomeScope
    lookup_table.txt (ref scripts/genomescope_thresholds.sh:8): the first
    count where the maximum-likelihood component switches 0->1, 1->2, 2->3+.
    """
    prev = 0
    out = []
    with open(lookup_table_path) as f:
        for line in f:
            parts = line.split()
            if not parts or not parts[0].isdigit():
                continue
            cnt = int(parts[0])
            comp = int(np.argmax([float(x) for x in parts[1:]]))
            while comp > prev and len(out) < 3:
                out.append(cnt)
                prev += 1
            if len(out) == 3:
                break
    if len(out) != 3:
        raise ValueError("could not extract 3 thresholds from lookup table")
    return tuple(out)  # type: ignore[return-value]
