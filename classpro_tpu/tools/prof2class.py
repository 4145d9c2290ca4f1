"""prof2class: ground truth from a relative profile (ref prof2class.c).

Given a *relative* FASTK profile (read k-mers counted against the complete
genome, i.e. ``FastK -p:<genome> <reads>``), map per-position genome count
0 -> E, 1 -> H, 2 -> D, >=3 -> R (prof2class.c:241-254).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from classpro_tpu.io.classfile import ClassRecord, class_header
from classpro_tpu.io.fastk import open_profiles
from classpro_tpu.io.fastx import read_fastx

_LUT = np.frombuffer(b"EHDR", dtype=np.uint8)


def truth_from_profile(profile: np.ndarray) -> str:
    idx = np.minimum(profile, 3).astype(np.int8)
    return _LUT[idx].tobytes().decode("ascii")


def prof2class_file(truth_prof_root: str, fastx_path: str) -> Iterator[ClassRecord]:
    P = open_profiles(truth_prof_root)
    K = P.kmer
    for rid, rec in enumerate(read_fastx(fastx_path)):
        prof = P.fetch(rid)
        classes = "N" * (K - 1) + truth_from_profile(prof)
        yield ClassRecord(class_header(rec.name, rec.comment), rec.seq, classes)
