"""Per-read classification pipeline and file driver (oracle path).

Mirrors kmer_class_thread (ClassPro.c:34-335): sequence context ->
profile fetch -> wall detection -> reliable intervals -> fw/bw DP ->
unreliable relaxation -> per-base class string.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from classpro_tpu.constants import DEFAULTS, STOC
from classpro_tpu.context import seq_context
from classpro_tpu.estimation import GlobalModel, build_global_model
from classpro_tpu.exact.rel import RelClassifier
from classpro_tpu.exact.unrel import UnrelClassifier
from classpro_tpu.exact.wall import WallFinder
from classpro_tpu.io.classfile import ClassRecord, class_header
from classpro_tpu.io.fastk import load_histogram, open_profiles
from classpro_tpu.io.fastx import read_fastx_checked


class ReadClassifier:
    """Holds the per-worker state (analog of one classification thread)."""

    def __init__(self, gm: GlobalModel):
        self.gm = gm
        self.wall = WallFinder(gm)
        self.rel = RelClassifier(gm)
        self.unrel = UnrelClassifier(gm)

    def classify(self, seq: str, profile: np.ndarray) -> str:
        """Return the per-base class string for one read (first K-1 = 'N')."""
        K = self.gm.kmer
        rlen = len(seq)
        if rlen != len(profile) + K - 1:
            raise ValueError(f"rlen ({rlen}) != plen+K-1 ({len(profile) + K - 1})")
        plen = len(profile)
        lctx, rctx = seq_context(seq.encode("ascii"))
        intvls = self.wall.find_wall(profile, lctx, rctx)
        rintvl = self.wall.find_rel_intvl(intvls)
        self.rel.classify(rintvl, intvls, plen)
        self.unrel.classify(intvls)
        out = np.empty(plen, dtype="U1")
        for I in intvls:
            out[I.b:I.e] = STOC[I.asgn]
        return "N" * (K - 1) + "".join(out)


def classify_read(seq: str, profile: np.ndarray, gm: GlobalModel) -> str:
    return ReadClassifier(gm).classify(seq, profile)


def classify_file(fastx_path: str, fastk_root: str, coverage: int = 0,
                  read_len: int = 20000,
                  model_path: str | None = None) -> Iterator[ClassRecord]:
    """End-to-end oracle driver: yields one ClassRecord per read, matching
    the reference's .class output record for record."""
    hist = load_histogram(fastk_root)
    gm = build_global_model(hist, coverage=coverage, read_len=read_len,
                            model_path=model_path)
    P = open_profiles(fastk_root)
    clf = ReadClassifier(gm)
    for rid, rec in enumerate(read_fastx_checked(fastx_path, DEFAULTS.max_read_len)):
        profile = P.fetch(rid)
        want = max(len(rec.seq) - gm.kmer + 1, 0)
        if len(profile) != want:   # ClassPro.c:184-187 rlen check
            raise ValueError(
                f"Read {rid}: rlen ({len(rec.seq)}) != plen+Km1 "
                f"({len(profile) + gm.kmer - 1}) — profile/read mismatch")
        classes = clf.classify(rec.seq, profile)
        header = class_header(rec.name, rec.comment)
        yield ClassRecord(header, rec.seq, classes)
