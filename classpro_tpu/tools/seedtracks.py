"""Seed-track consumers: ShowSeeds and RepDepAnno equivalents
(ref ShowSeeds.c, RepDepAnno.c).

Both read a classified DAZZ database whose `.class` track holds seed
codes (produced by `classify -s` on a .db/.dam, matching the reference's
ClassPro -s byte for byte):

* ``show_seeds`` prints one line per seed position —
  ``read_id\\tpos\\tclass\\tcount\\tkmer`` (ShowSeeds.c:176-182; read id
  is 1-based, count is the k-mer count at the seed, kmer lowercase).
* ``rep_dep_anno`` writes the ``.seed.anno/.seed.data`` track: for each
  seed position p, the pair (p-K+1, p) in read coordinates
  (RepDepAnno.c:197-219).
"""

from __future__ import annotations

from typing import TextIO

import numpy as np

from classpro_tpu.io.dazz import DazzDB, IntPairTrackWriter, read_track
from classpro_tpu.io.fastk import open_profiles

_CTOS = "ERHD"


def _uncompress(data: bytes, rlen: int) -> np.ndarray:
    packed = np.frombuffer(data, np.uint8)
    codes = np.empty(len(packed) * 4, np.uint8)
    codes[0::4] = (packed >> 6) & 3
    codes[1::4] = (packed >> 4) & 3
    codes[2::4] = (packed >> 2) & 3
    codes[3::4] = packed & 3
    return codes[:rlen]


def _iter_seed_codes(db: DazzDB, fastk_root: str):
    size, offs, data = read_track(db.root, "class")
    P = open_profiles(fastk_root)
    for rid in range(db.nreads):
        rlen = db.reads[rid].rlen
        codes = _uncompress(data[int(offs[rid]): int(offs[rid + 1])], rlen)
        yield rid, rlen, codes, P


def show_seeds(fastk_root: str, db_path: str, out: TextIO) -> None:
    db = DazzDB(db_path)
    for rid, rlen, codes, P in _iter_seed_codes(db, fastk_root):
        prof = P.fetch(rid)
        K = P.kmer
        seq = db.load_read(rid).lower()
        for p in np.nonzero(codes > 0)[0]:
            out.write(f"{rid + 1}\t{p}\t{_CTOS[codes[p]]}"
                      f"\t{prof[p - K + 1]}\t{seq[p - K + 1: p + 1]}\n")
    db.close()


def rep_dep_anno(fastk_root: str, db_path: str) -> int:
    """Write .seed.anno/.seed.data; returns total seed count."""
    db = DazzDB(db_path)
    tw = IntPairTrackWriter(db.root, "seed", db.nreads)
    total = 0
    for rid, rlen, codes, P in _iter_seed_codes(db, fastk_root):
        K = P.kmer
        pairs = [(int(p) - K + 1, int(p)) for p in np.nonzero(codes > 0)[0]]
        tw.add(pairs)
        total += len(pairs)
    tw.close()
    db.close()
    return total
