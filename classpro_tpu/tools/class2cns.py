"""k-mer/class dump + naive consensus consistency (ref class2cns.c,
scripts/naive_consensus.sh, scripts/agg2cons.py).

``dump`` replicates class2cns.c:65-71: for every position i >= K-1 of
every read, print the k-mer substring ending at i and its class
character.  ``consistency`` replicates the whole naive_consensus.sh
pipeline in-process (sort | uniq -c | agg2cons.py): group identical
k-mer strings, take each group's most-common-class fraction, and report
the harmonic mean over distinct k-mers (agg2cons.py:7-31).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Iterator, TextIO

from classpro_tpu.io.classfile import read_class
from classpro_tpu.io.fastk import open_profiles


def dump(class_path: str, fastk_root: str, out: TextIO) -> None:
    """Write '<kmer> <class>' lines (class2cns.c:65-71 format)."""
    K = open_profiles(fastk_root).kmer
    for rec in read_class(class_path):
        seq, cls = rec.seq, rec.classes
        for i in range(K - 1, len(seq)):
            out.write(seq[i - K + 1: i + 1])
            out.write(" ")
            out.write(cls[i])
            out.write("\n")


def _kmer_class_pairs(class_path: str, K: int) -> Iterator[tuple[str, str]]:
    for rec in read_class(class_path):
        seq, cls = rec.seq, rec.classes
        for i in range(K - 1, len(seq)):
            yield seq[i - K + 1: i + 1], cls[i]


def hmean(xs: Iterable[float]) -> float:
    xs = list(xs)
    return len(xs) / sum(1.0 / x for x in xs)


def consistency(class_path: str, fastk_root: str) -> float:
    """Harmonic-mean most-common-class fraction over distinct k-mers
    (the metric of scripts/naive_consensus.sh + agg2cons.py)."""
    K = open_profiles(fastk_root).kmer
    groups: dict[str, Counter] = {}
    for kmer, c in _kmer_class_pairs(class_path, K):
        cnt = groups.get(kmer)
        if cnt is None:
            cnt = groups[kmer] = Counter()
        cnt[c] += 1
    mcfs = (cnt.most_common()[0][1] / sum(cnt.values())
            for cnt in groups.values())
    return hmean(mcfs)
