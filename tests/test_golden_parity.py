"""Byte-identity of the oracle engine vs the reference binary's output."""
import gzip
import pathlib

import pytest

from classpro_tpu.exact.pipeline import classify_file

FIX = pathlib.Path(__file__).parent / "fixtures"


def load_gold(path):
    gold = []
    with gzip.open(path, "rt") as f:
        while True:
            h = f.readline()
            if not h:
                break
            s = f.readline().rstrip("\n")
            f.readline()
            c = f.readline().rstrip("\n")
            gold.append((h.rstrip("\n"), s, c))
    return gold


@pytest.mark.parametrize("fx", ["tiny", pytest.param("medium", marks=pytest.mark.slow)])
def test_golden_byte_identity(fx):
    gold = load_gold(FIX / fx / "golden.class.gz")
    n = 0
    for rid, rec in enumerate(
        classify_file(str(FIX / fx / "reads.fasta.gz"), str(FIX / fx / "reads"))
    ):
        gh, gs, gc = gold[rid]
        assert rec.header == gh, f"read {rid} header"
        assert rec.seq == gs, f"read {rid} seq"
        assert rec.classes == gc, f"read {rid} classes differ"
        n += 1
    assert n == len(gold)
