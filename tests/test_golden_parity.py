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


def test_himodel_byte_identity_tiny():
    """-M HIsim error-model mode matches the reference binary's golden
    (estimation._himodel_pe + _quadfit; ref wall.c:55-115)."""
    import gzip
    import tempfile

    from classpro_tpu.estimation import build_global_model
    from classpro_tpu.io.fastk import load_histogram, open_profiles
    from classpro_tpu.io.fastx import read_fastx
    from classpro_tpu.tpu.engine import TpuEngine

    fx = FIX / "tiny"
    gold = []
    with gzip.open(fx / "golden_M.class.gz", "rt") as f:
        while True:
            h = f.readline()
            if not h:
                break
            f.readline()
            f.readline()
            gold.append(f.readline().rstrip("\n"))
    with tempfile.NamedTemporaryFile(suffix=".model") as tf:
        tf.write(gzip.open(fx / "hisim.model.gz", "rb").read())
        tf.flush()
        gm = build_global_model(load_histogram(str(fx / "reads")),
                                model_path=tf.name)
    P = open_profiles(str(fx / "reads"))
    reads = list(read_fastx(str(fx / "reads.fasta.gz")))[:48]
    profs = [P.fetch(i) for i in range(48)]
    out = TpuEngine(gm).classify_chunk([r.seq for r in reads], profs)
    bad = sum(1 for i in range(48) if out[i] != gold[i])
    assert bad == 0, f"{bad}/48 reads differ from -M golden"
