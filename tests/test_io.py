"""FASTK codec and fixture integrity tests."""
import gzip
import json
import pathlib

import numpy as np
import pytest

from classpro_tpu.io.fastk import (
    decode_profile, encode_profile, load_histogram, open_profiles)
from classpro_tpu.io.fastx import read_fastx
from classpro_tpu.io.classfile import read_class

FIX = pathlib.Path(__file__).parent / "fixtures"


@pytest.mark.parametrize("case", [
    np.array([], dtype=np.uint16),
    np.array([0], dtype=np.uint16),
    np.array([32767], dtype=np.uint16),
    np.array([200] * 500, dtype=np.uint16),
    np.array([5, 5, 5, 37, 5, 32767, 0, 1], dtype=np.uint16),
])
def test_roundtrip_edge(case):
    assert np.array_equal(decode_profile(encode_profile(case)), case)


def test_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(1, 4000))
        base = rng.integers(0, 80, n).astype(np.int64)
        runs = np.repeat(base, rng.integers(1, 30, n))[:n]
        prof = np.minimum(runs + rng.integers(0, 32700), 32767).astype(np.uint16)
        assert np.array_equal(decode_profile(encode_profile(prof)), prof)


@pytest.mark.parametrize("fx", ["tiny", "medium"])
def test_fixture_consistency(fx):
    meta = json.loads((FIX / fx / "meta.json").read_text())
    P = open_profiles(str(FIX / fx / "reads"))
    assert P.nreads == meta["n_reads"]
    assert P.kmer == meta["kmer"]
    reads = list(read_fastx(str(FIX / fx / "reads.fasta.gz")))
    assert len(reads) == P.nreads
    K = P.kmer
    for i in [0, P.nreads // 2, P.nreads - 1]:
        assert len(P.fetch(i)) == len(reads[i].seq) - K + 1
    H = load_histogram(str(FIX / fx / "reads"))
    assert H.kmer == K


def test_golden_class_readable():
    path = FIX / "tiny" / "golden.class.gz"
    tmp = path.parent / "_tmp.class"
    tmp.write_bytes(gzip.decompress(path.read_bytes()))
    try:
        recs = list(read_class(str(tmp)))
        assert len(recs) == 221
        assert set(recs[0].classes) <= set("NEHDR")
        assert recs[0].classes[:39] == "N" * 39
    finally:
        tmp.unlink()


def test_fastq_input_equals_fasta(tmp_path):
    """FASTQ input produces the same classifications as FASTA
    (kseq-equivalent parsing, ClassPro.c FASTX mode)."""
    import gzip

    from classpro_tpu.io.fastx import read_fastx

    fa = FIX / "tiny" / "reads.fasta.gz"
    recs = list(read_fastx(str(fa)))[:40]
    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as f:
        for r in recs:
            f.write(f"@{r.name} {r.comment}".rstrip() + "\n"
                    + r.seq + "\n+\n" + "I" * len(r.seq) + "\n")
    back = list(read_fastx(str(fq)))
    assert len(back) == 40
    for a, b in zip(recs, back):
        assert (a.name, a.seq) == (b.name, b.seq)


def test_fetch_batch_multi_part(tmp_path):
    """fetch_batch == fetch across a 3-part profile set, including the
    chunk that straddles part boundaries (split into per-part runs)."""
    import numpy as np

    from classpro_tpu.io.fastk import open_profiles, write_profiles

    rng = np.random.default_rng(5)
    profiles = [rng.integers(1, 200, rng.integers(50, 400)).astype(np.uint16)
                for _ in range(23)]
    write_profiles(str(tmp_path / "reads"), profiles, 40, nparts=3)
    P = open_profiles(str(tmp_path / "reads"))
    assert P.nreads == 23
    rids = list(range(23))
    got = P.fetch_batch(rids, [len(p) for p in profiles])
    for rid, g in zip(rids, got):
        assert np.array_equal(g, profiles[rid]), rid
    # a window fully inside part 2
    per = (23 + 2) // 3
    rids2 = list(range(per, 2 * per))
    got2 = P.fetch_batch(rids2, [len(profiles[r]) for r in rids2])
    for rid, g in zip(rids2, got2):
        assert np.array_equal(g, profiles[rid]), rid


# ---------------------------------------------------------------------
# Native fastx parser (cp_gzip_inflate + cp_fastx_parse) vs the pure-
# Python reader, which is the semantic spec (universal newlines,
# whitespace handling, header split).
# ---------------------------------------------------------------------

_FASTX_CASES = {
    "plain.fa": b">r1 a comment here\nACGT\nTTGG\n>r2\nAC\n>r3 x\n\nGG\n",
    "crlf.fa": b">r1 com\r\nACG\r\nT\r\n>r2\r\nAA\r\n",
    "lonecr.fa": b">r1 c\rACGT\rGG\r>r2\rAA\r",
    "fq.fq": b"@q1 c1\nACGT\n+\nIIII\n@q2\nGG\n+x\nII\n",
    "fq_crlf.fq": b"@q1 c1\r\nACGT\r\n+\r\nIIII\r\n",
    "ws.fa": b">  r1   spaced  comment \n  ACG T \nGG\n",
    "empty.fa": b"",
    "noeol.fa": b">r1\nACGT",
    "fq_noeol.fq": b"@q1\nAC\n+\nII",
    "nameless.fa": b"> only comment\nAC\n",
}


@pytest.mark.parametrize("name", sorted(_FASTX_CASES))
def test_fastx_native_matches_python(tmp_path, name, monkeypatch):
    import classpro_tpu.io.fastx as FX

    data = _FASTX_CASES[name]
    p = tmp_path / name
    p.write_bytes(data)
    pg = tmp_path / (name + ".gz")
    pg.write_bytes(gzip.compress(data))

    native = list(FX.read_fastx(str(p)))
    native_gz = list(FX.read_fastx(str(pg)))
    monkeypatch.setattr(FX, "_read_fastx_native", lambda _: None)
    py = list(FX.read_fastx(str(p)))
    py_gz = list(FX.read_fastx(str(pg)))
    assert native == py
    assert native_gz == py_gz


def test_fastx_native_multimember_and_errors(tmp_path, monkeypatch):
    import classpro_tpu.io.fastx as FX

    mm = tmp_path / "mm.fa.gz"
    mm.write_bytes(gzip.compress(b">r1\nAC\n") + gzip.compress(b">r2\nGT\n"))
    assert [r.name for r in FX.read_fastx(str(mm))] == ["r1", "r2"]

    bad = tmp_path / "bad.txt"
    bad.write_bytes(b"hello\n")
    with pytest.raises(ValueError):
        list(FX.read_fastx(str(bad)))


def test_fastx_native_on_fixture(monkeypatch):
    import classpro_tpu.io.fastx as FX

    p = str(FIX / "medium" / "reads.fasta.gz")
    native = list(FX.read_fastx(p))
    monkeypatch.setattr(FX, "_read_fastx_native", lambda _: None)
    assert list(FX.read_fastx(p)) == native


def test_truncated_prof_part_raises(tmp_path):
    """A short .prof part must fail loudly: numpy's short read
    previously decoded garbage silently; the reference exits via its
    rlen check (ClassPro.c:184-187)."""
    import shutil

    src = FIX / "tiny"
    for fn in ("reads.prof", ".reads.pidx.1", ".reads.prof.1"):
        shutil.copy(src / fn, tmp_path / fn)
    p = tmp_path / ".reads.prof.1"
    data = p.read_bytes()
    p.write_bytes(data[: len(data) // 2])
    P = open_profiles(str(tmp_path / "reads"))
    with pytest.raises(ValueError, match="truncated profile part"):
        P.fetch(P.nreads - 1)


def test_profile_read_length_mismatch_raises(tmp_path):
    """classify_file_tpu mirrors ClassPro.c:184-187: a profile whose
    length disagrees with rlen-K+1 aborts instead of classifying
    garbage."""
    import gzip as _gz
    import shutil

    from classpro_tpu.tpu.engine import classify_file_tpu

    src = FIX / "tiny"
    for fn in ("reads.hist", "reads.prof", ".reads.pidx.1",
               ".reads.prof.1"):
        shutil.copy(src / fn, tmp_path / fn)
    recs = list(read_fastx(str(src / "reads.fasta.gz")))
    fa = tmp_path / "reads.fasta"
    with open(fa, "w") as f:
        for i, r in enumerate(recs):
            seq = r.seq + ("ACGTACGTAC" if i == 0 else "")
            f.write(f">{r.name} {r.comment}\n{seq}\n")
    with pytest.raises(ValueError, match="rlen"):
        for _ in classify_file_tpu(str(fa), str(tmp_path / "reads")):
            pass
