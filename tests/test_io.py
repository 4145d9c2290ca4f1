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
    chunk that straddles part boundaries (falls back to per-read)."""
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
