"""Seed-selection parity vs reference-generated goldens.

golden.seeds.gz was produced by the reference's find_seeds (seed.c)
driven by a C harness over the fixtures' golden classifications (see
tools/make_fixtures.py notes); the port must reproduce it exactly,
including the reference's stale-slot semantics (seeds.Workspace).
"""
import gzip
import pathlib

import numpy as np
import pytest

FIX = pathlib.Path(__file__).parent / "fixtures"


def _golden(fx):
    seqs, classes = [], []
    with gzip.open(FIX / fx / "golden.class.gz", "rt") as f:
        while True:
            h = f.readline()
            if not h:
                break
            seqs.append(f.readline().rstrip())
            f.readline()
            classes.append(f.readline().rstrip())
    with gzip.open(FIX / fx / "golden.seeds.gz", "rt") as f:
        seeds = f.read().splitlines()
    return seqs, classes, seeds


@pytest.mark.parametrize("fixture", ["tiny", "medium"])
def test_find_seeds_matches_reference(fixture):
    from classpro_tpu.io.fastk import open_profiles
    from classpro_tpu.seeds import Workspace, find_seeds

    seqs, classes, gold = _golden(fixture)
    P = open_profiles(str(FIX / fixture / "reads"))
    K = P.kmer
    ws = Workspace()
    n = min(len(seqs), 60)
    for rid in range(n):
        prof = P.fetch(rid)
        ours, rints = find_seeds(seqs[rid], classes[rid][K - 1:], prof, K,
                                 ws)
        assert ours == gold[rid], f"read {rid} differs"
        # rep intervals lie within the read and are disjoint ascending
        prev = 0
        for b, e in rints:
            assert prev <= b < e <= len(seqs[rid])
            prev = e


def test_kmer_hash_matches_rolling_definition():
    """The vectorized K-tap XOR must equal the sequential NTC64_b/_c
    rolling recurrence (nthash.h:255-267) computed directly."""
    from classpro_tpu.seeds import MOD, _COMP, _M64, _R, _SEED, kmer_hash

    rng = np.random.default_rng(5)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 300))
    K = 17
    plen = len(seq) - K + 1

    def ntf(kmer):
        h = 0
        for c in kmer:
            h = _R(h) ^ _SEED[c]
        return h

    def ntr(kmer):
        h = 0
        for c in reversed(kmer):
            h = _R(h) ^ _SEED[_COMP[c]]
        return h

    want = []
    for i in range(plen):
        kmer = seq[i: i + K]
        want.append(min(ntf(kmer), ntr(kmer)) % MOD)
    got = kmer_hash(seq.encode(), plen, K)
    assert list(got) == want


def test_native_seed_port_equivalence():
    """C++ cp_find_seeds == the Python oracle port, labels AND rep
    intervals, across the tiny fixture reads with ONE shared workspace
    each (the cross-read stale-slot state must match too)."""
    import gzip

    import pytest

    try:
        from classpro_tpu.native import NativeSeedWorkspace
    except Exception:
        pytest.skip("native library unavailable")
    from classpro_tpu.io.classfile import read_class
    from classpro_tpu.io.fastk import open_profiles
    from classpro_tpu.seeds import Workspace, find_seeds

    import tempfile, shutil, os, pathlib
    fix = pathlib.Path(__file__).parent / "fixtures" / "tiny"
    with tempfile.TemporaryDirectory() as d:
        for fn in ("reads.prof", ".reads.pidx.1", ".reads.prof.1"):
            shutil.copy(fix / fn, d)
        cls = os.path.join(d, "golden.class")
        open(cls, "wb").write(gzip.decompress((fix / "golden.class.gz").read_bytes()))
        P = open_profiles(os.path.join(d, "reads"))
        K = P.kmer
        ws_py = Workspace()
        ws_c = NativeSeedWorkspace()
        for rid, rec in enumerate(read_class(cls)):
            prof = P.fetch(rid)
            got = ws_c.find_seeds(rec.seq, rec.classes[K - 1:], prof, K)
            want = find_seeds(rec.seq, rec.classes[K - 1:], prof, K, ws_py)
            assert got == want, f"read {rid}"
