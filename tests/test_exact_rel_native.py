"""cp_exact_rel (C++ oracle port) == exact/rel.py (Python oracle).

The engine's exactness guard re-decides decision-margin-flagged reads
with exact reference arithmetic.  That recompute must be bit-equal to
the Python oracle (the parity anchor) on EVERY read, not just flagged
ones — this test sweeps the full medium fixture plus the tie8339
regression read through both implementations.
"""

import gzip
import pathlib

import numpy as np

FIX = pathlib.Path(__file__).parent / "fixtures"


def _oracle_asgn(gm, recs, plen):
    from classpro_tpu.exact.rel import RelClassifier
    from classpro_tpu.exact.wall import Intvl

    rels = [Intvl(b=int(r["b"]), e=int(r["e"]), cb=int(r["cb"]),
                  ce=int(r["ce"]), ccb=int(r["ccb"]), cce=int(r["cce"]),
                  is_rel=True, pe=float(r["pe"]),
                  pe_o_b=float(r["pe_o_b"]), pe_o_e=float(r["pe_o_e"]))
            for r in recs]
    RelClassifier(gm).classify(rels, rels, plen)
    return np.array([I.asgn for I in rels], np.int8)


def _sweep(gm, seqs, profs):
    from classpro_tpu.native import NativeWall

    nw = NativeWall(gm)
    checked = 0
    for seq, prof in zip(seqs, profs):
        iv, n_rel = nw.wall_stage(seq.encode("ascii"), prof)
        if n_rel == 0:
            continue
        rel_recs = iv[iv["is_rel"] != 0]
        got = nw.exact_rel(rel_recs, len(prof))
        want = _oracle_asgn(gm, rel_recs, len(prof))
        assert (got == want).all(), (
            f"cp_exact_rel diverges from the oracle "
            f"(M={len(rel_recs)}): {got.tolist()} vs {want.tolist()}")
        checked += 1
    return checked


def test_exact_rel_native_matches_oracle_medium():
    from classpro_tpu.estimation import build_global_model
    from classpro_tpu.io.fastk import load_histogram, open_profiles
    from classpro_tpu.io.fastx import read_fastx

    gm = build_global_model(load_histogram(str(FIX / "medium" / "reads")))
    P = open_profiles(str(FIX / "medium" / "reads"))
    reads = list(read_fastx(str(FIX / "medium" / "reads.fasta.gz")))
    seqs = [r.seq for r in reads]
    profs = [P.fetch(i) for i in range(P.nreads)]
    checked = _sweep(gm, seqs, profs)
    assert checked > 300  # nearly every medium read has rel intervals


def test_exact_rel_native_matches_oracle_tie8339():
    """The fuzz-found exact-tie read (seed 8339) — the guard's raison
    d'etre — must recompute identically through the C++ port."""
    from classpro_tpu.estimation import build_global_model
    from classpro_tpu.io.fastk import load_histogram

    fx = FIX / "tie8339"
    gm = build_global_model(load_histogram(str(fx / "reads")))
    seq = gzip.open(fx / "read94.fa.gz", "rt").read().split("\n")[1]
    prof = np.load(fx / "prof94.npy")
    assert _sweep(gm, [seq], [prof]) == 1
