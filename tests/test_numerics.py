"""Numeric kernel self-tests (bit-exactness vs C is established via the
/tmp/refbuild harnesses at dev time; these guard the Python behavior)."""
import math

import numpy as np

import classpro_tpu.numerics as N
from classpro_tpu.context import seq_context


def test_logfact_values():
    assert N.LOGFACT[0] == 0.0
    assert math.isclose(N.LOGFACT[5], math.log(120), rel_tol=1e-12)
    assert math.isclose(N.LOGFACT[100], math.lgamma(101), rel_tol=1e-12)


def test_bessi_against_scipy_free_identity():
    # I_0(0)=1, I_n(0)=0, symmetry of In for small x via series
    assert N.bessi(0, 0.0) == 1.0
    assert N.bessi(3, 0.0) == 0.0
    # series check I_2(1.0) ~ 0.1357476698
    assert math.isclose(N.bessi(2, 1.0), 0.1357476698, rel_tol=1e-6)


def test_binom_test_monotone():
    # tail probability decreases as k moves away from the mean (decrease side)
    p1 = N.binom_test_g(5, 100, 0.01, False)
    p2 = N.binom_test_g(10, 100, 0.01, False)
    assert p2 < p1 < 1.0


def test_plus_sigma_truncation():
    assert N.plus_sigma(27, 5) == 27 + int(math.sqrt(27) * 5)  # == 52
    assert N.plus_sigma(27, 5) == 52


def test_seq_context_basic():
    lc, rc = seq_context(b"AAAATCGCGT")
    # homopolymer run ending lengths
    assert list(lc[:4, 0]) == [1, 2, 3, 4]
    assert rc[0][0] == 4  # run starting at 0 has length 4
    # dinucleotide satellite CGCG: l-ctx DS at the second CG end
    assert lc[7][1] >= 2 or lc[8][1] >= 2
