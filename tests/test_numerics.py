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


def test_bessjyik_reference_golden():
    """Bit-exact parity of the full Bessel family (bessj/bessy/bessi/bessk)
    against the compiled reference bessel.c (bessel.c:22-647).  Fixture
    tests/fixtures/bessel_golden.txt: `n x J Y I K` per line at %.17g;
    negative-x rows carry `nan` for Y/K (the C exits on x<=0 there)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "fixtures", "bessel_golden.txt")
    nrows = 0
    with open(path) as f:
        for line in f:
            n_s, x_s, j_s, y_s, i_s, k_s = line.split()
            n, x = int(n_s), float(x_s)
            assert N.bessj(n, x) == float(j_s)
            assert N.bessi(n, x) == float(i_s)
            if y_s != "nan":
                assert N.bessy(n, x) == float(y_s)
                assert N.bessk(n, x) == float(k_s)
            nrows += 1
    assert nrows == 270


def test_bessjyk_error_semantics():
    """The C fprintf+exit(1) guards (bessel.c:196,361,622) map to ValueError."""
    import pytest
    for fn in (N.bessj, N.bessy, N.bessk):
        with pytest.raises(ValueError):
            fn(-1, 1.0)
    for fn in (N.bessy, N.bessk):
        with pytest.raises(ValueError):
            fn(2, 0.0)


def test_prob_util_reference_golden():
    """Bit-exact parity of the L1 probability kernels against the compiled
    reference (prob.c:33-112, util.c:9-55) at edge cases: clamp boundary
    32767, Skellam/Bessel underflow (-inf rows), binom_test_g early-exit
    straddles (k vs n*pe on both sides, exact vs approx), logp_trans
    extremes.  Fixture tests/fixtures/prob_golden.txt, READ_LEN=20000."""
    import os
    path = os.path.join(os.path.dirname(__file__), "fixtures", "prob_golden.txt")
    nrows = 0
    with open(path) as f:
        for line in f:
            parts = line.split()
            tag, want = parts[0], float(parts[-1])
            if tag == "P":
                got = N.logp_poisson(int(parts[1]), int(parts[2]))
            elif tag == "S":
                got = N.logp_skellam(int(parts[1]), float(parts[2]))
            elif tag == "B":
                got = N.binom_test_g(int(parts[1]), int(parts[2]),
                                     float(parts[3]), bool(int(parts[4])))
            elif tag == "T":
                got = N.logp_trans(int(parts[1]), int(parts[2]), int(parts[3]),
                                   int(parts[4]), int(parts[5]), 20000)
            elif tag == "E":
                got = N.p_errorin(int(parts[1]), float(parts[2]),
                                  int(parts[3]), int(parts[4]))
            elif tag == "G":
                assert float(N.plus_sigma(27, 5)) == float(parts[1])
                got, want = float(N.minus_sigma(27, 5)), float(parts[2])
            elif tag == "L":
                got = N.linear_interpolation(5, 0, 10, 20, 50)
            if math.isinf(want):
                assert math.isinf(got) and (got > 0) == (want > 0), line
            else:
                assert got == want, line
            nrows += 1
    assert nrows == 164


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
