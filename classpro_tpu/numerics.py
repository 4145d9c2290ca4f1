"""Probability kernels with bit-exact C-double semantics.

Mirrors the reference's numeric core (prob.c, bessel.c, util.c) operation
by operation: the classifier's decisions are argmaxes and threshold
comparisons over these values, so byte-identical ``.class`` output requires
bit-identical float64 results.  Every function here has a scalar form
(used by the exact oracle engine) and, where hot, a NumPy-vectorized form;
the JAX/TPU forms live in ``classpro_tpu.tpu``.

Reference lines are cited per function.
"""

from __future__ import annotations

import math

import numpy as np

from classpro_tpu.constants import MAX_KMER_CNT

# ---------------------------------------------------------------------------
# log-factorial table (prob.c:12-19): sequential accumulation, same rounding
# ---------------------------------------------------------------------------

LOGFACT = np.zeros(MAX_KMER_CNT + 1, dtype=np.float64)
LOGFACT[1:] = np.cumsum(np.log(np.arange(1, MAX_KMER_CNT + 1, dtype=np.float64)))


def _check_cnt(n: int) -> int:
    """DEBUG clamp active in the reference release build (prob.c:22-31)."""
    return MAX_KMER_CNT if n > MAX_KMER_CNT else n


# ---------------------------------------------------------------------------
# Modified Bessel I_n (bessel.c:390-520, Numerical-Recipes polynomials)
# ---------------------------------------------------------------------------

_ACC = 40.0
_BIGNO = 1.0e10
_BIGNI = 1.0e-10


def c_exp(x: float) -> float:
    """C exp() semantics: overflow returns +inf instead of raising."""
    try:
        return math.exp(x)
    except OverflowError:
        return float("inf")


def bessi0(x: float) -> float:
    ax = abs(x)
    if ax < 3.75:
        y = x / 3.75
        y = y * y
        return 1.0 + y * (3.5156229 + y * (3.0899424 + y * (1.2067492
               + y * (0.2659732 + y * (0.360768e-1 + y * 0.45813e-2)))))
    y = 3.75 / ax
    return (c_exp(ax) / math.sqrt(ax)) * (0.39894228 + y * (0.1328592e-1
           + y * (0.225319e-2 + y * (-0.157565e-2 + y * (0.916281e-2
           + y * (-0.2057706e-1 + y * (0.2635537e-1 + y * (-0.1647633e-1
           + y * 0.392377e-2))))))))


def bessi1(x: float) -> float:
    ax = abs(x)
    if ax < 3.75:
        y = x / 3.75
        y = y * y
        ans = ax * (0.5 + y * (0.87890594 + y * (0.51498869 + y * (0.15084934
              + y * (0.2658733e-1 + y * (0.301532e-2 + y * 0.32411e-3))))))
    else:
        y = 3.75 / ax
        ans = 0.2282967e-1 + y * (-0.2895312e-1 + y * (0.1787654e-1
              - y * 0.420059e-2))
        ans = 0.39894228 + y * (-0.3988024e-1 + y * (-0.362018e-2
              + y * (0.163801e-2 + y * (-0.1031555e-1 + y * ans))))
        ans *= c_exp(ax) / math.sqrt(ax)
    return -ans if x < 0.0 else ans


def bessi(n: int, x: float) -> float:
    """I_n(x) by downward recurrence (bessel.c:478-520)."""
    if n < 0:
        raise ValueError("n < 0 in bessi")
    if n == 0:
        return bessi0(x)
    if n == 1:
        return bessi1(x)
    if x == 0.0:
        return 0.0
    tox = 2.0 / abs(x)
    bip = ans = 0.0
    bi = 1.0
    for j in range(2 * (n + int(math.sqrt(_ACC * n))), 0, -1):
        bim = bip + j * tox * bi
        bip = bi
        bi = bim
        if abs(bi) > _BIGNO:
            ans *= _BIGNI
            bi *= _BIGNI
            bip *= _BIGNI
        if j == n:
            ans = bip
    ans *= bessi0(x) / bi
    return -ans if (x < 0.0 and n % 2 == 1) else ans


# ---------------------------------------------------------------------------
# Log-probability kernels (prob.c:33-73)
# ---------------------------------------------------------------------------


def logp_poisson(k: int, lam: int) -> float:
    """prob.c:33 — k * log(lambda) - lambda - logfact[k]; k clamped."""
    k = _check_cnt(k)
    return k * math.log(float(lam)) - lam - LOGFACT[k]


def c_log(x: float) -> float:
    """C log() semantics: log(0) = -inf, log(<0) = NaN (no exception)."""
    if x > 0.0:
        return math.log(x)
    if x == 0.0:
        return float("-inf")
    return float("nan")


def logp_skellam(k: int, lam: float) -> float:
    """prob.c:41 — -2*lambda + log(I_|k|(2*lambda)).

    The Bessel term underflows to 0 for large |k| with small lambda —
    C's log maps that to -inf (a legitimate 'impossible transition')."""
    return -2.0 * lam + c_log(bessi(abs(k), 2.0 * lam))


def logp_binom(k: int, n: int, p: float) -> float:
    """prob.c:59."""
    k = _check_cnt(k)
    n = _check_cnt(n)
    return (LOGFACT[n] - LOGFACT[k] - LOGFACT[n - k]
            + k * math.log(p) + (n - k) * math.log(1 - p))


def logp_binom_pre(k: int, n: int, lpe: float, l1mpe: float) -> float:
    """prob.c:67."""
    return LOGFACT[n] - LOGFACT[k] - LOGFACT[n - k] + k * lpe + (n - k) * l1mpe


def binom_test_g(k: int, n: int, pe: float, exact: bool) -> float:
    """One-sided binomial tail test with early-exit approximation
    (prob.c:76-112).  Loop order and the `10*p_curr < p_first` exit are
    semantics, not optimizations — they determine the returned rounding."""
    k = _check_cnt(k)
    n = _check_cnt(n)
    lpe = math.log(pe)
    l1mpe = math.log(1 - pe)
    mean = n * pe
    if float(k) >= mean:
        p = p_first = math.exp(logp_binom_pre(k, n, lpe, l1mpe))
        for x in range(k + 1, n + 1):
            p_curr = math.exp(logp_binom_pre(x, n, lpe, l1mpe))
            p += p_curr
            if not exact and 10 * p_curr < p_first:
                break
        return p
    p = p_first = 0.0 if k == 0 else math.exp(logp_binom_pre(k - 1, n, lpe, l1mpe))
    for x in range(k - 2, -1, -1):
        p_curr = math.exp(logp_binom_pre(x, n, lpe, l1mpe))
        p += p_curr
        if not exact and 10 * p_curr < p_first:
            break
    return 1 - p


# ---------------------------------------------------------------------------
# Misc helpers (util.c)
# ---------------------------------------------------------------------------


def plus_sigma(cnt: int, n_sigma: int) -> int:
    """util.c:9 — cnt + trunc(sqrt(cnt) * n_sigma)."""
    return cnt + int(math.sqrt(cnt) * n_sigma)


def minus_sigma(cnt: int, n_sigma: int) -> int:
    """util.c:13."""
    return cnt - int(math.sqrt(cnt) * n_sigma)


def linear_interpolation(x: int, pos1: int, cnt1: int, pos2: int, cnt2: int) -> float:
    """util.c:24 — interpolate count at x between (pos1,cnt1), (pos2,cnt2)."""
    return float(cnt1) + (float(cnt2) - cnt1) * (x - pos1) / (pos2 - pos1)


def logp_trans(b: int, e: int, cb: int, ce: int, cov: int, read_len: int) -> float:
    """util.c:35 — Skellam count-drift transition model."""
    return logp_skellam(ce - cb, float(cov) * abs(e - b) / read_len)


def p_errorin(etype: int, erate: float, cout: int, cin: int) -> float:
    """util.c:46 — binomial test of cin errors-in-self (etype==SELF) or
    cout-cin errors-in-others."""
    return binom_test_g(cin if etype == 0 else cout - cin, cout, erate, False)
