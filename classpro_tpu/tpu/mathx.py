"""Range-managed float64 transcendentals for TPU.

On the target TPU, XLA's float64 ``exp``/``log`` pass through float32
*range* (measured: exp overflows to inf at x>~88, log(1e-40) = -inf,
log(1e42) = NaN) even though f64 add/mul/sqrt are full-precision.  The
classifier's log-probabilities live in [-1e4, 0] and probabilities down
to exp(-745), so every device exp/log goes through these wrappers.

The TPU's f64 emulation also cannot lower f64<->i64 bitcasts, so no
exponent-bit tricks: scaling uses exact power-of-two constants composed
via comparisons/gathers.

* ``exp64(x)``: Cody-Waite reduction x = a*(64 ln2) + r with |r| <= 22.2
  (f32-safe for the underlying exp), times 2^(64a) gathered from an exact
  33-entry table.
* ``log64(x)``: comparison-cascade normalization x' = x * 2^s with
  x' in f32-safe range, then log(x') - s*ln2 (two-part ln2).

Accuracy ~1e-13 relative (validated in tests on the CPU backend and
spot-checked on device).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_LN2_HI = 0.6931471805598903  # high part, ~20 trailing zero bits
_LN2_LO = 5.497923018708371e-14
_LN2 = 0.6931471805599453

# exact 2^(32n) for n in [-16, 16]; 2^(64a) is applied as (2^(32a))^2 so
# every intermediate stays within the finite f64 range
_PH = np.ldexp(np.ones(33), 32 * (np.arange(33) - 16))
_PH_J = jnp.asarray(_PH)

# cascade scales (exact)
_CASC = [512, 256, 128, 64, 32]
_CASC_UP = [float(np.ldexp(1.0, s)) for s in _CASC]
_CASC_DN = [float(np.ldexp(1.0, -s)) for s in _CASC]


def exp64(x):
    """exp(x) in f64 with full normal range on TPU (flush-to-zero below
    the smallest normal; inf above DBL_MAX)."""
    x = jnp.asarray(x, jnp.float64)
    a = jnp.round(x * (1.0 / (64.0 * _LN2)))
    r = x - a * (64.0 * _LN2_HI) - a * (64.0 * _LN2_LO)
    ai = jnp.clip(a, -16, 16).astype(jnp.int32) + 16
    p = _PH_J[ai]
    out = (jnp.exp(r) * p) * p
    out = jnp.where(x > 709.782712893384, jnp.inf, out)
    out = jnp.where(x < -708.39, 0.0, out)
    out = jnp.where(jnp.isnan(x), jnp.nan, out)
    return out


def log64(x):
    """log(x) in f64 with full normal range on TPU
    (log(0) = -inf, log(<0) = nan; f64 subnormals behave as 0 under XLA)."""
    x = jnp.asarray(x, jnp.float64)
    xs = x
    stot = jnp.zeros(x.shape, jnp.float64)
    for s, up, dn in zip(_CASC, _CASC_UP, _CASC_DN):
        too_small = xs < dn          # xs < 2^-s
        too_big = xs > up            # xs > 2^s
        xs = jnp.where(too_small, xs * up, jnp.where(too_big, xs * dn, xs))
        stot = stot + jnp.where(too_small, -float(s),
                                jnp.where(too_big, float(s), 0.0))
    out = jnp.log(xs) + stot * _LN2_HI + stot * _LN2_LO
    out = jnp.where(x <= 2.2250738585072014e-308,
                    jnp.where(x < 0.0, jnp.nan, -jnp.inf), out)
    out = jnp.where(x == 2.2250738585072014e-308, -708.3964185322641, out)
    out = jnp.where(jnp.isinf(x) & (x > 0), jnp.inf, out)
    out = jnp.where(jnp.isnan(x), jnp.nan, out)
    return out


def np_selftest(n: int = 4096, seed: int = 0) -> dict:
    """Accuracy report of exp64/log64 against numpy (run on any backend)."""
    rng = np.random.default_rng(seed)
    xs = np.concatenate([
        rng.uniform(-708, 709.7, n),
        np.array([0.0, -0.0, 1.0, -745.1, 709.78, -1e-10]),
    ])
    e_ref = np.exp(xs)
    e_out = np.asarray(exp64(jnp.asarray(xs)))
    rel_e = np.abs(e_out - e_ref) / np.maximum(np.abs(e_ref), 1e-300)
    ps = np.concatenate([
        np.exp(rng.uniform(-700, 700, n)),
        np.array([1e-300, 2.3e-308, 1.7e308, 1.0, 0.5]),
    ])
    l_ref = np.log(ps)
    l_out = np.asarray(log64(jnp.asarray(ps)))
    abs_l = np.abs(l_out - l_ref)
    return {
        "exp_max_rel": float(np.nanmax(rel_e)),
        "log_max_abs": float(np.nanmax(abs_l)),
    }
