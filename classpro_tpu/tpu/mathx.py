"""Range-managed float64 transcendentals for TPU.

On the target TPU, XLA's float64 ``exp``/``log`` pass through float32
*range* (measured: exp overflows to inf at x>~88, log(1e-40) = -inf,
log(1e42) = NaN) even though f64 add/mul/sqrt are full-precision.  The
classifier's log-probabilities live in [-1e4, 0] and probabilities down
to exp(-745), so every device exp/log goes through these wrappers:

* ``exp64(x)``: split x = k*ln2 + r with |r| <= ln2/2, return exp(r)*2^k
  with 2^k built exactly from exponent bits.
* ``log64(x)``: split x = m*2^k with m in [1,2) via exponent bits, return
  log(m) + k*ln2.

Both stay within f32-safe argument ranges for the underlying primitive
and are accurate to a few ulps (validated against numpy in tests).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_LN2 = 0.6931471805599453094172321214581766  # ln 2 (f64)


def _pow2i(k):
    """Exact 2**k for integer k clamped to the normal range [-1022, 1023]."""
    k = jnp.clip(jnp.asarray(k, jnp.int64), -1022, 1023)
    return jnp.asarray((k + 1023) << 52, jnp.int64).view(jnp.float64)


def exp64(x):
    """exp(x) in f64 with full *normal* range on TPU.

    Results below the min normal double flush to 0 (XLA treats f64
    subnormals as zero anyway), above DBL_MAX saturate to inf."""
    x = jnp.asarray(x, jnp.float64)
    k = jnp.round(x / _LN2)
    r = x - k * _LN2
    k = k.astype(jnp.int64)
    # split 2^k into two normal-range factors applied in sequence so that
    # k up to +/-2044 stays representable mid-product
    k1 = jnp.clip(k, -1022, 1023)
    k2 = k - k1
    out = (jnp.exp(r) * _pow2i(k1)) * _pow2i(k2)
    out = jnp.where(x > 709.782712893384, jnp.inf, out)
    out = jnp.where(x < -708.39, 0.0, out)  # flush-to-zero below min normal
    return out


def log64(x):
    """log(x) in f64 with full normal range on TPU
    (log(0) = -inf, log(<0) = nan; subnormals behave as 0 under XLA)."""
    x = jnp.asarray(x, jnp.float64)
    xb = x.view(jnp.int64)
    expo = ((xb >> 52) & 0x7FF).astype(jnp.int64) - 1023
    m = ((xb & 0x000FFFFFFFFFFFFF) | 0x3FF0000000000000).view(jnp.float64)
    out = jnp.log(m) + expo.astype(jnp.float64) * _LN2
    out = jnp.where(x <= 2.2250738585072014e-308,  # zero and subnormals
                    jnp.where(x < 0.0, jnp.nan, -jnp.inf), out)
    out = jnp.where(x == 2.2250738585072014e-308, -708.3964185322641, out)
    out = jnp.where(jnp.isinf(x) & (x > 0), jnp.inf, out)
    out = jnp.where(jnp.isnan(x), jnp.nan, out)
    return out


def np_selftest(n: int = 4096, seed: int = 0) -> dict:
    """Accuracy report of exp64/log64 against numpy (run on any backend)."""
    rng = np.random.default_rng(seed)
    xs = np.concatenate([
        rng.uniform(-745, 709, n),
        np.array([0.0, -0.0, 1.0, -745.1, 709.7, -1e-10]),
    ])
    e_ref = np.exp(xs)
    e_out = np.asarray(exp64(jnp.asarray(xs)))
    rel_e = np.abs(e_out - e_ref) / np.maximum(np.abs(e_ref), 1e-300)
    ps = np.concatenate([
        np.exp(rng.uniform(-745, 709, n)),
        np.array([1e-300, 1e-320, 5e-324, 1.8e308, 1.0]),
    ])
    l_ref = np.log(ps)
    l_out = np.asarray(log64(jnp.asarray(ps)))
    abs_l = np.abs(l_out - l_ref)
    return {
        "exp_max_rel": float(np.nanmax(rel_e)),
        "log_max_abs": float(np.nanmax(abs_l)),
    }
