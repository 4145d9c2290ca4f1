"""Measure per-array UPLOAD overhead on the axon relay.

The rel program ships two input arrays (fblob f64 ~262KB + iblob int32
~526KB at the production bucket).  BASELINE_MEASURED.md's open lead:
would fusing them into ONE uint8 blob (device-side bitcast views are
free elementwise ops) save a per-array fixed cost?  This probe times
an AOT program called with the same ~790KB shipped as 1 / 2 / 4
arrays, fetching one tiny scalar that depends on each input array
(strided samples; transfers are whole-buffer at the JAX layer, so the
relay cannot skip shipping any array — though a hypothetical
byte-granular relay could elide unsampled pages).

Run on an IDLE machine (ledger rule).  Usage:
    python3 tools/upload_probe.py [--reps 15]
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

TOTAL = 790_528  # bytes, production-bucket transfer size


def _med(fn, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=15)
    args = ap.parse_args()

    rng = np.random.default_rng(0)

    for nsplit in (1, 2, 4):
        per = TOTAL // nsplit
        arrs = [rng.integers(0, 255, per, dtype=np.uint8)
                for _ in range(nsplit)]

        def f(*xs):
            return sum(x[::8191].astype(jnp.int32).sum() for x in xs)

        jf = jax.jit(f).lower(
            *[jax.ShapeDtypeStruct((per,), jnp.uint8)] * nsplit
        ).compile()
        np.asarray(jf(*arrs))  # warm
        # vary content each rep so the relay can't cache the upload
        def run():
            for a in arrs:
                a[0] ^= 1
            return np.asarray(jf(*arrs))

        t = _med(run, args.reps)
        print(f"arrays={nsplit}  {per}B each: {t * 1e3:8.2f} ms")

    # mixed-dtype variant matching the real program signature
    fb = rng.standard_normal(TOTAL // 3 // 8 * 1)  # ~262KB f64
    fbn = fb.size
    ibn = (TOTAL - fbn * 8) // 4
    ib = rng.integers(0, 1 << 30, ibn, dtype=np.int32)

    def g(a, b):
        return a[::4096].sum() + b[::8191].astype(jnp.float64).sum()

    jg = jax.jit(g).lower(
        jax.ShapeDtypeStruct((fbn,), jnp.float64),
        jax.ShapeDtypeStruct((ibn,), jnp.int32)).compile()
    np.asarray(jg(fb, ib))

    def run2():
        fb[0] += 1.0
        return np.asarray(jg(fb, ib))

    print(f"f64+int32 pair (production shape): "
          f"{_med(run2, args.reps) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
