#!/usr/bin/env python3
"""Device launch-cost anatomy probe (axon tunnel platform).

BASELINE_MEASURED.md round 2 root-caused the steady-state floor to a
serialized ~26 ms cost per program execution (a jitted ``scalar * 2``
pays it), with `lax.map` grouping of G production chunks measured at
G x the single-chunk cost (104 ms at G=3 vs 3 x 35) — i.e. grouping
bought nothing.  Two hypotheses fit those observations:

  (a) the fixed cost is per PROGRAM round trip, and lax.map's while_loop
      happened to get a worse lowering (per-step cost rise), or
  (b) the fixed cost is paid per dynamic-trip `lax.while_loop`
      EXECUTION (some host sync per loop on this tunnel), in which case
      any sequential grouping of scans inside one program is dead.

This probe separates them with tiny programs:

  1. null          — jitted scalar*2                       (base RTT)
  2. while x1      — one dynamic-trip while_loop, trivial body
  3. while x2      — two sequential independent while_loops
  4. while x4      — four

If (a): cost(x4) ~= cost(x1) + 3 * (trip * step).  If (b): cost(x4)
~= 4 * cost(x1).  The answer decides whether a production pair-program
(two chunks' rel DPs unrolled sequentially in one executable, width
unchanged — NOT lax.map, NOT row stacking) can halve the per-chunk RTT.

Usage:  python3 tools/device_probe.py            # on the live TPU
        python3 tools/device_probe.py --trip 100 --reps 20
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

import numpy as np


def _timeit(fn, reps: int) -> float:
    """Median seconds per serialized execution INCLUDING the result
    fetch: since the 2026-08-18 relay change, block_until_ready returns
    before the program has actually run — only np.asarray() waits for
    real completion, so timings must fetch."""
    fn()  # warm (first execution builds the TPU program on this platform)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trip", type=int, default=100,
                    help="dynamic while_loop trip count (production ~100-127)")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # 1. null program ------------------------------------------------------
    @jax.jit
    def null(x):
        return x * 2.0

    x = jnp.asarray(3.0)
    t_null = _timeit(lambda: np.asarray(null(x)), args.reps)
    print(f"null program                 : {t_null * 1e3:8.2f} ms")

    # 2-4. k sequential dynamic-trip while_loops ---------------------------
    # body: small vector update that cannot be folded away; trip is a
    # runtime argument (dynamic, like the production DP's max n_rel).
    def loop(v, n):
        def cond(c):
            i, _ = c
            return i < n

        def body(c):
            i, a = c
            return i + 1, a * 1.0000001 + 0.5

        return jax.lax.while_loop(cond, body, (jnp.int64(0), v))[1]

    def make_prog(k: int):
        @jax.jit
        def prog(v, n):
            outs = []
            for j in range(k):
                outs.append(loop(v + j, n))
            return sum(outs)

        return prog

    v = jnp.ones(256, jnp.float64)
    n = jnp.int64(args.trip)
    t1 = None
    for k in (1, 2, 4):
        prog = make_prog(k)
        t = _timeit(lambda: np.asarray(prog(v, n)), args.reps)
        if k == 1:
            t1 = t
        print(f"while_loop x{k} (trip {args.trip:4d})  : {t * 1e3:8.2f} ms")

    extra = t1 - t_null
    print(f"\nper-program fixed cost ~ {t_null * 1e3:.1f} ms; "
          f"one-loop increment ~ {extra * 1e3:.1f} ms")
    print("interpretation: if x4 ~= x1, grouping scans in one program "
          "amortizes the RTT (build the pair-program); if x4 ~= 4*x1, "
          "the cost is per while_loop execution and grouping is dead.")


if __name__ == "__main__":
    main()
