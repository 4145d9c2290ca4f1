#!/usr/bin/env python3
"""Relay cost model probe (2026-08 loopback relay).

The round-3 ablations showed the production rel program spends ~57 ms
OUTSIDE its two while loops (nodp,notb = 83 ms vs null ~25 ms), where
the op graph is all cheap vector work — suggesting the relay charges a
fixed cost per dispatched KERNEL (fusion), not per byte.  This probe
measures that directly:

  1. kernel-dispatch slope: one program with K fusion kernels forced
     apart by optimization_barrier; cost(K) - cost(K0) gives
     us-per-kernel.
  2. while-loop body kernel slope: the same chain inside a
     dynamic-trip while loop — per-iteration per-kernel cost.
  3. transfer bandwidth: host->device and device->host, 8 MB.
  4. gather-kernel cost: K separate small gathers (the production
     out-of-loop graph is gather-heavy).

Usage: python3 tools/relay_probe.py [--reps 10]
"""

from __future__ import annotations

import argparse
import statistics
import time

import numpy as np


def _med(fn, reps):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    x0 = np.arange(512 * 128, dtype=np.float64).reshape(512, 128)
    xd = jax.device_put(x0)

    # 1. fusion-kernel chain (barriers prevent fusing into one kernel)
    def chain(k):
        @jax.jit
        def f(x):
            for _ in range(k):
                x = jax.lax.optimization_barrier(x * 1.0000001 + 1e-9)
            return x
        return f

    for k in (4, 32, 128):
        f = chain(k)
        t = _med(lambda: np.asarray(f(xd)), args.reps)
        print(f"chain kernels={k:4d}: {t * 1e3:8.2f} ms")

    # 2. the same chain inside a while loop (trip 100)
    def loop_chain(k):
        @jax.jit
        def f(x, trip):
            def body(st):
                i, y = st
                for _ in range(k):
                    y = jax.lax.optimization_barrier(y * 1.0000001 + 1e-9)
                return i + 1, y
            return jax.lax.while_loop(lambda st: st[0] < trip, body,
                                      (jnp.int32(0), x))[1]
        return f

    trip = np.int32(100)
    for k in (1, 4, 16):
        f = loop_chain(k)
        t = _med(lambda: np.asarray(f(xd, trip)), args.reps)
        print(f"loop(100) body kernels={k:3d}: {t * 1e3:8.2f} ms")

    # 3. transfers
    big = np.zeros(1 << 20, np.float64)  # 8 MB
    t_up = _med(lambda: jax.block_until_ready(jax.device_put(big)),
                args.reps)
    bigd = jax.device_put(big)
    t_dn = _med(lambda: np.asarray(bigd), args.reps)
    print(f"host->device 8MB: {t_up * 1e3:8.2f} ms "
          f"({8 / t_up:.0f} MB/s)")
    print(f"device->host 8MB: {t_dn * 1e3:8.2f} ms "
          f"({8 / t_dn:.0f} MB/s)")

    # 4. separate gather kernels
    tab = jax.device_put(np.arange(32768, dtype=np.float64))
    idx = jax.device_put(
        np.random.default_rng(0).integers(0, 32768, (512, 128)))

    def gathers(k):
        @jax.jit
        def f(t, i):
            outs = []
            for j in range(k):
                outs.append(t[jax.lax.optimization_barrier(i + j)])
            return sum(outs)
        return f

    for k in (1, 8, 32):
        f = gathers(k)
        t = _med(lambda: np.asarray(f(tab, idx)), args.reps)
        print(f"gather kernels={k:3d}: {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
