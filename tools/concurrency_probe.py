#!/usr/bin/env python3
"""1-vs-2-process null-program concurrency probe (axon tunnel platform).

BASELINE_MEASURED.md round 2: every program execution pays a serialized
~26 ms fixed cost in-process (a jitted ``scalar * 2`` pays it, and two
in-process threads do NOT overlap it).  Open question: is that cost
serialized per CONNECTION (one tunnel session per process) or per CHIP
(a device-side/host-service bottleneck shared by all clients)?

  - per-connection ⇒ 2 separate processes each get their own ~26 ms
    lane and AGGREGATE throughput doubles ⇒ the existing multi-process
    driver (parallel/driver.py) multiplies single-chip throughput and
    should be promoted in the docs/bench as the scale-out story.
  - per-chip ⇒ 2 processes halve each other's rate (aggregate flat)
    ⇒ ledger the hypothesis as dead.

Method: a child process jit-compiles ``x*2`` on the TPU, warms it, then
executes it back-to-back for --secs seconds and prints its achieved
executions/s.  We run 1 child, then 2 concurrently, and compare the
aggregate rates.

Usage:  python3 tools/concurrency_probe.py [--secs 8]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

CHILD = r"""
import json, sys, time
import jax, jax.numpy as jnp

f = jax.jit(lambda x: x * 2)
x = jnp.float32(3.0)
jax.block_until_ready(f(x))          # warm: builds the TPU program
# Barrier: warmup/first-exec time varies wildly on this platform, so the
# parent releases all children simultaneously AFTER every child reports
# ready — otherwise the timed windows only partially overlap and the
# 2-proc aggregate is inflated.
print("READY", flush=True)
sys.stdin.readline()                 # block until parent says go
secs = float(sys.argv[1])
n = 0
w0 = time.time()
t0 = time.perf_counter()
while time.perf_counter() - t0 < secs:
    jax.block_until_ready(f(x))
    n += 1
dt = time.perf_counter() - t0
print(json.dumps({"execs": n, "secs": dt, "rate": n / dt,
                  "win": [w0, w0 + dt]}))
"""


def _spawn(secs: float) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-c", CHILD, str(secs)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True)


def _rates(procs: list[subprocess.Popen]) -> list[float]:
    # Wait for every child to finish warmup, then release them together so
    # the measurement windows fully overlap.
    for p in procs:
        line = p.stdout.readline()
        if line.strip() != "READY":
            raise RuntimeError(f"child failed before warmup: {line!r}")
    for p in procs:
        p.stdin.write("go\n")
        p.stdin.flush()
    results = []
    for p in procs:
        stdout, _ = p.communicate(timeout=1200)
        line = stdout.strip().splitlines()[-1]
        results.append(json.loads(line))
    if len(results) > 1:
        start = max(r["win"][0] for r in results)
        end = min(r["win"][1] for r in results)
        span = max(r["win"][1] for r in results) - \
            min(r["win"][0] for r in results)
        overlap = max(0.0, end - start) / span if span else 0.0
        print(f"  window overlap: {overlap * 100:.0f}%", flush=True)
        if overlap < 0.9:
            print("  WARNING: windows overlap <90%; treat ratio as noisy",
                  flush=True)
    return [r["rate"] for r in results]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=8.0,
                    help="measurement window per child (after warmup)")
    args = ap.parse_args()

    print("[1 process]", flush=True)
    r1 = _rates([_spawn(args.secs)])
    print(f"  rate: {r1[0]:7.2f} exec/s  "
          f"({1e3 / r1[0]:.1f} ms/exec)")

    print("[2 concurrent processes]", flush=True)
    procs = [_spawn(args.secs), _spawn(args.secs)]
    r2 = _rates(procs)
    agg = sum(r2)
    print(f"  rates: {r2[0]:7.2f} + {r2[1]:7.2f} = {agg:7.2f} exec/s "
          f"aggregate")

    ratio = agg / r1[0]
    print(f"aggregate ratio 2-proc/1-proc: {ratio:.2f}x")
    if ratio > 1.6:
        print("=> fixed cost is per-CONNECTION: multi-process driver "
              "multiplies throughput")
    elif ratio < 1.25:
        print("=> fixed cost is per-CHIP/shared: multi-process scale-out "
              "on one chip is dead")
    else:
        print("=> ambiguous (partial overlap); rerun with longer --secs")


if __name__ == "__main__":
    main()
