"""Phase timing / resource reporting (ref benchmark.c:12-96).

The reference prints, per phase and in total: user+system CPU time,
monotonic wall clock, CPU utilisation percent, and peak RSS.  Same
report here via the ``resource`` module, used by the CLI's -v mode and
available to any pipeline stage:

    t = PhaseTimer()
    ... work ...
    print(t.report())            # since last report (phase)
    print(t.report(total=True))  # since construction
"""

from __future__ import annotations

import resource
import time


def _now():
    ru = resource.getrusage(resource.RUSAGE_SELF)
    return (ru.ru_utime, ru.ru_stime, time.monotonic())


class PhaseTimer:
    def __init__(self):
        self._t0 = _now()
        self._last = self._t0

    def report(self, total: bool = False) -> str:
        base = self._t0 if total else self._last
        u0, s0, w0 = base
        u1, s1, w1 = _now()
        self._last = (u1, s1, w1)
        du, ds, dw = u1 - u0, s1 - s0, w1 - w0
        pct = 100.0 * (du + ds) / dw if dw > 0 else 0.0
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        label = "Total Resources" if total else "Resources"
        return (f"{label}: user {du:.3f} (s) sys {ds:.3f} (s) "
                f"wall {dw:.3f} (s) {pct:.1f}% {rss_mb} MB max rss")
