#!/usr/bin/env python3
"""Benchmark: k-mers classified per second, end to end.

Runs the production engine (C++ host wall stage + device reliable DP +
C++ relaxation/expansion, depth-3 pipelined stream) over the committed
`medium` fixture (398 reads / ~4.0M k-mers), steady state: a continuous
stream of repeated passes (~4s windows), as in production streaming use.

Prints ONE JSON line:
  {"metric": "kmers_classified_per_sec", "value": N, "unit": "kmers/s",
   "vs_baseline": R, "e2e": N2, "e2e_vs_baseline": R2, "parity_ok": B}

vs_baseline divides by the best measured reference-binary throughput on
this machine (ClassPro -T1 on the same fixture: 4.24 Mk-mers/s — see
BASELINE_MEASURED.md; with threads the reference is slower here).

`value` is the steady-state stream rate (inputs pre-decoded — the
service framing).  `e2e` re-parses the FASTA and re-decodes the FASTK
profiles inside the timed window (warm process), matching what the
4.24M baseline's wall clock includes; both are reported per VERDICT
round 1 ("benchmark honesty").

`parity_ok` is a real-backend parity smoke: the warm engine's output
for the first 64 reads is compared byte-for-byte against the committed
reference golden, so backend numeric drift fails loudly in the bench
record itself (full-coverage equivalents live in tests/).

Robustness contract (VERDICT r4 item 1 — the round-4 driver bench died
at its timeout with NO output):
- the measurement runs on a worker thread; the MAIN thread stays
  signal-responsive, so SIGTERM/SIGINT (e.g. the driver's `timeout`)
  and the internal budget (CP_BENCH_BUDGET_S, default 1500s) always
  emit the JSON line with whatever phases completed, flagged
  ("interrupted"/"budget_exceeded", "phase", "windows");
- warmup is BOUNDED WORK: exactly ONE dataset-aware shape is warmed
  (the reference's benchmark.c:12-19 contract: timing is always
  reported); every other chunk geometry absorbs into it
  (engine._absorb_shape), so a cold service costs one first-execution
  build, not one per shape bucket.
"""

from __future__ import annotations

import json
import os
import pathlib
import signal
import subprocess
import sys
import threading
import time

BASELINE_KMERS_PER_SEC = 4.24e6  # reference ClassPro -T1, this machine

# partial record, updated in place as phases complete; the emitter
# prints whatever is here at the time (exactly once)
REC: dict = {
    "metric": "kmers_classified_per_sec",
    "value": None,
    "unit": "kmers/s",
    "vs_baseline": None,
    "phase": "init",
}
_EMITTED = threading.Event()


def _emit(**extra) -> None:
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    REC.update(extra)
    rec = {k: v for k, v in REC.items() if v is not None or k == "value"}
    if os.environ.get("_CLASSPRO_BENCH_CHILD"):
        rec["platform"] = os.environ["_CLASSPRO_BENCH_CHILD"]
    print(json.dumps(rec), flush=True)


def _tpu_preflight() -> None:
    """A down axon tunnel HANGS jax backend init for ~20 minutes
    (CLAUDE.md); probe device init in a bounded subprocess and fall back
    to the CPU backend (scrubbed env re-exec, same trick as the CLI's
    --platform cpu) so the bench always emits its JSON line.  The
    fallback is flagged in the output ("platform": "cpu-fallback") —
    its number is NOT the TPU headline."""
    if os.environ.get("_CLASSPRO_BENCH_CHILD"):
        return
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=180, capture_output=True)
        if r.returncode == 0:
            return
    except subprocess.TimeoutExpired:
        pass
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_CLASSPRO_BENCH_CHILD"] = "cpu-fallback"
    print("bench: TPU tunnel unreachable; falling back to the CPU "
          "backend (flagged in the JSON)", file=sys.stderr)
    os.execve(sys.executable, [sys.executable, __file__], env)


def _measure() -> None:
    """The whole measurement (worker thread).  Updates REC in place so
    an interrupt at any point still reports completed phases."""
    root = pathlib.Path(__file__).parent
    fx = root / "tests" / "fixtures" / "medium"

    import jax

    jax.config.update("jax_enable_x64", True)

    from classpro_tpu.estimation import build_global_model
    from classpro_tpu.io.fastk import load_histogram, open_profiles
    from classpro_tpu.io.fastx import read_fastx
    from classpro_tpu.tpu.engine import TpuEngine, _bucket, _bucket_m

    REC["phase"] = "load"
    gm = build_global_model(load_histogram(str(fx / "reads")))
    P = open_profiles(str(fx / "reads"))
    reads = list(read_fastx(str(fx / "reads.fasta.gz")))
    profs = [P.fetch(i) for i in range(P.nreads)]
    seqs = [r.seq for r in reads]
    total_kmers = sum(len(p) for p in profs)

    # CP_BENCH_BATCH: measurement knob for the chunk-size experiment
    # (RTT is paid per device program, so bigger chunks amortize it;
    # default 200 = the committed production setting)
    eng = TpuEngine(gm, batch_size=int(os.environ.get("CP_BENCH_BATCH",
                                                      "200")))
    B = eng.batch_size

    # ---- bounded warmup: ONE dataset-aware shape -----------------------
    # sample the wall stage over the first chunk to find this dataset's
    # max_m bucket, then warm exactly that (R, max_m); every other
    # chunk geometry (tail chunk, parity smoke) absorbs into it.
    REC["phase"] = "warmup"
    t0 = time.time()
    nrel_max = 1
    for i in range(min(B, len(seqs))):
        if len(profs[i]) == 0:
            continue
        _, nr = eng.wall.wall_stage(seqs[i].encode("ascii"), profs[i])
        nrel_max = max(nrel_max, nr)
    shape = (_bucket(B), _bucket_m(nrel_max))
    eng.warmup((shape,))
    REC["warmup_s"] = round(time.time() - t0, 1)
    REC["warmup_shape"] = list(shape)

    def run_stream(reps: int) -> None:
        chunks = ((seqs[i:i + B], profs[i:i + B])
                  for _ in range(reps)
                  for i in range(0, len(seqs), B))
        for classes in eng.classify_stream(chunks):
            pass

    # one full pass to absorb/settle every remaining shape (tail chunk),
    # then size each timed window to ~4s of stream; report the median of
    # up to 5 windows (this sandbox's wall-clock noise is ~+-10%)
    REC["phase"] = "steady"
    run_stream(1)
    t0 = time.time()
    run_stream(2)
    est = (time.time() - t0) / 2
    reps = max(2, int(round(4.0 / max(est, 1e-3))))
    rates = []
    for _ in range(5):
        t0 = time.time()
        run_stream(reps)
        rates.append(reps * total_kmers / (time.time() - t0))
        # incremental: an interrupt after any window reports the
        # median of the windows that completed
        value = sorted(rates)[len(rates) // 2]
        REC["value"] = round(value)
        REC["vs_baseline"] = round(value / BASELINE_KMERS_PER_SEC, 3)
        REC["windows"] = len(rates)

    # ---- parity smoke on the warm engine/backend (VERDICT r1 item 8) ----
    import gzip

    REC["phase"] = "parity"
    golden = gzip.decompress(
        (fx / "golden.class.gz").read_bytes()).decode().split("\n")
    got = eng.classify_chunk(seqs[:64], profs[:64])
    REC["parity_ok"] = bool(
        all(golden[4 * i + 3] == got[i] for i in range(64)))

    # ---- end-to-end mode: file parse + profile decode inside the timed
    # window, warm process (VERDICT r1 item 4) --------------------------
    REC["phase"] = "e2e"
    K = gm.kmer
    Pe = open_profiles(str(fx / "reads"))  # index in RAM = warm process

    def e2e_chunks(reps: int):
        # every pass re-parses the FASTA and re-decodes the profiles
        for _ in range(reps):
            buf, rid = [], 0
            for rec in read_fastx(str(fx / "reads.fasta.gz")):
                buf.append(rec.seq)
                rid += 1
                if len(buf) >= B:
                    plens = [max(len(s) - K + 1, 0) for s in buf]
                    yield buf, Pe.fetch_batch(
                        list(range(rid - len(buf), rid)), plens)
                    buf = []
            if buf:
                plens = [max(len(s) - K + 1, 0) for s in buf]
                yield buf, Pe.fetch_batch(
                    list(range(rid - len(buf), rid)), plens)

    def run_e2e(reps: int) -> float:
        t0 = time.time()
        for _ in eng.classify_stream(e2e_chunks(reps)):
            pass
        return reps * total_kmers / (time.time() - t0)

    # size each timed window to ~4s of continuous e2e stream, median
    # of up to 5 (same protocol as the steady-state number above)
    est_rate = run_e2e(1)
    e2e_reps = max(2, int(round(4.0 * est_rate / total_kmers)))
    e2e_rates = []
    for _ in range(5):
        e2e_rates.append(run_e2e(e2e_reps))
        e2e = sorted(e2e_rates)[len(e2e_rates) // 2]
        REC["e2e"] = round(e2e)
        REC["e2e_vs_baseline"] = round(e2e / BASELINE_KMERS_PER_SEC, 3)
        REC["e2e_windows"] = len(e2e_rates)

    # exactness-guard telemetry: reads recomputed by the exact oracle
    # across the whole bench, and the smallest positive decision margin
    # seen (a margin collapse on new data would show as flag-rate > 0 /
    # min_margin near the 1e-5 eps)
    REC["guard_flagged"] = int(eng.guard_flagged)
    REC["min_margin"] = (None if eng.guard_min_margin == float("inf")
                         else float(eng.guard_min_margin))
    REC["phase"] = "done"
    del REC["windows"], REC["e2e_windows"]


def main() -> None:
    _tpu_preflight()

    def on_signal(signum, frame):
        _emit(interrupted=signal.Signals(signum).name)
        os._exit(0)

    signal.signal(signal.SIGTERM, on_signal)
    signal.signal(signal.SIGINT, on_signal)

    budget = float(os.environ.get("CP_BENCH_BUDGET_S", "1500"))
    deadline = time.time() + budget
    err: list = []

    def work():
        try:
            _measure()
        except BaseException as e:  # surfaced below
            err.append(e)

    th = threading.Thread(target=work, daemon=True)
    th.start()
    # the main thread only waits — in short slices so signal handlers
    # and the internal budget stay live even while the worker is inside
    # a multi-minute blocking device call (a cold first execution)
    while th.is_alive():
        th.join(timeout=0.5)
        if time.time() > deadline and th.is_alive():
            _emit(budget_exceeded=True,
                  warmup_exceeded=(REC.get("phase") == "warmup"))
            os._exit(0)
    if err:
        _emit(error=f"{type(err[0]).__name__}: {err[0]}")
        raise err[0]
    _emit()


if __name__ == "__main__":
    main()
