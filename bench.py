#!/usr/bin/env python3
"""Benchmark: k-mers classified per second, end to end.

Runs the production engine (C++ host wall stage + device reliable DP +
C++ relaxation/expansion, depth-2 pipelined stream) over the committed
`medium` fixture (398 reads / ~4.0M k-mers), steady state: a continuous
stream of repeated passes (~12s), as in production streaming use.

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
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

BASELINE_KMERS_PER_SEC = 4.24e6  # reference ClassPro -T1, this machine


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


def main() -> None:
    _tpu_preflight()
    root = pathlib.Path(__file__).parent
    fx = root / "tests" / "fixtures" / "medium"

    import jax

    jax.config.update("jax_enable_x64", True)

    from classpro_tpu.estimation import build_global_model
    from classpro_tpu.io.fastk import load_histogram, open_profiles
    from classpro_tpu.io.fastx import read_fastx
    from classpro_tpu.tpu.engine import TpuEngine

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

    def run_stream(reps: int) -> None:
        B = eng.batch_size
        chunks = ((seqs[i:i + B], profs[i:i + B])
                  for _ in range(reps)
                  for i in range(0, len(seqs), B))
        for classes in eng.classify_stream(chunks):
            pass

    # warm-up / compile, then size each timed window to ~4s of stream;
    # report the median of 5 windows (this sandbox's wall-clock noise is
    # ~+-10% between identical runs)
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
    value = sorted(rates)[len(rates) // 2]

    # ---- parity smoke on the warm engine/backend (VERDICT r1 item 8) ----
    import gzip

    golden = gzip.decompress(
        (fx / "golden.class.gz").read_bytes()).decode().split("\n")
    got = eng.classify_chunk(seqs[:64], profs[:64])
    parity_ok = all(golden[4 * i + 3] == got[i] for i in range(64))

    # ---- end-to-end mode: file parse + profile decode inside the timed
    # window, warm process (VERDICT r1 item 4) --------------------------
    B = eng.batch_size
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
    # of 5 (same protocol as the steady-state number above)
    est_rate = run_e2e(1)
    e2e_reps = max(2, int(round(4.0 * est_rate / total_kmers)))
    e2e_rates = sorted(run_e2e(e2e_reps) for _ in range(5))
    e2e = e2e_rates[len(e2e_rates) // 2]

    rec = {
        "metric": "kmers_classified_per_sec",
        "value": round(value),
        "unit": "kmers/s",
        "vs_baseline": round(value / BASELINE_KMERS_PER_SEC, 3),
        "e2e": round(e2e),
        "e2e_vs_baseline": round(e2e / BASELINE_KMERS_PER_SEC, 3),
        "parity_ok": bool(parity_ok),
        # exactness-guard telemetry: reads recomputed by the exact
        # oracle across the whole bench, and the smallest positive
        # decision margin seen (a margin collapse on new data would
        # show here as flag-rate > 0 / min_margin near the 1e-5 eps)
        "guard_flagged": int(eng.guard_flagged),
        "min_margin": (None if eng.guard_min_margin == float("inf")
                       else float(eng.guard_min_margin)),
    }
    if os.environ.get("_CLASSPRO_BENCH_CHILD"):
        rec["platform"] = os.environ["_CLASSPRO_BENCH_CHILD"]
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
