#!/usr/bin/env python3
"""gcov branch-coverage harness for the reference hot-path files.

Answers "which branches of the reference does our parity battery actually
exercise?" (VERDICT round 1, item 1).  Workflow:

    python3 tools/build_reference.py --coverage     # -> /tmp/refcov (-O0 --coverage)
    python3 tools/coverage_report.py --run          # run the battery, accumulate .gcda
    python3 tools/coverage_report.py --report       # parse gcov -> stdout table
    python3 tools/coverage_report.py --report --md  # regenerate COVERAGE.md body

The battery = committed fixtures (tiny, medium), the parity-sweep configs,
every crafted branch dataset under tests/fixtures/branch/, and the flag
variants (-c, -M, -s on a .dam, aux tools).  Every ClassPro invocation in
the battery is byte-identity-checked against our classifier elsewhere
(tools/parity_sweep.py + tests); this script only measures which reference
code the battery reaches.

Target files: wall.c class_rel.c class_unrel.c context.c seed.c hist.c
prob.c util.c bessel.c (the decision path).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import os
import re
import shutil
import subprocess
import sys
import tempfile

REFCOV = "/tmp/refcov"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(REPO, "tests", "fixtures")

HOT_FILES = ["wall.c", "class_rel.c", "class_unrel.c", "context.c",
             "seed.c", "hist.c", "prob.c", "util.c", "ClassPro.c", "io.c"]

SWEEP_CONFIGS = [  # mirrors tools/parity_sweep.py
    (15, 31_000, 5),
    (60, 45_000, 9),
    (40, 80_000, 13),
    (25, 35_000, 21),
]


def run(cmd, cwd=None, env=None):
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(f"FAILED ({r.returncode}): {' '.join(map(str, cmd))}\n{r.stderr[-2000:]}",
              file=sys.stderr)
    return r


def stage_fixture(name: str, dest: str) -> str:
    src = os.path.join(FIX, name)
    os.makedirs(dest, exist_ok=True)
    for fn in os.listdir(src):
        p = os.path.join(src, fn)
        if fn.endswith(".gz") and not fn.endswith("fasta.gz"):
            with gzip.open(p, "rb") as f:
                open(os.path.join(dest, fn[:-3]), "wb").write(f.read())
        else:
            shutil.copy(p, dest)
    return os.path.join(dest, "reads.fasta.gz")


def classpro(args, cwd):
    return run([os.path.join(REFCOV, "ClassPro"), *args], cwd=cwd)


def battery() -> None:
    for f in glob.glob(os.path.join(REFCOV, "*.gcda")):
        os.remove(f)
    with tempfile.TemporaryDirectory() as top:
        # --- committed fixtures, with flag variants ---
        tiny = os.path.join(top, "tiny")
        fa = stage_fixture("tiny", tiny)
        classpro(["-v", "-T1", f"-P{tiny}", fa], cwd=tiny)
        classpro(["-v", "-T1", "-c30", f"-P{tiny}", fa], cwd=tiny)
        classpro(["-T1", "-r5000", f"-P{tiny}", fa], cwd=tiny)
        classpro(["-T4", f"-P{tiny}", fa], cwd=tiny)
        classpro(["-v", "-T1", f"-M{tiny}/hisim.model", f"-P{tiny}", fa],
                 cwd=tiny)
        # FASTQ input + separate FASTK root (-N) paths (ClassPro.c/io.c)
        import gzip as _gzip

        from classpro_tpu.io.fastx import read_fastx as _rfx
        fq = os.path.join(tiny, "reads2.fastq.gz")
        with _gzip.open(fq, "wt") as f:
            for r in _rfx(fa):
                f.write(f"@{r.name} {r.comment}\n{r.seq}\n+\n"
                        f"{'I' * len(r.seq)}\n")
        classpro(["-T1", f"-N{tiny}/reads", f"-P{tiny}", fq], cwd=tiny)
        med = os.path.join(top, "medium")
        fa_m = stage_fixture("medium", med)
        classpro(["-T1", f"-P{med}", fa_m], cwd=med)
        # truth / eval tools on the fixture outputs
        est = fa[: -len(".fasta.gz")] + ".class"
        tru = os.path.join(tiny, "reads.truth.class")
        run([os.path.join(REFCOV, "class2acc"), est, tru])
        run([os.path.join(REFCOV, "class2acc"), "-e0", "-s", "-preads",
             "-w500", os.path.basename(est), "reads.truth.class"], cwd=tiny)
        run([os.path.join(REFCOV, "ClassGS"), os.path.join(tiny, "reads"),
             "6", "21", "41"])
        run([os.path.join(REFCOV, "class2cns"), est,
             os.path.join(tiny, "reads")])
        # --- DAZZ .dam mode with -s seeds + consumer tools ---
        dam = os.path.join(top, "dam")
        os.makedirs(dam)
        sys.path.insert(0, REPO)
        from classpro_tpu.io.dazz import write_dam
        from classpro_tpu.io.fastx import read_fastx
        recs = [(f"{r.name} {r.comment}".strip(), r.seq)
                for r in read_fastx(fa)]
        write_dam(os.path.join(dam, "reads"), recs)
        for fn in ("reads.hist", "reads.prof", ".reads.pidx.1",
                   ".reads.prof.1"):
            shutil.copy(os.path.join(tiny, fn), dam)
        classpro(["-s", "-T1", f"-P{dam}", "reads.dam"], cwd=dam)
        run([os.path.join(REFCOV, "ShowSeeds"), "reads", "reads.dam"],
            cwd=dam)
        run([os.path.join(REFCOV, "RepDepAnno"), "reads", "reads.dam"],
            cwd=dam)
        # --- parity-sweep regimes ---
        for cov, glen, seed in SWEEP_CONFIGS:
            d = os.path.join(top, f"sweep_{seed}")
            run([sys.executable, "-m", "classpro_tpu.cli", "simulate", d,
                 "--genome-len", str(glen), "--coverage", str(cov),
                 "--seed", str(seed)])
            classpro(["-T1", f"-P{d}", "reads.fasta"], cwd=d)
        # --- crafted branch datasets (committed; see make_branch_fixtures) ---
        for d in sorted(glob.glob(os.path.join(FIX, "branch", "*"))):
            if not os.path.isdir(d):
                continue
            bd = os.path.join(top, "branch_" + os.path.basename(d))
            stage_fixture(os.path.join("branch", os.path.basename(d)), bd)
            extra = []
            aj = os.path.join(d, "args.json")
            if os.path.exists(aj):   # per-fixture ClassPro args (psum0)
                import json as _json
                a = _json.load(open(aj))
                if a.get("coverage"):
                    extra.append(f"-c{a['coverage']}")
                if a.get("read_len"):
                    extra.append(f"-r{a['read_len']}")
            classpro(["-T1", *extra, f"-P{bd}", "reads.fasta.gz"], cwd=bd)
    print("battery done; .gcda accumulated in", REFCOV)


def fuzz_battery(n: int, seed0: int) -> None:
    """Accumulate coverage from the randomized fuzz corpora (the
    tools/parity_fuzz.py generators: plain crafted batches across
    container formats, the DAZZ -s surface, the random -M models) ON
    TOP of the existing .gcda — run `--run` first for the base battery,
    then this, then `--report` for the combined table."""
    sys.path.insert(0, REPO)
    import tools.parity_fuzz as pf

    with tempfile.TemporaryDirectory() as top:
        for seed in range(seed0, seed0 + n):
            d = os.path.join(top, f"f{seed}")
            _, fname = pf.build(seed, d)
            classpro(["-T1", f"-P{d}", fname], cwd=d)
        m = max(4, n // 3)
        for seed in range(seed0, seed0 + m):
            d = os.path.join(top, f"d{seed}")
            pf.build(seed, d, dam=True)
            classpro(["-s", "-T1", f"-P{d}", "reads.dam"], cwd=d)
        for seed in range(seed0, seed0 + m):
            d = os.path.join(top, f"m{seed}")
            _, fname = pf.build(seed, d)
            pf.write_random_model(seed, os.path.join(d, "rand.model"))
            classpro(["-T1", f"-M{d}/rand.model", f"-P{d}", fname],
                     cwd=d)
    print(f"fuzz battery done ({n} plain + {m} dam + {m} model seeds); "
          f".gcda accumulated in", REFCOV)


LINE_RE = re.compile(r"^\s*(\d+|#####|=====|-):\s*(\d+):")


def parse_gcov(path: str):
    """Return (covered, uncovered) executable line-number lists."""
    covered, uncovered = [], []
    with open(path) as f:
        for line in f:
            m = LINE_RE.match(line)
            if not m:
                continue
            tag, lineno = m.group(1), int(m.group(2))
            if tag == "-":
                continue
            if tag in ("#####", "====="):
                uncovered.append(lineno)
            else:
                covered.append(lineno)
    return covered, uncovered


def ranges(nums):
    out, start, prev = [], None, None
    for n in nums:
        if start is None:
            start = prev = n
        elif n == prev + 1:
            prev = n
        else:
            out.append((start, prev))
            start = prev = n
    if start is not None:
        out.append((start, prev))
    return ",".join(f"{a}" if a == b else f"{a}-{b}" for a, b in out)


def report(md: bool = False) -> None:
    # gcov for the ClassPro object group (covers all #included hot files)
    run(["gcov", "-b", "ClassPro-ClassPro"], cwd=REFCOV)
    rows = []
    for fn in HOT_FILES:
        g = os.path.join(REFCOV, fn + ".gcov")
        if not os.path.exists(g):
            rows.append((fn, None))
            continue
        covered, uncovered = parse_gcov(g)
        rows.append((fn, (covered, uncovered)))
    out = []
    out.append(f"| file | exec lines | hit | % | unhit line ranges |")
    out.append(f"|---|---|---|---|---|")
    for fn, r in rows:
        if r is None:
            out.append(f"| {fn} | (no gcov output) | | | |")
            continue
        cov, unc = r
        tot = len(cov) + len(unc)
        pct = 100.0 * len(cov) / tot if tot else 0.0
        out.append(f"| {fn} | {tot} | {len(cov)} | {pct:.1f} | {ranges(unc)} |")
    print("\n".join(out))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--fuzz", type=int, default=0, metavar="N",
                    help="accumulate N fuzz seeds (+N/3 dam, +N/3 model)"
                         " on top of the existing .gcda")
    ap.add_argument("--seed0", type=int, default=9000)
    ap.add_argument("--report", action="store_true")
    ap.add_argument("--md", action="store_true")
    a = ap.parse_args()
    if a.run:
        battery()
    if a.fuzz:
        fuzz_battery(a.fuzz, a.seed0)
    if a.report:
        report(a.md)
    if not (a.run or a.report or a.fuzz):
        ap.print_help()


if __name__ == "__main__":
    main()
