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
        # --- argument/input refusal envelope (VERDICT r4 #7: the
        # test_cli_refusals battery's reference-side equivalents —
        # parse_arg error paths, EXT-probe refusal, usage exits) ---
        classpro(["-T0", f"-P{tiny}", fa], cwd=tiny)       # bad -T
        classpro(["-T1", "-c-1", f"-P{tiny}", fa], cwd=tiny)
        classpro(["-T1", "-r0", f"-P{tiny}", fa], cwd=tiny)
        classpro(["-T1", "-P/nonexistent", fa], cwd=tiny)  # bad -P
        classpro(["-T1", f"-P{tiny}", "nope.xyz"], cwd=tiny)  # EXT refuse
        classpro(["-T1", f"-P{tiny}", fa, fa], cwd=tiny)   # >1 input
        classpro(["-T1", f"-N/nonexistent/root", f"-P{tiny}", fa],
                 cwd=tiny)                                  # bad FASTK root
        classpro(["-v", "-s", "-T1", f"-P{tiny}", fa], cwd=tiny)
        # -s on FASTX (not .db/.dam): track-writing refusal path
        # profile/read length mismatch (ClassPro.c:184-187): truncate
        # one read's sequence while keeping its profile
        mm = os.path.join(top, "mismatch")
        fa_mm = stage_fixture("tiny", mm)
        import gzip as _g2
        lines = _g2.decompress(open(fa_mm, "rb").read()).decode().split("\n")
        lines[1] = lines[1][:100]
        with _g2.open(fa_mm, "wt") as f:
            f.write("\n".join(lines))
        classpro(["-T1", f"-P{mm}", fa_mm], cwd=mm)
        # --- second dispatch wave (VERDICT r4 #7: remaining reachable
        # ClassPro.c/io.c lines: usage, relative -P forms, MAX_READ_LEN,
        # short reads, .db container, thread-skip EOF, -T2 anno merge) --
        classpro([], cwd=tiny)                         # usage, 396-397
        classpro(["-T1", "-P.", fa], cwd=tiny)         # 471-476
        os.makedirs(os.path.join(tiny, "sub"), exist_ok=True)
        classpro(["-T1", "-P./sub", fa], cwd=tiny)     # 473-474
        classpro(["-T1", "-Psub", fa], cwd=tiny)       # 483-485
        classpro(["-T1", "-P.x", fa], cwd=tiny)        # 478-479 refusal
        np_ = __import__("numpy")
        from classpro_tpu.io.fastk import (histogram_from_counts as _hfc,
                                           write_histogram as _wh,
                                           write_profiles as _wp)
        from classpro_tpu.io.fastx import write_fasta as _wf

        def _mkds(d, reads_counts, K=40):
            os.makedirs(d, exist_ok=True)
            profs, recs = [], []
            rng = np_.random.default_rng(5)
            bases = np_.frombuffer(b"ACGT", np_.uint8)
            for i, counts in enumerate(reads_counts):
                counts = np_.asarray(counts, np_.uint16)
                profs.append(counts)
                L = len(counts) + K - 1 if len(counts) else 20
                seq = bases[rng.integers(0, 4, L)].tobytes().decode()
                recs.append((f"w2/{i}", "", seq))
            _wf(os.path.join(d, "reads.fasta"), recs)
            _wp(os.path.join(d, "reads"), profs, K)
            _wh(os.path.join(d, "reads"),
                _hfc(K, np_.concatenate([p for p in profs if len(p)]
                                        or [np_.full(100, 40)])))
            return recs

        # >MAX_READ_LEN FASTX refusal (185-186)
        big = os.path.join(top, "big")
        _mkds(big, [np_.full(61000, 40), np_.full(900, 40)])
        classpro(["-T1", f"-P{big}", "reads.fasta"], cwd=big)
        # short read rlen<=Km1 (215/225) among normal reads
        sh = os.path.join(top, "short")
        _mkds(sh, [np_.full(900, 40), np_.zeros(0), np_.full(900, 41)])
        classpro(["-T1", f"-P{sh}", "reads.fasta"], cwd=sh)
        # fasta truncated vs profile nreads, -T2: thread skip hits EOF
        # (107-108)
        tr = os.path.join(top, "trunc")
        recs = _mkds(tr, [np_.full(900, 40)] * 8)
        _wf(os.path.join(tr, "reads.fasta"), recs[:2])
        classpro(["-T2", f"-P{tr}", "reads.fasta"], cwd=tr)
        # true .db container (94-98, 167-171; short .db read 217-222;
        # io.c DB temp naming) with -s tracks and -T2 anno merge
        # (601-613, io.c merge_anno)
        from classpro_tpu.io.dazz import write_db
        dbd = os.path.join(top, "dbd")
        recs = _mkds(dbd, [np_.full(900, 40), np_.zeros(0),
                           np_.full(900, 41), np_.full(900, 39)])
        from classpro_tpu.io.fastx import read_fastx as _rfx2
        write_db(os.path.join(dbd, "reads"),
                 [(r.name + " " + r.comment if r.comment else r.name,
                   r.seq)
                  for r in _rfx2(os.path.join(dbd, "reads.fasta"))])
        classpro(["-s", "-T1", f"-P{dbd}", "reads.db"], cwd=dbd)
        classpro(["-s", "-T2", f"-P{dbd}", "reads.db"], cwd=dbd)
        classpro(["-s", "-T2", f"-P{dam}", "reads.dam"], cwd=dam)
        classpro(["-T1", f"-P{dam}", "reads.dam", "reads.dam"],
                 cwd=dam)                              # 432-433
        # DB-mode error paths + multi-file prolog (io.c:153-171,
        # ClassPro.c:170, 602).  NOTE: unwritable-dir Fopen failures
        # are NOT reachable here — the battery runs as root, which
        # bypasses permission checks (dispatched fault-injection-only
        # in COVERAGE.md).
        classpro(["-s", "-T4", f"-P{dbd}", "reads.db"], cwd=dbd)
        db2 = os.path.join(top, "db2")
        shutil.copytree(dbd, db2)
        lines = open(os.path.join(db2, "reads.db")).read().splitlines()
        nr = int(lines[1].split()[0])
        lines[0] = f"files = {2:9d}"
        lines[1] = (f"  {nr // 2:9d} readsA prologA\n"
                    f"  {nr:9d} readsB prologB")
        open(os.path.join(db2, "reads.db"), "w").write(
            "\n".join(lines) + "\n")
        classpro(["-T2", f"-P{db2}", "reads.db"], cwd=db2)
        db3 = os.path.join(top, "db3")
        shutil.copytree(dbd, db3)
        os.remove(os.path.join(db3, ".reads.bps"))   # Open_DB fail
        classpro(["-T1", f"-P{db3}", "reads.db"], cwd=db3)
        db4 = os.path.join(top, "db4")
        shutil.copytree(dbd, db4)
        shutil.copy(os.path.join(db4, "reads.db"),
                    os.path.join(db4, "reads.1.db"))  # block refusal
        for src, dst in (("reads.prof", "reads.1.prof"),
                         ("reads.hist", "reads.1.hist"),
                         (".reads.pidx.1", ".reads.1.pidx.1"),
                         (".reads.prof.1", ".reads.1.prof.1")):
            shutil.copy(os.path.join(db4, src), os.path.join(db4, dst))
        classpro(["-T1", f"-P{db4}", "reads.1.db"], cwd=db4)
        db5 = os.path.join(top, "db5")
        shutil.copytree(dbd, db5)
        _wp(os.path.join(db5, "reads"),               # nreads mismatch
            [np_.full(900, 40)] * 5, 40)
        classpro(["-T1", f"-P{db5}", "reads.db"], cwd=db5)
        dam2 = os.path.join(top, "dam2")
        shutil.copytree(dam, dam2)
        os.remove(os.path.join(dam2, ".reads.hdr"))   # .hdr fail
        classpro(["-T1", f"-P{dam2}", "reads.dam"], cwd=dam2)
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
