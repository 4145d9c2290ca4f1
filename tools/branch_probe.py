#!/usr/bin/env python3
"""Crafted-dataset probe for unhit reference branches (dev-time).

Round-1 verdict: byte-identity was only proven on one synthetic generator,
with no evidence of WHICH reference branches the sweep exercises.  This
tool crafts surgical datasets — hand-built count profiles + histograms,
which ClassPro accepts as-is — aimed at the specific unhit-but-reachable
lines found by tools/coverage_report.py:

  class_rel.c 656-668 / 769-781  rescue re-run still-no-H + D->H flip
  class_rel.c 679-688 / 799-800  all-H vs mean-cov demote-to-D
  class_rel.c 706-710 / 817-821  >=70%-H demote (H->D, D->R)
  class_rel.c 873                M == 0 early return
  class_unrel.c 45,50,79         est_cov fallbacks (no reliable D/H nbr)
  wall.c 366,457                 find_gain/find_drop FINAL-thres reject
  wall.c 551,565-573             bs_eintvl left recursion; true duplicate
                                 E-interval compaction
  wall.c 1044                    over-corrected interval (ccb/cce==32767)
  hist.c 99-100                  tallest histogram peak is the H peak

Usage:
  python3 tools/branch_probe.py --probe            # which scenario hits what
  python3 tools/branch_probe.py --emit             # write tests/fixtures/branch/

--probe runs each scenario alone through /tmp/refcov/ClassPro (fresh
.gcda) and prints the newly-hit target lines.  --emit writes each
scenario as a committed fixture with the reference's golden .class.
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

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from classpro_tpu.io.fastk import (histogram_from_counts, write_histogram,
                                   write_profiles)
from classpro_tpu.io.fastx import write_fasta

REFCOV = "/tmp/refcov"
K = 40

TARGETS = {
    "class_rel.c": [327, 330, 331, 656, 665, 666, 679, 686, 687, 706,
                    769, 778, 779, 799, 817, 873],
    "class_unrel.c": [45, 50, 79],
    "wall.c": [366, 457, 551, 565, 569, 1044],
    "hist.c": [99, 100],
}


def _seq(rng: np.random.Generator, n: int, runs=None) -> str:
    """Random sequence, optionally with low-complexity runs.

    ``runs``: list of ints (12bp homopolymer at that position) or tuples
    (start, length, unit) with unit 1=HP, 2=dinuc, 3=trinuc satellite."""
    b = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)].copy()
    for r in runs or []:
        p, ln, unit = r if isinstance(r, tuple) else (r, 12, 1)
        pat = b[p: p + unit]
        for q in range(p, min(p + ln, n)):
            b[q] = pat[(q - p) % unit]
    return b.tobytes().decode()


def _hist_counts(rng, h_cov, d_cov, n_h=15000, n_d=30000, e_n=20000):
    """Per-distinct-kmer counts giving an H/D double-peak histogram."""
    return np.concatenate([
        rng.poisson(h_cov, n_h),
        rng.poisson(d_cov, n_d),
        rng.integers(1, 4, e_n),
    ]).clip(1, 32767)


def steps(levels, seg=70):
    return np.concatenate([np.full(seg, c) for c in levels])


# --- scenario builders: return (hist_counts, [(counts, hp_at)]) ---------

def sc_uniform_grid(rng):
    reads = [(np.full(900, c), None)
             for c in (24, 27, 29, 31, 33, 35, 37, 44, 55, 65)]
    return _hist_counts(rng, 20, 40), reads


def sc_drift(rng):
    reads = [
        (steps([22, 26, 30, 34, 38]), None),
        (steps([38, 34, 30, 26, 22]), None),
        (steps([20, 25, 30, 35, 40]), None),
        (steps([24, 29, 34, 39, 44]), None),
        (steps([26, 31, 36, 31, 26]), None),
        (steps([30, 36, 42, 36, 30]), None),
        (np.clip(30 + rng.integers(-1, 2, 900), 1, None), None),
        (np.clip(33 + rng.integers(-2, 3, 900), 1, None), None),
    ]
    return _hist_counts(rng, 20, 40), reads


def sc_high(rng):
    reads = [
        (np.full(900, 100), None),                       # M == 0, all R
        (steps([100, 90, 100], 120), None),
        (steps([100, 50, 100], 120), None),              # unrel fallbacks
        (steps([100, 5, 100], 120), None),
        (np.clip(rng.poisson(90, 900), 1, None), None),
    ]
    return _hist_counts(rng, 20, 40), reads


def sc_errors(rng):
    """Clustered error dips inside homopolymers: multi-error recovery,
    duplicate E-intervals, FINAL-thres pair rejects."""
    reads = []
    for gap in (3, 8, 15, 30):
        c = np.full(1000, 40)
        for at in (200, 600):
            c[at: at + K] -= 36           # error k-mers dip
            c[at + gap: at + gap + K] -= np.minimum(c[at + gap: at + gap + K] - 1, 36)
        reads.append((np.clip(c, 1, None), [160 + 39, 560 + 39]))
    c = np.full(1000, 40)
    c[300: 300 + K] = 2
    c[300 + K: 300 + K + 5] = 20          # half-recovered edge
    reads.append((c, [260 + 39]))
    return _hist_counts(rng, 20, 40), reads


def sc_overflow(rng):
    """Counts near MAX_KMER_CNT with a rise: over-corrected intervals."""
    h, d = 15000, 30000
    reads = []
    c = np.concatenate([np.full(300, 30000),
                        np.full(300, 30000) + np.arange(300) * 9]).clip(1, 32600)
    reads.append((c, None))
    c2 = np.concatenate([np.full(200, 29000),
                         np.linspace(29000, 32700, 200).astype(int),
                         np.full(200, 32700)])
    reads.append((c2, None))
    reads.append((np.full(600, 31000), None))
    hist = np.concatenate([rng.poisson(h, 2000),
                           rng.poisson(d, 6000),
                           rng.integers(1, 4, 1000)]).clip(1, 32767)
    return hist, reads


def sc_tall_h(rng):
    """Histogram whose tallest peak is H (hist.c:94-101 else-branch)."""
    hist = np.concatenate([
        rng.poisson(20, 40000),           # tall H peak
        rng.poisson(40, 12000),           # smaller D peak
        rng.integers(1, 4, 10000),
    ]).clip(1, 32767)
    reads = [(np.full(900, c), None) for c in (20, 30, 40, 60)]
    return hist, reads


def sc_longrun(rng):
    """Context runs >= K-1 next to count changes: the run-length-adjusted
    pair search in find_gain/find_drop degenerates (j <= i -> return
    false, wall.c:354-366/445-457); also 130bp homopolymer for the
    127-cap."""
    reads = []
    for run_len, unit in ((50, 1), (90, 1), (130, 1), (60, 2), (90, 3)):
        c = np.full(1000, 40)
        for at in (300, 700):
            c[at: at + K] = 3            # dip right at the run edge
        # homopolymer / satellite run placed so its end coincides with
        # the drop wall at profile pos 300 (seq pos 300+K-1)
        reads.append((c, [(300 + K - 1 - run_len, run_len, unit),
                          (700 + K - 1 - 8, 8, unit)]))
    return _hist_counts(rng, 20, 40), reads


def sc_dips(rng):
    """Dense error-dip clusters: multi-error recovery duplicates
    (remove_duplicates compaction, wall.c:563-573) + bs_eintvl left
    recursion (551)."""
    reads = []
    for ndip, width in ((6, K), (10, 20), (8, 5), (12, 2), (7, K + 10)):
        c = np.full(2000, 40)
        pos = np.sort(rng.choice(np.arange(K, 2000 - 2 * K), ndip,
                                 replace=False))
        for p in pos:
            c[p: p + width] = int(rng.integers(1, 5))
        reads.append((np.clip(c, 1, None), None))
    return _hist_counts(rng, 20, 40), reads


def sc_smallk(rng):
    """K=16 profiles: with K-1 < MAX_N_LC the run-length-adjusted pair
    search can degenerate (j <= i in find_gain / j >= i in find_drop,
    pristine wall.c:354-355/445-446 = patched 365-366/456-457), which is
    unreachable at K=40 (l caps at MAX_N_LC=20 < K-1).  Runs end exactly
    at the drop wall's left-context position (profile i -> seq i+K-2)
    and start at the gain wall (seq position = profile position)."""
    k = 16
    reads = []
    for unit, run in ((1, 20), (1, 30), (2, 40), (3, 60)):
        c = np.full(1000, 40)
        c[300: 330] = 3
        runs = [(300 + k - 2 - run + 1, run, unit),   # ends at seq 300+k-2
                (330, run, unit)]                     # starts at gain wall
        reads.append((c, runs))
    c = np.full(1000, 40)
    c[500: 540] = 2
    reads.append((c, [(480, 60, 1)]))                 # run spanning the dip
    return _hist_counts(rng, 20, 40), reads, k


def sc_stepdip(rng):
    """Error dips whose floor has an internal step: the step becomes an
    O-wall INSIDE an S-paired E-interval, so the multi-error recovery's
    backward GAIN probe searches (b, i) with i < the stored pair's e —
    the same-b/smaller-e left recursion of bs_eintvl (pristine
    wall.c:539-540 = patched 550-551)."""
    reads = []
    for f1, f2 in ((2, 12), (1, 10), (3, 14), (2, 20), (1, 8)):
        for half in (K // 2, K // 3, 2 * K // 3):
            c = np.full(900, 40)
            c[400: 400 + half] = f1
            c[400 + half: 400 + K] = f2
            reads.append((c.copy(), None))
            c2 = np.full(900, 40)
            c2[400: 400 + half] = f2          # step down inside dip
            c2[400 + half: 400 + K] = f1
            reads.append((c2, None))
    return _hist_counts(rng, 20, 40), reads


def _random_batch(seed: int):
    """Randomized step/ramp/noise pattern batch for branch search."""
    rng = np.random.default_rng(seed)
    reads = []
    for _ in range(150):
        kind = rng.integers(0, 4)
        if kind == 0:      # random step levels
            nseg = int(rng.integers(1, 7))
            levels = rng.integers(8, 75, nseg)
            segs = rng.integers(45, 220, nseg)
            c = np.concatenate([np.full(s, l) for s, l in zip(segs, levels)])
        elif kind == 1:    # ramp
            a, b = rng.integers(10, 70, 2)
            c = np.linspace(a, b, int(rng.integers(200, 900))).astype(int)
        elif kind == 2:    # plateau with shoulders
            lo, hi = sorted(rng.integers(8, 75, 2))
            w = int(rng.integers(60, 300))
            c = np.concatenate([np.full(w, lo), np.full(w, hi),
                                np.full(w, lo)])
        else:              # noisy level
            lvl = int(rng.integers(10, 70))
            c = np.clip(lvl + rng.integers(-3, 4, int(rng.integers(200, 900))),
                        1, None)
        if rng.random() < 0.4:  # error dips (possibly clustered)
            c = c.copy()
            for _ in range(int(rng.integers(1, 5))):
                if len(c) <= 2 * K:
                    break
                p = int(rng.integers(K, len(c) - K))
                c[p: p + int(rng.integers(1, K))] = rng.integers(1, 5)
        reads.append((np.clip(c, 1, 32767), None))
    h = int(rng.integers(12, 40))
    return _hist_counts(rng, h, 2 * h), reads


def _extreme_batch(seed: int):
    """Extreme-magnitude batch targeting the device DP's DISCRETE
    semantics (ref class_rel.c:321-336 normalization): the init-cell
    softmax-underflow kill, the exp()-underflow cutoff at raw score
    ~-745.13, the denormal band below ~-708, and the H<D<R count gate.
    Count levels drawn log-uniform over [6, 32767] put the four state
    scores hundreds-to-thousands of nats apart, so SOME-but-not-all
    states cross C's underflow lines — the fuzz-seed-21517 bug class
    (rel_dev2._lane_init), which the continuous margin guard cannot
    see because the flipped decision has a large margin."""
    rng = np.random.default_rng(np.uint64(seed) ^ np.uint64(0x5EED5EED))

    def loglvl(lo, hi):
        return int(np.exp(rng.uniform(np.log(lo), np.log(hi))))

    reads = []
    for _ in range(120):
        kind = rng.integers(0, 4)
        if kind == 0:      # extreme step levels
            nseg = int(rng.integers(2, 9))
            levels = [loglvl(6, 32767) for _ in range(nseg)]
            segs = rng.integers(30, 160, nseg)
            c = np.concatenate([np.full(s, l)
                                for s, l in zip(segs, levels)])
        elif kind == 1:    # huge ramp, either direction
            a, b = loglvl(8, 200), loglvl(200, 32767)
            if rng.random() < 0.5:
                a, b = b, a
            c = np.linspace(a, b, int(rng.integers(150, 700))).astype(int)
        elif kind == 2:    # sane plateau with one extreme excursion
            lvl = int(rng.integers(10, 60))
            c = np.full(int(rng.integers(300, 900)), lvl)
            p = int(rng.integers(K, len(c) - K))
            c[p: p + int(rng.integers(5, 3 * K))] = loglvl(100, 32767)
        else:              # noisy high level
            lvl = loglvl(60, 5000)
            c = np.clip(lvl + rng.integers(-(lvl // 8), lvl // 8 + 1,
                                           int(rng.integers(150, 600))),
                        1, None)
        if rng.random() < 0.5:  # deep error dips
            c = c.copy()
            for _ in range(int(rng.integers(1, 4))):
                if len(c) <= 2 * K:
                    break
                p = int(rng.integers(K, len(c) - K))
                c[p: p + int(rng.integers(1, K))] = rng.integers(1, 5)
        reads.append((np.clip(c, 1, 32767), None))
    h = int(rng.integers(12, 40))
    return _hist_counts(rng, h, 2 * h), reads


def sc_psum0(rng):
    """The all-16-underflow 'No possible state' fallback
    (class_rel.c:326-331), hit for real (gcov: 327-331 executed).

    Requires -c186 -r4500 (ARGS below).  Geometry (COV = E1/H93/D186/
    R254): interval A = [60 x100 | +2-ramp | 161 ...] (45 kbp) kills
    E (logfact) and R (binom(60,254,.99) = -758 < exp-underflow) at
    the init cell, leaving {H, D}.  Interval X = [80 x100 | +2-ramp |
    161 ...] (14.5 kbp): its E emission underflows; its H argmax comes
    from the D-init predecessor (st_H=80 @ offset pos) and its D
    argmax from the H-init predecessor (st_H=161 @ adjacent pos), so
    BOTH hit the H<D<R gate at equality (curr=161 vs st=161,
    class_rel.c:496-498) and die; R's best predecessor is H-init whose
    st_D = 161+93 = 254 >= st_R -> gate-killed too.  All four dp at X
    are then -inf, so interval B's _update (flat 60 x300) computes
    psum == 0 -> the fallback fires.  The -2-slope ramps stay under
    MIN_CNT_CHANGE so A/X/B are single clean intervals; the A|X and
    X|B steps are OTHERS walls; all three intervals are reliable.
    Deterministic reference output verified (3 runs byte-equal): the
    C's all-dead traceback reads a never-written bt row = fresh zero
    pages -> all-ERROR + rpos (see exact/rel.py traceback note)."""
    A = np.concatenate([np.full(100, 60), 60 + 2 * np.arange(1, 51),
                        np.full(45000 - 150, 161)])
    X = np.concatenate([np.full(100, 80), 80 + 2 * np.arange(1, 41),
                        np.full(14500 - 140, 161)])
    B = np.full(300, 60)
    reads = [(np.concatenate([A, X, B]), None)]
    return _hist_counts(rng, 93, 186), reads


def sc_psum0multi(rng):
    """Workspace-ordering probe for the psum0 all-dead traceback
    (ADVICE r4): the C's -T1 loop reuses bt across reads, and an
    all-dead final cell reads a bt row this read never wrote — so a
    psum0 read AFTER a read with MORE rel intervals (6 here) could in
    principle see the previous read's path bytes instead of fresh zero
    pages.  Measured 2026-08-20: reference output is byte-identical
    across solo/multi orderings AND -T1/-T2 (the relaxation sweeps
    override the rel-DP assignment for this profile shape), and our
    fresh-workspace pin matches it byte-for-byte.  This fixture keeps
    that ordering case pinned."""
    hist, reads = sc_psum0(rng)
    psum0_prof = reads[0][0]
    r0 = np.concatenate([np.full(800, 93 if i % 2 == 0 else 161)
                         for i in range(6)])
    return hist, [(r0, None), (psum0_prof, None)]


def _cap_batch(seed: int):
    """Boundary-cap batch: GLOBAL_COV[REPEAT] pushed against the 255
    hard cap (calc_init_thres exits above it, wall.c:174-178) and
    counts pinned at/near MAX_KMER_CNT=32767 (the logfact clamp,
    prob.c:22-31, and the over-correction exclusion, wall.c:1044).
    Drawn covD in [168, 186] puts CMAX=covR in [232, 254]; count
    levels cluster at {covR-2..covR+2, 32760..32767} so the wall scan's
    both->=covR skip, the cthres table's cout<CMAX edge, and the DP's
    max_cc>=COV[REPEAT] absolute-R clause all sit one count from
    flipping."""
    rng = np.random.default_rng(np.uint64(seed) ^ np.uint64(0xCAB0CAB0))
    import math as _math

    covd = int(rng.integers(168, 187))
    covr = covd + int(5 * _math.sqrt(covd))

    def lvl():
        r = rng.random()
        if r < 0.35:
            return int(covr + rng.integers(-3, 4))
        if r < 0.55:
            return int(rng.integers(32760, 32768))
        if r < 0.75:
            return int(rng.integers(covd - 10, covd + 11))
        return int(np.exp(rng.uniform(np.log(6), np.log(32767))))

    reads = []
    for _ in range(120):
        nseg = int(rng.integers(1, 8))
        segs = rng.integers(40, 220, nseg)
        c = np.concatenate([np.full(s, lvl()) for s in segs])
        if rng.random() < 0.4:   # deep dips at the cap boundary too
            c = c.copy()
            for _ in range(int(rng.integers(1, 4))):
                if len(c) <= 2 * K:
                    break
                p = int(rng.integers(K, len(c) - K))
                c[p: p + int(rng.integers(1, K))] = rng.integers(1, 5)
        reads.append((np.clip(c, 1, 32767), None))
    h = covd // 2
    hist = np.concatenate([
        rng.poisson(h, 30000), rng.poisson(covd, 60000),
        rng.integers(1, 4, 30000)]).clip(1, 32767)
    return hist, reads


def make_search_scenario(seed: int):
    return lambda rng: _random_batch(seed)


# randomized batches that hit rescue/demote branches (probe log in
# COVERAGE.md); stable: _random_batch seeds numpy's Generator directly
PROMOTED_SEEDS = (1, 9, 10, 15, 108)

SCENARIOS = {
    "uniform": sc_uniform_grid,
    "drift": sc_drift,
    "high": sc_high,
    "errors": sc_errors,
    # NOTE: no "overflow" scenario: wall.c's over-correction clamp continue
    # (pristine 1033) is unreachable — it needs MAX(ccb,cce)==32767 with
    # cb/ce < GLOBAL_COV[REPEAT], but calc_init_thres exits when
    # GLOBAL_COV[REPEAT] > 255 (wall.c:174-176) and gains within an
    # interval are bounded by sub-MIN_CNT_CHANGE rises (bigger jumps
    # always become walls), so corrected counts cannot reach 32767.
    "tallh": sc_tall_h,
    "longrun": sc_longrun,
    "dips": sc_dips,
    "smallk": sc_smallk,
    "stepdip": sc_stepdip,
    "psum0": sc_psum0,
    "psum0multi": sc_psum0multi,
}

# extra ClassPro/classify arguments a scenario needs (also
# written to the fixture as args.json for test_branch_parity)
SCENARIO_ARGS = {
    "psum0": {"coverage": 186, "read_len": 4500},
    "psum0multi": {"coverage": 186, "read_len": 4500},
}

def _ref_args(name):
    a = SCENARIO_ARGS.get(name, {})
    out = []
    if a.get("coverage"):
        out.append(f"-c{a['coverage']}")
    if a.get("read_len"):
        out.append(f"-r{a['read_len']}")
    return out
for _s in PROMOTED_SEEDS:
    SCENARIOS[f"search{_s}"] = make_search_scenario(_s)

# promoted extreme-count seeds (see _extreme_batch): gcov-verified to
# flood the dead-state predecessor branch (class_rel.c:311) via
# exp()-underflow kills — the discrete-semantics regime of fuzz seed
# 21517 that the continuous margin guard cannot certify
for _s in (5, 8):
    SCENARIOS[f"extreme{_s}"] = (
        lambda rng, s=_s: _extreme_batch(s))


def build_dataset(outdir: str, name: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    import zlib
    rng = np.random.default_rng(zlib.crc32(name.encode()))
    res = SCENARIOS[name](rng)
    hist_counts, reads = res[0], res[1]
    k = res[2] if len(res) > 2 else K
    profiles, recs = [], []
    for i, (counts, hp_at) in enumerate(reads):
        counts = np.asarray(counts, np.uint16)
        profiles.append(counts)
        seq = _seq(rng, len(counts) + k - 1, hp_at)
        recs.append((f"crafted/{name}/{i + 1}", "", seq))
    root = os.path.join(outdir, "reads")
    write_fasta(root + ".fasta", recs)
    write_profiles(root, profiles, k)
    write_histogram(root, histogram_from_counts(k, hist_counts))


def gcov_hits() -> dict[str, set[int]]:
    subprocess.run(["gcov", "ClassPro-ClassPro"], cwd=REFCOV,
                   capture_output=True)
    hit: dict[str, set[int]] = {}
    for fn in TARGETS:
        covered = set()
        with open(os.path.join(REFCOV, fn + ".gcov")) as f:
            for line in f:
                m = re.match(r"^\s*(\d+):\s*(\d+):", line)
                if m:
                    covered.add(int(m.group(2)))
        hit[fn] = covered
    return hit


def probe() -> None:
    for name in SCENARIOS:
        for f in glob.glob(os.path.join(REFCOV, "*.gcda")):
            os.remove(f)
        d = f"/tmp/branch_{name}"
        shutil.rmtree(d, ignore_errors=True)
        build_dataset(d, name)
        r = subprocess.run([os.path.join(REFCOV, "ClassPro"), "-T1",
                            *_ref_args(name), f"-P{d}", "reads.fasta"],
                           cwd=d, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"{name}: ClassPro FAILED: {r.stderr[-400:]}")
            continue
        hits = gcov_hits()
        got = {f: sorted(set(TARGETS[f]) & hits[f]) for f in TARGETS}
        got = {f: v for f, v in got.items() if v}
        print(f"{name}: {got if got else 'no targets hit'}")


def emit() -> None:
    fixdir = os.path.join(REPO, "tests", "fixtures", "branch")
    for name in SCENARIOS:
        d = f"/tmp/branch_{name}"
        shutil.rmtree(d, ignore_errors=True)
        build_dataset(d, name)
        r = subprocess.run(["/tmp/refbuild/ClassPro", "-T1",
                            *_ref_args(name), f"-P{d}", "reads.fasta"],
                           cwd=d, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"{name}: reference FAILED: {r.stderr[-400:]}")
            continue
        dest = os.path.join(fixdir, name)
        os.makedirs(dest, exist_ok=True)
        for fn in ("reads.prof", ".reads.pidx.1", ".reads.prof.1",
                   "reads.hist"):
            shutil.copy(os.path.join(d, fn), dest)
        if name in SCENARIO_ARGS:
            import json
            with open(os.path.join(dest, "args.json"), "w") as f:
                json.dump(SCENARIO_ARGS[name], f)
        for src, dst in (("reads.fasta", "reads.fasta.gz"),
                         ("reads.class", "golden.class.gz")):
            with open(os.path.join(d, src), "rb") as fi, \
                    open(os.path.join(dest, dst), "wb") as raw:
                with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as g:
                    shutil.copyfileobj(fi, g)
        print(f"emitted {dest}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--emit", action="store_true")
    ap.add_argument("--search", type=int, default=0,
                    help="probe N randomized batches (seeds 0..N-1)")
    ap.add_argument("--seed0", type=int, default=0)
    a = ap.parse_args()
    if a.search:
        for s in range(a.seed0, a.seed0 + a.search):
            SCENARIOS[f"search{s}"] = make_search_scenario(s)
    if a.probe:
        if a.search:  # only probe the search batches
            for k in list(SCENARIOS):
                if not k.startswith("search"):
                    del SCENARIOS[k]
        probe()
    if a.emit:
        emit()


if __name__ == "__main__":
    main()
