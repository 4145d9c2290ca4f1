"""Byte-identity on the crafted branch-coverage fixtures.

Each fixture under tests/fixtures/branch/ was built by
tools/branch_probe.py to drive a specific rarely-taken reference branch
(gcov-verified; see COVERAGE.md): the class_rel.c rescue/demotion
heuristics (630-713 fw / 737-821 bw), the M==0 early return, the
class_unrel est_cov fallbacks, wall.c multi-error recovery spans,
find_gain/find_drop run-length degeneration at K=16, and the
tallest-peak-is-H histogram estimation branch.  golden.class.gz is the
reference binary's output; the production engine must match it
byte-for-byte.
"""
import gzip
import pathlib

import pytest

FIX = pathlib.Path(__file__).parent / "fixtures" / "branch"

NAMES = sorted(p.name for p in FIX.iterdir() if p.is_dir())


def _stage(tmp_path, name):
    import json

    src = FIX / name
    for fn in ("reads.prof", ".reads.pidx.1", ".reads.prof.1", "reads.hist"):
        (tmp_path / fn).write_bytes((src / fn).read_bytes())
    fa = tmp_path / "reads.fasta"
    fa.write_bytes(gzip.decompress((src / "reads.fasta.gz").read_bytes()))
    golden = gzip.decompress((src / "golden.class.gz").read_bytes()).decode()
    args = {}
    if (src / "args.json").exists():
        args = json.loads((src / "args.json").read_text())
    return fa, golden, args


@pytest.mark.parametrize("name", NAMES)
def test_branch_fixture_byte_identity(tmp_path, name):
    from classpro_tpu.io.classfile import write_class
    from classpro_tpu.tpu.engine import classify_file_tpu

    fa, golden, args = _stage(tmp_path, name)
    out = tmp_path / "ours.class"
    write_class(str(out), classify_file_tpu(str(fa), str(tmp_path / "reads"),
                                            **args))
    assert out.read_text() == golden, name


def test_psum0_fires_in_oracle(tmp_path):
    """The psum0 fixture must actually reach the all-16-underflow
    fallback (class_rel.c:326-331 / exact/rel.py _update) in the
    ORACLE too — guarding the fixture against silently regressing into
    an ordinary dataset (the reference-side evidence is gcov: 327-331
    executed, COVERAGE.md)."""
    from classpro_tpu.estimation import build_global_model
    from classpro_tpu.exact import rel as rel_mod
    from classpro_tpu.exact.pipeline import ReadClassifier
    from classpro_tpu.io.fastk import load_histogram, open_profiles

    fa, golden, args = _stage(tmp_path, "psum0")
    gm = build_global_model(load_histogram(str(tmp_path / "reads")), **args)
    P = open_profiles(str(tmp_path / "reads"))
    clf = ReadClassifier(gm)
    fired = 0
    orig = rel_mod.RelClassifier._update

    def spy(self, i, M):
        nonlocal fired
        dp = self.dp
        if all(dp[self._pred(i), s] == rel_mod.NEG_INF for s in range(4)):
            fired += 1
        return orig(self, i, M)

    rel_mod.RelClassifier._update = spy
    try:
        seq = gzip.decompress(
            (FIX / "psum0" / "reads.fasta.gz").read_bytes()
        ).decode().splitlines()[1]
        classes = clf.classify(seq, P.fetch(0))
    finally:
        rel_mod.RelClassifier._update = orig
    assert fired > 0, "psum==0 fallback no longer reached"
    assert golden.splitlines()[3] == classes


def test_debug_read_triage_tool(tmp_path, capsys):
    """`cli debug-read` (the runtime DEBUG_SINGLE analog,
    ClassPro.h:11-13): on the psum0 fixture's read it must dump every
    stage (walls, fw/bw DP, device margins), report oracle==production,
    and exit 0; its divergence detector must locate a mismatching
    record."""
    from classpro_tpu.cli import main as cli_main
    from classpro_tpu.tools.debug_read import first_divergent_read

    fa, golden, args = _stage(tmp_path, "psum0")
    rc = cli_main(["debug-read", str(fa), "0",
                   "-c", str(args["coverage"]), "-r", str(args["read_len"])])
    out = capsys.readouterr().out
    assert rc == 0
    for section in ("oracle wall stage", "oracle rel DP", "device DP",
                    "production final", "RESULT: oracle == production"):
        assert section in out, section
    # the psum0 read's all-dead cells must be visible in the dump
    assert "dp[  1] E:        -inf  R:        -inf  H:        -inf" in out

    a = tmp_path / "a.class"
    b = tmp_path / "b.class"
    a.write_text(golden)
    lines = golden.splitlines()
    lines[3] = "X" + lines[3][1:]
    b.write_text("\n".join(lines) + "\n")
    assert first_divergent_read(str(a), str(a)) == -1
    assert first_divergent_read(str(a), str(b)) == 0


def test_zero_count_reads(tmp_path):
    """Profiles with zero-count stretches (what FastK emits for k-mers
    containing N) must classify without crashing, with production ==
    oracle.  The REFERENCE segfaults on such input — load_emodel never
    allocates cthres[l][0] and find_gain dereferences it when a pair
    position has two adjacent zero counts (wall.c:128-133/365; see
    COVERAGE.md "Upstream bugs").  Our defined extension: cthres row 0
    is all zeros, so the SELF pair test rejects."""
    import numpy as np

    from classpro_tpu.estimation import build_global_model
    from classpro_tpu.exact.pipeline import ReadClassifier
    from classpro_tpu.io.fastk import (histogram_from_counts,
                                       load_histogram, write_histogram,
                                       write_profiles)
    from classpro_tpu.io.fastx import write_fasta
    from classpro_tpu.tpu.engine import TpuEngine

    rng = np.random.default_rng(7)
    K = 40
    reads, profs = [], []
    for i in range(4):
        n = 600
        c = np.full(n, 40, np.uint16)
        seq = np.frombuffer(b"ACGT", np.uint8)[
            rng.integers(0, 4, n + K - 1)].copy()
        for at in (150, 400):
            seq[at: at + 5] = ord("N")
            c[max(0, at - K + 1): at + 5] = 0
        reads.append((f"n/{i}", "", seq.tobytes().decode()))
        profs.append(c)
    hist = np.concatenate([rng.poisson(20, 15000), rng.poisson(40, 30000),
                           rng.integers(1, 4, 20000)]).clip(1, 32767)
    root = str(tmp_path / "reads")
    write_fasta(root + ".fasta", reads)
    write_profiles(root, profs, K)
    write_histogram(root, histogram_from_counts(K, hist))

    gm = build_global_model(load_histogram(root))
    rc = ReadClassifier(gm)
    eng = TpuEngine(gm)
    got = eng.classify_chunk([r[2] for r in reads], profs)
    for (name, _, seq), prof, g in zip(reads, profs, got):
        assert g == rc.classify(seq, prof), name
