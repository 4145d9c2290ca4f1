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
    src = FIX / name
    for fn in ("reads.prof", ".reads.pidx.1", ".reads.prof.1", "reads.hist"):
        (tmp_path / fn).write_bytes((src / fn).read_bytes())
    fa = tmp_path / "reads.fasta"
    fa.write_bytes(gzip.decompress((src / "reads.fasta.gz").read_bytes()))
    golden = gzip.decompress((src / "golden.class.gz").read_bytes()).decode()
    return fa, golden


@pytest.mark.parametrize("name", NAMES)
def test_branch_fixture_byte_identity(tmp_path, name):
    from classpro_tpu.io.classfile import write_class
    from classpro_tpu.tpu.engine import classify_file_tpu

    fa, golden = _stage(tmp_path, name)
    out = tmp_path / "ours.class"
    write_class(str(out), classify_file_tpu(str(fa), str(tmp_path / "reads")))
    assert out.read_text() == golden, name
