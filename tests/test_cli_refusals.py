"""Argument/input refusal-envelope parity with the reference
(ClassPro.c:348-500 parse_arg, gene_core.h:46-68 ARG_* macros,
ClassPro.c:184-187 MAX_READ_LEN): every input the reference rejects with
one stderr line + exit(1), our CLI rejects the same way.

Conscious superset notes (asserted here so drift is visible):
* extra positional FASTX files: argparse exits 2 (usage error) where the
  reference exits 1 — both refuse, different code.
* `-N`/`-o`/long options accept separated values (argparse style) in
  addition to the reference's glued `-Nroot` form.
"""
import os
import pathlib
import subprocess

import pytest

from classpro_tpu.cli import main as cli_main
from classpro_tpu.io.fastx import read_fastx_checked, write_fasta

FIX = pathlib.Path(__file__).parent / "fixtures"
REFBIN = "/tmp/refbuild/ClassPro"
TINY = str(FIX / "tiny" / "reads.fasta.gz")


def _classify(extra, source=TINY, capsys=None):
    rc = cli_main(["classify", "--engine", "exact", source, *extra])
    err = capsys.readouterr().err if capsys else ""
    return rc, err


def test_read_fastx_checked_refuses_long_read(tmp_path):
    fa = tmp_path / "r.fasta"
    write_fasta(str(fa), [("r0", "", "ACGT" * 30)])
    assert [r.name for r in read_fastx_checked(str(fa), 120)] == ["r0"]
    with pytest.raises(ValueError, match=r"rlen \(120\) > MAX_READ_LEN "
                                         r"for FASTX inputs \(100\)"):
        list(read_fastx_checked(str(fa), 100))


def test_cli_refuses_nonpositive_threads(capsys):
    rc, err = _classify(["-T", "0"], capsys=capsys)
    assert rc == 1 and "Number of threads must be positive" in err
    rc, err = _classify(["-T", "-3"], capsys=capsys)
    assert rc == 1


def test_cli_refuses_negative_coverage(capsys):
    rc, err = _classify(["-c", "-1"], capsys=capsys)
    assert rc == 1 and "coverage must be non-negative" in err


def test_cli_refuses_nonpositive_read_len(capsys):
    rc, err = _classify(["-r", "0"], capsys=capsys)
    assert rc == 1 and "read length must be positive" in err


def test_cli_refuses_missing_tmp_dir(capsys):
    rc, err = _classify(["-P", "/nonexistent/tmpdir"], capsys=capsys)
    assert rc == 1 and "cannot open directory" in err


def test_cli_refuses_unknown_extension(tmp_path, capsys):
    # valid FASTA bytes under an extension the reference's EXT probe
    # (ClassPro.h:326) does not know -> refused without reading it
    bad = tmp_path / "reads.txt"
    bad.write_text(">r0 x\nACGT\n")
    rc, err = _classify([], source=str(bad), capsys=capsys)
    assert rc == 1 and "Cannot open" in err and ".db|.dam" in err


def test_cli_refuses_missing_file(capsys):
    rc, err = _classify([], source="/nonexistent/reads.fasta", capsys=capsys)
    assert rc == 1 and "Cannot open" in err


def test_cli_extra_positional_is_usage_error():
    # reference: "Currently only single file is accepted for FASTX input"
    # + exit 1; argparse refuses at parse time with exit 2 (documented
    # superset difference)
    with pytest.raises(SystemExit) as ei:
        cli_main(["classify", "--engine", "exact", TINY, TINY])
    assert ei.value.code == 2


@pytest.fixture(scope="module")
def long_read_ds(tmp_path_factory):
    """5-read dataset whose reads all exceed MAX_READ_LEN=60000, with
    matching FASTK files (so both CLIs get past model setup and refuse
    at the read loop, ClassPro.c:184-187)."""
    from classpro_tpu.tools.simulate import SimConfig, generate_dataset

    d = tmp_path_factory.mktemp("longds")
    cfg = SimConfig(seed=11, genome_len=70000, coverage=4.0,
                    read_len_mean=62000, read_len_sd=500,
                    read_len_min=61000)
    generate_dataset(str(d), cfg)
    return d


def test_cli_refuses_over_max_read_len(long_read_ds, capsys):
    rc, err = _classify(["-c", "40", "-T", "1"],
                        source=str(long_read_ds / "reads.fasta"),
                        capsys=capsys)
    assert rc == 1
    assert "rlen (61420) > MAX_READ_LEN for FASTX inputs (60000)" in err


@pytest.mark.skipif(not os.path.exists(REFBIN),
                    reason="reference binary not built (/tmp/refbuild)")
def test_reference_refuses_same_long_read(long_read_ds):
    r = subprocess.run([REFBIN, "-T1", "-c40", f"-P{long_read_ds}",
                        "reads.fasta"], cwd=long_read_ds,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 1
    assert "rlen (61420) > MAX_READ_LEN for FASTX inputs (60000)" \
        in r.stderr


def test_cli_accepts_bare_root_like_reference(tmp_path, capsys):
    """ClassPro.c:413-423 Root-strips and re-appends each EXT, so a bare
    root ('reads') with 'reads.fasta.gz' present is ACCEPTED — the
    refusal envelope probes like the C instead of requiring a literal
    known extension (ADVICE r4)."""
    bare = TINY[: -len(".fasta.gz")]
    rc, _ = _classify(["-o", str(tmp_path / "o.class")], source=bare,
                      capsys=capsys)
    assert rc == 0
    assert (tmp_path / "o.class").exists()
