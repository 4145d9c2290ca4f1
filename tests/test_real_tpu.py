"""Opt-in real-TPU parity test (VERDICT r1 weak #3).

The committed suite runs on the CPU backend (conftest.py); real-TPU
numeric drift is watched by bench.py's per-round `parity_ok` smoke.
This test makes the same check available to pytest: set
``CLASSPRO_REAL_TPU=1`` to classify the tiny fixture on the real
device (fresh subprocess, so conftest's JAX_PLATFORMS=cpu does not
apply) and byte-compare against the reference golden.  Skipped by
default — the first device-program execution can take minutes on this
platform (see CLAUDE.md).
"""
import gzip
import os
import pathlib
import subprocess
import sys

import pytest

FIX = pathlib.Path(__file__).parent / "fixtures"


@pytest.mark.skipif(os.environ.get("CLASSPRO_REAL_TPU") != "1",
                    reason="set CLASSPRO_REAL_TPU=1 to run on the device")
def test_real_tpu_byte_identity(tmp_path):
    fix = FIX / "tiny"
    src = tmp_path / "reads.fasta"
    src.write_bytes(gzip.decompress((fix / "reads.fasta.gz").read_bytes()))
    for fn in ("reads.prof", ".reads.pidx.1", ".reads.prof.1", "reads.hist"):
        (tmp_path / fn).write_bytes((fix / fn).read_bytes())
    golden = gzip.decompress((fix / "golden.class.gz").read_bytes())

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)          # let the axon TPU register
    env.pop("XLA_FLAGS", None)
    if "CLASSPRO_SAVED_POOL_IPS" in env:    # undo conftest's scrub
        env["PALLAS_AXON_POOL_IPS"] = env.pop("CLASSPRO_SAVED_POOL_IPS")
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # this test must exercise the REAL device: disable the CLI's
    # auto-CPU-fallback preflight so a dead tunnel fails loudly
    env["CLASSPRO_NO_PREFLIGHT"] = "1"
    out = tmp_path / "ours.class"
    subprocess.run(
        [sys.executable, "-m", "classpro_tpu.cli", "classify", str(src),
         "-o", str(out)],
        env=env, check=True, capture_output=True, timeout=1800)
    assert out.read_bytes() == golden
