"""Multi-host driver: shard partition, scatter-gather merge, and the
psum estimation path (parallel/driver.py; ref ClassPro.c:574-614,
io.c:70-176)."""
import pathlib

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

FIX = pathlib.Path(__file__).parent / "fixtures"


def test_shard_range_partition():
    from classpro_tpu.parallel.driver import shard_range

    for nreads in (1, 7, 100, 398):
        for nproc in (1, 2, 3, 8):
            spans = [shard_range(nreads, nproc, p) for p in range(nproc)]
            assert spans[0][0] == 0 and spans[-1][1] == nreads
            for (a, b), (c, d) in zip(spans, spans[1:]):
                assert b == c and a <= b and c <= d


def test_simulated_two_process_run_matches_single(tmp_path):
    """Run the per-process body twice (pid 0/1) + merge == one run."""
    from classpro_tpu.parallel.driver import merge_shards, run_process

    src = str(FIX / "tiny" / "reads.fasta.gz")
    fk = str(FIX / "tiny" / "reads")
    single = str(tmp_path / "single.class")
    run_process(src, fk, single, nproc=1, pid=0)

    multi = str(tmp_path / "multi.class")
    for pid in range(2):
        run_process(src, fk, multi, nproc=2, pid=pid, _skip_init=True)
    merge_shards(multi, 2)
    assert open(single).read() == open(multi).read()


def test_psum_estimation_matches_hist_model():
    """Instance histogram summed over shards via psum reproduces the
    .hist-file model exactly (same H/D coverages, same thresholds)."""
    from classpro_tpu.estimation import build_global_model
    from classpro_tpu.io.fastk import load_histogram, open_profiles
    from classpro_tpu.parallel.driver import (estimate_distributed,
                                              shard_range)
    from classpro_tpu.parallel.mesh import data_parallel_mesh

    root = str(FIX / "medium" / "reads")
    hist = load_histogram(root)
    gm_ref = build_global_model(hist)
    P = open_profiles(root)
    profs = [P.fetch(i) for i in range(P.nreads)]

    mesh = data_parallel_mesh(jax.devices()[:1])
    gm = estimate_distributed(mesh, profs, kmer=hist.kmer,
                              low=hist.low, high=hist.high)
    # coverage estimates must match the .hist-derived model: every k-mer
    # instance of the dataset appears at exactly one profile position
    assert (gm.cov == gm_ref.cov).all()
    assert gm.dr_ratio == gm_ref.dr_ratio
