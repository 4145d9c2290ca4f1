"""Batched device context vs exact oracle."""
import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from classpro_tpu.context import seq_context
from classpro_tpu.tpu.ctx import batch_context


def _batchify(seqs, L):
    B = len(seqs)
    arr = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        arr[i, :len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    return jnp.asarray(arr), jnp.asarray(lens)


def test_batch_context_matches_oracle():
    rng = np.random.default_rng(6)
    seqs = [b"ACACACACACAC", b"AGGGTTTAGGGTTTAGGGTTT", b"AAAATCGCGCGTTT"]
    for n in [13, 80, 500]:
        seqs.append(bytes(np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, n)]))
    parts = []
    for _ in range(300):
        u = ["A", "C", "G", "T", "AC", "AG", "TG", "ACG", "ATT", "AAC"][rng.integers(0, 10)]
        parts.append(u * int(rng.integers(1, 9)))
    seqs.append("".join(parts).encode())
    L = max(len(s) for s in seqs)
    arr, lens = _batchify(seqs, L)
    lctx, rctx = jax.jit(batch_context)(arr, lens)
    lctx, rctx = np.asarray(lctx), np.asarray(rctx)
    for i, s in enumerate(seqs):
        lc, rc = seq_context(s)
        assert np.array_equal(lctx[i, :len(s)], lc), f"lctx seq {i}"
        assert np.array_equal(rctx[i, :len(s)], rc), f"rctx seq {i}"
