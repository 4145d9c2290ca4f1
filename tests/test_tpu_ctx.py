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


def test_reconcile_fwbw_semantics():
    """Host fw/bw reconciliation (class_rel.c:847-938): exact hdrr tie
    keeps the forward pass; eq-suffix takes backward; eq-prefix keeps
    forward; hdrr farther-from-1 loses."""
    import numpy as np

    from classpro_tpu.tpu.device_pipeline import reconcile_fwbw

    E, R, H, D = 0, 1, 2, 3
    max_m = 8

    def pack(fw_rows, bw_rows, ms):
        n = len(fw_rows)
        rel2 = np.zeros((2 * n, max_m), np.int8)
        for j, (f, b, m) in enumerate(zip(fw_rows, bw_rows, ms)):
            rel2[j, :m] = f
            rel2[n + j, :m] = b[::-1]          # bw rows in scan order
        return rel2

    ccb = np.full((4, max_m), 27, np.int64)
    cce = np.full((4, max_m), 27, np.int64)
    # symmetric counts -> hdrr_f == hdrr_b == 1.0 exactly: tie keeps fw
    fw = [[H, D, H, H]]
    bw = [[H, R, H, H]]
    m = np.array([4])
    out = reconcile_fwbw(pack(fw, bw, m), ccb, cce, m)
    assert list(out[0, :4]) == [H, D, H, H]

    # eq-suffix (fw = R then all-E suffix reversed...): fw starts with R,
    # then nonzero prefix then zeros -> is_eq_prefix -> keep fw
    fw2 = [[R, H, E, E]]
    bw2 = [[D, D, D, D]]
    out = reconcile_fwbw(pack(fw2, bw2, m), ccb, cce, m)
    assert list(out[0, :4]) == [R, H, E, E]

    # is_eq_suffix (fw ends with R, preceded by nonzero, zeros before)
    fw3 = [[E, E, H, R]]
    bw3 = [[D, D, D, D]]
    out = reconcile_fwbw(pack(fw3, bw3, m), ccb, cce, m)
    assert list(out[0, :4]) == [D, D, D, D]

    # hdrr decides: fw's D/H ratio drifts (farther from 1), bw's is flat
    ccb4 = np.array([[20, 60, 20, 20, 0, 0, 0, 0]], np.int64)
    cce4 = np.array([[20, 30, 20, 20, 0, 0, 0, 0]], np.int64)
    fw4 = [[H, D, H, H]]
    bw4 = [[H, H, D, H]]
    # fw hdrr = (60/20)/(30/20) = 2; bw hdrr = (20/20)/(20/20) = 1 -> bw
    out = reconcile_fwbw(pack(fw4, bw4, np.array([4])), ccb4, cce4,
                         np.array([4]))
    assert list(out[0, :4]) == [H, H, D, H]
