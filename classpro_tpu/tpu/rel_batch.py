"""Batched fw/bw reliable-interval classification with rescue heuristics
and reconciliation (ref class_rel.c:623-963) around the device DP scan.

The DP passes run on device; the between-pass logic (rescue masks,
coverage re-estimation, demotions, fw/bw reconciliation) is light integer
work done vectorized on host numpy with C-faithful arithmetic
(integer truncation in the running sums, float division orders)."""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from classpro_tpu.estimation import GlobalModel
from classpro_tpu.tpu.rel_dev import RelParams, rel_dp_pass
from classpro_tpu.tpu.skellam_dev import build_skellam_tables

ERROR, REPEAT, HAPLO, DIPLO = 0, 1, 2, 3


class RelBatch(NamedTuple):
    b: np.ndarray      # (B, MAXM) int64
    e: np.ndarray
    ccb: np.ndarray
    cce: np.ndarray
    pe: np.ndarray     # f64
    m: np.ndarray      # (B,) counts
    plen: np.ndarray   # (B,)


def make_rel_params(gm: GlobalModel) -> RelParams:
    st = build_skellam_tables()
    d = gm.defaults
    return RelParams(
        ta=jnp.asarray(st.table_a), tb=jnp.asarray(st.table_b),
        logfact=jnp.asarray(st.logfact), read_len=float(gm.read_len),
        offset=d.offset, r_logp=d.r_logp, e_po_base=d.e_po_base,
        log_1m_pe_mean=math.log(1 - d.pe_mean),
        log_pe_mean=math.log(d.pe_mean), dr_ratio=gm.dr_ratio)


def _reverse(arrs: list[np.ndarray], m: np.ndarray) -> list[np.ndarray]:
    out = []
    for a in arrs:
        ra = a.copy()
        for i in range(a.shape[0]):
            ra[i, : m[i]] = a[i, : m[i]][::-1]
        out.append(ra)
    return out


def _pass(batch: RelBatch, cov: np.ndarray, P: RelParams, fwd: bool,
          max_m: int) -> np.ndarray:
    arrs = [batch.b, batch.e, batch.ccb, batch.cce, batch.pe]
    if not fwd:
        arrs = _reverse(arrs, batch.m)
    asgn, _ = rel_dp_pass(*[jnp.asarray(a) for a in arrs],
                          jnp.asarray(batch.m), jnp.asarray(batch.plen),
                          jnp.asarray(cov), P, fwd=fwd, max_m=max_m)
    asgn = np.asarray(asgn)
    if not fwd:
        out = asgn.copy()
        for i in range(asgn.shape[0]):
            out[i, : batch.m[i]] = asgn[i, : batch.m[i]][::-1]
        asgn = out
    return asgn


def _dsum(batch: RelBatch, asgn: np.ndarray, state: int):
    """lsum/csum over intervals with given state, C integer semantics
    (class_rel.c:634-644): csum += (ccb+cce)*l/2 with int truncation."""
    B, MAXM = asgn.shape
    valid = (np.arange(MAXM)[None, :] < batch.m[:, None]) & (asgn == state)
    l = batch.e - batch.b
    lsum = np.where(valid, l, 0).sum(axis=1)
    csum = np.where(valid, (batch.ccb + batch.cce) * l // 2, 0).sum(axis=1)
    return lsum, csum, valid


def _classify_dir(batch: RelBatch, gm: GlobalModel, P: RelParams,
                  fwd: bool, max_m: int):
    """classify_rel_fw / _bw (class_rel.c:623-845), batched."""
    B = batch.b.shape[0]
    gH, gD = int(gm.cov[HAPLO]), int(gm.cov[DIPLO])
    cov = np.tile(np.asarray(gm.cov, np.int64), (B, 1))
    asgn = _pass(batch, cov, P, fwd, max_m)
    cols = np.arange(max_m)[None, :]
    inb = cols < batch.m[:, None]

    # --- no-H rescue (class_rel.c:630-672 / 744-784)
    no_h = ~np.any(inb & (asgn == HAPLO), axis=1)
    lsum, csum, dmask = _dsum(batch, np.where(inb, asgn, -1), DIPLO)
    has_d = dmask.any(axis=1)
    if fwd:
        anchor = np.where(has_d, np.argmax(dmask, axis=1), 0)
        anchor_cnt = batch.ccb[np.arange(B), anchor]
    else:
        anchor = np.where(has_d, max_m - 1 - np.argmax(dmask[:, ::-1], axis=1), 0)
        anchor_cnt = batch.cce[np.arange(B), anchor]
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_dcov = csum / lsum
    rescue = no_h & has_d & (mean_dcov < gD)
    if rescue.any():
        cov2 = cov.copy()
        cov2[rescue, HAPLO] = anchor_cnt[rescue]
        cov2[rescue, DIPLO] = anchor_cnt[rescue] + gH
        asgn2 = _pass(batch, cov2, P, fwd, max_m)
        asgn = np.where(rescue[:, None], asgn2, asgn)
        # second no-h check -> demote D to H (class_rel.c:650-669)
        no_h2 = rescue & ~np.any(inb & (asgn == HAPLO), axis=1)
        lsum2, csum2, dmask2 = _dsum(batch, np.where(inb, asgn, -1), DIPLO)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean2 = csum2 / lsum2
        flip = no_h2 & (np.abs(mean2 - gH) <= np.abs(mean2 - gD))
        asgn = np.where(flip[:, None] & (asgn == DIPLO), HAPLO, asgn)

    # --- all-H -> maybe all-D (class_rel.c:674-690)
    all_h = np.all(~inb | (asgn == HAPLO), axis=1)
    l = batch.e - batch.b
    lsum_a = np.where(inb, l, 0).sum(axis=1)
    csum_a = np.where(inb, (batch.ccb + batch.cce) * l // 2, 0).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_h = csum_a / lsum_a
    flip_all = all_h & (np.abs(mean_h - gH) >= np.abs(mean_h - gD))
    asgn = np.where(flip_all[:, None] & inb, np.where(
        asgn == HAPLO, DIPLO, asgn), asgn)

    # --- >=70% H -> demote H->D, D->R (class_rel.c:692-713)
    n_h = np.sum(inb & (asgn == HAPLO), axis=1)
    many_h = n_h >= batch.m * 0.7
    lsum_h, csum_h, _ = _dsum(batch, np.where(inb, asgn, -1), HAPLO)
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_hh = csum_h / lsum_h
    demote = many_h & (lsum_h > 0) & (np.abs(mean_hh - gH) >= np.abs(mean_hh - gD))
    asgn = np.where(demote[:, None] & (asgn == HAPLO) & inb, 100, asgn)
    asgn = np.where(demote[:, None] & (asgn == DIPLO) & inb, REPEAT, asgn)
    asgn = np.where(asgn == 100, DIPLO, asgn)

    # --- hdrr (class_rel.c:715-731)
    dm = inb & (asgn == DIPLO)
    hm = inb & (asgn == HAPLO)
    idx = np.arange(max_m)[None, :]
    first_d = np.where(dm.any(1), np.argmax(dm, 1), -1)
    last_d = np.where(dm.any(1), max_m - 1 - np.argmax(dm[:, ::-1], 1), -1)
    first_h = np.where(hm.any(1), np.argmax(hm, 1), -1)
    last_h = np.where(hm.any(1), max_m - 1 - np.argmax(hm[:, ::-1], 1), -1)
    rr = np.arange(B)
    both = (first_d >= 0) & (first_h >= 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        hdrr = np.where(
            both,
            (batch.ccb[rr, np.maximum(first_d, 0)]
             / batch.ccb[rr, np.maximum(first_h, 0)])
            / (batch.cce[rr, np.maximum(last_d, 0)]
               / batch.cce[rr, np.maximum(last_h, 0)]),
            1.0)
    return asgn.astype(np.int8), hdrr


def classify_rel_batch(batch: RelBatch, gm: GlobalModel,
                       P: RelParams) -> np.ndarray:
    """Full classify_rel (class_rel.c:871-963): fw, bw, reconciliation.
    Returns (B, MAXM) int8 assignments for the reliable intervals."""
    max_m = batch.b.shape[1]
    asgn_f, hdrr_f = _classify_dir(batch, gm, P, True, max_m)
    asgn_b, hdrr_b = _classify_dir(batch, gm, P, False, max_m)
    B = batch.b.shape[0]
    cols = np.arange(max_m)[None, :]
    inb = cols < batch.m[:, None]

    eq = np.all(~inb | (asgn_f == asgn_b), axis=1)

    # is_eq_prefix / is_eq_suffix on the fw assignment
    # (class_rel.c:847-869: literal semantics — asgn[0]==REPEAT and the
    # array is nonzero* then zero*)
    a = np.where(inb, asgn_f, -1)
    first = asgn_f[:, 0]
    nz = (a != 0) & inb
    # prefix: first run of nonzero, then all zero
    first_zero = np.where((~nz & inb).any(1), np.argmax(~nz & inb, 1),
                          batch.m)
    any_nz_after = np.array([
        bool(np.any(nz[i, first_zero[i]:batch.m[i]])) for i in range(B)])
    is_prefix = (first == REPEAT) & ~any_nz_after
    # suffix: last elem nonzero==1, scanning down: nonzero* then zero*
    lastv = asgn_f[np.arange(B), np.maximum(batch.m - 1, 0)]
    rev = nz[:, ::-1]
    minb = batch.m[:, None]
    revin = cols < minb  # same mask reversed is symmetric per row up to m
    rev_in = np.zeros_like(rev)
    for i in range(B):
        rev_in[i, : batch.m[i]] = nz[i, : batch.m[i]][::-1]
    first_zero_r = np.array([
        int(np.argmax(~rev_in[i, : batch.m[i]])) if
        (~rev_in[i, : batch.m[i]]).any() else int(batch.m[i])
        for i in range(B)])
    any_nz_after_r = np.array([
        bool(np.any(rev_in[i, first_zero_r[i]: batch.m[i]])) for i in range(B)])
    is_suffix = (lastv == REPEAT) & ~any_nz_after_r

    take_b = ~eq & ~is_prefix & (
        is_suffix | (np.abs(hdrr_f - 1.0) > np.abs(hdrr_b - 1.0)))
    out = np.where(take_b[:, None], asgn_b, asgn_f)
    return out.astype(np.int8)
