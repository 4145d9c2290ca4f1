"""Single-dispatch device classification program.

Every host<->device synchronisation on the target platform costs a fixed
~30ms round trip, so the entire per-chunk classification — merged
forward+backward reliable-interval DP (class_rel.c:623-963), conditional
rescue re-run, demotion heuristics, fw/bw reconciliation, scatter into
the full interval layout, and both unreliable-relaxation sweeps
(class_unrel.c:248-300) — runs as ONE jitted program returning the final
per-interval assignment.  The host only packs inputs (wall-stage output)
and expands the result to class strings.

The between-pass logic here is a jnp port of the numpy logic that was in
rel_batch.py, operating on scan-ordered rows with a per-row direction
flag; see the derivations in the function body for how anchors/hdrr map
between scan order and original order.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from classpro_tpu.estimation import GlobalModel
from classpro_tpu.tpu.rel_dev2 import RelParams2, rel_dp_pass2
from classpro_tpu.tpu.skellam_dev import PackedSkellam, build_packed_skellam
from classpro_tpu.tpu.unrel_dev2 import UnrelParams2, unrel_sweeps2

ERROR, REPEAT, HAPLO, DIPLO, N_STATE = 0, 1, 2, 3, 4
NEG_INF = float("-inf")


class PipelineParams(NamedTuple):
    rel: RelParams2
    unrel: UnrelParams2
    gcov: jnp.ndarray      # (4,) int64 global coverages (E, R, H, D)


def build_pipeline_params(gm: GlobalModel) -> PipelineParams:
    from classpro_tpu.numerics import LOGFACT
    from classpro_tpu.tpu.tables import build_tables

    tab, lf385 = build_packed_skellam()
    ps = PackedSkellam(tab=jnp.asarray(tab), lf_n=jnp.asarray(lf385))
    d = gm.defaults
    cov_r = int(gm.cov[REPEAT])
    n1 = ((2 * cov_r + 6 + 127) // 128) * 128   # covers strc and DR*dl
    lf_small = jnp.asarray(LOGFACT[:n1])
    rel = RelParams2(
        ps=ps, logfact=jnp.asarray(LOGFACT), lf_small=lf_small,
        read_len=float(gm.read_len), offset=d.offset, r_logp=d.r_logp,
        e_po_base=d.e_po_base, log_1m_pe_mean=math.log(1 - d.pe_mean),
        log_pe_mean=math.log(d.pe_mean), dr_ratio=gm.dr_ratio)
    dt = build_tables(gm)
    btg_flat = jnp.asarray(dt.btg_log()[dt.unrel_idx].reshape(-1))
    unrel = UnrelParams2(
        ps=ps, lf_small=lf_small, btg_flat=btg_flat, n_cap=dt.n_cap,
        read_len=float(gm.read_len), r_logp=d.r_logp,
        log_1m_pe_mean=math.log(1 - d.pe_mean),
        log_pe_mean=math.log(d.pe_mean), dr_ratio=gm.dr_ratio,
        cov_r=cov_r, cov_h=int(gm.cov[HAPLO]), cov_d=int(gm.cov[DIPLO]))
    return PipelineParams(rel=rel, unrel=unrel,
                          gcov=jnp.asarray(np.asarray(gm.cov, np.int64)))


def _first_true(mask):
    """(argmax, any) over axis 1."""
    return jnp.argmax(mask, axis=1), jnp.any(mask, axis=1)


def _oh_extract(arr, idx):
    """arr[b, idx[b]] via one-hot sum (idx may be garbage where unused)."""
    cols = jnp.arange(arr.shape[1])[None, :]
    oh = cols == idx[:, None]
    if arr.dtype == bool:
        return jnp.any(oh & arr, axis=1)
    return jnp.sum(jnp.where(oh, arr, 0), axis=1)


@functools.partial(jax.jit, static_argnames=("max_m", "max_n"))
def classify_batch_dev(rel, undyn, xs_desc, xs_asc, un_n, rel_rows,
                       rel_cols, PP: PipelineParams, max_m: int,
                       max_n: int):
    """rel: dict of merged scan-ordered row arrays (2R, max_m):
    bpos,bcnt,epos,ecnt (i64), max_cc (i64), lf_bcnt, logpE (f64), and
    (2R,) m, plen, fwd.  Rows [0,R) forward, [R,2R) backward (same reads,
    index-reversed).  undyn/xs_*/un_n: see unrel_sweeps2.  rel_rows:
    (R,) int32 unrel-layout row of each rel row (out-of-range where
    padding); rel_cols: (R, max_m) int32 unrel-layout column of each
    reliable interval (max_n where padding).  Returns (B, max_n) int8."""
    P = PP.rel
    bpos, bcnt = rel["bpos"], rel["bcnt"]
    epos, ecnt = rel["epos"], rel["ecnt"]
    m, plen, fwd = rel["m"], rel["plen"], rel["fwd"]
    R2 = bpos.shape[0]
    R = R2 // 2
    gH = PP.gcov[HAPLO].astype(jnp.float64)
    gD = PP.gcov[DIPLO].astype(jnp.float64)
    cols = jnp.arange(max_m)[None, :]
    inb = cols < m[:, None]

    cov_t = jnp.broadcast_to(PP.gcov[None, :], (R2, 4))

    def dp(cov):
        return rel_dp_pass2(bpos, bcnt, epos, ecnt, rel["max_cc"],
                            rel["lf_bcnt"], rel["logpE"], m, plen,
                            fwd, cov, P, max_m)[0]

    asgn = dp(cov_t).astype(jnp.int32)
    l_arr = jnp.abs(epos - bpos) + 1        # interval lengths (invariant)

    def dsum(a, state):
        mask = inb & (a == state)
        lsum = jnp.sum(jnp.where(mask, l_arr, 0), axis=1)
        csum = jnp.sum(jnp.where(mask, (bcnt + ecnt) * l_arr // 2, 0),
                       axis=1)
        return lsum, csum, mask

    # ---- no-H rescue (class_rel.c:630-672 / 744-784) --------------------
    no_h = ~jnp.any(inb & (asgn == HAPLO), axis=1)
    lsum, csum, dmask = dsum(asgn, DIPLO)
    anchor, has_d = _first_true(dmask)   # first D in scan order == the
    # reference's first (fw) / last (bw) D in original order; its scan
    # entering count bcnt equals the reference's ccb (fw) / cce (bw).
    anchor_cnt = _oh_extract(bcnt, anchor)
    mean_dcov = csum / lsum
    rescue = no_h & has_d & (mean_dcov < gD)
    cov2 = cov_t.astype(jnp.int64)
    cov2 = cov2.at[:, HAPLO].set(
        jnp.where(rescue, anchor_cnt, cov2[:, HAPLO]))
    cov2 = cov2.at[:, DIPLO].set(
        jnp.where(rescue, anchor_cnt + PP.gcov[HAPLO], cov2[:, DIPLO]))
    asgn2 = jax.lax.cond(jnp.any(rescue),
                         lambda: dp(cov2).astype(jnp.int32),
                         lambda: asgn)
    asgn = jnp.where(rescue[:, None], asgn2, asgn)
    # second no-h check -> demote D to H (class_rel.c:650-669)
    no_h2 = rescue & ~jnp.any(inb & (asgn == HAPLO), axis=1)
    lsum2, csum2, _ = dsum(asgn, DIPLO)
    mean2 = csum2 / lsum2
    flip = no_h2 & (jnp.abs(mean2 - gH) <= jnp.abs(mean2 - gD))
    asgn = jnp.where(flip[:, None] & (asgn == DIPLO), HAPLO, asgn)

    # ---- all-H -> maybe all-D (class_rel.c:674-690) ----------------------
    all_h = jnp.all(~inb | (asgn == HAPLO), axis=1)
    lsum_a = jnp.sum(jnp.where(inb, l_arr, 0), axis=1)
    csum_a = jnp.sum(jnp.where(inb, (bcnt + ecnt) * l_arr // 2, 0), axis=1)
    mean_h = csum_a / lsum_a
    flip_all = all_h & (jnp.abs(mean_h - gH) >= jnp.abs(mean_h - gD))
    asgn = jnp.where(flip_all[:, None] & inb,
                     jnp.where(asgn == HAPLO, DIPLO, asgn), asgn)

    # ---- >=70% H -> demote H->D, D->R (class_rel.c:692-713) --------------
    n_h = jnp.sum(inb & (asgn == HAPLO), axis=1)
    many_h = n_h >= m * 0.7
    lsum_h, csum_h, _ = dsum(asgn, HAPLO)
    mean_hh = csum_h / lsum_h
    demote = many_h & (lsum_h > 0) & (jnp.abs(mean_hh - gH)
                                      >= jnp.abs(mean_hh - gD))
    asgn = jnp.where(demote[:, None] & (asgn == HAPLO) & inb, 100, asgn)
    asgn = jnp.where(demote[:, None] & (asgn == DIPLO) & inb, REPEAT, asgn)
    asgn = jnp.where(asgn == 100, DIPLO, asgn)

    # ---- hdrr (class_rel.c:715-731) --------------------------------------
    dm = inb & (asgn == DIPLO)
    hm = inb & (asgn == HAPLO)
    f_d, any_d = _first_true(dm)
    f_h, any_h = _first_true(hm)
    l_d = max_m - 1 - jnp.argmax(dm[:, ::-1], axis=1)
    l_h = max_m - 1 - jnp.argmax(hm[:, ::-1], axis=1)
    p = _oh_extract(bcnt, f_d).astype(jnp.float64) \
        / _oh_extract(bcnt, f_h).astype(jnp.float64)
    q = _oh_extract(ecnt, l_d).astype(jnp.float64) \
        / _oh_extract(ecnt, l_h).astype(jnp.float64)
    hdrr = jnp.where(any_d & any_h,
                     jnp.where(fwd, p / q, q / p), 1.0)

    # ---- fw/bw reconciliation (class_rel.c:847-938) -----------------------
    asgn_f = asgn[:R]
    hdrr_f, hdrr_b = hdrr[:R], hdrr[R:]
    m_f = m[:R]
    inb_f = inb[:R]
    flip_idx = jnp.where(cols < m_f[:, None],
                         m_f[:, None] - 1 - cols, cols)
    asgn_b = jnp.take_along_axis(asgn[R:], flip_idx, axis=1)

    eq = jnp.all(~inb_f | (asgn_f == asgn_b), axis=1)
    nz = (asgn_f != 0) & inb_f

    def prefix_like(nzv, first_state):
        zmask = ~nzv & inb_f
        fz, has_z = _first_true(zmask)
        first_zero = jnp.where(has_z, fz, m_f)
        any_nz_after = jnp.any(nzv & (cols >= first_zero[:, None]), axis=1)
        return (first_state == REPEAT) & ~any_nz_after

    is_prefix = prefix_like(nz, asgn_f[:, 0])
    rev_nz = jnp.take_along_axis(nz, flip_idx, axis=1)
    lastv = _oh_extract(asgn_f, jnp.maximum(m_f - 1, 0))
    is_suffix = prefix_like(rev_nz, lastv)

    take_b = ~eq & ~is_prefix & (
        is_suffix | (jnp.abs(hdrr_f - 1.0) > jnp.abs(hdrr_b - 1.0)))
    rel_out = jnp.where(take_b[:, None], asgn_b, asgn_f)   # (R, max_m)

    # ---- scatter into the full interval layout ----------------------------
    asgn_un = undyn["asgn"].astype(jnp.int32)
    asgn_un = asgn_un.at[
        rel_rows[:, None], rel_cols].set(rel_out, mode="drop")
    undyn = dict(undyn, asgn=asgn_un)

    # ---- unreliable-interval relaxation -----------------------------------
    return unrel_sweeps2(undyn, xs_desc, xs_asc, un_n, PP.unrel, max_n)
