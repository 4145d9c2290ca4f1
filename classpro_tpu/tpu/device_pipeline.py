"""Single-dispatch device classification program.

Two platform facts shape this module (measured, see rel_dev2.py):
every host<->device synchronisation costs a fixed ~30ms round trip AND
every individual array transfer costs ~20ms regardless of size (bulk
bandwidth is ~1.4GB/s).  So the host ships exactly TWO 1D blobs — one
int32, one float64 — per chunk, and the entire classification (merged
forward+backward reliable-interval DP, class_rel.c:623-963, conditional
rescue re-run, demotion heuristics, fw/bw reconciliation, scatter into
the full interval layout, and both unreliable-relaxation sweeps,
class_unrel.c:248-300) runs as ONE jitted program returning the final
per-interval assignment.  All derived planes (Poisson emissions,
log-factorials, packed value tensors) are computed on device from the
compact integer planes — the same device arithmetic the byte-validated
v1 kernels used.

Blob layouts (sizes static per jit specialisation):

  iblob (int32): b,e,cb,ce,ccb,cce,idx_desc,idx_asc,is_rel,live
                 [10 x Bn*max_n] | n [Bn] |
                 bpos,bcnt,epos,ecnt,max_cc [5 x R2*max_m] |
                 rel_cols [R*max_m] | m,plen,fwd [3 x R2] | rel_rows [R]
  fblob (f64):   pe,peob,peoe,lf_cb,lf_ce [5 x Bn*max_n] |
                 pe_rel,lf_bcnt,lf_ecnt [3 x R2*max_m]

(log-factorial planes are host table lookups — cheap there, ~25ns per
gathered element here.)
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
    return jnp.argmax(mask, axis=1), jnp.any(mask, axis=1)


def _oh_extract(arr, idx):
    """arr[b, idx[b]] via one-hot sum (idx may be garbage where unused)."""
    cols = jnp.arange(arr.shape[1])[None, :]
    oh = cols == idx[:, None]
    if arr.dtype == bool:
        return jnp.any(oh & arr, axis=1)
    return jnp.sum(jnp.where(oh, arr, 0), axis=1)


@functools.partial(jax.jit,
                   static_argnames=("Bn", "max_n", "R2", "max_m"))
def classify_batch_dev(fblob, iblob, PP: PipelineParams,
                       Bn: int, max_n: int, R2: int, max_m: int):
    """See module docstring.  Returns final asgn (Bn, max_n) int8."""
    P = PP.rel
    R = R2 // 2

    # ---------------- unpack blobs --------------------------------------
    un_sz, rel_sz = Bn * max_n, R2 * max_m
    o = 0

    def take_i(count, shape):
        nonlocal o
        v = iblob[o:o + count].reshape(shape)
        o += count
        return v

    b_u = take_i(un_sz, (Bn, max_n))
    e_u = take_i(un_sz, (Bn, max_n))
    cb_u = take_i(un_sz, (Bn, max_n))
    ce_u = take_i(un_sz, (Bn, max_n))
    ccb_u = take_i(un_sz, (Bn, max_n))
    cce_u = take_i(un_sz, (Bn, max_n))
    idx_desc = take_i(un_sz, (Bn, max_n))
    idx_asc = take_i(un_sz, (Bn, max_n))
    is_rel_u = take_i(un_sz, (Bn, max_n)) != 0
    live_u = take_i(un_sz, (Bn, max_n)) != 0
    n_u = take_i(Bn, (Bn,))
    bpos = take_i(rel_sz, (R2, max_m)).astype(jnp.int64)
    bcnt = take_i(rel_sz, (R2, max_m)).astype(jnp.int64)
    epos = take_i(rel_sz, (R2, max_m)).astype(jnp.int64)
    ecnt = take_i(rel_sz, (R2, max_m)).astype(jnp.int64)
    max_cc = take_i(rel_sz, (R2, max_m)).astype(jnp.int64)
    rel_cols = take_i(R * max_m, (R, max_m))
    m = take_i(R2, (R2,)).astype(jnp.int64)
    plen = take_i(R2, (R2,)).astype(jnp.int64)
    fwd = take_i(R2, (R2,)) != 0
    rel_rows = take_i(R, (R,))

    of = 0

    def take_f(count, shape):
        nonlocal of
        v = fblob[of:of + count].reshape(shape)
        of += count
        return v

    pe_u = take_f(un_sz, (Bn, max_n))
    peob_u = take_f(un_sz, (Bn, max_n))
    peoe_u = take_f(un_sz, (Bn, max_n))
    lf_cb = take_f(un_sz, (Bn, max_n))
    lf_ce = take_f(un_sz, (Bn, max_n))
    pe_rel = take_f(rel_sz, (R2, max_m))
    lf_bcnt = take_f(rel_sz, (R2, max_m))
    lf_ecnt = take_f(rel_sz, (R2, max_m))

    # ---------------- derived planes (device, v1-kernel arithmetic) -----
    covHf = PP.gcov[HAPLO].astype(jnp.float64)
    covDf = PP.gcov[DIPLO].astype(jnp.float64)
    covEf = PP.gcov[ERROR].astype(jnp.float64)

    po_cb_e = cb_u * jnp.log(covEf) - covEf - lf_cb
    po_ce_e = ce_u * jnp.log(covEf) - covEf - lf_ce
    lE_u = jnp.maximum(pe_u, po_cb_e + po_ce_e + P.e_po_base)
    f64 = jnp.float64

    def pois(k, lamf, lf_k):
        return k * jnp.log(lamf) - lamf - lf_k

    P13 = jnp.stack([
        cb_u.astype(f64), ce_u.astype(f64), lf_cb, lf_ce,
        b_u.astype(f64), (e_u - 1).astype(f64), lE_u,
        pois(cb_u, covHf, lf_cb), pois(ce_u, covHf, lf_ce),
        pois(cb_u, covDf, lf_cb), pois(ce_u, covDf, lf_ce),
        peob_u, peoe_u], axis=-1)
    packL = jnp.stack([cce_u.astype(f64), (e_u - 1).astype(f64),
                       ce_u.astype(f64)], axis=-1)
    packR = jnp.stack([ccb_u.astype(f64), b_u.astype(f64),
                       cb_u.astype(f64)], axis=-1)

    logpE = jnp.maximum(
        (bcnt * jnp.log(covEf) - covEf - lf_bcnt)
        + (ecnt * jnp.log(covEf) - covEf - lf_ecnt) + P.e_po_base, pe_rel)

    gH = PP.gcov[HAPLO].astype(jnp.float64)
    gD = PP.gcov[DIPLO].astype(jnp.float64)
    cols = jnp.arange(max_m)[None, :]
    inb = cols < m[:, None]
    cov_t = jnp.broadcast_to(PP.gcov[None, :], (R2, 4))

    rel_lanes = 1  # lane-splitting measured net-negative on the real body

    def dp(cov):
        return rel_dp_pass2(bpos, bcnt, epos, ecnt, max_cc,
                            lf_bcnt, logpE, m, plen,
                            fwd, cov, P, max_m, lanes=rel_lanes)[0]

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
    asgn_un = jnp.full((Bn, max_n), N_STATE, jnp.int32)
    asgn_un = asgn_un.at[
        rel_rows[:, None], rel_cols].set(rel_out, mode="drop")

    # ---- unreliable-interval relaxation -----------------------------------
    undyn = {"is_rel": is_rel_u, "asgn": asgn_un,
             "P13": P13, "packL": packL, "packR": packR}
    xs_desc = {"idx": idx_desc, "live": live_u}
    xs_asc = {"idx": idx_asc, "live": live_u}
    un_lanes = 1   # lane-splitting measured net-negative on the real body
    return unrel_sweeps2(undyn, xs_desc, xs_asc, n_u, PP.unrel, max_n,
                         lanes=un_lanes)
