"""Batched unreliable-interval relaxation on device (ref class_unrel.c).

Two sweeps over intervals in min-boundary-count order; each step updates
one interval's state per read, with nearest-reliable-neighbor searches
expressed as masked reductions over the (B, MAXN) interval axis.  The
sweep is a `lax.scan` whose carry is the per-read assignment vector (the
relaxation is genuinely sequential: later steps read earlier updates).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from classpro_tpu.tpu.skellam_dev import logp_skellam_dev

ERROR, REPEAT, HAPLO, DIPLO, N_STATE = 0, 1, 2, 3, 4
NEG_INF = float("-inf")
BIG = jnp.int32(1 << 30)


class UnrelParams(NamedTuple):
    ta: jnp.ndarray
    tb: jnp.ndarray
    logfact: jnp.ndarray
    btg_log: jnp.ndarray     # (R, n_cap, n_cap) log binomial tail table
    unrel_idx: int           # erate index of 0.1
    n_cap: int
    read_len: float
    r_logp: float
    e_po_base: float
    log_1m_pe_mean: float
    log_pe_mean: float
    dr_ratio: float
    cov_e: int
    cov_r: int
    cov_h: int
    cov_d: int


def _logp_poisson(k, lam, logfact):
    k = jnp.minimum(jnp.asarray(k, jnp.int64), logfact.shape[0] - 1)
    return k * jnp.log(jnp.asarray(lam, jnp.float64)) - lam - logfact[k]


def _logp_binom(k, n, logp_, log1mp, logfact):
    kc = jnp.minimum(jnp.asarray(k, jnp.int64), logfact.shape[0] - 1)
    nc = jnp.minimum(jnp.asarray(n, jnp.int64), logfact.shape[0] - 1)
    return (logfact[nc] - logfact[kc] - logfact[nc - kc]
            + kc * logp_ + (nc - kc) * log1mp)


def _logp_trans(b, e, cb, ce, cov, P):
    lam = jnp.asarray(cov, jnp.float64) * jnp.abs(e - b) / P.read_len
    return logp_skellam_dev(ce - cb, lam, P.ta, P.tb, P.logfact)


@functools.partial(jax.jit, static_argnames=("max_n",))
def unrel_sweeps(fields, iord, n, P: UnrelParams, max_n: int):
    """fields: dict of (B, max_n) arrays — b, e, cb, ce, ccb, cce, pe,
    pe_o_b, pe_o_e, is_rel (bool), asgn (int8, N_STATE=unclassified,
    rel-classified values filled in).  iord: (B, max_n) count-sorted
    interval indices (stable).  n: (B,) interval counts.

    Returns final asgn (B, max_n) int8 (class_unrel.c:248-300)."""
    B = fields["b"].shape[0]
    cols = jnp.arange(max_n, dtype=jnp.int32)[None, :]
    valid = cols < n[:, None]
    is_rel = fields["is_rel"] & valid
    asgn0 = fields["asgn"].astype(jnp.int32)
    is_fixed = is_rel & ((asgn0 == HAPLO) | (asgn0 == DIPLO))

    cb, ce = fields["cb"], fields["ce"]
    ccb, cce = fields["ccb"], fields["cce"]
    bb, ee = fields["b"], fields["e"]
    pe, peob, peoe = fields["pe"], fields["pe_o_b"], fields["pe_o_e"]

    def find_nn(asgn, idx, s):
        """Nearest is_rel & asgn==s interval left/right of idx (class_unrel.c:11-25).
        Returns (l, r) indices, -1 if absent.  s may be (B,) or scalar."""
        match = is_rel & (asgn == (s if jnp.ndim(s) == 0 else s[:, None]))
        left = jnp.where(match & (cols < idx[:, None]), cols, -1)
        l = jnp.max(left, axis=1)
        right = jnp.where(match & (cols > idx[:, None]), cols, BIG)
        r = jnp.min(right, axis=1)
        r = jnp.where(r == BIG, -1, r)
        return l, r

    def gat(arr, idx):
        return jnp.take_along_axis(arr, jnp.maximum(idx, 0)[:, None],
                                   axis=1)[:, 0]

    def est_cov_level(asgn, x, idx, s):
        """One level of est_cov (class_unrel.c:27-43): interpolated count,
        plus a found flag; no cross-state fallback here."""
        l, r = find_nn(asgn, idx, s)
        Lc = gat(cce, l)
        Le = gat(ee, l) - 1
        Rc = gat(ccb, r)
        Rb = gat(bb, r)
        both = (l != -1) & (r != -1)
        interp = (Lc.astype(jnp.float64)
                  + (Rc - Lc).astype(jnp.float64) * (x - Le) / (Rb - Le))
        val = jnp.where(both, interp.astype(jnp.int64),
                        jnp.where(l != -1, Lc,
                                  jnp.where(r != -1, Rc, 0)))
        found = (l != -1) | (r != -1)
        return val.astype(jnp.int64), found

    def est_cov(asgn, x, idx, s: int):
        v, found = est_cov_level(asgn, x, idx, s)
        other = DIPLO if s == HAPLO else HAPLO
        v2, found2 = est_cov_level(asgn, x, idx, other)
        fb = jnp.where(found2 & (v2 > 0),
                       v2 // 2 if s == HAPLO else v2 * 2,
                       P.cov_h if s == HAPLO else P.cov_d)
        return jnp.where(found, v, fb)

    def btg_gather_log(k, nn):
        """log binom tail at the unrel 0.1 rate (log precomputed on host:
        the TPU's f64 range cannot hold sub-1e-38 probabilities)."""
        kq = jnp.clip(k, 0, P.n_cap - 1)
        nq = jnp.clip(nn, 1, P.n_cap - 1)
        return P.btg_log[P.unrel_idx, nq, kq]

    def logp_e_u(idx):
        icb, ice, ipe = gat(cb, idx), gat(ce, idx), gat(pe, idx)
        po = (_logp_poisson(icb, P.cov_e, P.logfact)
              + _logp_poisson(ice, P.cov_e, P.logfact) + P.e_po_base)
        return jnp.maximum(ipe, po)

    def logp_r_u(idx, asgn):
        icb, ice = gat(cb, idx), gat(ce, idx)
        l, r = find_nn(asgn, idx, DIPLO)
        dl = jnp.where(l != -1, gat(ce, l),
                       jnp.where(r != -1, gat(cb, r), P.cov_d))
        dr = jnp.where(r != -1, gat(cb, r),
                       jnp.where(l != -1, gat(ce, l), P.cov_d))
        rl = (P.dr_ratio * dl).astype(jnp.int64)
        rr = (P.dr_ratio * dr).astype(jnp.int64)
        over = (icb >= rl) | (ice >= rr)
        lp = (_logp_binom(icb, rl, P.log_1m_pe_mean, P.log_pe_mean, P.logfact)
              + _logp_binom(ice, rr, P.log_1m_pe_mean, P.log_pe_mean,
                            P.logfact))
        hi = jnp.maximum(icb, ice) >= P.cov_r
        return jnp.where(hi, 0.0, jnp.where(over, P.r_logp, lp))

    def logp_hd_u(s: int, idx, asgn):
        icb, ice = gat(cb, idx), gat(ce, idx)
        ib, ie = gat(bb, idx), gat(ee, idx)
        l_rel, r_rel = find_nn(asgn, idx, s)
        # left side
        nb = gat(asgn, idx - 1)
        l_er = jnp.where((idx - 1 >= 0) & (nb == s), gat(peob, idx), NEG_INF)
        Lc = gat(cce, l_rel)
        Le = gat(ee, l_rel) - 1
        l_sf = jnp.where(l_rel != -1,
                         _logp_trans(Le, ib, Lc, icb, Lc, P), NEG_INF)
        estl = est_cov(asgn, ib, idx, s)
        # p_errorin(OTHERS, 0.1, est, cb) = btg(est - cb, est)
        l_sfe = jnp.where(estl >= icb,
                          btg_gather_log(estl - icb, estl), NEG_INF)
        logp_l = jnp.maximum(jnp.maximum(l_er, l_sf), l_sfe)
        # right side
        na = gat(asgn, jnp.minimum(idx + 1, max_n - 1))
        r_er = jnp.where((idx + 1 < n) & (na == s), gat(peoe, idx), NEG_INF)
        Rc = gat(ccb, r_rel)
        Rb = gat(bb, r_rel)
        r_sf = jnp.where(r_rel != -1,
                         _logp_trans(ie - 1, Rb, ice, Rc, Rc, P), NEG_INF)
        estr = est_cov(asgn, ie - 1, idx, s)
        r_sfe = jnp.where(estr >= ice,
                          btg_gather_log(estr - ice, estr), NEG_INF)
        logp_r_ = jnp.maximum(jnp.maximum(r_er, r_sf), r_sfe)

        gcov = P.cov_h if s == HAPLO else P.cov_d
        both_inf = (logp_l == NEG_INF) & (logp_r_ == NEG_INF)
        lp_l = jnp.where(both_inf, _logp_poisson(icb, gcov, P.logfact),
                         jnp.where(logp_l == NEG_INF, logp_r_, logp_l))
        lp_r = jnp.where(both_inf, _logp_poisson(ice, gcov, P.logfact),
                         jnp.where(logp_r_ == NEG_INF, lp_l, logp_r_))
        # note: when only logp_l was -inf, lp_r must stay logp_r_ (it does)
        return lp_l + lp_r

    def update_state(asgn, idx, active):
        icb, ice = gat(cb, idx), gat(ce, idx)
        lE = logp_e_u(idx)
        lR = logp_r_u(idx, asgn)
        lH = logp_hd_u(HAPLO, idx, asgn)
        lD = logp_hd_u(DIPLO, idx, asgn)
        smax = jnp.argmax(jnp.stack([lE, lR, lH, lD], axis=1), axis=1)
        force_r = jnp.maximum(icb, ice) >= P.cov_r
        new = jnp.where(force_r, REPEAT, smax).astype(jnp.int32)
        cur = gat(asgn, idx)
        upd = jnp.where(active, new, cur)
        return jnp.where(
            (cols == idx[:, None]) & active[:, None],
            upd[:, None], asgn)

    # sweep 1: descending sorted order i = N-1 .. 0 (class_unrel.c:260)
    asgn = asgn0
    desc = (n[:, None] - 1 - cols)  # per-read descending positions
    asc = cols

    def run_order(asgn, order):
        def step(a, j):
            k = order[:, j]
            idx = jnp.take_along_axis(iord, jnp.maximum(k, 0)[:, None],
                                      axis=1)[:, 0]
            fixed = jnp.take_along_axis(is_fixed, idx[:, None], axis=1)[:, 0]
            active = (k >= 0) & (k < n) & ~fixed
            idx = jnp.where(active, idx, 0)
            return update_state(a, idx, active), None

        a, _ = jax.lax.scan(step, asgn, jnp.arange(max_n))
        return a

    asgn = run_order(asgn, desc)
    asgn = run_order(asgn, asc)
    return asgn.astype(jnp.int8)
