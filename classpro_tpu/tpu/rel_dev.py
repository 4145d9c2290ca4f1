"""Batched reliable-interval DP on device (ref class_rel.c).

TPU-first redesign: the reference's DP carries full backtrack arrays per
cell and copies them at every step (O(M^2) per read, class_rel.c:401-407)
because two path features feed the transition weights:

* the D/H ratio of the three most recent alternating H/D intervals on the
  best path into a cell (calc_dh_ratio, class_rel.c:113-156)
* whether the path contains any D (or H) at all (class_rel.c:432-447)

Both are *incrementally maintainable*: we carry, per DP cell, the
(position, count) of the most recent H and D assignments, the most recent
H-before-that-D / D-before-that-H, and has-H/has-D flags.  When a cell
extends a path with state t, the registers update in O(1).  The scan
emits per-step backpointers and a reverse pass extracts the argmax path —
semantics identical to the reference, wall-clock O(M) per read, fully
batched over (B,) reads.

The 'all paths converge to REPEAT' shortcut (class_rel.c:348-380) mutates
the working interval copy (intvl[i] = intvl[i-1]); here that becomes an
'effective interval end' register carried through the scan.

Directionality: the backward pass runs the same scan over index-reversed
interval arrays with begin/end roles and offset signs flipped (static
``fwd`` flag -> two compiled variants).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from classpro_tpu.tpu.skellam_dev import logp_skellam_dev

ERROR, REPEAT, HAPLO, DIPLO, N_STATE = 0, 1, 2, 3, 4
NEG_INF = float("-inf")


class RelParams(NamedTuple):
    """Tables + scalars for the DP (replicated to every device)."""

    ta: jnp.ndarray        # skellam region-A table
    tb: jnp.ndarray        # skellam region-B table
    logfact: jnp.ndarray   # (32768,)
    read_len: float
    offset: int            # OFFSET (const.c:69)
    r_logp: float
    e_po_base: float
    log_1m_pe_mean: float  # log(1 - PE_MEAN)
    log_pe_mean: float     # log(PE_MEAN)
    dr_ratio: float


class Carry(NamedTuple):
    dp: jnp.ndarray        # (B, 4) f64
    st_pos: jnp.ndarray    # (B, 4 cells, 4 slots) i64; slots R,H,D used
    st_cnt: jnp.ndarray
    dh: jnp.ndarray        # (B, 4) f64 dh_ratio of the current cells
    lastH: jnp.ndarray     # (B, 4, 2) i64 (end pos, end cnt)
    lastD: jnp.ndarray
    lastHbD: jnp.ndarray   # most recent H before the most recent D
    lastDbH: jnp.ndarray
    exH: jnp.ndarray       # (B, 4) bool
    exD: jnp.ndarray
    exHbD: jnp.ndarray
    exDbH: jnp.ndarray
    hasH: jnp.ndarray      # (B, 4) bool — any H on path incl own cell
    hasD: jnp.ndarray
    eff_end_pos: jnp.ndarray  # (B,) i64 effective current-interval end
    eff_end_cnt: jnp.ndarray


def _logp_poisson(k, lam, logfact):
    k = jnp.minimum(jnp.asarray(k, jnp.int64), logfact.shape[0] - 1)
    return k * jnp.log(jnp.asarray(lam, jnp.float64)) - lam - logfact[k]


def _logp_binom(k, n, logp_, log1mp, logfact):
    kc = jnp.minimum(jnp.asarray(k, jnp.int64), logfact.shape[0] - 1)
    nc = jnp.minimum(jnp.asarray(n, jnp.int64), logfact.shape[0] - 1)
    return (logfact[nc] - logfact[kc] - logfact[nc - kc]
            + kc * logp_ + (nc - kc) * log1mp)


def _logp_trans(b, e, cb, ce, cov, P: RelParams):
    lam = jnp.asarray(cov, jnp.float64) * jnp.abs(e - b) / P.read_len
    return logp_skellam_dev(ce - cb, lam, P.ta, P.tb, P.logfact)


@functools.partial(jax.jit, static_argnames=("fwd", "max_m"))
def rel_dp_pass(intvl_b, intvl_e, intvl_ccb, intvl_cce, intvl_pe, m, plen,
                cov, P: RelParams, fwd: bool, max_m: int):
    """One DP pass over (B, max_m) interval arrays (index-reversed by the
    caller for the backward direction).  Returns asgn (B, max_m) int8 in
    scanned order (entries beyond each read's m are meaningless)."""
    B = intvl_b.shape[0]
    OFF = P.offset if fwd else -P.offset
    PSTEP = 1 if fwd else -1  # _pred(pos) = pos - PSTEP

    def ends(i_arrs):
        b, e, ccb, cce = i_arrs
        if fwd:
            return b, ccb, e - 1, cce
        return e - 1, cce, b, ccb

    # ---------------- init cell (class_rel.c:544-595) -------------------
    pos_init = (jnp.zeros(B, jnp.int64) - P.offset if fwd
                else plen.astype(jnp.int64) + P.offset)
    st_pos = jnp.broadcast_to(pos_init[:, None, None], (B, 4, 4)).astype(jnp.int64)
    st_cnt = jnp.broadcast_to(cov[:, None, :], (B, 4, 4)).astype(jnp.int64)

    ccb0, cce0, pe0 = intvl_ccb[:, 0], intvl_cce[:, 0], intvl_pe[:, 0]
    bpos0, bcnt0, epos0, ecnt0 = ends(
        (intvl_b[:, 0], intvl_e[:, 0], ccb0, cce0))
    bcnt0 = bcnt0.astype(jnp.int64)
    ecnt0 = ecnt0.astype(jnp.int64)
    epos0 = epos0.astype(jnp.int64)

    dpE = jnp.maximum(
        _logp_poisson(ccb0, cov[:, ERROR], P.logfact)
        + _logp_poisson(cce0, cov[:, ERROR], P.logfact) + P.e_po_base, pe0)

    st_r_cnt = cov[:, REPEAT].astype(jnp.int64)
    logp_er = jnp.where(
        bcnt0 < st_r_cnt,
        _logp_binom(bcnt0, st_r_cnt, P.log_1m_pe_mean, P.log_pe_mean,
                    P.logfact), NEG_INF)
    max_cc0 = jnp.maximum(ccb0, cce0)
    dpR = jnp.where(
        logp_er > P.r_logp, logp_er,
        jnp.where((max_cc0 >= cov[:, REPEAT]) | (max_cc0 >= st_r_cnt),
                  P.r_logp, logp_er))
    st_pos = st_pos.at[:, REPEAT, REPEAT].set(epos0)
    st_cnt = st_cnt.at[:, REPEAT, REPEAT].set(
        jnp.minimum(ecnt0, cov[:, REPEAT]))

    dpH = _logp_poisson(bcnt0, cov[:, HAPLO], P.logfact)
    st_pos = st_pos.at[:, HAPLO, HAPLO].set(epos0)
    st_cnt = st_cnt.at[:, HAPLO, HAPLO].set(ecnt0)
    st_pos = st_pos.at[:, HAPLO, DIPLO].set(epos0 - OFF)
    st_cnt = st_cnt.at[:, HAPLO, DIPLO].set(ecnt0 + cov[:, HAPLO])

    dpD = _logp_poisson(bcnt0, cov[:, DIPLO], P.logfact)
    st_pos = st_pos.at[:, DIPLO, HAPLO].set(epos0 - OFF)
    st_cnt = st_cnt.at[:, DIPLO, HAPLO].set(
        jnp.maximum(ecnt0 // 2, ecnt0 - cov[:, HAPLO]))
    st_pos = st_pos.at[:, DIPLO, DIPLO].set(epos0)
    st_cnt = st_cnt.at[:, DIPLO, DIPLO].set(ecnt0)

    dp0 = jnp.stack([dpE, dpR, dpH, dpD], axis=1)
    mx0 = jnp.max(dp0, axis=1, keepdims=True)
    dp0 = dp0 - (mx0 + jnp.log(jnp.sum(jnp.exp(dp0 - mx0), axis=1,
                                       keepdims=True)))

    z2 = jnp.zeros((B, 4, 2), jnp.int64)
    f4 = jnp.zeros((B, 4), bool)
    e2 = jnp.stack([epos0, ecnt0], axis=1)
    carry0 = Carry(
        dp=dp0, st_pos=st_pos, st_cnt=st_cnt,
        dh=jnp.full((B, 4), NEG_INF),
        lastH=z2.at[:, HAPLO, :].set(e2),
        lastD=z2.at[:, DIPLO, :].set(e2),
        lastHbD=z2, lastDbH=z2,
        exH=f4.at[:, HAPLO].set(True), exD=f4.at[:, DIPLO].set(True),
        exHbD=f4, exDbH=f4,
        hasH=f4.at[:, HAPLO].set(True), hasD=f4.at[:, DIPLO].set(True),
        eff_end_pos=epos0, eff_end_cnt=ecnt0,
    )

    # ---------------- scan body (class_rel.c:279-513) --------------------
    def body(carry: Carry, xs):
        Ib, Ie, Iccb, Icce, Ipe, i = xs
        bpos, bcnt, epos, ecnt = ends((Ib, Ie, Iccb, Icce))
        bcnt = bcnt.astype(jnp.int64)
        ecnt = ecnt.astype(jnp.int64)
        epos = epos.astype(jnp.int64)
        dp, dh = carry.dp, carry.dh

        # ---- emissions/transitions as (B, pred s, target t) -------------
        logpE = jnp.broadcast_to(
            (jnp.maximum(
                _logp_poisson(Iccb, cov[:, ERROR], P.logfact)
                + _logp_poisson(Icce, cov[:, ERROR], P.logfact)
                + P.e_po_base, Ipe))[:, None], (B, 4))

        strc = carry.st_cnt[:, :, REPEAT]
        logp_er_r = jnp.where(
            bcnt[:, None] < strc,
            _logp_binom(bcnt[:, None], strc, P.log_1m_pe_mean,
                        P.log_pe_mean, P.logfact), NEG_INF)
        max_cc = jnp.maximum(Iccb, Icce)[:, None]
        logpR = jnp.where(
            logp_er_r > P.r_logp, logp_er_r,
            jnp.where((max_cc >= cov[:, REPEAT][:, None]) | (max_cc >= strc),
                      P.r_logp, logp_er_r))

        sth_p = carry.st_pos[:, :, HAPLO]
        sth_c = carry.st_cnt[:, :, HAPLO]
        std_p = carry.st_pos[:, :, DIPLO]
        std_c = carry.st_cnt[:, :, DIPLO]
        h_plain = _logp_trans(sth_p - PSTEP, bpos[:, None], sth_c,
                              bcnt[:, None], sth_c, P)
        h_ratio = _logp_trans(std_p - PSTEP, bpos[:, None], std_c,
                              (dh * bcnt[:, None]).astype(jnp.int64),
                              std_c, P)
        logpH = jnp.where(dh != NEG_INF, h_ratio, h_plain)
        logpD = _logp_trans(std_p - PSTEP, bpos[:, None], std_c,
                            bcnt[:, None], std_c, P)

        logp_st = jnp.stack([logpE, logpR, logpH, logpD], axis=2)
        # Joint normalization over all 16 (s,t) entries (class_rel.c:321-336),
        # reformulated in log space (the target TPU's f64 emulation has f32
        # *range*, so probabilities may not be materialized):
        #   logp_tr = lp - logsumexp(live lp)
        # with the reference's exact special cases reproduced:
        #   * dead predecessors contribute probability 0 -> -inf entries
        #   * psum == 0 in C (all exp underflow, lp < ~-745.13) triggers the
        #     DEBUG fallback: every (s, ERROR) entry gets prob 1/4
        #   * any lp == +inf in C makes psum inf: that entry becomes NaN
        #     (log(inf/inf)) and all others -inf
        lp = jnp.where((dp == NEG_INF)[:, :, None], NEG_INF, logp_st)
        mx = jnp.max(lp, axis=(1, 2))
        has_inf = jnp.isposinf(mx)
        zero = mx < -745.13  # C: psum == 0.0
        mx_safe = jnp.where(has_inf | zero, 0.0, mx)
        lse = mx_safe + jnp.log(
            jnp.sum(jnp.exp(lp - mx_safe[:, None, None]), axis=(1, 2)))
        logp_tr = lp - lse[:, None, None]
        logp_tr = jnp.where(
            has_inf[:, None, None],
            jnp.where(jnp.isposinf(lp), jnp.nan, NEG_INF), logp_tr)
        logp_tr = jnp.where(
            zero[:, None, None],
            jnp.where(jnp.arange(4)[None, None, :] == ERROR,
                      jnp.log(0.25), NEG_INF), logp_tr)

        # ---- only_r (class_rel.c:348-356)
        scores = dp[:, :, None] + logp_tr
        best_t = jnp.argmax(scores, axis=2)
        dead_s = jnp.max(scores, axis=2) == NEG_INF
        only_r = jnp.all(dead_s | (best_t == REPEAT), axis=1)

        # ---- HH/DD coupling (class_rel.c:383-386)
        colH = scores[:, :, HAPLO]
        colD = scores[:, :, DIPLO]
        maxs_h = jnp.where(jnp.max(colH, axis=1) == NEG_INF, N_STATE,
                           jnp.argmax(colH, axis=1))
        maxs_d = jnp.where(jnp.max(colD, axis=1) == NEG_INF, N_STATE,
                           jnp.argmax(colD, axis=1))
        couple = (maxs_h == HAPLO) & (maxs_d == DIPLO)
        mcoup = jnp.minimum(logp_tr[:, HAPLO, HAPLO],
                            logp_tr[:, DIPLO, DIPLO])
        logp_tr = logp_tr.at[:, HAPLO, HAPLO].set(
            jnp.where(couple, mcoup, logp_tr[:, HAPLO, HAPLO]))
        logp_tr = logp_tr.at[:, DIPLO, DIPLO].set(
            jnp.where(couple, mcoup, logp_tr[:, DIPLO, DIPLO]))
        scores = dp[:, :, None] + logp_tr

        # ---- per-target best pred (class_rel.c:390-397)
        max_s = jnp.argmax(scores, axis=1)      # (B, t); ties -> E<R<H<D ✓
        max_v = jnp.max(scores, axis=1)
        dead_t = max_v == NEG_INF
        sel = jnp.where(dead_t, 0, max_s)

        def g3(reg):
            return jnp.take_along_axis(reg, sel[:, :, None], axis=1)

        def g2(reg):
            return jnp.take_along_axis(reg, sel, axis=1)

        st_pos_n, st_cnt_n = g3(carry.st_pos), g3(carry.st_cnt)
        lastH_n, lastD_n = g3(carry.lastH), g3(carry.lastD)
        lastHbD_n, lastDbH_n = g3(carry.lastHbD), g3(carry.lastDbH)
        exH_n, exD_n = g2(carry.exH), g2(carry.exD)
        exHbD_n, exDbH_n = g2(carry.exHbD), g2(carry.exDbH)
        hasH_n, hasD_n = g2(carry.hasH), g2(carry.hasD)

        off_end = epos - OFF

        # REPEAT target st (class_rel.c:413-425)
        rp, rc = st_pos_n[:, REPEAT, :], st_cnt_n[:, REPEAT, :]
        r_cnt = jnp.minimum(ecnt, cov[:, REPEAT])
        keep_r = rc[:, REPEAT] < r_cnt
        newR_pos = rp.at[:, HAPLO].set(off_end).at[:, DIPLO].set(off_end)
        newR_pos = newR_pos.at[:, REPEAT].set(
            jnp.where(keep_r, rp[:, REPEAT], off_end))
        newR_cnt = rc.at[:, REPEAT].set(
            jnp.where(keep_r, rc[:, REPEAT], r_cnt))

        # dh ratio from registers (calc_dh_ratio, class_rel.c:113-156)
        def dh_ratio_of(init_s: int):
            if init_s == HAPLO:
                o2, oe2 = lastD_n[:, HAPLO, :], exD_n[:, HAPLO]
                o3, oe3 = lastHbD_n[:, HAPLO, :], exHbD_n[:, HAPLO]
            else:
                o2, oe2 = lastH_n[:, DIPLO, :], exH_n[:, DIPLO]
                o3, oe3 = lastDbH_n[:, DIPLO, :], exDbH_n[:, DIPLO]
            ok = oe2 & oe3
            s1p, s1c = bpos.astype(jnp.int64), bcnt
            tp, tc = o2[:, 0], o2[:, 1]
            s2p, s2c = o3[:, 0], o3[:, 1]
            if not fwd:  # class_rel.c:134-138 swap
                s1p, s1c, s2p, s2c = s2p, s2c, s1p, s1c
            est = (s2c.astype(jnp.float64)
                   + (s1c - s2c).astype(jnp.float64)
                   * (tp - s2p) / (s1p - s2p))
            r = est / tc if init_s == DIPLO else tc / est
            return jnp.where(ok, r, NEG_INF)

        rH = dh_ratio_of(HAPLO)
        rD = dh_ratio_of(DIPLO)

        # HAPLO target (class_rel.c:426-459)
        curr_h_H = ecnt
        curr_d_H = jnp.where(
            rH != NEG_INF, (rH * curr_h_H).astype(jnp.int64),
            jnp.where(hasD_n[:, HAPLO], st_cnt_n[:, HAPLO, DIPLO],
                      curr_h_H + cov[:, HAPLO]))
        curr_r_H = (P.dr_ratio * curr_d_H).astype(jnp.int64)

        # DIPLO target (class_rel.c:460-493)
        curr_d_D = ecnt
        curr_h_D = jnp.where(
            rD != NEG_INF, (curr_d_D / rD).astype(jnp.int64),
            jnp.where(hasH_n[:, DIPLO], st_cnt_n[:, DIPLO, HAPLO],
                      jnp.maximum(curr_d_D // 2, curr_d_D - cov[:, HAPLO])))
        curr_r_D = (P.dr_ratio * curr_d_D).astype(jnp.int64)

        new_st_pos, new_st_cnt = st_pos_n, st_cnt_n
        new_st_pos = new_st_pos.at[:, REPEAT, :].set(newR_pos)
        new_st_cnt = new_st_cnt.at[:, REPEAT, :].set(newR_cnt)
        for cell, trip in ((HAPLO, (curr_h_H, curr_d_H, curr_r_H)),
                           (DIPLO, (curr_h_D, curr_d_D, curr_r_D))):
            h, d, r_ = trip
            for slot, cnt in ((HAPLO, h), (DIPLO, d), (REPEAT, r_)):
                new_st_pos = new_st_pos.at[:, cell, slot].set(off_end)
                new_st_cnt = new_st_cnt.at[:, cell, slot].set(cnt)

        new_dh = jnp.full((B, 4), NEG_INF)
        new_dh = new_dh.at[:, HAPLO].set(rH).at[:, DIPLO].set(rD)

        gate = ((new_st_cnt[:, :, HAPLO] < new_st_cnt[:, :, DIPLO])
                & (new_st_cnt[:, :, DIPLO] < new_st_cnt[:, :, REPEAT]))
        new_dp = jnp.where(dead_t | ~gate, NEG_INF, max_v)

        # path registers: extend with target t
        tgt = jnp.arange(4)[None, :]
        cur2 = jnp.broadcast_to(
            jnp.stack([epos, ecnt], axis=1)[:, None, :], (B, 4, 2))
        isH, isD = tgt == HAPLO, tgt == DIPLO
        new_lastH = jnp.where(isH[:, :, None], cur2, lastH_n)
        new_lastD = jnp.where(isD[:, :, None], cur2, lastD_n)
        new_lastHbD = jnp.where(isD[:, :, None], lastH_n, lastHbD_n)
        new_lastDbH = jnp.where(isH[:, :, None], lastD_n, lastDbH_n)
        new_exH = exH_n | isH[0]
        new_exD = exD_n | isD[0]
        new_exHbD = jnp.where(isD[0], exH_n, exHbD_n)
        new_exDbH = jnp.where(isH[0], exD_n, exDbH_n)
        new_hasH = hasH_n | isH[0]
        new_hasD = hasD_n | isD[0]

        # ---- only_r overrides (class_rel.c:357-380): same-state copy
        alive = dp != NEG_INF
        s_self = jnp.arange(4)[None, :]
        eff2 = jnp.broadcast_to(
            jnp.stack([carry.eff_end_pos, carry.eff_end_cnt],
                      axis=1)[:, None, :], (B, 4, 2))
        oH = (s_self == HAPLO) & alive
        oD = (s_self == DIPLO) & alive
        o = dict(
            dp=dp, st_pos=carry.st_pos, st_cnt=carry.st_cnt,
            dh=jnp.full((B, 4), NEG_INF),
            lastH=jnp.where(oH[:, :, None], eff2, carry.lastH),
            lastD=jnp.where(oD[:, :, None], eff2, carry.lastD),
            lastHbD=jnp.where(oD[:, :, None], carry.lastH, carry.lastHbD),
            lastDbH=jnp.where(oH[:, :, None], carry.lastD, carry.lastDbH),
            exH=carry.exH | oH, exD=carry.exD | oD,
            exHbD=jnp.where(oD, carry.exH, carry.exHbD),
            exDbH=jnp.where(oH, carry.exD, carry.exDbH),
            hasH=carry.hasH | oH, hasD=carry.hasD | oD,
        )
        n = dict(
            dp=new_dp, st_pos=new_st_pos, st_cnt=new_st_cnt, dh=new_dh,
            lastH=new_lastH, lastD=new_lastD, lastHbD=new_lastHbD,
            lastDbH=new_lastDbH, exH=new_exH, exD=new_exD,
            exHbD=new_exHbD, exDbH=new_exDbH, hasH=new_hasH, hasD=new_hasD,
        )

        live = i < m

        def pick(name):
            upd, onr, old = n[name], o[name], getattr(carry, name)
            shape = (B,) + (1,) * (upd.ndim - 1)
            return jnp.where(live.reshape(shape),
                             jnp.where(only_r.reshape(shape), onr, upd), old)

        carry_n = Carry(
            **{k: pick(k) for k in n},
            eff_end_pos=jnp.where(live, jnp.where(only_r, carry.eff_end_pos,
                                                  epos), carry.eff_end_pos),
            eff_end_cnt=jnp.where(live, jnp.where(only_r, carry.eff_end_cnt,
                                                  ecnt), carry.eff_end_cnt),
        )
        bp = jnp.where(live[:, None],
                       jnp.where(only_r[:, None], jnp.arange(4)[None, :],
                                 jnp.where(dead_t, N_STATE, max_s)),
                       N_STATE).astype(jnp.int8)
        return carry_n, (bp, live & only_r)

    steps = jnp.arange(1, max_m)
    xs = (intvl_b[:, 1:].T, intvl_e[:, 1:].T, intvl_ccb[:, 1:].T,
          intvl_cce[:, 1:].T, intvl_pe[:, 1:].T, steps)
    carry_f, (bps, rposs) = jax.lax.scan(body, carry0, xs)
    bps = jnp.moveaxis(bps, 0, 1)       # (B, max_m-1, 4)
    rpos = jnp.concatenate(
        [jnp.zeros((B, 1), bool), jnp.moveaxis(rposs, 0, 1)], axis=1)

    # ---------------- traceback (class_rel.c:606-613) --------------------
    last = jnp.maximum(m - 1, 0)
    cur0 = jnp.argmax(carry_f.dp, axis=1).astype(jnp.int32)

    def tb_body(cur, xs2):
        bp_j, j = xs2  # bp_j: (B, 4) backpointers into step j
        out_j = cur
        prev = jnp.take_along_axis(
            bp_j, jnp.clip(cur, 0, 3)[:, None].astype(jnp.int32),
            axis=1)[:, 0].astype(jnp.int32)
        newcur = jnp.where(j <= last, prev, cur)
        return newcur, out_j

    js = jnp.arange(max_m - 1, 0, -1)
    bps_rev = jnp.moveaxis(bps, 1, 0)[::-1]  # (max_m-1, B, 4), j desc
    state0, outs = jax.lax.scan(tb_body, cur0, (bps_rev, js))
    asgn = jnp.concatenate(
        [state0[:, None], jnp.moveaxis(outs, 0, 1)[:, ::-1]],
        axis=1).astype(jnp.int8)
    asgn = jnp.where(rpos, jnp.int8(REPEAT), asgn)
    return asgn, carry_f.dp
