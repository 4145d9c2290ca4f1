"""Batched unreliable-interval relaxation on device, v2 (ref class_unrel.c).

Redesign of unrel_dev.py under the measured TPU cost model (see
rel_dev2.py): the two relaxation sweeps remain genuinely sequential
`lax.scan`s (later steps read earlier updates), but each step now costs
two small gathers instead of ~30:

* per-interval static terms (boundary counts/positions, Poisson
  emissions, log-factorials, wall error log-probs) are precomputed ONCE
  per call outside the scan (device_pipeline.py derives them from the
  compact int planes) and packed into a (B, N, 13) value tensor; each
  step reads its interval's row with a single one-hot contraction;
* dynamic values (the evolving assignment vector, nearest-reliable-
  neighbor searches and the values at those neighbors) are masked
  reductions / one-hot contractions over the (B, N) interval axis — no
  gathers;
* the four Skellam drift terms of a step run as ONE packed-table call;
  the four binomial-tail lookups as ONE flat gather.

Semantics identical to unrel_dev.py (argmax decisions, C special
cases); byte-identity re-verified end to end by tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from classpro_tpu.tpu.skellam_dev import PackedSkellam, logp_skellam_packed

ERROR, REPEAT, HAPLO, DIPLO, N_STATE = 0, 1, 2, 3, 4
NEG_INF = float("-inf")
BIG = jnp.int32(1 << 30)

# plane order in the per-interval static value tensor `P13`
(_CB, _CE, _LFCB, _LFCE, _XL, _XR, _LE,
 _POHB, _POHE, _PODB, _PODE, _PEOB, _PEOE) = range(13)


class UnrelParams2(NamedTuple):
    ps: PackedSkellam
    lf_small: jnp.ndarray    # (n1,) logfact head (one-hot R-binomial)
    btg_flat: jnp.ndarray    # (n_cap*n_cap,) log binom tail at erate 0.1
    n_cap: int
    read_len: float
    r_logp: float
    log_1m_pe_mean: float
    log_pe_mean: float
    dr_ratio: float
    cov_r: int
    cov_h: int
    cov_d: int


def _lf_oh(idx, lf_small):
    n1 = lf_small.shape[0]
    i = jnp.clip(idx, 0, n1 - 1)
    oh = jnp.arange(n1) == i[..., None]
    return jnp.sum(jnp.where(oh, lf_small, 0.0), axis=-1)


@functools.partial(jax.jit, static_argnames=("max_n", "lanes"))
def unrel_sweeps2(dyn, xs_desc, xs_asc, n, P: UnrelParams2, max_n: int,
                  lanes: int = 1):
    """Two relaxation sweeps (class_unrel.c:248-300).

    dyn: dict of device arrays in ORIGINAL interval order —
      is_rel (bool (B,N)), asgn (int32 (B,N), N_STATE = unclassified),
      P13 (f64 (B,N,13), plane order per module constants),
      packL = stack(cce, e-1, ce) and packR = stack(ccb, b, cb)
      (f64 (B,N,3)) — corrected counts/positions for drift/coverage
      estimation plus uncorrected ce/cb for the repeat test's neighbor
      coverages (class_unrel.c:73-81).
    xs_desc / xs_asc: dicts of (B, N) per-step inputs in processing
      order — idx (int32 interval index, 0 where not live), live (bool).
    n: (B,) int32 interval counts.

    ``lanes`` splits rows into independent carry chains whose gather and
    op latencies overlap inside the single scan (see rel_dev2.py).

    Returns final asgn (B, N) int8.
    """
    B = n.shape[0]
    assert B % lanes == 0
    Lb = B // lanes
    if lanes > 1:
        parts = []
        for s in range(lanes):
            sl = slice(s * Lb, (s + 1) * Lb)
            parts.append(_unrel_lane(
                {k: v[sl] for k, v in dyn.items()},
                {k: v[sl] for k, v in xs_desc.items()},
                {k: v[sl] for k, v in xs_asc.items()},
                n[sl], P, max_n))
        carries, runners = zip(*parts)

        def sweep(asgns, which):
            def body(a_t, x_t):
                out = []
                for s in range(lanes):
                    out.append(runners[s](a_t[s], x_t[s]))
                return tuple(out), None
            xs_t = tuple(c.xs[which] for c in carries)
            a, _ = jax.lax.scan(body, tuple(asgns), xs_t)
            return a

        asgns = tuple(c.asgn0 for c in carries)
        asgns = sweep(asgns, 0)
        asgns = sweep(asgns, 1)
        return jnp.concatenate([a.astype(jnp.int8) for a in asgns], axis=0)

    carry, runner = _unrel_lane(dyn, xs_desc, xs_asc, n, P, max_n)

    def body(a, x):
        return runner(a, x), None

    a, _ = jax.lax.scan(body, carry.asgn0, carry.xs[0])
    a, _ = jax.lax.scan(body, a, carry.xs[1])
    return a.astype(jnp.int8)


class _LaneState(NamedTuple):
    asgn0: jnp.ndarray
    xs: tuple


def _unrel_lane(dyn, xs_desc, xs_asc, n, P: UnrelParams2, max_n: int):
    """Build one lane's initial state and step runner."""
    cols = jnp.arange(max_n, dtype=jnp.int32)[None, :]
    valid = cols < n[:, None]
    is_rel = dyn["is_rel"] & valid
    asgn0 = dyn["asgn"].astype(jnp.int32)
    is_fixed = is_rel & ((asgn0 == HAPLO) | (asgn0 == DIPLO))

    packL, packR = dyn["packL"], dyn["packR"]
    P13 = dyn["P13"]

    def find_nn(asgn, idx, s):
        """Nearest is_rel & asgn==s interval left/right of idx
        (class_unrel.c:11-25); -1 if absent."""
        match = is_rel & (asgn == s)
        left = jnp.where(match & (cols < idx[:, None]), cols, -1)
        l = jnp.max(left, axis=1)
        right = jnp.where(match & (cols > idx[:, None]), cols, BIG)
        r = jnp.min(right, axis=1)
        r = jnp.where(r == BIG, -1, r)
        return l, r

    def extract_pack(pack, j):
        """pack[b, j[b], :] via one-hot sum; zeros when j == -1."""
        oh = (cols == j[:, None])[:, :, None]
        return jnp.sum(jnp.where(oh, pack, 0.0), axis=1)

    def extract_i(arr, j):
        oh = cols == j[:, None]
        return jnp.sum(jnp.where(oh, arr, 0), axis=1)

    def step_fn(asgn, x):
        idx = x["idx"]
        oh_idx = cols == idx[:, None]
        v = jnp.sum(jnp.where(oh_idx[:, :, None], P13, 0.0), axis=1)
        icb = v[:, _CB].astype(jnp.int64)
        ice = v[:, _CE].astype(jnp.int64)
        x_l, x_r = v[:, _XL], v[:, _XR]

        # ---- nearest reliable neighbors for H and D -----------------
        lH, rH = find_nn(asgn, idx, HAPLO)
        lD, rD = find_nn(asgn, idx, DIPLO)
        Lh = extract_pack(packL, lH)   # (cce, e-1, ce) at left H nbr
        Rh = extract_pack(packR, rH)   # (ccb, b, cb)   at right H nbr
        Ld = extract_pack(packL, lD)
        Rd = extract_pack(packR, rD)

        lE = v[:, _LE]

        # ---- logp_r_u (class_unrel.c:67-113): uncorrected nbr counts
        cov_d_f = jnp.asarray(P.cov_d, jnp.float64)
        dl = jnp.where(lD != -1, Ld[:, 2],
                       jnp.where(rD != -1, Rd[:, 2], cov_d_f))
        dr = jnp.where(rD != -1, Rd[:, 2],
                       jnp.where(lD != -1, Ld[:, 2], cov_d_f))
        rl = (P.dr_ratio * dl).astype(jnp.int64)
        rr = (P.dr_ratio * dr).astype(jnp.int64)
        over = (icb >= rl) | (ice >= rr)

        def binom(k, nn, lf_k):
            return (_lf_oh(nn, P.lf_small) - lf_k
                    - _lf_oh(nn - k, P.lf_small)
                    + k * P.log_1m_pe_mean + (nn - k) * P.log_pe_mean)

        lp_r = (binom(icb, rl, v[:, _LFCB]) + binom(ice, rr, v[:, _LFCE]))
        hi = jnp.maximum(icb, ice) >= P.cov_r
        lR = jnp.where(hi, 0.0, jnp.where(over, P.r_logp, lp_r))

        # ---- est_cov (class_unrel.c:27-43) ---------------------------
        def est_level(l, r, L, R, xq):
            Lc, Le = L[:, 0], L[:, 1]
            Rc, Rb = R[:, 0], R[:, 1]
            both = (l != -1) & (r != -1)
            interp = (Lc + (Rc - Lc) * (xq - Le) / (Rb - Le))
            val = jnp.where(both, interp.astype(jnp.int64),
                            jnp.where(l != -1, Lc.astype(jnp.int64),
                                      jnp.where(r != -1, Rc.astype(jnp.int64),
                                                0)))
            found = (l != -1) | (r != -1)
            return val, found

        def est_cov(s, xq):
            if s == HAPLO:
                vv, found = est_level(lH, rH, Lh, Rh, xq)
                v2, found2 = est_level(lD, rD, Ld, Rd, xq)
                fb = jnp.where(found2 & (v2 > 0), v2 // 2, P.cov_h)
            else:
                vv, found = est_level(lD, rD, Ld, Rd, xq)
                v2, found2 = est_level(lH, rH, Lh, Rh, xq)
                fb = jnp.where(found2 & (v2 > 0), v2 * 2, P.cov_d)
            return jnp.where(found, vv, fb)

        # ---- logp_h_u / logp_d_u (class_unrel.c:115-183) --------------
        # batched Skellam: [H-left, H-right, D-left, D-right]
        kk = jnp.stack([icb - Lh[:, 0].astype(jnp.int64),
                        Rh[:, 0].astype(jnp.int64) - ice,
                        icb - Ld[:, 0].astype(jnp.int64),
                        Rd[:, 0].astype(jnp.int64) - ice], axis=1)
        lamm = jnp.stack([
            Lh[:, 0] * jnp.abs(x_l - Lh[:, 1]) / P.read_len,
            Rh[:, 0] * jnp.abs(Rh[:, 1] - x_r) / P.read_len,
            Ld[:, 0] * jnp.abs(x_l - Ld[:, 1]) / P.read_len,
            Rd[:, 0] * jnp.abs(Rd[:, 1] - x_r) / P.read_len], axis=1)
        sk = logp_skellam_packed(kk, lamm, P.ps, nsplit=4)

        # batched binomial tails: est-coverage errors-in-others terms
        estf = jnp.stack([est_cov(HAPLO, x_l), est_cov(HAPLO, x_r),
                          est_cov(DIPLO, x_l), est_cov(DIPLO, x_r)], axis=1)
        cnt4 = jnp.stack([icb, ice, icb, ice], axis=1)
        nq = jnp.clip(estf, 1, P.n_cap - 1)
        kq = jnp.clip(estf - cnt4, 0, P.n_cap - 1)
        tidx = (nq * P.n_cap + kq).astype(jnp.int32)
        B_ = tidx.shape[0]
        tails = jnp.concatenate(
            [P.btg_flat[tidx[:, j]] for j in range(4)]).reshape(
                4, B_).T  # 4 overlapping sub-gathers (see split_gather)
        sfe = jnp.where(estf >= cnt4, tails, NEG_INF)

        def side(s, iL, iR):
            l_rel = lH if s == HAPLO else lD
            r_rel = rH if s == HAPLO else rD
            nb = extract_i(asgn, idx - 1)
            l_er = jnp.where((idx - 1 >= 0) & (nb == s),
                             v[:, _PEOB], NEG_INF)
            l_sf = jnp.where(l_rel != -1, sk[:, iL], NEG_INF)
            logp_l = jnp.maximum(jnp.maximum(l_er, l_sf), sfe[:, iL])
            na = extract_i(asgn, jnp.minimum(idx + 1, max_n - 1))
            r_er = jnp.where(((idx + 1) < n) & (na == s),
                             v[:, _PEOE], NEG_INF)
            r_sf = jnp.where(r_rel != -1, sk[:, iR], NEG_INF)
            logp_r_ = jnp.maximum(jnp.maximum(r_er, r_sf), sfe[:, iR])

            po_b = v[:, _POHB] if s == HAPLO else v[:, _PODB]
            po_e = v[:, _POHE] if s == HAPLO else v[:, _PODE]
            both_inf = (logp_l == NEG_INF) & (logp_r_ == NEG_INF)
            lp_l = jnp.where(both_inf, po_b,
                             jnp.where(logp_l == NEG_INF, logp_r_, logp_l))
            lp_r = jnp.where(both_inf, po_e,
                             jnp.where(logp_r_ == NEG_INF, lp_l, logp_r_))
            return lp_l + lp_r

        lH_ = side(HAPLO, 0, 1)
        lD_ = side(DIPLO, 2, 3)

        smax = jnp.argmax(jnp.stack([lE, lR, lH_, lD_], axis=1), axis=1)
        force_r = jnp.maximum(icb, ice) >= P.cov_r
        new = jnp.where(force_r, REPEAT, smax).astype(jnp.int32)

        fixed_at = jnp.any(oh_idx & is_fixed, axis=1)
        active = x["live"] & ~fixed_at
        cur = extract_i(asgn, idx)
        upd = jnp.where(active, new, cur)
        asgn = jnp.where(oh_idx & active[:, None], upd[:, None],
                         asgn).astype(jnp.int32)
        return asgn

    # scan xs: transpose (B, N) -> (N, B) per processing order
    xs = tuple({k: v.T for k, v in o.items()} for o in (xs_desc, xs_asc))
    return _LaneState(asgn0=asgn0, xs=xs), step_fn
