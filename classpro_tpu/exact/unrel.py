"""Unreliable-interval classification (ref class_unrel.c).

Intervals not classified by the reliable DP are relaxed in two sweeps
(descending then ascending min-boundary-count order), each picking the
argmax over per-state log-probabilities that reference the nearest
already-classified reliable intervals.
"""

from __future__ import annotations

# opt-in decision-margin recorder (tools/margin_sweep.py): when set to a
# list, every relaxation argmax appends |best - runner_up| log-prob
# margin (finite pairs only) — quantifies headroom vs the ~1e-7
# interpolated-table error of the production path (VERDICT r1 item 7)
MARGINS: list | None = None

import math

from classpro_tpu.constants import State
from classpro_tpu.estimation import GlobalModel
from classpro_tpu.exact.wall import Intvl, NEG_INF
from classpro_tpu.numerics import (
    linear_interpolation,
    logp_binom,
    logp_poisson,
    logp_trans,
    p_errorin,
)

ERROR, REPEAT, HAPLO, DIPLO, N_STATE = 0, 1, 2, 3, 4
SELF, OTHERS = 0, 1


class UnrelClassifier:
    def __init__(self, gm: GlobalModel):
        self.gm = gm
        self.global_cov = [int(c) for c in gm.cov]
        self.dr_ratio = gm.dr_ratio
        self.read_len = gm.read_len
        d = gm.defaults
        self.R_LOGP = d.r_logp
        self.E_PO_BASE = d.e_po_base
        self.PE_MEAN = d.pe_mean

    def _find_nn(self, idx: int, s: int, intvl: list[Intvl], N: int) -> tuple[int, int]:
        """class_unrel.c:11-25: nearest reliable intervals with state s."""
        l = idx - 1
        while l >= 0 and not (intvl[l].asgn == s and intvl[l].is_rel):
            l -= 1
        r = idx + 1
        while r < N and not (intvl[r].asgn == s and intvl[r].is_rel):
            r += 1
        if r >= N:
            r = -1
        return l if l >= 0 else -1, r

    def _est_cov(self, x: int, idx: int, intvl: list[Intvl], N: int, s: int,
                 from_est: bool) -> int:
        """class_unrel.c:27-51 (returns cnt_t — truncated)."""
        l, r = self._find_nn(idx, s, intvl, N)
        if l != -1 and r != -1:
            L, R = intvl[l], intvl[r]
            return int(linear_interpolation(x, L.e - 1, L.cce, R.b, R.ccb))
        if l != -1:
            return intvl[l].cce
        if r != -1:
            return intvl[r].ccb
        if from_est:
            return 0
        cov = self._est_cov(x, idx, intvl, N, DIPLO if s == HAPLO else HAPLO, True)
        if cov > 0:
            return cov // 2 if s == HAPLO else cov * 2
        return self.global_cov[s]

    def _logp_e_u(self, idx: int, intvl: list[Intvl]) -> float:
        I = intvl[idx]
        logp_po = (logp_poisson(I.cb, self.global_cov[ERROR])
                   + logp_poisson(I.ce, self.global_cov[ERROR]) + self.E_PO_BASE)
        return max(I.pe, logp_po)

    def _logp_r_u(self, idx: int, intvl: list[Intvl], N: int) -> float:
        I = intvl[idx]
        if max(I.cb, I.ce) >= self.global_cov[REPEAT]:
            return 0.0
        l, r = self._find_nn(idx, DIPLO, intvl, N)
        if l == -1 and r == -1:
            dcov_l = dcov_r = self.global_cov[DIPLO]
        elif l == -1:
            dcov_l = dcov_r = intvl[r].cb
        elif r == -1:
            dcov_l = dcov_r = intvl[l].ce
        else:
            dcov_l = intvl[l].ce
            dcov_r = intvl[r].cb
        rcov_l = int(self.dr_ratio * dcov_l)
        rcov_r = int(self.dr_ratio * dcov_r)
        if I.cb >= rcov_l or I.ce >= rcov_r:
            return self.R_LOGP
        return (logp_binom(I.cb, rcov_l, 1 - self.PE_MEAN)
                + logp_binom(I.ce, rcov_r, 1 - self.PE_MEAN))

    def _logp_hd_u(self, s: int, idx: int, intvl: list[Intvl], N: int) -> float:
        I = intvl[idx]
        l_rel, r_rel = self._find_nn(idx, s, intvl, N)

        logp_l_er = logp_l_sf = logp_l_sf_er = NEG_INF
        if idx - 1 >= 0 and intvl[idx - 1].asgn == s:
            logp_l_er = I.pe_o_b
        if l_rel != -1:
            L = intvl[l_rel]
            logp_l_sf = logp_trans(L.e - 1, I.b, L.cce, I.cb, L.cce, self.read_len)
        est_cnt = self._est_cov(I.b, idx, intvl, N, s, False)
        if est_cnt >= I.cb:
            logp_l_sf_er = _safe_log(p_errorin(OTHERS, 0.1, est_cnt, I.cb))
        logp_l = max(logp_l_er, logp_l_sf, logp_l_sf_er)

        logp_r_er = logp_r_sf = logp_r_sf_er = NEG_INF
        if idx + 1 < N and intvl[idx + 1].asgn == s:
            logp_r_er = I.pe_o_e
        if r_rel != -1:
            R = intvl[r_rel]
            logp_r_sf = logp_trans(I.e - 1, R.b, I.ce, R.ccb, R.ccb, self.read_len)
        est_cnt = self._est_cov(I.e - 1, idx, intvl, N, s, False)
        if est_cnt >= I.ce:
            logp_r_sf_er = _safe_log(p_errorin(OTHERS, 0.1, est_cnt, I.ce))
        logp_r = max(logp_r_er, logp_r_sf, logp_r_sf_er)

        if logp_l == NEG_INF and logp_r == NEG_INF:
            logp_l = logp_poisson(I.cb, self.global_cov[s])
            logp_r = logp_poisson(I.ce, self.global_cov[s])
        elif logp_l == NEG_INF:
            logp_l = logp_r
        elif logp_r == NEG_INF:
            logp_r = logp_l
        return logp_l + logp_r

    def _calc_logp_u(self, s: int, idx: int, intvl: list[Intvl], N: int) -> float:
        if s == ERROR:
            return self._logp_e_u(idx, intvl)
        if s == HAPLO:
            return self._logp_hd_u(HAPLO, idx, intvl, N)
        if s == DIPLO:
            return self._logp_hd_u(DIPLO, idx, intvl, N)
        return self._logp_r_u(idx, intvl, N)

    def _update_state(self, idx: int, intvl: list[Intvl], N: int) -> None:
        I = intvl[idx]
        if max(I.cb, I.ce) >= self.global_cov[REPEAT]:
            intvl[idx].asgn = REPEAT
            return
        logpmax, smax = NEG_INF, -1
        runner = NEG_INF
        for s in range(4):
            logp = self._calc_logp_u(s, idx, intvl, N)
            if logpmax < logp:
                logpmax, runner, smax = logp, logpmax, s
            elif runner < logp:
                runner = logp
        if MARGINS is not None and runner > NEG_INF:
            MARGINS.append(logpmax - runner)
        if smax == -1:
            raise RuntimeError(f"No valid probability for interval {idx}")
        if I.asgn != smax:
            intvl[idx].asgn = smax

    def classify(self, intvl: list[Intvl]) -> None:
        """classify_unrel (class_unrel.c:248-300)."""
        N = len(intvl)
        is_fixed = [I.is_rel and I.asgn in (HAPLO, DIPLO) for I in intvl]
        iord = sorted(range(N), key=lambda i: min(intvl[i].cb, intvl[i].ce))
        for i in range(N - 1, -1, -1):
            if not is_fixed[iord[i]]:
                self._update_state(iord[i], intvl, N)
        for i in range(N):
            if not is_fixed[iord[i]]:
                self._update_state(iord[i], intvl, N)


def _safe_log(x: float) -> float:
    return math.log(x) if x > 0.0 else NEG_INF
