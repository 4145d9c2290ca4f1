"""Reliable-interval classification: 4-state forward/backward DP
(ref class_rel.c).

Each DP cell carries, besides the log-probability, an auxiliary coverage
state ``st`` (position+count of the most recent evidence for each of
H/D/R along the best path into the cell) and a D/H-ratio derived from the
three most recent alternating H/D intervals on that path
(calc_dh_ratio, class_rel.c:113-156).  The reference materializes full
backtrack arrays per cell; we do the same here (oracle clarity over
speed — the batched engine replaces this with an O(M) scan).
"""

from __future__ import annotations

# opt-in decision-margin recorder (see exact/unrel.py MARGINS)
MARGINS: list | None = None

import math

import numpy as np

from classpro_tpu.constants import State
from classpro_tpu.estimation import GlobalModel
from classpro_tpu.exact.wall import Intvl, NEG_INF
from classpro_tpu.numerics import (
    linear_interpolation,
    logp_binom,
    logp_poisson,
    logp_trans,
)

ERROR, REPEAT, HAPLO, DIPLO, N_STATE = 0, 1, 2, 3, 4


class RelClassifier:
    def __init__(self, gm: GlobalModel):
        self.gm = gm
        d = gm.defaults
        self.OFFSET = d.offset
        self.R_LOGP = d.r_logp
        self.E_PO_BASE = d.e_po_base
        self.PE_MEAN = d.pe_mean
        self.read_len = gm.read_len
        self.dr_ratio = gm.dr_ratio
        self.global_cov = [int(c) for c in gm.cov]

    # -- direction helpers (class_rel.c:41-60) --------------------------

    def _pred(self, x: int) -> int:
        return x - 1 if self.fwd else x + 1

    def _succ(self, x: int) -> int:
        return x + 1 if self.fwd else x - 1

    def _offset(self, x: int) -> int:
        return x - self.OFFSET if self.fwd else x + self.OFFSET

    def _beg_pos(self, I: Intvl) -> int:
        return I.b if self.fwd else I.e - 1

    def _beg_cnt(self, I: Intvl) -> int:
        return I.ccb if self.fwd else I.cce

    def _end_pos(self, I: Intvl) -> int:
        return I.e - 1 if self.fwd else I.b

    def _end_cnt(self, I: Intvl) -> int:
        return I.cce if self.fwd else I.ccb

    # -- D/H ratio from the last three alternating H/D intervals --------

    def _calc_dh_ratio(self, init_s: int, asgn, intvl, off: int, L: int) -> float:
        """class_rel.c:113-156.  ``asgn``/``intvl`` are accessed at
        ``off + relative_index`` (mirrors the C pointer offsets)."""
        fwd = self.fwd
        idx = [L if fwd else -1, 0, 0, 0]
        s = init_s
        for i in range(3):
            # find_nn(!FORWARD, pred(idx[i]), s, asgn, L)
            j = idx[i] - 1 if fwd else idx[i] + 1
            if fwd:  # search backward
                while j >= 0 and asgn[off + j] != s:
                    j -= 1
            else:  # search forward
                while j < L and asgn[off + j] != s:
                    j += 1
            idx[i + 1] = j
            if (fwd and j < 0) or (not fwd and j >= L):
                return NEG_INF
            s = DIPLO if s == HAPLO else HAPLO

        I1, I2, I3 = intvl[off + idx[1]], intvl[off + idx[2]], intvl[off + idx[3]]
        s1 = (self._beg_pos(I1), self._beg_cnt(I1))
        t = (self._end_pos(I2), self._end_cnt(I2))
        s2 = (self._end_pos(I3), self._end_cnt(I3))
        if not fwd:
            s1, s2 = s2, s1
        est_s_cnt = linear_interpolation(t[0], s2[0], s2[1], s1[0], s1[1])
        if init_s == DIPLO:
            return est_s_cnt / t[1]
        return t[1] / est_s_cnt

    # -- emission/transition log-probabilities (class_rel.c:158-277) ----

    def _logp_e(self, idx: int) -> float:
        I = self.intvl[idx]
        logp_po = (logp_poisson(I.ccb, self.COV[ERROR])
                   + logp_poisson(I.cce, self.COV[ERROR]) + self.E_PO_BASE)
        return max(logp_po, I.pe)

    def _logp_r(self, idx: int, st_pred_r: tuple[int, int]) -> float:
        I = self.intvl[idx]
        beg_cnt = self._beg_cnt(I)
        logp_er = (logp_binom(beg_cnt, st_pred_r[1], 1 - self.PE_MEAN)
                   if beg_cnt < st_pred_r[1] else NEG_INF)
        logp = max(NEG_INF, logp_er)
        if logp > self.R_LOGP:
            return logp
        max_cc = max(I.ccb, I.cce)
        if max_cc >= self.COV[REPEAT]:
            return self.R_LOGP
        if max_cc >= st_pred_r[1]:
            return self.R_LOGP
        return logp

    def _logp_h(self, idx: int, s: int, st_pred) -> float:
        I = self.intvl[idx]
        beg_pos, beg_cnt = self._beg_pos(I), self._beg_cnt(I)
        st = st_pred[HAPLO]
        logp_sf_h = logp_trans(self._pred(st[0]), beg_pos, st[1], beg_cnt,
                               st[1], self.read_len)
        r = self.dh_ratio[self._pred(idx), s]
        if r != NEG_INF:
            st = st_pred[DIPLO]
            logp_sf_h = logp_trans(self._pred(st[0]), beg_pos, st[1],
                                   int(r * beg_cnt), st[1], self.read_len)
        return logp_sf_h + 0.0

    def _logp_d(self, idx: int, s: int, st_pred) -> float:
        # class_rel.c:242-270: the dh_ratio branch's value is overwritten
        # unconditionally by the DIPLO-vs-DIPLO term (kept as in reference)
        I = self.intvl[idx]
        beg_pos, beg_cnt = self._beg_pos(I), self._beg_cnt(I)
        st = st_pred[DIPLO]
        logp_sf_h = logp_trans(self._pred(st[0]), beg_pos, st[1], beg_cnt,
                               st[1], self.read_len)
        return logp_sf_h + 0.0

    def _calc_logp(self, s: int, t: int, idx: int, st_pred) -> float:
        if t == ERROR:
            return self._logp_e(idx)
        if t == HAPLO:
            return self._logp_h(idx, s, st_pred)
        if t == DIPLO:
            return self._logp_d(idx, s, st_pred)
        return self._logp_r(idx, st_pred[REPEAT])

    # -- DP machinery ----------------------------------------------------

    def _find_max_dp(self, i: int) -> int:
        max_logp, max_s = NEG_INF, N_STATE
        runner = NEG_INF
        for s in range(4):
            if max_logp < self.dp[i, s]:
                max_logp, runner, max_s = self.dp[i, s], max_logp, s
            elif runner < self.dp[i, s]:
                runner = self.dp[i, s]
        if MARGINS is not None and runner > NEG_INF and max_logp > NEG_INF:
            MARGINS.append(max_logp - runner)
        return max_s

    def _find_max_dp_tr(self, logp_tr, i: int, s: int, t: int) -> tuple[int, float]:
        i_pred = self._pred(i)
        max_logp, max_x = NEG_INF, N_STATE
        runner = NEG_INF
        for x in range(4):
            _s = s if s < N_STATE else x
            _t = t if t < N_STATE else x
            logp = self.dp[i_pred, _s] + logp_tr[_s][_t]
            if max_logp < logp:
                max_logp, runner, max_x = logp, max_logp, x
            elif runner < logp:
                runner = logp
        if MARGINS is not None and runner > NEG_INF and max_logp > NEG_INF:
            MARGINS.append(max_logp - runner)
        return max_x, max_logp

    def _update(self, i: int, M: int) -> None:
        fwd = self.fwd
        dp, st, bt, dh_ratio, rpos = self.dp, self.st, self.bt, self.dh_ratio, self.rpos
        intvl = self.intvl
        I = intvl[i]
        end_pos, end_cnt = self._end_pos(I), self._end_cnt(I)
        i_pred = self._pred(i)

        # transition matrix, normalized jointly over all 16 entries
        logp_tr = [[NEG_INF] * 4 for _ in range(4)]
        for s in range(4):
            if dp[i_pred, s] == NEG_INF:
                for t in range(4):
                    logp_tr[s][t] = 0.0
                continue
            for t in range(4):
                logp = self._calc_logp(s, t, i, st[i_pred, s])
                logp_tr[s][t] = math.exp(logp)
        psum = 0.0
        for s in range(4):
            for t in range(4):
                psum += logp_tr[s][t]
        if psum == 0.0:  # DEBUG fallback active in reference (class_rel.c:325-333)
            import sys

            print(f"No possible state @ {i}", file=sys.stderr)
            for s in range(4):
                logp_tr[s][ERROR] = 1.0
            psum = 4.0
        for s in range(4):
            for t in range(4):
                with np.errstate(divide="ignore"):
                    logp_tr[s][t] = (math.log(logp_tr[s][t] / psum)
                                     if logp_tr[s][t] > 0.0 else NEG_INF)

        # all paths converge to R? (class_rel.c:348-380)
        only_r = True
        for s in range(4):
            maxt = self._find_max_dp_tr(logp_tr, i, s, N_STATE)[0]
            if maxt != N_STATE and maxt != REPEAT:
                only_r = False
                break
        if only_r:
            rpos[i] = True
            intvl[i] = intvl[i_pred]
            for s in range(4):
                dp[i, s] = dp[i_pred, s]
                if dp[i, s] == NEG_INF:
                    continue
                if fwd:
                    bt[i, s, :i] = bt[i_pred, s, :i]
                else:
                    bt[i, s, i + 1:M] = bt[i_pred, s, i + 1:M]
                bt[i, s, i] = s
                st[i, s] = st[i_pred, s]
            return

        maxs_h = self._find_max_dp_tr(logp_tr, i, N_STATE, HAPLO)[0]
        maxs_d = self._find_max_dp_tr(logp_tr, i, N_STATE, DIPLO)[0]
        if maxs_h == HAPLO and maxs_d == DIPLO:
            m = min(logp_tr[HAPLO][HAPLO], logp_tr[DIPLO][DIPLO])
            logp_tr[HAPLO][HAPLO] = logp_tr[DIPLO][DIPLO] = m

        for t in range(4):
            max_s, max_logp = self._find_max_dp_tr(logp_tr, i, N_STATE, t)
            dp[i, t] = max_logp
            if max_s == N_STATE:
                continue
            if fwd:
                bt[i, t, :i] = bt[i_pred, max_s, :i]
            else:
                bt[i, t, i + 1:M] = bt[i_pred, max_s, i + 1:M]
            bt[i, t, i] = t

            if t == ERROR:
                for s in range(REPEAT, DIPLO + 1):
                    st[i, t, s] = st[i_pred, max_s, s]
            elif t == REPEAT:
                for s in range(HAPLO, DIPLO + 1):
                    st[i, t, s] = (self._offset(end_pos), st[i_pred, max_s, s][1])
                r_cnt = min(end_cnt, self.COV[REPEAT])
                if st[i_pred, max_s, REPEAT][1] < r_cnt:
                    st[i, t, REPEAT] = st[i_pred, max_s, REPEAT]
                else:
                    st[i, t, REPEAT] = (self._offset(end_pos), r_cnt)
            elif t == HAPLO:
                curr_h = end_cnt
                off, L = (0, i + 1) if fwd else (i, M - i)
                r = self._calc_dh_ratio(HAPLO, bt[i, t], intvl, off, L)
                if r == NEG_INF:
                    rng = range(0, i) if fwd else range(i + 1, M)
                    has_d = any(bt[i, t, ii] == DIPLO for ii in rng)
                    if has_d:
                        curr_d = st[i_pred, max_s, DIPLO][1]
                    else:
                        curr_d = curr_h + self.COV[HAPLO]
                else:
                    curr_d = int(r * curr_h)
                    dh_ratio[i, t] = r
                curr_r = int(self.dr_ratio * curr_d)
                p = self._offset(end_pos)
                st[i, t, HAPLO] = (p, curr_h)
                st[i, t, DIPLO] = (p, curr_d)
                st[i, t, REPEAT] = (p, curr_r)
            else:  # DIPLO
                curr_d = end_cnt
                off, L = (0, i + 1) if fwd else (i, M - i)
                r = self._calc_dh_ratio(DIPLO, bt[i, t], intvl, off, L)
                if r == NEG_INF:
                    rng = range(0, i) if fwd else range(i + 1, M)
                    has_h = any(bt[i, t, ii] == HAPLO for ii in rng)
                    if has_h:
                        curr_h = st[i_pred, max_s, HAPLO][1]
                    else:
                        curr_h = max(curr_d // 2, curr_d - self.COV[HAPLO])
                else:
                    curr_h = int(curr_d / r)
                    dh_ratio[i, t] = r
                curr_r = int(self.dr_ratio * curr_d)
                p = self._offset(end_pos)
                st[i, t, HAPLO] = (p, curr_h)
                st[i, t, DIPLO] = (p, curr_d)
                st[i, t, REPEAT] = (p, curr_r)

            # H < D < R sanity gate (class_rel.c:496-498)
            if not (st[i, t, HAPLO][1] < st[i, t, DIPLO][1]
                    < st[i, t, REPEAT][1]):
                dp[i, t] = NEG_INF

    def _classify_rel_pass(self, rintvl: list[Intvl], M: int, plen: int) -> np.ndarray:
        """_classify_rel (class_rel.c:515-614).  Returns the path array."""
        fwd = self.fwd
        self.dp = np.full((M, 4), NEG_INF)
        self.dh_ratio = np.full((M, 4), NEG_INF)
        self.rpos = np.zeros(M, dtype=bool)
        self.intvl = [I.copy() for I in rintvl]
        self.bt = np.zeros((M, 4, M), dtype=np.int8)
        # st[i, s, t] = (pos, cnt); ERROR slot unused (mirrors reference)
        self.st = np.zeros((M, 4, 4, 2), dtype=np.int64)
        st = ObjView(self.st)
        self.st = st

        POS_INIT = self._offset(0 if fwd else plen)
        i = 0 if fwd else M - 1
        I = self.intvl[i]

        for s in range(4):
            for t in range(REPEAT, DIPLO + 1):
                st[i, s, t] = (POS_INIT, self.COV[t])
            self.bt[i, s, i] = s

        self.dp[i, ERROR] = self._logp_e(i)
        self.dp[i, REPEAT] = self._logp_r(i, st[i, REPEAT, REPEAT])
        st[i, REPEAT, REPEAT] = (self._end_pos(I),
                                 min(self._end_cnt(I), self.COV[REPEAT]))
        self.dp[i, HAPLO] = logp_poisson(self._beg_cnt(I), self.COV[HAPLO])
        st[i, HAPLO, HAPLO] = (self._end_pos(I), self._end_cnt(I))
        st[i, HAPLO, DIPLO] = (self._offset(self._end_pos(I)),
                               self._end_cnt(I) + self.COV[HAPLO])
        self.dp[i, DIPLO] = logp_poisson(self._beg_cnt(I), self.COV[DIPLO])
        st[i, DIPLO, HAPLO] = (self._offset(self._end_pos(I)),
                               max(self._end_cnt(I) // 2,
                                   self._end_cnt(I) - self.COV[HAPLO]))
        st[i, DIPLO, DIPLO] = (self._end_pos(I), self._end_cnt(I))

        psum = 0.0
        for s in range(4):
            psum += math.exp(self.dp[i, s])
        for s in range(4):
            v = math.exp(self.dp[i, s]) / psum
            self.dp[i, s] = math.log(v) if v > 0.0 else NEG_INF

        while True:
            i = self._succ(i)
            if (fwd and i >= M) or (not fwd and i < 0):
                break
            self._update(i, M)

        i = M - 1 if fwd else 0
        max_s = self._find_max_dp(i)
        if max_s == N_STATE:
            # All four states dead at the final interval (reachable: the
            # psum==0 "No possible state" fallback, class_rel.c:326-331,
            # propagates -inf to every later cell — see the crafted
            # fixture tests/fixtures/branch/psum0).  The C traceback then
            # reads bt[REL_IDX(i, N_STATE)] (class_rel.c:610-613) — one
            # row PAST the last state row, i.e. the never-written row of
            # interval i+1/state ERROR, which is all zero bytes on a
            # fresh workspace (calloc-equivalent first-touch pages; the
            # reference's own -T1 behavior, measured deterministic).
            # Mirror that: an all-ERROR path.  NOTE this is a reference
            # soundness edge: a workspace dirtied by an earlier read
            # with more intervals would make the C's output here depend
            # on read order; ours is always the fresh-state answer.
            path = np.zeros(M, dtype=np.int8)
        else:
            path = self.bt[i, max_s]
        for j in range(M):
            if self.rpos[j]:
                path[j] = REPEAT
        return path

    # -- fw/bw wrappers with rescue heuristics (class_rel.c:623-845) -----

    def _classify_dir(self, rintvl: list[Intvl], M: int, plen: int, fwd: bool):
        self.fwd = fwd
        self.COV = list(self.global_cov)
        asgn = self._classify_rel_pass(rintvl, M, plen)

        no_h = not any(asgn[i] == HAPLO for i in range(M))
        if no_h:
            lsum = csum = 0
            anchor_idx = -1
            for i in range(M):
                if asgn[i] == DIPLO:
                    l = rintvl[i].e - rintvl[i].b
                    lsum += l
                    csum += (rintvl[i].ccb + rintvl[i].cce) * l // 2
                    if fwd:
                        if anchor_idx == -1:
                            anchor_idx = i
                    else:
                        anchor_idx = i
            if anchor_idx >= 0:
                mean_dcov = csum / lsum
                if mean_dcov < self.global_cov[DIPLO]:
                    self.COV[HAPLO] = (rintvl[anchor_idx].ccb if fwd
                                       else rintvl[anchor_idx].cce)
                    self.COV[DIPLO] = self.COV[HAPLO] + self.global_cov[HAPLO]
                    asgn = self._classify_rel_pass(rintvl, M, plen)
                    no_h = not any(asgn[i] == HAPLO for i in range(M))
                    if no_h:
                        lsum = csum = 0
                        for i in range(M):
                            if asgn[i] == DIPLO:
                                l = rintvl[i].e - rintvl[i].b
                                lsum += l
                                csum += (rintvl[i].ccb + rintvl[i].cce) * l // 2
                        mean_dcov = csum / lsum
                        if (abs(mean_dcov - self.global_cov[HAPLO])
                                <= abs(mean_dcov - self.global_cov[DIPLO])):
                            for i in range(M):
                                if asgn[i] == DIPLO:
                                    asgn[i] = HAPLO

        all_h = all(asgn[i] == HAPLO for i in range(M))
        if all_h:
            lsum = csum = 0
            for i in range(M):
                l = rintvl[i].e - rintvl[i].b
                lsum += l
                csum += (rintvl[i].ccb + rintvl[i].cce) * l // 2
            mean_hcov = csum / lsum
            if (abs(mean_hcov - self.global_cov[HAPLO])
                    >= abs(mean_hcov - self.global_cov[DIPLO])):
                for i in range(M):
                    asgn[i] = DIPLO

        n = sum(1 for i in range(M) if asgn[i] == HAPLO)
        if n >= M * 0.7:
            lsum = csum = 0
            for i in range(M):
                if asgn[i] == HAPLO:
                    l = rintvl[i].e - rintvl[i].b
                    lsum += l
                    csum += (rintvl[i].ccb + rintvl[i].cce) * l // 2
            mean_hcov = csum / lsum
            if (abs(mean_hcov - self.global_cov[HAPLO])
                    >= abs(mean_hcov - self.global_cov[DIPLO])):
                for i in range(M):
                    if asgn[i] == HAPLO:
                        asgn[i] = DIPLO
                    elif asgn[i] == DIPLO:
                        asgn[i] = REPEAT

        first_d = last_d = first_h = last_h = -1
        for i in range(M):
            if asgn[i] == DIPLO:
                if first_d == -1:
                    first_d = i
                last_d = i
            elif asgn[i] == HAPLO:
                if first_h == -1:
                    first_h = i
                last_h = i
        d_diff = abs(rintvl[first_d].ccb - rintvl[last_d].cce) if first_d >= 0 else 0
        h_diff = abs(rintvl[first_h].ccb - rintvl[last_h].cce) if first_h >= 0 else 0
        hdrr = ((rintvl[first_d].ccb / rintvl[first_h].ccb)
                / (rintvl[last_d].cce / rintvl[last_h].cce)
                if first_d >= 0 and first_h >= 0 else 1.0)
        return asgn, d_diff, h_diff, hdrr

    def classify(self, rintvl: list[Intvl], intvls: list[Intvl], plen: int) -> None:
        """classify_rel (class_rel.c:871-963): fw + bw + reconciliation;
        writes ``asgn`` into both rintvl and the matching intvls."""
        M = len(rintvl)
        if M == 0:
            return
        asgn_f, _, _, hdrr_f = self._classify_dir(rintvl, M, plen, fwd=True)
        asgn_f = asgn_f.copy()
        for i in range(M):
            rintvl[i].asgn = int(asgn_f[i])
        asgn_b, _, _, hdrr_b = self._classify_dir(rintvl, M, plen, fwd=False)

        eq = all(rintvl[i].asgn == asgn_b[i] for i in range(M))
        if not eq:
            if _is_eq_prefix(rintvl, M):
                pass  # keep forward
            elif _is_eq_suffix(rintvl, M):
                for i in range(M):
                    rintvl[i].asgn = int(asgn_b[i])
            else:
                if abs(hdrr_f - 1.0) <= abs(hdrr_b - 1.0):
                    pass
                else:
                    for i in range(M):
                        rintvl[i].asgn = int(asgn_b[i])

        # copy assignments to the full interval list (class_rel.c:949-960)
        iidx = 0
        for ridx in range(M):
            while iidx < len(intvls) and not intvls[iidx].is_rel:
                iidx += 1
            assert (intvls[iidx].b == rintvl[ridx].b
                    and intvls[iidx].e == rintvl[ridx].e), "rel intvl mismatch"
            intvls[iidx].asgn = rintvl[ridx].asgn
            iidx += 1


class ObjView:
    """(pos,cnt) tuple view over the st int64 array."""

    def __init__(self, arr: np.ndarray):
        self.arr = arr

    def __getitem__(self, key):
        if len(key) == 3:
            i, s, t = key
            return (int(self.arr[i, s, t, 0]), int(self.arr[i, s, t, 1]))
        i, s = key
        return _RowView(self.arr[i, s])

    def __setitem__(self, key, val):
        if len(key) == 3:
            i, s, t = key
            if isinstance(val, tuple):
                self.arr[i, s, t, 0] = val[0]
                self.arr[i, s, t, 1] = val[1]
            else:
                raise TypeError(val)
        else:
            i, s = key
            if isinstance(val, _RowView):
                self.arr[i, s] = val.row
            else:
                raise TypeError(val)


class _RowView:
    def __init__(self, row: np.ndarray):
        self.row = row

    def __getitem__(self, t: int) -> tuple[int, int]:
        return (int(self.row[t, 0]), int(self.row[t, 1]))


def _is_eq_prefix(rintvl: list[Intvl], M: int) -> bool:
    """class_rel.c:847-857 (literal transcription, including the use of
    state values as truthiness)."""
    if rintvl[0].asgn != 1:
        return False
    i = 0
    while i < M and rintvl[i].asgn:
        i += 1
    while i < M:
        if rintvl[i].asgn:
            return False
        i += 1
    return True


def _is_eq_suffix(rintvl: list[Intvl], M: int) -> bool:
    """class_rel.c:859-869."""
    if rintvl[M - 1].asgn != 1:
        return False
    i = M - 2
    while i >= 0 and rintvl[i].asgn:
        i -= 1
    while i >= 0:
        if rintvl[i].asgn:
            return False
        i -= 1
    return True
