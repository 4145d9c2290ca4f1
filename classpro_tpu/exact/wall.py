"""Wall detection and reliable-interval selection (ref wall.c:246-1051).

A *wall* is a profile position where the count change cannot be explained
by sequencing errors (in this read or in the other reads sharing the
k-mer), i.e. a genuine boundary between genomic copy-number states.
Candidate drops/gains are screened with precomputed binomial-tail
thresholds, paired across K-width (or context-run-adjusted) spans into
error intervals, and the surviving boundaries partition the profile into
intervals carrying error log-probabilities.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from classpro_tpu.constants import MAX_KMER_CNT, State
from classpro_tpu.estimation import GlobalModel
from classpro_tpu.numerics import c_log, logp_trans, p_errorin

NEG_INF = float("-inf")

SELF, OTHERS = 0, 1
DROP, GAIN = 0, 1
INIT, FINAL = 0, 1


@dataclasses.dataclass
class Intvl:
    """One profile interval (ref ClassPro.h:159-170)."""

    b: int
    e: int
    cb: int
    ce: int
    ccb: int = 0
    cce: int = 0
    is_rel: bool = False
    pe: float = NEG_INF
    pe_o_b: float = NEG_INF
    pe_o_e: float = NEG_INF
    asgn: int = 4  # N_STATE = unclassified

    def copy(self) -> "Intvl":
        return dataclasses.replace(self)


# wall bitmask (wall.c:264-269)
_W_BY = (0x01, 0x10)
_P_BY = (0x02, 0x20)
_W_MULT = 0x04
_P_MULT = 0x40
_ERR = 0x80


def _cthres_ng(e: int, cin: int, ct: int) -> bool:
    """wall.c:324-329."""
    return cin >= ct if e == SELF else cin < ct


class WallFinder:
    """Per-read wall detection with shared global model state."""

    def __init__(self, gm: GlobalModel):
        self.gm = gm
        self.K = gm.kmer
        self.cmax = gm.cmax
        self.cov_r = int(gm.cov[State.REPEAT])
        self.cov_h = int(gm.cov[State.HAPLO])
        self.read_len = gm.read_len
        self.em = gm.emodel
        d = gm.defaults
        self.pe_thres = ((d.pe_thres_init_self, d.pe_thres_init_others),
                         (d.pe_thres_final_self, d.pe_thres_final_others))
        self.thres_diff_eo = d.thres_diff_eo
        self.min_cnt_change = d.min_cnt_change
        self.max_cnt_change = d.max_cnt_change
        self.max_n_hc = d.max_n_hc

    # -- context accessors: ctx[DROP][i] = lctx[i+K-2], ctx[GAIN][i] = rctx[i]
    #    (ClassPro.c:137-142)

    def _ctx(self, w: int, i: int, t: int) -> int:
        if w == DROP:
            return int(self.lctx[i + self.K - 2, t])
        return int(self.rctx[i, t])

    def _logp_diff_pair(self, i: int, j: int) -> float:
        """wall.c:317-322."""
        prof = self.profile
        n_drop = int(prof[i - 1]) - int(prof[i])
        n_gain = int(prof[j]) - int(prof[j - 1])
        cov = max(int(prof[i - 1]), int(prof[j]))
        return logp_trans(i, j, n_drop, n_gain, cov, self.read_len)

    def _update_perror(self, i: int, e: int, w: int, cout: int, cin: int,
                       erate: float) -> None:
        """wall.c:310-315 (memoized binomial tail)."""
        if self.perror[i, e, w] == NEG_INF:
            self.perror[i, e, w] = p_errorin(e, erate, cout, cin)

    # ------------------------------------------------------------------
    # Pair search (wall.c:331-516)
    # ------------------------------------------------------------------

    def _find_gain(self, i: int, cout: int, cin: int, e: int, t: int, l: int,
                   erate: float) -> tuple[int, int, float] | None:
        prof, plen, K = self.profile, self.plen, self.K
        em, cmax = self.em, self.cmax
        ipk = i + K - 1
        ulen = t + 1
        max_j, max_pe = -1, NEG_INF

        # Low-complexity pairing: extend over the continuing context run
        m = ulen * l
        n = 0
        while True:
            idx = i + ulen * (n + 1)
            if idx >= plen or self._ctx(DROP, idx, t) != m + n + 1:
                break
            n += 1
        j = ipk + n - m
        if j <= i:
            return None
        if j >= plen:
            j = plen
            pe = self.perror[i, e, DROP] * self.perror[i, e, DROP]
        else:
            cin_j = int(prof[j - 1])
            cout_j = int(prof[j])
            pe = NEG_INF
            if (cin_j <= cout_j
                    and not (cout_j < cmax and _cthres_ng(e, cin_j, int(em.cthres[t, l, cout_j, FINAL, e])))
                    and (e == SELF or self._logp_diff_pair(i, j) >= self.thres_diff_eo)):
                self._update_perror(j, e, GAIN, cout_j, cin_j, erate)
                pe = self.perror[i, e, DROP] * self.perror[j, e, GAIN]
        if max_pe < pe:
            max_j, max_pe = j, pe

        # High-complexity pairing: up to MAX_N_HC bases ahead
        for n in range(0, self.max_n_hc + 1):
            j = ipk + n
            if j >= plen:
                break
            cin_j = int(prof[j - 1])
            cout_j = int(prof[j])
            if not (cin_j <= cout_j):
                continue
            if ((cout < cmax and _cthres_ng(e, cin, int(em.cthres[0, 1, cout, FINAL, e])))
                    or (cout_j < cmax and _cthres_ng(e, cin_j, int(em.cthres[0, 1, cout_j, FINAL, e])))):
                continue
            if e == OTHERS and self._logp_diff_pair(i, j) < self.thres_diff_eo:
                continue
            pe_i = p_errorin(e, self.em.hc_erate, cout, cin)
            pe_j = p_errorin(e, self.em.hc_erate, cout_j, cin_j)
            pe = pe_i * pe_j
            if max_pe < pe:
                max_j, max_pe = j, pe

        if max_j == -1:
            return None
        return (i, max_j, max_pe)

    def _find_drop(self, i: int, cout: int, cin: int, e: int, t: int, l: int,
                   erate: float) -> tuple[int, int, float] | None:
        prof, K = self.profile, self.K
        em, cmax = self.em, self.cmax
        imk = i - K + 1
        ulen = t + 1
        max_j, max_pe = -1, NEG_INF

        m = ulen * l
        n = 0
        while True:
            idx = i - ulen * (n + 1)
            if idx <= 0 or self._ctx(GAIN, idx, t) != m + n + 1:
                break
            n += 1
        j = imk - n + m
        if j >= i:
            return None
        if j <= 0:
            j = 0
            pe = self.perror[i, e, GAIN] * self.perror[i, e, GAIN]
        else:
            cout_j = int(prof[j - 1])
            cin_j = int(prof[j])
            pe = NEG_INF
            if (cin_j <= cout_j
                    and not (cout_j < cmax and _cthres_ng(e, cin_j, int(em.cthres[t, l, cout_j, FINAL, e])))
                    and (e == SELF or self._logp_diff_pair(j, i) >= self.thres_diff_eo)):
                self._update_perror(j, e, DROP, cout_j, cin_j, erate)
                pe = self.perror[j, e, DROP] * self.perror[i, e, GAIN]
        if max_pe < pe:
            max_j, max_pe = j, pe

        for n in range(0, self.max_n_hc + 1):
            j = imk - n
            if j <= 0:
                break
            cout_j = int(prof[j - 1])
            cin_j = int(prof[j])
            if not (cin_j <= cout_j):
                continue
            if ((cout < cmax and _cthres_ng(e, cin, int(em.cthres[0, 1, cout, FINAL, e])))
                    or (cout_j < cmax and _cthres_ng(e, cin_j, int(em.cthres[0, 1, cout_j, FINAL, e])))):
                continue
            if e == OTHERS and self._logp_diff_pair(j, i) < self.thres_diff_eo:
                continue
            pe_i = p_errorin(e, self.em.hc_erate, cout, cin)
            pe_j = p_errorin(e, self.em.hc_erate, cout_j, cin_j)
            pe = pe_i * pe_j
            if max_pe < pe:
                max_j, max_pe = j, pe

        if max_j == -1:
            return None
        return (max_j, i, max_pe)

    def _find_pair(self, i, cout, cin, e, w, t, l, erate):
        if w == DROP:
            return self._find_gain(i, cout, cin, e, t, l, erate)
        return self._find_drop(i, cout, cin, e, t, l, erate)

    # ------------------------------------------------------------------
    # Main scan (wall.c:570-958)
    # ------------------------------------------------------------------

    def find_wall(self, profile: np.ndarray, lctx: np.ndarray,
                  rctx: np.ndarray) -> list[Intvl]:
        self.profile = profile
        self.lctx = lctx
        self.rctx = rctx
        plen = self.plen = len(profile)
        K = self.K
        em, cmax = self.em, self.cmax

        wall = np.zeros(plen + 1, dtype=np.uint8)
        self.perror = np.full((plen + 1, 2, 2), NEG_INF)
        perror = self.perror
        eintvl: list[tuple[int, int, float]] = []
        ointvl: list[tuple[int, int, float]] = []

        for i in range(1, plen):
            cim1 = int(profile[i - 1])
            ci = int(profile[i])
            if min(cim1, ci) >= self.cov_r:
                continue
            cng = abs(cim1 - ci)
            if cng < self.min_cnt_change:
                continue
            if cim1 > ci:
                wtype, cin, cout = DROP, ci, cim1
            else:
                wtype, cin, cout = GAIN, cim1, ci

            # dominant low-complexity context (wall.c:624-634)
            maxt = maxl = -1
            maxpe = NEG_INF
            for t in range(3):
                l = min(self._ctx(wtype, i, t), int(em.lmax[t]))
                pe = em.pe[t, l]
                if maxpe < pe:
                    maxpe, maxt, maxl = pe, t, l

            for e in (SELF, OTHERS):
                if wall[i] & _P_BY[e]:
                    continue
                if cout < cmax:
                    ct = [int(em.cthres[maxt, maxl, cout, s, e]) for s in (INIT, FINAL)]
                    if not (cng > self.max_cnt_change or cin < max(ct[INIT], 3)):
                        continue
                if e == SELF:
                    if cout < cmax and cin >= ct[FINAL]:
                        continue
                    self._update_perror(i, e, wtype, cout, cin, maxpe)
                    if perror[i, e, wtype] < self.pe_thres[FINAL][e]:
                        continue
                    pair = self._find_pair(i, cout, cin, e, wtype, maxt, maxl, maxpe)
                    if pair is not None and pair[2] >= self.pe_thres[FINAL][e]:
                        b, pend, pe = pair
                        wall[b] |= _W_BY[e] | _P_BY[e]
                        wall[pend] |= _W_BY[e] | _P_BY[e]
                        eintvl.append(pair)
                else:
                    if cng >= self.cov_h or (cout < cmax and cin < ct[FINAL]):
                        wall[i] |= _W_BY[OTHERS]
                        continue
                    self._update_perror(i, e, wtype, cout, cin, maxpe)
                    if perror[i, e, wtype] < self.pe_thres[FINAL][e]:
                        wall[i] |= _W_BY[OTHERS]
                        continue
                    pair = self._find_pair(i, cout, cin, e, wtype, maxt, maxl, maxpe)
                    if pair is not None and pair[2] >= self.pe_thres[FINAL][e]:
                        b, pend, _ = pair
                        wall[b] |= _P_BY[e]
                        wall[pend] |= _P_BY[e]
                        ointvl.append(pair)
                        continue
                    wall[i] |= _W_BY[OTHERS]

        # Unset O-walls explained by O-pairs or inside E-intvls (wall.c:722-731)
        for (b, e_, _) in ointvl:
            wall[b] &= ~np.uint8(_W_BY[OTHERS])
            wall[e_] &= ~np.uint8(_W_BY[OTHERS])
        for (b, e_, _) in eintvl:
            for j in range(b + 1, e_):
                wall[j] &= ~np.uint8(_W_BY[OTHERS])

        # Sort + dedupe (wall.c:548-568,734): stable by (b,e), keep first
        eintvl = _dedupe(eintvl)
        NS = len(eintvl)

        # Multi-error & boundary E-intvls (wall.c:759-860)
        for i in range(1, plen):
            if not ((wall[i] & _W_BY[OTHERS]) and not (wall[i] & _W_BY[SELF])):
                continue
            if wall[i] & _P_MULT:
                continue
            for w in (DROP, GAIN):
                pe_i = perror[i, SELF, w]
                if pe_i < self.pe_thres[FINAL][SELF]:
                    continue
                if w == DROP:
                    rng = range(i + 1, min(i + 200, plen + 1))
                else:
                    rng = range(i - 1, max(i - 200, 0) - 1, -1)
                for j in rng:
                    if w == DROP and j == plen:
                        pe = pe_i * pe_i
                        if pe < self.pe_thres[FINAL][SELF]:
                            continue
                        eintvl.append((i, plen, pe))
                        wall[i] |= _P_MULT
                    if w == GAIN and j == 0:
                        pe = pe_i * pe_i
                        if pe < self.pe_thres[FINAL][SELF]:
                            continue
                        eintvl.append((0, i, pe))
                        wall[i] |= _P_MULT
                    if not (wall[j] & (_W_BY[SELF] | _W_BY[OTHERS])):
                        continue
                    b, e_ = (i, j) if w == DROP else (j, i)
                    if _bs_eintvl(eintvl, NS, b, e_) == -1:
                        pe_j = perror[j, SELF, GAIN if w == DROP else DROP]
                        pe = pe_i * pe_j
                        if pe >= self.pe_thres[FINAL][SELF]:
                            eintvl.append((b, e_, pe))
                            wall[i] |= _P_MULT
                            wall[j] |= _P_MULT
                    if wall[j] & _W_BY[OTHERS]:
                        break

        for (b, e_, _) in eintvl[NS:]:
            for j in range(b + 1, e_):
                wall[j] &= ~np.uint8(_W_BY[OTHERS])
        if NS < len(eintvl):
            eintvl = sorted(eintvl, key=lambda x: (x[0], x[1]))

        # Merge overlapping/contained E-intvls; originals kept (wall.c:877-908)
        i = 0
        while i < len(eintvl) - 1:
            max_e = eintvl[i][1]
            max_pe = eintvl[i][2]
            j = i
            while j < len(eintvl) - 1:
                if eintvl[j + 1][0] <= eintvl[j][1]:
                    max_e = max(max_e, eintvl[j + 1][1])
                    max_pe = max(max_pe, eintvl[j + 1][2])
                    j += 1
                else:
                    break
            if i < j:
                eintvl.append((eintvl[i][0], max_e, max_pe))
            i = j + 1
        eintvl = sorted(eintvl, key=lambda x: (x[0], x[1]))
        NS = len(eintvl)

        for (b, e_, _) in eintvl:
            for j in range(b, e_):
                wall[j] |= _ERR

        # Emit intervals (wall.c:921-948)
        intvls: list[Intvl] = []
        b = 0
        for i in range(1, plen + 1):
            if (i == plen or bool(wall[i - 1] & _ERR) != bool(wall[i] & _ERR)
                    or (not (wall[i] & _ERR) and (wall[i] & _W_BY[OTHERS]))):
                e_ = i
                idx = _bs_eintvl(eintvl, NS, b, e_)
                peob = max(perror[b, OTHERS, DROP], perror[b, OTHERS, GAIN])
                peoe = max(perror[e_, OTHERS, DROP], perror[e_, OTHERS, GAIN])
                intvls.append(Intvl(
                    b=b, e=e_, cb=int(profile[b]), ce=int(profile[e_ - 1]),
                    pe=c_log(eintvl[idx][2]) if idx != -1 else NEG_INF,
                    pe_o_b=c_log(peob) if peob != NEG_INF else NEG_INF,
                    pe_o_e=c_log(peoe) if peoe != NEG_INF else NEG_INF,
                ))
                b = e_
        return intvls

    # ------------------------------------------------------------------
    # Reliable intervals (wall.c:960-1051)
    # ------------------------------------------------------------------

    def correct_wall_cnt(self, intvls: list[Intvl], i: int) -> None:
        """wall.c:960-1013.

        The reference's final clamp loops index the interval array by
        *position* (wall.c:999-1006) — a latent bug whose only live effect
        is: the current interval's boundary count is max'd against
        profile[i] iff the interval *index* i falls inside the clamp
        position window (all other writes land in slots that are reset
        before use or never read).  We reproduce that effective semantics.
        """
        I = intvls[i]
        prof, K, plen = self.profile, self.K, self.plen
        n_gain = 0
        last = min(I.b + K - 1, I.e - 1)
        for p in range(I.b, last):
            n_gain += max(int(prof[p + 1]) - int(prof[p]), 0)
        if I.b + K - 1 < I.e:
            lmax = 0
            for t in range(3):
                l = self._ctx(GAIN, I.b + K - 1, t) * (t + 1)
                lmax = max(lmax, l)
            last = min(I.b + lmax, plen - 1)  # clamped (C may over-read)
            for p in range(I.b, last):
                n_gain -= max(int(prof[p]) - int(prof[p + 1]), 0)

        n_drop = 0
        first = max(I.e - K + 1, I.b)
        for p in range(first, I.e - 1):
            n_drop += max(int(prof[p]) - int(prof[p + 1]), 0)
        if I.b < I.e - K + 1:
            lmax = 0
            for t in range(3):
                l = self._ctx(DROP, I.e - K + 1, t) * (t + 1)
                lmax = max(lmax, l)
            first = max(I.e - lmax, 0)  # clamped (C may under-read)
            for p in range(first, I.e - 1):
                n_drop -= max(int(prof[p + 1]) - int(prof[p]), 0)

        I.ccb = min(I.cb + max(n_gain, 0), MAX_KMER_CNT)
        I.cce = min(I.ce + max(n_drop, 0), MAX_KMER_CNT)

        # Effective remnant of the position-indexed clamp (see docstring)
        if I.b <= i < min(I.b + 2 * K, I.e) and I.ccb < int(prof[i]):
            I.ccb = int(prof[i])
        if max(I.e - 2 * K, I.b) <= i < I.e and I.cce < int(prof[i]):
            I.cce = int(prof[i])

    def find_rel_intvl(self, intvls: list[Intvl]) -> list[Intvl]:
        """wall.c:1016-1051."""
        gm = self.gm
        logpthres = math.log(gm.defaults.pe_thres_final_self)
        rel: list[Intvl] = []
        for i, I in enumerate(intvls):
            if I.e - I.b < self.K:
                continue
            if max(I.cb, I.ce) >= self.cov_r:
                continue
            if I.pe >= logpthres:
                continue
            self.correct_wall_cnt(intvls, i)
            if logp_trans(I.b, I.e, I.ccb, I.cce,
                          (I.ccb + I.cce) // 2, self.read_len) < gm.defaults.thres_diff_rel:
                continue
            if max(I.ccb, I.cce) == MAX_KMER_CNT:
                continue
            I.is_rel = True
            rel.append(I.copy())
        return rel


def _dedupe(eintvl: list[tuple[int, int, float]]) -> list[tuple[int, int, float]]:
    """qsort by (b,e) + remove_duplicates keeping first (wall.c:548-568)."""
    s = sorted(eintvl, key=lambda x: (x[0], x[1]))
    out: list[tuple[int, int, float]] = []
    for x in s:
        if out and out[-1][0] == x[0] and out[-1][1] == x[1]:
            continue
        out.append(x)
    return out


def _bs_eintvl(eintvl: list[tuple[int, int, float]], ns: int, b: int, e: int) -> int:
    """Binary search for exact (b,e) over the first ns entries
    (wall.c:530-546)."""
    l, r = 0, ns - 1
    while l <= r:
        m = (l + r) // 2
        mb, me, _ = eintvl[m]
        if mb == b:
            if me == e:
                return m
            elif e > me:
                l = m + 1
            else:
                r = m - 1
        elif b > mb:
            l = m + 1
        else:
            r = m - 1
    return -1
