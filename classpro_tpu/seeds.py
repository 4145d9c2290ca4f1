"""Seed selection (`-s`): count-maximizer / minimizer-hash seeds per read
(ref seed.c, nthash.h).

Exact port of the reference pipeline (validated against a C harness
built from the reference sources in tests/test_seeds.py):

1. ``anno_repeat`` (seed.c:482-573): mark highly-repetitive regions
   (non-R runs >= 2.5K rescued, ignoring E-only stretches); emit the
   repeat intervals in read coordinates for the `.rep` track.
2. ``kmer_hash`` (seed.c:28-55, nthash.h): canonical ntHash per k-mer.
   ntHash's per-base update is linear over GF(2) (rotate-and-swap), so
   instead of the sequential rolling recurrence the hash of window i is
   the XOR of K precomputed rotated seed values — K vectorized numpy
   passes per read instead of a per-position Python loop.  Identical
   values to NTC64_b/NTC64_c by linearity.
3. ``_find_seeds`` for C in {H, D} (seed.c:190-445): tie-count run
   compression, sliding-window count MAXIMIZERS over WSIZE=1000 via a
   monotone deque, then greedy cover selection (largest window count
   first) picking minimizer-hash positions from each chosen segment.
4. ``_find_seeds_rep`` (seed.c:667-958): count MINIMIZERS with
   WSIZE_REP=200 over the highly-repetitive regions.

Output: per-position seed labels 'E' (non-seed) / 'H' / 'D' (normal
seeds) / 'R' (repeat-region seeds) (seed.c:1011-1018), plus the repeat
intervals.  The greedy cover is inherently sequential per read and runs
as a host post-pass over the classified batch (SURVEY.md §7.7); the
hash stage is the vectorizable part.
"""

from __future__ import annotations

import dataclasses

import numpy as np

WSIZE = 1000
WSIZE_REP = 200
BOUNDARY_UNIQ_LEN = 2000
MOD = 2147483647

_SEED = {"A": 0x3C8BFBB395C60474, "C": 0x3193C18562A02B4C,
         "G": 0x20323ED082572324, "T": 0x295549F54BE24456}
_COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}
_M64 = (1 << 64) - 1


def _rol1(v: int) -> int:
    return ((v << 1) | (v >> 63)) & _M64


def _swapbits033(v: int) -> int:
    x = (v ^ (v >> 33)) & 1
    return v ^ (x | (x << 33))


def _R(v: int) -> int:
    return _swapbits033(_rol1(v))


def _hash_taps(K: int):
    """taps[j][c] = R^(K-1-j)(seed_c) for the forward hash and
    rtaps[j][c] = R^j(seed_comp_c) for the reverse hash, as uint64
    lookup tables over ASCII codes (see module docstring)."""
    fwd = np.zeros((K, 256), np.uint64)
    rev = np.zeros((K, 256), np.uint64)
    for c, s in _SEED.items():
        v = s
        powers = []
        for r in range(K):
            powers.append(v)
            v = _R(v)
        for j in range(K):
            for cc in (c, c.lower()):
                fwd[j, ord(cc)] = powers[K - 1 - j]
                rev[j, ord(cc)] = powers[j]
    # reverse hash uses the complement's seed at each position
    rev_c = np.zeros((K, 256), np.uint64)
    for c in _SEED:
        comp = _COMP[c]
        for cc in (c, c.lower()):
            rev_c[:, ord(cc)] = rev[:, ord(comp)]
    return fwd, rev_c


_TAPS_CACHE: dict[int, tuple] = {}


def kmer_hash(seq: bytes, plen: int, K: int) -> np.ndarray:
    """Canonical ntHash (mod 2^31-1) of the k-mer ending at profile
    position i, for i in [0, plen) (seed.c:28-55).  seq is the full
    read; k-mer i spans seq[i .. i+K-1]."""
    if K not in _TAPS_CACHE:
        _TAPS_CACHE[K] = _hash_taps(K)
    fwd_t, rev_t = _TAPS_CACHE[K]
    s = np.frombuffer(seq, np.uint8)
    f = np.zeros(plen, np.uint64)
    r = np.zeros(plen, np.uint64)
    for j in range(K):
        win = s[j: j + plen]
        f ^= fwd_t[j][win]
        r ^= rev_t[j][win]
    h = np.minimum(f, r)
    return (h % np.uint64(MOD)).astype(np.int64)


@dataclasses.dataclass
class _Seg:
    b: int
    e: int
    cnt: int
    nw: int
    is_seed: bool = False


def _compress(profile, classes, plen: int, valid0: bool, valid_at):
    """Tie-count run compression (seed.c:60-111 / 595-646 common shape):
    alternate invalid stretches (cnt=-1) and equal-count runs."""
    segs: list[_Seg] = []
    b, e = 0, 1
    prev_valid = valid0
    while e < plen:
        if not prev_valid:
            while e < plen and not valid_at(e):
                e += 1
            segs.append(_Seg(b, e, -1, -10))
            b = e
            e += 1
            prev_valid = True
        else:
            while e < plen and profile[e] == profile[e - 1]:
                e += 1
            segs.append(_Seg(b, e, int(profile[e - 1]), 0))
            b = e
            e += 1
            prev_valid = valid_at(b) if b < plen else True
    return segs


def _window_sweep(segs, wsize: int, maximizer: bool):
    """Sliding-window count maximizer/minimizer bookkeeping
    (seed.c:218-325 / 696-800): fills seg.nw in place."""
    Q: list[_Seg] = []          # monotone deque of live segments

    def better(a, b):           # a wipes b?
        return a > b if maximizer else a < b

    last_oor = False
    last_oor_pos = 0
    for i, seg in enumerate(segs):
        if seg.cnt >= 0:
            if Q:
                first = Q[0]
                if better(seg.cnt, first.cnt):
                    last_oor = False
                    for elem in Q:
                        if first.cnt == elem.cnt:
                            elem.nw = min(seg.b - elem.b, wsize)
                        else:
                            elem.nw = (elem.cnt if maximizer
                                       else max(wsize - elem.cnt, 0))
                    Q.clear()
            while Q and better(seg.cnt, Q[-1].cnt):
                Q[-1].nw = (Q[-1].cnt if maximizer
                            else max(wsize - Q[-1].cnt, 0))
                Q.pop()
            Q.append(seg)

        if not Q:
            continue
        while Q and Q[0].b <= seg.b - wsize:
            first = Q[0]
            if last_oor:
                first.nw = min(first.b - last_oor_pos + 1, wsize)
            else:
                first.nw = wsize
            if len(Q) > 1 and (first.cnt > Q[1].cnt if maximizer
                               else first.cnt < Q[1].cnt):
                last_oor_pos = first.e
            Q.pop(0)
            last_oor = True

    while Q:
        first = Q[0]
        if last_oor:
            first.nw = min(first.b - last_oor_pos + 1, wsize)
        else:
            first.nw = wsize
        # NOTE seed.c:321,800: the drain loop tests cnt > next cnt for
        # BOTH directions (the rep variant keeps the maximizer compare)
        if len(Q) > 1 and first.cnt > Q[1].cnt:
            last_oor_pos = first.e
        Q.pop(0)
        last_oor = True


def _does_ovlp(ab, ae, bb, be):
    return max(ab, bb) <= min(ae - 1, be - 1)


class Workspace:
    """Per-worker reusable buffers, mirroring the reference's per-thread
    allocations (ClassPro.c:119-123).

    The mask-interval array must be emulated as a C array with a logical
    length: the reference's binary search is called with r == M
    (seed.c:125-136,143-158), so probes can read the slot one past the
    logical end — STALE data left by earlier merges, phases, or previous
    reads of the same worker.  Those reads (and the merge at
    seed.c:180 reading mintvl[r].e with r possibly == M) feed real
    decisions, so byte-parity requires keeping the physical tail."""

    def __init__(self):
        self.mintvl: list[list[int]] = []   # physical slots [b, e]
        self.M = 0                          # logical length

    def _slot(self, i: int):
        # unwritten slots model fresh zeroed pages (Malloc via mmap)
        if i >= len(self.mintvl):
            return (0, 0)
        return self.mintvl[i]

    def _write(self, i: int, b: int, e: int):
        while len(self.mintvl) <= i:
            self.mintvl.append([0, 0])
        self.mintvl[i][0] = b
        self.mintvl[i][1] = e

    def reset(self, invalid_segs):
        self.M = 0
        for b, e in invalid_segs:
            self._write(self.M, b, e)
            self.M += 1

    def _bs(self, l: int, r: int, b: int, e: int) -> int:
        # exact port of bs_mintvl (seed.c:125-136), r may equal M
        if l > r:
            return -1
        m = (l + r) // 2
        sb, se = self._slot(m)
        if _does_ovlp(sb, se, b, e):
            return m
        if sb < b:
            return self._bs(m + 1, r, b, e)
        return self._bs(l, m - 1, b, e)

    def is_contained(self, b: int, e: int) -> bool:
        idx = self._bs(0, self.M, b, e)
        if idx == -1:
            return False
        sb, se = self._slot(idx)
        return sb <= b and e <= se

    def add_intvl(self, b: int, e: int):
        """Exact port of add_intvl (seed.c:160-188), stale reads and
        all — including the no-overlap branch's off-by-one (seed.c:163-
        168): M is incremented BEFORE the write, so the new interval
        lands one slot past the qsorted range and the previously-stale
        slot M-1 is promoted into the logical array instead."""
        idx = self._bs(0, self.M, b, e)
        if idx == -1:
            self.M += 1
            self._write(self.M, b, e)
            head = sorted((tuple(self._slot(i)) for i in range(self.M)))
            for i, (sb, se) in enumerate(head):
                self._write(i, sb, se)
            return
        l = idx - 1
        while l >= 0 and _does_ovlp(*self._slot(l), b, e):
            l -= 1
        l += 1
        r = idx + 1
        while r < self.M and _does_ovlp(*self._slot(r), b, e):
            r += 1
        r -= 1
        nb = min(self._slot(l)[0], b)
        ne = max(self._slot(r)[1], e)     # r may be M: stale read
        self._write(l, nb, ne)
        if l == r:
            return
        d = r - l
        self.M -= d
        for i in range(l + 1, self.M):
            sb, se = self._slot(i + d)
            self._write(i, sb, se)

    def covers_all(self, plen: int) -> bool:
        if self.M <= 0:
            return False
        sb, se = self._slot(0)
        return sb == 0 and se == plen


def _select(segs, ws: Workspace, hash_, sasgn, wsize: int, mark: int,
            plen: int):
    """Greedy cover selection + per-segment minimizer-hash marking
    (seed.c:342-445 / 821-925)."""
    if ws.covers_all(plen):
        return
    # Python's sorted() is stable; the reference uses glibc qsort with an
    # nw-only comparator (seed.c:113-115), and glibc qsort is mergesort
    # (stable) except when its temp allocation fails.  Byte-parity of the
    # mintvl stale-slot state *within equal-nw tie groups* therefore rests
    # on that glibc implementation detail — a musl/BSD qsort reference
    # build could order ties differently and diverge from us (documented
    # portability assumption; golden.seeds.gz fixtures pin glibc order).
    order = sorted(range(len(segs)), key=lambda i: -segs[i].nw)

    def mark_seg(seg):
        ws.add_intvl(max(0, seg.b - wsize), min(seg.e + wsize, plen))
        seg.is_seed = True
        mh = hash_[seg.b: seg.e].min()
        for j in range(seg.b, seg.e):
            if hash_[j] == mh:
                sasgn[j] = mark

    i = 0
    while i < len(order):
        seg = segs[order[i]]
        if seg.nw < wsize:
            break
        mark_seg(seg)
        i += 1
    while i < len(order):
        ii = i
        nw = segs[order[i]].nw
        while ii < len(order) and segs[order[ii]].nw == nw:
            s = segs[order[ii]]
            if not ws.is_contained(s.b, s.e):
                s.is_seed = True
            ii += 1
        for jj in range(i, ii):
            s = segs[order[jj]]
            if s.is_seed:
                ws.add_intvl(max(0, s.b - wsize), min(s.e + wsize, plen))
                mh = hash_[s.b: s.e].min()
                for j in range(s.b, s.e):
                    if hash_[j] == mh:
                        sasgn[j] = mark
        if ws.covers_all(plen):
            break
        i = ii


def anno_repeat(sasgn: np.ndarray, classes: str, plen: int, K: int):
    """Mark highly-repetitive regions; return `.rep` track intervals in
    read coordinates (seed.c:482-593)."""
    MIN_UNIQ_LEN = int(K * 2.5)
    sasgn[:] = -10
    b = 0
    in_R = classes[0] == "R"
    n_normal = 1 if classes[0] in "HD" else 0
    e = 1
    for e in range(1, plen):
        if in_R:
            if classes[e] != "R":
                b = e
                in_R = False
                n_normal = 1 if classes[e] in "HD" else 0
        else:
            if classes[e] == "R":
                if n_normal >= MIN_UNIQ_LEN:
                    sasgn[b:e] = 0
                in_R = True
            elif classes[e] in "HD":
                n_normal += 1
    e = plen
    if not in_R and n_normal >= MIN_UNIQ_LEN:
        sasgn[b:e] = 0

    # repeat intervals for the DAZZ-style track (read coordinates)
    rints = []
    in_R = sasgn[0] == -10
    b = K - 1
    for i in range(1, plen):
        if not in_R:
            if sasgn[i] == -10:
                b = i + K - 1
                in_R = True
        if in_R and sasgn[i] != -10:
            rints.append((b, i + K - 1))
            in_R = False
    if in_R:
        rints.append((b, plen + K - 1))

    # non-boundary repeats/errors -> -11 (seed.c:575-585)
    l = BOUNDARY_UNIQ_LEN
    while l < plen and sasgn[l] == -10:
        l += 1
    r = plen - BOUNDARY_UNIQ_LEN
    while r >= 0 and sasgn[r] == -10:
        r -= 1
    for i in range(l, r):
        if sasgn[i] == -10:
            sasgn[i] = -11
    return rints


def find_seeds(seq: str, classes: str, profile: np.ndarray, K: int,
               ws: Workspace | None = None):
    """Full seed selection for one read (seed.c:966-1031).

    seq: the read (length plen + K - 1); classes: per-position class
    chars for the k-mer ENDING at each position (i.e. the tail of the
    .class string); profile: (plen,) counts; ws: the worker's reusable
    Workspace — pass the SAME one for consecutive reads to reproduce the
    reference's cross-read stale-slot behavior (see Workspace).

    Returns (seed string of length plen over E/H/D/R, rep intervals)."""
    if ws is None:
        ws = Workspace()
    plen = len(profile)
    sasgn = np.zeros(plen, np.int64)
    rints = anno_repeat(sasgn, classes, plen, K)
    hash_ = kmer_hash(seq.encode("ascii"), plen, K)

    for C in ("H", "D"):
        segs = _compress(profile, classes, plen,
                         classes[0] == C, lambda e: classes[e] == C)
        _window_sweep(segs, WSIZE, maximizer=True)
        ws.reset((s.b, s.e) for s in segs if s.cnt == -1)
        _select(segs, ws, hash_, sasgn, WSIZE, -2, plen)

    segs = _compress(
        profile, classes, plen,
        sasgn[0] <= -10 and classes[0] != "E",
        lambda e: sasgn[e] <= -10 and classes[e] != "E")
    _window_sweep(segs, WSIZE_REP, maximizer=False)
    ws.reset((s.b, s.e) for s in segs if s.cnt == -1)
    _select(segs, ws, hash_, sasgn, WSIZE_REP, -3, plen)

    out = np.full(plen, ord("E"), np.uint8)
    out[sasgn == -2] = np.frombuffer(classes.encode("ascii"), np.uint8)[
        sasgn == -2]
    out[sasgn == -3] = ord("R")
    return out.tobytes().decode("ascii"), rints
