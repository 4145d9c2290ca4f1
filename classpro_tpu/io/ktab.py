"""FASTK k-mer table (``.ktab``) codec — Kmer_Table / Kmer_Stream.

Completes the FASTK client-library surface (SURVEY §2 "libfastk"): the
histogram/profile half lives in :mod:`classpro_tpu.io.fastk`; this module
covers the sorted k-mer table half (ref libfastk.c:197-1229), which the
reference vendored but ClassPro itself never calls — provided here so a
reference user migrating finds the full library.

On-disk format (reverse-engineered from the reference reader,
libfastk.c:323-371 ``Load_Kmer_Table`` and 786-900 ``Open_Kmer_Stream``):

``<root>.ktab`` (stub)
    int32 kmer, int32 nparts, int32 minval, int32 ibyte, then
    int64 index[256**ibyte]: cumulative number of table entries whose
    first ``ibyte`` packed bytes are <= each prefix value.

``.<root>.ktab.N`` (hidden parts, N = 1..nparts)
    int32 kmer, int64 n, then n entries of ``pbyte`` bytes each:
    ``hbyte = kbyte - ibyte`` suffix bytes followed by a uint16 (LE)
    count, where ``kbyte = ceil(kmer/4)``.  Entries are sorted ascending
    by their full packed k-mer across the concatenation of all parts.

K-mers are stored *canonically*: the lexicographic minimum of the 2-bit
code strings (a=0, c=1, g=2, t=3) of the forward k-mer and its reverse
complement, ties to forward — equivalent to the reference's
``is_minimal``/``compress_norm``/``compress_comp`` (libfastk.c:585-660;
the odd-length middle-base rule ``x < 2`` is exactly the lexicographic
comparison of the base against its complement).  Packing is 4 bases per
byte, first base in the top 2 bits, zero-padded tail (the reference pads
with 'a' forward and 't' reverse-complemented — both code 0).

Counts cap at MAX_KMER_CNT (0x7fff), matching FastK's uint16 tables.

All lookups here are numpy-vectorized; parts are memory-mapped and
binary-searched in place (void-dtype ``searchsorted`` is bytewise
lexicographic — the same order as the reference's ``mycmp``).
"""

from __future__ import annotations

import os
import struct
from typing import Iterator, Sequence

import numpy as np

from classpro_tpu.constants import MAX_KMER_CNT

_CODE = np.zeros(256, dtype=np.uint8)  # unknown bases -> 0 ('a'), as ref
for _i, _b in enumerate("acgt"):
    _CODE[ord(_b)] = _i
    _CODE[ord(_b.upper())] = _i
_BASES = np.frombuffer(b"acgt", dtype=np.uint8)


def _codes(seqs: Sequence[str], k: int) -> np.ndarray:
    """(N, k) uint8 2-bit codes of N equal-length k-mers."""
    buf = np.frombuffer("".join(seqs).encode("ascii"), dtype=np.uint8)
    if buf.size != len(seqs) * k:
        raise ValueError("all sequences must have length k")
    return _CODE[buf].reshape(len(seqs), k)


def _pack(codes: np.ndarray) -> np.ndarray:
    """(N, k) 2-bit codes -> (N, kbyte) packed bytes, zero-padded."""
    n, k = codes.shape
    kbyte = (k + 3) >> 2
    padded = np.zeros((n, kbyte * 4), dtype=np.uint8)
    padded[:, :k] = codes
    q = padded.reshape(n, kbyte, 4)
    return (q[..., 0] << 6) | (q[..., 1] << 4) | (q[..., 2] << 2) | q[..., 3]


def _unpack(packed: np.ndarray, k: int) -> np.ndarray:
    """(N, kbyte) packed bytes -> (N, k) 2-bit codes."""
    p = np.asarray(packed, dtype=np.uint8)
    n = p.shape[0]
    out = np.empty((n, p.shape[1] * 4), dtype=np.uint8)
    out[:, 0::4] = (p >> 6) & 3
    out[:, 1::4] = (p >> 4) & 3
    out[:, 2::4] = (p >> 2) & 3
    out[:, 3::4] = p & 3
    return out[:, :k]


def canonical_pack(seqs: Sequence[str], k: int) -> np.ndarray:
    """Pack k-mers canonically: min(forward, reverse-complement) codes.

    Vectorized equivalent of the reference's is_minimal + compress_norm /
    compress_comp (libfastk.c:585-660).
    """
    fw = _codes(seqs, k)
    rc = (3 - fw)[:, ::-1]
    # lexicographic fw <= rc, ties to forward
    diff = fw != rc
    first = np.where(diff.any(axis=1), diff.argmax(axis=1), 0)
    rows = np.arange(fw.shape[0])
    take_rc = fw[rows, first] > rc[rows, first]
    return _pack(np.where(take_rc[:, None], rc, fw))


def kmer_strings(packed: np.ndarray, k: int) -> list[str]:
    """Decode packed k-mers to lowercase acgt strings (ref ``fmer`` style)."""
    ch = _BASES[_unpack(packed, k)]
    return [bytes(row).decode("ascii") for row in ch]


def count_kmers(seqs: Sequence[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Canonical k-mer spectrum of a read set: (packed (N,kbyte), counts).

    Sorted ascending, duplicates merged, counts capped at MAX_KMER_CNT —
    the same table FastK would produce (sans its sequencing-oriented
    options).  Windows containing non-acgt bases are coded as 'a' like
    the reference's ``code[]`` table (libfastk.c:569-577).
    """
    wins: list[str] = []
    for s in seqs:
        wins.extend(s[i:i + k] for i in range(len(s) - k + 1))
    if not wins:
        kbyte = (k + 3) >> 2
        return (np.empty((0, kbyte), dtype=np.uint8),
                np.empty(0, dtype=np.int64))
    packed = canonical_pack(wins, k)
    v = packed.view(np.dtype((np.void, packed.shape[1]))).ravel()
    uniq, counts = np.unique(v, return_counts=True)
    out = uniq.view(np.uint8).reshape(-1, packed.shape[1])
    return out, np.minimum(counts, MAX_KMER_CNT).astype(np.int64)


def _auto_ibyte(nels: int, kbyte: int) -> int:
    for ib in (1, 2, 3):
        if nels < (1 << (8 * ib)) * 4 or ib == kbyte:
            return min(ib, kbyte)
    return min(3, kbyte)


def write_ktab(root: str, packed: np.ndarray, counts: np.ndarray, kmer: int,
               nparts: int = 1, minval: int | None = None,
               ibyte: int | None = None) -> None:
    """Write a FASTK ``.ktab`` (stub + hidden parts) the reference reads.

    ``packed`` must be canonical packed k-mers (e.g. from
    :func:`count_kmers`); rows are sorted here if needed.
    """
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    counts = np.asarray(counts)
    nels, kbyte = packed.shape
    if kbyte != (kmer + 3) >> 2:
        raise ValueError("packed width does not match kmer length")
    v = packed.view(np.dtype((np.void, kbyte))).ravel()
    order = np.argsort(v, kind="stable")
    if not np.array_equal(order, np.arange(nels)):
        packed, counts = packed[order], counts[order]
    counts = np.minimum(counts, MAX_KMER_CNT).astype("<u2")
    if minval is None:
        minval = int(counts.min()) if nels else 1

    ibyte = ibyte if ibyte is not None else _auto_ibyte(nels, kbyte)
    if not 1 <= ibyte <= kbyte:
        raise ValueError("ibyte out of range")
    ixlen = 1 << (8 * ibyte)
    hbyte = kbyte - ibyte

    # cumulative per-prefix index over the whole table
    pre = packed[:, 0].astype(np.int64)
    for j in range(1, ibyte):
        pre = (pre << 8) | packed[:, j]
    index = np.cumsum(np.bincount(pre, minlength=ixlen)).astype("<i8")

    dirn, base = os.path.split(root)
    with open(os.path.join(dirn, base + ".ktab"), "wb") as f:
        f.write(struct.pack("<iiii", kmer, nparts, minval, ibyte))
        f.write(index.tobytes())

    rows = np.empty((nels, hbyte + 2), dtype=np.uint8)
    rows[:, :hbyte] = packed[:, ibyte:]
    rows[:, hbyte:] = counts.view(np.uint8).reshape(-1, 2)
    bounds = [nels * p // nparts for p in range(nparts + 1)]
    for p in range(1, nparts + 1):
        chunk = rows[bounds[p - 1]:bounds[p]]
        with open(os.path.join(dirn, f".{base}.ktab.{p}"), "wb") as f:
            f.write(struct.pack("<iq", kmer, chunk.shape[0]))
            f.write(chunk.tobytes())


class KmerTable:
    """Sorted canonical k-mer count table (ref Kmer_Table, libfastk.c:323).

    Parts stay memory-mapped; ``find`` binary-searches in place.  With
    ``cut_off > minval`` rows below the cutoff are dropped at load, as in
    the reference (libfastk.c:376-386).
    """

    def __init__(self, root: str, cut_off: int = 0):
        dirn, base = os.path.split(root)
        if base.endswith(".ktab"):
            base = base[:-5]
        with open(os.path.join(dirn or ".", base + ".ktab"), "rb") as f:
            self.kmer, nparts, self.minval, self.ibyte = struct.unpack(
                "<iiii", f.read(16))
            ixlen = 1 << (8 * self.ibyte)
            self.index = np.fromfile(f, dtype="<i8", count=ixlen)
        self.kbyte = (self.kmer + 3) >> 2
        self.hbyte = self.kbyte - self.ibyte
        self.pbyte = self.hbyte + 2
        parts = []
        for p in range(1, nparts + 1):
            path = os.path.join(dirn or ".", f".{base}.ktab.{p}")
            with open(path, "rb") as f:
                k, n = struct.unpack("<iq", f.read(12))
            if k != self.kmer:
                raise ValueError(f"part {p} kmer {k} != stub {self.kmer}")
            parts.append(np.memmap(path, dtype=np.uint8, mode="r",
                                   offset=12,
                                   shape=(n, self.pbyte)) if n else
                         np.empty((0, self.pbyte), dtype=np.uint8))
        rows = parts[0] if len(parts) == 1 else np.concatenate(parts)
        if cut_off > self.minval:
            keep = self._counts_arr(rows) >= cut_off
            rows = np.ascontiguousarray(rows[keep])
            pre = self._prefixes(rows, keep)
            self.index = np.cumsum(
                np.bincount(pre, minlength=ixlen)).astype(np.int64)
            self.minval = cut_off
        self.rows = rows
        self.nels = rows.shape[0]

    def _counts_arr(self, rows: np.ndarray) -> np.ndarray:
        return (rows[:, self.hbyte].astype(np.int32)
                | (rows[:, self.hbyte + 1].astype(np.int32) << 8))

    def _full_keys(self) -> np.ndarray:
        """(nels,) void(kbyte) view of each row's full packed k-mer.

        Suffixes are sorted only within a prefix bucket; global binary
        search needs the prefix bytes restored (built lazily, cached).
        """
        keys = getattr(self, "_keys", None)
        if keys is None:
            pre = np.repeat(np.arange(self.index.size, dtype=np.int64),
                            np.diff(self.index, prepend=0))
            full = np.empty((self.nels, self.kbyte), dtype=np.uint8)
            for j in range(self.ibyte):
                full[:, j] = (pre >> (8 * (self.ibyte - 1 - j))) & 0xFF
            full[:, self.ibyte:] = self.rows[:, :self.hbyte]
            keys = full.view(np.dtype((np.void, self.kbyte))).ravel()
            self._keys = keys
        return keys

    def _prefixes(self, rows: np.ndarray, keep: np.ndarray) -> np.ndarray:
        # recover each surviving row's prefix from the original index
        old = np.repeat(np.arange(self.index.size),
                        np.diff(self.index, prepend=0))
        return old[keep]

    # -- per-entry access (ref Fetch_Kmer / Fetch_Count) ------------------

    def _prefix_of(self, i: int) -> int:
        return int(np.searchsorted(self.index, i, side="right"))

    def fetch_kmer(self, i: int) -> str:
        pre, kb = self._prefix_of(i), self.kbyte
        packed = np.empty(kb, dtype=np.uint8)
        for j in range(self.ibyte - 1, -1, -1):
            packed[j] = pre & 0xFF
            pre >>= 8
        packed[self.ibyte:] = self.rows[i, :self.hbyte]
        return kmer_strings(packed[None, :], self.kmer)[0]

    def fetch_count(self, i: int) -> int:
        r = self.rows[i]
        return int(r[self.hbyte]) | (int(r[self.hbyte + 1]) << 8)

    # -- lookup (ref Find_Kmer, libfastk.c:662-711) -----------------------

    def find(self, seqs: str | Sequence[str]) -> np.ndarray | int:
        one = isinstance(seqs, str)
        packed = canonical_pack([seqs] if one else list(seqs), self.kmer)
        if self.nels == 0:
            res = np.full(packed.shape[0], -1, dtype=np.int64)
            return int(res[0]) if one else res
        keys = self._full_keys()
        vq = np.ascontiguousarray(packed).view(
            np.dtype((np.void, self.kbyte))).ravel()
        pos = np.searchsorted(keys, vq, side="left")
        safe = np.minimum(pos, self.nels - 1)
        res = np.where((pos < self.nels) & (keys[safe] == vq), pos, -1)
        return int(res[0]) if one else res

    def counts_of(self, seqs: Sequence[str]) -> np.ndarray:
        """Counts for a batch of k-mers, 0 where absent."""
        idx = np.atleast_1d(self.find(list(seqs)))
        safe = np.maximum(idx, 0)
        c = self._counts_arr(self.rows[safe])
        return np.where(idx >= 0, c, 0)

    def __len__(self) -> int:
        return self.nels


class KmerStream:
    """Cursor over a table (ref Kmer_Stream, libfastk.c:786-1229).

    The reference streams 1024-entry blocks from disk; here the parts are
    memory-mapped, so the cursor indexes the same bytes without buffering.
    """

    def __init__(self, root: str, _table: KmerTable | None = None):
        self._t = _table or KmerTable(root)
        self.kmer = self._t.kmer
        self.minval = self._t.minval
        self.nels = self._t.nels
        self.cidx = 0

    def clone(self) -> "KmerStream":  # ref Clone_Kmer_Stream
        s = KmerStream.__new__(KmerStream)
        s._t = self._t
        s.kmer, s.minval, s.nels = self.kmer, self.minval, self.nels
        s.cidx = 0
        return s

    @property
    def done(self) -> bool:
        return self.cidx >= self.nels

    def first(self) -> None:
        self.cidx = 0

    def advance(self) -> None:  # ref Next_Kmer_Entry
        self.cidx += 1

    def current_kmer(self) -> str:
        return self._t.fetch_kmer(self.cidx)

    def current_count(self) -> int:
        return self._t.fetch_count(self.cidx)

    def current_entry(self) -> np.ndarray:
        """Full packed entry (kbyte prefix+suffix bytes), ref libfastk.c:1051."""
        pre, t = self._t._prefix_of(self.cidx), self._t
        out = np.empty(t.kbyte, dtype=np.uint8)
        for j in range(t.ibyte - 1, -1, -1):
            out[j] = pre & 0xFF
            pre >>= 8
        out[t.ibyte:] = t.rows[self.cidx, :t.hbyte]
        return out

    def goto_index(self, i: int) -> None:
        self.cidx = int(i)

    def goto_kmer(self, seq: str) -> bool:
        """Position at the first entry >= seq; True iff an exact match
        (ref GoTo_Kmer_String/Entry, libfastk.c:1128-1229)."""
        t = self._t
        packed = canonical_pack([seq], t.kmer)
        pre = packed[0, 0].astype(np.int64)
        for j in range(1, t.ibyte):
            pre = (pre << 8) | packed[0, j]
        lo = int(t.index[pre - 1]) if pre > 0 else 0
        hi = int(t.index[pre])
        if t.hbyte:
            q = np.zeros(t.pbyte, dtype=np.uint8)
            q[:t.hbyte] = packed[0, t.ibyte:]
            sub = np.ascontiguousarray(t.rows[lo:hi]).view(
                np.dtype((np.void, t.pbyte))).ravel()
            pos = lo + int(np.searchsorted(sub, np.void(q.tobytes()),
                                           side="left"))
            self.cidx = pos
            return (pos < hi and
                    bool((t.rows[pos, :t.hbyte]
                          == packed[0, t.ibyte:]).all()))
        self.cidx = lo
        return hi > lo

    def __iter__(self) -> Iterator[tuple[str, int]]:
        for i in range(self.cidx, self.nels):
            self.cidx = i
            yield self._t.fetch_kmer(i), self._t.fetch_count(i)
        self.cidx = self.nels


def load_kmer_table(root: str, cut_off: int = 0) -> KmerTable:
    return KmerTable(root, cut_off)


def open_kmer_stream(root: str) -> KmerStream:
    return KmerStream(root)
