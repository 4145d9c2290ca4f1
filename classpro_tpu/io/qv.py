"""DAZZ quality-value codec — the reference's QV.c, bit-for-bit.

Closes the last component gap in SURVEY §2: the reference vendors QV.c
(1,481 LoC) as DB.c's .qvs compressor; ClassPro never touches QVs, but a
migrating DAZZ user may, so the full codec lives here.  Everything below
is byte-compatible with the reference (and tested so, via a C harness
compiled from the reference sources — tests/test_qv.py):

* per-stream Huffman schemes built from scanned histograms with the
  reference's exact array-heap tie-breaking (QV.c:91-221 Reheap/Huffman,
  including the two-pass escape construction for codes > HUFF_CUTOFF and
  the always-present 255 escape in run schemes);
* scheme serialization (QV.c:300-375 Write_Scheme/Read_Scheme, 16-bit
  prefix lookup decode tables, endian-flip support);
* the 32-bit-word bit packer with its end-padding rules
  (QV.c:386-446 Encode incl. the "tricky" llen>16 double pad), run-length
  variants (Encode_Run:448-510 with 16-bit explicit lengths for runs
  >= 255 or escaped codes), and the matching lazy-refill decoders
  (Decode/Decode_Run:510-695 GET semantics replicated exactly so file
  positions agree);
* the five-stream .quiva entry transform (Compress_Next_QVentry1 /
  Uncompress_Next_QVentry, QV.c:1343-1481): deletion QVs (plain or
  run-coded on ``delChar``), the deletion tags packed to the non-run
  positions and 2-bit DNA-compressed (Pack_Tag/Unpack_Tag:810-858,
  gene_core.c Number/Compress/Uncompress/Lower_Read), insertion and
  merge QVs (optionally lossily scaled, 1- and 2-bit), substitution QVs
  (plain or run-coded on ``subChar``);
* the statistics scan (QVcoding_Scan1:866-920: delChar discovery from
  'n' tags, subChar election at 100k chars, run histograms seeded at 1)
  and scheme election rules (Create_QVcoding:1029-1170: the 200k/50%
  subChar win test, delHist[delChar] zeroing, lossy halving/quartering);
* the coding-file header (Write_QVcoding/Read_QVcoding:1173-1322:
  0x33cc endian key, 256-means-none run chars, common header prefix).
"""

from __future__ import annotations

import dataclasses
import struct
from typing import BinaryIO, Sequence

import numpy as np

HUFF_CUTOFF = 16
_M64 = (1 << 64) - 1

_NUMBER = np.zeros(256, dtype=np.uint8)  # acgt/ACGT -> 0..3, else 0
for _i, _b in enumerate("acgt"):
    _NUMBER[ord(_b)] = _i
    _NUMBER[ord(_b.upper())] = _i
_LETTER = b"acgt"


# ---------------------------------------------------------------------------
# Huffman scheme construction (ref QV.c:91-221) — exact tie-breaking
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class HScheme:
    """codebits/codelens per symbol + decode lookup (ref HScheme struct)."""

    type: int                 # 0 normal, 1 has long codes, 2 truncated
    codebits: np.ndarray      # uint32[256]
    codelens: np.ndarray      # int32[256]
    _lookup: np.ndarray | None = None

    @property
    def lookup(self) -> np.ndarray:
        if self._lookup is None:
            look = np.zeros(0x10000, dtype=np.int32)
            for i in range(256):
                ln = int(self.codelens[i])
                if ln > 0:
                    base = (int(self.codebits[i]) << (16 - ln)) & 0xFFFF
                    look[base:base + (1 << (16 - ln))] = i
            self._lookup = look
        return self._lookup


class _Node:
    __slots__ = ("count", "lft", "rgt", "sym")

    def __init__(self, count: int, sym: int | None = None,
                 lft: "_Node | None" = None, rgt: "_Node | None" = None):
        self.count, self.sym, self.lft, self.rgt = count, sym, lft, rgt


def _reheap(s: int, heap: list, hsize: int) -> None:
    # ref Reheap (QV.c:91): strict-> comparisons; equal counts stop
    c, hs = s, heap[s]
    while 2 * c <= hsize:
        l = 2 * c
        r = l + 1
        hl = heap[l]
        if r > hsize or heap[r].count > hl.count:
            if hs.count > hl.count:
                heap[c] = hl
                c = l
            else:
                break
        else:
            if hs.count > heap[r].count:
                heap[c] = heap[r]
                c = r
            else:
                break
    if c != s:
        heap[c] = hs


def _build_table(node: _Node, code: int, length: int,
                 bits: np.ndarray, lens: np.ndarray) -> None:
    if node.rgt is None:
        bits[node.sym] = code
        lens[node.sym] = length
    else:
        _build_table(node.lft, code << 1, length + 1, bits, lens)
        _build_table(node.rgt, (code << 1) | 1, length + 1, bits, lens)


def _huffman(hist: np.ndarray, inscheme: HScheme | None) -> HScheme:
    """ref Huffman (QV.c:147-221): heap in creation order, heapify, merge."""
    heap: list = [None]  # 1-indexed
    nodes: list[_Node] = []
    if inscheme is not None:
        esc = _Node(0, sym=255)
        nodes.append(esc)
        heap.append(esc)
    for i in range(256):
        if hist[i] > 0:
            if inscheme is not None and (
                    inscheme.codelens[i] > HUFF_CUTOFF or i == 255):
                nodes[0].count += int(hist[i])
            else:
                n = _Node(int(hist[i]), sym=i)
                nodes.append(n)
                heap.append(n)
    hsize = len(heap) - 1
    value = len(nodes)

    for i in range(hsize // 2, 0, -1):
        _reheap(i, heap, hsize)

    for _ in range(1, value):
        lft = heap[1]
        heap[1] = heap[hsize]
        hsize -= 1
        _reheap(1, heap, hsize)
        rgt = heap[1]
        parent = _Node(lft.count + rgt.count, lft=lft, rgt=rgt)
        nodes.append(parent)
        heap[1] = parent
        _reheap(1, heap, hsize)

    bits = np.zeros(256, dtype=np.uint32)
    lens = np.zeros(256, dtype=np.int32)
    _build_table(nodes[-1], 0, 0, bits, lens)

    if inscheme is not None:
        # truncated: map long/escaped symbols onto 255's code
        for i in range(255):
            if (inscheme.codelens[i] > HUFF_CUTOFF
                    or lens[i] > HUFF_CUTOFF):
                lens[i] = lens[255]
                bits[i] = bits[255]
        return HScheme(2, bits, lens)
    typ = 1 if (lens > HUFF_CUTOFF).any() else 0
    return HScheme(typ, bits, lens)


def _make_scheme(hist: np.ndarray) -> HScheme:
    # ref MAKE_SCHEME macro: rebuild with escape iff first pass has type!=0
    s = _huffman(hist, None)
    return _huffman(hist, s) if s.type else s


# ---------------------------------------------------------------------------
# Bit-stream encoders / decoders (ref QV.c:386-695)
# ---------------------------------------------------------------------------


class _BitWriter:
    """ref OCODE macro state: 32-bit LE words, end-padding rules."""

    def __init__(self, out: bytearray):
        self.out = out
        self.olen = 0
        self.llen = 0
        self.ocode = 0

    def put(self, L: int, C: int) -> None:
        self.llen = self.olen
        total = self.olen + L
        if total >= 32:
            self.olen = total - 32
            self.ocode |= (C >> self.olen) & 0xFFFFFFFF
            self.out += struct.pack("<I", self.ocode)
            self.ocode = ((C << (32 - self.olen)) & 0xFFFFFFFF
                          if self.olen > 0 else 0)
        else:
            self.olen = total
            self.ocode |= (C << (32 - self.olen)) & 0xFFFFFFFF

    def flush(self) -> None:
        # ref Encode tail: pad so the decoder's 16-bit peek never overruns
        if self.olen > 0:
            self.out += struct.pack("<I", self.ocode)
            if self.llen > 16 and self.olen > self.llen:
                self.out += struct.pack("<I", self.ocode)
        elif self.llen > 16:
            self.out += struct.pack("<I", self.ocode)


def _encode(scheme: HScheme, out: bytearray, data: bytes) -> None:
    lens, bits = scheme.codelens, scheme.codebits
    if scheme.type == 2:
        nspec, nslen = int(bits[255]), int(lens[255])
    else:
        nspec = nslen = 0x7FFFFFFF
    w = _BitWriter(out)
    for x in data:
        n, c = int(lens[x]), int(bits[x])
        w.put(n, c)
        if c == nspec and n == nslen:
            w.put(8, x)
    w.flush()


def _encode_run(neme: HScheme, reme: HScheme, out: bytearray,
                data: bytes, rchar: int) -> None:
    nlens, nbits = neme.codelens, neme.codebits
    rlens, rbits = reme.codelens, reme.codebits
    if neme.type == 2:
        nspec, nslen = int(nbits[255]), int(nlens[255])
    else:
        nspec = nslen = 0x7FFFFFFF
    rspec, rslen = int(rbits[255]), int(rlens[255])
    w = _BitWriter(out)
    k, rlen = 0, len(data)
    while k < rlen:
        h = k
        while k < rlen and data[k] == rchar:
            k += 1
        x = 255 if k - h >= 255 else k - h
        n, c = int(rlens[x]), int(rbits[x])
        w.put(n, c)
        if c == rspec and n == rslen:
            w.put(16, k - h)
        if k < rlen:
            x = data[k]
            n, c = int(nlens[x]), int(nbits[x])
            w.put(n, c)
            if c == nspec and n == nslen:
                w.put(8, x)
            k += 1
    w.flush()


class _BitReader:
    """ref GET macro state: lazy 32-bit refills, 16-bit peek window."""

    def __init__(self, f: BinaryIO, flip: bool = False):
        self.f = f
        self.flip = flip
        self.icode = 0
        self.ilen = 0

    def get(self, n: int) -> None:
        if n > self.ilen:
            self.icode = (self.icode << self.ilen) & _M64
            word = struct.unpack("<I", self.f.read(4))[0]
            if self.flip:
                word = struct.unpack(">I", struct.pack("<I", word))[0]
            self.icode |= word
            sh = n - self.ilen
            self.icode = (self.icode << sh) & _M64
            self.ilen = 32 - sh
        else:
            self.icode = (self.icode << n) & _M64
            self.ilen -= n

    def peek16(self) -> int:
        return (self.icode >> 32) & 0xFFFF

    def peek8(self) -> int:
        return (self.icode >> 40) & 0xFF


def _decode(scheme: HScheme, f: BinaryIO, rlen: int,
            flip: bool = False) -> bytes:
    signal = 255 if scheme.type == 2 else 256
    lens, look = scheme.codelens, scheme.lookup
    r = _BitReader(f, flip)
    out = bytearray(rlen)
    n = 16
    for j in range(rlen):
        r.get(n)
        c = int(look[r.peek16()])
        n = int(lens[c])
        if c == signal:
            r.get(n)
            c = r.peek8()
            n = 8
        out[j] = c
    return bytes(out)


def _decode_run(neme: HScheme, reme: HScheme, f: BinaryIO, rlen: int,
                rchar: int, flip: bool = False) -> bytes:
    nsignal = 255 if neme.type == 2 else 256
    nlens, nlook = neme.codelens, neme.lookup
    rlens, rlook = reme.codelens, reme.lookup
    r = _BitReader(f, flip)
    out = bytearray(rlen)
    n = 16
    j = 0
    while j < rlen:
        r.get(n)
        c = int(rlook[r.peek16()])
        n = int(rlens[c])
        if c == 255:
            r.get(n)
            c = r.peek16()
            n = 16
        for _ in range(c):
            out[j] = rchar
            j += 1
        if j < rlen:
            r.get(n)
            c = int(nlook[r.peek16()])
            n = int(nlens[c])
            if c == nsignal:
                r.get(n)
                c = r.peek8()
                n = 8
            out[j] = c
        j += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# Statistics scan (ref QVcoding_Scan1, QV.c:866-920)
# ---------------------------------------------------------------------------


class QVScanner:
    """Accumulates the five-stream histograms over .quiva entries."""

    def __init__(self):
        self.delHist = np.zeros(256, dtype=np.int64)
        self.insHist = np.zeros(256, dtype=np.int64)
        self.mrgHist = np.zeros(256, dtype=np.int64)
        self.subHist = np.zeros(256, dtype=np.int64)
        self.delRun = np.ones(256, dtype=np.int64)   # seeded at 1 (ref)
        self.subRun = np.ones(256, dtype=np.int64)
        self.totChar = 0
        self.delChar = -1
        self.subChar = -1

    @staticmethod
    def _runs(run: np.ndarray, data: bytes, rchar: int) -> None:
        k, rlen = 0, len(data)
        while k < rlen:
            h = k
            while k < rlen and data[k] == rchar:
                k += 1
            run[255 if k - h >= 256 else k - h] += 1
            if k < rlen:
                k += 1

    def scan(self, delQV: bytes, delTag: bytes, insQV: bytes,
             mergeQV: bytes, subQV: bytes) -> None:
        rlen = len(delQV)
        if rlen == 0:
            return
        for hist, s in ((self.delHist, delQV), (self.insHist, insQV),
                        (self.mrgHist, mergeQV), (self.subHist, subQV)):
            np.add.at(hist, np.frombuffer(s, dtype=np.uint8), 1)
        if self.delChar < 0:
            for k in range(rlen):
                if delTag[k] in (ord("n"), ord("N")):
                    self.delChar = delQV[k]
                    break
        if self.delChar >= 0:
            self._runs(self.delRun, delQV, self.delChar)
        self.totChar += rlen
        if self.subChar < 0 and self.totChar >= 100000:
            self.subChar = int(np.argmax(self.subHist))  # first max, as C
        if self.subChar >= 0:
            self._runs(self.subRun, subQV, self.subChar)


# ---------------------------------------------------------------------------
# Coding object + creation / (de)serialization (ref QV.c:1029-1322)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class QVcoding:
    delScheme: HScheme
    insScheme: HScheme
    mrgScheme: HScheme
    subScheme: HScheme
    dRunScheme: HScheme | None
    sRunScheme: HScheme | None
    delChar: int
    subChar: int
    prefix: str = ""
    flip: bool = False


def create_coding(sc: QVScanner, lossy: bool = False,
                  prefix: str = "") -> QVcoding:
    delHist = sc.delHist.copy()
    insHist = sc.insHist.copy()
    mrgHist = sc.mrgHist.copy()
    subChar, delChar = sc.subChar, sc.delChar

    # is the substitution run char a win? (ref QV.c:1043)
    if sc.totChar < 200000 or sc.subHist[subChar] < 0.5 * sc.totChar:
        subChar = -1

    if lossy:  # scale insertions to even, merges to multiples of 4
        ins2 = insHist.reshape(128, 2).sum(axis=1)
        insHist[:] = 0
        insHist[0::2] = ins2
        mrg4 = mrgHist.reshape(64, 4).sum(axis=1)
        mrgHist[:] = 0
        mrgHist[0::4] = mrg4

    if delChar < 0:
        delScheme, dRunScheme = _make_scheme(delHist), None
    else:
        delHist[delChar] = 0
        delScheme = _make_scheme(delHist)
        dRunScheme = _make_scheme(sc.delRun)
    insScheme = _make_scheme(insHist)
    mrgScheme = _make_scheme(mrgHist)
    if subChar < 0:
        subScheme, sRunScheme = _make_scheme(sc.subHist), None
    else:
        subHist = sc.subHist.copy()
        subHist[subChar] = 0
        subScheme = _make_scheme(subHist)
        sRunScheme = _make_scheme(sc.subRun)
    return QVcoding(delScheme, insScheme, mrgScheme, subScheme,
                    dRunScheme, sRunScheme, delChar, subChar, prefix)


def _write_scheme(s: HScheme, out: bytearray) -> None:
    out.append(s.type & 0xFF)
    for i in range(256):
        ln = int(s.codelens[i])
        out.append(ln)
        if ln > 0:
            out += struct.pack("<I", int(s.codebits[i]))


def _read_scheme(f: BinaryIO, flip: bool) -> HScheme:
    typ = f.read(1)[0]
    bits = np.zeros(256, dtype=np.uint32)
    lens = np.zeros(256, dtype=np.int32)
    for i in range(256):
        ln = f.read(1)[0]
        lens[i] = ln
        if ln > 0:
            (b,) = struct.unpack(">I" if flip else "<I", f.read(4))
            bits[i] = b
    return HScheme(typ, bits, lens)


def write_coding(f: BinaryIO, coding: QVcoding) -> None:
    out = bytearray()
    out += struct.pack("<H", 0x33CC)
    out += struct.pack("<H", 256 if coding.delChar < 0 else coding.delChar)
    out += struct.pack("<H", 256 if coding.subChar < 0 else coding.subChar)
    pref = coding.prefix.encode("ascii")
    out += struct.pack("<i", len(pref))
    out += pref
    _write_scheme(coding.delScheme, out)
    if coding.delChar >= 0:
        _write_scheme(coding.dRunScheme, out)
    _write_scheme(coding.insScheme, out)
    _write_scheme(coding.mrgScheme, out)
    _write_scheme(coding.subScheme, out)
    if coding.subChar >= 0:
        _write_scheme(coding.sRunScheme, out)
    f.write(bytes(out))


def read_coding(f: BinaryIO) -> QVcoding:
    (key,) = struct.unpack("<H", f.read(2))
    flip = key != 0x33CC
    e = ">" if flip else "<"
    (delChar,) = struct.unpack(e + "H", f.read(2))
    (subChar,) = struct.unpack(e + "H", f.read(2))
    delChar = -1 if delChar >= 256 else delChar
    subChar = -1 if subChar >= 256 else subChar
    (plen,) = struct.unpack(e + "i", f.read(4))
    prefix = f.read(plen).decode("ascii")
    delScheme = _read_scheme(f, flip)
    dRunScheme = _read_scheme(f, flip) if delChar >= 0 else None
    insScheme = _read_scheme(f, flip)
    mrgScheme = _read_scheme(f, flip)
    subScheme = _read_scheme(f, flip)
    sRunScheme = _read_scheme(f, flip) if subChar >= 0 else None
    return QVcoding(delScheme, insScheme, mrgScheme, subScheme,
                    dRunScheme, sRunScheme, delChar, subChar, prefix, flip)


# ---------------------------------------------------------------------------
# Entry compress / uncompress (ref QV.c:810-858, 1343-1481)
# ---------------------------------------------------------------------------


def _compress_tags(tags: bytes) -> bytes:
    """Number_Read + Compress_Read: 2-bit pack, first char in top bits."""
    clen = len(tags)
    codes = _NUMBER[np.frombuffer(tags, dtype=np.uint8)]
    padded = np.zeros(((clen + 3) >> 2) * 4, dtype=np.uint8)
    padded[:clen] = codes
    q = padded.reshape(-1, 4)
    return ((q[:, 0] << 6) | (q[:, 1] << 4) | (q[:, 2] << 2)
            | q[:, 3]).astype(np.uint8).tobytes()


def _uncompress_tags(comp: bytes, clen: int) -> bytes:
    b = np.frombuffer(comp, dtype=np.uint8)
    out = np.empty(b.size * 4, dtype=np.uint8)
    out[0::4] = (b >> 6) & 3
    out[1::4] = (b >> 4) & 3
    out[2::4] = (b >> 2) & 3
    out[3::4] = b & 3
    return np.frombuffer(_LETTER, dtype=np.uint8)[
        out[:clen]].tobytes()


def compress_entry(coding: QVcoding, delQV: bytes, delTag: bytes,
                   insQV: bytes, mergeQV: bytes, subQV: bytes,
                   lossy: bool = False) -> bytes:
    """One entry's 5 streams -> the reference's compressed byte layout."""
    rlen = len(delQV)
    out = bytearray()
    if coding.delChar < 0:
        _encode(coding.delScheme, out, delQV)
        tags = delTag
    else:
        _encode_run(coding.delScheme, coding.dRunScheme, out, delQV,
                    coding.delChar)
        keep = np.frombuffer(delQV, dtype=np.uint8) != coding.delChar
        tags = np.frombuffer(delTag, dtype=np.uint8)[keep].tobytes()
    out += _compress_tags(tags)
    if lossy:
        ins = np.frombuffer(insQV, dtype=np.uint8) & 0xFE
        mrg = np.frombuffer(mergeQV, dtype=np.uint8) & 0xFC
        insQV, mergeQV = ins.tobytes(), mrg.tobytes()
    _encode(coding.insScheme, out, insQV)
    _encode(coding.mrgScheme, out, mergeQV)
    if coding.subChar < 0:
        _encode(coding.subScheme, out, subQV)
    else:
        _encode_run(coding.subScheme, coding.sRunScheme, out, subQV,
                    coding.subChar)
    return bytes(out)


def uncompress_entry(coding: QVcoding, f: BinaryIO,
                     rlen: int) -> tuple[bytes, bytes, bytes, bytes, bytes]:
    """Read one compressed entry -> (delQV, delTag, insQV, mergeQV, subQV)."""
    flip = coding.flip
    if coding.delChar < 0:
        delQV = _decode(coding.delScheme, f, rlen, flip)
        clen = rlen
        tags = _uncompress_tags(f.read((clen + 3) >> 2), clen)
    else:
        delQV = _decode_run(coding.delScheme, coding.dRunScheme, f, rlen,
                            coding.delChar, flip)
        dq = np.frombuffer(delQV, dtype=np.uint8)
        keep = dq != coding.delChar
        clen = int(keep.sum())
        packed = _uncompress_tags(f.read((clen + 3) >> 2), clen)
        # Unpack_Tag: non-run positions take packed tags in order, runs 'n'
        tag = np.full(rlen, ord("n"), dtype=np.uint8)
        tag[keep] = np.frombuffer(packed, dtype=np.uint8)
        tags = tag.tobytes()
    insQV = _decode(coding.insScheme, f, rlen, flip)
    mergeQV = _decode(coding.mrgScheme, f, rlen, flip)
    if coding.subChar < 0:
        subQV = _decode(coding.subScheme, f, rlen, flip)
    else:
        subQV = _decode_run(coding.subScheme, coding.sRunScheme, f, rlen,
                            coding.subChar, flip)
    return delQV, tags, insQV, mergeQV, subQV


# ---------------------------------------------------------------------------
# .quiva convenience layer
# ---------------------------------------------------------------------------


def parse_quiva(text: str) -> list[tuple[str, tuple[bytes, ...]]]:
    """Parse a .quiva file: (header, (del, tag, ins, mrg, sub)) per entry."""
    lines = text.splitlines()
    out = []
    i = 0
    while i < len(lines):
        if not lines[i].startswith("@"):
            raise ValueError(f"line {i + 1}: missing @ header")
        hdr = lines[i]
        streams = tuple(s.encode("ascii") for s in lines[i + 1:i + 6])
        if len(streams) != 5 or len(set(map(len, streams))) != 1:
            raise ValueError(f"line {i + 1}: malformed entry")
        out.append((hdr, streams))
        i += 6
    return out


def compress_quiva(entries: Sequence[tuple[str, tuple[bytes, ...]]],
                   lossy: bool = False,
                   prefix: str = "") -> tuple[QVcoding, list[bytes]]:
    """Scan + code + compress a whole .quiva's entries."""
    sc = QVScanner()
    for _, streams in entries:
        sc.scan(*streams)
    coding = create_coding(sc, lossy, prefix)
    blobs = [compress_entry(coding, *streams, lossy=lossy)
             for _, streams in entries]
    return coding, blobs
