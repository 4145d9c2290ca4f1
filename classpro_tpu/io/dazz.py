"""DAZZ_DB database and track I/O (ref DB.h/DB.c formats).

Reads and writes the on-disk representation directly (no vendored C):

* stub text file ``<root>.dam``/``.db`` — DB_NFILE/DB_FDATA/DB_NBLOCK/
  DB_PARAMS/DB_BDATA lines (DB.h:436-443);
* hidden ``.<root>.idx`` — a raw dump of the in-memory DAZZ_DB struct
  (112 bytes on LP64, offsets verified against the reference compiler)
  followed by DAZZ_READ records ({origin, rlen, fpulse, boff, coff,
  flags}, 40 bytes each, DB.h:287-297);
* hidden ``.<root>.bps`` — 2-bit packed bases, 4 per byte, first base
  in the top bits (Compress_Read, DB.c);
* ``.<root>.hdr`` (.dam only) — scaffold header lines addressed by
  DAZZ_READ.coff (ClassPro.c:173-177);
* tracks ``.<root>.<name>.anno``/``.data`` — anno = {nreads int32,
  size int32, int64 offsets...}, data = payload (io.c:299-313,
  DB.h:299-318).

``write_dam`` produces a database equivalent to fasta2DAM+DBsplit for
N-free reads (each record one contig), which the reference binary opens
directly — the interop test drives ClassPro -P on our output.
"""

from __future__ import annotations

import dataclasses
import os
import struct

import numpy as np

_DB_STRUCT = struct.Struct("<4i4fiq5i4xq8sqqq")   # 112-byte DAZZ_DB image
_READ_STRUCT = struct.Struct("<3i4x2qi4x")        # 40-byte DAZZ_READ

_BASE = np.frombuffer(b"ACGT", np.uint8)
_CODE = np.full(256, 0, np.uint8)
for _i, _c in enumerate(b"acgt"):
    _CODE[_c] = _i
for _i, _c in enumerate(b"ACGT"):
    _CODE[_c] = _i


@dataclasses.dataclass
class DazzRead:
    origin: int
    rlen: int
    fpulse: int
    boff: int
    coff: int
    flags: int


class DazzDB:
    """Read access to a .db/.dam (Open_DB + Load_Read equivalents)."""

    def __init__(self, path: str):
        if path.endswith(".dam"):
            self.is_dam = True
            root = path[:-4]
        elif path.endswith(".db"):
            self.is_dam = False
            root = path[:-3]
        else:
            for ext, dam in ((".dam", True), (".db", False)):
                if os.path.exists(path + ext):
                    self.is_dam = dam
                    root = path
                    break
            else:
                raise FileNotFoundError(f"{path}(.db|.dam)")
        self.root = root
        pwd, base = os.path.split(root)
        stub = root + (".dam" if self.is_dam else ".db")

        with open(stub) as f:
            nfiles = int(f.readline().split("=")[1])
            self.files = []
            for _ in range(nfiles):
                last, fname, prolog = f.readline().split()
                self.files.append((int(last), fname, prolog))

        hidden = os.path.join(pwd, "." + base)
        with open(hidden + ".idx", "rb") as f:
            hdr = f.read(112)
            (self.ureads, self.treads, self.cutoff, self.allarr) = \
                struct.unpack_from("<4i", hdr, 0)
            self.freq = struct.unpack_from("<4f", hdr, 16)
            self.maxlen, = struct.unpack_from("<i", hdr, 32)
            self.totlen, = struct.unpack_from("<q", hdr, 40)
            self.reads: list[DazzRead] = []
            raw = f.read(_READ_STRUCT.size * self.ureads)
            for i in range(self.ureads):
                o, rl, fp, boff, coff, fl = _READ_STRUCT.unpack_from(
                    raw, i * _READ_STRUCT.size)
                self.reads.append(DazzRead(o, rl, fp, boff, coff, fl))
        self.nreads = self.ureads
        self._bps = open(hidden + ".bps", "rb")
        self._hdr = open(hidden + ".hdr", "rb") if (
            self.is_dam and os.path.exists(hidden + ".hdr")) else None

    def load_read(self, i: int) -> str:
        """Sequence of read i as uppercase ACGT (Load_Read(...,2) —
        ascii mode 2 is upper case, DB.h:542-543)."""
        r = self.reads[i]
        nbytes = (r.rlen + 3) // 4
        self._bps.seek(r.boff)
        packed = np.frombuffer(self._bps.read(nbytes), np.uint8)
        codes = np.empty(nbytes * 4, np.uint8)
        codes[0::4] = (packed >> 6) & 3
        codes[1::4] = (packed >> 4) & 3
        codes[2::4] = (packed >> 2) & 3
        codes[3::4] = packed & 3
        return _BASE[codes[: r.rlen]].tobytes().decode("ascii")

    def header(self, i: int) -> str:
        """Read header line, '@'-prefixed (ClassPro.c:165-177)."""
        r = self.reads[i]
        if self._hdr is not None:
            self._hdr.seek(r.coff)
            line = self._hdr.readline().decode().rstrip("\n")
            return "@" + line[1:]
        m = 0
        while i >= self.files[m][0]:
            m += 1
        return (f"@{self.files[m][2]}/{r.origin}/"
                f"{r.fpulse}_{r.fpulse + r.rlen}")

    def close(self):
        self._bps.close()
        if self._hdr:
            self._hdr.close()


def compress_read(seq: str) -> bytes:
    """2-bit pack (Compress_Read, DB.c): 4 bases/byte, first base in the
    top bits; also used for COMPRESSED_LEN-sized track payloads."""
    s = _CODE[np.frombuffer(seq.encode("ascii"), np.uint8)]
    pad = (-len(s)) % 4
    if pad:
        s = np.concatenate([s, np.zeros(pad, np.uint8)])
    return ((s[0::4] << 6) | (s[1::4] << 4) | (s[2::4] << 2)
            | s[3::4]).tobytes()


def compress_codes(codes: np.ndarray) -> bytes:
    """2-bit pack an array of 0..3 codes (track payloads)."""
    s = np.asarray(codes, np.uint8)
    pad = (-len(s)) % 4
    if pad:
        s = np.concatenate([s, np.zeros(pad, np.uint8)])
    return ((s[0::4] << 6) | (s[1::4] << 4) | (s[2::4] << 2)
            | s[3::4]).tobytes()


def write_dam(root: str, records) -> int:
    """Create <root>.dam (+ hidden .idx/.bps/.hdr) from (header, seq)
    pairs — fasta2DAM-equivalent for N-free sequences, one contig per
    record.  Returns the number of reads."""
    pwd, base = os.path.split(root)
    hidden = os.path.join(pwd, "." + base) if pwd else "." + base
    reads = []
    totlen = 0
    maxlen = 0
    boff = 0
    with open(hidden + ".bps", "wb") as bps, \
            open(hidden + ".hdr", "w") as hdr:
        coff = 0
        for origin, (name, seq) in enumerate(records):
            line = ">" + name + "\n"
            hdr.write(line)
            rl = len(seq)
            reads.append(DazzRead(origin, rl, 0, boff, coff, 0))
            payload = compress_read(seq)
            bps.write(payload)
            boff += len(payload)
            coff += len(line)
            totlen += rl
            maxlen = max(maxlen, rl)
    n = len(reads)
    with open(hidden + ".idx", "wb") as idx:
        hdr112 = bytearray(112)
        # allarr = DB_ALL so Trim_DB keeps every read (DB.c:918)
        struct.pack_into("<4i", hdr112, 0, n, n, -1, 1)
        struct.pack_into("<4f", hdr112, 16, .25, .25, .25, .25)
        struct.pack_into("<i", hdr112, 32, maxlen)
        struct.pack_into("<q", hdr112, 40, totlen)
        struct.pack_into("<5i", hdr112, 48, n, 0, 0, 0, 0)
        idx.write(hdr112)
        for r in reads:
            idx.write(_READ_STRUCT.pack(r.origin, r.rlen, r.fpulse,
                                        r.boff, r.coff, r.flags))
    with open(root + ".dam", "w") as f:
        f.write(f"files = {1:9d}\n")
        f.write(f"  {n:9d} {base} {base}\n")
        f.write(f"blocks = {1:9d}\n")
        f.write(f"size = {200:11d} cutoff = {0:9d} all = {1:1d}\n")
        f.write(f" {0:9d} {0:9d}\n")
        f.write(f" {n:9d} {n:9d}\n")
    return n


def write_db(root: str, records) -> int:
    """Create <root>.db (+ hidden .idx/.bps) from (header, seq) pairs —
    fasta2DB-equivalent for N-free reads.  Headers of the PacBio form
    'movie/well/beg_end' populate origin/fpulse so DazzDB.header (and
    the reference's db-mode header reconstruction, ClassPro.c:165-177)
    reproduces them; other headers get origin = read index."""
    import re

    pwd, base = os.path.split(root)
    hidden = os.path.join(pwd, "." + base) if pwd else "." + base
    reads = []
    totlen = 0
    maxlen = 0
    boff = 0
    prolog = base
    pat = re.compile(r"^(\S+)/(\d+)/(\d+)_(\d+)$")
    with open(hidden + ".bps", "wb") as bps:
        for i, (name, seq) in enumerate(records):
            m = pat.match(name.split()[0]) if name else None
            rl = len(seq)
            if m:
                prolog = m.group(1)
                origin, fpulse = int(m.group(2)), int(m.group(3))
            else:
                origin, fpulse = i, 0
            reads.append(DazzRead(origin, rl, fpulse, boff, 0, 0))
            payload = compress_read(seq)
            bps.write(payload)
            boff += len(payload)
            totlen += rl
            maxlen = max(maxlen, rl)
    n = len(reads)
    with open(hidden + ".idx", "wb") as idx:
        hdr112 = bytearray(112)
        struct.pack_into("<4i", hdr112, 0, n, n, -1, 1)
        struct.pack_into("<4f", hdr112, 16, .25, .25, .25, .25)
        struct.pack_into("<i", hdr112, 32, maxlen)
        struct.pack_into("<q", hdr112, 40, totlen)
        struct.pack_into("<5i", hdr112, 48, n, 0, 0, 0, 0)
        idx.write(hdr112)
        for r in reads:
            idx.write(_READ_STRUCT.pack(r.origin, r.rlen, r.fpulse,
                                        r.boff, r.coff, r.flags))
    with open(root + ".db", "w") as f:
        f.write(f"files = {1:9d}\n")
        f.write(f"  {n:9d} {base} {prolog}\n")
        f.write(f"blocks = {1:9d}\n")
        f.write(f"size = {200:11d} cutoff = {0:9d} all = {1:1d}\n")
        f.write(f" {0:9d} {0:9d}\n")
        f.write(f" {n:9d} {n:9d}\n")
    return n


class TrackWriter:
    """.anno/.data track writer (header layout per io.c:299-313)."""

    def __init__(self, root: str, name: str, nreads: int, size: int):
        pwd, base = os.path.split(root)
        hidden = os.path.join(pwd, "." + base) if pwd else "." + base
        self.afile = open(f"{hidden}.{name}.anno", "wb")
        self.dfile = open(f"{hidden}.{name}.data", "wb")
        self.afile.write(struct.pack("<iiq", nreads, size, 0))
        self.idx = 0

    def add(self, payload: bytes):
        self.dfile.write(payload)
        self.idx += len(payload)
        self.afile.write(struct.pack("<q", self.idx))

    def close(self):
        self.afile.close()
        self.dfile.close()


class IntPairTrackWriter:
    """Interval mask track (.rep style: size=0 header, int32 pairs,
    one int64 offset per read — io.c:308-313, seed.c:534-573)."""

    def __init__(self, root: str, name: str, nreads: int):
        pwd, base = os.path.split(root)
        hidden = os.path.join(pwd, "." + base) if pwd else "." + base
        self.afile = open(f"{hidden}.{name}.anno", "wb")
        self.dfile = open(f"{hidden}.{name}.data", "wb")
        self.afile.write(struct.pack("<iiq", nreads, 0, 0))
        self.idx = 0

    def add(self, intervals):
        for b, e in intervals:
            self.dfile.write(struct.pack("<ii", b, e))
            self.idx += 8
        self.afile.write(struct.pack("<q", self.idx))

    def close(self):
        self.afile.close()
        self.dfile.close()


def read_track(root: str, name: str):
    """Load a track -> (size, offsets int64 array, data bytes).

    offsets[0] is the header's initial 0; read i's payload is
    data[offsets[i]:offsets[i+1]] (io.c:299-307 write order)."""
    pwd, base = os.path.split(root)
    hidden = os.path.join(pwd, "." + base) if pwd else "." + base
    with open(f"{hidden}.{name}.anno", "rb") as f:
        nreads, size = struct.unpack("<ii", f.read(8))
        offs = np.frombuffer(f.read(), "<i8")
    with open(f"{hidden}.{name}.data", "rb") as f:
        data = f.read()
    return size, offs, data
