"""DAZZ_DB format I/O roundtrips (ref DB.h/DB.c formats).

Byte-level interop is verified against the reference binary during
development (reference ClassPro/ShowSeeds/RepDepAnno consume write_dam
output and produce byte-identical results — see io/dazz.py docstring);
these tests keep the self-contained invariants green.
"""
import gzip
import pathlib

import numpy as np

FIX = pathlib.Path(__file__).parent / "fixtures"


def test_dam_roundtrip(tmp_path):
    from classpro_tpu.io.dazz import DazzDB, write_dam
    from classpro_tpu.io.fastx import read_fastx

    recs = [(f"{r.name} {r.comment}".strip(), r.seq)
            for r in read_fastx(str(FIX / "tiny" / "reads.fasta.gz"))][:20]
    root = str(tmp_path / "reads")
    n = write_dam(root, recs)
    assert n == 20

    db = DazzDB(root + ".dam")
    assert db.nreads == 20
    assert db.maxlen == max(len(s) for _, s in recs)
    for i in (0, 7, 19):
        assert db.load_read(i) == recs[i][1].upper()
        assert db.header(i) == "@" + recs[i][0]
    db.close()


def test_track_roundtrip(tmp_path):
    from classpro_tpu.io.dazz import (IntPairTrackWriter, TrackWriter,
                                      compress_codes, read_track)

    root = str(tmp_path / "reads")
    tw = TrackWriter(root, "class", 3, 8)
    payloads = [np.array([0, 1, 2, 3, 2, 1], np.uint8),
                np.array([3, 3, 3], np.uint8),
                np.array([], np.uint8)]
    for p in payloads:
        tw.add(compress_codes(p))
    tw.close()
    size, offs, data = read_track(root, "class")
    assert size == 8
    assert offs[0] == 0 and len(offs) == 4
    first = data[offs[0]: offs[1]]
    assert first == compress_codes(payloads[0])

    rw = IntPairTrackWriter(root, "rep", 2)
    rw.add([(5, 9), (20, 30)])
    rw.add([])
    rw.close()
    size, offs, data = read_track(root, "rep")
    assert size == 0
    assert list(offs) == [0, 16, 16]
    assert np.frombuffer(data, "<i4").tolist() == [5, 9, 20, 30]


def test_db_roundtrip(tmp_path):
    """.db mode: PacBio-style headers round-trip through origin/fpulse
    (write_db + DazzDB; ref DB.c Open_DB/Load_Read, ClassPro.c:165-177)."""
    from classpro_tpu.io.dazz import DazzDB, write_db

    recs = [("movieX/17/100_160", "ACGTACGT" * 20),
            ("movieX/18/0_52", "TTGGCCAA" * 13),
            ("plain_header", "ACCA" * 10)]
    recs = [(h, s[: {0: 60, 1: 52, 2: 40}[i]])
            for i, (h, s) in enumerate(recs)]
    root = str(tmp_path / "reads")
    assert write_db(root, recs) == 3
    db = DazzDB(root + ".db")
    assert not db.is_dam and db.nreads == 3
    for i, (h, s) in enumerate(recs):
        assert db.load_read(i) == s
    assert db.header(0) == "@movieX/17/100_160"
    assert db.header(1) == "@movieX/18/0_52"
    db.close()


def test_multiblock_write_and_block_open(tmp_path):
    """write_dam(nblocks=3, cutoff=...) emits a DBsplit-style block
    table; block-addressed opens (root.N) see exactly their partition;
    trim() applies Trim_DB's cutoff predicate (DB.c:908-1043)."""
    from classpro_tpu.io.dazz import DazzDB, write_dam

    recs = [(f"ctg{i}", "ACGT" * (30 + 17 * i)) for i in range(11)]
    root = str(tmp_path / "m")
    write_dam(root, recs, nblocks=3, cutoff=300)

    full = DazzDB(root + ".dam")
    assert full.nreads == 11 and full.nblocks == 3 and full.cutoff == 300
    total = 0
    seen = []
    for b in (1, 2, 3):
        blk = DazzDB(f"{root}.{b}")
        assert blk.part == b
        for i in range(blk.nreads):
            seen.append(blk.load_read(i))
        total += blk.nreads
        blk.trim()
        # trim keeps only reads >= cutoff within the block
        assert all(r.rlen >= 300 for r in blk.reads)
        blk.close()
    assert total == 11
    assert seen == [seq for _, seq in recs]
    full.trim()
    assert full.nreads == sum(1 for _, s in recs if len(s) >= 300)
    assert full.totlen == sum(len(s) for _, s in recs if len(s) >= 300)
    full.close()


def test_multiblock_reference_interop(tmp_path):
    """The reference DB.c opens a block of a multi-block DB we wrote and
    agrees on the partition + Trim_DB results (C harness compiled from
    the reference sources; skipped when they are unavailable)."""
    import os
    import subprocess

    import pytest

    refsrc = "/tmp/refbuild"
    if not os.path.exists(os.path.join(refsrc, "DB.c")):
        pytest.skip("reference sources not staged")
    from classpro_tpu.io.dazz import DazzDB, write_dam

    recs = [(f"ctg{i}", "ACGT" * (30 + 17 * i)) for i in range(11)]
    root = str(tmp_path / "m")
    write_dam(root, recs, nblocks=3, cutoff=300)

    harness = tmp_path / "blkchk.c"
    harness.write_text(r'''
#include <stdio.h>
#include "DB.h"
int main(int argc, char** argv)
{ DAZZ_DB db;
  if (Open_DB(argv[1],&db) < 0) return 1;
  printf("part=%d nreads=%d ufirst=%d\n",db.part,db.nreads,db.ufirst);
  Trim_DB(&db);
  printf("trimmed nreads=%d totlen=%lld maxlen=%d\n",
         db.nreads,db.totlen,db.maxlen);
  for (int i = 0; i < db.nreads; i++)
    printf("rlen[%d]=%d\n",i,db.reads[i].rlen);
  return 0;
}
''')
    exe = tmp_path / "blkchk"
    subprocess.run(["gcc", "-O0", "-w", "-I", refsrc, "-o", str(exe),
                    str(harness), os.path.join(refsrc, "DB.c"),
                    os.path.join(refsrc, "QV.c"),
                    os.path.join(refsrc, "gene_core.c"), "-lm", "-lz"],
                   check=True, capture_output=True)
    for b in (1, 2, 3):
        r = subprocess.run([str(exe), f"{root}.{b}"], check=True,
                           capture_output=True, text=True)
        lines = r.stdout.strip().split("\n")
        ours = DazzDB(f"{root}.{b}")
        assert lines[0] == (f"part={b} nreads={ours.nreads} "
                            f"ufirst={ours.ufirst}")
        ours.trim()
        assert lines[1] == (f"trimmed nreads={ours.nreads} "
                            f"totlen={ours.totlen} maxlen={ours.maxlen}")
        assert lines[2:] == [f"rlen[{i}]={r.rlen}"
                             for i, r in enumerate(ours.reads)]
        ours.close()
