"""QV codec (ref QV.c): roundtrip + byte-identity vs the reference C.

The harness compiles the *reference* QV.c and drives QVcoding_Scan1 /
Create_QVcoding / Write_QVcoding / Compress_Next_QVentry1 on the same
synthetic entries; our compressor must produce the identical byte
stream, and each side must decode the other's output.
"""
import os
import pathlib
import random
import subprocess

import pytest

FIX = pathlib.Path(__file__).parent / "fixtures"

_HARNESS = r'''
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "QV.h"
char *Prog_Name = "qvchk";

static char *slurp_line(FILE *f, int rlen)
{ char *buf = malloc(rlen+8);
  if (fread(buf,1,rlen,f) != (size_t) rlen) exit(3);
  fgetc(f); /* newline */
  buf[rlen] = 0;
  return buf;
}

int main(int argc, char **argv)
{ /* argv[1]=entries file, argv[2]=out file, argv[3]=lossy,
     mode argv[4]: c=compress(ours? no: reference), d=decode argv[5] */
  FILE *in = fopen(argv[1],"r");
  int nent, lossy = atoi(argv[3]);
  if (fscanf(in,"%d\n",&nent) != 1) exit(2);
  int  *rlens = malloc(nent*sizeof(int));
  char **D = malloc(nent*sizeof(char*)), **T = malloc(nent*sizeof(char*));
  char **I = malloc(nent*sizeof(char*)), **M = malloc(nent*sizeof(char*));
  char **S = malloc(nent*sizeof(char*));
  for (int i = 0; i < nent; i++)
    { if (fscanf(in,"%d\n",rlens+i) != 1) exit(2);
      D[i] = slurp_line(in,rlens[i]); T[i] = slurp_line(in,rlens[i]);
      I[i] = slurp_line(in,rlens[i]); M[i] = slurp_line(in,rlens[i]);
      S[i] = slurp_line(in,rlens[i]);
    }
  fclose(in);

  if (argv[4][0] == 'c')
    { QVcoding_Scan1(0,NULL,NULL,NULL,NULL,NULL);
      for (int i = 0; i < nent; i++)
        QVcoding_Scan1(rlens[i],D[i],T[i],I[i],M[i],S[i]);
      QVcoding *c = Create_QVcoding(lossy);
      c->prefix = "@testmovie";
      FILE *out = fopen(argv[2],"wb");
      Write_QVcoding(out,c);
      for (int i = 0; i < nent; i++)
        { char *d = strdup(D[i]), *t = strdup(T[i]);
          char *x = strdup(I[i]), *m = strdup(M[i]), *s = strdup(S[i]);
          Compress_Next_QVentry1(rlens[i],d,t,x,m,s,out,c,lossy);
        }
      fclose(out);
      printf("delChar=%d subChar=%d\n",c->delChar,c->subChar);
    }
  else
    { FILE *cf = fopen(argv[5],"rb");
      QVcoding *c = Read_QVcoding(cf);
      if (c == NULL) exit(4);
      printf("delChar=%d subChar=%d prefix=%s\n",
             c->delChar,c->subChar,c->prefix);
      char *ent[5];
      for (int i = 0; i < nent; i++)
        { for (int j = 0; j < 5; j++)
            { ent[j] = malloc(rlens[i]+8);
              memset(ent[j],0,rlens[i]+8); }
          if (Uncompress_Next_QVentry(cf,ent,c,rlens[i])) exit(5);
          for (int j = 0; j < 5; j++)
            { fwrite(ent[j],1,rlens[i],stdout); putchar('\n'); }
        }
      fclose(cf);
    }
  return 0;
}
'''


def _gen_entries(n, minlen, maxlen, seed, with_del=True, sub_dominant=None):
    """Synthetic quiva streams: QV chars in '!'..'~'."""
    rng = random.Random(seed)
    qv = [chr(c) for c in range(33, 110)]
    entries = []
    for _ in range(n):
        rlen = rng.randint(minlen, maxlen)
        d, t, i_, m, s = [], [], [], [], []
        for _k in range(rlen):
            if with_del and rng.random() < 0.55:
                d.append("o")          # the run char
                t.append("n")
            else:
                d.append(rng.choice(qv))
                t.append(rng.choice("acgt"))
            i_.append(rng.choice(qv[:40]))
            m.append(rng.choice(qv[:20]))
            if sub_dominant and rng.random() < 0.75:
                s.append(sub_dominant)
            else:
                s.append(rng.choice(qv))
        entries.append(("@testmovie/0/0_%d RQ=0.850" % rlen,
                        tuple("".join(x).encode() for x in
                              (d, t, i_, m, s))))
    return entries


def _write_entry_file(path, entries):
    with open(path, "wb") as f:
        f.write(b"%d\n" % len(entries))
        for _, streams in entries:
            f.write(b"%d\n" % len(streams[0]))
            for s in streams:
                f.write(s + b"\n")


def _compile(tmp_path):
    refsrc = "/tmp/refbuild"
    if not os.path.exists(os.path.join(refsrc, "QV.c")):
        pytest.skip("reference sources not staged")
    src = tmp_path / "qvchk.c"
    src.write_text(_HARNESS)
    exe = tmp_path / "qvchk"
    subprocess.run(["gcc", "-O0", "-w", "-I", refsrc, "-o", str(exe),
                    str(src), os.path.join(refsrc, "QV.c"),
                    os.path.join(refsrc, "gene_core.c"), "-lm"],
                   check=True, capture_output=True)
    return exe


def _roundtrip_ours(entries, lossy=False):
    import io

    from classpro_tpu.io.qv import (compress_quiva, read_coding,
                                    uncompress_entry, write_coding)

    coding, blobs = compress_quiva(entries, lossy=lossy,
                                   prefix="@testmovie")
    buf = io.BytesIO()
    write_coding(buf, coding)
    for b in blobs:
        buf.write(b)
    data = buf.getvalue()
    # decode our own stream back
    buf.seek(0)
    c2 = read_coding(buf)
    out = [uncompress_entry(c2, buf, len(e[1][0])) for e in entries]
    assert buf.read() == b""  # consumed exactly
    return coding, data, out


def _expect_streams(entries, lossy):
    import numpy as np
    exp = []
    for _, (d, t, i_, m, s) in entries:
        if lossy:
            i_ = (np.frombuffer(i_, np.uint8) & 0xFE).tobytes()
            m = (np.frombuffer(m, np.uint8) & 0xFC).tobytes()
        exp.append((d, t, i_, m, s))
    return exp


@pytest.mark.parametrize("case", ["small", "big_runs", "no_del", "lossy"])
def test_qv_reference_byte_identity(tmp_path, case):
    exe = _compile(tmp_path)
    lossy = case == "lossy"
    if case == "small":
        entries = _gen_entries(12, 80, 300, seed=1)
    elif case == "no_del":
        entries = _gen_entries(12, 80, 300, seed=2, with_del=False)
    else:  # big enough to elect subChar (totChar >= 200k, >50% dominant)
        entries = _gen_entries(90, 2500, 3200, seed=3, sub_dominant="5")

    ef = tmp_path / "entries.txt"
    _write_entry_file(ef, entries)
    ref_out = tmp_path / "ref.qvs"
    r = subprocess.run([str(exe), str(ef), str(ref_out), str(int(lossy)),
                        "c"], check=True, capture_output=True, text=True)

    coding, ours, decoded = _roundtrip_ours(entries, lossy=lossy)
    assert r.stdout.strip() == (
        f"delChar={coding.delChar} subChar={coding.subChar}")
    assert ref_out.read_bytes() == ours  # byte-identical compression

    # our decoder reproduces the original streams (tags: non-acgt
    # degrade to 'a' through the 2-bit pack, and run positions to 'n',
    # exactly as the reference does)
    exp = _expect_streams(entries, lossy)
    for (d, t, i_, m, s), got in zip(exp, decoded):
        assert got[0] == d and got[2] == i_ and got[3] == m and got[4] == s
        if coding.delChar >= 0:
            import numpy as np
            keep = np.frombuffer(d, np.uint8) != coding.delChar
            tt = np.frombuffer(t, np.uint8).copy()
            tt[~keep] = ord("n")
            assert got[1] == tt.tobytes()
        else:
            assert got[1] == t

    # the reference decodes our (identical) bytes back to the streams
    ours_file = tmp_path / "ours.qvs"
    ours_file.write_bytes(ours)
    r = subprocess.run([str(exe), str(ef), "-", str(int(lossy)), "d",
                        str(ours_file)], check=True, capture_output=True)
    lines = r.stdout.split(b"\n")
    assert lines[0] == (f"delChar={coding.delChar} "
                        f"subChar={coding.subChar} "
                        f"prefix=@testmovie").encode()
    pos = 1
    for (d, t, i_, m, s), got in zip(exp, decoded):
        ref_streams = lines[pos:pos + 5]
        assert ref_streams == [got[0], got[1], got[2], got[3], got[4]]
        pos += 5


def test_qv_flip_decode():
    """A big-endian-written coding file decodes via the flip path."""
    import io
    import struct

    import numpy as np

    from classpro_tpu.io.qv import (HScheme, QVcoding, read_coding,
                                    write_coding)

    # build a tiny coding, then byte-swap the multi-byte header fields
    lens = np.zeros(256, np.int32)
    bits = np.zeros(256, np.uint32)
    lens[65], bits[65] = 1, 0
    lens[66], bits[66] = 1, 1
    sch = HScheme(0, bits, lens)
    c = QVcoding(sch, sch, sch, sch, None, None, -1, -1, "@p")
    buf = io.BytesIO()
    write_coding(buf, c)  # sanity: LE writer runs
    # serialize the same coding by hand in big-endian
    out = bytearray()
    out += struct.pack(">H", 0x33CC) + struct.pack(">H", 256)
    out += struct.pack(">H", 256) + struct.pack(">i", 2) + b"@p"
    for _ in range(4):
        out.append(0)
        for i in range(256):
            out.append(int(lens[i]))
            if lens[i] > 0:
                out += struct.pack(">I", int(bits[i]))
    c2 = read_coding(io.BytesIO(bytes(out)))
    assert c2.flip and c2.delChar == -1 and c2.prefix == "@p"
    assert np.array_equal(c2.delScheme.codebits, bits)
