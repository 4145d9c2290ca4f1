"""FASTK .ktab codec: roundtrip, lookup semantics, reference interop.

The interop test compiles a C harness against the *reference* libfastk.c
(Load_Kmer_Table / Fetch_Kmer / Find_Kmer / Open_Kmer_Stream /
GoTo_Kmer_String) and checks it reads our written tables entry-for-entry.
"""
import os
import pathlib
import random
import subprocess

import numpy as np
import pytest

FIX = pathlib.Path(__file__).parent / "fixtures"


def _random_reads(n, lo, hi, seed):
    rng = random.Random(seed)
    return ["".join(rng.choice("acgt") for _ in range(rng.randint(lo, hi)))
            for _ in range(n)]


def _dict_spectrum(seqs, k):
    from classpro_tpu.io.ktab import canonical_pack, kmer_strings

    cnt = {}
    for s in seqs:
        for i in range(len(s) - k + 1):
            w = s[i:i + k]
            c = kmer_strings(canonical_pack([w], k), k)[0]
            cnt[c] = cnt.get(c, 0) + 1
    return cnt


def test_canonicalization_and_count():
    from classpro_tpu.io.ktab import count_kmers, kmer_strings

    k = 7
    reads = _random_reads(30, 20, 60, seed=11)
    packed, counts = count_kmers(reads, k)
    got = dict(zip(kmer_strings(packed, k), (int(c) for c in counts)))
    assert got == _dict_spectrum(reads, k)
    # canonical: every stored k-mer is <= its reverse complement
    comp = str.maketrans("acgt", "tgca")
    for s in got:
        assert s <= s.translate(comp)[::-1]


@pytest.mark.parametrize("k,nparts", [(7, 1), (13, 3), (16, 2), (21, 3)])
def test_roundtrip_find_stream(tmp_path, k, nparts):
    from classpro_tpu.io.ktab import (KmerStream, KmerTable, count_kmers,
                                      kmer_strings, write_ktab)

    reads = _random_reads(40, 30, 80, seed=k)
    packed, counts = count_kmers(reads, k)
    root = str(tmp_path / "t")
    write_ktab(root, packed, counts, k, nparts=nparts)

    T = KmerTable(root)
    assert T.kmer == k and T.nels == packed.shape[0]
    names = kmer_strings(packed, k)
    for i in (0, T.nels // 2, T.nels - 1):
        assert T.fetch_kmer(i) == names[i]
        assert T.fetch_count(i) == int(counts[i])
    # find: every present k-mer at its index; absent and revcomp queries
    idx = T.find(names)
    assert np.array_equal(idx, np.arange(T.nels))
    comp = str.maketrans("acgt", "tgca")
    rc_idx = T.find([s.translate(comp)[::-1] for s in names[:10]])
    assert np.array_equal(rc_idx, np.arange(10))
    absent = "a" * k
    if absent not in names:
        assert T.find(absent) == -1
    assert np.array_equal(T.counts_of(names[:5]), counts[:5])

    S = KmerStream(root)
    seen = list(S)
    assert seen == list(zip(names, (int(c) for c in counts)))
    S2 = S.clone()
    assert S2.cidx == 0 and S.done
    mid = T.nels // 2
    S2.goto_index(mid)
    assert S2.current_kmer() == names[mid]
    assert S2.goto_kmer(names[mid]) and S2.cidx == mid
    assert np.array_equal(S2.current_entry(),
                          np.asarray(packed[mid]))


def test_cutoff_filter(tmp_path):
    from classpro_tpu.io.ktab import KmerTable, count_kmers, write_ktab

    k = 9
    reads = _random_reads(60, 40, 90, seed=3) * 2  # force multiplicity
    packed, counts = count_kmers(reads, k)
    root = str(tmp_path / "t")
    write_ktab(root, packed, counts, k, nparts=2)

    cut = int(np.median(counts)) + 1
    T = KmerTable(root, cut_off=cut)
    keep = counts >= cut
    assert T.nels == int(keep.sum()) and T.minval == cut
    from classpro_tpu.io.ktab import kmer_strings
    names = [s for s, kp in zip(kmer_strings(packed, k), keep) if kp]
    assert np.array_equal(T.find(names), np.arange(T.nels))
    dropped = [s for s, kp in zip(kmer_strings(packed, k), keep) if not kp]
    if dropped:
        assert T.find(dropped[0]) == -1


def test_reference_interop(tmp_path):
    """Reference libfastk.c reads our .ktab: full dump + point lookups."""
    refsrc = "/tmp/refbuild"
    if not os.path.exists(os.path.join(refsrc, "libfastk.c")):
        pytest.skip("reference sources not staged")
    from classpro_tpu.io.ktab import (KmerStream, KmerTable, count_kmers,
                                      kmer_strings, write_ktab)

    k = 15
    reads = _random_reads(50, 40, 100, seed=99)
    packed, counts = count_kmers(reads, k)
    root = str(tmp_path / "it")
    write_ktab(root, packed, counts, k, nparts=3)

    harness = tmp_path / "ktchk.c"
    harness.write_text(r'''
#include <stdio.h>
#include <string.h>
#include "libfastk.h"
char *Prog_Name = "ktchk";
int main(int argc, char** argv)
{ Kmer_Table *T = Load_Kmer_Table(argv[1], atoi(argv[2]));
  if (T == NULL) return 1;
  printf("kmer=%d minval=%d nels=%lld\n",T->kmer,T->minval,T->nels);
  char buf[1024];
  for (int64 i = 0; i < T->nels; i++)
    printf("%s %d\n",Fetch_Kmer(T,i,buf),Fetch_Count(T,i));
  for (int a = 3; a < argc; a++)
    printf("find %s = %lld\n",argv[a],Find_Kmer(T,argv[a]));
  Kmer_Stream *S = Open_Kmer_Stream(argv[1]);
  int64 n = 0;
  for (First_Kmer_Entry(S); S->csuf != NULL; Next_Kmer_Entry(S))
    n += Current_Count(S);
  printf("stream total=%lld\n",n);
  if (argc > 3)
    { int g = GoTo_Kmer_String(S,argv[3]);
      printf("goto %s = %d @ %lld\n",argv[3],g,S->cidx);
    }
  return 0;
}
''')
    exe = tmp_path / "ktchk"
    subprocess.run(["gcc", "-O0", "-w", "-I", refsrc, "-o", str(exe),
                    str(harness), os.path.join(refsrc, "libfastk.c"),
                    "-lm", "-lz", "-lpthread"],
                   check=True, capture_output=True)

    names = kmer_strings(packed, k)
    comp = str.maketrans("acgt", "tgca")
    queries = [names[0], names[len(names) // 2].translate(comp)[::-1],
               "a" * k]
    r = subprocess.run([str(exe), root, "0"] + queries, check=True,
                       capture_output=True, text=True)
    lines = r.stdout.strip().split("\n")

    T = KmerTable(root)
    assert lines[0] == f"kmer={k} minval={T.minval} nels={T.nels}"
    assert lines[1:1 + T.nels] == [f"{s} {int(c)}"
                                   for s, c in zip(names, counts)]
    tail = lines[1 + T.nels:]
    for q, line in zip(queries, tail[:3]):
        assert line == f"find {q} = {T.find(q)}"
    assert tail[3] == f"stream total={int(counts.sum())}"
    S = KmerStream(root)
    ok = S.goto_kmer(queries[0])
    assert tail[4] == f"goto {queries[0]} = {int(ok)} @ {S.cidx}"

    # cut_off load path (reference re-streams and filters)
    cut = int(np.median(counts)) + 1
    r = subprocess.run([str(exe), root, str(cut)], check=True,
                       capture_output=True, text=True)
    lines = r.stdout.strip().split("\n")
    Tc = KmerTable(root, cut_off=cut)
    assert lines[0] == f"kmer={k} minval={cut} nels={Tc.nels}"
    got = [f"{Tc.fetch_kmer(i)} {Tc.fetch_count(i)}"
           for i in range(Tc.nels)]
    assert lines[1:1 + Tc.nels] == got
