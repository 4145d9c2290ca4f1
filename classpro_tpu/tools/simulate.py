"""Synthetic diploid genome / HiFi read / FASTK-output simulator.

Replaces the reference's test harness downloads (test/0-download.sh: MHC
assembly + HIsim reads) with a self-contained, seeded generator: it builds
a diploid genome (het SNPs + interspersed repeats), simulates HiFi-like
reads (low substitution rate + homopolymer indels), computes exact
canonical k-mer count profiles, and writes FASTK-format files
(`.hist`, `.prof`, `.pidx`/`.prof` hidden parts) that both the reference C
binary and this framework consume.  Ground-truth classes are derived the
same way as prof2class.c:241-254: per-position genome-relative count
0 -> E, 1 -> H, 2 -> D, >=3 -> R.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import numpy as np

from classpro_tpu.io.fastk import histogram_from_counts, write_histogram, write_profiles
from classpro_tpu.io.fastx import write_fasta

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
_COMP = {65: 84, 67: 71, 71: 67, 84: 65}  # A<->T, C<->G
_COMP_TABLE = np.zeros(256, dtype=np.uint8)
for k, v in _COMP.items():
    _COMP_TABLE[k] = v


def revcomp(seq: bytes) -> bytes:
    return _COMP_TABLE[np.frombuffer(seq, dtype=np.uint8)][::-1].tobytes()


@dataclasses.dataclass
class SimConfig:
    seed: int = 7
    genome_len: int = 100_000
    het_rate: float = 0.005          # heterozygous SNP rate
    n_repeat_units: int = 2          # distinct repeat families
    repeat_len: int = 1500
    repeat_copies: int = 4           # copies per family inserted
    coverage: float = 40.0           # total (both haplotypes)
    read_len_mean: int = 10_000
    read_len_sd: int = 2_000
    read_len_min: int = 3_000
    sub_rate: float = 0.002          # HiFi-like substitution rate
    hp_indel_rate: float = 0.001     # 1bp indel rate inside homopolymers
    kmer: int = 40
    # repeat-rich adversarial mode (VERDICT r4 "real-data realism"):
    # alpha-satellite-like tandem arrays (divergent ~171bp monomers)
    # and long segmental duplications with small divergence — the
    # repeat structure of real centromeric/duplicated regions that the
    # interspersed-repeat default doesn't model.  Drives long R tracts,
    # near-single-copy dup k-mers, and the biggest per-read interval
    # counts (max_m bucket pressure).
    n_satellite_arrays: int = 0      # tandem arrays to plant
    satellite_unit: int = 171        # monomer length (alphoid-like)
    satellite_copies: int = 60       # monomers per array
    satellite_divergence: float = 0.02   # per-base monomer divergence
    n_segdups: int = 0               # segmental duplications
    segdup_len: int = 10_000
    segdup_divergence: float = 0.005


def make_diploid(cfg: SimConfig, rng: np.random.Generator) -> tuple[bytes, bytes]:
    """Haplotype pair: random sequence + repeat insertions, then het SNPs."""
    g = _BASES[rng.integers(0, 4, size=cfg.genome_len)]
    # interspersed repeats -> R-class regions
    for _ in range(cfg.n_repeat_units):
        unit = _BASES[rng.integers(0, 4, size=cfg.repeat_len)]
        for _ in range(cfg.repeat_copies):
            pos = int(rng.integers(0, cfg.genome_len - cfg.repeat_len))
            g[pos : pos + cfg.repeat_len] = unit
    # tandem satellite arrays: one base monomer per array, each copy
    # independently diverged -> k-mer counts spread across the R/D/H
    # boundary inside one long tract (real centromere-like structure)
    for _ in range(cfg.n_satellite_arrays):
        mono = _BASES[rng.integers(0, 4, size=cfg.satellite_unit)]
        arr_len = cfg.satellite_unit * cfg.satellite_copies
        if arr_len >= cfg.genome_len:
            continue
        pos = int(rng.integers(0, cfg.genome_len - arr_len))
        for c in range(cfg.satellite_copies):
            m = mono.copy()
            nmut = rng.binomial(cfg.satellite_unit,
                                cfg.satellite_divergence)
            for p in rng.choice(cfg.satellite_unit, size=nmut,
                                replace=False):
                m[p] = _BASES[rng.integers(0, 4)]
            g[pos + c * cfg.satellite_unit:
              pos + (c + 1) * cfg.satellite_unit] = m
    # segmental duplications: a long source span copied elsewhere with
    # small divergence -> near-two-copy k-mers (D/R edge pressure)
    for _ in range(cfg.n_segdups):
        if cfg.segdup_len * 2 >= cfg.genome_len:
            continue
        src = int(rng.integers(0, cfg.genome_len - cfg.segdup_len))
        dup = g[src: src + cfg.segdup_len].copy()
        nmut = rng.binomial(cfg.segdup_len, cfg.segdup_divergence)
        for p in rng.choice(cfg.segdup_len, size=nmut, replace=False):
            dup[p] = _BASES[rng.integers(0, 4)]
        dst = int(rng.integers(0, cfg.genome_len - cfg.segdup_len))
        g[dst: dst + cfg.segdup_len] = dup
    hap1 = g.copy()
    hap2 = g.copy()
    n_snp = rng.binomial(cfg.genome_len, cfg.het_rate)
    snp_pos = rng.choice(cfg.genome_len, size=n_snp, replace=False)
    for p in snp_pos:
        alts = [b for b in b"ACGT" if b != hap2[p]]
        hap2[p] = alts[int(rng.integers(0, 3))]
    return hap1.tobytes(), hap2.tobytes()


def simulate_reads(
    cfg: SimConfig, rng: np.random.Generator, haps: tuple[bytes, bytes]
) -> list[tuple[str, str, str]]:
    """HiFi-like reads: (name, comment, seq) with substitutions and
    homopolymer 1-bp indels."""
    total_bases = cfg.coverage * cfg.genome_len
    reads: list[tuple[str, str, str]] = []
    acc = 0
    rid = 0
    while acc < total_bases:
        hap = int(rng.integers(0, 2))
        src = haps[hap]
        rlen = int(np.clip(rng.normal(cfg.read_len_mean, cfg.read_len_sd),
                           cfg.read_len_min, len(src)))
        start = int(rng.integers(0, len(src) - rlen + 1))
        frag = bytearray(src[start : start + rlen])
        # substitutions
        n_sub = rng.binomial(rlen, cfg.sub_rate)
        for p in rng.integers(0, rlen, size=n_sub):
            alts = [b for b in b"ACGT" if b != frag[p]]
            frag[p] = alts[int(rng.integers(0, 3))]
        # homopolymer indels
        n_ind = rng.binomial(rlen, cfg.hp_indel_rate)
        for p in sorted(rng.integers(1, rlen - 1, size=n_ind), reverse=True):
            if frag[p] == frag[p - 1]:  # inside a homopolymer
                if rng.random() < 0.5:
                    frag.insert(p, frag[p])
                else:
                    del frag[p]
        seq = bytes(frag)
        if int(rng.integers(0, 2)):
            seq = revcomp(seq)
            strand = "-"
        else:
            strand = "+"
        rid += 1
        name = f"sim/{rid}/ccs"
        comment = f"hap={hap + 1} pos={start} strand={strand}"
        reads.append((name, comment, seq.decode("ascii")))
        acc += len(seq)
    return reads


def canonical_kmer_counts(seqs: Sequence[str], k: int) -> dict[bytes, int]:
    counts: dict[bytes, int] = {}
    for s in seqs:
        b = s.encode("ascii")
        rc = revcomp(b)
        n = len(b)
        for i in range(n - k + 1):
            fwd = b[i : i + k]
            rev = rc[n - k - i : n - i]
            key = fwd if fwd <= rev else rev
            counts[key] = counts.get(key, 0) + 1
    return counts


def profile_of(seq: str, k: int, counts: dict[bytes, int], clamp: int = 32767) -> np.ndarray:
    b = seq.encode("ascii")
    rc = revcomp(b)
    n = len(b)
    out = np.zeros(n - k + 1, dtype=np.uint16)
    for i in range(n - k + 1):
        fwd = b[i : i + k]
        rev = rc[n - k - i : n - i]
        key = fwd if fwd <= rev else rev
        out[i] = min(counts.get(key, 0), clamp)
    return out


def truth_classes(seq: str, k: int, genome_counts: dict[bytes, int]) -> str:
    """Ground truth per-base class string (ref prof2class.c:241-254)."""
    b = seq.encode("ascii")
    rc = revcomp(b)
    n = len(b)
    out = ["N"] * (k - 1)
    for i in range(n - k + 1):
        fwd = b[i : i + k]
        rev = rc[n - k - i : n - i]
        key = fwd if fwd <= rev else rev
        c = genome_counts.get(key, 0)
        out.append("E" if c == 0 else "H" if c == 1 else "D" if c == 2 else "R")
    return "".join(out)


def generate_dataset(outdir: str, cfg: SimConfig, nparts: int = 1) -> dict:
    """Generate reads + FASTK outputs + truth under ``outdir/reads.*``.

    Returns a summary dict (paths + stats)."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(cfg.seed)
    haps = make_diploid(cfg, rng)
    reads = simulate_reads(cfg, rng, haps)
    seqs = [r[2] for r in reads]
    counts = canonical_kmer_counts(seqs, cfg.kmer)
    profiles = [profile_of(s, cfg.kmer, counts) for s in seqs]
    genome_counts = canonical_kmer_counts([h.decode("ascii") for h in haps], cfg.kmer)

    root = os.path.join(outdir, "reads")
    write_fasta(root + ".fasta", reads)
    write_profiles(root, profiles, cfg.kmer, nparts=nparts)
    hist = histogram_from_counts(cfg.kmer, np.fromiter(counts.values(), dtype=np.int64))
    write_histogram(root, hist)

    with open(os.path.join(outdir, "reads.truth.class"), "w") as f:
        for (name, comment, seq) in reads:
            f.write(f"@{name} {comment}\n{seq}\n+\n{truth_classes(seq, cfg.kmer, genome_counts)}\n")

    return {
        "root": root,
        "n_reads": len(reads),
        "n_bases": sum(len(s) for s in seqs),
        "n_distinct_kmers": len(counts),
        "kmer": cfg.kmer,
    }


def main() -> None:  # pragma: no cover
    import argparse

    ap = argparse.ArgumentParser(description="Generate a synthetic ClassPro dataset")
    ap.add_argument("outdir")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--genome-len", type=int, default=100_000)
    ap.add_argument("--coverage", type=float, default=40.0)
    ap.add_argument("--read-len", type=int, default=10_000)
    ap.add_argument("--kmer", type=int, default=40)
    ap.add_argument("--nparts", type=int, default=1)
    a = ap.parse_args()
    cfg = SimConfig(seed=a.seed, genome_len=a.genome_len, coverage=a.coverage,
                    read_len_mean=a.read_len, kmer=a.kmer)
    info = generate_dataset(a.outdir, cfg, nparts=a.nparts)
    print(info)


if __name__ == "__main__":  # pragma: no cover
    main()
