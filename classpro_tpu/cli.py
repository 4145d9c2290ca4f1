"""Command-line interface.

Subcommands mirror the reference tool family:

* ``classify``   — ClassPro equivalent (ClassPro.c): E/H/D/R per k-mer
* ``classgs``    — global-threshold classifier (ClassGS.c)
* ``prof2class`` — ground truth from a relative profile (prof2class.c)
* ``class2acc``  — accuracy evaluation (class2acc.c)
* ``simulate``   — synthetic dataset generator (replaces test/0-download.sh)
"""

from __future__ import annotations

import argparse
import os
import sys


def _root_of(source: str) -> str:
    for ext in (".fastq", ".fasta", ".fq", ".fa",
                ".fastq.gz", ".fasta.gz", ".fq.gz", ".fa.gz"):
        if source.endswith(ext):
            return source[: -len(ext)]
    return source


def cmd_classify(args: argparse.Namespace) -> int:
    from classpro_tpu.io.classfile import write_class

    root = _root_of(args.source)
    fk_root = args.fastk_root or root
    out = args.output or root + ".class"
    if args.engine == "exact":
        from classpro_tpu.exact.pipeline import classify_file

        recs = classify_file(args.source, fk_root, coverage=args.coverage,
                             read_len=args.read_len, model_path=args.model)
    else:
        from classpro_tpu.tpu.engine import classify_file_tpu

        recs = classify_file_tpu(args.source, fk_root, coverage=args.coverage,
                                 read_len=args.read_len, model_path=args.model,
                                 verbose=args.verbose)
    if args.seeds:
        from classpro_tpu.io.fastk import open_profiles
        from classpro_tpu.seeds import Workspace, find_seeds

        P = open_profiles(fk_root)
        K = P.kmer
        ws = Workspace()
        seed_path = out + ".seeds"
        rep_path = out + ".rep"

        def with_seeds(records):
            with open(seed_path, "w") as sf, open(rep_path, "w") as rf:
                for rid, rec in enumerate(records):
                    prof = P.fetch(rid)
                    if len(prof) > 0:
                        labels, rints = find_seeds(
                            rec.seq, rec.classes[K - 1:], prof, K, ws)
                        sf.write(rec.header + "\n" + "N" * (K - 1)
                                 + labels + "\n")
                        for b, e in rints:
                            rf.write(f"{rid}\t{b}\t{e}\n")
                    else:
                        sf.write(rec.header + "\n"
                                 + "N" * len(rec.seq) + "\n")
                    yield rec

        recs = with_seeds(recs)
    write_class(out, recs)
    if args.verbose:
        print(f"wrote {out}", file=sys.stderr)
    return 0


def cmd_classgs(args: argparse.Namespace) -> int:
    from classpro_tpu.io.classfile import write_class
    from classpro_tpu.tools.classgs import classify_gs_file

    root = _root_of(args.source)
    out = args.output or root + ".GS.class"
    write_class(out, classify_gs_file(args.source, args.fastk_root or root,
                                      (args.eh, args.hd, args.dr)))
    return 0


def cmd_prof2class(args: argparse.Namespace) -> int:
    from classpro_tpu.io.classfile import write_class
    from classpro_tpu.tools.prof2class import prof2class_file

    root = _root_of(args.source)
    out = args.output or root + ".truth.class"
    write_class(out, prof2class_file(args.truth_prof, args.source))
    return 0


def cmd_class2acc(args: argparse.Namespace) -> int:
    from classpro_tpu.tools.class2acc import class2acc

    acc = class2acc(args.estimate, args.truth, thres_e=args.max_e,
                    thres_r=args.min_r)
    print(acc.report())
    return 0


def cmd_class2cns(args: argparse.Namespace) -> int:
    import sys

    from classpro_tpu.tools.class2cns import consistency, dump

    if args.consistency:
        print(f"Overall consistency = "
              f"{consistency(args.estimate, args.fastk_root)}")
    else:
        dump(args.estimate, args.fastk_root, sys.stdout)
    return 0


def cmd_simulate(args: argparse.Namespace) -> int:
    from classpro_tpu.tools.simulate import SimConfig, generate_dataset

    cfg = SimConfig(seed=args.seed, genome_len=args.genome_len,
                    coverage=args.coverage, read_len_mean=args.read_len,
                    kmer=args.kmer)
    info = generate_dataset(args.outdir, cfg, nparts=args.nparts)
    print(info)
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="classpro-tpu",
                                 description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("classify", help="classify every k-mer of every read")
    c.add_argument("source", help="reads (.fasta/.fastq[.gz])")
    c.add_argument("-N", "--fastk-root", help="FASTK output root (default: source root)")
    c.add_argument("-o", "--output", help="output .class path")
    c.add_argument("-c", "--coverage", type=int, default=0,
                   help="k-mer D-coverage override (-c in reference)")
    c.add_argument("-r", "--read-len", type=int, default=20000,
                   help="average read length (-r)")
    c.add_argument("-M", "--model", help="HIsim error model file (-M)")
    c.add_argument("-T", "--threads", type=int, default=4,
                   help="host-side worker count")
    c.add_argument("--engine", choices=["exact", "tpu"], default="tpu")
    c.add_argument("-s", "--seeds", action="store_true",
                   help="also select alignment seeds (-s in reference); "
                        "writes <out>.seeds (per-position labels) and "
                        "<out>.rep (repeat intervals per read)")
    c.add_argument("-v", "--verbose", action="store_true")
    c.set_defaults(fn=cmd_classify)

    g = sub.add_parser("classgs", help="global-threshold classification")
    g.add_argument("source")
    g.add_argument("eh", type=int, help="E/H count threshold")
    g.add_argument("hd", type=int, help="H/D count threshold")
    g.add_argument("dr", type=int, help="D/R count threshold")
    g.add_argument("-N", "--fastk-root")
    g.add_argument("-o", "--output")
    g.set_defaults(fn=cmd_classgs)

    p = sub.add_parser("prof2class", help="ground truth from relative profile")
    p.add_argument("truth_prof", help="relative profile root (FastK -p:<genome>)")
    p.add_argument("source", help="reads fastx")
    p.add_argument("-o", "--output")
    p.set_defaults(fn=cmd_prof2class)

    a = sub.add_parser("class2acc", help="accuracy vs truth .class")
    a.add_argument("estimate")
    a.add_argument("truth")
    a.add_argument("-f", "--max-e", type=int, default=100)
    a.add_argument("-r", "--min-r", type=int, default=0)
    a.set_defaults(fn=cmd_class2acc)

    n = sub.add_parser("class2cns",
                       help="k-mer/class dump or consensus consistency")
    n.add_argument("estimate")
    n.add_argument("fastk_root")
    n.add_argument("-c", "--consistency", action="store_true",
                   help="print the harmonic-mean most-common-class "
                        "fraction instead of the dump")
    n.set_defaults(fn=cmd_class2cns)

    s = sub.add_parser("simulate", help="generate synthetic dataset")
    s.add_argument("outdir")
    s.add_argument("--seed", type=int, default=7)
    s.add_argument("--genome-len", type=int, default=100_000)
    s.add_argument("--coverage", type=float, default=40.0)
    s.add_argument("--read-len", type=int, default=10_000)
    s.add_argument("--kmer", type=int, default=40)
    s.add_argument("--nparts", type=int, default=1)
    s.set_defaults(fn=cmd_simulate)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
