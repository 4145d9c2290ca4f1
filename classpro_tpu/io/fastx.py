"""FASTA/FASTQ(.gz) streaming reader / FASTA writer.

Functional equivalent of the reference's kseq usage (ClassPro.h:49,
ClassPro.c:181-188): yields (name, comment, seq, qual) per record.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator, NamedTuple, Sequence


class FastxRecord(NamedTuple):
    name: str
    comment: str
    seq: str
    qual: str | None


def _open(path: str):
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"))
    return open(path, "r")


def read_fastx(path: str) -> Iterator[FastxRecord]:
    """Stream records from a FASTA or FASTQ file, optionally gzipped."""
    with _open(path) as f:
        first = f.read(1)
        if not first:
            return
        if first == ">":
            name_line = f.readline().rstrip("\n")
            while True:
                parts = name_line.split(None, 1)
                name = parts[0] if parts else ""
                comment = parts[1] if len(parts) > 1 else ""
                seq_chunks: list[str] = []
                line = f.readline()
                while line and not line.startswith(">"):
                    seq_chunks.append(line.strip())
                    line = f.readline()
                yield FastxRecord(name, comment, "".join(seq_chunks), None)
                if not line:
                    return
                name_line = line[1:].rstrip("\n")
        elif first == "@":
            line = f.readline().rstrip("\n")
            while True:
                parts = line.split(None, 1)
                name = parts[0] if parts else ""
                comment = parts[1] if len(parts) > 1 else ""
                seq = f.readline().strip()
                f.readline()  # '+'
                qual = f.readline().strip()
                yield FastxRecord(name, comment, seq, qual)
                hdr = f.readline()
                if not hdr:
                    return
                line = hdr[1:].rstrip("\n")
        else:
            raise ValueError(f"{path}: not FASTA/FASTQ (starts with {first!r})")


def write_fasta(path: str, records: Sequence[tuple[str, str, str]]) -> None:
    """Write (name, comment, seq) triples as single-line FASTA."""
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as f:
        for name, comment, seq in records:
            hdr = f">{name} {comment}" if comment else f">{name}"
            f.write(hdr + "\n" + seq + "\n")
