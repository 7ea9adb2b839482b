"""FASTA reference access (faidx-equivalent).

The reference uses htslib faidx_fetch_seq per region (main.cpp:55-70); we
load contigs into memory as numpy uint8 arrays (upper-cased) once per
process — reference FASTAs for targeted panels are small, and whole-genome
contigs are streamed per tier-1 batch by the scheduler.
"""

import os

import numpy as np

from ..constants import CHAR_TO_SYMBOL


class FastaFile:
    def __init__(self, path: str):
        self.path = path
        self.names = []
        self.seqs = {}
        self._load(path)

    def _load(self, path: str):
        name = None
        chunks = []
        with open(path, "rb") as fh:
            for line in fh:
                line = line.rstrip()
                if line.startswith(b">"):
                    if name is not None:
                        self.seqs[name] = b"".join(chunks).upper()
                    name = line[1:].split()[0].decode()
                    self.names.append(name)
                    chunks = []
                else:
                    chunks.append(line)
        if name is not None:
            self.seqs[name] = b"".join(chunks).upper()

    def fetch(self, name: str, beg: int = 0, end: int = None) -> bytes:
        seq = self.seqs[name]
        return seq[beg:len(seq) if end is None else end]

    def fetch_symbols(self, name: str, beg: int = 0, end: int = None) -> np.ndarray:
        """Reference bases as symbol codes (0-3 ACGT, 4 N) int8."""
        raw = np.frombuffer(self.fetch(name, beg, end), dtype=np.uint8)
        return CHAR_TO_SYMBOL[raw & 0x7F]

    def lengths(self):
        return {n: len(self.seqs[n]) for n in self.names}

    def write_fai(self, fai_path: str = None):
        """Emit a .fai index (offsets computed by re-scanning the file)."""
        fai_path = fai_path or self.path + ".fai"
        entries = []
        with open(self.path, "rb") as fh:
            offset = 0
            name = None
            seq_off = line_blen = line_len = seq_len = 0
            for line in fh:
                if line.startswith(b">"):
                    if name is not None:
                        entries.append((name, seq_len, seq_off, line_blen, line_len))
                    name = line[1:].split()[0].decode()
                    seq_off = offset + len(line)
                    seq_len = 0
                    line_blen = line_len = 0
                else:
                    if line_blen == 0:
                        line_blen = len(line.rstrip())
                        line_len = len(line)
                    seq_len += len(line.rstrip())
                offset += len(line)
            if name is not None:
                entries.append((name, seq_len, seq_off, line_blen, line_len))
        with open(fai_path, "w") as out:
            for e in entries:
                out.write("\t".join(map(str, e)) + "\n")


def write_fasta(path: str, contigs, width: int = 60):
    """contigs: [(name, sequence_str)]"""
    with open(path, "w") as fh:
        for name, seq in contigs:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i:i + width] + "\n")
