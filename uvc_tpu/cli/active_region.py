"""Candidate-region BED generator: the uvcActiveRegion.cpp equivalent.

Scans a BAM and emits BED lines covering positions where the variant-
supporting depth is >= 4 and passes the variant/reference ratio test —
useful for preparing candidate regions for low-coverage data
(uvcActiveRegion.cpp:1-135).
"""

import argparse
import sys

import numpy as np

from ..constants import CHAR_TO_SYMBOL
from ..io import native as native_io
from ..io.fasta import FastaFile
from ..pileup import events
from ..ops.scatter import fast_add_at


def run(argv=None):
    ap = argparse.ArgumentParser(prog="uvc_tpu-active-region")
    ap.add_argument("bam")
    ap.add_argument("-f", "--fasta", required=True)
    ap.add_argument("--min-var-dp", type=int, default=4)
    ap.add_argument("--min-bq", type=int, default=20)
    ap.add_argument("--var-ratio", type=float, default=0.04,
                    help="min var_dp / (ref_dp + var_dp)")
    ap.add_argument("--merge-dist", type=int, default=100)
    args = ap.parse_args(argv)

    fa = FastaFile(args.fasta)
    header, batch = native_io.read_bam_native(args.bam)
    table = events.expand(batch)
    b = table.bases
    for tid, name in enumerate(header.ref_names):
        m = batch.tid[b.read] == tid
        if not m.any():
            continue
        ref_syms = fa.fetch_symbols(name)
        L = len(ref_syms)
        rpos = b.rpos[m]
        ok = (rpos >= 0) & (rpos < L)
        rpos = rpos[ok]
        sym = b.sym[m][ok]
        bq = b.bq[m][ok]
        is_var = (ref_syms[rpos] != sym) & (bq > args.min_bq)
        var_dp = np.zeros(L, dtype=np.int64)
        ref_dp = np.zeros(L, dtype=np.int64)
        fast_add_at(var_dp, rpos[is_var], 1)
        fast_add_at(ref_dp, rpos[~is_var], 1)
        active = ((var_dp >= args.min_var_dp)
                  & (var_dp >= (ref_dp + var_dp) * args.var_ratio))
        idx = np.flatnonzero(active)
        if not len(idx):
            continue
        # merge nearby active positions into BED intervals
        breaks = np.flatnonzero(np.diff(idx) > args.merge_dist)
        starts = np.concatenate([[0], breaks + 1])
        ends = np.concatenate([breaks, [len(idx) - 1]])
        for s, e in zip(starts, ends):
            print(f"{name}\t{idx[s]}\t{idx[e] + 1}")
    return 0


if __name__ == "__main__":
    sys.exit(run())
