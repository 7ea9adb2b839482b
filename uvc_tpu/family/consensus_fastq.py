"""Consensus-FASTQ generation (--fam-consensus-out-fastq).

Per UMI family and strand, emits the tier-1 consensus read as gzipped
FASTQ (R1/R2/SE split), with per-base family size and identity in the
comment — the generate_consensus_fastq_data equivalent
(main_consensus.hpp:13-226, main.hpp:2413-2541). Read names encode the
molecule span, strand, and UMI.
"""

import gzip

import numpy as np

from ..constants import NUM_SYMBOLS
from ..pileup import consensus as cns

SUFFIXES = ("R1.fastq.gz", "R2.fastq.gz", "SE.fastq.gz")
BASE_CHARS = "ACGTN*"


def generate(frag_cons, famgrp, batch, table, P, cfg, region_offset, tid):
    """Returns [r1_text, r2_text, se_text] FASTQ payloads (uncompressed)."""
    if not cfg.fam_consensus_out_fastq:
        return ["", "", ""]
    fc = frag_cons
    if not hasattr(fc, "group"):
        # a statics-resident handle must never reach this point: the rows
        # it refers to were reused by the family merge long before the
        # emit stage runs (region.py forces a fetch under this flag)
        raise RuntimeError("consensus_fastq: got a statics handle; "
                           "fam_consensus_out_fastq requires fetched rows")
    fam_of_row = famgrp.fam_of_frag[fc.group]
    # family BASE consensus per position: counts over fragments
    bmask = fc.st == 0
    fg, fp, fs, fcnt = cns.segment_reduce_sum(
        fam_of_row[bmask], fc.pos[bmask], fc.con_sym[bmask],
        np.ones(int(bmask.sum()), dtype=np.int64), P)
    s1 = cns.consensus_by_group(fg, fp, fs, fcnt, P, link_m_overridden=False)
    order = np.lexsort((s1.pos, s1.group))
    outs = ["", "", ""]
    fq = [[], [], []]
    thres = cfg.fam_consensus_out_fastq_thres_dup1add
    bounds = np.concatenate([[0], 1 + np.flatnonzero(
        s1.group[order][1:] != s1.group[order][:-1]), [len(order)]]) \
        if len(order) else np.array([0, 0])
    for bi in range(len(bounds) - 1):
        rows = order[bounds[bi]:bounds[bi + 1]]
        if not len(rows):
            continue
        fam = int(s1.group[rows[0]])
        n_frags_max = int(s1.tot[rows].max())
        if n_frags_max < thres:
            continue
        seq = []
        quals = []
        sizes = []
        idents = []
        for r in rows:
            tot = int(s1.tot[r])
            con = int(s1.con_cnt[r])
            sym = int(s1.con_sym[r])
            good = (con * 100 >= tot * cfg.fam_thres_dup1perc
                    and tot >= thres and sym < 4)
            seq.append(BASE_CHARS[sym] if good else "N")
            quals.append(chr(33 + min(2 * con - tot if good else
                                      (1 if tot >= cfg.fam_thres_dup1add else 0), 41)))
            sizes.append(tot)
            idents.append(con / max(1, tot))
        if len(seq) < 20:
            continue
        strand = int(famgrp.fam_strand[fam])
        umi = famgrp.umi_of_fam[fam] or "-"
        beg = int(s1.pos[rows[0]]) + region_offset
        end = int(s1.pos[rows[-1]]) + region_offset
        maxsz = max(sizes)
        fqname = (f"@{tid}:{beg}-{tid}:{end}|{'+-' if strand else '-+'}"
                  f"{end - beg + 1}|{umi}#-1#0_0|{fam:016X}")
        szs = ",".join("." if s == maxsz else str(s) for s in sizes)
        ids = ",".join("." if i >= 1.0 - 1e-7 else f"{i:.6f}" for i in idents)
        comment = f"{strand + 1}:N:0:{maxsz},{szs}:{ids}"
        fqidx = strand  # R1/R2 split by strand; SE bucket unused here
        fq[fqidx].append(f"{fqname} {comment}\n{''.join(seq)}\n+\n{''.join(quals)}\n")
    return ["".join(x) for x in fq]


def write_files(prefix, payloads):
    paths = []
    for payload, suffix in zip(payloads, SUFFIXES):
        path = f"{prefix}.{suffix}"
        with gzip.open(path, "wt", compresslevel=1) as fh:
            fh.write(payload)
        paths.append(path)
    return paths
