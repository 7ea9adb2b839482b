"""Consensus-FASTQ generation (--fam-consensus-out-fastq).

Per UMI family and strand, emits the tier-1 consensus read as FASTQ
(R1/R2/SE split) on the reference's ConsensusBlock model
(main_consensus.hpp:13-226, main.hpp:2862-3396 + 2413-2541):

- the per-position BASE consensus comes from the family famcov /
  BQ-weighted (mmm) coverages (good positions get the consensus base
  with conBQ = (2*con_sumBQ - tot_sumBQ)/n_frags, weak positions 'N');
- insertion and soft-clip sequences travel as ConsensusBlocks: per-read
  incByPosSeqQual (per-column MAX of quals), merged read->fragment with
  incByConsensusForSeq and fragment->family with incByMajorMinusMinor,
  then interleaved into the consensus sequence at their LINK positions
  (L->R and R->L variants, with the R->L blocks stored reversed);
- the final segment is split into R1/R2 at the median l2r/r2l read
  lengths (right part reverse-complemented), or emitted as SE when
  single-end reads dominate, with the reference's read names
  (tid:beg-tid:end|strand|UMI#-1#0_0|molecule-hash-hex) and per-base
  family-size/identity comment plus every member read appended as
  qname|seq|qual.

Output is golden-tested against the COMPILED reference's own
fqdata3 strings (tests/test_pileup_oracle.py::test_consensus_fastq_oracle).
"""

import gzip

import numpy as np

from ..constants import NUM_SYMBOLS
from ..pileup import consensus as cns

SUFFIXES = ("R1.fastq.gz", "R2.fastq.gz", "SE.fastq.gz")
BASE_CHARS = "ACGTN*"
REVCOMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N",
           "a": "t", "c": "g", "g": "c", "t": "a", "n": "n"}
# ALL_CONSENSUS_BLOCK_CIGAR_TYPES order (main_consensus.hpp:13-22)
CB_L2R_CLIP, CB_INS, CB_R2L_CLIP = 0, 1, 2
CB_TYPES = (CB_L2R_CLIP, CB_INS, CB_R2L_CLIP)


def _median(vals):
    """The reference's MEDIAN macro: element at size/2 of the sorted
    vector (upper median)."""
    s = sorted(vals)
    return s[len(s) // 2]


class _Block:
    """ConsensusBlock: per inspos column, counts per base symbol (0..4,
    N=4) + BQ_SUM + NFRAGS accumulators."""

    __slots__ = ("cols",)

    def __init__(self):
        self.cols = []

    def _grow(self, n):
        while len(self.cols) < n:
            self.cols.append([0, 0, 0, 0, 0, 0, 0, 0])  # 6 syms + BQ + NF

    def inc_pos_seq_qual(self, seq_codes, quals):
        """incByPosSeqQual: per-column MAX of quals per base symbol."""
        self._grow(len(seq_codes))
        for i, (c, q) in enumerate(zip(seq_codes, quals)):
            col = self.cols[i]
            col[c] = max(col[c], q)
            col[6] = max(col[6], q)
            col[7] = 1

    def merge_max(self, other):
        """Read->fragment merge: updateByRead1Aln runs updateByAln per
        read straight into the fragment coverage (main.hpp:2301-2356),
        so R1R2 blocks combine with the same per-column MAX as
        incByPosSeqQual."""
        self._grow(len(other.cols))
        for i, c1 in enumerate(other.cols):
            col = self.cols[i]
            for b in range(6):
                col[b] = max(col[b], c1[b])
            col[6] = max(col[6], c1[6])
            col[7] = 1

    def inc_major_minus_minor(self, other):
        """incByMajorMinusMinor (fragment->family merge)."""
        self._grow(len(other.cols))
        for i, c1 in enumerate(other.cols):
            conbase, concount, totcount = 5, 0, 0
            for b in range(5):
                if c1[b] > concount:
                    conbase = b
                    concount = c1[b]
                totcount += c1[b]
            col = self.cols[i]
            col[conbase] += 1
            col[6] += max(concount * 2 - totcount, 0)
            col[7] += 1

    def to_seq_qual(self, is_right2left):
        """consensusBlockToSeqQual: per column (reversed for R->L
        blocks), the majority base with quality BQ_SUM/max(NFRAGS,1)."""
        out = []
        n = len(self.cols)
        for i1 in range(n):
            i = n - i1 - 1 if is_right2left else i1
            col = self.cols[i]
            conbase, concount, totcount = 5, 0, 0
            for b in range(5):
                if col[b] > concount:
                    conbase = b
                    concount = col[b]
                totcount += col[b]
            out.append((BASE_CHARS[conbase],
                        col[6] // max(col[7], 1),
                        totcount,
                        concount / max(totcount, 1)))
        return out


def _read_blocks(batch, i):
    """Per-read ConsensusBlockSets from the cigar (updateByAln with
    TIsBlockConsensus, main.hpp:2100-2285): insertions at their link
    position, first-op soft clip as an R->L block (stored reversed),
    trailing soft clip as an L->R block."""
    blocks = {t: {} for t in CB_TYPES}
    o = batch.cigar_op
    ln = batch.cigar_len
    lo, hi = batch.cigar_off[i], batch.cigar_off[i + 1]
    seq = batch.seq[batch.seq_off[i]:batch.seq_off[i + 1]]
    qual = batch.qual[batch.seq_off[i]:batch.seq_off[i + 1]]
    qpos = 0
    rpos = int(batch.pos[i])
    for k in range(lo, hi):
        op, oplen = int(o[k]), int(ln[k])
        if op in (0, 7, 8):            # M/=/X
            qpos += oplen
            rpos += oplen
        elif op == 1:                  # I
            codes = [min(int(c), 4) for c in seq[qpos:qpos + oplen]]
            quals = [int(q) for q in qual[qpos:qpos + oplen]]
            blk = blocks[CB_INS].setdefault(rpos, _Block())
            blk.inc_pos_seq_qual(codes, quals)
            qpos += oplen
        elif op in (2, 3):             # D/N
            rpos += oplen
        elif op == 4:                  # S
            codes = [min(int(c), 4) for c in seq[qpos:qpos + oplen]]
            quals = [int(q) for q in qual[qpos:qpos + oplen]]
            if k == lo:
                codes.reverse()
                quals.reverse()
                cbt = CB_R2L_CLIP
            else:
                cbt = CB_L2R_CLIP
            blk = blocks[cbt].setdefault(rpos, _Block())
            blk.inc_pos_seq_qual(codes, quals)
            qpos += oplen
    return blocks


def _fill_consensus(vec, lo, hi, link):
    """fillConsensusCounts (plain rule) over symbols [lo, hi] of a
    14-wide count vector; returns (con_sym, con_cnt, tot)."""
    con_sym, con_cnt, tot = hi, 0, 0
    for s in range(lo, hi + 1):
        v = int(vec[s])
        if con_cnt < v:
            con_sym = s
            con_cnt = v
        tot += v
    return con_sym, con_cnt, tot


def generate(frag_cons, famgrp, batch, table, P, cfg, region_offset, tid):
    """Returns [r1_text, r2_text, se_text] FASTQ payloads (uncompressed),
    replicating fqdata3 of the reference's updateByAlns3UsingFQ."""
    if not cfg.fam_consensus_out_fastq:
        return ["", "", ""]
    fc = frag_cons
    if not hasattr(fc, "group"):
        raise RuntimeError("consensus_fastq: got a statics handle; "
                           "fam_consensus_out_fastq requires fetched rows")
    r = table.reads
    NS = NUM_SYMBOLS
    thres1 = int(cfg.fam_consensus_out_fastq_thres_dup1add)
    dup1perc = int(cfg.fam_thres_dup1perc)
    dup1add = int(cfg.fam_thres_dup1add)
    highbq_snv = int(cfg.fam_thres_highBQ_snv)

    # per-fragment read lists and per-family fragment lists
    frag_reads = {}
    for i, fr in enumerate(famgrp.frag_of_read):
        frag_reads.setdefault(int(fr), []).append(i)
    fam_frags = {}
    for fr, fm in enumerate(famgrp.fam_of_frag):
        fam_frags.setdefault(int(fm), []).append(fr)

    # fragment-consensus rows grouped per fragment (rows sorted by group)
    row_lo = np.searchsorted(fc.group, np.arange(famgrp.n_frags))
    row_hi = np.searchsorted(fc.group, np.arange(famgrp.n_frags) + 1)

    fq = ["", "", ""]
    fam_order = sorted(
        fam_frags,
        key=lambda fm: (famgrp.fam_mb[fm]["sort_key"]
                        if famgrp.fam_mb else fm))
    for fm in fam_order:
        frs = fam_frags[fm]
        if len(frs) < thres1:        # is_consensus_applicable
            continue
        strand = int(famgrp.fam_strand[fm])
        mb = famgrp.fam_mb[fm] if famgrp.fam_mb else None
        reads_of_fam = [i for f in frs for i in frag_reads[f]]
        # family span (fillTidBegEndFromAlns2: max endpos + 1)
        beg2 = min(int(r.pos[i]) for i in reads_of_fam)
        end2 = max(int(r.rend[i]) for i in reads_of_fam) + 1
        span = end2 - beg2
        n_frags = len(frs)

        # famcov (con_ampl) and BQ-weighted (mmm) family coverages from
        # the fragment consensus rows (updateByFiltering /
        # updateByMajorMinusMinor, main.hpp:3150-3170)
        con_ampl = np.zeros((span, NS), dtype=np.int64)
        mmm = np.zeros((span, NS), dtype=np.int64)
        for f in frs:
            for k in range(int(row_lo[f]), int(row_hi[f])):
                pos = int(fc.pos[k]) + region_offset - beg2
                if not (0 <= pos < span):
                    continue
                adj = max(2 * int(fc.con_cnt[k]) - int(fc.tot[k]), 0)
                if adj <= 0:
                    continue
                sym = int(fc.con_sym[k])
                if int(fc.st[k]) == 1 or adj >= highbq_snv:
                    con_ampl[pos, sym] += 1
                mmm[pos, sym] += adj

        # family ConsensusBlockSets (read -> fragment -> family)
        fam_blocks = {t: {} for t in CB_TYPES}
        for f in frs:
            rd = frag_reads[f]
            if len(rd) == 1:
                fb = _read_blocks(batch, rd[0])
            else:
                fb = {t: {} for t in CB_TYPES}
                for i in rd:
                    rb = _read_blocks(batch, i)
                    for t in CB_TYPES:
                        for pos, blk in rb[t].items():
                            fb[t].setdefault(pos, _Block()) \
                                .merge_max(blk)
            for t in CB_TYPES:
                for pos, blk in fb[t].items():
                    fam_blocks[t].setdefault(pos, _Block()) \
                        .inc_major_minus_minor(blk)
        blk_sorted = {t: sorted(fam_blocks[t].items()) for t in CB_TYPES}
        blk_idx = {t: 0 for t in CB_TYPES}

        # l2r / r2l read stats
        l2r_qlens, r2l_qlens = [], []
        for i in reads_of_fam:
            lq = int(r.l_qseq[i])
            if bool(r.isrc[i]):
                r2l_qlens.append(lq)
            else:
                l2r_qlens.append(lq)

        # ---- per-position segment assembly (main.hpp:3000-3185)
        seg = []        # list of (char, qual, famsize, identity)
        umi_ok = bool(int(famgrp.fam_dflag[fm]) & 0x1) \
            or bool(cfg.fam_flag & 0x2)
        for epos in range(beg2, end2):
            p = epos - beg2
            for symboltype in (1, 0):       # LINK first (VCF order)
                lo_s, hi_s = (6, 13) if symboltype else (0, 5)
                con_sym, con_cnt, tot = _fill_consensus(
                    con_ampl[p], lo_s, hi_s, symboltype)
                mcon, msum, mtot = _fill_consensus(
                    mmm[p], lo_s, hi_s, symboltype)
                con_bq = max(2 * msum - mtot, 0) // n_frags
                if symboltype == 1:
                    # gate insertions/clips on the non-M/D fraction
                    md = (int(con_ampl[p, 6]) + int(con_ampl[p, 7])
                          + int(con_ampl[p, 8]) + int(con_ampl[p, 9]))
                    good = ((n_frags - md) * 100 >= n_frags * dup1perc
                            and thres1 <= n_frags)
                    if good:
                        for t in CB_TYPES:
                            r2l = t == CB_R2L_CLIP
                            mp = p + (1 if r2l else -1)
                            mp = min(max(mp, 0), span - 1)
                            mmd = (int(con_ampl[mp, 6])
                                   + int(con_ampl[mp, 7])
                                   + int(con_ampl[mp, 8])
                                   + int(con_ampl[mp, 9]))
                            m_good = ((n_frags - mmd) * 100
                                      >= n_frags * dup1perc
                                      and thres1 <= n_frags)
                            items = blk_sorted[t]
                            if not m_good:
                                while (blk_idx[t] < len(items)
                                       and items[blk_idx[t]][0] < epos):
                                    blk_idx[t] += 1
                            if (blk_idx[t] < len(items)
                                    and items[blk_idx[t]][0] == epos):
                                seg.extend(items[blk_idx[t]][1]
                                           .to_seq_qual(r2l))
                else:
                    if con_sym == 5 or tot == 0:   # BASE_NN / uncovered
                        continue
                    is_fam_big = dup1add <= tot
                    is_fastq_good = (con_cnt * 100 >= tot * dup1perc
                                     and thres1 <= tot and umi_ok)
                    ident = con_cnt / max(tot, 1)
                    if is_fastq_good:
                        seg.append((BASE_CHARS[con_sym], con_bq, tot,
                                    ident))
                    else:
                        seg.append(("N", 1 if is_fam_big else 0, tot,
                                    ident))

        if len(seg) < 20:
            continue
        _emit(fq, seg, l2r_qlens, r2l_qlens, strand, mb,
              [frag_reads[f] for f in frs], batch, tid)
    return fq


def _emit(fq, seg, l2r_qlens, r2l_qlens, strand, mb, frag_read_lists,
          batch, tid):
    """generate_consensus_fastq_data (main.hpp:2413-2541)."""
    n_pe = n_se = 0
    for rd in frag_read_lists:
        for i in rd:
            if int(batch.flag[i]) & 0x1:
                n_pe += 1
            else:
                n_se += 1
    halves = []
    if l2r_qlens:
        end = min(_median(l2r_qlens), len(seg))
        halves.append(list(seg[:end]))
    else:
        halves.append([])
    if r2l_qlens:
        beg = len(seg) - min(_median(r2l_qlens), len(seg))
        halves.append(list(seg[beg:]))
    else:
        halves.append([])
    dflag = mb["duplexflag"] if mb else 0
    bp = mb["beg_pair"] if mb else (tid, 0)
    ep = mb["end_pair"] if mb else (tid, 0)
    if dflag & 0x8:
        min2, max2 = bp, ep
    else:
        min2, max2 = min(bp, ep), max(bp, ep)
    umistr = mb["umistring"] if mb else ""
    hashhex = format(mb["hashvalue"], "016X") if mb else "0" * 16
    for idx in range(2 if n_pe >= n_se else 1):
        half = halves[idx]
        if len(half) < 20:
            continue
        if idx:
            half = [(REVCOMP.get(c, "N"), q, fs, fi)
                    for (c, q, fs, fi) in reversed(half)]
        span_len = (max2[1] - min2[1] + 1) if min2[0] == max2[0] else 0
        fqname = (f"@{min2[0]}:{min2[1]}-{max2[0]}:{max2[1]}"
                  f"|{'+-' if strand else '-+'}{span_len}"
                  f"|{umistr}#-1#0_0|{hashhex}")
        fqidx = (idx ^ strand) if n_pe >= n_se else 2
        max_fs = max(fs for (_, _, fs, _) in half)
        szs = ",".join("." if fs == max_fs else str(fs)
                       for (_, _, fs, _) in half)
        ids = ",".join("." if fi >= 1.0 - 1.1920928955078125e-07
                       else _fmt_float(fi) for (_, _, _, fi) in half)
        readinfo = ""
        for rd in frag_read_lists:
            for i in rd:
                qn = bytes(batch.qname_data[batch.qname_off[i]:
                                            batch.qname_off[i + 1]])
                qn = qn.decode().rstrip("\x00")
                seq = "".join("ACGTN"[min(int(c), 4)]
                              for c in batch.seq[batch.seq_off[i]:
                                                 batch.seq_off[i + 1]])
                ql = "".join(chr(int(q) + 33)
                             for q in batch.qual[batch.seq_off[i]:
                                                 batch.seq_off[i + 1]])
                readinfo += f"\t{qn}|{seq}|{ql}"
        comment = f"{fqidx + 1}:N:0:{max_fs},{szs}:{ids}"
        fq[fqidx] += (fqname + " " + comment + readinfo + "\n"
                      + "".join(c for (c, _, _, _) in half) + "\n+\n"
                      + "".join(chr(min(max(q, 0), 93) + 33)
                                for (_, q, _, _) in half) + "\n")


def _fmt_float(x):
    """std::to_string(double): fixed 6-decimal formatting."""
    return f"{x:.6f}"


def write_files(prefix, payloads):
    paths = []
    for payload, suffix in zip(payloads, SUFFIXES):
        path = f"{prefix}.{suffix}"
        with gzip.open(path, "wt", compresslevel=1) as fh:
            fh.write(payload)
        paths.append(path)
    return paths
