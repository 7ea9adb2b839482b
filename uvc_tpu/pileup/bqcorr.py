"""Read-level BQ preprocessing (grouping.cpp:459-543,
apply_bq_err_correction3).

Three corrections applied to every mapped read before pileup:
  1. global cap/boost: BQ = min(BQ + assay_sequencing_BQ_inc,
     assay_sequencing_BQ_max)
  2. 3'-machine-end tail penalty: walking from the 3' aligned end toward
     5', find the 2nd distinct base with BQ >= 20; if the trailing
     homopolymer track is >= 10/15 bases (or the 3' soft-clip >= 20),
     derate the tail BQs by 1..3 (floored at 1)
  3. poly-G damping: bases in a >= 4-long G run (BAM space, machine scan
     order) lose 1 BQ (floored at 1)

The native kernel (bin/rowpile.so bq_corr_kernel) is the fast path; the
python implementation below is the parity-tested behavioral reference.
"""

import ctypes

import numpy as np


def _clips_isrc(batch):
    n = batch.n
    op, ln, off = batch.cigar_op, batch.cigar_len.astype(np.int64), batch.cigar_off
    lclip = np.zeros(n, dtype=np.int64)
    rclip = np.zeros(n, dtype=np.int64)
    n_cigar = np.diff(off)
    nz = np.flatnonzero(n_cigar > 0)
    if len(nz):
        fidx = off[:-1][nz]
        lidx = off[1:][nz] - 1
        lclip[nz] = np.where(op[fidx] == 4, ln[fidx], 0)
        rclip[nz] = np.where(op[lidx] == 4, ln[lidx], 0)
    isrc = (batch.flag.astype(np.int64) & 0x10) != 0
    return lclip, rclip, isrc


def apply_py(batch, cfg):
    """Python reference; mutates batch.qual in place."""
    lclip, rclip, isrc = _clips_isrc(batch)
    qual = batch.qual
    seq = batch.seq
    soff = batch.seq_off
    inc = cfg.assay_sequencing_BQ_inc
    maxq = cfg.assay_sequencing_BQ_max
    G = 2
    for rd in range(batch.n):
        if batch.flag[rd] & 0x4:
            continue
        s0, s1 = int(soff[rd]), int(soff[rd + 1])
        lq = s1 - s0
        if lq == 0:
            continue
        q = np.minimum(qual[s0:s1].astype(np.int64) + inc, maxq)
        qual[s0:s1] = q.astype(np.uint8)
        rc = bool(isrc[rd])
        if not rc:
            beg, end, step = int(lclip[rd]), lq - int(rclip[rd]), 1
            end_clip_len = int(rclip[rd])
        else:
            beg, end, step = lq - 1 - int(rclip[rd]), int(lclip[rd]) - 1, -1
            end_clip_len = int(lclip[rd])
        # tail scan
        termpos = end - step
        prev_b, distinct = -1, 0
        while termpos != beg - step:
            b = int(seq[s0 + termpos])
            qq = int(qual[s0 + termpos])
            if b != prev_b and qq >= 20:
                prev_b = b
                distinct += 1
                if distinct == 2:
                    break
            termpos -= step
        hp = abs(termpos - (end - step))
        tail_penal = (1 if end_clip_len >= 20 else 0) + (
            2 if hp >= 15 else (1 if hp >= 10 else 0))
        if tail_penal > 0:
            p = end - step
            while p != beg - step and p != termpos:
                qual[s0 + p] = max(int(qual[s0 + p]), tail_penal + 1) - tail_penal
                p -= step
        # poly-G
        run, prev_b = 0, -1
        p = beg
        while p != end:
            b = int(seq[s0 + p])
            if b == prev_b:
                run += 1
                if run >= 4 and b == G:
                    qual[s0 + p] = max(int(qual[s0 + p]), 2) - 1
            else:
                prev_b = b
                run = 1
            p += step


def apply(batch, cfg):
    """Apply BQ corrections in place; native when built."""
    from ..ops import native_rowpile
    lib = native_rowpile._load()
    if lib is None or not hasattr(lib, "bq_corr_kernel"):
        return apply_py(batch, cfg)
    lclip, rclip, isrc = _clips_isrc(batch)
    unmapped = np.flatnonzero((batch.flag.astype(np.int64) & 0x4) != 0)
    saved = [(int(i), batch.qual[batch.seq_off[i]:batch.seq_off[i + 1]].copy())
             for i in unmapped]

    def cp(a, dt):
        return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
            ctypes.c_void_p)

    qual = np.ascontiguousarray(batch.qual, dtype=np.uint8)
    rc = lib.bq_corr_kernel(
        ctypes.c_int64(batch.n), cp(batch.seq_off, np.int64),
        cp(batch.seq, np.uint8), qual.ctypes.data_as(ctypes.c_void_p),
        cp(lclip, np.int64), cp(rclip, np.int64), cp(isrc, np.uint8),
        ctypes.c_int64(cfg.assay_sequencing_BQ_inc),
        ctypes.c_int64(cfg.assay_sequencing_BQ_max))
    if rc != 0:
        raise RuntimeError("bq_corr_kernel failed")
    batch.qual[:] = qual
    for i, q in saved:
        batch.qual[batch.seq_off[i]:batch.seq_off[i + 1]] = q
