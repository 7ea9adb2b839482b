"""CIGAR expansion: columnar ReadBatch -> flat per-base / per-gap event
tensors plus per-read statistics.

This is the tensorization replacing the reference's five per-read CIGAR
walks (SURVEY.md §3.3): every downstream pass (prep counters, BQ-sum,
fragment consensus, family consensus) consumes these flat arrays with
vectorized gathers and scatter-adds instead of walking bam1_t records.

Behavioral reference for the per-read derived statistics:
  /root/reference/main.hpp:925-998 (prep pass) and :1789-1885 (updateByAln
  preamble): gap-open/extension counts, xm1500/go1500 mismatch densities,
  clip lengths, interfering-indel positions, per-symbol mismatch counts.
"""

from dataclasses import dataclass

import numpy as np

from ..io.bam import (BAM_CMATCH, BAM_CINS, BAM_CDEL, BAM_CREF_SKIP,
                      BAM_CSOFT_CLIP, BAM_CHARD_CLIP, BAM_CEQUAL, BAM_CDIFF)
from ..constants import MAX_INSERT_SIZE

M_OPS = (BAM_CMATCH, BAM_CEQUAL, BAM_CDIFF)


def _seg_excl_cumsum(vals: np.ndarray, seg_off: np.ndarray) -> np.ndarray:
    """Exclusive cumulative sum within segments delimited by seg_off."""
    c = np.cumsum(vals, dtype=np.int64)
    excl = c - vals
    seg_base = np.concatenate([[0], c])[seg_off[:-1]]
    n_per = np.diff(seg_off)
    return excl - np.repeat(seg_base, n_per)


def _flat_idx(starts: np.ndarray, lens: np.ndarray):
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    ends = np.cumsum(lens)
    begins = ends - lens
    owner = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    offs = np.arange(total, dtype=np.int64) - np.repeat(begins, lens)
    return owner, offs + starts[owner]


@dataclass
class ReadInfo:
    """Per-read derived scalars, [n] arrays."""

    pos: np.ndarray
    rend: np.ndarray
    l_qseq: np.ndarray
    flag: np.ndarray
    mapq: np.ndarray
    isize: np.ndarray
    isrc: np.ndarray        # bool: read reverse-complemented
    strand: np.ndarray      # bool: template strand = isrc ^ isr2
    is_paired: np.ndarray
    nge_cnt: np.ndarray     # total gap-extension bases
    ngo_cnt: np.ndarray     # gap opens
    clip_cnt: np.ndarray
    lclip: np.ndarray
    rclip: np.ndarray
    max_clip_len: np.ndarray
    xm_cnt: np.ndarray      # mismatches (NM - gapext; 0 without NM tag)
    xm1500: np.ndarray
    go1500: np.ndarray
    avg_gaplen: np.ndarray
    inslen_sum: np.ndarray
    dellen_sum: np.ndarray
    frag_pos_L: np.ndarray
    frag_pos_R: np.ndarray


@dataclass
class BaseEvents:
    """One row per aligned (M/=/X) base."""

    read: np.ndarray      # int32 read index
    rpos: np.ndarray      # int64 reference position
    qpos: np.ndarray      # int32 query position
    sym: np.ndarray       # int8 base symbol 0..4
    bq: np.ndarray        # uint8 base quality
    interior: np.ndarray  # bool: i2>0 within its M run (link LINK_M site)
    op_index: np.ndarray  # global cigar-op index of the owning M op
    i2: np.ndarray        # offset within the M op


@dataclass
class GapEvents:
    """One row per I or D cigar op."""

    read: np.ndarray
    rpos: np.ndarray      # reference position of the link site
    qpos: np.ndarray      # query position at the op
    oplen: np.ndarray
    is_del: np.ndarray
    nbases2end: np.ndarray  # min distance to either read end (main.hpp:2011,2122)
    op_index: np.ndarray    # global cigar-op index (for del BAQ neighbor scan)


@dataclass
class EventTable:
    reads: ReadInfo
    bases: BaseEvents
    gaps: GapEvents
    # per-read slices of gap events (for neighbor scans)
    gap_off: np.ndarray


def _expand_bases_native(batch, n_bases):
    """Native single-pass cigar walk filling the BaseEvents arrays
    (native/rowpile.cpp expand_bases_kernel); None when not built."""
    from ..ops import native_rowpile as nr
    lib = nr._load()
    if lib is None or not hasattr(lib, "expand_bases_kernel") \
            or n_bases < 16384:
        return None
    import ctypes
    b_rpos = np.empty(n_bases, np.int64)
    b_read = np.empty(n_bases, np.int64)
    b_qpos = np.empty(n_bases, np.int32)
    b_sym = np.empty(n_bases, np.int8)
    b_bq = np.empty(n_bases, np.uint8)
    b_int = np.empty(n_bases, np.uint8)
    b_opidx = np.empty(n_bases, np.int64)
    b_i2 = np.empty(n_bases, np.int64)

    def cp(a, dt):
        return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
            ctypes.c_void_p)

    lib.expand_bases_kernel.restype = ctypes.c_int64
    w = lib.expand_bases_kernel(
        ctypes.c_int64(batch.n),
        cp(batch.cigar_op, np.uint8), cp(batch.cigar_len, np.int32),
        cp(batch.cigar_off, np.int64), cp(batch.pos, np.int32),
        cp(batch.seq, np.int8), cp(batch.qual, np.uint8),
        cp(batch.seq_off, np.int64),
        b_rpos.ctypes.data_as(ctypes.c_void_p),
        b_read.ctypes.data_as(ctypes.c_void_p),
        b_qpos.ctypes.data_as(ctypes.c_void_p),
        b_sym.ctypes.data_as(ctypes.c_void_p),
        b_bq.ctypes.data_as(ctypes.c_void_p),
        b_int.ctypes.data_as(ctypes.c_void_p),
        b_opidx.ctypes.data_as(ctypes.c_void_p),
        b_i2.ctypes.data_as(ctypes.c_void_p))
    assert w == n_bases
    return BaseEvents(read=b_read, rpos=b_rpos, qpos=b_qpos, sym=b_sym,
                      bq=b_bq, interior=b_int.view(bool), op_index=b_opidx,
                      i2=b_i2)


def expand(batch) -> EventTable:
    """Expand a columnar ReadBatch into the event table."""
    n = batch.n
    op = batch.cigar_op
    ln = batch.cigar_len.astype(np.int64)
    off = batch.cigar_off
    n_cigar = np.diff(off)
    op_read = np.repeat(np.arange(n, dtype=np.int64), n_cigar)

    consumes_ref = np.isin(op, (BAM_CMATCH, BAM_CDEL, BAM_CREF_SKIP,
                                BAM_CEQUAL, BAM_CDIFF))
    consumes_qry = np.isin(op, (BAM_CMATCH, BAM_CINS, BAM_CSOFT_CLIP,
                                BAM_CEQUAL, BAM_CDIFF))
    ref_adv = ln * consumes_ref
    qry_adv = ln * consumes_qry
    op_rpos = _seg_excl_cumsum(ref_adv, off) + batch.pos[op_read]
    op_qpos = _seg_excl_cumsum(qry_adv, off)

    is_m = np.isin(op, M_OPS)
    is_ins = op == BAM_CINS
    is_del = op == BAM_CDEL
    is_clip = np.isin(op, (BAM_CSOFT_CLIP, BAM_CHARD_CLIP))
    is_gap = is_ins | is_del

    def seg_sum(v):
        c = np.concatenate([[0], np.cumsum(v, dtype=np.int64)])
        return c[off[1:]] - c[off[:-1]]

    rend = batch.pos.astype(np.int64) + seg_sum(ref_adv)
    l_qseq = (batch.seq_off[1:] - batch.seq_off[:-1]).astype(np.int64)
    span = np.maximum(rend - batch.pos, 1)

    nge = seg_sum(ln * is_gap)
    ngo = seg_sum(is_gap.astype(np.int64))
    clip_cnt = seg_sum(is_clip.astype(np.int64))
    inslen_sum = seg_sum(ln * is_ins)
    dellen_sum = seg_sum(ln * is_del)
    # left/right soft-clip lengths (first/last op only; main.hpp:1880-1881)
    lclip = np.zeros(n, dtype=np.int64)
    rclip = np.zeros(n, dtype=np.int64)
    nz = np.flatnonzero(n_cigar > 0)
    if len(nz):
        fidx = off[:-1][nz]
        lidx = off[1:][nz] - 1
        lclip[nz] = np.where(op[fidx] == BAM_CSOFT_CLIP, ln[fidx], 0)
        rclip[nz] = np.where(op[lidx] == BAM_CSOFT_CLIP, ln[lidx], 0)
    max_clip_len = np.zeros(n, dtype=np.int64)
    np.maximum.at(max_clip_len, op_read[is_clip], ln[is_clip])

    # xm = NM - gapext; NM-absent reads fall back to nge, i.e. xm=0
    # (main.hpp:980-984,1810-1814; release build has no nm>=nge assert,
    # so no clamping — a malformed NM<nge yields negative xm as there)
    nm_tag = batch.nm_filled().astype(np.int64) if hasattr(batch, "nm_filled") \
        else np.full(n, -1, dtype=np.int64)
    nm_cnt = np.where(nm_tag >= 0, nm_tag, nge)
    xm_cnt = nm_cnt - nge
    xm1500 = xm_cnt * 1500 // span
    go1500 = ngo * 1500 // span
    avg_gaplen = nge // np.maximum(1, ngo)

    flag = batch.flag.astype(np.int64)
    isrc = (flag & 0x10) != 0
    is_paired = (flag & 0x1) != 0
    # bam_get_strand (common.hpp:90): mate-reverse if paired-and-mate-mapped
    # flag 0x81 == 0x81 -> use 0x20, else 0x10
    strand = np.where((flag & 0x81) == 0x81, (flag & 0x20) != 0, isrc)
    isize = batch.isize.astype(np.int64)
    # NORM_INSERT_SIZE (common.hpp:75): |isize| >= MAX_INSERT_SIZE -> 0
    isize = np.where(np.abs(isize) >= MAX_INSERT_SIZE, 0, isize)
    frag_pos_L = np.minimum(batch.pos, batch.mpos).astype(np.int64)
    frag_pos_R = frag_pos_L + np.abs(isize)

    reads = ReadInfo(
        pos=batch.pos.astype(np.int64), rend=rend, l_qseq=l_qseq, flag=flag,
        mapq=batch.mapq.astype(np.int64), isize=isize, isrc=isrc,
        strand=strand.astype(bool), is_paired=is_paired,
        nge_cnt=nge, ngo_cnt=ngo, clip_cnt=clip_cnt, lclip=lclip,
        rclip=rclip, max_clip_len=max_clip_len, xm_cnt=xm_cnt,
        xm1500=xm1500, go1500=go1500, avg_gaplen=avg_gaplen,
        inslen_sum=inslen_sum, dellen_sum=dellen_sum,
        frag_pos_L=frag_pos_L, frag_pos_R=frag_pos_R)

    # ---- base events: expand M ops (native single cigar walk when the
    # kernel is built; the numpy path below is the behavioral reference)
    bases = _expand_bases_native(batch, int((ln * is_m).sum()))
    if bases is None:
        m_idx = np.flatnonzero(is_m)
        m_owner, m_flat = _flat_idx(np.zeros(len(m_idx), np.int64),
                                    ln[m_idx])
        # offset within each M op
        within = m_flat  # since starts are 0, m_flat == offset within op
        ev_op = m_idx[m_owner]
        b_read = op_read[ev_op]
        b_rpos = op_rpos[ev_op] + within
        b_qpos = op_qpos[ev_op] + within
        seq_flat_idx = batch.seq_off[b_read] + b_qpos
        b_sym = batch.seq[seq_flat_idx]
        b_bq = batch.qual[seq_flat_idx]
        interior = within > 0

        bases = BaseEvents(read=b_read, rpos=b_rpos,
                           qpos=b_qpos.astype(np.int32),
                           sym=b_sym, bq=b_bq, interior=interior,
                           op_index=ev_op, i2=within)

    # ---- gap events
    g_idx = np.flatnonzero(is_gap)
    g_read = op_read[g_idx]
    g_rpos = op_rpos[g_idx]
    g_qpos = op_qpos[g_idx]
    g_len = ln[g_idx]
    g_is_del = is_del[g_idx]
    # nbases2end: ins: min(qpos, l_qseq - (qpos + oplen)); del: min(qpos, l_qseq - qpos)
    lq = l_qseq[g_read]
    nb2e = np.where(g_is_del,
                    np.minimum(g_qpos, lq - g_qpos),
                    np.minimum(g_qpos, lq - (g_qpos + g_len)))
    gaps = GapEvents(read=g_read, rpos=g_rpos, qpos=g_qpos.astype(np.int64),
                     oplen=g_len, is_del=g_is_del, nbases2end=nb2e,
                     op_index=g_idx)
    gap_off = np.searchsorted(g_read, np.arange(n + 1))

    return EventTable(reads=reads, bases=bases, gaps=gaps, gap_off=gap_off)


def interfering_indel_rposs(table: EventTable, batch, thres_bq: int = 21):
    """Per read: sorted reference positions of "interfering" (low-BQ) indels
    (main.hpp:1817-1859), for dist_to_interfering_indel.

    Ins: low if any base in [qpos-1, qpos+oplen] has BQ < thres.
    Del: low if min(BQ[max(1,qpos)-1], BQ[qpos]) <= thres.
    Returns (values int64 [k], offsets int64 [n+1]).
    """
    g = table.gaps
    lq = table.reads.l_qseq[g.read]
    low = np.zeros(len(g.read), dtype=bool)
    # deletions: vectorized two-point check
    dmask = g.is_del
    q0 = np.maximum(1, g.qpos) - 1
    q1 = np.minimum(g.qpos, lq - 1)
    flat0 = batch.seq_off[g.read] + q0
    flat1 = batch.seq_off[g.read] + np.maximum(q1, 0)
    bq0 = batch.qual[np.minimum(flat0, len(batch.qual) - 1)]
    bq1 = batch.qual[np.minimum(flat1, len(batch.qual) - 1)]
    low[dmask] = (np.minimum(bq0, bq1) <= thres_bq)[dmask]
    # insertions: scan window [qpos - min(qpos,1), qpos+oplen] clipped to read
    imask = ~g.is_del
    if imask.any():
        starts = (g.qpos - np.minimum(g.qpos, 1))[imask]
        # reference clips the scan end at `rend` (a position-space bound used
        # on a query index — a quirk); practical effect: clip to l_qseq
        ends = np.minimum(g.qpos + g.oplen + 1, lq)[imask]
        lens = np.maximum(ends - starts, 0)
        owner, qoff = _flat_idx(starts, lens)
        flat = batch.seq_off[g.read[imask][owner]] + qoff
        isl = np.zeros(int(imask.sum()), dtype=bool)
        np.logical_or.at(isl, owner, batch.qual[flat] < thres_bq)
        low[imask] = isl
    keep = low
    vals = g.rpos[keep]
    owner_read = g.read[keep]
    order = np.lexsort((vals, owner_read))
    vals = vals[order]
    owner_read = owner_read[order]
    offs = np.searchsorted(owner_read, np.arange(batch.n + 1))
    return vals, offs
