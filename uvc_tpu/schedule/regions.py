"""Region planning: the SamIter equivalent (grouping.cpp:157-314).

Cuts the genome into memory-bounded regions at coverage gaps, yielding
(tid, beg, end, read-range) work units. The reference streams the BAM and
cuts tier-1 batches at template change, >=200bp coverage gaps, or the
per-thread memory model (8192 B/ref-pos + 512 B/read vs mem_per_thread);
this vectorized planner derives the same cuts from the decoded columnar
batch. Regions are extended by MAX_STR_N_BASES of reference context on
each side for STR/BAQ computation (main.cpp:529-530).
"""

from dataclasses import dataclass

import numpy as np

from ..constants import MAX_STR_N_BASES

COV_GAP = 200
NUM_BYTES_PER_REF_POS = 8192
NUM_BYTES_PER_READ = 512


@dataclass
class RegionPlan:
    tid: int
    beg: int          # 0-based inclusive region start
    end: int          # 0-based exclusive region end
    read_beg: int     # index range into the (sorted) batch
    read_end: int
    ext_beg: int = 0  # extended (with STR flanks) bounds, set by the caller
    ext_end: int = 0
    # variant-emission window (1-based vcfpos, half-open); interior tier-2
    # boundaries constrain which work unit claims each position
    emit_lo: int = -1
    emit_hi: int = 1 << 62
    # exclusive end of the OWNING tier-1 region (plan() segment): tier-2
    # children inherit it so MGVCF block content is cut at the tier-1
    # boundary exactly as the reference cuts at its region end
    # (main.cpp:666), independent of the tier-2 unit size
    t1_end: int = -1


UNIT_READS = 8192  # tier-2 work-unit size (reads per unit before split)


def split_plans_into_units(plans, batch, ref_lens, unit_reads=None):
    """Tier-2 work-unit chunking (main.cpp:1374-1400): subdivide large
    regions by position into bounded work units so a thread pool can
    balance one big region across workers.  The unit size is fixed (not
    derived from the thread count) so output is identical for any -t.

    Each child re-includes reads overlapping its boundary (the reference
    refetches each unit's window +-MAX_INSERT_SIZE, grouping.cpp:664);
    duplicate variant records are prevented by the emit_lo/emit_hi claim
    windows.  The pad is the observed maximum fragment extent, capped at
    MAX_INSERT_SIZE."""
    from ..constants import MAX_INSERT_SIZE

    if unit_reads is None:
        unit_reads = UNIT_READS
    pos = np.asarray(batch.pos, dtype=np.int64)
    rend = np.asarray(batch.rend, dtype=np.int64)
    isize = np.abs(np.asarray(batch.isize, dtype=np.int64))
    span = rend - pos
    pad = int(min(MAX_INSERT_SIZE,
                  max(int(isize[isize < MAX_INSERT_SIZE].max(initial=0)),
                      int(span.max(initial=0))))) + 1
    out = []
    stack = list(plans)[::-1]
    while stack:
        p = stack.pop()
        nreads = p.read_end - p.read_beg
        if nreads <= unit_reads or p.end - p.beg < 256:
            out.append(p)
            continue
        mid = p.read_beg + nreads // 2
        # snap the cut to a MGVCF_REGION_MAX_SIZE multiple: MGVCF blocks
        # start at those absolute positions, so aligned cuts (plus child A
        # keeping the reads that START at the cut, giving it complete
        # pileup at the one straddling content position blk+1000) make
        # the emitted blocks independent of the tier-2 unit size
        from ..constants import MGVCF_REGION_MAX_SIZE as _MG
        split_pos = int(pos[mid]) // _MG * _MG
        if split_pos <= p.beg:
            split_pos += _MG
        if split_pos <= p.beg or split_pos >= p.end:
            out.append(p)
            continue
        ref_len = ref_lens[p.tid]
        # child A: reads starting at or before the cut, claims < split
        a_end = int(np.searchsorted(pos[p.read_beg:p.read_end], split_pos,
                                    side="right")) + p.read_beg
        # child B: re-include boundary-overlapping reads
        b_beg = int(np.searchsorted(pos[p.read_beg:p.read_end],
                                    split_pos - pad)) + p.read_beg
        a = RegionPlan(tid=p.tid, beg=p.beg, end=min(split_pos, ref_len),
                       read_beg=p.read_beg, read_end=a_end,
                       emit_lo=p.emit_lo,
                       emit_hi=min(p.emit_hi, split_pos + 1),
                       t1_end=p.t1_end)
        b = RegionPlan(tid=p.tid, beg=split_pos, end=p.end,
                       read_beg=b_beg, read_end=p.read_end,
                       emit_lo=max(p.emit_lo, split_pos + 1),
                       emit_hi=p.emit_hi, t1_end=p.t1_end)
        for c in (a, b):
            lo = int(pos[c.read_beg:c.read_end].min()) \
                if c.read_end > c.read_beg else c.beg
            hi = int(rend[c.read_beg:c.read_end].max()) \
                if c.read_end > c.read_beg else c.end
            c.ext_beg = max(0, min(c.beg, lo) - MAX_STR_N_BASES)
            c.ext_end = min(ref_lens[c.tid],
                            max(c.end, hi) + MAX_STR_N_BASES)
        stack.append(b)
        stack.append(a)
    out.sort(key=lambda q: (q.tid, q.beg, q.emit_lo))
    return out


def plan(batch, ref_lens, mem_per_thread_mb=1536, prev_tid=-1, prev_max0=0):
    """Returns a list of RegionPlan covering all reads.

    prev_tid/prev_max0 seed the coverage-run state for STREAMING tier-1
    windows (io/stream.py): prev_max0 is the max reference end of already
    emitted reads on prev_tid, so gap cuts inside a window match the
    whole-file plan exactly (reads already emitted may span into the
    window)."""
    n = batch.n
    if n == 0:
        return []
    rend = batch.rend
    plans = []
    mem_limit = mem_per_thread_mb * 1024 * 1024

    tids = np.asarray(batch.tid)
    pos = np.asarray(batch.pos, dtype=np.int64)
    # boundaries: tid change or coverage gap >= COV_GAP
    run_max_end = np.maximum.accumulate(rend)
    prev_max = np.concatenate([[0], run_max_end[:-1]])
    if prev_tid >= 0 and prev_max0 > 0:
        same = tids == prev_tid   # coordinate-sorted: a same-tid prefix
        prev_max = np.where(same, np.maximum(prev_max, prev_max0), prev_max)
    new_tid = np.concatenate([[True], tids[1:] != tids[:-1]])
    gap_cut = np.concatenate([[True], pos[1:] > prev_max[1:] + COV_GAP])
    cut = new_tid | gap_cut
    # memory model: cumulative cost within a segment; cut when over limit
    starts = list(np.flatnonzero(cut)) + [n]
    for si in range(len(starts) - 1):
        i0, i1 = starts[si], starts[si + 1]
        # subdivide by memory model
        j0 = i0
        while j0 < i1:
            j1 = j0
            seg_beg = int(pos[j0])
            max_end = int(rend[j0])
            while j1 < i1:
                cand_end = max(max_end, int(rend[j1]))
                cost = ((cand_end - seg_beg) * NUM_BYTES_PER_REF_POS
                        + (j1 - j0 + 1) * NUM_BYTES_PER_READ)
                if cost > mem_limit and j1 > j0:
                    break
                max_end = cand_end
                j1 += 1
            tid = int(tids[j0])
            ref_len = ref_lens[tid]
            beg = seg_beg
            end = min(max_end + 1, ref_len)  # +1 for end insertions
            plans.append(RegionPlan(tid=tid, beg=beg, end=end,
                                    read_beg=j0, read_end=j1, t1_end=end))
            j0 = j1
    # extended bounds with STR context flanks
    for p in plans:
        p.ext_beg = max(0, p.beg - MAX_STR_N_BASES)
        p.ext_end = min(ref_lens[p.tid], p.end + MAX_STR_N_BASES)
    return plans


def slice_batch(batch, plan: RegionPlan):
    """View of the reads belonging to one region (index subrange)."""
    from ..io.bam import ReadBatch
    i0, i1 = plan.read_beg, plan.read_end
    c0, c1 = batch.cigar_off[i0], batch.cigar_off[i1]
    s0, s1 = batch.seq_off[i0], batch.seq_off[i1]
    q0, q1 = batch.qname_off[i0], batch.qname_off[i1]
    return ReadBatch(
        n=i1 - i0,
        tid=batch.tid[i0:i1], pos=batch.pos[i0:i1], mapq=batch.mapq[i0:i1],
        flag=batch.flag[i0:i1], mtid=batch.mtid[i0:i1],
        mpos=batch.mpos[i0:i1], isize=batch.isize[i0:i1],
        qname_data=batch.qname_data[q0:q1],
        qname_off=batch.qname_off[i0:i1 + 1] - q0,
        cigar_op=batch.cigar_op[c0:c1], cigar_len=batch.cigar_len[c0:c1],
        cigar_off=batch.cigar_off[i0:i1 + 1] - c0,
        seq=batch.seq[s0:s1], qual=batch.qual[s0:s1],
        seq_off=batch.seq_off[i0:i1 + 1] - s0)


def parse_target_region(target: str, name2tid, ref_lens):
    """'chrom', 'chrom:beg-end' (1-based inclusive, like samtools) or
    'chrom:beg' -> (tid, beg0, end0) interval (grouping.cpp:69-107)."""
    chrom, _, span = target.partition(":")
    tid = name2tid.get(chrom)
    if tid is None:
        raise ValueError(f"unknown contig in --targets: {chrom!r}")
    if not span:
        return (tid, 0, ref_lens[tid])
    b, _, e = span.replace(",", "").partition("-")
    beg0 = max(0, int(b) - 1)
    end0 = int(e) if e else ref_lens[tid]
    return (tid, beg0, min(end0, ref_lens[tid]))


def read_bed_intervals(bed_path, name2tid):
    intervals = []
    with open(bed_path) as fh:
        for line in fh:
            if not line.strip() or line.startswith(("#", "track")):
                continue
            cols = line.split("\t")
            tid = name2tid.get(cols[0])
            if tid is None:
                continue
            intervals.append((tid, int(cols[1]), int(cols[2])))
    return intervals


def restrict_to_bed(plans, bed_path, name2tid, ref_lens, batch=None):
    """Replay a region schedule from a BED file (--bed-in-fname,
    CmdLineArgs.cpp:1028-1030): keep/clip plans to the BED intervals."""
    intervals = read_bed_intervals(bed_path, name2tid)
    return restrict_to_intervals(plans, intervals, ref_lens, batch=batch)


def restrict_to_intervals(plans, intervals, ref_lens, bound_emission=False,
                          batch=None):
    """Clip plans to intervals.  bound_emission=True additionally claims
    only vcfpos inside each interval (-R/--targets semantics); bed-in
    schedule replay keeps emission unbounded to reproduce the tumor run.

    When `batch` is given, each clipped plan's read range is narrowed to
    the reads that can overlap its interval and the ext window is grown
    to cover their spans (otherwise reads outside the window would index
    past the region tensors)."""
    from ..constants import MAX_INSERT_SIZE
    pos = rend = None
    pad = MAX_INSERT_SIZE
    if batch is not None:
        pos = np.asarray(batch.pos, dtype=np.int64)
        rend = np.asarray(batch.rend, dtype=np.int64)
        isize = np.abs(np.asarray(batch.isize, dtype=np.int64))
        span = rend - pos
        pad = int(min(MAX_INSERT_SIZE,
                      max(int(isize[isize < MAX_INSERT_SIZE].max(initial=0)),
                          int(span.max(initial=0))))) + 1
    out = []
    for p in plans:
        for (tid, b, e) in intervals:
            if p.tid == tid and p.beg < e and b < p.end:
                q = RegionPlan(tid=p.tid, beg=max(p.beg, b), end=min(p.end, e),
                               read_beg=p.read_beg, read_end=p.read_end,
                               emit_lo=p.emit_lo, emit_hi=p.emit_hi)
                q.t1_end = q.end
                if bound_emission:
                    q.emit_lo = max(q.emit_lo, b + 1)
                    q.emit_hi = min(q.emit_hi, e + 1)
                q.ext_beg = max(0, q.beg - MAX_STR_N_BASES)
                q.ext_end = min(ref_lens[q.tid], q.end + MAX_STR_N_BASES)
                if pos is not None:
                    sub = pos[p.read_beg:p.read_end]
                    q.read_beg = p.read_beg + int(
                        np.searchsorted(sub, q.beg - pad))
                    q.read_end = p.read_beg + int(
                        np.searchsorted(sub, q.end))
                    if q.read_end > q.read_beg:
                        lo = int(pos[q.read_beg:q.read_end].min())
                        hi = int(rend[q.read_beg:q.read_end].max())
                        q.ext_beg = max(0, min(q.beg, lo) - MAX_STR_N_BASES)
                        q.ext_end = min(ref_lens[q.tid],
                                        max(q.end, hi) + MAX_STR_N_BASES)
                if q.read_end > q.read_beg:
                    out.append(q)
                break
    return out
