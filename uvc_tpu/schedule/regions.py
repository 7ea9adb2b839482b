"""Region planning: a bit-exact SamIter simulation (grouping.cpp:9-314).

SamIterSim replays the reference's streaming region chunker over the
decoded columnar batch: cuts at template change, >2*MAX_STR_N_BASES
coverage gaps, and the two-level memory model (check_if_sub_is_over_mem_
lim per region, check_if_is_over_mem_lim per iternext batch), with every
quirk (dropped trigger reads at batch returns, the stale-record EOF
iteration, the zero-totals termination) replicated and pinned against a
compiled-reference oracle (tools/sched_oracle.py).  Each bedline becomes
a RegionPlan that re-includes boundary reads within the constant
MAX_INSERT_SIZE refetch pad (grouping.cpp:664) and claims exactly its
own [beg, end) emission window.  Regions are extended by MAX_STR_N_BASES
of reference context on each side for STR/BAQ computation
(main.cpp:529-530).
"""

from dataclasses import dataclass

import numpy as np

from ..constants import MAX_STR_N_BASES

COV_GAP = 2 * MAX_STR_N_BASES        # far-jump gap (grouping.cpp:245)
NUM_BYTES_PER_REF_POS = 8192         # grouping.cpp:9
NUM_BYTES_PER_READ = 512             # grouping.cpp:10
NUM_WORKING_UNITS_PER_THREAD = 8     # common.hpp:45


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
    # bounds/flag of the OWNING tier-1 region (bedline): tier-2 children
    # inherit them so MGVCF block content is cut at the tier-1 boundary
    # exactly as the reference cuts at its region end (main.cpp:666),
    # independent of the tier-2 unit size, and so the per-fetch read
    # filters (region_read_filter) see the BEDLINE window, not the unit's
    t1_beg: int = -1
    t1_end: int = -1
    t1_flag: int = 0     # bedline region_flag (bit 0x1 = BED_END_TO_END)
    t1_nreads: int = 0   # bedline n_reads (scheduling/bed-out bookkeeping)


UNIT_READS = 16384  # tier-2 work-unit size (reads per unit before split)


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
    # refetch margin = the batch's OBSERVED maximum fragment extent
    # (|isize| for pairs, read span otherwise), capped at the reference's
    # MAX_INSERT_SIZE guarantee (grouping.cpp:664).  A fragment whose
    # begin is >= pad before a unit's claim window provably cannot touch
    # it, so re-including only that margin keeps every unit's pileup,
    # dedup and insert-coverage stats complete while cutting the
    # duplicated boundary work (a constant 2001bp pad re-processed ~2x of
    # every read on short-insert libraries).  Derived from the batch
    # alone, so unit decomposition stays independent of -t and identical
    # on every host.
    if batch.n:
        isz = np.abs(np.asarray(batch.isize, dtype=np.int64))
        frag_ext = np.where(isz != 0, isz, rend - pos)
        pad = min(MAX_INSERT_SIZE, int(frag_ext.max())) + 1
    else:
        pad = MAX_INSERT_SIZE + 1
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
                       t1_beg=p.t1_beg, t1_end=p.t1_end,
                       t1_flag=p.t1_flag, t1_nreads=p.t1_nreads)
        b = RegionPlan(tid=p.tid, beg=split_pos, end=p.end,
                       read_beg=b_beg, read_end=p.read_end,
                       emit_lo=max(p.emit_lo, split_pos + 1),
                       emit_hi=p.emit_hi,
                       t1_beg=p.t1_beg, t1_end=p.t1_end,
                       t1_flag=p.t1_flag, t1_nreads=p.t1_nreads)
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


def _check_sub_over_mem(region_n_reads, region_n_rposs, mem_per_thread,
                        curr_beg, block_running_end):
    """check_if_sub_is_over_mem_lim (grouping.cpp:49-68): the per-region
    memory model that cuts a coverage run into tier-1 regions.  Arguments
    are taken as size_t in the reference; block_running_end = -1 (first
    read) wraps to a huge unsigned -> full overlap bonus."""
    reads_b = region_n_reads * NUM_BYTES_PER_READ
    rposs_b = region_n_rposs * (NUM_BYTES_PER_REF_POS + 1024)
    memfree = (1024 * 1024 // NUM_WORKING_UNITS_PER_THREAD) * mem_per_thread
    ov = 150 if block_running_end < 0 else min(
        max(block_running_end - curr_beg, 0), 150)
    return reads_b + rposs_b > memfree + memfree * ov // 150


def _check_over_mem(tot_reads, tot_reads_sq, tot_rposs, tot_rposs_sq,
                    nthreads, mem_per_thread, is_fastq_gen):
    """check_if_is_over_mem_lim (grouping.cpp:29-47): the whole-batch
    memory model that bounds how many regions one iternext call returns."""
    reads_b = min(tot_reads_sq // max(1, tot_reads) * nthreads,
                  tot_reads) * NUM_BYTES_PER_READ
    rposs_b = (min(tot_rposs_sq // max(1, tot_rposs) * nthreads, tot_rposs)
               + 2 * MAX_STR_N_BASES * nthreads) * NUM_BYTES_PER_REF_POS
    vcf_b = tot_rposs * 1024
    fqs_b = tot_reads * NUM_BYTES_PER_READ // 4 if is_fastq_gen else 0
    return (reads_b + rposs_b + vcf_b + fqs_b
            > 1024 * 1024 * mem_per_thread * nthreads)


class SamIterSim:
    """Bit-exact simulation of SamIter::iternext's streaming region cuts
    (grouping.cpp:158-314) over an already-decoded read stream.

    feed() consumes (tid, pos, rend) triples in file order and returns the
    bedlines flushed so far; finish() performs the reference's EOF
    iteration (which re-runs the loop body on the stale last record with
    the 0x2 flag bit).  Quirks replicated bug-for-bug:

    - a flush whose block is zero-sized or first keeps region_n_reads
      accumulating into the next stored bedline;
    - when the whole-batch memory model trips right after a flush,
      iternext returns and the NEXT call re-reads from the file, so the
      read that triggered the flush is invisible to the scheduler's
      block state (its rend never extends block_running_end);
    - block_running_end resumes as max(block_beg, block_norm_end) after
      such a return.
    """

    def __init__(self, ref_lens, mem_per_thread_mb=1536, nthreads=1,
                 is_fastq_gen=False):
        self.ref_lens = ref_lens
        self.mem = mem_per_thread_mb
        self.nthreads = max(1, int(nthreads))
        self.is_fastq_gen = bool(is_fastq_gen)
        self.block_tid = -1
        self.block_beg = -1
        self.block_running_end = -1
        self.region_n_reads = 0
        self.region_rposs = 0
        self.region_rposs_add = 0
        self.tot_reads = 0
        self.tot_rposs = 0
        self.tot_reads_sq = 0
        self.tot_rposs_sq = 0
        self.open_read_beg = 0    # stream index of first read in open block
        self.n_seen = 0           # mapped reads fed so far
        self.last = None          # (tid, pos, rend) of last mapped read
        self.call_bedlines = 0    # bedlines stored in the current call
        self.terminated = False   # main.cpp:1348 stopped the outer loop

    def clone(self):
        import copy
        return copy.copy(self)

    def _step(self, tid, pos, rend, at_eof, out):
        sub_over = _check_sub_over_mem(
            self.region_n_reads, self.region_rposs + self.region_rposs_add,
            self.mem, pos, self.block_running_end)
        tchange = tid != self.block_tid
        far = (tid == self.block_tid
               and self.block_running_end + 2 * MAX_STR_N_BASES < pos)
        flag = (16 if tchange else 0) + (8 if far else 0) \
            + (4 if sub_over else 0) + (2 if at_eof else 0)
        if flag:
            is_1st = self.block_tid == -1
            norm_end = self.block_running_end if is_1st else min(
                self.block_running_end, self.ref_lens[self.block_tid])
            if not is_1st and self.block_beg < norm_end:
                out.append((self.block_tid, self.block_beg, norm_end, flag,
                            self.region_n_reads, self.open_read_beg,
                            self.n_seen))
                self.tot_reads += self.region_n_reads
                self.tot_rposs += self.region_rposs + self.region_rposs_add
                self.tot_reads_sq += self.region_n_reads ** 2
                self.tot_rposs_sq += (self.region_rposs
                                      + self.region_rposs_add) ** 2
                self.region_n_reads = 0
                self.region_rposs = 0
                self.region_rposs_add = 0
                self.open_read_beg = self.n_seen
                self.call_bedlines += 1
            self.block_tid = tid
            nb = max(self.block_beg, pos)
            self.block_beg = pos if tchange else max(nb, norm_end)
            if _check_over_mem(self.tot_reads, self.tot_reads_sq,
                               self.tot_rposs, self.tot_rposs_sq,
                               self.nthreads, self.mem, self.is_fastq_gen):
                # iternext returns: this read is consumed but never
                # reaches the loop's bottom half (grouping.cpp:294-299);
                # the next call restarts with fresh totals
                self.block_running_end = max(self.block_beg, norm_end)
                if self.tot_reads <= 0 and self.call_bedlines == 0:
                    # the call returned 0 reads and 0 bedlines: the
                    # reference's outer loop (main.cpp:1348) stops, so
                    # nothing downstream is ever scheduled
                    self.terminated = True
                self.tot_reads = self.tot_rposs = 0
                self.tot_reads_sq = self.tot_rposs_sq = 0
                self.call_bedlines = 0
                self.n_seen += 1
                self.open_read_beg = self.n_seen
                return
        if tchange:
            self.block_beg = pos
            self.block_running_end = rend
            self.region_rposs_add += self.region_rposs
        else:
            self.block_running_end = max(self.block_running_end, rend)
        self.region_n_reads += 1
        self.region_rposs = self.block_running_end - self.block_beg
        self.n_seen += 1

    def feed(self, tids, pos, rend, flags=None):
        """Consume mapped reads in file order; returns flushed bedlines as
        (tid, beg, end, flag, n_reads, read_beg, read_end) with read_beg/
        read_end indexing the MAPPED-read stream.

        Only CUT points run the scalar _step: between them the state is a
        pure prefix function (running max end, counters), so a vectorized
        scan-ahead finds the next read where any cut condition (template
        change / far jump / sub-memory model) can fire and bulk-applies
        the quiet run before it."""
        out = []
        tids = np.asarray(tids, dtype=np.int64)
        pos = np.asarray(pos, dtype=np.int64)
        rend = np.asarray(rend, dtype=np.int64)
        if flags is not None:
            m = (np.asarray(flags, dtype=np.int64) & 0x4) == 0
            if not m.all():
                tids, pos, rend = tids[m], pos[m], rend[m]
        n = len(pos)
        memfree = (1024 * 1024 // NUM_WORKING_UNITS_PER_THREAD) * self.mem
        W = 2048
        i = 0
        while i < n and not self.terminated:
            # scalar step at every potential cut (and right after one)
            t, p, r = int(tids[i]), int(pos[i]), int(rend[i])
            self.last = (t, p, r)
            self._step(t, p, r, False, out)
            i += 1
            if i >= n or self.terminated:
                break
            # vectorized scan-ahead over the same-tid window
            j = min(i + W, n)
            t0 = self.block_tid
            jt = i + int(np.searchsorted(tids[i:j], t0, side="right"))
            if jt == i:
                continue
            seg_pos = pos[i:jt]
            seg_rend = rend[i:jt]
            k = jt - i
            prev = np.empty(k, dtype=np.int64)
            prev[0] = self.block_running_end
            if k > 1:
                np.maximum.accumulate(seg_rend[:-1], out=prev[1:])
                np.maximum(prev[1:], self.block_running_end, out=prev[1:])
            far = prev + 2 * MAX_STR_N_BASES < seg_pos
            nr = self.region_n_reads + np.arange(k, dtype=np.int64)
            rposs = prev - self.block_beg + self.region_rposs_add
            ov = np.minimum(np.maximum(prev - seg_pos, 0), 150)
            sub_over = (nr * NUM_BYTES_PER_READ
                        + rposs * (NUM_BYTES_PER_REF_POS + 1024)
                        > memfree + memfree * ov // 150)
            cut = far | sub_over
            d = int(np.argmax(cut)) if cut.any() else k
            if d > 0:
                # bulk-apply the quiet run [i, i+d)
                run_max = int(np.max(seg_rend[:d]))
                if run_max > self.block_running_end:
                    self.block_running_end = run_max
                self.region_n_reads += d
                self.region_rposs = self.block_running_end - self.block_beg
                self.n_seen += d
                self.last = (int(tids[i + d - 1]), int(seg_pos[d - 1]),
                             int(seg_rend[d - 1]))
                i += d
        return out

    def finish(self):
        """EOF: rerun the loop body once with the stale last record and
        the 0x2 flag bit set (grouping.cpp:224-311 with sam_read_ret=-1).
        Returns the flushed bedlines (usually one)."""
        out = []
        if self.last is not None and not self.terminated:
            t, p, r = self.last
            self.n_seen -= 1      # the stale re-count is not a new read
            self._step(t, p, r, True, out)
        return out


def _plans_from_bedlines(bedlines, batch, ref_lens, open_tail=None):
    """Bedlines -> RegionPlans.  Each plan re-includes the reads whose
    start falls in [beg - pad, end) -- the analog of the reference's
    per-bedline refetch over [beg - MAX_INSERT_SIZE, end + MAX_INSERT_SIZE)
    (grouping.cpp:664) -- and claims exactly its own [beg, end) window so
    boundary-overlapping reads never emit duplicate records."""
    from ..constants import MAX_INSERT_SIZE
    pos = np.asarray(batch.pos, dtype=np.int64)
    rend = np.asarray(batch.rend, dtype=np.int64)
    tids = np.asarray(batch.tid, dtype=np.int64)
    # the pad is the CONSTANT refetch margin (grouping.cpp:664), not a
    # batch statistic: streaming windows would otherwise compute different
    # read ranges than the whole-file plan
    pad = MAX_INSERT_SIZE + 1
    # per-tid index ranges (coordinate-sorted batch)
    tid_beg = {}
    if len(tids):
        change = np.flatnonzero(np.concatenate(
            [[True], tids[1:] != tids[:-1]]))
        bounds = list(change) + [len(tids)]
        for k, i0 in enumerate(change):
            tid_beg[int(tids[i0])] = (int(i0), int(bounds[k + 1]))
    plans = []
    for (tid, beg, end, flag, nreads) in bedlines:
        i0, i1 = tid_beg.get(tid, (0, 0))
        sub = pos[i0:i1]
        rb = i0 + int(np.searchsorted(sub, beg - pad))
        re_ = i0 + int(np.searchsorted(sub, end))
        p = RegionPlan(tid=tid, beg=beg, end=end, read_beg=rb, read_end=re_,
                       emit_lo=beg + 1, emit_hi=end + 1,
                       t1_beg=beg, t1_end=end, t1_flag=flag,
                       t1_nreads=nreads)
        plans.append(p)
    if open_tail is not None:
        plans.append(open_tail)
    for p in plans:
        lo = int(pos[p.read_beg:p.read_end].min()) \
            if p.read_end > p.read_beg else p.beg
        hi = int(rend[p.read_beg:p.read_end].max()) \
            if p.read_end > p.read_beg else p.end
        p.ext_beg = max(0, min(p.beg, lo) - MAX_STR_N_BASES)
        p.ext_end = min(ref_lens[p.tid], max(p.end, hi) + MAX_STR_N_BASES)
    return plans


def plan(batch, ref_lens, mem_per_thread_mb=1536, state=None, finalize=True,
         nthreads=1, is_fastq_gen=False):
    """Returns a list of RegionPlan covering all reads: the bedlines of a
    bit-exact SamIter::iternext simulation (grouping.cpp:158-314),
    verified against the compiled-reference oracle
    (tests/test_sched_oracle.py).

    `state` (a SamIterSim) seeds the scheduler for STREAMING tier-1
    windows (io/stream.py); it is not mutated.  With finalize=False the
    still-open block is returned as a trailing OPEN plan (t1_flag=-1)
    whose only meaningful field is read_beg -- the stream carries its
    reads into the next window."""
    n = batch.n
    if n == 0:
        return []
    sim = state.clone() if state is not None else SamIterSim(
        ref_lens, mem_per_thread_mb, nthreads, is_fastq_gen)
    base_seen = sim.n_seen
    tids = np.asarray(batch.tid, dtype=np.int64)
    pos = np.asarray(batch.pos, dtype=np.int64)
    rend = np.asarray(batch.rend, dtype=np.int64)
    flags = np.asarray(batch.flag, dtype=np.int64)
    bls = sim.feed(tids, pos, rend, flags)
    if finalize:
        bls += sim.finish()
    open_tail = None
    if not finalize:
        rb = sim.open_read_beg - base_seen
        open_tail = RegionPlan(
            tid=sim.block_tid, beg=max(sim.block_beg, 0),
            end=max(sim.block_running_end, max(sim.block_beg, 0) + 1),
            read_beg=max(rb, 0), read_end=n, t1_flag=-1)
    # bedline read indices are stream-relative; map to batch rows (the
    # batch holds exactly the reads fed this call, mapped or not: recompute
    # via position windows inside _plans_from_bedlines instead)
    bedlines = [(t, b, e, f, nr) for (t, b, e, f, nr, _rb, _re) in bls]
    return _plans_from_bedlines(bedlines, batch, ref_lens,
                                open_tail=open_tail)


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
        seq_off=batch.seq_off[i0:i1 + 1] - s0,
        nm=None if batch.nm is None else batch.nm[i0:i1])


def parse_target_region(target: str, name2tid, ref_lens):
    """Comma-separated 'chrom:beg-end' / 'chrom:pos' / 'chrom' targets
    (SamIter::target_region_to_contigs, grouping.cpp:69-107): the parsed
    coordinates are used VERBATIM as the bedline interval (the reference
    applies no 1-based adjustment), and 'chrom:pos' means [pos, pos+1).
    Returns a list of (tid, beg, end) intervals in input order."""
    out = []
    for region in target.split(","):
        if not region:
            continue
        chrom, _, span = region.partition(":")
        tid = name2tid.get(chrom)
        if tid is None:
            raise ValueError(f"unknown contig in --targets: {chrom!r}")
        if not span:
            out.append((tid, 0, ref_lens[tid]))
            continue
        b, _, e = span.partition("-")
        beg0 = int(b)
        end0 = int(e) if e else beg0 + 1
        out.append((tid, beg0, min(end0, ref_lens[tid])))
    return out


def read_bed_intervals(bed_path, name2tid):
    """BED lines -> (tid, beg, end, flag, nreads) tuples
    (SamIter::bed_fname_to_contigs, grouping.cpp:113-157): optional
    whitespace tokens `BedLineFlag N` and `NumberOfReadsInThisInterval N`
    after the three coordinates are honored (--bed-out round trip)."""
    intervals = []
    with open(bed_path) as fh:
        for line in fh:
            if not line.strip() or line.startswith(("#", "track")):
                continue
            cols = line.split()
            tid = name2tid.get(cols[0])
            if tid is None:
                continue
            flag, nreads = 0, 0
            for j in range(3, len(cols) - 1):
                if cols[j] == "BedLineFlag":
                    flag = int(cols[j + 1])
                elif cols[j] == "NumberOfReadsInThisInterval":
                    nreads = int(cols[j + 1])
            intervals.append((tid, int(cols[1]), int(cols[2]), flag,
                              nreads))
    return intervals


ARRPOS_MARGIN = 2000      # MAX_INSERT_SIZE (grouping.cpp:22)
ARRPOS_OUTER_RANGE = 10   # grouping.cpp:23


def plan_intervals(intervals, batch, ref_lens):
    """-R / --regions-bed tier-1 scheduling (SamIter bedlines mode,
    grouping.cpp:168-213): each target interval IS one region, in input
    order, with no gap or memory cuts inside -- the whole-batch memory
    model only splits the interval LIST across iternext calls, never an
    interval.  intervals: (tid, beg, end[, flag[, nreads]]); flag bit 0x1
    is BED_END_TO_END_BIT (iohts.hpp:12), honored by
    region_read_filter."""
    bedlines = []
    for iv in intervals:
        tid, b, e = iv[0], iv[1], iv[2]
        fl = iv[3] if len(iv) > 3 else 0
        nr = iv[4] if len(iv) > 4 else 0
        bedlines.append((tid, b, min(e, ref_lens[tid]), fl, nr))
    return _plans_from_bedlines(bedlines, batch, ref_lens)


def template_ord_bounds(batch, pair_end_merge=True):
    """Per-read template-ordered bounds [tOrdBeg, tOrdEnd] of
    fill_isrc_isr2_beg_end_with_aln (grouping.cpp:385-408): the paired
    template interval from (min(pos, mpos), |isize|) when the insert is
    usable, else the single-read alignment span."""
    from ..constants import MAX_INSERT_SIZE
    pos = np.asarray(batch.pos, dtype=np.int64)
    endpos = np.asarray(batch.rend, dtype=np.int64) - 1
    isize = np.asarray(batch.isize, dtype=np.int64)
    # NORM_INSERT_SIZE (common.hpp:75)
    isize = np.where(np.abs(isize) >= MAX_INSERT_SIZE, 0, isize)
    flag = np.asarray(batch.flag, dtype=np.int64)
    mpos = np.asarray(batch.mpos, dtype=np.int64)
    single = ((flag & 0x1) == 0) | ((flag & 0x8) != 0) | (isize == 0) \
        | (np.abs(isize) >= ARRPOS_MARGIN)
    if not pair_end_merge:
        single = np.ones(len(pos), dtype=bool)
    tb1 = np.minimum(pos, mpos)
    te1 = tb1 + np.abs(isize) - 1
    return (np.where(single, pos, tb1), np.where(single, endpos, te1))


def region_read_filter(sub, plan, cfg):
    """The per-fetch template-range filters of
    fill_isrc_isr2_beg_end_with_aln (grouping.cpp:405-411): drop reads
    whose template is OUT_OF_RANGE of this bedline's window, and -- when
    the bedline carries BED_END_TO_END_BIT -- reads whose template does
    not span the bedline end-to-end.  Returns `sub` unchanged when
    nothing is dropped."""
    if sub.n == 0:
        return sub
    from ..io import bam as pybam
    from ..constants import PairEndMerge
    pem = int(getattr(cfg, "pair_end_merge", PairEndMerge.YES)) \
        == int(PairEndMerge.YES)
    tob, toe = template_ord_bounds(sub, pem)
    margin = ARRPOS_MARGIN - ARRPOS_OUTER_RANGE
    # the reference fetches per BEDLINE: tier-2 units of one bedline use
    # the bedline's window, not their own
    rb = plan.t1_beg if plan.t1_beg >= 0 else plan.beg
    re_ = plan.t1_end if plan.t1_end > 0 else plan.end
    keep = ~((tob + margin <= rb) | (re_ - 1 + margin <= toe))
    if plan.t1_flag > 0 and (plan.t1_flag & 0x1):
        keep &= (tob <= rb) & (toe >= re_)
    if keep.all():
        return sub
    return pybam.subset_batch(sub, np.flatnonzero(keep))
