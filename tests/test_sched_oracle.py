"""Region-scheduler parity vs the compiled-reference SamIter oracle.

tools/sched_oracle.py compiles SamIter::iternext + its memory-model
predicates (grouping.cpp:9-314) out of the reference at build time; this
test feeds identical synthetic read streams to that binary and to
uvc_tpu.schedule.regions (SamIterSim / plan) and pins every bedline
(tid, beg, end, flag, n_reads) including the iternext batching.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from uvc_tpu.schedule import regions as regions_mod  # noqa: E402


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    import sched_oracle
    wd = str(tmp_path_factory.mktemp("sched_oracle"))
    exe = sched_oracle.build_oracle(wd)
    o = sched_oracle.SchedOracle(exe)
    yield o
    o.close()


def _run_both(oracle, contigs, reads, mem_mb=1536, nthreads=1,
              is_fastq_gen=False):
    """reads: (tid, pos, cigar, flag) in file order.  Returns
    (oracle_bedlines, oracle_batches, our_bedlines)."""
    oracle.send("clear")
    ps = [f"mem_per_thread={mem_mb}", f"max_cpu_num={nthreads}",
          "tier1_target_region=.", "bed_region_fname=."]
    # note: SamIter's is_fastq_gen is `size() > 0` (grouping.hpp:56), NOT
    # IS_PROVIDED -- even "." would count as fastq-gen; reset explicitly
    # because the paramset persists across `clear`
    ps.append("fam_consensus_out_fastq=" + ("x.fq" if is_fastq_gen else ""))
    oracle.send("ps " + " ".join(ps))
    ref_lens = []
    for i, (name, ln) in enumerate(contigs):
        oracle.send(f"contig {name} {ln}")
        ref_lens.append(ln)
    for (tid, pos, cig, flag) in reads:
        oracle.send(f"read {tid} {pos} {cig} {flag}")
    batches = oracle.run()
    ref_bls = [bl for (_n, _f, bls) in batches for bl in bls]

    tids = np.array([r[0] for r in reads], dtype=np.int64)
    pos = np.array([r[1] for r in reads], dtype=np.int64)
    rend = pos + np.array([_reflen(r[2]) for r in reads], dtype=np.int64)
    flags = np.array([r[3] for r in reads], dtype=np.int64)
    sim = regions_mod.SamIterSim(ref_lens, mem_mb, nthreads, is_fastq_gen)
    ours = sim.feed(tids, pos, rend, flags) + sim.finish()
    our_bls = [(t, b, e, f, nr) for (t, b, e, f, nr, _a, _b2) in ours]
    return ref_bls, batches, our_bls


def _reflen(cig):
    num, total = 0, 0
    for c in cig:
        if c.isdigit():
            num = num * 10 + int(c)
        else:
            if c in "MDN=X":
                total += num
            num = 0
    return total


def test_gap_and_contig_cuts(oracle):
    contigs = [("chr1", 100000), ("chr2", 50000)]
    reads = []
    p = 0
    for i in range(60):
        reads.append((0, p, "150M", 99))
        p += 37
    jump = p - 37 + 150 + 250          # > 200bp coverage gap
    for i in range(25):
        reads.append((0, jump + i * 41, "150M", 99))
    for i in range(15):
        reads.append((1, i * 53, "100M", 99))
    ref_bls, _, our_bls = _run_both(oracle, contigs, reads)
    assert our_bls == ref_bls
    assert len(ref_bls) == 3


def test_exact_200_gap_boundary(oracle):
    """far-jump fires iff block_running_end + 200 < pos (strict)."""
    contigs = [("chr1", 100000)]
    for delta, want in ((200, 1), (201, 2)):
        reads = [(0, 0, "100M", 99), (0, 100 + delta, "100M", 99)]
        ref_bls, _, our_bls = _run_both(oracle, contigs, reads)
        assert our_bls == ref_bls
        assert len(ref_bls) == want, (delta, ref_bls)


def test_end_clipped_to_target_len(oracle):
    contigs = [("chr1", 150)]          # read overhangs the contig end
    reads = [(0, 100, "100M", 99)]
    ref_bls, _, our_bls = _run_both(oracle, contigs, reads)
    assert our_bls == ref_bls
    assert ref_bls[0][2] == 150


def test_unmapped_and_deletion_spans(oracle):
    contigs = [("chr1", 100000)]
    reads = [(0, 0, "50M", 99), (0, 10, "100M", 4),   # unmapped: skipped
             (0, 30, "20M500D20M", 99), (0, 900, "50M", 99)]
    ref_bls, _, our_bls = _run_both(oracle, contigs, reads)
    assert our_bls == ref_bls


def test_memory_model_cuts(oracle):
    """Low mem_per_thread trips check_if_sub_is_over_mem_lim: one long
    coverage run splits into memory-bounded regions at exact positions."""
    contigs = [("chr1", 10_000_000)]
    reads = [(0, i * 40, "150M", 99) for i in range(4000)]
    for mem_mb in (2, 5):
        ref_bls, _, our_bls = _run_both(oracle, contigs, reads,
                                        mem_mb=mem_mb)
        assert our_bls == ref_bls, mem_mb
        assert len(ref_bls) > 2, mem_mb
    # mem_per_thread=1 is degenerate: the batch limit trips with ZERO
    # totals (the constant 2*MAX_STR_N_BASES rposs term), the first
    # iternext returns 0 reads + 0 bedlines, and main.cpp:1348 stops --
    # the reference schedules NOTHING; replicated bug-for-bug
    ref_bls, _, our_bls = _run_both(oracle, contigs, reads, mem_mb=1)
    assert our_bls == ref_bls == []


def test_batch_limit_and_dropped_read_quirk(oracle):
    """Tiny mem also trips check_if_is_over_mem_lim: iternext returns
    mid-file and the triggering read is dropped from scheduler state --
    batching and bedlines must both match."""
    contigs = [("chr1", 10_000_000), ("chr2", 10_000_000)]
    reads = [(0, i * 45, "150M", 99) for i in range(3000)]
    reads += [(1, i * 45, "150M", 99) for i in range(1500)]
    for nthreads in (1, 4):
        ref_bls, batches, our_bls = _run_both(
            oracle, contigs, reads, mem_mb=2, nthreads=nthreads)
        assert our_bls == ref_bls, nthreads
        assert len(batches) > 1, nthreads


def test_fastq_gen_affects_batching(oracle):
    contigs = [("chr1", 10_000_000)]
    reads = [(0, i * 45, "150M", 99) for i in range(3000)]
    ref_bls, batches, our_bls = _run_both(oracle, contigs, reads, mem_mb=2,
                                          is_fastq_gen=True)
    assert our_bls == ref_bls
    a = _run_both(oracle, contigs, reads, mem_mb=2, is_fastq_gen=False)
    assert a[2] == a[0]


def test_randomized_streams(oracle):
    """Fuzz: random mixes of gaps, contig switches, spans and depths."""
    rng = np.random.default_rng(11)
    contigs = [("c0", 500_000), ("c1", 400_000), ("c2", 300_000)]
    for trial in range(6):
        reads = []
        for tid in range(3):
            p = int(rng.integers(0, 500))
            n = int(rng.integers(20, 300))
            for _ in range(n):
                p += int(rng.integers(0, 260))   # sometimes > gap
                ln = int(rng.integers(50, 250))
                reads.append((tid, p, f"{ln}M", 99))
        mem = int(rng.choice([1, 3, 1536]))
        ref_bls, _, our_bls = _run_both(oracle, contigs, reads, mem_mb=mem)
        assert our_bls == ref_bls, (trial, mem)


def test_plan_matches_bedlines(oracle):
    """regions.plan() exposes the same bedlines as RegionPlans with
    per-plan claim windows and boundary read re-inclusion."""
    from uvc_tpu.io import bam, simulate

    ref = simulate.random_ref(9000, 3)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.bam")
        simulate.build_bam(path, ref, depth=60, seed=4)
        hdr, batch = bam.read_bam(path)
    reads = [(int(batch.tid[i]), int(batch.pos[i]),
              f"{int(batch.rend[i] - batch.pos[i])}M", int(batch.flag[i]))
             for i in range(batch.n)]
    ref_bls, _, _ = _run_both(oracle, [("chr1", 9000)], reads, mem_mb=2)
    plans = regions_mod.plan(batch, [9000], 2)
    assert [(p.tid, p.beg, p.end, p.t1_flag, p.t1_nreads) for p in plans] \
        == ref_bls
    # claim windows tile [beg+1, end+1) without overlap
    for a, b in zip(plans, plans[1:]):
        assert a.emit_hi == b.emit_lo or a.tid != b.tid
    # every read is inside at least one plan's read range
    covered = np.zeros(batch.n, dtype=bool)
    for p in plans:
        covered[p.read_beg:p.read_end] = True
    assert covered.all()


def _run_interval_mode(oracle, contigs, reads, ps_extra):
    oracle.send("clear")
    oracle.send("ps mem_per_thread=1536 max_cpu_num=1 "
                "fam_consensus_out_fastq= tier1_target_region=. "
                "bed_region_fname=. " + ps_extra)
    for name, ln in contigs:
        oracle.send(f"contig {name} {ln}")
    for (tid, pos, cig, flag) in reads:
        oracle.send(f"read {tid} {pos} {cig} {flag}")
    batches = oracle.run()
    return [bl for (_n, _f, bls) in batches for bl in bls]


def test_target_region_mode(oracle):
    """-R/--targets bedlines mode (grouping.cpp:69-107 + 168-213): the
    intervals ARE the regions, coordinates verbatim, 'chrom:pos' means
    [pos, pos+1), no gap/memory cuts inside an interval."""
    contigs = [("chr1", 50000), ("chr2", 40000)]
    reads = [(0, i * 40, "150M", 99) for i in range(400)]
    reads += [(1, i * 45, "150M", 99) for i in range(200)]
    target = "chr1:100-9000,chr2:5000,chr2:200-700"
    ref_bls = _run_interval_mode(
        oracle, contigs, reads, f"tier1_target_region={target}")
    ivs = regions_mod.parse_target_region(
        target, {"chr1": 0, "chr2": 1}, [50000, 40000])
    assert ref_bls == [(t, b, e, 0, 0) for (t, b, e) in ivs]
    # a >200bp coverage gap inside chr1:100-9000 must NOT split it
    assert ref_bls[0] == (0, 100, 9000, 0, 0)


def test_bed_region_mode(oracle, tmp_path):
    """--regions-bed bedlines mode incl. the BedLineFlag /
    NumberOfReadsInThisInterval tokens of a --bed-out round trip
    (grouping.cpp:113-157)."""
    contigs = [("chr1", 50000), ("chr2", 40000)]
    reads = [(0, i * 40, "150M", 99) for i in range(300)]
    bed = tmp_path / "t.bed"
    bed.write_text("chr1\t100\t9000\n"
                   "chr2\t50\t600\tBedLineFlag\t1"
                   "\tNumberOfReadsInThisInterval\t77\n")
    ref_bls = _run_interval_mode(
        oracle, contigs, reads, f"bed_region_fname={bed}")
    ivs = regions_mod.read_bed_intervals(str(bed), {"chr1": 0, "chr2": 1})
    assert ref_bls == ivs
    assert ivs[1] == (1, 50, 600, 1, 77)   # flag + nreads parsed


def test_plan_intervals_claims():
    """plan_intervals: one plan per interval with [beg+1, end+1) claims
    and boundary read re-inclusion."""
    from uvc_tpu.io import bam, simulate
    import tempfile

    ref = simulate.random_ref(9000, 3)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.bam")
        simulate.build_bam(path, ref, depth=40, seed=4)
        hdr, batch = bam.read_bam(path)
    ivs = [(0, 100, 4000, 0, 0), (0, 4000, 8999, 1, 3)]
    plans = regions_mod.plan_intervals(ivs, batch, [9000])
    assert [(p.tid, p.beg, p.end, p.t1_flag, p.t1_nreads)
            for p in plans] == ivs
    assert plans[0].emit_lo == 101 and plans[0].emit_hi == 4001
    assert plans[1].emit_lo == 4001
    # reads starting just before an interval are re-included
    assert plans[1].read_beg < plans[0].read_end


def test_region_read_filter_end_to_end():
    """BED_END_TO_END_BIT drops templates not spanning the bedline;
    OUT_OF_RANGE drops far-away templates (grouping.cpp:405-411)."""
    from uvc_tpu.io import bam as pybam, simulate
    from uvc_tpu.config import UVCConfig
    import tempfile

    ref = simulate.random_ref(3000, 1)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.bam")
        simulate.build_bam(path, ref, depth=30, seed=2)
        hdr, batch = pybam.read_bam(path)
    cfg = UVCConfig()
    plan = regions_mod.RegionPlan(tid=0, beg=1000, end=1100, read_beg=0,
                                  read_end=batch.n, t1_beg=1000,
                                  t1_end=1100, t1_flag=1)
    sub = regions_mod.region_read_filter(batch, plan, cfg)
    tob, toe = regions_mod.template_ord_bounds(sub)
    assert sub.n > 0
    assert (tob <= 1000).all() and (toe >= 1100).all()
    plan2 = regions_mod.RegionPlan(tid=0, beg=1000, end=1100, read_beg=0,
                                   read_end=batch.n, t1_beg=1000,
                                   t1_end=1100, t1_flag=0)
    sub2 = regions_mod.region_read_filter(batch, plan2, cfg)
    assert sub2.n > sub.n         # without the bit only far reads drop
