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
    ps = [f"mem_per_thread={mem_mb}", f"max_cpu_num={nthreads}"]
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
