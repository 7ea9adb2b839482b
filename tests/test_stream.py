"""Streaming tier-1 input pipeline (io/stream.py).

The windowed decoder must produce plan boundaries and read content
bit-identical to the whole-file scheduler (grouping.cpp:157-314 semantics),
and the CLI must emit an identical VCF when forced through many tiny
tier-1 windows (memory-bounded streaming, main.cpp:1350-1357 analog).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from uvc_tpu.io import simulate, bgzf
from uvc_tpu.io import bam as pybam
from uvc_tpu.io import native as native_io
from uvc_tpu.schedule import regions as regions_mod

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native decoder not built")

ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_bam(tmp_path, n_pos=30000, depth=120, seed=6):
    ref = simulate.random_ref(n_pos, 5)
    variants = [simulate.Variant(p, f"{ref[p]}>" + ("A" if ref[p] != "A" else "C"), 0.25)
                for p in range(2000, n_pos - 2000, 2500)]
    bam = str(tmp_path / "s.bam")
    simulate.build_bam(bam, ref, depth=depth, variants=variants, seed=seed)
    fa = str(tmp_path / "ref.fa")
    open(fa, "w").write(">chr1\n" + ref + "\n")
    return bam, fa, ref


def _plan_key(p):
    return (p.tid, p.beg, p.end, p.t1_flag, p.t1_nreads,
            p.ext_beg, p.ext_end, p.emit_lo, p.emit_hi)


def _plan_content(batch, p):
    sub = regions_mod.slice_batch(batch, p)
    return (sub.qname_data, sub.pos.tobytes(), sub.seq.tobytes(),
            sub.qual.tobytes(), sub.cigar_op.tobytes())


def test_windows_equal_whole_file(tmp_path):
    """Streamed windows must yield the same bedlines AND the same
    per-plan read content as the whole-file scheduler."""
    from uvc_tpu.io import stream as stream_mod
    bam, fa, ref = _make_bam(tmp_path)
    header, whole = native_io.read_bam_native(bam)
    for mem_mb in (3, 1536):
        whole_plans = regions_mod.plan(whole, header.ref_lens, mem_mb)
        t1 = stream_mod.Tier1Stream(bam, header.ref_lens, mem_mb)
        got_keys, got_content = [], []
        for b, plans in stream_mod.prefetch(iter(t1)):
            got_keys += [_plan_key(p) for p in plans]
            got_content += [_plan_content(b, p) for p in plans]
        assert got_keys == [_plan_key(p) for p in whole_plans]
        assert got_content == [_plan_content(whole, p) for p in whole_plans]


def test_stream_window_memory_is_bounded(tmp_path):
    """With a small memory model the stream must emit MANY windows, each
    holding a strict fraction of the file's reads (the open block plus the
    refetch pad is all that may be retained across windows)."""
    from uvc_tpu.io import stream as stream_mod
    bam, fa, ref = _make_bam(tmp_path)
    header, whole = native_io.read_bam_native(bam)
    mem_mb = 2
    chunk = 256 << 10   # small decode chunks so window granularity is fine
    t1 = stream_mod.Tier1Stream(
        bam, header.ref_lens, mem_mb,
        stream=stream_mod.BamStream(bam, chunk_bytes=chunk))
    n_windows = 0
    max_resident_reads = 0
    for b, plans in t1:
        n_windows += 1
        max_resident_reads = max(max_resident_reads, b.n)
        assert len(plans) >= 1
    assert n_windows > 2, "expected multiple windows at this budget"
    # every window holds a strict fraction of the file's reads
    assert max_resident_reads < whole.n // 2


def test_cli_streaming_windows_identical_output(tmp_path):
    """Forcing many tiny tier-1 windows (same region schedule) must emit a
    byte-identical VCF to the single-window run."""
    bam, fa, ref = _make_bam(tmp_path, n_pos=12000, depth=80)
    outs = []
    for tag, extra_env in (("one", {}),
                           ("many", {"UVC_TPU_TIER1_BYTES": str(1 << 20),
                                     "UVC_TPU_STREAM_CHUNK": str(128 << 10)})):
        out = str(tmp_path / f"o_{tag}.vcf.gz")
        subprocess.run(
            [sys.executable, "-m", "uvc_tpu.cli.uvc1", "-f", fa, "-o", out,
             "-t", "2", "--mem-per-thread", "2", bam],
            check=True, env=dict(ENV, **extra_env), capture_output=True)
        outs.append([l for l in bgzf.decompress(open(out, "rb").read())
                     .decode().splitlines() if not l.startswith("##")])
    assert outs[0] == outs[1]
    assert sum(1 for l in outs[0] if "\tMGVCF_BLOCK\t" in l) > 3


def test_bai_write_read_fetch_matches_brute_force(tmp_path):
    from uvc_tpu.io import bai as bai_mod
    bam, fa, ref = _make_bam(tmp_path, n_pos=60000, depth=60)
    bai = bai_mod.write_bai(bam)
    linear = bai_mod.read_bai(bai)
    header, whole = native_io.read_bam_native(bam)
    rend = whole.rend
    for beg, end in ((0, 1000), (30000, 32000), (59000, 60000)):
        got = bai_mod.fetch_interval(bam, linear, 0, beg, end)
        keep = (whole.tid == 0) & (whole.pos < end) & (rend > beg)
        want = pybam.subset_batch(whole, np.flatnonzero(keep))
        assert got.n == want.n
        assert np.array_equal(got.pos, want.pos)
        assert got.qname_data == want.qname_data


def test_cli_targets_with_bai_calls_same_variants(tmp_path):
    """--targets with a .bai present must call the same variants as the
    full-scan + restrict path (region decomposition may differ, as in the
    reference's targeted SamIter, so only the call set is compared)."""
    from uvc_tpu.io import bai as bai_mod
    bam, fa, ref = _make_bam(tmp_path, n_pos=30000, depth=80)
    target = "chr1:9500-15000"

    def run(with_bai):
        out = str(tmp_path / f"t_{with_bai}.vcf.gz")
        bai = bam + ".bai"
        if with_bai:
            bai_mod.write_bai(bam)
        elif os.path.exists(bai):
            os.remove(bai)
        subprocess.run(
            [sys.executable, "-m", "uvc_tpu.cli.uvc1", "-f", fa, "-o", out,
             "-t", "1", "--targets", target, bam],
            check=True, env=ENV, capture_output=True)
        lines = [l for l in bgzf.decompress(open(out, "rb").read())
                 .decode().splitlines() if not l.startswith("#")]
        calls = {tuple(l.split("\t")[:5]) for l in lines
                 if "ANY_VAR" in l.split("\t")[7]}
        return calls

    calls_scan = run(False)
    calls_bai = run(True)
    assert calls_bai == calls_scan
    assert len(calls_bai) >= 2   # targets cover at least two variants
