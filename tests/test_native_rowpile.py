"""Parity test: the fused native pass-C kernel must reproduce the python
reference implementation exactly."""

import numpy as np
import pytest

from uvc_tpu.config import UVCConfig
from uvc_tpu.constants import CHAR_TO_SYMBOL, SequencingPlatform
from uvc_tpu.io import bam, simulate
from uvc_tpu.ops import native_rowpile
from uvc_tpu.pileup import engine_bq, events, strscan, region
from uvc_tpu.family import dedup


@pytest.mark.skipif(not native_rowpile.available(),
                    reason="native rowpile.so not built")
def test_pass_c_parity(tmp_path):
    fa, bam_path, ref, variants, n = simulate.build_test_dataset(
        str(tmp_path), seed=71)
    hdr, batch = bam.read_bam(bam_path)
    cfg = UVCConfig()
    cfg.central_readlen = 100
    cfg.self_update_by_platform(SequencingPlatform.ILLUMINA)
    ref_syms = CHAR_TO_SYMBOL[np.frombuffer(ref.encode(), np.uint8)]
    P = len(ref_syms)
    table = events.expand(batch)
    famgrp = dedup.group_families(batch, table, cfg)
    dflag = famgrp.frag_dflag[famgrp.frag_of_read]
    tracks = strscan.scan_repeats(ref_syms)
    baq = strscan.baq_offsets(tracks, use_anyTR=False)
    baq2 = strscan.baq_offsets(tracks, use_anyTR=True)
    prep = engine_bq.pass_a_prep(table, batch, ref_syms, tracks, baq, 0, P,
                                 cfg, dflag)
    thres = engine_bq.pass_b_thres(prep, tracks, cfg, False)
    allev, gi = engine_bq.compute_event_values(
        table, batch, ref_syms, tracks, baq, baq2, prep, thres, 0, P, cfg,
        dflag)
    i_py, bg_py, a1_py, a2_py = engine_bq.pass_c_scatter(
        allev, table, baq, baq2, thres, 0, P, cfg, dflag, use_native=False)
    i_nat, bg_nat, a1_nat, a2_nat = engine_bq.pass_c_scatter(
        allev, table, baq, baq2, thres, 0, P, cfg, dflag, use_native=True)
    assert np.array_equal(bg_py, bg_nat)
    assert np.array_equal(a1_py, a1_nat)
    assert np.array_equal(a2_py, a2_nat)
    for nm in engine_bq.SegInfo.names:
        assert np.array_equal(getattr(i_py, nm), getattr(i_nat, nm)), nm


@pytest.mark.skipif(not native_rowpile.available(),
                    reason="native rowpile.so not built")
def test_pass_d_parity(tmp_path):
    fa, bam_path, ref, variants, n = simulate.build_test_dataset(
        str(tmp_path), seed=72)
    hdr, batch = bam.read_bam(bam_path)
    cfg = UVCConfig()
    cfg.central_readlen = 100
    cfg.self_update_by_platform(SequencingPlatform.ILLUMINA)
    ref_syms = CHAR_TO_SYMBOL[np.frombuffer(ref.encode(), np.uint8)]
    P = len(ref_syms)
    table = events.expand(batch)
    famgrp = dedup.group_families(batch, table, cfg)
    dflag = famgrp.frag_dflag[famgrp.frag_of_read]
    frag_of_read = famgrp.frag_of_read
    nf = int(frag_of_read.max()) + 1
    frag_strand = np.zeros(nf, dtype=np.int64)
    frag_strand[frag_of_read] = table.reads.strand
    tracks = strscan.scan_repeats(ref_syms)
    baq = strscan.baq_offsets(tracks, use_anyTR=False)
    baq2 = strscan.baq_offsets(tracks, use_anyTR=True)
    prep = engine_bq.pass_a_prep(table, batch, ref_syms, tracks, baq, 0, P,
                                 cfg, dflag)
    thres = engine_bq.pass_b_thres(prep, tracks, cfg, False)
    allev, gi = engine_bq.compute_event_values(
        table, batch, ref_syms, tracks, baq, baq2, prep, thres, 0, P, cfg,
        dflag)
    info, bg, a1, a2 = engine_bq.pass_c_scatter(
        allev, table, baq, baq2, thres, 0, P, cfg, dflag)
    out_py = engine_bq.pass_d_fragments(
        allev, gi, table, ref_syms, frag_of_read, frag_strand, P, cfg,
        info, bg, batch=batch, use_native=False)
    out_nat = engine_bq.pass_d_fragments(
        allev, gi, table, ref_syms, frag_of_read, frag_strand, P, cfg,
        info, bg, batch=batch, use_native=True)
    names = ("bdp", "bta", "btb", "hist", "vq_bMQ")
    for nm, a, b in zip(names, out_py[:5], out_nat[:5]):
        assert np.array_equal(a, b), nm
    assert out_py[5] == out_nat[5]  # frag_indel
    assert out_py[6] == out_nat[6]  # mutforms


@pytest.mark.skipif(not native_rowpile.available()
                    or not native_rowpile.has_reduce_consensus(),
                    reason="native rowpile.so not built")
@pytest.mark.parametrize("mode", ["max", "sum"])
@pytest.mark.parametrize("link_ovr", [False, True])
def test_reduce_consensus_parity(mode, link_ovr):
    from uvc_tpu.pileup import consensus as cns
    rng = np.random.default_rng(3)
    n, P = 50000, 500
    group = rng.integers(0, 800, n).astype(np.int64)
    pos = rng.integers(0, P, n).astype(np.int64)
    sym = rng.integers(0, 14, n).astype(np.int64)
    val = rng.integers(0, 60, n).astype(np.int64)  # includes zeros
    if mode == "max":
        uniq_py = cns.segment_reduce_max(group, pos, sym, val, P)
    else:
        uniq_py = cns.segment_reduce_sum(group, pos, sym, val, P)
    gc_py = cns.consensus_by_group(*uniq_py, P, link_m_overridden=link_ovr)
    uniq_nat, c = native_rowpile.reduce_consensus(
        group, pos, sym, val, P, 0 if mode == "max" else 1, link_ovr)
    for a, b in zip(uniq_py, uniq_nat):
        assert np.array_equal(a, b)
    gc_nat = cns.GroupConsensus(*c)
    for nm in ("group", "pos", "st", "con_sym", "con_cnt", "tot"):
        assert np.array_equal(getattr(gc_py, nm), getattr(gc_nat, nm)), nm


@pytest.mark.skipif(not native_rowpile.available(),
                    reason="native rowpile.so not built")
def test_radix_argsort():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 60, 100000).astype(np.int64)
    order = native_rowpile.radix_argsort(keys)
    assert np.array_equal(keys[order], np.sort(keys))
    # stability: equal keys preserve original order
    keys2 = np.repeat(np.arange(100, dtype=np.int64), 50)
    rng.shuffle(keys2)
    o2 = native_rowpile.radix_argsort(keys2)
    np_o = np.argsort(keys2, kind="stable")
    assert np.array_equal(o2, np_o)


@pytest.mark.skipif(not native_rowpile.available(),
                    reason="native rowpile.so not built")
def test_bq_corr_parity(tmp_path):
    """Native bq_corr_kernel matches the python reference exactly and
    dampens poly-G runs (grouping.cpp:459-543)."""
    from uvc_tpu.pileup import bqcorr
    from uvc_tpu.config import UVCConfig
    # reference with a long G run so poly-G damping triggers
    ref = simulate.random_ref(2000, 17)
    ref = ref[:900] + "G" * 12 + ref[912:]
    path = str(tmp_path / "g.bam")
    simulate.build_bam(path, ref, depth=40, seed=18)
    hdr, b1 = bam.read_bam(path)
    hdr, b2 = bam.read_bam(path)
    cfg = UVCConfig()
    orig = b1.qual.copy()
    bqcorr.apply_py(b1, cfg)
    bqcorr.apply(b2, cfg)
    assert np.array_equal(b1.qual, b2.qual)
    assert (b1.qual < orig).any()  # poly-G damping fired somewhere
    assert (b1.qual >= 1).all()


@pytest.mark.skipif(not native_rowpile.available(),
                    reason="native rowpile.so not built")
def test_str_track_parity(monkeypatch):
    """Native str_track_kernel matches the python skip-loop exactly."""
    from uvc_tpu.pileup import strscan
    ref = simulate.random_ref(5000, 23)
    # inject homopolymers and STRs
    ref = ref[:500] + "A" * 15 + ref[515:1000] + "ACG" * 9 + ref[1027:]
    syms = np.frombuffer(ref.encode(), np.uint8)
    t_nat = strscan.scan_repeats(syms)
    lib = native_rowpile._load()
    monkeypatch.setattr(native_rowpile, "_LIB", None)
    monkeypatch.setattr(native_rowpile, "_TRIED", True)
    try:
        t_py = strscan.scan_repeats(syms)
    finally:
        monkeypatch.setattr(native_rowpile, "_LIB", lib)
    for nm in ("begpos", "tracklen", "unitlen", "indelphred",
               "anyTR_begpos", "anyTR_tracklen", "anyTR_unitlen",
               "ctx_repeatnum", "ctx_unitlen"):
        assert np.array_equal(getattr(t_py, nm), getattr(t_nat, nm)), nm


@pytest.mark.skipif(not native_rowpile.has_reduce_consensus(),
                    reason="native rowpile.so not built")
def test_reduce_consensus2_parity():
    """Fused dual reduce (rc2_run) matches two separate rc_run calls."""
    rng = np.random.default_rng(7)
    n, P, G = 30000, 900, 400
    group = rng.integers(0, G, n)
    pos = rng.integers(0, P, n)
    sym = rng.integers(0, 14, n)
    val = rng.integers(1, 80, n)
    filt = rng.random(n) < 0.6
    fused = native_rowpile.reduce_consensus2(group, pos, sym, val, filt, P)
    assert fused is not None
    (fg, fp, fs, fcnt), c1, c2 = fused
    uniq_ref, c1_ref = native_rowpile.reduce_consensus(
        group[filt], pos[filt], sym[filt],
        np.ones(int(filt.sum()), dtype=np.int64), P, 1, False)
    _, c2_ref = native_rowpile.reduce_consensus(group, pos, sym, val,
                                                P, 1, False)
    for a, b in zip((fg, fp, fs, fcnt), uniq_ref):
        assert np.array_equal(a, b)
    for a, b in zip(c1, c1_ref):
        assert np.array_equal(a, b)
    for a, b in zip(c2, c2_ref):
        assert np.array_equal(a, b)


@pytest.mark.skipif(not native_rowpile.available(),
                    reason="native rowpile.so not built")
def test_fq_engine_native_parity(tmp_path, monkeypatch):
    """run_fq with the native sweep kernels matches the pure-python path
    field by field (incl. the float confam/bucket computations)."""
    from uvc_tpu.config import UVCConfig
    from uvc_tpu.pileup import region
    import numpy as np
    from uvc_tpu.constants import CHAR_TO_SYMBOL

    d = str(tmp_path)
    fa, bam_path, ref, variants, n = simulate.build_test_dataset(d, seed=9)
    hdr, batch = bam.read_bam(bam_path)
    cfg = UVCConfig()
    cfg.central_readlen = 100
    syms = CHAR_TO_SYMBOL[np.frombuffer(ref.encode(), np.uint8)]
    res_nat = region.call_region(batch, syms, 0, cfg)
    lib = native_rowpile._LIB
    monkeypatch.setattr(native_rowpile, "_LIB", None)
    monkeypatch.setattr(native_rowpile, "_TRIED", True)
    try:
        hdr, batch2 = bam.read_bam(bam_path)
        res_py = region.call_region(batch2, syms, 0, cfg)
    finally:
        monkeypatch.setattr(native_rowpile, "_LIB", lib)
    for nm in ("cdp1", "cdp12", "cdp2", "cdp3", "cdp21", "cdpM", "cdpm",
               "cdpD", "ddp1", "ddp2", "vq_cIAQ", "vq_cIAD", "vq_cIDQ"):
        a, b = getattr(res_nat.fq, nm), getattr(res_py.fq, nm)
        assert np.array_equal(a, b), nm
    assert res_nat.fq.mutforms_fq == res_py.fq.mutforms_fq
    assert res_nat.fq.mutforms_f2q == res_py.fq.mutforms_f2q
    for k in res_nat.fq.c2info:
        assert np.array_equal(res_nat.fq.c2info[k], res_py.fq.c2info[k]), k


@pytest.mark.skipif(not native_rowpile.available(),
                    reason="native rowpile.so not built")
def test_pass_a_parity(tmp_path, monkeypatch):
    """Native pass_a_kernel matches the python M-base accumulation exactly
    (incl. the (read,diagonal)-segmented mismatch-run intervals)."""
    from uvc_tpu.config import UVCConfig
    from uvc_tpu.pileup import engine_bq, events, strscan
    import numpy as np
    from uvc_tpu.constants import CHAR_TO_SYMBOL

    d = str(tmp_path)
    ref = simulate.random_ref(4000, 31)
    variants = [simulate.Variant(900, "+GAT", 0.4),
                simulate.Variant(2100, "-3", 0.4),
                simulate.Variant(3000, f"{ref[3000]}>"
                                 + ("T" if ref[3000] != "T" else "C"), 0.4)]
    path = d + "/p.bam"
    simulate.build_bam(path, ref, depth=60, variants=variants, seed=77)
    hdr, batch = bam.read_bam(path)
    cfg = UVCConfig()
    syms = CHAR_TO_SYMBOL[np.frombuffer(ref.encode(), np.uint8)]
    table = events.expand(batch)
    tracks = strscan.scan_repeats(syms, cfg.indel_str_repeatsize_max,
                                  cfg.indel_vntr_repeatsize_max)
    baq = strscan.baq_offsets(tracks, use_anyTR=False)
    P = len(syms)
    dflag = np.full(batch.n, 0x3, dtype=np.int64)
    prep_nat = engine_bq.pass_a_prep(table, batch, syms, tracks, baq, 0, P,
                                     cfg, dflag)
    lib = native_rowpile._LIB
    monkeypatch.setattr(native_rowpile, "_LIB", None)
    monkeypatch.setattr(native_rowpile, "_TRIED", True)
    try:
        prep_py = engine_bq.pass_a_prep(table, batch, syms, tracks, baq, 0,
                                        P, cfg, dflag)
    finally:
        monkeypatch.setattr(native_rowpile, "_LIB", lib)
    for nm in prep_py.names:
        assert np.array_equal(getattr(prep_nat, nm), getattr(prep_py, nm)), nm


@pytest.mark.skipif(not native_rowpile.available(),
                    reason="native rowpile.so not built")
def test_dp4_native_parity():
    """Native dp4_kernel matches the numpy _dp4 bit for bit (both
    variants, with and without the interpolating averages)."""
    from uvc_tpu.model import dpv
    rng = np.random.default_rng(13)
    shape = (600, 14)
    adp = rng.integers(0, 60, shape).astype(np.float64)
    adf = rng.integers(0, 60, shape).astype(np.float64)
    dpp = adp + rng.integers(0, 100, shape)
    dpf = adf + rng.integers(0, 100, shape)
    osf = rng.random(shape) * 2
    nn = rng.random(shape) * 5
    ad_avg = np.where(rng.random(shape) < 0.5, rng.random(shape) * 40, -1.0)
    dp_avg = np.abs(ad_avg) + rng.random(shape) * 40
    lib = native_rowpile._LIB
    for kwargs in (
            dict(bidirectional=False),
            dict(bidirectional=True),
            dict(bidirectional=False, ad_avg=ad_avg, dp_avg=dp_avg),
            dict(bidirectional=False, osf_disabled=True),
            dict(priorAD=0.25, priorDP=2.0, bidirectional=True)):
        pc_n, nb_n = dpv._dp4(osf, adp, adf, dpp, dpf, 3.0, nn, **kwargs)
        native_rowpile._LIB = None
        try:
            pc_p, nb_p = dpv._dp4(osf, adp, adf, dpp, dpf, 3.0, nn, **kwargs)
        finally:
            native_rowpile._LIB = lib
        assert np.array_equal(pc_n, pc_p, equal_nan=True), kwargs
        assert np.array_equal(nb_n, nb_p, equal_nan=True), kwargs
