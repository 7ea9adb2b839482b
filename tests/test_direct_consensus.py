"""Parity: the sort-free direct consensus kernels (frag_cons_direct /
fam_cons_direct) against the sorting reference paths.

The direct kernels exploit the per-read / per-fragment sort invariants of
the event streams; these tests pin byte-identical output (same rows, same
order) on simulated data with SNVs, indels, UMIs and duplex families.
"""

import numpy as np
import pytest

from uvc_tpu.config import UVCConfig
from uvc_tpu.constants import CHAR_TO_SYMBOL, SequencingPlatform
from uvc_tpu.family import dedup
from uvc_tpu.io import simulate, native as io_native
from uvc_tpu.ops import native_rowpile as nr
from uvc_tpu.pileup import (bqcorr, consensus as cns, engine_bq, events,
                            strscan)


def _prep(tmp_path, depth=40, umi=False, duplex=False, seed=3):
    ref = simulate.random_ref(2500, seed=seed)
    variants = [
        simulate.Variant(400, f"{ref[400]}>A" if ref[400] != "A" else "A>C",
                         0.3),
        simulate.Variant(1000, "+AC", 0.25),
        simulate.Variant(1800, "-2", 0.3),
    ]
    path = str(tmp_path / "t.bam")
    simulate.build_bam(path, ref, depth=depth, variants=variants, seed=seed,
                       umi=umi, duplex=duplex)
    hdr, batch = io_native.read_bam_native(path)
    cfg = UVCConfig()
    ref_syms = np.asarray(CHAR_TO_SYMBOL)[np.frombuffer(ref.encode(),
                                                        np.uint8)]
    P = len(ref_syms)
    batch.qual = batch.qual.copy()
    bqcorr.apply(batch, cfg)
    table = events.expand(batch)
    famgrp = dedup.group_families(batch, table, cfg, cfg.assay_type,
                                  SequencingPlatform.ILLUMINA)
    tracks = strscan.scan_repeats(
        ref_syms, cfg.indel_str_repeatsize_max, cfg.indel_vntr_repeatsize_max,
        cfg.indel_BQ_max, cfg.indel_polymerase_slip_rate,
        cfg.indel_del_to_ins_err_ratio)
    kw = dict(indel_str_phred_per_region=cfg.indel_str_phred_per_region,
              indel_nonSTR_phred_per_base=cfg.indel_nonSTR_phred_per_base,
              indel_polymerase_size=cfg.indel_polymerase_size)
    baq = strscan.baq_offsets(tracks, use_anyTR=False, **kw)
    baq2 = strscan.baq_offsets(tracks, use_anyTR=True, **kw)
    dflag = famgrp.frag_dflag[famgrp.frag_of_read]
    prep = engine_bq.pass_a_prep(table, batch, ref_syms, tracks, baq, 0, P,
                                 cfg, dflag)
    thres = engine_bq.pass_b_thres(prep, tracks, cfg, False)
    allev, _ = engine_bq.compute_event_values(
        table, batch, ref_syms, tracks, baq, baq2, prep, thres, 0, P, cfg,
        dflag)
    return cfg, batch, famgrp, allev, P


@pytest.mark.skipif(not nr.available(), reason="native kernels not built")
@pytest.mark.parametrize("umi,duplex", [(False, False), (True, False),
                                        (True, True)])
def test_frag_cons_direct_parity(tmp_path, umi, duplex):
    cfg, batch, famgrp, allev, P = _prep(tmp_path, umi=umi, duplex=duplex)
    frag = famgrp.frag_of_read[allev.read]
    uniq = cns.segment_reduce_max(frag, allev.pos, allev.sym, allev.val, P)
    want = cns.consensus_by_group(*uniq, P, link_m_overridden=True)
    got6 = nr.frag_cons_direct(allev, famgrp.frag_of_read, famgrp.n_frags, P)
    assert got6 is not None
    got = cns.GroupConsensus(*got6)
    for name in ("group", "pos", "st", "con_sym", "con_cnt", "tot"):
        np.testing.assert_array_equal(getattr(want, name),
                                      getattr(got, name), err_msg=name)


@pytest.mark.skipif(not nr.available(), reason="native kernels not built")
@pytest.mark.parametrize("umi,duplex", [(False, False), (True, False),
                                        (True, True)])
def test_fam_cons_direct_parity(tmp_path, umi, duplex):
    cfg, batch, famgrp, allev, P = _prep(tmp_path, umi=umi, duplex=duplex)
    frag = famgrp.frag_of_read[allev.read]
    _, fc = cns.reduce_and_consensus(frag, allev.pos, allev.sym, allev.val,
                                     P, "max", link_m_overridden=True)
    old = nr.reduce_consensus2_fc(
        fc.group, fc.pos, fc.con_sym, fc.con_cnt, fc.tot, fc.st,
        famgrp.fam_of_frag, cfg.fam_thres_highBQ_snv, P, fetch_unique=True)
    new = nr.fam_cons_direct(
        fc.group, fc.pos, fc.con_sym, fc.con_cnt, fc.tot, fc.st,
        famgrp.fam_of_frag, famgrp.n_fams, cfg.fam_thres_highBQ_snv, P,
        fetch_unique=True)
    assert old is not None and new is not None
    for part in range(3):
        for x, y in zip(old[part], new[part]):
            np.testing.assert_array_equal(x, y)


@pytest.mark.skipif(not nr.available(), reason="native kernels not built")
def test_frag_cons_direct_rejects_unsorted(tmp_path):
    """An out-of-order stream must trigger the sorting-path fallback."""
    cfg, batch, famgrp, allev, P = _prep(tmp_path)
    allev.pos = allev.pos.copy()
    so = allev.stream_off
    if so[1] - so[0] >= 2:
        allev.pos[so[0]], allev.pos[so[0] + 1] = \
            allev.pos[so[0] + 1], allev.pos[so[0]]
    assert nr.frag_cons_direct(allev, famgrp.frag_of_read, famgrp.n_frags,
                               P) is None

@pytest.mark.skipif(not nr.available() or not nr.has_statics_path(),
                    reason="statics kernels not built")
@pytest.mark.parametrize("umi", [False, True])
def test_statics_resident_chain_parity(tmp_path, umi):
    """The statics-resident pass_d + family chain (rows never leave the
    .so) must reproduce the dense fetch path bit-for-bit: pass-D planes,
    mutforms, frag_indel, and every FQResult field."""
    from uvc_tpu.family import engine_fq
    from uvc_tpu.model import sscs
    from uvc_tpu.pileup import strscan
    from uvc_tpu.constants import CHAR_TO_SYMBOL

    cfg, batch, famgrp, allev, P = _prep(tmp_path, umi=umi, duplex=False)
    ref = None
    ref_syms = None
    # rebuild the inputs _prep used internally
    import uvc_tpu.io.simulate as simulate_mod
    ref = simulate_mod.random_ref(2500, seed=3)
    ref_syms = np.asarray(CHAR_TO_SYMBOL)[np.frombuffer(ref.encode(),
                                                        np.uint8)]
    tracks = strscan.scan_repeats(
        ref_syms, cfg.indel_str_repeatsize_max, cfg.indel_vntr_repeatsize_max,
        cfg.indel_BQ_max, cfg.indel_polymerase_slip_rate,
        cfg.indel_del_to_ins_err_ratio)
    kw = dict(indel_str_phred_per_region=cfg.indel_str_phred_per_region,
              indel_nonSTR_phred_per_base=cfg.indel_nonSTR_phred_per_base,
              indel_polymerase_size=cfg.indel_polymerase_size)
    baq = strscan.baq_offsets(tracks, use_anyTR=False, **kw)
    baq2 = strscan.baq_offsets(tracks, use_anyTR=True, **kw)
    table = events.expand(batch)
    dflag = famgrp.frag_dflag[famgrp.frag_of_read]
    prep = engine_bq.pass_a_prep(table, batch, ref_syms, tracks, baq, 0, P,
                                 cfg, dflag)
    thres = engine_bq.pass_b_thres(prep, tracks, cfg, False)
    allev, gap_info = engine_bq.compute_event_values(
        table, batch, ref_syms, tracks, baq, baq2, prep, thres, 0, P, cfg,
        dflag)
    info, bg, a1, a2 = engine_bq.pass_c_scatter(
        allev, table, baq, baq2, thres, 0, P, cfg, dflag)
    sscs_table = sscs.table_from_cfg(cfg)

    def run_chain(statics):
        fc = nr.frag_cons_direct(allev, famgrp.frag_of_read, famgrp.n_frags,
                                 P, fetch=not statics)
        assert fc is not None
        if not statics:
            fc = cns.GroupConsensus(*fc)
        pd = engine_bq.pass_d_fragments(
            allev, gap_info, table, ref_syms, famgrp.frag_of_read,
            famgrp.frag_strand, P, cfg, info, bg, frag_gc=fc, batch=batch)
        fq = engine_fq.run_fq(fc, gap_info, famgrp, ref_syms, sscs_table,
                              thres, baq, baq2, table, batch, P, cfg)
        return pd, fq

    pd_s, fq_s = run_chain(statics=True)
    pd_d, fq_d = run_chain(statics=False)
    for i in range(5):
        np.testing.assert_array_equal(pd_s[i], pd_d[i], err_msg=f"pd[{i}]")
    assert pd_s[5] == pd_d[5]            # frag_indel
    assert pd_s[6] == pd_d[6]            # mutforms
    for name in ("cdp1", "cdp12", "cdp2", "cdp3", "cdp21", "cdpM", "cdpm",
                 "cdpD", "ddp1", "ddp2", "vq_cIAQ", "vq_cIAD", "vq_cIDQ"):
        np.testing.assert_array_equal(getattr(fq_s, name),
                                      getattr(fq_d, name), err_msg=name)
    for nm in engine_fq.C2_NAMES:
        np.testing.assert_array_equal(fq_s.c2info[nm], fq_d.c2info[nm],
                                      err_msg=nm)
    assert fq_s.fam_indel == fq_d.fam_indel
    assert fq_s.mutforms_fq == fq_d.mutforms_fq
    assert fq_s.mutforms_f2q == fq_d.mutforms_f2q

@pytest.mark.skipif(not nr.available(), reason="native kernels not built")
def test_event_values_native_parity(tmp_path):
    """event_values_base_link writes the same allev rows as the numpy
    base/LINK_M path (incl. the interfering-distance fix-ups on
    indel-carrying reads)."""
    from uvc_tpu.constants import CHAR_TO_SYMBOL
    import uvc_tpu.io.simulate as simulate_mod

    cfg, batch, famgrp, _, P = _prep(tmp_path, depth=50)
    ref = simulate_mod.random_ref(2500, seed=3)
    ref_syms = np.asarray(CHAR_TO_SYMBOL)[np.frombuffer(ref.encode(),
                                                        np.uint8)]
    tracks = strscan.scan_repeats(
        ref_syms, cfg.indel_str_repeatsize_max, cfg.indel_vntr_repeatsize_max,
        cfg.indel_BQ_max, cfg.indel_polymerase_slip_rate,
        cfg.indel_del_to_ins_err_ratio)
    kw = dict(indel_str_phred_per_region=cfg.indel_str_phred_per_region,
              indel_nonSTR_phred_per_base=cfg.indel_nonSTR_phred_per_base,
              indel_polymerase_size=cfg.indel_polymerase_size)
    baq = strscan.baq_offsets(tracks, use_anyTR=False, **kw)
    baq2 = strscan.baq_offsets(tracks, use_anyTR=True, **kw)
    table = events.expand(batch)
    dflag = famgrp.frag_dflag[famgrp.frag_of_read]
    prep = engine_bq.pass_a_prep(table, batch, ref_syms, tracks, baq, 0, P,
                                 cfg, dflag)
    thres = engine_bq.pass_b_thres(prep, tracks, cfg, False)

    got, ginfo = engine_bq.compute_event_values(
        table, batch, ref_syms, tracks, baq, baq2, prep, thres, 0, P, cfg,
        dflag)
    lib = nr._load()
    saved = lib.event_values_base_link
    try:
        delattr(type(lib), "event_values_base_link")
    except AttributeError:
        pass
    import ctypes
    # hide the symbol so the python path runs
    class _NoEv:
        def __getattr__(self, nm):
            if nm == "event_values_base_link":
                raise AttributeError(nm)
            return getattr(lib, nm)
    nr._LIB = _NoEv()
    try:
        want, winfo = engine_bq.compute_event_values(
            table, batch, ref_syms, tracks, baq, baq2, prep, thres, 0, P,
            cfg, dflag)
    finally:
        nr._LIB = lib
    for nm in ("pos", "sym", "val", "read", "is_gap", "cigar_op",
               "indel_len", "dist", "stream_off"):
        np.testing.assert_array_equal(getattr(want, nm), getattr(got, nm),
                                      err_msg=nm)
    for a, b in zip(winfo, ginfo):
        np.testing.assert_array_equal(a, b)

@pytest.mark.skipif(not nr.available(), reason="native kernels not built")
def test_expand_bases_native_parity(tmp_path):
    """expand_bases_kernel writes the same BaseEvents as the numpy
    repeat/cumsum cascade."""
    ref = simulate.random_ref(4000, 8)
    variants = [simulate.Variant(500, "+GAT", 0.4),
                simulate.Variant(2000, "-3", 0.4)]
    path = str(tmp_path / "t.bam")
    simulate.build_bam(path, ref, depth=60, variants=variants, seed=8)
    hdr, batch = io_native.read_bam_native(path)
    n_bases = int((batch.cigar_len * np.isin(
        batch.cigar_op, (0, 7, 8))).sum())
    got = events._expand_bases_native(batch, n_bases)
    assert got is not None, "workload too small for the native path"
    import uvc_tpu.pileup.events as ev_mod
    orig = ev_mod._expand_bases_native
    ev_mod._expand_bases_native = lambda *a: None
    try:
        want = events.expand(batch).bases
    finally:
        ev_mod._expand_bases_native = orig
    for nm in ("read", "rpos", "qpos", "sym", "bq", "interior",
               "op_index", "i2"):
        np.testing.assert_array_equal(getattr(want, nm), getattr(got, nm),
                                      err_msg=nm)
