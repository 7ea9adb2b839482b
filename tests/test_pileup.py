"""Pileup engine tests: STR scanning micro-cases, CIGAR expansion
invariants, and BQ-tier end-to-end sanity on simulated data."""

import numpy as np
import pytest

from uvc_tpu.config import UVCConfig
from uvc_tpu.constants import Symbol, CHAR_TO_SYMBOL
from uvc_tpu.io import bam, simulate
from uvc_tpu.io.bam import BAM_CMATCH, BAM_CINS, BAM_CDEL, BAM_CSOFT_CLIP
from uvc_tpu.pileup import strscan, events, engine_bq


def _sym(s):
    from uvc_tpu.constants import CHAR_TO_SYMBOL
    return CHAR_TO_SYMBOL[np.frombuffer(s.encode(), dtype=np.uint8)]


# ---------------------------------------------------------------------------
# strscan


def test_runlens():
    ref = np.frombuffer(b"AAAATCGA", dtype=np.uint8)
    run = strscan._runlens(ref, 1)
    # A==A at 0,1,2 -> run[0]=3, run[1]=2, run[2]=1, run[3]=0 (A!=T)...
    assert list(run) == [3, 2, 1, 0, 0, 0, 0, 0]


def test_best_repeat_context_homopolymer():
    ref = np.frombuffer(b"GGAAAAAAGT", dtype=np.uint8)
    num, unit, end = strscan.best_repeat_context(ref, 6)
    # position 2: A x 6 homopolymer
    assert unit[2] == 1 and num[2] == 6 and end[2] == 8
    # position 0: GG = 2x G
    assert unit[0] == 1 and num[0] == 2
    # last position: no repeat
    assert unit[9] == 1 and num[9] == 1


def test_best_repeat_context_dinucleotide():
    ref = np.frombuffer(b"TTACACACACGG", dtype=np.uint8)
    num, unit, end = strscan.best_repeat_context(ref, 6)
    # position 2: ACACACAC = 4 x AC; rank (4-1)*2=6 beats T homopolymer etc.
    assert unit[2] == 2 and num[2] == 4
    assert end[2] == 2 + 8


def test_scan_repeats_tracks_and_phred():
    ref = b"GATCGATTTTTTTTTTCGATCGA"
    tr = strscan.scan_repeats(ref)
    # inside the T10 homopolymer the track is marked
    i = 8
    assert tr.unitlen[i] == 1
    assert tr.tracklen[i] == 10
    assert tr.begpos[i] == 6
    # indelphred inside a long homopolymer is sharply reduced vs max 42
    assert tr.indelphred[i] < 30
    # non-repeat position keeps max
    assert tr.indelphred[1] == 42
    # sentinel appended
    assert len(tr.begpos) == len(ref) + 1


def test_indel_phred_values():
    # indel_phred is the slippage PENALTY (decphred): ~0 for isolated bases
    v = strscan.indel_phred(8.0, 1, 1)
    assert v <= 1
    # long homopolymer: heavy slippage -> large penalty
    v2 = strscan.indel_phred(8.0 * 5.0, 1, 12)
    assert v2 >= 15


def test_baq_offsets_monotone():
    ref = b"GATCGATTTTTTTTTTCGATCGA"
    tr = strscan.scan_repeats(ref)
    baq = strscan.baq_offsets(tr, use_anyTR=False)
    assert np.all(np.diff(baq) >= 0)
    # non-STR regions accrue 5/base; STR region accrues ~1/track
    assert baq[5] - baq[0] == 25


# ---------------------------------------------------------------------------
# events


def _mini_batch(tmp_path, recs, ref_len=60):
    p = str(tmp_path / "m.bam")
    bam.write_bam(p, "@HD\tVN:1.6\n", [("chr1", ref_len)], recs)
    return bam.read_bam(p)[1]


def test_expand_basic(tmp_path):
    recs = [
        ("r1", 0x63, 0, 10, 60, [(BAM_CMATCH, 8)], 0, 30, 28, "ACGTACGT", "I" * 8),
        ("r2", 0x93, 0, 12, 60,
         [(BAM_CSOFT_CLIP, 2), (BAM_CMATCH, 3), (BAM_CINS, 2), (BAM_CMATCH, 2),
          (BAM_CDEL, 3), (BAM_CMATCH, 1)], 0, 10, -28, "TTACGTTACG", "J" * 10),
    ]
    batch = _mini_batch(tmp_path, recs)
    t = events.expand(batch)
    r = t.reads
    assert list(r.pos) == [10, 12]
    assert list(r.rend) == [18, 12 + 3 + 2 + 3 + 1]
    assert list(r.nge_cnt) == [0, 5]
    assert list(r.ngo_cnt) == [0, 2]
    assert list(r.clip_cnt) == [0, 1]
    assert list(r.lclip) == [0, 2]
    assert list(r.inslen_sum) == [0, 2]
    assert list(r.dellen_sum) == [0, 3]
    # base events: read0: 8 bases at rpos 10..17, qpos 0..7
    m0 = t.bases.read == 0
    assert list(t.bases.rpos[m0]) == list(range(10, 18))
    assert list(t.bases.qpos[m0]) == list(range(0, 8))
    assert list(t.bases.interior[m0]) == [False] + [True] * 7
    # read1: M3 at 12..14 (qpos 2..4), M2 at 15..16 (qpos 7..8), M1 at 20
    m1 = t.bases.read == 1
    assert list(t.bases.rpos[m1]) == [12, 13, 14, 15, 16, 20]
    assert list(t.bases.qpos[m1]) == [2, 3, 4, 7, 8, 9]
    assert list(t.bases.interior[m1]) == [False, True, True, False, True, False]
    # gaps: ins len2 at rpos15 qpos5; del len3 at rpos17 qpos9
    g = t.gaps
    assert list(g.rpos) == [15, 17]
    assert list(g.oplen) == [2, 3]
    assert list(g.is_del) == [False, True]
    assert list(g.qpos) == [5, 9]
    # nbases2end: ins: min(5, 10-(5+2))=3 ; del: min(9, 10-9)=1
    assert list(g.nbases2end) == [3, 1]


def test_strand_flag_semantics(tmp_path):
    # paired reads: strand = isrc ^ isr2 via bam_get_strand
    recs = [
        ("a", 0x63, 0, 10, 60, [(BAM_CMATCH, 4)], 0, 30, 20, "ACGT", "IIII"),  # R1 fwd, mate rev
        ("a", 0x93, 0, 30, 60, [(BAM_CMATCH, 4)], 0, 10, -20, "ACGT", "IIII"),  # R2 rev
    ]
    recs += [
        # opposite template orientation (R1 reverse): both mates strand 1
        ("b", 0x53, 0, 10, 60, [(BAM_CMATCH, 4)], 0, 30, 20, "ACGT", "IIII"),
        ("b", 0xA3, 0, 30, 60, [(BAM_CMATCH, 4)], 0, 10, -20, "ACGT", "IIII"),
    ]
    batch = _mini_batch(tmp_path, recs)
    t = events.expand(batch)
    # bam_get_strand (common.hpp:90): R2 uses the mate-reverse bit, so both
    # mates of one template share the template strand.
    assert list(t.reads.strand) == [False, False, True, True]


# ---------------------------------------------------------------------------
# BQ engine end-to-end invariants


@pytest.fixture(scope="module")
def simdata(tmp_path_factory):
    d = tmp_path_factory.mktemp("sim")
    fa, bam_path, ref, variants, n = simulate.build_test_dataset(str(d), seed=3)
    hdr, batch = bam.read_bam(bam_path)
    return ref, variants, batch


def test_bq_engine_depth_and_snv(simdata):
    ref, variants, batch = simdata
    cfg = UVCConfig()
    cfg.central_readlen = 100
    ref_syms = _sym(ref)
    res = engine_bq.run_bq(batch, ref_syms, 0, cfg)

    snv = variants[0]
    alt_sym = "ACGT".index(snv.spec.split(">")[1])
    ref_sym = "ACGT".index(snv.spec.split(">")[0])
    p = snv.pos

    # prep depth equals number of reads covering the position
    t = events.expand(batch)
    cov = int(np.sum((t.reads.pos <= p) & (p < t.reads.rend)))
    # a_dp counts aligned bases (M) + deleted positions
    assert abs(res.prep.a_dp[p] - cov) <= cov * 0.1 + 2

    # fragment depth: ALT fraction near planted 0.3 at the SNV
    bdp = res.bdp.sum(axis=2)
    tot = bdp[p, :6].sum()
    alt = bdp[p, alt_sym]
    assert tot > 20
    assert 0.12 < alt / tot < 0.55
    assert bdp[p, ref_sym] + alt >= 0.9 * tot

    # planted insertion registers at its STR-normalized symbol; the link
    # site is anchor+1 (between the anchor base and the next ref base)
    from conftest import expected_indel_symbol
    ins = variants[1]
    ins_sym = expected_indel_symbol(ref, ins.pos + 1, 2, False)
    bdp_ins = bdp[ins.pos + 1, ins_sym]
    link_tot = bdp[ins.pos + 1, 6:].sum()
    assert bdp_ins > 0
    assert 0.08 < bdp_ins / max(link_tot, 1) < 0.55

    # planted deletion (len 2) at pos 2000 registers at link pos 2001
    dele = variants[2]
    del_sym = expected_indel_symbol(ref, dele.pos + 1, 2, True)
    # deletion link symbol is placed at the first deleted base position
    dpos_candidates = [dele.pos, dele.pos + 1]
    assert max(bdp[q, del_sym] for q in dpos_candidates) > 0

    # strand split roughly even
    assert res.bdp[p, alt_sym, 0] > 0 and res.bdp[p, alt_sym, 1] > 0

    # IID quality exists at the SNV for the alt allele
    assert res.vq_bIAQ[p, alt_sym] > 0
    # quiet ref position: no alt IID quality
    q0 = 500
    for s in range(4):
        if s != ref_syms[q0]:
            assert res.bdp[q0, s, :].sum() == 0


def test_bq_engine_seginfo_consistency(simdata):
    ref, variants, batch = simdata
    cfg = UVCConfig()
    cfg.central_readlen = 100
    ref_syms = _sym(ref)
    res = engine_bq.run_bq(batch, ref_syms, 0, cfg)
    info = res.seginfo
    aDP4 = info.aDPff + info.aDPfr + info.aDPrf + info.aDPrr
    p = 1200
    rs = ref_syms[p]
    # quadrant depth for the ref base equals segment coverage there
    assert aDP4[p, rs] > 50
    # LINK_M coverage present (interior link positions)
    assert aDP4[p, int(Symbol.LINK_M)] > 50
    # aP2 == depth (non-amplicon): every event counts
    assert np.all(info.aP2[p] == aDP4[p])
    # aBQ2 <= depth
    assert np.all(info.aBQ2[p] <= aDP4[p])
    # bg bqsum roughly = depth * (BQ+1ish) for the ref base (BQ 35)
    assert res.bg_bqsum[p, rs] >= 30 * aDP4[p, rs]


def test_mutforms_phase(simdata):
    ref, variants, batch = simdata
    cfg = UVCConfig()
    cfg.central_readlen = 100
    res = engine_bq.run_bq(batch, _sym(ref), 0, cfg)
    # no two planted variants are within one fragment (500bp apart, frag 250)
    # so phase signatures should be absent or rare
    assert len(res.mutforms) <= 5


def test_iontorrent_proton_branches(tmp_path):
    """IonTorrent (TIsProton) event values differ from Illumina at
    homopolymer indels and gap-flanking bases (main.hpp:1922,1952-1974,
    2059-2072,2153-2163), and the end-to-end pipeline still calls the
    planted variants."""
    from uvc_tpu.config import UVCConfig
    from uvc_tpu.constants import SequencingPlatform
    from uvc_tpu import calling
    fa, bam_path, ref, variants, n = simulate.build_test_dataset(
        str(tmp_path), seed=31)
    hdr, batch = bam.read_bam(bam_path)
    cfg = UVCConfig()
    cfg.central_readlen = 100
    ref_syms = CHAR_TO_SYMBOL[np.frombuffer(ref.encode(), np.uint8)]
    P = len(ref_syms)
    table = events.expand(batch)
    tracks = strscan.scan_repeats(ref_syms)
    baq = strscan.baq_offsets(tracks, use_anyTR=False)
    baq2 = strscan.baq_offsets(tracks, use_anyTR=True)
    dflag = np.zeros(batch.n, dtype=np.int64)
    prep = engine_bq.pass_a_prep(table, batch, ref_syms, tracks, baq, 0, P,
                                 cfg, dflag)
    thres = engine_bq.pass_b_thres(prep, tracks, cfg, False)
    ev_il, _ = engine_bq.compute_event_values(
        table, batch, ref_syms, tracks, baq, baq2, prep, thres, 0, P, cfg,
        dflag, is_proton=False)
    ev_pr, _ = engine_bq.compute_event_values(
        table, batch, ref_syms, tracks, baq, baq2, prep, thres, 0, P, cfg,
        dflag, is_proton=True)
    assert len(ev_il.val) == len(ev_pr.val)
    # proton qualities are capped by local BQ context -> strictly more
    # conservative somewhere (LINK_M uses min(BQ,BQ_prev) instead of 80)
    assert (ev_pr.val <= ev_il.val).all()
    assert (ev_pr.val < ev_il.val).any()

    # end-to-end with the IonTorrent platform adjustments applied
    cfg2 = UVCConfig()
    cfg2.central_readlen = 100
    cfg2.self_update_by_platform(SequencingPlatform.IONTORRENT)
    cfg2.inferred_sequencing_platform = SequencingPlatform.IONTORRENT
    recs, res, F = calling.call_variants(batch, ref_syms, ref.encode(), 0,
                                         "chr1", cfg2)
    called = {(r.pos, r.alt) for r in recs if r.filter in ("PASS",)
              or r.filter.startswith("Q")}
    assert any(p == 1000 for p, _ in called), called
