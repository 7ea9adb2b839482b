"""BQ-tier pileup engine: prep counters, data-driven thresholds, per-event
quality increments, segment-bias classification, and fragment consensus.

This replaces the reference's CIGAR-walk passes (SURVEY.md §3.3) with
vectorized passes over the flat event table:

  pass A  update_seg_format_prep_sets_by_aln   main.hpp:925-1204
  pass B  update_seg_format_thres_from_prep    main.hpp:1206-1299
  pass C  updateByAln<SUM> + dealwith_segbias  main.hpp:1762-2296,1360-1595
  pass D  fragment R1R2 MAX-merge -> FRAG_bDP,
          BQ bucket histograms                 main.hpp:2620-2830
  final   infer_max_qual IID qualities         main.hpp:2801-2828

All arrays are region-relative ([P] or [P,14]), int64 numpy; interval adds
use difference arrays (including quadratic ramps for the pow2len counters),
point adds use np.add.at. Both the Illumina and the IonTorrent (TIsProton)
incvalue branches are implemented (is_proton selects them).
"""

from dataclasses import dataclass, field

import numpy as np

from uvc_tpu.ops.scatter import fast_add_at

from ..constants import Symbol, NUM_SYMBOLS, MAX_INSERT_SIZE
from ..io.bam import BAM_CINS, BAM_CDEL
from ..ops.math import NUM_BUCKETS
from . import events as ev
from . import strscan

INV_LOG10 = 10.0 / np.log(10.0)
SQR_QUAL_DIV = 32


def _interval_add(diff: np.ndarray, beg, end, val=1):
    """diff-array interval add: [beg, end) += val (vectorized over events)."""
    beg = np.asarray(beg)
    end = np.asarray(end)
    ok = end > beg
    fast_add_at(diff, beg[ok], val if np.isscalar(val) else val[ok])
    fast_add_at(diff, end[ok], -val if np.isscalar(val) else -val[ok])


def _zeros(P):
    return np.zeros(P, dtype=np.int64)


@dataclass
class SegPrep:
    """Per-position prep counters (SegFormatPrepSet, main_conversion.hpp:541-605)."""

    P: int
    names = ("a_dp a_near_ins_dp a_near_del_dp a_near_RTR_ins_dp "
             "a_near_RTR_del_dp a_pcr_dp a_umi_dp a_snv_dp a_dnv_dp "
             "a_highBQ_dp a_near_pcr_clip_dp a_near_long_clip_dp a_at_ins_dp "
             "a_at_del_dp a_XM1500 a_GO1500 a_GAPLEN a_qlen "
             "a_near_ins_pow2len a_near_del_pow2len a_near_ins_inv100len "
             "a_near_del_inv100len a_near_ins_l_pow2len a_near_ins_r_pow2len "
             "a_near_del_l_pow2len a_near_del_r_pow2len a_LI a_LIDP a_RI "
             "a_RIDP a_l_dist_sum a_r_dist_sum a_inslen_sum a_dellen_sum "
             "a_l_BAQ_sum a_r_BAQ_sum a_insBAQ_sum a_delBAQ_sum").split()

    def __post_init__(self):
        for nm in self.names:
            setattr(self, nm, _zeros(self.P))


@dataclass
class SegThres:
    """Per-position data-driven bias thresholds (SegFormatThresSet)."""

    P: int
    names = ("aLPxT aRPxT aLI1T aLI2T aRI1T aRI2T aLI1t aLI2t aRI1t aRI2t "
             "aLP1t aLP2t aRP1t aRP2t aLB1t aLB2t aRB1t aRB2t").split()

    def __post_init__(self):
        for nm in self.names:
            setattr(self, nm, _zeros(self.P))


@dataclass
class SegInfo:
    """Per-(position, symbol) bias-classified depths (SegFormatInfoSet)."""

    P: int
    names = ("a2XM2 a2BM2 aPF1 aPF2 aBQ2 aMQs aP1 aP2 aP3 aNC "
             "aDPff aDPfr aDPrf aDPrr aLP1 aLP2 aLPL aRP1 aRP2 aRPL "
             "aLB1 aLB2 aLBL aRB1 aRB2 aRBL aLI1 aLI2 aRI1 aRI2 "
             "aRIf aLIr aLIT aRIT").split()

    def __post_init__(self):
        for nm in self.names:
            setattr(self, nm, np.zeros((self.P, NUM_SYMBOLS), dtype=np.int64))


@dataclass
class BQResult:
    prep: SegPrep
    thres: SegThres
    seginfo: SegInfo
    bg_bqsum: np.ndarray       # [P,14] sum of incvalues (bg_seg_bqsum_conslogo)
    vq_a1BQ: np.ndarray        # [P,14,2] f/r raw BQ sums
    vq_a2BQ: np.ndarray        # [P,14,2] f/r squared-BQ/32 sums
    vq_bMQ: np.ndarray         # [P,14] fragment MQ^2/32 sums
    bdp: np.ndarray            # [P,14,2] FRAG_bDP per strand
    bta: np.ndarray            # [P,14,2] FRAG_bTA per strand
    btb: np.ndarray            # [P,14,2] FRAG_bTB per strand
    bucket_hist: np.ndarray    # [P,14,16] dedup_ampDistr BQ buckets
    vq_bIAQ: np.ndarray        # [P,14] IID binomial quality
    vq_bIAD: np.ndarray        # [P,14]
    vq_bIDQ: np.ndarray        # [P,14]
    frag_indel: dict           # (pos, sym) -> {indel_key: bDP count}
    mutforms: dict             # phase signature -> [fwd_count, rev_count]


# ---------------------------------------------------------------------------
# pass A


def pass_a_prep(table: ev.EventTable, batch, ref_syms: np.ndarray,
                tracks: strscan.RepeatTracks,
                baq: np.ndarray, region_offset: int, P: int, cfg,
                dflag: np.ndarray) -> SegPrep:
    prep = SegPrep(P)
    r = table.reads
    b = table.bases
    g = table.gaps
    off = region_offset

    pcr_inc = ((dflag & 0x4) != 0).astype(np.int64)
    umi_inc = ((dflag & 0x1) != 0).astype(np.int64)

    from ..ops import native_rowpile as _nr
    nat = _nr.pass_a_native(table, batch, ref_syms, baq, off, P,
                            cfg.bias_thres_highBQ, MAX_INSERT_SIZE,
                            pcr_inc, umi_inc) if len(b.rpos) > 4096 else None
    if nat is not None:
        planes, insbaq, delbaq = nat
        for nm, v in planes.items():
            getattr(prep, nm)[:] += v
    else:
        # --- per-M-base point adds
        bi = (b.rpos - off).astype(np.int64)
        br = b.read
        span = r.rend - r.pos
        fast_add_at(prep.a_pcr_dp, bi, pcr_inc[br])
        fast_add_at(prep.a_umi_dp, bi, umi_inc[br])
        fast_add_at(prep.a_dp, bi, 1)
        fast_add_at(prep.a_qlen, bi, span[br])
        fast_add_at(prep.a_XM1500, bi, r.xm1500[br])
        fast_add_at(prep.a_GO1500, bi, r.go1500[br])
        fast_add_at(prep.a_GAPLEN, bi, r.avg_gaplen[br])

        has_isize = r.isize[br] != 0
        m_rc = r.isrc[br] & has_isize
        m_fw = (~r.isrc[br]) & has_isize
        li_val = np.minimum(b.rpos - r.frag_pos_L[br] + 1, MAX_INSERT_SIZE)
        ri_val = np.minimum(r.frag_pos_R[br] - b.rpos, MAX_INSERT_SIZE)
        fast_add_at(prep.a_LI, bi[m_rc], li_val[m_rc])
        fast_add_at(prep.a_LIDP, bi[m_rc], 1)
        fast_add_at(prep.a_RI, bi[m_fw], ri_val[m_fw])
        fast_add_at(prep.a_RIDP, bi[m_fw], 1)

        # snv/dnv mismatch-run intervals (main.hpp:1025-1046)
        next_rpos = _mismatch_next_rpos(table, batch, ref_syms, off)
        snv_d = np.zeros(P + 2, dtype=np.int64)
        dnv_d = np.zeros(P + 2, dtype=np.int64)
        lo = np.maximum(r.pos[br], b.rpos - 1) - off
        hi = np.minimum(next_rpos, r.rend[br]) - off
        lo = np.clip(lo, 0, P)
        hi = np.clip(hi, 0, P + 1)
        is_snv = next_rpos == b.rpos + 2
        is_dnv = next_rpos > b.rpos + 2
        _interval_add(snv_d, lo[is_snv], hi[is_snv])
        _interval_add(dnv_d, lo[is_dnv], hi[is_dnv])
        prep.a_snv_dp += np.cumsum(snv_d)[:P]
        prep.a_dnv_dp += np.cumsum(dnv_d)[:P]

        # high-BQ position stats
        hb = b.bq >= cfg.bias_thres_highBQ
        bh, ih = br[hb], bi[hb]
        ldist = (b.rpos - r.pos[br] + 1)[hb]
        rdist = (r.rend[br] - b.rpos)[hb]
        fast_add_at(prep.a_l_dist_sum, ih, ldist)
        fast_add_at(prep.a_r_dist_sum, ih, rdist)
        fast_add_at(prep.a_inslen_sum, ih, r.inslen_sum[bh])
        fast_add_at(prep.a_dellen_sum, ih, r.dellen_sum[bh])
        lbaq = baq[ih] - baq[r.pos[bh] - off] + 1
        rbaq = baq[r.rend[bh] - 1 - off] - baq[ih] + 1
        fast_add_at(prep.a_l_BAQ_sum, ih, lbaq)
        fast_add_at(prep.a_r_BAQ_sum, ih, rbaq)
        insbaq, delbaq = _read_gap_baq_sums(table, baq, off, P)
        fast_add_at(prep.a_insBAQ_sum, ih, insbaq[bh])
        fast_add_at(prep.a_delBAQ_sum, ih, delbaq[bh])
        fast_add_at(prep.a_highBQ_dp, ih, 1)

    # --- gap ops
    _pass_a_gaps(prep, table, tracks, baq, insbaq, delbaq, off, P, cfg,
                 pcr_inc, umi_inc)
    # --- clips
    _pass_a_clips(prep, batch, table, off, P, cfg, pcr_inc)
    return prep


def _mismatch_next_rpos(table, batch, ref_syms, off):
    """For each M base: the reference's `next_rpos` after the forward
    mismatch-run scan of main.hpp:1025-1037 — one past the first
    MATCHING base on the raw (qpos+k, rpos+k) diagonal, bounded only by
    l_qseq and rend (the scan walks straight across cigar-op boundaries,
    ignoring indels; runs that stay inside one M op are resolved by a
    vectorized segmented scan, op-crossing runs by a per-row raw scan)."""
    b = table.bases
    r = table.reads
    ref = ref_syms  # int8 [P]
    P = len(ref)
    ridx = np.clip(b.rpos - off, 0, P - 1)
    match0 = ref[ridx] == b.sym
    # group bases by (read, diagonal = rpos - qpos); within a group the
    # diagonal is contiguous, so next-match distance is a segmented scan
    diag = b.rpos - b.qpos
    key = b.read * (1 << 40) + diag
    order = np.lexsort((b.qpos, key))
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    sk = key[order]
    sm = match0[order]
    seg_start = np.concatenate([[True], sk[1:] != sk[:-1]])
    n = len(sm)
    nxt = np.full(n, n, dtype=np.int64)
    if sm.any():
        # next match at or after i, right-to-left
        nxt = np.flip(np.minimum.accumulate(np.flip(
            np.where(sm, np.arange(n), n))))
    seg_id = np.cumsum(seg_start) - 1
    seg_first = np.flatnonzero(seg_start)
    seg_last = np.concatenate([seg_first[1:], [n]]) - 1
    in_seg = nxt <= seg_last[seg_id]
    next_rpos_sorted = np.where(
        in_seg, b.rpos[order] + (nxt - np.arange(n)) + 1, 0)
    # op-crossing runs: continue the raw diagonal per row (rare)
    for j in np.flatnonzero(~in_seg):
        i0 = order[j]
        rd = int(b.read[i0])
        q0 = int(b.qpos[i0])
        r0 = int(b.rpos[i0])
        s0 = int(batch.seq_off[rd])
        lq = int(batch.seq_off[rd + 1]) - s0
        re = int(r.rend[rd])
        k = int(seg_last[seg_id[j]]) + 1 - j
        found = -1
        while q0 + k < lq and r0 + k < re:
            ri = min(max(r0 + k - off, 0), P - 1)
            if int(ref[ri]) == int(batch.seq[s0 + q0 + k]):
                found = k
                break
            k += 1
        next_rpos_sorted[j] = (r0 + found + 1 if found >= 0
                               else r0 + min(lq - q0, re - r0))
    return next_rpos_sorted[inv]


def _read_gap_baq_sums(table, baq, off, P):
    g = table.gaps
    n = len(table.reads.pos)
    insb = np.zeros(n, dtype=np.int64)
    delb = np.zeros(n, dtype=np.int64)
    if len(g.read):
        end_idx = np.minimum(g.rpos + np.where(g.is_del, g.oplen, g.oplen),
                             off + P - 1) - off
        # reference: baq[min(rpos+oplen, end-1)] - baq[rpos] for both I and D
        v = baq[np.clip(end_idx, 0, P - 1)] - baq[np.clip(g.rpos - off, 0, P - 1)]
        fast_add_at(insb, g.read[~g.is_del], v[~g.is_del])
        fast_add_at(delb, g.read[g.is_del], v[g.is_del])
    return insb, delb


def _pass_a_gaps(prep, table, tracks, baq, insbaq, delbaq, off, P, cfg,
                 pcr_inc, umi_inc):
    g = table.gaps
    r = table.reads
    if not len(g.read):
        return
    gr = g.read
    gi = np.clip(g.rpos - off, 0, P - 1)
    tdist = cfg.indel_adj_tracklen_dist
    rtr1_idx = np.maximum(tdist, g.rpos - off) - tdist
    rtr2_idx = np.minimum(g.rpos - off + tdist, len(tracks.begpos) - 1)
    tl1 = tracks.tracklen[rtr1_idx]
    tl2 = tracks.tracklen[rtr2_idx]
    unitlen2 = np.maximum(1, np.where(tl1 > tl2, tracks.unitlen[rtr1_idx],
                                      tracks.unitlen[rtr2_idx]))
    inv100 = np.where(g.oplen % unitlen2 == 0,
                      100 // np.maximum(g.oplen // unitlen2, 1), 100 // 4)

    for is_del in (False, True):
        m = g.is_del == is_del
        if not m.any():
            continue
        rpos = g.rpos[m]
        oplen = g.oplen[m]
        read = gr[m]
        if is_del:
            nb_l = oplen * (cfg.indel_adj_indellen_perc - 100) // 100
            nb_r = oplen * cfg.indel_adj_indellen_perc // 100
            lo = np.maximum(rpos - nb_l, r.pos[read])
            hi = np.minimum(rpos + nb_r, r.rend[read])  # inclusive end -1
        else:
            nb = oplen * cfg.indel_adj_indellen_perc // 100
            lo = np.maximum(rpos - nb, r.pos[read])
            hi = np.minimum(rpos + nb, r.rend[read])
        lo_i = np.clip(lo - off, 0, P)
        hi_i = np.clip(hi - off, 0, P + 1)
        names = ("del" if is_del else "ins")
        d_dp = np.zeros(P + 2, np.int64)
        d_p2 = np.zeros(P + 2, np.int64)
        d_inv = np.zeros(P + 2, np.int64)
        _interval_add(d_dp, lo_i, hi_i)
        _interval_add(d_p2, lo_i, hi_i, oplen * oplen)
        _interval_add(d_inv, lo_i, hi_i, inv100[m])
        getattr(prep, f"a_near_{names}_dp")[:] += np.cumsum(d_dp)[:P]
        getattr(prep, f"a_near_{names}_pow2len")[:] += np.cumsum(d_p2)[:P]
        getattr(prep, f"a_near_{names}_inv100len")[:] += np.cumsum(d_inv)[:P]
        # quadratic ramps for l/r pow2len:
        # ins: l term (rpos2 + 1 - (rpos - nb))^2, r term ((rpos + nb) - rpos2)^2
        # del: l term (rpos2 - lo + 1)^2,          r term (hi - 1 - rpos2 + 1)^2
        if is_del:
            lref = lo - 1          # (rpos2 - (lo-1))^2
            rref = hi - 1 + 1      # ((hi-1+1) - rpos2)^2 = (hi - rpos2)^2
        else:
            lref = rpos - nb - 1
            rref = rpos + nb
        for side, refp in (("l", lref), ("r", rref)):
            dq = np.zeros(P + 2, np.int64)
            dl = np.zeros(P + 2, np.int64)
            dc = np.zeros(P + 2, np.int64)
            _interval_add(dq, lo_i, hi_i, 1)
            # (rpos2_abs - refp)^2 = rpos2a^2 - 2*refp*rpos2a + refp^2
            # (same expansion for both sides; refp encodes the side)
            _interval_add(dl, lo_i, hi_i, -2 * refp)
            _interval_add(dc, lo_i, hi_i, refp * refp)
            posa = np.arange(P, dtype=np.int64) + off
            contrib = (np.cumsum(dq)[:P] * posa * posa
                       + np.cumsum(dl)[:P] * posa + np.cumsum(dc)[:P])
            getattr(prep, f"a_near_{names}_{side}_pow2len")[:] += contrib
        # near-RTR interval
        i1 = rtr1_idx[m]
        i2 = rtr2_idx[m]
        lo2 = np.maximum(off + tracks.begpos[i1] - tdist, r.pos[read])
        hi2 = np.minimum(off + tracks.begpos[i2] + tracks.tracklen[i2] + tdist,
                         r.rend[read])
        d_rtr = np.zeros(P + 2, np.int64)
        _interval_add(d_rtr, np.clip(lo2 - off, 0, P), np.clip(hi2 - off, 0, P + 1))
        getattr(prep, f"a_near_RTR_{names}_dp")[:] += np.cumsum(d_rtr)[:P]
        fast_add_at(getattr(prep, f"a_at_{names}_dp"), np.clip(rpos - off, 0, P - 1), 1)

    # deleted-base per-position adds (main.hpp:1127-1161)
    dmask = g.is_del
    if dmask.any():
        rpos = g.rpos[dmask]
        oplen = g.oplen[dmask]
        read = gr[dmask]
        owner, rpos2 = ev._flat_idx(rpos, oplen)
        rd = read[owner]
        i2 = np.clip(rpos2 - off, 0, P - 1)
        fast_add_at(prep.a_pcr_dp, i2, pcr_inc[rd])
        fast_add_at(prep.a_umi_dp, i2, umi_inc[rd])
        fast_add_at(prep.a_dp, i2, 1)
        fast_add_at(prep.a_qlen, i2, (r.rend - r.pos)[rd])
        fast_add_at(prep.a_highBQ_dp, i2, 1)
        fast_add_at(prep.a_XM1500, i2, r.xm1500[rd])
        fast_add_at(prep.a_GO1500, i2, r.go1500[rd])
        fast_add_at(prep.a_GAPLEN, i2, r.avg_gaplen[rd])
        has_is = r.isize[rd] != 0
        m_rc = r.isrc[rd] & has_is
        m_fw = (~r.isrc[rd]) & has_is
        rpos_o = rpos[owner]
        li_val = np.minimum(rpos_o - r.frag_pos_L[rd] + 1, MAX_INSERT_SIZE)
        ri_val = np.minimum(r.frag_pos_R[rd] - rpos_o, MAX_INSERT_SIZE)
        fast_add_at(prep.a_LI, i2[m_rc], li_val[m_rc])
        fast_add_at(prep.a_LIDP, i2[m_rc], 1)
        fast_add_at(prep.a_RI, i2[m_fw], ri_val[m_fw])
        fast_add_at(prep.a_RIDP, i2[m_fw], 1)
        ldist = rpos_o - r.pos[rd] + 1
        rdist = r.rend[rd] - rpos_o
        fast_add_at(prep.a_l_dist_sum, i2, ldist)
        fast_add_at(prep.a_r_dist_sum, i2, rdist)
        fast_add_at(prep.a_inslen_sum, i2, r.inslen_sum[rd])
        fast_add_at(prep.a_dellen_sum, i2, r.dellen_sum[rd])
        # quirk in reference: l/r BAQ sums are added at rpos (not rpos2)
        i_at = np.clip(rpos_o - off, 0, P - 1)
        lbaq = baq[i_at] - baq[np.clip(r.pos[rd] - off, 0, P - 1)] + 1
        rbaq = baq[np.clip(r.rend[rd] - 1 - off, 0, P - 1)] - baq[i_at] + 1
        fast_add_at(prep.a_l_BAQ_sum, i_at, lbaq)
        fast_add_at(prep.a_r_BAQ_sum, i_at, rbaq)
        fast_add_at(prep.a_insBAQ_sum, i2, insbaq[rd])
        fast_add_at(prep.a_delBAQ_sum, i2, delbaq[rd])


def _pass_a_clips(prep, batch, table, off, P, cfg, pcr_inc):
    op = batch.cigar_op
    ln = batch.cigar_len.astype(np.int64)
    coff = batch.cigar_off
    n_cigar = np.diff(coff)
    op_read = np.repeat(np.arange(batch.n, dtype=np.int64), n_cigar)
    from ..io.bam import BAM_CSOFT_CLIP, BAM_CHARD_CLIP, BAM_CREF_SKIP
    is_clip = np.isin(op, (BAM_CSOFT_CLIP, BAM_CHARD_CLIP))
    if not is_clip.any():
        return
    consumes_ref = np.isin(op, (0, 2, 3, 7, 8))
    ref_adv = ln * consumes_ref
    op_rpos = ev._seg_excl_cumsum(ref_adv, coff) + batch.pos[op_read]
    first = np.zeros(len(op), dtype=bool)
    first[coff[:-1][n_cigar > 0]] = True
    delta = np.where(first, 0, -1)
    ci = np.flatnonzero(is_clip)
    rp = op_rpos[ci] + delta[ci]
    rd = op_read[ci]
    amp = pcr_inc[rd] > 0
    for k in range(-cfg.microadjust_near_clip_dist, cfg.microadjust_near_clip_dist + 1):
        idx = rp[amp] + k - off
        ok = (idx >= 0) & (idx < P)
        fast_add_at(prep.a_near_pcr_clip_dp, idx[ok], pcr_inc[rd[amp]][ok])
    longc = (~amp) & (ln[ci] >= cfg.microadjust_alignment_clip_min_len)
    idx = np.clip(rp[longc] - off, 0, P - 1)
    fast_add_at(prep.a_near_long_clip_dp, idx, 1)


# ---------------------------------------------------------------------------
# pass B


def pass_b_thres(prep: SegPrep, tracks: strscan.RepeatTracks, cfg,
                 is_normal: bool) -> SegThres:
    P = prep.P
    t = SegThres(P)
    segLIDP = np.maximum(prep.a_LIDP, 1)
    segRIDP = np.maximum(prep.a_RIDP, 1)

    def bord(p2, dp):
        return np.ceil(np.sqrt(p2 // np.maximum(dp, 1))).astype(np.int64)

    ins_l = bord(prep.a_near_ins_l_pow2len, prep.a_near_ins_dp)
    del_l = bord(prep.a_near_del_l_pow2len, prep.a_near_del_dp)
    ins_r = bord(prep.a_near_ins_r_pow2len, prep.a_near_ins_dp)
    del_r = bord(prep.a_near_del_r_pow2len, prep.a_near_del_dp)
    dnv_border = np.zeros(P, dtype=np.int64)  # IonTorrent-only term
    t.aLPxT[:] = np.maximum(np.maximum(ins_l, del_l), dnv_border) + cfg.bias_thres_aLPxT_add
    t.aRPxT[:] = np.maximum(np.maximum(ins_r, del_r), dnv_border) + cfg.bias_thres_aLPxT_add

    # indelphred feedback (main.hpp:1242-1255) mutates the repeat tracks
    d2i = cfg.indel_del_to_ins_err_ratio
    half = int(round(INV_LOG10 * np.log(d2i))) // 2
    ip = tracks.indelphred[:P]
    ip += np.where(prep.a_near_ins_dp * d2i < prep.a_near_del_dp, half, 0)
    ip -= np.where(prep.a_near_del_dp * d2i < prep.a_near_ins_dp, half, 0)
    pc_inc1 = (3 * 100 * np.maximum(1, prep.a_near_ins_dp + prep.a_near_del_dp)
               // np.maximum(1, prep.a_near_ins_inv100len + prep.a_near_del_inv100len)) - 3
    ip += np.clip(pc_inc1, 0, 6)
    np.maximum(ip, 0, out=ip)

    aLRI1T_perc = cfg.bias_thres_aLRI1NT_perc if is_normal else cfg.bias_thres_aLRI1T_perc
    aLRI1t_perc = cfg.bias_thres_aLRI1Nt_perc if is_normal else cfg.bias_thres_aLRI1t_perc
    t.aLI1T[:] = prep.a_LI * aLRI1T_perc // (segLIDP * 100) + cfg.bias_thres_aLRI1T_add
    t.aLI2T[:] = prep.a_LI * cfg.bias_thres_aLRI2T_perc // (segLIDP * 100) + cfg.bias_thres_aLRI2T_add
    t.aLI1t[:] = prep.a_LI * aLRI1t_perc // (segLIDP * 100)
    t.aLI2t[:] = prep.a_LI * cfg.bias_thres_aLRI2t_perc // (segLIDP * 100)
    t.aRI1T[:] = prep.a_RI * aLRI1T_perc // (segRIDP * 100) + cfg.bias_thres_aLRI1T_add
    t.aRI2T[:] = prep.a_RI * cfg.bias_thres_aLRI2T_perc // (segRIDP * 100) + cfg.bias_thres_aLRI2T_add
    t.aRI1t[:] = prep.a_RI * aLRI1t_perc // (segRIDP * 100)
    t.aRI2t[:] = prep.a_RI * cfg.bias_thres_aLRI2t_perc // (segRIDP * 100)

    p1 = cfg.bias_thres_aLRP1Nt_avgmul_perc if is_normal else cfg.bias_thres_aLRP1t_avgmul_perc
    p2 = cfg.bias_thres_aLRP2t_avgmul_perc
    b1 = cfg.bias_thres_aLRB1Nt_avgmul_perc if is_normal else cfg.bias_thres_aLRB1t_avgmul_perc
    b2 = cfg.bias_thres_aLRB2t_avgmul_perc
    hdp100 = np.maximum(1, prep.a_highBQ_dp * 100)

    def nnm(a, b):
        return np.maximum(a - b, 0)

    t.aLP1t[:] = nnm(prep.a_l_dist_sum * p1 // hdp100, cfg.bias_thres_aLRP1t_minus)
    t.aLP2t[:] = nnm(prep.a_l_dist_sum * p2 // hdp100, cfg.bias_thres_aLRP2t_minus)
    t.aRP1t[:] = nnm(prep.a_r_dist_sum * p1 // hdp100, cfg.bias_thres_aLRP1t_minus)
    t.aRP2t[:] = nnm(prep.a_r_dist_sum * p2 // hdp100, cfg.bias_thres_aLRP2t_minus)
    pdel = prep.a_delBAQ_sum // np.maximum(1, prep.a_highBQ_dp)
    t.aLB1t[:] = nnm(prep.a_l_BAQ_sum * b1 // hdp100, cfg.bias_thres_aLRB1t_minus + pdel)
    t.aLB2t[:] = nnm(prep.a_l_BAQ_sum * b2 // hdp100, cfg.bias_thres_aLRB2t_minus)
    t.aRB1t[:] = nnm(prep.a_r_BAQ_sum * b1 // hdp100, cfg.bias_thres_aLRB1t_minus + pdel)
    t.aRB2t[:] = nnm(prep.a_r_BAQ_sum * b2 // hdp100, cfg.bias_thres_aLRB2t_minus)
    return t


# ---------------------------------------------------------------------------
# pass C: per-event increments (updateByAln) + dealwith_segbias


@dataclass
class EventValues:
    """Per-kind event arrays with computed incvalues, consumed by the
    SegInfo scatter (pass C) and the fragment consensus (pass D)."""

    pos: np.ndarray      # region-relative position index
    sym: np.ndarray      # symbol id
    val: np.ndarray      # incvalue (the per-event "quality")
    read: np.ndarray
    is_gap: np.ndarray   # dealwith_segbias isGap template flag
    cigar_op: np.ndarray  # 0=M, 1=I, 2=D
    indel_len: np.ndarray
    dist: np.ndarray     # dist_to_interfering_indel
    # boundaries of the concatenated event kinds (base / LINK_M / gap /
    # NN...), each read-major and key-sorted per read: lets the fragment
    # consensus merge streams directly instead of sorting (frag_cons_direct)
    stream_off: np.ndarray = None
    # per-(read, base-symbol) same-symbol mismatch density x1500
    # (bm1500s, main.hpp:1819-1863), read by the pass-C a2BM2 term
    bm1500: np.ndarray = None


def _searchsorted_per_read(vals, offs, read, rpos, n_reads):
    """prev (<= rpos, sentinel 0) and next (> rpos... reference uses <=
    for advancing) interfering-indel positions per event."""
    if len(vals) == 0:
        z = np.zeros(len(read), dtype=np.int64)
        return z, np.full(len(read), np.int64(2**31 - 1))
    BIG = np.int64(1) << 33
    comb_vals = np.repeat(np.arange(n_reads, dtype=np.int64),
                          np.diff(offs)) * BIG + vals
    comb = read.astype(np.int64) * BIG + rpos
    k = np.searchsorted(comb_vals, comb, side="right")
    lo = offs[read]
    hi = offs[read + 1]
    prev = np.where(k - 1 >= lo, vals[np.maximum(k - 1, 0)], 0)
    nxt = np.where(k < hi, vals[np.minimum(k, len(vals) - 1)],
                   np.int64(2**31 - 1))
    return prev, nxt


def _dist_to_interfering(table, tracks, thres, prev, nxt, rpos, off, cfg):
    """main.hpp:1897-1916: threshold-adjusted distance for M-base events."""
    tdist = cfg.indel_adj_tracklen_dist
    pi = rpos - off
    i1 = np.maximum(pi, tdist) - tdist
    i2 = np.minimum(pi + tdist, len(tracks.begpos) - 1)
    prevlen = np.maximum(
        (rpos - prev) - np.maximum(rpos - (off + tracks.begpos[i1]),
                                   thres.aLP1t[pi]), 0)
    nextlen = np.maximum(
        (nxt - rpos) - np.maximum((off + tracks.begpos[i2] + tracks.tracklen[i2]) - rpos,
                                  thres.aRP1t[pi]), 0)
    return np.minimum(prevlen, nextlen)


def compute_event_values(table, batch, ref_syms, tracks, baq, baq2,
                         prep, thres, off, P, cfg, dflag,
                         is_proton=False):
    """Compute incvalues for all event kinds (main.hpp:1877-2257; both the
    Illumina and TIsProton branches) and assemble the concatenated events."""
    r = table.reads
    b = table.bases
    g = table.gaps
    add_misma = cfg.bq_phred_added_misma
    add_indel = cfg.bq_phred_added_indel
    n = batch.n

    penal_clip = np.maximum(r.lclip, r.rclip) // 6
    penal_nm = (r.xm1500 + r.go1500) // 30
    micro_indel_penal = np.minimum(1, penal_nm + penal_clip)
    micro_nogap_penal = np.minimum(4, penal_nm + penal_clip) + 1

    # interfering-indel lists
    iv, ioffs = ev.interfering_indel_rposs(table, batch,
                                           cfg.bias_thres_interfering_indel_BQ)

    # per-(read, base-symbol) mismatch density (bm1500s, main.hpp:1819-1863)
    P_ref = len(ref_syms)
    mis = ref_syms[np.clip(b.rpos - off, 0, P_ref - 1)] != b.sym
    bm_cnt = np.zeros((n, 6), dtype=np.int64)
    if mis.any():
        np.add.at(bm_cnt, (b.read[mis], np.minimum(b.sym[mis], 5)), 1)
    span_r = np.maximum(r.rend - r.pos, 1)
    bm1500 = bm_cnt * 1500 // span_r[:, None]

    # native fast path for the dense base + LINK_M streams (Illumina):
    # the kernel writes the final allev rows directly (no temporaries, no
    # concatenate); proton branches and sparse streams stay in numpy
    from ..ops import native_rowpile as _nr
    _lib_ev = _nr._load()
    use_nat_ev = (not is_proton and _lib_ev is not None
                  and hasattr(_lib_ev, "event_values_base_link"))

    # ---- base events
    base_ev = link_ev = None
    if use_nat_ev:
        b_pos = None
    else:
        b_pos = (b.rpos - off).astype(np.int64)
        b_val = b.bq.astype(np.int64) + add_misma
    if not use_nat_ev and is_proton:
        # IonTorrent: bases flanking a gap op take the min of their own BQ
        # and the neighbor-away-from-the-gap BQ, with the indel phred-add
        # when the adjacent gap is short (main.hpp:1952-1974)
        op_all, ln_all, coff = batch.cigar_op, batch.cigar_len, batch.cigar_off
        opidx = b.op_index
        i2 = b.i2
        oplen_own = ln_all[opidx].astype(np.int64)
        first = i2 == 0
        last = i2 == oplen_own - 1
        has_prev_op = opidx > coff[b.read]
        has_next_op = (opidx + 1) < coff[b.read + 1]
        M_SET = (0, 7, 8)
        prev_op = op_all[np.maximum(opidx - 1, 0)]
        next_op = op_all[np.minimum(opidx + 1, len(op_all) - 1)]
        prev_is_gap = first & (~has_prev_op | ~np.isin(prev_op, M_SET))
        next_is_gap = last & (~has_next_op | ~np.isin(next_op, M_SET))
        boundary = (first | last) & (prev_is_gap | next_is_gap)
        adj = np.full(len(b_pos), 100, dtype=np.int64)
        nl = np.where(has_next_op, ln_all[np.minimum(opidx + 1,
                                                     len(op_all) - 1)], 100)
        adj = np.where(next_is_gap, np.minimum(adj, nl), adj)
        pl = np.where(has_prev_op, ln_all[np.maximum(opidx - 1, 0)], 100)
        adj = np.where(prev_is_gap, np.minimum(adj, pl), adj)
        qual_flat_ = batch.qual
        soff_ = batch.seq_off
        lq_b = r.l_qseq[b.read]
        isrc2 = i2 != 0
        nb_q = np.where(isrc2, b.qpos.astype(np.int64) + 1,
                        b.qpos.astype(np.int64) - 1)
        nb_ok = np.where(isrc2, nb_q < lq_b, nb_q >= 0)
        nb_bq = np.where(nb_ok, qual_flat_[np.clip(
            soff_[b.read] + nb_q, 0, len(qual_flat_) - 1)].astype(np.int64), 1)
        add_b = np.where(adj < 3, min(add_misma, add_indel), add_misma)
        b_val = np.where(boundary,
                         np.minimum(b.bq.astype(np.int64), nb_bq) + add_b,
                         b_val)
    if not use_nat_ev:
        # the distance only matters for events of reads that contain indels
        # (main.hpp:1897: dist_to_interfering_indel is queried under
        # bam_aux_get NGE>0); computing it just for those rows is exactly
        # equivalent to the dense np.where and skips the per-event
        # searchsorted entirely on indel-free pileups
        need = np.flatnonzero(r.nge_cnt[b.read] > 0)
        b_dist = np.full(len(b.read), 10000, dtype=np.int64)
        if len(need):
            prev, nxt = _searchsorted_per_read(iv, ioffs, b.read[need],
                                               b.rpos[need], n)
            b_dist[need] = _dist_to_interfering(table, tracks, thres, prev,
                                                nxt, b.rpos[need], off, cfg)
        base_ev = EventValues(pos=b_pos, sym=b.sym.astype(np.int64),
                              val=b_val, read=b.read,
                              is_gap=np.zeros(len(b_pos), bool),
                              cigar_op=np.zeros(len(b_pos), np.int64),
                              indel_len=np.zeros(len(b_pos), np.int64),
                              dist=b_dist)

        # ---- interior LINK_M events (i2 > 0 in an M run)
        im = b.interior
        noindel = np.minimum(tracks.indelphred[np.maximum(b_pos[im] - 1, 0)],
                             tracks.indelphred[b_pos[im]])
        if is_proton:
            # qfromBQ2 = min(BQ[qpos-1], BQ[qpos]) (main.hpp:1922)
            q_im = b.qpos[im].astype(np.int64)
            rd_im = b.read[im]
            bq_here = b.bq[im].astype(np.int64)
            bq_prev_im = batch.qual[np.clip(
                batch.seq_off[rd_im] + q_im - 1, 0,
                len(batch.qual) - 1)].astype(np.int64)
            qfromBQ2_m = np.minimum(bq_here, bq_prev_im)
        else:
            qfromBQ2_m = 80
        lm_val = np.maximum(np.minimum(qfromBQ2_m, noindel)
                            - micro_nogap_penal[b.read[im]], 0) + 1
        link_ev = EventValues(
            pos=b_pos[im],
            sym=np.full(int(im.sum()), int(Symbol.LINK_M), np.int64),
            val=lm_val, read=b.read[im],
            is_gap=np.ones(int(im.sum()), bool),
            cigar_op=np.zeros(int(im.sum()), np.int64),
            indel_len=np.zeros(int(im.sum()), np.int64),
            dist=b_dist[im])

    # ---- gap events (edge-gated)
    keep = g.nbases2end >= cfg.indel_filter_edge_dist
    gk_read = g.read[keep]
    gk_rpos = g.rpos[keep]
    gk_pos = (gk_rpos - off).astype(np.int64)
    gk_len = g.oplen[keep]
    gk_del = g.is_del[keep]
    gk_qpos = g.qpos[keep]

    # n_units is the STR-unit-normalized indel length: ref_to_phredvalue
    # (main.hpp:878,917-921) rewrites its first argument by reference and
    # insLenToSymbol/delLenToSymbol (main.hpp:2076,2191) classify by THAT,
    # not by cigar_oplen -- e.g. a 3bp insertion in a non-repeat context is
    # n_units = 1 + 3//6 = 1 and lands on LINK_I1, not LINK_I3P
    phredvalue, n_units, ctx_rnum, ctx_rsize = strscan.ref_to_phredvalue(
        tracks, gk_pos, gk_len, gk_del, cfg.indel_BQ_max,
        cfg.indel_polymerase_slip_rate, cfg.indel_del_to_ins_err_ratio)
    a_dp = prep.a_dp[gk_pos].astype(np.float64)
    at_sum = (prep.a_at_ins_dp + prep.a_at_del_dp)[gk_pos]
    phredinc = np.round(2 * INV_LOG10 * np.log(
        a_dp / (1.0 + np.maximum(prep.a_dp[gk_pos] - at_sum, 0)))).astype(np.int64)
    ratiothres = 2 if cfg.vcf_tumor_fname in (".", "") else 4
    is_multi_ins = (prep.a_near_ins_pow2len[gk_pos] * ratiothres
                    > np.maximum(1, prep.a_near_ins_dp[gk_pos]) * gk_len * 3)
    bump = np.clip(phredinc - 3, 0, 4)
    # the 1bp-bump gates on the NORMALIZED length (1 == inslen / 1 == dellen
    # at main.hpp:2044,2151 read the post-ref_to_phredvalue value), while
    # is_multiallelic_ins uses raw cigar_oplen
    phredvalue = phredvalue + np.where(
        (n_units == 1) & (gk_del | (~gk_del & ~is_multi_ins)), bump, 0)

    qual_flat = batch.qual
    soff = batch.seq_off
    lq = r.l_qseq[gk_read]
    # anchor and inserted-base min BQs
    owner, qidx = ev._flat_idx(gk_qpos * (~gk_del), np.where(gk_del, 0, gk_len))
    insmin = np.full(len(gk_read), 80, dtype=np.int64)
    if len(owner):
        flat = soff[gk_read[owner]] + qidx
        np.minimum.at(insmin, owner, qual_flat[flat].astype(np.int64))
    anc = np.full(len(gk_read), 80, dtype=np.int64)
    has_prev = gk_qpos > 0
    anc_prev = qual_flat[np.clip(soff[gk_read] + gk_qpos - 1, 0, len(qual_flat) - 1)]
    anc = np.where(has_prev, np.minimum(anc, anc_prev), anc)
    nxt_q = gk_qpos + gk_len + 1
    has_nxt = nxt_q < lq
    anc_nxt = qual_flat[np.clip(soff[gk_read] + nxt_q, 0, len(qual_flat) - 1)]
    anc = np.where(has_nxt & ~gk_del, np.minimum(anc, anc_nxt), anc)

    thisdp = np.where(gk_del, prep.a_at_del_dp[gk_pos], prep.a_at_ins_dp[gk_pos])
    neardp = np.where(gk_del,
                      np.maximum(prep.a_near_del_dp, prep.a_near_RTR_del_dp)[gk_pos],
                      np.maximum(prep.a_near_ins_dp, prep.a_near_RTR_ins_dp)[gk_pos])
    bq_at = qual_flat[np.clip(soff[gk_read] + np.minimum(gk_qpos, lq - 1), 0,
                              len(qual_flat) - 1)].astype(np.int64)
    bq_prev = qual_flat[np.clip(soff[gk_read] + np.maximum(gk_qpos - 1, 0), 0,
                                len(qual_flat) - 1)].astype(np.int64)
    # IonTorrent homopolymer minq: min BQ over the run of identical bases
    # starting at qpos, up to max_repeatnum+2 bases (main.hpp:2059-2066,
    # 2153-2160); applies to 1bp indels in 1bp-unit repeat context
    hp_minq = np.full(len(gk_read), 80, dtype=np.int64)
    if is_proton and len(gk_read):
        hp = (gk_len == 1) & (ctx_rsize == 1) & (ctx_rnum > 1)
        hp_idx = np.flatnonzero(hp)
        if len(hp_idx):
            cnt = np.minimum(ctx_rnum[hp_idx] + 2,
                             lq[hp_idx] - gk_qpos[hp_idx])
            cnt = np.maximum(cnt, 0)
            owner_h, qinc = ev._flat_idx(np.zeros(len(hp_idx), np.int64), cnt)
            rd_h = gk_read[hp_idx[owner_h]]
            q_h = gk_qpos[hp_idx[owner_h]] + qinc
            flat_h = soff[rd_h] + q_h
            same = batch.seq[flat_h] == batch.seq[soff[rd_h]
                                                  + gk_qpos[hp_idx[owner_h]]]
            mq = np.full(len(hp_idx), 80, dtype=np.int64)
            np.minimum.at(mq, owner_h[same],
                          qual_flat[flat_h[same]].astype(np.int64))
            hp_minq[hp_idx] = mq
    if is_proton:
        qfromBQ1 = np.where(gk_del,
                            np.minimum(np.minimum(bq_at, bq_prev), hp_minq),
                            np.minimum(anc, hp_minq))
    else:
        qfromBQ1 = np.where(gk_del, np.minimum(bq_at, bq_prev),
                            np.minimum(anc, insmin))
    # qfromBQ2 (Illumina): gated pass-through of qfromBQ1 or 80
    near_edge_ins = ((gk_len == 1)
                     & ((r.xm1500[gk_read] >= cfg.microadjust_xm)
                        | ((r.lclip[gk_read] + cfg.microadjust_cliplen >= gk_rpos - r.pos[gk_read]) & r.isrc[gk_read])
                        | ((r.rclip[gk_read] + cfg.microadjust_cliplen >= r.rend[gk_read] - r.pos[gk_read]) & ~r.isrc[gk_read])))
    ins_biased = (thisdp * ratiothres <= neardp) | near_edge_ins
    del_biased = (thisdp * ratiothres <= neardp)
    if is_proton:
        # unbiased indels on IonTorrent get a homopolymer-length-scaled
        # quality instead of the flat 80 (main.hpp:2072, 2163)
        from ..ops.math import _PROTON_OPLEN2PHRED
        p2p = np.asarray(_PROTON_OPLEN2PHRED, dtype=np.int64)[
            np.minimum(gk_len, 12)]
        unbiased_q = np.minimum(qfromBQ1 + p2p,
                                np.maximum(3, qfromBQ1) * gk_len)
    else:
        unbiased_q = np.full(len(gk_read), 80, dtype=np.int64)
    qfromBQ2 = np.where(gk_del,
                        np.where(del_biased, np.maximum(qfromBQ1 - 1, 0),
                                 unbiased_q),
                        np.where(ins_biased, qfromBQ1, unbiased_q))

    # deletion BAQ bound (main.hpp:2167-2187): python loop over del events
    qfromBAQ = np.full(len(gk_read), 10**9, dtype=np.int64)
    del_idx = np.flatnonzero(gk_del)
    if len(del_idx):
        delFA = (thisdp[del_idx] + 0.5) / (prep.a_dp[gk_pos[del_idx]] + 1)
        delFAQ = np.maximum(0, cfg.microadjust_delFAQmax + np.round(
            cfg.powlaw_exponent * INV_LOG10 * np.log(delFA)).astype(np.int64))
        op_all = batch.cigar_op
        ln_all = batch.cigar_len
        coff = batch.cigar_off
        g_opidx = g.op_index[keep]
        for j_i, j in enumerate(del_idx):
            rd = gk_read[j]
            i0, i1 = coff[rd], coff[rd + 1]
            myi = g_opidx[j]
            oplen = gk_len[j]
            prev_rpos = gk_rpos[j]
            pc = myi
            while pc != i0 and not (op_all[pc] == BAM_CINS and ln_all[pc] == oplen):
                pc -= 1
                if op_all[pc] in (0, 2, 3, 7, 8):
                    prev_rpos -= ln_all[pc]
            next_rpos = gk_rpos[j] + oplen
            nc = myi
            while nc != i1 - 1 and not (op_all[nc] == BAM_CINS and ln_all[nc] == oplen):
                nc += 1
                if op_all[nc] in (0, 2, 3, 7, 8):
                    next_rpos += ln_all[nc]
            bl = baq[np.clip(gk_rpos[j] - off, 0, P - 1)] - baq[np.clip(prev_rpos - off, 0, P - 1)]
            br_ = baq[np.clip(next_rpos - off, 0, P - 1)] - baq[np.clip(gk_rpos[j] + oplen - off, 0, P - 1)]
            qfromBAQ[j] = max(delFAQ[j_i], qfromBQ1[j], min(bl, br_))

    upper = np.minimum(qfromBQ2, phredvalue + add_indel)
    upper = np.where(gk_del, np.minimum(upper, qfromBAQ), upper)
    g_val = np.maximum(upper - micro_indel_penal[gk_read], 0) + 1
    g_val = np.maximum(g_val, 1)
    # symbol classification uses the normalized n_units, except for indels at
    # the read end where ref_to_phredvalue is never called and the raw
    # cigar_oplen survives (main.hpp:2012-2023; only reachable when
    # indel_filter_edge_dist <= 0)
    sym_len = np.where(g.nbases2end[keep] <= 0, gk_len, n_units)
    gsym = np.where(gk_del,
                    np.where(sym_len == 1, int(Symbol.LINK_D1),
                             np.where(sym_len == 2, int(Symbol.LINK_D2), int(Symbol.LINK_D3P))),
                    np.where(sym_len == 1, int(Symbol.LINK_I1),
                             np.where(sym_len == 2, int(Symbol.LINK_I2), int(Symbol.LINK_I3P))))
    gap_ev = EventValues(pos=gk_pos, sym=gsym, val=g_val, read=gk_read,
                         is_gap=np.ones(len(gk_pos), bool),
                         cigar_op=np.where(gk_del, 2, 1).astype(np.int64),
                         indel_len=gk_len.astype(np.int64),
                         dist=np.full(len(gk_pos), 10000, np.int64))

    # ---- padded-deletion NN events (main.hpp:2217-2253)
    dmask = gk_del
    nn_list = []
    if dmask.any():
        d_rpos = gk_rpos[dmask]
        d_len = gk_len[dmask]
        d_read = gk_read[dmask]
        d_val = g_val[dmask]
        dprev, dnxt = _searchsorted_per_read(iv, ioffs, d_read, d_rpos, n)
        d_dist = np.minimum(d_rpos - dprev, dnxt - d_rpos)
        rend_d = r.rend[d_read]
        owner, rpos2 = ev._flat_idx(d_rpos, np.minimum(d_len, rend_d - d_rpos))
        # BASE_NN at rpos2; LINK_NN at rpos2+1 when < rend
        nn_pos_b = rpos2 - off
        nn_pos_l = rpos2 + 1 - off
        ok_l = (rpos2 + 1) < rend_d[owner]
        for sym_id, posv, ok in ((int(Symbol.BASE_NN), nn_pos_b, np.ones(len(owner), bool)),
                                 (int(Symbol.LINK_NN), nn_pos_l, ok_l)):
            nn_list.append(EventValues(
                pos=posv[ok].astype(np.int64), 
                sym=np.full(int(ok.sum()), sym_id, np.int64),
                val=d_val[owner][ok], read=d_read[owner][ok],
                is_gap=np.ones(int(ok.sum()), bool),
                cigar_op=np.full(int(ok.sum()), 2, np.int64),
                indel_len=d_len[owner][ok].astype(np.int64),
                dist=d_dist[owner][ok]))

    if use_nat_ev:
        import ctypes
        n_base = len(b.rpos)
        n_link = int(b.interior.sum())
        tails = [gap_ev] + nn_list
        N = n_base + n_link + sum(len(k.pos) for k in tails)
        a_pos = np.empty(N, np.int64)
        a_sym = np.empty(N, np.int64)
        a_val = np.empty(N, np.int64)
        a_read = np.empty(N, np.int64)
        a_dist = np.empty(N, np.int64)
        a_isgap = np.zeros(N, bool)
        a_cop = np.zeros(N, np.int64)
        a_il = np.zeros(N, np.int64)

        def _vp(a):
            return a.ctypes.data_as(ctypes.c_void_p)

        rc_ev = _lib_ev.event_values_base_link(
            ctypes.c_int64(n_base),
            _vp(np.ascontiguousarray(b.rpos, np.int64)),
            _vp(np.ascontiguousarray(b.read, np.int64)),
            _vp(np.ascontiguousarray(b.sym, np.int8)),
            _vp(np.ascontiguousarray(b.bq, np.uint8)),
            _vp(np.ascontiguousarray(b.interior, np.uint8)),
            ctypes.c_int64(off), ctypes.c_int64(add_misma),
            _vp(np.ascontiguousarray(tracks.indelphred, np.int64)),
            _vp(np.ascontiguousarray(micro_nogap_penal, np.int64)),
            ctypes.c_int64(P),
            _vp(a_pos), _vp(a_sym), _vp(a_val), _vp(a_read), _vp(a_dist),
            ctypes.c_int64(n_base))
        if rc_ev != 0:
            raise ValueError("event_values_base_link: base position "
                             "outside region window")
        a_isgap[n_base:n_base + n_link] = True
        # interfering-indel distance fix-ups (indel-carrying reads only)
        need = np.flatnonzero(r.nge_cnt[b.read] > 0)
        if len(need):
            prev, nxt = _searchsorted_per_read(iv, ioffs, b.read[need],
                                               b.rpos[need], n)
            a_dist[need] = _dist_to_interfering(
                table, tracks, thres, prev, nxt, b.rpos[need], off, cfg)
            lidx = np.cumsum(b.interior) - 1
            nm = need[b.interior[need]]
            a_dist[n_base + lidx[nm]] = a_dist[nm]
        o = n_base + n_link
        for k in tails:
            m = len(k.pos)
            a_pos[o:o + m] = k.pos
            a_sym[o:o + m] = k.sym
            a_val[o:o + m] = k.val
            a_read[o:o + m] = k.read
            a_dist[o:o + m] = k.dist
            a_isgap[o:o + m] = k.is_gap
            a_cop[o:o + m] = k.cigar_op
            a_il[o:o + m] = k.indel_len
            o += m
        allev = EventValues(
            pos=a_pos, sym=a_sym, val=a_val, read=a_read, is_gap=a_isgap,
            cigar_op=a_cop, indel_len=a_il, dist=a_dist,
            stream_off=np.cumsum(
                [0, n_base, n_link] + [len(k.pos) for k in tails],
                dtype=np.int64),
            bm1500=bm1500)
        return allev, (gk_read, gk_pos, gsym, gk_len, gk_del, gk_qpos,
                       g_val)

    kinds = [base_ev, link_ev, gap_ev] + nn_list
    allev = EventValues(
        pos=np.concatenate([k.pos for k in kinds]),
        sym=np.concatenate([k.sym for k in kinds]),
        val=np.concatenate([k.val for k in kinds]),
        read=np.concatenate([k.read for k in kinds]),
        is_gap=np.concatenate([k.is_gap for k in kinds]),
        cigar_op=np.concatenate([k.cigar_op for k in kinds]),
        indel_len=np.concatenate([k.indel_len for k in kinds]),
        dist=np.concatenate([k.dist for k in kinds]),
        stream_off=np.cumsum([0] + [len(k.pos) for k in kinds],
                             dtype=np.int64),
        bm1500=bm1500)
    # exact-indel info for pass D: (event row in gap_ev, key)
    return allev, (gk_read, gk_pos, gsym, gk_len, gk_del, gk_qpos, g_val)


def pass_c_scatter(allev: EventValues, table, baq, baq2, thres: SegThres,
                   off, P, cfg, dflag, use_native=True) -> tuple:
    """dealwith_segbias (main.hpp:1360-1595) vectorized over all events.

    Returns (seginfo, bg_bqsum, vq_a1BQ, vq_a2BQ). When the fused native
    kernel (native/rowpile.cpp) is built it runs instead of the ~80
    vectorized numpy passes; parity is enforced by tests.
    """
    if use_native:
        from ..ops import native_rowpile
        if native_rowpile.available():
            planes = native_rowpile.pass_c_native(
                allev, table, baq, baq2, thres, off, P, cfg, dflag)
            info = SegInfo.__new__(SegInfo)
            info.P = P
            for nm in SegInfo.names:
                setattr(info, nm, planes[nm])
            bg = planes["bg"]
            a1 = np.stack([planes["a1BQf"], planes["a1BQr"]], axis=-1)
            a2 = np.stack([planes["a2BQf"], planes["a2BQr"]], axis=-1)
            return info, bg, a1, a2
    info = SegInfo(P)
    bg = np.zeros((P, NUM_SYMBOLS), dtype=np.int64)
    a1 = np.zeros((P, NUM_SYMBOLS, 2), dtype=np.int64)
    a2 = np.zeros((P, NUM_SYMBOLS, 2), dtype=np.int64)

    e = allev
    r = table.reads
    rd = e.read
    pos = e.pos
    sym = e.sym
    bq = e.val
    rpos_abs = pos + off

    fast_add_at(bg, (pos, sym), bq)

    isrc = r.isrc[rd]
    strand = r.strand[rd]
    isize = r.isize[rd]
    paired = r.is_paired[rd]
    flag = r.flag[rd]

    fast_add_at(a1, (pos, sym, isrc.astype(np.int64)), bq)
    fast_add_at(a2, (pos, sym, isrc.astype(np.int64)), bq * bq // SQR_QUAL_DIV)
    fast_add_at(info.aMQs, (pos, sym), r.mapq[rd])

    # quadrant depths
    quad_isrc = isrc.astype(np.int64)
    for s_val, c_val, name in ((0, 0, "aDPff"), (0, 1, "aDPfr"),
                               (1, 0, "aDPrf"), (1, 1, "aDPrr")):
        m = (strand.astype(np.int64) == s_val) & (quad_isrc == c_val)
        fast_add_at(getattr(info, name), (pos[m], sym[m]), 1)

    seg_l_nbases = rpos_abs - r.pos[rd] + 1
    seg_r_nbases = r.rend[rd] - rpos_abs
    fast_add_at(info.aP3, (pos, sym), (np.minimum(np.minimum(
        e.dist, seg_l_nbases), seg_r_nbases) >= cfg.bias_thres_interfering_indel).astype(np.int64))
    fast_add_at(info.aNC, (pos, sym), (r.clip_cnt[rd] == 0).astype(np.int64))

    frag_l2 = np.where(isize != 0,
                       np.minimum(rpos_abs - r.frag_pos_L[rd] + 1, MAX_INSERT_SIZE),
                       MAX_INSERT_SIZE)
    frag_r2 = np.where(isize != 0,
                       np.minimum(r.frag_pos_R[rd] - rpos_abs, MAX_INSERT_SIZE),
                       MAX_INSERT_SIZE)
    m = isrc & (isize != 0)
    fast_add_at(info.aLIT, (pos[m], sym[m]), frag_l2[m])
    m = (~isrc) & (isize != 0)
    fast_add_at(info.aRIT, (pos[m], sym[m]), frag_r2[m])

    # BAQ distances
    p_beg = np.clip(r.pos[rd] - off, 0, P - 1)
    p_end = np.clip(r.rend[rd] - 1 - off, 0, P - 1)
    seg_l_baq1 = baq[pos] - baq[p_beg] + 1
    _seg_r_baq = baq[p_end] - baq[pos] + 1
    seg_r_baq1 = np.where(e.is_gap,
                          np.minimum(_seg_r_baq, baq2[p_end] - baq2[pos] + 7),
                          _seg_r_baq)
    is_high_readlen = cfg.central_readlen >= cfg.microadjust_median_readlen_thres
    if is_high_readlen:
        seg_l_baq, seg_r_baq = seg_l_baq1, seg_r_baq1
    else:
        mul = cfg.microadjust_BAQ_per_base_x1024
        seg_l_baq = np.maximum(seg_l_baq1, seg_l_nbases * mul // 1024)
        seg_r_baq = np.maximum(seg_r_baq1, seg_r_nbases * mul // 1024)

    const_LPxT = np.where(e.is_gap, thres.aLPxT[pos],
                          np.minimum(thres.aLPxT[pos], thres.aRPxT[pos]))
    const_RPxT = thres.aRPxT[pos]
    ins_relax = np.where(e.cigar_op == 1,
                         np.maximum(e.indel_len - cfg.microadjust_nobias_pos_indel_maxlen, 0), 0)
    is_far = ((seg_l_nbases + ins_relax >= const_LPxT)
              & (seg_r_nbases >= const_RPxT))
    thr_baq = cfg.bias_thres_highBAQ + np.where(e.is_gap, 0, 3)
    is_unaff = (seg_l_baq >= thr_baq) & (seg_r_baq >= thr_baq)

    is_amplicon_ev = (((dflag[rd] & 0x4) != 0)
                      | ((cfg.primerlen > 0) and not (0x2 & cfg.primer_flag)))
    is_umi_ev = (dflag[rd] & 0x1) != 0
    min_dist2iend = np.where(paired, np.minimum(frag_l2, frag_r2),
                             np.where(isrc, seg_r_nbases, seg_l_nbases))
    m = is_far & is_unaff & ((min_dist2iend > cfg.primerlen2) | ~is_amplicon_ev)
    fast_add_at(info.aP1, (pos[m], sym[m]), 1)
    m = is_umi_ev | ~is_amplicon_ev
    fast_add_at(info.aP2, (pos[m], sym[m]), 1)

    # PF passing-fraction depths (x100)
    def ampfact(bqv, thr):
        return np.where(bqv < thr, 100 * bqv * bqv // (thr * thr), 100)

    pf1 = ampfact(bq, cfg.bias_thres_PFBQ1)
    pf2 = ampfact(bq, cfg.bias_thres_PFBQ2)
    # gap: min(100, ampfact2); non-gap: 100*ampfact2/100 == ampfact2 (XMGOT off)
    fast_add_at(info.aPF1, (pos, sym), np.where(e.is_gap, np.minimum(100, pf1), pf1))
    fast_add_at(info.aPF2, (pos, sym), np.where(e.is_gap, np.minimum(100, pf2), pf2))
    ng = ~e.is_gap
    xm1500e = r.xm1500[rd]
    # per-(read, symbol) same-symbol mismatch density (main.hpp:1860-1863);
    # LINK/gap symbols have no bm counts (only base mismatches accumulate)
    if e.bm1500 is not None:
        bm1500e = np.where(e.sym < 6,
                           e.bm1500[rd, np.minimum(e.sym, 5)], 0)
    else:
        bm1500e = np.zeros(len(rd), dtype=np.int64)
    # a2XM2/a2BM2 only for non-gap events
    fast_add_at(info.a2XM2, (pos[ng], sym[ng]),
              np.where(xm1500e[ng] > 20, 100 * 400 // np.maximum(xm1500e[ng] ** 2, 1), 100))
    fast_add_at(info.a2BM2, (pos[ng], sym[ng]),
              np.where(bm1500e[ng] > 20, 100 * 400 // np.maximum(bm1500e[ng] ** 2, 1), 100))

    # tier gate
    gate = np.where(e.is_gap, e.dist >= cfg.bias_thres_interfering_indel,
                    bq >= cfg.bias_thres_highBQ)
    tier2 = e.is_gap | (bq >= cfg.bias_thres_highBQ)

    def bidir(prefix, nl, nr, L1, L2, R1, R2, n_indel, mask):
        l1 = mask & (nl + n_indel >= L1)
        l2 = mask & (nl + n_indel >= L2) & tier2
        r1 = mask & (nr >= R1)
        r2 = mask & (nr >= R2) & tier2
        fast_add_at(getattr(info, f"{prefix[0]}1"), (pos[l1], sym[l1]), 1)
        fast_add_at(getattr(info, f"{prefix[0]}2"), (pos[l2], sym[l2]), 1)
        fast_add_at(getattr(info, f"{prefix[1]}1"), (pos[r1], sym[r1]), 1)
        fast_add_at(getattr(info, f"{prefix[1]}2"), (pos[r2], sym[r2]), 1)
        fast_add_at(getattr(info, f"{prefix[0]}L"), (pos[mask], sym[mask]), nl[mask])
        fast_add_at(getattr(info, f"{prefix[1]}L"), (pos[mask], sym[mask]), nr[mask])

    mfar = gate & is_far
    bidir(("aLP", "aRP"), seg_l_nbases, seg_r_nbases,
          thres.aLP1t[pos], thres.aLP2t[pos], thres.aRP1t[pos], thres.aRP2t[pos],
          e.indel_len, mfar)
    muna = gate & is_unaff
    bidir(("aLB", "aRB"), seg_l_baq, seg_r_baq,
          cfg.bias_thres_BAQ1, cfg.bias_thres_BAQ2,
          cfg.bias_thres_BAQ1, cfg.bias_thres_BAQ2, 0, muna)
    fast_add_at(info.aBQ2, (pos[gate], sym[gate]), 1)

    # insert-end bias counters
    mate_ok = ((flag & 0x8) == 0) | ((flag & 0x1) == 0)
    is_l_nonb = mate_ok & (seg_l_nbases > seg_r_nbases)
    is_r_nonb = mate_ok & (seg_l_nbases < seg_r_nbases)
    is_norm = (isize != 0) | ~paired
    is_pos_good = (~is_amplicon_ev) | is_far & is_unaff
    mrc = isrc
    d2 = frag_l2
    m1 = mrc & (d2 >= thres.aLI1t[pos]) & ((d2 <= thres.aLI1T[pos]) | e.is_gap) \
        & (is_norm | (e.is_gap & is_l_nonb))
    fast_add_at(info.aLI1, (pos[m1], sym[m1]), 1)
    m2 = mrc & (d2 >= thres.aLI2t[pos]) & ((d2 <= thres.aLI2T[pos]) | e.is_gap) \
        & (is_norm | (e.is_gap & is_l_nonb)) & is_pos_good
    fast_add_at(info.aLI2, (pos[m2], sym[m2]), 1)
    m3 = mrc & is_pos_good
    fast_add_at(info.aLIr, (pos[m3], sym[m3]), 1)
    mfw = ~isrc
    d2 = frag_r2
    m1 = mfw & (d2 >= thres.aRI1t[pos]) & ((d2 <= thres.aRI1T[pos]) | e.is_gap) \
        & (is_norm | (e.is_gap & is_r_nonb))
    fast_add_at(info.aRI1, (pos[m1], sym[m1]), 1)
    m2 = mfw & (d2 >= thres.aRI2t[pos]) & ((d2 <= thres.aRI2T[pos]) | e.is_gap) \
        & (is_norm | (e.is_gap & is_r_nonb)) & is_pos_good
    fast_add_at(info.aRI2, (pos[m2], sym[m2]), 1)
    m3 = mfw & is_pos_good
    fast_add_at(info.aRIf, (pos[m3], sym[m3]), 1)

    return info, bg, a1, a2


# ---------------------------------------------------------------------------
# pass D: fragment consensus -> FRAG_bDP / buckets / bTA / bTB


def _pass_d_frag_indel(gap_info, frag_of_read, g_frag, g_pos, g_st,
                       con_sym, batch, frag_strand=None, win_key=None):
    """Exact indel consensus per fragment (first max-val gap event of the
    fragment matching the winning (pos, sym)).  Counts per strand when
    frag_strand is given: {(pos,sym): {key: [fwd, rev]}} (the reference's
    per-strand PosToIseqToData/PosToDlenToData maps).  win_key, when
    given, is the precomputed {(frag,pos,sym)} indel-winner set (the
    statics-resident pass_d emits it sparsely)."""
    frag_indel = {}
    gk_read, gk_pos, gsym, gk_len, gk_del, gk_qpos, g_val = gap_info
    if len(gk_read):
        gfrag = frag_of_read[gk_read]
        if win_key is not None:
            win_key = dict.fromkeys(win_key)
        else:
            win_ins = (g_st == 1) & np.isin(con_sym, (10, 11, 12))
            win_del = (g_st == 1) & np.isin(con_sym, (7, 8, 9))
            win_key = dict()
            for i in np.flatnonzero(win_ins | win_del):
                win_key[(int(g_frag[i]), int(g_pos[i]),
                         int(con_sym[i]))] = None
        for j in range(len(gk_read)):
            k = (int(gfrag[j]), int(gk_pos[j]), int(gsym[j]))
            if k in win_key and win_key[k] is None:
                win_key[k] = j
        for (fr, p_, s_), j in win_key.items():
            if j is None:
                continue
            if gk_del[j]:
                ik = int(gk_len[j])
            elif batch is not None:
                s0 = batch.seq_off[int(gk_read[j])] + int(gk_qpos[j])
                ik = bytes(b"ACGTN"[min(int(c), 4)]
                           for c in batch.seq[s0:s0 + int(gk_len[j])])
            else:
                ik = ("ins", int(gk_read[j]), int(gk_qpos[j]), int(gk_len[j]))
            d = frag_indel.setdefault((p_, s_), {})
            strand = int(frag_strand[fr]) if frag_strand is not None else 0
            cnts = d.setdefault(ik, [0, 0])
            cnts[strand] += 1
    return frag_indel


def _pass_d_mutforms(g_frag, g_pos, g_st, con_sym, is_mut, frag_strand):
    """Phase signatures of multi-mutation fragments; rows must be sorted by
    (frag, pos, st) — the consensus_by_group output order."""
    mutforms = {}
    mut_frags = np.unique(g_frag[is_mut])
    if not len(mut_frags):
        return mutforms
    starts = np.searchsorted(g_frag, mut_frags)
    ends = np.searchsorted(g_frag, mut_frags + 1)
    for fr, s0, s1 in zip(mut_frags.tolist(), starts.tolist(), ends.tolist()):
        muts = is_mut[s0:s1]
        if muts.sum() > 1:
            poss = g_pos[s0:s1]
            sts = g_st[s0:s1]
            osel = np.lexsort((1 - sts[muts], poss[muts]))
            sig = tuple(zip(poss[muts][osel].tolist(),
                            con_sym[s0:s1][muts][osel].tolist()))
            cnts = mutforms.setdefault(sig, [0, 0])
            cnts[int(frag_strand[fr])] += 1
    return mutforms


def _pass_d_mutforms_sparse(mf, mp, mst, msym, frag_strand):
    """_pass_d_mutforms over the SPARSE mut rows emitted by the
    statics-resident pass_d (rows arrive sorted by (frag, pos, st))."""
    mutforms = {}
    if len(mf) == 0:
        return mutforms
    starts = np.concatenate([[True], mf[1:] != mf[:-1]])
    bounds = np.append(np.flatnonzero(starts), len(mf))
    for bi in np.flatnonzero(np.diff(bounds) >= 2):
        lo, hi = int(bounds[bi]), int(bounds[bi + 1])
        poss = mp[lo:hi]
        sts = mst[lo:hi]
        osel = np.lexsort((1 - sts, poss))
        sig = tuple(zip(poss[osel].tolist(), msym[lo:hi][osel].tolist()))
        cnts = mutforms.setdefault(sig, [0, 0])
        cnts[int(frag_strand[int(mf[lo])])] += 1
    return mutforms


def pass_d_fragments(allev: EventValues, gap_info, table, ref_syms,
                     frag_of_read, frag_strand, P, cfg, info: SegInfo,
                     bg: np.ndarray, frag_gc=None, batch=None,
                     use_native=True, precomputed=None):
    """R1R2 MAX-merge per fragment and consensus scatter
    (main.hpp:2620-2798). frag_gc: precomputed GroupConsensus to share with
    the family engine."""
    e = allev
    n_frags = int(frag_of_read.max()) + 1 if len(frag_of_read) else 0
    NS = NUM_SYMBOLS

    if precomputed is not None:
        # pass D already ran fused inside the fragment merge
        # (frag_cons_with_pass_d): only the sparse python passes remain
        bdp, bta, btb, hist, vq_bMQ, mut_rows, win_rows = precomputed
        win_key = set(zip(win_rows[0].tolist(), win_rows[1].tolist(),
                          win_rows[2].tolist()))
        frag_indel = _pass_d_frag_indel(gap_info, frag_of_read, None,
                                        None, None, None, batch,
                                        frag_strand, win_key=win_key)
        mutforms = _pass_d_mutforms_sparse(*mut_rows,
                                           frag_strand=frag_strand)
        return bdp, bta, btb, hist, vq_bMQ, frag_indel, mutforms

    if len(e.pos) == 0:
        z3 = np.zeros((P, NS, 2), dtype=np.int64)
        return (z3, z3.copy(), z3.copy(),
                np.zeros((P, NS, NUM_BUCKETS), dtype=np.int64),
                np.zeros((P, NS), dtype=np.int64), {}, {})

    # normMQ per fragment
    normMQ = np.zeros(n_frags, dtype=np.int64)
    np.maximum.at(normMQ, frag_of_read, table.reads.mapq)

    aDP4 = info.aDPff + info.aDPfr + info.aDPrf + info.aDPrr

    from ..ops import native_rowpile
    if isinstance(frag_gc, native_rowpile.StaticFragCons) and use_native:
        # statics-resident path: the kernel reads the rows in place and
        # returns only the sparse mut / indel-winner rows
        out = native_rowpile.pass_d_statics(
            bg, aDP4, ref_syms, frag_strand, normMQ, P, n_frags,
            cfg.bias_thres_highBQ, cfg.syserr_mut_region_n_bases)
        if out is not None:
            bdp, bta, btb, hist, vq_bMQ, mut_rows, win_rows = out
            win_key = set(zip(win_rows[0].tolist(), win_rows[1].tolist(),
                              win_rows[2].tolist()))
            frag_indel = _pass_d_frag_indel(gap_info, frag_of_read, None,
                                            None, None, None, batch,
                                            frag_strand, win_key=win_key)
            mutforms = _pass_d_mutforms_sparse(*mut_rows,
                                               frag_strand=frag_strand)
            return bdp, bta, btb, hist, vq_bMQ, frag_indel, mutforms
    # segment max over (frag, pos, sym), then consensus per (frag, pos, st)
    from . import consensus as cns
    if isinstance(frag_gc, native_rowpile.StaticFragCons):
        frag_gc = cns.GroupConsensus(
            *native_rowpile.fetch_frag_cons(frag_gc.n))
    if frag_gc is None:
        frag = frag_of_read[e.read]
        _, frag_gc = cns.reduce_and_consensus(frag, e.pos, e.sym, e.val, P,
                                              "max", link_m_overridden=True)
    gc = frag_gc
    con_sym, con_cnt, tot = gc.con_sym, gc.con_cnt, gc.tot
    g_pos, g_frag, g_st = gc.pos, gc.group, gc.st

    use_native = use_native and native_rowpile.available() and hasattr(
        native_rowpile._load(), "pass_d_kernel")
    if use_native:
        gkey2 = (g_frag * P + g_pos) * 2 + g_st
        use_native = bool(np.all(gkey2[1:] >= gkey2[:-1]))
    if use_native:
        bdp, bta, btb, hist, vq_bMQ, is_mut = native_rowpile.pass_d_native(
            gc, bg, aDP4, ref_syms, frag_strand, normMQ, P, n_frags,
            cfg.bias_thres_highBQ, cfg.syserr_mut_region_n_bases)
        frag_indel = _pass_d_frag_indel(gap_info, frag_of_read, g_frag,
                                        g_pos, g_st, con_sym, batch,
                                        frag_strand)
        mutforms = _pass_d_mutforms(g_frag, g_pos, g_st, con_sym, is_mut,
                                    frag_strand)
        return bdp, bta, btb, hist, vq_bMQ, frag_indel, mutforms

    avgBQ = bg[g_pos, con_sym] // np.maximum(1, aDP4[g_pos, con_sym])
    max_qual = 8 + avgBQ
    con_qual = con_cnt * 2 - tot
    phredlike = np.minimum(con_qual, max_qual)
    pbucket = np.clip(max_qual - phredlike, 0, None)

    hist = np.zeros((P, NS, NUM_BUCKETS), dtype=np.int32)
    hm = pbucket < NUM_BUCKETS
    fast_add_at(hist, (g_pos[hm], con_sym[hm], pbucket[hm]), 1)

    bdp = np.zeros((P, NS, 2), dtype=np.int64)
    strand_g = frag_strand[g_frag].astype(np.int64)
    fast_add_at(bdp, (g_pos, con_sym, strand_g), 1)
    vq_bMQ = np.zeros((P, NS), dtype=np.int64)
    fast_add_at(vq_bMQ, (g_pos, con_sym), normMQ[g_frag] ** 2 // SQR_QUAL_DIV)

    frag_indel = _pass_d_frag_indel(gap_info, frag_of_read, g_frag, g_pos,
                                    g_st, con_sym, batch, frag_strand)

    # mutation-proximity sweep (bTA/bTB) + phase strings
    refsym_at = ref_syms  # [P]
    is_mut = np.zeros(len(con_sym), dtype=bool)
    base_part = g_st == 0
    rs = refsym_at[g_pos]
    is_mut[base_part] = ((rs[base_part] != con_sym[base_part])
                         & (rs[base_part] < 4) & (con_sym[base_part] < 4))
    link_part = g_st == 1
    is_mut[link_part] = (con_sym[link_part] != int(Symbol.LINK_M)) & \
        (con_sym[link_part] != int(Symbol.LINK_NN))
    # Illumina is_var_of_highBQ: LINK always, BASE needs con_qual >= thres
    highbq = np.where(g_st == 1, True, con_qual >= cfg.bias_thres_highBQ)
    is_mut = is_mut & highbq

    # per-fragment aggregates via sorted (frag, pos)
    fp_order = np.lexsort((g_st, g_pos, g_frag))
    f_s = g_frag[fp_order]
    p_s = g_pos[fp_order]
    mut_s = is_mut[fp_order]
    # distinct (frag,pos) covered
    fp_key = f_s * P + p_s
    fp_new = np.concatenate([[True], fp_key[1:] != fp_key[:-1]])
    n_cov = np.zeros(n_frags, dtype=np.int64)
    fast_add_at(n_cov, f_s[fp_new], 1)
    # near-mut: a covered pos is near-mut if within 11 of any mutated pos of
    # the same fragment
    n_near = np.zeros(n_frags, dtype=np.int64)
    mut_frags = np.unique(f_s[mut_s])
    mutforms = {}
    W = cfg.syserr_mut_region_n_bases
    if len(mut_frags):
        fmask = np.isin(f_s, mut_frags)
        # python per-fragment for mutated fragments only (rare)
        idx_sorted = np.flatnonzero(fmask)
        bounds = np.searchsorted(f_s, np.concatenate([mut_frags, [n_frags]]))
        for t, fr in enumerate(mut_frags):
            s0, s1 = bounds[t], np.searchsorted(f_s, fr + 1)
            poss = p_s[s0:s1]
            muts = mut_s[s0:s1]
            sts = g_st[fp_order][s0:s1]
            mp = np.unique(poss[muts])
            cov_pos = np.unique(poss)
            near = np.zeros(len(cov_pos), dtype=bool)
            for q in mp:
                near |= np.abs(cov_pos - q) <= W
            n_near[fr] = int(near.sum())
            # phase signature: (pos, sym) of mutated in (pos, LINK-first) order
            if muts.sum() > 1:
                osel = np.lexsort((1 - sts[muts], poss[muts]))
                sig = tuple(zip(poss[muts][osel].tolist(),
                                con_sym[fp_order][s0:s1][muts][osel].tolist()))
                cnts = mutforms.setdefault(sig, [0, 0])
                cnts[int(frag_strand[fr])] += 1

    bta = np.zeros((P, NS, 2), dtype=np.int64)
    btb = np.zeros((P, NS, 2), dtype=np.int64)
    fast_add_at(bta, (g_pos, con_sym, strand_g), n_cov[g_frag])
    fast_add_at(btb, (g_pos, con_sym, strand_g), n_near[g_frag])

    return bdp, bta, btb, hist, vq_bMQ, frag_indel, mutforms


def final_iid_qualities(bdp, bg, info: SegInfo, hist, P):
    """infer_max_qual over the bucket histograms (main.hpp:2801-2828)."""
    NS = NUM_SYMBOLS
    aDP4 = info.aDPff + info.aDPfr + info.aDPrf + info.aDPrr
    max_qual = 8 + bg // np.maximum(1, aDP4)
    bdp_t = bdp.sum(axis=2)
    tot_base = bdp_t[:, :6].sum(axis=1, keepdims=True)
    tot_link = bdp_t[:, 6:].sum(axis=1, keepdims=True)
    totDP = np.concatenate([np.repeat(tot_base, 6, axis=1),
                            np.repeat(tot_link, 8, axis=1)], axis=1)
    from ..ops import native_rowpile
    nat = native_rowpile.iid_scan(max_qual, 1, hist, totDP)
    if nat is not None:
        return nat
    # numpy replica of infer_max_qual_assuming_independence with dec_qual=1
    idx = np.arange(NUM_BUCKETS)
    curr_ad = np.cumsum(hist, axis=-1)
    curr_bq = max_qual[..., None] - idx
    DBL_EPS = 2.220446049250313e-16
    with np.errstate(divide="ignore", invalid="ignore"):
        exp_bq = INV_LOG10 * np.log(totDP[..., None] / np.maximum(curr_ad, 1) + DBL_EPS)
    vq = (curr_ad * (curr_bq - exp_bq)).astype(np.int64)
    valid = (hist > 0) & (idx < np.maximum(max_qual[..., None], 0))
    vq = np.where(valid, vq, np.iinfo(np.int64).min)
    best = np.argmax(vq, axis=-1)
    mv = np.take_along_axis(vq, best[..., None], axis=-1)[..., 0]
    found = mv > 0
    bIAQ = np.where(found, mv, 0)
    bIAD = np.where(found, np.take_along_axis(curr_ad, best[..., None], -1)[..., 0], 0)
    bIDQ = np.where(found, max_qual - best, 0)
    return bIAQ, bIAD, bIDQ


def run_bq(batch, ref_syms, region_offset, cfg, dflag=None,
           frag_of_read=None, frag_strand=None, is_normal=False,
           is_proton=False) -> BQResult:
    """Full BQ-tier pipeline over one region."""
    P = len(ref_syms)
    n = batch.n
    if dflag is None:
        dflag = np.zeros(n, dtype=np.int64)
    table = ev.expand(batch)
    if frag_of_read is None:
        # group by qname (R1+R2 of the same template)
        qn = batch.qnames()
        uniq = {}
        frag_of_read = np.empty(n, dtype=np.int64)
        for i, q in enumerate(qn):
            frag_of_read[i] = uniq.setdefault(q, len(uniq))
    if frag_strand is None:
        nf = int(frag_of_read.max()) + 1 if n else 0
        frag_strand = np.zeros(nf, dtype=np.int64)
        frag_strand[frag_of_read] = table.reads.strand  # last write wins; R1/R2 share strand

    tracks = strscan.scan_repeats(
        ref_syms, cfg.indel_str_repeatsize_max, cfg.indel_vntr_repeatsize_max,
        cfg.indel_BQ_max, cfg.indel_polymerase_slip_rate,
        cfg.indel_del_to_ins_err_ratio)
    baq = strscan.baq_offsets(tracks, use_anyTR=False,
                              indel_str_phred_per_region=cfg.indel_str_phred_per_region,
                              indel_nonSTR_phred_per_base=cfg.indel_nonSTR_phred_per_base,
                              indel_polymerase_size=cfg.indel_polymerase_size)
    baq2 = strscan.baq_offsets(tracks, use_anyTR=True,
                               indel_str_phred_per_region=cfg.indel_str_phred_per_region,
                               indel_nonSTR_phred_per_base=cfg.indel_nonSTR_phred_per_base,
                               indel_polymerase_size=cfg.indel_polymerase_size)

    prep = pass_a_prep(table, batch, ref_syms, tracks, baq, region_offset, P,
                       cfg, dflag)
    thres = pass_b_thres(prep, tracks, cfg, is_normal)
    allev, gap_info = compute_event_values(table, batch, ref_syms, tracks,
                                           baq, baq2, prep, thres,
                                           region_offset, P, cfg, dflag,
                                           is_proton=is_proton)
    info, bg, a1, a2 = pass_c_scatter(allev, table, baq, baq2, thres,
                                      region_offset, P, cfg, dflag)
    bdp, bta, btb, hist, vq_bMQ, frag_indel, mutforms = pass_d_fragments(
        allev, gap_info, table, ref_syms, frag_of_read, frag_strand, P, cfg,
        info, bg)
    bIAQ, bIAD, bIDQ = final_iid_qualities(bdp, bg, info, hist, P)
    return BQResult(prep=prep, thres=thres, seginfo=info, bg_bqsum=bg,
                    vq_a1BQ=a1, vq_a2BQ=a2, vq_bMQ=vq_bMQ, bdp=bdp, bta=bta,
                    btb=btb, bucket_hist=hist, vq_bIAQ=bIAQ, vq_bIAD=bIAD,
                    vq_bIDQ=bIDQ, frag_indel=frag_indel, mutforms=mutforms)
