"""Family-tier (FQ) consensus engine: dedup families -> cDP1/cDP12/cDP2/
cDP3/cDP21/cDPM/cDPm depth tiers, SSCS bias counters, duplex agreement, and
family-level IID binomial qualities.

Behavioral reference: updateByAlns3UsingFQ (main.hpp:2832-3594):
  stage 1  per fragment: MAX coverage -> updateByFiltering into the family
           fragment-count coverage (thres [fam_thres_highBQ_snv, 0]) and
           updateByMajorMinusMinor into the BQ-weighted family coverage
  sweep 1  family fragment-count consensus -> cDP12/cDP21/cDP2(+c2 bias)/
           cDP3/cDPM/cDPm + family exact indels
  sweep 2  family BQ-weighted consensus    -> cDP1, empirical-error confam
           quality -> per-strand bucket histograms, phase signatures
  duplex   strand-paired families -> dDP1/dDP2
  final    infer_max_qual(dec=4) over buckets -> cIAQf/r, cIADf/r, cIDQf/r

Consensus rule notes: stage 1 uses the LINK_M-overridden rule
(updateByFiltering<true>); sweeps 1-2 use the plain rule
(fillConsensusCounts default template args at main.hpp:2983,3006,3452).
"""

from dataclasses import dataclass

import numpy as np

from uvc_tpu.ops.scatter import fast_add_at

from ..constants import Symbol, NUM_SYMBOLS
from ..pileup import consensus as cns
from ..ops.math import NUM_BUCKETS

NS = NUM_SYMBOLS
INV_LOG10 = 10.0 / np.log(10.0)


@dataclass
class FQResult:
    cdp1: np.ndarray    # [P,14,2] FAM_cDP1 per strand
    cdp12: np.ndarray
    cdp2: np.ndarray
    cdp3: np.ndarray
    cdp21: np.ndarray
    cdpM: np.ndarray
    cdpm: np.ndarray
    cdpD: np.ndarray
    ddp1: np.ndarray    # [P,14] duplex raw
    ddp2: np.ndarray    # [P,14] duplex agreement
    c2info: dict        # name -> [P,14] SSCS bias counters (c2LP1..c2BQ2)
    vq_cIAQ: np.ndarray  # [P,14,2]
    vq_cIAD: np.ndarray
    vq_cIDQ: np.ndarray
    fam_indel: dict     # (pos, sym) -> {key: cDP1-level count}
    mutforms_fq: dict
    mutforms_f2q: dict


C2_NAMES = ("c2LP1 c2LP2 c2LPL c2RP1 c2RP2 c2RPL c2LP0 c2RP0 "
            "c2LB1 c2LB2 c2LBL c2RB1 c2RB2 c2RBL c2BQ2").split()


def _pdel_ignored(cfg):
    """is_padded_del_ignored (main.hpp:2905-2908): the IonTorrent arm of
    microadjust_padded_deletion_flag drops padded-deletion BASE_N/NN
    fragments from the filtered (famcov) family container."""
    from ..constants import SequencingPlatform
    arm = (0x2 if cfg.inferred_sequencing_platform
           == SequencingPlatform.IONTORRENT else 0x1)
    return int(bool(cfg.microadjust_padded_deletion_flag & arm))


def run_fq(frag_cons, frag_gap_info, famgrp, ref_syms, sscs_table, thres,
           baq, baq2, table, batch, P, cfg, is_normal=False) -> FQResult:
    """frag_cons: GroupConsensus per (fragment, pos, symboltype) from the
    shared fragment MAX-merge (or a StaticFragCons handle to rows resident
    in the .so); frag_gap_info: exact-indel info per kept gap event
    (read, pos, sym, len, is_del, qpos, val)."""
    from ..ops import native_rowpile as _nrs
    if isinstance(frag_cons, _nrs.StaticFragCons):
        # statics-resident fast path: family merge + sweeps run fully
        # inside the .so; python sees only sparse good/mut rows.  The
        # duplex tiers need dense s1 rows, so duplex-flagged inputs take
        # the fetch path below.
        if (_nrs.has_statics_path()
                and not bool(np.any((famgrp.fam_dflag & 0x2) != 0))):
            out = _run_fq_statics(frag_gap_info, famgrp, ref_syms,
                                  sscs_table, thres, baq, baq2, batch, P,
                                  cfg)
            if out is not None:
                return out
        frag_cons = cns.GroupConsensus(
            *_nrs.fetch_frag_cons(frag_cons.n))
    fam_of_frag = famgrp.fam_of_frag
    fam_strand = famgrp.fam_strand
    fam_dflag = famgrp.fam_dflag
    n_fams = famgrp.n_fams
    fc = frag_cons

    # ---- stage 1: fragment -> family coverages
    from ..ops import native_rowpile as _nr
    _lib0 = _nr._load()
    _has_sweep2 = _lib0 is not None and hasattr(_lib0, "fq_sweep2_kernel")
    fused = None
    if len(fc.group) > 4096:
        # both sweeps reduce over the same (fam,pos,sym) keys.  Preferred:
        # the sort-free per-family merge (rows arrive frag-grouped and
        # key-sorted from the fragment consensus); fallback: ONE native
        # radix sort feeding both reductions.  Either way the famcov
        # (filtered count) and fammmm (BQ-weighted) tables land in the .so
        # statics, where the native sweep-2 kernel reads them in place
        # (fetch_unique=False).
        fused = _nr.fam_cons_direct(
            fc.group, fc.pos, fc.con_sym, fc.con_cnt, fc.tot, fc.st,
            fam_of_frag, famgrp.n_fams, cfg.fam_thres_highBQ_snv, P,
            fetch_unique=not _has_sweep2, pdel_ign=_pdel_ignored(cfg))
        if fused is None:
            fused = _nr.reduce_consensus2_fc(
                fc.group, fc.pos, fc.con_sym, fc.con_cnt, fc.tot, fc.st,
                fam_of_frag, cfg.fam_thres_highBQ_snv, P,
                fetch_unique=not _has_sweep2, pdel_ign=_pdel_ignored(cfg))
    if fused is None:
        adj = np.maximum(2 * fc.con_cnt, fc.tot) - fc.tot
        pass_filt = (adj > 0) & ((fc.st == 1)
                                 | ((adj >= cfg.fam_thres_highBQ_snv)
                                    & ~(bool(_pdel_ignored(cfg))
                                        & (fc.con_sym >= 4))))
        fam_of_row = fam_of_frag[fc.group]
        mm = adj > 0
        if int(mm.sum()) > 4096:
            fused = _nr.reduce_consensus2(
                fam_of_row[mm], fc.pos[mm], fc.con_sym[mm], adj[mm],
                pass_filt[mm], P)
    if fused is not None:
        uniq1, c1, c2 = fused
        # uniq1 is None when the table stays inside the .so; the native
        # sweep-2 call below then reads it with nu=-1
        fg, fp, fs, fcnt = uniq1 if uniq1 is not None else (None,) * 4
        s1 = cns.GroupConsensus(*c1)
        s2 = cns.GroupConsensus(*c2)
    else:
        # family fragment-count coverage (famcov)
        (fg, fp, fs, fcnt), s1 = cns.reduce_and_consensus(
            fam_of_row[pass_filt], fc.pos[pass_filt], fc.con_sym[pass_filt],
            np.ones(int(pass_filt.sum()), dtype=np.int64), P, "sum",
            link_m_overridden=False)
        # family BQ-weighted coverage (fammmm)
        (mg, mp, ms, msum), s2 = cns.reduce_and_consensus(
            fam_of_row[mm], fc.pos[mm], fc.con_sym[mm], adj[mm], P, "sum",
            link_m_overridden=False)

    # ---- sweep 1: famcov consensus
    strand1 = fam_strand[s1.group]
    # int32: these are pure count planes scattered to by the native
    # kernels; half the bytes -> half the cache traffic of the sweeps
    z3 = lambda: np.zeros((P, NS, 2), dtype=np.int32)  # noqa: E731
    cdp1, cdp12, cdp2, cdp3, cdp21 = z3(), z3(), z3(), z3(), z3()
    cdpM, cdpm, cdpD = z3(), z3(), z3()
    has_umi = (fam_dflag[s1.group] & 0x1) != 0

    from ..ops import native_rowpile
    _lib = native_rowpile._load()
    if _lib is not None and hasattr(_lib, "fq_sweep1_kernel"):
        import ctypes

        def _cp(a, dt=np.int64):
            return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
                ctypes.c_void_p)

        fam_good_u8 = np.zeros(len(s1.pos), dtype=np.uint8)
        _lib.fq_sweep1_kernel(
            ctypes.c_int64(len(s1.pos)), _cp(s1.pos), _cp(s1.con_sym),
            _cp(s1.con_cnt), _cp(s1.tot), _cp(strand1),
            _cp(has_umi, np.uint8), ctypes.c_int64(P),
            ctypes.c_int64(cfg.fam_thres_dup1add),
            ctypes.c_int64(cfg.fam_thres_dup1perc),
            ctypes.c_int64(cfg.fam_thres_dup2add),
            ctypes.c_int64(cfg.fam_thres_dup2perc),
            ctypes.c_int64(cfg.fam_flag),
            ctypes.c_int64(cfg.fam_thres_emperr_all_flat_snv),
            ctypes.c_int64(cfg.fam_thres_emperr_con_perc_snv),
            ctypes.c_int64(cfg.fam_thres_emperr_all_flat_indel),
            ctypes.c_int64(cfg.fam_thres_emperr_con_perc_indel),
            cdp12.ctypes.data_as(ctypes.c_void_p),
            cdp21.ctypes.data_as(ctypes.c_void_p),
            cdp2.ctypes.data_as(ctypes.c_void_p),
            cdp3.ctypes.data_as(ctypes.c_void_p),
            cdpm.ctypes.data_as(ctypes.c_void_p),
            cdpM.ctypes.data_as(ctypes.c_void_p),
            fam_good_u8.ctypes.data_as(ctypes.c_void_p))
        fam_good = fam_good_u8.view(bool)
    else:
        fast_add_at(cdp12, (s1.pos, s1.con_sym, strand1), 1)
        m1 = s1.tot == 1
        fast_add_at(cdp21, (s1.pos[m1], s1.con_sym[m1], strand1[m1]), 1)

        fam_good = ((s1.tot >= cfg.fam_thres_dup1add)
                    & (s1.con_cnt * 100 >= s1.tot * cfg.fam_thres_dup1perc)
                    & (has_umi | ((cfg.fam_flag & 0x2) != 0)))
        fast_add_at(cdp2, (s1.pos[fam_good], s1.con_sym[fam_good],
                           strand1[fam_good]), 1)
        t3 = ((s1.tot >= cfg.fam_thres_dup2add)
              & (s1.con_cnt * 100 >= s1.tot * cfg.fam_thres_dup2perc))
        fast_add_at(cdp3, (s1.pos[t3], s1.con_sym[t3], strand1[t3]), 1)

        # cDPM/cDPm (main.hpp:3340-3352): per non-consensus symbol of the
        # type, cDPm += that symbol's count, cDPM += tot (tot x 5 or x 7)
        emperr = np.where(s1.con_sym < 6, cfg.fam_thres_emperr_all_flat_snv,
                          cfg.fam_thres_emperr_all_flat_indel)
        emperc = np.where(s1.con_sym < 6, cfg.fam_thres_emperr_con_perc_snv,
                          cfg.fam_thres_emperr_con_perc_indel)
        em = (s1.tot >= emperr) & (s1.con_cnt * 100 >= s1.tot * emperc)
        n_others = np.where(s1.st == 0, 5, 7)
        fast_add_at(cdpm, (s1.pos[em], s1.con_sym[em], strand1[em]),
                    (s1.tot - s1.con_cnt)[em])
        fast_add_at(cdpM, (s1.pos[em], s1.con_sym[em], strand1[em]),
                    (s1.tot * n_others)[em])

    # SSCS bias counters for good families (c2*, main.hpp:3208-3319)
    c2info = {nm: np.zeros((P, NS), dtype=np.int64) for nm in C2_NAMES}
    if fam_good.any():
        _c2_bias(c2info, s1, fam_good, famgrp, fc, thres, baq, baq2, P, cfg)

    # tier-2-good (fam,pos,sym) set for the c2AD exact-indel table
    # (indel consensus symbols only)
    if fam_good.any():
        _ind = fam_good & (s1.con_sym >= 7) & (s1.con_sym <= 12)
        good_set = set(zip(s1.group[_ind].tolist(), s1.pos[_ind].tolist(),
                           s1.con_sym[_ind].tolist()))
    else:
        good_set = set()

    # ---- sweep 2: fammmm consensus -> cDP1 + confam quality buckets
    rescue_add = 0 if cfg.vcf_tumor_fname in (".", "") else 4
    hist = np.zeros((2, P, NS, NUM_BUCKETS), dtype=np.int32)
    use_nat2 = _lib is not None and hasattr(_lib, "fq_sweep2_kernel") \
        and (fg is None or len(s2.group) > 2048)
    if use_nat2:
        import ctypes

        def _cc(a, dt=np.int64):
            return np.ascontiguousarray(a, dtype=dt).ctypes.data_as(
                ctypes.c_void_p)

        confam = np.empty(len(s2.group), dtype=np.int64)
        confam_ok_u8 = np.empty(len(s2.group), dtype=np.uint8)
        mut_u8 = np.empty(len(s2.group), dtype=np.uint8)
        null = ctypes.c_void_p(0)
        rc2 = _lib.fq_sweep2_kernel(
            ctypes.c_int64(len(s2.group)), _cc(s2.group), _cc(s2.pos),
            _cc(s2.st), _cc(s2.con_sym), _cc(s2.con_cnt), _cc(s2.tot),
            ctypes.c_int64(-1 if fg is None else len(fg)),
            null if fg is None else _cc(fg),
            null if fg is None else _cc(fp),
            null if fg is None else _cc(fs),
            null if fg is None else _cc(fcnt),
            _cc(fam_strand), _cc(ref_syms), _cc(sscs_table),
            cdpM.ctypes.data_as(ctypes.c_void_p),
            cdpm.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(P), ctypes.c_int64(rescue_add),
            ctypes.c_int64(cfg.fam_phred_indel_inc_before_barcode_labeling),
            ctypes.c_int64(cfg.fam_thres_dup1add),
            ctypes.c_int64(cfg.fam_thres_dup1perc),
            ctypes.c_int64(cfg.bias_thres_highBQ),
            cdp1.ctypes.data_as(ctypes.c_void_p),
            hist.ctypes.data_as(ctypes.c_void_p),
            confam.ctypes.data_as(ctypes.c_void_p),
            confam_ok_u8.ctypes.data_as(ctypes.c_void_p),
            mut_u8.ctypes.data_as(ctypes.c_void_p))
        if rc2 != 0:
            raise RuntimeError("fq_sweep2_kernel: stale internal table")
        confam_ok = confam_ok_u8.view(bool)
        mut = mut_u8.view(bool)
    else:
        refsym2 = ref_syms[s2.pos]
        strand2 = fam_strand[s2.group]
        fast_add_at(cdp1, (s2.pos, s2.con_sym, strand2), 1)

        # gather famcov counts at the sweep-2 winners (sorted-key merge)
        con_nfrags = _gather_triplet(fg, fp, fs, fcnt, s2.group, s2.pos,
                                     s2.con_sym, P)
        tot_nfrags = _gather_type_sum(fg, fp, fs, fcnt, s2.group, s2.pos,
                                      s2.st, P)

        avgBQ = np.where(tot_nfrags == 0, 1,
                         s2.con_cnt // np.maximum(tot_nfrags, 1))
        major = cdpM[s2.pos, s2.con_sym, strand2]
        minor = cdpm[s2.pos, s2.con_sym, strand2]
        w = 1.0 / (minor + 1.0)
        realphred = -INV_LOG10 * np.log(
            (minor + w) / (major + minor + w / np.power(10.0, -avgBQ / 10.0)))
        indep = np.round((2 * con_nfrags - tot_nfrags)
                         * realphred).astype(np.int64)
        confam = np.where(
            s2.st == 1,
            np.maximum(1, np.minimum(
                indep, cfg.fam_phred_indel_inc_before_barcode_labeling
                + np.round(realphred).astype(np.int64))),
            np.maximum(1, np.minimum(indep, 2 * s2.con_cnt - s2.tot)))

        max_qual = sscs_table[refsym2, s2.con_sym] + rescue_add
        confam2 = np.minimum(confam, max_qual)
        hb = tot_nfrags >= cfg.fam_thres_dup1add
        pb = np.clip((max_qual - confam2 + 2) // 4, 0, NUM_BUCKETS - 1)
        fast_add_at(hist, (strand2[hb], s2.pos[hb], s2.con_sym[hb], pb[hb]), 1)
        confam_ok = ((tot_nfrags >= cfg.fam_thres_dup1add)
                     & (con_nfrags * 100
                        >= tot_nfrags * cfg.fam_thres_dup1perc))
        mut = np.zeros(len(s2.group), dtype=bool)
        base_m = s2.st == 0
        mut[base_m] = ((refsym2[base_m] != s2.con_sym[base_m])
                       & (refsym2[base_m] < 4) & (s2.con_sym[base_m] < 4))
        link_m = s2.st == 1
        mut[link_m] = ((s2.con_sym[link_m] != int(Symbol.LINK_M))
                       & (s2.con_sym[link_m] != int(Symbol.LINK_NN)))
        highbq = np.where(s2.st == 1, True, confam >= cfg.bias_thres_highBQ)
        mut = mut & highbq

    # phase signatures (fq tier)
    mutforms_fq, mutforms_f2q = _phase_signatures(
        s2, mut, famgrp, confam_ok, cfg)

    # ---- duplex (strand-paired families with duplexflag 0x2)
    ddp1 = np.zeros((P, NS), dtype=np.int64)
    ddp2 = np.zeros((P, NS), dtype=np.int64)
    cdpd_set, dscs_set = frozenset(), frozenset()
    if np.any((fam_dflag & 0x2) != 0):
        cdpd_set, dscs_set = _duplex(ddp1, ddp2, cdpD, s1, famgrp, P, cfg)

    # family exact-indel tables (cDP1 / tier-2 / duplex levels)
    fam_indel = _family_indels(frag_gap_info, fc, fam_of_frag, P,
                               famgrp.frag_of_read, batch, fam_strand,
                               good_set, cdpd_set, famgrp.duplex_pair,
                               dscs_set)

    # ---- final: per-strand IID qualities from the family buckets
    vq_cIAQ = np.zeros((P, NS, 2), dtype=np.int64)
    vq_cIAD = np.zeros((P, NS, 2), dtype=np.int64)
    vq_cIDQ = np.zeros((P, NS, 2), dtype=np.int64)
    refmat = np.broadcast_to(ref_syms[:, None], (P, NS))
    symmat = np.broadcast_to(np.arange(NS)[None, :], (P, NS))
    mq_all = sscs_table[refmat, symmat] + rescue_add
    tot_types = cns.sum_by_symboltype(
        np.ascontiguousarray(cdp1.transpose(2, 0, 1)))  # [2,P,14] one pass
    for strand in (0, 1):
        q, ad, bq = _iid_scan(mq_all, 4, hist[strand], tot_types[strand])
        vq_cIAQ[:, :, strand] = q
        vq_cIAD[:, :, strand] = ad
        vq_cIDQ[:, :, strand] = bq

    return FQResult(cdp1=cdp1, cdp12=cdp12, cdp2=cdp2, cdp3=cdp3,
                    cdp21=cdp21, cdpM=cdpM, cdpm=cdpm, cdpD=cdpD,
                    ddp1=ddp1, ddp2=ddp2, c2info=c2info,
                    vq_cIAQ=vq_cIAQ, vq_cIAD=vq_cIAD, vq_cIDQ=vq_cIDQ,
                    fam_indel=fam_indel, mutforms_fq=mutforms_fq,
                    mutforms_f2q=mutforms_f2q)


def _run_fq_statics(frag_gap_info, famgrp, ref_syms, sscs_table, thres,
                    baq, baq2, batch, P, cfg):
    """run_fq over the statics-resident fragment rows
    (updateByAlns3UsingFQ, main.hpp:2832-3594): the family merge, both
    sweeps and the row scans run inside the .so with zero dense-row
    materialization; python receives the [P,14,*] planes plus only the
    sparse good-family and phase-eligible rows.  Returns None when the
    native merge rejects its input (the caller then fetches the rows and
    runs the dense path)."""
    from ..ops import native_rowpile as nr
    fam_of_frag = famgrp.fam_of_frag
    # int32: these are pure count planes scattered to by the native
    # kernels; half the bytes -> half the cache traffic of the sweeps
    z3 = lambda: np.zeros((P, NS, 2), dtype=np.int32)  # noqa: E731
    cdp1, cdp12, cdp2, cdp3, cdp21 = z3(), z3(), z3(), z3(), z3()
    cdpM, cdpm, cdpD = z3(), z3(), z3()
    rescue_add = 0 if cfg.vcf_tumor_fname in (".", "") else 4
    hist = np.zeros((2, P, NS, NUM_BUCKETS), dtype=np.int32)
    fused = nr.fam_chain_statics(famgrp, P, cfg, ref_syms, sscs_table,
                                 rescue_add, cdp12, cdp21, cdp2, cdp3,
                                 cdpm, cdpM, cdp1, hist,
                                 pdel_ign=_pdel_ignored(cfg))
    if fused is not None:
        (gg, gp, gst, gs, gcnt, gtot), m2, fbeg, fend = fused
    else:
        res1 = nr.fam_cons_statics(fam_of_frag, famgrp.n_fams,
                                   cfg.fam_thres_highBQ_snv, P,
                                   pdel_ign=_pdel_ignored(cfg))
        if res1 is None:
            return None
        _, fbeg, fend = res1
        gg, gp, gst, gs, gcnt, gtot = nr.fq_sweep1_statics(
            famgrp.fam_strand, famgrp.fam_dflag, P, cfg,
            cdp12, cdp21, cdp2, cdp3, cdpm, cdpM)
        m2 = nr.fq_sweep2_statics(famgrp.fam_strand, ref_syms, sscs_table,
                                  cdpM, cdpm, P, rescue_add, cfg, cdp1,
                                  hist)
        if m2 is None:
            raise RuntimeError("fq_sweep2_statics: stale internal table")
    c2info = {nm: np.zeros((P, NS), dtype=np.int64) for nm in C2_NAMES}
    if len(gg):
        _c2_bias_sparse(c2info, gg, gp, gst, gs, fbeg, fend, thres, baq,
                        baq2, P, cfg)
    ind = (gs >= 7) & (gs <= 12)
    good_set = set(zip(gg[ind].tolist(), gp[ind].tolist(),
                       gs[ind].tolist()))
    mutforms_fq, mutforms_f2q = _phase_signatures_sparse(
        m2, famgrp.fam_strand)

    # duplex tiers are gated off on this path (no 0x2 dflags; see run_fq)
    ddp1 = np.zeros((P, NS), dtype=np.int64)
    ddp2 = np.zeros((P, NS), dtype=np.int64)
    fam_indel = _family_indels(frag_gap_info, None, fam_of_frag, P,
                               famgrp.frag_of_read, batch,
                               famgrp.fam_strand, good_set, frozenset(),
                               famgrp.duplex_pair, frozenset())

    vq_cIAQ = np.zeros((P, NS, 2), dtype=np.int64)
    vq_cIAD = np.zeros((P, NS, 2), dtype=np.int64)
    vq_cIDQ = np.zeros((P, NS, 2), dtype=np.int64)
    refmat = np.broadcast_to(ref_syms[:, None], (P, NS))
    symmat = np.broadcast_to(np.arange(NS)[None, :], (P, NS))
    mq_all = sscs_table[refmat, symmat] + rescue_add
    tot_types = cns.sum_by_symboltype(
        np.ascontiguousarray(cdp1.transpose(2, 0, 1)))
    for strand in (0, 1):
        q, ad, bq = _iid_scan(mq_all, 4, hist[strand], tot_types[strand])
        vq_cIAQ[:, :, strand] = q
        vq_cIAD[:, :, strand] = ad
        vq_cIDQ[:, :, strand] = bq

    return FQResult(cdp1=cdp1, cdp12=cdp12, cdp2=cdp2, cdp3=cdp3,
                    cdp21=cdp21, cdpM=cdpM, cdpm=cdpm, cdpD=cdpD,
                    ddp1=ddp1, ddp2=ddp2, c2info=c2info,
                    vq_cIAQ=vq_cIAQ, vq_cIAD=vq_cIAD, vq_cIDQ=vq_cIDQ,
                    fam_indel=fam_indel, mutforms_fq=mutforms_fq,
                    mutforms_f2q=mutforms_f2q)


def _phase_signatures_sparse(m2, fam_strand):
    """_phase_signatures over the sparse phase-eligible rows emitted by
    fq_sweep2_statics (g, pos, st, sym, confam_ok; sorted by (g,pos,st))."""
    mg, mp, mst, msym, mok = m2
    mutforms_fq = {}
    mutforms_f2q = {}
    if len(mg) == 0:
        return mutforms_fq, mutforms_f2q
    order = np.lexsort((1 - mst, mp, mg))
    go = mg[order]
    gstart = np.concatenate([[True], go[1:] != go[:-1]])
    bounds = np.append(np.flatnonzero(gstart), len(go))
    for bi in np.flatnonzero(np.diff(bounds) >= 2):
        lo, hi = int(bounds[bi]), int(bounds[bi + 1])
        rows = order[lo:hi]
        sig = tuple(zip(mp[rows].tolist(), msym[rows].tolist()))
        strand = int(fam_strand[int(go[lo])])
        mutforms_fq.setdefault(sig, [0, 0])[strand] += 1
        rows_cf = rows[mok[rows] != 0]
        if len(rows_cf) >= 2:
            sig2 = tuple(zip(mp[rows_cf].tolist(), msym[rows_cf].tolist()))
            mutforms_f2q.setdefault(sig2, [0, 0])[strand] += 1
    return mutforms_fq, mutforms_f2q


def _c2_bias_sparse(c2info, g, pos, st, sym, fbeg, fend, thres, baq, baq2,
                    P, cfg):
    """_c2_bias over the sparse good-family rows (statics path); fbeg/fend
    come from the native family merge instead of a dense row scan."""
    is_gap = st == 1
    l_nb = np.maximum(pos + 1 - fbeg[g], 0)
    r_nb = np.maximum(fend[g] + 1 - pos, 0)

    const_LPxT = np.where(is_gap, thres.aLPxT[pos],
                          np.minimum(thres.aLPxT[pos], thres.aRPxT[pos]))
    is_far = (l_nb >= const_LPxT) & (r_nb >= thres.aRPxT[pos])

    def bidir(prefix, nl, nr, L1, L2, R1, R2, mask):
        l1 = mask & (nl >= L1)
        l2 = mask & (nl >= L2)
        r1 = mask & (nr >= R1)
        r2 = mask & (nr >= R2)
        fast_add_at(c2info[prefix[0] + "1"], (pos[l1], sym[l1]), 1)
        fast_add_at(c2info[prefix[0] + "2"], (pos[l2], sym[l2]), 1)
        fast_add_at(c2info[prefix[1] + "1"], (pos[r1], sym[r1]), 1)
        fast_add_at(c2info[prefix[1] + "2"], (pos[r2], sym[r2]), 1)
        fast_add_at(c2info[prefix[0] + "L"], (pos[mask], sym[mask]), nl[mask])
        fast_add_at(c2info[prefix[1] + "L"], (pos[mask], sym[mask]), nr[mask])

    bidir(("c2LP", "c2RP"), l_nb, r_nb,
          thres.aLP1t[pos], thres.aLP2t[pos],
          thres.aRP1t[pos], thres.aRP2t[pos], is_far)
    m0l = l_nb >= cfg.bias_thres_strict_c2LRP0
    fast_add_at(c2info["c2LP0"], (pos[m0l], sym[m0l]), 1)
    m0r = r_nb >= cfg.bias_thres_strict_c2LRP0
    fast_add_at(c2info["c2RP0"], (pos[m0r], sym[m0r]), 1)

    from ..constants import MAX_STR_N_BASES
    lo = np.maximum(fbeg[g], np.maximum(pos - MAX_STR_N_BASES, 0))
    hi = np.minimum(np.minimum(fend[g], pos + MAX_STR_N_BASES), P - 1)
    l_baq = baq[pos] - baq[np.clip(lo, 0, P - 1)] + 1
    r_baq_ = baq[np.clip(hi, 0, P - 1)] - baq[pos] + 1
    r_baq = np.where(is_gap,
                     np.minimum(r_baq_,
                                baq2[np.clip(hi, 0, P - 1)] - baq2[pos] + 7),
                     r_baq_)
    thr_baq = cfg.bias_thres_highBAQ + np.where(is_gap, 0, 3)
    una = (l_baq >= thr_baq) & (r_baq >= thr_baq)
    bidir(("c2LB", "c2RB"), l_baq, r_baq,
          cfg.bias_thres_BAQ1, cfg.bias_thres_BAQ2,
          cfg.bias_thres_BAQ1, cfg.bias_thres_BAQ2, una)
    fast_add_at(c2info["c2BQ2"], (pos, sym), 1)


def _merge_lookup(key_t, kv, key_q):
    """out[i] = kv[j] where key_t[j]==key_q[i] else 0; both keys sorted."""
    from ..ops import native_rowpile
    lib = native_rowpile._load()
    if lib is not None and hasattr(lib, "merge_lookup_i64") and len(key_q) \
            and bool(np.all(key_q[1:] >= key_q[:-1])):
        import ctypes
        out = np.empty(len(key_q), dtype=np.int64)
        lib.merge_lookup_i64(
            np.ascontiguousarray(key_t).ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(kv).ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(len(key_t)),
            np.ascontiguousarray(key_q).ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(len(key_q)))
        return out
    idx = np.searchsorted(key_t, key_q)
    idx_c = np.clip(idx, 0, max(len(key_t) - 1, 0))
    hit = key_t[idx_c] == key_q
    return np.where(hit, kv[idx_c], 0)


def _gather_triplet(kg, kp, ks, kv, qg, qp, qs, P):
    """value at (qg,qp,qs) in the unique table (kg,kp,ks)->kv, 0 if absent."""
    key_t = (kg * P + kp) * NS + ks
    key_q = (qg * P + qp) * NS + qs
    if len(key_t) == 0:
        return np.zeros(len(key_q), dtype=np.int64)
    return _merge_lookup(key_t, kv, key_q)


def _gather_type_sum(kg, kp, ks, kv, qg, qp, qst, P):
    """sum of kv over symbols of the query symboltype at (qg,qp)."""
    kst = (ks >= 6).astype(np.int64)
    gk = (kg * P + kp) * 2 + kst
    # rows from the segmented reduce are sorted by (g,p,sym), hence by
    # (g,p,st) as well: skip the argsort in that (common) case
    if len(gk) == 0 or bool(np.all(gk[1:] >= gk[:-1])):
        gs, vs = gk, kv
    else:
        order = cns._argsort64(gk)
        gs = gk[order]
        vs = kv[order]
    if len(gs) == 0:
        return np.zeros(len(qg), dtype=np.int64)
    seg = np.concatenate([[True], gs[1:] != gs[:-1]])
    sid = np.cumsum(seg) - 1
    sums = np.zeros(int(sid[-1]) + 1, dtype=np.int64)
    fast_add_at(sums, sid, vs)
    ukeys = gs[seg]
    qk = (qg * P + qp) * 2 + qst
    return _merge_lookup(ukeys, sums, qk)


def _c2_bias(c2info, s1, fam_good, famgrp, fc, thres, baq, baq2, P, cfg):
    """SSCS positional/BAQ bias counters (main.hpp:3208-3319), computed per
    good family at its consensus positions.

    The family span bounds (no_strict_bias_pos_min/max and the R1R2
    non-overlap middle) are approximated by the family's covered-position
    extent from the fragment consensus rows."""
    # family extent from fragment rows
    fam_of_row = famgrp.fam_of_frag[fc.group]
    n_fams = famgrp.n_fams
    fbeg = np.full(n_fams, np.iinfo(np.int64).max, dtype=np.int64)
    fend = np.full(n_fams, -1, dtype=np.int64)
    np.minimum.at(fbeg, fam_of_row, fc.pos)
    np.maximum.at(fend, fam_of_row, fc.pos)

    g = s1.group[fam_good]
    pos = s1.pos[fam_good]
    sym = s1.con_sym[fam_good]
    st = s1.st[fam_good]
    is_gap = st == 1
    l_nb = np.maximum(pos + 1 - fbeg[g], 0)
    r_nb = np.maximum(fend[g] + 1 - pos, 0)

    const_LPxT = np.where(is_gap, thres.aLPxT[pos],
                          np.minimum(thres.aLPxT[pos], thres.aRPxT[pos]))
    is_far = (l_nb >= const_LPxT) & (r_nb >= thres.aRPxT[pos])
    tier2 = np.ones(len(pos), dtype=bool)

    def bidir(prefix, nl, nr, L1, L2, R1, R2, mask):
        l1 = mask & (nl >= L1)
        l2 = mask & (nl >= L2)
        r1 = mask & (nr >= R1)
        r2 = mask & (nr >= R2)
        fast_add_at(c2info[prefix[0] + "1"], (pos[l1], sym[l1]), 1)
        fast_add_at(c2info[prefix[0] + "2"], (pos[l2], sym[l2]), 1)
        fast_add_at(c2info[prefix[1] + "1"], (pos[r1], sym[r1]), 1)
        fast_add_at(c2info[prefix[1] + "2"], (pos[r2], sym[r2]), 1)
        fast_add_at(c2info[prefix[0] + "L"], (pos[mask], sym[mask]), nl[mask])
        fast_add_at(c2info[prefix[1] + "L"], (pos[mask], sym[mask]), nr[mask])

    bidir(("c2LP", "c2RP"), l_nb, r_nb,
          thres.aLP1t[pos], thres.aLP2t[pos],
          thres.aRP1t[pos], thres.aRP2t[pos], is_far)
    m0l = l_nb >= cfg.bias_thres_strict_c2LRP0
    fast_add_at(c2info["c2LP0"], (pos[m0l], sym[m0l]), 1)
    m0r = r_nb >= cfg.bias_thres_strict_c2LRP0
    fast_add_at(c2info["c2RP0"], (pos[m0r], sym[m0r]), 1)

    from ..constants import MAX_STR_N_BASES
    lo = np.maximum(fbeg[g], np.maximum(pos - MAX_STR_N_BASES, 0))
    hi = np.minimum(np.minimum(fend[g], pos + MAX_STR_N_BASES), P - 1)
    l_baq = baq[pos] - baq[np.clip(lo, 0, P - 1)] + 1
    r_baq_ = baq[np.clip(hi, 0, P - 1)] - baq[pos] + 1
    r_baq = np.where(is_gap,
                     np.minimum(r_baq_, baq2[np.clip(hi, 0, P - 1)] - baq2[pos] + 7),
                     r_baq_)
    thr_baq = cfg.bias_thres_highBAQ + np.where(is_gap, 0, 3)
    una = (l_baq >= thr_baq) & (r_baq >= thr_baq)
    bidir(("c2LB", "c2RB"), l_baq, r_baq,
          cfg.bias_thres_BAQ1, cfg.bias_thres_BAQ2,
          cfg.bias_thres_BAQ1, cfg.bias_thres_BAQ2, una)
    fast_add_at(c2info["c2BQ2"], (pos, sym), 1)


def _family_indels(frag_gap_info, fc, fam_of_frag, P, frag_of_read, batch,
                   fam_strand, good_set=frozenset(), cdpd_set=frozenset(),
                   duplex_pair=None, dscs_set=frozenset()):
    """Family-level exact-indel tables: per family with an indel consensus,
    the majority exact inserted sequence / deletion length among its
    fragments' gap events (posToIndelToCount_updateByConsensus).

    Returns {(pos,sym): {key: [cADf, cADr, c2ADf, c2ADr, c2dADf, c2dADr]}}:
    cAD = cDP1-level per strand; c2AD adds only tier-2-good families
    (FAM_cDP2 gate, main.hpp:3195-3206); c2dAD adds single-strand
    duplex-flagged families passing tier 1 (FAM_cDPD gate,
    main.hpp:3458-3470) plus both strands of each dDP2-agreeing duplex
    molecule (main.hpp:3531-3546)."""
    fam_indel = {}
    if frag_gap_info is None:
        return fam_indel
    gk_read, gk_pos, gsym, gk_len, gk_del, gk_qpos, g_val = frag_gap_info
    if len(gk_read) == 0:
        return fam_indel
    soff = batch.seq_off
    # per (fam, pos, sym): counts of exact keys across fragment gap events
    counts = {}
    mol_counts = {}
    for j in range(len(gk_read)):
        fam = int(fam_of_frag[frag_of_read[int(gk_read[j])]])
        if gk_del[j]:
            key = int(gk_len[j])
        else:
            s = soff[int(gk_read[j])] + int(gk_qpos[j])
            key = bytes(b"ACGTN"[min(int(c), 4)]
                        for c in batch.seq[s:s + int(gk_len[j])])
        pos, sym = int(gk_pos[j]), int(gsym[j])
        d = counts.setdefault((fam, pos, sym), {})
        d[key] = d.get(key, 0) + 1
        if duplex_pair is not None:
            mol = int(duplex_pair[fam])
            if mol >= 0 and (mol, pos, sym) in dscs_set:
                dm = mol_counts.setdefault((mol, pos, sym), {})
                dm[key] = dm.get(key, 0) + 1

    def _bump(pos, sym, key, idx):
        g = fam_indel.setdefault((pos, sym), {})
        g.setdefault(key, [0, 0, 0, 0, 0, 0])[idx] += 1

    # majority per family -> per-strand counts at the (pos, sym) map
    for (fam, pos, sym), d in counts.items():
        key = max(sorted(d.items()), key=lambda kv: kv[1])[0]
        strand = int(fam_strand[fam])
        _bump(pos, sym, key, strand)
        if (fam, pos, sym) in good_set:
            _bump(pos, sym, key, 2 + strand)
        if (fam, pos, sym) in cdpd_set:
            _bump(pos, sym, key, 4 + strand)
    # dDP2-agreeing duplex molecules count into BOTH strand c2dAD maps
    for (mol, pos, sym), d in mol_counts.items():
        key = max(sorted(d.items()), key=lambda kv: kv[1])[0]
        _bump(pos, sym, key, 4)
        _bump(pos, sym, key, 5)
    return fam_indel


def _phase_signatures(s2, mut, famgrp, confam_ok, cfg):
    """Per-family multi-variant phase strings (fq + confam tiers);
    mut marks phase-eligible rows (precomputed, native or numpy)."""
    mutforms_fq = {}
    mutforms_f2q = {}
    mf = np.flatnonzero(mut)
    if len(mf):
        order = np.lexsort((1 - s2.st[mf], s2.pos[mf], s2.group[mf]))
        mo = mf[order]
        groups = s2.group[mo]
        gstart = np.concatenate([[True], groups[1:] != groups[:-1]])
        bounds = np.append(np.flatnonzero(gstart), len(mo))
        # only families with >=2 mutated rows can form a phase signature;
        # iterate those alone (singleton-mut families dominate the group set)
        sizes = np.diff(bounds)
        for bi in np.flatnonzero(sizes >= 2):
            lo, hi = int(bounds[bi]), int(bounds[bi + 1])
            rows = mo[lo:hi]
            sig = tuple(zip(s2.pos[rows].tolist(), s2.con_sym[rows].tolist()))
            strand = int(famgrp.fam_strand[int(groups[lo])])
            mutforms_fq.setdefault(sig, [0, 0])[strand] += 1
            rows_cf = rows[confam_ok[rows]]
            if len(rows_cf) >= 2:
                sig2 = tuple(zip(s2.pos[rows_cf].tolist(),
                                 s2.con_sym[rows_cf].tolist()))
                mutforms_f2q.setdefault(sig2, [0, 0])[strand] += 1
    return mutforms_fq, mutforms_f2q


def _duplex(ddp1, ddp2, cdpD, s1, famgrp, P, cfg):
    """Duplex pairing (main.hpp:3382-3550): a duplex-flagged molecule with
    families on BOTH strands contributes dDP1 (>=1 strand covering) and
    dDP2 (both strands agreeing on the consensus symbol); a duplex-flagged
    molecule with only ONE strand contributes FAM_cDPD when it passes the
    tier-1 family thresholds."""
    mol_all = famgrp.duplex_pair
    n_mol = int(mol_all.max()) + 1 if len(mol_all) else 0
    strands_seen = np.zeros((n_mol, 2), dtype=bool)
    dx = mol_all >= 0
    strands_seen[mol_all[dx], famgrp.fam_strand[dx]] = True
    is_dscs_mol = strands_seen[:, 0] & strands_seen[:, 1]

    mol = famgrp.duplex_pair[s1.group]
    strand = famgrp.fam_strand[s1.group]
    dm = (mol >= 0) & is_dscs_mol[np.maximum(mol, 0)]
    dscs_set = frozenset()
    if dm.any():
        _, dc = cns.reduce_and_consensus(
            mol[dm], s1.pos[dm], s1.con_sym[dm],
            np.ones(int(dm.sum()), dtype=np.int64), P, "sum",
            link_m_overridden=False)
        fast_add_at(ddp1, (dc.pos, dc.con_sym), 1)
        two = dc.tot > 1
        fast_add_at(ddp2, (dc.pos[two], dc.con_sym[two]), 1)
        ind2 = two & (dc.con_sym >= 7) & (dc.con_sym <= 12)
        dscs_set = frozenset(zip(dc.group[ind2].tolist(),
                                 dc.pos[ind2].tolist(),
                                 dc.con_sym[ind2].tolist()))
    # single-strand duplex-flagged families -> cDPD
    sm = (mol >= 0) & ~is_dscs_mol[np.maximum(mol, 0)] \
        & (s1.tot >= cfg.fam_thres_dup1add) \
        & (s1.con_cnt * 100 >= s1.tot * cfg.fam_thres_dup1perc)
    if sm.any():
        fast_add_at(cdpD, (s1.pos[sm], s1.con_sym[sm], strand[sm]), 1)
    smi = sm & (s1.con_sym >= 7) & (s1.con_sym <= 12)
    cdpd_set = frozenset(zip(s1.group[smi].tolist(), s1.pos[smi].tolist(),
                             s1.con_sym[smi].tolist()))
    return cdpd_set, dscs_set


def _iid_scan(max_qual, dec_qual, hist, totDP):
    """numpy infer_max_qual_assuming_independence over [P,NS,16]."""
    from ..ops import native_rowpile
    nat = native_rowpile.iid_scan(max_qual, dec_qual, hist, totDP)
    if nat is not None:
        return nat
    DBL_EPS = 2.220446049250313e-16
    idx = np.arange(NUM_BUCKETS)
    curr_ad = np.cumsum(hist, axis=-1)
    curr_bq = max_qual[..., None] - dec_qual * idx
    with np.errstate(divide="ignore", invalid="ignore"):
        exp_bq = INV_LOG10 * np.log(totDP[..., None] / np.maximum(curr_ad, 1) + DBL_EPS)
    vq = (curr_ad * (curr_bq - exp_bq)).astype(np.int64)
    valid = (hist > 0) & (idx < np.maximum(max_qual[..., None] // dec_qual, 0))
    vq = np.where(valid, vq, np.iinfo(np.int64).min)
    best = np.argmax(vq, axis=-1)
    mv = np.take_along_axis(vq, best[..., None], axis=-1)[..., 0]
    found = mv > 0
    q = np.where(found, mv, 0)
    ad = np.where(found, np.take_along_axis(curr_ad, best[..., None], -1)[..., 0], 0)
    bq = np.where(found, max_qual - dec_qual * best, 0)
    return q, ad, bq
