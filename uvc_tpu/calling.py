"""Per-region variant calling: pileup tensors -> dense quality model ->
candidate records.

Implements the per-position emission pipeline of process_batch
(main.cpp:608-1172) on dense [P,14] arrays: candidate gating, DPv
reduction, quality model, germline LOD, tumor-only TLODQ, and the
QUAL/FILTER banding of append_vcf_record (main.hpp:6027-6272).
"""

from dataclasses import dataclass, field
import math

import numpy as np

from .constants import (Symbol, NUM_SYMBOLS, SYMBOL_TO_DESC, AssayType,
                        OUTVAR_ANY)
from .model import dpv, fmtarrays, germline, qual
from .pileup import region as region_mod
from .pileup.consensus import sum_by_symboltype

NS = NUM_SYMBOLS
INV_LOG10 = 10.0 / math.log(10.0)


@dataclass
class VariantRecord:
    pos: int          # 0-based refpos (internal)
    symbol: int
    vcfpos: int       # 1-based VCF POS
    ref: str
    alt: str
    qual: float
    filter: str
    info: dict
    fmt: dict         # FORMAT tag -> value(s)


def tumor_only_tlodq(F, cfg):
    """append_vcf_record's TLODQ with the all-zero normal (tumor-only)."""
    prior_phred = 3  # Illumina
    tAD1 = (F["cDP1x"] + 0.5) / 100.0
    tDP1 = (F["CDP1x"] + 1.0) / 100.0
    tn_dec = np.clip(F["bNMQ"],
                     cfg.microadjust_syserr_MQ_NMR_tn_syserr_no_penal_qual_min,
                     cfg.microadjust_syserr_MQ_NMR_tn_syserr_no_penal_qual_max) \
        - cfg.microadjust_syserr_MQ_NMR_tn_syserr_no_penal_qual_min

    def q4(tAD, tDP, tVQ, cap, nAD, nDP, nVQ, tn_dec_by_xm):
        # clip to keep the dense computation finite on non-candidate rows
        # (reference asserts cDPx <= CDPx for emitted alleles)
        tAD = np.minimum(tAD, tDP)
        binom = qual.binom_lr((tDP - tAD) / tDP, nDP - nAD, nAD).astype(np.int64)
        nADplus = nAD * np.clip(nDP / tDP - 1.0, 0, 1)
        bjp = ((tAD + 0.5) / (tDP + 1.0)) / ((nAD + 0.5 + nADplus) / (nDP + 1.0 + nADplus))
        powl = np.round(cfg.powlaw_exponent * INV_LOG10 * np.log(bjp)).astype(np.int64)
        # (-(uvc1_qual_t)nAD)*3 truncates the fractional normal AD to 0
        inc = np.maximum.reduce([
            np.full_like(binom, -prior_phred),
            np.full_like(binom, -int(nAD) * 3),
            np.minimum(binom - prior_phred, powl - prior_phred)])
        dec = np.maximum(0, nVQ - np.maximum(0, np.minimum(
            binom - prior_phred,
            (np.square(np.log(np.maximum(bjp, 1.001)) / math.log(2.0))
             * cfg.tn_syserr_norm_devqual).astype(np.int64))))
        dec = np.maximum(dec, np.minimum(nVQ + 9, tn_dec_by_xm))
        return np.minimum(cap, tVQ + inc) - dec

    b4 = q4(tAD1, tDP1, F["cVQ1"], F["cPCQ1"], 0.005, 0.01, 0, tn_dec)
    tAD2 = (F["cDP2x"] + 0.5) / 100.0
    tDP2 = (F["CDP2x"] + 1.0) / 100.0
    c4 = q4(tAD2, tDP2, F["cVQ2"], F["cPCQ2"], 0.005, 0.01, 0,
            np.maximum(tn_dec, 0))
    tlodq1 = np.maximum(b4, c4)
    tlodq = np.where(tlodq1 >= 10, tlodq1, tlodq1 * 3 - 20)
    return tlodq, b4, c4


def call_variants(batch, ref_syms, refstring, region_offset, chrom, cfg,
                  is_tumor_only=True):
    """Returns (records, region_result, F)."""
    res = region_mod.call_region(batch, ref_syms, region_offset, cfg,
                                 is_normal=not is_tumor_only)
    assay = res.assay_type
    minABQ_snv = (cfg.syserr_minABQ_pcr_snv if assay == AssayType.AMPLICON
                  else cfg.syserr_minABQ_cap_snv)
    minABQ_indel = (cfg.syserr_minABQ_pcr_indel if assay == AssayType.AMPLICON
                    else cfg.syserr_minABQ_cap_indel)
    F = fmtarrays.build(res, cfg, minABQ_snv, minABQ_indel)
    P = F["P"]

    # per-position indel depth context (main.cpp:817-831)
    cdepth = (np.maximum(res.fq.cdp1[:, :, 0], res.fq.cdp12[:, :, 0])
              + np.maximum(res.fq.cdp1[:, :, 1], res.fq.cdp12[:, :, 1]))
    bdp = res.bq.bdp.sum(axis=2)
    F["ins_cdepth"] = cdepth[:, [10, 11, 12]].sum(axis=1)
    F["del_cdepth"] = cdepth[:, [7, 8, 9]].sum(axis=1)
    F["ins1_cdepth"] = cdepth[:, 12]
    F["del1_cdepth"] = cdepth[:, 9]

    cand = dpv.candidate_mask(F, cfg, is_tumor_only)
    dpv.calc_dpv(F, cfg, is_tumor_only)
    dpv.sum_dpv(F, cand)
    qual.calc_qual(F, cfg, is_tumor_only)
    germ = germline.germline_nlodq(F, cand, cfg, is_tumor_only)
    tlodq, b4, c4 = tumor_only_tlodq(F, cfg)

    # lowestVAQ (main.hpp:6196-6201)
    bDP_allele = F["bDPf"] + F["bDPr"]
    refsym = F["ref_syms"][:, None]
    sym = np.broadcast_to(np.arange(NS)[None, :], (P, NS))
    is_deam = (((refsym == 1) & (sym == 3)) | ((refsym == 2) & (sym == 0)))
    b_min = 2 + 3 - (-INV_LOG10 * np.log(
        (bDP_allele + 1e-3) / (F["BDP"] + 1.0))) / 10.0
    c2v_min = 2 + 5 - (-INV_LOG10 * np.log(
        (F["cDP2x"] * 0.01 + 1e-5) / (F["CDP2x"] * 0.01 + 1.0)
        / np.where(is_deam, 5.0, 1.0))) / 10.0
    lowestVAQ = np.maximum(b_min, c2v_min)
    raw_q = np.maximum(tlodq.astype(np.float64), lowestVAQ)
    base10 = 10.0 ** 0.1
    vcfqual = np.where(raw_q < 10.0,
                       np.log1p(np.power(base10, raw_q)) / math.log(base10),
                       raw_q)

    # assemble records for candidates
    records = []
    cand_idx = np.argwhere(cand)
    is_subst = dpv.IS_SUBST
    germ_phred = {0: cfg.germ_phred_hetero_snp, 1: cfg.germ_phred_hetero_indel}
    for p, s in cand_idx:
        p, s = int(p), int(s)
        st = 0 if s < 6 else 1
        stq = germ[st]
        nlodq_ss = int(stq["nlodq"][p]) - 3 + germ_phred[st]
        q = float(vcfqual[p, s])
        keep = ((q >= cfg.vqual)
                or (is_tumor_only
                    and ((F["aBQ2"][p, s] >= cfg.vad1 and F["ABQ2"][p, s] >= cfg.vdp1
                          and F["ABQ2"][p, s] * cfg.vfa1 <= F["aBQ2"][p, s])
                         or (bDP_allele[p, s] >= cfg.vad2 and F["BDP"][p, s] >= cfg.vdp2
                             and F["BDP"][p, s] * cfg.vfa2 <= bDP_allele[p, s]))))
        ref_here = (s == F["ref_syms"][p]) if st == 0 else (s == int(Symbol.LINK_M))
        if ref_here and not cfg.should_output_all:
            keep = False
        if s == int(Symbol.BASE_NN) or s == int(Symbol.LINK_NN):
            keep = keep and False  # OUTVAR gating for NN handled later
        if not keep:
            continue
        # REF/ALT strings (main.hpp:6064-6089)
        regionpos = p
        gap_key = F["gapSa"].get((p, s))
        gap_len = int(F["gapLen"][p, s])
        if s in (7, 8, 9, 10, 11, 12) and gap_len > 0:
            vcfpos = p  # 1-based anchored at p-1 (internal p == VCF pos)
            anchor = refstring[regionpos - 1:regionpos].decode() if regionpos > 0 else "n"
            if s in (10, 11, 12):
                iseq = gap_key.decode() if isinstance(gap_key, bytes) else ""
                ref_a, alt_a = anchor, anchor + iseq
            else:
                dseq = refstring[regionpos:regionpos + gap_len].decode()
                ref_a, alt_a = anchor + dseq, anchor
        elif st == 0:
            vcfpos = p + 1
            ref_a = refstring[regionpos:regionpos + 1].decode()
            alt_a = SYMBOL_TO_DESC[s]
        else:
            vcfpos = p
            ref_a = refstring[regionpos - 1:regionpos].decode() if regionpos > 0 else "n"
            alt_a = SYMBOL_TO_DESC[s]

        if q < 10:
            filt = "Q10"
        elif q < 20:
            filt = "Q20"
        elif q < 30:
            filt = "Q30"
        elif q < 40:
            filt = "Q40"
        elif q < 50:
            filt = "Q50"
        elif q < 60:
            filt = "Q60"
        else:
            filt = "PASS"
        tl = int(tlodq[p, s])
        info = {
            "ANY_VAR": True, "SomaticQ": min(tl, nlodq_ss),
            "TLODQ": tl, "NLODQ": nlodq_ss, "NLODV": SYMBOL_TO_DESC[NS],
            "tbDP": int(F["BDP"][p, s]),
            "tDP": int(F["CDP1"][p, s]),
            "tAD": (int(F["AD"][p, F["ref_syms"][p] if st == 0 else int(Symbol.LINK_M)]),
                    int(F["AD"][p, s])),
            "RU": "", "RC": int(F["ctx_repeatnum"][p]),
        }
        fmt = {
            "GT": "./1",
            "VTI": s, "VTD": SYMBOL_TO_DESC[s],
            "DP": int(F["CDP1"][p, s]), "AD": int(F["AD"][p, s]),
            "bDP": int(F["BDP"][p, s]), "bAD": int(F["bAD"][p, s]),
            "cVQ1": int(F["cVQ1"][p, s]), "cVQ2": int(F["cVQ2"][p, s]),
            "gVQ1": int(F["gVQ1"][p, s]), "CONTQ": int(F["CONTQ"][p, s]),
            "bIAQ": int(F["bIAQ"][p, s]), "cPLQ1": int(F["cPLQ1"][p, s]),
            "bMQQ": int(F["bMQQ"][p, s]), "aBQQ": int(F["aBQQ"][p, s]),
            "cDP1v": int(F["cDP1v"][p, s]), "CDP1v": int(F["CDP1v"][p, s]),
            "FTS": "|".join(nm for nm, (flag, _) in F["FTS"].items()
                            if flag[p, s]) or "PASS",
        }
        records.append(VariantRecord(
            pos=p, symbol=s, vcfpos=vcfpos + region_offset, ref=ref_a,
            alt=alt_a, qual=round(q, 4), filter=filt, info=info, fmt=fmt))
    records.sort(key=lambda r: (r.vcfpos, r.symbol))
    return records, res, F
