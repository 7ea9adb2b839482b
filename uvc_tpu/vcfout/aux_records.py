"""Auxiliary VCF record emitters: MGVCF <NON_REF> blocks, additional-indel
-candidate records, and GERMLINE genotype lines.

Behavioral reference: main.cpp:655-757 (MGVCF run-length-compressed blocks
per 1000bp), main.cpp:759-799 (<ADDITIONAL_INDEL_CANDIDATE> clip/STR
records), main.hpp:5483-5775 (output_germline emission).
"""

import math

import numpy as np

from ..constants import (Symbol, NUM_SYMBOLS, MGVCF_REGION_MAX_SIZE,
                         MGVCF_SYMBOL, ADDITIONAL_INDEL_CANDIDATE_SYMBOL,
                         SYMBOL_TO_DESC, OUTVAR_MGVCF, OUTVAR_GERMLINE,
                         OUTVAR_ADDITIONAL_INDEL_CANDIDATE, CHAR_TO_SYMBOL)

NS = NUM_SYMBOLS
INV_LOG10 = 10.0 / math.log(10.0)
INT32_MIN_STR = "."


def _are_depths_diff(curr, prev, mul_perc=130, add_num=3):
    mn, mx = min(curr, prev), max(curr, prev)
    if mn * mul_perc >= mx * 100:
        return False
    if mn + add_num >= mx:
        return False
    return True


def emit_mgvcf(F, res, cfg, chrom, refstring, region_offset, region_beg,
               region_end, t1_end=None, tumor_col=None):
    """MGVCF_BLOCK lines for one region; region_beg/end are region-relative
    emission bounds.  t1_end (region-relative, exclusive) is the owning
    tier-1 region's end: block CONTENT is cut there (main.cpp:666 cuts at
    the region's unified exclusive end), never at a tier-2 unit boundary,
    so the emitted blocks are independent of the work-unit size."""
    if not (cfg.outvar_flag & OUTVAR_MGVCF):
        return []
    P = F["P"]
    if t1_end is None:
        t1_end = P
    bdp_t = res.bq.bdp.sum(axis=2)     # [P,14]
    cdp1_t = res.fq.cdp1.sum(axis=2)
    cdp12_t = res.fq.cdp12.sum(axis=2)

    def tsum(arr, st):
        return arr[:, :6].sum(axis=1) if st == 0 else arr[:, 6:].sum(axis=1)

    ref_syms = F["ref_syms"]
    # vectorized per-(pos, symboltype) depths and homref qualities
    from ..model.germline import binom_lr  # host numpy kernel
    stats = {}
    rows = np.arange(P)
    for st in (0, 1):
        refsym = (ref_syms.astype(np.int64) if st == 0
                  else np.full(P, int(Symbol.LINK_M)))
        bdp = tsum(bdp_t, st)
        cdp = tsum(cdp1_t, st)
        c12 = tsum(cdp12_t, st)
        ref_c = cdp12_t[rows, refsym]
        nonref_c = c12 - ref_c
        rlb = -binom_lr(cfg.contam_any_mul_frac, nonref_c + 0.5, cdp + 1.0)
        rlp = -np.maximum(0.0, cfg.powlaw_exponent * INV_LOG10 * np.log(
            ((nonref_c + 0.5) / (cdp + 1.0) + 2.2e-16)
            / (cfg.contam_any_mul_frac + 2.2e-16)))
        nlb = -binom_lr(cfg.germ_hetero_FA, ref_c + 0.5, cdp + 1.0)
        nlp = -np.maximum(0.0, cfg.powlaw_exponent * INV_LOG10 * np.log(
            ((ref_c + 0.5) / (cdp + 1.0) + 2.2e-16)
            / (cfg.germ_hetero_FA + 2.2e-16)))
        refQ = (cfg.germ_phred_hetero_snp
                + np.round(np.maximum(rlb, rlp)).astype(np.int64)
                - np.round(np.maximum(nlb, nlp)).astype(np.int64))
        stats[st] = (bdp, cdp, c12, refQ)

    lines = []
    blk_starts = [p for p in range(region_beg, region_end)
                  if (p + region_offset) % MGVCF_REGION_MAX_SIZE == 0
                  or p == region_beg]
    for blk_start in blk_starts:
        refpos_abs = blk_start + region_offset
        rp2end = min(blk_start + MGVCF_REGION_MAX_SIZE + 1, t1_end, P)
        vec = _mgvcf_block_vec(stats, blk_start, rp2end, region_offset)
        vcfref = refstring[blk_start:blk_start + 1].decode() or "N"
        match_refsym = int(ref_syms[blk_start])
        line = "\t".join([
            chrom, str(refpos_abs + 1), ".", vcfref, "<NON_REF>", ".", ".",
            "MGVCF_BLOCK", "GT:VTI:POS_VT_BDP_CDP_HomRefQ",
            "." + f":{match_refsym},{MGVCF_SYMBOL}:"
            + ",".join(str(x) for x in vec)
            + "," + str(rp2end + region_offset)])
        if tumor_col is not None:
            line += tumor_col(refpos_abs, MGVCF_SYMBOL)
        lines.append(line)
    return lines


def _mgvcf_block_vec(stats, blk_start, rp2end, region_offset):
    """RLE row selection for one MGVCF block: rows interleaved in
    SYMBOL_TYPES_IN_VCF_ORDER = (LINK, BASE) per position, emitted when
    they differ from the previously emitted row (native scan when built,
    python fallback otherwise)."""
    L = rp2end - blk_start
    if L <= 0:
        return []
    sl = slice(blk_start, rp2end)
    bdp = np.empty(2 * L, dtype=np.int64)
    cdp = np.empty(2 * L, dtype=np.int64)
    c12 = np.empty(2 * L, dtype=np.int64)
    refq = np.empty(2 * L, dtype=np.int64)
    for half, st in ((0, 1), (1, 0)):
        bdp[half::2] = stats[st][0][sl]
        cdp[half::2] = stats[st][1][sl]
        c12[half::2] = stats[st][2][sl]
        refq[half::2] = stats[st][3][sl]

    from ..ops import native_rowpile
    lib = native_rowpile._load()
    if lib is not None and hasattr(lib, "mgvcf_rle"):
        import ctypes
        out_idx = np.empty(2 * L, dtype=np.int64)
        lib.mgvcf_rle.restype = ctypes.c_int64
        m = lib.mgvcf_rle(
            ctypes.c_int64(2 * L),
            bdp.ctypes.data_as(ctypes.c_void_p),
            cdp.ctypes.data_as(ctypes.c_void_p),
            c12.ctypes.data_as(ctypes.c_void_p),
            refq.ctypes.data_as(ctypes.c_void_p),
            out_idx.ctypes.data_as(ctypes.c_void_p))
        emitted = out_idx[:m]
    else:
        emitted = []
        prev = None
        for i in range(2 * L):
            if (prev is None or abs(int(refq[i]) - prev[3]) > 10
                    or _are_depths_diff(int(bdp[i]), prev[0])
                    or _are_depths_diff(int(cdp[i]), prev[1])
                    or _are_depths_diff(int(c12[i]), prev[2])):
                emitted.append(i)
                prev = (int(bdp[i]), int(cdp[i]), int(c12[i]), int(refq[i]))
        emitted = np.asarray(emitted, dtype=np.int64)
    vec = []
    for i in emitted:
        i = int(i)
        rp2 = blk_start + (i >> 1)
        st = 1 - (i & 1)
        vec += [rp2 + region_offset + (1 if st == 0 else 0), 1 + st,
                INT32_MIN_STR, int(bdp[i]), int(cdp[i]), int(c12[i]),
                int(refq[i]), INT32_MIN_STR]
    return vec


def _binom_lr_s(prob, a, b):
    DBL = 2.220446049250313e-16
    prob = (prob + DBL) / (1.0 + 2 * DBL)
    a += DBL
    b += DBL
    A = prob * (a + b)
    B = (1 - prob) * (a + b)
    if a > A:
        return INV_LOG10 * (a * math.log(a / A) + b * math.log(b / B))
    return 0.0


def _logit2(a, b):
    DBL = 2.220446049250313e-16
    return math.log((a + DBL) / (b + DBL))


def emit_indel_candidates(F, res, cfg, chrom, refstring, region_offset,
                          region_beg, region_end, tumor_col=None):
    """<ADDITIONAL_INDEL_CANDIDATE> records (main.cpp:759-799)."""
    if not (cfg.outvar_flag & OUTVAR_ADDITIONAL_INDEL_CANDIDATE):
        return []
    prep = res.bq.prep
    lines = []
    tracklen = np.asarray(F["ctx_repeatnum"]) * np.asarray(F["ctx_unitlen"])
    P = len(tracklen)
    # the reference evaluates the STR-track context at loop position z but
    # anchors the record (prep depths, vcfREF, refpos) at z-1: the BASE
    # symboltype's refpos = zerobased_pos - 1 while repeatunit/repeatnum/
    # curr_tracklen come from zerobased_pos (main.cpp:608-614,644,759-799)
    zs = np.arange(region_beg + 1, region_end + 1)
    if not len(zs):
        return []
    rps = zs - 1
    curr_tl = np.where(zs < P, tracklen[np.minimum(zs, P - 1)], 0)
    prev_tl = tracklen[rps]
    aCDPv = np.asarray(prep.a_near_long_clip_dp)[rps]
    ADPv = np.asarray(prep.a_dp)[rps]
    long_track = curr_tl > np.maximum(
        cfg.microadjust_alignment_tracklen_min - 1, prev_tl)
    clip = ((aCDPv >= cfg.microadjust_alignment_clip_min_count)
            & (aCDPv >= ADPv * cfg.microadjust_alignment_clip_min_frac))
    hit = ((long_track | clip)
           & (ADPv >= 2 * cfg.microadjust_alignment_clip_min_count))
    for i in np.flatnonzero(hit).tolist():
        z, rp = int(zs[i]), int(rps[i])
        aCDP, ADP = int(aCDPv[i]), int(ADPv[i])
        vcfref = refstring[rp:rp + 1].decode() or "N"
        match_refsym = int(F["ref_syms"][rp])
        ru, rc = repeat_context_str(refstring, z, F) if z < P else ("", 0)
        line = "\t".join([
            chrom, str(z + region_offset), ".", vcfref,
            "<ADDITIONAL_INDEL_CANDIDATE>", ".", ".",
            f"ADDITIONAL_INDEL_CANDIDATE;RU={ru};RC={rc}",
            "GT:VTI:clipDP",
            f".:{match_refsym},{ADDITIONAL_INDEL_CANDIDATE_SYMBOL}:{ADP},{aCDP}"])
        if tumor_col is not None:
            line += tumor_col(z + region_offset - 1,
                              ADDITIONAL_INDEL_CANDIDATE_SYMBOL)
        lines.append(line)
    return lines


def tumor_aux_column(tki_map, p_abs, symbol):
    """The re-emitted tumor column next to a normal run's MGVCF /
    <ADDITIONAL_INDEL_CANDIDATE> line (main.cpp:739-755, 784-797):
    exactly-one retrieved record -> its verbatim column; several -> the
    -1 placeholders; none -> the dot placeholders."""
    tkis = tki_map.get((p_abs, symbol))
    if not tkis:
        return "\t.:.,.:." if symbol == MGVCF_SYMBOL else "\t.:.,.:.,."
    if len(tkis) == 1:
        return "\t" + tkis[0].tumor_format_text
    return "\t.:.,.:-1" if symbol == MGVCF_SYMBOL else "\t.:-1,-1:-1,-1"


def repeat_context_str(refstring, p, F):
    ru_len = int(F["ctx_unitlen"][p])
    rc = int(F["ctx_repeatnum"][p])
    ru = refstring[p:p + ru_len].decode()
    return ru, rc


def emit_germline(F, germ, cand, cfg, chrom, refstring, region_offset,
                  region_beg, region_end):
    """GERMLINE lines (output_germline emission, main.hpp:5618-5774)."""
    if not (cfg.outvar_flag & OUTVAR_GERMLINE):
        return []
    lines = []
    ref_syms = F["ref_syms"]
    for st in (0, 1):
        g = germ[st]
        GL4 = g["GL4"]
        order_all = np.argsort(-GL4, axis=1, kind="stable")
        glidx_all = order_all[:, 0]
        max_ad_all = np.maximum(g["alt1_cDP0a"], g["alt2_cDP0a"])
        visit = ((glidx_all != 0) | cfg.should_output_all_germline
                 | (max_ad_all > 2)) & (g["alt1_sym"] < NS)
        has_cand = cand[:, :6].any(axis=1) if st == 0 else cand[:, 6:].any(axis=1)
        visit = visit & has_cand
        for p in np.flatnonzero(visit):
            p = int(p)
            if not (region_beg <= p < region_end):
                continue
            gl = GL4[p]
            order = order_all[p]
            GLidx = int(order[0])
            alt1 = int(g["alt1_sym"][p])
            alt2 = int(g["alt2_sym"][p])
            max_ad = max(int(g["alt1_cDP0a"][p]), int(g["alt2_cDP0a"][p]))
            if GLidx == 0 and not cfg.should_output_all_germline and max_ad <= 2:
                continue
            refsym = int(ref_syms[p]) if st == 0 else int(Symbol.LINK_M)
            # allele strings
            if st == 0:
                vcfpos = p + region_offset + 1
                vcfref = refstring[p:p + 1].decode()
                vcfalt = SYMBOL_TO_DESC[alt1]
                if GLidx == 3 and alt2 < NS:
                    vcfalt += "," + SYMBOL_TO_DESC[alt2]
            else:
                vcfpos = p + region_offset
                anchor = refstring[p - 1:p].decode() if p > 0 else "n"
                vcfref, vcfalt = _germ_indel_alleles(F, p, alt1, alt2, GLidx,
                                                     anchor, refstring)
            GTs = ["0/0", "0/1", "1/1", "1/2"]
            germ_GQ = int(gl[order[0]] - gl[order[1]])
            adr = [int(F["cDP0a"][p, refsym]), int(g["alt1_cDP0a"][p])]
            if GLidx == 3:
                adr.append(int(g["alt2_cDP0a"][p]))
            cdp1b = int(F["CDP1"][p, refsym])
            lines.append("\t".join([
                chrom, str(vcfpos), ".", vcfref, vcfalt, str(germ_GQ),
                "PASS", "GERMLINE", "GT:GQ:HQ:FT:CDP1:cDP1:GL4:GST:note",
                ":".join([
                    GTs[GLidx], str(germ_GQ), "0,0", "PASS",
                    f"{cdp1b},{2 * int(F['CDP1d'][p, refsym])}",
                    ",".join(str(x) for x in adr),
                    ",".join(str(int(x)) for x in gl),
                    ",".join(str(int(x)) for x in
                             list(g["a_lodqs"][p]) + list(g["het_lodqs"][p])),
                    ""])]))
    return lines


def _germ_indel_alleles(F, p, alt1, alt2, GLidx, anchor, refstring):
    def allele(sym):
        key = F["gapSa"].get((p, sym))
        glen = int(F["gapLen"][p, sym])
        if sym in (10, 11, 12) and isinstance(key, bytes):
            return anchor, anchor + key.decode()
        if sym in (7, 8, 9) and glen > 0:
            return anchor + refstring[p:p + glen].decode(), anchor
        return anchor, SYMBOL_TO_DESC[sym]

    r1, a1 = allele(alt1)
    if GLidx != 3 or alt2 >= NS:
        return r1, a1
    r2, a2 = allele(alt2)
    # normalize to a common REF (longest), suffix-extend alts
    if len(r1) >= len(r2):
        a2 = a2 + r1[len(r2):]
        return r1, a1 + "," + a2
    a1 = a1 + r2[len(r1):]
    return r2, a1 + "," + a2
