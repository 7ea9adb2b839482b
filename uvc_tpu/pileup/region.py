"""Per-region orchestration: dedup grouping -> BQ tier -> FQ tier.

Equivalent of Symbol2CountCoverageSet::updateByRegion3Aln (main.hpp:3665-
3742): runs the prep/threshold passes, the segment (BQ) engine, and the
family (FQ) engine over one region's read batch, returning all per-position
per-symbol tensors the variant-call model consumes.
"""

from dataclasses import dataclass

import numpy as np

from ..family import dedup, engine_fq
from ..model import sscs
from ..constants import AssayType, SequencingPlatform
from . import bqcorr
from . import consensus as cns
from . import engine_bq, events, strscan


@dataclass
class RegionResult:
    bq: engine_bq.BQResult
    fq: engine_fq.FQResult
    tracks: strscan.RepeatTracks
    baq: np.ndarray
    baq2: np.ndarray
    famgrp: dedup.FamilyGrouping
    ref_syms: np.ndarray
    region_offset: int
    assay_type: AssayType
    frag_cons: object = None


def infer_assay(famgrp, cfg) -> AssayType:
    """Amplicon vs capture inference (main.cpp:510-511): amplicon when
    pcrpassed * 2 > passed. The per-fragment amplicon flags come from
    border/insert coverage ratios (grouping.cpp:780-860, implemented in
    family.dedup.detect_amplicon)."""
    if cfg.assay_type != AssayType.AUTO:
        return cfg.assay_type
    if famgrp.pcrpassed * 2 > famgrp.n_frags:
        return AssayType.AMPLICON
    return AssayType.CAPTURE


def call_region(batch, ref_syms, region_offset, cfg,
                is_normal=False) -> RegionResult:
    P = len(ref_syms)
    # the read slice shares storage with the whole-BAM batch (and with the
    # pad reads of adjacent work units): correct a private copy so each
    # region sees pristine base qualities, like the reference's per-region
    # BAM fetch (grouping.cpp:608-664) -- never mutate shared memory
    batch.qual = batch.qual.copy()
    bqcorr.apply(batch, cfg)
    table = events.expand(batch)

    platform = cfg.inferred_sequencing_platform
    if platform == SequencingPlatform.AUTO:
        platform = SequencingPlatform.ILLUMINA
    famgrp = dedup.group_families(batch, table, cfg, cfg.assay_type, platform)
    assay = infer_assay(famgrp, cfg)

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

    dflag = famgrp.frag_dflag[famgrp.frag_of_read]
    if assay == AssayType.AMPLICON:
        dflag = dflag | 0x4

    prep = engine_bq.pass_a_prep(table, batch, ref_syms, tracks, baq,
                                 region_offset, P, cfg, dflag)
    thres = engine_bq.pass_b_thres(prep, tracks, cfg, is_normal)
    allev, gap_info = engine_bq.compute_event_values(
        table, batch, ref_syms, tracks, baq, baq2, prep, thres,
        region_offset, P, cfg, dflag,
        is_proton=(platform == SequencingPlatform.IONTORRENT))
    info, bg, a1, a2 = engine_bq.pass_c_scatter(
        allev, table, baq, baq2, thres, region_offset, P, cfg, dflag)

    # shared fragment consensus: sort-free per-fragment stream merge when
    # the native kernel is built (exact parity), else the sorting reduce
    import os as _os
    from ..ops import native_rowpile as nr
    pd_pre = None
    if _os.environ.get("UVC_TPU_DEVICE_PREPARE", "") == "1":
        # on-device prepare: the fragment sort+reduce+consensus (the hot
        # op of updateByRegion3Aln, main.hpp:3665-3742) runs as ONE jitted
        # XLA program on the default jax backend instead of the native
        # host kernel; the rest of the pipeline is unchanged and the
        # output is bit-identical (tests/test_device_consensus.py +
        # test_aux_tools.test_device_prepare_gate)
        from ..ops import device_consensus as devcons
        frag = famgrp.frag_of_read[allev.read]
        _, cons6 = devcons.device_reduce_consensus(
            frag, allev.pos, allev.sym, allev.val, P, "max",
            link_m_overridden=True)
        fc6 = cons6
    else:
        # statics mode keeps the consensus rows inside the .so for the
        # pass-D + family chain; the consensus-FASTQ emitter reads
        # res.frag_cons much later (after the statics were reused), so
        # that flag forces a fetch
        fc6 = None
        if nr.has_statics_path() and not cfg.fam_consensus_out_fastq:
            # fused merge: pass D runs inside the fragment flush while
            # the consensus rows are cache-hot
            import numpy as _np
            normMQ = _np.zeros(famgrp.n_frags, dtype=_np.int64)
            if famgrp.n_frags:
                _np.maximum.at(normMQ, famgrp.frag_of_read,
                               table.reads.mapq)
            aDP4 = (info.aDPff + info.aDPfr + info.aDPrf + info.aDPrr)
            fused = nr.frag_cons_with_pass_d(
                allev, famgrp.frag_of_read, famgrp.n_frags, P, bg, aDP4,
                ref_syms, famgrp.frag_strand, normMQ,
                cfg.bias_thres_highBQ, cfg.syserr_mut_region_n_bases)
            if fused is not None:
                fc6, pd_pre = fused
        if fc6 is None:
            fc6 = nr.frag_cons_direct(allev, famgrp.frag_of_read,
                                      famgrp.n_frags, P,
                                      link_m_overridden=True,
                                      fetch=not nr.has_statics_path()
                                      or bool(cfg.fam_consensus_out_fastq))
    if isinstance(fc6, nr.StaticFragCons):
        # rows stay resident in the .so statics: pass_d and the family
        # chain read them in place (no numpy round trip)
        frag_gc = fc6
    elif fc6 is not None:
        frag_gc = cns.GroupConsensus(*fc6)
    else:
        frag = famgrp.frag_of_read[allev.read]
        _, frag_gc = cns.reduce_and_consensus(frag, allev.pos, allev.sym,
                                              allev.val, P, "max",
                                              link_m_overridden=True)

    bdp, bta, btb, hist, vq_bMQ, frag_indel, mutforms = \
        engine_bq.pass_d_fragments(allev, gap_info, table, ref_syms,
                                   famgrp.frag_of_read, famgrp.frag_strand,
                                   P, cfg, info, bg, frag_gc=frag_gc,
                                   batch=batch, precomputed=pd_pre)
    bIAQ, bIAD, bIDQ = engine_bq.final_iid_qualities(bdp, bg, info, hist, P)
    bq_res = engine_bq.BQResult(
        prep=prep, thres=thres, seginfo=info, bg_bqsum=bg, vq_a1BQ=a1,
        vq_a2BQ=a2, vq_bMQ=vq_bMQ, bdp=bdp, bta=bta, btb=btb,
        bucket_hist=hist, vq_bIAQ=bIAQ, vq_bIAD=bIAD, vq_bIDQ=bIDQ,
        frag_indel=frag_indel, mutforms=mutforms)

    sscs_table = sscs.table_from_cfg(cfg)
    fq_res = engine_fq.run_fq(frag_gc, gap_info, famgrp, ref_syms,
                              sscs_table, thres, baq, baq2, table, batch, P,
                              cfg, is_normal)
    return RegionResult(bq=bq_res, fq=fq_res, frag_cons=frag_gc,
                        tracks=tracks, baq=baq,
                        baq2=baq2, famgrp=famgrp, ref_syms=ref_syms,
                        region_offset=region_offset, assay_type=assay)
