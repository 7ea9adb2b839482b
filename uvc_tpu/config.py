"""The full uvc1-compatible parameter surface.

Behavioral reference: /root/reference/CmdLineArgs.hpp:20-438. Field names and
defaults mirror the reference exactly because they are load-bearing for output
parity (they appear in the VCF header and drive every threshold in the quality
model). Groups 00-14 follow the reference's parameter groups.

This is a frozen-ish plain dataclass (not a pytree): scalar hyper-parameters
are baked into jit-compiled kernels as static values, which is the idiomatic
JAX treatment for config that never changes during a run.
"""

from dataclasses import dataclass, field, fields
import math
import sys

from .constants import (
    AssayType, MoleculeTag, PairEndMerge, SequencingPlatform,
    OUTVAR_SOMATIC, OUTVAR_ANY, OUTVAR_MGVCF, OUTVAR_BASE_NN,
    OUTVAR_ADDITIONAL_INDEL_CANDIDATE,
)

NOT_PROVIDED = "."
DBL_EPSILON = sys.float_info.epsilon
DBLFLT_EPS = 1.1920928955078125e-07  # FLT_EPSILON as double (common.hpp:65)
INT32_MAX = 2**31 - 1


def is_provided(x: str) -> bool:
    return x != "" and x != NOT_PROVIDED


@dataclass
class UVCConfig:
    # *** 00. frequently used parameters
    bam_input_fname: str = NOT_PROVIDED
    fasta_ref_fname: str = NOT_PROVIDED
    vcf_out_pass_fname: str = "-"
    bed_region_fname: str = NOT_PROVIDED
    tier1_target_region: str = NOT_PROVIDED
    sample_name: str = "-"
    max_cpu_num: int = 8
    mem_per_thread: int = 1024 * 3 // 2  # MegaBytes
    outvar_flag: int = (OUTVAR_SOMATIC | OUTVAR_ANY | OUTVAR_MGVCF
                        | OUTVAR_BASE_NN | OUTVAR_ADDITIONAL_INDEL_CANDIDATE)
    should_output_all: bool = False
    should_output_all_germline: bool = False
    vqual: float = 15.0
    assay_type: AssayType = AssayType.AUTO
    fam_thres_highBQ_snv: int = 25
    fam_thres_highBQ_indel: int = 13
    fam_thres_dup1add: int = 2
    fam_thres_dup1perc: int = 80
    fam_thres_dup2add: int = 3
    fam_thres_dup2perc: int = 70
    fam_thres_qseqlen: int = 75
    fam_consensus_out_fastq: str = ""
    fam_consensus_out_fastq_thres_dup1add: int = 1

    # *** 01. file/sample/region names
    vcf_tumor_fname: str = NOT_PROVIDED
    bed_out_fname: str = NOT_PROVIDED
    bed_in_fname: str = NOT_PROVIDED
    bed_in_avg_sequencing_DP: int = -1
    bed_in_avg_sequencing_DP_n_from_t: int = 0x0

    # *** 02. input/output/log control
    is_tumor_format_retrieved: bool = True
    kept_aln_min_aln_len: int = 0
    kept_aln_min_mapqual: int = 0
    kept_aln_min_isize: int = 0
    kept_aln_max_isize: int = INT32_MAX
    kept_aln_is_zero_isize_discarded: bool = False
    min_altdp_thres: int = 2
    vdp1: int = 1000
    vad1: int = 4
    vfa1: float = 0.002
    vdp2: int = 10000
    vad2: int = 8
    vfa2: float = 0.0002
    min_r_ad: int = 0
    min_a_ad: int = 0
    should_add_note: bool = False
    always_log: bool = False

    # *** 03. assay-property-driven parameters
    molecule_tag: MoleculeTag = MoleculeTag.AUTO
    sequencing_platform: SequencingPlatform = SequencingPlatform.AUTO
    inferred_sequencing_platform: SequencingPlatform = SequencingPlatform.AUTO
    inferred_maxMQ: int = 0
    pair_end_merge: PairEndMerge = PairEndMerge.YES
    disable_duplex: bool = False
    primerlen: int = 0
    primerlen2: int = 23
    primer_flag: int = 0x0
    central_readlen: int = 0
    bq_phred_added_misma: int = 0
    bq_phred_added_indel: int = 0
    powlaw_exponent: float = 3.0  # universality constant
    powlaw_anyvar_base: float = float(60 + 25 + 5)
    powlaw_amplicon_allele_fraction_coef: float = 5.0 / 8.0
    penal4lowdep: int = 37
    assay_sequencing_BQ_max: int = 37
    assay_sequencing_BQ_inc: int = 0
    phasing_haplotype_max_count: int = 8
    phasing_haplotype_min_ad: int = 1
    phasing_haplotype_max_detail_cnt: int = 3

    # *** 04. dedup parameters
    dedup_center_mult: float = 5.0
    dedup_amplicon_end2end_ratio: float = 1.5
    dedup_amplicon_border_to_insert_cov_weak_avgDP_ratio: float = 5.0
    dedup_amplicon_border_to_insert_cov_strong_avgDP_ratio: float = 20.0
    dedup_amplicon_border_to_insert_cov_weak_totDP_ratio: float = 0.05
    dedup_amplicon_border_to_insert_cov_strong_totDP_ratio: float = 0.20
    dedup_amplicon_border_weak_minDP: float = 100.0
    dedup_amplicon_border_strong_minDP: float = 400.0
    dedup_flag: int = 0x0

    # *** 05. bias thresholds
    bias_thres_highBQ: int = 20
    bias_thres_highBAQ: int = 20  # +3 for SNVs at use site
    bias_thres_aLPxT_add: int = 5
    bias_thres_aLPxT_perc: int = 160
    bias_thres_aLRP1t_minus: int = 10
    bias_thres_aLRP2t_minus: int = 5
    bias_thres_aLRB1t_minus: int = 50
    bias_thres_aLRB2t_minus: int = 25
    bias_thres_aLRP1t_avgmul_perc: int = 100
    bias_thres_aLRP2t_avgmul_perc: int = 100
    bias_thres_aLRB1t_avgmul_perc: int = 100
    bias_thres_aLRB2t_avgmul_perc: int = 100
    bias_thres_aLRP1Nt_avgmul_perc: int = 80
    bias_thres_aLRB1Nt_avgmul_perc: int = 80
    bias_thres_aLRI1T_perc: int = 200
    bias_thres_aLRI2T_perc: int = 150
    bias_thres_aLRI1t_perc: int = 50
    bias_thres_aLRI2t_perc: int = 67
    bias_thres_aLRI1NT_perc: int = 250
    bias_thres_aLRI1Nt_perc: int = 40
    bias_thres_aLRI1T_add: int = 180
    bias_thres_aLRI2T_add: int = 150
    bias_thres_PFBQ1: int = 25
    bias_thres_PFBQ2: int = 30
    bias_thres_aXM1T_add: int = 30
    bias_thres_interfering_indel: int = 5
    bias_thres_interfering_indel_BQ: int = 21
    bias_thres_BAQ1: int = 23
    bias_thres_BAQ2: int = 33
    bias_thres_strict_c2LRP0: int = 5
    bias_thres_FTS_FA: float = 0.6
    bias_is_orientation_artifact_mixed_with_sequencing_error: bool = False
    bias_orientation_min_effective_allelefrac: float = 0.004

    # *** 06. bias priors
    bias_prior_DPadd_perc: int = 50
    bias_priorfreq_pos: float = 40.0
    bias_priorfreq_indel_in_read_div: float = 20.0
    bias_priorfreq_indel_in_var_div2: float = 15.0
    bias_priorfreq_indel_in_str_div2: float = 10.0
    bias_priorfreq_var_in_str_div2: float = 5.0
    bias_prior_var_DP_mul: float = 1.25 + DBLFLT_EPS
    bias_priorfreq_ipos_snv: int = 60 - 15
    bias_priorfreq_ipos_indel: int = 60 - 15
    bias_priorfreq_strand_snv_base: int = 10
    bias_priorfreq_strand_indel: int = 60 - 15
    bias_FA_pseudocount_indel_in_read: float = 0.5 / 10.0
    bias_priorfreq_orientation_snv_base: float = 60 - 15
    bias_priorfreq_orientation_indel_base: float = 60 - 15
    bias_orientation_counter_avg_end_len: float = 20.0
    bias_FA_powerlaw_noUMI_phred_inc_snv: int = 5
    bias_FA_powerlaw_noUMI_phred_inc_indel: int = 7
    bias_FA_powerlaw_withUMI_phred_inc_snv: int = 5 + 3
    bias_FA_powerlaw_withUMI_phred_inc_indel: int = 7
    bias_reduction_by_high_sequencingDP_min_n_totDepth: int = 800
    bias_reduction_by_high_sequencingDP_min_n_altDepth: int = 3
    nobias_flag: int = 0x2
    nobias_pos_indel_lenfrac_thres: float = 2.0
    nobias_pos_indel_str_track_len: int = 16

    # *** 07. read families
    fam_thres_emperr_all_flat_snv: int = 4
    fam_thres_emperr_con_perc_snv: int = 67
    fam_thres_emperr_all_flat_indel: int = 4
    fam_thres_emperr_con_perc_indel: int = 67
    fam_min_n_copies: int = 800
    fam_min_n_copies_DPxAD: int = 20 * 1000
    fam_min_overseq_perc: int = 200
    fam_bias_overseq_perc: int = 150
    fam_tier3DP_bias_overseq_perc: int = 350
    fam_indel_nonUMI_phred_dec_per_fold_overseq: int = 9
    fam_phred_indel_inc_before_barcode_labeling: int = 14
    fam_phred_sscs_transition_CG_TA: int = 40
    fam_phred_sscs_transition_AT_GC: int = 44
    fam_phred_sscs_transversion_CG_AT: int = 48
    fam_phred_sscs_transversion_other: int = 48
    fam_phred_sscs_indel_open: int = 58
    fam_phred_sscs_indel_ext: int = 0
    fam_phred_dscs_all: int = 58
    fam_phred_dscs_max: int = 68
    fam_phred_dscs_inc_max: int = 68 - 48
    fam_phred_pow_sscs_transversion_AT_TA_origin: int = 44 - (41 - 6) + 4
    fam_phred_pow_sscs_snv_origin: float = float(44 - (41 - 6))
    fam_phred_pow_sscs_indel_origin: float = float(58 - 9 * 3)
    fam_phred_pow_dscs_all_origin: float = 0.0
    fam_flag: int = 0x0

    # *** 08. systematic errors
    syserr_BQ_prior: int = 30
    syserr_BQ_sbratio_q_add: int = 5   # deciphred
    syserr_BQ_sbratio_q_max: int = 40
    syserr_BQ_xmratio_q_add: int = 5
    syserr_BQ_xmratio_q_max: int = 40
    syserr_BQ_bmratio_q_add: int = 5
    syserr_BQ_bmratio_q_max: int = 40
    syserr_BQ_strand_favor_mul: int = 3
    syserr_minABQ_pcr_snv: int = 0    # deciphred, platform-inferred
    syserr_minABQ_pcr_indel: int = 0
    syserr_minABQ_cap_snv: int = 0
    syserr_minABQ_cap_indel: int = 0
    syserr_mut_region_n_bases: int = 11
    syserr_MQ_min: int = 0
    syserr_MQ_max: int = 60
    syserr_MQ_NMR_expfrac: float = 0.03
    syserr_MQ_NMR_altfrac_coef: float = 2.0
    syserr_MQ_NMR_nonaltfrac_coef: float = 2.0
    syserr_MQ_NMR_pl_exponent: float = 3.0
    syserr_MQ_nonref_base: float = 40.0

    # *** 09. germline
    germ_hetero_FA: float = 0.47
    germ_phred_hetero_snp: int = 31
    germ_phred_hetero_indel: int = 41 - 1
    germ_phred_homalt_snp: int = 31 + 2
    germ_phred_homalt_indel: int = 41 - 1 + 2
    germ_phred_het3al_snp: int = 54 + 5
    germ_phred_het3al_indel: int = 41 - 1 + 9

    # *** 10. tumor-normal pairs
    tn_q_inc_max: int = 9
    tn_q_inc_max_sscs_CG_AT: int = 0
    tn_q_inc_max_sscs_other: int = 5
    tn_syserr_norm_devqual: float = 15.0
    tn_is_paired: int = 0

    # *** 11. indels
    indel_BQ_max: int = 43 - 1
    indel_str_repeatsize_max: int = 6
    indel_vntr_repeatsize_max: int = 35
    indel_polymerase_size: float = 8.0
    indel_polymerase_slip_rate: float = 8.0
    indel_del_to_ins_err_ratio: float = 5.0
    indel_adj_tracklen_dist: int = 6
    indel_adj_indellen_perc: int = 160
    indel_multiallele_samepos_penal: float = 11.0
    indel_multiallele_diffpos_penal: float = 8.0
    indel_multiallele_soma_penal_thres: float = 11.0
    indel_tetraallele_germline_penal_value: float = 8.0 * 2
    indel_tetraallele_germline_penal_thres: float = 22.0
    indel_ins_penal_pseudocount: int = 16
    indel_nonSTR_phred_per_base: int = 5
    indel_str_phred_per_region: int = 5 * 2
    indel_filter_edge_dist: int = 5

    # *** 12. contamination
    contam_any_mul_frac: float = 0.02
    contam_t2n_mul_frac: float = 0.05

    # *** 13. micro-adjustments
    microadjust_xm: int = 7
    microadjust_cliplen: int = 5
    microadjust_delFAQmax: int = 10 + 9 + 30
    microadjust_bias_pos_indel_fold: float = 2.0
    microadjust_bias_pos_indel_misma_to_indel_ratio: float = 4 * (1.0 - DBL_EPSILON)
    microadjust_nobias_pos_indel_misma_to_indel_ratio: float = 4 * (1.0 - DBL_EPSILON)
    microadjust_nobias_pos_indel_maxlen: int = 16
    microadjust_nobias_pos_indel_bMQ: int = 50
    microadjust_nobias_pos_indel_perc: int = 50
    microadjust_nobias_strand_all_fold: float = 5.0
    microadjust_refbias_indel_max: float = 2.0
    microadjust_counterbias_pos_odds_ratio: float = 3.5
    microadjust_counterbias_pos_fold_ratio: float = 5.0
    microadjust_fam_binom_qual_halving_thres: int = 70
    microadjust_fam_lowfreq_invFA: int = 1000
    microadjust_ref_MQ_dec_max: int = 15
    microadjust_syserr_MQ_NMR_tn_syserr_no_penal_qual_min: int = 30
    microadjust_syserr_MQ_NMR_tn_syserr_no_penal_qual_max: int = 30 + 12
    microadjust_near_clip_dist: int = 2
    microadjust_longfrag_sidelength_min: int = 300
    microadjust_longfrag_sidelength_max: int = 600
    microadjust_longfrag_sidelength_zeroMQpenalty: float = 300.0
    microadjust_alignment_clip_min_len: int = 12
    microadjust_alignment_clip_min_frac: float = 0.05
    microadjust_alignment_clip_min_count: int = 2
    microadjust_alignment_tracklen_min: int = 25
    microadjust_germline_mix_with_del_snv_penalty: int = 9
    microadjust_padded_deletion_flag: int = 0x2
    microadjust_strand_orientation_absence_DP_fold: int = 5
    microadjust_orientation_absence_snv_penalty: int = 4
    microadjust_strand_absence_snv_penalty: int = 4
    microadjust_dedup_absence_indel_penalty: int = 1
    microadjust_median_readlen_thres: int = 125
    microadjust_BAQ_per_base_x1024: int = 1024
    lib_wgs_min_avg_fraglen: int = 300
    lib_nonwgs_ad_pseudocount: float = 0.1
    lib_nonwgs_clip_penal_min_indelsize: int = 8
    lib_nonwgs_normal_full_self_rescue_fa: float = 0.1
    lib_nonwgs_normal_min_self_rescue_fa_ratio: float = 0.2
    lib_nonwgs_normal_add_mul_ad: float = 1.0
    lib_nonwgs_normal_max_rescued_MQ: int = 30
    lib_wgs_normal_max_rescued_MQ: int = 0

    # *** 14. debug
    debug_note_flag: int = 0x0
    debug_warn_min_read_end_ins_cigar_oplen: int = 16
    debug_tid: int = -1
    debug_pos: int = -1

    inferred_is_fastq_generated: bool = False
    inferred_is_vcf_generated: bool = True

    def __setattr__(self, name, value):
        # invalidate the memoized jit-cache key (calling._cfg_cache_key)
        # on any field mutation so a post-setup tweak can never silently
        # reuse a stale traced program
        if name != "_cache_key" and getattr(self, "_cache_key", None) \
                is not None:
            object.__setattr__(self, "_cache_key", None)
        if isinstance(value, list):
            # sequences are stored immutably: in-place mutation
            # (cfg.x.append(...)) would bypass the cache-key
            # invalidation above and reuse a stale traced model
            value = tuple(value)
        object.__setattr__(self, name, value)

    def self_update_by_platform(self, inferred: SequencingPlatform,
                                central_readlen: int = 0, maxMQ: int = 0):
        """Platform-conditional parameter shifts (CmdLineArgs.cpp:36-136).

        IonTorrent: +8 mismatch BQ, family/bias BQ thresholds clamped down
        (non-negative minus); Illumina: syserr_minABQ deciphred floors added.
        The shifts are skipped when the user forced platform=OTHER.
        """
        self.inferred_sequencing_platform = inferred
        if central_readlen and not self.central_readlen:
            self.central_readlen = central_readlen
        if maxMQ:
            self.inferred_maxMQ = max(self.inferred_maxMQ, maxMQ)
        forced_other = (self.sequencing_platform == SequencingPlatform.OTHER)
        if inferred == SequencingPlatform.IONTORRENT and not forced_other:
            self.bq_phred_added_misma += 8
            self.fam_thres_highBQ_snv -= min(self.fam_thres_highBQ_snv, 30)
            self.fam_thres_highBQ_indel -= min(self.fam_thres_highBQ_indel, 30)
            self.bias_thres_PFBQ1 -= min(self.bias_thres_PFBQ1, 30)
            self.bias_thres_PFBQ2 -= min(self.bias_thres_PFBQ2, 30)
            self.bias_thres_highBQ -= min(self.bias_thres_highBQ, 13)
        if inferred == SequencingPlatform.ILLUMINA and not forced_other:
            self.syserr_minABQ_pcr_snv += 200
            self.syserr_minABQ_pcr_indel += 100
            self.syserr_minABQ_cap_snv += 200
            self.syserr_minABQ_cap_indel += 100

    def cli_items(self):
        """(--flag-name, value) pairs using the reference's auto-naming rule
        (CmdLineArgs.cpp:17-19): field foo_bar -> --foo-bar."""
        for f in fields(self):
            yield "--" + f.name.replace("_", "-"), getattr(self, f.name)
