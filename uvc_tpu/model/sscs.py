"""Single-strand-consensus-sequence (SSCS) error-rate model.

PhredMutationTable (main.hpp:213-262) as a dense [14,14] matrix indexed by
(consensus/ref symbol, alt symbol), for vectorized gathers.
"""

import numpy as np

from ..constants import Symbol, NUM_SYMBOLS, INS_SYMBOLS, DEL_SYMBOLS


def phred_mutation_table(transition_CG_TA=40, transition_AT_GC=44,
                         transversion_CG_AT=48, transversion_other=48,
                         indel_open=58, indel_ext=0,
                         is_rescued=False) -> np.ndarray:
    t = np.full((NUM_SYMBOLS, NUM_SYMBOLS), transversion_other, dtype=np.int64)
    A, C, G, T = Symbol.BASE_A, Symbol.BASE_C, Symbol.BASE_G, Symbol.BASE_T
    for con in INS_SYMBOLS + DEL_SYMBOLS:
        t[con, :] = indel_open
    M = Symbol.LINK_M
    t[M, :] = transversion_other
    t[M, Symbol.LINK_D1] = t[M, Symbol.LINK_I1] = indel_open
    t[M, Symbol.LINK_D2] = t[M, Symbol.LINK_I2] = indel_open + indel_ext
    for alt in (Symbol.LINK_D3P, Symbol.LINK_I3P, Symbol.LINK_M,
                Symbol.LINK_NN, Symbol.BASE_A, Symbol.BASE_C, Symbol.BASE_G,
                Symbol.BASE_T, Symbol.BASE_N, Symbol.BASE_NN):
        if alt not in (Symbol.LINK_D1, Symbol.LINK_I1, Symbol.LINK_D2,
                       Symbol.LINK_I2):
            t[M, alt] = indel_open + indel_ext * 2
    # the C++ if-chain: indel branches take precedence, then the specific
    # substitution classes, else transversion_other
    t[C, T] = transition_CG_TA
    t[G, A] = transition_CG_TA
    t[A, G] = transition_AT_GC
    t[T, C] = transition_AT_GC
    t[C, A] = transversion_CG_AT
    t[G, T] = transversion_CG_AT
    if is_rescued:
        t = t + 3
    return t


def table_from_cfg(cfg) -> np.ndarray:
    # quirk replicated from the reference: is_rescued tests .size() > 0 on a
    # string whose default is "." (main.hpp:2564,2858,4943 + CmdLineArgs.hpp:55),
    # so the +3 increment applies in every practical run.
    return phred_mutation_table(
        cfg.fam_phred_sscs_transition_CG_TA,
        cfg.fam_phred_sscs_transition_AT_GC,
        cfg.fam_phred_sscs_transversion_CG_AT,
        cfg.fam_phred_sscs_transversion_other,
        cfg.fam_phred_sscs_indel_open,
        cfg.fam_phred_sscs_indel_ext,
        len(cfg.vcf_tumor_fname) > 0)
