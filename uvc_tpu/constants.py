"""Core data model: the 14-symbol alignment alphabet and engine constants.

Behavioral reference: /root/reference/main_conversion.hpp:316-488 (symbol
alphabet), /root/reference/common.hpp:42-92 (constants, conversions).

The alphabet is THE central data model: every genomic position carries a BASE
sub-position (substitution evidence) and a LINK sub-position (gap evidence);
indels are bucketed by length 1/2/3+ with exact sequences tracked separately.
"""

from enum import IntEnum

import numpy as np


class Symbol(IntEnum):
    """Alignment symbols (reference: main_conversion.hpp:316-334)."""

    BASE_A = 0
    BASE_C = 1
    BASE_G = 2
    BASE_T = 3
    BASE_N = 4   # ambiguous base in the sequencing data
    BASE_NN = 5  # not available (e.g. spanned by a deletion)
    LINK_M = 6   # no gap at this link position
    LINK_D3P = 7  # deletion of length >= 3
    LINK_D2 = 8
    LINK_D1 = 9
    LINK_I3P = 10  # insertion of length >= 3
    LINK_I2 = 11
    LINK_I1 = 12
    LINK_NN = 13  # padded indel/no-indel symbol inside a deleted run


NUM_SYMBOLS = 14
MGVCF_SYMBOL = 15  # <NON_REF> pseudo-symbol (END_ALIGNMENT_SYMBOLS=14,
# main_conversion.hpp:331-333)
ADDITIONAL_INDEL_CANDIDATE_SYMBOL = 16

SYMBOL_TO_DESC = [
    "A", "C", "G", "T", "N", "*",
    "<LR>", "<LD3P>", "<LD2>", "<LD1>", "<LI3P>", "<LI2>", "<LI1>", "*",
    "<NONE>", "<NON_REF>", "<ADDITIONAL_INDEL_CANDIDATE>",
]


class SymbolType(IntEnum):
    BASE = 0
    LINK = 1


# Symbol membership per type (main_conversion.hpp:397-405)
BASE_SYMBOLS = (Symbol.BASE_A, Symbol.BASE_C, Symbol.BASE_G, Symbol.BASE_T,
                Symbol.BASE_N, Symbol.BASE_NN)
LINK_SYMBOLS = (Symbol.LINK_M, Symbol.LINK_I1, Symbol.LINK_I2, Symbol.LINK_I3P,
                Symbol.LINK_D1, Symbol.LINK_D2, Symbol.LINK_D3P, Symbol.LINK_NN)
SYMBOL_TYPE_TO_SYMBOLS = (BASE_SYMBOLS, LINK_SYMBOLS)
SYMBOL_TYPE_TO_NON_NN_SYMBOLS = (BASE_SYMBOLS[:-1], LINK_SYMBOLS[:-1])
SYMBOL_TYPE_TO_AMBIG = (Symbol.BASE_NN, Symbol.LINK_NN)

INS_SYMBOLS = (Symbol.LINK_I1, Symbol.LINK_I2, Symbol.LINK_I3P)
DEL_SYMBOLS = (Symbol.LINK_D1, Symbol.LINK_D2, Symbol.LINK_D3P)
INDEL_SYMBOLS = INS_SYMBOLS + DEL_SYMBOLS

# Emission order per position in the VCF driver loop uses (BASE, LINK)
# while consensus loops use (LINK, BASE) (main_conversion.hpp:393-395,461).
SYMBOL_TYPE_ARR = (SymbolType.BASE, SymbolType.LINK)
SYMBOL_TYPES_IN_VCF_ORDER = (SymbolType.LINK, SymbolType.BASE)


def symbol_type_of(symbol: int) -> SymbolType:
    return SymbolType.BASE if symbol <= Symbol.BASE_NN else SymbolType.LINK


def is_ins(symbol: int) -> bool:
    return symbol in INS_SYMBOLS


def is_del(symbol: int) -> bool:
    return symbol in DEL_SYMBOLS


def is_substitution(symbol: int) -> bool:
    return Symbol.BASE_A <= symbol <= Symbol.BASE_NN


def ins_len_to_symbol(length: int) -> Symbol:
    return (Symbol.LINK_I1 if length == 1
            else Symbol.LINK_I2 if length == 2 else Symbol.LINK_I3P)


def del_len_to_symbol(length: int) -> Symbol:
    return (Symbol.LINK_D1 if length == 1
            else Symbol.LINK_D2 if length == 2 else Symbol.LINK_D3P)


def are_symbols_mutated(ref: int, alt: int) -> bool:
    """main_conversion.hpp:364-371."""
    if alt <= Symbol.BASE_NN:
        return ref != alt and ref < Symbol.BASE_N and alt < Symbol.BASE_N
    return alt != Symbol.LINK_M and alt != Symbol.LINK_NN


# char -> symbol lookup (main_conversion.hpp:473-488): everything else BASE_N
CHAR_TO_SYMBOL = np.full(128, Symbol.BASE_N, dtype=np.int8)
for _c, _s in (("Aa", Symbol.BASE_A), ("Cc", Symbol.BASE_C),
               ("Gg", Symbol.BASE_G), ("Tt", Symbol.BASE_T),
               ("Ii", Symbol.LINK_M), ("-_", Symbol.LINK_D1)):
    for _ch in _c:
        CHAR_TO_SYMBOL[ord(_ch)] = _s

# BAM 4-bit nibble -> symbol: 1=A 2=C 4=G 8=T, everything else N
SEQ_NT16_TO_SYMBOL = np.full(16, Symbol.BASE_N, dtype=np.int8)
SEQ_NT16_TO_SYMBOL[1] = Symbol.BASE_A
SEQ_NT16_TO_SYMBOL[2] = Symbol.BASE_C
SEQ_NT16_TO_SYMBOL[4] = Symbol.BASE_G
SEQ_NT16_TO_SYMBOL[8] = Symbol.BASE_T

SEQ_NT16_STR = "=ACMGRSVTWYHKDBN"

# Engine constants (common.hpp:44-64)
MGVCF_REGION_MAX_SIZE = 1000
NUM_WORKING_UNITS_PER_THREAD = 8
MAX_STR_N_BASES = 100
MAX_INSERT_SIZE = 2000

# Output-variant category bit flags (common.hpp:47-53)
OUTVAR_GERMLINE = 0x1
OUTVAR_SOMATIC = 0x2
OUTVAR_ANY = 0x4
OUTVAR_MGVCF = 0x8
OUTVAR_ADDITIONAL_INDEL_CANDIDATE = 0x10
OUTVAR_BASE_NN = 0x20
OUTVAR_LINK_NN = 0x40


class AssayType(IntEnum):
    AUTO = 0
    CAPTURE = 1
    AMPLICON = 2


class MoleculeTag(IntEnum):
    AUTO = 0
    NONE = 1
    BARCODING = 2
    DUPLEX = 3


class SequencingPlatform(IntEnum):
    AUTO = 0
    ILLUMINA = 1
    IONTORRENT = 2
    OTHER = 3


class PairEndMerge(IntEnum):
    YES = 0
    NO = 1


ASSAY_TYPE_TO_MSG = [
    "Assay type of each molecule fragment will be automatically inferred from the data",
    "Data is generatd from a capture-based assay with selection by probe hybridization",
    "Data is generated from an amplicon-based assay with targeted amplification by PCR",
]
PLAT_ILLUMINA_LIKE = "Illumina/BGI"
PLAT_ION_LIKE = "IonTorrent/LifeTechnologies/ThermoFisher"


def rev_complement(seq: str) -> str:
    return seq.translate(_RC_TABLE)[::-1]


_RC_TABLE = str.maketrans("ACGTacgt", "TGCAtgca")
