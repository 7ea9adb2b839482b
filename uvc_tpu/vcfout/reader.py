"""Tumor-VCF reader for the normal run (tumor-normal joint calling).

Decodes the tumor sample's FORMAT tags into TumorKeyInfo records keyed by
(tid, symbolpos, symbol), replicating rescue_variants_from_vcf
(main.cpp:184-398) and the TumorKeyInfo interface
(main_conversion.hpp:490-529). The join key uses the internal 0-based
position: VCF POS - 1 for substitutions, VCF POS for link symbols
(SURVEY.md A.1).
"""

from dataclasses import dataclass, field

from ..io import bgzf


@dataclass
class TumorKeyInfo:
    ref_alt: str = ""
    VTI: int = -1
    pos: int = 0
    enable_tier2: bool = False
    BDP: int = 0
    bDP: int = 0
    CDP1x: int = 0
    cDP1x: int = 0
    cVQ1: int = 0
    cPCQ1: int = 0
    CDP2x: int = 0
    cDP2x: int = 0
    cVQ2: int = 0
    cPCQ2: int = 0
    bNMQ: int = 0
    vHGQ: int = 0
    tDP: int = 0      # fmt.DP (fill_conditional_tki, main.hpp:5949)
    tAD_ref: int = 0  # fmt.AD[0]
    tAD_alt: int = 0
    tDPC: int = 0     # CDPDb sum + DDP2 (SSCS+duplex depth)
    tADC_ref: int = 0
    tADC_alt: int = 0
    tumor_format_text: str = ""   # verbatim re-emission of the tumor column


def _geti(d, key, idx=-1, default=0):
    v = d.get(key)
    if v is None or v == ".":
        return default
    parts = v.split(",")
    try:
        return int(float(parts[idx if idx < len(parts) else -1]))
    except (ValueError, IndexError):
        return default


def read_tumor_vcf(path, name2tid):
    """Returns dict (tid, symbolpos, symbol) -> [TumorKeyInfo]."""
    if bgzf.is_bgzf(path):
        text = bgzf.read_file(path).decode()
    else:
        with open(path, "rb") as fh:
            data = fh.read()
        text = (bgzf.decompress(data) if data[:2] == b"\x1f\x8b" else data).decode()
    tkis = {}
    for line in text.splitlines():
        if not line or line.startswith("#"):
            continue
        cols = line.split("\t")
        if len(cols) < 10:
            continue
        chrom, pos_s, _, ref, alt = cols[:5]
        tid = name2tid.get(chrom)
        if tid is None:
            continue
        fmt_keys = cols[8].split(":")
        fmt_vals = cols[9].split(":")
        d = dict(zip(fmt_keys, fmt_vals))
        vti = _geti(d, "VTI", default=-1)
        if vti in (15, 16):
            # MGVCF_SYMBOL / ADDITIONAL_INDEL_CANDIDATE_SYMBOL records are
            # retrieved too (main.cpp:265-291): only pos/ref_alt plus the
            # verbatim tumor column, re-emitted next to the normal's own
            # aux lines (main.cpp:739-755, 784-797)
            symbolpos = int(pos_s) - 1
            tki = TumorKeyInfo(ref_alt=ref + "\t" + alt, VTI=vti,
                               pos=symbolpos, tumor_format_text=cols[9])
            tkis.setdefault((tid, symbolpos, vti), []).append(tki)
            continue
        if vti < 0 or vti > 13:
            continue
        is_subst = vti <= 5
        symbolpos = (int(pos_s) - 1) if is_subst else int(pos_s)
        tki = TumorKeyInfo(
            ref_alt=ref + "\t" + alt, VTI=vti, pos=symbolpos,
            enable_tier2="c2LP1" in d or "cDP2v" in d,
            BDP=_geti(d, "BDPb", 0) + _geti(d, "BDPb", 1)
                if "BDPb" in d else _geti(d, "bDP"),
            bDP=_geti(d, "bDPf") + _geti(d, "bDPr"),
            CDP1x=_geti(d, "CDP1x", 0), cDP1x=_geti(d, "cDP1x"),
            cVQ1=_geti(d, "cVQ1"), cPCQ1=_geti(d, "cPCQ1"),
            CDP2x=_geti(d, "CDP2x", 0), cDP2x=_geti(d, "cDP2x"),
            cVQ2=_geti(d, "cVQ2"), cPCQ2=_geti(d, "cPCQ2"),
            bNMQ=_geti(d, "bNMQ"), vHGQ=_geti(d, "vHGQ"),
            # back-compat block (main.cpp:364-376): tDP/tADR from
            # CDP1b/cDP1f+cDP1r, tDPC/tADCR from CDP2b/cDP2f+cDP2r
            tDP=_geti(d, "CDP1b", 0) + _geti(d, "CDP1b", 1),
            tAD_ref=_geti(d, "cDP1f", 0) + _geti(d, "cDP1r", 0),
            tAD_alt=_geti(d, "cDP1f", 1) + _geti(d, "cDP1r", 1),
            tDPC=_geti(d, "CDP2b", 0) + _geti(d, "CDP2b", 1),
            tADC_ref=_geti(d, "cDP2f", 0) + _geti(d, "cDP2r", 0),
            tADC_alt=_geti(d, "cDP2f", 1) + _geti(d, "cDP2r", 1),
            tumor_format_text=cols[9])
        tkis.setdefault((tid, symbolpos, vti), []).append(tki)
    return tkis
