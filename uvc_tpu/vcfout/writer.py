"""VCF output: header generation and bgzipped record emission.

Header structure follows generate_vcf_header (main.hpp:5778-5883): fileformat,
provenance (command line, version, inferred parameters), contigs, the 28
FILTERs of bcf_formats_generator1.cpp:66-107, and the INFO/FORMAT
declarations for the emitted tags. The full ~110-tag FORMAT block is being
grown tag-by-tag toward byte parity; the schema table here is the single
source of truth (the declarative equivalent of bcf_formats_generator1.cpp).
"""

import time

from .. import __version__
from ..io import bgzf

FILTERS = [
    ("noVar", "Not a variant (for example, when REF and ALT are the same), but still included to get all statistics. "),
    ("upstreamDel", "Deletion extended from another upstream deletion. "),
    ("s50", "Less than 50% of samples have data. "),
    ("Q10", "Quality below 10 and no other filters. "),
    ("Q20", "Quality below 20 and no other filters. "),
    ("Q30", "Quality below 30 and no other filters. "),
    ("Q40", "Quality below 40 and no other filters. "),
    ("Q50", "Quality below 50 and no other filters. "),
    ("Q60", "Quality below 60 and no other filters. "),
    ("aInsertSize", "For FORMAT/FTS: Stranded insert bias, meaning the most-supported strand has abnormal insert size at either the left or right end. "),
    ("aBQXM", "For FORMAT/FTS: Passing-filter bias, meaning the variant allele is supported by reads with low base qualities at the variant site and/or with high number of mismatches relative to all alleles. "),
    ("bcDup", "For FORMAT/FTS: Duplication bias for less-than-expected amplification of variant reads, meaning the variant is under-amplified by PCR relative to all alleles. "),
    ("cbDup", "For FORMAT/FTS: Duplication bias for more-than-expected amplification of variant reads, meaning the variant is over-amplified by PCR relative to all alleles. "),
    ("aAlignL", "For FORMAT/FTS: Alignment bias on the left mapping coordinate of the sequenced segment relative to all alleles. "),
    ("aAlignR", "For FORMAT/FTS: Alignment bias on the right mapping coordinate of the sequenced segment relative to all alleles. "),
    ("aPositionL", "For FORMAT/FTS: Position bias on the left mapping coordinate of the sequenced segment relative to all alleles. "),
    ("aPositionR", "For FORMAT/FTS: Position bias on the right mapping coordinate of the sequenced segment relative to all alleles. "),
    ("abPositionL", "For FORMAT/FTS: Position bias on the left mapping coordinate of the insert relative to all alleles. "),
    ("abPositionR", "For FORMAT/FTS: Position bias on the right mapping coordinate of the insert relative to all alleles. "),
    ("aStrand", "For FORMAT/FTS: Strand bias relative to all alleles. "),
    ("c0Orientation", "For FORMAT/FTS: Read-orientation bias using de-duplicated reads families passing the base-quality threshold for generating UMI-barcode families relative to all alleles. "),
    ("c2Orientation", "For FORMAT/FTS: Read-orientation bias using tier-2 UMI-barcode families relative to all alleles. "),
    ("c2AlignL", "For FORMAT/FTS: Alignment bias on the left mapping coordinate of the tier-2 single-strand consensus sequence (SSCS) relative to all alleles. "),
    ("c2AlignR", "For FORMAT/FTS: Alignment bias on the right mapping coordinate of the tier-2 single-strand consensus sequence (SSCS) relative to all alleles. "),
    ("c2PositionL", "For FORMAT/FTS: Position bias on the left mapping coordinate of the tier-2 single-strand consensus sequence (SSCS) relative to all alleles. "),
    ("c2PositionR", "For FORMAT/FTS: Position bias on the right mapping coordinate of the tier-2 single-strand consensus sequence (SSCS) relative to all alleles. "),
    ("c2StrictPosL", "For FORMAT/FTS: Strictly defined position bias (which has zero prior probability of not having bias) on the left mapping coordinate of the tier-2 single-strand consensus sequence (SSCS) relative to all alleles. "),
    ("c2StrictPosR", "For FORMAT/FTS: Strictly defined position bias (which has zero prior probability of not having bias) on the right mapping coordinate of the tier-2 single-strand consensus sequence (SSCS) relative to all alleles. "),
]

INFO_DEFS = [
    ("ANY_VAR", 0, "Flag", "Any type of variant which may be caused by germline polymorphism and/or somatic mutation"),
    ("SOMATIC", 0, "Flag", "Somatic variant"),
    ("MGVCF_BLOCK", 0, "Flag", "Multi-sample gVCF-like block"),
    ("ADDITIONAL_INDEL_CANDIDATE", 0, "Flag", "Position with signal of additional InDel candidates"),
    ("SomaticQ", "A", "Float", "Somatic quality of the variant, the PHRED-scale probability that this variant is not somatic."),
    ("TLODQ", "A", "Float", "Tumor log-of-data-likelihood quality, the PHRED-scale probability that this variant is not of biological origin (i.e., artifactual)."),
    ("NLODQ", "A", "Float", "Normal log-of-data-likelihood quality, the PHRED-scale probability that this variant is of germline origin."),
    ("NLODV", "A", "String", "The variant symbol that minimizes NLODQ"),
    ("TNBQF", 4, "Float", "Binomial reward, power-law reward, systematic-error penalty, and normal-adjusted TLODQ for the de-duplicated fragment tier"),
    ("TNCQF", 4, "Float", "Binomial reward, power-law reward, systematic-error penalty, and normal-adjusted TLODQ for the SSCS tier"),
    ("tbDP", 1, "Integer", "Tumor total duped depth (number of read segments)"),
    ("tDP", 1, "Integer", "Tumor total deduped depth"),
    ("tAD", "R", "Integer", "Tumor deduped depths of the REF and ALT alleles"),
    ("t2DP", 1, "Integer", "Tumor total SSCS depth"),
    ("t2AD", "R", "Integer", "Tumor SSCS depths of the REF and ALT alleles"),
    ("nDP", 1, "Integer", "Normal total deduped depth"),
    ("nAD", "R", "Integer", "Normal deduped depths of the REF and ALT alleles"),
    ("n2AD", "R", "Integer", "Normal SSCS depths of the REF and ALT alleles"),
    ("RU", 1, "String", "The shortest repeating unit in the reference"),
    ("RC", 1, "Integer", "The number of non-interrupted RUs in the reference"),
    ("R3X2", 6, "Integer", "Repeat start position, repeat track length, and repeat unit size at the two positions before and after this VCF position"),
]

# FORMAT subset currently emitted (grown toward the full 110-tag schema)
FORMAT_DEFS = [
    ("GT", 1, "String", "Genotype"),
    ("VTI", "P", "Integer", "Variant-type ID of the ALT allele"),
    ("VTD", "P", "String", "Variant-type description of the ALT allele"),
    ("FT", 1, "String", "Sample genotype filter indicating if this genotype was called"),
    ("FTS", "P", "String", "Sample variant filter indicating if this variant was called"),
    ("DP", 1, "Integer", "Fragment depth of coverage with duplicates removed"),
    ("AD", "R", "Integer", "Fragment depths of the REF and ALT alleles with duplicates removed"),
    ("bDP", 1, "Integer", "Fragment depth of coverage with duplicates kept"),
    ("bAD", "R", "Integer", "Fragment depths of the REF and ALT alleles with duplicates kept"),
    ("c2DP", 1, "Integer", "Consensus-family depth of coverage"),
    ("c2AD", "R", "Integer", "Consensus-family depths of the REF and ALT alleles"),
    ("cVQ1", "P", "Integer", "Variant quality of the de-duplicated fragment tier"),
    ("cVQ2", "P", "Integer", "Variant quality of the SSCS tier"),
    ("gVQ1", "P", "Integer", "Germline variant quality"),
    ("CONTQ", "P", "Integer", "Likelihood of the variant signal if the variant signal is contaminated"),
    ("bIAQ", "P", "Integer", "The averaged binomial variant allele quality of duped fragments"),
    ("cPLQ1", "P", "Integer", "The power-law variant allele quality of deduped fragments"),
    ("bMQQ", "P", "Integer", "Mapping-quality-derived systematic-error variant quality"),
    ("aBQQ", "P", "Integer", "Base-quality-derived systematic-error variant quality"),
    ("cDP1v", "P", "Integer", "Effective de-duplicated depth of the ALT allele x100 (bias-reduced)"),
    ("CDP1v", 1, "Integer", "Effective de-duplicated depth of all alleles x100 (bias-reduced)"),
    ("bNMQ", "P", "Integer", "Phred penalty inferred from mismatches"),
    ("vHGQ", 1, "Integer", "Phred likelihood that the variant is an artifact given no germline nor somatic signal"),
    ("bDPf", "R", "Integer", "Forward-strand fragment depths of the REF and ALT alleles with duplicates kept"),
    ("bDPr", "R", "Integer", "Reverse-strand fragment depths of the REF and ALT alleles with duplicates kept"),
    ("BDPb", 2, "Integer", "Total fragment depth on the forward and reverse strands with duplicates kept"),
    ("cPCQ1", "P", "Integer", "Cap of the de-duplicated fragment tier variant quality not reduced by the matched normal"),
    ("cPCQ2", "P", "Integer", "Cap of the SSCS tier variant quality not reduced by the matched normal"),
    ("cDP1x", "P", "Integer", "Effective de-duplicated depth of the ALT allele x100 (passing-filter reduced)"),
    ("CDP1x", 1, "Integer", "Effective de-duplicated depth of all alleles x100 (passing-filter reduced)"),
    ("cDP2x", "P", "Integer", "Effective SSCS depth of the ALT allele x100 (passing-filter reduced)"),
    ("CDP2x", 1, "Integer", "Effective SSCS depth of all alleles x100 (passing-filter reduced)"),
    ("cVQ1M", "P", "Integer", "cVQ1 of the top-ranked consensus ALT allele at this position"),
    ("cVQ2M", "P", "Integer", "cVQ2 of the top-ranked consensus ALT allele at this position"),
    ("cVQAM", "P", "String", "Symbol description of the top-ranked consensus ALT allele"),
    ("cVQSM", "P", "String", "Indel string of the top-ranked consensus ALT allele"),
    ("vAC", 2, "Integer", "Number of SNV and InDel alleles at this position passing the triallelic quality"),
    ("vNLODQ", 2, "Integer", "Phred likelihood of germline origin for SNVs and InDels at this position"),
    ("bHap", 1, "String", "Duped haplotype phase signatures overlapping this variant with forward and reverse strand counts"),
    ("cHap", 1, "String", "Deduped haplotype phase signatures overlapping this variant with strand counts"),
    ("c2Hap", 1, "String", "SSCS haplotype phase signatures overlapping this variant with strand counts"),
]

# per-allele scalar tags gathered directly from the dense F arrays at
# [pos, symbol] (bcf_formats_generator1.cpp:135-529; lowercase = ALT
# allele, uppercase = per-symboltype sum).  Grouped as in the generator.
SCALAR_TAGS = (
    # _AQ/_ADP*: quality sums and strand-orientation quadrant depths
    "aMQs AMQs a1BQf A1BQf a1BQr A1BQr "
    "aDPff ADPff aDPfr ADPfr aDPrf ADPrf aDPrr ADPrr "
    # _ALP/_ARP/_ALB/_ARB: tier-1/2 position- and BAQ-unbiased depths
    "aLP1 ALP1 aLP2 ALP2 aLPL ALPL aRP1 ARP1 aRP2 ARP2 aRPL ARPL "
    "aLB1 ALB1 aLB2 ALB2 aLBL ALBL aRB1 ARB1 aRB2 ARB2 aRBL ARBL "
    # _ALI/_ARI: insert-end unbiased depths
    "aLI1 ALI1 aLI2 ALI2 aLIr ALIr aRI1 ARI1 aRI2 ARI2 aRIf ARIf "
    # _AX/_Ax: BQ-unbiased, PF-derated, eligibility counters
    "aBQ2 ABQ2 aPF1 APF1 aPF2 APF2 aP1 AP1 aP2 AP2 aP3 aNC aLIT aRIT "
    # _ea/_eb: systematic-error inputs
    "aBQ a2BQf a2BQr a2XM2 a2BM2 bMQ aAaMQ bNMa bNMb "
    # _eB/_eC/_eE: IID bucket qualities
    "bIAQb bIADb bIDQb cIAQf cIADf cIDQf cIAQr cIADr cIDQr "
    "cIAQ bTINQ cTINQ "
    # _eQ2/_CDPxvx: SSCS quality + effective-depth tiers
    "cPLQ2 cMmQ dVQinc cDP1w CDP1w cDP2v CDP2v cDP2w CDP2w "
    # family-tier per-strand depths
    "cDP1f cDP1r cDP12f cDP12r cDP2f cDP2r cDP3f cDP3r cDP21f cDP21r "
    "cDPMf cDPMr cDPmf cDPmr cDPDf cDPDr dDP1 DDP1 dDP2 DDP2 "
    # SSCS bias counters (c2*)
    "c2BQ2 C2BQ2 c2LP0 C2LP0 c2RP0 C2RP0 c2LP1 c2LP2 C2LP2 "
    "c2RP1 c2RP2 C2RP2 c2LPL C2LPL c2RPL C2RPL "
    "c2LB1 c2LB2 C2LB2 c2RB1 c2RB2 C2RB2 c2LBL C2LBL c2RBL C2RBL "
    # bTA/bTB per-strand
    "bTAf BTAf bTAr BTAr bTBf BTBf bTBr BTBr "
    # exact-indel majority depths
    "bDPa cDP0a"
).split()

# Number=2 tags: pairs of per-strand capital sums (x,y per record)
PAIR_TAGS = {
    "CDP1b": ("CDP1b_l", "CDP1b_r"), "CDP12b": ("CDP12b_l", "CDP12b_r"),
    "CDP2b": ("CDP2b_l", "CDP2b_r"), "CDP3b": ("CDP3b_l", "CDP3b_r"),
    "CDP21b": ("CDP21b_l", "CDP21b_r"), "CDPMb": ("CDPMb_l", "CDPMb_r"),
    "CDPmb": ("CDPmb_l", "CDPmb_r"), "CDPDb": ("CDPDb_l", "CDPDb_r"),
    "BTAb": ("BTAf", "BTAr"), "BTBb": ("BTBf", "BTBr"),
}

# per-position array tags (comma-joined)
ARRAY_TAGS = ("APDP", "APXM", "APLRID", "APLRI", "APLRP")

# capital per-strand tags stored under _l/_r keys in F
MAPPED_TAGS = {
    "BDPf": "BDPb_l", "BDPr": "BDPb_r",
    "CDP1f": "CDP1b_l", "CDP1r": "CDP1b_r",
    "CDP12f": "CDP12b_l", "CDP12r": "CDP12b_r",
    "CDP2f": "CDP2b_l", "CDP2r": "CDP2b_r",
    "CDP3f": "CDP3b_l", "CDP3r": "CDP3b_r",
    "CDP21f": "CDP21b_l", "CDP21r": "CDP21b_r",
    "CDPMf": "CDPMb_l", "CDPMr": "CDPMb_r",
    "CDPmf": "CDPmb_l", "CDPmr": "CDPmb_r",
}

# padded-deletion-allele depth pairs (stored as 2x the strand-0 value,
# matching the reference's fill_symboltype_nn_fmt strand-0-twice quirk)
NN_PAIR_TAGS = ("BDPd", "CDP1d", "CDP2d")

# remaining non-scalar tags with bespoke fill in calling.py
MISC_TAGS = ("GQ", "HQ", "FT", "c2DP", "c2AD", "ALRPxT", "ALRIT", "ALRIt",
             "ALRPt", "nPF", "nNFA", "nAFA", "nBCFA", "gapNf", "gapNr",
             "gapSeq", "gapbAD1", "gapcAD1", "gc2AD", "gc2dAD", "note")

EXTRA_FORMAT_KEYS = (list(SCALAR_TAGS) + list(MAPPED_TAGS)
                     + list(PAIR_TAGS) + list(NN_PAIR_TAGS)
                     + list(ARRAY_TAGS) + list(MISC_TAGS))


def generate_header(cmdline, contigs, sample_name, cfg=None,
                    tumor_sample=None):
    lines = ["##fileformat=VCFv4.2"]
    lines.append("##fileDate=" + time.strftime("%Y%m%d"))
    lines.append(f"##variantCallerVersion=uvc_tpu-{__version__}")
    lines.append(f"##variantCallerCommand={cmdline}")
    for fid, desc in FILTERS:
        lines.append(f'##FILTER=<ID={fid},Description="{desc}">')
    for name, length in contigs:
        lines.append(f"##contig=<ID={name},length={length}>")
    for iid, num, typ, desc in INFO_DEFS:
        lines.append(f'##INFO=<ID={iid},Number={num},Type={typ},Description="{desc}">')
    for fid, num, typ, desc in FORMAT_DEFS:
        n = 1 if num == "P" else num
        lines.append(f'##FORMAT=<ID={fid},Number={n},Type={typ},Description="{desc}">')
    declared = {f[0] for f in FORMAT_DEFS}
    for fid in EXTRA_FORMAT_KEYS:
        if fid in declared:
            continue
        if fid in SCALAR_TAGS or fid in MAPPED_TAGS:
            num, typ = 1, "Integer"
        elif fid in PAIR_TAGS or fid in NN_PAIR_TAGS:
            num, typ = 2, "Integer"
        elif fid in ARRAY_TAGS or fid in ("nNFA", "nAFA", "nBCFA"):
            num, typ = ".", "Integer"
        elif fid in ("GQ", "c2DP", "c2AD"):
            num, typ = 1, "Integer"
        elif fid in ("gapNf", "gapNr", "gapbAD1", "gapcAD1", "gc2AD",
                     "gc2dAD"):
            num, typ = ".", "Integer"   # Number=D in the reference schema
        elif fid == "gapSeq":
            num, typ = ".", "String"
        elif fid in ("ALRPxT",):
            num, typ = 2, "Integer"
        elif fid in ("ALRIT", "ALRIt", "ALRPt"):
            num, typ = 4, "Integer"
        elif fid in ("nPF", "HQ"):
            num, typ = 2, "Integer"
        else:
            num, typ = 1, "String"
        lines.append(f'##FORMAT=<ID={fid},Number={num},Type={typ},'
                     f'Description="See the corresponding tag in the '
                     f'reference uvc1 schema (bcf_formats_generator1.cpp)">')
    cols = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + sample_name
    if tumor_sample:
        cols += "\t" + tumor_sample
    lines.append(cols)
    return "\n".join(lines) + "\n"


def render_record(chrom, rec, ref_fmt=None):
    """One VCF line from a calling.VariantRecord (+ optional REF-allele fmt
    values for Number=R tags)."""
    info = rec.info
    parts = []
    if info.get("SOMATIC"):
        parts.append("SOMATIC")
    if info.get("ANY_VAR"):
        parts.append("ANY_VAR")
    for k in ("SomaticQ", "TLODQ", "NLODQ", "NLODV"):
        if k in info:
            parts.append(f"{k}={info[k]}")
    for k in ("TNBQF", "TNCQF"):
        if k in info:
            parts.append(f"{k}=" + ",".join(str(x) for x in info[k]))
    for k in ("tbDP", "tDP"):
        if k in info:
            parts.append(f"{k}={info[k]}")
    if "tAD" in info:
        parts.append("tAD=" + ",".join(str(x) for x in info["tAD"]))
    if "t2DP" in info:
        parts.append(f"t2DP={info['t2DP']}")
    if "t2AD" in info:
        parts.append("t2AD=" + ",".join(str(x) for x in info["t2AD"]))
    for k in ("nDP",):
        if k in info:
            parts.append(f"{k}={info[k]}")
    if "nAD" in info:
        parts.append("nAD=" + ",".join(str(x) for x in info["nAD"]))
    if "n2AD" in info:
        parts.append("n2AD=" + ",".join(str(x) for x in info["n2AD"]))
    parts.append(f"RU={info.get('RU', '')}")
    parts.append(f"RC={info.get('RC', 0)}")
    if "R3X2" in info:
        parts.append("R3X2=" + ",".join(str(x) for x in info["R3X2"]))

    f = rec.fmt
    keys = ["GT", "VTI", "VTD", "FTS", "DP", "AD", "bDP", "bAD",
            "bDPf", "bDPr", "BDPb", "cVQ1", "cVQ2", "cPCQ1", "cPCQ2",
            "gVQ1", "CONTQ", "bIAQ", "cPLQ1", "bMQQ", "aBQQ", "bNMQ",
            "cDP1v", "CDP1v", "cDP1x", "CDP1x", "cDP2x", "CDP2x", "vHGQ",
            "cVQ1M", "cVQ2M", "cVQAM", "cVQSM", "vAC", "vNLODQ",
            "bHap", "cHap", "c2Hap"]
    keys += [k for k in EXTRA_FORMAT_KEYS if k in f]
    fmt_names = ":".join(keys)
    vals = []
    if ref_fmt is None:
        ref_fmt = getattr(rec, "ref_fmt", None)
    for k in keys:
        v = f.get(k, ".")
        if k in ("AD", "bAD", "bDPf", "bDPr") and ref_fmt is not None:
            v = f"{ref_fmt.get(k, 0)},{v}"
        vals.append(str(v))
    line = "\t".join([
        chrom, str(rec.vcfpos), ".", rec.ref, rec.alt,
        f"{rec.qual:g}", rec.filter, ";".join(parts), fmt_names,
        ":".join(vals)])
    if getattr(rec, "tumor_fmt", ""):
        line += "\t" + rec.tumor_fmt
    return line


class VcfWriter:
    def __init__(self, path_or_stream, level=6):
        self._to_stdout = path_or_stream in ("-", None)
        if self._to_stdout:
            import sys
            self._fh = sys.stdout
            self._bgzf = None
        else:
            self._bgzf = bgzf.BgzfWriter(path_or_stream, level)

    def write(self, text):
        if self._bgzf:
            self._bgzf.write(text.encode())
        else:
            self._fh.write(text)

    def close(self):
        if self._bgzf:
            self._bgzf.close()
