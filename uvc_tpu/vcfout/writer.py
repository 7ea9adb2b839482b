"""VCF output: header generation and bgzipped record emission.

Byte-faithful to the reference's output layer:
- the header reproduces generate_vcf_header (main.hpp:5778-5883) line by
  line: fileformat/fileDate/reference, contigs, the NON_REF ALT line, the
  28 FILTER lines and 258 FORMAT lines emitted by the compiled schema
  generator (bcf_formats_generator1.cpp, extracted into schema.py), the 22
  INFO lines, the germline/MGVCF/clip FORMAT extras, and the provenance
  trailer;
- each record's FORMAT column is FORMAT_STRING_PER_REC or
  FORMAT_STRING_PER_REC_WITHOUT_SSCS (main.hpp:6264) and the sample column
  is rendered by walking PER_REC_PLAN exactly like the generated
  streamAppendBcfFormat (bcf_formats_generator1.cpp:644-688): separator
  tags print their own ID, Number=R vectors print [REF,ALT] (the
  streamFrontPushBcfFormatR rotation, main.cpp:1031), fixed arrays print
  out_num_2 entries, empty strings/vectors print ".".
"""

import time

from .. import __version__
from ..io import bgzf
from . import schema

# ---------------------------------------------------------------------------
# header (generate_vcf_header, main.hpp:5778-5883)

ALT_LINE = (
    '##ALT=<ID=NON_REF,Description="Represents any possible alternative '
    'allele at this location, where POS (start position) is one-based '
    'inclusive. CAVEAT: this VCF line record is similar to a GVCF block but '
    'does not conform to the GVCF specifications. ">')

# the INFO block of main.hpp:5805-5837, transcribed byte-for-byte with the
# MGVCF_REGION_MAX_SIZE constant interpolated
INFO_LINES = [
    '##INFO=<ID=ANY_VAR,Number=0,Type=Flag,Description="Any type of variant which may be caused by germline polymorphism and/or somatic mutation">',
    '##INFO=<ID=GERMLINE,Number=0,Type=Flag,Description="germline variant">',
    '##INFO=<ID=SOMATIC,Number=0,Type=Flag,Description="Somatic variant">',
    '##INFO=<ID=MGVCF_BLOCK,Number=0,Type=Flag,Description="Multi-sample GVCF-like genomic regions consisting of 1000 consecutive positions. '
    'MGVCF is modified from GVCF to allow for easy comparison of sequencing depths of multiple samples at any arbitrary position. '
    'More detail is described in FORMAT/POS_VT_BDP_CDP_HomRefQ. ">',
    '##INFO=<ID=ADDITIONAL_INDEL_CANDIDATE,Number=0,Type=Flag,Description="Position with an abnormally high number of (soft/hard)-clipped sequences adjacent to this position (which can be caused by long InDel, copy-number variation (CNV), structural variation (SV), etc.) or with a high STR track length after it">',
    '##INFO=<ID=SomaticQ,Number=A,Type=Float,Description="Somatic quality of the variant, the Phred-scaled odds that this variant is not somatic. '
    'CAVEAT: if only tumor bam file is provided, then this quality usually cannot reach 60 even with the help of a very big germline database because '
    'germline and somatic variants share similar characteristics in the tumor. '
    'Therefore, a matched normal is absolutely required to confidently determine the germline-vs-somatic origin of a biological variant. ">',
    '##INFO=<ID=TLODQ,Number=A,Type=Float,Description="Tumor log-of-data-likelihood quality, the Phred-scaled odds that this variant is not of biological origin (i.e., artifactual). ">',
    '##INFO=<ID=NLODQ,Number=A,Type=Float,Description="Normal log-of-data-likelihood quality, the Phred-scaled odds that this variant is of germline origin. ">',
    '##INFO=<ID=NLODV,Number=A,Type=String,Description="The variant symbol that minimizes NLODQ. ">',
    '##INFO=<ID=TNBQF,Number=4,Type=Float,Description="Binomial reward, power-law reward, systematic-error penalty, and normal-adjusted tumor variant quality computed using deduplicated read fragments. ">',
    '##INFO=<ID=TNCQF,Number=4,Type=Float,Description="Binomial reward, power-law reward, systematic-error penalty, and normal-adjusted tumor variant quality computed using consensus families of read fragments. ">',
    '##INFO=<ID=tbDP,Number=1,Type=Integer,Description="Tumor total non-deduped depth (deprecated, please see BDPb (previously named as BDPf and BDPr)). ">',
    '##INFO=<ID=tDP,Number=1,Type=Integer,Description="Tumor total deduped depth (deprecated, please see CDP1b (previously named as CDP1f and CDP1r)). ">',
    '##INFO=<ID=tAD,Number=R,Type=Integer,Description="Tumor deduped depth of each allele (deprecated, please see cDP1f and cDP1r). ">',
    '##INFO=<ID=t2DP,Number=1,Type=Integer,Description="Tumor total UMI-barcoded-family depth for duplex-rescued SSCS (CDP2b + DDP2 (previously used CDP2f and CDP2r)). ">',
    '##INFO=<ID=t2AD,Number=R,Type=Integer,Description="Tumor UMI-barcoded-family depth of each allele for duplex-rescued SSCS (cDP2b + dDP2 (previously used cDP2f and cDP2r)). ">',
    '##INFO=<ID=nDP,Number=1,Type=Integer,Description="Normal total deduped depth (deprecated, please see CDP1b (previously named as CDP1f and CDP1r)). ">',
    '##INFO=<ID=nAD,Number=R,Type=Integer,Description="Normal deduped depth of each allele (deprecated, please see cDP1f and cDP1r). ">',
    '##INFO=<ID=n2AD,Number=R,Type=Integer,Description="Normal UMI-barcoded-family depth of each allele (deprecated, please see cDP2f and cDP2r). ">',
    '##INFO=<ID=RU,Number=1,Type=String,Description="The shortest repeating unit in the reference">',
    '##INFO=<ID=RC,Number=1,Type=Integer,Description="The number of non-interrupted RUs in the reference">',
    '##INFO=<ID=R3X2,Number=6,Type=Integer,Description="Repeat start position, repeat track length, and repeat unit size at the two positions before and after this VCF position. ">',
]


def _extra_format_lines(cfg):
    """The post-schema FORMAT declarations (main.hpp:5841-5868): germline
    (GL4/GST/CDP1/cDP1), MGVCF (POS_VT_BDP_CDP_HomRefQ) and indel-candidate
    (clipDP) record layouts."""
    indel_minus_snp = (cfg.germ_phred_hetero_indel - cfg.germ_phred_hetero_snp
                       if cfg is not None else 9)
    return [
        '##FORMAT=<ID=GL4,Number=4,Type=Integer,Description="The four genotype likelihoods for 0/0, 0/1, 1/1, and 1/2">',
        '##FORMAT=<ID=GST,Number=.,Type=Integer,Description="The genotype statistics">',
        '##FORMAT=<ID=CDP1,Number=2,Type=Integer,Description="(CDP1f + CDP1r) for all alleles by sum and for the padded deletion allele">',
        '##FORMAT=<ID=cDP1,Number=2,Type=Integer,Description="(cDP1f + cDP1r)">',
        '##FORMAT=<ID=POS_VT_BDP_CDP_HomRefQ,Number=.,Type=Integer,Description="Summary of multiple GVCF regions in a line with INFO/MGVCF. '
        'This field conforms to the following regular expression: ((<pos>,<postype>,<.>,<dup>,<dedup>,<dedupBQ>,<homrefQ>,<.>)+<endpos>) '
        'where (x)+ means one or more occurrence of the expression x. '
        'The integer <pos> denotes position (coordinate on the reference sequence) that separates adjacent regions on the reference sequence. '
        'The integer <postype> denotes position type, where 1 and 2 mean SNV and InDel sub-positions, respectively. '
        'The missing integer represented by the dot symbol <.> is a sentinel value that delimits region separators (aka positions) and region information. '
        'The integer <dup> is the minimum non-deduplicated fragment depth of the region. '
        'The integer <dedup> is the minimum deduplicated fragment depth (with duplicated fragments counted only once). '
        'The integer <dedupBQ> is similar to <dedup> but is computed using only support with R1R2-adjusted BQ passing the threshold set by the command-line parameter --fam-thres-highBQ. '
        'The integer <homrefQ> is the minimum likelihood of the homozygous-reference (homref) genotype (GT) in this region. '
        'The integer <endpos> denotes the SNV ending sub-position of the set of regions on this VCF line, and <endpos> is the last number in this field. '
        'The (inclusive) begin position of the current region is the (exclusive) end position of the previous region. '
        'Each genomic position (e.g., chr1:99) is divided into (a) one SNV sub-position and (b) one InDel sub-position that is right after the SNV sub-position. '
        'The SNV prior of homref GT is used here. '
        'Thus, the actual InDel likelihood of homref GT is the one shown here plus '
        f'{indel_minus_snp}. '
        'CAVEAT: HomRefQ is computed by a very fast but imprecise algorithm, so it is not as accurate as GQ. ">',
        '##FORMAT=<ID=clipDP,Number=2,Type=Integer,Description="Total segment depth and segment depth with adjacent long clips '
        '(for the <ADDITIONAL_INDEL_CANDIDATE> symbolic ALT allele indicating that this position has a lot of long (soft/hard) clips nearby) or that this position is at the beginning of a long STR track">',
    ]


def generate_header(cmdline, contigs, sample_name, cfg=None,
                    tumor_sample=None):
    platform_names = ["AUTO", "Illumina/BGI",
                      "IonTorrent/LifeTechnologies/ThermoFisher",
                      "OtherSequencingPlatform"]
    lines = ["##fileformat=VCFv4.2"]
    lines.append("##fileDate=" + time.strftime("%Y-%m-%d %H:%M:%S"))
    lines.append("##reference="
                 + (cfg.fasta_ref_fname if cfg is not None else ""))
    for name, length in contigs:
        lines.append(f"##contig=<ID={name},length={length}>")
    lines.append(ALT_LINE)
    lines.extend(schema.FILTER_LINES)
    lines.extend(INFO_LINES)
    lines.extend(schema.FORMAT_LINES)
    lines.extend(_extra_format_lines(cfg))
    lines.append("##phasing=partial")
    lines.append(f"##variantCallerVersion=uvc_tpu-{__version__}")
    # the reference joins argv with two trailing spaces per token — the
    # final token's trailing spaces INCLUDED (main.hpp:5871-5875)
    lines.append("##variantCallerCommand="
                 + "".join(tok + "  " for tok in cmdline.split()))
    plat = (platform_names[int(cfg.inferred_sequencing_platform)]
            if cfg is not None else "AUTO")
    readlen = cfg.central_readlen if cfg is not None else 0
    lines.append("##variantCallerInferredParameters=("
                 f"inferred_sequencing_platform={plat}"
                 f",central_readlen={readlen})")
    cols = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + sample_name
    if tumor_sample:
        cols += "\t" + tumor_sample
    lines.append(cols)
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# per-record FORMAT rendering (generated streamAppendBcfFormat semantics)

def _fmt_one(v):
    if isinstance(v, float):
        # BCF_INTEGER fields are all python ints here; floats only appear
        # in bespoke string fields which pre-format themselves
        return f"{v:g}"
    return str(v)


def render_fmt_column(fmt, sscs_on):
    """The sample column: walk PER_REC_PLAN like the generated
    streamAppendBcfFormat.  fmt maps every non-separator plan tag to
    int | str | tuple/list (joined by ','); missing tags raise KeyError
    so schema drift fails loudly."""
    parts = []
    for tag, gated, kind, arity, _ctype in schema.PER_REC_PLAN:
        if gated and not sscs_on:
            continue
        if kind == "sep":
            parts.append(tag)
            continue
        v = fmt[tag]
        if kind == "array" and isinstance(v, (tuple, list)):
            # fixed arrays print only out_num_2 entries (the generated
            # streamAppendBcfFormat loop bound, e.g. AMQs/ALP1/CDP1w
            # print 1 of their 2 struct entries)
            v = v[:arity]
        if isinstance(v, (tuple, list)):
            parts.append(",".join(_fmt_one(x) for x in v) if len(v) else ".")
        elif isinstance(v, str):
            parts.append(v if len(v) else ".")
        else:
            parts.append(_fmt_one(v))
    return ":".join(parts)


def render_record(chrom, rec, ref_fmt=None):
    """One VCF line from a calling.VariantRecord whose .fmt dict is keyed
    by the reference schema tags (see calling.plan_fmt)."""
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

    sscs_on = bool(rec.fmt.get("_sscs", False))
    fmt_names = (schema.FORMAT_STRING_PER_REC if sscs_on
                 else schema.FORMAT_STRING_PER_REC_WITHOUT_SSCS)
    line = "\t".join([
        chrom, str(rec.vcfpos), ".", rec.ref, rec.alt,
        # std::to_string(float vcfqual): fixed 6-decimal (main.hpp:6266)
        f"{rec.qual:.6f}", rec.filter, ";".join(parts), fmt_names,
        render_fmt_column(rec.fmt, sscs_on)])
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
