"""Every emitted record must follow the reference's per-record FORMAT plan.

The FORMAT column must be byte-identical to FORMAT_STRING_PER_REC or
FORMAT_STRING_PER_REC_WITHOUT_SSCS (main.hpp:6264), and the sample column
must have one value per tag with the arity of the generated
streamAppendBcfFormat (bcf_formats_generator1.cpp:644-688).  The header's
FILTER/FORMAT blocks must be the oracle-extracted lines verbatim, in order,
and the INFO block must match generate_vcf_header (main.hpp:5805-5837).
"""

import os
import re
import subprocess
import sys

import pytest


from uvc_tpu.io import simulate, bgzf
from uvc_tpu.vcfout import schema, writer

ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUX_FORMATS = {
    "GT:VTI:POS_VT_BDP_CDP_HomRefQ",          # MGVCF blocks (main.cpp:734)
    "GT:VTI:clipDP",                          # indel candidates (main.cpp:780)
    "GT:GQ:HQ:FT:CDP1:cDP1:GL4:GST:note",     # germline (main.hpp:5746)
}
PLAN = {t: (k, a) for t, g, k, a, e in schema.PER_REC_PLAN}


def _run_cli(tmp_path, umi=False):
    ref = simulate.random_ref(4000, 7)
    variants = [
        simulate.Variant(1000, f"{ref[1000]}>" + ("A" if ref[1000] != "A" else "G"), 0.3),
        simulate.Variant(2000, "+CT", 0.3),
        simulate.Variant(3000, "-2", 0.3),
    ]
    bam = str(tmp_path / "r.bam")
    simulate.build_bam(bam, ref, depth=80, variants=variants, seed=5,
                       umi=umi)
    fa = str(tmp_path / "ref.fa")
    open(fa, "w").write(">chr1\n" + ref + "\n")
    out = str(tmp_path / "r.vcf.gz")
    subprocess.run([sys.executable, "-m", "uvc_tpu.cli.uvc1", "-f", fa,
                    "-o", out, "-t", "1", bam], check=True, env=ENV,
                   capture_output=True)
    return bgzf.decompress(open(out, "rb").read()).decode().splitlines()


@pytest.fixture(scope="module")
def vcf_lines(tmp_path_factory):
    return _run_cli(tmp_path_factory.mktemp("layout"))


def test_format_column_is_reference_plan(vcf_lines):
    recs = [l for l in vcf_lines if not l.startswith("#")]
    assert recs, "no records emitted"
    n_plan = 0
    for l in recs:
        cols = l.split("\t")
        fmt_names, vals = cols[8], cols[9].split(":")
        if fmt_names in AUX_FORMATS:
            continue
        assert fmt_names in (schema.FORMAT_STRING_PER_REC,
                             schema.FORMAT_STRING_PER_REC_WITHOUT_SSCS)
        names = fmt_names.split(":")
        assert len(names) == len(vals)
        for n, v in zip(names, vals):
            kind, arity = PLAN[n]
            if kind == "sep":
                assert v == n, (n, v)
            elif kind == "array":
                assert len(v.split(",")) == arity, (n, v, arity)
            elif kind == "scalar":
                assert "," not in v, (n, v)
        n_plan += 1
    assert n_plan > 0


def test_number_r_tags_carry_ref_alt_pairs(vcf_lines):
    for l in vcf_lines:
        if l.startswith("#"):
            continue
        cols = l.split("\t")
        if cols[8] in AUX_FORMATS:
            continue
        d = dict(zip(cols[8].split(":"), cols[9].split(":")))
        for tag in ("AD", "bAD", "aMQs", "cVQ1", "cDP1v", "VTI", "VTD"):
            assert len(d[tag].split(",")) == 2, (tag, d[tag])
        # AD pair must be REF,ALT of the CDP1b strand sums
        cdp1b = sum(int(x) for x in d["CDP1b"].split(","))
        assert d["DP"] == str(cdp1b)


def test_header_blocks_match_oracle_schema(vcf_lines):
    header = [l for l in vcf_lines if l.startswith("##")]
    filt = [l for l in header if l.startswith("##FILTER=")]
    assert filt == schema.FILTER_LINES
    fmt = [l for l in header if l.startswith("##FORMAT=")]
    assert fmt[:len(schema.FORMAT_LINES)] == schema.FORMAT_LINES
    # the post-schema extras of generate_vcf_header (main.hpp:5841-5868)
    extra_ids = [re.match(r"##FORMAT=<ID=([^,]+),", l).group(1)
                 for l in fmt[len(schema.FORMAT_LINES):]]
    assert extra_ids == ["GL4", "GST", "CDP1", "cDP1",
                         "POS_VT_BDP_CDP_HomRefQ", "clipDP"]
    info_ids = [re.match(r"##INFO=<ID=([^,]+),", l).group(1)
                for l in header if l.startswith("##INFO=")]
    assert info_ids == [
        "ANY_VAR", "GERMLINE", "SOMATIC", "MGVCF_BLOCK",
        "ADDITIONAL_INDEL_CANDIDATE", "SomaticQ", "TLODQ", "NLODQ", "NLODV",
        "TNBQF", "TNCQF", "tbDP", "tDP", "tAD", "t2DP", "t2AD",
        "nDP", "nAD", "n2AD", "RU", "RC", "R3X2"]


REF = os.environ.get("UVC_REFERENCE_DIR", "/root/reference")


@pytest.mark.skipif(not os.path.exists(os.path.join(REF, "main.hpp")),
                    reason="reference source unavailable")
def test_info_lines_match_reference_literals():
    """Reconstruct the INFO/ALT literals from generate_vcf_header's source
    (main.hpp:5798-5837) and compare byte-for-byte."""
    src = open(os.path.join(REF, "main.hpp")).read()
    body = src.split("generate_vcf_header(", 1)[1]
    body = body.split("for (size_t i = 0; i < bcfrec::FORMAT_NUM", 1)[0]
    # collect every C string literal, resolving the two interpolations
    stmts = []
    for stmt in body.split(";"):
        if '"##INFO=' not in stmt and '"##ALT=' not in stmt:
            continue
        lits = re.findall(r'"((?:[^"\\]|\\.)*)"', stmt)
        text = "".join(l.replace('\\"', '"') for l in lits)
        text = text.removesuffix("\\n")
        if "MGVCF_REGION_MAX_SIZE" in stmt:
            i = text.index(" consecutive")
            text = text[:i] + "1000" + text[i:]
        stmts.append(text)
    expect_alt, expect_infos = stmts[0], stmts[1:]
    assert writer.ALT_LINE == expect_alt
    assert writer.INFO_LINES == expect_infos, (
        [a for a, b in zip(writer.INFO_LINES, expect_infos) if a != b][:2])
