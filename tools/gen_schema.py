#!/usr/bin/env python3
"""Generate uvc_tpu/vcfout/schema.py from the reference VCF-schema generator.

The reference repo's build runs bcf_formats_generator1.cpp to produce
bcf_formats.step1.hpp (Makefile:55-59), which is the single source of truth
for the 28 FILTER and 258 FORMAT header lines, the per-record FORMAT column
layout (FORMAT_STRING_PER_REC[_WITHOUT_SSCS], bcf_formats_generator1.cpp:
599-718), and the per-tag print semantics (streamAppendBcfFormat).

This tool compiles that generator in-env (plain g++, no htslib needed), runs
it, and PARSES ITS OUTPUT into a declarative python table.  The emitted
schema.py is generated interface data (VCF tag ids / arities / descriptions),
not translated code: the uvc_tpu renderer consumes the table with its own
logic.  tests/test_schema_parity.py re-runs this extraction from scratch and
asserts the checked-in table is byte-identical to the oracle.
"""

import os
import re
import subprocess
import sys
import tempfile

REF = os.environ.get("UVC_REFERENCE_DIR", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_and_run_oracle(workdir=None):
    """Compile the reference schema generator and return the generated
    bcf_formats.step1.hpp text.  Raises on any failure."""
    workdir = workdir or tempfile.mkdtemp(prefix="uvc_schema_oracle_")
    exe = os.path.join(workdir, "bcfgen")
    srcs = [os.path.join(REF, "bcf_formats_generator1.cpp"),
            os.path.join(REF, "common.cpp")]
    if not os.path.exists(exe):
        subprocess.run(["g++", "-std=c++14", "-O1", "-o", exe] + srcs,
                       check=True, capture_output=True)
    out = subprocess.run([exe], check=True, capture_output=True)
    return out.stdout.decode()


def _unescape_c(lit):
    """Unescape a C string literal body (no surrounding quotes)."""
    return (lit.replace(r"\"", '"').replace(r"\\", "\\")
            .replace(r"\n", "\n").replace(r"\t", "\t"))


def _parse_string_array(src, name):
    i = src.index(f"const char *const {name}[] = {{")
    j = src.index("};", i)
    body = src[i:j]
    out = []
    for m in re.finditer(r'"((?:[^"\\]|\\.)*)"\s*,?', body):
        out.append(_unescape_c(m.group(1)))
    return out


def _parse_string_const(src, name):
    m = re.search(rf'const char \*const {name} = "((?:[^"\\]|\\.)*)";', src)
    return _unescape_c(m.group(1))


def _parse_struct(src):
    """Return {field: (kind, arity, elemtype)} from struct BcfFormat.
    kind: 'scalar' | 'string' | 'array' | 'vector';
    elemtype: 'int' | 'float' | 'str'."""
    lines = src.splitlines()
    start = next(i for i, l in enumerate(lines) if "struct BcfFormat" in l)
    fields = {}

    def etype(t):
        if "string" in t:
            return "str"
        if "float" in t or "double" in t:
            return "float"
        return "int"

    for l in lines[start + 1:]:
        if l.startswith("static "):
            break
        m = re.match(
            r"\s*std::vector<\s*([\w:<>\s]+?)\s*>\s*(\w+)\s*[;=]", l)
        if m:
            fields[m.group(2)] = ("vector", None, etype(m.group(1)))
            continue
        m = re.match(
            r"\s*std::array\s*<\s*([\w:<>\s]+?)\s*,\s*(\d+)\s*>\s*(\w+)"
            r"\s*[;=]", l)
        if m:
            fields[m.group(3)] = ("array", int(m.group(2)),
                                  etype(m.group(1)))
            continue
        m = re.match(r"\s*std::string\s+(\w+)\s*[;=]", l)
        if m:
            fields[m.group(1)] = ("string", None, "str")
            continue
        m = re.match(r"\s*(bool|float|double|u?int\d+_t|int)\s+(\w+)\s*[;=]",
                     l)
        if m and m.group(2) != "enable_tier2_consensus_format_tags":
            fields[m.group(2)] = ("scalar", None, etype(m.group(1)))
    return fields


def _parse_print_plan(src, format_ids, fields):
    """Parse streamAppendBcfFormat into an ordered print plan.
    Returns list of (tag, gated, kind, arity, elemtype); kind 'sep' for
    sub-header separator tags (which print their own id as the value)."""
    i = src.index("static int streamAppendBcfFormat")
    j = src.index("\nstatic ", i + 10)
    body = src[i:j]
    plan = []
    blocks = re.split(r"\nif \(", body)[1:]
    for blk in blocks:
        cond, rest = blk.split(")", 1)
        gated = "enable_tier2" in cond
        m = re.search(r"FORMAT_IDS\[(\d+)\]", rest)
        if m:
            tag = format_ids[int(m.group(1))]
            plan.append((tag, gated, "sep", None, "str"))
            continue
        m = re.search(r"fmt\.(\w+)", rest)
        if not m:
            raise ValueError("unparsed print block: " + rest[:200])
        tag = m.group(1)
        kind, arity, et = fields[tag]
        if kind == "array":
            # the generated printer emits only out_num_2 entries (<= the
            # struct array size in_num_1; bcf_formats_generator1.cpp:670-674)
            m = re.search(r"i < (\d+); i\+\+", rest)
            arity = int(m.group(1))
        plan.append((tag, gated, kind, arity, et))
    return plan


def parse_schema(src):
    filter_lines = _parse_string_array(src, "FILTER_LINES")
    format_lines = _parse_string_array(src, "FORMAT_LINES")
    format_ids = _parse_string_array(src, "FORMAT_IDS")
    per_rec = _parse_string_const(src, "FORMAT_STRING_PER_REC")
    per_rec_nosscs = _parse_string_const(
        src, "FORMAT_STRING_PER_REC_WITHOUT_SSCS")
    fields = _parse_struct(src)
    plan = _parse_print_plan(src, format_ids, fields)
    # Cross-checks: the print plan must reproduce both FORMAT strings.
    got = ":".join(t for t, g, k, a, e in plan)
    assert got == per_rec, "print plan != FORMAT_STRING_PER_REC"
    got_nosscs = ":".join(t for t, g, k, a, e in plan if not g)
    assert got_nosscs == per_rec_nosscs
    # Number= per tag from the header lines (for R-tag handling).
    number = {}
    typ = {}
    for line in format_lines:
        m = re.match(r"##FORMAT=<ID=(\w+),Number=([\w.]+),Type=(\w+),", line)
        number[m.group(1)] = m.group(2)
        typ[m.group(1)] = m.group(3)
    return dict(FILTER_LINES=filter_lines, FORMAT_LINES=format_lines,
                FORMAT_IDS=format_ids, FORMAT_STRING_PER_REC=per_rec,
                FORMAT_STRING_PER_REC_WITHOUT_SSCS=per_rec_nosscs,
                PER_REC_PLAN=plan, TAG_NUMBER=number, TAG_TYPE=typ)


def emit_schema_py(schema, path):
    with open(path, "w") as f:
        f.write('"""VCF FILTER/FORMAT schema — GENERATED by '
                "tools/gen_schema.py.\n\n"
                "Extracted from the output of the reference's build-time "
                "schema generator\n(bcf_formats_generator1.cpp:538-746); "
                "regenerate with:  python tools/gen_schema.py\n"
                "Do not edit by hand; tests/test_schema_parity.py re-derives "
                'this from the\noracle and asserts byte equality.\n"""\n\n')
        for key in ("FILTER_LINES", "FORMAT_LINES", "FORMAT_IDS"):
            f.write(f"{key} = [\n")
            for s in schema[key]:
                f.write(f"    {s!r},\n")
            f.write("]\n\n")
        f.write("FORMAT_STRING_PER_REC = "
                f"{schema['FORMAT_STRING_PER_REC']!r}\n\n")
        f.write("FORMAT_STRING_PER_REC_WITHOUT_SSCS = "
                f"{schema['FORMAT_STRING_PER_REC_WITHOUT_SSCS']!r}\n\n")
        f.write("# (tag, sscs_gated, kind, arity, elemtype) in print order;\n"
                "# kind 'sep' prints the tag id itself as the value.\n")
        f.write("PER_REC_PLAN = [\n")
        for row in schema["PER_REC_PLAN"]:
            f.write(f"    {row!r},\n")
        f.write("]\n\n")
        f.write("TAG_NUMBER = {\n")
        for k, v in schema["TAG_NUMBER"].items():
            f.write(f"    {k!r}: {v!r},\n")
        f.write("}\n\n")
        f.write("TAG_TYPE = {\n")
        for k, v in schema["TAG_TYPE"].items():
            f.write(f"    {k!r}: {v!r},\n")
        f.write("}\n")


def main():
    src = build_and_run_oracle()
    schema = parse_schema(src)
    out = os.path.join(REPO, "uvc_tpu", "vcfout", "schema.py")
    emit_schema_py(schema, out)
    n_sep = sum(1 for r in schema["PER_REC_PLAN"] if r[2] == "sep")
    print(f"wrote {out}: {len(schema['FILTER_LINES'])} FILTERs, "
          f"{len(schema['FORMAT_LINES'])} FORMAT lines, "
          f"{len(schema['PER_REC_PLAN'])} per-rec tags ({n_sep} separators)")


if __name__ == "__main__":
    sys.exit(main())
