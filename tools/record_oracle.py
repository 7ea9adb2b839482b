"""Compile the reference's record-quality core into an in-env oracle.

Extends the tools/math_oracle.py shim technique (VERDICT round-2, task 3)
up the call stack: `BcfFormat_symbol_calc_DPv` (main.hpp:4253-4844),
`BcfFormat_symbol_sum_DPv` (main.hpp:4846-4906), `BcfFormat_symbol_calc_qual`
(main.hpp:4908-5343) and `hetLODQ` (main.hpp:5457-5462) operate on a
`bcfrec::BcfFormat` struct plus scalars — no htslib handles — so they
compile against the same 20-line htslib shims once `bcf_formats.step1.hpp`
is produced by the reference's own build-time generator (Makefile:55-59).
The `const auto & symbol2CountCoverageSet12` template parameter is satisfied
by a mock carrying one real `SegFormatPrepSet` (the only member the two
functions read, via `.seg_format_prep_sets.getByPos(refpos)`).

The driver binary speaks a line protocol on stdin:

    reset                       fresh fmt + paramset + prep + rtrs + tki
    ps NAME=VAL ...             CommandLineArgs field overrides
    prep NAME=INT ...           SegFormatPrepSet fields
    rtr1 NAME=INT ... / rtr2    RegionalTandemRepeat args
    tki NAME=VAL ...            TumorKeyInfo fields
    fmt NAME=V1,V2 ...          BcfFormat fields (values %-escaped)
    dpv TPFA REFSYMBOL REFPOS   run BcfFormat_symbol_calc_DPv
    qual INS DEL INS1 DEL1 RU RNUM RESC TPFA REFSYMBOL REFPOS
    hetlodq A1 A2 EXPFRAC POW   print one quality
    print                       dump every fmt field as NAME=V1,V2;...

All function bodies are cut out of the reference source AT BUILD TIME
(nothing is checked in); pytest feeds it the python pipeline's own planes
and pins model/{dpv,qual}.py per-field (tests/test_record_oracle.py).
"""

import os
import re
import subprocess
import sys

REF = os.environ.get("UVC_REFERENCE_DIR", "/root/reference")
TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, TOOLS)

from math_oracle import SAM_SHIM, VCF_SHIM  # noqa: E402


def _extract_named(src, name):
    """Cut one complete function/struct definition out of the reference
    source: the definition line `name(` (or `struct name {`), preceded by
    its return-type line and an optional template<> line, brace-matched to
    the closing brace."""
    m = re.search(r"^(?:template\s*<[^\n>]*>\s*\n)?"
                  r"(?:static\s+)?(?:inline\s+)?(?:const\s+)?"
                  r"(?:auto|void|int|double|bool|struct|std::[^\n;{]*|uvc1_[a-z0-9_]+_t)"
                  r"[ \t]*\n?"
                  r"\s*" + re.escape(name) + r"\s*[({]",
                  src, re.MULTILINE)
    assert m, f"definition of {name} not found"
    beg = m.start()
    i = src.index("{", beg)
    depth = 0
    while True:
        c = src[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                break
        i += 1
    end = i + 1
    # include a trailing `;` (struct definitions)
    while end < len(src) and src[end] in ";\n \t":
        if src[end] == ";":
            end += 1
            break
        end += 1
    return src[beg:end]


def _extract_span(src, start_name, end_name):
    """Contiguous slice from the definition of start_name through the end
    of end_name (keeps interleaved enums/const arrays/helpers)."""
    whole = _extract_named(src, start_name)
    beg = src.index(whole)
    tail = _extract_named(src, end_name)
    end = src.index(tail) + len(tail)
    return src[beg:end]


def _extract_slice(src, begin_anchor, end_anchor, brace_match_from=None):
    """Literal slice of reference source between two anchors (both
    included).  If brace_match_from is given, the end is instead found by
    brace-matching the first '{' after that anchor (end_anchor unused)."""
    beg = src.index(begin_anchor)
    if brace_match_from is not None:
        i = src.index(brace_match_from, beg)
        i = src.index("{", i)
        depth = 0
        while True:
            c = src[i]
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        return src[beg:i + 1]
    end = src.index(end_anchor, beg) + len(end_anchor)
    # extend to the end of the line containing the end anchor
    end = src.index("\n", end)
    return src[beg:end]


def _extract_defines(src, names):
    out = []
    for n in names:
        m = re.search(r"^#define\s+" + re.escape(n) + r"\b[^\n]*", src,
                      re.MULTILINE)
        assert m, f"#define {n} not found"
        out.append(m.group(0).split("//")[0].rstrip())
    return "\n".join(out)


def _compile_gates():
    gates = {}
    for line in open(os.path.join(REF, "common.hpp")):
        m = re.match(r"#define\s+(COMPILATION_\w+)\s+(\d+)", line)
        if m:
            gates[m.group(1)] = int(m.group(2))
    return gates


def _parse_cmdline_fields():
    """(name -> ckind) for every CommandLineArgs field, with compile gates
    applied; ckind in {'int','float','string'}."""
    src = open(os.path.join(REF, "CmdLineArgs.hpp")).read()
    body = src.split("struct CommandLineArgs {", 1)[1].split("\n};", 1)[0]
    gates = _compile_gates()
    fields = {}
    skip_depth = 0
    for line in body.splitlines():
        stripped = line.strip()
        if stripped.startswith("#if"):
            m = re.match(r"#if\s+(\w+)", stripped)
            gated_off = m and not gates.get(m.group(1), 1)
            if skip_depth or gated_off:
                skip_depth += 1
            continue
        if stripped.startswith("#endif"):
            skip_depth = max(0, skip_depth - 1)
            continue
        if skip_depth:
            continue
        line = line.split("//")[0]
        m = re.match(r"^\s*(?:const\s+)?([A-Za-z_][A-Za-z0-9_:<>]*)\s+"
                     r"([A-Za-z_][A-Za-z0-9_]*)\s*=\s*[^;]+;", line)
        if not m:
            continue
        ctype, name = m.group(1), m.group(2)
        if name == "NOT_PROVIDED":
            continue
        if "string" in ctype:
            fields[name] = "string"
        elif ctype in ("double", "float"):
            fields[name] = "float"
        else:
            fields[name] = "int"
    assert len(fields) > 180, f"parser regression: {len(fields)} fields"
    return fields


def _parse_fmt_fields(step1_src):
    """(name -> (kind, arity, elemtype)) from the generated struct
    BcfFormat; mirrors tools/gen_schema._parse_struct."""
    lines = step1_src.splitlines()
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
        m = re.match(r"\s*std::vector<\s*([\w:<>\s]+?)\s*>\s*(\w+)\s*[;=]", l)
        if m:
            fields[m.group(2)] = ("vector", None, etype(m.group(1)))
            continue
        m = re.match(r"\s*std::array\s*<\s*([\w:<>\s]+?)\s*,\s*(\d+)\s*>"
                     r"\s*(\w+)\s*[;=]", l)
        if m:
            fields[m.group(3)] = ("array", int(m.group(2)), etype(m.group(1)))
            continue
        m = re.match(r"\s*std::string\s+(\w+)\s*[;=]", l)
        if m:
            fields[m.group(1)] = ("string", None, "str")
            continue
        m = re.match(r"\s*(bool|float|double|u?int\d+_t|int)\s+(\w+)\s*[;=]",
                     l)
        if m:
            fields[m.group(2)] = ("scalar", None, etype(m.group(1)))
    return fields


SEGPREP_FIELDS = """segprep_a_dp segprep_a_near_ins_dp segprep_a_near_del_dp
segprep_a_near_RTR_ins_dp segprep_a_near_RTR_del_dp segprep_a_pcr_dp
segprep_a_umi_dp segprep_a_snv_dp segprep_a_dnv_dp segprep_a_highBQ_dp
segprep_a_near_pcr_clip_dp segprep_a_near_long_clip_dp segprep_a_at_ins_dp
segprep_a_at_del_dp segprep_a_XM1500 segprep_a_GO1500 segprep_a_GAPLEN
segprep_a_qlen segprep_a_near_ins_pow2len segprep_a_near_del_pow2len
segprep_a_near_ins_inv100len segprep_a_near_del_inv100len segprep_a_LI
segprep_a_LIDP segprep_a_RI segprep_a_RIDP segprep_a_l_dist_sum
segprep_a_r_dist_sum segprep_a_inslen_sum segprep_a_dellen_sum
segprep_a_l_BAQ_sum segprep_a_r_BAQ_sum segprep_a_insBAQ_sum
segprep_a_delBAQ_sum""".split()

RTR_FIELDS = ("begpos tracklen unitlen indelphred anyTR_begpos "
              "anyTR_tracklen anyTR_unitlen").split()

TKI_INT_FIELDS = ("VTI pos BDP bDP CDP1x cDP1x cVQ1 cPCQ1 CDP2x cDP2x cVQ2 "
                  "cPCQ2 bNMQ vHGQ tDP nDP tDPC "
                  "enable_tier2_consensus_format_tags").split()


DRIVER_TMPL = r"""
// record-quality oracle driver — GENERATED by tools/record_oracle.py.
// The EXTRACTED_* blocks are cut from the reference main.hpp at build
// time; everything else is original harness code.
#include "bcf_formats.step1.hpp"
#include "CmdLineArgs.hpp"
#include "common.hpp"
#include "main_conversion.hpp"

#include <iostream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

%(extracted)s

// --- mock of the per-position VQ tag sets read by fill_symbol_VQ_fmts
// (symbol_to_VQ_format_tag_sets.getByPos(refpos)[symbol][VQ_tag]) ---
struct MockVQSets {
    std::array<std::array<int64_t, 64>, 16> v {};
    const std::array<std::array<int64_t, 64>, 16> &
    getByPos(uvc1_refgpos_t) const { return v; }
};

// --- mock of Symbol2CountCoverageSet: the calc functions only read
// .seg_format_prep_sets.getByPos(refpos) (main.hpp:4288,4931) ---
struct MockPrepSets {
    SegFormatPrepSet prep = SegFormatPrepSet();
    const SegFormatPrepSet & getByPos(uvc1_refgpos_t) const { return prep; }
};
struct MockS2CCS {
    MockPrepSets seg_format_prep_sets;
};

// --- emission-layer harness (round 5): a mock bcf1_to_string (the real
// one calls htslib vcf_format on the tumor record; the oracle is handed
// the already-extracted tumor FORMAT payload over the protocol) and a
// VERSION_DETAIL stand-in (the reference's comes from Makefile -D flags)
static std::string g_tumor_fmt_payload;
static std::string
bcf1_to_string(const bcf_hdr_t *, const bcf1_t *) {
    return g_tumor_fmt_payload;
}
static const char *VERSION_DETAIL = "oracle";
struct MockBaqArr {
    uvc1_qual_t getByPos(uvc1_refgpos_t) const { return 0; }
};

%(extracted_emit)s

// --- main.cpp glue, sliced verbatim at build time ---
// cVQ1M/cVQ2M consensus-allele ranking (main.cpp:1000-1015)
static void
cvqm_rank(std::vector<std::tuple<bcfrec::BcfFormat, TumorKeyInfo>> & fmt_tki_tup_vec,
          std::vector<std::tuple<uvc1_qual_t, uvc1_qual_t, uvc1_qual_t, AlignmentSymbol, std::string>> & maxVQ_VQ1_VQ2_symbol_indelstr_tup_vec) {
%(cvqm_block)s
}

// tumor-normal NLODQ composition (main.cpp:1104-1147)
template <class TTup>
static std::pair<uvc1_qual_t, int>
tn_nlodq_compose(
        const CommandLineArgs & paramset,
        const TTup & nlodq_fmtptr1_fmtptr2_tup,
        const TumorKeyInfo & tki,
        const AlignmentSymbol symbol,
        bcfrec::BcfFormat & fmt,
        uvc1_qual_t nlodq,
        const uvc1_qual_t germ_phred,
        const uvc1_qual_t nlodq_singlesite,
        const uvc1_qual_t nlodq_singlesample) {
    AlignmentSymbol argmin_nlodq_symbol = END_ALIGNMENT_SYMBOLS;
%(tnjoin_block)s
    return std::make_pair(nlodq, (int)argmin_nlodq_symbol);
}

// --- value encoding: %%XX escape for , ; = %% space and control bytes ---
static std::string esc(const std::string & s) {
    static const char *hex = "0123456789ABCDEF";
    std::string o;
    for (unsigned char c : s) {
        if (c <= 0x20 || c == ',' || c == ';' || c == '=' || c == '%%'
                || c >= 0x7f) {
            o += '%%'; o += hex[c >> 4]; o += hex[c & 15];
        } else {
            o += (char)c;
        }
    }
    return o;
}
static std::string unesc(const std::string & s) {
    std::string o;
    for (size_t i = 0; i < s.size(); i++) {
        if (s[i] == '%%' && i + 2 < s.size()) {
            o += (char)std::stoi(s.substr(i + 1, 2), nullptr, 16);
            i += 2;
        } else {
            o += s[i];
        }
    }
    return o;
}
static std::vector<std::string> split(const std::string & s, char sep) {
    std::vector<std::string> o;
    if (s.empty()) { return o; }
    std::string cur;
    for (char c : s) {
        if (c == sep) { o.push_back(cur); cur.clear(); }
        else { cur += c; }
    }
    o.push_back(cur);
    return o;
}

// --- print helpers ---
static void pv1(std::ostream & os, const std::string & v) { os << esc(v); }
static void pv1(std::ostream & os, double v) {
    char b[64]; snprintf(b, sizeof(b), "%%.17g", v); os << b;
}
static void pv1(std::ostream & os, float v) { pv1(os, (double)v); }
static void pv1(std::ostream & os, bool v) { os << (v ? 1 : 0); }
template <class T> static void pv1(std::ostream & os, T v) {
    os << (long long)v;
}
template <class T, size_t N>
static void pv(std::ostream & os, const std::array<T, N> & a) {
    for (size_t i = 0; i < N; i++) { if (i) os << ','; pv1(os, a[i]); }
}
template <class T>
static void pv(std::ostream & os, const std::vector<T> & a) {
    for (size_t i = 0; i < a.size(); i++) { if (i) os << ','; pv1(os, a[i]); }
}
template <class T> static void pv(std::ostream & os, const T & v) {
    pv1(os, v);
}

// --- assign helpers ---
static void av1(std::string & dst, const std::string & v) { dst = unesc(v); }
static void av1(double & dst, const std::string & v) { dst = strtod(v.c_str(), 0); }
static void av1(float & dst, const std::string & v) { dst = (float)strtod(v.c_str(), 0); }
static void av1(bool & dst, const std::string & v) { dst = (bool)strtoll(v.c_str(), 0, 10); }
template <class T> static void av1(T & dst, const std::string & v) {
    dst = (T)strtoll(v.c_str(), 0, 10);
}
template <class T, size_t N>
static void av(std::array<T, N> & a, const std::vector<std::string> & vs) {
    for (size_t i = 0; i < N && i < vs.size(); i++) { av1(a[i], vs[i]); }
}
template <class T>
static void av(std::vector<T> & a, const std::vector<std::string> & vs) {
    a.clear(); a.resize(vs.size());
    for (size_t i = 0; i < vs.size(); i++) { av1(a[i], vs[i]); }
}
template <class T> static void av(T & dst, const std::vector<std::string> & vs) {
    if (!vs.empty()) { av1(dst, vs[0]); }
}

// --- generated field tables ---
static bool set_fmt_field(bcfrec::BcfFormat & fmt, const std::string & k,
                          const std::vector<std::string> & vs) {
%(fmt_setters)s
    return false;
}
static void print_fmt(const bcfrec::BcfFormat & fmt, std::ostream & os) {
%(fmt_printers)s
}
// symbol_init pushes one element into every per-allele vector before the
// calc functions run (main.hpp:4094-4251); mirror that precondition
static void ensure_fmt_nonempty(bcfrec::BcfFormat & fmt) {
%(fmt_ensures)s
}
static bool set_ps_field(CommandLineArgs & ps, const std::string & k,
                         const std::string & v) {
%(ps_setters)s
    return false;
}
static bool set_prep_field(SegFormatPrepSet & p, const std::string & k,
                           const std::string & v) {
%(prep_setters)s
    return false;
}
static bool set_rtr_field(RegionalTandemRepeat & r, const std::string & k,
                          const std::string & v) {
%(rtr_setters)s
    return false;
}
static bool set_tki_field(TumorKeyInfo & t, const std::string & k,
                          const std::string & v) {
%(tki_setters)s
    if (k == "ref_alt") { t.ref_alt = unesc(v); return true; }
    if (k == "tADR") { av(t.tADR, split(v, ',')); return true; }
    if (k == "nADR") { av(t.nADR, split(v, ',')); return true; }
    if (k == "tADCR") { av(t.tADCR, split(v, ',')); return true; }
    if (k == "nADCR") { av(t.nADCR, split(v, ',')); return true; }
    return false;
}

int main() {
    bcfrec::BcfFormat fmt;
    MockVQSets vqsets;
    std::vector<bcfrec::BcfFormat> gfmts;
    std::vector<int> gsyms;
    CommandLineArgs ps;
    MockS2CCS s2ccs;
    RegionalTandemRepeat rtr1, rtr2;
    TumorKeyInfo tki;
    std::vector<RegionalTandemRepeat> repeatvec;
    std::vector<std::tuple<uvc1_qual_t, uvc1_qual_t, uvc1_qual_t, AlignmentSymbol, std::string>> cvq_tup_vec;
    std::vector<std::string> contig_names;
    std::vector<uint32_t> contig_lens;
    bcfrec::BcfFormat germ_init_fmt;           // outlives the germline op:
    std::tuple<uvc1_qual_t, bcfrec::BcfFormat*, bcfrec::BcfFormat*>
        germ_tup { 0, &germ_init_fmt, &germ_init_fmt };  // tnjoin reads it
    std::string line;
    while (std::getline(std::cin, line)) {
        std::istringstream iss(line);
        std::string op;
        iss >> op;
        std::string kv;
        if (op == "reset") {
            fmt = bcfrec::BcfFormat();
            vqsets = MockVQSets();
            gfmts.clear();
            gsyms.clear();
            ps.~CommandLineArgs();          // const member blocks operator=
            new (&ps) CommandLineArgs();
            s2ccs = MockS2CCS();
            rtr1 = RegionalTandemRepeat();
            rtr2 = RegionalTandemRepeat();
            tki = TumorKeyInfo();
            repeatvec.clear();
            cvq_tup_vec.clear();
            contig_names.clear();
            contig_lens.clear();
            g_tumor_fmt_payload.clear();
            germ_init_fmt = bcfrec::BcfFormat();
            germ_tup = std::make_tuple((uvc1_qual_t)0, &germ_init_fmt,
                                       &germ_init_fmt);
        } else if (op == "ps" || op == "prep" || op == "rtr1"
                   || op == "rtr2" || op == "tki" || op == "fmt") {
            while (iss >> kv) {
                size_t eq = kv.find('=');
                if (eq == std::string::npos) { continue; }
                std::string k = kv.substr(0, eq), v = kv.substr(eq + 1);
                bool ok = false;
                if (op == "ps") { ok = set_ps_field(ps, k, v); }
                else if (op == "prep") {
                    ok = set_prep_field(s2ccs.seg_format_prep_sets.prep, k, v);
                } else if (op == "rtr1") { ok = set_rtr_field(rtr1, k, v); }
                else if (op == "rtr2") { ok = set_rtr_field(rtr2, k, v); }
                else if (op == "tki") { ok = set_tki_field(tki, k, v); }
                else { ok = set_fmt_field(fmt, k, split(v, ',')); }
                if (!ok) {
                    std::cout << "ERR unknown " << op << " field " << k
                              << "\n";
                    return 3;
                }
            }
        } else if (op == "vqset") {
            int sym; iss >> sym;
            while (iss >> kv) {
                size_t eq = kv.find('=');
                if (eq == std::string::npos) { continue; }
                const std::string k = kv.substr(0, eq);
                const int64_t val = strtoll(kv.c_str() + eq + 1, 0, 10);
                int tag = -1;
                if (k == "a2BQf") tag = VQ_a2BQf;
                else if (k == "a2BQr") tag = VQ_a2BQr;
                else if (k == "bMQ") tag = VQ_bMQ;
                else if (k == "bIAQb") tag = VQ_bIAQb;
                else if (k == "bIADb") tag = VQ_bIADb;
                else if (k == "bIDQb") tag = VQ_bIDQb;
                else if (k == "cIAQf") tag = VQ_cIAQf;
                else if (k == "cIADf") tag = VQ_cIADf;
                else if (k == "cIDQf") tag = VQ_cIDQf;
                else if (k == "cIAQr") tag = VQ_cIAQr;
                else if (k == "cIADr") tag = VQ_cIADr;
                else if (k == "cIDQr") tag = VQ_cIDQr;
                if (tag < 0) { std::cout << "ERR vq tag " << k << "\n"; return 3; }
                vqsets.v[sym][tag] = val;
            }
        } else if (op == "vqf") {
            int sym; long minabq, refpos;
            iss >> sym >> minabq >> refpos;
            ensure_fmt_nonempty(fmt);
            fill_symbol_VQ_fmts(fmt, vqsets, (uvc1_refgpos_t)refpos,
                    AlignmentSymbol(sym), (uvc1_qual_t)minabq, ps, 0);
            std::cout << "OK\n";
        } else if (op == "gfmt") {
            // append one symbol's fmt for the germline group
            int sym; iss >> sym;
            gsyms.push_back(sym);
            gfmts.push_back(bcfrec::BcfFormat());
            bcfrec::BcfFormat & gf = gfmts.back();
            while (iss >> kv) {
                size_t eq = kv.find('=');
                if (eq == std::string::npos) { continue; }
                if (!set_fmt_field(gf, kv.substr(0, eq),
                                   split(kv.substr(eq + 1), ','))) {
                    std::cout << "ERR unknown gfmt field "
                              << kv.substr(0, eq) << "\n";
                    return 3;
                }
            }
        } else if (op == "germline") {
            int refsymbol; long refpos, extbeg; std::string rs;
            iss >> refsymbol >> refpos >> extbeg >> rs;
            std::vector<std::pair<AlignmentSymbol, bcfrec::BcfFormat*>> vec;
            for (size_t i = 0; i < gfmts.size(); i++) {
                ensure_fmt_nonempty(gfmts[i]);
                vec.push_back(std::make_pair(AlignmentSymbol(gsyms[i]),
                                             &gfmts[i]));
            }
            // pad with the caller's init_fmt entries (main.cpp:1046-1055);
            // persisted so tnjoin can follow the returned fmt pointers
            germ_init_fmt = bcfrec::BcfFormat();
            ensure_fmt_nonempty(germ_init_fmt);
            clear_push(germ_init_fmt.VTI, (int32_t)END_ALIGNMENT_SYMBOLS);
            clear_push(germ_init_fmt.gVQ1, 0);
            clear_push(germ_init_fmt.CONTQ, 0);
            clear_push(germ_init_fmt.cDP12f, 0);
            clear_push(germ_init_fmt.cDP12r, 0);
            clear_push(germ_init_fmt.cDP0a, 0);
            clear_push(germ_init_fmt.cDP1v, 50);
            while (vec.size() <= 4) {
                vec.push_back(std::make_pair(END_ALIGNMENT_SYMBOLS,
                                             &germ_init_fmt));
            }
            std::string out_string;
            auto ret = output_germline(out_string, AlignmentSymbol(refsymbol),
                    vec, "chrT", unesc(rs), (uvc1_refgpos_t)refpos,
                    (uvc1_refgpos_t)extbeg, ps, 0);
            germ_tup = ret;
            std::cout << "GERM " << (long long)std::get<0>(ret) << " "
                      << esc(out_string) << "\n";
        } else if (op == "dpv") {
            double tpfa; int refsymbol; long refpos;
            iss >> tpfa >> refsymbol >> refpos;
            ensure_fmt_nonempty(fmt);
            BcfFormat_symbol_calc_DPv(fmt, rtr1, rtr2, tpfa, tki,
                    AlignmentSymbol(refsymbol), s2ccs,
                    (uvc1_refgpos_t)refpos, ps, 0);
            std::cout << "OK\n";
        } else if (op == "qual") {
            long insd, deld, ins1, del1, rnum, resc, refpos;
            int refsymbol; double tpfa; std::string ru;
            iss >> insd >> deld >> ins1 >> del1 >> ru >> rnum >> resc
                >> tpfa >> refsymbol >> refpos;
            ensure_fmt_nonempty(fmt);
            BcfFormat_symbol_calc_qual(fmt,
                    (uvc1_readnum_t)insd, (uvc1_readnum_t)deld,
                    (uvc1_readnum_t)ins1, (uvc1_readnum_t)del1,
                    unesc(ru), (uvc1_readpos_t)rnum, (bool)resc,
                    rtr1, rtr2, 0, (uvc1_refgpos_t)refpos,
                    AlignmentSymbol(refsymbol), tpfa, s2ccs, ps, 0);
            std::cout << "OK\n";
        } else if (op == "hetlodq") {
            double a1, a2, ef, pl;
            iss >> a1 >> a2 >> ef >> pl;
            std::cout << (long long)hetLODQ(a1, a2, ef, pl) << "\n";
        } else if (op == "tumorfmt") {
            std::string v; iss >> v;
            g_tumor_fmt_payload = unesc(v);
        } else if (op == "rvec") {
            long n; iss >> n;
            repeatvec.assign(n, RegionalTandemRepeat());
        } else if (op == "rvecrow") {
            long i, b, t, u, ab, at2, au;
            iss >> i >> b >> t >> u >> ab >> at2 >> au;
            RegionalTandemRepeat & r = repeatvec.at(i);
            r.begpos = b; r.tracklen = t; r.unitlen = u;
            r.anyTR_begpos = ab; r.anyTR_tracklen = at2; r.anyTR_unitlen = au;
        } else if (op == "record") {
            long refpos, region_offset, rnum, nlodq1;
            int refsym, sym, argmin, shouldref;
            std::string tname, ru, rs;
            iss >> tname >> refpos >> region_offset >> refsym >> sym
                >> nlodq1 >> argmin >> shouldref >> ru >> rnum >> rs;
            std::string out;
            MockBaqArr baq;
            // only guard the LAST()-read vectors (blanket ensure would
            // turn deliberately-empty vectors from "." into "0")
            if (fmt.gapSa.empty()) { fmt.gapSa.resize(1); }
            if (fmt.aBQ2.empty()) { fmt.aBQ2.resize(1); }
            if (fmt.bNMQ.empty()) { fmt.bNMQ.resize(1); }
            append_vcf_record(out, unesc(tname).c_str(),
                    (uvc1_refgpos_t)refpos, (uvc1_refgpos_t)region_offset,
                    unesc(rs), repeatvec, unesc(ru), (uvc1_readpos_t)rnum,
                    AlignmentSymbol(refsym), AlignmentSymbol(sym), fmt, tki,
                    (uvc1_qual_t)nlodq1, AlignmentSymbol(argmin),
                    (bool)shouldref, NULL, baq, ps, 0);
            std::cout << "REC " << esc(out) << "\n";
        } else if (op == "tnjoin") {
            int sym; long nlodq_default, germ_phred_v, nlodq_ss, nlodq_ssamp;
            iss >> sym >> nlodq_default >> germ_phred_v >> nlodq_ss
                >> nlodq_ssamp;
            auto pr = tn_nlodq_compose(ps, germ_tup, tki,
                    AlignmentSymbol(sym), fmt, (uvc1_qual_t)nlodq_default,
                    (uvc1_qual_t)germ_phred_v, (uvc1_qual_t)nlodq_ss,
                    (uvc1_qual_t)nlodq_ssamp);
            std::cout << "TNJ " << (long long)pr.first << " " << pr.second
                      << " f1vti=" << (std::get<1>(germ_tup)->VTI.empty() ? -9 : (long)std::get<1>(germ_tup)->VTI.back())
                      << " f1ad=" << (long long)collectget(std::get<1>(germ_tup)->cDP1x, 1, 50)
                      << " f1dp=" << (std::get<1>(germ_tup)->CDP1x.empty() ? -9 : (long long)std::get<1>(germ_tup)->CDP1x[0])
                      << " f2vti=" << (std::get<2>(germ_tup)->VTI.empty() ? -9 : (long)std::get<2>(germ_tup)->VTI.back())
                      << " f2ad=" << (long long)collectget(std::get<2>(germ_tup)->cDP1x, 1, 50)
                      << " f2dp=" << (std::get<2>(germ_tup)->CDP1x.empty() ? -9 : (long long)std::get<2>(germ_tup)->CDP1x[0])
                      << "\n";
        } else if (op == "cvqt") {
            long maxvq, vq1, vq2; int sym; std::string gs;
            iss >> maxvq >> vq1 >> vq2 >> sym >> gs;
            cvq_tup_vec.push_back(std::make_tuple(
                    (uvc1_qual_t)maxvq, (uvc1_qual_t)vq1, (uvc1_qual_t)vq2,
                    AlignmentSymbol(sym), unesc(gs)));
        } else if (op == "cvqm") {
            std::vector<std::tuple<bcfrec::BcfFormat, TumorKeyInfo>> tups;
            for (auto & gf : gfmts) {
                tups.push_back(std::make_tuple(gf, TumorKeyInfo()));
            }
            cvqm_rank(tups, cvq_tup_vec);
            std::ostringstream os;
            for (auto & t : tups) {
                const bcfrec::BcfFormat & g = std::get<0>(t);
                os << "cVQ1M="; pv(os, g.cVQ1M); os << ";";
                os << "cVQ2M="; pv(os, g.cVQ2M); os << ";";
                os << "cVQAM="; pv(os, g.cVQAM); os << ";";
                os << "cVQSM="; pv(os, g.cVQSM); os << "|";
            }
            cvq_tup_vec.clear();
            std::cout << "CVQ " << os.str() << "\n";
        } else if (op == "contig") {
            std::string nm; long len; iss >> nm >> len;
            contig_names.push_back(unesc(nm));
            contig_lens.push_back((uint32_t)len);
        } else if (op == "header") {
            std::string tumor_name_s;
            iss >> tumor_name_s;
            std::vector<std::string> argv_s;
            while (iss >> kv) { argv_s.push_back(unesc(kv)); }
            std::vector<const char*> argv_p;
            for (auto & s : argv_s) { argv_p.push_back(s.c_str()); }
            std::vector<const char*> names_p;
            for (auto & s : contig_names) { names_p.push_back(s.c_str()); }
            const std::string tn2 = unesc(tumor_name_s);
            std::string ret = generate_vcf_header(
                    (int)argv_p.size(), argv_p.data(),
                    (int32_t)names_p.size(), names_p.data(),
                    contig_lens.data(),
                    (tumor_name_s == "-" ? (const char *)NULL : tn2.c_str()),
                    ps);
            std::cout << "HDR " << esc(ret) << "\n";
        } else if (op == "print") {
            std::ostringstream os;
            print_fmt(fmt, os);
            std::cout << "OUT " << os.str() << "\n";
        } else {
            std::cout << "ERR unknown op " << op << "\n";
            return 2;
        }
        std::cout.flush();
    }
    return 0;
}
"""


EXTRACT_NAMES = [
    "does_fmt_imply_short_frag",     # main.hpp:170-175
    "PhredMutationTable",            # main.hpp:213-262
    "indel_len_rusize_phred",        # main.hpp:757-790
    "indel_phred",                   # main.hpp:792-801
]


def build_oracle(workdir):
    """Generate shims + bcf_formats.step1.hpp, extract the reference
    quality core, codegen the driver, compile.  Returns the binary path."""
    os.makedirs(os.path.join(workdir, "htslib"), exist_ok=True)
    with open(os.path.join(workdir, "htslib", "sam.h"), "w") as f:
        f.write(SAM_SHIM)
    with open(os.path.join(workdir, "htslib", "vcf.h"), "w") as f:
        f.write(VCF_SHIM)
    import gen_schema
    step1 = gen_schema.build_and_run_oracle(workdir)
    with open(os.path.join(workdir, "bcf_formats.step1.hpp"), "w") as f:
        f.write(step1)

    main_hpp = open(os.path.join(REF, "main.hpp")).read()
    parts = [_extract_defines(main_hpp, ["INS_N_ANCHOR_BASES", "TVN_MICRO_VQ_DELTA", "TIN_CONTAM_MICRO_VQ_DELTA"])]
    parts += [_extract_named(main_hpp, n) for n in EXTRACT_NAMES]
    # contiguous span keeps the ReductionType enum + REDUCTION_DPS consts
    # interleaved between calc_DPv and calc_qual (main.hpp:4253-5343)
    parts.append(_extract_span(main_hpp, "calc_normFA_from_rawFA_refbias",
                               "BcfFormat_symbol_calc_qual"))
    # fill_symbol_fmt + fill_symbol_VQ_fmts (main.hpp:3796-3887): the
    # per-symbol VQ-tag init layer (aBQ/aBQQ/bMQ systematic-BQ math)
    parts.append(_extract_span(main_hpp, "fill_symbol_fmt",
                               "fill_symbol_VQ_fmts"))
    # SYMBOL_TO_INDEL_N_UNITS lookup table (main.hpp:271-280)
    i0 = main_hpp.index("const uvc1_refgpos_t SYMBOL_TO_INDEL_N_UNITS")
    parts.append(main_hpp[i0:main_hpp.index("};", i0) + 2])
    # indel_get_majority + hetLODQ + compute_norm_ad + ALODQ +
    # output_germline form one contiguous block (main.hpp:5407-5775)
    parts.append(_extract_span(main_hpp, "indel_get_majority",
                               "output_germline"))
    extracted = "\n\n".join(parts)

    # --- the emission layer (round 5): generate_vcf_header, fill_tki,
    # fill_conditional_tki, calc_binom_powlaw_syserr_normv_quals{,2} and
    # append_vcf_record (main.hpp:5778-6272), plus the platform-name table
    # from common.cpp the header interpolates ---
    common_cpp = open(os.path.join(REF, "common.cpp")).read()
    emit_parts = [
        _extract_slice(common_cpp,
                       "const auto _SEQUENCING_PLATFORM_TO_NAME",
                       "_SEQUENCING_PLATFORM_TO_NAME.end());"),
        _extract_slice(main_hpp, "const bcfrec::BcfFormat FORMAT_UNCOV",
                       "bcfrec::BcfFormat();"),
        _extract_named(main_hpp, "generate_vcf_header"),
        _extract_named(main_hpp, "fill_tki"),
        _extract_named(main_hpp, "indelstring_gapSeq_gapAD_to_AD"),
        _extract_named(main_hpp, "fill_conditional_tki"),
        _extract_named(main_hpp, "calc_binom_powlaw_syserr_normv_quals"),
        _extract_named(main_hpp, "calc_binom_powlaw_syserr_normv_quals2"),
        _extract_named(main_hpp, "append_vcf_record"),
    ]
    extracted_emit = "\n\n".join(emit_parts)

    # --- main.cpp glue, sliced verbatim: the cVQ1M/cVQ2M consensus-allele
    # ranking (main.cpp:1000-1015) and the tumor-normal NLODQ composition
    # (main.cpp:1104-1147) ---
    main_cpp = open(os.path.join(REF, "main.cpp")).read()
    cvqm_block = _extract_slice(
        main_cpp, "std::sort(maxVQ_VQ1_VQ2_symbol_indelstr_tup_vec.rbegin()",
        None, brace_match_from="for (auto & fmt_tki_tup : fmt_tki_tup_vec)")
    i0 = main_cpp.index("uvc1_qual_t nlodq_inc = 999;")
    i0 = main_cpp.rindex("if (IS_PROVIDED(paramset.vcf_tumor_fname))", 0, i0)
    i1 = main_cpp.index("nlodq = nlodq_singlesample;", i0)
    i1 = main_cpp.index("}", i1) + 1
    tnjoin_block = main_cpp[i0:i1]

    global FMT_FIELDS
    fmt_fields = _parse_fmt_fields(step1)
    FMT_FIELDS = fmt_fields   # exposed for test-side feed planning
    fmt_setters, fmt_printers, fmt_ensures = [], [], []
    for name, (kind, _, _) in fmt_fields.items():
        fmt_setters.append(
            f'    if (k == "{name}") {{ av(fmt.{name}, vs); return true; }}')
        fmt_printers.append(
            f'    os << "{name}="; pv(os, fmt.{name}); os << ";";')
        if kind == "vector" and name not in ("FTS", "nAFA", "nBCFA", "nNFA"):
            # FTS/nAFA/nBCFA/nNFA are push-accumulators that START empty at
            # calc_DPv in the reference flow; the rest are per-allele
            # vectors symbol_init would have seeded with one element
            fmt_ensures.append(f'    if (fmt.{name}.empty()) '
                               f'{{ fmt.{name}.resize(1); }}')
    ps_fields = _parse_cmdline_fields()
    ps_setters = []
    for name, kind in ps_fields.items():
        if kind == "string":
            ps_setters.append(f'    if (k == "{name}") '
                              f'{{ ps.{name} = unesc(v); return true; }}')
        else:
            ps_setters.append(f'    if (k == "{name}") '
                              f'{{ av1(ps.{name}, v); return true; }}')
    prep_setters = [
        f'    if (k == "{n}") {{ av1(p.{n}, v); return true; }}'
        for n in SEGPREP_FIELDS]
    rtr_setters = [
        f'    if (k == "{n}") {{ av1(r.{n}, v); return true; }}'
        for n in RTR_FIELDS]
    tki_setters = [
        f'    if (k == "{n}") {{ av1(t.{n}, v); return true; }}'
        for n in TKI_INT_FIELDS]

    src = DRIVER_TMPL % dict(
        extracted=extracted,
        extracted_emit=extracted_emit,
        cvqm_block=cvqm_block,
        tnjoin_block=tnjoin_block,
        fmt_setters="\n".join(fmt_setters),
        fmt_printers="\n".join(fmt_printers),
        fmt_ensures="\n".join(fmt_ensures),
        ps_setters="\n".join(ps_setters),
        prep_setters="\n".join(prep_setters),
        rtr_setters="\n".join(rtr_setters),
        tki_setters="\n".join(tki_setters),
    )
    cpp = os.path.join(workdir, "record_oracle.cpp")
    with open(cpp, "w") as f:
        f.write(src)
    exe = os.path.join(workdir, "record_oracle")
    r = subprocess.run(
        ["g++", "-std=c++14", "-O1", "-fconcepts", "-I", workdir, "-I", REF,
         cpp, "-o", exe], capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError("oracle compile failed:\n" + r.stderr[-8000:])
    return exe


class Oracle:
    """Line-protocol client around the driver binary."""

    def __init__(self, exe):
        self.proc = subprocess.Popen(
            [exe], stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
            bufsize=1)

    def send(self, line):
        self.proc.stdin.write(line + "\n")
        self.proc.stdin.flush()

    def ask(self, line):
        self.send(line)
        out = self.proc.stdout.readline().rstrip("\n")
        if out.startswith("ERR"):
            raise RuntimeError(out)
        return out

    def close(self):
        try:
            self.proc.stdin.close()
            self.proc.wait(timeout=10)
        except Exception:
            self.proc.kill()


ESC_SAFE = re.compile(r"[,;=%\s\x00-\x20\x7f-\xff]")


def esc(s):
    if isinstance(s, bytes):
        s = s.decode("latin1")
    return ESC_SAFE.sub(lambda m: "%%%02X" % ord(m.group(0)), s)


def unesc(s):
    return re.sub(r"%([0-9A-Fa-f]{2})",
                  lambda m: chr(int(m.group(1), 16)), s)


def parse_out(line):
    """OUT name=v1,v2;... -> {name: [str values]}"""
    assert line.startswith("OUT ")
    out = {}
    for part in line[4:].split(";"):
        if not part:
            continue
        k, _, v = part.partition("=")
        out[k] = [unesc(x) for x in v.split(",")] if v else []
    return out


if __name__ == "__main__":
    import tempfile
    d = tempfile.mkdtemp(prefix="uvc_record_oracle_")
    exe = build_oracle(d)
    orc = Oracle(exe)
    orc.send("reset")
    orc.send("fmt VTI=1 bDPf=10 bDPr=12 BDPb=50,55 CDP1b=40,45 CDP2b=20,22")
    print(orc.ask("hetlodq 10 12 0.5 3.0"))
    print(orc.ask("dpv -1.0 0 100"))
    out = parse_out(orc.ask("print"))
    print({k: out[k] for k in ("cDP1v", "cDP1w", "cDP1x", "FTS")
           if k in out})
    orc.close()
    print("oracle OK:", exe)
