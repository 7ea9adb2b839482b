"""Compile the reference's math kernels into an in-env oracle.

main_conversion.hpp only needs two htslib headers for type declarations
(bam1_t/bcf1_t pointers and the BAM_C* cigar constants), so a 20-line shim
makes it compile with plain g++ — no htslib build required.  indel_phred /
indel_len_rusize_phred live in main.hpp; their function bodies are cut out
of the reference source at build time (never checked in here).

The resulting binary reads one query per line on stdin and prints the
reference's answers, so pytest can sweep input grids and pin the python
kernels bit-for-bit (VERDICT round-1, task 2).
"""

import os
import re
import subprocess

REF = os.environ.get("UVC_REFERENCE_DIR", "/root/reference")

SAM_SHIM = """#ifndef HTS_SHIM_SAM_H
#define HTS_SHIM_SAM_H
// minimal declarations so main_conversion.hpp parses; no htslib I/O is used
typedef struct bam1_t bam1_t;
#define bam_get_qname(b) ("")
#define BAM_CMATCH      0
#define BAM_CINS        1
#define BAM_CDEL        2
#define BAM_CREF_SKIP   3
#define BAM_CSOFT_CLIP  4
#define BAM_CHARD_CLIP  5
#define BAM_CPAD        6
#define BAM_CEQUAL      7
#define BAM_CDIFF       8
#define BAM_CBACK       9
#endif
"""

VCF_SHIM = """#ifndef HTS_SHIM_VCF_H
#define HTS_SHIM_VCF_H
typedef struct bcf1_t bcf1_t;
typedef struct bcf_hdr_t bcf_hdr_t;
#endif
"""

MAIN_CPP = r"""
#include "main_conversion.hpp"

%(indel_funcs)s

#include <sstream>
#include <string>

int main() {
    std::string line;
    while (std::getline(std::cin, line)) {
        std::istringstream iss(line);
        std::string op;
        iss >> op;
        if (op == "binom") {
            double prob, a, b;
            iss >> prob >> a >> b;
            printf("%%.17g %%.17g\n",
                   calc_binom_10log10_likeratio<false>(prob, a, b),
                   calc_binom_10log10_likeratio<true>(prob, a, b));
        } else if (op == "dp4") {
            double osf, adp, adf, dpp, dpf, pl, nats, adk, dpk, pad, pdp;
            int bidir, osf_dis;
            iss >> bidir >> osf_dis >> osf >> adp >> adf >> dpp >> dpf
                >> pl >> nats >> adk >> dpk >> pad >> pdp;
            std::array<double, 2> r;
            if (bidir && osf_dis) {
                r = dp4_to_pcFA<true, true>(osf, adp, adf, dpp, dpf, pl, nats, adk, dpk, pad, pdp);
            } else if (bidir) {
                r = dp4_to_pcFA<true, false>(osf, adp, adf, dpp, dpf, pl, nats, adk, dpk, pad, pdp);
            } else if (osf_dis) {
                r = dp4_to_pcFA<false, true>(osf, adp, adf, dpp, dpf, pl, nats, adk, dpk, pad, pdp);
            } else {
                r = dp4_to_pcFA<false, false>(osf, adp, adf, dpp, dpf, pl, nats, adk, dpk, pad, pdp);
            }
            printf("%%.17g %%.17g\n", r[0], r[1]);
        } else if (op == "imq") {
            uvc1_qual_t max_qual, dec_qual;
            uvc1_readnum_t totDP;
            std::array<uvc1_readnum_t, NUM_BUCKETS> distr;
            iss >> max_qual >> dec_qual;
            for (int i = 0; i < NUM_BUCKETS; i++) { iss >> distr[i]; }
            iss >> totDP;
            uvc1_qual_t maxvqual = 0, argmaxBQ = 0;
            uvc1_readnum_t argmaxAD = 0;
            infer_max_qual_assuming_independence(maxvqual, argmaxAD, argmaxBQ,
                    max_qual, dec_qual, distr, totDP, 0);
            printf("%%d %%d %%d\n", (int)maxvqual, (int)argmaxAD, (int)argmaxBQ);
        } else if (op == "proton") {
            long len; iss >> len;
            printf("%%d\n", (int)proton_cigarlen2phred(len));
        } else if (op == "indelphred") {
            double ampfact; long rsize, rnum;
            iss >> ampfact >> rsize >> rnum;
            printf("%%d\n", (int)indel_phred(ampfact, rsize, rnum));
        } else if (op == "rusize") {
            long ilen, rusize; iss >> ilen >> rusize;
            printf("%%d\n", (int)indel_len_rusize_phred(ilen, rusize));
        } else if (op == "nonneg") {
            double v; iss >> v;
            printf("%%.17g\n", calc_non_negative(v));
        } else if (op == "prob2phred") {
            double v; iss >> v;
            printf("%%d %%.17g\n", (int)prob2phred(v), prob2realphred(v));
        } else {
            printf("ERR unknown op\n");
            return 2;
        }
    }
    return 0;
}
"""


def _extract_functions(main_hpp_src, names):
    """Cut complete function definitions out of the reference source (build
    artifact only; brace-matched from the return-type line)."""
    out = []
    for name in names:
        m = re.search(r"^uvc1_qual_t\n" + name + r"\(", main_hpp_src,
                      re.MULTILINE)
        assert m, name
        beg = m.start()
        i = main_hpp_src.index("{", beg)
        depth = 0
        while True:
            c = main_hpp_src[i]
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        out.append(main_hpp_src[beg:i + 1])
    return "\n\n".join(out)


def build_oracle(workdir):
    """Compile the oracle binary; returns its path."""
    os.makedirs(os.path.join(workdir, "htslib"), exist_ok=True)
    with open(os.path.join(workdir, "htslib", "sam.h"), "w") as f:
        f.write(SAM_SHIM)
    with open(os.path.join(workdir, "htslib", "vcf.h"), "w") as f:
        f.write(VCF_SHIM)
    main_hpp = open(os.path.join(REF, "main.hpp")).read()
    indel_funcs = _extract_functions(
        main_hpp, ["indel_len_rusize_phred", "indel_phred"])
    with open(os.path.join(workdir, "oracle.cpp"), "w") as f:
        f.write(MAIN_CPP % {"indel_funcs": indel_funcs})
    exe = os.path.join(workdir, "math_oracle")
    subprocess.run(
        ["g++", "-std=c++14", "-O0", "-I", workdir, "-I", REF,
         os.path.join(workdir, "oracle.cpp"), "-o", exe],
        check=True, capture_output=True)
    return exe


def query(exe, lines):
    """Feed query lines, return the answer lines."""
    r = subprocess.run([exe], input="\n".join(lines) + "\n",
                       capture_output=True, text=True, check=True)
    return r.stdout.splitlines()


if __name__ == "__main__":
    import tempfile
    d = tempfile.mkdtemp()
    exe = build_oracle(d)
    print(query(exe, ["binom 0.1 90 10",
                      "dp4 1 0 1.0 10 2 100 20 3.0 6.2166 -1 -1 0.5 1.0",
                      "proton 5", "indelphred 18.0 2 10", "rusize 6 2"]))
