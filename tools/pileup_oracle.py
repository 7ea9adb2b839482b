"""Compile the reference's ENTIRE pileup/statistics engine into an oracle.

Extends the record-oracle technique (tools/record_oracle.py) to the part
of the call stack the round-3 verdict flagged as unverified: everything
between BAM bytes and the FEED_TAGS planes.  The whole dedup-independent
engine -- `update_seg_format_prep_sets_by_aln` (main.hpp:925-1204),
`update_seg_format_thres_from_prep_sets` (:1208-1299), `dealwith_segbias`
(:1363-1595), `updateByAln`/`updateByRead1Aln` (:1877-2330) and the full
`Symbol2CountCoverageSet::updateByRegion3Aln` orchestration incl. the BQ
consensus pass D and the FQ family/duplex tiers (:2543-3743) -- is ONE
contiguous span of main.hpp with a tiny htslib surface (bam1_t accessors,
no I/O), so it compiles against a synthetic in-memory BAM-record shim.

The driver binary speaks a line protocol on stdin:

    ps NAME=VAL ...               CommandLineArgs overrides
    region TID BEG END SEQ        reference window (SEQ = ACGTN string)
    bed PBEG PEND PFLAG BEG END FLAG NREADS    bedline pair (optional)
    read QNAME FLAG MAPQ POS CIGAR SEQ QUAL MTID MPOS ISIZE [NM] -> id=N
                                  (QUAL = phred+33 string; NM = -1 absent)
    fam DUPLEXFLAG DEDUPFLAG [UMISTR]   start a family (alns3 entry)
    frag STRAND id,id...          append one fragment to current family
    run                           updateByRegion3Aln over everything
    prep POS / thres POS          dump per-position struct fields
    info POS SYM / faminfo POS SYM
    vq POS SYM / duplex POS SYM
    fragd STRAND POS SYM / famd STRAND POS SYM
    fastq IDX                     consensus-FASTQ output string IDX
    haps KIND                     HapLink phase vectors (0=bq 1=fq 2=f2q)
    indelmap KIND STRAND IDX POS  exact-indel maps (cDP2 / c2dDP tiers)

All reference code is cut out AT BUILD TIME (nothing is checked in);
tests/test_pileup_oracle.py feeds identical synthetic reads to this
driver and to the python/native pipeline and pins every plane.
"""

import os
import re
import subprocess
import sys

REF = os.environ.get("UVC_REFERENCE_DIR", "/root/reference")
TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, TOOLS)

import record_oracle  # noqa: E402
from record_oracle import (_compile_gates, _extract_named,  # noqa: E402
                           _parse_cmdline_fields, esc, unesc)

# Synthetic in-memory BAM record: the htslib record-accessor API surface
# the extracted span touches, backed by driver-built buffers (layout
# follows the BAM spec: qname, packed cigar, 4-bit seq, qual, aux).
FULL_SAM_SHIM = r"""#ifndef HTS_SHIM_SAM_H
#define HTS_SHIM_SAM_H
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef int64_t hts_pos_t;

typedef struct {
    hts_pos_t pos;
    int32_t tid;
    uint16_t bin;
    uint8_t qual;
    uint8_t l_extranul;
    uint16_t flag;
    uint16_t l_qname;
    uint32_t n_cigar;
    int32_t l_qseq;
    int32_t mtid;
    hts_pos_t mpos;
    hts_pos_t isize;
} bam1_core_t;

typedef struct bam1_t {
    bam1_core_t core;
    uint64_t id;
    uint8_t *data;
    int l_data;
    uint32_t m_data;
} bam1_t;

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

#define BAM_FPAIRED        1
#define BAM_FPROPER_PAIR   2
#define BAM_FUNMAP         4
#define BAM_FMUNMAP        8
#define BAM_FREVERSE      16
#define BAM_FMREVERSE     32
#define BAM_FREAD1        64
#define BAM_FREAD2       128
#define BAM_FSECONDARY   256
#define BAM_FQCFAIL      512
#define BAM_FDUP        1024
#define BAM_FSUPPLEMENTARY 2048

#define bam_get_qname(b) ((char*)(b)->data)
#define bam_get_cigar(b) ((uint32_t*)((b)->data + (b)->core.l_qname))
#define bam_get_seq(b)   ((b)->data + ((b)->core.n_cigar<<2) + (b)->core.l_qname)
#define bam_get_qual(b)  ((b)->data + ((b)->core.n_cigar<<2) + (b)->core.l_qname + (((b)->core.l_qseq + 1)>>1))
#define bam_get_aux(b)   ((b)->data + ((b)->core.n_cigar<<2) + (b)->core.l_qname + (((b)->core.l_qseq + 1)>>1) + (b)->core.l_qseq)
#define bam_get_l_aux(b) ((b)->l_data - ((b)->core.n_cigar<<2) - (b)->core.l_qname - (b)->core.l_qseq - (((b)->core.l_qseq + 1)>>1))
#define bam_cigar_op(c) ((c)&0xf)
#define bam_cigar_oplen(c) ((c)>>4)
#define bam_seqi(s, i) ((s)[(i)>>1] >> ((~(i)&1)<<2) & 0xf)
#define bam_is_rev(b) (((b)->core.flag&BAM_FREVERSE) != 0)

static const char seq_nt16_str[] = "=ACMGRSVTWYHKDBN";
static const int seq_nt16_int[] = {4, 0, 1, 4, 2, 4, 4, 4, 3, 4, 4, 4,
                                   4, 4, 4, 4};

static inline hts_pos_t bam_endpos(const bam1_t *b) {
    hts_pos_t end = b->core.pos;
    const uint32_t *cig = bam_get_cigar(b);
    int found = 0;
    for (uint32_t k = 0; k < b->core.n_cigar; k++) {
        int op = bam_cigar_op(cig[k]);
        if (op == BAM_CMATCH || op == BAM_CDEL || op == BAM_CREF_SKIP
                || op == BAM_CEQUAL || op == BAM_CDIFF) {
            end += bam_cigar_oplen(cig[k]);
            found = 1;
        }
    }
    return found ? end : b->core.pos + 1;
}

static inline uint8_t *bam_aux_get(const bam1_t *b, const char tag[2]) {
    uint8_t *s = bam_get_aux((bam1_t *)b);
    uint8_t *endp = b->data + b->l_data;
    while (s + 3 < endp) {
        if (s[0] == (uint8_t)tag[0] && s[1] == (uint8_t)tag[1]) {
            return s + 2;
        }
        // only 'i' (int32) records are ever built by this driver
        if (s[2] == 'i') { s += 3 + 4; } else { break; }
    }
    return NULL;
}

static inline int64_t bam_aux2i(const uint8_t *s) {
    if (s[0] == 'i') {
        int32_t v;
        memcpy(&v, s + 1, 4);
        return v;
    }
    return 0;
}

// --- in-memory record-list iterator (replaces the BAM file walk of
// sam_itr_queryi/sam_itr_next; semantics: position-sorted records of the
// requested tid overlapping [beg, end)) ---

typedef struct samFile { int dummy; } samFile;
typedef struct hts_idx_t { int dummy; } hts_idx_t;
typedef struct hts_itr_t {
    int64_t beg, end;
    int tid;
    size_t i;
} hts_itr_t;

#ifdef __cplusplus
#include <vector>
extern std::vector<bam1_t *> *g_hts_shim_reads;

static inline hts_itr_t *sam_itr_queryi(const hts_idx_t *, int tid,
                                        int64_t beg, int64_t end) {
    hts_itr_t *it = (hts_itr_t *)calloc(1, sizeof(hts_itr_t));
    it->beg = beg; it->end = end; it->tid = tid; it->i = 0;
    return it;
}

static inline bam1_t *bam_copy1(bam1_t *dst, const bam1_t *src) {
    uint8_t *data = dst->data;
    if (dst->m_data < (uint32_t)src->l_data) {
        data = (uint8_t *)realloc(data, src->l_data);
        dst->m_data = src->l_data;
    }
    memcpy(data, src->data, src->l_data);
    dst->core = src->core;
    dst->l_data = src->l_data;
    dst->data = data;
    return dst;
}

static inline int sam_itr_next(samFile *, hts_itr_t *it, bam1_t *b) {
    while (g_hts_shim_reads && it->i < g_hts_shim_reads->size()) {
        bam1_t *src = (*g_hts_shim_reads)[it->i++];
        if (src->core.tid != it->tid) { continue; }
        if (src->core.pos >= it->end) { continue; }
        if (bam_endpos(src) <= it->beg) { continue; }
        bam_copy1(b, src);
        return 0;
    }
    return -1;
}

static inline void sam_itr_destroy(hts_itr_t *it) { free(it); }

// --- file-level surface for the SamIter scheduler oracle
// (tools/sched_oracle.py): sam_open resets a global cursor over the same
// in-memory record list; the header is driver-built ---

typedef struct bam_hdr_t {
    int32_t n_targets;
    char **target_name;
    uint32_t *target_len;
} bam_hdr_t;

extern bam_hdr_t *g_hts_shim_hdr;
extern size_t g_hts_shim_read_cursor;

static inline samFile *sam_open(const char *, const char *) {
    g_hts_shim_read_cursor = 0;
    return (samFile *)calloc(1, sizeof(samFile));
}
static inline int sam_close(samFile *fp) { free(fp); return 0; }
static inline bam_hdr_t *sam_hdr_read(samFile *) { return g_hts_shim_hdr; }
static inline void bam_hdr_destroy(bam_hdr_t *) {}
static inline hts_idx_t *sam_index_load(samFile *, const char *) {
    return (hts_idx_t *)calloc(1, sizeof(hts_idx_t));
}
static inline void hts_idx_destroy(hts_idx_t *i) { free(i); }

static inline int sam_read1(samFile *, bam_hdr_t *, bam1_t *b) {
    if (!g_hts_shim_reads
            || g_hts_shim_read_cursor >= g_hts_shim_reads->size()) {
        return -1;
    }
    bam_copy1(b, (*g_hts_shim_reads)[g_hts_shim_read_cursor++]);
    return 0;
}

// "tname:beg-end" / "tname:beg" / "tname" (1-based inclusive, htslib
// sam_itr_querys semantics) over the in-memory list
static inline hts_itr_t *sam_itr_querys(const hts_idx_t *, bam_hdr_t *h,
                                        const char *s) {
    char name[1024];
    long long beg1 = 0, end1 = 0;
    int nt = sscanf(s, "%1023[^:]:%lld-%lld", name, &beg1, &end1);
    int tid = -1;
    for (int32_t t = 0; h && t < h->n_targets; t++) {
        if (0 == strcmp(h->target_name[t], name)) { tid = t; break; }
    }
    if (tid < 0) { return NULL; }
    int64_t beg = (nt >= 2 ? beg1 - 1 : 0);
    int64_t end = (nt >= 3 ? end1
                           : (nt == 2 ? beg1 : (int64_t)h->target_len[tid]));
    return sam_itr_queryi(NULL, tid, beg, end);
}

static inline bam1_t *bam_init1(void) {
    return (bam1_t *)calloc(1, sizeof(bam1_t));
}

static inline void bam_destroy1(bam1_t *b) {
    if (b) { free(b->data); free(b); }
}

static inline bam1_t *bam_dup1(const bam1_t *src) {
    bam1_t *b = bam_init1();
    return bam_copy1(b, src);
}
#endif

static const unsigned char seq_nt16_table[256] = {
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
     1, 2, 4, 8, 15,15,15,15, 15,15,15,15, 15, 0,15,15,
    15, 1,14, 2, 13,15,15, 4, 11,15,15,12, 15, 3,15,15,
    15,15, 5, 6,  8, 8, 7, 9, 15,10,15,15, 15,15,15,15,
    15, 1,14, 2, 13,15,15, 4, 11,15,15,12, 15, 3,15,15,
    15,15, 5, 6,  8, 8, 7, 9, 15,10,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15
};

#endif
"""

HTS_SHIM = """#ifndef HTS_SHIM_HTS_H
#define HTS_SHIM_HTS_H
#endif
"""


def _parse_struct_fields(src, struct_name):
    """Ordered scalar field names of a struct in main_conversion.hpp,
    honoring the COMPILATION_* #if gates."""
    gates = _compile_gates()
    body = src.split("struct " + struct_name + " {", 1)[1]
    body = body.split("\n};", 1)[0]
    names = []
    skip = 0
    for line in body.splitlines():
        stripped = line.strip()
        if stripped.startswith("#if"):
            m = re.match(r"#if\s+(\w+)", stripped)
            gated_off = m and not gates.get(m.group(1), 1)
            if skip or gated_off:
                skip += 1
            continue
        if stripped.startswith("#endif"):
            skip = max(0, skip - 1)
            continue
        if skip:
            continue
        m = re.match(r"\s*(?:std::array<[^;]*>|uvc1_\w+|int\d*_t|int|bool|"
                     r"float|double)\s+(\w+)\s*[;=]", line.split("//")[0])
        if m:
            names.append(m.group(1))
    assert names, f"no fields parsed for {struct_name}"
    return names


def _parse_enum(src, enum_name):
    body = src.split("enum " + enum_name + " {", 1)[1].split("};", 1)[0]
    names = []
    for line in body.splitlines():
        line = line.split("//")[0].strip().rstrip(",")
        m = re.match(r"^([A-Za-z_]\w*)$", line)
        if m and not m.group(1).endswith("_END"):
            names.append(m.group(1))
    return names


def parse_set_enums():
    src = open(os.path.join(REF, "main_conversion.hpp")).read()
    return {
        "frag": _parse_enum(src, "FragFormatDepthSet"),
        "fam": _parse_enum(src, "FamFormatDepthSet"),
        "duplex": _parse_enum(src, "DuplexFormatDepthSet"),
        "vq": _parse_enum(src, "VQFormatTagSet"),
    }


def parse_struct_field_names():
    src = open(os.path.join(REF, "main_conversion.hpp")).read()
    return {
        "prep": _parse_struct_fields(src, "SegFormatPrepSet"),
        "thres": _parse_struct_fields(src, "SegFormatThresSet"),
        "info": _parse_struct_fields(src, "SegFormatInfoSet"),
        "faminfo": _parse_struct_fields(src, "FamFormatInfoSet"),
    }


DRIVER_TMPL = r"""
// pileup/statistics-engine oracle driver -- GENERATED by
// tools/pileup_oracle.py.  The EXTRACTED block is the contiguous
// main.hpp span HapLink..Symbol2CountCoverageSet cut from the reference
// at build time; everything else is original harness code.
#include "bcf_formats.step1.hpp"
#include "CmdLineArgs.hpp"
#include "common.hpp"
#include "logging.hpp"
#include "main_consensus.hpp"
#include "main_conversion.hpp"
#include "Hash.hpp"
#include "MolecularID.hpp"
#include "htslib/sam.h"

std::vector<bam1_t *> *g_hts_shim_reads = nullptr;

#include <iostream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

%(bedline)s

%(grouping)s

%(extracted)s

// ---- harness ----

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

static bool set_ps_field(CommandLineArgs & ps, const std::string & k,
                         const std::string & v) {
%(ps_setters)s
    return false;
}

// mock for the (dead in this driver: no tumor VCF is ever provided)
// tumor-column re-emission path of the sliced MGVCF/AIC blocks
static std::string bcf1_to_string(const bcf_hdr_t *, const bcf1_t *) {
    return std::string();
}

%(are_depths_diff)s

static bam1_t * make_read(const std::string & qname_in, uint16_t flag,
                          uint8_t mapq, int32_t tid,
                          int64_t pos, const std::string & cigar,
                          const std::string & seq, const std::string & qual,
                          int32_t mtid, int64_t mpos, int64_t isize,
                          long nm) {
    // parse cigar
    std::vector<uint32_t> cig;
    size_t i = 0;
    while (i < cigar.size() && cigar != "*") {
        uint32_t len = 0;
        while (i < cigar.size() && isdigit(cigar[i])) {
            len = len * 10 + (cigar[i] - '0');
            i++;
        }
        static const std::string ops = "MIDNSHP=XB";
        uint32_t op = ops.find(cigar[i]);
        i++;
        cig.push_back((len << 4) | op);
    }
    const char *qname = qname_in.c_str();
    int l_qname_raw = strlen(qname) + 1;
    int l_extranul = (4 - (l_qname_raw %% 4)) %% 4;
    int l_qname = l_qname_raw + l_extranul;
    int l_qseq = (int)seq.size();
    int l_aux = (nm >= 0) ? 7 : 0;
    int l_data = l_qname + 4 * (int)cig.size() + (l_qseq + 1) / 2 + l_qseq
        + l_aux;
    bam1_t *b = (bam1_t *)calloc(1, sizeof(bam1_t));
    b->data = (uint8_t *)calloc(1, l_data);
    b->l_data = l_data;
    b->m_data = l_data;
    b->core.pos = pos;
    b->core.tid = tid;
    b->core.qual = mapq;
    b->core.l_extranul = l_extranul;
    b->core.flag = flag;
    b->core.l_qname = l_qname;
    b->core.n_cigar = cig.size();
    b->core.l_qseq = l_qseq;
    b->core.mtid = mtid;
    b->core.mpos = mpos;
    b->core.isize = isize;
    memcpy(b->data, qname, l_qname_raw);
    memcpy(b->data + l_qname, cig.data(), 4 * cig.size());
    uint8_t *sp = bam_get_seq(b);
    for (int k = 0; k < l_qseq; k++) {
        int nt16;
        switch (seq[k]) {
            case 'A': case 'a': nt16 = 1; break;
            case 'C': case 'c': nt16 = 2; break;
            case 'G': case 'g': nt16 = 4; break;
            case 'T': case 't': nt16 = 8; break;
            default: nt16 = 15; break;
        }
        sp[k >> 1] |= nt16 << ((~k & 1) << 2);
    }
    uint8_t *qp = bam_get_qual(b);
    for (int k = 0; k < l_qseq; k++) {
        qp[k] = (uint8_t)(qual[k] - 33);
    }
    if (nm >= 0) {
        uint8_t *ap = bam_get_aux(b);
        ap[0] = 'N'; ap[1] = 'M'; ap[2] = 'i';
        int32_t v = (int32_t)nm;
        memcpy(ap + 3, &v, 4);
    }
    return b;
}

template <class T> static void dump_fields(
        std::ostream & os, const T & s,
        void (*pr)(std::ostream &, const T &));

int main() {
    CommandLineArgs ps;
    std::string refstring;
    int32_t r_tid = 0;
    int64_t r_beg = 0, r_end = 0;
    BedLine prev_bedline(-1, 0, 0, 0, 0);
    BedLine bedline(-1, 0, 0, 0, 0);
    bool bed_set = false;
    std::vector<bam1_t *> reads;
    std::vector<std::pair<std::array<std::vector<std::vector<bam1_t *>>, 2>,
                          MolecularBarcode>> alns3;
    Symbol2CountCoverageSet *s2ccs = nullptr;
    std::vector<RegionalTandemRepeat> saved_repeatvec;
    std::vector<uvc1_qual_t> saved_baq1, saved_baq2;
    std::array<std::string, NUM_FQLIKE_CON_OUT_FILES> fqdata3;
    std::vector<HapLink> haps_bq, haps_fq, haps_f2q;

    std::string line;
    while (std::getline(std::cin, line)) {
        std::istringstream iss(line);
        std::string op;
        iss >> op;
        if (op == "ps") {
            std::string kv;
            while (iss >> kv) {
                size_t eq = kv.find('=');
                if (eq == std::string::npos) { continue; }
                if (!set_ps_field(ps, kv.substr(0, eq),
                                  unesc(kv.substr(eq + 1)))) {
                    std::cout << "err unknown ps field "
                              << kv.substr(0, eq) << std::endl;
                }
            }
            std::cout << "ok" << std::endl;
        } else if (op == "region") {
            iss >> r_tid >> r_beg >> r_end >> refstring;
            std::cout << "ok" << std::endl;
        } else if (op == "bed") {
            int64_t pb, pe, be, en;
            long pf, fl, nr;
            iss >> pb >> pe >> pf >> be >> en >> fl >> nr;
            prev_bedline = BedLine(r_tid, pb, pe, pf, 0);
            bedline = BedLine(r_tid, be, en, fl, nr);
            bed_set = true;
            std::cout << "ok" << std::endl;
        } else if (op == "read") {
            long flag, mapq, mtid, nm = -1;
            int64_t pos, mpos, isize;
            std::string qn, cigar, seq, qual;
            iss >> qn >> flag >> mapq >> pos >> cigar >> seq >> qual >> mtid
                >> mpos >> isize >> nm;
            reads.push_back(make_read(unesc(qn), flag, mapq, r_tid, pos,
                                      cigar, unesc(seq), unesc(qual), mtid,
                                      mpos, isize, nm));
            std::cout << "id=" << (reads.size() - 1) << std::endl;
        } else if (op == "fam") {
            long duplexflag = 0, dedupflag = 0;
            std::string umi;
            iss >> duplexflag >> dedupflag >> umi;
            MolecularBarcode mb;
            mb.duplexflag = duplexflag;
            mb.dedup_idflag = dedupflag;
            mb.umistring = unesc(umi);
            alns3.push_back(std::make_pair(
                std::array<std::vector<std::vector<bam1_t *>>, 2>(), mb));
            std::cout << "ok" << std::endl;
        } else if (op == "frag") {
            long strand;
            std::string ids;
            iss >> strand >> ids;
            std::vector<bam1_t *> alns1;
            std::istringstream ids_ss(ids);
            std::string tok;
            while (std::getline(ids_ss, tok, ',')) {
                alns1.push_back(reads.at(std::stol(tok)));
            }
            alns3.back().first[strand].push_back(alns1);
            std::cout << "ok" << std::endl;
        } else if (op == "run") {
            std::vector<RegionalTandemRepeat> region_repeatvec =
                refstring2repeatvec(
                    refstring,
                    ps.indel_str_repeatsize_max,
                    ps.indel_vntr_repeatsize_max,
                    ps.indel_BQ_max,
                    ps.indel_polymerase_slip_rate,
                    ps.indel_del_to_ins_err_ratio,
                    0);
            const auto & baq_offsetarr = region_repeatvec_to_baq_offsetarr(
                region_repeatvec, r_tid, r_beg, r_end + 1, ps);
            const auto & baq_offsetarr2 =
                region_repeatvec_to_baq_offsetarr<true>(
                    region_repeatvec, r_tid, r_beg, r_end + 1, ps);
            saved_repeatvec = region_repeatvec;
            saved_baq1.clear(); saved_baq2.clear();
            for (auto p2 = baq_offsetarr.getIncluBegPosition();
                    p2 < baq_offsetarr.getExcluEndPosition(); p2++) {
                saved_baq1.push_back(baq_offsetarr.getByPos(p2));
                saved_baq2.push_back(baq_offsetarr2.getByPos(p2));
            }
            delete s2ccs;
            s2ccs = new Symbol2CountCoverageSet(r_tid, r_beg, r_end + 1);
            if (!bed_set) {
                bedline = BedLine(r_tid, r_beg, r_end, 0, 0);
            }
            haps_bq.clear(); haps_fq.clear(); haps_f2q.clear();
            for (auto & s : fqdata3) { s.clear(); }
            s2ccs->updateByRegion3Aln(
                fqdata3,
                haps_bq, haps_fq, haps_f2q,
                alns3,
                refstring,
                region_repeatvec,
                baq_offsetarr,
                baq_offsetarr2,
                prev_bedline,
                bedline,
                ps,
                0);
            std::cout << "ok" << std::endl;
        } else if (op == "group") {
            // run the reference's own dedup/family grouping over the
            // loaded reads (replaces the fam/frag commands); alns3 is
            // rebuilt and RAW quals get apply_bq_err_correction3 applied
            // inside fill_strand_umi_readset (grouping.cpp:546-566)
            int64_t tbeg, tend;
            long end2end = 0;
            iss >> tbeg >> tend >> end2end;
            g_hts_shim_reads = &reads;
            std::map<MolecularBarcode,
                     std::pair<std::array<std::map<uvc1_hash_t,
                                                   std::vector<bam1_t *>>,
                                          2>,
                               MolecularBarcode>> umi_to_strand_to_reads;
            uvc1_refgpos_t ext_beg = 0, ext_end = 0;
            auto cnts = bamfname_to_strand_to_familyuid_to_reads(
                umi_to_strand_to_reads, ext_beg, ext_end, r_tid,
                (uvc1_refgpos_t)tbeg, (uvc1_refgpos_t)tend,
                (bool)end2end, 0, 1, std::string(""), nullptr, nullptr, 0,
                ps, 0);
            alns3.clear();
            fill_strand_umi_readset_with_strand_to_umi_to_reads(
                alns3, umi_to_strand_to_reads, ps, 0);
            std::cout << "ok " << cnts[0] << " " << cnts[1] << " "
                      << cnts[2] << " " << ext_beg << " " << ext_end
                      << std::endl;
        } else if (op == "families") {
            // dump the alns3 structure: per family, flags + per-strand
            // fragments as qname lists
            std::ostringstream os;
            for (const auto & fam : alns3) {
                os << fam.second.duplexflag << "/" << fam.second.dedup_idflag
                   << "/" << esc(fam.second.umistring) << ":";
                for (int strand = 0; strand < 2; strand++) {
                    if (strand) { os << "|"; }
                    for (const auto & alns1 : fam.first[strand]) {
                        os << "[";
                        for (size_t a = 0; a < alns1.size(); a++) {
                            if (a) { os << ","; }
                            os << bam_get_qname(alns1[a]);
                        }
                        os << "]";
                    }
                }
                os << ";";
            }
            std::cout << os.str() << std::endl;
        } else if (op == "clear") {
            for (bam1_t *b : reads) { free(b->data); free(b); }
            reads.clear();
            alns3.clear();
            bed_set = false;
            std::cout << "ok" << std::endl;
        } else if (op == "baq") {
            // baq offsets + repeat-track fields at region-relative POS
            int64_t pos;
            iss >> pos;
            const auto & rt = saved_repeatvec.at(pos);
            std::cout << "baq1=" << saved_baq1.at(pos)
                      << " baq2=" << saved_baq2.at(pos)
                      << " begpos=" << rt.begpos
                      << " tracklen=" << rt.tracklen
                      << " unitlen=" << rt.unitlen
                      << " indelphred=" << rt.indelphred
                      << " anyTR_begpos=" << rt.anyTR_begpos
                      << " anyTR_tracklen=" << rt.anyTR_tracklen
                      << " anyTR_unitlen=" << rt.anyTR_unitlen << std::endl;
        } else if (op == "prep") {
            int64_t pos;
            iss >> pos;
            const SegFormatPrepSet & p =
                s2ccs->seg_format_prep_sets.getByPos(pos);
            std::ostringstream os;
%(prep_printers)s
            std::cout << os.str() << std::endl;
        } else if (op == "thres") {
            int64_t pos;
            iss >> pos;
            const SegFormatThresSet & p =
                s2ccs->seg_format_thres_sets.getByPos(pos);
            std::ostringstream os;
%(thres_printers)s
            std::cout << os.str() << std::endl;
        } else if (op == "info") {
            int64_t pos; int sym;
            iss >> pos >> sym;
            const SegFormatInfoSet & p =
                s2ccs->symbol_to_seg_format_info_sets.getByPos(pos)[sym];
            std::ostringstream os;
%(info_printers)s
            std::cout << os.str() << std::endl;
        } else if (op == "faminfo") {
            int64_t pos; int sym;
            iss >> pos >> sym;
            const FamFormatInfoSet & p =
                s2ccs->symbol_to_fam_format_info_sets.getByPos(pos)[sym];
            std::ostringstream os;
%(faminfo_printers)s
            std::cout << os.str() << std::endl;
        } else if (op == "vq" || op == "duplex") {
            int64_t pos; int sym;
            iss >> pos >> sym;
            std::ostringstream os;
            if (op == "vq") {
                const auto & a =
                    s2ccs->symbol_to_VQ_format_tag_sets.getByPos(pos)[sym];
                for (size_t k = 0; k < a.size(); k++) {
                    if (k) { os << ','; }
                    os << a[k];
                }
            } else {
                const auto & a = s2ccs->symbol_to_duplex_format_depth_sets
                    .getByPos(pos)[sym];
                for (size_t k = 0; k < a.size(); k++) {
                    if (k) { os << ','; }
                    os << a[k];
                }
            }
            std::cout << os.str() << std::endl;
        } else if (op == "fragd" || op == "famd") {
            long strand; int64_t pos; int sym;
            iss >> strand >> pos >> sym;
            std::ostringstream os;
            if (op == "fragd") {
                const auto & a = s2ccs->symbol_to_frag_format_depth_sets
                    [strand].getByPos(pos)[sym];
                for (size_t k = 0; k < a.size(); k++) {
                    if (k) { os << ','; }
                    os << a[k];
                }
            } else {
                const auto & a = s2ccs->symbol_to_fam_format_depth_sets_2strand
                    [strand].getByPos(pos)[sym];
                for (size_t k = 0; k < a.size(); k++) {
                    if (k) { os << ','; }
                    os << a[k];
                }
            }
            std::cout << os.str() << std::endl;
        } else if (op == "fragiseq" || op == "fragdlen"
                   || op == "famiseq" || op == "famdlen") {
            // per-(strand, symbol, pos) exact-indel maps of the frag /
            // fam depth sets (PosToIseqToData / PosToDlenToData)
            long strand; int sym; int64_t pos;
            iss >> strand >> sym >> pos;
            std::ostringstream os;
            if (op == "fragiseq" || op == "famiseq") {
                const auto & m = (op[2] == 'a'
                    ? s2ccs->symbol_to_frag_format_depth_sets[strand]
                        .getPosToIseqToData((AlignmentSymbol)sym)
                    : s2ccs->symbol_to_fam_format_depth_sets_2strand[strand]
                        .getPosToIseqToData((AlignmentSymbol)sym));
                auto it = m.find(pos);
                if (it != m.end()) {
                    for (const auto & kv : it->second) {
                        os << esc(kv.first) << ':' << kv.second << ';';
                    }
                }
            } else {
                const auto & m = (op[2] == 'a'
                    ? s2ccs->symbol_to_frag_format_depth_sets[strand]
                        .getPosToDlenToData((AlignmentSymbol)sym)
                    : s2ccs->symbol_to_fam_format_depth_sets_2strand[strand]
                        .getPosToDlenToData((AlignmentSymbol)sym));
                auto it = m.find(pos);
                if (it != m.end()) {
                    for (const auto & kv : it->second) {
                        os << kv.first << ':' << kv.second << ';';
                    }
                }
            }
            std::cout << os.str() << std::endl;
        } else if (op == "fastq") {
            int idx;
            iss >> idx;
            std::cout << esc(fqdata3.at(idx)) << std::endl;
        } else if (op == "haps") {
            int kind;
            iss >> kind;
            const std::vector<HapLink> & hv =
                (kind == 0 ? haps_bq : (kind == 1 ? haps_fq : haps_f2q));
            std::ostringstream os;
            for (const HapLink & h : hv) {
                for (const auto & ps2 : h.pos_symb_string) {
                    os << ps2.first << '.' << (int)ps2.second << '_';
                }
                os << '=' << h.fr_cnts[0] << ',' << h.fr_cnts[1]
                   << ',' << h.other_hap_cnts[0] << ','
                   << h.other_hap_cnts[1] << ';';
            }
            std::cout << os.str() << std::endl;
        } else if (op == "indelmap") {
            // KIND: 0=pos2dlen2data_cDP2 1=pos2iseq2data_cDP2
            //       2=pos2dlen2data_c2dDP 3=pos2iseq2data_c2dDP
            long kind, strand, idx;
            int64_t pos;
            iss >> kind >> strand >> idx >> pos;
            std::ostringstream os;
            if (kind == 0 || kind == 2) {
                const auto & m = (kind == 0 ? s2ccs->pos2dlen2data_cDP2
                                            : s2ccs->pos2dlen2data_c2dDP)
                    [strand][idx];
                auto it = m.find(pos);
                if (it != m.end()) {
                    for (const auto & kv : it->second) {
                        os << kv.first << ':' << kv.second << ';';
                    }
                }
            } else {
                const auto & m = (kind == 1 ? s2ccs->pos2iseq2data_cDP2
                                            : s2ccs->pos2iseq2data_c2dDP)
                    [strand][idx];
                auto it = m.find(pos);
                if (it != m.end()) {
                    for (const auto & kv : it->second) {
                        os << esc(kv.first) << ':' << kv.second << ';';
                    }
                }
            }
            std::cout << os.str() << std::endl;
        } else if (op == "auxemit") {
            // MGVCF + ADDITIONAL_INDEL_CANDIDATE emission over [beg, end]
            // (main.cpp:604-644 position loop locals + the two emitter
            // blocks sliced verbatim from main.cpp:655-799)
            long beg_l, end_l, inclu_l;
            iss >> beg_l >> end_l >> inclu_l;
            auto & symbolToCountCoverageSet12 = *s2ccs;
            const CommandLineArgs & paramset = ps;
            const auto tname_tseqlen_tuple =
                std::make_tuple(std::string("chrT"), (int64_t)0);
            const uvc1_refgpos_t extended_inclu_beg_pos = r_beg;
            const uvc1_refgpos_t incluBegPosition = inclu_l;
            const int tid = r_tid;
            std::map<std::tuple<uvc1_refgpos_t, uvc1_refgpos_t,
                                AlignmentSymbol>,
                     std::vector<TumorKeyInfo>> tid_pos_symb_to_tkis;
            const bcf_hdr_t *bcf_hdr = NULL;
            std::string buf_out_string_pass;
            uvc1_readpos_t prev_tracklen = 0;
            uvc1_readpos_t curr_tracklen = 0;
            for (uvc1_refgpos_t zerobased_pos = beg_l;
                    zerobased_pos <= end_l;
                    zerobased_pos++, prev_tracklen = curr_tracklen) {
                std::string repeatunit;
                uvc1_readpos_t repeatnum = 0;
                uvc1_rp_diff_t rridx = zerobased_pos
                    - extended_inclu_beg_pos;
                indelpos_to_context(repeatunit, repeatnum, refstring, rridx,
                        paramset.indel_str_repeatsize_max);
                curr_tracklen = repeatnum
                    * UNSIGN2SIGN(repeatunit.size());
                for (const SymbolType symboltype : SYMBOL_TYPE_ARR) {
                    if (zerobased_pos == beg_l
                            && BASE_SYMBOL == symboltype) { continue; }
                    const uvc1_refgpos_t refpos =
                        (BASE_SYMBOL == symboltype ? (zerobased_pos - 1)
                                                   : zerobased_pos);
%(mgvcf_block)s
%(aic_block)s
                }
            }
            std::cout << "aux " << esc(buf_out_string_pass) << std::endl;
        } else if (op == "quit") {
            break;
        } else if (!op.empty()) {
            std::cout << "err unknown op " << op << std::endl;
        }
    }
    return 0;
}
"""


def build_oracle(workdir):
    """Generate shims + step1 header, extract the engine span, codegen the
    driver, compile.  Returns the binary path."""
    os.makedirs(os.path.join(workdir, "htslib"), exist_ok=True)
    with open(os.path.join(workdir, "htslib", "sam.h"), "w") as f:
        f.write(FULL_SAM_SHIM)
    with open(os.path.join(workdir, "htslib", "hts.h"), "w") as f:
        f.write(HTS_SHIM)
    with open(os.path.join(workdir, "htslib", "vcf.h"), "w") as f:
        f.write(record_oracle.VCF_SHIM)
    import gen_schema
    step1 = gen_schema.build_and_run_oracle(workdir)
    with open(os.path.join(workdir, "bcf_formats.step1.hpp"), "w") as f:
        f.write(step1)

    main_hpp = open(os.path.join(REF, "main.hpp")).read()
    beg = main_hpp.index("class HapLink {")
    anchor = main_hpp.index("struct Symbol2CountCoverageSet {")
    i = main_hpp.index("{", anchor)
    depth = 0
    while True:
        c = main_hpp[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                break
        i += 1
    end = main_hpp.index(";", i) + 1
    extracted = main_hpp[beg:end]

    iohts = open(os.path.join(REF, "iohts.hpp")).read()
    bedline = ("#define BED_END_TO_END_BIT 0x1\n"
               + _extract_named(iohts, "BedLine"))

    # dedup/family grouping engine (grouping.cpp:333-997): FilterReason +
    # fill_isrc_isr2_beg_end_with_aln + the BQ corrections + bam2umihash +
    # bamfname_to_strand_to_familyuid_to_reads + readset fill; the shim's
    # in-memory iterator replaces the htslib BAM walk
    grouping_cpp = open(os.path.join(REF, "grouping.cpp")).read()
    g0 = grouping_cpp.index("const uvc1_readpos_t ARRPOS_MARGIN")
    g1 = grouping_cpp.index("const uvc1_readpos_t ARRPOS_INNER_RANGE")
    g1 = grouping_cpp.index("\n", g1) + 1
    g2 = grouping_cpp.index("enum FilterReason {")
    grouping_span = ("#define logDEBUGx1 logDEBUG\n"
                     + grouping_cpp[g0:g1] + "\n"
                     + grouping_cpp[g2:])
    # the BAQ prefix-sum builder lives in main.cpp (main.cpp:400-429);
    # its CoveredRegion<> return type needs a manual slice
    main_cpp = open(os.path.join(REF, "main.cpp")).read()
    b0 = main_cpp.index("template <bool TIsAnyTandemRepeat")
    i = main_cpp.index("{", main_cpp.index(
        "region_repeatvec_to_baq_offsetarr", b0))
    depth = 0
    while True:
        c = main_cpp[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                break
        i += 1
    extracted += "\n\n" + main_cpp[b0:i + 1]

    conv = open(os.path.join(REF, "main_conversion.hpp")).read()
    structs = {
        "prep": _parse_struct_fields(conv, "SegFormatPrepSet"),
        "thres": _parse_struct_fields(conv, "SegFormatThresSet"),
        "info": _parse_struct_fields(conv, "SegFormatInfoSet"),
        "faminfo": _parse_struct_fields(conv, "FamFormatInfoSet"),
    }
    printers = {}
    for key, names in structs.items():
        printers[key + "_printers"] = "\n".join(
            f'            os << "{n}=" << (long long)p.{n} << ";";'
            for n in names)

    ps_fields = _parse_cmdline_fields()
    ps_setters = []
    for name, kind in ps_fields.items():
        if kind == "string":
            ps_setters.append(f'    if (k == "{name}") '
                              f'{{ ps.{name} = v; return true; }}')
        elif kind == "float":
            ps_setters.append(
                f'    if (k == "{name}") '
                f'{{ ps.{name} = strtod(v.c_str(), 0); return true; }}')
        else:
            # decltype cast handles the enum-typed fields (AssayType etc.)
            ps_setters.append(
                f'    if (k == "{name}") {{ ps.{name} = '
                f'(decltype(ps.{name}))strtoll(v.c_str(), 0, 10); '
                f'return true; }}')

    # the MGVCF block (main.cpp:655-757) and the
    # ADDITIONAL_INDEL_CANDIDATE block (main.cpp:759-799), sliced verbatim
    from record_oracle import _extract_slice
    mgvcf_block = _extract_slice(
        main_cpp, "if ((paramset.outvar_flag & OUTVAR_MGVCF)", None,
        brace_match_from="if ((paramset.outvar_flag & OUTVAR_MGVCF)")
    aic_block = _extract_slice(
        main_cpp, "const auto aCDP = ", None,
        brace_match_from="if ((OUTVAR_ADDITIONAL_INDEL_CANDIDATE")

    src = DRIVER_TMPL % dict(
        extracted=extracted,
        grouping=grouping_span,
        bedline=bedline,
        ps_setters="\n".join(ps_setters),
        are_depths_diff=_extract_named(main_cpp, "are_depths_diff"),
        mgvcf_block=mgvcf_block,
        aic_block=aic_block,
        **printers,
    )
    cpp = os.path.join(workdir, "pileup_oracle.cpp")
    with open(cpp, "w") as f:
        f.write(src)
    exe = os.path.join(workdir, "pileup_oracle")
    r = subprocess.run(
        ["g++", "-std=c++14", "-O1", "-fconcepts", "-I", workdir, "-I", REF,
         cpp, os.path.join(REF, "logging.cpp"),
         os.path.join(REF, "MolecularID.cpp"), "-o", exe],
        capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError("pileup oracle compile failed:\n"
                           + r.stderr[-12000:])
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
        out = self.proc.stdout.readline().rstrip("\n")
        assert not out.startswith("err "), f"oracle: {out} (for {line[:200]})"
        return out

    def close(self):
        try:
            self.send("quit")
        except Exception:
            pass
        self.proc.terminate()


def parse_kv(line):
    """'a=1;b=2;' -> {'a': 1, 'b': 2}"""
    out = {}
    for part in line.split(";"):
        if not part:
            continue
        k, _, v = part.partition("=")
        out[k] = int(v)
    return out


if __name__ == "__main__":
    import tempfile
    wd = tempfile.mkdtemp(prefix="pileup_oracle_")
    exe = build_oracle(wd)
    print("built:", exe)
