// rowpile: fused native kernels for the per-event row machinery.
//
// pass_c_kernel re-expresses uvc_tpu/pileup/engine_bq.pass_c_scatter
// (dealwith_segbias, main.hpp:1360-1595) as one scalar loop over events,
// replacing ~80 vectorized numpy passes over the 10M+-row event table.
// The python implementation remains the behavioral reference; parity is
// enforced by tests/test_native_rowpile.py.
//
// radix_argsort_u64 provides the LSD radix permutation used by the
// consensus sort paths.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <cstdio>
#include <ctime>
#include <vector>

// UVC_RC_TIMING=1: per-phase wall times on stderr (perf diagnosis only)
namespace rcdiag {
static int enabled() {
    static int e = -1;
    if (e < 0) { const char *v = getenv("UVC_RC_TIMING"); e = v && *v == '1'; }
    return e;
}
static double now() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}
struct Phase {
    const char *name;
    double t0;
    explicit Phase(const char *n) : name(n), t0(enabled() ? now() : 0.0) {}
    ~Phase() {
        if (enabled())
            fprintf(stderr, "[rc] %-18s %7.3f ms\n", name,
                    (now() - t0) * 1e3);
    }
};
}  // namespace rcdiag

extern "C" {

// ---------------------------------------------------------------------------

void radix_argsort_u64(const uint64_t *keys, int64_t n, int64_t *order) {
    // LSD radix over (key, index) pairs moved together for locality;
    // 16-bit digits, passes skipped when all keys share the digit.
    struct KV { uint64_t k; int64_t v; };
    std::vector<KV> a(n), b(n);
    uint64_t ormask = 0;
    for (int64_t i = 0; i < n; i++) {
        a[i].k = keys[i];
        a[i].v = i;
        ormask |= keys[i];
    }
    std::vector<int64_t> cnt(1 << 16);
    KV *src = a.data(), *dst = b.data();
    for (int pass = 0; pass < 4; pass++) {
        int shift = pass * 16;
        if (((ormask >> shift) & 0xFFFF) == 0 && pass > 0) continue;
        std::fill(cnt.begin(), cnt.end(), 0);
        for (int64_t i = 0; i < n; i++) cnt[(src[i].k >> shift) & 0xFFFF]++;
        if (n > 0 && cnt[(src[0].k >> shift) & 0xFFFF] == n) continue;
        int64_t sum = 0;
        for (int d = 0; d < (1 << 16); d++) {
            int64_t c = cnt[d];
            cnt[d] = sum;
            sum += c;
        }
        for (int64_t i = 0; i < n; i++)
            dst[cnt[(src[i].k >> shift) & 0xFFFF]++] = src[i];
        KV *t = src;
        src = dst;
        dst = t;
    }
    for (int64_t i = 0; i < n; i++) order[i] = src[i].v;
}

// ---------------------------------------------------------------------------
// pass_c: counter plane order (must match uvc_tpu/ops PASS_C_PLANES)

// int32 planes (the reference's uvc1_readnum_t/_100x_t fields are int32,
// main_conversion.hpp:645-691); the uvc1_readpos_big_t sums (aLBL/aRBL/
// aLIT/aRIT, main_conversion.hpp:675-690) plus the BQ-sum plane bg stay
// int64 in a small side tensor
enum {
    O_a2XM2, O_a2BM2, O_aPF1, O_aPF2, O_aBQ2, O_aMQs, O_aP1, O_aP2, O_aP3,
    O_aNC, O_aDPff, O_aDPfr, O_aDPrf, O_aDPrr, O_aLP1, O_aLP2, O_aLPL,
    O_aRP1, O_aRP2, O_aRPL, O_aLB1, O_aLB2, O_aRB1, O_aRB2,
    O_aLI1, O_aLI2, O_aRI1, O_aRI2, O_aRIf, O_aLIr,
    O_a1BQf, O_a1BQr, O_a2BQf, O_a2BQr,
    N_PLANES
};
enum { OB_aLBL, OB_aRBL, OB_aLIT, OB_aRIT, OB_bg, N_BIG_PLANES };

// per-read field order (int64 [n_reads, N_RF])
enum {
    RF_pos, RF_rend, RF_isrc, RF_strand, RF_isize, RF_paired, RF_flag,
    RF_mapq, RF_clipcnt, RF_fragL, RF_fragR, RF_xm1500, RF_amplicon, RF_umi,
    N_RF
};

// thres field order (int64 [P, N_TH])
enum {
    TH_aLPxT, TH_aRPxT, TH_aLP1t, TH_aLP2t, TH_aRP1t, TH_aRP2t,
    TH_aLI1t, TH_aLI1T, TH_aLI2t, TH_aLI2T,
    TH_aRI1t, TH_aRI1T, TH_aRI2t, TH_aRI2T,
    N_TH
};

// config scalar order (int64 [N_CFG])
enum {
    CF_interfering_indel, CF_primerlen2, CF_is_high_readlen, CF_baq_mul_1024,
    CF_highBAQ, CF_highBQ, CF_PFBQ1, CF_PFBQ2, CF_BAQ1, CF_BAQ2,
    CF_nobias_indel_maxlen, CF_max_insert, CF_norm_primer, N_CFG
};

static inline int64_t imin(int64_t a, int64_t b) { return a < b ? a : b; }
// memcpy with n==0 and a null numpy-empty-array pointer is UB
// (caught by the UBSan flavor); every fetch copy goes through this
static inline void copy_n(void *dst, const void *src, size_t n) {
    if (n) memcpy(dst, src, n);
}
static inline int64_t imax(int64_t a, int64_t b) { return a > b ? a : b; }
static inline int64_t iclip(int64_t v, int64_t lo, int64_t hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

int pass_c_kernel(
    int64_t n_events,
    const int64_t *e_pos, const int64_t *e_sym, const int64_t *e_val,
    const int64_t *e_read, const uint8_t *e_isgap, const int64_t *e_cigar_op,
    const int64_t *e_indel_len, const int64_t *e_dist,
    const int64_t *reads,   // [n_reads, N_RF]
    const int64_t *bm1500,  // [n_reads, 6] per-symbol mismatch density
    const int64_t *thres,   // [P, N_TH]
    const int64_t *baq, const int64_t *baq2,  // [>= P]
    const int64_t *cfg,     // [N_CFG]
    int64_t P,
    int32_t *out,           // [P, 14, N_PLANES] zeroed by caller
    int64_t *out_big        // [P, 14, N_BIG_PLANES] zeroed by caller
) {
    const int64_t NS = 14;
    // accumulate directly in the caller's [P,14,N_PLANES] buffer: one
    // event touches ONE contiguous 312-byte row instead of ~34 distant
    // planes, and the caller reads the planes as strided views -- no
    // kernel-side zeroing or transpose (the old thread_local staging
    // buffer cost ~P*14*N_PLANES*24 bytes of traffic per call)
    for (int64_t e = 0; e < n_events; e++) {
        const int64_t pos = e_pos[e];
        const int64_t sym = e_sym[e];
        const int64_t bq = e_val[e];
        const int64_t *r = reads + e_read[e] * N_RF;
        const bool isgap = e_isgap[e];
        const int64_t cigar_op = e_cigar_op[e];
        const int64_t indel_len = e_indel_len[e];
        const int64_t dist = e_dist[e];
        const int64_t idx = pos * NS + sym;
        const int64_t rpos_abs = pos;  // caller passes region-relative pos;
                                       // read coords are region-relative too
        const bool isrc = r[RF_isrc] != 0;
        const bool strand = r[RF_strand] != 0;
        const int64_t isize = r[RF_isize];
        const bool paired = r[RF_paired] != 0;
        const int64_t flag = r[RF_flag];
        const int64_t *th = thres + pos * N_TH;
        int32_t *o = out + idx * N_PLANES;
        int64_t *ob = out_big + idx * N_BIG_PLANES;

        ob[OB_bg] += bq;
        o[isrc ? O_a1BQr : O_a1BQf] += bq;
        o[isrc ? O_a2BQr : O_a2BQf] += bq * bq / 32;
        o[O_aMQs] += r[RF_mapq];
        const int q = strand ? (isrc ? O_aDPrr : O_aDPrf)
                             : (isrc ? O_aDPfr : O_aDPff);
        o[q] += 1;

        const int64_t seg_l_nbases = rpos_abs - r[RF_pos] + 1;
        const int64_t seg_r_nbases = r[RF_rend] - rpos_abs;
        o[O_aP3] += (imin(imin(dist, seg_l_nbases), seg_r_nbases)
                     >= cfg[CF_interfering_indel]);
        o[O_aNC] += (r[RF_clipcnt] == 0);

        const int64_t MAXI = cfg[CF_max_insert];
        const int64_t has_is = (isize != 0);
        const int64_t frag_l2 = has_is
            ? imin(rpos_abs - r[RF_fragL] + 1, MAXI) : MAXI;
        const int64_t frag_r2 = has_is
            ? imin(r[RF_fragR] - rpos_abs, MAXI) : MAXI;
        ob[OB_aLIT] += (((int64_t)isrc) & has_is) * frag_l2;
        ob[OB_aRIT] += ((isrc ? (int64_t)0 : (int64_t)1) & has_is) * frag_r2;

        const int64_t p_beg = iclip(r[RF_pos], 0, P - 1);
        const int64_t p_end = iclip(r[RF_rend] - 1, 0, P - 1);
        const int64_t seg_l_baq1 = baq[pos] - baq[p_beg] + 1;
        const int64_t seg_r_baq_ = baq[p_end] - baq[pos] + 1;
        const int64_t seg_r_baq1 = isgap
            ? imin(seg_r_baq_, baq2[p_end] - baq2[pos] + 7) : seg_r_baq_;
        int64_t seg_l_baq = seg_l_baq1, seg_r_baq = seg_r_baq1;
        if (!cfg[CF_is_high_readlen]) {
            seg_l_baq = imax(seg_l_baq1,
                             seg_l_nbases * cfg[CF_baq_mul_1024] / 1024);
            seg_r_baq = imax(seg_r_baq1,
                             seg_r_nbases * cfg[CF_baq_mul_1024] / 1024);
        }
        const int64_t const_LPxT = isgap ? th[TH_aLPxT]
                                         : imin(th[TH_aLPxT], th[TH_aRPxT]);
        const int64_t const_RPxT = th[TH_aRPxT];
        const int64_t ins_relax = (cigar_op == 1)
            ? imax(indel_len - cfg[CF_nobias_indel_maxlen], 0) : 0;
        const bool is_far = (seg_l_nbases + ins_relax >= const_LPxT)
                            && (seg_r_nbases >= const_RPxT);
        const int64_t thr_baq = cfg[CF_highBAQ] + (isgap ? 0 : 3);
        const bool is_unaff = (seg_l_baq >= thr_baq) && (seg_r_baq >= thr_baq);

        const bool is_amp = r[RF_amplicon] != 0;
        const bool is_umi = r[RF_umi] != 0;
        const int64_t min_d2i = paired ? imin(frag_l2, frag_r2)
                                       : (isrc ? seg_r_nbases : seg_l_nbases);
        o[O_aP1] += ((int64_t)(is_far & is_unaff))
            & (min_d2i > cfg[CF_primerlen2] || !is_amp);
        o[O_aP2] += (is_umi || !is_amp);

        const int64_t t1 = cfg[CF_PFBQ1], t2 = cfg[CF_PFBQ2];
        const int64_t pf1 = (bq < t1) ? 100 * bq * bq / (t1 * t1) : 100;
        const int64_t pf2 = (bq < t2) ? 100 * bq * bq / (t2 * t2) : 100;
        o[O_aPF1] += isgap ? imin((int64_t)100, pf1) : pf1;
        o[O_aPF2] += isgap ? imin((int64_t)100, pf2) : pf2;
        if (!isgap) {
            const int64_t xm = r[RF_xm1500];
            o[O_a2XM2] +=
                (xm > 20) ? 100 * 400 / imax(xm * xm, (int64_t)1) : 100;
            const int64_t bm = (sym < 6)
                ? bm1500[e_read[e] * 6 + sym] : 0;
            o[O_a2BM2] +=
                (bm > 20) ? 100 * 400 / imax(bm * bm, (int64_t)1) : 100;
        }

        const bool gate = isgap ? (dist >= cfg[CF_interfering_indel])
                                : (bq >= cfg[CF_highBQ]);
        const bool tier2 = isgap || (bq >= cfg[CF_highBQ]);
        {
            // branch-free: the BQ/position gates are data-dependent and
            // mispredict heavily on real pileups; unconditional masked
            // adds keep the pipeline full
            const int64_t gf = gate ? 1 : 0;
            const int64_t gp = gf & (is_far ? 1 : 0);
            const int64_t gu = gf & (is_unaff ? 1 : 0);
            const int64_t t2 = tier2 ? 1 : 0;
            o[O_aLP1] += gp & (seg_l_nbases + indel_len >= th[TH_aLP1t]);
            o[O_aLP2] += gp & t2
                & (seg_l_nbases + indel_len >= th[TH_aLP2t]);
            o[O_aRP1] += gp & (seg_r_nbases >= th[TH_aRP1t]);
            o[O_aRP2] += gp & t2 & (seg_r_nbases >= th[TH_aRP2t]);
            o[O_aLPL] += gp * seg_l_nbases;
            o[O_aRPL] += gp * seg_r_nbases;
            o[O_aLB1] += gu & (seg_l_baq >= cfg[CF_BAQ1]);
            o[O_aLB2] += gu & t2 & (seg_l_baq >= cfg[CF_BAQ2]);
            o[O_aRB1] += gu & (seg_r_baq >= cfg[CF_BAQ1]);
            o[O_aRB2] += gu & t2 & (seg_r_baq >= cfg[CF_BAQ2]);
            ob[OB_aLBL] += gu * seg_l_baq;
            ob[OB_aRBL] += gu * seg_r_baq;
            o[O_aBQ2] += gf;
        }

        const bool mate_ok = ((flag & 0x8) == 0) || ((flag & 0x1) == 0);
        const bool l_nonb = mate_ok && (seg_l_nbases > seg_r_nbases);
        const bool r_nonb = mate_ok && (seg_l_nbases < seg_r_nbases);
        const bool is_norm = (isize != 0) || !paired;
        // reference condition: (!amp) || (!is_norm_primer) || (far&&unaff);
        // with norm_primer==0 the python path reduces to (!amp)||(far&&unaff)
        const int64_t pos_good2 =
            ((!is_amp) || (is_far && is_unaff)) ? 1 : 0;
        if (isrc) {
            const int64_t d2 = frag_l2;
            const int64_t ok = ((int64_t)(d2 >= th[TH_aLI1t]))
                & (d2 <= th[TH_aLI1T] || isgap)
                & (is_norm | (isgap & l_nonb));
            const int64_t ok2 = ((int64_t)(d2 >= th[TH_aLI2t]))
                & (d2 <= th[TH_aLI2T] || isgap)
                & (is_norm | (isgap & l_nonb)) & pos_good2;
            o[O_aLI1] += ok;
            o[O_aLI2] += ok2;
            o[O_aLIr] += pos_good2;
        } else {
            const int64_t d2 = frag_r2;
            const int64_t ok = ((int64_t)(d2 >= th[TH_aRI1t]))
                & (d2 <= th[TH_aRI1T] || isgap)
                & (is_norm | (isgap & r_nonb));
            const int64_t ok2 = ((int64_t)(d2 >= th[TH_aRI2t]))
                & (d2 <= th[TH_aRI2T] || isgap)
                & (is_norm | (isgap & r_nonb)) & pos_good2;
            o[O_aRI1] += ok;
            o[O_aRI2] += ok2;
            o[O_aRIf] += pos_good2;
        }
    }
    return 0;
}

}  // extern "C"

extern "C" {

// pass_d: consensus-row scatter (engine_bq.pass_d_fragments core).
// Rows MUST be sorted by (frag, pos, st) (consensus_by_group order).
// Outputs: bdp/bta/btb [P*14*2], vq_bMQ [P*14], hist [P*14*16],
// is_mut [n] flags (for the python phase-signature pass).
int pass_d_kernel(
    int64_t n_rows,
    const int64_t *g_frag, const int64_t *g_pos, const int64_t *g_st,
    const int64_t *con_sym, const int64_t *con_cnt, const int64_t *tot,
    const int64_t *bg,        // [P*14]
    const int64_t *aDP4,      // [P*14]
    const int64_t *ref_syms,  // [P] (int64)
    const int64_t *frag_strand,  // [F]
    const int64_t *normMQ,       // [F]
    int64_t P, int64_t n_frags,
    int64_t highbq_thres, int64_t mut_window,
    int32_t *bdp, int32_t *bta, int32_t *btb,  // [P*14*2]
    int32_t *vq_bMQ,                            // [P*14]
    int32_t *hist,                              // [P*14*16]
    uint8_t *is_mut_out                         // [n_rows]
) {
    const int64_t NS = 14;
    const int NBUCKETS = 16;
    std::vector<int64_t> cov_pos;
    std::vector<int64_t> mut_pos;
    int64_t i = 0;
    while (i < n_rows) {
        const int64_t fr = g_frag[i];
        int64_t j = i;
        while (j < n_rows && g_frag[j] == fr) j++;
        const int64_t strand = frag_strand[fr];
        const int64_t mq2 = normMQ[fr] * normMQ[fr] / 32;
        cov_pos.clear();
        mut_pos.clear();
        // first sweep: per-row scatters + mutation flags + coverage set
        for (int64_t k = i; k < j; k++) {
            const int64_t pos = g_pos[k];
            const int64_t sym = con_sym[k];
            const int64_t idx = pos * NS + sym;
            const int64_t cq = con_cnt[k] * 2 - tot[k];
            const int64_t maxq = 8 + bg[idx] / imax(aDP4[idx], (int64_t)1);
            const int64_t phredlike = imin(cq, maxq);
            int64_t pb = maxq - phredlike;
            if (pb < 0) pb = 0;
            if (pb < NBUCKETS) hist[idx * NBUCKETS + pb] += 1;
            bdp[idx * 2 + strand] += 1;
            vq_bMQ[idx] += mq2;
            bool mut;
            if (g_st[k] == 0) {
                const int64_t rs = ref_syms[pos];
                mut = (rs != sym) && (rs < 4) && (sym < 4)
                      && (cq >= highbq_thres);
            } else {
                mut = (sym != 6) && (sym != 13);  // != LINK_M, != LINK_NN
            }
            is_mut_out[k] = mut ? 1 : 0;
            if (cov_pos.empty() || cov_pos.back() != pos) cov_pos.push_back(pos);
            if (mut && (mut_pos.empty() || mut_pos.back() != pos))
                mut_pos.push_back(pos);
        }
        // near-mut count over covered positions
        int64_t n_cov = (int64_t)cov_pos.size();
        int64_t n_near = 0;
        if (!mut_pos.empty()) {
            size_t mi = 0;
            for (int64_t p : cov_pos) {
                while (mi + 1 < mut_pos.size() && mut_pos[mi] < p - mut_window)
                    mi++;
                bool near = false;
                for (size_t m2 = mi; m2 < mut_pos.size()
                         && mut_pos[m2] <= p + mut_window; m2++) {
                    if (mut_pos[m2] >= p - mut_window) { near = true; break; }
                }
                if (near) n_near++;
            }
        }
        // second sweep: bTA/bTB scatters
        for (int64_t k = i; k < j; k++) {
            const int64_t idx = g_pos[k] * NS + con_sym[k];
            bta[idx * 2 + strand] += n_cov;
            btb[idx * 2 + strand] += n_near;
        }
        i = j;
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused segmented reduce (max/sum) + fillConsensusCounts
// (uvc_tpu/pileup/consensus.py; main.hpp:374-417).
//
// Protocol: rc_run() sorts + reduces + computes consensus into
// thread_local buffers and returns n_unique; rc_n_groups() gives the
// consensus row count; rc_fetch_* copy out.  Each caller thread (the
// CLI's worker thread pool) owns an independent table set; a run ->
// fetch sequence never crosses threads.

namespace rc {
struct KV { uint64_t k; int64_t v; };
// thread_local: the run -> fetch protocol is confined to one caller
// thread (the CLI's worker THREADS each own a private table set; the
// pre-round-3 design relied on forked workers for the same isolation)
static thread_local std::vector<int64_t> ug, uv;   // unique keys, vals
// consensus rows are int32: group/pos/st/sym/cnt/tot all fit, and the
// row tables are re-scanned by every downstream pass (pass-D, family
// merge, sweeps) -- half the bytes is directly less cache traffic
static thread_local std::vector<int32_t> cg, cp_, cst, ccs, ccc, ctot;
static thread_local std::vector<int64_t> ug2, uv2; // rc2 second value set
static thread_local std::vector<int32_t> c2g, c2p, c2st, c2cs, c2cc, c2tot;
static thread_local int64_t g_P = 0;
static thread_local int g_pos_bits = 0;
// grow-only scratch buffers: kept across calls so repeated large regions
// do not re-fault hundreds of MB of freshly mmapped pages every call
static thread_local std::vector<KV> kv_a, kv_b;
static thread_local std::vector<uint64_t> u_a, u_b;

static inline int bit_width_u64(uint64_t v) {
    int w = 0;
    while (v) { w++; v >>= 1; }
    return w;
}

// LSD radix over an explicit bit window [start_bit, start_bit+key_bits):
// bits below start_bit (the packed value) are never sorted -- stability
// keeps equal-key runs in input order and the reducer scans the run.
// Digit width minimizes the pass count while the histogram (<=2^16 x 8B
// = 512 KB) stays L2-resident.
static void sort_u64(uint64_t *a, uint64_t *b, int64_t n,
                     int start_bit, int key_bits) {
    if (key_bits <= 0 || n <= 1) return;
    const int npass = (key_bits + 15) / 16;
    const int BITS = (key_bits + npass - 1) / npass;
    const int NB = 1 << BITS;
    const uint64_t MASK = (uint64_t)NB - 1;
    std::vector<int64_t> cnt(NB);
    uint64_t *src = a, *dst = b;
    int swaps = 0;
    for (int pass = 0; pass < npass; pass++) {
        int shift = start_bit + pass * BITS;
        if (shift >= 64) break;
        std::fill(cnt.begin(), cnt.end(), 0);
        for (int64_t i = 0; i < n; i++) cnt[(src[i] >> shift) & MASK]++;
        if (cnt[(src[0] >> shift) & MASK] == n) continue;
        int64_t sum = 0;
        for (int d = 0; d < NB; d++) {
            int64_t c = cnt[d];
            cnt[d] = sum;
            sum += c;
        }
        for (int64_t i = 0; i < n; i++)
            dst[cnt[(src[i] >> shift) & MASK]++] = src[i];
        uint64_t *t = src; src = dst; dst = t;
        swaps++;
    }
    if (swaps % 2 == 1) std::memcpy(a, b, n * 8);
}

// consensus over unique (bit-field key, value) rows with val > 0,
// grouped by (group, pos, symboltype); appends to the out vectors
static void consensus_scan(const std::vector<int64_t> &ug,
                           const std::vector<int64_t> &uv,
                           int pos_bits, bool link_m_overridden,
                           std::vector<int32_t> &cg, std::vector<int32_t> &cp,
                           std::vector<int32_t> &cst, std::vector<int32_t> &ccs,
                           std::vector<int32_t> &ccc,
                           std::vector<int32_t> &ctot) {
    const int SYM_BITS = 4;
    const uint64_t POS_MASK = (((uint64_t)1 << pos_bits) - 1);
    const int64_t nu = (int64_t)ug.size();
    // pointer-written output (one bounds check per resize, not per row)
    cg.resize(nu); cp.resize(nu); cst.resize(nu);
    ccs.resize(nu); ccc.resize(nu); ctot.resize(nu);
    int32_t *o_g = cg.data(), *o_p = cp.data(), *o_st = cst.data();
    int32_t *o_cs = ccs.data(), *o_cc = ccc.data(), *o_tot = ctot.data();
    int64_t w = 0;
    for (int64_t i = 0; i < nu;) {
        const uint64_t key = (uint64_t)ug[i];
        const uint64_t gp = key >> SYM_BITS;   // group<<pos_bits | pos
        const int64_t sym0 = (int64_t)(key & 15);
        const int64_t st = sym0 >= 6 ? 1 : 0;
        // segment: same gp and same st
        int64_t j = i;
        int64_t tot = 0;
        int64_t best_v = -1, best_s = -1;   // non-LINK_M winner (or all)
        int64_t lm_v = 0;                    // LINK_M count (override mode)
        const bool ovr = link_m_overridden && st == 1;
        for (; j < nu; j++) {
            const uint64_t k2 = (uint64_t)ug[j];
            if ((k2 >> SYM_BITS) != gp) break;
            const int64_t s2 = (int64_t)(k2 & 15);
            if ((s2 >= 6 ? 1 : 0) != st) break;
            const int64_t v2 = uv[j];
            if (v2 <= 0) continue;
            tot += v2;
            if (ovr && s2 == 6) { lm_v = v2; continue; }  // LINK_M deferred
            if (v2 > best_v) { best_v = v2; best_s = s2; }
        }
        if (tot > 0) {
            int64_t cs, cc;
            if (best_s < 0) { cs = 6; cc = lm_v; }   // only LINK_M present
            else { cs = best_s; cc = best_v; }
            o_g[w] = (int64_t)(gp >> pos_bits);
            o_p[w] = (int64_t)(gp & POS_MASK);
            o_st[w] = st;
            o_cs[w] = cs;
            o_cc[w] = cc;
            o_tot[w] = ovr ? cc : tot;
            w++;
        }
        i = j;
    }
    cg.resize(w); cp.resize(w); cst.resize(w);
    ccs.resize(w); ccc.resize(w); ctot.resize(w);
}

static void sort_kv(KV *a, KV *b, int64_t n, int key_bits) {
    if (key_bits <= 0 || n <= 1) return;
    const int npass = (key_bits + 15) / 16;
    const int BITS = (key_bits + npass - 1) / npass;
    const int NB = 1 << BITS;
    const uint64_t MASK = (uint64_t)NB - 1;
    std::vector<int64_t> cnt(NB);
    KV *src = a, *dst = b;
    int swaps = 0;
    for (int pass = 0; pass < npass; pass++) {
        int shift = pass * BITS;
        if (shift >= 64) break;
        std::fill(cnt.begin(), cnt.end(), 0);
        for (int64_t i = 0; i < n; i++) cnt[(src[i].k >> shift) & MASK]++;
        if (cnt[(src[0].k >> shift) & MASK] == n) continue;
        int64_t sum = 0;
        for (int d = 0; d < NB; d++) {
            int64_t c = cnt[d];
            cnt[d] = sum;
            sum += c;
        }
        for (int64_t i = 0; i < n; i++)
            dst[cnt[(src[i].k >> shift) & MASK]++] = src[i];
        KV *t = src; src = dst; dst = t;
        swaps++;
    }
    if (swaps % 2 == 1) std::memcpy(a, b, n * sizeof(KV));
}
}  // namespace rc

extern "C" {

int64_t rc_run(int64_t n, const int64_t *group, const int64_t *pos,
               const int64_t *sym, const int64_t *val,
               int64_t P, int64_t mode /*0=max,1=sum*/,
               int64_t link_m_overridden) {
    // bit-field key [group | pos(pos_bits) | sym(4)] -- same sort order as
    // the arithmetic (group*P+pos)*14+sym key, but unpacking is shift/mask
    // instead of int64 div/mod (which dominated the reduce+fetch loops)
    const int VAL_BITS = 20;
    const int64_t VAL_MAX = ((int64_t)1 << VAL_BITS) - 1;
    const int SYM_BITS = 4;
    int pos_bits = rc::bit_width_u64((uint64_t)(P > 1 ? P - 1 : 1));
    rc::g_P = P;
    rc::g_pos_bits = pos_bits;
    int64_t max_g = 0, max_v = 0, min_v = 0;
    {
        rcdiag::Phase ph("rc.maxscan");
        for (int64_t i = 0; i < n; i++) {
            if (group[i] > max_g) max_g = group[i];
            if (val[i] > max_v) max_v = val[i];
            if (val[i] < min_v) min_v = val[i];
        }
    }
    const int key_bits = rc::bit_width_u64((uint64_t)max_g)
        + pos_bits + SYM_BITS;
    if (key_bits > 62) return -1;   // cannot happen for real inputs
    // packed fast path: (key << 20) | val in one u64 when the bits fit
    const bool packed = n > 0 && min_v >= 0 && max_v <= VAL_MAX
        && key_bits + VAL_BITS <= 62;
    const int GSHIFT = pos_bits + SYM_BITS;
    rc::ug.clear(); rc::uv.clear();
    rc::ug.reserve(n); rc::uv.reserve(n);
    if (packed) {
        if ((int64_t)rc::u_a.size() < n) rc::u_a.resize(n);
        if ((int64_t)rc::u_b.size() < n) rc::u_b.resize(n);
        uint64_t *rows = rc::u_a.data();
        {
            rcdiag::Phase ph("rc.pack");
            for (int64_t i = 0; i < n; i++)
                rows[i] = ((((uint64_t)group[i] << GSHIFT)
                            | ((uint64_t)pos[i] << SYM_BITS)
                            | (uint64_t)sym[i]) << VAL_BITS)
                    | (uint64_t)val[i];
        }
        {
            rcdiag::Phase ph("rc.sort");
            rc::sort_u64(rows, rc::u_b.data(), n, VAL_BITS, key_bits);
        }
        rcdiag::Phase ph("rc.reduce");
        for (int64_t i = 0; i < n;) {
            const uint64_t k = rows[i] >> VAL_BITS;
            int64_t acc = (int64_t)(rows[i] & VAL_MAX);
            int64_t j = i + 1;
            if (mode == 0) {   // value bits are unsorted: scan run for max
                for (; j < n && (rows[j] >> VAL_BITS) == k; j++) {
                    const int64_t v = (int64_t)(rows[j] & VAL_MAX);
                    if (v > acc) acc = v;
                }
            } else {
                for (; j < n && (rows[j] >> VAL_BITS) == k; j++)
                    acc += (int64_t)(rows[j] & VAL_MAX);
            }
            rc::ug.push_back((int64_t)k);
            rc::uv.push_back(acc);
            i = j;
        }
    } else {
        if ((int64_t)rc::kv_a.size() < n) rc::kv_a.resize(n);
        if ((int64_t)rc::kv_b.size() < n) rc::kv_b.resize(n);
        rc::KV *rows = rc::kv_a.data();
        for (int64_t i = 0; i < n; i++) {
            rows[i].k = ((uint64_t)group[i] << GSHIFT)
                | ((uint64_t)pos[i] << SYM_BITS) | (uint64_t)sym[i];
            rows[i].v = val[i];
        }
        rc::sort_kv(rows, rc::kv_b.data(), n, key_bits);
        for (int64_t i = 0; i < n;) {
            const uint64_t k = rows[i].k;
            int64_t acc = rows[i].v;
            int64_t j = i + 1;
            if (mode == 0) {
                for (; j < n && rows[j].k == k; j++)
                    if (rows[j].v > acc) acc = rows[j].v;
            } else {
                for (; j < n && rows[j].k == k; j++) acc += rows[j].v;
            }
            rc::ug.push_back((int64_t)k);
            rc::uv.push_back(acc);
            i = j;
        }
    }
    {
        rcdiag::Phase ph("rc.consensus");
        rc::consensus_scan(rc::ug, rc::uv, pos_bits, link_m_overridden != 0,
                           rc::cg, rc::cp_, rc::cst, rc::ccs, rc::ccc,
                           rc::ctot);
    }
    return (int64_t)rc::ug.size();
}

int64_t rc_n_groups() { return (int64_t)rc::cg.size(); }

void rc_fetch_unique(int64_t *ugroup, int64_t *upos, int64_t *usym,
                     int64_t *uval) {
    const int pos_bits = rc::g_pos_bits;
    const uint64_t POS_MASK = (((uint64_t)1 << pos_bits) - 1);
    const int64_t n = (int64_t)rc::ug.size();
    for (int64_t i = 0; i < n; i++) {
        const uint64_t k = (uint64_t)rc::ug[i];
        ugroup[i] = (int64_t)(k >> (pos_bits + 4));
        upos[i] = (int64_t)((k >> 4) & POS_MASK);
        usym[i] = (int64_t)(k & 15);
        uval[i] = rc::uv[i];
    }
}

void rc_fetch_consensus(int64_t *g, int64_t *p, int64_t *st, int64_t *cs,
                        int64_t *cc, int64_t *tot) {
    const int64_t n = (int64_t)rc::cg.size();
    for (int64_t i = 0; i < n; i++) {
        g[i] = rc::cg[i];
        p[i] = rc::cp_[i];
        st[i] = rc::cst[i];
        cs[i] = rc::ccs[i];
        cc[i] = rc::ccc[i];
        tot[i] = rc::ctot[i];
    }
}

}  // extern "C"

extern "C" {

// Read-level BQ preprocessing (grouping.cpp:459-543,
// apply_bq_err_correction3): global BQ cap/boost, 3'-tail homopolymer /
// end-clip penalty, poly-G run damping.  seq holds symbol codes 0..4
// (A,C,G,T,N); qual is mutated in place.
int bq_corr_kernel(
    int64_t n_reads, const int64_t *seq_off,
    const uint8_t *seq, uint8_t *qual,
    const int64_t *lclip, const int64_t *rclip, const uint8_t *isrc,
    int64_t bq_inc, int64_t bq_max) {
    const uint8_t G = 2;
    for (int64_t rd = 0; rd < n_reads; rd++) {
        const int64_t s0 = seq_off[rd], s1 = seq_off[rd + 1];
        const int64_t lq = s1 - s0;
        if (lq == 0) continue;
        for (int64_t i = s0; i < s1; i++) {
            int64_t q = qual[i] + bq_inc;
            qual[i] = (uint8_t)(q < bq_max ? q : bq_max);
        }
        const bool rc = isrc[rd] != 0;
        // aligned range [beg, end) and 3'-machine-end clip length
        int64_t beg, end, step, end_clip_len = 0;
        if (!rc) {
            beg = lclip[rd];
            end = lq - rclip[rd];
            step = 1;
            end_clip_len = rclip[rd];
        } else {               // scan 3'->5' in machine order = descending
            beg = lq - 1 - rclip[rd];
            end = lclip[rd] - 1;
            step = -1;
            end_clip_len = lclip[rd];
        }
        // tail scan: walk from the 3' machine end towards 5' for the 2nd
        // distinct base with q >= 20
        int64_t termpos = end - step;
        {
            int prev_b = -1, distinct = 0;
            for (; termpos != beg - step; termpos -= step) {
                const uint8_t b = seq[s0 + termpos];
                const uint8_t q = qual[s0 + termpos];
                if ((int)b != prev_b && q >= 20) {
                    prev_b = b;
                    if (++distinct == 2) break;
                }
            }
            const int64_t tracklen = (termpos - (end - step)) * (-step) >= 0
                ? ((end - step) - termpos) * step
                : 0;
            const int64_t hp = tracklen < 0 ? -tracklen : tracklen;
            int64_t tail_penal = (end_clip_len >= 20 ? 1 : 0)
                + (hp >= 15 ? 2 : (hp >= 10 ? 1 : 0));
            if (tail_penal > 0) {
                for (int64_t p = end - step; p != beg - step && p != termpos;
                     p -= step) {
                    int64_t q = qual[s0 + p];
                    qual[s0 + p] = (uint8_t)((q > tail_penal + 1
                                              ? q : tail_penal + 1)
                                             - tail_penal);
                }
            }
        }
        // poly-G damping (scan 5'->3' machine order)
        {
            int64_t run = 0;
            int prev_b = -1;
            for (int64_t p = beg; p != end; p += step) {
                const uint8_t b = seq[s0 + p];
                if ((int)b == prev_b) {
                    run++;
                    if (run >= 4 && b == G) {
                        int64_t q = qual[s0 + p];
                        qual[s0 + p] = (uint8_t)((q > 2 ? q : 2) - 1);
                    }
                } else {
                    prev_b = b;
                    run = 1;
                }
            }
        }
    }
    return 0;
}

}  // extern "C"

extern "C" {

// STR/VNTR track winner assignment: the scalar skip-loop of
// refstring2repeatvec (main.hpp:803-874; python reference
// uvc_tpu/pileup/strscan.scan_repeats).  dec_arr is the precomputed
// slippage phred per candidate start position.
int str_track_kernel(
    int64_t n,
    const int64_t *str_unit, const int64_t *str_num, const int64_t *str_end,
    const int64_t *any_unit, const int64_t *any_end,
    const int64_t *dec_arr, int64_t str_max, int64_t bq_max,
    int64_t *begpos, int64_t *tracklen, int64_t *unitlen,
    int64_t *indelphred,  // caller-initialised to bq_max
    int64_t *a_begpos, int64_t *a_tracklen, int64_t *a_unitlen) {
    int64_t refpos = 0;
    while (refpos < n) {
        const int64_t rs = str_unit[refpos];
        const int64_t rn = str_num[refpos];
        const int64_t rep_end = imin(str_end[refpos], n);
        const int64_t tl = rep_end - refpos;
        const int64_t dec = dec_arr[refpos];
        const int64_t ip = bq_max - imin(bq_max - 1, dec);
        for (int64_t i = refpos; i < rep_end; i++) {
            if (tl > tracklen[i]) {
                begpos[i] = refpos;
                unitlen[i] = rs;
                indelphred[i] = ip;
                tracklen[i] = tl;
            }
        }
        const int64_t a_end = imin(any_end[refpos], n);
        const int64_t atl = a_end - refpos;
        const int64_t au = any_unit[refpos];
        for (int64_t i = refpos; i < a_end; i++) {
            if (atl > a_tracklen[i]) {
                a_begpos[i] = refpos;
                a_unitlen[i] = au;
                a_tracklen[i] = atl;
            }
        }
        const int64_t nb = str_max + rs;
        refpos += imax(rs * rn, nb + 1) - nb;
    }
    return 0;
}

}  // extern "C"

extern "C" {

// scatter-add for int64 accumulators: out[idx[i]] += val[i]
// (uvc_tpu/ops/scatter.fast_add_at fast path; avoids bincount's
// full-plane allocation+scan when the row count is small)
void scatter_add_i64(int64_t *out, const int64_t *idx, const int64_t *val,
                     int64_t n) {
    for (int64_t i = 0; i < n; i++) out[idx[i]] += val[i];
}

void scatter_add1_i64(int64_t *out, const int64_t *idx, int64_t n,
                      int64_t val) {
    for (int64_t i = 0; i < n; i++) out[idx[i]] += val;
}

}  // extern "C"

extern "C" {

// sorted-merge lookup: out[i] = val_t[j] where key_t[j] == key_q[i], else 0.
// Both key arrays must be non-decreasing (engine_fq._gather_* fast path).
void merge_lookup_i64(const int64_t *key_t, const int64_t *val_t, int64_t nt,
                      const int64_t *key_q, int64_t *out, int64_t nq) {
    int64_t j = 0;
    for (int64_t i = 0; i < nq; i++) {
        const int64_t k = key_q[i];
        while (j < nt && key_t[j] < k) j++;
        out[i] = (j < nt && key_t[j] == k) ? val_t[j] : 0;
    }
}

}  // extern "C"

extern "C" {

// run_fq sweep-1: famcov consensus scatters (engine_fq.run_fq,
// main.hpp:3186-3352).  All-integer math; fam_good/t3/em flags returned
// for the python SSCS-bias and duplex stages.
int fq_sweep1_kernel(
    int64_t n,
    const int64_t *pos, const int64_t *sym, const int64_t *cnt,
    const int64_t *tot, const int64_t *strand, const uint8_t *has_umi,
    int64_t P,
    int64_t dup1add, int64_t dup1perc, int64_t dup2add, int64_t dup2perc,
    int64_t fam_flag,
    int64_t emperr_snv, int64_t emperc_snv,
    int64_t emperr_indel, int64_t emperc_indel,
    int32_t *cdp12, int32_t *cdp21, int32_t *cdp2, int32_t *cdp3,
    int32_t *cdpm, int32_t *cdpM,       // [P,14,2] zeroed by caller
    uint8_t *fam_good_out) {
    const int64_t NS = 14;
    const bool flag2 = (fam_flag & 0x2) != 0;
    for (int64_t i = 0; i < n; i++) {
        const int64_t idx = (pos[i] * NS + sym[i]) * 2 + strand[i];
        cdp12[idx] += 1;
        if (tot[i] == 1) cdp21[idx] += 1;
        const bool good = tot[i] >= dup1add
            && cnt[i] * 100 >= tot[i] * dup1perc
            && (has_umi[i] || flag2);
        fam_good_out[i] = good ? 1 : 0;
        if (good) cdp2[idx] += 1;
        if (tot[i] >= dup2add && cnt[i] * 100 >= tot[i] * dup2perc)
            cdp3[idx] += 1;
        const bool is_base = sym[i] < 6;
        const int64_t emperr = is_base ? emperr_snv : emperr_indel;
        const int64_t emperc = is_base ? emperc_snv : emperc_indel;
        if (tot[i] >= emperr && cnt[i] * 100 >= tot[i] * emperc) {
            cdpm[idx] += tot[i] - cnt[i];
            cdpM[idx] += tot[i] * (is_base ? 5 : 7);
        }
    }
    return 0;
}

}  // extern "C"

extern "C" {

// infer_max_qual_assuming_independence bucket scan
// (main_conversion.hpp:920-974; python reference engine_fq._iid_scan /
// engine_bq.final_iid_qualities).  hist is [n,16]; outputs per element.
int iid_scan_kernel(int64_t n, const int64_t *max_qual, int64_t dec_qual,
                    const int32_t *hist, const int64_t *totDP,
                    int64_t *q_out, int64_t *ad_out, int64_t *bq_out) {
    const double INV_LOG10 = 10.0 / 2.302585092994045684;
    const double DBL_EPS = 2.220446049250313e-16;
    for (int64_t i = 0; i < n; i++) {
        const int64_t mq = max_qual[i];
        // python floor division (//) semantics for the bucket limit
        int64_t lim = mq / dec_qual;
        if ((mq % dec_qual != 0) && ((mq < 0) != (dec_qual < 0))) lim--;
        if (lim < 0) lim = 0;
        const double tot = (double)totDP[i];
        int64_t cum = 0;
        int64_t best_vq = INT64_MIN, best_k = 0, best_ad = 0;
        for (int64_t k = 0; k < 16; k++) {
            const int64_t h = (int64_t)hist[i * 16 + k];
            cum += h;
            if (h > 0 && k < lim) {
                const int64_t c1 = cum > 1 ? cum : 1;
                const double expbq = INV_LOG10
                    * log(tot / (double)c1 + DBL_EPS);
                const int64_t vq = (int64_t)((double)cum
                    * ((double)(mq - dec_qual * k) - expbq));
                if (vq > best_vq) {
                    best_vq = vq;
                    best_k = k;
                    best_ad = cum;
                }
            }
        }
        if (best_vq > 0) {
            q_out[i] = best_vq;
            ad_out[i] = best_ad;
            bq_out[i] = mq - dec_qual * best_k;
        } else {
            q_out[i] = 0;
            ad_out[i] = 0;
            bq_out[i] = 0;
        }
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// MGVCF run-length selection (main.cpp:691-734): sequential scan of the
// interleaved (LINK,BASE) per-position depth/quality rows, emitting a row
// when it differs from the PREVIOUSLY EMITTED row (ratio/absolute depth
// test or homref-quality jump > 10).  Returns the emitted row count.

extern "C" {

static inline int mgvcf_depths_diff(int64_t a, int64_t b) {
    const int64_t mn = a < b ? a : b, mx = a < b ? b : a;
    if (mn * 130 >= mx * 100) return 0;
    if (mn + 3 >= mx) return 0;
    return 1;
}

int64_t mgvcf_rle(int64_t n, const int64_t *bdp, const int64_t *cdp,
                  const int64_t *c12, const int64_t *refq,
                  int64_t *out_idx) {
    int64_t m = 0;
    int64_t pb = 0, pc = 0, p12 = 0, pq = 0;
    int have_prev = 0;
    for (int64_t i = 0; i < n; i++) {
        const int64_t q = refq[i];
        int emit = !have_prev;
        if (!emit) {
            const int64_t dq = q > pq ? q - pq : pq - q;
            emit = dq > 10 || mgvcf_depths_diff(bdp[i], pb)
                || mgvcf_depths_diff(cdp[i], pc)
                || mgvcf_depths_diff(c12[i], p12);
        }
        if (emit) {
            out_idx[m++] = i;
            pb = bdp[i]; pc = cdp[i]; p12 = c12[i]; pq = q;
            have_prev = 1;
        }
    }
    return m;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused dual reduce+consensus for the family sweeps (engine_fq stage 1):
// ONE radix sort over (fam,pos,sym) keys feeds BOTH the filtered
// fragment-count reduction (set 1: sum of the filt flag) and the
// BQ-weighted reduction (set 2: sum of val).  Set 1 keeps only keys with
// a positive filtered count, matching two separate rc_run calls exactly.

extern "C" {

int64_t rc2_run(int64_t n, const int64_t *group, const int64_t *pos,
                const int64_t *sym, const int64_t *val, const uint8_t *filt,
                int64_t P) {
    const int VAL_BITS = 19;
    const int64_t VAL_MAX = ((int64_t)1 << VAL_BITS) - 1;
    const int SYM_BITS = 4;
    const int LOW_BITS = VAL_BITS + 1;   // val + filt flag
    int pos_bits = rc::bit_width_u64((uint64_t)(P > 1 ? P - 1 : 1));
    rc::g_P = P;
    rc::g_pos_bits = pos_bits;
    int64_t max_g = 0, max_v = 0, min_v = 0;
    for (int64_t i = 0; i < n; i++) {
        if (group[i] > max_g) max_g = group[i];
        if (val[i] > max_v) max_v = val[i];
        if (val[i] < min_v) min_v = val[i];
    }
    const int key_bits = rc::bit_width_u64((uint64_t)max_g)
        + pos_bits + SYM_BITS;
    if (key_bits + LOW_BITS > 62 || min_v < 0 || max_v > VAL_MAX)
        return -1;   // caller falls back to two rc_run calls
    const int GSHIFT = pos_bits + SYM_BITS;
    if ((int64_t)rc::u_a.size() < n) rc::u_a.resize(n);
    if ((int64_t)rc::u_b.size() < n) rc::u_b.resize(n);
    uint64_t *rows = rc::u_a.data();
    {
        rcdiag::Phase ph("rc2.pack");
        for (int64_t i = 0; i < n; i++)
            rows[i] = ((((uint64_t)group[i] << GSHIFT)
                        | ((uint64_t)pos[i] << SYM_BITS)
                        | (uint64_t)sym[i]) << LOW_BITS)
                | ((uint64_t)(filt[i] ? 1 : 0) << VAL_BITS)
                | (uint64_t)val[i];
    }
    {
        rcdiag::Phase ph("rc2.sort");
        rc::sort_u64(rows, rc::u_b.data(), n, LOW_BITS, key_bits);
    }
    rc::ug.clear(); rc::uv.clear();
    rc::ug2.clear(); rc::uv2.clear();
    rc::ug.reserve(n); rc::uv.reserve(n);
    rc::ug2.reserve(n); rc::uv2.reserve(n);
    {
        rcdiag::Phase ph("rc2.reduce");
        for (int64_t i = 0; i < n;) {
            const uint64_t k = rows[i] >> LOW_BITS;
            int64_t acc1 = 0, acc2 = 0;
            int64_t j = i;
            for (; j < n && (rows[j] >> LOW_BITS) == k; j++) {
                acc1 += (int64_t)((rows[j] >> VAL_BITS) & 1);
                acc2 += (int64_t)(rows[j] & VAL_MAX);
            }
            if (acc1 > 0) {
                rc::ug.push_back((int64_t)k);
                rc::uv.push_back(acc1);
            }
            rc::ug2.push_back((int64_t)k);
            rc::uv2.push_back(acc2);
            i = j;
        }
    }
    rcdiag::Phase ph("rc2.consensus");
    rc::consensus_scan(rc::ug, rc::uv, pos_bits, false,
                       rc::cg, rc::cp_, rc::cst, rc::ccs, rc::ccc, rc::ctot);
    rc::consensus_scan(rc::ug2, rc::uv2, pos_bits, false,
                       rc::c2g, rc::c2p, rc::c2st, rc::c2cs, rc::c2cc,
                       rc::c2tot);
    return (int64_t)rc::ug.size();
}

void rc2_sizes(int64_t *out4) {
    out4[0] = (int64_t)rc::ug.size();
    out4[1] = (int64_t)rc::cg.size();
    out4[2] = (int64_t)rc::ug2.size();
    out4[3] = (int64_t)rc::c2g.size();
}

void rc2_fetch_consensus2(int64_t *g, int64_t *p, int64_t *st, int64_t *cs,
                          int64_t *cc, int64_t *tot) {
    const int64_t n = (int64_t)rc::c2g.size();
    for (int64_t i = 0; i < n; i++) {
        g[i] = rc::c2g[i];
        p[i] = rc::c2p[i];
        st[i] = rc::c2st[i];
        cs[i] = rc::c2cs[i];
        cc[i] = rc::c2cc[i];
        tot[i] = rc::c2tot[i];
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Family sweep 2 (engine_fq.run_fq, main.hpp:3373-3591): per fammmm
// consensus row, gather the famcov fragment counts (sorted-merge against
// the sweep-1 unique table), derive the empirical-error confam quality,
// scatter cDP1 and the per-strand bucket histograms.  The floating-point
// expressions replicate the numpy reference order exactly (nearbyint ==
// np.round half-to-even under the default rounding mode).

extern "C" {

int fq_sweep2_kernel(
    int64_t n2,
    const int64_t *g2, const int64_t *p2, const int64_t *st2,
    const int64_t *cs2, const int64_t *cc2, const int64_t *tt2,
    int64_t nu,
    const int64_t *fg, const int64_t *fp, const int64_t *fs,
    const int64_t *fcnt,                  // sorted by (g,p,sym)
    const int64_t *fam_strand,            // [n_fams]
    const int64_t *ref_syms,              // [P]
    const int64_t *sscs_flat,             // [14*14]
    const int32_t *cdpM, const int32_t *cdpm,  // [P,14,2]
    int64_t P, int64_t rescue_add, int64_t fam_phred_indel_inc,
    int64_t dup1add, int64_t dup1perc, int64_t highbq_thres,
    int32_t *cdp1,                        // [P,14,2] zeroed by caller
    int32_t *hist,                        // [2,P,14,16] zeroed by caller
    int64_t *confam_out,                  // [n2]
    uint8_t *confam_ok_out,               // [n2]
    uint8_t *mut_out                      // [n2] phase-eligible mutation flag
) {
    const int64_t NS = 14;
    const double INV_LOG10 = 10.0 / std::log(10.0);
    int pos_bits = 1;
    while (((int64_t)1 << pos_bits) < P) pos_bits++;
    // nu < 0: read the sweep-1 unique table straight from the rc2 statics
    // (bit-packed keys) instead of round-tripping the four arrays through
    // numpy; requires the same P as the preceding rc2_run_fc call
    const bool internal = nu < 0;
    const int64_t *iug = internal ? rc::ug.data() : nullptr;
    const int64_t *iuv = internal ? rc::uv.data() : nullptr;
    if (internal) {
        if (rc::g_pos_bits != pos_bits) return -1;
        nu = (int64_t)rc::ug.size();
    }
    static const int RP_POW10_N = 256;
    static thread_local std::vector<double> rp_pow10;
    if (rp_pow10.empty()) {
        rp_pow10.resize(RP_POW10_N);
        for (int q = 0; q < RP_POW10_N; q++)
            rp_pow10[q] = std::pow(10.0, -(double)q / 10.0);
    }
    static thread_local std::vector<int64_t> rp_memo_key;
    static thread_local std::vector<double> rp_memo_val;
    rp_memo_key.assign((size_t)(P * NS * 2), INT64_MIN);
    rp_memo_val.resize((size_t)(P * NS * 2));
    int64_t tp = 0;
    for (int64_t i = 0; i < n2; i++) {
        const int64_t g = g2[i], pos = p2[i], st = st2[i];
        const int64_t con_sym = cs2[i], con_cnt = cc2[i], tot = tt2[i];
        const int64_t strand = fam_strand[g];
        const int64_t idx = (pos * NS + con_sym) * 2 + strand;
        cdp1[idx] += 1;
        const uint64_t gp = ((uint64_t)g << pos_bits) | (uint64_t)pos;
        int64_t con_nfrags = 0, tot_nfrags = 0;
        if (internal) {
            while (tp < nu && ((uint64_t)iug[tp] >> 4) < gp) tp++;
            for (int64_t j = tp; j < nu; j++) {
                const uint64_t k = (uint64_t)iug[j];
                if ((k >> 4) != gp) break;
                const int64_t sj = (int64_t)(k & 15);
                if ((sj >= 6 ? 1 : 0) == st) tot_nfrags += iuv[j];
                if (sj == con_sym) con_nfrags = iuv[j];
            }
        } else {
            while (tp < nu
                   && ((((uint64_t)fg[tp] << pos_bits)
                        | (uint64_t)fp[tp]) < gp))
                tp++;
            for (int64_t j = tp; j < nu; j++) {
                if (((((uint64_t)fg[j] << pos_bits) | (uint64_t)fp[j]) != gp))
                    break;
                const int64_t stj = fs[j] >= 6 ? 1 : 0;
                if (stj == st) tot_nfrags += fcnt[j];
                if (fs[j] == con_sym) con_nfrags = fcnt[j];
            }
        }
        const int64_t avgBQ = tot_nfrags == 0 ? 1
            : con_cnt / (tot_nfrags > 1 ? tot_nfrags : 1);
        const int64_t major = cdpM[idx];
        const int64_t minor = cdpm[idx];
        const double w = 1.0 / ((double)minor + 1.0);
        // realphred depends only on (idx, avgBQ): memoize one entry per
        // idx (hit rate is high because families at one locus share BQ),
        // and take pow10 of small integer avgBQ from an exact LUT --
        // both reproduce the direct std::log/std::pow doubles bit-for-bit
        double realphred;
        if (rp_memo_key[idx] == avgBQ) {
            realphred = rp_memo_val[idx];
        } else {
            const double pw = (avgBQ >= 0 && avgBQ < RP_POW10_N)
                ? rp_pow10[avgBQ] : std::pow(10.0, -(double)avgBQ / 10.0);
            realphred = -INV_LOG10 * std::log(
                ((double)minor + w)
                / ((double)major + (double)minor + w / pw));
            rp_memo_key[idx] = avgBQ;
            rp_memo_val[idx] = realphred;
        }
        const int64_t indep = (int64_t)std::nearbyint(
            (double)(2 * con_nfrags - tot_nfrags) * realphred);
        int64_t confam;
        if (st == 1) {
            const int64_t cap = fam_phred_indel_inc
                + (int64_t)std::nearbyint(realphred);
            confam = indep < cap ? indep : cap;
        } else {
            const int64_t cap = 2 * con_cnt - tot;
            confam = indep < cap ? indep : cap;
        }
        if (confam < 1) confam = 1;
        confam_out[i] = confam;
        const int64_t max_qual =
            sscs_flat[ref_syms[pos] * NS + con_sym] + rescue_add;
        const int64_t confam2 = confam < max_qual ? confam : max_qual;
        const bool hb = tot_nfrags >= dup1add;
        confam_ok_out[i] = (tot_nfrags >= dup1add
                            && con_nfrags * 100 >= tot_nfrags * dup1perc)
            ? 1 : 0;
        if (hb) {
            int64_t d = max_qual - confam2 + 2;
            int64_t pb = d >= 0 ? d / 4 : -((-d + 3) / 4);
            if (pb < 0) pb = 0;
            if (pb > 15) pb = 15;
            hist[((strand * P + pos) * NS + con_sym) * 16 + pb] += 1;
        }
        // phase-signature eligibility (engine_fq._phase_signatures):
        // BASE: consensus is a real substitution; LINK: a real indel;
        // BASE additionally requires confam >= bias_thres_highBQ
        bool mut;
        if (st == 0) {
            const int64_t rs = ref_syms[pos];
            mut = rs != con_sym && rs < 4 && con_sym < 4
                && confam >= highbq_thres;
        } else {
            mut = con_sym != 6 && con_sym != 13;
        }
        mut_out[i] = mut ? 1 : 0;
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Pass A prep accumulation (engine_bq.pass_a_prep M-base part;
// update_seg_format_prep_sets_by_aln, main.hpp:924-1204): one loop over
// the M-base events computes the ~20 per-position counter scatters, the
// (read,diagonal)-segmented mismatch-run intervals, and the per-read
// ins/del BAQ sums.  The gap/clip sub-passes stay in python.

extern "C" {

enum {
    PA_pcr_dp, PA_umi_dp, PA_dp, PA_qlen, PA_XM1500, PA_GO1500, PA_GAPLEN,
    PA_LI, PA_LIDP, PA_RI, PA_RIDP, PA_l_dist_sum, PA_r_dist_sum,
    PA_inslen_sum, PA_dellen_sum, PA_l_BAQ_sum, PA_r_BAQ_sum,
    PA_insBAQ_sum, PA_delBAQ_sum, PA_highBQ_dp, PA_snv_dp, PA_dnv_dp,
    N_PA
};

// per-read field order for pass_a ([n_reads, N_PAR] int64)
enum {
    PAR_pos, PAR_rend, PAR_isrc, PAR_isize, PAR_fragL, PAR_fragR,
    PAR_xm1500, PAR_go1500, PAR_avg_gaplen, PAR_inslen_sum, PAR_dellen_sum,
    PAR_pcr_inc, PAR_umi_inc, N_PAR
};

int pass_a_kernel(
    int64_t n_bases,
    const int64_t *b_rpos, const int64_t *b_read, const int64_t *b_qpos,
    const int64_t *b_bq, const int64_t *b_sym,
    const int64_t *ref_syms,             // [P]
    const uint8_t *seq_flat,             // raw per-read base codes
    const int64_t *seq_off,              // [n_reads+1]
    int64_t n_reads, const int64_t *reads,  // [n_reads, N_PAR]
    int64_t n_gaps, const int64_t *g_read, const int64_t *g_rpos,
    const int64_t *g_oplen, const uint8_t *g_isdel,
    const int64_t *baq,                  // [P]
    int64_t off, int64_t P, int64_t highbq_thres, int64_t max_insert,
    int64_t *out,                        // [N_PA, P] zeroed by caller
    int64_t *insbaq, int64_t *delbaq     // [n_reads] zeroed by caller
) {
    // per-read gap BAQ sums (python _read_gap_baq_sums)
    for (int64_t j = 0; j < n_gaps; j++) {
        int64_t end_idx = g_rpos[j] + g_oplen[j];
        if (end_idx > off + P - 1) end_idx = off + P - 1;
        end_idx -= off;
        int64_t beg_idx = g_rpos[j] - off;
        const int64_t v = baq[iclip(end_idx, 0, P - 1)]
            - baq[iclip(beg_idx, 0, P - 1)];
        if (g_isdel[j]) delbaq[g_read[j]] += v;
        else insbaq[g_read[j]] += v;
    }
    // mismatch-run scan over (read, diagonal) segments: the bases table
    // is in cigar-walk order, so a segment is a maximal contiguous run
    // with equal (read, rpos - qpos); runs are scanned backward for the
    // next matching base (index distance, as the python reference)
    std::vector<int64_t> snv_d(P + 2, 0), dnv_d(P + 2, 0);
    int64_t seg_end = n_bases;   // exclusive
    for (int64_t i = n_bases - 1, next_match = n_bases; i >= 0; i--) {
        const bool brk = (i + 1 < n_bases)
            && ((b_read[i + 1] != b_read[i])
                || (b_rpos[i + 1] - b_qpos[i + 1] != b_rpos[i] - b_qpos[i]));
        if (brk) { seg_end = i + 1; next_match = n_bases; }
        const int64_t ridx = iclip(b_rpos[i] - off, 0, P - 1);
        const bool match = ref_syms[ridx] == b_sym[i];
        if (match) next_match = i;
        // interval add for snv/dnv depth (main.hpp:1025-1046)
        const int64_t *r = reads + b_read[i] * N_PAR;
        int64_t next_rpos;
        if (next_match < seg_end) {
            next_rpos = b_rpos[i] + (next_match - i) + 1;
        } else {
            // the mismatch run reaches the M-op end: the reference scan
            // keeps walking the raw (qpos+k, rpos+k) diagonal bounded
            // only by l_qseq and rend, ignoring the cigar
            // (main.hpp:1027-1037); replicate it on the raw sequence
            const int64_t q0 = b_qpos[i], r0 = b_rpos[i];
            const int64_t s0 = seq_off[b_read[i]];
            const int64_t lq = seq_off[b_read[i] + 1] - s0;
            const int64_t re = r[PAR_rend];
            int64_t k = seg_end - i;
            int64_t found = -1;
            while (q0 + k < lq && r0 + k < re) {
                const int64_t ridx2 = iclip(r0 + k - off, 0, P - 1);
                if (ref_syms[ridx2] == (int64_t)seq_flat[s0 + q0 + k]) {
                    found = k;
                    break;
                }
                k++;
            }
            next_rpos = (found >= 0) ? r0 + found + 1
                                     : r0 + imin(lq - q0, re - r0);
        }
        int64_t lo = (r[PAR_pos] > b_rpos[i] - 1 ? r[PAR_pos]
                      : b_rpos[i] - 1) - off;
        int64_t hi = (next_rpos < r[PAR_rend] ? next_rpos : r[PAR_rend]) - off;
        lo = iclip(lo, 0, P);
        hi = iclip(hi, 0, P + 1);
        if (lo < hi) {
            if (next_rpos == b_rpos[i] + 2) { snv_d[lo]++; snv_d[hi]--; }
            else if (next_rpos > b_rpos[i] + 2) { dnv_d[lo]++; dnv_d[hi]--; }
        }
    }
    {
        int64_t s = 0, d = 0;
        int64_t *snv = out + PA_snv_dp * P, *dnv = out + PA_dnv_dp * P;
        for (int64_t p = 0; p < P; p++) {
            s += snv_d[p]; d += dnv_d[p];
            snv[p] += s; dnv[p] += d;
        }
    }
    // per-M-base point adds
    for (int64_t i = 0; i < n_bases; i++) {
        const int64_t bi = b_rpos[i] - off;
        if (bi < 0 || bi >= P) return -1;
        const int64_t *r = reads + b_read[i] * N_PAR;
        out[PA_pcr_dp * P + bi] += r[PAR_pcr_inc];
        out[PA_umi_dp * P + bi] += r[PAR_umi_inc];
        out[PA_dp * P + bi] += 1;
        out[PA_qlen * P + bi] += r[PAR_rend] - r[PAR_pos];
        out[PA_XM1500 * P + bi] += r[PAR_xm1500];
        out[PA_GO1500 * P + bi] += r[PAR_go1500];
        out[PA_GAPLEN * P + bi] += r[PAR_avg_gaplen];
        if (r[PAR_isize] != 0) {
            if (r[PAR_isrc]) {
                out[PA_LI * P + bi] +=
                    imin(b_rpos[i] - r[PAR_fragL] + 1, max_insert);
                out[PA_LIDP * P + bi] += 1;
            } else {
                out[PA_RI * P + bi] +=
                    imin(r[PAR_fragR] - b_rpos[i], max_insert);
                out[PA_RIDP * P + bi] += 1;
            }
        }
        if (b_bq[i] >= highbq_thres) {
            out[PA_l_dist_sum * P + bi] += b_rpos[i] - r[PAR_pos] + 1;
            out[PA_r_dist_sum * P + bi] += r[PAR_rend] - b_rpos[i];
            out[PA_inslen_sum * P + bi] += r[PAR_inslen_sum];
            out[PA_dellen_sum * P + bi] += r[PAR_dellen_sum];
            out[PA_l_BAQ_sum * P + bi] += baq[bi] - baq[r[PAR_pos] - off] + 1;
            out[PA_r_BAQ_sum * P + bi] +=
                baq[r[PAR_rend] - 1 - off] - baq[bi] + 1;
            out[PA_insBAQ_sum * P + bi] += insbaq[b_read[i]];
            out[PA_delBAQ_sum * P + bi] += delbaq[b_read[i]];
            out[PA_highBQ_dp * P + bi] += 1;
        }
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// rc2 entry taking the RAW fragment-consensus rows: computes adj =
// max(2*con_cnt, tot) - tot, the family id map, and the sweep-1 filter
// (engine_fq.run_fq stage 1) inline, then runs the fused dual reduction.

extern "C" {

int64_t rc2_run_fc(int64_t n, const int64_t *frag, const int64_t *pos,
                   const int64_t *sym, const int64_t *con_cnt,
                   const int64_t *tot, const int64_t *st,
                   const int64_t *fam_of_frag, int64_t highbq_snv,
                   int64_t P, int64_t pdel_ign) {
    const int VAL_BITS = 19;
    const int64_t VAL_MAX = ((int64_t)1 << VAL_BITS) - 1;
    const int SYM_BITS = 4;
    const int LOW_BITS = VAL_BITS + 1;
    int pos_bits = rc::bit_width_u64((uint64_t)(P > 1 ? P - 1 : 1));
    rc::g_P = P;
    rc::g_pos_bits = pos_bits;
    int64_t max_g = 0, max_v = 0;
    for (int64_t i = 0; i < n; i++) {
        const int64_t adj0 = 2 * con_cnt[i] - tot[i];
        const int64_t adj = adj0 > 0 ? adj0 : 0;
        if (adj > max_v) max_v = adj;
        const int64_t g = fam_of_frag[frag[i]];
        if (g > max_g) max_g = g;
    }
    const int key_bits = rc::bit_width_u64((uint64_t)max_g)
        + pos_bits + SYM_BITS;
    if (key_bits + LOW_BITS > 62 || max_v > VAL_MAX) return -1;
    const int GSHIFT = pos_bits + SYM_BITS;
    if ((int64_t)rc::u_a.size() < n) rc::u_a.resize(n);
    if ((int64_t)rc::u_b.size() < n) rc::u_b.resize(n);
    uint64_t *rows = rc::u_a.data();
    int64_t m = 0;
    for (int64_t i = 0; i < n; i++) {
        const int64_t adj = 2 * con_cnt[i] - tot[i];   // max(2c,t)-t
        if (adj <= 0) continue;
        // padded-deletion BASE_N/NN fragments are dropped from the
        // filtered (famcov) container when pdel_ign (the IonTorrent arm
        // of microadjust_padded_deletion_flag; main.hpp:2905-2908,
        // 481-485, 410 TIgnorePaddedDel)
        const uint64_t filt = ((st[i] == 1
                                || (adj >= highbq_snv
                                    && !(pdel_ign && sym[i] >= 4)))) ? 1 : 0;
        rows[m++] = ((((uint64_t)fam_of_frag[frag[i]] << GSHIFT)
                      | ((uint64_t)pos[i] << SYM_BITS)
                      | (uint64_t)sym[i]) << LOW_BITS)
            | (filt << VAL_BITS) | (uint64_t)adj;
    }
    rc::sort_u64(rows, rc::u_b.data(), m, LOW_BITS, key_bits);
    rc::ug.clear(); rc::uv.clear();
    rc::ug2.clear(); rc::uv2.clear();
    rc::ug.reserve(m); rc::uv.reserve(m);
    rc::ug2.reserve(m); rc::uv2.reserve(m);
    for (int64_t i = 0; i < m;) {
        const uint64_t k = rows[i] >> LOW_BITS;
        int64_t acc1 = 0, acc2 = 0;
        int64_t j = i;
        for (; j < m && (rows[j] >> LOW_BITS) == k; j++) {
            acc1 += (int64_t)((rows[j] >> VAL_BITS) & 1);
            acc2 += (int64_t)(rows[j] & VAL_MAX);
        }
        if (acc1 > 0) { rc::ug.push_back((int64_t)k); rc::uv.push_back(acc1); }
        rc::ug2.push_back((int64_t)k);
        rc::uv2.push_back(acc2);
        i = j;
    }
    rc::consensus_scan(rc::ug, rc::uv, pos_bits, false,
                       rc::cg, rc::cp_, rc::cst, rc::ccs, rc::ccc, rc::ctot);
    rc::consensus_scan(rc::ug2, rc::uv2, pos_bits, false,
                       rc::c2g, rc::c2p, rc::c2st, rc::c2cs, rc::c2cc,
                       rc::c2tot);
    return (int64_t)rc::ug.size();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Direct fragment consensus: replaces sort + reduce + consensus (rc_run
// with mode=max, link_m_overridden) for the fragment R1/R2 MAX-merge by
// exploiting event-stream structure: every stream (base / LINK_M / gap /
// NN-base / NN-link) is read-major with non-decreasing (pos,sym) keys
// within a read, so the per-fragment merge is a small k-way merge over
// (read, stream) cursors -- no global radix sort.  Output rows land in the
// same static consensus buffers (rc_fetch_consensus) grouped by fragment
// id ascending with (pos, st) ascending inside, byte-identical to
// rc_run's sorted order.  Returns the consensus row count, or -1 when a
// stream violates the per-read sort invariant (caller falls back to
// rc_run; e.g. a D-after-I cigar keys both gaps at one position with
// descending symbols).

// pass-D fusion context: when armed (frag_cons_arm_pass_d), the fragment
// merge runs the pass-D consensus scatter per fragment WHILE its rows are
// still cache-hot, instead of a separate 2nd walk (pass_d_statics).
namespace pdx {
static thread_local const int64_t *bg, *aDP4, *ref_syms, *frag_strand,
    *normMQ;
static thread_local int32_t *bdp, *bta, *btb, *vq_bMQ;
static thread_local int32_t *hist;
static thread_local int64_t P, highbq, W;
static thread_local bool armed = false;
static thread_local std::vector<int64_t> cov_pos, mut_pos;
}  // namespace pdx

// defined after the sres:: sparse-row buffers below
static void pdx_run_frag(int64_t lo, int64_t hi, int64_t fr);

namespace fcd {
// grow-only scratch, thread_local (one private set per worker thread)
static thread_local std::vector<int64_t> soff;   // [(n_streams)*(n_reads+1)]
static thread_local std::vector<int64_t> frag_cnt, frag_read;  // frag CSR
struct Cur { int64_t i, end; };
static thread_local std::vector<Cur> curs;
// phase-A scratch: per-read stream-merged rows packed as (key << 32) | val
// with key = (pos << 4) | sym; val is guaranteed < 2^32 by the caller's
// event-value construction (phred-scale ints)
static thread_local std::vector<uint64_t> rows;
static thread_local std::vector<int64_t> roff;
}  // namespace fcd

extern "C" {

int64_t frag_cons_direct(int64_t n_streams, const int64_t *stream_off,
                         const int64_t *pos, const int64_t *sym,
                         const int64_t *val, const int64_t *read,
                         int64_t n_reads, const int64_t *frag_of_read,
                         int64_t n_frags, int64_t P,
                         int64_t link_m_overridden) {
    rc::g_P = P;
    rc::g_pos_bits = rc::bit_width_u64((uint64_t)(P > 1 ? P - 1 : 1));
    rc::ug.clear(); rc::uv.clear();   // no unique table in this mode
    const int64_t n_total = stream_off[n_streams];
    rc::cg.resize(n_total); rc::cp_.resize(n_total);
    rc::cst.resize(n_total); rc::ccs.resize(n_total);
    rc::ccc.resize(n_total); rc::ctot.resize(n_total);

    // 1) per-(stream, read) segment boundaries + sort-invariant check
    fcd::soff.assign(n_streams * (n_reads + 1), 0);
    for (int64_t s = 0; s < n_streams; s++) {
        rcdiag::Phase ph("fcd.offsets");
        int64_t *so = fcd::soff.data() + s * (n_reads + 1);
        const int64_t lo = stream_off[s], hi = stream_off[s + 1];
        so[0] = lo;
        int64_t r = 0, prev_rd = -1;
        uint64_t prev_key = 0;
        for (int64_t i = lo; i < hi; i++) {
            const int64_t rd = read[i];
            if (rd < prev_rd || rd < 0 || rd >= n_reads)
                return -1;   // not read-major
            if ((uint64_t)pos[i] >= (uint64_t)P) return -2;
            const uint64_t key = ((uint64_t)pos[i] << 4) | (uint64_t)sym[i];
            if (rd == prev_rd && key <= prev_key)
                return -1;   // keys must strictly increase within a read
            if ((uint64_t)val[i] >= ((uint64_t)1 << 32))
                return -4;   // value must fit the packed 32-bit field
            while (r < rd) { so[r + 1] = i; r++; }
            prev_rd = rd;
            prev_key = key;
        }
        while (r < n_reads) { so[r + 1] = hi; r++; }
    }

    // 2) fragment -> member reads (stable counting sort over frag ids)
    fcd::frag_cnt.assign(n_frags + 1, 0);
    for (int64_t r = 0; r < n_reads; r++) {
        const int64_t f = frag_of_read[r];
        if (f < 0 || f >= n_frags) return -3;
        fcd::frag_cnt[f + 1]++;
    }
    for (int64_t f = 0; f < n_frags; f++) fcd::frag_cnt[f + 1] += fcd::frag_cnt[f];
    fcd::frag_read.resize(n_reads);
    {
        std::vector<int64_t> fill(fcd::frag_cnt.begin(), fcd::frag_cnt.end() - 1);
        for (int64_t r = 0; r < n_reads; r++)
            fcd::frag_read[fill[frag_of_read[r]]++] = r;
    }

    // 3) phase A: pre-merge each read's streams into packed rows
    //    (key << 32) | val; a read's streams are each strictly
    //    key-ascending, so this is a small merge with no reduction
    fcd::rows.resize(n_total);
    fcd::roff.resize(n_reads + 1);
    {
        rcdiag::Phase ph("fcd.premerge");
        uint64_t *out = fcd::rows.data();
        int64_t w = 0;
        for (int64_t r = 0; r < n_reads; r++) {
            fcd::roff[r] = w;
            fcd::curs.clear();
            for (int64_t s = 0; s < n_streams; s++) {
                const int64_t *so = fcd::soff.data() + s * (n_reads + 1);
                if (so[r] < so[r + 1])
                    fcd::curs.push_back({so[r], so[r + 1]});
            }
            const int m = (int)fcd::curs.size();
            if (m == 0) continue;
            if (m == 2) {
                // dominant case: base + LINK_M streams
                int64_t i0 = fcd::curs[0].i, e0 = fcd::curs[0].end;
                int64_t i1 = fcd::curs[1].i, e1 = fcd::curs[1].end;
                uint64_t k0 = ((uint64_t)pos[i0] << 4) | (uint64_t)sym[i0];
                uint64_t k1 = ((uint64_t)pos[i1] << 4) | (uint64_t)sym[i1];
                while (true) {
                    if (k0 < k1) {
                        out[w++] = (k0 << 32) | (uint64_t)val[i0];
                        if (++i0 == e0) break;
                        k0 = ((uint64_t)pos[i0] << 4) | (uint64_t)sym[i0];
                    } else {
                        out[w++] = (k1 << 32) | (uint64_t)val[i1];
                        if (++i1 == e1) break;
                        k1 = ((uint64_t)pos[i1] << 4) | (uint64_t)sym[i1];
                    }
                }
                for (; i0 < e0; i0++)
                    out[w++] = ((((uint64_t)pos[i0] << 4)
                                 | (uint64_t)sym[i0]) << 32)
                        | (uint64_t)val[i0];
                for (; i1 < e1; i1++)
                    out[w++] = ((((uint64_t)pos[i1] << 4)
                                 | (uint64_t)sym[i1]) << 32)
                        | (uint64_t)val[i1];
            } else if (m == 1) {
                for (int64_t i = fcd::curs[0].i; i < fcd::curs[0].end; i++)
                    out[w++] = ((((uint64_t)pos[i] << 4)
                                 | (uint64_t)sym[i]) << 32)
                        | (uint64_t)val[i];
            } else {
                while (true) {
                    uint64_t mk = ~(uint64_t)0;
                    int mc = -1;
                    for (int c = 0; c < m; c++) {
                        const auto &cu = fcd::curs[c];
                        if (cu.i < cu.end) {
                            const uint64_t k = ((uint64_t)pos[cu.i] << 4)
                                | (uint64_t)sym[cu.i];
                            if (k < mk) { mk = k; mc = c; }
                        }
                    }
                    if (mc < 0) break;
                    out[w++] = (mk << 32) | (uint64_t)val[fcd::curs[mc].i];
                    fcd::curs[mc].i++;
                }
            }
        }
        fcd::roff[n_reads] = w;
    }

    // 4) per-fragment merge of member-read rows + max-reduce + consensus
    rcdiag::Phase ph("fcd.merge");
    const uint64_t NOKEY = ~(uint64_t)0;
    const uint64_t *rows = fcd::rows.data();
    int32_t *o_g = rc::cg.data(), *o_p = rc::cp_.data();
    int32_t *o_st = rc::cst.data(), *o_cs = rc::ccs.data();
    int32_t *o_cc = rc::ccc.data(), *o_tot = rc::ctot.data();
    int64_t w = 0;
    uint64_t cur_gp = NOKEY;   // (pos<<1)|st of the open consensus group
    int64_t cur_f = -1;
    int64_t tot = 0, best_v = -1, best_s = -1, lm_v = 0;
    bool ovr = false;
    auto flush = [&]() {
        if (cur_gp == NOKEY || tot <= 0) return;
        int64_t cs, cc;
        if (best_s < 0) { cs = 6; cc = lm_v; }
        else { cs = best_s; cc = best_v; }
        o_g[w] = (int32_t)cur_f;
        o_p[w] = (int32_t)(cur_gp >> 1);
        o_st[w] = (int32_t)(cur_gp & 1);
        o_cs[w] = (int32_t)cs;
        o_cc[w] = (int32_t)cc;
        o_tot[w] = (int32_t)(ovr ? cc : tot);
        w++;
    };
    auto feed = [&](uint64_t key, int64_t acc) {
        const int64_t s2 = (int64_t)(key & 15);
        const int64_t st = s2 >= 6 ? 1 : 0;
        const uint64_t gp = ((key >> 4) << 1) | (uint64_t)st;
        if (gp != cur_gp) {
            flush();
            cur_gp = gp;
            tot = 0; best_v = -1; best_s = -1; lm_v = 0;
            ovr = (link_m_overridden != 0) && st == 1;
        }
        if (acc > 0) {
            tot += acc;
            if (ovr && s2 == 6) { lm_v = acc; }
            else if (acc > best_v) { best_v = acc; best_s = s2; }
        }
    };
    const bool lmo = (link_m_overridden != 0);
    // unique-key row range of ONE fragment (single read, or the
    // concatenated halves of non-overlapping mates): emit groups
    // directly -- base rows are singleton groups, link groups span the
    // few consecutive link symbols at one position
    int64_t dr_f = -1;
    auto direct_range = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ) {
            const uint64_t k = rows[i] >> 32;
            const int64_t sym = (int64_t)(k & 15);
            const uint64_t posk = k >> 4;
            if (sym < 6) {
                const int64_t val = (int64_t)(uint32_t)rows[i];
                if (val > 0) {
                    o_g[w] = (int32_t)dr_f;
                    o_p[w] = (int32_t)posk;
                    o_st[w] = 0;
                    o_cs[w] = (int32_t)sym;
                    o_cc[w] = (int32_t)val;
                    o_tot[w] = (int32_t)val;
                    w++;
                }
                i++;
                continue;
            }
            int64_t gtot = 0, gbv = -1, gbs = -1, glm = 0;
            do {
                const uint64_t k2 = rows[i] >> 32;
                if ((k2 >> 4) != posk) break;
                const int64_t s2 = (int64_t)(k2 & 15);
                const int64_t v2 = (int64_t)(uint32_t)rows[i];
                if (v2 > 0) {
                    gtot += v2;
                    if (lmo && s2 == 6) { glm = v2; }
                    else if (v2 > gbv) { gbv = v2; gbs = s2; }
                }
                i++;
            } while (i < hi);
            if (gtot > 0) {
                int64_t cs, cc;
                if (gbs < 0) { cs = 6; cc = glm; }
                else { cs = gbs; cc = gbv; }
                o_g[w] = (int32_t)dr_f;
                o_p[w] = (int32_t)posk;
                o_st[w] = 1;
                o_cs[w] = (int32_t)cs;
                o_cc[w] = (int32_t)cc;
                o_tot[w] = (int32_t)(lmo ? cc : gtot);
                w++;
            }
        }
    };
    for (int64_t f = 0; f < n_frags; f++) {
        const int64_t f_start_w = w;
        const int64_t r_lo = fcd::frag_cnt[f], r_hi = fcd::frag_cnt[f + 1];
        int64_t nr = 0;
        int64_t seg_i[8], seg_e[8];
        for (int64_t ri = r_lo; ri < r_hi && nr < 8; ri++) {
            const int64_t r = fcd::frag_read[ri];
            if (fcd::roff[r] < fcd::roff[r + 1]) {
                seg_i[nr] = fcd::roff[r];
                seg_e[nr] = fcd::roff[r + 1];
                nr++;
            }
        }
        if (r_hi - r_lo > 8) {
            // absurd read multiplicity: bail to the sorting path
            return -1;
        }
        if (nr == 0) continue;
        cur_f = f;
        cur_gp = NOKEY;
        if (nr == 1) {
            // single read: keys are unique, emit groups directly
            dr_f = f;
            direct_range(seg_i[0], seg_e[0]);
            if (pdx::armed && w > f_start_w) {
                pdx_run_frag(f_start_w, w, f);
            }
            continue;
        } else if (nr == 2) {
            int64_t i0 = seg_i[0], e0 = seg_e[0];
            int64_t i1 = seg_i[1], e1 = seg_e[1];
            // non-overlapping mates (the dominant paired-end layout when
            // insert > 2*readlen): the two key-sorted ranges concatenate,
            // so the branchy two-way merge reduces to sequential feeds
            if ((rows[e0 - 1] >> 32) < (rows[i1] >> 32)
                || (rows[e1 - 1] >> 32) < (rows[i0] >> 32)) {
                if ((rows[i1] >> 32) < (rows[i0] >> 32)) {
                    std::swap(i0, i1);
                    std::swap(e0, e1);
                }
                dr_f = f;
                direct_range(i0, e0);
                direct_range(i1, e1);
                if (pdx::armed && w > f_start_w) {
                    pdx_run_frag(f_start_w, w, f);
                }
                continue;
            }
            while (i0 < e0 && i1 < e1) {
                const uint64_t k0 = rows[i0] >> 32, k1 = rows[i1] >> 32;
                if (k0 < k1) {
                    feed(k0, (int64_t)(uint32_t)rows[i0]); i0++;
                } else if (k1 < k0) {
                    feed(k1, (int64_t)(uint32_t)rows[i1]); i1++;
                } else {
                    const int64_t v0 = (int64_t)(uint32_t)rows[i0];
                    const int64_t v1 = (int64_t)(uint32_t)rows[i1];
                    feed(k0, v0 > v1 ? v0 : v1);
                    i0++; i1++;
                }
            }
            for (; i0 < e0; i0++)
                feed(rows[i0] >> 32, (int64_t)(uint32_t)rows[i0]);
            for (; i1 < e1; i1++)
                feed(rows[i1] >> 32, (int64_t)(uint32_t)rows[i1]);
        } else {
            while (true) {
                uint64_t mk = NOKEY;
                for (int64_t c = 0; c < nr; c++)
                    if (seg_i[c] < seg_e[c]) {
                        const uint64_t k = rows[seg_i[c]] >> 32;
                        if (k < mk) mk = k;
                    }
                if (mk == NOKEY) break;
                int64_t acc = INT64_MIN;
                for (int64_t c = 0; c < nr; c++)
                    while (seg_i[c] < seg_e[c]
                           && (rows[seg_i[c]] >> 32) == mk) {
                        const int64_t v = (int64_t)(uint32_t)rows[seg_i[c]];
                        if (v > acc) acc = v;
                        seg_i[c]++;
                    }
                feed(mk, acc);
            }
        }
        flush();
        if (pdx::armed && w > f_start_w) {
            pdx_run_frag(f_start_w, w, f);
        }
    }
    rc::cg.resize(w); rc::cp_.resize(w); rc::cst.resize(w);
    rc::ccs.resize(w); rc::ccc.resize(w); rc::ctot.resize(w);
    return w;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Direct family dual-reduction: replaces rc2_run_fc's radix sort the same
// way frag_cons_direct replaces rc_run's.  Fragment-consensus rows arrive
// grouped by fragment id ascending with strictly increasing (pos, con_sym)
// keys inside (frag_cons_direct / rc_run output order), so grouping by
// family is a counting sort over fragments plus a per-family k-way merge
// (k = family size; 1 for non-UMI data).  Fills the same static buffers as
// rc2_run_fc (ug/uv famcov uniques read in-place by fq_sweep2_kernel,
// cons1 = famcov consensus, cons2 = BQ-weighted consensus); identical
// output order.  Returns ug.size() or -1 on an input-order violation
// (caller falls back to rc2_run_fc).

template <class TI>
static int64_t fam_cons_core(int64_t n, const TI *frag,
                             const TI *pos, const TI *sym,
                             const TI *con_cnt, const TI *tot,
                             const TI *st, const int64_t *fam_of_frag,
                             int64_t n_frags, int64_t n_fams,
                             int64_t highbq_snv, int64_t P,
                             int64_t pdel_ign,
                             int64_t *fbeg, int64_t *fend) {
    int pos_bits = rc::bit_width_u64((uint64_t)(P > 1 ? P - 1 : 1));
    rc::g_P = P;
    rc::g_pos_bits = pos_bits;
    rc::ug.resize(n); rc::uv.resize(n);
    rc::ug2.resize(n); rc::uv2.resize(n);
    if (rc::bit_width_u64((uint64_t)(n_fams > 1 ? n_fams - 1 : 1))
        + pos_bits + 4 > 62)
        return -1;

    // 1) per-fragment row ranges (rows must be frag-ascending, key-sorted)
    fcd::soff.assign(n_frags + 1, 0);
    {
        int64_t f = 0, prev_f = -1;
        uint64_t prev_key = 0;
        for (int64_t i = 0; i < n; i++) {
            const int64_t fr = frag[i];
            if (fr < prev_f || fr < 0 || fr >= n_frags) return -1;
            const uint64_t key = ((uint64_t)pos[i] << 4) | (uint64_t)sym[i];
            if (fr == prev_f && key <= prev_key) return -1;
            while (f < fr) { fcd::soff[f + 1] = i; f++; }
            prev_f = fr;
            prev_key = key;
        }
        while (f < n_frags) { fcd::soff[f + 1] = n; f++; }
    }

    // 2) family -> member fragments (stable counting sort)
    fcd::frag_cnt.assign(n_fams + 1, 0);
    for (int64_t fr = 0; fr < n_frags; fr++) {
        const int64_t fm = fam_of_frag[fr];
        if (fm < 0 || fm >= n_fams) return -3;
        fcd::frag_cnt[fm + 1]++;
    }
    for (int64_t fm = 0; fm < n_fams; fm++)
        fcd::frag_cnt[fm + 1] += fcd::frag_cnt[fm];
    fcd::frag_read.resize(n_frags);
    {
        std::vector<int64_t> fill(fcd::frag_cnt.begin(),
                                  fcd::frag_cnt.end() - 1);
        for (int64_t fr = 0; fr < n_frags; fr++)
            fcd::frag_read[fill[fam_of_frag[fr]]++] = fr;
    }

    // per-family covered-position extent over the RAW fragment rows
    // (engine_fq._c2_bias fbeg/fend; rows per fragment are key-sorted, so
    // the first/last row of each member give its extent)
    if (fbeg != nullptr && fend != nullptr) {
        for (int64_t fm = 0; fm < n_fams; fm++) {
            int64_t b = INT64_MAX, e = -1;
            for (int64_t fi = fcd::frag_cnt[fm]; fi < fcd::frag_cnt[fm + 1];
                 fi++) {
                const int64_t fr = fcd::frag_read[fi];
                if (fcd::soff[fr] < fcd::soff[fr + 1]) {
                    const int64_t pb = pos[fcd::soff[fr]];
                    const int64_t pe = pos[fcd::soff[fr + 1] - 1];
                    if (pb < b) b = pb;
                    if (pe > e) e = pe;
                }
            }
            fbeg[fm] = b;
            fend[fm] = e;
        }
    }

    // 3) per-family merge: acc1 = #rows passing the sweep-1 filter,
    //    acc2 = sum of adj (rows with adj <= 0 skipped entirely)
    rcdiag::Phase ph("famd.merge");
    const uint64_t NOKEY = ~(uint64_t)0;
    int64_t *u1k = rc::ug.data(), *u1v = rc::uv.data();
    int64_t *u2k = rc::ug2.data(), *u2v = rc::uv2.data();
    int64_t w1 = 0, w2 = 0;
    for (int64_t fm = 0; fm < n_fams; fm++) {
        const int64_t f_lo = fcd::frag_cnt[fm], f_hi = fcd::frag_cnt[fm + 1];
        const uint64_t fam_hi = ((uint64_t)fm << pos_bits);
        auto emit = [&](uint64_t mk, int64_t acc1, int64_t acc2) {
            if (acc2 <= 0) return;
            const int64_t packed =
                (int64_t)(((fam_hi | (mk >> 4)) << 4) | (mk & 15));
            if (acc1 > 0) {
                u1k[w1] = packed;
                u1v[w1] = acc1;
                w1++;
            }
            u2k[w2] = packed;
            u2v[w2] = acc2;
            w2++;
        };
        if (f_hi - f_lo == 1) {
            // dominant (non-UMI) case: family == fragment, keys unique
            const int64_t fr = fcd::frag_read[f_lo];
            for (int64_t i = fcd::soff[fr]; i < fcd::soff[fr + 1]; i++) {
                const int64_t adj = 2 * con_cnt[i] - tot[i];
                if (adj <= 0) continue;
                const uint64_t mk = ((uint64_t)pos[i] << 4)
                    | (uint64_t)sym[i];
                emit(mk, (st[i] == 1
                          || (adj >= highbq_snv
                              && !(pdel_ign && sym[i] >= 4))) ? 1 : 0, adj);
            }
            continue;
        }
        fcd::curs.clear();
        for (int64_t fi = f_lo; fi < f_hi; fi++) {
            const int64_t fr = fcd::frag_read[fi];
            if (fcd::soff[fr] < fcd::soff[fr + 1])
                fcd::curs.push_back({fcd::soff[fr], fcd::soff[fr + 1]});
        }
        const int m = (int)fcd::curs.size();
        if (m == 0) continue;
        while (true) {
            uint64_t mk = NOKEY;
            for (int c = 0; c < m; c++) {
                const auto &cu = fcd::curs[c];
                if (cu.i < cu.end) {
                    const uint64_t k = ((uint64_t)pos[cu.i] << 4)
                        | (uint64_t)sym[cu.i];
                    if (k < mk) mk = k;
                }
            }
            if (mk == NOKEY) break;
            int64_t acc1 = 0, acc2 = 0;
            for (int c = 0; c < m; c++) {
                auto &cu = fcd::curs[c];
                while (cu.i < cu.end
                       && ((((uint64_t)pos[cu.i] << 4)
                            | (uint64_t)sym[cu.i]) == mk)) {
                    const int64_t adj = 2 * con_cnt[cu.i] - tot[cu.i];
                    if (adj > 0) {
                        acc1 += (st[cu.i] == 1
                                 || (adj >= highbq_snv
                                     && !(pdel_ign && sym[cu.i] >= 4)))
                            ? 1 : 0;
                        acc2 += adj;
                    }
                    cu.i++;
                }
            }
            emit(mk, acc1, acc2);
        }
    }
    rc::ug.resize(w1); rc::uv.resize(w1);
    rc::ug2.resize(w2); rc::uv2.resize(w2);
    rc::consensus_scan(rc::ug, rc::uv, pos_bits, false,
                       rc::cg, rc::cp_, rc::cst, rc::ccs, rc::ccc, rc::ctot);
    rc::consensus_scan(rc::ug2, rc::uv2, pos_bits, false,
                       rc::c2g, rc::c2p, rc::c2st, rc::c2cs, rc::c2cc,
                       rc::c2tot);
    return w1;
}

extern "C" {

int64_t fam_cons_direct(int64_t n, const int64_t *frag, const int64_t *pos,
                        const int64_t *sym, const int64_t *con_cnt,
                        const int64_t *tot, const int64_t *st,
                        const int64_t *fam_of_frag, int64_t n_frags,
                        int64_t n_fams, int64_t highbq_snv, int64_t P,
                        int64_t pdel_ign) {
    return fam_cons_core(n, frag, pos, sym, con_cnt, tot, st, fam_of_frag,
                         n_frags, n_fams, highbq_snv, P, pdel_ign,
                         nullptr, nullptr);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Statics-resident region fast path.  The fragment-consensus rows produced
// by frag_cons_direct (~depth x P rows) stay inside the thread_local
// rc:: buffers for the whole pass-D + family chain instead of being copied
// into numpy and passed back for every kernel: pass_d_statics reads them
// in place (emitting only the SPARSE mutated / indel-winner rows that the
// python phase-signature and exact-indel passes need), fam_cons_statics
// swaps them into scratch (O(1)) and reduces them into the family tables,
// and the sweep kernels read those tables in place, again emitting only
// sparse good-family / mutated rows.  This removes ~n_rows*6*8B*4 of
// memcpy + numpy allocation per region and keeps the whole chain
// GIL-free.  Replaces the dense-row protocol of updateByAlns3UsingFQ
// (/root/reference/main.hpp:2832-3594) with zero row materialization.

namespace sres {
// swapped-in fragment rows (inputs of the family merge)
static thread_local std::vector<int32_t> in_g, in_p, in_st, in_cs, in_cc,
    in_tot;
// pass_d sparse outputs
static thread_local std::vector<int64_t> mutf, mutp, mutst, muts;
static thread_local std::vector<int64_t> winf, winp, wins;
// sweep-1 good-family rows
static thread_local std::vector<int64_t> g1g, g1p, g1st, g1s, g1c, g1t;
// sweep-2 phase-eligible rows (+ confam_ok flag)
static thread_local std::vector<int64_t> m2g, m2p, m2st, m2s, m2ok;
}  // namespace sres

// pass-D per-fragment body over freshly merged consensus rows [lo, hi)
// (identical math to pass_d_statics; runs inline from the fragment merge
// while the rows are cache-hot)
static void pdx_run_frag(int64_t lo, int64_t hi, int64_t fr) {
    const int64_t NS = 14;
    const int NBUCKETS = 16;
    const int32_t *g_pos = rc::cp_.data(), *g_st = rc::cst.data();
    const int32_t *con_sym = rc::ccs.data(), *con_cnt = rc::ccc.data();
    const int32_t *tot = rc::ctot.data();
    const int64_t strand = pdx::frag_strand[fr];
    const int64_t mq2 = pdx::normMQ[fr] * pdx::normMQ[fr] / 32;
    pdx::cov_pos.clear();
    pdx::mut_pos.clear();
    for (int64_t k = lo; k < hi; k++) {
        const int64_t pos = g_pos[k];
        const int64_t sym = con_sym[k];
        const int64_t idx = pos * NS + sym;
        const int64_t cq = con_cnt[k] * 2 - tot[k];
        const int64_t maxq = 8 + pdx::bg[idx]
            / imax(pdx::aDP4[idx], (int64_t)1);
        const int64_t phredlike = imin(cq, maxq);
        int64_t pb = maxq - phredlike;
        if (pb < 0) pb = 0;
        if (pb < NBUCKETS) pdx::hist[idx * NBUCKETS + pb] += 1;
        pdx::bdp[idx * 2 + strand] += 1;
        pdx::vq_bMQ[idx] += mq2;
        bool mut;
        if (g_st[k] == 0) {
            const int64_t rs = pdx::ref_syms[pos];
            mut = (rs != sym) && (rs < 4) && (sym < 4)
                  && (cq >= pdx::highbq);
        } else {
            mut = (sym != 6) && (sym != 13);
            if (sym >= 7 && sym <= 12) {
                sres::winf.push_back(fr);
                sres::winp.push_back(pos);
                sres::wins.push_back(sym);
            }
        }
        if (mut) {
            sres::mutf.push_back(fr);
            sres::mutp.push_back(pos);
            sres::mutst.push_back(g_st[k]);
            sres::muts.push_back(sym);
        }
        if (pdx::cov_pos.empty() || pdx::cov_pos.back() != pos)
            pdx::cov_pos.push_back(pos);
        if (mut && (pdx::mut_pos.empty() || pdx::mut_pos.back() != pos))
            pdx::mut_pos.push_back(pos);
    }
    const int64_t n_cov = (int64_t)pdx::cov_pos.size();
    int64_t n_near = 0;
    if (!pdx::mut_pos.empty()) {
        size_t mi = 0;
        for (int64_t p : pdx::cov_pos) {
            while (mi + 1 < pdx::mut_pos.size()
                   && pdx::mut_pos[mi] < p - pdx::W)
                mi++;
            bool near = false;
            for (size_t m2 = mi; m2 < pdx::mut_pos.size()
                     && pdx::mut_pos[m2] <= p + pdx::W; m2++) {
                if (pdx::mut_pos[m2] >= p - pdx::W) { near = true; break; }
            }
            if (near) n_near++;
        }
    }
    if (n_cov > 0 || n_near > 0) {
        for (int64_t k = lo; k < hi; k++) {
            const int64_t idx = g_pos[k] * NS + con_sym[k];
            pdx::bta[idx * 2 + strand] += n_cov;
            pdx::btb[idx * 2 + strand] += n_near;
        }
    }
}

extern "C" {

// arm the pass-D fusion for the NEXT frag_cons_direct call on this
// thread; disarmed by frag_cons_pass_d_counts (the fetch)
void frag_cons_arm_pass_d(
    const int64_t *bg, const int64_t *aDP4, const int64_t *ref_syms,
    const int64_t *frag_strand, const int64_t *normMQ,
    int64_t P, int64_t highbq_thres, int64_t mut_window,
    int32_t *bdp, int32_t *bta, int32_t *btb, int32_t *vq_bMQ,
    int32_t *hist) {
    pdx::bg = bg; pdx::aDP4 = aDP4; pdx::ref_syms = ref_syms;
    pdx::frag_strand = frag_strand; pdx::normMQ = normMQ;
    pdx::P = P; pdx::highbq = highbq_thres; pdx::W = mut_window;
    pdx::bdp = bdp; pdx::bta = bta; pdx::btb = btb;
    pdx::vq_bMQ = vq_bMQ; pdx::hist = hist;
    sres::mutf.clear(); sres::mutp.clear();
    sres::mutst.clear(); sres::muts.clear();
    sres::winf.clear(); sres::winp.clear(); sres::wins.clear();
    pdx::armed = true;
}

void frag_cons_pass_d_counts(int64_t *out2) {
    out2[0] = (int64_t)sres::mutf.size();
    out2[1] = (int64_t)sres::winf.size();
    pdx::armed = false;
}

int64_t frag_cons_nrows() { return (int64_t)rc::cg.size(); }

// pass_d_kernel over the resident rows; sparse mut/win outputs.
int pass_d_statics(
    const int64_t *bg, const int64_t *aDP4, const int64_t *ref_syms,
    const int64_t *frag_strand, const int64_t *normMQ,
    int64_t P, int64_t n_frags, int64_t highbq_thres, int64_t mut_window,
    int32_t *bdp, int32_t *bta, int32_t *btb,  // [P*14*2]
    int32_t *vq_bMQ,                            // [P*14]
    int32_t *hist,                              // [P*14*16]
    int64_t *counts_out                         // [2]: n_mut, n_win
) {
    const int64_t NS = 14;
    const int NBUCKETS = 16;
    const int64_t n_rows = (int64_t)rc::cg.size();
    const int32_t *g_frag = rc::cg.data(), *g_pos = rc::cp_.data();
    const int32_t *g_st = rc::cst.data(), *con_sym = rc::ccs.data();
    const int32_t *con_cnt = rc::ccc.data(), *tot = rc::ctot.data();
    sres::mutf.clear(); sres::mutp.clear();
    sres::mutst.clear(); sres::muts.clear();
    sres::winf.clear(); sres::winp.clear(); sres::wins.clear();
    std::vector<int64_t> cov_pos, mut_pos;
    int64_t i = 0;
    while (i < n_rows) {
        const int64_t fr = g_frag[i];
        if (fr < 0 || fr >= n_frags) return -1;
        int64_t j = i;
        while (j < n_rows && g_frag[j] == fr) j++;
        const int64_t strand = frag_strand[fr];
        const int64_t mq2 = normMQ[fr] * normMQ[fr] / 32;
        cov_pos.clear();
        mut_pos.clear();
        for (int64_t k = i; k < j; k++) {
            const int64_t pos = g_pos[k];
            const int64_t sym = con_sym[k];
            if ((uint64_t)pos >= (uint64_t)P || (uint64_t)sym >= 14u)
                return -1;
            const int64_t idx = pos * NS + sym;
            const int64_t cq = con_cnt[k] * 2 - tot[k];
            const int64_t maxq = 8 + bg[idx] / imax(aDP4[idx], (int64_t)1);
            const int64_t phredlike = imin(cq, maxq);
            int64_t pb = maxq - phredlike;
            if (pb < 0) pb = 0;
            if (pb < NBUCKETS) hist[idx * NBUCKETS + pb] += 1;
            bdp[idx * 2 + strand] += 1;
            vq_bMQ[idx] += mq2;
            bool mut;
            if (g_st[k] == 0) {
                const int64_t rs = ref_syms[pos];
                mut = (rs != sym) && (rs < 4) && (sym < 4)
                      && (cq >= highbq_thres);
            } else {
                mut = (sym != 6) && (sym != 13);
                if (sym >= 7 && sym <= 12) {
                    sres::winf.push_back(fr);
                    sres::winp.push_back(pos);
                    sres::wins.push_back(sym);
                }
            }
            if (mut) {
                sres::mutf.push_back(fr);
                sres::mutp.push_back(pos);
                sres::mutst.push_back(g_st[k]);
                sres::muts.push_back(sym);
            }
            if (cov_pos.empty() || cov_pos.back() != pos)
                cov_pos.push_back(pos);
            if (mut && (mut_pos.empty() || mut_pos.back() != pos))
                mut_pos.push_back(pos);
        }
        int64_t n_cov = (int64_t)cov_pos.size();
        int64_t n_near = 0;
        if (!mut_pos.empty()) {
            size_t mi = 0;
            for (int64_t p : cov_pos) {
                while (mi + 1 < mut_pos.size() && mut_pos[mi] < p - mut_window)
                    mi++;
                bool near = false;
                for (size_t m2 = mi; m2 < mut_pos.size()
                         && mut_pos[m2] <= p + mut_window; m2++) {
                    if (mut_pos[m2] >= p - mut_window) { near = true; break; }
                }
                if (near) n_near++;
            }
        }
        for (int64_t k = i; k < j; k++) {
            const int64_t idx = g_pos[k] * NS + con_sym[k];
            bta[idx * 2 + strand] += n_cov;
            btb[idx * 2 + strand] += n_near;
        }
        i = j;
    }
    counts_out[0] = (int64_t)sres::mutf.size();
    counts_out[1] = (int64_t)sres::winf.size();
    return 0;
}

void pass_d_fetch_mut(int64_t *f, int64_t *p, int64_t *st, int64_t *s) {
    copy_n(f, sres::mutf.data(), sres::mutf.size() * 8);
    copy_n(p, sres::mutp.data(), sres::mutp.size() * 8);
    copy_n(st, sres::mutst.data(), sres::mutst.size() * 8);
    copy_n(s, sres::muts.data(), sres::muts.size() * 8);
}

void pass_d_fetch_win(int64_t *f, int64_t *p, int64_t *s) {
    copy_n(f, sres::winf.data(), sres::winf.size() * 8);
    copy_n(p, sres::winp.data(), sres::winp.size() * 8);
    copy_n(s, sres::wins.data(), sres::wins.size() * 8);
}

// family merge over the resident rows: O(1)-swaps them into scratch, runs
// fam_cons_core (famcov uniques + both consensus tables land back in the
// rc:: statics), and reports per-family extents.  On validation failure
// the rows are swapped back so the caller can fetch them for the
// fallback path.
int64_t fam_cons_statics(const int64_t *fam_of_frag, int64_t n_frags,
                         int64_t n_fams, int64_t highbq_snv, int64_t P,
                         int64_t pdel_ign,
                         int64_t *fbeg, int64_t *fend) {
    const int64_t n = (int64_t)rc::cg.size();
    std::swap(rc::cg, sres::in_g);
    std::swap(rc::cp_, sres::in_p);
    std::swap(rc::cst, sres::in_st);
    std::swap(rc::ccs, sres::in_cs);
    std::swap(rc::ccc, sres::in_cc);
    std::swap(rc::ctot, sres::in_tot);
    const int64_t w1 = fam_cons_core(
        n, sres::in_g.data(), sres::in_p.data(), sres::in_cs.data(),
        sres::in_cc.data(), sres::in_tot.data(), sres::in_st.data(),
        fam_of_frag, n_frags, n_fams, highbq_snv, P, pdel_ign, fbeg,
        fend);
    if (w1 < 0) {
        std::swap(rc::cg, sres::in_g);
        std::swap(rc::cp_, sres::in_p);
        std::swap(rc::cst, sres::in_st);
        std::swap(rc::ccs, sres::in_cs);
        std::swap(rc::ccc, sres::in_cc);
        std::swap(rc::ctot, sres::in_tot);
    }
    return w1;
}

// fq_sweep1_kernel over the resident famcov consensus (rc::cg...), with
// the strand/has-umi gathers done in-kernel; emits good-family rows
// sparsely.  Returns the good-row count.
int64_t fq_sweep1_statics(
    const int64_t *fam_strand, const int64_t *fam_dflag,
    int64_t P,
    int64_t dup1add, int64_t dup1perc, int64_t dup2add, int64_t dup2perc,
    int64_t fam_flag,
    int64_t emperr_snv, int64_t emperc_snv,
    int64_t emperr_indel, int64_t emperc_indel,
    int32_t *cdp12, int32_t *cdp21, int32_t *cdp2, int32_t *cdp3,
    int32_t *cdpm, int32_t *cdpM) {
    const int64_t NS = 14;
    const bool flag2 = (fam_flag & 0x2) != 0;
    const int64_t n = (int64_t)rc::cg.size();
    sres::g1g.clear(); sres::g1p.clear(); sres::g1st.clear();
    sres::g1s.clear(); sres::g1c.clear(); sres::g1t.clear();
    for (int64_t i = 0; i < n; i++) {
        const int64_t g = rc::cg[i], pos = rc::cp_[i], st = rc::cst[i];
        const int64_t sym = rc::ccs[i], cnt = rc::ccc[i], tot = rc::ctot[i];
        const int64_t strand = fam_strand[g];
        const int64_t idx = (pos * NS + sym) * 2 + strand;
        cdp12[idx] += 1;
        if (tot == 1) cdp21[idx] += 1;
        const bool umi = (fam_dflag[g] & 0x1) != 0;
        const bool good = tot >= dup1add && cnt * 100 >= tot * dup1perc
            && (umi || flag2);
        if (good) {
            cdp2[idx] += 1;
            sres::g1g.push_back(g);
            sres::g1p.push_back(pos);
            sres::g1st.push_back(st);
            sres::g1s.push_back(sym);
            sres::g1c.push_back(cnt);
            sres::g1t.push_back(tot);
        }
        if (tot >= dup2add && cnt * 100 >= tot * dup2perc) cdp3[idx] += 1;
        const bool is_base = sym < 6;
        const int64_t emperr = is_base ? emperr_snv : emperr_indel;
        const int64_t emperc = is_base ? emperc_snv : emperc_indel;
        if (tot >= emperr && cnt * 100 >= tot * emperc) {
            cdpm[idx] += tot - cnt;
            cdpM[idx] += tot * (is_base ? 5 : 7);
        }
    }
    return (int64_t)sres::g1g.size();
}

void fq_fetch_good(int64_t *g, int64_t *p, int64_t *st, int64_t *s,
                   int64_t *c, int64_t *t) {
    copy_n(g, sres::g1g.data(), sres::g1g.size() * 8);
    copy_n(p, sres::g1p.data(), sres::g1p.size() * 8);
    copy_n(st, sres::g1st.data(), sres::g1st.size() * 8);
    copy_n(s, sres::g1s.data(), sres::g1s.size() * 8);
    copy_n(c, sres::g1c.data(), sres::g1c.size() * 8);
    copy_n(t, sres::g1t.data(), sres::g1t.size() * 8);
}

// fq_sweep2_kernel over the resident fammmm consensus (rc::c2g...) and
// famcov unique table (rc::ug/uv); emits phase-eligible rows sparsely.
// Returns the mut-row count, or -1 on a stale-table state.
int64_t fq_sweep2_statics(
    const int64_t *fam_strand, const int64_t *ref_syms,
    const int64_t *sscs_flat,
    const int32_t *cdpM, const int32_t *cdpm,  // [P,14,2]
    int64_t P, int64_t rescue_add, int64_t fam_phred_indel_inc,
    int64_t dup1add, int64_t dup1perc, int64_t highbq_thres,
    int32_t *cdp1,                        // [P,14,2] zeroed by caller
    int32_t *hist                         // [2,P,14,16] zeroed by caller
) {
    const int64_t NS = 14;
    const double INV_LOG10 = 10.0 / std::log(10.0);
    int pos_bits = 1;
    while (((int64_t)1 << pos_bits) < P) pos_bits++;
    if (rc::g_pos_bits != pos_bits) return -1;
    const int64_t n2 = (int64_t)rc::c2g.size();
    const int64_t nu = (int64_t)rc::ug.size();
    const int64_t *iug = rc::ug.data();
    const int64_t *iuv = rc::uv.data();
    sres::m2g.clear(); sres::m2p.clear(); sres::m2st.clear();
    sres::m2s.clear(); sres::m2ok.clear();
    static const int RP_POW10_N = 256;
    static thread_local std::vector<double> rp_pow10;
    if (rp_pow10.empty()) {
        rp_pow10.resize(RP_POW10_N);
        for (int q = 0; q < RP_POW10_N; q++)
            rp_pow10[q] = std::pow(10.0, -(double)q / 10.0);
    }
    static thread_local std::vector<int64_t> rp_memo_key;
    static thread_local std::vector<double> rp_memo_val;
    rp_memo_key.assign((size_t)(P * NS * 2), INT64_MIN);
    rp_memo_val.resize((size_t)(P * NS * 2));
    int64_t tp = 0;
    for (int64_t i = 0; i < n2; i++) {
        const int64_t g = rc::c2g[i], pos = rc::c2p[i], st = rc::c2st[i];
        const int64_t con_sym = rc::c2cs[i], con_cnt = rc::c2cc[i];
        const int64_t tot = rc::c2tot[i];
        const int64_t strand = fam_strand[g];
        const int64_t idx = (pos * NS + con_sym) * 2 + strand;
        cdp1[idx] += 1;
        const uint64_t gp = ((uint64_t)g << pos_bits) | (uint64_t)pos;
        int64_t con_nfrags = 0, tot_nfrags = 0;
        while (tp < nu && ((uint64_t)iug[tp] >> 4) < gp) tp++;
        for (int64_t j = tp; j < nu; j++) {
            const uint64_t k = (uint64_t)iug[j];
            if ((k >> 4) != gp) break;
            const int64_t sj = (int64_t)(k & 15);
            if ((sj >= 6 ? 1 : 0) == st) tot_nfrags += iuv[j];
            if (sj == con_sym) con_nfrags = iuv[j];
        }
        const int64_t avgBQ = tot_nfrags == 0 ? 1
            : con_cnt / (tot_nfrags > 1 ? tot_nfrags : 1);
        const int64_t major = cdpM[idx];
        const int64_t minor = cdpm[idx];
        const double w = 1.0 / ((double)minor + 1.0);
        double realphred;
        if (rp_memo_key[idx] == avgBQ) {
            realphred = rp_memo_val[idx];
        } else {
            const double pw = (avgBQ >= 0 && avgBQ < RP_POW10_N)
                ? rp_pow10[avgBQ] : std::pow(10.0, -(double)avgBQ / 10.0);
            realphred = -INV_LOG10 * std::log(
                ((double)minor + w)
                / ((double)major + (double)minor + w / pw));
            rp_memo_key[idx] = avgBQ;
            rp_memo_val[idx] = realphred;
        }
        const int64_t indep = (int64_t)std::nearbyint(
            (double)(2 * con_nfrags - tot_nfrags) * realphred);
        int64_t confam;
        if (st == 1) {
            const int64_t cap = fam_phred_indel_inc
                + (int64_t)std::nearbyint(realphred);
            confam = indep < cap ? indep : cap;
        } else {
            const int64_t cap = 2 * con_cnt - tot;
            confam = indep < cap ? indep : cap;
        }
        if (confam < 1) confam = 1;
        const int64_t max_qual =
            sscs_flat[ref_syms[pos] * NS + con_sym] + rescue_add;
        const int64_t confam2 = confam < max_qual ? confam : max_qual;
        if (tot_nfrags >= dup1add) {
            int64_t d = max_qual - confam2 + 2;
            int64_t pb = d >= 0 ? d / 4 : -((-d + 3) / 4);
            if (pb < 0) pb = 0;
            if (pb > 15) pb = 15;
            hist[((strand * P + pos) * NS + con_sym) * 16 + pb] += 1;
        }
        bool mut;
        if (st == 0) {
            const int64_t rs = ref_syms[pos];
            mut = rs != con_sym && rs < 4 && con_sym < 4
                && confam >= highbq_thres;
        } else {
            mut = con_sym != 6 && con_sym != 13;
        }
        if (mut) {
            sres::m2g.push_back(g);
            sres::m2p.push_back(pos);
            sres::m2st.push_back(st);
            sres::m2s.push_back(con_sym);
            sres::m2ok.push_back(
                (tot_nfrags >= dup1add
                 && con_nfrags * 100 >= tot_nfrags * dup1perc) ? 1 : 0);
        }
    }
    return (int64_t)sres::m2g.size();
}

void fq_fetch_mut2(int64_t *g, int64_t *p, int64_t *st, int64_t *s,
                   int64_t *ok) {
    copy_n(g, sres::m2g.data(), sres::m2g.size() * 8);
    copy_n(p, sres::m2p.data(), sres::m2p.size() * 8);
    copy_n(st, sres::m2st.data(), sres::m2st.size() * 8);
    copy_n(s, sres::m2s.data(), sres::m2s.size() * 8);
    copy_n(ok, sres::m2ok.data(), sres::m2ok.size() * 8);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fully fused family chain: ONE walk over the resident fragment rows does
// the family merge, BOTH consensus scans (plain rule) and sweep 1 inline;
// sweep 2 runs over compact stored rows with con_nfrags/tot_nfrags
// captured at flush time (so its famcov-unique merge scan disappears).
// Replaces fam_cons_statics + fq_sweep1_statics + fq_sweep2_statics
// (4 walks + two materialized unique/consensus table sets) with ~1.3
// walks and one compact int32 row store.  The fragment rows in rc:: are
// left untouched (read-only), so a failure never loses them.

namespace fch {
// pass-2 (sweep 2) compact rows
static thread_local std::vector<int32_t> s2g, s2p, s2meta, s2cc, s2tt,
    s2cnf, s2tnf;
}  // namespace fch

extern "C" {

int64_t fam_chain_statics(
    const int64_t *fam_of_frag, int64_t n_frags, int64_t n_fams,
    int64_t highbq_snv, int64_t P, int64_t pdel_ign,
    const int64_t *fam_strand, const int64_t *fam_dflag,
    int64_t dup1add, int64_t dup1perc, int64_t dup2add, int64_t dup2perc,
    int64_t fam_flag,
    int64_t emperr_snv, int64_t emperc_snv,
    int64_t emperr_indel, int64_t emperc_indel,
    const int64_t *ref_syms, const int64_t *sscs_flat,
    int64_t rescue_add, int64_t fam_phred_indel_inc, int64_t highbq_thres,
    int32_t *cdp12, int32_t *cdp21, int32_t *cdp2, int32_t *cdp3,
    int32_t *cdpm, int32_t *cdpM,         // [P,14,2] zeroed by caller
    int32_t *cdp1,                        // [P,14,2] zeroed by caller
    int32_t *hist,                        // [2,P,14,16] zeroed by caller
    int64_t *fbeg, int64_t *fend,         // [n_fams]
    int64_t *counts_out                   // [2]: n_good, n_mut
) {
    const int64_t NS = 14;
    const int64_t n = (int64_t)rc::cg.size();
    const int32_t *frag = rc::cg.data(), *pos = rc::cp_.data();
    const int32_t *sym = rc::ccs.data(), *con_cnt = rc::ccc.data();
    const int32_t *tot_in = rc::ctot.data();
    const bool flag2 = (fam_flag & 0x2) != 0;

    // 1) per-fragment row ranges (rows must be frag-ascending, key-sorted)
    fcd::soff.assign(n_frags + 1, 0);
    {
        rcdiag::Phase ph("fch.soff");
        int64_t f = 0, prev_f = -1;
        uint64_t prev_key = 0;
        for (int64_t i = 0; i < n; i++) {
            const int64_t fr = frag[i];
            if (fr < prev_f || fr < 0 || fr >= n_frags) return -1;
            if ((uint64_t)pos[i] >= (uint64_t)P || (uint64_t)sym[i] >= 14u)
                return -1;
            const uint64_t key = ((uint64_t)pos[i] << 4) | (uint64_t)sym[i];
            if (fr == prev_f && key <= prev_key) return -1;
            while (f < fr) { fcd::soff[f + 1] = i; f++; }
            prev_f = fr;
            prev_key = key;
        }
        while (f < n_frags) { fcd::soff[f + 1] = n; f++; }
    }

    // 2) family -> member fragments + extents
    fcd::frag_cnt.assign(n_fams + 1, 0);
    for (int64_t fr = 0; fr < n_frags; fr++) {
        const int64_t fm = fam_of_frag[fr];
        if (fm < 0 || fm >= n_fams) return -3;
        fcd::frag_cnt[fm + 1]++;
    }
    for (int64_t fm = 0; fm < n_fams; fm++)
        fcd::frag_cnt[fm + 1] += fcd::frag_cnt[fm];
    fcd::frag_read.resize(n_frags);
    {
        std::vector<int64_t> fill(fcd::frag_cnt.begin(),
                                  fcd::frag_cnt.end() - 1);
        for (int64_t fr = 0; fr < n_frags; fr++)
            fcd::frag_read[fill[fam_of_frag[fr]]++] = fr;
    }
    for (int64_t fm = 0; fm < n_fams; fm++) {
        int64_t b = INT64_MAX, e = -1;
        for (int64_t fi = fcd::frag_cnt[fm]; fi < fcd::frag_cnt[fm + 1];
             fi++) {
            const int64_t fr = fcd::frag_read[fi];
            if (fcd::soff[fr] < fcd::soff[fr + 1]) {
                const int64_t pb = pos[fcd::soff[fr]];
                const int64_t pe = pos[fcd::soff[fr + 1] - 1];
                if (pb < b) b = pb;
                if (pe > e) e = pe;
            }
        }
        fbeg[fm] = b;
        fend[fm] = e;
    }

    // interleaved per-(pos,sym,strand) counter block: the 7 cdp planes
    // live in ONE 28-byte group so a flush touches 1-2 cache lines
    // instead of 5-7 scattered arrays; de-interleaved into the caller's
    // planes at the end (sequential)
    static thread_local std::vector<int32_t> cdp_il;
    cdp_il.assign((size_t)(P * NS * 2) * 7, 0);
    int32_t *il_base = cdp_il.data();

    // 3) merge + inline consensus + sweep 1
    rcdiag::Phase *ph_m = new rcdiag::Phase("fch.merge");
    sres::g1g.clear(); sres::g1p.clear(); sres::g1st.clear();
    sres::g1s.clear(); sres::g1c.clear(); sres::g1t.clear();
    // pointer-written pass-2 rows (upper bound: one per input row)
    fch::s2g.resize(n); fch::s2p.resize(n); fch::s2meta.resize(n);
    fch::s2cc.resize(n); fch::s2tt.resize(n);
    fch::s2cnf.resize(n); fch::s2tnf.resize(n);
    int32_t *w_g = fch::s2g.data(), *w_p = fch::s2p.data();
    int32_t *w_meta = fch::s2meta.data(), *w_cc = fch::s2cc.data();
    int32_t *w_tt = fch::s2tt.data(), *w_cnf = fch::s2cnf.data();
    int32_t *w_tnf = fch::s2tnf.data();
    int64_t w2 = 0;
    const uint64_t NOKEY = ~(uint64_t)0;
    for (int64_t fm = 0; fm < n_fams; fm++) {
        const int64_t f_lo = fcd::frag_cnt[fm], f_hi = fcd::frag_cnt[fm + 1];
        const int64_t strand = fam_strand[fm];
        const bool umi = (fam_dflag[fm] & 0x1) != 0;
        // per-(pos,st) consensus state for famcov (1) and fammmm (2).
        // tot_nfrags of the sweep-2 gather IS the famcov group total t1,
        // and con_nfrags is the famcov count of the fammmm winner,
        // captured at winner-update time -- no per-position window state.
        uint64_t cur_ps = NOKEY;   // (pos<<1)|st of the open groups
        int64_t t1 = 0, bv1 = -1, bs1 = -1;
        int64_t t2 = 0, bv2 = -1, bs2 = -1, cnf2 = 0;
        auto flush = [&]() {
            if (cur_ps == NOKEY) return;
            const int64_t fpos = (int64_t)(cur_ps >> 1);
            const int64_t fst = (int64_t)(cur_ps & 1);
            if (t1 > 0) {
                // sweep 1 on the famcov consensus row
                const int64_t cs = bs1, cc = bv1;
                const int64_t idx = (fpos * NS + cs) * 2 + strand;
                int32_t *il = il_base + idx * 7;
                il[0] += 1;                          // cdp12
                if (t1 == 1) il[1] += 1;             // cdp21
                const bool good = t1 >= dup1add
                    && cc * 100 >= t1 * dup1perc && (umi || flag2);
                if (good) {
                    il[2] += 1;                      // cdp2
                    sres::g1g.push_back(fm);
                    sres::g1p.push_back(fpos);
                    sres::g1st.push_back(fst);
                    sres::g1s.push_back(cs);
                    sres::g1c.push_back(cc);
                    sres::g1t.push_back(t1);
                }
                if (t1 >= dup2add && cc * 100 >= t1 * dup2perc)
                    il[3] += 1;                      // cdp3
                const bool is_base = cs < 6;
                const int64_t emperr = is_base ? emperr_snv : emperr_indel;
                const int64_t emperc = is_base ? emperc_snv : emperc_indel;
                if (t1 >= emperr && cc * 100 >= t1 * emperc) {
                    il[4] += t1 - cc;                // cdpm
                    il[5] += t1 * (is_base ? 5 : 7); // cdpM
                }
            }
            if (t2 > 0) {
                // store the fammmm consensus row for sweep 2
                w_g[w2] = (int32_t)fm;
                w_p[w2] = (int32_t)fpos;
                w_meta[w2] = (int32_t)(bs2 | (fst << 4) | (strand << 5));
                w_cc[w2] = (int32_t)bv2;
                w_tt[w2] = (int32_t)t2;
                w_cnf[w2] = (int32_t)cnf2;
                w_tnf[w2] = (int32_t)t1;
                w2++;
            }
            t1 = 0; bv1 = -1; bs1 = -1;
            t2 = 0; bv2 = -1; bs2 = -1; cnf2 = 0;
        };
        auto feed = [&](uint64_t mk, int64_t acc1, int64_t acc2) {
            if (acc2 <= 0) return;
            const int64_t s = (int64_t)(mk & 15);
            const int64_t st = s >= 6 ? 1 : 0;
            const uint64_t ps = ((mk >> 4) << 1) | (uint64_t)st;
            if (ps != cur_ps) {
                flush();
                cur_ps = ps;
            }
            if (acc1 > 0) {
                t1 += acc1;
                if (acc1 > bv1) { bv1 = acc1; bs1 = s; }
            }
            t2 += acc2;
            if (acc2 > bv2) { bv2 = acc2; bs2 = s; cnf2 = acc1; }
        };
        if (f_hi - f_lo == 1) {
            // dominant (non-UMI) case: one fragment per family, and the
            // incoming rows are one-per-(pos,st) already, so every row
            // IS its own consensus group for both tables -- inline the
            // whole per-row flush with no group state
            const int64_t fr = fcd::frag_read[f_lo];
            for (int64_t i = fcd::soff[fr]; i < fcd::soff[fr + 1]; i++) {
                const int64_t adj = 2 * con_cnt[i] - tot_in[i];
                if (adj <= 0) continue;
                const int64_t fpos = pos[i], s = sym[i];
                const int64_t fst = rc::cst[i];
                // padded-deletion BASE_N/NN fragments are excluded from
                // the filtered famcov container when pdel_ign (IonTorrent
                // arm of microadjust_padded_deletion_flag,
                // main.hpp:2905-2908 + fillConsensusCounts
                // TIgnorePaddedDel, main.hpp:410,481-485)
                const int64_t a1 = (fst == 1
                                    || (adj >= highbq_snv
                                        && !(pdel_ign && s >= 4))) ? 1 : 0;
                if (a1 > 0) {
                    const int64_t idx = (fpos * NS + s) * 2 + strand;
                    int32_t *il = il_base + idx * 7;
                    il[0] += 1;                      // cdp12
                    il[1] += 1;                      // cdp21 (tot == 1)
                    const bool good = 1 >= dup1add && 100 >= dup1perc
                        && (umi || flag2);
                    if (good) {
                        il[2] += 1;                  // cdp2
                        sres::g1g.push_back(fm);
                        sres::g1p.push_back(fpos);
                        sres::g1st.push_back(fst);
                        sres::g1s.push_back(s);
                        sres::g1c.push_back(1);
                        sres::g1t.push_back(1);
                    }
                    if (1 >= dup2add && 100 >= dup2perc) il[3] += 1;
                    const bool is_base = s < 6;
                    if (1 >= (is_base ? emperr_snv : emperr_indel)
                        && 100 >= (is_base ? emperc_snv : emperc_indel)) {
                        // cdpm += tot - cnt == 0; cdpM += tot * n_others
                        il[5] += (is_base ? 5 : 7);  // cdpM
                    }
                }
                w_g[w2] = (int32_t)fm;
                w_p[w2] = (int32_t)fpos;
                w_meta[w2] = (int32_t)(s | (fst << 4) | (strand << 5));
                w_cc[w2] = (int32_t)adj;
                w_tt[w2] = (int32_t)adj;
                w_cnf[w2] = (int32_t)a1;
                w_tnf[w2] = (int32_t)a1;
                w2++;
            }
            continue;
        }
        fcd::curs.clear();
        for (int64_t fi = f_lo; fi < f_hi; fi++) {
            const int64_t fr = fcd::frag_read[fi];
            if (fcd::soff[fr] < fcd::soff[fr + 1])
                fcd::curs.push_back({fcd::soff[fr], fcd::soff[fr + 1]});
        }
        const int m = (int)fcd::curs.size();
        if (m == 0) continue;
        while (true) {
            uint64_t mk = NOKEY;
            for (int c = 0; c < m; c++) {
                const auto &cu = fcd::curs[c];
                if (cu.i < cu.end) {
                    const uint64_t k = ((uint64_t)pos[cu.i] << 4)
                        | (uint64_t)sym[cu.i];
                    if (k < mk) mk = k;
                }
            }
            if (mk == NOKEY) break;
            int64_t acc1 = 0, acc2 = 0;
            for (int c = 0; c < m; c++) {
                auto &cu = fcd::curs[c];
                while (cu.i < cu.end
                       && ((((uint64_t)pos[cu.i] << 4)
                            | (uint64_t)sym[cu.i]) == mk)) {
                    const int64_t adj = 2 * con_cnt[cu.i] - tot_in[cu.i];
                    if (adj > 0) {
                        acc1 += (rc::cst[cu.i] == 1
                                 || (adj >= highbq_snv
                                     && !(pdel_ign && sym[cu.i] >= 4)))
                            ? 1 : 0;
                        acc2 += adj;
                    }
                    cu.i++;
                }
            }
            feed(mk, acc1, acc2);
        }
        flush();
    }

    delete ph_m;
    rcdiag::Phase ph_s2("fch.sweep2");
    // 4) sweep 2 over the stored rows
    const double INV_LOG10 = 10.0 / std::log(10.0);
    sres::m2g.clear(); sres::m2p.clear(); sres::m2st.clear();
    sres::m2s.clear(); sres::m2ok.clear();
    static const int RP_POW10_N = 256;
    static thread_local std::vector<double> rp_pow10;
    if (rp_pow10.empty()) {
        rp_pow10.resize(RP_POW10_N);
        for (int q = 0; q < RP_POW10_N; q++)
            rp_pow10[q] = std::pow(10.0, -(double)q / 10.0);
    }
    static thread_local std::vector<int64_t> rp_memo_key;
    static thread_local std::vector<double> rp_memo_val;
    rp_memo_key.assign((size_t)(P * NS * 2), INT64_MIN);
    rp_memo_val.resize((size_t)(P * NS * 2));
    const int64_t n2 = w2;
    for (int64_t i = 0; i < n2; i++) {
        const int64_t g = fch::s2g[i], pos2 = fch::s2p[i];
        const int32_t meta = fch::s2meta[i];
        const int64_t con_sym = meta & 15, st = (meta >> 4) & 1;
        const int64_t strand = (meta >> 5) & 1;
        const int64_t cc2 = fch::s2cc[i], tt2 = fch::s2tt[i];
        const int64_t con_nfrags = fch::s2cnf[i];
        const int64_t tot_nfrags = fch::s2tnf[i];
        const int64_t idx = (pos2 * NS + con_sym) * 2 + strand;
        int32_t *il = il_base + idx * 7;
        il[6] += 1;                                  // cdp1
        const int64_t avgBQ = tot_nfrags == 0 ? 1
            : cc2 / (tot_nfrags > 1 ? tot_nfrags : 1);
        const int64_t major = il[5];
        const int64_t minor = il[4];
        const double w = 1.0 / ((double)minor + 1.0);
        double realphred;
        if (rp_memo_key[idx] == avgBQ) {
            realphred = rp_memo_val[idx];
        } else {
            const double pw = (avgBQ >= 0 && avgBQ < RP_POW10_N)
                ? rp_pow10[avgBQ] : std::pow(10.0, -(double)avgBQ / 10.0);
            realphred = -INV_LOG10 * std::log(
                ((double)minor + w)
                / ((double)major + (double)minor + w / pw));
            rp_memo_key[idx] = avgBQ;
            rp_memo_val[idx] = realphred;
        }
        const int64_t indep = (int64_t)std::nearbyint(
            (double)(2 * con_nfrags - tot_nfrags) * realphred);
        int64_t confam;
        if (st == 1) {
            const int64_t cap = fam_phred_indel_inc
                + (int64_t)std::nearbyint(realphred);
            confam = indep < cap ? indep : cap;
        } else {
            const int64_t cap = 2 * cc2 - tt2;
            confam = indep < cap ? indep : cap;
        }
        if (confam < 1) confam = 1;
        const int64_t max_qual =
            sscs_flat[ref_syms[pos2] * NS + con_sym] + rescue_add;
        const int64_t confam2 = confam < max_qual ? confam : max_qual;
        if (tot_nfrags >= dup1add) {
            int64_t d = max_qual - confam2 + 2;
            int64_t pb = d >= 0 ? d / 4 : -((-d + 3) / 4);
            if (pb < 0) pb = 0;
            if (pb > 15) pb = 15;
            hist[((strand * P + pos2) * NS + con_sym) * 16 + pb] += 1;
        }
        bool mut;
        if (st == 0) {
            const int64_t rs = ref_syms[pos2];
            mut = rs != con_sym && rs < 4 && con_sym < 4
                && confam >= highbq_thres;
        } else {
            mut = con_sym != 6 && con_sym != 13;
        }
        if (mut) {
            sres::m2g.push_back(g);
            sres::m2p.push_back(pos2);
            sres::m2st.push_back(st);
            sres::m2s.push_back(con_sym);
            sres::m2ok.push_back(
                (tot_nfrags >= dup1add
                 && con_nfrags * 100 >= tot_nfrags * dup1perc) ? 1 : 0);
        }
    }
    {
        // de-interleave the scratch into the caller's (zeroed) planes
        const int64_t NIDX = P * NS * 2;
        for (int64_t idx = 0; idx < NIDX; idx++) {
            const int32_t *il = il_base + idx * 7;
            cdp12[idx] = il[0];
            cdp21[idx] = il[1];
            cdp2[idx] = il[2];
            cdp3[idx] = il[3];
            cdpm[idx] = il[4];
            cdpM[idx] = il[5];
            cdp1[idx] = il[6];
        }
    }
    counts_out[0] = (int64_t)sres::g1g.size();
    counts_out[1] = (int64_t)sres::m2g.size();
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Event incvalues for the dense base + LINK_M streams
// (engine_bq.compute_event_values, Illumina branch of updateByRead1Aln,
// main.hpp:1877-1935): one pass over the M-base table writes the
// region-relative positions, symbols, incvalues and default interfering
// distances straight into the preallocated allev arrays (base rows at
// [0, n_bases), LINK_M rows at [link_off, ...)), replacing ~20 full-size
// numpy temporaries.  The sparse streams (gaps, NN pads, proton branches,
// per-indel-read distance fixes) stay in numpy.

extern "C" {

int event_values_base_link(
    int64_t n_bases,
    const int64_t *b_rpos, const int64_t *b_read,
    const int8_t *b_sym, const uint8_t *b_bq, const uint8_t *b_interior,
    int64_t off, int64_t add_misma,
    const int64_t *indelphred,   // [>= P]
    const int64_t *micro_nogap,  // [n_reads]
    int64_t P,
    int64_t *o_pos, int64_t *o_sym, int64_t *o_val, int64_t *o_read,
    int64_t *o_dist,
    int64_t link_off
) {
    int64_t k = link_off;
    for (int64_t i = 0; i < n_bases; i++) {
        const int64_t pos = b_rpos[i] - off;
        if ((uint64_t)pos >= (uint64_t)P) return -1;
        const int64_t rd = b_read[i];
        o_pos[i] = pos;
        o_sym[i] = b_sym[i];
        o_val[i] = (int64_t)b_bq[i] + add_misma;
        o_read[i] = rd;
        o_dist[i] = 10000;
        if (b_interior[i]) {
            const int64_t noindel =
                imin(indelphred[pos > 0 ? pos - 1 : 0], indelphred[pos]);
            int64_t v = imin((int64_t)80, noindel) - micro_nogap[rd];
            if (v < 0) v = 0;
            o_pos[k] = pos;
            o_sym[k] = 6;   // LINK_M
            o_val[k] = v + 1;
            o_read[k] = rd;
            o_dist[k] = 10000;
            k++;
        }
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// CIGAR expansion of the dense M-base table (events.expand BaseEvents):
// one walk over the packed cigars writes rpos/qpos/sym/bq/interior/
// op_index/i2/read for every aligned base, replacing the repeat/cumsum
// numpy cascade (the gap/read-level arrays stay vectorized in numpy).

extern "C" {

int64_t expand_bases_kernel(
    int64_t n_reads,
    const uint8_t *cigar_op, const int32_t *cigar_len,
    const int64_t *cigar_off,
    const int32_t *r_pos,
    const int8_t *seq_flat, const uint8_t *qual_flat,
    const int64_t *seq_off,
    int64_t *b_rpos, int64_t *b_read, int32_t *b_qpos,
    int8_t *b_sym, uint8_t *b_bq, uint8_t *b_interior,
    int64_t *b_opidx, int64_t *b_i2
) {
    int64_t w = 0;
    for (int64_t rd = 0; rd < n_reads; rd++) {
        int64_t rpos = r_pos[rd];
        int64_t qpos = 0;
        const int64_t s0 = seq_off[rd];
        for (int64_t k = cigar_off[rd]; k < cigar_off[rd + 1]; k++) {
            const int op = cigar_op[k];
            const int64_t len = cigar_len[k];
            if (op == 0 || op == 7 || op == 8) {        // M/=/X
                for (int64_t i2 = 0; i2 < len; i2++) {
                    b_rpos[w] = rpos + i2;
                    b_read[w] = rd;
                    b_qpos[w] = (int32_t)(qpos + i2);
                    b_sym[w] = seq_flat[s0 + qpos + i2];
                    b_bq[w] = qual_flat[s0 + qpos + i2];
                    b_interior[w] = i2 > 0;
                    b_opidx[w] = k;
                    b_i2[w] = i2;
                    w++;
                }
                rpos += len;
                qpos += len;
            } else if (op == 2 || op == 3) {            // D/N
                rpos += len;
            } else if (op == 1 || op == 4) {            // I/S
                qpos += len;
            }
        }
    }
    return w;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// dp4_to_pcFA (main_conversion.hpp:798-849; numpy reference
// uvc_tpu/model/dpv._dp4): the bias-engine primitive evaluated ~20 times
// per region over [P,14] planes.  Split into three stages so the
// transcendentals (log/exp) run through numpy -- C libm differs from
// numpy's SIMD log/exp by 1 ulp on rare inputs, which would break
// bit-parity with the python reference.  Intermediates persist in
// thread_local buffers between stages (one set per caller thread).

namespace dp4 {
static thread_local std::vector<double> vadf, vadp, fail_fa, pass_fa, ig;
static thread_local std::vector<uint8_t> pass_ge;
static thread_local int64_t g_n = 0;
static thread_local int g_bidir = 0;
}  // namespace dp4

extern "C" {

void dp4_stage1(int64_t n,
                const double *adp, const double *adf,
                const double *dpp, const double *dpf,
                const double *osf,           // null when osf_disabled
                const double *priorAD, const double *priorDP,
                int64_t bidirectional,
                const double *ad_avg, const double *dp_avg,  // may be null
                double *log1_out, double *log2_out,          // log2 if bidir
                double *nobias_out) {
    dp4::g_n = n;
    dp4::g_bidir = (int)bidirectional;
    if ((int64_t)dp4::vadf.size() < n) {
        dp4::vadf.resize(n); dp4::vadp.resize(n);
        dp4::fail_fa.resize(n); dp4::pass_fa.resize(n);
        dp4::ig.resize(n); dp4::pass_ge.resize(n);
    }
    for (int64_t i = 0; i < n; i++) {
        double vadp = adp[i], vadf = adf[i], vdpp = dpp[i], vdpf = dpf[i];
        if (osf != nullptr) {
            vdpf *= osf[i];
            vdpp *= osf[i];
            vadf *= osf[i];
            vadp *= osf[i];
        }
        vdpf += priorDP[i];
        vdpp += priorDP[i];
        vadf += priorAD[i];
        vadp += priorAD[i];
        nobias_out[i] = (vadf + vadp) / (vdpf + vdpp);
        const bool pass_ge = (vadp / vdpp) >= (vadf / vdpf);
        dp4::pass_ge[i] = pass_ge ? 1 : 0;
        if (bidirectional && pass_ge) {
            double t;
            t = vdpp; vdpp = vdpf; vdpf = t;
            t = vadp; vadp = vadf; vadf = t;
        }
        const double bdf = vdpf * 2 - vadf;
        const double bdp = vdpp * 2 - vadp;
        double apf = vadp / (vadp + vadf);
        double bpf = bdp / (bdp + bdf);
        if (!bidirectional && ad_avg != nullptr
                && ad_avg[i] >= 0 && dp_avg[i] >= 0) {
            apf = ad_avg[i] / (ad_avg[i] + dp_avg[i] * 0.9);
            bpf = 1.0 - apf;
        }
        log1_out[i] = (1.0 - apf) / (1.0 - bpf);
        if (bidirectional) log2_out[i] = apf / bpf;
        dp4::vadf[i] = vadf;
        dp4::vadp[i] = vadp;
        dp4::fail_fa[i] = vadf / vdpf;
        dp4::pass_fa[i] = vadp / vdpp;
    }
}

void dp4_stage2(const double *l1, const double *l2, const double *n_nats,
                double pl_exp, double *exparg_out) {
    const int64_t n = dp4::g_n;
    for (int64_t i = 0; i < n; i++) {
        double ig = dp4::vadf[i] * l1[i];
        if (dp4::g_bidir) ig += dp4::vadp[i] * l2[i];
        dp4::ig[i] = ig;
        exparg_out[i] = (n_nats[i] - ig) / pl_exp;
    }
}

void dp4_stage3(const double *e, const double *n_nats, double *pc_out) {
    const int64_t n = dp4::g_n;
    for (int64_t i = 0; i < n; i++) {
        const double fail_fa = dp4::fail_fa[i];
        const double pass_fa = dp4::pass_fa[i];
        const double grown = fail_fa * e[i];
        // np.maximum NaN propagation: NaN if either operand is NaN
        const double shrunk = std::isnan(pass_fa) ? pass_fa
            : (pass_fa > grown ? pass_fa : grown);
        double pc = dp4::ig[i] <= n_nats[i] ? fail_fa : shrunk;
        if (!dp4::g_bidir && dp4::pass_ge[i]) pc = pass_fa;
        pc_out[i] = pc;
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Per-read qname FNV-1a 64-bit hashes (fragment grouping key; the
// reference groups reads into fragments by qname HASH, grouping.cpp:925
// map<qnamehash, vector<bam1_t*>>).

extern "C" {

void qname_hash64(const uint8_t *data, const int64_t *off, int64_t n,
                  uint64_t *out) {
    for (int64_t i = 0; i < n; i++) {
        uint64_t h = 1469598103934665603ULL;
        for (int64_t j = off[i]; j < off[i + 1]; j++) {
            h ^= (uint64_t)data[j];
            h *= 1099511628211ULL;
        }
        out[i] = h;
    }
}

}  // extern "C"
