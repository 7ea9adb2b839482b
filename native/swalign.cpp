// Strict local affine-gap aligner for the surrogate-alignment pipeline
// (cli/surrogate_align.py `realign`).  The reference's
// bin/uvcSurrogateAlign.sh shells out to `bwa mem -A 3 -B 12 -O 18 -E 1
// -L 18` for the super-active regions; this is an in-repo replacement
// with the same scoring shape (match +A, mismatch -B, affine gaps
// -(O+k*E), soft clips free at both read ends via Smith-Waterman local
// semantics — the strict penalties already make clipping beat spurious
// extension).  Regions are a few hundred bp and reads a few hundred
// each, so a full DP with byte traceback is plenty fast.
//
// Build: g++ -O3 -march=native -shared -fPIC -o ../bin/swalign.so \
//        swalign.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {
enum : uint8_t { TB_STOP = 0, TB_DIAG = 1, TB_UP = 2, TB_LEFT = 3 };
// per-cell traceback: 2 bits for H-state source, 1 bit each for whether
// E/F extended (vs opened)
struct Cell {
    uint8_t h;       // TB_*
    uint8_t e_ext;   // E came from E (1) or H (0)
    uint8_t f_ext;   // F came from F (1) or H (0)
};
}  // namespace

extern "C" {

// Local (Smith-Waterman) affine-gap alignment of read (0-4 base codes,
// 4=N) against a reference window.  On success returns the best score
// (>0) and fills:
//   out_pos    0-based offset in ref of the first aligned base
//   out_cigar  htslib-packed words (len<<4 | op), ops M/I/D/S only,
//              including leading/trailing soft clips covering the read
//   *out_ncig  number of cigar words (<= max_cigar or returns -2)
// Returns 0 when nothing aligns (score <= 0).
int64_t sw_align(const uint8_t *read, int64_t qlen,
                 const uint8_t *ref, int64_t rlen,
                 int64_t match, int64_t mismatch,
                 int64_t gap_open, int64_t gap_ext,
                 uint32_t *out_cigar, int64_t max_cigar,
                 int64_t *out_ncig, int64_t *out_pos) {
    if (qlen <= 0 || rlen <= 0) return 0;
    const int64_t NEG = INT64_MIN / 4;
    static thread_local std::vector<int64_t> Hrow, Erow;
    static thread_local std::vector<Cell> tb;
    Hrow.assign(rlen + 1, 0);
    Erow.assign(rlen + 1, NEG);
    tb.assign((size_t)(qlen + 1) * (rlen + 1), Cell{TB_STOP, 0, 0});

    int64_t best = 0, best_i = 0, best_j = 0;
    for (int64_t i = 1; i <= qlen; i++) {
        int64_t h_diag = Hrow[0];     // H[i-1][0]
        Hrow[0] = 0;                  // local: free start anywhere
        int64_t F = NEG;              // gap in ref (insertion), per row
        for (int64_t j = 1; j <= rlen; j++) {
            Cell &c = tb[(size_t)i * (rlen + 1) + j];
            // E (vertical): read base i aligned to a gap = INSERTION into
            // the ref; Hrow[j] still holds H[i-1][j] here
            const int64_t e_open = Hrow[j] - gap_open - gap_ext;
            const int64_t e_ext = Erow[j] - gap_ext;
            const int64_t E = e_open >= e_ext ? e_open : e_ext;
            c.e_ext = e_open >= e_ext ? 0 : 1;
            Erow[j] = E;
            // F (horizontal): ref base j aligned to a gap = DELETION from
            // the ref; Hrow[j-1] is already H[i][j-1] (updated this row)
            const int64_t f_open = Hrow[j - 1] - gap_open - gap_ext;
            const int64_t f_ext = F - gap_ext;
            F = f_open >= f_ext ? f_open : f_ext;
            c.f_ext = f_open >= f_ext ? 0 : 1;
            // M: diagonal
            const bool isn = read[i - 1] > 3 || ref[j - 1] > 3;
            const int64_t sub = h_diag
                + (isn ? -1 : (read[i - 1] == ref[j - 1] ? match
                                                         : -mismatch));
            int64_t H = sub;
            uint8_t dir = TB_DIAG;
            if (E > H) { H = E; dir = TB_UP; }
            if (F > H) { H = F; dir = TB_LEFT; }
            if (H <= 0) { H = 0; dir = TB_STOP; }
            c.h = dir;
            h_diag = Hrow[j];
            Hrow[j] = H;
            if (H > best) { best = H; best_i = i; best_j = j; }
        }
    }
    if (best <= 0) return 0;

    // traceback from (best_i, best_j): ops in reverse
    static thread_local std::vector<uint32_t> rcig;
    rcig.clear();
    auto push_op = [&](int op, int64_t n) {
        if (!rcig.empty() && (int)(rcig.back() & 0xF) == op)
            rcig.back() += (uint32_t)(n << 4);
        else
            rcig.push_back((uint32_t)((n << 4) | op));
    };
    int64_t i = best_i, j = best_j;
    if (qlen - best_i > 0) push_op(4 /*S*/, qlen - best_i);
    int state = 0;  // 0=H, 1=E(up), 2=F(left)
    while (i > 0 && j > 0) {
        const Cell c = tb[(size_t)i * (rlen + 1) + j];
        if (state == 0) {
            if (c.h == TB_STOP) break;
            if (c.h == TB_DIAG) { push_op(0 /*M*/, 1); i--; j--; }
            else if (c.h == TB_UP) state = 1;
            else state = 2;
        } else if (state == 1) {      // E: insertion (read consumed)
            push_op(1 /*I*/, 1);
            i--;
            if (!c.e_ext) state = 0;
        } else {                      // F: deletion (ref consumed)
            push_op(2 /*D*/, 1);
            j--;
            if (!c.f_ext) state = 0;
        }
    }
    if (i > 0) push_op(4 /*S*/, i);
    if ((int64_t)rcig.size() > max_cigar) return -2;
    for (size_t k = 0; k < rcig.size(); k++)
        out_cigar[k] = rcig[rcig.size() - 1 - k];
    // drop leading/trailing D (can appear when a gap touches the local
    // boundary -- not representable at alignment edges)
    int64_t n = (int64_t)rcig.size();
    int64_t beg_trim = 0;
    while (n > 0 && (out_cigar[0] & 0xF) == 2) {
        beg_trim += out_cigar[0] >> 4;
        memmove(out_cigar, out_cigar + 1, (n - 1) * 4);
        n--;
    }
    while (n > 0 && (out_cigar[n - 1] & 0xF) == 2) n--;
    *out_pos = j + beg_trim;   // 0-based ref offset of first aligned base
    *out_ncig = n;
    return best;
}

}  // extern "C"
