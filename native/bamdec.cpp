// bamdec: native BGZF + BAM decoder producing columnar arrays.
//
// Native runtime component replacing the python BGZF/record-scan path of
// uvc_tpu/io/bam.py (same ReadBatch columnar layout; the python decoder
// remains as the portable fallback). Exposed via a C ABI for ctypes.
//
//   bgzf_decompress: whole-file BGZF -> heap buffer (block-by-block raw
//     inflate driven by the BC/BSIZE extra field)
//   bam_scan: record boundaries + total sizes
//   bam_fill: fixed fields + flattened qname/cigar/seq/qual arrays

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <zlib.h>

extern "C" {

// Returns decompressed size (>=0) or negative error; *out is malloc'd.
int64_t bgzf_decompress(const char *path, uint8_t **out) {
    FILE *f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long fsize = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint8_t *raw = (uint8_t *)malloc(fsize);
    if (!raw) { fclose(f); return -2; }
    if ((long)fread(raw, 1, fsize, f) != fsize) { free(raw); fclose(f); return -3; }
    fclose(f);

    size_t cap = (size_t)fsize * 4 + (1 << 16);
    uint8_t *dst = (uint8_t *)malloc(cap);
    size_t dlen = 0;
    long p = 0;
    while (p + 18 <= fsize) {
        if (raw[p] != 0x1f || raw[p + 1] != 0x8b) break;
        uint16_t xlen = (uint16_t)(raw[p + 10] | (raw[p + 11] << 8));
        long xfield = p + 12;
        int bsize = -1;
        long xend = xfield + xlen;
        while (xfield + 4 <= xend) {
            uint8_t si1 = raw[xfield], si2 = raw[xfield + 1];
            uint16_t slen = (uint16_t)(raw[xfield + 2] | (raw[xfield + 3] << 8));
            if (si1 == 'B' && si2 == 'C' && slen == 2)
                bsize = (raw[xfield + 4] | (raw[xfield + 5] << 8)) + 1;
            xfield += 4 + slen;
        }
        if (bsize < 0) { free(raw); free(dst); return -4; }
        long cdata = p + 12 + xlen;
        long cdata_len = bsize - 12 - xlen - 8;
        uint32_t isize;
        memcpy(&isize, raw + p + bsize - 4, 4);
        if (dlen + isize > cap) {
            cap = (dlen + isize) * 2 + (1 << 16);
            dst = (uint8_t *)realloc(dst, cap);
        }
        if (isize > 0) {
            z_stream zs;
            memset(&zs, 0, sizeof(zs));
            inflateInit2(&zs, -15);
            zs.next_in = raw + cdata;
            zs.avail_in = (uInt)cdata_len;
            zs.next_out = dst + dlen;
            zs.avail_out = (uInt)(cap - dlen);
            int ret = inflate(&zs, Z_FINISH);
            inflateEnd(&zs);
            if (ret != Z_STREAM_END) { free(raw); free(dst); return -5; }
            dlen += isize;
        }
        p += bsize;
    }
    free(raw);
    *out = dst;
    return (int64_t)dlen;
}

void bamdec_free(void *p) { free(p); }

static inline int32_t rd_i32_fwd(const uint8_t *b) {
    int32_t v;
    memcpy(&v, b, 4);
    return v;
}

// ---------------------------------------------------------------------------
// Streaming BGZF: incremental block decode for the memory-bounded tier-1
// input pipeline (reference analog: SamIter's windowed scan,
// grouping.cpp:157-314) and BAI virtual-offset seeks.

struct BgzfStream {
    FILE *f;
    int64_t next_block;  // compressed offset of the next unread block
    int eof;
};

void *bgzf_stream_open(const char *path) {
    FILE *f = fopen(path, "rb");
    if (!f) return nullptr;
    BgzfStream *s = (BgzfStream *)calloc(1, sizeof(BgzfStream));
    s->f = f;
    s->next_block = 0;
    s->eof = 0;
    return s;
}

void bgzf_stream_close(void *h) {
    BgzfStream *s = (BgzfStream *)h;
    if (!s) return;
    fclose(s->f);
    free(s);
}

int64_t bgzf_stream_tell(void *h) { return ((BgzfStream *)h)->next_block; }

int bgzf_stream_eof(void *h) { return ((BgzfStream *)h)->eof; }

// Position the stream at a compressed block offset (BAI coffset).
int bgzf_stream_seek(void *h, int64_t coffset) {
    BgzfStream *s = (BgzfStream *)h;
    if (fseek(s->f, (long)coffset, SEEK_SET) != 0) return -1;
    s->next_block = coffset;
    s->eof = 0;
    return 0;
}

// Decompress whole blocks into dst until adding the next block would
// exceed max_out or EOF.  Returns bytes written (0 at clean EOF),
// negative on error.
int64_t bgzf_stream_read(void *h, uint8_t *dst, int64_t max_out) {
    BgzfStream *s = (BgzfStream *)h;
    int64_t dlen = 0;
    uint8_t hdr[12];
    while (!s->eof) {
        if (fseek(s->f, (long)s->next_block, SEEK_SET) != 0) return -1;
        size_t got = fread(hdr, 1, 12, s->f);
        if (got == 0) { s->eof = 1; break; }
        if (got < 12) return -2;
        if (hdr[0] != 0x1f || hdr[1] != 0x8b) return -3;
        uint16_t xlen = (uint16_t)(hdr[10] | (hdr[11] << 8));
        // read the extra field to find BSIZE
        uint8_t xbuf[256];
        if (xlen > sizeof(xbuf)) return -4;
        if (fread(xbuf, 1, xlen, s->f) != xlen) return -5;
        int bsize = -1;
        int xp = 0;
        while (xp + 4 <= xlen) {
            uint16_t slen = (uint16_t)(xbuf[xp + 2] | (xbuf[xp + 3] << 8));
            if (xbuf[xp] == 'B' && xbuf[xp + 1] == 'C' && slen == 2)
                bsize = (xbuf[xp + 4] | (xbuf[xp + 5] << 8)) + 1;
            xp += 4 + slen;
        }
        if (bsize < 0) return -6;
        int64_t cdata_len = bsize - 12 - xlen - 8;
        uint8_t *cbuf = (uint8_t *)malloc(cdata_len + 8);
        if (fread(cbuf, 1, cdata_len + 8, s->f) != (size_t)(cdata_len + 8)) {
            free(cbuf);
            return -7;
        }
        uint32_t isize;
        memcpy(&isize, cbuf + cdata_len + 4, 4);
        if (dlen > 0 && dlen + (int64_t)isize > max_out) {
            free(cbuf);
            break;  // next call resumes at this block
        }
        if ((int64_t)isize > max_out) { free(cbuf); return -8; }
        if (isize > 0) {
            z_stream zs;
            memset(&zs, 0, sizeof(zs));
            inflateInit2(&zs, -15);
            zs.next_in = cbuf;
            zs.avail_in = (uInt)cdata_len;
            zs.next_out = dst + dlen;
            zs.avail_out = (uInt)(max_out - dlen);
            int ret = inflate(&zs, Z_FINISH);
            inflateEnd(&zs);
            if (ret != Z_STREAM_END) { free(cbuf); return -9; }
            dlen += isize;
        }
        free(cbuf);
        s->next_block += bsize;
        // empty blocks (incl. the BGZF EOF marker) carry no data; real
        // EOF is detected by the zero-length fread on the next header
    }
    return dlen;
}

static int64_t effective_cigar(const uint8_t *r, int32_t bs,
                               const uint8_t **words);

// Scan only COMPLETE records; sets *consumed to the byte length of the
// complete-record prefix.  Returns n_records (>=0).
int64_t bam_scan_prefix(const uint8_t *buf, int64_t len, int64_t start,
                        int64_t *consumed, int64_t *total_qname,
                        int64_t *total_cigar, int64_t *total_seq) {
    int64_t n = 0, tq = 0, tc = 0, ts = 0;
    int64_t p = start;
    while (p + 4 <= len) {
        int32_t bs = rd_i32_fwd(buf + p);
        if (p + 4 + bs > len) break;
        const uint8_t *r = buf + p + 4;
        uint8_t l_read_name = r[8];
        int32_t l_seq = rd_i32_fwd(r + 16);
        const uint8_t *w_;
        tq += l_read_name - 1;
        tc += effective_cigar(r, bs, &w_);
        ts += l_seq;
        n++;
        p += 4 + bs;
    }
    *consumed = p - start;
    *total_qname = tq;
    *total_cigar = tc;
    *total_seq = ts;
    return n;
}

static inline int32_t rd_i32(const uint8_t *b) {
    int32_t v;
    memcpy(&v, b, 4);
    return v;
}
static inline uint16_t rd_u16(const uint8_t *b) {
    uint16_t v;
    memcpy(&v, b, 2);
    return v;
}

// Counts records and accumulates total variable-field sizes.
// Returns n_records or negative on truncation.
int64_t bam_scan(const uint8_t *buf, int64_t len, int64_t start,
                 int64_t *total_qname, int64_t *total_cigar,
                 int64_t *total_seq) {
    int64_t n = 0, tq = 0, tc = 0, ts = 0;
    int64_t p = start;
    while (p + 4 <= len) {
        int32_t bs = rd_i32(buf + p);
        if (p + 4 + bs > len) return -1;
        const uint8_t *r = buf + p + 4;
        uint8_t l_read_name = r[8];
        int32_t l_seq = rd_i32(buf + p + 4 + 16);
        const uint8_t *w_;
        tq += l_read_name - 1;
        tc += effective_cigar(r, bs, &w_);
        ts += l_seq;
        n++;
        p += 4 + bs;
    }
    *total_qname = tq;
    *total_cigar = tc;
    *total_seq = ts;
    return n;
}

static const int8_t NT16_TO_SYM[16] = {4, 0, 1, 4, 2, 4, 4, 4,
                                       3, 4, 4, 4, 4, 4, 4, 4};

// Walk the aux block [p, end) and return the integer value of tag "NM"
// (-1 if absent). Skips every SAM aux value type (A c C s S i I f d Z H B)
// so foreign-writer BAMs decode; reference gets this from htslib's
// bam_aux_get (used at main.hpp:980,1810).
static int32_t aux_find_nm(const uint8_t *p, const uint8_t *end) {
    while (p + 3 <= end) {
        uint8_t t0 = p[0], t1 = p[1], tp = p[2];
        p += 3;
        int fixed = 0;
        switch (tp) {
            case 'A': case 'c': case 'C': fixed = 1; break;
            case 's': case 'S': fixed = 2; break;
            case 'i': case 'I': case 'f': fixed = 4; break;
            case 'd': fixed = 8; break;
            case 'Z': case 'H': {
                while (p < end && *p) p++;
                p++;
                continue;
            }
            case 'B': {
                if (p + 5 > end) return -1;
                uint8_t el = p[0];
                uint32_t cnt;
                memcpy(&cnt, p + 1, 4);
                int es = (el == 'c' || el == 'C') ? 1
                       : (el == 's' || el == 'S') ? 2 : 4;
                p += 5 + (int64_t)es * cnt;
                continue;
            }
            default:
                return -1;  // unknown type: cannot skip safely
        }
        if (p + fixed > end) return -1;
        if (t0 == 'N' && t1 == 'M') {
            switch (tp) {
                case 'c': return (int32_t)(int8_t)p[0];
                case 'C': return (int32_t)p[0];
                case 's': { int16_t v; memcpy(&v, p, 2); return v; }
                case 'S': { uint16_t v; memcpy(&v, p, 2); return v; }
                case 'i': { int32_t v; memcpy(&v, p, 4); return v; }
                case 'I': { uint32_t v; memcpy(&v, p, 4); return (int32_t)v; }
                default: return -1;  // 'A'/'f'/'d'-typed NM: not an int
            }
        }
        p += fixed;
    }
    return -1;
}

// CG:B,I long-cigar lookup (SAM spec 4.2.2 / htslib bam_read1): when the
// in-record cigar is the kSmN placeholder, the real cigar is a CG:B,I
// aux array.  Returns its element count and sets *arr, or -1.
static int64_t aux_find_cg(const uint8_t *p, const uint8_t *end,
                           const uint8_t **arr) {
    while (p + 3 <= end) {
        uint8_t t0 = p[0], t1 = p[1], tp = p[2];
        p += 3;
        int fixed = 0;
        switch (tp) {
            case 'A': case 'c': case 'C': fixed = 1; break;
            case 's': case 'S': fixed = 2; break;
            case 'i': case 'I': case 'f': fixed = 4; break;
            case 'd': fixed = 8; break;
            case 'Z': case 'H': {
                while (p < end && *p) p++;
                p++;
                continue;
            }
            case 'B': {
                if (p + 5 > end) return -1;
                uint8_t el = p[0];
                uint32_t cnt;
                memcpy(&cnt, p + 1, 4);
                int es = (el == 'c' || el == 'C') ? 1
                       : (el == 's' || el == 'S') ? 2 : 4;
                if (p + 5 + (int64_t)es * cnt > end) return -1;
                if (t0 == 'C' && t1 == 'G' && el == 'I') {
                    *arr = p + 5;
                    return (int64_t)cnt;
                }
                p += 5 + (int64_t)es * cnt;
                continue;
            }
            default:
                return -1;
        }
        if (p + fixed > end) return -1;
        p += fixed;
    }
    return -1;
}

// Effective cigar of one record body r (bs bytes): the in-record words,
// unless they are the kSmN placeholder with a CG aux array.
static int64_t effective_cigar(const uint8_t *r, int32_t bs,
                               const uint8_t **words) {
    uint8_t lrn = r[8];
    uint16_t nc = rd_u16(r + 12);
    int32_t ls = rd_i32(r + 16);
    const uint8_t *cg = r + 32 + lrn;
    *words = cg;
    if (nc == 2) {
        uint32_t w0, w1;
        memcpy(&w0, cg, 4);
        memcpy(&w1, cg + 4, 4);
        if ((w0 & 0xF) == 4 /*S*/ && (int32_t)(w0 >> 4) == ls
                && (w1 & 0xF) == 3 /*N*/) {
            const uint8_t *aux = cg + 4 * 2 + (ls + 1) / 2 + ls;
            const uint8_t *arr = NULL;
            int64_t cnt = aux_find_cg(aux, r + bs, &arr);
            if (cnt > 0) {
                *words = arr;
                return cnt;
            }
        }
    }
    return nc;
}

int bam_fill(const uint8_t *buf, int64_t len, int64_t start,
             int32_t *tid, int32_t *pos, uint8_t *mapq, uint16_t *flag,
             int32_t *mtid, int32_t *mpos, int32_t *isize,
             uint8_t *qname_data, int64_t *qname_off,
             uint8_t *cigar_op, int32_t *cigar_len, int64_t *cigar_off,
             int8_t *seq_sym, uint8_t *qual, int64_t *seq_off,
             int32_t *nm) {
    int64_t i = 0, qo = 0, co = 0, so = 0;
    int64_t p = start;
    qname_off[0] = cigar_off[0] = seq_off[0] = 0;
    while (p + 4 <= len) {
        int32_t bs = rd_i32(buf + p);
        if (p + 4 + bs > len) return -1;
        const uint8_t *r = buf + p + 4;
        tid[i] = rd_i32(r);
        pos[i] = rd_i32(r + 4);
        uint8_t lrn = r[8];
        mapq[i] = r[9];
        uint16_t nc = rd_u16(r + 12);
        flag[i] = rd_u16(r + 14);
        int32_t ls = rd_i32(r + 16);
        mtid[i] = rd_i32(r + 20);
        mpos[i] = rd_i32(r + 24);
        isize[i] = rd_i32(r + 28);
        const uint8_t *q = r + 32;
        memcpy(qname_data + qo, q, lrn - 1);
        qo += lrn - 1;
        const uint8_t *cg = q + lrn;
        const uint8_t *cw;
        const int64_t nce = effective_cigar(r, bs, &cw);
        for (int64_t k = 0; k < nce; k++) {
            uint32_t w;
            memcpy(&w, cw + 4 * k, 4);
            cigar_op[co + k] = (uint8_t)(w & 0xF);
            cigar_len[co + k] = (int32_t)(w >> 4);
        }
        co += nce;
        const uint8_t *sq = cg + 4 * (int64_t)nc;
        for (int32_t k = 0; k < ls; k++) {
            uint8_t nib = (k & 1) ? (sq[k >> 1] & 0xF) : (sq[k >> 1] >> 4);
            seq_sym[so + k] = NT16_TO_SYM[nib];
        }
        const uint8_t *ql = sq + (ls + 1) / 2;
        memcpy(qual + so, ql, ls);
        so += ls;
        nm[i] = aux_find_nm(ql + ls, r + bs);
        i++;
        qname_off[i] = qo;
        cigar_off[i] = co;
        seq_off[i] = so;
        p += 4 + bs;
    }
    return 0;
}

}  // extern "C"
