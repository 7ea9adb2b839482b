// debarcode: move UMI bases of gzipped FASTQ reads into the read name.
//
// Native rebuild of the reference's debarcode tool (debarcode_main.c):
// reads R1 (and optionally R2) gzipped FASTQs, copies the configured
// [beg, end) sequence window into the read name as "#UMI" (single) or
// "#A+B" (duplex) / "#A-B" (non-duplex pair), and writes gzipped FASTQs.
// The sequence itself is left intact, matching the reference.
//
// Interface: -i/-o R1 in/out, -j/-p R2 in/out, -b/-e R1 UMI window,
// -c/-f R2 UMI window, -C use comment token as name, -D duplex.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <zlib.h>
#include <unistd.h>

struct FqReader {
    gzFile f;
    char buf[1 << 16];
    bool getline(std::string &out) {
        out.clear();
        for (;;) {
            if (gzgets(f, buf, sizeof(buf)) == nullptr) return !out.empty();
            out += buf;
            if (!out.empty() && out.back() == '\n') { out.pop_back(); return true; }
        }
    }
};

struct FqRec { std::string name, comment, seq, qual; };

static bool read_rec(FqReader &r, FqRec &rec) {
    std::string line;
    if (!r.getline(line) || line.empty() || line[0] != '@') return false;
    size_t sp = line.find_first_of(" \t");
    rec.name = line.substr(1, sp == std::string::npos ? std::string::npos : sp - 1);
    rec.comment = (sp == std::string::npos) ? "" : line.substr(sp + 1);
    if (!r.getline(rec.seq)) return false;
    if (!r.getline(line)) return false;  // '+' line
    if (!r.getline(rec.qual)) return false;
    return true;
}

int main(int argc, char **argv) {
    const char *in1 = nullptr, *out1 = nullptr, *in2 = nullptr, *out2 = nullptr;
    int beg1 = 0, end1 = 0, beg2 = 0, end2 = 0;
    bool use_comment = false, duplex = false;
    int opt;
    while ((opt = getopt(argc, argv, "b:c:e:f:i:j:o:p:CDvh")) != -1) {
        switch (opt) {
            case 'i': in1 = optarg; break;
            case 'o': out1 = optarg; break;
            case 'j': in2 = optarg; break;
            case 'p': out2 = optarg; break;
            case 'b': beg1 = atoi(optarg); break;
            case 'e': end1 = atoi(optarg); break;
            case 'c': beg2 = atoi(optarg); break;
            case 'f': end2 = atoi(optarg); break;
            case 'C': use_comment = true; break;
            case 'D': duplex = true; break;
            case 'v': fprintf(stderr, "debarcode (uvc_tpu native)\n"); return 0;
            default:
                fprintf(stderr,
                        "Usage: %s -i R1.fq.gz -o R1.out.fq.gz -b BEG -e END "
                        "[-j R2.fq.gz -p R2.out.fq.gz -c BEG -f END] [-C] [-D]\n",
                        argv[0]);
                return (opt == 'h') ? 0 : 1;
        }
    }
    if (!in1 || !out1) { fprintf(stderr, "-i and -o are required\n"); return 1; }
    int n = (in2 != nullptr) ? 2 : 1;
    FqReader rd[2];
    gzFile wr[2];
    const char *ins[2] = {in1, in2}, *outs[2] = {out1, out2};
    int begs[2] = {beg1, beg2}, ends[2] = {end1, end2};
    for (int k = 0; k < n; k++) {
        rd[k].f = gzopen(ins[k], "r");
        if (!rd[k].f) { fprintf(stderr, "cannot open %s\n", ins[k]); return 2; }
        wr[k] = gzopen(outs[k], "wb1");
        if (!wr[k]) { fprintf(stderr, "cannot open %s\n", outs[k]); return 2; }
    }
    FqRec rec[2];
    std::string umi[2], outbuf;
    for (;;) {
        bool got[2] = {false, false};
        for (int k = 0; k < n; k++) {
            got[k] = read_rec(rd[k], rec[k]);
            umi[k].clear();
            if (got[k] && ends[k] > begs[k]) {
                if ((int)rec[k].seq.size() > ends[k])
                    umi[k] = rec[k].seq.substr(begs[k], ends[k] - begs[k]);
                else
                    umi[k].assign(ends[k] - begs[k], 'N');
            }
        }
        if (!got[0] || (n == 2 && !got[1])) break;
        for (int k = 0; k < n; k++) {
            outbuf.clear();
            outbuf += "@";
            if (use_comment && !rec[k].comment.empty()) {
                size_t e = rec[k].comment.find_first_of(" \t");
                outbuf += rec[k].comment.substr(0, e);
            } else {
                outbuf += rec[k].name;
            }
            outbuf += "#";
            int numi = 0;
            for (int j = 0; j < n; j++) {
                if (!umi[j].empty()) {
                    if (numi++) outbuf += (duplex ? "+" : "-");
                    outbuf += umi[j];
                }
            }
            outbuf += "\n" + rec[k].seq + "\n+" + rec[k].name + " "
                      + rec[k].comment + "\n" + rec[k].qual + "\n";
            gzwrite(wr[k], outbuf.data(), (unsigned)outbuf.size());
        }
    }
    for (int k = 0; k < n; k++) { gzclose(rd[k].f); gzclose(wr[k]); }
    return 0;
}
