"""uvcSurrogateAlign equivalent (bin/uvcSurrogateAlign.sh; alpha in the
reference as well).

Pipeline: extract <ADDITIONAL_INDEL_CANDIDATE> super-active regions from a
uvc_tpu VCF into a padded/merged BED, export the reads overlapping those
regions as FASTQ (R1/R2/SE), re-align them strictly against the regions
(the reference shells out to ``bwa mem -A 3 -B 12 -O 18 -E 1 -L 18``;
`realign` is a built-in replacement with the same scoring shape, backed by
the native local affine-gap aligner in native/swalign.cpp), re-call the
surrogate BAM with ``uvc1 --outvar-flag 15`` and merge long-indel (>14bp)
germline calls back over the original VCF.

Subcommands:
  extract  invcf bam -o OUTDIR [--pad 120]   -> superactive.bed + FASTQs
  realign  OUTDIR ref.fa -o surrogate.bam    -> strict re-alignment
  merge    outvcf original.vcf.gz surrogate.vcf.gz [--indel-size 14]
"""

import argparse
import gzip
import sys

import numpy as np

from ..io import bam as bam_mod
from ..io import bgzf


def _read_vcf_lines(path):
    raw = open(path, "rb").read()
    if raw[:2] == b"\x1f\x8b":
        raw = bgzf.decompress(raw)
    return raw.decode().splitlines()


def extract(args):
    lines = _read_vcf_lines(args.invcf)
    regions = []
    for l in lines:
        if l.startswith("#"):
            continue
        c = l.split("\t")
        if c[4] == "<ADDITIONAL_INDEL_CANDIDATE>":
            pos = int(c[1]) - 1
            regions.append((c[0], max(0, pos - args.pad), pos + 1 + args.pad))
    # merge overlapping intervals per chrom
    merged = []
    for chrom, beg, end in sorted(regions):
        if merged and merged[-1][0] == chrom and beg <= merged[-1][2]:
            merged[-1][2] = max(merged[-1][2], end)
        else:
            merged.append([chrom, beg, end])
    import os
    os.makedirs(args.outdir, exist_ok=True)
    bedp = args.outdir + "/superactive.bed"
    with open(bedp, "w") as bf:
        bf.write('track name=superactive description="Super-active regions '
                 '(noisy alignments) for surrogate alignment."\n')
        for chrom, beg, end in merged:
            bf.write(f"{chrom}\t{beg}\t{end}\n")
    print(f"{len(merged)} super-active regions -> {bedp}", file=sys.stderr)

    hdr, batch = bam_mod.read_bam(args.bam)
    name2tid = {n: i for i, n in enumerate(hdr.ref_names)}
    keep = np.zeros(batch.n, dtype=bool)
    pos = batch.pos.astype(np.int64)
    rend = batch.rend.astype(np.int64)
    for chrom, beg, end in merged:
        tid = name2tid.get(chrom)
        if tid is None:
            continue
        keep |= (batch.tid == tid) & (pos < end) & (rend > beg)
    idx = np.flatnonzero(keep)
    qn = batch.qnames()
    NT = "ACGTN"
    r1s, r2s, ses = [], [], []
    by_name = {}
    for i in idx:
        i = int(i)
        s0, s1 = int(batch.seq_off[i]), int(batch.seq_off[i + 1])
        seq = "".join(NT[min(int(b), 4)] for b in batch.seq[s0:s1])
        quals = "".join(chr(int(q) + 33) for q in batch.qual[s0:s1])
        flag = int(batch.flag[i])
        if flag & 0x10:  # restore machine orientation
            comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
            seq = "".join(comp[b] for b in reversed(seq))
            quals = quals[::-1]
        name = qn[i].decode()
        rec = f"@{name}\n{seq}\n+\n{quals}\n"
        by_name.setdefault(name, {})[2 if flag & 0x80 else 1] = rec
    for name, d in by_name.items():
        if 1 in d and 2 in d:
            r1s.append(d[1])
            r2s.append(d[2])
        else:
            ses.extend(d.values())
    for fn, payload in (("surrogate.R1.fastq.gz", r1s),
                        ("surrogate.R2.fastq.gz", r2s),
                        ("surrogate.SE.fastq.gz", ses)):
        with gzip.open(args.outdir + "/" + fn, "wt") as fh:
            fh.write("".join(payload))
    print(f"{len(r1s)} pairs + {len(ses)} singletons -> "
          f"{args.outdir}/surrogate.*.fastq.gz", file=sys.stderr)
    print("Next: 'surrogate_align realign' (built-in strict aligner; or "
          "any external one, the reference used 'bwa mem -A 3 -B 12 -O 18 "
          "-E 1 -L 18'), re-call with 'uvc1 --outvar-flag 15', then "
          "'surrogate_align merge'.", file=sys.stderr)


_SW = None


def _sw_lib():
    """Load the strict local affine-gap aligner (native/swalign.cpp)."""
    global _SW
    if _SW is None:
        import ctypes
        import os
        p = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "bin", "swalign.so")
        lib = ctypes.CDLL(p)
        lib.sw_align.restype = ctypes.c_int64
        lib.sw_align.argtypes = (
            [ctypes.c_void_p, ctypes.c_int64] * 2
            + [ctypes.c_int64] * 4
            + [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
               ctypes.c_void_p])
        _SW = lib
    return _SW


_ENC = {c: i for i, c in enumerate("ACGTN")}
_COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def _sw(read_codes, ref_codes, A, B, O, E):
    import ctypes
    lib = _sw_lib()
    cig = np.zeros(4096, np.uint32)
    nc = ctypes.c_int64(0)
    pos = ctypes.c_int64(0)
    sc = lib.sw_align(read_codes.ctypes.data, len(read_codes),
                      ref_codes.ctypes.data, len(ref_codes), A, B, O, E,
                      cig.ctypes.data, 4096, ctypes.byref(nc),
                      ctypes.byref(pos))
    if sc <= 0:
        return 0, 0, None
    ops = [(int(w) & 0xF, int(w) >> 4) for w in cig[:nc.value]]
    return int(sc), int(pos.value), ops


def realign(args):
    """Built-in strict re-alignment of the extracted FASTQs against the
    super-active regions (replaces the reference's external
    `bwa mem -A 3 -B 12 -O 18 -E 1 -L 18` step; same scoring shape via
    native/swalign.cpp).  Emits a coordinate-sorted surrogate BAM ready
    for `uvc1 --outvar-flag 15` re-calling."""
    from ..io.fasta import FastaFile

    fa = FastaFile(args.fasta)
    regions = []
    with open(args.outdir + "/superactive.bed") as fh:
        for line in fh:
            if line.startswith(("track", "#")) or not line.strip():
                continue
            c = line.split("\t")
            regions.append((c[0], int(c[1]), int(c[2])))
    name2tid = {n: i for i, n in enumerate(fa.names)}
    margin = args.margin
    windows = []
    for chrom, beg, end in regions:
        wbeg = max(0, beg - margin)
        refb = fa.fetch(chrom, wbeg, end + margin)
        codes = np.frombuffer(refb.upper(), np.uint8)
        enc = np.full(256, 4, np.uint8)
        for ch, v in _ENC.items():
            enc[ord(ch)] = v
        windows.append((name2tid[chrom], wbeg, enc[codes].copy()))

    reads = []
    for suffix, flag_extra in (("R1", 0x40 | 0x1), ("R2", 0x80 | 0x1),
                               ("SE", 0)):
        path = f"{args.outdir}/surrogate.{suffix}.fastq.gz"
        try:
            fh = gzip.open(path, "rt")
        except OSError:
            continue
        with fh:
            while True:
                name = fh.readline().strip()
                if not name:
                    break
                seq = fh.readline().strip().upper()
                fh.readline()
                qual = fh.readline().strip()
                reads.append((name[1:], seq, qual, flag_extra))

    enc = np.full(256, 4, np.uint8)
    for ch, v in _ENC.items():
        enc[ord(ch)] = v
    out_recs = []
    n_un = 0
    for name, seq, qual, flag_extra in reads:
        fwd = enc[np.frombuffer(seq.encode(), np.uint8)].copy()
        rc_seq = "".join(_COMP[b] for b in reversed(seq))
        rev = enc[np.frombuffer(rc_seq.encode(), np.uint8)].copy()
        best = (0, None)
        for wi, (tid, wbeg, refc) in enumerate(windows):
            for strand, codes in ((0, fwd), (1, rev)):
                sc, pos, ops = _sw(codes, refc, args.match, args.mismatch,
                                   args.gap_open, args.gap_ext)
                if sc > best[0]:
                    best = (sc, (tid, wbeg + pos, strand, ops))
        if best[0] < args.min_score or best[1] is None:
            n_un += 1
            continue
        tid, pos_abs, strand, ops = best[1]
        oseq = "".join(_COMP[b] for b in reversed(seq)) if strand else seq
        oqual = qual[::-1] if strand else qual
        flag = (0x10 if strand else 0) | flag_extra
        out_recs.append((tid, pos_abs,
                         (name, flag, tid, pos_abs, 60,
                          [(op, ln) for op, ln in ops], -1, -1, 0, oseq,
                          oqual)))
    out_recs.sort(key=lambda t: (t[0], t[1]))
    lens = fa.lengths()
    refs = [(n, lens[n]) for n in fa.names]
    bam_mod.write_bam(args.obam, "@HD\tVN:1.6\tSO:coordinate\n", refs,
                      [r for _, _, r in out_recs])
    print(f"realigned {len(out_recs)} reads ({n_un} unaligned) -> "
          f"{args.obam}", file=sys.stderr)


def merge(args):
    orig = _read_vcf_lines(args.original)
    surr = _read_vcf_lines(args.surrogate)
    keep = []
    seen = set()
    for l in surr:
        if l.startswith("#"):
            continue
        c = l.split("\t")
        ref, alts = c[3], c[4]
        if alts.startswith("<"):
            continue
        if "GERMLINE" not in l:
            continue
        is_long_indel = any(abs(len(a) - len(ref)) > args.indel_size
                            for a in alts.split(","))
        if is_long_indel:
            keep.append(l)
            seen.add((c[0], c[1], ref, alts))
    out_lines = []
    for l in orig:
        if l.startswith("#"):
            out_lines.append(l)
            continue
        c = l.split("\t")
        if (c[0], c[1], c[3], c[4]) in seen:
            continue  # surrogate call replaces the original
        out_lines.append(l)
    body = [l for l in out_lines if not l.startswith("#")] + keep

    def key(l):
        c = l.split("\t")
        return (c[0], int(c[1]))

    body.sort(key=key)
    header = [l for l in out_lines if l.startswith("#")]
    text = "\n".join(header + body) + "\n"
    if args.outvcf.endswith(".gz"):
        w = bgzf.BgzfWriter(args.outvcf)
        w.write(text.encode())
        w.close()
    else:
        open(args.outvcf, "w").write(text)
    print(f"merged {len(keep)} surrogate long-indel calls -> {args.outvcf}",
          file=sys.stderr)


def run(argv=None):
    ap = argparse.ArgumentParser(prog="uvc_tpu-surrogate-align",
                                 description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    ex = sub.add_parser("extract")
    ex.add_argument("invcf")
    ex.add_argument("bam")
    ex.add_argument("-o", "--outdir", required=True)
    ex.add_argument("--pad", type=int, default=120)
    ra = sub.add_parser("realign")
    ra.add_argument("outdir", help="dir with superactive.bed + FASTQs "
                                   "from `extract`")
    ra.add_argument("fasta")
    ra.add_argument("-o", "--obam", required=True)
    ra.add_argument("--margin", type=int, default=150)
    # bwa mem -A 3 -B 12 -O 18 -E 1 (bin/uvcSurrogateAlign.sh)
    ra.add_argument("--match", type=int, default=3)
    ra.add_argument("--mismatch", type=int, default=12)
    ra.add_argument("--gap-open", type=int, default=18)
    ra.add_argument("--gap-ext", type=int, default=1)
    ra.add_argument("--min-score", type=int, default=60)
    mg = sub.add_parser("merge")
    mg.add_argument("outvcf")
    mg.add_argument("original")
    mg.add_argument("surrogate")
    mg.add_argument("--indel-size", type=int, default=14)
    args = ap.parse_args(argv)
    if args.cmd == "extract":
        extract(args)
    elif args.cmd == "realign":
        realign(args)
    else:
        merge(args)


if __name__ == "__main__":
    run()
