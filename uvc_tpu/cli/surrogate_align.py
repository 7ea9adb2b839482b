"""uvcSurrogateAlign equivalent (bin/uvcSurrogateAlign.sh; alpha in the
reference as well).

Pipeline: extract <ADDITIONAL_INDEL_CANDIDATE> super-active regions from a
uvc_tpu VCF into a padded/merged BED, export the reads overlapping those
regions as FASTQ (R1/R2/SE) for re-alignment with a strict aligner (the
reference uses ``bwa mem -A 3 -B 12 -O 18 -E 1 -L 18``; bwa is not bundled
here, so the re-alignment step is delegated to the user or any aligner on
PATH), then re-call the surrogate BAM with ``uvc1 --outvar-flag 0xF`` and
merge long-indel (>14bp) germline calls back over the original VCF.

Subcommands:
  extract  invcf bam -o OUTDIR [--pad 120]   -> superactive.bed + FASTQs
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
    print("Next: re-align with a strict aligner (reference used "
          "'bwa mem -A 3 -B 12 -O 18 -E 1 -L 18'), re-call with "
          "'uvc1 --outvar-flag 15', then 'surrogate_align merge'.",
          file=sys.stderr)


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
    mg = sub.add_parser("merge")
    mg.add_argument("outvcf")
    mg.add_argument("original")
    mg.add_argument("surrogate")
    mg.add_argument("--indel-size", type=int, default=14)
    args = ap.parse_args(argv)
    if args.cmd == "extract":
        extract(args)
    else:
        merge(args)


if __name__ == "__main__":
    run()
