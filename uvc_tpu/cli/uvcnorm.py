"""Post-hoc variant normalization: the bin/uvcnorm.sh equivalent.

Filters UVC records by the QUAL gates (SNV 58.5 / non-SNV 49.5 by
default), the vNLODQ cross-type condition, and the cVQ1M/cVQ2M
consensus-allele rescue conditions, then left-aligns indels against the
reference (bcftools-norm equivalent for the biallelic records this caller
emits). No external bcftools dependency.
"""

import argparse
import sys

from ..io import bgzf
from ..io.fasta import FastaFile


def left_align(chrom_seq, pos1, ref, alt):
    """Left-align one indel (pos1 is 1-based). Returns (pos1, ref, alt)."""
    if len(ref) == len(alt) or ref[0] != alt[0]:
        return pos1, ref, alt
    # strip identical suffix bases while extending to the left
    while (len(ref) > 1 and len(alt) > 1 and ref[-1] == alt[-1]):
        ref = ref[:-1]
        alt = alt[:-1]
    while (len(ref) > 1 and len(alt) > 1 and ref[0] == alt[0]
           and ref[-1] == alt[-1]):
        ref = ref[:-1]
        alt = alt[:-1]
    # shift left while the trailing base equals the base before pos
    longer, shorter = (ref, alt) if len(ref) > len(alt) else (alt, ref)
    while pos1 > 1 and len(shorter) == 1 and longer[-1] == chrom_seq[pos1 - 2]:
        prev = chrom_seq[pos1 - 2]
        longer = prev + longer[:-1]
        shorter = prev
        pos1 -= 1
    if len(ref) > len(alt):
        ref, alt = longer, shorter
    else:
        alt, ref = longer, shorter
    return pos1, ref, alt


def run(argv=None):
    ap = argparse.ArgumentParser(prog="uvc_tpu-norm",
                                 description="uvcnorm.sh equivalent")
    ap.add_argument("input_vcf")
    ap.add_argument("output_vcf")
    ap.add_argument("-f", "--fasta", help="Reference FASTA for left-alignment")
    ap.add_argument("--min-snv-qual", type=float, default=58.5)
    ap.add_argument("--min-non-snv-qual", type=float, default=49.5)
    ap.add_argument("--min-nlodq", type=float, default=-9999)
    args = ap.parse_args(argv)

    fa = FastaFile(args.fasta) if args.fasta else None
    if bgzf.is_bgzf(args.input_vcf):
        text = bgzf.read_file(args.input_vcf).decode()
    else:
        text = open(args.input_vcf).read()
    out = bgzf.BgzfWriter(args.output_vcf) if args.output_vcf != "-" else None
    n_in = n_out = 0
    lines_out = []
    for line in text.splitlines():
        if line.startswith("#"):
            lines_out.append(line)
            continue
        cols = line.split("\t")
        chrom, pos1, _, ref, alt, qual_s = cols[0], int(cols[1]), cols[2], cols[3], cols[4], cols[5]
        if alt == "*" or alt.startswith("<"):
            continue
        n_in += 1
        try:
            q = float(qual_s)
        except ValueError:
            continue
        fmt_d = dict(zip(cols[8].split(":"), cols[9].split(":")))
        vnlodq = fmt_d.get("vNLODQ", "9999,9999").split(",")
        try:
            if (float(vnlodq[0]) <= args.min_nlodq
                    or float(vnlodq[-1]) <= args.min_nlodq):
                continue
        except ValueError:
            pass
        is_snv = len(ref) == 1 and len(alt) == 1
        qual_pass = (q >= args.min_snv_qual if is_snv
                     else q >= args.min_non_snv_qual)
        if not qual_pass:
            # consensus-allele rescue (uvcnorm.sh bcftools expression)
            try:
                c1m = int(fmt_d.get("cVQ1M", -999))
                c2m = int(fmt_d.get("cVQ2M", -999))
                c1 = int(fmt_d.get("cVQ1", "-999").split(",")[-1])
                c2 = int(fmt_d.get("cVQ2", "-999").split(",")[-1])
                if not ((c1m - c2m >= 0 and c1m - c1 == 0)
                        or (c1m - c2m < 0 and c2m - c2 == 0)):
                    continue
            except ValueError:
                continue
        if fa is not None and len(ref) != len(alt):
            seq = fa.fetch(chrom).decode()
            pos1, ref, alt = left_align(seq, pos1, ref, alt)
            cols[1], cols[3], cols[4] = str(pos1), ref, alt
        lines_out.append("\t".join(cols))
        n_out += 1
    payload = "\n".join(lines_out) + "\n"
    if out:
        out.write(payload.encode())
        out.close()
    else:
        sys.stdout.write(payload)
    print(f"uvc_tpu-norm: {n_in} -> {n_out} records", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(run())
