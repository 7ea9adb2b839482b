"""Tumor-normal pipeline driver: the bin/uvcTN.sh equivalent.

Runs the tumor-only call on the tumor BAM, then the normal call with
--tumor-vcf joint filtering, producing <outpref>.tumor.vcf.gz and
<outpref>.normal.vcf.gz (the latter holds the SOMATIC records with the
tumor sample column appended), replicating uvcTN.sh's two-stage flow.
"""

import argparse
import sys

from . import uvc1


def run(argv=None):
    ap = argparse.ArgumentParser(
        prog="uvc_tpu-tn",
        description="Tumor-normal somatic calling (uvcTN.sh equivalent)")
    ap.add_argument("fasta", help="Reference FASTA")
    ap.add_argument("tumor_bam")
    ap.add_argument("normal_bam")
    ap.add_argument("outpref", help="Output prefix")
    ap.add_argument("samples", nargs="?", default="TUMOR,NORMAL",
                    help="tumorSample,normalSample")
    ap.add_argument("--tumor-params", default="", help="Extra uvc1 flags for the tumor run")
    ap.add_argument("--normal-params", default="", help="Extra uvc1 flags for the normal run")
    args = ap.parse_args(argv)
    tsample, _, nsample = args.samples.partition(",")
    nsample = nsample or "NORMAL"

    tumor_vcf = args.outpref + ".tumor.vcf.gz"
    normal_vcf = args.outpref + ".normal.vcf.gz"

    sched_bed = args.outpref + ".tumor.bed"
    t_args = [args.tumor_bam, "-f", args.fasta, "-o", tumor_vcf,
              "-s", tsample, "--tn-is-paired", "1",
              "--bed-out-fname", sched_bed]
    if args.tumor_params:
        t_args += args.tumor_params.split()
    print(f"uvc_tpu-tn: tumor call -> {tumor_vcf}", file=sys.stderr)
    rc = uvc1.run(t_args)
    if rc:
        return rc

    # the normal run replays the tumor's region schedule (uvcTN.sh
    # --bed-in-fname semantics)
    n_args = [args.normal_bam, "-f", args.fasta, "-o", normal_vcf,
              "-s", nsample, "--tn-is-paired", "1",
              "--tumor-vcf", tumor_vcf, "--bed-in-fname", sched_bed]
    if args.normal_params:
        n_args += args.normal_params.split()
    print(f"uvc_tpu-tn: normal call -> {normal_vcf}", file=sys.stderr)
    return uvc1.run(n_args)


if __name__ == "__main__":
    sys.exit(run())
