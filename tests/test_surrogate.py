"""uvcSurrogateAlign equivalent (bin/uvcSurrogateAlign.sh): extract
super-active regions + reads, merge long-indel germline calls back."""

import gzip

import numpy as np

from uvc_tpu.cli import surrogate_align
from uvc_tpu.io import simulate, bgzf


def test_extract_and_merge(tmp_path):
    ref = simulate.random_ref(3000, 3)
    bam_path = str(tmp_path / "t.bam")
    simulate.build_bam(bam_path, ref, depth=30, seed=4)
    invcf = str(tmp_path / "in.vcf")
    with open(invcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write("chr1\t1500\t.\tA\t<ADDITIONAL_INDEL_CANDIDATE>\t.\t.\t.\n")
        fh.write("chr1\t1550\t.\tC\t<ADDITIONAL_INDEL_CANDIDATE>\t.\t.\t.\n")
        fh.write("chr1\t900\t.\tG\tA\t50\tPASS\tANY_VAR\n")
    outdir = str(tmp_path / "surr")
    surrogate_align.run(["extract", invcf, bam_path, "-o", outdir])
    bed = open(outdir + "/superactive.bed").read().splitlines()
    assert len(bed) == 2  # track line + one merged interval (pads overlap)
    chrom, beg, end = bed[1].split("\t")
    assert int(beg) <= 1379 and int(end) >= 1670
    r1 = gzip.open(outdir + "/surrogate.R1.fastq.gz", "rt").read()
    assert r1.count("@") >= 10  # reads overlapping the region exported

    # merge: surrogate long-indel germline call is grafted over original
    surr = str(tmp_path / "surrogate.vcf")
    with open(surr, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        fh.write("chr1\t1500\t.\tA" + "T" * 20 + "\tA\t60\tPASS\tGERMLINE\n")
        fh.write("chr1\t1600\t.\tG\tC\t60\tPASS\tGERMLINE\n")  # short: dropped
    outvcf = str(tmp_path / "merged.vcf")
    surrogate_align.run(["merge", outvcf, invcf, surr])
    body = [l for l in open(outvcf).read().splitlines()
            if not l.startswith("#")]
    assert any("T" * 20 in l for l in body)       # long indel merged in
    assert not any("\t1600\t" in l for l in body)  # short surrogate dropped
    assert any("\t900\t" in l for l in body)       # original kept
