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


def test_realign_recovers_long_deletion(tmp_path):
    """`realign` (native/swalign.cpp, bwa-strict-shaped scoring): reads
    carrying a 20bp deletion are re-aligned with the xMyDzM cigar at the
    right coordinates, and a uvc1 re-call over the surrogate BAM emits
    the deletion record -- the full in-repo replacement of the
    reference's external `bwa mem` step."""
    import os
    import random
    from uvc_tpu.cli import uvc1 as uvc1_cli
    from uvc_tpu.io import bam as bam_mod

    random.seed(11)
    ref = simulate.random_ref(2400, 11)
    fa = str(tmp_path / "r.fa")
    open(fa, "w").write(">chr1\n" + ref + "\n")
    outdir = str(tmp_path / "surr")
    os.makedirs(outdir)
    # super-active region around the deletion site
    with open(outdir + "/superactive.bed", "w") as fh:
        fh.write("track name=superactive\n")
        fh.write("chr1\t1000\t1400\n")
    # reads: 60% span the 20bp deletion at 1200..1220, 40% are clean
    del_hap = ref[:1200] + ref[1220:]
    r1s = []
    for i in range(60):
        src = del_hap if i % 5 < 3 else ref
        start = random.randint(1000, 1120)
        r1s.append(f"@sd{i:03d}\n{src[start:start + 150]}\n+\n"
                   + "I" * 150 + "\n")
    with gzip.open(outdir + "/surrogate.SE.fastq.gz", "wt") as fh:
        fh.write("".join(r1s))
    for suffix in ("R1", "R2"):
        with gzip.open(outdir + f"/surrogate.{suffix}.fastq.gz", "wt"):
            pass
    obam = str(tmp_path / "surrogate.bam")
    surrogate_align.run(["realign", outdir, fa, "-o", obam])
    hdr, batch = bam_mod.read_bam(obam)
    assert batch.n >= 55, batch.n
    # deletion-spanning reads must carry a 20D op at refpos 1200
    n_del = 0
    for i in range(batch.n):
        p = int(batch.pos[i])
        for k in range(batch.cigar_off[i], batch.cigar_off[i + 1]):
            op, ln = int(batch.cigar_op[k]), int(batch.cigar_len[k])
            if op == 2 and ln == 20:
                n_del += 1
                assert p <= 1200
        assert 950 <= p <= 1260, p
    assert n_del >= 15, n_del
    # re-call the surrogate BAM: the 20bp deletion must be emitted
    out = str(tmp_path / "surr.vcf.gz")
    rc = uvc1_cli.run(["-f", fa, "-o", out, "-t", "1",
                       "--outvar-flag", "15", obam])
    assert rc == 0
    body = bgzf.decompress(open(out, "rb").read()).decode()
    want_ref = ref[1199:1220]
    hits = [l for l in body.splitlines() if not l.startswith("#")
            and l.split("\t")[1] == "1200"
            and l.split("\t")[3] == want_ref]
    assert hits, [l.split("\t")[:5] for l in body.splitlines()
                  if not l.startswith("#")][:8]
