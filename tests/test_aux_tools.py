"""Auxiliary tool tests: debarcode binary, consensus-FASTQ output,
uvcnorm and active_region CLIs."""

import gzip
import os
import subprocess

import numpy as np
import pytest

from uvc_tpu.io import bgzf, simulate

BIN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bin", "debarcode")


@pytest.mark.skipif(not os.path.exists(BIN), reason="debarcode not built")
def test_debarcode_moves_umi_to_name(tmp_path):
    r1 = str(tmp_path / "r1.fq.gz")
    with gzip.open(r1, "wt") as fh:
        fh.write("@read1\nACGTACGTTTTTGGGG\n+\nIIIIIIIIIIIIIIII\n")
        fh.write("@read2\nTTTTAAAACCCCGGGG\n+\nIIIIIIIIIIIIIIII\n")
    out1 = str(tmp_path / "o1.fq.gz")
    rc = subprocess.run([BIN, "-i", r1, "-o", out1, "-b", "0", "-e", "4"],
                        capture_output=True)
    assert rc.returncode == 0, rc.stderr
    lines = gzip.open(out1, "rt").read().splitlines()
    assert lines[0].startswith("@read1#ACGT")
    # the reference debarcode leaves the sequence intact
    # (debarcode_main.c:128 writes seq.s/seq.l unmodified)
    assert lines[1] == "ACGTACGTTTTTGGGG"
    assert lines[4].startswith("@read2#TTTT")


@pytest.mark.skipif(not os.path.exists(BIN), reason="debarcode not built")
def test_debarcode_duplex(tmp_path):
    r1 = str(tmp_path / "r1.fq.gz")
    r2 = str(tmp_path / "r2.fq.gz")
    with gzip.open(r1, "wt") as fh:
        fh.write("@m\nAGTACCCC\n+\nIIIIIIII\n")
    with gzip.open(r2, "wt") as fh:
        fh.write("@m\nTGGTAAAA\n+\nIIIIIIII\n")
    o1 = str(tmp_path / "o1.fq.gz")
    o2 = str(tmp_path / "o2.fq.gz")
    rc = subprocess.run([BIN, "-i", r1, "-o", o1, "-b", "0", "-e", "4",
                         "-j", r2, "-p", o2, "-c", "0", "-f", "4", "-D"],
                        capture_output=True)
    assert rc.returncode == 0, rc.stderr
    name = gzip.open(o1, "rt").readline().strip()
    assert "#AGTA+TGGT" in name


def test_consensus_fastq_output(tmp_path):
    from uvc_tpu.cli import uvc1 as uvc1_cli
    d = str(tmp_path)
    ref = simulate.random_ref(2500, 21)
    path = d + "/u.bam"
    simulate.build_bam(path, ref, depth=60, seed=9, umi=True,
                       n_umi_families=40)
    open(d + "/ref.fa", "w").write(">chr1\n" + ref + "\n")
    pref = d + "/cons"
    rc = uvc1_cli.run(["-f", d + "/ref.fa", "-o", d + "/o.vcf.gz", "-t", "1",
                       path, "--fam-consensus-out-fastq", pref])
    assert rc == 0
    from uvc_tpu.family.consensus_fastq import SUFFIXES
    total_reads = 0
    for suffix in SUFFIXES:
        p = f"{pref}.{suffix}"
        assert os.path.exists(p), suffix
        if os.path.getsize(p):
            text = gzip.open(p, "rt").read()
            total_reads += sum(1 for l in text.splitlines()
                               if l.startswith("@"))
    assert total_reads > 0


def test_uvcnorm_filters_by_qual(tmp_path):
    from uvc_tpu.cli import uvcnorm
    header = ("##fileformat=VCFv4.2\n"
              "##contig=<ID=chr1,length=1000>\n"
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
    fmtk = "GT:cVQ1M:cVQ2M:cVQ1:cVQ2"
    recs = (f"chr1\t100\t.\tA\tC\t80\tPASS\tSOMATIC\t{fmtk}\t./1:80:0:80:0\n"
            # drops: q=20 < 58.5 and the consensus-allele rescue fails
            # (another allele holds the max cVQ1M)
            f"chr1\t200\t.\tA\tG\t20\tQ20\tSOMATIC\t{fmtk}\t./1:50:0:20:0\n"
            f"chr1\t300\t.\tAT\tA\t60\tPASS\tSOMATIC\t{fmtk}\t./1:60:0:60:0\n")
    inp = str(tmp_path / "in.vcf.gz")
    open(inp, "wb").write(bgzf.compress((header + recs).encode())
                          + bgzf.BGZF_EOF)
    outp = str(tmp_path / "out.vcf.gz")
    rc = uvcnorm.run([inp, outp])
    assert rc == 0 or rc is None
    body = [l for l in bgzf.read_file(outp).decode().splitlines()
            if not l.startswith("#")]
    poss = {int(l.split("\t")[1]) for l in body}
    assert poss == {100, 300}


def test_active_region_bed(tmp_path):
    from uvc_tpu.cli import active_region
    d = str(tmp_path)
    ref = simulate.random_ref(4000, 33)
    variants = [simulate.Variant(2000, f"{ref[2000]}>"
                                 + ("A" if ref[2000] != "A" else "C"), 0.5)]
    path = d + "/a.bam"
    simulate.build_bam(path, ref, depth=50, variants=variants, seed=2)
    open(d + "/ref.fa", "w").write(">chr1\n" + ref + "\n")
    import contextlib
    import io as _io
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = active_region.run([path, "-f", d + "/ref.fa"])
    assert rc == 0 or rc is None
    lines = [l.split("\t") for l in buf.getvalue().splitlines() if l]
    assert any(int(l[1]) <= 2000 < int(l[2]) for l in lines), lines


def test_jax_trace_hook(tmp_path, monkeypatch):
    """UVC_TPU_JAX_TRACE_DIR captures an XLA trace; unset it's a no-op."""
    import jax
    import jax.numpy as jnp
    from uvc_tpu.utils import profiling

    # no-op path
    with profiling.maybe_trace("noop"):
        pass
    # tracing path (CPU backend in tests)
    d = str(tmp_path / "trace")
    monkeypatch.setenv(profiling.ENV_VAR, d)
    with profiling.maybe_trace("unit"):
        float(jax.jit(lambda x: (x * 2).sum())(jnp.arange(8.0)))
    import os
    found = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert found, "expected trace artifacts under UVC_TPU_JAX_TRACE_DIR"


def test_device_prepare_gate(tmp_path, monkeypatch):
    """UVC_TPU_DEVICE_PREPARE=1 routes the fragment consensus through the
    jitted on-device reduction (ops/device_consensus.py) and must produce
    a byte-identical VCF body to the native host path."""
    import numpy as np
    from uvc_tpu.io import simulate, bgzf
    from uvc_tpu.cli import uvc1 as uvc1_cli
    from uvc_tpu.ops import device_consensus

    ref = simulate.random_ref(4000, 5)
    variants = [simulate.Variant(p, f"{ref[p]}>"
                                 + ("A" if ref[p] != "A" else "C"), 0.3)
                for p in range(500, 3500, 700)]
    path = str(tmp_path / "t.bam")
    simulate.build_bam(path, ref, depth=40, variants=variants, seed=3)
    fa = str(tmp_path / "ref.fa")
    with open(fa, "w") as fh:
        fh.write(">chr1\n" + ref + "\n")

    def body(out):
        return [l for l in bgzf.decompress(open(out, "rb").read())
                .decode().splitlines() if not l.startswith("##")]

    out1 = str(tmp_path / "host.vcf.gz")
    monkeypatch.delenv("UVC_TPU_DEVICE_PREPARE", raising=False)
    assert uvc1_cli.run(["-f", fa, "-o", out1, "-t", "1", path]) == 0
    out2 = str(tmp_path / "dev.vcf.gz")
    monkeypatch.setenv("UVC_TPU_DEVICE_PREPARE", "1")
    calls0 = device_consensus.STATS["calls"]
    assert uvc1_cli.run(["-f", fa, "-o", out2, "-t", "1", path]) == 0
    assert device_consensus.STATS["calls"] > calls0, \
        "gate did not engage the device reduction"
    assert body(out1) == body(out2)
