"""Round-trip tests for BGZF/BAM/FASTA codecs and the simulator."""

import numpy as np
import pytest

from uvc_tpu.io import bgzf, bam
from uvc_tpu.io.bam import BAM_CMATCH, BAM_CINS, BAM_CDEL, BAM_CSOFT_CLIP
from uvc_tpu.io.fasta import FastaFile, write_fasta
from uvc_tpu.io import simulate
from uvc_tpu.constants import Symbol


def test_bgzf_roundtrip(tmp_path):
    data = bytes(np.random.default_rng(0).integers(0, 256, 200000, dtype=np.uint8))
    p = tmp_path / "x.bgz"
    with bgzf.BgzfWriter(str(p)) as w:
        w.write(data)
    assert bgzf.read_file(str(p)) == data
    assert bgzf.is_bgzf(str(p))
    # EOF marker present
    raw = p.read_bytes()
    assert raw.endswith(bgzf.BGZF_EOF)


def test_bgzf_block_concat_property(tmp_path):
    """Independently compressed blocks concatenate into a valid stream —
    the property the distributed VCF writer relies on."""
    a = bgzf.compress(b"hello " * 1000)
    b = bgzf.compress(b"world " * 1000)
    assert bgzf.decompress(a + b + bgzf.BGZF_EOF) == b"hello " * 1000 + b"world " * 1000


def test_bam_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "t.bam")
    header = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:1000\n"
    recs = [
        ("read1#ACGTAA", 0x63, 0, 100, 60, [(BAM_CMATCH, 10)], 0, 300, 250,
         "ACGTACGTAC", "I" * 10),
        ("read2", 0x93, 0, 150, 37,
         [(BAM_CSOFT_CLIP, 2), (BAM_CMATCH, 5), (BAM_CINS, 2), (BAM_CMATCH, 3)],
         0, 100, -250, "TTGGCCAAGGTT"[:12], "J" * 12),
        ("read3", 0x10, 0, 200, 0, [(BAM_CMATCH, 4), (BAM_CDEL, 3), (BAM_CMATCH, 4)],
         -1, -1, 0, "ACGTTGCA", "#IJ@ABCD"),
    ]
    bam.write_bam(p, header, [("chr1", 1000)], recs)
    hdr, batch = bam.read_bam(p)
    assert hdr.ref_names == ["chr1"] and hdr.ref_lens == [1000]
    assert hdr.text.startswith("@HD")
    assert batch.n == 3
    assert batch.qname(0) == b"read1#ACGTAA"
    assert batch.qname(2) == b"read3"
    assert list(batch.pos) == [100, 150, 200]
    assert list(batch.flag) == [0x63, 0x93, 0x10]
    assert list(batch.mapq) == [60, 37, 0]
    assert list(batch.isize) == [250, -250, 0]
    assert batch.cigar(1) == [(BAM_CSOFT_CLIP, 2), (BAM_CMATCH, 5),
                              (BAM_CINS, 2), (BAM_CMATCH, 3)]
    # seq roundtrip as symbols
    want = [Symbol.BASE_A, Symbol.BASE_C, Symbol.BASE_G, Symbol.BASE_T] * 2 + [
        Symbol.BASE_A, Symbol.BASE_C]
    assert list(batch.read_seq_symbols(0)) == [int(x) for x in want]
    # qual: 'I' = phred 40
    assert list(batch.read_qual(0)) == [40] * 10
    assert list(batch.read_qual(2)) == [2, 40, 41, 31, 32, 33, 34, 35]
    # rend: M/D consume reference
    assert list(batch.rend) == [110, 158, 211]


def test_bam_empty(tmp_path):
    p = str(tmp_path / "e.bam")
    bam.write_bam(p, "@HD\tVN:1.6\n", [("chr1", 100)], [])
    hdr, batch = bam.read_bam(p)
    assert batch.n == 0


def test_fasta_roundtrip(tmp_path):
    p = str(tmp_path / "r.fa")
    write_fasta(p, [("chr1", "ACGTACGTNN"), ("chr2", "ttttgggg")])
    fa = FastaFile(p)
    assert fa.names == ["chr1", "chr2"]
    assert fa.fetch("chr1") == b"ACGTACGTNN"
    assert fa.fetch("chr2") == b"TTTTGGGG"  # upper-cased
    assert fa.fetch("chr1", 2, 6) == b"GTAC"
    sym = fa.fetch_symbols("chr1", 0, 5)
    assert list(sym) == [0, 1, 2, 3, 0]
    fa.write_fai()
    fai = (tmp_path / "r.fa.fai").read_text().splitlines()
    assert fai[0].split("\t")[0] == "chr1"
    assert fai[0].split("\t")[1] == "10"


def test_simulator_produces_sorted_consistent_bam(tmp_path):
    fa, bam_path, ref, variants, n = simulate.build_test_dataset(str(tmp_path))
    hdr, batch = bam.read_bam(bam_path)
    assert batch.n == n > 100
    assert np.all(np.diff(batch.pos) >= 0)  # coordinate-sorted
    # every read: cigar query length == seq length
    for i in range(batch.n):
        qlen = sum(ln for op, ln in batch.cigar(i)
                   if op in (BAM_CMATCH, BAM_CINS, BAM_CSOFT_CLIP, 7, 8))
        assert qlen == batch.seq_off[i + 1] - batch.seq_off[i]
    # planted SNV is present in some reads at ~30% of coverage
    snv = variants[0]
    alt_sym = {"A": 0, "C": 1, "G": 2, "T": 3}[snv.spec.split(">")[1]]
    n_alt = n_cov = 0
    for i in range(batch.n):
        p0, p1 = batch.pos[i], batch.rend[i]
        if p0 <= snv.pos < p1 and batch.cigar(i)[0][0] == BAM_CMATCH and len(batch.cigar(i)) == 1:
            n_cov += 1
            if batch.read_seq_symbols(i)[snv.pos - p0] == alt_sym:
                n_alt += 1
    assert n_cov > 20
    assert 0.1 < n_alt / n_cov < 0.55


def test_native_decoder_parity(tmp_path):
    """The C++ decoder must produce a byte-identical ReadBatch."""
    from uvc_tpu.io import native
    if not native.available():
        import pytest
        pytest.skip("native bamdec.so not built")
    fa, bam_path, ref, variants, n = simulate.build_test_dataset(
        str(tmp_path), seed=91)
    h1, b1 = bam.read_bam(bam_path)
    h2, b2 = native.read_bam_native(bam_path)
    assert h1.ref_names == h2.ref_names and h1.text == h2.text
    assert b1.n == b2.n
    for f in ("tid", "pos", "mapq", "flag", "mtid", "mpos", "isize",
              "cigar_op", "cigar_len", "cigar_off", "seq", "qual",
              "seq_off", "qname_off"):
        assert np.array_equal(np.asarray(getattr(b1, f)),
                              np.asarray(getattr(b2, f))), f
    assert b1.qname_data == b2.qname_data


def test_filter_batch_drops_nonprimary(tmp_path):
    """Unmapped/secondary/supplementary/low-MAPQ reads are filtered out
    (grouping.cpp:356-380) and the columnar arrays stay consistent."""
    from uvc_tpu.config import UVCConfig
    ref = simulate.random_ref(2000, 9)
    path = str(tmp_path / "f.bam")
    simulate.build_bam(path, ref, depth=20, seed=2)
    hdr, batch = bam.read_bam(path)
    n0 = batch.n
    qn0 = batch.qnames()
    # corrupt flags on a few reads
    batch.flag = batch.flag.copy()
    batch.mapq = batch.mapq.copy()
    batch.flag[0] |= 0x4       # unmapped
    batch.flag[1] |= 0x100     # secondary
    batch.flag[2] |= 0x800     # supplementary
    batch.mapq[3] = 0
    cfg = UVCConfig()
    cfg.kept_aln_min_mapqual = 10
    out = bam.filter_batch(batch, cfg)
    assert out.n == n0 - 4
    # remaining reads keep their own qname/seq/cigar alignment
    kept_qn = out.qnames()
    assert kept_qn == qn0[4:]
    i = 2
    np.testing.assert_array_equal(out.read_seq_symbols(i),
                                  batch.read_seq_symbols(i + 4))
    assert out.cigar(i) == batch.cigar(i + 4)
