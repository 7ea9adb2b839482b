"""Foreign-writer BAM robustness (VERDICT round-4 missing #3 / next #5).

Every BAM the pipeline decoded before this file was written by the repo's
own encoder (io/simulate), so encoder and decoder could share a wrong
assumption invisibly.  These fixtures are hand-constructed straight from
the SAM/BAM spec (struct.pack, independent of io.bam.encode_record):

- aux blocks holding EVERY SAM value type (A c C s S i I f d Z H B with
  all array subtypes), in varying order around the NM tag;
- CG:B,I long-CIGAR records (kSmN placeholder, real cigar in aux —
  SAM spec 4.2.2), which htslib gives the reference for free;
- multi-member BGZF with records split MID-RECORD across block
  boundaries, decoded whole-file and via the streaming reader;
- a BAI carrying the pseudo-bin 37450 metadata entries real indexers
  (samtools) write, driven through the indexed fetch path.

Both decoders (pure-python io/bam.py and native/bamdec.cpp) are pinned.
"""

import struct
import sys
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from uvc_tpu.io import bam as bam_mod  # noqa: E402
from uvc_tpu.io import bgzf  # noqa: E402


# ---------------------------------------------------------------------------
# spec-driven writer (kept deliberately separate from io.bam.encode_record)

_NT16 = {"=": 0, "A": 1, "C": 2, "M": 3, "G": 4, "R": 5, "S": 6, "V": 7,
         "T": 8, "W": 9, "Y": 10, "H": 11, "K": 12, "D": 13, "B": 14,
         "N": 15}
_OPS = "MIDNSHP=XB"


def spec_record(qname, flag, tid, pos, mapq, cigar, seq, qual, mtid=-1,
                mpos=-1, tlen=0, aux=b""):
    """One alignment block per SAM spec section 4.2."""
    name_b = qname.encode() + b"\x00"
    cig_words = b"".join(struct.pack("<I", (ln << 4) | _OPS.index(op))
                         for ln, op in cigar)
    packed = bytearray((len(seq) + 1) // 2)
    for i, c in enumerate(seq):
        packed[i // 2] |= _NT16.get(c, 15) << ((1 - (i & 1)) * 4)
    qual_b = bytes(q for q in qual)
    body = struct.pack("<iiBBHHHiiii", tid, pos, len(name_b), mapq, 0,
                       len(cigar), flag, len(seq), mtid, mpos, tlen) \
        + name_b + cig_words + bytes(packed) + qual_b + aux
    return struct.pack("<i", len(body)) + body


def spec_bam(records, refs=(("chr1", 100000),)):
    """Uncompressed BAM byte stream: magic + header + records."""
    text = b""
    out = b"BAM\x01" + struct.pack("<i", len(text)) + text
    out += struct.pack("<i", len(refs))
    for nm, ln in refs:
        nb = nm.encode() + b"\x00"
        out += struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln)
    return out + b"".join(records)


def write_bgzf(path, raw, split_at=None):
    """BGZF-compress raw, optionally splitting into members at the given
    byte offsets (members may end MID-RECORD; the spec allows any
    partition of the byte stream)."""
    pieces = []
    if split_at:
        prev = 0
        for s in split_at:
            pieces.append(raw[prev:s])
            prev = s
        pieces.append(raw[prev:])
    else:
        pieces = [raw]
    with open(path, "wb") as fh:
        for pc in pieces:
            if pc:
                fh.write(bgzf.compress(pc))
        fh.write(bgzf.BGZF_EOF)


def _aux(tag, tp, payload):
    return tag.encode() + tp.encode() + payload


ALL_TYPE_AUX = (
    _aux("XA", "A", b"Q")
    + _aux("Xc", "c", struct.pack("<b", -5))
    + _aux("XC", "C", struct.pack("<B", 250))
    + _aux("Xs", "s", struct.pack("<h", -30000))
    + _aux("XS", "S", struct.pack("<H", 60000))
    + _aux("NM", "S", struct.pack("<H", 3))        # NM as uint16
    + _aux("Xi", "i", struct.pack("<i", -123456))
    + _aux("XI", "I", struct.pack("<I", 3_000_000_000))
    + _aux("Xf", "f", struct.pack("<f", 1.5))
    + _aux("Xd", "d", struct.pack("<d", 2.5))
    + _aux("XZ", "Z", b"hello world\x00")
    + _aux("XH", "H", b"DEADBEEF\x00")
    + _aux("XB", "B", b"c" + struct.pack("<i", 3) + struct.pack("<3b", -1, 0, 1))
    + _aux("YB", "B", b"S" + struct.pack("<i", 2) + struct.pack("<2H", 7, 9))
    + _aux("ZB", "B", b"f" + struct.pack("<i", 2) + struct.pack("<2f", 0.5, -0.5))
)


def _decode_both(path):
    hdr, b_py = bam_mod.read_bam(path)
    from uvc_tpu.io import native as native_io
    outs = [b_py]
    if native_io.available():
        _, b_nat = native_io.read_bam_native(path)
        outs.append(b_nat)
    return outs


def _cigar_tuples(b, i):
    return [(int(b.cigar_len[k]), _OPS[int(b.cigar_op[k])])
            for k in range(b.cigar_off[i], b.cigar_off[i + 1])]


def test_aux_every_value_type(tmp_path):
    """The decoder must skip every SAM aux value type correctly and still
    find NM wherever it sits (here mid-block as uint16)."""
    seq = "ACGTACGTAC"
    recs = [
        spec_record("r1", 0, 0, 100, 60, [(10, "M")], seq, [30] * 10,
                    aux=ALL_TYPE_AUX),
        # NM typed c (negative impossible but legal) and LAST in the block
        spec_record("r2", 16, 0, 200, 50, [(4, "S"), (6, "M")], seq,
                    [20] * 10,
                    aux=_aux("XZ", "Z", b"x\x00")
                    + _aux("NM", "c", struct.pack("<b", 7))),
        # no aux at all
        spec_record("r3", 0, 0, 300, 40, [(10, "M")], seq, [25] * 10),
        # aux with only non-NM tags
        spec_record("r4", 0, 0, 400, 30, [(10, "M")], seq, [25] * 10,
                    aux=_aux("XB", "B",
                             b"I" + struct.pack("<i", 2)
                             + struct.pack("<2I", 1, 2))),
    ]
    path = str(tmp_path / "aux.bam")
    write_bgzf(path, spec_bam(recs))
    for b in _decode_both(path):
        assert b.n == 4
        assert b.pos.tolist() == [100, 200, 300, 400]
        assert b.nm_filled().tolist() == [3, 7, -1, -1]
        assert _cigar_tuples(b, 1) == [(4, "S"), (6, "M")]
        assert bytes(b.qual[b.seq_off[0]:b.seq_off[1]]) == bytes([30] * 10)


def test_cg_long_cigar(tmp_path):
    """CG:B,I long-cigar (SAM spec 4.2.2): a record whose real cigar has
    >65535 ops is stored as kSmN + CG aux; the decoder must splice the
    real cigar in (the reference inherits this from htslib bam_read1)."""
    n_ops = 70000                       # 35000 x (1M 1D)
    seq_len = 35000
    seq = "ACGT" * (seq_len // 4) + "A" * (seq_len % 4)
    qual = [30] * seq_len
    real_cigar = [(1, "M"), (1, "D")] * (n_ops // 2)
    ref_span = seq_len + n_ops // 2     # M ops + D ops
    cg_words = b"".join(struct.pack("<I", (ln << 4) | _OPS.index(op))
                        for ln, op in real_cigar)
    aux = (_aux("NM", "i", struct.pack("<i", 11))
           + _aux("CG", "B", b"I" + struct.pack("<i", n_ops) + cg_words))
    placeholder = [(seq_len, "S"), (ref_span, "N")]
    recs = [
        spec_record("long1", 0, 0, 1000, 60, placeholder, seq, qual,
                    aux=aux),
        spec_record("short", 0, 0, 2000, 60, [(10, "M")], "ACGTACGTAC",
                    [30] * 10, aux=_aux("NM", "C", struct.pack("<B", 1))),
        # a kSmN-SHAPED cigar WITHOUT a CG tag must stay as-is
        spec_record("fakeCG", 4, 0, 3000, 0,
                    [(10, "S"), (5, "N")], "ACGTACGTAC", [30] * 10),
    ]
    path = str(tmp_path / "cg.bam")
    write_bgzf(path, spec_bam(recs))
    for b in _decode_both(path):
        assert b.n == 3
        n0 = b.cigar_off[1] - b.cigar_off[0]
        assert n0 == n_ops, f"CG cigar not spliced: {n0} ops"
        tup = _cigar_tuples(b, 0)
        assert tup[:4] == [(1, "M"), (1, "D"), (1, "M"), (1, "D")]
        assert int(b.rend[0]) == 1000 + ref_span
        assert b.nm_filled()[0] == 11
        assert _cigar_tuples(b, 1) == [(10, "M")]
        assert _cigar_tuples(b, 2) == [(10, "S"), (5, "N")]


def test_multiblock_bgzf_mid_record_splits(tmp_path):
    """Records straddling BGZF member boundaries at adversarial offsets:
    whole-file decode and the streaming reader must both reassemble."""
    seq = "ACGTACGTACGTACGTACGT"
    recs = [spec_record(f"m{i:03d}", 0, 0, 50 * i + 10, 60, [(20, "M")],
                        seq, [30] * 20,
                        aux=_aux("NM", "C", struct.pack("<B", i % 5)))
            for i in range(64)]
    raw = spec_bam(recs)
    # splits inside the header, inside record bodies, at a block_size
    # field boundary, and 1-byte slivers
    splits = sorted({7, 23, 60, 61, 62, 200, 201, 455, 456, 457, 458,
                     len(raw) // 2, len(raw) - 3})
    path = str(tmp_path / "split.bam")
    write_bgzf(path, raw, split_at=splits)
    ref_path = str(tmp_path / "whole.bam")
    write_bgzf(ref_path, raw)
    hdr_a, a = bam_mod.read_bam(path)
    hdr_b, b = bam_mod.read_bam(ref_path)
    assert a.n == b.n == 64
    np.testing.assert_array_equal(a.pos, b.pos)
    np.testing.assert_array_equal(a.nm_filled(), b.nm_filled())
    # streaming reader over the split file
    from uvc_tpu.io.stream import BamStream
    # chunk must hold at least one whole BGZF block (spec bound 64 KiB);
    # 4 KiB still forces records to straddle successive read_piece calls
    st = BamStream(path, chunk_bytes=4096)
    pieces = []
    while True:
        pc = st.read_piece()
        if pc is None:
            break
        if pc.n:
            pieces.append(pc)
    st.close()
    tot = sum(p.n for p in pieces)
    assert tot == 64, f"streaming reader lost records: {tot}"


def test_bai_pseudo_bins(tmp_path):
    """A BAI with the samtools pseudo-bin 37450 (2 metadata chunks) and
    dummy real bins: read_bai must skip them and the indexed fetch must
    return the right reads."""
    seq = "ACGTACGTACGTACGTACGT"
    recs = [spec_record(f"b{i:03d}", 0, 0, 4000 * i, 60, [(20, "M")], seq,
                        [30] * 20) for i in range(40)]
    raw = spec_bam(recs)
    path = str(tmp_path / "idx.bam")
    write_bgzf(path, raw)
    # virtual offsets of each record: compress per-record so coffsets are
    # knowable without reimplementing bgzf internals: header | records...
    hdr_blob = raw[:len(raw) - sum(len(r) for r in recs)]
    with open(path, "wb") as fh:
        coffs = []
        fh.write(bgzf.compress(hdr_blob))
        for r in recs:
            coffs.append(fh.tell())
            fh.write(bgzf.compress(r))
        fh.write(bgzf.BGZF_EOF)
    # linear index: 16kb windows -> first record at/after each window
    n_windows = (4000 * 39) // 16384 + 1
    ioffs = []
    for w in range(n_windows):
        beg = w * 16384
        i = next(k for k in range(40) if 4000 * k + 20 > beg)
        ioffs.append(coffs[i] << 16)
    bai = b"BAI\x01" + struct.pack("<i", 1)
    bins = []
    # one real bin with a dummy chunk + the pseudo-bin 37450 with the two
    # metadata chunks samtools writes (off_beg/off_end, n_mapped/n_unmapped)
    bins.append(struct.pack("<Ii", 4681, 1)
                + struct.pack("<QQ", coffs[0] << 16, coffs[-1] << 16))
    bins.append(struct.pack("<Ii", 37450, 2)
                + struct.pack("<QQ", coffs[0] << 16, coffs[-1] << 16)
                + struct.pack("<QQ", 40, 0))
    bai += struct.pack("<i", len(bins)) + b"".join(bins)
    bai += struct.pack("<i", n_windows)
    bai += b"".join(struct.pack("<Q", v) for v in ioffs)
    bai_path = path + ".bai"
    with open(bai_path, "wb") as fh:
        fh.write(bai)

    from uvc_tpu.io import bai as bai_mod
    linear = bai_mod.read_bai(bai_path)
    assert len(linear) == 1 and len(linear[0]) == n_windows
    got = bai_mod.fetch_interval(path, linear, 0, 80000, 96000, halo=0)
    want = [4000 * i for i in range(40) if 4000 * i < 96000
            and 4000 * i + 20 > 80000]
    assert sorted(set(got.pos.tolist()) & set(range(80000, 96001))) \
        == want or all(w in got.pos.tolist() for w in want), \
        (got.pos.tolist(), want)
