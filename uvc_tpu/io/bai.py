"""BAM index (.bai): writer, reader, and targeted fetch.

The reference relies on htslib's `sam_itr_queryi` for -R/--targets
(iohts, main.cpp:29-70) and on `samtools index` artifacts.  This module is
the self-contained equivalent: `write_bai` builds a spec-compliant BAI
(SAM spec section 5.2: R-tree bins via reg2bin + 16kb linear index) from
the native streaming decoder, and `fetch_interval` seeks the BGZF stream
to the linear-index virtual offset and decodes only the blocks that can
overlap the target interval.
"""

import ctypes
import os
import struct

import numpy as np

from . import native as native_io
from . import stream as stream_mod

WINDOW_SHIFT = 14           # 16kb linear-index windows
MAX_BIN = 37450             # ((1<<18)-1)/7 + 1


def reg2bin(beg, end):
    """SAM spec 5.3: the smallest bin containing [beg, end)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def _block_spans(path):
    """Yield (coffset, data) per BGZF block via the native stream."""
    lib = native_io._load()
    lib.bgzf_stream_open.restype = ctypes.c_void_p
    lib.bgzf_stream_open.argtypes = [ctypes.c_char_p]
    lib.bgzf_stream_read.restype = ctypes.c_int64
    lib.bgzf_stream_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_int64]
    lib.bgzf_stream_tell.restype = ctypes.c_int64
    lib.bgzf_stream_tell.argtypes = [ctypes.c_void_p]
    lib.bgzf_stream_close.argtypes = [ctypes.c_void_p]
    h = lib.bgzf_stream_open(path.encode())
    if not h:
        raise IOError(f"cannot open {path}")
    buf = np.empty(1 << 16, dtype=np.uint8)
    try:
        while True:
            coff = lib.bgzf_stream_tell(h)
            # BGZF blocks are <= 64KiB uncompressed, so max_out of one
            # block size yields exactly one block per call
            n = lib.bgzf_stream_read(h, buf.ctypes.data_as(ctypes.c_void_p),
                                     1 << 16)
            if n < 0:
                raise IOError(f"bgzf stream error {n}")
            if n == 0:
                return
            yield coff, buf[:n].tobytes()
    finally:
        lib.bgzf_stream_close(h)


def write_bai(bam_path, bai_path=None):
    """Build <bam>.bai (samtools-index equivalent)."""
    from . import bam as pybam
    bai_path = bai_path or bam_path + ".bai"
    # carry of undecoded bytes with the (carry_off, coffset, uoff0) spans
    # of the blocks it came from, so record starts map to virtual offsets
    carry = b""
    spans = []      # (carry_start, carry_end, coffset)
    carry_base = 0  # carry offset consumed so far (absolute)
    header = None
    n_ref = 0
    bins = []       # per ref: {bin: [(vbeg, vend)]}
    linear = []     # per ref: {window: min voffset}
    pending_hdr = True

    def voffset_of(abs_off):
        for cs, ce, coff in spans:
            if cs <= abs_off < ce:
                return (coff << 16) | (abs_off - cs)
        raise AssertionError("voffset out of tracked spans")

    abs_consumed = 0
    for coff, data in _block_spans(bam_path):
        spans.append((abs_consumed + len(carry),
                      abs_consumed + len(carry) + len(data), coff))
        carry += data
        if pending_hdr:
            try:
                header, off = pybam.parse_header(memoryview(carry))
            except Exception:
                continue
            pending_hdr = False
            n_ref = header.n_ref
            bins = [dict() for _ in range(n_ref)]
            linear = [dict() for _ in range(n_ref)]
            carry = carry[off:]
            abs_consumed += off
            spans = [(max(cs, abs_consumed), ce, co)
                     for cs, ce, co in spans if ce > abs_consumed]
        # decode complete records
        p = 0
        L = len(carry)
        while p + 4 <= L:
            bs = struct.unpack_from("<i", carry, p)[0]
            if p + 4 + bs > L:
                break
            rec_vbeg = voffset_of(abs_consumed + p)
            rec_vend_off = abs_consumed + p + 4 + bs
            tid, pos = struct.unpack_from("<ii", carry, p + 4)
            if tid >= 0:
                # reference span from the cigar
                n_cigar = struct.unpack_from("<H", carry, p + 4 + 12)[0]
                lrn = carry[p + 4 + 8]
                cg0 = p + 4 + 32 + lrn
                rlen = 0
                for k in range(n_cigar):
                    w = struct.unpack_from("<I", carry, cg0 + 4 * k)[0]
                    op = w & 0xF
                    if op in (0, 2, 3, 7, 8):  # M D N = X
                        rlen += w >> 4
                rend = pos + max(rlen, 1)
                b = reg2bin(pos, rend)
                # vend: one past the record end (may land in a later
                # block; clamp to the current carry extent)
                try:
                    vend = voffset_of(min(rec_vend_off,
                                          abs_consumed + L - 1)) + 1
                except AssertionError:
                    vend = rec_vbeg + 1
                ch = bins[tid].setdefault(b, [])
                if ch and ch[-1][1] >= rec_vbeg:
                    ch[-1] = (ch[-1][0], max(ch[-1][1], vend))
                else:
                    ch.append((rec_vbeg, vend))
                for w in range(pos >> WINDOW_SHIFT,
                               ((rend - 1) >> WINDOW_SHIFT) + 1):
                    lin = linear[tid]
                    if w not in lin or rec_vbeg < lin[w]:
                        lin[w] = rec_vbeg
            p += 4 + bs
        carry = carry[p:]
        abs_consumed += p
        spans = [(cs, ce, co) for cs, ce, co in spans if ce > abs_consumed]

    with open(bai_path, "wb") as f:
        f.write(b"BAI\x01")
        f.write(struct.pack("<i", n_ref))
        for r in range(n_ref):
            f.write(struct.pack("<i", len(bins[r])))
            for b in sorted(bins[r]):
                chunks = bins[r][b]
                f.write(struct.pack("<Ii", b, len(chunks)))
                for vb, ve in chunks:
                    f.write(struct.pack("<QQ", vb, ve))
            if linear[r]:
                n_intv = max(linear[r]) + 1
                ioff = [0] * n_intv
                last = 0
                for w in range(n_intv):
                    if w in linear[r]:
                        last = linear[r][w]
                    ioff[w] = last
                f.write(struct.pack("<i", n_intv))
                f.write(struct.pack(f"<{n_intv}Q", *ioff))
            else:
                f.write(struct.pack("<i", 0))
    return bai_path


def read_bai(bai_path):
    """Returns per-ref linear index arrays (voffsets)."""
    with open(bai_path, "rb") as f:
        data = f.read()
    if data[:4] != b"BAI\x01":
        raise ValueError("not a BAI file")
    off = 4
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    linear = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", data, off)
        off += 4
        for _ in range(n_bin):
            _bin, n_chunk = struct.unpack_from("<Ii", data, off)
            off += 8 + 16 * n_chunk
        (n_intv,) = struct.unpack_from("<i", data, off)
        off += 4
        ioff = np.frombuffer(data, dtype="<u8", count=n_intv, offset=off)
        off += 8 * n_intv
        linear.append(ioff)
    return linear


def fetch_interval(bam_path, linear, tid, beg, end, halo=0):
    """Decode only the reads overlapping [beg-halo, end+halo) on tid,
    starting from the linear-index virtual offset (sam_itr_queryi
    equivalent).  Returns a ReadBatch."""
    from . import bam as pybam
    qbeg = max(0, beg - halo)
    qend = end + halo
    st = stream_mod.BamStream(bam_path)
    lin = linear[tid] if tid < len(linear) else np.zeros(0, dtype="<u8")
    w = min(qbeg >> WINDOW_SHIFT, max(len(lin) - 1, 0))
    voff = int(lin[w]) if len(lin) else 0
    if voff:
        st.seek_block(voff >> 16, voff & 0xFFFF)
    pieces = []
    while True:
        piece = st.read_piece()
        if piece is None:
            break
        keep = (piece.tid == tid) & (piece.pos < qend) \
            & (piece.rend > qbeg)
        if keep.any():
            pieces.append(pybam.subset_batch(piece, np.flatnonzero(keep)))
        # coordinate-sorted: once past the interval (or onto a later
        # contig), stop
        if ((piece.tid > tid).any()
                or ((piece.tid == tid) & (piece.pos >= qend)).any()):
            break
    st.close()
    if not pieces:
        return _empty_batch()
    return pybam.concat_batches(pieces)


def _empty_batch():
    from .bam import ReadBatch
    z64 = np.zeros(1, dtype=np.int64)
    return ReadBatch(
        n=0, tid=np.zeros(0, np.int32), pos=np.zeros(0, np.int32),
        mapq=np.zeros(0, np.uint8), flag=np.zeros(0, np.uint16),
        mtid=np.zeros(0, np.int32), mpos=np.zeros(0, np.int32),
        isize=np.zeros(0, np.int32), qname_data=b"", qname_off=z64.copy(),
        cigar_op=np.zeros(0, np.uint8), cigar_len=np.zeros(0, np.int32),
        cigar_off=z64.copy(), seq=np.zeros(0, np.int8),
        qual=np.zeros(0, np.uint8), seq_off=z64.copy())
