"""BAM decoding into columnar numpy "read blocks".

TPU-first design: instead of the reference's per-read htslib iteration
(grouping.cpp:608-997 walks bam1_t records one at a time), the decoder
produces struct-of-arrays batches — fixed fields as flat numpy arrays,
variable-length fields (qname/cigar/seq/qual) as flat data arrays plus
offset arrays — ready for vectorized CIGAR expansion and device transfer.

Record layout reference: SAM spec v1.6 §4.2 (as consumed by htslib in the
reference via sam_read1).

The decode path is vectorized numpy except for the per-record boundary scan;
the native C++ decoder (io/native) replaces the whole parse for production
throughput, emitting the same ReadBatch layout.
"""

from dataclasses import dataclass
import struct

import numpy as np

from . import bgzf
from ..constants import SEQ_NT16_TO_SYMBOL, SEQ_NT16_STR

BAM_CIGAR_OPS = "MIDNSHP=X"
BAM_CMATCH, BAM_CINS, BAM_CDEL, BAM_CREF_SKIP = 0, 1, 2, 3
BAM_CSOFT_CLIP, BAM_CHARD_CLIP, BAM_CPAD, BAM_CEQUAL, BAM_CDIFF = 4, 5, 6, 7, 8

# flag bits
FPAIRED, FPROPER_PAIR, FUNMAP, FMUNMAP = 0x1, 0x2, 0x4, 0x8
FREVERSE, FMREVERSE, FREAD1, FREAD2 = 0x10, 0x20, 0x40, 0x80
FSECONDARY, FQCFAIL, FDUP, FSUPPLEMENTARY = 0x100, 0x200, 0x400, 0x800


@dataclass
class BamHeader:
    text: str
    ref_names: list
    ref_lens: list

    @property
    def n_ref(self):
        return len(self.ref_names)

    def name2tid(self):
        return {n: i for i, n in enumerate(self.ref_names)}


@dataclass
class ReadBatch:
    """Columnar batch of BAM records (struct-of-arrays)."""

    n: int
    tid: np.ndarray      # int32 [n]
    pos: np.ndarray      # int32 [n] 0-based leftmost ref position
    mapq: np.ndarray     # uint8 [n]
    flag: np.ndarray     # uint16 [n]
    mtid: np.ndarray     # int32 [n]
    mpos: np.ndarray     # int32 [n]
    isize: np.ndarray    # int32 [n] (template length)
    qname_data: bytes    # concatenated qnames (no NUL)
    qname_off: np.ndarray  # int64 [n+1]
    cigar_op: np.ndarray   # uint8 [m] op codes 0-8
    cigar_len: np.ndarray  # int32 [m]
    cigar_off: np.ndarray  # int64 [n+1]
    seq: np.ndarray      # int8 [b] symbol codes (0-3 ACGT, 4 N)
    qual: np.ndarray     # uint8 [b] raw phred
    seq_off: np.ndarray  # int64 [n+1]
    nm: np.ndarray = None  # int32 [n] NM aux tag (-1 = absent); None = all absent

    def nm_filled(self) -> np.ndarray:
        """NM per read with -1 for tag-absent reads (reference reads the
        NM aux tag at main.hpp:980,1810 and falls back to nge_cnt)."""
        if self.nm is None:
            return np.full(self.n, -1, dtype=np.int32)
        return self.nm

    def qname(self, i: int) -> bytes:
        return self.qname_data[self.qname_off[i]:self.qname_off[i + 1]]

    def qnames(self):
        qd = self.qname_data
        off = self.qname_off
        return [qd[off[i]:off[i + 1]] for i in range(self.n)]

    def cigar(self, i: int):
        s, e = self.cigar_off[i], self.cigar_off[i + 1]
        return list(zip(self.cigar_op[s:e], self.cigar_len[s:e]))

    def read_seq_symbols(self, i: int) -> np.ndarray:
        return self.seq[self.seq_off[i]:self.seq_off[i + 1]]

    def read_qual(self, i: int) -> np.ndarray:
        return self.qual[self.seq_off[i]:self.seq_off[i + 1]]

    @property
    def rend(self) -> np.ndarray:
        """0-based exclusive reference end per read (pos + ref-consumed)."""
        consumes_ref = np.isin(self.cigar_op, (BAM_CMATCH, BAM_CDEL,
                                               BAM_CREF_SKIP, BAM_CEQUAL,
                                               BAM_CDIFF))
        ref_len = _segment_sum(self.cigar_len * consumes_ref, self.cigar_off)
        return self.pos + ref_len.astype(np.int32)


def concat_batches(pieces) -> ReadBatch:
    """Concatenate columnar ReadBatch pieces (streaming tier-1 assembly),
    rebasing the per-read offset arrays."""
    if len(pieces) == 1:
        return pieces[0]
    n = sum(p.n for p in pieces)

    def cat(attr):
        return np.concatenate([getattr(p, attr) for p in pieces])

    def cat_off(attr):
        out = np.empty(n + 1, dtype=np.int64)
        out[0] = 0
        i = 0
        base = 0
        for p in pieces:
            off = getattr(p, attr)
            out[i + 1:i + 1 + p.n] = off[1:] + base
            base += off[-1]
            i += p.n
        return out

    return ReadBatch(
        n=n, tid=cat("tid"), pos=cat("pos"), mapq=cat("mapq"),
        flag=cat("flag"), mtid=cat("mtid"), mpos=cat("mpos"),
        isize=cat("isize"),
        qname_data=b"".join(p.qname_data for p in pieces),
        qname_off=cat_off("qname_off"),
        cigar_op=cat("cigar_op"), cigar_len=cat("cigar_len"),
        cigar_off=cat_off("cigar_off"),
        seq=cat("seq"), qual=cat("qual"), seq_off=cat_off("seq_off"),
        nm=(None if all(p.nm is None for p in pieces)
            else np.concatenate([p.nm_filled() for p in pieces])))


def subset_batch(batch: ReadBatch, keep: np.ndarray) -> ReadBatch:
    """New ReadBatch with the reads at (sorted) indices `keep`."""
    keep = np.asarray(keep, dtype=np.int64)
    qoff = batch.qname_off
    coff = batch.cigar_off
    soff = batch.seq_off
    qlens = (qoff[keep + 1] - qoff[keep]).astype(np.int64)
    clens = (coff[keep + 1] - coff[keep]).astype(np.int64)
    slens = (soff[keep + 1] - soff[keep]).astype(np.int64)
    qidx = _flat_gather_idx(qoff[keep].astype(np.int64), qlens)
    cidx = _flat_gather_idx(coff[keep].astype(np.int64), clens)
    sidx = _flat_gather_idx(soff[keep].astype(np.int64), slens)
    qd = np.frombuffer(batch.qname_data, dtype=np.uint8)[qidx].tobytes()
    return ReadBatch(
        n=len(keep), tid=batch.tid[keep], pos=batch.pos[keep],
        mapq=batch.mapq[keep], flag=batch.flag[keep], mtid=batch.mtid[keep],
        mpos=batch.mpos[keep], isize=batch.isize[keep],
        qname_data=qd,
        qname_off=np.concatenate([[0], np.cumsum(qlens)]),
        cigar_op=batch.cigar_op[cidx], cigar_len=batch.cigar_len[cidx],
        cigar_off=np.concatenate([[0], np.cumsum(clens)]),
        seq=batch.seq[sidx], qual=batch.qual[sidx],
        seq_off=np.concatenate([[0], np.cumsum(slens)]),
        nm=None if batch.nm is None else batch.nm[keep])


def filter_batch(batch: ReadBatch, cfg) -> ReadBatch:
    """Alignment filters of fill_isrc_isr2_beg_end_with_aln
    (grouping.cpp:356-380): drop unmapped (0x4), non-primary (0x900),
    low-MAPQ, short-alignment, and out-of-bounds-isize reads."""
    flag = batch.flag.astype(np.int64)
    keep = (flag & 0x4) == 0
    keep &= (flag & 0x900) == 0
    keep &= batch.mapq.astype(np.int64) >= cfg.kept_aln_min_mapqual
    if cfg.kept_aln_min_aln_len > 0:
        keep &= (batch.rend.astype(np.int64) - batch.pos
                 >= cfg.kept_aln_min_aln_len)
    isize = np.abs(batch.isize.astype(np.int64))
    paired_nonzero = ((flag & 0x1) != 0) & (batch.isize != 0)
    if cfg.kept_aln_is_zero_isize_discarded:
        keep &= ~(((flag & 0x1) != 0) & (batch.isize == 0))
    keep &= ~(paired_nonzero & ((isize < cfg.kept_aln_min_isize)
                                | (isize > cfg.kept_aln_max_isize)))
    if bool(keep.all()):
        return batch
    return subset_batch(batch, np.flatnonzero(keep))


def _segment_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    c = np.concatenate([[0], np.cumsum(values, dtype=np.int64)])
    return c[offsets[1:]] - c[offsets[:-1]]


def _flat_gather_idx(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat indices covering [starts[i], starts[i]+lens[i]) for all i."""
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(lens)
    begins = ends - lens
    return np.arange(total, dtype=np.int64) + np.repeat(starts - begins, lens)


def parse_header(buf: memoryview):
    """Parse the BAM header; returns (BamHeader, offset_of_first_record)."""
    if bytes(buf[:4]) != b"BAM\x01":
        raise ValueError("not a BAM file (bad magic)")
    l_text = struct.unpack_from("<i", buf, 4)[0]
    text = bytes(buf[8:8 + l_text]).split(b"\x00")[0].decode()
    off = 8 + l_text
    n_ref = struct.unpack_from("<i", buf, off)[0]
    off += 4
    names, lens = [], []
    for _ in range(n_ref):
        l_name = struct.unpack_from("<i", buf, off)[0]
        names.append(bytes(buf[off + 4:off + 4 + l_name - 1]).decode())
        lens.append(struct.unpack_from("<i", buf, off + 4 + l_name)[0])
        off += 8 + l_name
    return BamHeader(text, names, lens), off


def decode_records(buf, start: int = 0, end: int = None) -> ReadBatch:
    """Decode all records in buf[start:end] into one columnar ReadBatch."""
    u8 = np.frombuffer(buf, dtype=np.uint8)
    if end is None:
        end = len(u8)
    # pass 1: record boundaries (the only per-record python loop)
    offs = []
    ends = []
    pos = start
    while pos + 4 <= end:
        block_size = int(u8[pos]) | int(u8[pos+1]) << 8 | int(u8[pos+2]) << 16 | int(u8[pos+3]) << 24
        if pos + 4 + block_size > end:
            raise ValueError(
                f"truncated BAM record at byte {pos}: block_size={block_size} "
                f"exceeds buffer end {end}")
        offs.append(pos)
        pos += 4 + block_size
        ends.append(pos)
    n = len(offs)
    rec = np.asarray(offs, dtype=np.int64)
    rec_end = np.asarray(ends, dtype=np.int64)

    def gather_i32(byte_off):
        idx = rec[:, None] + byte_off + np.arange(4)
        return u8[idx].copy().view("<i4")[:, 0]

    def gather_u16(byte_off):
        idx = rec[:, None] + byte_off + np.arange(2)
        return u8[idx].copy().view("<u2")[:, 0]

    if n == 0:
        z32 = np.zeros(0, np.int32)
        return ReadBatch(0, z32, z32.copy(), np.zeros(0, np.uint8),
                         np.zeros(0, np.uint16), z32.copy(), z32.copy(),
                         z32.copy(), b"", np.zeros(1, np.int64),
                         np.zeros(0, np.uint8), z32.copy(),
                         np.zeros(1, np.int64), np.zeros(0, np.int8),
                         np.zeros(0, np.uint8), np.zeros(1, np.int64))

    tid = gather_i32(4)
    pos_arr = gather_i32(8)
    l_read_name = u8[rec + 12].astype(np.int64)
    mapq = u8[rec + 13]
    n_cigar = gather_u16(16).astype(np.int64)
    flag = gather_u16(18)
    l_seq = gather_i32(20).astype(np.int64)
    mtid = gather_i32(24)
    mpos = gather_i32(28)
    isize = gather_i32(32)

    # qname (drop trailing NUL)
    qname_starts = rec + 36
    qname_lens = l_read_name - 1
    qname_idx = _flat_gather_idx(qname_starts, qname_lens)
    qname_data = u8[qname_idx].tobytes()
    qname_off = np.concatenate([[0], np.cumsum(qname_lens)])

    # cigar: uint32 little-endian words
    cig_starts = rec + 36 + l_read_name
    cig_idx = _flat_gather_idx(cig_starts, n_cigar * 4)
    cig_u32 = u8[cig_idx].copy().view("<u4")
    cigar_op = (cig_u32 & 0xF).astype(np.uint8)
    cigar_len = (cig_u32 >> 4).astype(np.int32)
    cigar_off = np.concatenate([[0], np.cumsum(n_cigar)])

    # seq: 4-bit packed
    seq_starts = cig_starts + n_cigar * 4
    packed_lens = (l_seq + 1) // 2
    packed_idx = _flat_gather_idx(seq_starts, packed_lens)
    packed = u8[packed_idx]
    nib = np.empty(packed.size * 2, dtype=np.uint8)
    nib[0::2] = packed >> 4
    nib[1::2] = packed & 0xF
    # drop per-read phantom nibble for odd l_seq: build mask via flat idx
    nib_off_padded = np.concatenate([[0], np.cumsum(packed_lens * 2)])
    keep_idx = _flat_gather_idx(nib_off_padded[:-1], l_seq)
    seq_nt16 = nib[keep_idx]
    seq_sym = SEQ_NT16_TO_SYMBOL[seq_nt16]
    seq_off = np.concatenate([[0], np.cumsum(l_seq)])

    # qual
    qual_starts = seq_starts + packed_lens
    qual_idx = _flat_gather_idx(qual_starts, l_seq)
    qual = u8[qual_idx].copy()

    # aux block: NM tag (SAM spec §4.2.4; reference reads it via
    # bam_aux_get at main.hpp:980,1810). Other tags are skipped by type.
    aux_starts = qual_starts + l_seq
    nm = None
    if bool((aux_starts < rec_end).any()):
        nm = np.full(n, -1, dtype=np.int32)
        mv = u8  # uint8 view
        for i in np.flatnonzero(aux_starts < rec_end):
            v = _aux_get_int(mv, int(aux_starts[i]), int(rec_end[i]), 0x4D4E)
            if v is not None:
                nm[i] = v

    # CG:B,I long-cigar records (SAM spec 4.2.2 / htslib bam_read1): a
    # kSmN placeholder cigar with the real >65535-op cigar in a CG aux
    # array; replace the placeholder with the aux words
    fixes = {}
    for i in np.flatnonzero((n_cigar == 2)
                            & (aux_starts < rec_end)).tolist():
        o = int(cigar_off[i])
        if (cigar_op[o] == 4 and int(cigar_len[o]) == int(l_seq[i])
                and cigar_op[o + 1] == 3):
            arr = _aux_get_b_u32(u8, int(aux_starts[i]), int(rec_end[i]),
                                 0x4743)       # 'CG' little-endian
            if arr is not None:
                fixes[i] = arr
    if fixes:
        ops_l, lens_l = [], []
        for i in range(n):
            w = fixes.get(i)
            if w is not None:
                ops_l.append((w & 0xF).astype(np.uint8))
                lens_l.append((w >> 4).astype(np.int32))
            else:
                sl = slice(int(cigar_off[i]), int(cigar_off[i + 1]))
                ops_l.append(cigar_op[sl])
                lens_l.append(cigar_len[sl])
        cigar_op = np.concatenate(ops_l)
        cigar_len = np.concatenate(lens_l)
        cigar_off = np.concatenate(
            [[0], np.cumsum([len(x) for x in ops_l])])

    return ReadBatch(
        n=n, tid=tid, pos=pos_arr, mapq=mapq.copy(), flag=flag,
        mtid=mtid, mpos=mpos, isize=isize,
        qname_data=qname_data, qname_off=qname_off.astype(np.int64),
        cigar_op=cigar_op, cigar_len=cigar_len,
        cigar_off=cigar_off.astype(np.int64),
        seq=seq_sym, qual=qual, seq_off=seq_off.astype(np.int64),
        nm=nm)


_AUX_FIXED_SIZE = {ord('A'): 1, ord('c'): 1, ord('C'): 1, ord('s'): 2,
                   ord('S'): 2, ord('i'): 4, ord('I'): 4, ord('f'): 4,
                   ord('d'): 8}
_AUX_B_ELSIZE = {ord('c'): 1, ord('C'): 1, ord('s'): 2, ord('S'): 2,
                 ord('i'): 4, ord('I'): 4, ord('f'): 4}
_AUX_INT_DECODE = {
    ord('c'): lambda b, p: int(np.int8(b[p])),
    ord('C'): lambda b, p: int(b[p]),
    ord('s'): lambda b, p: int(b[p]) | (int(np.int8(b[p + 1])) << 8),
    ord('S'): lambda b, p: int(b[p]) | (int(b[p + 1]) << 8),
    ord('i'): lambda b, p: (int(b[p]) | (int(b[p + 1]) << 8)
                            | (int(b[p + 2]) << 16)
                            | (int(np.int8(b[p + 3])) << 24)),
    ord('I'): lambda b, p: (int(b[p]) | (int(b[p + 1]) << 8)
                            | (int(b[p + 2]) << 16) | (int(b[p + 3]) << 24)),
}


def _aux_get_int(b, p: int, end: int, tag16: int):
    """Walk aux tags in b[p:end]; return the integer value of the tag whose
    two chars little-endian-pack to tag16, or None. Skips every SAM aux
    value type (A c C s S i I f d Z H B) so foreign-writer BAMs decode."""
    while p + 3 <= end:
        t = int(b[p]) | (int(b[p + 1]) << 8)
        tp = int(b[p + 2])
        p += 3
        if tp in _AUX_FIXED_SIZE:
            if t == tag16 and tp in _AUX_INT_DECODE and p + _AUX_FIXED_SIZE[tp] <= end:
                return _AUX_INT_DECODE[tp](b, p)
            p += _AUX_FIXED_SIZE[tp]
        elif tp in (ord('Z'), ord('H')):
            while p < end and b[p] != 0:
                p += 1
            p += 1  # NUL
        elif tp == ord('B'):
            if p + 5 > end:
                return None
            el = int(b[p])
            cnt = (int(b[p + 1]) | (int(b[p + 2]) << 8)
                   | (int(b[p + 3]) << 16) | (int(b[p + 4]) << 24))
            p += 5 + _AUX_B_ELSIZE.get(el, 1) * cnt
        else:
            return None  # unknown type: cannot skip safely
    return None


def read_bam(path: str):
    """Decode an entire BAM file: returns (BamHeader, ReadBatch)."""
    raw = bgzf.read_file(path)
    header, off = parse_header(memoryview(raw))
    return header, decode_records(raw, off)


# ---------------------------------------------------------------------------
# BAM writing (test synthesis + consensus output)

_SYM_TO_NT16 = {0: 1, 1: 2, 2: 4, 3: 8, 4: 15}
_CHAR_TO_NT16 = {c: i for i, c in enumerate(SEQ_NT16_STR)}
_CHAR_TO_NT16.update({c.lower(): i for i, c in enumerate(SEQ_NT16_STR)})


def _aux_get_b_u32(b, p: int, end: int, tag16: int):
    """Walk aux tags in b[p:end]; return the B/I (uint32) array of the tag
    whose chars little-endian-pack to tag16, or None."""
    while p + 3 <= end:
        t = int(b[p]) | (int(b[p + 1]) << 8)
        tp = int(b[p + 2])
        p += 3
        if tp in _AUX_FIXED_SIZE:
            p += _AUX_FIXED_SIZE[tp]
        elif tp in (ord('Z'), ord('H')):
            while p < end and b[p] != 0:
                p += 1
            p += 1
        elif tp == ord('B'):
            if p + 5 > end:
                return None
            el = int(b[p])
            cnt = (int(b[p + 1]) | (int(b[p + 2]) << 8)
                   | (int(b[p + 3]) << 16) | (int(b[p + 4]) << 24))
            es = _AUX_B_ELSIZE.get(el, 1)
            if p + 5 + es * cnt > end:
                return None
            if t == tag16 and el == ord('I'):
                return np.asarray(b[p + 5:p + 5 + 4 * cnt]).copy() \
                    .view("<u4")
            p += 5 + es * cnt
        else:
            return None
    return None


def encode_aux_int(tag: str, value: int) -> bytes:
    """Encode one integer aux tag using the smallest type, as htslib's
    bam_aux_update_int does (unsigned types preferred for >=0 values)."""
    t = tag.encode()
    if value >= 0:
        if value <= 0xFF:
            return t + b"C" + struct.pack("<B", value)
        if value <= 0xFFFF:
            return t + b"S" + struct.pack("<H", value)
        return t + b"I" + struct.pack("<I", value)
    if value >= -0x80:
        return t + b"c" + struct.pack("<b", value)
    if value >= -0x8000:
        return t + b"s" + struct.pack("<h", value)
    return t + b"i" + struct.pack("<i", value)


def encode_record(qname: str, flag: int, tid: int, pos: int, mapq: int,
                  cigar, mtid: int, mpos: int, isize: int,
                  seq: str, qual, aux: bytes = b"") -> bytes:
    """Encode one alignment record body (without block_size prefix)."""
    name_b = qname.encode() + b"\x00"
    n_cigar = len(cigar)
    l_seq = len(seq)
    # reg2bin from the SAM spec
    e = pos + max(1, sum(ln for op, ln in cigar
                         if op in (BAM_CMATCH, BAM_CDEL, BAM_CREF_SKIP,
                                   BAM_CEQUAL, BAM_CDIFF))) - 1
    bin_ = _reg2bin(pos, e + 1)
    head = struct.pack("<iiBBHHHiiii", tid, pos, len(name_b), mapq, bin_,
                       n_cigar, flag, l_seq, mtid, mpos, isize)
    cig = b"".join(struct.pack("<I", (ln << 4) | op) for op, ln in cigar)
    packed = bytearray()
    for i in range(0, l_seq, 2):
        hi = _CHAR_TO_NT16.get(seq[i], 15)
        lo = _CHAR_TO_NT16.get(seq[i + 1], 15) if i + 1 < l_seq else 0
        packed.append((hi << 4) | lo)
    if isinstance(qual, str):
        qual_b = bytes(ord(c) - 33 for c in qual)
    else:
        qual_b = bytes(qual)
    body = head + name_b + cig + bytes(packed) + qual_b + aux
    return struct.pack("<i", len(body)) + body


def _reg2bin(beg: int, end: int) -> int:
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


def write_bam(path: str, header_text: str, refs, records, level: int = 6):
    """Write a BAM file. refs: [(name, length)]; records: iterable of tuples
    matching encode_record's signature."""
    payload = bytearray()
    payload += b"BAM\x01"
    text_b = header_text.encode()
    payload += struct.pack("<i", len(text_b)) + text_b
    payload += struct.pack("<i", len(refs))
    for name, ln in refs:
        nb = name.encode() + b"\x00"
        payload += struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln)
    for r in records:
        payload += encode_record(*r)
    with bgzf.BgzfWriter(path, level) as w:
        w.write(bytes(payload))
