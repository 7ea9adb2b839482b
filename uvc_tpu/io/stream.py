"""Streaming tier-1 BAM input: memory-bounded decode + double-buffered
prefetch.

TPU-native replacement for the reference's SamIter region chunker
(grouping.cpp:157-314) and async tier-1 prefetch (main.cpp:1350-1357):
BGZF blocks are decompressed incrementally by the native stream decoder
(native/bamdec.cpp: bgzf_stream_*), records are decoded into columnar
ReadBatch pieces, and an incremental SamIterSim (the bit-exact
SamIter::iternext simulation of schedule.regions) consumes each piece
once, yielding windows of COMPLETE bedline plans whose boundaries, read
content and claim windows equal the whole-file scheduler's -- streaming
never changes the VCF.  A prefetch thread decodes batch N+1 while batch
N computes.
"""

import ctypes
import queue
import threading

import numpy as np

from . import bam as pybam
from . import native as native_io
from ..schedule import regions as regions_mod

CHUNK_BYTES = 8 << 20          # decompressed bytes per stream read
DEFAULT_TIER1_BYTES = 256 << 20  # memory-model budget per tier-1 window


class BamStream:
    """Incremental BGZF+BAM decoder: read_piece() -> ReadBatch or None."""

    def __init__(self, path, chunk_bytes=CHUNK_BYTES):
        self._lib = native_io._load()
        if self._lib is None:
            raise RuntimeError("native decoder unavailable (make -C native)")
        lib = self._lib
        lib.bgzf_stream_open.restype = ctypes.c_void_p
        lib.bgzf_stream_open.argtypes = [ctypes.c_char_p]
        lib.bgzf_stream_read.restype = ctypes.c_int64
        lib.bgzf_stream_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                         ctypes.c_int64]
        lib.bgzf_stream_seek.restype = ctypes.c_int
        lib.bgzf_stream_seek.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.bgzf_stream_eof.restype = ctypes.c_int
        lib.bgzf_stream_eof.argtypes = [ctypes.c_void_p]
        lib.bgzf_stream_tell.restype = ctypes.c_int64
        lib.bgzf_stream_tell.argtypes = [ctypes.c_void_p]
        lib.bgzf_stream_close.argtypes = [ctypes.c_void_p]
        lib.bam_scan_prefix.restype = ctypes.c_int64
        self._h = lib.bgzf_stream_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open {path}")
        self._chunk = chunk_bytes
        self._carry = b""
        self._eof = False
        self.header = None
        self._read_header()

    def close(self):
        if self._h:
            self._lib.bgzf_stream_close(self._h)
            self._h = None

    def _read_more(self):
        buf = np.empty(self._chunk, dtype=np.uint8)
        n = self._lib.bgzf_stream_read(
            self._h, buf.ctypes.data_as(ctypes.c_void_p), self._chunk)
        if n < 0:
            raise IOError(f"bgzf stream error {n}")
        if n == 0:
            self._eof = True
            return False
        self._carry += buf[:n].tobytes()
        return True

    def _read_header(self):
        import struct
        while True:
            if len(self._carry) < 12:
                if not self._read_more():
                    raise ValueError("truncated BAM header")
                continue
            if self._carry[:4] != b"BAM\x01":
                raise ValueError("not a BAM file (bad magic)")
            try:
                self.header, off = pybam.parse_header(memoryview(self._carry))
                self._carry = self._carry[off:]
                return
            except (struct.error, IndexError):
                if not self._read_more():
                    raise ValueError("truncated BAM header")

    def seek_block(self, coffset, uoffset=0):
        """Seek to a BAI virtual offset (compressed block + intra-block)."""
        rc = self._lib.bgzf_stream_seek(self._h, int(coffset))
        if rc != 0:
            raise IOError(f"seek failed to {coffset}")
        self._carry = b""
        self._eof = False
        if uoffset:
            if not self._read_more():
                raise IOError("seek past EOF")
            self._carry = self._carry[int(uoffset):]

    def read_piece(self):
        """Decode the next chunk of COMPLETE records; None at EOF."""
        lib = self._lib
        while True:
            if not self._eof:
                self._read_more()
            buf = self._carry
            u8 = np.frombuffer(buf, dtype=np.uint8)
            consumed = ctypes.c_int64()
            tq = ctypes.c_int64()
            tc = ctypes.c_int64()
            ts = ctypes.c_int64()
            nrec = lib.bam_scan_prefix(
                u8.ctypes.data_as(ctypes.c_void_p), len(u8), 0,
                ctypes.byref(consumed), ctypes.byref(tq), ctypes.byref(tc),
                ctypes.byref(ts))
            if nrec > 0:
                piece = native_io.fill_records(
                    lib, u8, int(consumed.value), int(nrec), int(tq.value),
                    int(tc.value), int(ts.value))
                self._carry = buf[int(consumed.value):]
                return piece
            if self._eof:
                if self._carry:
                    raise ValueError("truncated BAM record at EOF")
                return None


class Tier1Stream:
    """Yields (ReadBatch, [RegionPlan]) tier-1 windows whose plan
    boundaries equal the whole-file scheduler's."""

    def __init__(self, path, ref_lens, mem_per_thread_mb=1536,
                 tier1_bytes=DEFAULT_TIER1_BYTES, stream=None,
                 row_filter=None, nthreads=1, is_fastq_gen=False):
        self.stream = stream or BamStream(path)
        self.header = self.stream.header
        self.ref_lens = ref_lens if ref_lens is not None \
            else self.stream.header.ref_lens
        self.mem_mb = mem_per_thread_mb
        self.budget = tier1_bytes
        self.row_filter = row_filter   # per-read filter (filter_batch)
        # the scheduler is an INCREMENTAL SamIter simulation: each decoded
        # piece is fed exactly once and the flushed bedlines accumulate
        # until they are finalizable (all rows with pos < bedline end have
        # streamed in)
        self._sim = regions_mod.SamIterSim(
            self.ref_lens, mem_per_thread_mb, nthreads, is_fastq_gen)
        self._buf = []            # ReadBatch pieces kept for plan windows
        self._pending = []        # flushed, not yet emitted bedlines
        self._last_tid = -1       # stream cursor (last decoded row)
        self._last_pos = -1
        self._done = False

    def __iter__(self):
        return self

    def __next__(self):
        from ..constants import MAX_INSERT_SIZE
        if self._done:
            raise StopIteration
        while True:
            piece = self._next_piece()
            if piece is not None and piece.n:
                self._pending += [b[:5] for b in self._sim.feed(
                    np.asarray(piece.tid, dtype=np.int64),
                    np.asarray(piece.pos, dtype=np.int64),
                    np.asarray(piece.rend, dtype=np.int64),
                    np.asarray(piece.flag, dtype=np.int64))]
                self._buf.append(piece)
                self._last_tid = int(piece.tid[-1])
                self._last_pos = int(piece.pos[-1])
            if piece is None:
                self._pending += [b[:5] for b in self._sim.finish()]
                self._done = True
                self.stream.close()
                if not self._pending:
                    raise StopIteration
                if not self._buf:
                    raise StopIteration
                window = pybam.concat_batches(self._buf)
                self._buf = []
                plans = regions_mod._plans_from_bedlines(
                    self._pending, window, self.ref_lens)
                return window, plans
            # a bedline is finalizable once every row starting before its
            # end has streamed in (rows arrive (tid, pos)-sorted)
            n_ready = 0
            for (t, b, e, f, nr) in self._pending:
                if t < self._last_tid or (t == self._last_tid
                                          and e <= self._last_pos):
                    n_ready += 1
                else:
                    break
            if n_ready == 0:
                continue
            ready = self._pending[:n_ready]
            rest = self._pending[n_ready:]
            window = pybam.concat_batches(self._buf)
            plans = regions_mod._plans_from_bedlines(ready, window,
                                                     self.ref_lens)
            # retain the rows that future bedlines can re-include: from
            # the earliest of (next pending bedline, the open block) minus
            # the refetch pad (grouping.cpp:664)
            kt, kb = self._sim.block_tid, self._sim.block_beg
            if rest:
                kt, kb = min((kt, kb), (rest[0][0], rest[0][1]))
            if kt < 0:
                keep_from = window.n
            else:
                cut = kb - MAX_INSERT_SIZE - 1
                tids = np.asarray(window.tid, dtype=np.int64)
                pos = np.asarray(window.pos, dtype=np.int64)
                mask = (tids > kt) | ((tids == kt) & (pos >= cut))
                keep_from = int(np.argmax(mask)) if mask.any() else window.n
            self._buf = [_slice_rows(window, keep_from, window.n)] \
                if keep_from < window.n else []
            self._pending = rest
            return window, plans

    def _next_piece(self):
        piece = self.stream.read_piece()
        if piece is not None and self.row_filter is not None:
            piece = self.row_filter(piece)
        return piece


def _slice_rows(batch, i0, i1):
    return regions_mod.slice_batch(
        batch, regions_mod.RegionPlan(tid=0, beg=0, end=0,
                                      read_beg=i0, read_end=i1))


def prefetch(iterator, depth=1):
    """Double-buffered prefetch: a thread computes the next item(s) while
    the caller processes the current one (main.cpp:1350-1357 analog)."""
    q = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 - relayed to consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
    t.join()
