"""Streaming tier-1 BAM input: memory-bounded decode + double-buffered
prefetch.

TPU-native replacement for the reference's SamIter region chunker
(grouping.cpp:157-314) and async tier-1 prefetch (main.cpp:1350-1357):
BGZF blocks are decompressed incrementally by the native stream decoder
(native/bamdec.cpp: bgzf_stream_*), records are decoded into columnar
ReadBatch pieces, and an incremental planner yields tier-1 batches of
COMPLETE region plans under the same memory model as the whole-file
scheduler — plan boundaries are bit-identical to schedule.regions.plan on
the full file (the cut rules are prefix-causal; the cross-window coverage
state is carried via prev_tid/prev_max0), so streaming never changes the
VCF.  A prefetch thread decodes batch N+1 while batch N computes.
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
                 row_filter=None):
        self.stream = stream or BamStream(path)
        self.header = self.stream.header
        self.ref_lens = ref_lens if ref_lens is not None \
            else self.stream.header.ref_lens
        self.mem_mb = mem_per_thread_mb
        self.budget = tier1_bytes
        self.row_filter = row_filter   # per-read filter (filter_batch)
        self._prev_tid = -1
        self._prev_max0 = 0
        self._carry = None        # ReadBatch of the open (incomplete) plan
        self._done = False

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:
            raise StopIteration
        pieces = [self._carry] if self._carry is not None else []
        cost = sum(_batch_cost(x) for x in pieces)
        while True:
            while cost < self.budget:
                piece = self._next_piece()
                if piece is None:
                    break
                pieces.append(piece)
                cost += _batch_cost(piece)
            if not pieces:
                self._done = True
                self.stream.close()
                raise StopIteration
            window = pybam.concat_batches(pieces)
            if window.n == 0:   # everything filtered out
                self._done = True
                self.stream.close()
                raise StopIteration
            plans = regions_mod.plan(window, self.ref_lens, self.mem_mb,
                                     prev_tid=self._prev_tid,
                                     prev_max0=self._prev_max0)
            at_eof = self.stream._eof and not self.stream._carry
            if at_eof:
                self._carry = None
                self._done = True
                self.stream.close()
                self._advance_state(window, plans[-1].read_end)
                return window, plans
            if len(plans) >= 2:
                # emit all COMPLETE plans; the last plan may still grow,
                # so it carries to the next window (its cut conditions are
                # prefix-causal, so emitted boundaries are final)
                split = plans[-1].read_beg
                emitted = _slice_rows(window, 0, split)
                self._carry = _slice_rows(window, split, window.n)
                self._advance_state(window, split)
                return emitted, plans[:-1]
            # a single still-open plan: keep accumulating (bounded by the
            # per-plan memory cap, which plan() enforces)
            pieces = [window]
            piece = self._next_piece()
            if piece is not None:
                pieces.append(piece)
                cost += _batch_cost(piece)

    def _next_piece(self):
        piece = self.stream.read_piece()
        if piece is not None and self.row_filter is not None:
            piece = self.row_filter(piece)
        return piece

    def _advance_state(self, window, hi):
        """Carry the coverage-run state of all emitted reads: the max
        reference end on the LAST emitted tid (earlier tids cannot recur
        in a coordinate-sorted BAM)."""
        if hi == 0:
            return
        tids = np.asarray(window.tid[:hi])
        rend = window.rend[:hi]
        last_tid = int(tids[hi - 1])
        m = int(rend[tids == last_tid].max())
        if last_tid == self._prev_tid:
            self._prev_max0 = max(self._prev_max0, m)
        else:
            self._prev_tid = last_tid
            self._prev_max0 = m


def _slice_rows(batch, i0, i1):
    return regions_mod.slice_batch(
        batch, regions_mod.RegionPlan(tid=0, beg=0, end=0,
                                      read_beg=i0, read_end=i1))


def _batch_cost(b):
    if b is None or b.n == 0:
        return 0
    span = int(b.rend.max()) - int(b.pos.min())
    return (max(span, 0) * regions_mod.NUM_BYTES_PER_REF_POS
            + b.n * regions_mod.NUM_BYTES_PER_READ)


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
