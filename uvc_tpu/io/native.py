"""ctypes bindings for the native BGZF/BAM decoder (native/bamdec.cpp).

read_bam_native() is a drop-in replacement for io.bam.read_bam producing
the identical columnar ReadBatch; falls back to the python decoder when
the shared library has not been built (`make -C native`).
"""

import ctypes
import os

import numpy as np

from . import bam as pybam

_LIB = None
_LIB_TRIED = False


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "bin", "bamdec.so")
    if not os.path.exists(path):
        from ..utils.nativebuild import ensure_built
        ensure_built()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.bgzf_decompress.restype = ctypes.c_int64
    lib.bgzf_decompress.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_void_p)]
    lib.bamdec_free.argtypes = [ctypes.c_void_p]
    lib.bam_scan.restype = ctypes.c_int64
    lib.bam_fill.restype = ctypes.c_int
    _LIB = lib
    return lib


def available():
    return _load() is not None


def read_bam_native(path):
    """(BamHeader, ReadBatch) using the native decoder."""
    lib = _load()
    if lib is None:
        return pybam.read_bam(path)
    out = ctypes.c_void_p()
    n = lib.bgzf_decompress(path.encode(), ctypes.byref(out))
    if n < 0:
        raise IOError(f"bgzf_decompress failed ({n}) for {path}")
    try:
        raw = np.ctypeslib.as_array(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8)), shape=(n,))
        buf = raw.tobytes()  # own the memory before freeing
    finally:
        lib.bamdec_free(out)
    header, off = pybam.parse_header(memoryview(buf))

    u8 = np.frombuffer(buf, dtype=np.uint8)
    tq = ctypes.c_int64()
    tc = ctypes.c_int64()
    ts = ctypes.c_int64()
    nrec = lib.bam_scan(u8.ctypes.data_as(ctypes.c_void_p), len(u8), off,
                        ctypes.byref(tq), ctypes.byref(tc), ctypes.byref(ts))
    if nrec < 0:
        raise ValueError(f"truncated BAM: {path}")
    batch = fill_records(lib, u8[off:], len(u8) - off, int(nrec),
                         int(tq.value), int(tc.value), int(ts.value))
    return header, batch


def fill_records(lib, u8, length, nrec, total_qname, total_cigar, total_seq):
    """Decode `nrec` complete records from u8[:length] into a ReadBatch
    (shared by the whole-file reader and the streaming decoder)."""
    def arr(n_, dt):
        return np.zeros(n_, dtype=dt)

    tid = arr(nrec, np.int32)
    pos = arr(nrec, np.int32)
    mapq = arr(nrec, np.uint8)
    flag = arr(nrec, np.uint16)
    mtid = arr(nrec, np.int32)
    mpos = arr(nrec, np.int32)
    isize = arr(nrec, np.int32)
    qname_data = arr(total_qname, np.uint8)
    qname_off = arr(nrec + 1, np.int64)
    cigar_op = arr(total_cigar, np.uint8)
    cigar_len = arr(total_cigar, np.int32)
    cigar_off = arr(nrec + 1, np.int64)
    seq_sym = arr(total_seq, np.int8)
    qual = arr(total_seq, np.uint8)
    seq_off = arr(nrec + 1, np.int64)
    nm = arr(nrec, np.int32)

    def cp(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    rc = lib.bam_fill(u8.ctypes.data_as(ctypes.c_void_p), length, 0,
                      cp(tid), cp(pos), cp(mapq), cp(flag), cp(mtid),
                      cp(mpos), cp(isize), cp(qname_data), cp(qname_off),
                      cp(cigar_op), cp(cigar_len), cp(cigar_off),
                      cp(seq_sym), cp(qual), cp(seq_off), cp(nm))
    if rc != 0:
        raise ValueError("bam_fill failed")
    return pybam.ReadBatch(
        n=nrec, tid=tid, pos=pos, mapq=mapq, flag=flag, mtid=mtid, mpos=mpos,
        isize=isize, qname_data=qname_data.tobytes(), qname_off=qname_off,
        cigar_op=cigar_op, cigar_len=cigar_len, cigar_off=cigar_off,
        seq=seq_sym, qual=qual, seq_off=seq_off, nm=nm)
