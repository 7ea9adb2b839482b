"""BGZF (blocked gzip) codec.

BGZF is the container for BAM and bgzipped VCF: a series of independent gzip
members, each <= 64 KiB uncompressed, carrying a BC extra field with the
compressed block size, terminated by a fixed 28-byte EOF block. Because
members are independently compressible, per-chunk parallel compression +
raw concatenation is valid — the property the reference exploits for
multi-threaded output (main.cpp:99-130,1541-1551) and that our distributed
writer relies on.

Pure-python implementation on zlib; fast enough for output (compression
level 1-6) and for tests. The native C++ reader (io/native) supersedes this
on the BAM-decode hot path.
"""

import struct
import zlib

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")
MAX_BLOCK_SIZE = 65280


def compress_block(data: bytes, level: int = 6) -> bytes:
    """One BGZF block from <=65280 bytes of payload."""
    c = zlib.compressobj(level, zlib.DEFLATED, -15)
    comp = c.compress(data) + c.flush()
    bsize = len(comp) + 18 + 8 - 1  # BSIZE = total block length - 1
    header = struct.pack(
        "<4BIBBH2BHH", 0x1f, 0x8b, 8, 4,  # ID1 ID2 CM FLG(FEXTRA)
        0, 0, 0xff,                        # MTIME XFL OS
        6,                                 # XLEN
        ord("B"), ord("C"), 2, bsize)      # BC subfield
    footer = struct.pack("<II", zlib.crc32(data) & 0xffffffff,
                         len(data) & 0xffffffff)
    return header + comp + footer


def compress(data: bytes, level: int = 6, block_size: int = MAX_BLOCK_SIZE) -> bytes:
    """Compress a byte string into a series of BGZF blocks (no EOF marker)."""
    out = []
    for off in range(0, len(data), block_size):
        out.append(compress_block(data[off:off + block_size], level))
    return b"".join(out)


class BgzfWriter:
    """Streaming BGZF writer with the standard EOF terminator."""

    def __init__(self, path_or_fh, level: int = 6):
        if isinstance(path_or_fh, (str, bytes)):
            self._fh = open(path_or_fh, "wb")
            self._owns = True
        else:
            self._fh = path_or_fh
            self._owns = False
        self._level = level
        self._buf = bytearray()

    def write(self, data: bytes):
        self._buf += data
        while len(self._buf) >= MAX_BLOCK_SIZE:
            chunk = bytes(self._buf[:MAX_BLOCK_SIZE])
            del self._buf[:MAX_BLOCK_SIZE]
            self._fh.write(compress_block(chunk, self._level))

    def write_raw_bgzf(self, blocks: bytes):
        """Append pre-compressed BGZF blocks (must be on a block boundary)."""
        self.flush()
        self._fh.write(blocks)

    def flush(self):
        if self._buf:
            self._fh.write(compress_block(bytes(self._buf), self._level))
            self._buf.clear()

    def close(self):
        self.flush()
        self._fh.write(BGZF_EOF)
        if self._owns:
            self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def decompress(data: bytes) -> bytes:
    """Decompress an entire BGZF byte string (concatenated gzip members)."""
    out = []
    d = zlib.decompressobj(15 + 32)
    pos = 0
    view = memoryview(data)
    while pos < len(data):
        chunk = d.decompress(view[pos:])
        out.append(chunk)
        consumed = len(data) - pos - len(d.unused_data)
        pos += consumed
        if d.eof and d.unused_data:
            d = zlib.decompressobj(15 + 32)
        elif d.eof:
            break
    return b"".join(out)


def read_file(path: str) -> bytes:
    with open(path, "rb") as fh:
        return decompress(fh.read())


def is_bgzf(path: str) -> bool:
    with open(path, "rb") as fh:
        head = fh.read(18)
    return (len(head) >= 18 and head[:4] == b"\x1f\x8b\x08\x04"
            and head[12:14] == b"BC")
