"""BGZF writer: blocked gzip with the BC extra field + EOF marker.

The reference's VCFAdapter opens compressed VCF output with htslib mode
"z" (vcf_adapter.cc output-format handling); BGZF is the htslib framing:
a series of <=64 KiB gzip members, each carrying the compressed block
size in a BC extra subfield, terminated by a fixed 28-byte EOF block.
Readable by gzip, tabix-indexable by htslib.
"""

from __future__ import annotations

import struct
import zlib

MAX_BLOCK = 0xFF00  # uncompressed payload per block (htslib bgzf.c)

# htslib's magic EOF block (bgzf.c)
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def _block(payload: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(payload) + co.flush()
    bsize = len(comp) + 25 + 1  # header(12)+xtra(6)+deflate+crc(4)+isize(4)
    header = struct.pack(
        "<4BI2BH2BH",
        0x1F, 0x8B, 8, 4,        # gzip magic, deflate, FEXTRA
        0,                       # mtime
        0, 0xFF,                 # XFL, OS=unknown
        6,                       # XLEN
        0x42, 0x43, 2) + struct.pack("<H", bsize - 1)
    tail = struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF,
                       len(payload) & 0xFFFFFFFF)
    return header + comp + tail


def compress(data: bytes) -> bytes:
    """Whole-buffer BGZF compression (with EOF marker)."""
    out = bytearray()
    for i in range(0, len(data), MAX_BLOCK):
        out += _block(data[i:i + MAX_BLOCK])
    out += BGZF_EOF
    return bytes(out)


class BGZFWriter:
    """Streaming BGZF file writer."""

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._buf = bytearray()

    def write(self, data) -> int:
        if isinstance(data, str):
            data = data.encode()
        self._buf += data
        while len(self._buf) >= MAX_BLOCK:
            self._f.write(_block(bytes(self._buf[:MAX_BLOCK])))
            del self._buf[:MAX_BLOCK]
        return len(data)

    def close(self) -> None:
        if self._f is None:
            return
        if self._buf:
            self._f.write(_block(bytes(self._buf)))
            self._buf.clear()
        self._f.write(BGZF_EOF)
        self._f.close()
        self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class BCFFileWriter:
    """Collects VCF text; on close writes BGZF-compressed BCF2.2
    (htslib output mode "b")."""

    def __init__(self, path: str):
        self._path = path
        self._chunks: list = []

    def write(self, data) -> int:
        if isinstance(data, bytes):
            data = data.decode()
        self._chunks.append(data)
        return len(data)

    def close(self) -> None:
        if self._path is None:
            return
        from .bcf import text_to_bcf
        body = text_to_bcf("".join(self._chunks))
        with open(self._path, "wb") as f:
            f.write(compress(body))
        self._path = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_output(path: str, fmt: str = ""):
    """File object for VCF text output honoring the reference's
    vcf_output_format knob ("z"/"bgzf" or a .gz/.bgz filename -> BGZF
    text; "b"/"bcf" or a .bcf filename -> BGZF-framed BCF2.2 binary;
    otherwise plain text)."""
    if fmt in ("b", "bcf") or path.endswith(".bcf"):
        return BCFFileWriter(path)
    if fmt in ("z", "bgzf", "gz") or path.endswith((".gz", ".bgz")):
        return BGZFWriter(path)
    return open(path, "w")
