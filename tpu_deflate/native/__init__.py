"""Native host runtime: ctypes bindings for the C codec core.

Builds ``deflate_core.c`` with the system compiler on first use (cached as
a shared object next to the package); every entry point releases the GIL
(plain ctypes foreign calls), so the member-parallel drivers below use a
thread pool to saturate all host cores.

Falls back gracefully: ``available()`` is False when no compiler works,
and all callers route to the pure-Python/NumPy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "native", "deflate_core.c")
_SO = os.path.join(_HERE, "_deflate_core.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> str | None:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    so = _SO
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-march=native", "-shared", "-fPIC", "-o", so, src],
                check=True,
                capture_output=True,
            )
            return so
        except (OSError, subprocess.CalledProcessError):
            continue
    return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        so = _build()
        if so is None:
            _lib = False
            return _lib
        lib = ctypes.CDLL(so)
        lib.td_crc32.restype = ctypes.c_uint32
        lib.td_crc32.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint32]
        lib.td_adler32.restype = ctypes.c_uint32
        lib.td_adler32.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint32]
        lib.td_inflate.restype = ctypes.c_int
        lib.td_inflate.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.td_resolve_tokens.restype = ctypes.c_int
        lib.td_resolve_tokens.argtypes = [
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.td_deflate_member.restype = ctypes.c_size_t
        lib.td_deflate_member.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.td_deflate_block.restype = ctypes.c_size_t
        lib.td_deflate_block.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.c_size_t,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_uint,
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not False


# ---------------------------------------------------------------------------
# Thin wrappers
# ---------------------------------------------------------------------------


def crc32(data: bytes, value: int = 0) -> int:
    lib = _load()
    return int(lib.td_crc32(data, len(data), value & 0xFFFFFFFF))


def adler32(data: bytes, value: int = 1) -> int:
    lib = _load()
    return int(lib.td_adler32(data, len(data), value & 0xFFFFFFFF))


def inflate_raw(payload: bytes, out_cap: int) -> tuple[bytes, int]:
    """Decode a complete raw-DEFLATE stream. Returns (bytes, consumed).

    Raises DataFormatError with the taxonomy Reason on malformed input.
    """
    from ..format.errors import OutputCapacityError, check_device_error

    lib = _load()
    out = ctypes.create_string_buffer(out_cap)
    out_len = ctypes.c_size_t(0)
    consumed = ctypes.c_size_t(0)
    rc = lib.td_inflate(
        payload, len(payload), out, out_cap, ctypes.byref(out_len), ctypes.byref(consumed)
    )
    if rc == 100:
        raise OutputCapacityError("output capacity too small")
    check_device_error(rc)
    return out.raw[: out_len.value], consumed.value


def resolve_tokens(tokens: np.ndarray, out_cap: int) -> bytes:
    """Expand a device-decoded token array (int32) to bytes."""
    from ..format.errors import OutputCapacityError, check_device_error

    lib = _load()
    tokens = np.ascontiguousarray(tokens, dtype=np.int32)
    out = ctypes.create_string_buffer(out_cap)
    out_len = ctypes.c_size_t(0)
    rc = lib.td_resolve_tokens(
        tokens.ctypes.data_as(ctypes.c_void_p), tokens.size, out, out_cap,
        ctypes.byref(out_len),
    )
    if rc == 100:
        raise OutputCapacityError("output capacity too small")
    check_device_error(rc)
    return out.raw[: out_len.value]


def deflate_member_payload(data: bytes, *, max_code_len: int = 12, max_chain: int = 32) -> bytes:
    """Encode <=64 KiB as a single final DEFLATE block (profile payload)."""
    lib = _load()
    cap = len(data) + len(data) // 8 + 1024
    out = ctypes.create_string_buffer(cap)
    n = lib.td_deflate_member(data, len(data), out, cap, max_code_len, max_chain)
    if n == 0 and len(data) > 0:
        raise RuntimeError("native deflate failed")
    return out.raw[:n]


# ---------------------------------------------------------------------------
# Member-parallel drivers (the native engine)
# ---------------------------------------------------------------------------

_POOL: ThreadPoolExecutor | None = None


def _pool() -> ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = ThreadPoolExecutor(max_workers=max(2, os.cpu_count() or 2))
    return _POOL


def compress_members_native(
    data: bytes, *, member_data: int = 64 * 1024, max_code_len: int = 12, max_chain: int = 32
) -> bytes:
    """TPU-profile multi-member gzip via the native core, all host cores."""
    from ..codec.profile import build_member, _empty_member

    if not data:
        return _empty_member()

    def one(start: int) -> bytes:
        chunk = data[start : start + member_data]
        payload = deflate_member_payload(chunk, max_code_len=max_code_len, max_chain=max_chain)
        return build_member(payload, len(chunk), crc32(chunk))

    starts = range(0, len(data), member_data)
    return b"".join(_pool().map(one, starts))


def compress_continuous_native(
    data: bytes, *, block_data: int = 64 * 1024, max_code_len: int = 15, max_chain: int = 64
) -> bytes:
    """Single-member continuous-history gzip (max ratio, sequential).

    Blocks of ``block_data`` bytes share a sliding 32 KiB history (the
    reference's [history][data] buffering, DeflaterOutputStream.java:38-45),
    emitted bit-contiguously into one member — ~zlib-class ratio, at the
    cost of member-parallel decodability. The TD subfield still indexes
    the single member.
    """
    from ..codec.profile import build_member, _empty_member

    if not data:
        return _empty_member()
    payload = deflate_raw_continuous(
        data, block_data=block_data, max_code_len=max_code_len, max_chain=max_chain
    )
    return build_member(payload, len(data), crc32(data))


def deflate_raw_continuous(
    data: bytes, *, block_data: int = 64 * 1024, max_code_len: int = 15, max_chain: int = 64
) -> bytes:
    """Raw continuous-history DEFLATE stream (no container)."""
    lib = _load()
    if not data:
        # single final stored empty block
        return bytes([0x01, 0x00, 0x00, 0xFF, 0xFF])
    out = bytearray()
    partial = 0
    bitpos = 0
    pos = 0
    n = len(data)
    hist = 32 * 1024
    while pos < n:
        blk = min(block_data, n - pos)
        h = min(hist, pos)
        final = pos + blk >= n
        buf = data[pos - h : pos + blk]
        cap = blk + blk // 4 + 2048
        obuf = ctypes.create_string_buffer(cap)
        bits = lib.td_deflate_block(
            buf, h, blk, obuf, cap, 1 if final else 0, bitpos, partial,
            max_code_len, max_chain,
        )
        if bits == 0:
            raise RuntimeError("native deflate_block failed")
        whole, rem = divmod(int(bits), 8)
        raw = obuf.raw
        out += raw[:whole]
        partial = raw[whole] if rem else 0
        bitpos = rem
        pos += blk
    if bitpos:
        out.append(partial)
    return bytes(out)


def zlib_compress_native(data: bytes, *, max_chain: int = 64) -> bytes:
    """RFC 1950 stream via the native core (DEFAULT level byte)."""
    from ..format.zlib_meta import ZlibMetadata

    return (
        ZlibMetadata().to_bytes()
        + deflate_raw_continuous(data, max_chain=max_chain)
        + adler32(data).to_bytes(4, "big")
    )


def zlib_decompress_native(data: bytes) -> bytes:
    """RFC 1950 decode via the native core (no preset dictionary)."""
    import io as _io

    from ..format.errors import DataFormatError, OutputCapacityError, Reason
    from ..format.zlib_meta import ZlibMetadata

    stream = _io.BytesIO(data)
    meta = ZlibMetadata.read(stream)
    if meta.preset_dictionary is not None:
        from .. import zlib_decompress

        return zlib_decompress(data)  # host path handles FDICT
    off = stream.tell()
    payload = data[off:]
    cap = max(8 * len(payload) + 1024, 1 << 20)
    while True:
        try:
            out, consumed = inflate_raw(payload, cap)
            break
        except OutputCapacityError:
            cap *= 4
    trailer = payload[consumed : consumed + 4]
    if len(trailer) < 4:
        raise DataFormatError(Reason.UNEXPECTED_END_OF_STREAM, "Unexpected end of stream")
    if int.from_bytes(trailer, "big") != adler32(out):
        raise DataFormatError(
            Reason.DECOMPRESSED_CHECKSUM_MISMATCH, "Decompression Adler-32 mismatch"
        )
    return out


def gzip_decompress_native(data: bytes) -> bytes:
    """Member-parallel decode via the native core.

    Uses the TD index for O(members) splitting when present; otherwise
    decodes the stream as sequential members (still native-fast).
    """
    from ..codec.decode_jax import split_members
    from ..format.errors import DataFormatError, OutputCapacityError, Reason
    from ..format.gzip_meta import GzipMetadata
    import io

    buf = np.frombuffer(data, dtype=np.uint8)
    members = split_members(buf)
    if members is not None and not members:
        # Empty input: same behavior as the host/tpu engines.
        raise DataFormatError.unexpected_end()
    if members is not None:

        def one(m) -> bytes:
            payload = data[m.payload_start : m.end - 8]
            try:
                out, _ = inflate_raw(payload, m.isize + 1)
            except OutputCapacityError:
                # decoded past the trailer-declared size; real format
                # errors (DataFormatError) propagate unchanged
                raise DataFormatError(
                    Reason.DECOMPRESSED_SIZE_MISMATCH, "Decompressed size mismatch"
                )
            if len(out) != m.isize:
                raise DataFormatError(
                    Reason.DECOMPRESSED_SIZE_MISMATCH, "Decompressed size mismatch"
                )
            if crc32(out) != m.crc32:
                raise DataFormatError(
                    Reason.DECOMPRESSED_CHECKSUM_MISMATCH, "Decompression CRC-32 mismatch"
                )
            return out

        def group(ms) -> bytes:
            return b"".join(one(m) for m in ms)

        # Group members per task to amortize pool/ctypes overhead.
        g = 16
        groups = [members[i : i + g] for i in range(0, len(members), g)]
        return b"".join(_pool().map(group, groups))

    # Foreign stream: sequential member walk, native inflate per member.
    out_parts = []
    stream = io.BytesIO(data)
    while True:
        pos = stream.tell()
        probe = stream.read(1)
        if not probe:
            break
        stream.seek(pos)
        GzipMetadata.read(stream)
        payload_start = stream.tell()
        payload = data[payload_start:]
        cap = max(8 * len(payload) + 1024, 1 << 20)
        while True:
            try:
                out, consumed = inflate_raw(payload, cap)
                break
            except OutputCapacityError:  # grow and retry; format errors propagate
                cap *= 4
        trailer = payload[consumed : consumed + 8]
        if len(trailer) < 8:
            raise DataFormatError(Reason.UNEXPECTED_END_OF_STREAM, "Unexpected end of stream")
        want_crc = int.from_bytes(trailer[:4], "little")
        want_len = int.from_bytes(trailer[4:8], "little")
        if crc32(out) != want_crc:
            raise DataFormatError(
                Reason.DECOMPRESSED_CHECKSUM_MISMATCH, "Decompression CRC-32 mismatch"
            )
        if (len(out) & 0xFFFFFFFF) != want_len:
            raise DataFormatError(Reason.DECOMPRESSED_SIZE_MISMATCH, "Decompressed size mismatch")
        out_parts.append(out)
        stream.seek(payload_start + consumed + 8)
    return b"".join(out_parts)
