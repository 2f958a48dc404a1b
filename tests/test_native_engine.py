"""Native C runtime + engine front door: differential tests vs zlib and
the Python host codec, error taxonomy parity, cross-engine interchange."""

import gzip as pygzip
import io
import os
import random
import zlib

import pytest

import tpu_deflate as td
from tpu_deflate import native
from tpu_deflate.engine import compress, decompress
from tpu_deflate.format.errors import DataFormatError, Reason

pytestmark = pytest.mark.skipif(not native.available(), reason="no C toolchain")


def _structured(seed, n):
    rng = random.Random(seed)
    words = [bytes(rng.getrandbits(8) for _ in range(rng.randint(2, 9))) for _ in range(40)]
    out = bytearray()
    while len(out) < n:
        out += rng.choice(words)
    return bytes(out[:n])


def test_native_checksums_match_zlib():
    d = os.urandom(123457)
    assert native.crc32(d) == zlib.crc32(d)
    assert native.crc32(d, 0xABCD) == zlib.crc32(d, 0xABCD)
    assert native.adler32(d) == zlib.adler32(d)


@pytest.mark.parametrize("level", [1, 6, 9])
def test_native_inflate_zlib_streams(level):
    data = _structured(level, 200_000)
    raw = zlib.compress(data, level)[2:-4]
    out, consumed = native.inflate_raw(raw, len(data) + 1)
    assert out == data
    assert consumed == len(raw)


def test_native_inflate_error_taxonomy():
    # reserved block type
    with pytest.raises(DataFormatError) as e:
        native.inflate_raw(bytes([0x07]), 16)
    assert e.value.reason == Reason.RESERVED_BLOCK_TYPE
    # truncated
    with pytest.raises(DataFormatError) as e:
        native.inflate_raw(b"", 16)
    assert e.value.reason == Reason.UNEXPECTED_END_OF_STREAM
    # stored len mismatch
    with pytest.raises(DataFormatError) as e:
        native.inflate_raw(bytes([0x01, 0x10, 0x00, 0x12, 0x34]), 64)
    assert e.value.reason == Reason.UNCOMPRESSED_BLOCK_LENGTH_MISMATCH


def test_native_inflate_conformance_vectors():
    """The transcribed reference vectors must behave identically in C."""
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from vectors import BAD_VECTORS, GOOD_VECTORS, bits_to_bytes

    for name, bits, hexout in GOOD_VECTORS:
        data = bits_to_bytes(bits, "0")
        out, _ = native.inflate_raw(data, 1 << 16)
        assert out == bytes.fromhex(hexout.replace(" ", "")), name
    for name, bits, reason in BAD_VECTORS:
        data = bits_to_bytes(bits, "0")
        with pytest.raises(DataFormatError) as e:
            native.inflate_raw(data, 1 << 16)
        assert e.value.reason == reason, name


def test_native_member_encode_decodable_everywhere():
    for seed, n in [(1, 0), (2, 1), (3, 1000), (4, 65536)]:
        data = _structured(seed, n)
        payload = native.deflate_member_payload(data)
        if n:
            assert zlib.decompress(payload, -15) == data
            assert td.inflate(payload) == data


def test_native_profile_roundtrip_and_interop():
    data = _structured(5, 400_000) + os.urandom(100_000)
    gz = native.compress_members_native(data)
    assert pygzip.decompress(gz) == data
    assert native.gzip_decompress_native(gz) == data
    assert td.gzip_decompress(gz) == data  # host engine reads native output
    from tpu_deflate.codec.decode_jax_v2 import gzip_decompress_tpu_v2 as gzip_decompress_tpu

    assert gzip_decompress_tpu(gz) == data  # device engine reads it too


def test_native_decode_foreign_streams():
    data = _structured(6, 150_000)
    assert native.gzip_decompress_native(pygzip.compress(data)) == data
    multi = pygzip.compress(data[:1000]) + pygzip.compress(data[1000:2000])
    assert native.gzip_decompress_native(multi) == data[:2000]


def test_native_corruption_detected():
    data = _structured(7, 100_000)
    gz = bytearray(native.compress_members_native(data))
    gz[len(gz) // 2] ^= 0xFF
    with pytest.raises(DataFormatError):
        native.gzip_decompress_native(bytes(gz))


def test_native_foreign_corruption_raises_not_retries():
    """Regression (ADVICE r1 high): corrupt/truncated FOREIGN input must
    raise DataFormatError promptly — the capacity grow-and-retry loop must
    only trigger on genuine output-buffer overflow, never on decode errors
    (it used to retry forever with 4x buffer growth)."""
    data = _structured(9, 80_000)
    gz = bytearray(pygzip.compress(data))
    gz[40] ^= 0xFF  # corrupt the deflate payload of a foreign stream
    with pytest.raises(DataFormatError):
        native.gzip_decompress_native(bytes(gz))
    # truncated foreign stream: payload cut mid-block
    trunc = bytes(pygzip.compress(data)[: len(gz) // 2])
    with pytest.raises(DataFormatError):
        native.gzip_decompress_native(trunc)
    # zlib container too
    z = bytearray(zlib.compress(data))
    z[20] ^= 0xFF
    with pytest.raises(DataFormatError):
        native.zlib_decompress_native(bytes(z))


def test_native_foreign_error_taxonomy_preserved():
    """Regression (ADVICE r1 medium): a reserved-block-type error in a
    member must surface with its own Reason, not be remapped to
    DECOMPRESSED_SIZE_MISMATCH."""
    data = _structured(10, 50_000)
    gz = bytearray(native.compress_members_native(data))
    # Find the first member's payload and force btype=11 (reserved).
    from tpu_deflate.codec.decode_jax import split_members
    import numpy as np

    members = split_members(np.frombuffer(bytes(gz), dtype=np.uint8))
    assert members
    off = members[0].payload_start
    gz[off] |= 0x06  # btype bits -> 11
    with pytest.raises(DataFormatError) as ei:
        native.gzip_decompress_native(bytes(gz))
    assert ei.value.reason == Reason.RESERVED_BLOCK_TYPE


def test_native_empty_input_matches_other_engines():
    with pytest.raises(DataFormatError) as ei:
        native.gzip_decompress_native(b"")
    assert ei.value.reason == Reason.UNEXPECTED_END_OF_STREAM


def test_engine_cross_matrix():
    data = _structured(8, 120_000)
    for enc_engine in ["native", "host"]:
        gz = compress(data, engine=enc_engine)
        for dec_engine in ["native", "host"]:
            assert decompress(gz, engine=dec_engine) == data, (enc_engine, dec_engine)
        assert pygzip.decompress(gz) == data


def test_engine_metadata_member():
    from tpu_deflate.format.gzip_meta import GzipMetadata
    from tpu_deflate.streams.gzip_stream import GzipReader

    meta = GzipMetadata(file_name="f.bin", has_header_crc=True)
    data = _structured(9, 50_000)
    gz = compress(data, engine="native", metadata=meta)
    assert pygzip.decompress(gz) == data
    r = GzipReader(io.BytesIO(gz))
    assert r.metadata.file_name == "f.bin"
    # stream remains TD-splittable
    import numpy as np

    from tpu_deflate.codec.decode_jax import split_members

    assert split_members(np.frombuffer(gz, np.uint8)) is not None


def test_continuous_mode_ratio_and_interop():
    """Continuous-history mode: one member, near-zlib ratio, standard."""
    rng = random.Random(42)
    s = (b"the quick brown fox jumps over the lazy dog and some more words "
         b"for compression with repeats appearing often enough in text ")
    data = bytearray()
    while len(data) < 400_000:
        data += s[rng.randint(0, 40):]
    data = bytes(data[:400_000])
    gz = native.compress_continuous_native(data, max_chain=256)
    assert pygzip.decompress(gz) == data
    assert native.gzip_decompress_native(gz) == data
    assert td.gzip_decompress(gz) == data
    zl9 = len(zlib.compress(data, 9))
    assert len(gz) < zl9 * 1.08, (len(gz), zl9)
    # single member, still TD-indexed
    import numpy as np

    from tpu_deflate.codec.decode_jax import split_members

    members = split_members(np.frombuffer(gz, np.uint8))
    assert members is not None and len(members) == 1


def test_continuous_mode_engine_efforts():
    data = _structured(20, 200_000)
    prev = None
    for effort in [2, 4, 5]:
        gz = compress(data, engine="native", effort=effort)
        assert pygzip.decompress(gz) == data
        assert decompress(gz, engine="native") == data
        if prev is not None:
            assert len(gz) <= prev * 1.02, (effort, len(gz), prev)
        prev = len(gz)


def test_native_zlib_container():
    data = _structured(30, 150_000)
    z = native.zlib_compress_native(data)
    assert zlib.decompress(z) == data
    assert native.zlib_decompress_native(z) == data
    assert td.zlib_decompress(z) == data
    assert native.zlib_decompress_native(zlib.compress(data, 9)) == data
    # corruption -> adler mismatch
    bad = bytearray(z)
    bad[-1] ^= 1
    with pytest.raises(DataFormatError):
        native.zlib_decompress_native(bytes(bad))


# ---------------------------------------------------------------------------
# Block-parallel foreign-stream decode (resync prepass)
# ---------------------------------------------------------------------------


def _big_structured(seed: int, n: int) -> bytes:
    rng = random.Random(seed)
    words = [bytes(rng.getrandbits(8) for _ in range(rng.randint(2, 9))) for _ in range(300)]
    out = bytearray()
    while len(out) < n:
        out += rng.choice(words)
    return bytes(out[:n])


@pytest.mark.skipif(not native.available(), reason="native core unavailable")
def test_parallel_foreign_raw_bit_exact():
    """inflate_raw_parallel == zlib oracle on a foreign (zlib -9) stream,
    consumed byte count exact."""
    import zlib

    data = _big_structured(0, 6 << 20)
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    payload = comp.compress(data) + comp.flush()
    res = native.inflate_raw_parallel(payload, min_bytes=1 << 20)
    assert res is not None, "parallel path did not engage"
    out, consumed = res
    assert out == data
    assert consumed == len(payload)


@pytest.mark.skipif(not native.available(), reason="native core unavailable")
def test_parallel_foreign_gzip_end_to_end():
    """A gzip(1)-style foreign file (pygzip -9) through the native engine:
    block-parallel, bit-exact, CRC verified."""
    import gzip as pygzip

    data = _big_structured(1, 6 << 20)
    gz = pygzip.compress(data, compresslevel=9)
    assert native.gzip_decompress_native(gz) == data


@pytest.mark.skipif(not native.available(), reason="native core unavailable")
def test_parallel_foreign_corrupt_matches_serial_taxonomy():
    """Corruption anywhere must produce the same DataFormatError reason the
    serial path raises (the parallel path falls back on anomaly)."""
    import gzip as pygzip

    from tpu_deflate.format.errors import DataFormatError

    data = _big_structured(2, 5 << 20)
    gz = bytearray(pygzip.compress(data, compresslevel=9))
    for frac in (0.3, 0.6, 0.9):
        bad = bytearray(gz)
        bad[int(len(bad) * frac)] ^= 0x5A
        try:
            native.gzip_decompress_native(bytes(bad))
            raised_parallel = None
        except DataFormatError as e:
            raised_parallel = e.reason
        assert raised_parallel is not None, f"corruption at {frac} undetected"


@pytest.mark.skipif(not native.available(), reason="native core unavailable")
def test_parallel_foreign_incompressible_and_stored():
    """Streams that confuse sync scanning (random data -> stored blocks;
    level-1 fixed blocks) still decode exactly via handover/fallback."""
    import gzip as pygzip
    import os as _os

    data = _os.urandom(5 << 20)  # incompressible: zlib emits stored blocks
    gz = pygzip.compress(data, compresslevel=9)
    assert native.gzip_decompress_native(gz) == data
    data2 = _big_structured(3, 5 << 20)
    gz2 = pygzip.compress(data2, compresslevel=1)
    assert native.gzip_decompress_native(gz2) == data2


@pytest.mark.skipif(not native.available(), reason="native core unavailable")
def test_parallel_foreign_zlib_container():
    import zlib

    data = _big_structured(4, 5 << 20)
    z = zlib.compress(data, 9)
    assert native.zlib_decompress_native(z) == data
