"""gzip/zlib containers: metadata records, trailer verification, error
reasons, interop with Python's gzip/zlib modules, preset dictionaries.

Closes reference test gaps noted in SURVEY.md §4 (the reference never
tests its container layer)."""

import gzip as pygzip
import io
import zlib

import pytest

import tpu_deflate as td
from tpu_deflate.format.errors import DataFormatError, Reason
from tpu_deflate.format.gzip_meta import GzipMetadata, OperatingSystem
from tpu_deflate.format.zlib_meta import CompressionLevel, ZlibMetadata


def test_gzip_metadata_full_roundtrip():
    meta = GzipMetadata(
        is_file_text=True,
        modification_time_unix_s=1_234_567_890,
        extra_flags=2,
        operating_system=OperatingSystem.UNIX,
        extra_field=b"\x01\x02extra",
        file_name="hello.txt",
        comment="a comment",
        has_header_crc=True,
    )
    raw = meta.to_bytes()
    parsed = GzipMetadata.read(io.BytesIO(raw))
    assert parsed == meta


def test_gzip_metadata_bad_magic():
    with pytest.raises(DataFormatError) as e:
        GzipMetadata.read(io.BytesIO(b"\x1f\x8c\x08" + bytes(7)))
    assert e.value.reason == Reason.GZIP_INVALID_MAGIC_NUMBER


def test_gzip_metadata_bad_method():
    with pytest.raises(DataFormatError) as e:
        GzipMetadata.read(io.BytesIO(b"\x1f\x8b\x07" + bytes(7)))
    assert e.value.reason == Reason.UNSUPPORTED_COMPRESSION_METHOD


def test_gzip_metadata_reserved_flags():
    with pytest.raises(DataFormatError) as e:
        GzipMetadata.read(io.BytesIO(b"\x1f\x8b\x08\x20" + bytes(6)))
    assert e.value.reason == Reason.GZIP_RESERVED_FLAGS_SET


def test_gzip_metadata_bad_os():
    with pytest.raises(DataFormatError) as e:
        GzipMetadata.read(io.BytesIO(b"\x1f\x8b\x08\x00" + bytes(5) + b"\x7f"))
    assert e.value.reason == Reason.GZIP_UNSUPPORTED_OPERATING_SYSTEM


def test_gzip_metadata_header_crc_mismatch():
    meta = GzipMetadata(has_header_crc=True, file_name="f")
    raw = bytearray(meta.to_bytes())
    raw[-1] ^= 0xFF
    with pytest.raises(DataFormatError) as e:
        GzipMetadata.read(io.BytesIO(bytes(raw)))
    assert e.value.reason == Reason.HEADER_CHECKSUM_MISMATCH


def test_gzip_trailer_crc_mismatch():
    g = bytearray(td.gzip_compress(b"hello world"))
    g[-6] ^= 0x01  # corrupt stored CRC
    with pytest.raises(DataFormatError) as e:
        td.gzip_decompress(bytes(g))
    assert e.value.reason == Reason.DECOMPRESSED_CHECKSUM_MISMATCH


def test_gzip_trailer_length_mismatch():
    g = bytearray(td.gzip_compress(b"hello world"))
    g[-1] ^= 0x01  # corrupt ISIZE
    with pytest.raises(DataFormatError) as e:
        td.gzip_decompress(bytes(g))
    assert e.value.reason == Reason.DECOMPRESSED_SIZE_MISMATCH


def test_gzip_python_interop_both_ways():
    data = b"the quick brown fox " * 1000
    assert pygzip.decompress(td.gzip_compress(data, effort=2)) == data
    assert td.gzip_decompress(pygzip.compress(data)) == data


def test_gzip_metadata_through_python_gzip():
    meta = GzipMetadata(
        file_name="name.bin", modification_time_unix_s=1_000_000, has_header_crc=True
    )
    g = td.gzip_compress(b"payload", metadata=meta)
    with pygzip.GzipFile(fileobj=io.BytesIO(g)) as f:
        assert f.read() == b"payload"  # python gzip parsed the header fine


def test_gzip_multi_member():
    g = td.gzip_compress(b"abc") + pygzip.compress(b"def") + td.gzip_compress(b"")
    assert td.gzip_decompress(g) == b"abcdef"
    assert pygzip.decompress(g) == b"abcdef"


def test_zlib_metadata_roundtrip():
    meta = ZlibMetadata(compression_level=CompressionLevel.MAXIMUM)
    parsed = ZlibMetadata.read(io.BytesIO(meta.to_bytes()))
    assert parsed == meta


def test_zlib_metadata_fcheck():
    raw = bytearray(ZlibMetadata().to_bytes())
    raw[1] ^= 0x01
    with pytest.raises(DataFormatError) as e:
        ZlibMetadata.read(io.BytesIO(bytes(raw)))
    assert e.value.reason == Reason.HEADER_CHECKSUM_MISMATCH


def test_zlib_container_roundtrip_and_interop():
    data = b"zlib container data " * 500
    z = td.zlib_compress(data, effort=2)
    assert zlib.decompress(z) == data
    assert td.zlib_decompress(z) == data
    assert td.zlib_decompress(zlib.compress(data, 9)) == data


def test_zlib_adler_mismatch():
    z = bytearray(td.zlib_compress(b"data"))
    z[-1] ^= 0x01
    with pytest.raises(DataFormatError) as e:
        td.zlib_decompress(bytes(z))
    assert e.value.reason == Reason.DECOMPRESSED_CHECKSUM_MISMATCH


def test_zlib_preset_dictionary():
    d = b"common prefix dictionary content for testing"
    data = b"dictionary content for testing! " * 4
    z = td.zlib_compress(data, preset_dictionary=d)
    # our reader
    assert td.zlib_decompress(z, preset_dictionary=d) == data
    # zlib's reader
    obj = zlib.decompressobj(zdict=d)
    assert obj.decompress(z) == data
    # zlib's writer -> our reader
    cobj = zlib.compressobj(6, zlib.DEFLATED, 15, 8, 0, zdict=d)
    z2 = cobj.compress(data) + cobj.flush()
    assert td.zlib_decompress(z2, preset_dictionary=d) == data
    # missing dictionary
    with pytest.raises(ValueError):
        td.zlib_decompress(z)


def test_sticky_exception_latches():
    bad = td.deflate(b"x" * 100)[:-2]  # truncate
    r = td.InflaterReader(io.BytesIO(bad))
    with pytest.raises(DataFormatError):
        r.read()
    with pytest.raises(DataFormatError):  # latched, re-raised
        r.read(1)


def test_markable_file_stream(tmp_path):
    p = tmp_path / "f.gz"
    p.write_bytes(td.gzip_compress(b"file content"))
    m = td.MarkableFileStream(str(p))
    assert m.markSupported()
    m.mark()
    head = m.read(2)
    assert head == b"\x1f\x8b"
    m.reset()
    assert td.GzipReader(m).read() == b"file content"
    m.close()
