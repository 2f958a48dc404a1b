"""CRC-32 / Adler-32 correctness vs zlib, plus combine algebra
(the distributed shard-combine path)."""

import os
import zlib

import pytest

from tpu_deflate.kernels import checksum as ck


@pytest.mark.parametrize("n", [0, 1, 2, 3, 4, 7, 8, 63, 255, 256, 1000, 65537])
def test_crc32_matches_zlib(n):
    data = os.urandom(n)
    assert ck.crc32(data) == zlib.crc32(data)
    assert ck.crc32(data, 0xDEADBEEF) == zlib.crc32(data, 0xDEADBEEF)


@pytest.mark.parametrize("n", [0, 1, 2, 100, 65537])
def test_adler32_matches_zlib(n):
    data = os.urandom(n)
    assert ck.adler32(data) == zlib.adler32(data)
    assert ck.adler32(data, 0x12345678) == zlib.adler32(data, 0x12345678)


def test_crc32_combine():
    a, b = os.urandom(1234), os.urandom(4321)
    assert ck.crc32_combine(zlib.crc32(a), zlib.crc32(b), len(b)) == zlib.crc32(a + b)
    assert ck.crc32_combine(zlib.crc32(a), zlib.crc32(b""), 0) == zlib.crc32(a)


def test_adler32_combine():
    a, b = os.urandom(1234), os.urandom(70000)
    assert (
        ck.adler32_combine(zlib.adler32(a), zlib.adler32(b), len(b))
        == zlib.adler32(a + b)
    )


def test_incremental_equals_oneshot():
    data = os.urandom(10000)
    c = 0
    a = 1
    for i in range(0, len(data), 999):
        c = ck.crc32(data[i : i + 999], c)
        a = ck.adler32(data[i : i + 999], a)
    assert c == zlib.crc32(data)
    assert a == zlib.adler32(data)
