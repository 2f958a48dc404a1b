"""Encoder round-trip property suite (port of the reference encoder tests,
``DeflaterOutputStreamTest.java:24-105``, plus zlib interop our way and
theirs)."""

import io
import random
import zlib

import pytest

import tpu_deflate as td


def _rand_bytes(rng, n):
    return bytes(rng.getrandbits(8) for _ in range(n))


def _structured(rng, n):
    words = [_rand_bytes(rng, rng.randint(2, 9)) for _ in range(40)]
    out = bytearray()
    while len(out) < n:
        out += rng.choice(words)
    return bytes(out[:n])


ALL_EFFORTS = [0, 1, 2, 3, 4, 5]


@pytest.mark.parametrize("effort", ALL_EFFORTS)
def test_empty_input(effort):
    c = td.deflate(b"", effort=effort)
    assert td.inflate(c) == b""
    assert zlib.decompress(c, -15) == b""


@pytest.mark.parametrize("effort", [1, 2, 5])
def test_short_random_writes(effort):
    rng = random.Random(4)
    for _ in range(30):
        data = _rand_bytes(rng, rng.randint(0, 100))
        c = td.deflate(data, effort=effort)
        assert td.inflate(c) == data
        assert zlib.decompress(c, -15) == data


def test_byte_runs_hit_rle_strategy():
    rng = random.Random(5)
    data = b"".join(
        bytes([rng.randrange(4)]) * rng.randint(1, 300) for _ in range(200)
    )
    c = td.deflate(data, effort=1)  # RLE_DYNAMIC default
    assert td.inflate(c) == data
    assert zlib.decompress(c, -15) == data
    assert len(c) < len(data) // 4


@pytest.mark.parametrize("effort", [1, 2, 4])
def test_mixed_write_patterns(effort):
    """Mixed single/bulk writes through the streaming Deflater."""
    rng = random.Random(6)
    data = _structured(rng, 150_000)
    sink = io.BytesIO()
    d = td.Deflater(sink, strategy=td.strategy_for_effort(effort))
    pos = 0
    while pos < len(data):
        n = rng.choice([1, 17, 1000, 65536])
        d.write(data[pos : pos + n])
        pos += n
    d.finish()
    c = sink.getvalue()
    assert zlib.decompress(c, -15) == data
    assert td.inflate(c) == data


def test_write_after_finish_raises():
    sink = io.BytesIO()
    d = td.Deflater(sink)
    d.write(b"x")
    d.finish()
    with pytest.raises(ValueError):
        d.write(b"y")
    with pytest.raises(ValueError):
        d.finish()


def test_we_decode_zlib_all_levels():
    rng = random.Random(7)
    data = _structured(rng, 80_000)
    for level in range(0, 10):
        c = zlib.compress(data, level)[2:-4]
        assert td.inflate(c) == data, level


def test_compression_beats_stored_on_text():
    rng = random.Random(8)
    data = _structured(rng, 100_000)
    assert len(td.deflate(data, effort=2)) < len(data) * 0.7
