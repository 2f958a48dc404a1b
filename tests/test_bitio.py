"""Bit packing/unpacking: writer/reader round trips, LSB-first layout."""

import io
import random

import numpy as np
import pytest

from tpu_deflate.format.errors import DataFormatError, Reason
from tpu_deflate.kernels.bitio import BitReader, BitWriter, CountingBitWriter, pack_bits


def test_pack_bits_basic():
    # 0b101 (3 bits) then 0b01 (2 bits) -> bits 1,0,1,1,0 -> byte 0b00001101
    out, total = pack_bits(np.array([0b101, 0b01], dtype=np.uint64), np.array([3, 2]))
    assert total == 5
    assert out.tobytes() == bytes([0b01101])


def test_writer_reader_roundtrip():
    rng = random.Random(7)
    tokens = [
        (v & ((1 << n) - 1), n)
        for v, n in ((rng.getrandbits(32), rng.randint(0, 24)) for _ in range(500))
    ]
    w = BitWriter()
    for v, n in tokens:
        w.write_bits(v, n)
    w.align_to_byte()
    data = w.getvalue()

    r = BitReader(io.BytesIO(data))
    for v, n in tokens:
        assert r.read_bits(n) == v


def test_bulk_write_matches_scalar_write():
    rng = random.Random(8)
    vals, bits = [], []
    for _ in range(1000):
        n = rng.randint(0, 48)
        vals.append(rng.getrandbits(n) if n else 0)
        bits.append(n)
    w1 = BitWriter()
    for v, n in zip(vals, bits):
        w1.write_bits(v, n)
    w2 = BitWriter()
    # interleave scalar and bulk writes to exercise partial-byte carry
    w2.write_bits(vals[0], bits[0])
    w2.write_token_array(np.array(vals[1:500], dtype=np.uint64), np.array(bits[1:500]))
    w2.write_bits(vals[500], bits[500])
    w2.write_token_array(np.array(vals[501:], dtype=np.uint64), np.array(bits[501:]))
    assert w1.getvalue() == w2.getvalue()
    assert w1.bit_position == w2.bit_position


def test_counting_writer():
    c = CountingBitWriter(5)
    c.write_bits(0, 13)
    c.align_to_byte()
    assert c.bit_position == 24


def test_reader_eof():
    r = BitReader(io.BytesIO(b"\xff"))
    assert r.read_bits(8) == 0xFF
    with pytest.raises(DataFormatError) as e:
        r.read_bits(1)
    assert e.value.reason == Reason.UNEXPECTED_END_OF_STREAM


def test_reader_consumed_bytes():
    r = BitReader(io.BytesIO(bytes(100)))
    r.read_bits(3)
    assert r.consumed_bytes == 1  # partial byte counts as consumed
    r.read_bits(5)
    assert r.consumed_bytes == 1
    r.read_bits(16)
    assert r.consumed_bytes == 3


def test_reader_detach_tail():
    r = BitReader(io.BytesIO(b"\xab\xcd\xef\x12"), buffer_size=64)
    r.read_bits(10)
    tail = r.detach()
    assert tail == b"\xef\x12"
