"""Decoder conformance suite against the transcribed reference vectors.

Mirrors the reference harness (``InflaterInputStreamTest.java:519-593``):
each vector decodes twice — once via 1-byte reads, once via randomized
chunk reads — under every padding mode; failure vectors must raise
DataFormatError with the exact Reason.
"""

import io
import random

import pytest

from tpu_deflate.codec.inflate_host import inflate
from tpu_deflate.format.errors import DataFormatError
from tpu_deflate.streams.inflater import InflaterReader

from vectors import BAD_VECTORS, GOOD_VECTORS, bits_to_bytes

random.seed(20260817)


def _decode_single_byte_reads(data: bytes) -> bytes:
    r = InflaterReader(io.BytesIO(data), end_exactly=True)
    out = bytearray()
    while True:
        b = r.read(1)
        if not b:
            return bytes(out)
        out += b


def _decode_random_chunks(data: bytes) -> bytes:
    r = InflaterReader(io.BytesIO(data), end_exactly=True)
    out = bytearray()
    while True:
        n = random.randint(1, 100)
        chunk = r.read(n)
        if not chunk:
            return bytes(out)
        out += chunk


@pytest.mark.parametrize("pad", ["0", "1", "random"])
@pytest.mark.parametrize("name,bits,hexout", GOOD_VECTORS, ids=[v[0] for v in GOOD_VECTORS])
def test_good_vector(name, bits, hexout, pad):
    data = bits_to_bytes(bits, pad)
    expect = bytes.fromhex(hexout.replace(" ", ""))
    assert inflate(data) == expect
    assert _decode_single_byte_reads(data) == expect
    assert _decode_random_chunks(data) == expect


@pytest.mark.parametrize("pad", ["0", "1"])
@pytest.mark.parametrize("name,bits,reason", BAD_VECTORS, ids=[v[0] for v in BAD_VECTORS])
def test_bad_vector(name, bits, reason, pad):
    data = bits_to_bytes(bits, pad)
    with pytest.raises(DataFormatError) as exc_info:
        inflate(data)
    assert exc_info.value.reason == reason


def test_end_exactly_consumes_stream_exactly():
    """After the final block, exactly the payload bytes are consumed."""
    for name, bits, hexout in GOOD_VECTORS:
        payload = bits_to_bytes(bits, "0")
        trailer = b"TRAILER!"
        r = InflaterReader(io.BytesIO(payload + trailer), end_exactly=True)
        out = r.read()
        assert out == bytes.fromhex(hexout.replace(" ", ""))
        tail = r.detach()
        assert tail.read() == trailer, name


# ---------------------------------------------------------------------------
# Randomized property tests (ports of the reference's randomized suites,
# InflaterInputStreamTest.java:131-208,306-338, reduced trial counts)
# ---------------------------------------------------------------------------


def _rand_stored_block_bits(rng, final: bool, max_pow: int = 13) -> tuple[str, bytes]:
    bits = ("1" if final else "0") + "00"
    bits += "".join(rng.choice("01") for _ in range(5))  # padding
    ln = rng.randrange(max_pow)
    if ln > 0:
        ln = 1 << (ln - 1)
        ln |= rng.randrange(ln)
    tmp = ln | ((~ln & 0xFFFF) << 16)
    bits += "".join(str((tmp >> k) & 1) for k in range(32))
    data = bytes(rng.randrange(256) for _ in range(ln))
    for b in data:
        bits += "".join(str((b >> k) & 1) for k in range(8))
    return bits, data


def test_random_stored_blocks():
    rng = random.Random(1)
    for _ in range(25):
        num_blocks = rng.randrange(8) + 1
        bits, expect = "", b""
        for j in range(num_blocks):
            b, d = _rand_stored_block_bits(rng, j == num_blocks - 1)
            bits += b
            expect += d
        data = bits_to_bytes(bits, "random")
        assert inflate(data) == expect


def test_random_stored_mixed_with_fixed_alignment():
    """Stored blocks interleaved with 19-bit fixed blocks so stored blocks
    start at every bit alignment (reference rationale, test file :201-204)."""
    rng = random.Random(2)
    for _ in range(25):
        num_blocks = rng.randrange(16) + 1
        bits, expect = "", b""
        for j in range(num_blocks):
            final = j == num_blocks - 1
            if rng.random() < 0.5:
                bits += ("1" if final else "0") + "00"
                while (len(bits)) % 8 != 0:
                    bits += rng.choice("01")
                ln = rng.randrange(9)
                if ln > 0:
                    ln = 1 << (ln - 1)
                    ln |= rng.randrange(ln)
                tmp = ln | ((~ln & 0xFFFF) << 16)
                bits += "".join(str((tmp >> k) & 1) for k in range(32))
                data = bytes(rng.randrange(256) for _ in range(ln))
                for b in data:
                    bits += "".join(str((b >> k) & 1) for k in range(8))
                expect += data
            else:
                bits += ("1" if final else "0") + "10" + "111111111" + "0000000"
                expect += b"\xff"
        data = bits_to_bytes(bits, "random")
        assert inflate(data) == expect


def test_random_fixed_huffman_literals():
    rng = random.Random(3)
    for _ in range(25):
        num_blocks = rng.randrange(10) + 1
        bits, expect = "", b""
        for j in range(num_blocks):
            bits += ("1" if j == num_blocks - 1 else "0") + "10"
            ln = rng.randrange(9)
            if ln > 0:
                ln = 1 << (ln - 1)
                ln |= rng.randrange(ln)
            for _ in range(ln):
                b = rng.randrange(256)
                if b < 144:
                    code, width = b + 48, 8
                else:
                    code, width = b - 144 + 400, 9
                bits += "".join(str((code >> k) & 1) for k in range(width - 1, -1, -1))
                expect += bytes([b])
            bits += "0000000"
        data = bits_to_bytes(bits, "random")
        assert inflate(data) == expect


def test_random_streams_through_native_decoder():
    """The randomized alignment-stress streams also run through the C
    decoder (same semantics as the host state machine)."""
    from tpu_deflate import native

    if not native.available():
        import pytest

        pytest.skip("no C toolchain")
    rng = random.Random(77)
    for _ in range(15):
        num_blocks = rng.randrange(12) + 1
        bits, expect = "", b""
        for j in range(num_blocks):
            final = j == num_blocks - 1
            if rng.random() < 0.5:
                bits += ("1" if final else "0") + "00"
                while len(bits) % 8 != 0:
                    bits += rng.choice("01")
                ln = rng.randrange(200)
                tmp = ln | ((~ln & 0xFFFF) << 16)
                bits += "".join(str((tmp >> k) & 1) for k in range(32))
                data = bytes(rng.randrange(256) for _ in range(ln))
                for b in data:
                    bits += "".join(str((b >> k) & 1) for k in range(8))
                expect += data
            else:
                bits += ("1" if final else "0") + "10" + "111111111" + "0000000"
                expect += b"\xff"
        data = bits_to_bytes(bits, "0")
        out, _ = native.inflate_raw(data, len(expect) + 16)
        assert out == expect
