"""Huffman machinery: canonical codes, decode LUT, package-merge,
validation error taxonomy."""

import heapq
import random

import numpy as np
import pytest

from tpu_deflate.format.errors import DataFormatError, Reason
from tpu_deflate.format.tables import FIXED_DIST_LENGTHS, FIXED_LITLEN_LENGTHS
from tpu_deflate.kernels.huffman import (
    build_decode_lut,
    canonical_codes,
    package_merge_lengths,
    validate_code_lengths,
)


def _rev(v, n):
    return int(bin(v)[2:].zfill(n)[::-1], 2)


def test_fixed_litlen_codes_match_rfc():
    codes = canonical_codes(FIXED_LITLEN_LENGTHS)
    assert codes[0] == _rev(0b00110000, 8)
    assert codes[143] == _rev(0b10111111, 8)
    assert codes[144] == _rev(0b110010000, 9)
    assert codes[255] == _rev(0b111111111, 9)
    assert codes[256] == 0
    assert codes[279] == _rev(0b0010111, 7)
    assert codes[280] == _rev(0b11000000, 8)
    assert codes[287] == _rev(0b11000111, 8)


def test_decode_lut_inverts_codes():
    for lengths in (FIXED_LITLEN_LENGTHS, FIXED_DIST_LENGTHS):
        codes = canonical_codes(lengths)
        lut = build_decode_lut(lengths)
        for sym in np.nonzero(lengths > 0)[0]:
            c, l = int(codes[sym]), int(lengths[sym])
            assert lut.symbol[c] == sym
            assert lut.length[c] == l
            # Any high bits beyond the code length must not matter.
            assert lut.symbol[c | (0x5555 << l) & 0x7FFF] == sym


@pytest.mark.parametrize(
    "lengths,reason",
    [
        ([1, 0, 0], Reason.HUFFMAN_CODE_UNDER_FULL),
        ([0, 0, 0], Reason.HUFFMAN_CODE_UNDER_FULL),
        ([1, 1, 1], Reason.HUFFMAN_CODE_OVER_FULL),
        ([1, 2, 0], Reason.HUFFMAN_CODE_UNDER_FULL),
        ([2, 2, 2], Reason.HUFFMAN_CODE_UNDER_FULL),
        ([1, 2, 3, 3, 1], Reason.HUFFMAN_CODE_OVER_FULL),
    ],
)
def test_validation_errors(lengths, reason):
    with pytest.raises(DataFormatError) as e:
        validate_code_lengths(np.array(lengths))
    assert e.value.reason == reason


@pytest.mark.parametrize("lengths", [[1, 1], [1, 2, 2], [2, 2, 2, 2], [3, 3, 2, 3, 3, 2]])
def test_validation_accepts_complete(lengths):
    validate_code_lengths(np.array(lengths))


def test_package_merge_optimal_and_complete():
    rng = random.Random(99)
    for _ in range(100):
        n = rng.randint(2, 60)
        freqs = np.zeros(70, dtype=np.int64)
        for i in rng.sample(range(70), n):
            freqs[i] = rng.randint(1, 1000)
        lengths = package_merge_lengths(freqs, 15)
        used = lengths[lengths > 0]
        assert abs(sum(2.0 ** -used) - 1.0) < 1e-9  # Kraft-complete
        validate_code_lengths(lengths)
        # optimality vs unbounded Huffman when depth fits
        h = [(int(freqs[i]), i, 0) for i in np.nonzero(freqs)[0]]
        heapq.heapify(h)
        cost_opt = 0
        while len(h) > 1:
            a, b = heapq.heappop(h), heapq.heappop(h)
            m = a[0] + b[0]
            cost_opt += m
            heapq.heappush(h, (m, a[1], max(a[2], b[2]) + 1))
        if h[0][2] <= 15:
            assert int((lengths * freqs).sum()) == cost_opt


def test_package_merge_respects_limit():
    # Fibonacci-ish frequencies force deep trees without a limit.
    freqs = np.array([1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144], dtype=np.int64)
    lengths = package_merge_lengths(freqs, 7)
    assert lengths.max() <= 7
    validate_code_lengths(lengths)
