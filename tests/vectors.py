"""RFC 1951 conformance vectors transcribed from the reference test suite.

These are *data* (hand-built bitstreams + expected outputs / error reasons),
transcribed from
``/root/reference/test/io/nayuki/deflate/InflaterInputStreamTest.java``
(the comment above each vector cites the originating test method). Bit
strings are LSB-first per byte, spaces ignored; ``expect`` is hex output
for success vectors, or a ``Reason`` for failure vectors.
"""

from tpu_deflate.format.errors import Reason

# (name, bit_string, expected_hex) — success vectors
GOOD_VECTORS = [
    # testUncompressedEmpty
    ("uncompressed_empty", "1 00 00000   0000000000000000 1111111111111111", ""),
    # testUncompressedThreeBytes
    (
        "uncompressed_three_bytes",
        "1 00 00000   1100000000000000 0011111111111111   10100000 00101000 11000100",
        "05 14 23",
    ),
    # testUncompressedTwoBlocks
    (
        "uncompressed_two_blocks",
        "0 00 00000   0100000000000000 1011111111111111   10100000 00101000"
        "1 00 00000   1000000000000000 0111111111111111   11000100",
        "05 14 23",
    ),
    # testUncompressedAlreadyByteAligned
    (
        "uncompressed_already_byte_aligned",
        "0 10 110010000 110100001 111111111 0000000  "
        "1 00 0100000000000000 1011111111111111 11010101 10110011",
        "90 A1 FF AB CD",
    ),
    # testFixedHuffmanEmpty
    ("fixed_empty", "1 10 0000000", ""),
    # testFixedHuffmanLiterals
    (
        "fixed_literals",
        "1 10 00110000 10110000 10111111 110010000 111000000 111111111 0000000",
        "00 80 8F 90 C0 FF",
    ),
    # testFixedHuffmanNonOverlappingRun
    (
        "fixed_non_overlapping_run",
        "1 10 00110000 00110001 00110010 0000001 00010 0000000",
        "00 01 02 00 01 02",
    ),
    # testFixedHuffmanOverlappingRun1
    ("fixed_overlapping_run1", "1 10 00110001 0000010 00000 0000000", "01 01 01 01 01"),
    # testFixedHuffmanOverlappingRun2
    (
        "fixed_overlapping_run2",
        "1 10 10111110 10111111 0000011 00001 0000000",
        "8E 8F 8E 8F 8E 8F 8E",
    ),
    # testDynamicHuffmanEmpty
    (
        "dynamic_empty",
        "1 01"
        " 00000 10000 1111"
        " 000 000 100 000 000 000 000 000 000 000 000 000 000 000 000 000 000 100 000"
        " 0 11111111 10101011 0 0 0"
        " 1",
        "",
    ),
    # testDynamicHuffmanEmptyNoDistanceCode
    (
        "dynamic_empty_no_distance_code",
        "1 01"
        " 00000 00000 0111"
        " 000 000 100 010 000 000 000 000 000 000 000 000 000 000 000 000 000 010"
        " 01111111 00101011 11 11 10"
        " 1",
        "",
    ),
]

# (name, bit_string, Reason) — failure vectors
BAD_VECTORS = [
    # testHeaderEndBeforeFinal
    ("header_end_before_final", "", Reason.UNEXPECTED_END_OF_STREAM),
    # testHeaderEndBeforeType
    (
        "header_end_before_type",
        "0 10 110010000 110010001 110010010 110010011 110010100 0000000" "1",
        Reason.UNEXPECTED_END_OF_STREAM,
    ),
    # testHeaderEndInType
    (
        "header_end_in_type",
        "0 10 110010101 110010110 110010111 110011000 0000000" "1 0",
        Reason.UNEXPECTED_END_OF_STREAM,
    ),
    # testUncompressedEndBeforeLength
    ("uncompressed_end_before_length", "1 00 000", Reason.UNEXPECTED_END_OF_STREAM),
    # testUncompressedEndInLength
    (
        "uncompressed_end_in_length",
        "1 00 00000 0000000000",
        Reason.UNEXPECTED_END_OF_STREAM,
    ),
    # testUncompressedEndInNegatedLength
    (
        "uncompressed_end_in_negated_length",
        "1 00 00000 0000000000000000 11111111",
        Reason.UNEXPECTED_END_OF_STREAM,
    ),
    # testUncompressedLengthNegatedMismatch
    (
        "uncompressed_length_negated_mismatch",
        "1 00 00000 0010000000010000 1111100100110101",
        Reason.UNCOMPRESSED_BLOCK_LENGTH_MISMATCH,
    ),
    # testUncompressedEndBeforeData
    (
        "uncompressed_end_before_data",
        "1 00 11111 0110000000000000 1001111111111111",
        Reason.UNEXPECTED_END_OF_STREAM,
    ),
    # testUncompressedEndInData
    (
        "uncompressed_end_in_data",
        "1 00 11111 0110000000000000 1001111111111111 10101010 01110111",
        Reason.UNEXPECTED_END_OF_STREAM,
    ),
    # testUncompressedEndBeforeFinalBlock
    (
        "uncompressed_end_before_final_block",
        "0 00 00000   0000000000000000 1111111111111111",
        Reason.UNEXPECTED_END_OF_STREAM,
    ),
    # testFixedHuffmanInvalidLengthCode286
    ("fixed_invalid_length_code_286", "1 10 11000110", Reason.RESERVED_LENGTH_SYMBOL),
    # testFixedHuffmanInvalidLengthCode287
    ("fixed_invalid_length_code_287", "1 10 11000111", Reason.RESERVED_LENGTH_SYMBOL),
    # testFixedHuffmanInvalidDistanceCode30
    (
        "fixed_invalid_distance_code_30",
        "1 10 00110000 0000001 11110",
        Reason.RESERVED_DISTANCE_SYMBOL,
    ),
    # testFixedHuffmanInvalidDistanceCode31
    (
        "fixed_invalid_distance_code_31",
        "1 10 00110000 0000001 11111",
        Reason.RESERVED_DISTANCE_SYMBOL,
    ),
    # testFixedHuffmanEndInSymbol
    ("fixed_end_in_symbol", "1 10 00000", Reason.UNEXPECTED_END_OF_STREAM),
    # testFixedHuffmanEndBeforeSymbol
    (
        "fixed_end_before_symbol",
        "1 10 110010011 110010001 110010100 110010000 110010010",
        Reason.UNEXPECTED_END_OF_STREAM,
    ),
    # testFixedHuffmanEofInRunExtensionBits
    (
        "fixed_eof_in_run_extension_bits",
        "1 10 00110000 0001101 1",
        Reason.UNEXPECTED_END_OF_STREAM,
    ),
    # testFixedHuffmanEofInDistanceExtensionBits
    (
        "fixed_eof_in_distance_extension_bits",
        "1 10 00110000 11000101 00000 0000001 01000 00",
        Reason.UNEXPECTED_END_OF_STREAM,
    ),
    # testDynamicHuffmanCodeLengthRepeatAtStart
    (
        "dynamic_code_length_repeat_at_start",
        "1 01 00000 00000 0111"
        " 100 000 000 000 000 000 000 000 000 000 000 000 000 000 000 000 000 100"
        " 1",
        Reason.NO_PREVIOUS_CODE_LENGTH_TO_COPY,
    ),
    # testDynamicHuffmanTooManyCodeLengthItems
    (
        "dynamic_too_many_code_length_items",
        "1 01 00000 00000 0111"
        " 000 000 100 000 000 000 000 000 000 000 000 000 000 000 000 000 000 100"
        " 0 0 11111111 10011011",
        Reason.CODE_LENGTH_CODE_OVER_FULL,
    ),
    # testDynamicHuffmanOverfullCode0
    (
        "dynamic_overfull_code0",
        "1 01 00000 00000 0000 100 100 100 000 0000000000000000000",
        Reason.HUFFMAN_CODE_OVER_FULL,
    ),
    # testDynamicHuffmanOverfullCode1
    (
        "dynamic_overfull_code1",
        "1 01 00000 00000 0000 100 100 100 100 0000000000000000000",
        Reason.HUFFMAN_CODE_OVER_FULL,
    ),
    # testDynamicHuffmanUnpairedCode
    (
        "dynamic_unpaired_code",
        "1 01 00000 00000 0000 100 010 110 000 0000000000000000000",
        Reason.HUFFMAN_CODE_UNDER_FULL,
    ),
    # testDynamicHuffmanEmptyCode
    (
        "dynamic_empty_code",
        "1 01 00000 00000 0000 000 000 000 000 0000000000000000000",
        Reason.HUFFMAN_CODE_UNDER_FULL,
    ),
    # testDynamicHuffmanUnderfullCode0
    (
        "dynamic_underfull_code0",
        "1 01 00000 00000 0000 000 000 100 000 0000000000000000000",
        Reason.HUFFMAN_CODE_UNDER_FULL,
    ),
    # testDynamicHuffmanUnderfullCode1
    (
        "dynamic_underfull_code1",
        "1 01 00000 00000 0000 010 100 000 000 0000000000000000000",
        Reason.HUFFMAN_CODE_UNDER_FULL,
    ),
    # testDynamicHuffmanUseOfNullDistanceCode
    (
        "dynamic_use_of_null_distance_code",
        "1 01 10000 00000 0111"
        " 000 000 010 010 000 000 000 000 000 000 000 000 000 000 000 010 000 010"
        " 10 111111111 110101011 01 10 00"
        " 10 11"
        " 0000000000000000",
        Reason.LENGTH_ENCOUNTERED_WITH_EMPTY_DISTANCE_CODE,
    ),
    # testReservedBlockType
    ("reserved_block_type", "1 11 00000", Reason.RESERVED_BLOCK_TYPE),
]


def bits_to_bytes(bit_string: str, pad: str = "0") -> bytes:
    """'0'/'1' string (spaces ignored) -> bytes, LSB-first per byte.

    ``pad``: '0', '1', or 'random' — fill to a byte boundary (the harness
    exercises the decoder's indifference to padding bits past the final
    block, ``InflaterInputStreamTest.java:523-531``).
    """
    import random

    bits = bit_string.replace(" ", "")
    while len(bits) % 8 != 0:
        bits += random.choice("01") if pad == "random" else pad
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, b in enumerate(bits[i : i + 8]):
            byte |= (b == "1") << j
        out.append(byte)
    return bytes(out)
