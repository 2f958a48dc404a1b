"""Gather-free (v2) device decoder: differential tests vs host decoder
and zlib across data shapes, error paths, and foreign-stream fallback."""

import gzip as pygzip
import os
import random

import numpy as np
import pytest

import tpu_deflate as td
from tpu_deflate import native
from tpu_deflate.codec.decode_jax_v2 import (
    compact_tokens,
    gzip_decompress_tpu_v2,
)
from tpu_deflate.codec.profile import profile_compress_host


def _structured(seed, n):
    rng = random.Random(seed)
    words = [bytes(rng.getrandbits(8) for _ in range(rng.randint(2, 9))) for _ in range(40)]
    out = bytearray()
    while len(out) < n:
        out += rng.choice(words)
    return bytes(out[:n])


def _compress(data):
    if native.available():
        return native.compress_members_native(data)
    return profile_compress_host(data)


@pytest.mark.parametrize("n", [0, 1, 1000, 30000])
def test_v2_roundtrip(n):
    data = _structured(n, n)
    gz = _compress(data)
    assert gzip_decompress_tpu_v2(gz) == data


def test_v2_mixed_block_types():
    data = os.urandom(70000) + bytes(70000) + _structured(1, 70000)
    gz = _compress(data)
    assert gzip_decompress_tpu_v2(gz) == data


def test_v2_matches_host_on_many_seeds():
    for seed in range(4):
        data = _structured(seed, 30000)
        gz = _compress(data)
        assert gzip_decompress_tpu_v2(gz) == td.gzip_decompress(gz) == data


def test_v2_detects_corruption():
    data = _structured(5, 60000)
    gz = bytearray(_compress(data))
    gz[len(gz) // 2] ^= 0x55
    with pytest.raises(td.DataFormatError):
        gzip_decompress_tpu_v2(bytes(gz))


def test_v2_foreign_fallback():
    data = _structured(6, 20000)
    assert gzip_decompress_tpu_v2(pygzip.compress(data)) == data


def test_compaction_property():
    import jax.numpy as jnp

    from tpu_deflate.codec.decode_jax_v2 import COMPACT_T1, compact_tokens_full

    rng = np.random.default_rng(0)
    L, B = 2, 4096
    token = rng.integers(0, 1 << 20, (L, B), dtype=np.int32)
    reached = rng.random((L, B)) < 0.07
    tok, counts, ovf = compact_tokens(jnp.asarray(token), jnp.asarray(reached))
    tok, counts = np.asarray(tok), np.asarray(counts)
    assert not bool(np.asarray(ovf))
    for l in range(L):
        want_t = token[l][reached[l]]
        c = int(counts[l])
        assert c == want_t.size
        np.testing.assert_array_equal(tok[l, :c], want_t)
    # single-level fallback agrees
    tok2, counts2, _ = compact_tokens_full(jnp.asarray(token), jnp.asarray(reached))
    tok2, counts2 = np.asarray(tok2), np.asarray(counts2)
    for l in range(L):
        c = int(counts[l])
        np.testing.assert_array_equal(tok2[l, :c], tok[l, :c])


def test_compaction_overflow_flag():
    """Every position valid in one tile -> two-level compaction must flag
    overflow (and the fallback must still be exact)."""
    import jax.numpy as jnp

    from tpu_deflate.codec.decode_jax_v2 import compact_tokens_full

    L, B = 1, 2048
    token = np.arange(B, dtype=np.int32).reshape(L, B) % 250
    reached = np.ones((L, B), bool)
    _tok, _counts, ovf = compact_tokens(jnp.asarray(token), jnp.asarray(reached))
    assert bool(np.asarray(ovf))
    tok, counts, _ = compact_tokens_full(jnp.asarray(token), jnp.asarray(reached))
    np.testing.assert_array_equal(np.asarray(tok)[0], token[0])
    assert int(np.asarray(counts)[0]) == B


def test_v2_decodes_continuous_effort5_no_fallback():
    """effort>=4 output is one member with many blocks and continuous 32 KiB
    history — previously undecodable on the device path (host fallback).
    The block-chained v2 driver must decode it on device, bit-exact."""
    if not native.available():
        pytest.skip("native engine unavailable")
    from tpu_deflate.engine import compress

    data = _structured(7, 300_000)
    gz = compress(data, effort=5)
    assert gzip_decompress_tpu_v2(gz) == data


def test_v2_decodes_foreign_multiblock_stream():
    """A zlib-produced .gz (foreign stream, multi-block dynamic) decodes
    through the device block-chain driver — no host state machine."""
    data = _structured(8, 200_000)
    gz = pygzip.compress(data, compresslevel=9)
    assert gzip_decompress_tpu_v2(gz) == data
