"""Auxiliary subsystems (SURVEY.md §5): stats/observability, config,
member catalog (seekable decode, resume, failure isolation)."""

import gzip as pygzip
import os
import random

import numpy as np
import pytest

from tpu_deflate import native
from tpu_deflate.catalog import MemberCatalog
from tpu_deflate.config import DEFAULT, DecoderConfig, EncoderConfig
from tpu_deflate.engine import compress
from tpu_deflate.stats import stream_stats


def _structured(seed, n):
    rng = random.Random(seed)
    words = [bytes(rng.getrandbits(8) for _ in range(rng.randint(2, 9))) for _ in range(40)]
    out = bytearray()
    while len(out) < n:
        out += rng.choice(words)
    return bytes(out[:n])


@pytest.fixture(scope="module")
def corpus():
    data = _structured(1, 300_000) + os.urandom(80_000)
    gz = compress(data, engine="native" if native.available() else "host")
    return data, gz


def test_stream_stats(corpus):
    data, gz = corpus
    st = stream_stats(gz)
    assert st.uncompressed_bytes == len(data)
    assert st.compressed_bytes == len(gz)
    assert st.members == -(-len(data) // 65536)
    h = st.block_type_histogram
    assert h["dynamic"] >= 1 and sum(h.values()) == len(st.blocks)
    vec = st.as_vector()
    assert vec[0] == st.members and vec[3] == len(data)
    # foreign stream
    st2 = stream_stats(pygzip.compress(data[:50_000]))
    assert st2.uncompressed_bytes == 50_000


def test_config_defaults():
    assert DEFAULT.encoder.history == 32 * 1024
    assert DEFAULT.encoder.lookahead == 64 * 1024
    assert DEFAULT.decoder.buffer_size == 16 * 1024
    assert EncoderConfig(max_code_len=10).max_code_len == 10
    assert DecoderConfig(on_error="skip").on_error == "skip"


def test_catalog_random_access(corpus):
    data, gz = corpus
    cat = MemberCatalog(gz)
    assert cat.total_uncompressed == len(data)
    rng = random.Random(3)
    for _ in range(10):
        a = rng.randrange(len(data))
        b = min(len(data), a + rng.randrange(1, 200_000))
        assert cat.read_range(a, b) == data[a:b], (a, b)
    assert cat.read_range(len(data) - 10, len(data) + 99) == data[-10:]
    assert cat.read_range(5, 5) == b""


def test_catalog_resume_point(corpus):
    data, gz = corpus
    cat = MemberCatalog(gz)
    cin, cout = cat.resume_point(0)
    assert (cin, cout) == (0, 0)
    cin, cout = cat.resume_point(65536 + 1)
    assert cout == 65536
    assert gz[cin : cin + 2] == b"\x1f\x8b"
    cin, cout = cat.resume_point(len(data))
    assert cout == len(data)


def test_catalog_failure_isolation(corpus):
    data, gz = corpus
    broken = bytearray(gz)
    cat = MemberCatalog(bytes(broken))
    # corrupt the second member's payload
    m = cat.entries[1].index
    broken[(m.payload_start + m.end - 8) // 2] ^= 0xFF
    cat = MemberCatalog(bytes(broken))
    out, bad = cat.decode_all(on_error="skip")
    assert bad == [1]
    # all other members decoded fine
    assert out[: 65536] == data[: 65536]
    assert out[65536 : 65536] == b""


def test_catalog_rejects_unindexed():
    with pytest.raises(ValueError):
        MemberCatalog(pygzip.compress(b"hello"))
