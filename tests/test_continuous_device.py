"""Continuous-history device encode (the max-ratio tier on the tpu
engine): round trips, cross-block history reach, stored routing,
mesh-sharded bit-exactness (≙ the sliding [history][data] buffer of
``DeflaterOutputStream.java:38-45,119-137`` — re-cast as halo-prefixed
device lanes + host bit-splice)."""

import gzip as pygzip

import numpy as np
import pytest

from tpu_deflate.codec import encode_jax as ej


def _text(n: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    words = [
        bytes(rng.integers(97, 122, rng.integers(3, 9)).astype(np.uint8))
        for _ in range(60)
    ]
    out = b" ".join(words[int(i)] for i in rng.integers(0, 60, 4 * n // 5))
    return out[:n]


def test_continuous_roundtrip_text():
    data = _text(17000)
    gz = ej.compress_continuous_tpu(data, effort=4, block_data=4096, lane_batch=4)
    assert pygzip.decompress(gz) == data
    # one member: exactly one gzip header magic at offset 0
    assert gz[:2] == b"\x1f\x8b"


def test_continuous_crosses_block_history():
    # A pattern longer than one block recurs: matches must reach the
    # PREVIOUS block through the halo, so continuous framing beats
    # member-parallel (which resets history each member) decisively.
    pat = _text(3000, seed=3)
    data = (pat * 8)[:20000]
    gz_c = ej.compress_continuous_tpu(data, effort=4, block_data=4096, lane_batch=8)
    assert pygzip.decompress(gz_c) == data
    gz_m = ej.compress_members_tpu(data)
    assert len(gz_c) < 0.8 * len(gz_m)


def test_continuous_stored_routing_mid_stream():
    # Incompressible middle blocks route STORED; their byte alignment
    # depends on the running bit offset (emitted at splice time).
    rng = np.random.default_rng(7)
    data = _text(6000, seed=1) + rng.integers(0, 256, 9000, np.uint8).tobytes() + _text(
        5000, seed=2
    )
    gz = ej.compress_continuous_tpu(data, effort=4, block_data=4096, lane_batch=4)
    assert pygzip.decompress(gz) == data


def test_continuous_short_and_empty():
    assert pygzip.decompress(ej.compress_continuous_tpu(b"", effort=4)) == b""
    for n in (1, 5, 4096, 4097):
        data = _text(n, seed=n)
        gz = ej.compress_continuous_tpu(data, effort=4, block_data=4096)
        assert pygzip.decompress(gz) == data


def test_continuous_mesh_matches_single_device():
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    data = _text(30000, seed=9)
    gz1 = ej.compress_continuous_tpu(data, effort=4, block_data=4096, lane_batch=8)
    gz2 = ej.compress_continuous_tpu(
        data, effort=4, block_data=4096, lane_batch=8, mesh=mesh
    )
    assert gz1 == gz2  # sharding must not change a single emitted bit
    assert pygzip.decompress(gz2) == data


def test_engine_effort4_tpu_routes_continuous():
    from tpu_deflate.config import EncoderConfig
    from tpu_deflate.engine import compress

    data = _text(9000, seed=11)
    cfg = EncoderConfig(lookahead=4096)
    gz = compress(data, engine="tpu", effort=4, config=cfg)
    assert pygzip.decompress(gz) == data
    # single member (continuous), not the member-parallel profile
    from tpu_deflate.codec.decode_jax import split_members

    assert len(split_members(np.frombuffer(gz, np.uint8))) == 1
