"""Device LZ77 resolve (resolve_pallas) vs the serial reference.

≙ the reference's dictionary copy loop ``decomp/Open.java:589-617``:
overlapping copies, RLE wraparound, copy-before-start detection.
Pallas kernels run in interpret mode on the CPU test mesh; the chip
path is exercised by kernel_only_bench_full and the engine tests.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from tpu_deflate.codec import resolve_pallas as rp
from tpu_deflate.kernels import checksum_jax as cj


def _gen_tokens(rng, style: str, n_target: int) -> list[int]:
    toks: list[int] = []
    out = 0
    while out < n_target - 300:
        if style == "text":
            if rng.random() < 0.6 or out < 4:
                toks.append(int(rng.integers(0, 256)))
                out += 1
            else:
                run = int(rng.integers(3, 60))
                dist = int(rng.integers(1, min(out, 5000)))
                toks.append(rp.TOKEN_MATCH_BIT | run << 16 | (dist - 1))
                out += run
        elif style == "records":
            if rng.random() < 0.25 or out < 70:
                toks.append(int(rng.integers(0, 256)))
                out += 1
            else:
                run = int(rng.integers(3, 40))
                toks.append(rp.TOKEN_MATCH_BIT | run << 16 | 63)
                out += run
        else:  # rle: overlapping copies, dist 1..4
            if rng.random() < 0.1 or out < 4:
                toks.append(int(rng.integers(0, 4)))
                out += 1
            else:
                run = int(rng.integers(100, 258))
                dist = int(rng.integers(1, 5))
                toks.append(rp.TOKEN_MATCH_BIT | run << 16 | (dist - 1))
                out += run
    return toks


def test_resolve_matches_reference_all_styles():
    rng = np.random.default_rng(11)
    styles = ["text", "records", "rle"]
    tokarr = np.full((len(styles), rp.N_POS), -1, np.int32)
    refs = []
    for i, sty in enumerate(styles):
        t = _gen_tokens(rng, sty, 30000)
        tokarr[i, : len(t)] = t
        refs.append(rp.resolve_reference(np.array(t, np.int64)))
    y, summ, rounds, unres = rp.resolve_tokens_device(jnp.asarray(tokarr))
    y = np.asarray(y)
    summ = np.asarray(summ)
    assert int(unres) == 0
    for i, ref in enumerate(refs):
        total = int(summ[i, 1])
        assert total == len(ref)
        assert y[i, :total].astype(np.uint8).tobytes() == ref
        assert int(summ[i, 0]) == rp.N_POS  # no error
        assert (y[i, total:] == 0).all()  # zero tail for the CRC path


def test_resolve_copy_before_start_error_position():
    tokarr = np.full((2, rp.N_POS), -1, np.int32)
    tokarr[0, 0] = 65
    tokarr[0, 1] = rp.TOKEN_MATCH_BIT | (5 << 16) | 3  # dist 4 > 1 byte out
    tokarr[1, 0] = 66
    y, summ, rounds, unres = rp.resolve_tokens_device(jnp.asarray(tokarr))
    summ = np.asarray(summ)
    assert int(summ[0, 0]) == 1  # first bad position, stream order
    assert int(summ[1, 0]) == rp.N_POS
    assert int(unres) == 0  # an errored lane must not stall the wave


def test_crc8_leftaligned_matches_zlib():
    import zlib

    rng = np.random.default_rng(3)
    L, width = 4, rp.N_POS
    rows = np.zeros((L, width), np.uint8)
    lens = [0, width, 1, 12345]
    for i, n in enumerate(lens):
        rows[i, :n] = rng.integers(0, 256, n, dtype=np.uint8)
    K8, lvl8 = cj.crc_matrices8(width // cj.CHUNK_BYTES)
    raw = np.asarray(cj.crc32_lanes_raw8(jnp.asarray(rows.astype(np.int32)), K8, lvl8))
    crcs = cj.crc32_finish_leftaligned(raw, np.array(lens), width)
    for i, n in enumerate(lens):
        assert int(crcs[i]) == (zlib.crc32(rows[i, :n].tobytes()) & 0xFFFFFFFF)
