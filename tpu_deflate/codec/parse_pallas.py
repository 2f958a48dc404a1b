"""Pallas greedy-parse kernels for the device encoder.

The analyze kernel's greedy/lazy parse walks the token chain
next[i] = i + step[i] (step = match run or 1). The XLA formulation is
pointer doubling — 17 gather+scatter rounds over (L, S), ~1.3 s per
4 MiB batch on this backend (dynamic gathers run at ~67 ms per pass).
This module recasts it as the decoder's tile scheme (decode_pallas
stages B/D): per-tile transfer maps from a lock-step VMEM cursor walk
and a single replay per tile — no gathers anywhere on device. The
cross-tile chain walk (NT sequential 1-byte lookups per lane) is host
work between the two device calls: a ~2 MB transfer pull that the
encode pipeline overlaps with the next batch's analyze.

Steps are capped at PARSE_MAX_STEP (250) by the caller so every exit
offset fits a byte and a chain can never skip a whole 512-position
tile; the cap costs long matches at most 8/258 of one token's
efficiency.

≙ the serial token scan of ``comp/Lz77Huffman.java:68-131`` parallelized
over tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import jax_setup  # noqa: F401

try:  # pragma: no cover - exercised wherever pallas exists
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

T_P = 512  # positions per tile
E_P = 256  # entry offsets tracked (> max step, so no tile is skipped)
CT_P = 128  # tiles per kernel block
PARSE_MAX_STEP = 250  # keeps exit offsets byte-sized


def parse_available() -> bool:
    import os

    if not _PALLAS_IMPORTED or os.environ.get("TPU_DEFLATE_NO_PALLAS"):
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon")


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def _parse_b_kernel(s_ref, out_ref):
    """s_ref (1, T_P, CT) int32 steps; out_ref (1, E_P, CT) int32
    transfer maps: entry e -> exit offset into the next tile."""
    cur = jax.lax.broadcasted_iota(jnp.int32, (E_P, CT_P), 0)

    def body(s8, cur):
        base = pl.multiple_of(s8 * 8, 8)
        badv = s_ref[0, pl.ds(base, 8), :]
        for k in range(8):
            cur = cur + jnp.where(cur == base + k, badv[k, :][None, :], 0)
        return cur

    cur = jax.lax.fori_loop(0, T_P // 8, body, cur)
    out_ref[0] = cur - T_P


def _parse_d_kernel(s_ref, e_ref, tok_ref):
    """Replay the true chain: s_ref (1, T_P, CT) steps; e_ref (1, 8, CT)
    entries (row 0); tok_ref (1, T_P, CT) int32 is-token bitmap."""
    cur = e_ref[0, 0, :]

    def body(s8, cur):
        base = pl.multiple_of(s8 * 8, 8)
        badv = s_ref[0, pl.ds(base, 8), :]
        rows = []
        for k in range(8):
            at = (cur == base + k).astype(jnp.int32)
            rows.append(at)
            cur = cur + at * badv[k, :]
        tok_ref[0, pl.ds(base, 8), :] = jnp.stack(rows, axis=0)
        return cur

    jax.lax.fori_loop(0, T_P // 8, body, cur)


def step_tiles(step: jnp.ndarray) -> jnp.ndarray:
    """(L, S) steps -> (L, T_P, NT) tile-major layout."""
    L, S = step.shape
    NT = S // T_P
    return step.reshape(L, NT, T_P).transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def parse_transfers(tiles: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """tiles (L, T_P, NT) int32 -> transfers (L, NT, E_P) uint8."""
    L, _T, NT = tiles.shape
    assert NT % CT_P == 0
    out = pl.pallas_call(
        _parse_b_kernel,
        grid=(L, NT // CT_P),
        in_specs=[pl.BlockSpec((1, T_P, CT_P), lambda l, t: (l, 0, t), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, E_P, CT_P), lambda l, t: (l, 0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, E_P, NT), jnp.int32),
        interpret=interpret,
    )(tiles)
    return out.transpose(0, 2, 1).astype(jnp.uint8)


def host_entries(transfers: np.ndarray) -> np.ndarray:
    """(L, NT, E_P) transfer maps -> (L, NT) entry offsets of the chain
    from position 0 (the serial cross-tile seam, NT scalar steps/lane)."""
    L, NT, _E = transfers.shape
    entries = np.zeros((L, NT), np.int32)
    lanes = np.arange(L)
    e = np.zeros(L, np.int64)
    for t in range(1, NT):
        e = transfers[lanes, t - 1, e].astype(np.int64)
        entries[:, t] = e
    return entries


@functools.partial(jax.jit, static_argnames=("interpret",))
def parse_replay(
    tiles: jnp.ndarray, entries: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """tiles (L, T_P, NT), entries (L, NT) -> is-token bool (L, S)."""
    L, _T, NT = tiles.shape
    ent8 = jnp.broadcast_to(entries[:, None, :], (L, 8, NT)).astype(jnp.int32)
    tok = pl.pallas_call(
        _parse_d_kernel,
        grid=(L, NT // CT_P),
        in_specs=[
            pl.BlockSpec((1, T_P, CT_P), lambda l, t: (l, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, CT_P), lambda l, t: (l, 0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_P, CT_P), lambda l, t: (l, 0, t), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, T_P, NT), jnp.int32),
        interpret=interpret,
    )(tiles, ent8)
    return (tok.transpose(0, 2, 1).reshape(L, NT * T_P)) != 0
