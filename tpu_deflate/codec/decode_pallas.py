"""Pallas TPU kernels for the v2 decoder's cursor stages.

The XLA twins in :mod:`decode_jax_v2` express the per-tile cursor scans
(stage B transfer functions, stage D chain replay) as ``lax.scan`` over
bit positions: every step is a separate fused op over HBM-resident
state, so the scans run far below VPU speed and force small tiles
(W_TILE=64) to keep scan overhead down — which in turn blows up the
stage-C compose (one transfer map per tile).

These kernels keep the cursor state and the whole tile in VMEM:

- ``stage_b_pallas``: 48 lock-step cursors advance over W=512-bit tiles
  entirely in registers/VMEM; one HBM read of the delta tile, one HBM
  write of the 48-entry transfer map. 8x fewer tiles make stage C's
  associative compose 8x cheaper for free.
- ``stage_dc_pallas``: replays the true chain per tile (one cursor),
  marks reached positions, and — in the same VMEM residency — computes
  the level-1 token compaction (rank via log-shift cumsum, collision-free
  displacement moves, ``pltpu.roll`` + masks instead of dynamic slices)
  plus the per-tile summary partials that stage E previously recomputed
  from full-width arrays (EOB/error hits, decoded-size sums).

Sentinel encoding: delta values are 1..48 (bits consumed), 127 (EOB) or
255 (error) as produced by stage A. In-kernel, EOB advances the cursor
by +4096 and ERR by +8192, so terminal cursors freeze (they exceed every
remaining step index) and the three exit classes stay disjoint in int32:
normal [W, W+47], EOB [4096, 4607], ERR [8192, 8703].

Mosaic constraints honored (measured on this backend): dynamic slices
only on the sublane axis at multiples of 8 (``pl.multiple_of`` + 8-row
blocks with a static inner unroll), no gathers, ≥2D iota, lane axis kept
at 64/128 multiples.

≙ reference semantics: the cursor walk is ``decomp/Open.java:479-563``'s
symbol loop with the bit cursor replaced by position-indexed jumps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import jax_setup  # noqa: F401

try:  # pallas may be absent on exotic builds; the XLA twins then serve
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

W_P = 512  # tile width in bits for the pallas path
E_WIN = 48  # entry offsets tracked per tile (max bits of one symbol group)
K1 = 160  # default level-1 token slots per tile (3.2 bits/sym floor)
# Host-chosen K1 per wave: floor(W_P/min_token_bits)+1 bounds the tokens a
# 512-bit tile can hold (min_token_bits = shortest literal code or shortest
# length+distance code pair), so the wave driver picks the smallest safe
# slot count — smaller K1 => cheaper level-2 compaction, no overflow risk.
K1_CHOICES = (104, 136, 176)
CT = 128  # tiles per kernel block (lane axis; Mosaic needs multiples of 128)
_EOB_ADV = 4096
_ERR_ADV = 8192

# Payload byte buckets for the pallas path: multiples of 8192 so the
# per-lane tile count NT = P/64 is a multiple of CT=128. 73728 matters:
# a nearly-incompressible 64 KiB member's Huffman payload is just over
# 65536, and without that bucket it would quadruple the whole wave.
P_BUCKETS_PALLAS = (8192, 16384, 24576, 32768, 40960, 49152, 65536, 73728, 139264, 270336)


def _adv_from_delta(d):
    """Map stage-A delta encoding to cursor advances (int32)."""
    return jnp.where(d == 127, _EOB_ADV, jnp.where(d == 255, _ERR_ADV, d))


# ---------------------------------------------------------------------------
# Stage A: fused windows + bounds ladders + bit-sliced descriptor decode
# ---------------------------------------------------------------------------

# SMEM meta row layout (int32 columns per lane). Ladder tables store the
# uint32 bounds bit-cast to int32; acc2/acc3 are the packed class-
# threshold / rank-offset summands of ``class_ladder_tables``; MW are
# the 11 match-descriptor plane words (indexed by match rank < 29) and
# DPERM the 5 distance-symbol plane words (indexed by canonical index).
MA_LLSAT = 0
MA_LLPACK = 16
MA_LLP2 = 32
MA_LLP3 = 48
MA_DSAT = 64
MA_DPACK = 80
MA_LLNLIVE = 96
MA_DNLIVE = 97
MA_DEMPTY = 98
MA_PBITS = 99
MA_EOB = 100
MA_INIT2 = 101
MA_INIT3 = 102
MA_MW = 104  # 11 match-desc planes (1 word each)
MA_DPERM = 115  # 5 dist-symbol planes (1 word each)
META_W = 128

_A_EOB = 127
_A_ERR = 255


def _stage_a_kernel(meta_ref, gc_ref, gn_ref, d_ref, t_ref):
    """One (lane, CT tile-columns) block of the speculative decode.

    gc_ref/gn_ref (1, 64, CT) uint8: this block's byte grid and the grid
    shifted one tile column (9-byte lookahead); meta_ref (L, META_W)
    int32 scalar-prefetch (SMEM) per-lane tables, indexed by the lane
    program id; d_ref/t_ref (1, 64, 8, CT) int32 outputs
    (delta, token) — position p = 512*tile + 8*q + r lives at [q, r, c].

    Everything (windows, two bounds ladders, bit-sliced descriptor
    lookup, extra-bits reversal, error ordering, token build) runs in
    VMEM: the XLA twin's materialized windows / one-hot / descriptor-row
    intermediates (~2 GB of HBM traffic per 16 MiB wave) disappear.
    Semantics ≙ decode_jax_v2.stage_a (differentially tested).
    """
    from .decode_jax_v2 import (
        TOKEN_MATCH_BIT,
        _ERR_EMPTY_DIST,
        _ERR_END,
        _ERR_RESERVED_DIST,
        _ERR_RESERVED_LEN,
    )

    def rev8(x):
        x = ((x & 0x55) << 1) | ((x >> 1) & 0x55)
        x = ((x & 0x33) << 2) | ((x >> 2) & 0x33)
        return ((x & 0x0F) << 4) | (x >> 4)

    lane = pl.program_id(0)
    gc = rev8(gc_ref[0].astype(jnp.int32))  # (64, CT)
    gn = rev8(gn_ref[0].astype(jnp.int32))
    rows64 = jax.lax.broadcasted_iota(jnp.int32, gc.shape, 0)

    def row(k: int):
        if k == 0:
            return gc
        a = pltpu.roll(gc, shift=64 - k, axis=0)
        b = pltpu.roll(gn, shift=64 - k, axis=0)
        return jnp.where(rows64 < 64 - k, a, b)

    b = [row(k) for k in range(9)]
    u32a = ((b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3]).astype(jnp.uint32)
    u32b = ((b[4] << 24) | (b[5] << 16) | (b[6] << 8) | b[7]).astype(jnp.uint32)
    r = jax.lax.broadcasted_iota(jnp.uint32, (1, 8, 1), 1)
    # Reversed 32-bit windows at every bit position, (64, 8, CT).
    vR = (u32a[:, None, :] << r) | (b[4].astype(jnp.uint32)[:, None, :] >> (8 - r))
    vR2 = (u32b[:, None, :] << r) | (b[8].astype(jnp.uint32)[:, None, :] >> (8 - r))

    def ladder(v, sat_base, pack_base, nlive_col):
        acc = jnp.zeros(v.shape, jnp.int32)
        for l in range(1, 15):
            sat = meta_ref[lane, sat_base + l].astype(jnp.uint32)
            ge = v >= sat
            acc = jnp.where(ge, acc + meta_ref[lane, pack_base + l], acc)
        cnt = acc >> 20
        ln = 1 + cnt
        off = (acc & 0xFFFFF) - (cnt << 16)
        c = (v >> (31 - cnt).astype(jnp.uint32)).astype(jnp.int32)
        idx = c + off
        found = idx < meta_ref[lane, nlive_col]
        return ln, idx, found

    def ladder3(v):
        """Litlen ladder with the class/rank accumulators riding ``ge``."""
        acc = jnp.zeros(v.shape, jnp.int32)
        acc2 = jnp.full(v.shape, meta_ref[lane, MA_INIT2], jnp.int32)
        acc3 = jnp.full(v.shape, meta_ref[lane, MA_INIT3], jnp.int32)
        for l in range(1, 15):
            sat = meta_ref[lane, MA_LLSAT + l].astype(jnp.uint32)
            ge = v >= sat
            acc = jnp.where(ge, acc + meta_ref[lane, MA_LLPACK + l], acc)
            acc2 = jnp.where(ge, acc2 + meta_ref[lane, MA_LLP2 + l], acc2)
            acc3 = jnp.where(ge, acc3 + meta_ref[lane, MA_LLP3 + l], acc3)
        cnt = acc >> 20
        ln = 1 + cnt
        off = (acc & 0xFFFFF) - (cnt << 16)
        c = (v >> (31 - cnt).astype(jnp.uint32)).astype(jnp.int32)
        idx = c + off
        found = idx < meta_ref[lane, MA_LLNLIVE]
        lnb = ln << 12
        lit_end = ((acc2 >> 16) & 0xFFFF) - lnb
        res_start = (acc2 & 0xFFFF) - lnb
        lit_off = ((acc3 >> 16) & 0xFFFF) - lnb
        mrank_off = (acc3 & 0xFFFF) - lnb
        return ln, idx, found, lit_end, res_start, lit_off, mrank_off

    def rev_low16(x, k):
        x = ((x & 0x5555) << 1) | ((x >> 1) & 0x5555)
        x = ((x & 0x3333) << 2) | ((x >> 2) & 0x3333)
        x = ((x & 0x0F0F) << 4) | ((x >> 4) & 0x0F0F)
        x = ((x & 0x00FF) << 8) | ((x >> 8) & 0x00FF)
        return x >> (16 - k)

    ln, lidx, lfound, lit_end, res_start, lit_off, mrank_off = ladder3(vR)
    is_lit = lfound & (lidx < lit_end)
    is_eob = lfound & (lidx == meta_ref[lane, MA_EOB])
    reserved_len = lfound & (lidx >= res_start)
    is_match = lfound & ~is_lit & ~is_eob & ~reserved_len

    lit_rank = lidx + lit_off
    mrank = ((lidx + mrank_off) & 31).astype(jnp.uint32)
    mdesc = jnp.zeros(lidx.shape, jnp.int32)
    for bbit in range(11):
        mw = meta_ref[lane, MA_MW + bbit].astype(jnp.uint32)
        mdesc = mdesc | (((mw >> mrank) & 1) << bbit).astype(jnp.int32)
    run_bits = jnp.where(is_match, mdesc & 7, 0)
    pay = mdesc >> 3  # run_base - 3

    rev = (vR >> (32 - ln - run_bits).astype(jnp.uint32)).astype(jnp.int32)
    run = (pay + 3) + rev_low16(rev & ((1 << run_bits) - 1), run_bits)
    d1 = ln + run_bits
    d1u = d1.astype(jnp.uint32)
    vD = (vR << d1u) | (vR2 >> (32 - d1u))

    dln, didx, dfound = ladder(vD, MA_DSAT, MA_DPACK, MA_DNLIVE)

    # Distance symbol via 5 single-word planes + RFC 1951 closed forms.
    d5 = jnp.maximum(didx, 0).astype(jnp.uint32) & 31
    ds = jnp.zeros(didx.shape, jnp.int32)
    for bbit in range(5):
        m = meta_ref[lane, MA_DPERM + bbit].astype(jnp.uint32)
        ds = ds | (((m >> d5).astype(jnp.int32) & 1) << bbit)
    dist_bits = jnp.maximum((ds >> 1) - 1, 0)
    reserved_dist = ds >= 30
    dbase_m1 = jnp.where(ds < 4, ds, (2 + (ds & 1)) << dist_bits)
    drev = (vD >> (32 - dln - dist_bits).astype(jnp.uint32)).astype(jnp.int32)
    dist = dbase_m1 + 1 + rev_low16(drev & ((1 << dist_bits) - 1), dist_bits)

    q8 = jax.lax.broadcasted_iota(jnp.int32, (64, 8, 1), 0) * 8
    rr = jax.lax.broadcasted_iota(jnp.int32, (64, 8, 1), 1)
    tcol = jax.lax.broadcasted_iota(jnp.int32, (1, 1, CT), 2) + pl.program_id(1) * CT
    pos = tcol * W_P + q8 + rr
    bits = meta_ref[lane, MA_PBITS]
    dist_empty = meta_ref[lane, MA_DEMPTY] != 0
    end_len = pos + ln
    end_run = end_len + run_bits  # run_bits is 0 outside match positions
    end_dcode = end_run + dln
    end_all = end_dcode + dist_bits

    errc = jnp.zeros(pos.shape, jnp.int32)

    def _set(errc, cond, code):
        return jnp.where((errc == 0) & cond, code, errc)

    errc = _set(errc, ~lfound, _ERR_END)
    errc = _set(errc, end_len > bits, _ERR_END)
    errc = _set(errc, reserved_len, _ERR_RESERVED_LEN)
    errc = _set(errc, is_match & (end_run > bits), _ERR_END)
    errc = _set(errc, is_match & dist_empty, _ERR_EMPTY_DIST)
    errc = _set(errc, is_match & ~dfound, _ERR_END)
    errc = _set(errc, is_match & (end_dcode > bits), _ERR_END)
    errc = _set(errc, is_match & reserved_dist, _ERR_RESERVED_DIST)
    errc = _set(errc, is_match & (end_all > bits), _ERR_END)

    adv = jnp.where(is_match, end_all, end_len) - pos
    delta = jnp.where(errc != 0, _A_ERR, jnp.where(is_eob, _A_EOB, adv))
    token = jnp.where(
        is_lit,
        lit_rank,
        TOKEN_MATCH_BIT
        | (jnp.clip(run, 3, 258) << 16)
        | jnp.clip(dist - 1, 0, 65535),
    )
    token = jnp.where(is_eob, -(1 + ln), token)
    token = jnp.where(errc != 0, -(100 + errc), token)
    d_ref[0] = delta
    t_ref[0] = token


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stage_a_jit(grid, meta, *, interpret: bool = False):
    """grid (L, 64, NT+1) uint8, meta (L, META_W) int32 ->
    (delta, token) (L, 512, NT) int32 in the pallas tile layout."""
    L, WB, NTp = grid.shape
    NT = NTp - 1
    assert WB == 64 and NT % CT == 0
    gc = grid[:, :, :NT]
    gn = grid[:, :, 1 : NT + 1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, NT // CT),
        in_specs=[
            pl.BlockSpec((1, 64, CT), lambda l, t, meta: (l, 0, t)),
            pl.BlockSpec((1, 64, CT), lambda l, t, meta: (l, 0, t)),
        ],
        out_specs=(
            pl.BlockSpec((1, 64, 8, CT), lambda l, t, meta: (l, 0, 0, t)),
            pl.BlockSpec((1, 64, 8, CT), lambda l, t, meta: (l, 0, 0, t)),
        ),
    )
    delta4, token4 = pl.pallas_call(
        _stage_a_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((L, 64, 8, NT), jnp.int32),
            jax.ShapeDtypeStruct((L, 64, 8, NT), jnp.int32),
        ),
        interpret=interpret,
    )(meta, gc, gn)
    # (64, 8, NT) -> (512, NT) is a contiguous merge: row-major order of
    # (q, r) equals bit position 8q + r.
    return delta4.reshape(L, W_P, NT), token4.reshape(L, W_P, NT)


def stage_a_pallas(grid, meta, *, interpret: bool | None = None):
    if interpret is None:
        interpret = _interpret_default()
    return _stage_a_jit(grid, meta, interpret=interpret)


def build_meta(w: dict) -> jnp.ndarray:
    """Pack a wave dict's per-lane tables into the (L, META_W) int32 SMEM
    row consumed by the stage-A kernel (device-side ops on already-staged
    arrays — no extra uploads)."""
    ll_sat = jax.lax.bitcast_convert_type(jnp.asarray(w["ll_sat"]), jnp.int32)
    d_sat = jax.lax.bitcast_convert_type(jnp.asarray(w["d_sat"]), jnp.int32)
    L = ll_sat.shape[0]
    scal = jnp.stack(
        [
            jnp.asarray(w["ll_nlive"]).astype(jnp.int32),
            jnp.asarray(w["d_nlive"]).astype(jnp.int32),
            jnp.asarray(w["dist_empty"]).astype(jnp.int32),
            jnp.asarray(w["payload_bits"]).astype(jnp.int32),
            jnp.asarray(w["ll_eob"]).astype(jnp.int32),
            jnp.asarray(w["ll_init2"]).astype(jnp.int32),
            jnp.asarray(w["ll_init3"]).astype(jnp.int32),
            jnp.zeros(L, jnp.int32),
        ],
        axis=1,
    )  # (L, 8) at MA_LLNLIVE..MA_INIT3+pad
    meta = jnp.concatenate(
        [
            ll_sat,
            jnp.asarray(w["ll_pack"]),
            jnp.asarray(w["ll_pack2"]),
            jnp.asarray(w["ll_pack3"]),
            d_sat,
            jnp.asarray(w["d_pack"]),
            scal,
            jnp.asarray(w["ll_mwords"]),
            jnp.asarray(w["d_perm"]),
        ],
        axis=1,
    )
    assert meta.shape[1] == MA_DPERM + 5
    return jnp.pad(meta, ((0, 0), (0, META_W - meta.shape[1])))


# ---------------------------------------------------------------------------
# Stage B: per-tile transfer functions
# ---------------------------------------------------------------------------


def _stage_b_kernel(d_ref, out_ref):
    """d_ref (1, W, CT) int32 deltas; out_ref (1, E_WIN, CT) int32.

    Cursor e starts at entry offset e; after the walk, out[e] is the exit
    offset into the next tile in [0, 48), or 127 (EOB) / 255 (error),
    matching the uint8 transfer convention of the XLA stage C.
    """
    cur = jax.lax.broadcasted_iota(jnp.int32, (E_WIN, CT), 0)

    def body(s8, cur):
        base = pl.multiple_of(s8 * 8, 8)
        badv = _adv_from_delta(d_ref[0, pl.ds(base, 8), :])
        for k in range(8):
            s = base + k
            cur = cur + jnp.where(cur == s, badv[k, :][None, :], 0)
        return cur

    cur = jax.lax.fori_loop(0, W_P // 8, body, cur)
    out_ref[0] = jnp.where(
        cur >= _ERR_ADV, 255, jnp.where(cur >= _EOB_ADV, 127, jnp.clip(cur - W_P, 0, 255))
    )


# ---------------------------------------------------------------------------
# Stage D + level-1 compaction + stage-E partials, one kernel
# ---------------------------------------------------------------------------

# Summary rows in the (1, 8, CT) summary output block.
ROW_COUNT = 0  # valid tokens in the tile
ROW_EOB_POS = 1  # in-tile bit offset of a reached EOB (or 0)
ROW_EOB_TOK = 2  # token value at the EOB position (-(1+len); 0 if none)
ROW_ERR_TOK = 3  # token value at a reached error position (-(100+code); 0)
ROW_SIZE_SUM = 4  # uncompressed bytes produced by the tile's tokens
ROW_EOB_HIT = 5  # 1 if the chain reached EOB inside this tile
ROW_ERR_HIT = 6  # 1 if the chain reached an error inside this tile
ROW_OVERFLOW = 7  # 1 if the tile had more than K1 tokens


def _cumsum_sublanes(x):
    """Inclusive cumsum along axis 0 (W_P rows) via log-shift adds."""
    n = x.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    sh = 1
    while sh < n:
        shifted = pltpu.roll(x, shift=sh, axis=0)
        x = x + jnp.where(rows >= sh, shifted, 0)
        sh *= 2
    return x


def _stage_dc_kernel(d_ref, t_ref, e_ref, tok_ref, sum_ref, reach_ref):
    """Replay + compact one block of CT tiles.

    d_ref/t_ref (1, W, CT) int32 delta/token tiles; e_ref (1, 8, CT)
    int32 with row 0 = entry offsets (0..47 live, >=127 dead).
    tok_ref (1, K1, CT) int32 compacted tokens (-1 padding; K1 comes
    from the block shape — the wave driver picks it per wave from the
    minimum litlen code length, which statically bounds tokens/tile);
    sum_ref (1, 8, CT) int32 per-tile summary rows (see ROW_*);
    reach_ref (W, CT) int32 VMEM scratch for the reached bitmap.
    """
    k1 = tok_ref.shape[1]
    entry = e_ref[0, 0, :]
    cur0 = jnp.where(entry < E_WIN, entry, 100000)

    def body(s8, cur):
        base = pl.multiple_of(s8 * 8, 8)
        badv = _adv_from_delta(d_ref[0, pl.ds(base, 8), :])
        rows = []
        for k in range(8):
            at = (cur == base + k).astype(jnp.int32)
            rows.append(at)
            cur = cur + at * badv[k, :]
        reach_ref[pl.ds(base, 8), :] = jnp.stack(rows, axis=0)
        return cur

    cur = jax.lax.fori_loop(0, W_P // 8, body, cur0)
    reached = reach_ref[:, :]

    d = d_ref[0]  # (W, CT)
    tok = t_ref[0]
    is_eob = (d == 127).astype(jnp.int32) * reached
    is_err = (d == 255).astype(jnp.int32) * reached
    valid = reached * (d < 127).astype(jnp.int32)

    pos = jax.lax.broadcasted_iota(jnp.int32, (W_P, CT), 0)
    is_lit = (tok >= 0) & (tok < 256)
    size = jnp.where(is_lit, 1, (tok >> 16) & 0x3FF)
    counts = jnp.sum(valid, axis=0)
    summary = jnp.stack(
        [
            counts,  # ROW_COUNT
            jnp.sum(is_eob * pos, axis=0),  # ROW_EOB_POS
            jnp.sum(is_eob * tok, axis=0),  # ROW_EOB_TOK
            jnp.sum(is_err * tok, axis=0),  # ROW_ERR_TOK
            jnp.sum(valid * size, axis=0),  # ROW_SIZE_SUM
            jnp.sum(is_eob, axis=0),  # ROW_EOB_HIT
            jnp.sum(is_err, axis=0),  # ROW_ERR_HIT
            (counts > k1).astype(jnp.int32),  # ROW_OVERFLOW
        ],
        axis=0,
    )
    sum_ref[0] = summary

    # Level-1 compaction: displacement moves (collision-free since
    # disp = pos - rank is non-decreasing over valid positions). The
    # invalid sentinel is INT32_MIN: its AND with any round's bit is 0,
    # so take/self tests need no separate validity check, and stale
    # tokens are never nulled mid-rounds — a slot holds a real token
    # exactly when its disp reaches 0 after the final round.
    INV = jnp.int32(-0x80000000)
    rank = _cumsum_sublanes(valid) - 1
    disp = jnp.where(valid == 1, pos - rank, INV)
    tokv = tok
    sh = 1
    while sh < W_P:
        d_right = pltpu.roll(disp, shift=W_P - sh, axis=0)
        t_right = pltpu.roll(tokv, shift=W_P - sh, axis=0)
        d_right = jnp.where(pos < (W_P - sh), d_right, INV)
        take = (d_right & sh) != 0
        self_mv = (disp & sh) != 0
        disp = jnp.where(take, d_right - sh, jnp.where(self_mv, INV, disp))
        tokv = jnp.where(take, t_right, tokv)
        sh *= 2
    tok_ref[0] = jnp.where(disp[:k1, :] == 0, tokv[:k1, :], -1)


# ---------------------------------------------------------------------------
# Level-2 compaction: whole-lane displacement moves in VMEM
# ---------------------------------------------------------------------------


def _compact_flat_kernel(lit_ref, t_ref, out_ref):
    """Compact one lane's tile-compacted tokens to the front, then map
    literal ranks to bytes in the same VMEM residency.

    t_ref/out_ref (1, R, 128) int32, rows flattening a length M = R*128
    token array in row-major order (-1 padding); lit_ref (1, 8, 128)
    int32 VMEM block of this lane's literal bit planes (row b, col w < 8:
    bit j = bit b of the byte at literal rank 32*w + j). The XLA twin
    (``decode_jax_v2.compact_level2`` + ``apply_lit_map``) round-trips
    HBM on every one of its ~17 move rounds (measured 17 ms on a
    256-lane wave — the single largest stage) and again for the one-hot
    map; here rank cumsum, all move rounds and the rank->byte map stay
    VMEM-resident. Flattened-order shifts by s decompose into a
    lane-axis rotate plus a one-row sublane carry (s < 128) or a pure
    sublane rotate (s % 128 == 0).
    """
    x = t_ref[0]  # (R, 128)
    R = x.shape[0]
    M = R * 128
    INV = jnp.int32(-0x80000000)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    pos = row * 128 + lane

    def read_fwd(arr, s, fill):
        """out[p] = arr[p + s] (fill past the end)."""
        if s % 128 == 0:
            a = pltpu.roll(arr, shift=(R - s // 128) % R, axis=0)
        else:
            a = pltpu.roll(arr, shift=128 - s, axis=1)
            b = pltpu.roll(a, shift=R - 1, axis=0)
            a = jnp.where(lane >= 128 - s, b, a)
        return jnp.where(pos < M - s, a, fill)

    def read_back(arr, s, fill):
        """out[p] = arr[p - s] (fill before the start)."""
        if s % 128 == 0:
            a = pltpu.roll(arr, shift=s // 128, axis=0)
        else:
            a = pltpu.roll(arr, shift=s, axis=1)
            b = pltpu.roll(a, shift=1, axis=0)
            a = jnp.where(lane < s, b, a)
        return jnp.where(pos >= s, a, fill)

    c = (x >= 0).astype(jnp.int32)
    s = 1
    while s < M:
        c = c + read_back(c, s, 0)
        s *= 2
    rank = c - 1
    disp = jnp.where(x >= 0, pos - rank, INV)
    tok = x
    s = 1
    while s < M:
        d_r = read_fwd(disp, s, INV)
        t_r = read_fwd(tok, s, -1)
        take = (d_r & s) != 0
        self_mv = (disp & s) != 0
        disp = jnp.where(take, d_r - s, jnp.where(self_mv, INV, disp))
        tok = jnp.where(take, t_r, tok)
        s *= 2
    tok = jnp.where(disp == 0, tok, -1)
    # Literal rank -> byte (8 bit planes over 8 32-rank words each).
    is_l = (tok >= 0) & (tok < 256)
    r8 = jnp.where(is_l, tok, 0)
    wsel = r8 >> 5
    lo5 = (r8 & 31).astype(jnp.uint32)
    byte = jnp.zeros_like(tok)
    for b in range(8):
        word = jnp.zeros_like(tok)
        for w in range(8):
            word = jnp.where(wsel == w, lit_ref[0, b, w], word)
        byte = byte | (((word.astype(jnp.uint32) >> lo5) & 1) << b).astype(jnp.int32)
    out_ref[0] = jnp.where(is_l, byte, tok)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _compact_flat_jit(
    tok: jnp.ndarray, lit_planes: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """tok (L, M) int32, M % 128 == 0 -> front-compacted, literal ranks
    mapped to bytes. lit_planes (L, 64) int32 from lit_plane_words."""
    L, M = tok.shape
    assert M % 128 == 0
    R = M // 128
    # Planes ride as a per-lane VMEM block (padded to the 128-lane tile).
    lp = jnp.zeros((L, 8, 128), jnp.int32)
    lp = lp.at[:, :, :8].set(lit_planes.reshape(L, 8, 8))
    out = pl.pallas_call(
        _compact_flat_kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, R, 128), jnp.int32),
        interpret=interpret,
    )(lp, tok.reshape(L, R, 128))
    return out.reshape(L, M)


def compact_flat_pallas(
    tok: jnp.ndarray, lit_planes: jnp.ndarray, *, interpret: bool | None = None
) -> jnp.ndarray:
    if interpret is None:
        interpret = _interpret_default()
    return _compact_flat_jit(tok, lit_planes, interpret=interpret)


def _compact_any_kernel(t_ref, out_ref):
    """Front-compact one lane's non-negative entries in VMEM.

    Generic variant of :func:`_compact_flat_kernel` (no literal-rank
    mapping): t_ref/out_ref (1, R, 128) int32 flattening a length
    M = R*128 array row-major, -1 = invalid. Used by the packed token
    pull (literal / match stream split) so the split costs two VMEM
    kernels instead of ~17 HBM-round-trip move rounds each.
    """
    x = t_ref[0]  # (R, 128)
    R = x.shape[0]
    M = R * 128
    INV = jnp.int32(-0x80000000)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    pos = row * 128 + lane

    def read_fwd(arr, s, fill):
        if s % 128 == 0:
            a = pltpu.roll(arr, shift=(R - s // 128) % R, axis=0)
        else:
            a = pltpu.roll(arr, shift=128 - s, axis=1)
            b = pltpu.roll(a, shift=R - 1, axis=0)
            a = jnp.where(lane >= 128 - s, b, a)
        return jnp.where(pos < M - s, a, fill)

    def read_back(arr, s, fill):
        if s % 128 == 0:
            a = pltpu.roll(arr, shift=s // 128, axis=0)
        else:
            a = pltpu.roll(arr, shift=s, axis=1)
            b = pltpu.roll(a, shift=1, axis=0)
            a = jnp.where(lane < s, b, a)
        return jnp.where(pos >= s, a, fill)

    c = (x >= 0).astype(jnp.int32)
    s = 1
    while s < M:
        c = c + read_back(c, s, 0)
        s *= 2
    rank = c - 1
    disp = jnp.where(x >= 0, pos - rank, INV)
    tok = x
    s = 1
    while s < M:
        d_r = read_fwd(disp, s, INV)
        t_r = read_fwd(tok, s, -1)
        take = (d_r & s) != 0
        self_mv = (disp & s) != 0
        disp = jnp.where(take, d_r - s, jnp.where(self_mv, INV, disp))
        tok = jnp.where(take, t_r, tok)
        s *= 2
    out_ref[0] = jnp.where(disp == 0, tok, -1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _compact_any_jit(tok: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    L, M = tok.shape
    assert M % 128 == 0
    R = M // 128
    out = pl.pallas_call(
        _compact_any_kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, R, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, R, 128), jnp.int32),
        interpret=interpret,
    )(tok.reshape(L, R, 128))
    return out.reshape(L, M)


def compact_any_pallas(tok: jnp.ndarray, *, interpret: bool | None = None) -> jnp.ndarray:
    """Front-compact non-negative entries of (L, M) int32, -1 padding."""
    if interpret is None:
        interpret = _interpret_default()
    return _compact_any_jit(tok, interpret=interpret)


# ---------------------------------------------------------------------------
# Host-facing wrappers
# ---------------------------------------------------------------------------

def _interpret_default() -> bool:
    """Pallas interpret mode off only on real TPU-family backends."""
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def stage_b_pallas(delta_t: jnp.ndarray, *, interpret: bool | None = None) -> jnp.ndarray:
    if interpret is None:
        interpret = _interpret_default()
    return _stage_b_jit(delta_t, interpret=interpret)


def stage_dc_pallas(delta_t, token_t, entries, *, k1: int = K1, interpret: bool | None = None):
    if interpret is None:
        interpret = _interpret_default()
    return _stage_dc_jit(delta_t, token_t, entries, k1=k1, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stage_b_jit(delta_t: jnp.ndarray, *, interpret: bool = False) -> jnp.ndarray:
    """delta_t (L, W_P, NT) int32 -> transfers (L, NT, E_WIN) uint8."""
    L, W, NT = delta_t.shape
    assert W == W_P and NT % CT == 0
    out = pl.pallas_call(
        _stage_b_kernel,
        grid=(L, NT // CT),
        in_specs=[
            pl.BlockSpec((1, W_P, CT), lambda l, t: (l, 0, t), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, E_WIN, CT), lambda l, t: (l, 0, t), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, E_WIN, NT), jnp.int32),
        interpret=interpret,
    )(delta_t)
    return out.transpose(0, 2, 1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("k1", "interpret"))
def _stage_dc_jit(
    delta_t: jnp.ndarray,  # (L, W_P, NT) int32
    token_t: jnp.ndarray,  # (L, W_P, NT) int32
    entries: jnp.ndarray,  # (L, NT) int32 (0..47 live, >=127 dead)
    *,
    k1: int = K1,
    interpret: bool = False,
):
    """Returns (tokens_l1 (L, NT, k1) int32, summary (L, 8, NT) int32)."""
    L, W, NT = delta_t.shape
    assert W == W_P and NT % CT == 0
    ent8 = jnp.broadcast_to(entries[:, None, :], (L, 8, NT)).astype(jnp.int32)
    tok, summ = pl.pallas_call(
        _stage_dc_kernel,
        grid=(L, NT // CT),
        in_specs=[
            pl.BlockSpec((1, W_P, CT), lambda l, t: (l, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W_P, CT), lambda l, t: (l, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, CT), lambda l, t: (l, 0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k1, CT), lambda l, t: (l, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, CT), lambda l, t: (l, 0, t), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, k1, NT), jnp.int32),
            jax.ShapeDtypeStruct((L, 8, NT), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((W_P, CT), jnp.int32)],
        interpret=interpret,
    )(delta_t, token_t, ent8)
    return tok.transpose(0, 2, 1), summ


def pallas_available() -> bool:
    """True if the pallas kernels should be used on this backend."""
    import os

    if not _PALLAS_IMPORTED or os.environ.get("TPU_DEFLATE_NO_PALLAS"):
        return False
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return plat in ("tpu", "axon")
