"""Device LZ77 resolve: tokens -> final bytes, on-chip (SURVEY.md §7's
``lz77_resolve`` kernel; ≙ the reference's ring-dictionary copy loop,
``decomp/Open.java:589-617``).

The copy loop is the last serial stage the chip did not own: compacted
tokens (literal byte | match run/dist) had to go to the host C runtime
for expansion. This module keeps them on device, in two kernels:

1. **Expand** (``expand_kernel``): one VMEM kernel per lane turns the
   front-compacted token stream into per-position state — the literal
   byte (resolved immediately) or the match *source position*. Token
   starts come from an in-VMEM exclusive scan of token sizes; records
   move to their start positions with MSB-first displacement moves (the
   collision-free mirror of the compaction moves); covering-token fill
   is a log-shift running max. Sources use a *capped region-mod trick*:
   for p inside a maximal constant-distance match region starting at A,
   the copy semantics ``out[p] = out[p - d]`` iterate analytically to
   ``src(p) = p - d*k`` with ``k = min(floor((p-A)/d) + 1,
   floor(32768/d))`` — RLE runs and periodic copy chains collapse to
   near-constant depth, while every emitted source provably stays
   within 32 KiB of its position (the DEFLATE window bound,
   ``decomp/Open.java:592-593``), which is what lets the resolve sweep
   below use a fixed 34 KiB gather window.
2. **Sweep resolve** (``_sweep_kernel``): one kernel per lane walks the
   64 KiB tile in 32 sequential 2 KiB blocks with the whole (history +
   tile) entry table resident in a VMEM scratch. Sources always point
   backwards, so when block t is processed every earlier position is
   already final; each block runs a short pointer-halving fixpoint
   (typically 1-2 rounds, bounded by log2(2048)+1) whose gather is an
   **int8 one-hot MXU matmul** against a fixed 272-row window — TWO
   7-bit entry planes (entries are constrained block-local, < 0x900;
   far targets ride the loop carry in register form), a sublane-major
   one-hot build (no lane padding), one (2048, 272) x (272, 256) int8
   MXU dot per round, then a 128-way column select. No f32 HIGHEST
   passes, no global pointer-jump rounds, no far-pass fallback, no
   per-round HBM staging, no 3-plane absolute-pointer packing: the
   round-4 design paid the first four (measured 341 ms of a 445 ms
   batch), the first round-5 sweep the last.

A 32 KiB resolved-history **tail** input chains tiles of members larger
than 64 KiB (and block-parallel foreign streams): the format guarantees
no source reaches further back than the previous tile's last 32 KiB
(≙ the 32 KiB ring dictionary, ``decomp/Open.java:64-66,201``).

The expand summary reports a copy-before-start error position and the
sweep reports an unresolved residue; callers (engine decode,
``kernel_only_bench_full``) fall back to host resolve for a lane whose
residue is nonzero rather than consuming its bytes.

Differentially tested against the NumPy reference (`resolve_reference`)
and the C runtime's ``td_resolve_tokens`` on the conformance corpus.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import jax_setup  # noqa: F401

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

N_POS = 65536  # tile output space (profile members are <= 64 KiB; larger members tile)
TOKEN_MATCH_BIT = 1 << 26
W_CAP = 32768  # max emitted back-jump = the DEFLATE window (decomp/Open.java:592)

TAIL_ROWS = 256  # 32 KiB of resolved history rows ahead of the tile
_WIN_ROWS = 272  # sweep gather window: 256 history rows + the block's own 16
_LOCAL_MAX = 13  # fixpoint bound per 2 KiB block (log2(2048) + pending-far + 1)


# ---------------------------------------------------------------------------
# NumPy reference (tests + host fallback semantics)
# ---------------------------------------------------------------------------


def expand_reference(tokens: np.ndarray):
    """Token stream -> (y0, src, is_lit, total) in NumPy.

    tokens: (K,) int32 front-compacted, -1 padding. Literal tokens are
    byte values [0, 256); matches TOKEN_MATCH_BIT | run<<16 | dist-1.
    Returns per-position initial bytes (-1 unresolved), source positions
    (capped region-mod form, matching the device kernel; self at
    literals), literal mask, total output.
    """
    toks = tokens[tokens >= 0].astype(np.int64)
    is_m = (toks & TOKEN_MATCH_BIT) != 0
    runs = np.where(is_m, (toks >> 16) & 0x3FF, 1)
    total = int(runs.sum())
    starts = np.concatenate([[0], np.cumsum(runs)[:-1]]).astype(np.int64)
    tok_of = np.repeat(np.arange(toks.size), runs)
    pos = np.arange(total)
    d = np.where(is_m, (toks & 0xFFFF) + 1, 1)[tok_of]
    lit = ~is_m[tok_of]
    brk = lit | np.concatenate([[True], (d[1:] != d[:-1])]) if total else lit
    A = np.maximum.accumulate(np.where(brk, pos, -1)) if total else pos
    k = np.minimum((pos - A) // d + 1, np.maximum(W_CAP // d, 1))
    src = np.where(lit, pos, pos - k * d)
    y0 = np.where(lit, toks[tok_of] & 0xFF, -1)
    return y0.astype(np.int64), src.astype(np.int64), lit, total


def resolve_reference(tokens: np.ndarray, history: bytes = b"") -> bytes:
    """Serial expansion oracle (matches native td_resolve_tokens).

    ``history`` seeds the dictionary for tile-chained streams; returned
    bytes exclude it.
    """
    out = bytearray(history)
    h = len(history)
    for t in tokens:
        t = int(t)
        if t < 0:
            break
        if not t & TOKEN_MATCH_BIT:
            out.append(t & 0xFF)
            continue
        run = (t >> 16) & 0x3FF
        dist = (t & 0xFFFF) + 1
        if dist > len(out):
            raise ValueError("copy before start")
        for _ in range(run):
            out.append(out[-dist])
    return bytes(out[h:])


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


# ---------------------------------------------------------------------------
# Pallas expand kernel: tokens -> per-position (literal byte | source)
# ---------------------------------------------------------------------------

INT_MIN = -0x80000000


def _expand_kernel(tok_ref, y0_ref, src_ref, sum_ref, *, hist: int):
    """Expand one lane's compacted token stream to per-position state.

    tok_ref (1, 512, 128) int32, row-major token slots (-1 padding);
    y0_ref: literal byte at literal positions, -1 at match positions,
    0 past the stream end (resolved zero — the CRC path needs zeroed
    tails); src_ref: source position at match positions (capped
    region-mod form, tile-local, >= -hist), the position itself
    elsewhere; sum_ref (1, 8, 128): row 0 = first copy-before-start /
    oversized-distance error position (N_POS if none), row 1 = total
    output bytes, row 2 = unresolved (match) position count — each
    replicated across the 128 lanes. ``hist`` is the resolved history
    available before position 0 (0 for a stream start, 32768 for a
    chained tile).
    """
    x = tok_ref[0]  # (512, 128) token slots
    R = x.shape[0]
    M = R * 128
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    pos = row * 128 + lane

    # Empty (padding) lanes skip the ~80 scan/move rounds entirely.
    @pl.when(jnp.logical_not(jnp.any(x >= 0)))
    def _():
        y0_ref[0] = jnp.zeros(x.shape, jnp.int32)
        src_ref[0] = pos
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        sum_ref[0] = jnp.where(rows8 == 0, M, 0)

    @pl.when(jnp.any(x >= 0))
    def _body():
        _expand_body(x, R, M, lane, row, pos, y0_ref, src_ref, sum_ref, hist)


def _expand_body(x, R, M, lane, row, pos, y0_ref, src_ref, sum_ref, hist):
    def read_fwd(arr, s, fill):
        """out[p] = arr[p + s] in flattened row-major order."""
        if s % 128 == 0:
            a = pltpu.roll(arr, shift=(R - s // 128) % R, axis=0)
        else:
            a = pltpu.roll(arr, shift=128 - s, axis=1)
            b = pltpu.roll(a, shift=R - 1, axis=0)
            a = jnp.where(lane >= 128 - s, b, a)
        return jnp.where(pos < M - s, a, fill)

    def read_back(arr, s, fill):
        """out[p] = arr[p - s]."""
        if s % 128 == 0:
            a = pltpu.roll(arr, shift=s // 128, axis=0)
        else:
            a = pltpu.roll(arr, shift=s, axis=1)
            b = pltpu.roll(a, shift=1, axis=0)
            a = jnp.where(lane < s, b, a)
        return jnp.where(pos >= s, a, fill)

    valid = x >= 0
    is_match_tok = x >= 256
    sizes = jnp.where(valid, jnp.where(is_match_tok, (x >> 16) & 0x3FF, 1), 0)
    incl = sizes
    s = 1
    while s < M:
        incl = incl + read_back(incl, s, 0)
        s *= 2
    total = jnp.max(incl)
    starts = incl - sizes

    # MSB-first right displacement moves: slot k's record to position
    # starts[k] (disp non-decreasing; order-preserving, collision-free).
    disp = jnp.where(valid, starts - pos, INT_MIN)
    rec = jnp.where(valid, x, INT_MIN)
    s = 1 << 16
    while s >= 1:
        d_l = read_back(disp, s, INT_MIN)
        r_l = read_back(rec, s, INT_MIN)
        take = (d_l & s) != 0
        self_mv = (disp & s) != 0
        disp = jnp.where(take, d_l - s, jnp.where(self_mv, INT_MIN, disp))
        rec = jnp.where(take, r_l, rec)
        s >>= 1
    rec = jnp.where(disp == 0, rec, INT_MIN)

    in_stream = pos < total
    lit_here = (rec >= 0) & (rec < 256)
    mstart = rec >= 256
    # dist-1 must fit the 15-bit region packing below; a spec-valid
    # DEFLATE distance is <= 32768 (decomp/Open.java:592), so dist-1 >=
    # 0x8000 only arises from corrupt upstream state — flag it into the
    # error summary instead of silently truncating the copy.
    big_dist = mstart & ((rec & 0xFFFF) >= 0x8000)
    # Per-position distance (0 at literal/out-of-stream): fill match
    # records' d over their run via a running max of (pos << 15 | d-1).
    packed = jnp.where(
        mstart, (pos << 15) | (rec & 0x7FFF), jnp.where(rec != INT_MIN, pos << 15, -1)
    )
    s = 1
    while s < M:
        packed = jnp.maximum(packed, read_back(packed, s, -1))
        s *= 2
    match_pos = in_stream & ~lit_here
    cd = jnp.where(match_pos, (packed & 0x7FFF) + 1, 0)

    # Constant-d regions: break where the per-position distance changes
    # (literals have cd=0, so every literal bounds a region).
    brk = (cd != read_back(cd, 1, -1)) | (cd == 0)
    amark = jnp.where(brk, pos, -1)
    s = 1
    while s < M:
        amark = jnp.maximum(amark, read_back(amark, s, -1))
        s *= 2
    A = amark
    i = pos - A
    dd = jnp.maximum(cd, 1)
    ddf = dd.astype(jnp.float32)
    q = (i.astype(jnp.float32) / ddf).astype(jnp.int32)
    r = i - q * dd
    q = jnp.where(r < 0, q - 1, jnp.where(r >= dd, q + 1, q))
    r = jnp.where(r < 0, r + dd, r)
    r = jnp.where(r >= dd, r - dd, r)
    # Full region-mod source (for the error check: does the chain leave
    # the available history?) ...
    src_mod = (A - dd) + r
    # ... and the emitted capped jump: the largest k*dd step that stays
    # within the 32 KiB window, so the sweep's fixed 34 KiB gather
    # window always contains it. p - k*dd is on the same copy chain as
    # src_mod (both congruent to p mod dd, inside [src_mod, p)).
    kd = (jnp.float32(W_CAP) / ddf).astype(jnp.int32)
    kd = jnp.where(kd * dd > W_CAP, kd - 1, kd)
    kd = jnp.where((kd + 1) * dd <= W_CAP, kd + 1, kd)
    k = jnp.maximum(jnp.minimum(q + 1, kd), 1)
    src = jnp.where(match_pos, pos - k * dd, pos)

    err = (match_pos & (src_mod < -hist)) | (in_stream & big_dist)
    err_pos = jnp.min(jnp.where(err, pos, M))
    # Error positions resolve to 0 so an errored lane cannot stall the
    # wave's fixpoint loop; the summary row carries the Reason site.
    y0 = jnp.where(lit_here & in_stream, rec & 0xFF, jnp.where(in_stream & ~err, -1, 0))
    src_ref[0] = jnp.where(err, pos, src)
    y0_ref[0] = y0
    n_unres = jnp.sum((match_pos & ~err).astype(jnp.int32))
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    summ = jnp.where(rows == 0, err_pos, 0)
    summ = jnp.where(rows == 1, total, summ)
    summ = jnp.where(rows == 2, n_unres, summ)
    sum_ref[0] = summ


@functools.partial(jax.jit, static_argnames=("hist", "interpret"))
def _expand_jit(tokens: jnp.ndarray, *, hist: int = 0, interpret: bool = False):
    """tokens (L, N_POS) int32 -> (y0, src, summary)."""
    L, M = tokens.shape
    assert M == N_POS
    y0, src, summ = pl.pallas_call(
        functools.partial(_expand_kernel, hist=hist),
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, 512, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 512, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 512, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, 512, 128), jnp.int32),
            jax.ShapeDtypeStruct((L, 512, 128), jnp.int32),
            jax.ShapeDtypeStruct((L, 8, 128), jnp.int32),
        ),
        interpret=interpret,
    )(tokens.reshape(L, 512, 128))
    return y0.reshape(L, M), src.reshape(L, M), summ[:, :, 0]


def expand_device(tokens, *, hist: int = 0, interpret: bool | None = None):
    """tokens (L, N_POS) int32 -> (y0, src, summary (L, 8))."""
    if interpret is None:
        interpret = _interpret_default()
    return _expand_jit(tokens, hist=hist, interpret=interpret)


# ---------------------------------------------------------------------------
# Sweep resolve kernel: sequential 2 KiB blocks, VMEM-resident state
# ---------------------------------------------------------------------------
#
# Two-plane packed-entry design. Table entries are constrained to
# < 0x900 so the gather needs only TWO int8 planes (the earlier 3-plane
# absolute-pointer form paid a wider dot and plane combine):
#   byte b                (< 0x100)  — resolved position
#   _LOCAL_PTR + offset   (< 0x900)  — block-local source offset, or
#                                      the position's own offset (a
#                                      "pending" marker on far-source
#                                      positions)
# This is sufficient because a pointer entry is only ever gathered by a
# position in the SAME block: when block t runs, everything earlier is
# already final (bytes), and in-block composed targets stay in-block.
# Far targets (≤ 32 KiB behind the block start, by the expand cap)
# live in REGISTER form (the while-loop carry T, absolute coords) and
# always gather an already-committed byte in round 1; a consumer that
# gathers a pending far-source position simply waits at it one round.

_LOCAL_PTR = 0x100  # entry offset marking a block-local pointer


def _sweep_kernel(tail_ref, y0_ref, src_ref, y_ref, st_ref, ent_ref):
    """Resolve one lane's 64 KiB tile against a 32 KiB resolved tail.

    tail_ref (1, 256, 128) int32: resolved history bytes (the previous
    tile's last 32 KiB; zeros at a stream start). y0/src from the
    expand kernel. Outputs: y_ref (1, 512, 128) resolved bytes (0 at
    unresolved residue positions), st_ref (1, 8, 128): row 0 =
    unresolved residue count, row 1 = total gather rounds.
    ent_ref: (768, 128) int32 VMEM scratch — the packed entry table
    ([tail 256 rows | tile 512 rows]), all values < 0x900.

    ≙ decomp/Open.java:589-617 (dictionary copy), with the serial ring
    walk replaced by 32 block steps whose fixpoint gather is one
    (2048, 272) x (272, 256) int8 one-hot MXU dot per round over the
    two entry planes, then a 128-way column select per plane.
    """
    y0 = y0_ref[0]
    src = src_ref[0]
    row512 = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 0)
    lane512 = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 1)
    pos = row512 * 128 + lane512  # tile coords
    inblk = (src >= 0) & ((src >> 11) == (pos >> 11))
    # Table init: byte | _LOCAL_PTR + block-local source | _LOCAL_PTR +
    # self (pending marker for far-source positions — consumers wait one
    # round while the position commits via its own register target).
    ent_ref[pl.ds(0, TAIL_ROWS), :] = tail_ref[0]
    ent_ref[pl.ds(TAIL_ROWS, 512), :] = jnp.where(
        y0 >= 0, y0, _LOCAL_PTR + (jnp.where(inblk, src, pos) & 2047)
    )

    # One-hot row dim lives on SUBLANES (dim 1): 272 is a multiple of 8,
    # so the build compare pays no lane padding (272 on the minor axis
    # would round up to 384 lanes, +41% on the biggest VPU term).
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (16, _WIN_ROWS, 128), 1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (16, 128, 128), 2)

    def block(t, rounds):
        row0 = TAIL_ROWS + 16 * t
        # Absolute register targets (ent-table coords): the original
        # source. Only round 1 can see a far target; every composed
        # target is block-local by construction.
        T0 = src_ref[0, pl.ds(16 * t, 16), :] + TAIL_ROWS * 128

        def cond(carry):
            r, T, active = carry
            return jnp.logical_and(r < _LOCAL_MAX, active)

        def body(carry):
            r, T, _ = carry
            blk = ent_ref[pl.ds(row0, 16), :]
            win = ent_ref[pl.ds(16 * t, _WIN_ROWS), :]  # (272, 128)
            w2 = jnp.concatenate(
                [(win & 127).astype(jnp.int8), (win >> 7).astype(jnp.int8)],
                axis=1,
            )  # (272, 256) — two planes; entries < 0x900
            unres = blk >= _LOCAL_PTR
            a = jnp.where(unres, (T >> 7) - 16 * t, -1)  # window-local row
            c = T & 127
            oh = (iota_a == a[:, None, :]).astype(jnp.int8)  # (16, 272, 128)
            g2 = jax.lax.dot_general(
                oh, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )  # (16, 128, 256)
            ec = g2[:, :, :128] + (g2[:, :, 128:] << 7)
            e = jnp.sum(jnp.where(iota_c == c[:, :, None], ec, 0), axis=2)
            # A gathered byte commits; a gathered pointer (always
            # block-local) composes — the entry update is just e either
            # way, and the register target re-anchors to this block.
            new = jnp.where(unres, e, blk)
            ent_ref[pl.ds(row0, 16), :] = new
            T2 = jnp.where(unres, row0 * 128 + (e - _LOCAL_PTR), T)
            return (r + 1, T2, jnp.any(new >= _LOCAL_PTR))

        active0 = jnp.any(ent_ref[pl.ds(row0, 16), :] >= _LOCAL_PTR)
        r, _T, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), T0, active0))
        return rounds + r

    total_rounds = jax.lax.fori_loop(0, 32, block, jnp.int32(0))

    ent = ent_ref[pl.ds(TAIL_ROWS, 512), :]
    y_ref[0] = jnp.where(ent < _LOCAL_PTR, ent, 0)
    n_unres = jnp.sum((ent >= _LOCAL_PTR).astype(jnp.int32))
    rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    st = jnp.where(rows8 == 0, n_unres, 0)
    st_ref[0] = jnp.where(rows8 == 1, total_rounds, st)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sweep_jit(tail, y0, src, *, interpret: bool = False):
    """tail (L, 32768) int32 bytes, y0/src (L, N_POS) -> (y, status)."""
    L, M = y0.shape
    assert M == N_POS
    y, st = pl.pallas_call(
        _sweep_kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(
                (1, TAIL_ROWS, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 512, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 512, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 512, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda l: (l, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, 512, 128), jnp.int32),
            jax.ShapeDtypeStruct((L, 8, 128), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((TAIL_ROWS + 512, 128), jnp.int32)],
        interpret=interpret,
    )(
        tail.reshape(L, TAIL_ROWS, 128),
        y0.reshape(L, 512, 128),
        src.reshape(L, 512, 128),
    )
    return y.reshape(L, M), st[:, :, 0]


def resolve_tokens_device(tokens, *, tail=None, interpret: bool | None = None):
    """Full device resolve: compacted tokens (L, N) -> final bytes.

    ``tail`` (L, 32768) int32/uint8 resolved history bytes chains tiles
    of members larger than N_POS (None = stream start).

    Returns (y (L, N) int32 bytes, summary (L, 8) [err_pos, total,
    n_match, residue], rounds, unresolved). ``unresolved`` (and the
    per-lane ``summary[:, 3]`` residue) is reported for the caller to
    route those lanes to host resolve — the engine decode does exactly
    that (decode_jax_v2._decode_single_block_device).
    """
    if interpret is None:
        interpret = _interpret_default()
    L = tokens.shape[0]
    hist = 0 if tail is None else TAIL_ROWS * 128
    y0, src, summ = _expand_jit(tokens, hist=hist, interpret=interpret)
    if tail is None:
        tail = jnp.zeros((L, TAIL_ROWS * 128), jnp.int32)
    else:
        tail = jnp.asarray(tail, jnp.int32)
    y, st = _sweep_jit(tail, y0, src, interpret=interpret)
    summ = summ.at[:, 3].set(st[:, 0])
    return y, summ, jnp.max(st[:, 1]), jnp.sum(st[:, 0])


# ---------------------------------------------------------------------------
# Tile chaining for members / streams larger than N_POS
# ---------------------------------------------------------------------------


def split_tokens_tiles(tokens: np.ndarray) -> np.ndarray:
    """Split one member's token stream at N_POS output boundaries.

    tokens: (K,) int32 front-compacted (-1 padding). A match token
    straddling a tile boundary is split in two with the same distance
    (valid: the second half's source still lies within 32 KiB; runs are
    <= 258 < N_POS so a token spans at most two tiles). Returns
    (T, N_POS) int32, -1 padded — tile t covers output bytes
    [t*N_POS, (t+1)*N_POS). Fully vectorized (the engine's big-member
    path runs this per lane). ≙ unbounded streaming with the bounded
    ring dictionary, decomp/Open.java:64-66.
    """
    toks = tokens[tokens >= 0].astype(np.int64)
    is_m = (toks & TOKEN_MATCH_BIT) != 0
    runs = np.where(is_m, (toks >> 16) & 0x3FF, 1)
    ends = np.cumsum(runs)
    total = int(ends[-1]) if toks.size else 0
    T = max(1, -(-total // N_POS))
    out = np.full((T, N_POS), -1, np.int32)
    if not toks.size:
        return out
    starts = ends - runs
    t0 = starts // N_POS
    straddle = ends > (t0 + 1) * N_POS  # always a match (literals are 1 byte)
    cut = (t0 + 1) * N_POS
    dist_m1 = toks & 0xFFFF
    first = np.where(
        straddle, TOKEN_MATCH_BIT | ((cut - starts) << 16) | dist_m1, toks
    )
    # Each tile's sequence = [the (at most one) straddler's second half
    # from the previous tile] ++ [tokens starting in this tile, in order].
    head = np.zeros(T, np.int64) - 1
    head[t0[straddle] + 1] = TOKEN_MATCH_BIT | (
        (ends[straddle] - cut[straddle]) << 16
    ) | dist_m1[straddle]
    has_head = head >= 0
    tile_first_idx = np.searchsorted(t0, np.arange(T))
    rank = np.arange(toks.size) - tile_first_idx[t0]
    out[has_head, 0] = head[has_head]
    out[t0, rank + has_head[t0]] = first
    return out


def resolve_tokens_tiled(tiles, *, interpret: bool | None = None):
    """Resolve (L, T, N_POS) tile-split token streams with chained tails.

    Tiles at index t of every lane resolve in one batched call; each
    step feeds its last 32 KiB forward as the next step's resolved
    history. Returns (y (L, T, N_POS) int32 bytes, summaries
    (L, T, 8), unresolved total).
    """
    if interpret is None:
        interpret = _interpret_default()
    tiles = jnp.asarray(tiles)
    L, T, M = tiles.shape
    assert M == N_POS
    ys, summs = [], []
    unres_total = jnp.zeros((), jnp.int32)
    tail = None
    for t in range(T):
        y, summ, _rounds, unres = resolve_tokens_device(
            tiles[:, t], tail=tail, interpret=interpret
        )
        ys.append(y)
        summs.append(summ)
        unres_total = unres_total + unres
        tail = y[:, M - TAIL_ROWS * 128 :]
    return jnp.stack(ys, axis=1), jnp.stack(summs, axis=1), unres_total


def resolve_big_streams(token_arrays, *, interpret: bool | None = None):
    """Device resolve for arbitrary-size token streams (members beyond
    one 64 KiB tile — continuous members, foreign streams).

    token_arrays: list of (K,) int32 host token streams (front-compacted,
    -1 padded, possibly > N_POS slots). Each splits into N_POS output
    tiles (``split_tokens_tiles``), lanes group by tile count, and tile
    step t of every lane in a group resolves in one batched device call
    with the previous step's last 32 KiB chained as the resolved tail —
    O(1) device memory per lane regardless of stream length
    (≙ the reference's unbounded streaming over a bounded ring
    dictionary, decomp/Open.java:64-66).

    Returns (outs, residues): per stream, the resolved bytes (np.uint8,
    trimmed to the stream's total output) and its unresolved-residue
    count (nonzero => the caller must fall back to host resolve).
    """
    if interpret is None:
        interpret = _interpret_default()
    tiles = [split_tokens_tiles(np.asarray(t, np.int32)) for t in token_arrays]
    totals = []
    for t in token_arrays:
        toks = np.asarray(t, np.int64)
        toks = toks[toks >= 0]
        is_m = (toks & TOKEN_MATCH_BIT) != 0
        totals.append(int(np.where(is_m, (toks >> 16) & 0x3FF, 1).sum()))
    outs: list = [None] * len(tiles)
    resid = np.zeros(len(tiles), np.int64)
    bygroup: dict[int, list[int]] = {}
    for i, tl in enumerate(tiles):
        bygroup.setdefault(tl.shape[0], []).append(i)
    for T, idxs in sorted(bygroup.items()):
        batch = jnp.asarray(np.stack([tiles[i] for i in idxs], axis=0))
        ys, summs, _unres = resolve_tokens_tiled(batch, interpret=interpret)
        ys = np.asarray(ys, np.uint8).reshape(len(idxs), T * N_POS)
        summs = np.asarray(summs)
        for j, i in enumerate(idxs):
            outs[i] = ys[j, : totals[i]]
            # Unresolved residue OR a flagged copy-before-start: either
            # way the caller must re-run the lane through host resolve
            # (which raises the exact reference Reason in stream order).
            resid[i] = int(summs[j, :, 3].sum()) + int(
                (summs[j, :, 0] < N_POS).sum()
            )
    return outs, resid


@functools.partial(jax.jit, static_argnames=("T",))
def split_tiles_device(tokens: jnp.ndarray, T: int) -> jnp.ndarray:
    """(L, K) device token streams -> (L, T, N_POS) tile-split, ON DEVICE.

    The device analog of ``split_tokens_tiles`` for the full-device
    big-member pipeline: per tile, tokens starting in the tile keep
    their order via one 2-operand ``lax.sort`` (key = stream index;
    the straddling match's second half sorts first with key 0), with
    run caps applied arithmetically. A token spans at most two tiles
    (runs <= 258 < N_POS).
    """
    L, K = tokens.shape
    valid = tokens >= 0
    is_m = valid & ((tokens & TOKEN_MATCH_BIT) != 0)
    runs = jnp.where(valid, jnp.where(is_m, (tokens >> 16) & 0x3FF, 1), 0)
    ends = jnp.cumsum(runs, axis=1)
    starts = ends - runs
    t0 = starts // N_POS
    idx = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :], (L, K))
    dist_m1 = tokens & 0xFFFF
    tiles = []
    for t in range(T):
        cut = (t + 1) * N_POS
        start_in = valid & (t0 == t)
        run1 = jnp.minimum(ends, cut) - starts
        val_first = jnp.where(
            is_m, TOKEN_MATCH_BIT | (run1 << 16) | dist_m1, tokens
        )
        head_in = is_m & (t0 == t - 1) & (ends > t * N_POS)
        run2 = ends - t * N_POS
        val = jnp.where(
            start_in,
            val_first,
            jnp.where(head_in, TOKEN_MATCH_BIT | (run2 << 16) | dist_m1, -1),
        )
        key = jnp.where(start_in, idx + 1, jnp.where(head_in, 0, K + 2))
        _k, sval = jax.lax.sort((key, val), dimension=1, num_keys=1)
        if K >= N_POS:
            sval = sval[:, :N_POS]
        else:
            sval = jnp.pad(sval, ((0, 0), (0, N_POS - K)), constant_values=-1)
        tiles.append(sval)
    return jnp.stack(tiles, axis=1)
