"""Device LZ77 resolve: tokens -> final bytes, on-chip (SURVEY.md §7's
``lz77_resolve`` kernel; ≙ the reference's ring-dictionary copy loop,
``decomp/Open.java:589-617``).

The copy loop is the last serial stage the chip did not own: compacted
tokens (literal byte | match run/dist) had to go to the host C runtime
for expansion. This module keeps them on device:

1. **Expand** (``expand_kernel``): one VMEM kernel per lane turns the
   front-compacted token stream into per-position state — the literal
   byte (resolved immediately) or the match *source position*. Token
   starts come from an in-VMEM exclusive scan of token sizes; records
   move to their start positions with MSB-first displacement moves (the
   collision-free mirror of the compaction moves); covering-token fill
   is a log-shift running max. Sources use a *region-level mod trick*:
   for p inside a maximal constant-distance match region starting at A,
   ``src(p) = (A - d) + ((p - A) mod d)`` — every position of an RLE run
   or a pure periodic copy chain then sources directly from the d bytes
   before the region, collapsing what would be an O(run/d)-deep chain.
2. **Resolve rounds** (``gather_kernel``): value iteration
   ``y[p] <- y[src(p)] where resolved(src(p))``. The gather is the MXU
   one-hot trick at VMEM residency: requests one-hot over the table's
   row axis (512 rows x 128 lanes = the 64 KiB member space), one
   int8 x int8 -> int32 matmul against the byte table, a 128-way masked
   column select — no dynamic gather instruction anywhere (measured 67ms
   per 4M-element XLA gather on this backend). A second tiny matmul
   gathers the resolved bitmask (bytes, N/8 table). Chunks whose
   positions are all resolved skip their matmul.
3. The driver iterates rounds until the unresolved count stops moving
   (host-free ``lax.while_loop``), then reports the residue; a nonzero
   residue (pathological chain depth) falls back to host resolve.

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

N_POS = 65536  # member output space (profile members are <= 64 KiB)
TOKEN_MATCH_BIT = 1 << 26
GCHUNK = 16  # gather kernel: sublane rows per request block (16*128 = 2048)


# ---------------------------------------------------------------------------
# NumPy reference (tests + host fallback semantics)
# ---------------------------------------------------------------------------


def expand_reference(tokens: np.ndarray):
    """Token stream -> (y0, src, is_lit, total) in NumPy.

    tokens: (K,) int32 front-compacted, -1 padding. Literal tokens are
    byte values [0, 256); matches TOKEN_MATCH_BIT | run<<16 | dist-1.
    Returns per-position initial bytes (-1 unresolved), source positions
    (region-mod form; self at literals), literal mask, total output.
    """
    toks = tokens[tokens >= 0].astype(np.int64)
    is_m = (toks & TOKEN_MATCH_BIT) != 0
    runs = np.where(is_m, (toks >> 16) & 0x3FF, 1)
    total = int(runs.sum())
    starts = np.concatenate([[0], np.cumsum(runs)[:-1]]).astype(np.int64)
    tok_of = np.repeat(np.arange(toks.size), runs)
    pos = np.arange(total)
    seg = starts[tok_of]
    d = np.where(is_m, (toks & 0xFFFF) + 1, 1)[tok_of]
    lit = ~is_m[tok_of]
    brk = lit | np.concatenate([[True], (d[1:] != d[:-1])]) if total else lit
    A = np.maximum.accumulate(np.where(brk, pos, -1)) if total else pos
    src = np.where(lit, pos, (A - d) + ((pos - A) % d))
    y0 = np.where(lit, toks[tok_of] & 0xFF, -1)
    return y0.astype(np.int64), src.astype(np.int64), lit, total


def resolve_reference(tokens: np.ndarray) -> bytes:
    """Serial expansion oracle (matches native td_resolve_tokens)."""
    out = bytearray()
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
    return bytes(out)


# ---------------------------------------------------------------------------
# Pallas gather kernel: y[idx] + resolved[idx] via MXU one-hot
# ---------------------------------------------------------------------------


def _oh_gather(idx_2d, a_bits: int, tbl):
    """Batched one-hot gather core: idx (R, 128) int32 row indices in
    [0, 2**a_bits) x column [0, 128); tbl (2**a_bits, 128) int8.
    Returns tbl[idx >> 7, idx & 127] + 128 as (R, 128) int32. 3-D
    batched layout throughout — no trailing-1 shapes (Mosaic pads a
    minor dim of 1 to the 128-lane tile, 128x the HBM footprint)."""
    R = idx_2d.shape[0]
    A = 1 << a_bits
    a = idx_2d >> 7
    c = idx_2d & 127
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (R, 128, A), 2)
    oh_a = (iota_a == a[:, :, None]).astype(jnp.int8)
    r = jax.lax.dot_general(
        oh_a, tbl, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # (R, 128, 128)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (R, 128, 128), 2)
    return jnp.sum(jnp.where(iota_c == c[:, :, None], r, 0), axis=2) + 128


def _gather_kernel(tbl_ref, res_ref, idx_ref, out_ref):
    """One (lane, request-chunk) block of the MXU one-hot gather.

    tbl_ref (1, 512, 128) int8: lane's byte table biased by -128;
    position p lives at [p >> 7, p & 127].
    res_ref (1, 64, 128) int8: resolved bitmask bytes biased by -128;
    the byte covering p is bit (p & 7) of [(p>>3) >> 7, (p>>3) & 127].
    idx_ref (1, GCHUNK, 128) int32: request positions, -1 inactive.
    out_ref (1, GCHUNK, 128) int32: byte | resolved << 8 (-1 inactive).
    """
    idx = idx_ref[0]  # (GCHUNK, 128)
    active = idx >= 0

    @pl.when(jnp.any(active))
    def _():
        m = jnp.where(active, idx, 0)
        byte = _oh_gather(m, 9, tbl_ref[0])
        rbyte = _oh_gather(m >> 3, 6, res_ref[0])
        rbit = (rbyte >> (m & 7)) & 1
        out_ref[0] = jnp.where(active, byte | (rbit << 8), -1)

    @pl.when(jnp.logical_not(jnp.any(active)))
    def _():
        out_ref[0] = jnp.full((GCHUNK, 128), -1, jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_jit(tbl8, res8, idx, *, interpret: bool = False):
    """tbl8 (L, 512, 128) int8; res8 (L, 64, 128) int8; idx (L, M) int32
    -> (L, M) int32 byte | resolved<<8 (or -1)."""
    L, M = idx.shape
    B = GCHUNK * 128
    assert M % B == 0
    out = pl.pallas_call(
        _gather_kernel,
        grid=(L, M // B),
        in_specs=[
            pl.BlockSpec((1, 512, 128), lambda l, t: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64, 128), lambda l, t: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GCHUNK, 128), lambda l, t: (l, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, GCHUNK, 128), lambda l, t: (l, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, M // 128, 128), jnp.int32),
        interpret=interpret,
    )(tbl8, res8, idx.reshape(L, M // 128, 128))
    return out.reshape(L, M)


def _interpret_default() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


# ---------------------------------------------------------------------------
# Pallas expand kernel: tokens -> per-position (literal byte | source)
# ---------------------------------------------------------------------------

INT_MIN = -0x80000000


def _expand_kernel(tok_ref, y0_ref, src_ref, sum_ref):
    """Expand one lane's compacted token stream to per-position state.

    tok_ref (1, 512, 128) int32, row-major token slots (-1 padding);
    y0_ref: literal byte at literal positions, -1 at match positions,
    0 past the stream end (resolved zero — the CRC path needs zeroed
    tails); src_ref: source position at match positions (region-mod
    form), the position itself elsewhere; sum_ref (1, 8, 128): row 0 =
    first copy-before-start error position (N_POS if none), row 1 =
    total output bytes, row 2 = unresolved (match) position count —
    each replicated across the 128 lanes.

    The region-mod source: for p inside a maximal run of consecutive
    positions covered by matches of one distance d starting at A,
    ``src(p) = (A - d) + ((p - A) mod d)`` — the copy semantics
    ``out[p] = out[p - d]`` iterated analytically until it leaves the
    region (≙ overlapping-copy wraparound, ``comp/Lz77Huffman.java:76-78``
    / ``decomp/Open.java:589-617``), so chain depth is counted in
    regions, not bytes.
    """
    x = tok_ref[0]  # (512, 128) token slots
    R = x.shape[0]
    M = R * 128
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    pos = row * 128 + lane

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
    # Per-position distance (0 at literal/out-of-stream): fill match
    # records' d over their run via a running max of (pos << 15 | d-1).
    mstart = rec >= 256
    packed = jnp.where(
        mstart, (pos << 15) | (rec & 0x7FFF), jnp.where(rec != INT_MIN, pos << 15, -1)
    )
    s = 1
    while s < M:
        packed = jnp.maximum(packed, read_back(packed, s, -1))
        s *= 2
    seg = packed >> 15
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
    q = (i.astype(jnp.float32) / dd.astype(jnp.float32)).astype(jnp.int32)
    r = i - q * dd
    r = jnp.where(r < 0, r + dd, r)
    r = jnp.where(r >= dd, r - dd, r)
    src = jnp.where(match_pos, (A - dd) + r, pos)

    err = match_pos & (src < 0)
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


@functools.partial(jax.jit, static_argnames=("interpret",))
def _expand_jit(tokens: jnp.ndarray, *, interpret: bool = False):
    """tokens (L, N_POS) int32 -> (y0, src, summary)."""
    L, M = tokens.shape
    assert M == N_POS
    y0, src, summ = pl.pallas_call(
        _expand_kernel,
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


def expand_device(tokens, *, interpret: bool | None = None):
    """tokens (L, N_POS) int32 -> (y0, src, summary (L, 8))."""
    if interpret is None:
        interpret = _interpret_default()
    return _expand_jit(tokens, interpret=interpret)


# ---------------------------------------------------------------------------
# Pallas jump kernel: src[idx] (16-bit) + resolved[idx] via MXU one-hot
# ---------------------------------------------------------------------------


def _jump_kernel(lo_ref, hi_ref, res_ref, idx_ref, out_ref):
    """Pointer-jumping gather: src[idx] | resolved(idx) << 16.

    lo_ref/hi_ref (1, 512, 128) int8: low/high bytes of the 16-bit src
    table, biased -128; res_ref (1, 64, 128) int8 resolved bitmask
    bytes; idx_ref/out_ref (1, GCHUNK, 128) int32 (-1 inactive).
    """
    idx = idx_ref[0]
    active = idx >= 0

    @pl.when(jnp.any(active))
    def _():
        m = jnp.where(active, idx, 0)
        lo = _oh_gather(m, 9, lo_ref[0])
        hi = _oh_gather(m, 9, hi_ref[0])
        rbyte = _oh_gather(m >> 3, 6, res_ref[0])
        rbit = (rbyte >> (m & 7)) & 1
        out_ref[0] = jnp.where(active, lo | (hi << 8) | (rbit << 16), -1)

    @pl.when(jnp.logical_not(jnp.any(active)))
    def _():
        out_ref[0] = jnp.full((GCHUNK, 128), -1, jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _jump_jit(lo8, hi8, res8, idx, *, interpret: bool = False):
    L, M = idx.shape
    B = GCHUNK * 128
    assert M % B == 0
    out = pl.pallas_call(
        _jump_kernel,
        grid=(L, M // B),
        in_specs=[
            pl.BlockSpec((1, 512, 128), lambda l, t: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 512, 128), lambda l, t: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64, 128), lambda l, t: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GCHUNK, 128), lambda l, t: (l, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, GCHUNK, 128), lambda l, t: (l, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, M // 128, 128), jnp.int32),
        interpret=interpret,
    )(lo8, hi8, res8, idx.reshape(L, M // 128, 128))
    return out.reshape(L, M)


# ---------------------------------------------------------------------------
# Resolve driver: pointer jumping to fixpoint (device-side while_loop)
# ---------------------------------------------------------------------------


def _res_bytes8(res, L, N):
    rbytes = jnp.sum(
        res.reshape(L, N // 8, 8) << jnp.arange(8, dtype=jnp.int32)[None, None, :],
        axis=2,
    )
    return (rbytes.reshape(L, 64, 128) - 128).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("max_rounds", "interpret"))
def resolve_iterate(y0, src, *, max_rounds: int = 18, interpret: bool = False):
    """Resolve by pointer jumping, then one final byte gather.

    ``src`` is strictly decreasing along every chain (acyclic), so
    ``src <- src[src]`` (frozen once src lands on a resolved position)
    reaches a fixpoint in <= ceil(log2 depth) <= 17 rounds; chunks whose
    requests are all frozen skip their matmuls, so late rounds cost only
    the stragglers. One value gather then reads every final byte.
    Returns (y (L, N) int32 bytes, rounds, unresolved).
    """
    L, N = y0.shape
    res = (y0 >= 0).astype(jnp.int32)
    y_init = jnp.where(y0 >= 0, y0, 0)
    res8 = _res_bytes8(res, L, N)
    unres = res == 0

    def cond(carry):
        src, srcres, n_prev, n, it = carry
        # No progress test: a round can shorten chains without freezing
        # any, but src is strictly decreasing along chains, so the
        # fixpoint arrives within ceil(log2 depth) + 1 <= 18 rounds.
        return (n > 0) & (it < max_rounds)

    def body(carry):
        src, srcres, n_prev, n, it = carry
        idx = jnp.where(unres & (srcres == 0), src, -1)
        lo8 = ((src & 0xFF).reshape(L, 512, 128) - 128).astype(jnp.int8)
        hi8 = ((src >> 8).reshape(L, 512, 128) - 128).astype(jnp.int8)
        g = _jump_jit(lo8, hi8, res8, idx, interpret=interpret)
        hit = g >= 0
        srcres = jnp.where(hit & ((g >> 16) == 1), 1, srcres)
        src = jnp.where(hit & ((g >> 16) == 0), g & 0xFFFF, src)
        n_new = jnp.sum(unres & (srcres == 0))
        return (src, srcres, n, n_new, it + 1)

    # srcres starts unknown (0); the first round both tests and jumps.
    n0 = jnp.sum(unres)
    src, srcres, _, n, it = jax.lax.while_loop(
        cond, body, (src, jnp.zeros_like(res), n0 + 1, n0, jnp.int32(0))
    )
    # Final byte gather at the (now resolved) sources.
    tbl8 = (y_init.reshape(L, 512, 128) - 128).astype(jnp.int8)
    idx = jnp.where(unres, src, -1)
    g = _gather_jit(tbl8, res8, idx, interpret=interpret)
    y = jnp.where(unres & (g >= 0), g & 0xFF, y_init)
    return y, it, n


def resolve_tokens_device(tokens, *, interpret: bool | None = None):
    """Full device resolve: compacted tokens (L, N) -> final bytes.

    Returns (y (L, N) int32 bytes, summary (L, 8) [err_pos, total,
    n_match], rounds, unresolved).
    """
    if interpret is None:
        interpret = _interpret_default()
    y0, src, summ = _expand_jit(tokens, interpret=interpret)
    y, rounds, unresolved = resolve_iterate(y0, src, interpret=interpret)
    return y, summ, rounds, unresolved


def gather_bytes_resolved(y, res_bits, idx, *, interpret: bool | None = None):
    """y (L, N) int32 bytes; res_bits (L, N) int32 0/1; idx (L, M) int32
    positions (-1 inactive) -> (L, M) int32 byte | resolved<<8 / -1."""
    if interpret is None:
        interpret = _interpret_default()
    L, N = y.shape
    assert N == N_POS
    tbl8 = (y.reshape(L, 512, 128) - 128).astype(jnp.int8)
    rbytes = jnp.sum(
        res_bits.reshape(L, N // 8, 8) << jnp.arange(8, dtype=jnp.int32)[None, None, :],
        axis=2,
    )
    res8 = (rbytes.reshape(L, 64, 128) - 128).astype(jnp.int8)
    return _gather_jit(tbl8, res8, idx, interpret=interpret)
