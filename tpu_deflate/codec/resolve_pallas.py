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

    # Empty (padding) lanes skip the ~80 scan/move rounds entirely.
    @pl.when(jnp.logical_not(jnp.any(x >= 0)))
    def _():
        y0_ref[0] = jnp.zeros(x.shape, jnp.int32)
        src_ref[0] = pos
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        sum_ref[0] = jnp.where(rows8 == 0, M, 0)

    @pl.when(jnp.any(x >= 0))
    def _body():
        _expand_body(x, R, M, lane, row, pos, y0_ref, src_ref, sum_ref)


def _expand_body(x, R, M, lane, row, pos, y0_ref, src_ref, sum_ref):
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
# Step kernels: one f32-packed gather per pointer-jump round
# ---------------------------------------------------------------------------
#
# Per-round state at every position q is packed into ONE f32 table entry
# (exact: < 2^18, well inside f32's 24-bit integer range):
# resolved(q) ? 0x20000 + y(q) : src(q). A round then
# needs a single one-hot MXU gather at q = src(p): if resolved(q), p
# commits value y(q) and becomes resolved itself (the resolved set GROWS
# round over round, so chains retire from the front while jumping doubles
# from the back); otherwise src(p) <- src(q). Construction + compare
# volume is the measured cost (the VPU runs near peak), so the common
# case uses a NEAR kernel whose table window is the 4 16-row blocks at
# and before the request block (sources within ~6 KiB — the bulk of
# DEFLATE distances and of early jump compositions, 8x less compare
# volume); requests pointing further return a FAR sentinel and re-run
# through the full-table kernel (chunk-skipped; rare in practice).

_FAR = -2
_NROWS = 16  # request block rows (2048 requests) = one 16-row table block
_NWIN = 8  # near window: this + previous 7 table blocks (~14 KiB; 16 measured slower, 4 more far passes)


_RESV = 0x20000  # packed-entry offset marking a resolved position's byte


def _step_gather(win, ws_pos, m, active):
    """Gather packed entries for requests m from window ``win`` (W, 128)
    f32 whose row 0 is global table row ws_pos/128. Returns int32
    packed entries, -1 where inactive/out-of-window."""
    W = win.shape[0]
    R = m.shape[0]
    a = (m >> 7) - (ws_pos >> 7)
    c = m & 127
    in_win = active & (a >= 0) & (a < W)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (R, 128, W), 2)
    oh = jnp.where(iota_a == a[:, :, None], jnp.float32(1), jnp.float32(0))
    # Precision.HIGHEST: TPU f32 matmuls default to bf16 passes, which
    # would truncate the packed integer entries to ~8 mantissa bits.
    r = jax.lax.dot_general(
        oh,
        win,
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (R, 128, 128)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (R, 128, 128), 2)
    sel = jnp.sum(jnp.where(iota_c == c[:, :, None], r, 0.0), axis=2)
    return jnp.where(in_win, sel.astype(jnp.int32), -1)


def _near_kernel(idx_ref, *refs):
    (*t_refs, out_ref) = refs
    """Near-window step: requests (1, 16, 128); window = the contiguous
    4 table blocks starting at max(t-3, 0) — covers [window_start,
    window_start + 8192) which always contains [t*2048 - 6144, block
    end). Far requests -> _FAR."""
    t = pl.program_id(1)
    idx = idx_ref[0]
    active = idx >= 0

    @pl.when(jnp.any(active))
    def _():
        win = jnp.concatenate([t[0] for t in t_refs], axis=0)
        m = jnp.where(active, idx, 0)
        ws = jnp.maximum(t - (_NWIN - 1), 0) * (_NROWS * 128)
        g = _step_gather(win, ws, m, active)
        out_ref[0] = jnp.where(active, jnp.where(g >= 0, g, _FAR), -1)

    @pl.when(jnp.logical_not(jnp.any(active)))
    def _():
        out_ref[0] = jnp.full(idx.shape, -1, jnp.int32)


def _far_kernel(tbl_ref, idx_ref, out_ref):
    """Full-table step for requests outside the near window."""
    idx = idx_ref[0]
    active = idx >= 0

    @pl.when(jnp.any(active))
    def _():
        m = jnp.where(active, idx, 0)
        out_ref[0] = _step_gather(tbl_ref[0], 0, m, active)

    @pl.when(jnp.logical_not(jnp.any(active)))
    def _():
        out_ref[0] = jnp.full(idx.shape, -1, jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _near_jit(tblf, idx, *, interpret: bool = False):
    L, M = idx.shape
    NB = M // (_NROWS * 128)

    def tmap(k):
        # contiguous window: blocks [max(t-3,0)+k for k in 0..3]
        return lambda l, t: (l, jnp.maximum(t - (_NWIN - 1), 0) + k, 0)

    out = pl.pallas_call(
        _near_kernel,
        grid=(L, NB),
        in_specs=[
            pl.BlockSpec((1, _NROWS, 128), lambda l, t: (l, t, 0), memory_space=pltpu.VMEM),
            *[
                pl.BlockSpec((1, _NROWS, 128), tmap(k), memory_space=pltpu.VMEM)
                for k in range(_NWIN)
            ],
        ],
        out_specs=pl.BlockSpec(
            (1, _NROWS, 128), lambda l, t: (l, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, M // 128, 128), jnp.int32),
        interpret=interpret,
    )(idx.reshape(L, M // 128, 128), *([tblf] * _NWIN))
    return out.reshape(L, M)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _far_jit(tblf, idx, *, interpret: bool = False):
    L, M = idx.shape
    B = GCHUNK * 128
    out = pl.pallas_call(
        _far_kernel,
        grid=(L, M // B),
        in_specs=[
            pl.BlockSpec((1, 512, 128), lambda l, t: (l, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GCHUNK, 128), lambda l, t: (l, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, GCHUNK, 128), lambda l, t: (l, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, M // 128, 128), jnp.int32),
        interpret=interpret,
    )(tblf, idx.reshape(L, M // 128, 128))
    return out.reshape(L, M)


# ---------------------------------------------------------------------------
# Resolve driver: growing-front pointer jumping (device-side while_loop)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_rounds", "interpret"))
def resolve_iterate(y0, src, *, max_rounds: int = 20, interpret: bool = False):
    """Resolve by pointer jumping with a growing resolved front.

    y0/src (L, N) from :func:`expand_device`. Each round gathers the
    packed (src | y<<16 | resolved<<24) table at every unresolved
    position's current source: a resolved source commits its byte (and
    the position joins the resolved set other chains gather from); an
    unresolved one contributes its own source (jump doubling). ``src``
    is strictly decreasing along chains, so <= ceil(log2 depth)+1
    rounds converge. Returns (y, rounds, unresolved).
    """
    L, N = y0.shape
    res = (y0 >= 0).astype(jnp.int32)
    y = jnp.where(y0 >= 0, y0, 0)

    def cond(carry):
        y, res, src, n, it = carry
        return (n > 0) & (it < max_rounds)

    def body(carry):
        y, res, src, n, it = carry
        tblf = (
            jnp.where(res == 1, _RESV + y, src).astype(jnp.float32).reshape(L, 512, 128)
        )
        idx = jnp.where(res == 0, src, -1)
        g = _near_jit(tblf, idx, interpret=interpret)
        far_idx = jnp.where(g == _FAR, idx, -1)
        g = jax.lax.cond(
            jnp.any(far_idx >= 0),
            lambda: jnp.where(
                g == _FAR, _far_jit(tblf, far_idx, interpret=interpret), g
            ),
            lambda: jnp.where(g == _FAR, -1, g),
        )
        hit = g >= 0
        commit = hit & (g >= _RESV)
        y = jnp.where(commit, g - _RESV, y)
        res = jnp.where(commit, 1, res)
        src = jnp.where(hit & (g < _RESV), g, src)
        n_new = jnp.sum(1 - res)
        return (y, res, src, n_new, it + 1)

    n0 = jnp.sum(1 - res)
    y, res, src, n, it = jax.lax.while_loop(cond, body, (y, res, src, n0, jnp.int32(0)))
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
