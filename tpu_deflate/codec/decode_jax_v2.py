"""Gather-free TPU decoder (v2): every hot op is matmul / elementwise /
scan — the op classes this backend (and any TPU) runs at full speed.

Motivation (measured, see ARCHITECTURE.md): XLA dynamic gather/scatter/
sort on the axon backend run orders of magnitude below bandwidth. v2
eliminates them entirely:

- **Stage A** (one fused jit): 32-bit windows at every bit position
  (elementwise expansion); litlen/dist LUT lookups for all positions as
  *MXU one-hot bilinear forms* — ``lut[idx] == oh_hi(idx) @ T @
  oh_lo(idx)'`` with the 4096-entry table reshaped (64, 64), so a lookup
  is a (N,64)x(64,64) matmul plus an elementwise masked reduce; the
  follow-position window (``w2``) and successor pointers use *banded
  selects* (symbol groups advance 1..42 bits, so a 42-way shifted-select
  replaces the gather).
- **Stage B** (``lax.scan``, elementwise body): per-tile transfer
  functions. Payload is cut into 512-bit tiles; chains enter a tile only
  in its first 42 bits. 42 cursors per tile advance in lock step over
  the tile's bit positions (a cursor at position s jumps by delta[s]);
  after W+42 steps every cursor has exited (offset into the next tile)
  or hit the EOB/error sentinels.
- **Stage C** (associative scan over tiles): transfer functions compose
  with a 44-way select — the true entry offset of every tile, and the
  stream's terminal state (clean EOB / error / truncation).
- **Stage D** (``lax.scan``): one cursor per tile replays the true chain,
  emitting the reached-position bitmap; token info (computed in stage A
  for every position) is masked to reached positions and *compacted
  without scatter* by log-shift displacement moves (displacement = rank
  deficit is non-decreasing, so power-of-two shifts never collide).
- **Resolve**: compacted tokens (tiny) go to the native C runtime's
  ``td_resolve_tokens`` (LZ77 expansion is memcpy-bound host work), or a
  NumPy fallback.

Differentially tested against the host state machine; emits the same
(tokens, counts, errors) contract as v1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import jax_setup  # noqa: F401
from ..format.errors import Reason, reason_to_code
from .decode_jax import DEV_LUT_BITS, _run_base_extra, _dist_base_extra

W_TILE = 512  # bits per tile
ENTRY_WIN = 42  # max bits one symbol group consumes -> tile entry window
SENT_EOB = 1 << 20
SENT_ERR = 1 << 21

V2_LANE_BATCH = 256  # per-batch overhead (host parse, uploads) amortizes
V2_L_BUCKETS = (4, 16, 64, V2_LANE_BATCH)

_ERR_END = reason_to_code(Reason.UNEXPECTED_END_OF_STREAM)

TOKEN_MATCH_BIT = 1 << 26


def _bilinear_lookup(tbl: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """tbl (L, 64, 64) f32 (flat 4096-entry per-lane table), idx (L, N)
    int32 in [0, 4096) -> (L, N) int32 values (exact for values < 2^24)."""
    hi = idx >> 6
    lo = idx & 63
    oh_hi = (jax.lax.broadcasted_iota(jnp.int32, idx.shape + (64,), idx.ndim) == hi[..., None]).astype(jnp.float32)
    rows = jax.lax.dot_general(
        oh_hi,
        tbl,
        (((2,), (1,)), ((0,), (0,))),
        # TPU default f32 matmul runs as a truncated-bf16 pass (measured
        # maxerr 128 on 16-bit table values); HIGHEST is exact.
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (L, N, 64)
    oh_lo = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (64,), idx.ndim) == lo[..., None]
    return jnp.sum(jnp.where(oh_lo, rows, 0.0), axis=-1).astype(jnp.int32)


def _shift_left(arr: jnp.ndarray, d: int, fill) -> jnp.ndarray:
    """arr[:, p] -> arr[:, p+d] with fill on the right (axis 1)."""
    L = arr.shape[0]
    pad = jnp.full((L, d), fill, dtype=arr.dtype)
    return jnp.concatenate([arr[:, d:], pad], axis=1)


def _banded_pick(arr: jnp.ndarray, delta: jnp.ndarray, max_d: int, fill) -> jnp.ndarray:
    """out[:, p] = arr[:, p + delta[:, p]] for delta in [1, max_d]
    (elementwise banded gather via shifted selects)."""
    out = jnp.full_like(arr, fill)
    for d in range(1, max_d + 1):
        out = jnp.where(delta == d, _shift_left(arr, d, fill), out)
    return out


@jax.jit
def stage_a(
    payload: jnp.ndarray,  # (L, P) uint8, body starts inside byte 0
    payload_bits: jnp.ndarray,  # (L,) int32
    litlen_tbl: jnp.ndarray,  # (L, 64, 64) f32: packed len<<9|sym
    dist_tbl: jnp.ndarray,  # (L, 64, 64) f32
    dist_empty: jnp.ndarray,  # (L,) bool
):
    """Per-bit-position speculative decode: returns (delta, token, sizes).

    delta (L,B) int32: bits consumed by the symbol group starting at each
    position (1..42), or SENT_EOB / SENT_ERR.
    token (L,B) int32: literal byte, or TOKEN_MATCH_BIT|run<<16|(dist-1).
    """
    L, P = payload.shape
    B = P * 8
    mask12 = (1 << DEV_LUT_BITS) - 1

    ext = jnp.concatenate([payload, jnp.zeros((L, 4), jnp.uint8)], axis=1).astype(jnp.uint32)
    u32 = ext[:, :P] | (ext[:, 1:P+1] << 8) | (ext[:, 2:P+2] << 16) | (ext[:, 3:P+3] << 24)
    wbits = (u32[:, :, None] >> jnp.arange(8, dtype=jnp.uint32)[None, None, :]).reshape(L, B)

    e1 = _bilinear_lookup(litlen_tbl, (wbits & mask12).astype(jnp.int32))
    sym = e1 & 511
    ln = e1 >> 9
    is_lit = sym < 256
    is_eob = sym == 256
    is_match = sym > 256
    run_base, run_bits = _run_base_extra(sym)
    run = run_base + ((wbits >> ln.astype(jnp.uint32)).astype(jnp.int32) & ((1 << run_bits) - 1))
    d1 = ln + jnp.where(is_match, run_bits, 0)  # 1..17

    # Follow-window via banded select (d1 in [1,17]).
    w2 = _banded_pick(wbits.astype(jnp.int32), d1, 17, 0).astype(jnp.uint32)
    e2 = _bilinear_lookup(dist_tbl, (w2 & mask12).astype(jnp.int32))
    dsym = e2 & 511
    dln = e2 >> 9
    dist_base, dist_bits = _dist_base_extra(dsym)
    dist = dist_base + ((w2 >> dln.astype(jnp.uint32)).astype(jnp.int32) & ((1 << dist_bits) - 1))
    delta = jnp.where(is_match, d1 + dln + dist_bits, d1)

    pos = jnp.arange(B, dtype=jnp.int32)[None, :]
    bad = is_match & ((sym > 285) | (dsym > 29) | dist_empty[:, None])
    overrun = pos + delta > payload_bits[:, None]  # raw consumption, incl. EOB bits
    delta = jnp.where(is_eob, SENT_EOB, delta)
    delta = jnp.where(bad | overrun, SENT_ERR, delta)

    token = jnp.where(
        is_lit,
        sym,
        TOKEN_MATCH_BIT | (jnp.clip(run, 3, 258) << 16) | jnp.clip(dist - 1, 0, 65535),
    )
    token = jnp.where(is_eob, -1, token)
    sizes = jnp.where(is_lit, 1, jnp.where(is_match, jnp.clip(run, 3, 258), 0))
    return delta, token, sizes


@jax.jit
def stage_b_transfers(delta_tiles: jnp.ndarray):
    """delta_tiles (L, NT, W) int32 -> transfers (L, NT, 42) int32.

    transfer[e] = exit offset into the next tile in [0,42), or SENT_EOB /
    SENT_ERR. 42 cursors advance in lock-step over the W tile bit
    positions; a cursor that jumps past W-1 freezes (steps only fire for
    s < W), so its final value - W is the entry offset of the next tile.
    """
    L, NT, W = delta_tiles.shape
    xs = jnp.moveaxis(delta_tiles, 2, 0)  # (W, L, NT)

    init = jnp.broadcast_to(
        jnp.arange(ENTRY_WIN, dtype=jnp.int32)[None, None, :], (L, NT, ENTRY_WIN)
    ).astype(jnp.int32)

    def step(cur, d_s):
        d, s = d_s
        at = cur == s
        adv = jnp.where(at, d[:, :, None], 0)
        return cur + adv, None

    svals = jnp.arange(W, dtype=jnp.int32)
    cur, _ = jax.lax.scan(step, init, (xs, svals))
    out = cur - W_TILE
    out = jnp.where(cur >= SENT_ERR, SENT_ERR, jnp.where(cur >= SENT_EOB, SENT_EOB, out))
    return out


@jax.jit
def stage_c_entries(transfers: jnp.ndarray, entry0: jnp.ndarray):
    """Compose transfers over tiles; entry offset of every tile + final state.

    transfers (L, NT, 42); entry0 (L,) in [0,42). Returns entries (L, NT)
    (value in [0,42) or sentinel) and final state (L,).
    """
    L, NT, E = transfers.shape

    def compose(a, b):
        # c[e] = a[e] terminal ? a[e] : b[a[e]]
        out = jnp.full_like(a, SENT_ERR)
        for j in range(E):
            out = jnp.where(a == j, b[..., j : j + 1], out)
        out = jnp.where(a >= SENT_EOB, a, out)
        return out

    prefix = jax.lax.associative_scan(compose, transfers, axis=1)  # inclusive
    # entry[t] = prefix[t-1] applied to entry0; entry[0] = entry0.
    applied = jnp.full((L, NT), SENT_ERR, dtype=jnp.int32)
    for j in range(E):
        applied = jnp.where(entry0[:, None] == j, prefix[:, :, j], applied)
    entries = jnp.concatenate([entry0[:, None], applied[:, :-1]], axis=1)
    final = applied[:, -1]
    return entries, final


@jax.jit
def stage_d_reached(delta_tiles: jnp.ndarray, entries: jnp.ndarray):
    """Replay the true chain: one cursor per tile -> reached bitmap.

    delta_tiles (L, NT, W); entries (L, NT). Returns reached
    (L, NT, W) bool over in-tile bit offsets.
    """
    L, NT, W = delta_tiles.shape
    xs = jnp.moveaxis(delta_tiles, 2, 0)
    svals = jnp.arange(W, dtype=jnp.int32)
    cur0 = jnp.where(entries < ENTRY_WIN, entries, SENT_ERR + SENT_EOB)

    def step(cur, d_s):
        d, s = d_s
        at = cur == s
        cur = cur + jnp.where(at, d, 0)
        return cur, at

    _, reached = jax.lax.scan(step, cur0, (xs, svals))
    return jnp.moveaxis(reached, 0, 2)


@functools.partial(jax.jit, static_argnames=("t_cap",))
def compact_tokens(token: jnp.ndarray, sizes: jnp.ndarray, reached: jnp.ndarray, t_cap: int):
    """Gather/scatter-free stream compaction of reached tokens.

    token/sizes (L, B); reached (L, B) bool (EOB excluded via token=-1).
    Returns (tokens (L, t_cap) int32, sizes (L, t_cap) int32, counts (L,)).

    Displacement D[p] = p - rank(p) is non-decreasing over valid items, so
    moving every item left by the set bits of its displacement (low bit to
    high bit, one shifted select per bit) is collision-free.
    """
    L, B = token.shape
    valid = reached & (token >= 0)
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    pos = jnp.arange(B, dtype=jnp.int32)[None, :]
    disp = jnp.where(valid, pos - rank, -1)
    tok = jnp.where(valid, token, -1)
    sz = jnp.where(valid, sizes, 0)
    nbits = int(np.ceil(np.log2(B)))
    for k in range(nbits):
        s = 1 << k
        d_right = _shift_left(disp, s, -1)
        t_right = _shift_left(tok, s, -1)
        z_right = _shift_left(sz, s, 0)
        take = (d_right >= 0) & ((d_right & s) != 0)
        self_moves = (disp >= 0) & ((disp & s) != 0)
        disp = jnp.where(take, d_right - s, jnp.where(self_moves, -1, disp))
        tok = jnp.where(take, t_right, jnp.where(self_moves, -1, tok))
        sz = jnp.where(take, z_right, jnp.where(self_moves, 0, sz))
    counts = jnp.sum(valid, axis=1)
    return tok[:, :t_cap], sz[:, :t_cap], counts


def _resolve_tokens_numpy(tokens: np.ndarray, count: int) -> bytes:
    """Fallback token expansion (native C is the fast path)."""
    out = bytearray()
    for k in range(count):
        t = int(tokens[k])
        if not t & TOKEN_MATCH_BIT:
            out.append(t & 0xFF)
            continue
        run = (t >> 16) & 0x3FF
        dist = (t & 0xFFFF) + 1
        if dist > len(out):
            raise _df(Reason.COPY_FROM_BEFORE_DICTIONARY_START)
        for _ in range(run):
            out.append(out[-dist])
    return bytes(out)


def _df(reason):
    from ..format.errors import DataFormatError

    return DataFormatError(reason, reason.name)


def gzip_decompress_tpu_v2(data: bytes, *, verify_crc: bool = True) -> bytes:
    """Member-parallel decode through the gather-free device pipeline."""
    import io

    from ..format.errors import DataFormatError
    from ..kernels.checksum import crc32 as crc32_host
    from . import decode_jax as dj

    buf = np.frombuffer(data, dtype=np.uint8)
    members = dj.split_members(buf)
    if not members:
        from ..streams.gzip_stream import GzipReader

        return GzipReader(io.BytesIO(data), multi_member=True).read()

    try:
        from .. import native as _native

        have_native = _native.available()
    except Exception:
        have_native = False

    out_parts: list[bytes | None] = [None] * len(members)
    huff: list[tuple[int, dj.MemberIndex]] = []
    for i, m in enumerate(members):
        btype = (int(buf[m.payload_start]) >> 1) & 3 if m.payload_start < buf.size else 0
        if btype == 0:
            out_parts[i] = dj._decode_stored_member(buf, m, verify_crc=verify_crc).tobytes()
        else:
            huff.append((i, m))

    for base in range(0, len(huff), V2_LANE_BATCH):
        batch = huff[base : base + V2_LANE_BATCH]
        results = _decode_batch_v2(buf, [m for _, m in batch], have_native, verify_crc)
        for (i, _), r in zip(batch, results):
            out_parts[i] = r
    return b"".join(p for p in out_parts if p is not None)


def _decode_batch_v2(buf, batch, have_native, verify_crc):
    from ..format.errors import DataFormatError
    from ..kernels.checksum import crc32 as crc32_host
    from . import decode_jax as dj

    L_real = len(batch)
    L = dj._bucket(L_real, V2_L_BUCKETS)
    pay_lens = np.zeros(L, dtype=np.int64)
    pay_lens[:L_real] = [m.end - 8 - m.payload_start for m in batch]
    if pay_lens.max() > dj.PAYLOAD_PAD:
        return dj._host_fallback(buf, batch)
    P = dj._bucket(int(pay_lens.max()), dj._P_BUCKETS)
    payload = np.zeros((L, P), dtype=np.uint8)
    for i, m in enumerate(batch):
        payload[i, : pay_lens[i]] = buf[m.payload_start : m.end - 8]
    for i in range(L_real, L):
        payload[i, : len(dj._PAD_PAYLOAD)] = np.frombuffer(dj._PAD_PAYLOAD, np.uint8)
        pay_lens[i] = len(dj._PAD_PAYLOAD)
    payload_bits = pay_lens * 8

    hp = dj.parse_headers_batch(payload, payload_bits)
    if not hp.bfinal.all():
        return dj._host_fallback(buf, batch)
    if hp.litlen_lengths.max() > DEV_LUT_BITS or hp.dist_lengths.max() > DEV_LUT_BITS:
        return dj._host_fallback(buf, batch)

    litlen_lut = dj.build_luts_batch(hp.litlen_lengths)
    dist_lut = dj.build_luts_batch(hp.dist_lengths)

    # Byte-shift each row so the block body starts inside byte 0.
    shift = (hp.body_bitpos // 8).astype(np.int64)
    start_rem = (hp.body_bitpos % 8).astype(np.int32)
    shifted = np.zeros_like(payload)
    for i in range(L):
        s = int(shift[i])
        shifted[i, : P - s] = payload[i, s:]
    body_bits = (payload_bits - shift * 8).astype(np.int32)

    tokens, counts, final = decode_tokens_v2(
        shifted, start_rem, body_bits, litlen_lut, dist_lut, hp.dist_empty
    )

    results = []
    for i, m in enumerate(batch):
        if int(final[i]) != SENT_EOB:
            raise _df(Reason.UNEXPECTED_END_OF_STREAM)
        ntok = int(counts[i])
        if have_native:
            from .. import native as _native
            from ..format.errors import OutputCapacityError

            try:
                out = _native.resolve_tokens(tokens[i, :ntok], m.isize + 1)
            except OutputCapacityError:
                # overflowed the trailer-declared size; DataFormatError
                # (e.g. COPY_FROM_BEFORE_DICTIONARY_START) propagates
                raise _df(Reason.DECOMPRESSED_SIZE_MISMATCH)
        else:
            out = _resolve_tokens_numpy(tokens[i], ntok)
        if len(out) != m.isize:
            raise _df(Reason.DECOMPRESSED_SIZE_MISMATCH)
        if verify_crc:
            try:
                from .. import native as _native

                got = _native.crc32(out)
            except Exception:
                got = crc32_host(out)
            if got != m.crc32:
                raise _df(Reason.DECOMPRESSED_CHECKSUM_MISMATCH)
        results.append(out)
    return results


def decode_tokens_v2(payload_np, start_rem, payload_bits, litlen_lut, dist_lut, dist_empty):
    """Host driver for phase 1 v2. payload rows must be byte-shifted so the
    block body begins in byte 0 (bit offset start_rem).

    Returns (tokens (L,T) np.int32, counts (L,), final_state (L,)) where
    final_state is SENT_EOB for clean streams.
    """
    L, P = payload_np.shape
    assert P * 8 % W_TILE == 0
    lt = jnp.asarray(litlen_lut.reshape(L, 64, 64).astype(np.float32))
    dt = jnp.asarray(dist_lut.reshape(L, 64, 64).astype(np.float32))
    delta, token, sizes = stage_a(
        jnp.asarray(payload_np),
        jnp.asarray(payload_bits.astype(np.int32)),
        lt,
        dt,
        jnp.asarray(dist_empty),
    )
    B = P * 8
    NT = B // W_TILE
    delta_tiles = delta.reshape(L, NT, W_TILE)
    transfers = stage_b_transfers(delta_tiles)
    entries, final = stage_c_entries(transfers, jnp.asarray(start_rem.astype(np.int32)))
    reached_t = stage_d_reached(delta_tiles, entries)
    reached = reached_t.reshape(L, B)
    tokens, sizes_c, counts = compact_tokens(token, sizes, reached, 65537)
    # Pull counts first (tiny); then only the token columns actually used —
    # the device->host link is the scarce resource on tunneled backends.
    counts_h = np.asarray(counts)
    final_h = np.asarray(final)
    kmax = int(counts_h.max()) if counts_h.size else 0
    bucket = 4096
    k = min(65537, -(-max(kmax, 1) // bucket) * bucket)
    tokens_h = np.asarray(tokens[:, :k])
    return tokens_h, counts_h, final_h
