"""TPU member-parallel gzip/DEFLATE decoder.

The reference decoder is a single bit-cursor state machine
(``decomp/Open.java:83-110``) — inherently serial. This path breaks the
serial dependency with the format's own seams (SURVEY.md §2.1):

- Input is a standard multi-member gzip stream whose members carry a
  bgzf-style FEXTRA subfield ('T','D': compressed member size), written by
  our TPU encoder. Member boundaries are then O(members) to find without
  decoding; each member is an independent decode lane. Foreign streams
  fall back to the host decoder transparently.
- **Phase H (host, vectorized)**: lock-step batched parse of every
  member's DEFLATE block header across lanes (NumPy state machine decoding
  one code-length symbol per lane per step), then batched 12-bit LUT
  construction for all lanes at once.
- **Phase 1 (device)**: *bit-parallel speculative decode*. A DEFLATE
  block is bit-serial only through its cursor; instead of walking it, the
  kernel decodes one complete litlen[+extra][+dist[+extra]] group starting
  at EVERY bit position of the payload simultaneously (one batched LUT
  gather per table — no loops), producing a successor pointer
  ``next[b]``; the true symbol sequence is exactly the orbit of the block
  body's start bit under ``next``, recovered with O(log bits) rounds of
  pointer doubling. Speculative work is ~20x the real symbol count, but
  it is all dense VPU/bandwidth work, which the TPU trades profitably
  against any serial loop (measured ~200us per loop iteration on this
  backend vs milliseconds for whole-array passes).
- **Phase 2 (device)**: LZ77 resolution as data-parallel pointer doubling:
  token runs expand to per-byte source pointers (scatter + cumulative max)
  and log2(out) rounds of ``ptr = ptr[ptr]`` converge every byte to its
  originating literal — the two-phase scheme of Massively-Parallel Lossless
  Data Decompression (PAPERS.md), recast for the VPU.

Error taxonomy: device lanes report int32 reason codes (reserved symbols,
copy-before-start, overrun) which the host converts to DataFormatError;
trailer CRC/ISIZE are verified per member (native/host CRC — decoded
bytes materialize on the host at resolve time, so that is where the
checksum is cheapest; the device CRC kernels serve the encode path).
"""

from __future__ import annotations

import io
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..kernels import jax_setup  # noqa: F401  (compilation cache)
import numpy as np

from ..format.errors import DataFormatError, Reason, reason_to_code
from ..format.tables import (
    CLEN_ORDER,
    DIST_BASE,
    DIST_EXTRA,
    FIXED_DIST_LENGTHS,
    FIXED_LITLEN_LENGTHS,
    LENGTH_BASE,
    LENGTH_EXTRA,
)
from ..kernels import checksum as ck
from ..kernels.huffman import canonical_codes, validate_code_lengths

DEV_LUT_BITS = 12  # device profile: all litlen/dist code lengths <= 12
MEMBER_DATA = 64 * 1024  # uncompressed bytes per member in the TPU profile
LANE_BATCH = 64  # lanes per dispatch (bit-parallel arrays are ~8x payload)

TD_SUBFIELD = b"TD"

_ERR_END = reason_to_code(Reason.UNEXPECTED_END_OF_STREAM)
_ERR_RESERVED_LEN = reason_to_code(Reason.RESERVED_LENGTH_SYMBOL)
_ERR_RESERVED_DIST = reason_to_code(Reason.RESERVED_DISTANCE_SYMBOL)
_ERR_BEFORE_START = reason_to_code(Reason.COPY_FROM_BEFORE_DICTIONARY_START)


# ---------------------------------------------------------------------------
# Member splitting (host)
# ---------------------------------------------------------------------------


@dataclass
class MemberIndex:
    """Offsets of one gzip member within a stream."""

    start: int  # offset of the gzip header
    payload_start: int  # offset of the DEFLATE payload
    end: int  # offset one past the trailer
    isize: int  # uncompressed size (trailer, mod 2^32)
    crc32: int  # expected CRC (trailer)


def split_members(gz: np.ndarray) -> list[MemberIndex] | None:
    """Walk a multi-member stream via the TD FEXTRA subfields.

    Returns None if any member lacks the subfield (caller falls back to the
    host decoder). Headers here are the fixed 10 bytes + FEXTRA only (the
    profile our encoder writes).
    """
    members = []
    pos = 0
    n = gz.size
    buf = gz
    while pos < n:
        if pos + 10 > n or buf[pos] != 0x1F or buf[pos + 1] != 0x8B:
            return None
        flags = int(buf[pos + 3])
        if not flags & 0x04:  # no FEXTRA
            return None
        p = pos + 10
        if p + 2 > n:
            return None
        xlen = int(buf[p]) | int(buf[p + 1]) << 8
        extra = buf[p + 2 : p + 2 + xlen]
        p += 2 + xlen
        # scan subfields for 'TD'
        member_len = None
        q = 0
        while q + 4 <= xlen:
            sid = bytes(extra[q : q + 2])
            slen = int(extra[q + 2]) | int(extra[q + 3]) << 8
            if sid == TD_SUBFIELD and slen == 4:
                member_len = int.from_bytes(bytes(extra[q + 4 : q + 8]), "little")
            q += 4 + slen
        if member_len is None:
            return None
        # skip optional name/comment/hcrc fields per flags
        if flags & 0x08:  # FNAME
            while p < n and buf[p] != 0:
                p += 1
            p += 1
        if flags & 0x10:  # FCOMMENT
            while p < n and buf[p] != 0:
                p += 1
            p += 1
        if flags & 0x02:  # FHCRC
            p += 2
        end = pos + member_len
        if end > n or end - 8 < p:
            return None
        isize = int.from_bytes(bytes(buf[end - 4 : end]), "little")
        crc = int.from_bytes(bytes(buf[end - 8 : end - 4]), "little")
        members.append(MemberIndex(pos, p, end, isize, crc))
        pos = end
    return members


# ---------------------------------------------------------------------------
# Phase H: batched header parse (host, NumPy lock-step)
# ---------------------------------------------------------------------------


def _u32_view(payload: np.ndarray) -> np.ndarray:
    """(L, P) uint8 -> (L, P) uint32 little-endian 4-byte windows."""
    L, P = payload.shape
    ext = np.concatenate([payload, np.zeros((L, 4), dtype=np.uint8)], axis=1).astype(
        np.uint32
    )
    return ext[:, :P] | (ext[:, 1 : P + 1] << 8) | (ext[:, 2 : P + 2] << 16) | (
        ext[:, 3 : P + 3] << 24
    )


def _peek(u32v: np.ndarray, bitpos: np.ndarray) -> np.ndarray:
    """>=25 valid bits at each lane's bit position."""
    lanes = np.arange(u32v.shape[0])
    byte = np.minimum(bitpos >> 3, u32v.shape[1] - 1)
    return u32v[lanes, byte] >> (bitpos & 7).astype(np.uint32)


@dataclass
class HeaderParse:
    litlen_lengths: np.ndarray  # (L, 288)
    dist_lengths: np.ndarray  # (L, 32) padded, with reference dist semantics
    dist_empty: np.ndarray  # (L,) bool: empty distance code
    body_bitpos: np.ndarray  # (L,) first bit of block body
    btype: np.ndarray  # (L,) 1=fixed, 2=dynamic (0=stored handled earlier)
    bfinal: np.ndarray  # (L,) bool


def parse_headers_batch(
    payload: np.ndarray, payload_bits: np.ndarray, start_bits: np.ndarray | None = None
) -> HeaderParse:
    """Parse one fixed/dynamic block header per lane, fully vectorized.

    ``start_bits`` (per-lane, in [0, 8)) locates the 3-bit block header
    inside byte 0 — the v2 block-chain driver byte-shifts each lane so a
    mid-stream block header lands there. Raises DataFormatError (first
    failing lane wins, in lane order) with the reference's taxonomy.
    """
    L = payload.shape[0]
    u32v = _u32_view(payload)
    if start_bits is None:
        bitpos = np.zeros(L, dtype=np.int64)
    else:
        bitpos = np.asarray(start_bits, dtype=np.int64).copy()
    errs = np.zeros(L, dtype=np.int32)

    w = _peek(u32v, bitpos)
    bfinal = (w & 1).astype(bool)
    btype = ((w >> 1) & 3).astype(np.int32)
    bitpos += 3
    if (btype == 3).any():
        lane = int(np.nonzero(btype == 3)[0][0])
        raise DataFormatError(Reason.RESERVED_BLOCK_TYPE, f"Reserved block type (member {lane})")
    dyn = btype == 2

    litlen = np.tile(FIXED_LITLEN_LENGTHS, (L, 1)).astype(np.int32)
    dist = np.tile(FIXED_DIST_LENGTHS, (L, 1)).astype(np.int32)
    dist_empty = np.zeros(L, dtype=bool)

    if dyn.any():
        d_idx = np.nonzero(dyn)[0]
        dl = _parse_dynamic_headers(u32v[d_idx], bitpos[d_idx], payload_bits[d_idx])
        litlen[d_idx] = dl["litlen"]
        dist[d_idx] = dl["dist"]
        dist_empty[d_idx] = dl["dist_empty"]
        bitpos[d_idx] = dl["bitpos"]
    return HeaderParse(litlen, dist, dist_empty, bitpos, btype, bfinal)


def _parse_dynamic_headers(u32v, bitpos, payload_bits):
    """Vectorized dynamic header parse for the selected lanes."""
    L = u32v.shape[0]
    w = _peek(u32v, bitpos)
    hlit = (w & 31).astype(np.int64) + 257
    hdist = ((w >> 5) & 31).astype(np.int64) + 1
    hclen = ((w >> 10) & 15).astype(np.int64) + 4
    bitpos = bitpos + 14

    # Code-length-code lengths: up to 19 3-bit fields, transmitted in
    # CLEN_ORDER. Read all 19 positions lock-step with masking.
    clen_lengths = np.zeros((L, 19), dtype=np.int64)
    for i in range(19):
        active = i < hclen
        w = _peek(u32v, bitpos)
        val = (w & 7).astype(np.int64)
        clen_lengths[active, CLEN_ORDER[i]] = val[active]
        bitpos = bitpos + np.where(active, 3, 0)

    # Validate clen codes per lane, then build all 7-bit LUTs batched.
    for l in range(L):
        validate_code_lengths(clen_lengths[l])
    clen_lut = build_luts_batch(clen_lengths, lut_bits=7)
    clen_lut_sym = (clen_lut & 511).astype(np.int64)
    clen_lut_len = (clen_lut >> 9).astype(np.int64)

    # Lock-step decode of the code-length symbol stream. Each step decodes
    # one clen symbol per active lane and records (value, count); the run
    # expansion happens afterwards with one vectorized np.repeat.
    total = hlit + hdist
    max_steps = int(total.max()) if L else 0
    vals = np.zeros((L, max_steps), dtype=np.int64)
    counts = np.zeros((L, max_steps), dtype=np.int64)
    produced = np.zeros(L, dtype=np.int64)
    prev_val = np.full(L, -1, dtype=np.int64)
    lanes = np.arange(L)
    step = 0
    while True:
        active = produced < total
        if not active.any():
            break
        if step >= max_steps:
            break
        w = _peek(u32v, bitpos)
        sym = clen_lut_sym[lanes, w & 127]
        ln = clen_lut_len[lanes, w & 127]
        consumed = ln.copy()
        # EOF check: needing bits past the payload
        over = active & (bitpos + consumed > payload_bits)
        if over.any():
            raise DataFormatError.unexpected_end()
        is_lit = sym < 16
        is_16, is_17, is_18 = sym == 16, sym == 17, sym == 18
        w2 = w >> ln
        run = np.where(is_16, 3 + (w2 & 3), 0)
        run = np.where(is_17, 3 + (w2 & 7), run)
        run = np.where(is_18, 11 + (w2 & 127), run)
        consumed = consumed + np.where(is_16, 2, 0) + np.where(is_17, 3, 0) + np.where(is_18, 7, 0)
        # Reference order: symbol 16 checks for a previous length *before*
        # reading its 2 extra bits (decomp/Open.java:360), so NO_PREVIOUS
        # precedes the extra-bits EOF check.
        no_prev = active & is_16 & (prev_val < 0)
        if no_prev.any():
            raise DataFormatError(
                Reason.NO_PREVIOUS_CODE_LENGTH_TO_COPY, "No code length value to copy"
            )
        over = active & (bitpos + consumed > payload_bits)
        if over.any():
            raise DataFormatError.unexpected_end()
        val = np.where(is_lit, sym, np.where(is_16, prev_val, 0))
        cnt = np.where(is_lit, 1, run)
        overflow = active & (produced + cnt > total)
        if overflow.any():
            raise DataFormatError(
                Reason.CODE_LENGTH_CODE_OVER_FULL, "Run exceeds number of codes"
            )
        vals[active, step] = val[active]
        counts[active, step] = cnt[active]
        produced = produced + np.where(active, cnt, 0)
        prev_val = np.where(active & (is_lit | is_17 | is_18), np.where(is_lit, sym, 0), prev_val)
        prev_val = np.where(active & is_16, prev_val, prev_val)
        bitpos = bitpos + np.where(active, consumed, 0)
        step += 1

    # Expand runs: lane-major repeat, then slice per lane.
    flat_vals = vals.ravel()
    flat_counts = counts.ravel()
    expanded = np.repeat(flat_vals, flat_counts)
    lane_totals = counts.sum(axis=1)
    assert (lane_totals == total).all()
    starts = np.concatenate([[0], np.cumsum(lane_totals)[:-1]])

    litlen = np.zeros((L, 288), dtype=np.int32)
    dist = np.zeros((L, 32), dtype=np.int32)
    dist_empty = np.zeros(L, dtype=bool)
    for l in range(L):
        code_lens = expanded[starts[l] : starts[l] + lane_totals[l]]
        ll = code_lens[: hlit[l]]
        dd = code_lens[hlit[l] :]
        if ll[256] == 0:
            raise DataFormatError(
                Reason.END_OF_BLOCK_CODE_ZERO_LENGTH,
                "End-of-block symbol has zero code length",
            )
        full_ll = np.zeros(288, dtype=np.int64)
        full_ll[: ll.size] = ll
        validate_code_lengths(full_ll)
        litlen[l] = full_ll
        if dd.size == 1 and dd[0] == 0:
            dist_empty[l] = True
            continue
        one = int((dd == 1).sum())
        other = int((dd > 1).sum())
        full_dd = np.zeros(32, dtype=np.int64)
        full_dd[: dd.size] = dd
        if one == 1 and other == 0:
            full_dd[31] = 1  # reference's dummy completion (Open.java:421-425)
        validate_code_lengths(full_dd)
        dist[l] = full_dd
    return {
        "litlen": litlen,
        "dist": dist,
        "dist_empty": dist_empty,
        "bitpos": bitpos,
    }


# ---------------------------------------------------------------------------
# Batched LUT build (host, vectorized across lanes)
# ---------------------------------------------------------------------------


def build_luts_batch(lengths: np.ndarray, lut_bits: int = DEV_LUT_BITS) -> np.ndarray:
    """(L, N) code lengths -> (L, 2^lut_bits) int32 packed (len<<9 | sym).

    All lanes must have max length <= lut_bits (the device profile). Fill
    is vectorized by code length: for each l, every (lane, symbol) pair of
    that length broadcasts its 2^(lut_bits-l) table entries at once.
    """
    L, N = lengths.shape
    assert lengths.max(initial=0) <= lut_bits
    # Batched canonical code assignment.
    counts = np.zeros((L, lut_bits + 2), dtype=np.int64)
    for l in range(1, lut_bits + 1):
        counts[:, l] = (lengths == l).sum(axis=1)
    next_code = np.zeros((L, lut_bits + 2), dtype=np.int64)
    code = np.zeros(L, dtype=np.int64)
    for l in range(1, lut_bits + 1):
        code = (code + counts[:, l - 1]) << 1
        next_code[:, l] = code
    # rank within (lane, length) class by symbol order
    order = np.argsort(lengths + 1000 * np.arange(L)[:, None] * 0, axis=1, kind="stable")
    # simpler: per lane stable argsort by length
    ranks = np.zeros((L, N), dtype=np.int64)
    sorted_lens = np.take_along_axis(lengths, order, axis=1)
    group_first = np.zeros((L, lut_bits + 2), dtype=np.int64)
    for l in range(lut_bits + 2):
        group_first[:, l] = np.argmax(sorted_lens >= l, axis=1)
    pos_in_sorted = np.empty((L, N), dtype=np.int64)
    np.put_along_axis(pos_in_sorted, order, np.arange(N)[None, :].repeat(L, 0), axis=1)
    ranks = pos_in_sorted - np.take_along_axis(
        group_first, lengths.astype(np.int64), axis=1
    )
    codes = np.take_along_axis(next_code, lengths.astype(np.int64), axis=1) + ranks
    # bit-reverse codes within their length
    rev = np.zeros((L, N), dtype=np.int64)
    c = codes.copy()
    for _ in range(lut_bits):
        rev = (rev << 1) | (c & 1)
        c >>= 1
    rev = rev >> (lut_bits - np.maximum(lengths, 1))

    lut = np.zeros((L, 1 << lut_bits), dtype=np.int32)
    lane_idx, sym_idx = np.nonzero(lengths > 0)
    lens_nz = lengths[lane_idx, sym_idx]
    revs_nz = rev[lane_idx, sym_idx]
    for l in range(1, lut_bits + 1):
        sel = lens_nz == l
        if not sel.any():
            continue
        reps = 1 << (lut_bits - l)
        entry = (l << 9) | sym_idx[sel]
        idx = revs_nz[sel][:, None] + (np.arange(reps)[None, :] << l)
        lut[lane_idx[sel][:, None], idx] = entry[:, None].astype(np.int32)
    return lut


# ---------------------------------------------------------------------------
# Phase 1: device token decode
# ---------------------------------------------------------------------------

_LEN_BASE = jnp.asarray(np.concatenate([LENGTH_BASE, [0, 0, 0]]).astype(np.int32))
_LEN_EXTRA = jnp.asarray(np.concatenate([LENGTH_EXTRA, [0, 0, 0]]).astype(np.int32))
_DIST_BASE = jnp.asarray(np.concatenate([DIST_BASE, [1, 1]]).astype(np.int32))
_DIST_EXTRA = jnp.asarray(np.concatenate([DIST_EXTRA, [0, 0]]).astype(np.int32))

TOKEN_MATCH_BIT = 1 << 26


def _device_u32_view(payload: jnp.ndarray) -> jnp.ndarray:
    L, P = payload.shape
    ext = jnp.concatenate([payload, jnp.zeros((L, 4), dtype=jnp.uint8)], axis=1).astype(
        jnp.uint32
    )
    return (
        ext[:, :P]
        | (ext[:, 1 : P + 1] << 8)
        | (ext[:, 2 : P + 2] << 16)
        | (ext[:, 3 : P + 3] << 24)
    )


def _run_base_extra(sym):
    """Closed-form length-symbol decode (≙ RUN_LENGTH_TABLE derivation,
    ``decomp/Open.java:843-861``) — arithmetic only, no table gathers."""
    s = jnp.clip(sym - 257, 0, 28)
    e = jnp.where(s <= 7, 0, (s - 4) >> 2)
    e = jnp.where(s == 28, 0, e)
    base = jnp.where(s <= 7, s + 3, (((s & 3) + 4) << jnp.maximum(e, 0)) + 3)
    base = jnp.where(s == 28, 258, base)
    return base.astype(jnp.int32), e.astype(jnp.int32)


def _dist_base_extra(dsym):
    """Closed-form distance-symbol decode (``decomp/Open.java:864-886``)."""
    d = jnp.clip(dsym, 0, 29)
    e = jnp.where(d <= 3, 0, (d >> 1) - 1)
    base = jnp.where(d <= 3, d + 1, (((d & 1) + 2) << jnp.maximum(e, 0)) + 1)
    return base.astype(jnp.int32), e.astype(jnp.int32)


def _tal(a, idx):
    """Gather along axis 1 (the only fast dynamic-index primitive on this
    backend; plain advanced indexing / jnp.take stall the compiler)."""
    return jnp.take_along_axis(a, idx, axis=1)


@jax.jit
def decode_tokens_device(
    payload: jnp.ndarray,  # (L, P) uint8
    body_bitpos: jnp.ndarray,  # (L,) int32
    payload_bits: jnp.ndarray,  # (L,) int32
    litlen_lut: jnp.ndarray,  # (L, 4096) int32 packed len<<9|sym
    dist_lut: jnp.ndarray,  # (L, 4096) int32
    dist_empty: jnp.ndarray,  # (L,) bool
    tokens_init: jnp.ndarray,  # (L, T) int32 zeros
):
    """Bit-parallel decode: one speculative symbol at every bit position.

    Returns (tokens (L,T) int32, token_counts (L,), err (L,) int32).
    Token packing: literal -> byte value; match -> TOKEN_MATCH_BIT |
    run<<16 | (dist-1).
    """
    L, T = tokens_init.shape
    P = payload.shape[1]
    B = P * 8
    mask12 = (1 << DEV_LUT_BITS) - 1

    # 32-bit little-endian window starting at every bit position: expand
    # the per-byte u32 windows by the 8 in-byte shifts. (>=25 valid bits.)
    u32v = _device_u32_view(payload)  # (L, P)
    wbits = (u32v[:, :, None] >> jnp.arange(8, dtype=jnp.uint32)[None, None, :]).reshape(
        L, B
    )

    # Speculative litlen decode at every bit position.
    e1 = _tal(litlen_lut, (wbits & mask12).astype(jnp.int32))
    sym = e1 & 511
    ln = e1 >> 9
    is_lit = sym < 256
    is_eob = sym == 256
    is_match = sym > 256
    run_base, run_bits = _run_base_extra(sym)
    run = run_base + ((wbits >> ln.astype(jnp.uint32)).astype(jnp.int32) & ((1 << run_bits) - 1))
    bpos = jnp.arange(B, dtype=jnp.int32)[None, :]
    b2 = bpos + ln + jnp.where(is_match, run_bits, 0)

    # Speculative distance decode at the (data-dependent) follow position.
    w2 = _tal(wbits, jnp.clip(b2, 0, B - 1))
    e2 = _tal(dist_lut, (w2 & mask12).astype(jnp.int32))
    dsym = e2 & 511
    dln = e2 >> 9
    dist_base, dist_bits = _dist_base_extra(dsym)
    dist = dist_base + ((w2 >> dln.astype(jnp.uint32)).astype(jnp.int32) & ((1 << dist_bits) - 1))
    end_b = jnp.where(is_match, b2 + dln + dist_bits, bpos + ln)

    # Per-position error classification (only matters if reached).
    perr = jnp.where(is_match & (sym > 285), _ERR_RESERVED_LEN, 0)
    empty_code = reason_to_code(Reason.LENGTH_ENCOUNTERED_WITH_EMPTY_DISTANCE_CODE)
    perr = jnp.where((perr == 0) & is_match & dist_empty[:, None], empty_code, perr)
    perr = jnp.where(
        (perr == 0) & is_match & ~dist_empty[:, None] & (dsym > 29), _ERR_RESERVED_DIST, perr
    )
    overrun = end_b > payload_bits[:, None]
    perr = jnp.where((perr == 0) & overrun, _ERR_END, perr)

    # Successor pointer; sentinels: B = clean EOB stop, B+1 = error stop.
    nxt = jnp.where(perr != 0, B + 1, jnp.where(is_eob, B, jnp.minimum(end_b, B + 1)))
    SENT = B  # >= B means terminal

    # Orbit of the body start bit under nxt: pointer doubling with an
    # unrolled reached-set accumulation (scatter+gather chains compile;
    # loops containing gathers do not, on this backend).
    jumppad = jnp.concatenate(
        [nxt, jnp.full((L, 1), B, jnp.int32), jnp.full((L, 1), B + 1, jnp.int32)], axis=1
    )  # (L, B+2); sentinel rows self-loop
    start = body_bitpos.astype(jnp.int32)
    reached = jnp.zeros((L, B + 2), bool)
    lanes2 = jnp.arange(L, dtype=jnp.int32)[:, None]
    reached = reached.at[lanes2, start[:, None]].set(True)
    # Orbit length is bounded by the token capacity, not the bit width.
    rounds = int(np.ceil(np.log2(min(B, T + 1)))) + 1
    jump = jumppad
    for _ in range(rounds):
        tgt = jnp.where(reached, jump, B)  # unreached -> harmless sentinel
        hit = jnp.zeros((L, B + 2), bool).at[lanes2, tgt].set(True, mode="drop")
        reached = reached | hit
        jump = _tal(jump, jnp.clip(jump, 0, B + 1))

    err = jnp.where(reached[:, B + 1], _ERR_END, 0)  # refined below on host
    reached_tok = reached[:, :B] & ~is_eob
    # First error actually reached. Error positions are terminal (their
    # successor is the B+1 sentinel), so the replayed chain contains at
    # most ONE position with perr != 0 — the max below is therefore
    # exactly the first error in stream order, matching the reference's
    # serial precedence (Open.java:516-593).
    perr_reached = jnp.where(reached[:, :B], perr, 0)
    err_code = jnp.max(perr_reached, axis=1)  # the single reached error
    err = jnp.where(err != 0, jnp.maximum(err_code, 1), 0)

    # Compact reached token positions into (L, T) in stream order.
    cidx = jnp.cumsum(reached_tok.astype(jnp.int32), axis=1) - 1
    tcount = jnp.sum(reached_tok, axis=1).astype(jnp.int32)
    token = jnp.where(
        is_lit, sym, TOKEN_MATCH_BIT | (jnp.minimum(run, 258) << 16) | (jnp.clip(dist - 1, 0, 65535))
    )
    scatter_idx = jnp.where(reached_tok & (cidx < T), cidx, T)
    tokens = tokens_init.at[lanes2, scatter_idx].set(token, mode="drop")
    err = jnp.where(tcount > T - 1, jnp.maximum(err, 1), err)
    return tokens, tcount, err


# ---------------------------------------------------------------------------
# Phase 2: device LZ77 resolve
# ---------------------------------------------------------------------------


@jax.jit
def resolve_lz77_device(tokens: jnp.ndarray, tcount: jnp.ndarray, out_size: jnp.ndarray):
    """Expand tokens to bytes and resolve back-references.

    tokens: (L, T) int32; out arrays sized (L, O) with O = MEMBER_DATA.
    Returns (bytes (L, O) uint8, out_len (L,), err (L,)).
    """
    L, T = tokens.shape
    O = MEMBER_DATA
    lanes = jnp.arange(L, dtype=jnp.int32)
    t_idx = jnp.arange(T, dtype=jnp.int32)

    is_match = (tokens & TOKEN_MATCH_BIT) != 0
    run = jnp.where(is_match, (tokens >> 16) & 0x3FF, 1)
    dist = jnp.where(is_match, (tokens & 0xFFFF) + 1, 0)
    valid = t_idx[None, :] < tcount[:, None]
    sizes = jnp.where(valid, run, 0)
    ends = jnp.cumsum(sizes, axis=1)
    starts = ends - sizes
    out_len = ends[:, -1] if T > 0 else jnp.zeros(L, jnp.int32)

    # Token id per output byte: scatter starts then cumulative max.
    tok_at = jnp.full((L, O), -1, dtype=jnp.int32)
    scat_idx = jnp.where(valid & (sizes > 0), starts, O)
    tok_at = tok_at.at[lanes[:, None], scat_idx].max(
        jnp.broadcast_to(t_idx[None, :], (L, T)), mode="drop"
    )
    tok_at = jax.lax.associative_scan(jnp.maximum, tok_at, axis=1)
    tok_at_safe = jnp.clip(tok_at, 0, T - 1)

    pos = jnp.arange(O, dtype=jnp.int32)[None, :]
    tok_start = jnp.take_along_axis(starts, tok_at_safe, axis=1)
    tok_match = jnp.take_along_axis(is_match.astype(jnp.int32), tok_at_safe, axis=1) == 1
    tok_dist = jnp.take_along_axis(dist, tok_at_safe, axis=1)
    tok_val = jnp.take_along_axis(tokens & 0xFF, tok_at_safe, axis=1)

    in_range = (pos < out_len[:, None]) & (tok_at >= 0)
    src = pos - tok_dist
    bad_src = in_range & tok_match & (src < 0)
    err = jnp.where(bad_src.any(axis=1), _ERR_BEFORE_START, 0)

    # Pointer doubling: ptr[i] = i for literals, else i - dist.
    ptr = jnp.where(tok_match & in_range, jnp.clip(src, 0, O - 1), pos)
    rounds = int(np.ceil(np.log2(O)))
    for _ in range(rounds):
        ptr = jnp.take_along_axis(ptr, ptr, axis=1)
    out = jnp.take_along_axis(tok_val, ptr, axis=1).astype(jnp.uint8)
    out = jnp.where(in_range, out, 0).astype(jnp.uint8)
    return out, out_len, err


# ---------------------------------------------------------------------------
# Top-level TPU decode
# ---------------------------------------------------------------------------


def gzip_decompress_tpu(data: bytes, *, verify_crc: bool = True) -> bytes:
    """Decompress a (possibly multi-member) gzip stream on the TPU.

    Streams without the TD member index (foreign encoders) fall back to the
    host decoder automatically.
    """
    buf = np.frombuffer(data, dtype=np.uint8)
    members = split_members(buf)
    if not members:
        from ..streams.gzip_stream import GzipReader

        return GzipReader(io.BytesIO(data), multi_member=True).read()
    return _decode_members(buf, members, verify_crc=verify_crc)


def _decode_members(buf: np.ndarray, members: list[MemberIndex], *, verify_crc: bool) -> bytes:
    # Partition members: stored members (first block btype 00) are a host
    # memcpy; Huffman members go to the device in lane batches.
    out_parts: list[np.ndarray | None] = [None] * len(members)
    huff: list[tuple[int, MemberIndex]] = []
    for i, m in enumerate(members):
        first_bits = int(buf[m.payload_start]) if m.payload_start < buf.size else 0
        btype = (first_bits >> 1) & 3
        if btype == 0:
            out_parts[i] = _decode_stored_member(buf, m, verify_crc=verify_crc)
        else:
            huff.append((i, m))
    for base in range(0, len(huff), LANE_BATCH):
        batch = huff[base : base + LANE_BATCH]
        results = _decode_member_batch(buf, [m for _, m in batch], verify_crc=verify_crc)
        for (i, _), r in zip(batch, results):
            out_parts[i] = r
    total = np.concatenate(out_parts) if out_parts else np.zeros(0, np.uint8)
    return total.tobytes()


def _decode_stored_member(buf: np.ndarray, m: MemberIndex, *, verify_crc: bool) -> np.ndarray:
    """Direct copy-out of a member whose blocks are all stored."""
    pos = m.payload_start
    out = []
    while True:
        hdr = int(buf[pos])
        bfinal, btype = hdr & 1, (hdr >> 1) & 3
        if btype != 0:
            # mixed block types: rare, use the host state machine
            return _host_fallback(buf, [m])[0]
        pos += 1  # stored block header consumes 3 bits; align skips the rest
        ln = int(buf[pos]) | int(buf[pos + 1]) << 8
        nlen = int(buf[pos + 2]) | int(buf[pos + 3]) << 8
        if ln != (nlen ^ 0xFFFF):
            raise DataFormatError(
                Reason.UNCOMPRESSED_BLOCK_LENGTH_MISMATCH,
                "len/nlen mismatch in uncompressed block",
            )
        pos += 4
        out.append(buf[pos : pos + ln])
        pos += ln
        if bfinal:
            break
    result = np.concatenate(out) if out else np.zeros(0, np.uint8)
    if result.size != m.isize:
        raise DataFormatError(Reason.DECOMPRESSED_SIZE_MISMATCH, "Decompressed size mismatch")
    if verify_crc and ck.crc32(result) != m.crc32:
        raise DataFormatError(
            Reason.DECOMPRESSED_CHECKSUM_MISMATCH, "Decompression CRC-32 mismatch"
        )
    return result


PAYLOAD_PAD = 66560  # largest device payload width bucket

# Shape buckets: each (lanes, payload width) pair is one compiled graph.
_P_BUCKETS = (8320, 33280, PAYLOAD_PAD)
_L_BUCKETS = (4, 16, LANE_BATCH)

# Minimal valid payload for padding lanes: a final fixed-Huffman block that
# is immediately end-of-block (bits: bfinal=1, btype=01, EOB 0000000).
_PAD_PAYLOAD = bytes([0x03, 0x00])


def _bucket(value: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


def _decode_member_batch(buf, batch, *, verify_crc: bool):
    L_real = len(batch)
    L = _bucket(L_real, _L_BUCKETS)
    pay_lens = np.zeros(L, dtype=np.int64)
    pay_lens[:L_real] = [m.end - 8 - m.payload_start for m in batch]
    if pay_lens.max() > PAYLOAD_PAD:
        return _host_fallback(buf, batch)
    P = _bucket(int(pay_lens.max()), _P_BUCKETS)
    payload = np.zeros((L, P), dtype=np.uint8)
    for i, m in enumerate(batch):
        payload[i, : pay_lens[i]] = buf[m.payload_start : m.end - 8]
    for i in range(L_real, L):
        payload[i, : len(_PAD_PAYLOAD)] = np.frombuffer(_PAD_PAYLOAD, np.uint8)
        pay_lens[i] = len(_PAD_PAYLOAD)
    payload_bits = pay_lens * 8

    hp = parse_headers_batch(payload, payload_bits)
    if not hp.bfinal.all():
        # profile violation: multi-block member -> host fallback
        return _host_fallback(buf, batch)
    if (hp.litlen_lengths.max() > DEV_LUT_BITS) or (hp.dist_lengths.max() > DEV_LUT_BITS):
        return _host_fallback(buf, batch)

    litlen_lut = build_luts_batch(hp.litlen_lengths)
    dist_lut = build_luts_batch(hp.dist_lengths)

    T = MEMBER_DATA + 1
    tokens_init = jnp.zeros((L, T), dtype=jnp.int32)
    tokens, tcount, err1 = decode_tokens_device(
        jnp.asarray(payload),
        jnp.asarray(hp.body_bitpos.astype(np.int32)),
        jnp.asarray(payload_bits.astype(np.int32)),
        jnp.asarray(litlen_lut),
        jnp.asarray(dist_lut),
        jnp.asarray(hp.dist_empty),
        tokens_init,
    )
    err1 = np.asarray(err1)
    for lane in range(L):
        if err1[lane]:
            from ..format.errors import check_device_error

            check_device_error(int(err1[lane]), f"member {lane}")

    out, out_len, err2 = resolve_lz77_device(tokens, tcount, jnp.int32(MEMBER_DATA))
    err2 = np.asarray(err2)
    for lane in range(L):
        if err2[lane]:
            from ..format.errors import check_device_error

            check_device_error(int(err2[lane]), f"member {lane}")
    out = np.asarray(out)
    out_len = np.asarray(out_len)

    results = []
    for i, m in enumerate(batch):
        if int(out_len[i]) != m.isize:
            raise DataFormatError(
                Reason.DECOMPRESSED_SIZE_MISMATCH, "Decompressed size mismatch"
            )
        results.append(out[i, : out_len[i]])
    if verify_crc:
        crcs = [ck.crc32(r) for r in results]
        for i, m in enumerate(batch):
            if crcs[i] != m.crc32:
                raise DataFormatError(
                    Reason.DECOMPRESSED_CHECKSUM_MISMATCH, "Decompression CRC-32 mismatch"
                )
    return results


def _host_fallback(buf, batch):
    from ..streams.gzip_stream import GzipReader

    results = []
    for m in batch:
        raw = buf[m.start : m.end].tobytes()
        r = GzipReader(io.BytesIO(raw), multi_member=False)
        results.append(np.frombuffer(r.read(), dtype=np.uint8))
    return results
