"""Incremental on-chip timing of stage A's internal pieces.

Usage: python scripts/probe_stage_a.py [corpus_mb] [lanes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import make_corpus  # noqa: E402
from tpu_deflate.codec import decode_jax_v2 as v2  # noqa: E402
from tpu_deflate.codec import decode_pallas as dp  # noqa: E402

INNER = 16


def timeit(fn, inner=INNER, reps=2):
    np.asarray(jnp.sum(fn().astype(jnp.float32)))  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(inner):
            acc = acc + jnp.sum(fn().astype(jnp.float32))
        np.asarray(acc)
        best = min(best, (time.monotonic() - t0) / inner)
    return best


def main():
    corpus_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    data = make_corpus(corpus_mb)
    from tpu_deflate import native
    from tpu_deflate.codec import decode_jax as dj

    gz = native.compress_members_native(data)
    buf = np.frombuffer(gz, dtype=np.uint8)
    members = dj.split_members(buf)
    huff = [m for m in members if ((int(buf[m.payload_start]) >> 1) & 3) != 0]
    payloads = [buf[m.payload_start : m.end - 8].tobytes() for m in huff][:lanes]
    w = v2._prep_wave(payloads, lanes, buckets=dp.P_BUCKETS_PALLAS)
    w = {k: v if k.startswith("_") else jax.device_put(jnp.asarray(v)) for k, v in w.items()}
    np.asarray(sum(jnp.sum(x.astype(jnp.int32)) for x in w.values() if hasattr(x, "astype")))
    payload_mb = sum(len(p) for p in payloads) / 2**20
    print(f"wave: {lanes} lanes, grid {w['grid'].shape}, real payload {payload_mb:.2f} MiB")

    W_TILE_P = v2.W_TILE_P

    @jax.jit
    def windows(grid):
        L, WB, NTp = grid.shape
        NT = NTp - 1
        g = grid
        g = ((g & 0x55) << 1) | ((g >> 1) & 0x55)
        g = ((g & 0x33) << 2) | ((g >> 2) & 0x33)
        g32 = (g.astype(jnp.uint32) & 0x0F) << 4 | (g.astype(jnp.uint32) >> 4)

        def brow(k):
            a = g32[:, k:, :NT]
            if k:
                a = jnp.concatenate([a, g32[:, :k, 1 : NT + 1]], axis=1)
            return jnp.repeat(a, 8, axis=1)

        b = [brow(k) for k in range(9)]
        r = jax.lax.broadcasted_iota(jnp.uint32, (1, W_TILE_P, 1), 1) & 7
        u32a = (b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3]
        vR = (u32a << r) | (b[4] >> (8 - r))
        u32b = (b[4] << 24) | (b[5] << 16) | (b[6] << 8) | b[7]
        vR2 = (u32b << r) | (b[8] >> (8 - r))
        return vR, vR2

    @jax.jit
    def ladder1(grid, ll_sat, ll_pack, ll_nlive):
        vR, vR2 = windows(grid)
        ln, lidx, lfound = v2._ladder_decode(vR, ll_sat, ll_pack, ll_nlive)
        return ln + lidx + lfound

    @jax.jit
    def desc_only(grid, ll_sat, ll_pack, ll_nlive, ll_desc):
        vR, vR2 = windows(grid)
        ln, lidx, lfound = v2._ladder_decode(vR, ll_sat, ll_pack, ll_nlive)
        desc = v2._desc_lookup_320(ll_desc, lidx)
        return desc

    @jax.jit
    def two_ladders(grid, ll_sat, ll_pack, ll_nlive, ll_desc, d_sat, d_pack, d_nlive):
        vR, vR2 = windows(grid)
        ln, lidx, lfound = v2._ladder_decode(vR, ll_sat, ll_pack, ll_nlive)
        desc = v2._desc_lookup_320(ll_desc, lidx)
        run_bits = (desc >> 2) & 7
        d1 = ln + run_bits
        d1u = d1.astype(jnp.uint32)
        vD = (vR << d1u) | (vR2 >> (32 - d1u))
        dln, didx, dfound = v2._ladder_decode(vD, d_sat, d_pack, d_nlive)
        return dln + didx + dfound

    @jax.jit
    def plus_select(grid, ll_sat, ll_pack, ll_nlive, ll_desc, d_sat, d_pack, d_nlive, d_desc):
        vR, vR2 = windows(grid)
        ln, lidx, lfound = v2._ladder_decode(vR, ll_sat, ll_pack, ll_nlive)
        desc = v2._desc_lookup_320(ll_desc, lidx)
        run_bits = (desc >> 2) & 7
        d1 = ln + run_bits
        d1u = d1.astype(jnp.uint32)
        vD = (vR << d1u) | (vR2 >> (32 - d1u))
        dln, didx, dfound = v2._ladder_decode(vD, d_sat, d_pack, d_nlive)
        dd = v2._desc_select32(d_desc, didx)
        return dd + dln

    pieces = {
        "windows": lambda: windows(w["grid"])[0],
        "w+ladder": lambda: ladder1(w["grid"], w["ll_sat"], w["ll_pack"], w["ll_nlive"]),
        "w+lad+desc": lambda: desc_only(
            w["grid"], w["ll_sat"], w["ll_pack"], w["ll_nlive"], w["ll_desc"]
        ),
        "w+2lad+desc": lambda: two_ladders(
            w["grid"], w["ll_sat"], w["ll_pack"], w["ll_nlive"], w["ll_desc"],
            w["d_sat"], w["d_pack"], w["d_nlive"],
        ),
        "+select32": lambda: plus_select(
            w["grid"], w["ll_sat"], w["ll_pack"], w["ll_nlive"], w["ll_desc"],
            w["d_sat"], w["d_pack"], w["d_nlive"], w["d_desc"],
        ),
        "full stage_a": lambda: v2._stage_a_wave(w)[0],
    }
    for name, fn in pieces.items():
        t = timeit(fn)
        print(f"{name}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
