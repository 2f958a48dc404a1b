"""Profiling harness for the v2 XLA-twin decoder path (run on the chip).

Times the fused wave jit and each XLA stage separately on one staged
wave, amortizing the tunnel round-trip. The pallas pipeline has its own
profiler (profile_pallas.py). Usage:

    python scripts/profile_v2.py [corpus_mb] [lanes]
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


def timeit(fn, inner=16, reps=2):
    """fn must return a device array; only a scalar reduction is pulled."""
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
    w = v2._prep_wave(payloads, lanes)
    w = {k: v if k.startswith("_") else jax.device_put(jnp.asarray(v)) for k, v in w.items()}
    np.asarray(sum(jnp.sum(x.astype(jnp.int32)) for x in w.values() if hasattr(x, "astype")))
    payload_mb = sum(len(p) for p in payloads) / 2**20
    print(f"wave: {lanes} lanes, grid {w['grid'].shape}, real payload {payload_mb:.2f} MiB")

    def fused():
        out = v2._run_wave_jit(w)
        return jnp.sum(out[1]) + jnp.sum(out[5])  # (counts, out_total) scalars

    t_fused = timeit(fused)
    print(f"fused wave: {t_fused*1e3:.1f} ms -> {payload_mb/1024/t_fused:.3f} GB/s payload")

    def unfused():
        out = v2._run_wave_unfused(w)
        return jnp.sum(out[1]) + jnp.sum(out[5])

    t_unf = timeit(unfused)
    print(f"unfused wave: {t_unf*1e3:.1f} ms -> {payload_mb/1024/t_unf:.3f} GB/s payload")

    delta_t, token_t = v2._stage_a_wave(w)
    L, W, NT = delta_t.shape
    B = W * NT
    delta = delta_t.transpose(0, 2, 1).reshape(L, B).astype(jnp.uint8)
    token = token_t.transpose(0, 2, 1).reshape(L, B)
    delta_tiles = delta.reshape(L, B // v2.W_TILE, v2.W_TILE)
    transfers = v2.stage_b_transfers(delta_tiles)
    entries, final = v2.stage_c_entries(transfers, jnp.asarray(w["rem"]).astype(jnp.uint8))
    reached = v2.stage_d_reached(delta_tiles, entries).reshape(L, B)
    valid = reached & (delta < v2.SENT_EOB)

    stages = {
        "a": lambda: v2._stage_a_wave(w)[1],
        "b": lambda: v2.stage_b_transfers(delta_tiles),
        "c": lambda: v2.stage_c_entries(transfers, jnp.asarray(w["rem"]).astype(jnp.uint8))[0],
        "d": lambda: v2.stage_d_reached(delta_tiles, entries),
        "e": lambda: v2.stage_e_summary(delta, token, reached)[3],
        "compact": lambda: v2.compact_tokens(token, valid)[0],
    }
    total = 0.0
    for name, fn in stages.items():
        t = timeit(fn)
        total += t
        print(f"stage {name}: {t*1e3:.1f} ms")
    print(f"stage sum: {total*1e3:.1f} ms -> {payload_mb/1024/total:.3f} GB/s payload")


if __name__ == "__main__":
    main()
