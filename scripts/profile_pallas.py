"""Per-stage profile of the pallas wave pipeline on the real chip.

Usage: python scripts/profile_pallas.py [corpus_mb] [lanes] [inner]

Each stage is timed over ``inner`` back-to-back async calls with one
forcing scalar pull, so the ~30-40 ms tunnel round-trip amortizes to
RTT/inner per reported call.
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


def timeit(fn, inner=None, reps=2):
    inner = inner or INNER
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
    global INNER
    corpus_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    if len(sys.argv) > 3:
        INNER = int(sys.argv[3])
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

    dt, tt = v2._stage_a_wave(w)
    L, _W, NT = dt.shape
    transfers = dp.stage_b_pallas(dt)
    entries, _final = v2.stage_c_entries(transfers, jnp.asarray(w["rem"]).astype(jnp.uint8))
    entries = jax.device_put(entries.astype(jnp.int32))
    bound = v2.W_TILE_P // max(int(w.get("_min_tok_bits", 1)), 1) + 1
    k1 = next((k for k in dp.K1_CHOICES if bound <= k), dp.K1_CHOICES[-1])
    tokc, summ = dp.stage_dc_pallas(dt, tt, entries, k1=k1)

    stages = {
        "a": lambda: v2._stage_a_wave(w)[1],
        "b_pallas": lambda: dp.stage_b_pallas(dt),
        "c": lambda: v2.stage_c_entries(transfers, jnp.asarray(w["rem"]).astype(jnp.uint8))[0],
        "dc_pallas": lambda: dp.stage_dc_pallas(dt, tt, entries, k1=k1)[0],
        "compact2": lambda: v2.compact_level2(tokc.reshape(L, NT * k1)),
    }
    total = 0.0
    for name, fn in stages.items():
        t = timeit(fn)
        total += t
        print(f"stage {name}: {t*1e3:.2f} ms -> {payload_mb/1024/t:.3f} GB/s")
    print(f"stage sum: {total*1e3:.1f} ms -> {payload_mb/1024/total:.3f} GB/s payload")

    def full():
        out = v2._run_wave_pallas(w)
        return out[1] + out[5]

    t_full = timeit(full)
    print(f"full pallas wave: {t_full*1e3:.1f} ms -> {payload_mb/1024/t_full:.3f} GB/s payload")


if __name__ == "__main__":
    main()
