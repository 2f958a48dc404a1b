"""Per-stage device-time profile: chain k dependent invocations of one
stage inside a single jitted program, so per-dispatch tunnel overhead is
paid once and (t_chain - overhead)/k isolates device compute.

Each iteration's input is perturbed by a value derived from the previous
iteration's output (cheap xor), which defeats CSE without changing the
op mix. Usage: python scripts/profile_chain.py [corpus_mb] [lanes] [k]
"""

from __future__ import annotations

import functools
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


def build_wave(corpus_mb: int, lanes: int):
    from tpu_deflate import native
    from tpu_deflate.codec import decode_jax as dj

    data = make_corpus(corpus_mb)
    gz = native.compress_members_native(data)
    buf = np.frombuffer(gz, dtype=np.uint8)
    members = dj.split_members(buf)
    huff = [m for m in members if ((int(buf[m.payload_start]) >> 1) & 3) != 0]
    payloads = [buf[m.payload_start : m.end - 8].tobytes() for m in huff][:lanes]
    w = v2._prep_wave(payloads, lanes, buckets=dp.P_BUCKETS_PALLAS)
    w = {k: v if k.startswith("_") else jax.device_put(jnp.asarray(v)) for k, v in w.items()}
    np.asarray(sum(jnp.sum(x.astype(jnp.int32)) for x in w.values() if hasattr(x, "astype")))
    return w, sum(len(p) for p in payloads) / 2**20


def timed(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        out = fn(*args)
        np.asarray(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.monotonic() - t0)
    return best


def main():
    corpus_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    w, payload_mb = build_wave(corpus_mb, lanes)
    meta = dp.build_meta(w)
    meta = jax.device_put(meta)
    grid = w["grid"]
    rem8 = jnp.asarray(w["rem"]).astype(jnp.uint8)

    bound = v2.W_TILE_P // max(int(w.get("_min_tok_bits", 1)), 1) + 1
    k1 = next((c for c in dp.K1_CHOICES if bound <= c), dp.K1_CHOICES[-1])

    dt, tt = dp.stage_a_pallas(grid, meta)
    transfers = dp.stage_b_pallas(dt)
    entries, _f = v2.stage_c_entries(transfers, rem8)
    entries_i = entries.astype(jnp.int32)
    tokc, summ = dp.stage_dc_pallas(dt, tt, entries_i, k1=k1)
    L, _W, NT = dt.shape
    for x in (dt, tt, transfers, entries_i, tokc):
        x.block_until_ready()
    print(f"wave: L={L} NT={NT} payload {payload_mb:.2f} MiB, k1={k1}, chain k={k}")

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_a(grid, meta, n):
        acc = jnp.zeros((), jnp.int32)
        g = grid
        for _ in range(n):
            d, t = dp._stage_a_jit(g, meta, interpret=False)
            s = (d[0, 0, 0] + t[0, 0, 0]) & 1
            acc = acc + d[0, 0, 0]
            g = grid ^ s.astype(jnp.uint8)
        return acc

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_b(dt, n):
        acc = jnp.zeros((), jnp.int32)
        d = dt
        for _ in range(n):
            tr = dp._stage_b_jit(d, interpret=False)
            s = tr[0, 0, 0].astype(jnp.int32) & 1
            acc = acc + s
            d = dt ^ s[None, None, None]
        return acc

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_c(transfers, rem8, n):
        acc = jnp.zeros((), jnp.int32)
        tr = transfers
        for _ in range(n):
            e, f = v2.stage_c_entries(tr, rem8)
            s = e[0, 0].astype(jnp.int32) & 1
            acc = acc + s
            tr = transfers ^ s.astype(jnp.uint8)[None, None, None]
        return acc

    @functools.partial(jax.jit, static_argnames=("n", "k1"))
    def chain_dc(dt, tt, entries, n, k1):
        acc = jnp.zeros((), jnp.int32)
        d = dt
        for _ in range(n):
            tok, summ = dp._stage_dc_jit(d, tt, entries, k1=k1, interpret=False)
            s = tok[0, 0, 0] & 1
            acc = acc + s
            d = dt ^ s[None, None, None]
        return acc

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_l2(tokc, n):
        acc = jnp.zeros((), jnp.int32)
        t = tokc
        for _ in range(n):
            o = v2.compact_level2(t)
            s = o[0, 0] & 1
            acc = acc + s
            t = tokc ^ s[None, None]
        return acc

    tok_l1 = tokc.reshape(L, NT * k1)
    jobs = [
        ("a_pallas", lambda n: chain_a(grid, meta, n)),
        ("b_pallas", lambda n: chain_b(dt, n)),
        ("c_xla", lambda n: chain_c(transfers, rem8, n)),
        ("dc_pallas", lambda n: chain_dc(dt, tt, entries_i, n, k1)),
        ("compact2", lambda n: chain_l2(tok_l1, n)),
    ]
    total = 0.0
    for name, fn in jobs:
        t1 = timed(fn, 1)
        tk = timed(fn, k)
        per = (tk - t1) / (k - 1)
        total += per
        print(
            f"stage {name}: {per*1e3:7.2f} ms/call  -> {payload_mb/1024/per:7.3f} GB/s payload"
            f"   (t1={t1*1e3:.1f} tk={tk*1e3:.1f})"
        )
    print(f"stage sum: {total*1e3:.1f} ms -> {payload_mb/1024/total:.3f} GB/s payload")


if __name__ == "__main__":
    main()


def profile_full(w, payload_mb, k=4):
    """Chain the full pallas wave (one jit per call) k times."""
    import functools
    from tpu_deflate.codec import decode_jax_v2 as v2

    def run1(w):
        return v2._run_wave_pallas(w)

    out = run1(w)
    jax.block_until_ready(out[0])

    def run_n(n):
        t0 = time.monotonic()
        acc = jnp.zeros((), jnp.int32)
        for _ in range(n):
            o = run1(w)
            acc = acc + jnp.sum(o[1])
        np.asarray(acc)
        return time.monotonic() - t0

    t1 = min(run_n(1) for _ in range(3))
    tk = min(run_n(k) for _ in range(3))
    per = (tk - t1) / (k - 1)
    print(f"full wave (marginal): {per*1e3:7.2f} ms -> {payload_mb/1024/per:7.3f} GB/s payload (t1={t1*1e3:.1f})")


def profile_map(w, payload_mb, NT, k1, L, k=8):
    from tpu_deflate.codec import decode_jax_v2 as v2

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 256, (L, NT * k1), dtype=np.int32))
    lm = jnp.asarray(w["lit_map8"])

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain_m(t0v, lm, n):
        acc = jnp.zeros((), jnp.int32)
        t = t0v
        for _ in range(n):
            o = v2.apply_lit_map_chunked(t, lm)
            s = o[0, 0] & 1
            acc = acc + s
            t = t0v ^ s[None, None]
        return acc

    import functools as _f
    t1 = timed(lambda n: chain_m(toks, lm, n), 1)
    tk = timed(lambda n: chain_m(toks, lm, n), k)
    per = (tk - t1) / (k - 1)
    print(f"lit_map: {per*1e3:7.2f} ms -> {payload_mb/1024/per:7.3f} GB/s payload (t1={t1*1e3:.1f})")
