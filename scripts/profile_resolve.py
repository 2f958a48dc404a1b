"""On-chip correctness + stage timing for the sweep resolve kernel.

Usage: python scripts/profile_resolve.py [--mb 16] [--lanes 256]

Stages timed separately (marginal-pass style where useful): expand,
sweep, CRC. Verifies a sample of lanes against the serial reference.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

from tpu_deflate.codec import resolve_pallas as rp
from tpu_deflate.kernels import checksum_jax as cj


def gen_lane(rng, style: str) -> tuple[np.ndarray, int]:
    toks: list[int] = []
    out = 0
    target = rp.N_POS
    while out < target - 300:
        roll = rng.random()
        if style == "text":
            if roll < 0.55 or out < 8:
                toks.append(int(rng.integers(0, 256)))
                out += 1
            else:
                run = int(rng.integers(3, 80))
                dist = int(rng.integers(1, min(out, 32768) + 1))
                toks.append(rp.TOKEN_MATCH_BIT | run << 16 | (dist - 1))
                out += run
        else:
            if roll < 0.1 or out < 8:
                toks.append(int(rng.integers(0, 256)))
                out += 1
            else:
                run = int(rng.integers(64, 259))
                dist = int(rng.integers(1, 9))
                toks.append(rp.TOKEN_MATCH_BIT | run << 16 | (dist - 1))
                out += run
    arr = np.full(rp.N_POS, -1, np.int32)
    arr[: len(toks)] = toks
    return arr, out


def pull(x):
    return np.asarray(jnp.sum(x.astype(jnp.int32) if x.dtype != jnp.int32 else x))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=256)
    ap.add_argument("--verify", type=int, default=6)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(42)
    L = args.lanes
    toks = np.stack(
        [gen_lane(rng, "text" if i % 4 else "rle")[0] for i in range(L)], axis=0
    )
    bytes_total = 0

    T = jax.device_put(jnp.asarray(toks))
    pull(T)

    interp = rp._interpret_default()
    print("interpret:", interp, flush=True)

    def run_expand():
        return rp._expand_jit(T, hist=0, interpret=interp)

    def run_all():
        y0, src, summ = run_expand()
        tail = jnp.zeros((L, rp.TAIL_ROWS * 128), jnp.int32)
        y, st = rp._sweep_jit(tail, y0, src, interpret=interp)
        return y, st, summ

    # Compile + warm
    t0 = time.monotonic()
    y, st, summ = run_all()
    pull(y + st[:, :1] if False else y)
    pull(st)
    print(f"compile+first run: {time.monotonic() - t0:.1f}s", flush=True)

    summ_h = np.asarray(summ)
    st_h = np.asarray(st)
    bytes_total = int(summ_h[:, 1].sum())
    print(
        f"lanes={L} bytes={bytes_total/2**20:.1f}MiB unresolved={int(st_h[:,0].sum())} "
        f"max_local_rounds={int(st_h[:,1].max())}",
        flush=True,
    )

    # Verify a sample against the serial reference
    yh = np.asarray(y)
    bad = 0
    for i in list(range(args.verify)) + [L - 1]:
        ref = rp.resolve_reference(toks[i].astype(np.int64))
        got = yh[i, : len(ref)].astype(np.uint8).tobytes()
        if got != ref:
            bad += 1
            d = next(j for j in range(len(ref)) if got[j] != ref[j])
            print(f"lane {i}: MISMATCH at {d}", flush=True)
    print(f"verified {args.verify + 1} lanes, {bad} mismatches", flush=True)

    # Timing: marginal-pass per stage
    def timeit(fn, n=1):
        t0 = time.monotonic()
        accs = [fn() for _ in range(n)]
        for a in accs:
            pass
        pull(accs[-1])
        return time.monotonic() - t0

    def expand_only():
        y0, src, summ2 = run_expand()
        return y0[:, ::997] + src[:, ::997] + summ2[:, :1]

    y0, src, _ = run_all()[0], None, None  # noqa: F841  (warm shapes)
    y0d, srcd, _s = run_expand()
    pull(y0d)
    taild = jnp.zeros((L, rp.TAIL_ROWS * 128), jnp.int32)

    def sweep_only():
        y2, st2 = rp._sweep_jit(taild, y0d, srcd, interpret=interp)
        return y2[:, ::997] + st2[:, :1]

    K8, lvl8 = cj.crc_matrices8(rp.N_POS // cj.CHUNK_BYTES)

    yd, _st = rp._sweep_jit(taild, y0d, srcd, interpret=interp)

    def crc_only():
        return cj.crc32_lanes_raw8(yd, K8, lvl8)

    for name, fn in [("expand", expand_only), ("sweep", sweep_only), ("crc", crc_only)]:
        t1 = min(timeit(fn, 1) for _ in range(3))
        t3 = min(timeit(fn, 3) for _ in range(3))
        marg = (t3 - t1) / 2
        gbps = bytes_total / max(marg, 1e-9) / 1e9
        print(
            f"{name:7s} t1={t1*1e3:7.1f}ms t3={t3*1e3:7.1f}ms marginal={marg*1e3:7.1f}ms "
            f"-> {gbps:6.3f} GB/s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
