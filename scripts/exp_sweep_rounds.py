"""Experiment: sweep-resolve round distribution + cost split on chip.

Measures (a) per-lane total local-fixpoint rounds for text/RLE lanes,
(b) timing of kernel variants that isolate the dot vs the column select,
to decide where the next factor of ~3 comes from.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from tpu_deflate.codec import resolve_pallas as rp
from scripts.profile_resolve import gen_lane


def main() -> int:
    rng = np.random.default_rng(42)
    L = 256
    toks = np.stack(
        [gen_lane(rng, "text" if i % 4 else "rle")[0] for i in range(L)], axis=0
    )
    T = jax.device_put(jnp.asarray(toks))
    interp = rp._interpret_default()
    y0, src, summ = rp._expand_jit(T, hist=0, interpret=interp)
    tail = jnp.zeros((L, rp.TAIL_ROWS * 128), jnp.int32)
    y, st = rp._sweep_jit(tail, y0, src, interpret=interp)
    st_h = np.asarray(st)
    rounds = st_h[:, 1]
    text_idx = np.array([i for i in range(L) if i % 4])
    rle_idx = np.array([i for i in range(L) if i % 4 == 0])
    print(
        f"rounds: mean={rounds.mean():.1f} p50={np.percentile(rounds,50):.0f} "
        f"p90={np.percentile(rounds,90):.0f} max={rounds.max()}"
    )
    print(f"  text lanes: mean={rounds[text_idx].mean():.1f} max={rounds[text_idx].max()}")
    print(f"  rle  lanes: mean={rounds[rle_idx].mean():.1f} max={rounds[rle_idx].max()}")

    # src back-distance stats (how often in-block?)
    src_h = np.asarray(src)
    y0_h = np.asarray(y0)
    match = y0_h < 0
    delta = np.where(match, np.arange(rp.N_POS)[None, :] - src_h, 0)
    inblk = match & (delta > 0) & ((np.arange(rp.N_POS)[None, :] % 2048) >= delta)
    print(
        f"match positions: {match.sum()/match.size:.2%}; "
        f"in-own-2KiB-block sources: {inblk.sum()/max(match.sum(),1):.2%} of matches"
    )
    d_m = delta[match]
    for q in (10, 50, 90, 99):
        print(f"  delta p{q}: {np.percentile(d_m, q):.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
