"""Experiment: sweep-resolve round distribution + cost split on chip.

Measures (a) per-lane total local-fixpoint rounds for text/RLE lanes,
(b) timing of kernel variants that isolate the dot vs the column select,
to decide where the next factor of ~3 comes from.

Round-5 findings (see BASELINE.md r5): mean 78 rounds/lane (text 62,
RLE 126) is near the structural floor (32 block minimums + log2 of
in-block chain depth), and the shipped 2-plane kernel's ~3.3M VPU ops
per round run at the measured ~1 T ops/s roofline. Variants measured
SLOWER: bf16 split-table byte rounds (91 ms vs 67 — round count
dominates and the one-hot build + column select are dtype-insensitive),
block-loop unrolling (no change, 6x compile time), per-plane select
before combine.

Costed-but-unbuilt next idea — word-granularity (quad) gathers: gather
4-byte words instead of bytes so the 256-row one-hot build amortizes
over 4 positions (build drops ~4x to ~130k/tile-round) while per-quad
alignment needs two adjacent words + a 4-way funnel select. The
128-way column select does NOT amortize (select work is proportional
to bytes x candidate columns regardless of grouping: 8 gathered byte
planes x 512 quads = 4 planes x 2048 positions), so the net bound is
~1.5-1.7x on the build+combine terms only — roughly 67 -> ~45 ms per
16 MiB, still short of the ~25 ms the 0.62 GB/s blended bar implies.
A true structural win needs fewer gathered elements per byte (e.g.
region-level range copies for long matches), not a cheaper select.
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
