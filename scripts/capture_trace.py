"""Capture one jax.profiler trace of the flagship decode wave (SURVEY
§5.1). Writes a TensorBoard-loadable trace under artifacts/trace_rN/ and
prints the per-op summary path; BASELINE.md cites the artifact.

Usage: python scripts/capture_trace.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench import make_corpus  # noqa: E402


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "artifacts/trace_r04"
    os.makedirs(out, exist_ok=True)
    from tpu_deflate import native
    from tpu_deflate.codec import decode_jax as dj
    from tpu_deflate.codec import decode_jax_v2 as v2
    from tpu_deflate.codec import resolve_pallas as rp

    data = make_corpus(8)[: 8 << 20]
    gz = native.compress_members_native(data)
    buf = np.frombuffer(gz, np.uint8)
    members = dj.split_members(buf)
    huff = [
        m
        for m in members
        if ((int(buf[m.payload_start]) >> 1) & 3) != 0
    ][: v2.V2_LANE_BATCH]
    payloads = [buf[m.payload_start : m.end - 8].tobytes() for m in huff]
    w = v2._prep_wave(payloads, v2._bucket(len(payloads), v2.V2_L_BUCKETS))
    w = {k: v if k.startswith("_") else jax.device_put(jnp.asarray(v)) for k, v in w.items()}
    run = v2._run_wave_pallas if v2._use_pallas() else v2._run_wave_unfused

    def one_wave():
        tokens, counts, *_rest = run(w)
        T = tokens[:, : rp.N_POS]
        if T.shape[1] < rp.N_POS:
            T = jnp.pad(T, ((0, 0), (0, rp.N_POS - T.shape[1])), constant_values=-1)
        y, summ, rounds, unres = rp.resolve_tokens_device(T)
        return np.asarray(jnp.sum(y[:, ::997]) + jnp.sum(counts) + rounds)

    one_wave()  # compile + warm outside the trace
    with jax.profiler.trace(out):
        t0 = time.monotonic()
        one_wave()
        wall = time.monotonic() - t0
    print(f"trace written to {out} (wave decode+resolve wall {wall*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
