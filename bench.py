"""Headline benchmark: member-parallel gzip decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Corpus: a deterministic silesia-like 48 MiB mix (text-ish with word
repeats, binary records, runs, random) — silesia itself is not fetchable
in this zero-egress environment. Baseline: the BASELINE.md north-star
target of 1.0 GB/s/chip decode (the reference Java CLI publishes no
numbers and no JVM exists in this image; see BASELINE.md).

Encode happens via the TPU encoder (itself timed and reported on stderr);
decode is timed warm over the TPU member-parallel path, output verified
byte-exact + CRC.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

CORPUS_MB = 48
BASELINE_GBPS = 1.0


def make_corpus(total_mb: int = CORPUS_MB) -> bytes:
    rng = np.random.default_rng(20260817)
    parts = []
    # text-like: words sampled with Zipf-ish reuse
    words = [rng.integers(97, 123, rng.integers(2, 10), dtype=np.uint8) for _ in range(200)]
    for _ in range(total_mb // 4):
        idx = rng.zipf(1.3, 1 << 17) % len(words)
        parts.append(np.concatenate([words[i] for i in idx])[: 1 << 20])
    # binary records with repeated structure
    rec = rng.integers(0, 256, 64, dtype=np.uint8)
    for _ in range(total_mb // 4):
        block = np.tile(rec, (1 << 20) // 64)
        noise = rng.integers(0, 256, block.size, dtype=np.uint8)
        mask = rng.random(block.size) < 0.1
        block = np.where(mask, noise, block).astype(np.uint8)
        parts.append(block)
    # runs
    for _ in range(total_mb // 8):
        vals = rng.integers(0, 4, 1 << 12, dtype=np.uint8)
        reps = rng.integers(1, 512, 1 << 12)
        parts.append(np.repeat(vals, reps)[: 1 << 20])
    # random (incompressible)
    for _ in range(total_mb // 8):
        parts.append(rng.integers(0, 256, 1 << 20, dtype=np.uint8))
    blob = np.concatenate(parts)
    target = total_mb << 20
    if blob.size < target:
        blob = np.concatenate([blob, rng.integers(0, 256, target - blob.size, dtype=np.uint8)])
    return blob[:target].tobytes()


def main() -> int:
    from tpu_deflate.engine import compress, decompress, _resolve

    engine = _resolve("auto")
    data = make_corpus()
    n = len(data)
    print(f"corpus: {n / 1e6:.1f} MB, engine: {engine}", file=sys.stderr)

    t0 = time.monotonic()
    gz = compress(data, engine=engine)
    t_enc_cold = time.monotonic() - t0
    t0 = time.monotonic()
    gz = compress(data, engine=engine)
    t_enc = time.monotonic() - t0
    print(
        f"encode: cold {n / t_enc_cold / 1e6:.0f} MB/s, warm {n / t_enc / 1e6:.0f} MB/s, "
        f"ratio {len(gz) / n:.4f}",
        file=sys.stderr,
    )

    out = decompress(gz, engine=engine)  # warm-up + verification (incl. CRC)
    assert out == data, "decode mismatch"
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        out = decompress(gz, engine=engine)
        dt = time.monotonic() - t0
        best = min(best, dt)
    assert out == data
    gbps = n / best / 1e9
    print(f"decode best of 3: {best:.3f}s -> {gbps:.3f} GB/s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "synthetic-silesia gzip decode throughput (1 node: host cores + 1 chip)",
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbps / BASELINE_GBPS, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
