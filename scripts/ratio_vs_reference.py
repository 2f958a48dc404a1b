"""Measure compressed size vs the reference encoder's presets per effort.

The north-star target (BASELINE.md) is "compressed size <= reference
encoder at equivalent effort". No JVM exists in this image, so the
reference encoder is reproduced exactly by the host strategy system run
with ``exact=True`` matchers (serial greedy, exhaustive distance scan,
smallest-distance tie-break — verbatim ``comp/Lz77Huffman.java:68-130``
semantics) under the reference's own buffering defaults (64 KiB
lookahead / 32 KiB sliding history, ``DeflaterOutputStream.java:50-52``).

Rows compared on RAW DEFLATE bytes (container overhead shown separately):

  reference presets : RLE_DYNAMIC (the library default), FULL_DYNAMIC,
                      and BEST = MultiStrategy(Stored, BinarySplit(
                      MultiStrategy(FULL_DYNAMIC, FULL_STATIC))) — the
                      strongest composition the reference can express.
  this framework    : host efforts 1-5 (continuous history, raw),
                      native efforts 1-5 (gzip; 1-3 member-parallel
                      profile incl. TD framing, 4-5 continuous),
                      tpu engine (member-parallel profile).

Usage: python scripts/ratio_vs_reference.py [--kb 192] [--fast]
"""

from __future__ import annotations

import argparse
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, ".")


def corpora(kb: int) -> dict[str, bytes]:
    rng = np.random.default_rng(20260818)
    n = kb << 10
    out = {}
    # text-like: zipf word reuse (same generator family as bench.py)
    words = [rng.integers(97, 123, rng.integers(2, 10), dtype=np.uint8) for _ in range(200)]
    idx = rng.zipf(1.3, n) % len(words)
    out["text"] = np.concatenate([words[i] for i in idx])[:n].tobytes()
    # binary records with 10% noise
    rec = rng.integers(0, 256, 64, dtype=np.uint8)
    block = np.tile(rec, n // 64)
    noise = rng.integers(0, 256, block.size, dtype=np.uint8)
    block = np.where(rng.random(block.size) < 0.1, noise, block).astype(np.uint8)
    out["records"] = block.tobytes()
    # run-heavy
    vals = rng.integers(0, 4, 1 << 12, dtype=np.uint8)
    reps = rng.integers(1, 512, 1 << 12)
    out["runs"] = np.repeat(vals, reps)[:n].tobytes()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kb", type=int, default=192)
    ap.add_argument("--fast", action="store_true", help="skip the BEST composition row")
    ap.add_argument("--tpu", action="store_true", help="include the tpu engine row")
    args = ap.parse_args()

    from tpu_deflate import deflate
    from tpu_deflate.codec.deflate_encode import (
        BinarySplitStrategy,
        Lz77HuffmanStrategy,
        MultiStrategy,
        StoredStrategy,
    )
    from tpu_deflate.engine import compress

    REF = {
        "ref RLE_DYNAMIC (default)": Lz77HuffmanStrategy(True, 3, 258, 1, 1, exact=True),
        "ref FULL_DYNAMIC": Lz77HuffmanStrategy(True, exact=True),
    }
    if not args.fast:
        REF["ref BEST (Multi+BinarySplit)"] = MultiStrategy(
            [
                StoredStrategy(),
                BinarySplitStrategy(
                    MultiStrategy(
                        [
                            Lz77HuffmanStrategy(True, exact=True),
                            Lz77HuffmanStrategy(False, exact=True),
                        ]
                    ),
                    min_block_len=1024,
                ),
            ]
        )

    data = corpora(args.kb)
    results: dict[str, dict[str, int]] = {}

    for cname, blob in data.items():
        row: dict[str, int] = {"input": len(blob)}
        row["zlib-9 (context)"] = len(zlib.compress(blob, 9))
        for rname, strat in REF.items():
            t0 = time.monotonic()
            row[rname] = len(deflate(blob, strategy=strat))
            print(f"  {cname}: {rname} = {row[rname]} ({time.monotonic()-t0:.1f}s)", file=sys.stderr)
        for e in (1, 2, 3, 4, 5):
            row[f"host raw e{e}"] = len(deflate(blob, effort=e))
        for e in (1, 2, 3, 4, 5):
            row[f"native gzip e{e}"] = len(compress(blob, engine="native", effort=e))
        if args.tpu:
            # e1-e3 member-parallel profile; e4-e5 continuous history on
            # device (one member, halo-fed analyze — the max-ratio tier).
            for e in (1, 2, 3, 4, 5):
                try:
                    t0 = time.monotonic()
                    row[f"tpu gzip e{e}"] = len(compress(blob, engine="tpu", effort=e))
                    print(
                        f"  {cname}: tpu e{e} = {row[f'tpu gzip e{e}']} "
                        f"({time.monotonic()-t0:.1f}s)",
                        file=sys.stderr,
                    )
                except Exception as exc:
                    print(f"  tpu engine e{e} failed: {exc}", file=sys.stderr)
        results[cname] = row

    # Render a markdown table: rows = modes, cols = corpora (ratio %)
    names = list(results)
    modes = [k for k in next(iter(results.values())) if k != "input"]
    print(f"\n| mode | {' | '.join(names)} |")
    print("|---|" + "---|" * len(names))
    for m in modes:
        cells = []
        for c in names:
            v = results[c].get(m)
            cells.append(f"{100*v/results[c]['input']:.2f}%" if v else "—")
        print(f"| {m} | {' | '.join(cells)} |")

    # North-star assertions: continuous-history modes at effort >= 2 must
    # not exceed the equivalent reference preset.
    ok = True
    for c in names:
        r = results[c]
        if r["host raw e2"] > r["ref FULL_DYNAMIC"]:
            print(f"LOSS: host e2 > ref FULL_DYNAMIC on {c}", file=sys.stderr)
            ok = False
        if r["host raw e1"] > r["ref RLE_DYNAMIC (default)"]:
            print(f"LOSS: host e1 > ref RLE_DYNAMIC on {c}", file=sys.stderr)
            ok = False
        best = r.get("ref BEST (Multi+BinarySplit)")
        if best and r["host raw e5"] > best:
            print(f"LOSS: host e5 > ref BEST on {c}", file=sys.stderr)
            ok = False
        if best and r["native gzip e5"] - 31 > best:  # 31 B gzip member framing
            print(f"LOSS: native e5 > ref BEST on {c}", file=sys.stderr)
            ok = False
    print("north-star:", "OK" if ok else "LOSSES FOUND", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
