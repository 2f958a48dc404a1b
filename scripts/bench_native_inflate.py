"""Microbenchmark: td_inflate single-core throughput on a corpus slice.

Measures the raw C decode loop (no member framing, no threads) so hot-loop
changes in native/deflate_core.c can be evaluated in isolation.
"""

import ctypes
import sys
import time
import zlib

sys.path.insert(0, ".")
from bench import make_corpus  # noqa: E402
from tpu_deflate import native  # noqa: E402

MB = 16


def main():
    data = make_corpus(48)[: MB << 20]
    raw = zlib.compress(data, 6)[2:-4]  # raw deflate stream (zlib-encoded)
    lib = native._load()
    out = ctypes.create_string_buffer(len(data) + 64)
    out_len = ctypes.c_size_t()
    consumed = ctypes.c_size_t()
    best = float("inf")
    for _ in range(5):
        t0 = time.monotonic()
        rc = lib.td_inflate(raw, len(raw), out, len(data) + 64,
                            ctypes.byref(out_len), ctypes.byref(consumed))
        dt = time.monotonic() - t0
        assert rc == 0, rc
        assert out_len.value == len(data)
        best = min(best, dt)
    assert out.raw[: len(data)] == data
    print(f"td_inflate (zlib-6 stream, {MB} MiB out): {len(data)/best/1e6:.0f} MB/s")

    # also via the engine front door (member-parallel over threads)
    from tpu_deflate.engine import compress, decompress

    gz = compress(data, engine="native")
    decompress(gz, engine="native")  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        out2 = decompress(gz, engine="native")
        best = min(best, time.monotonic() - t0)
    assert out2 == data
    print(f"engine native decode ({MB} MiB, threads): {len(data)/best/1e6:.0f} MB/s")


if __name__ == "__main__":
    main()
