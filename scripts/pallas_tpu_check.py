"""Differential + timing of the pallas wave pipeline vs the XLA wave,
on the real chip. Run WITHOUT the test conftest (real backend)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

print("backend:", jax.devices())

from tpu_deflate.codec import decode_jax as dj  # noqa: E402
from tpu_deflate.codec import decode_jax_v2 as v2  # noqa: E402
from tpu_deflate.codec import decode_pallas as dp  # noqa: E402
from tpu_deflate.codec.profile import profile_compress_host  # noqa: E402

print("pallas_available:", dp.pallas_available())

rng = np.random.default_rng(3)
words = [rng.integers(97, 123, rng.integers(2, 9), dtype=np.uint8) for _ in range(50)]
data = np.concatenate([words[i] for i in rng.integers(0, 50, 600000)]).tobytes()[:2_000_000]
gz = profile_compress_host(data)
buf = np.frombuffer(gz, dtype=np.uint8)
members = dj.split_members(buf)
payloads = [buf[m.payload_start : m.end - 8].tobytes() for m in members]
print(f"members={len(payloads)} payload_mb={sum(map(len, payloads))/1e6:.2f}")

L = v2._bucket(len(payloads), v2.V2_L_BUCKETS)
w = v2._prep_wave(payloads, L, buckets=dp.P_BUCKETS_PALLAS)

t0 = time.time()
ref = [np.asarray(x) for x in v2._run_wave_unfused(w)]
print(f"xla compile+run: {time.time()-t0:.2f}s")
t0 = time.time()
got = [np.asarray(x) for x in v2._run_wave_pallas(w)]
print(f"pallas compile+run: {time.time()-t0:.2f}s")

np.testing.assert_array_equal(got[1], ref[1])
np.testing.assert_array_equal(got[2], ref[2])
np.testing.assert_array_equal(got[3], ref[3])
np.testing.assert_array_equal(got[4], ref[4])
np.testing.assert_array_equal(got[5], ref[5])
assert not bool(got[6])
for i in range(len(payloads)):
    n = int(ref[1][i])
    np.testing.assert_array_equal(got[0][i, :n], ref[0][i, :n])
print("DIFFERENTIAL OK")

# Warm timing
payload_bytes = sum(map(len, payloads))
for name, fn in (("xla", v2._run_wave_unfused), ("pallas", v2._run_wave_pallas)):
    best = 1e9
    for _ in range(5):
        t0 = time.time()
        out = fn(w)
        jax.block_until_ready(out[:2])
        best = min(best, time.time() - t0)
    print(f"{name}: {best*1e3:.1f} ms  payload {payload_bytes/best/1e6:.1f} MB/s"
          f"  uncompressed {len(data)/best/1e6:.1f} MB/s")
