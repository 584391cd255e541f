"""Characterize the TPU tunnel: RTT, upload/download bandwidth, dispatch cost,
and whether concurrent requests from two threads overlap or serialize.

The serving pipeline's per-scan cost = device compute + (round trips x RTT) if
the tunnel serializes — this script decides how aggressively to fuse dispatches
(pipelines/tgn.py). Run ALONE (tunnel contention corrupts everything).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)


def timeit(fn, n=20):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


# RTT: null-ish execute + tiny fetch
tiny = jnp.zeros((8,), jnp.float32)
inc = jax.jit(lambda x: x + 1)
inc(tiny).block_until_ready()
print(f"tiny execute+fetch:      {timeit(lambda: np.asarray(inc(tiny))):7.1f} ms")

# pure fetch of a tiny device-resident array
print(f"tiny fetch:              {timeit(lambda: np.asarray(tiny)):7.1f} ms")

# upload bandwidth
for mb in (0.5, 3.0):
    x = np.ones((int(mb * 262144),), np.float32)
    dt = timeit(lambda: jax.device_put(x).block_until_ready(), n=10)
    print(f"upload {mb:4.1f} MB:          {dt:7.1f} ms  ({mb / dt * 1e3:6.0f} MB/s)")

# download bandwidth — fetch FRESH device-computed arrays (re-fetching one
# resident array measures the client's host-side cache: a device_put'd or
# once-fetched array costs ~0 ms; round-2's "downloads are free" reading was
# this artifact). The fresh results are PRE-DISPATCHED before the timed
# region so each sample pays the transfer, not transfer + a ~25 ms execute
# dispatch RTT (round-3 advisor: timing np.asarray(_dl(...)) per iteration
# roughly doubled the apparent per-MB cost at 0.5 MB).
_dl = jax.jit(lambda x, s: x + s)
for mb in (0.5, 3.0):
    d0 = jax.device_put(np.ones((int(mb * 262144),), np.float32))
    _dl(d0, 0.0).block_until_ready()
    n_dl = 10
    results = [_dl(d0, float(i + 1)) for i in range(n_dl + 1)]
    np.asarray(results[0])  # sync: all dispatches complete behind this one
    t0 = time.perf_counter()
    for r in results[1:]:
        np.asarray(r)
    dt = (time.perf_counter() - t0) / n_dl * 1e3
    print(f"download {mb:4.1f} MB:        {dt:7.1f} ms  ({mb / dt * 1e3:6.0f} MB/s)")

# does a tuple fetch pay one RTT or k?
d3 = tuple(jnp.ones((1024,), jnp.float32) * i for i in range(6))
jax.block_until_ready(d3)
print(f"6-array tuple device_get:{timeit(lambda: jax.device_get(d3)):7.1f} ms")

# concurrency: two threads running medium matmuls — overlap or serialize?
m = jnp.ones((2048, 2048), jnp.bfloat16)
mm = jax.jit(lambda a: a @ a)
mm(m).block_until_ready()
one = timeit(lambda: np.asarray(mm(m)[0, 0]), n=10)
print(f"matmul+fetch 1 thread:   {one:7.1f} ms")

from concurrent.futures import ThreadPoolExecutor

def worker(_):
    return np.asarray(mm(m)[0, 0])

with ThreadPoolExecutor(2) as ex:
    list(ex.map(worker, range(2)))  # warm
    t0 = time.perf_counter()
    for _ in range(10):
        list(ex.map(worker, range(4)))
    per = (time.perf_counter() - t0) / 40 * 1e3
print(f"matmul+fetch 2 threads:  {per:7.1f} ms/call "
      f"({'overlaps' if per < 0.75 * one else 'serializes'})")

# dispatch pipelining: 8 dependent executes, ONE readback — per-execute cost
@jax.jit
def chain8(x):
    for _ in range(8):
        x = x @ x
    return x

x8 = jnp.ones((512, 512), jnp.float32) * 1e-3
chain8(x8).block_until_ready()
async_disp = timeit(lambda: np.asarray(
    [mm(m) for _ in range(8)][-1][0, 0]), n=5) / 8
print(f"8 async executes, 1 readback: {async_disp:5.1f} ms/execute")
