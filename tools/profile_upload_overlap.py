"""Does the tunnel device overlap host->device TRANSFERS with EXECUTES?

Round-5 verdict item 4 decision point: the per-scan device-compute chain
(~420-440 ms) INCLUDES the ~45-60 ms padded-mesh upload. If the axon tunnel
can DMA an upload while a compiled program runs, run_many's worker threads
already have the structure to hide the upload entirely (worth ~+0.3 scans/s
at the current wall); if the device queue serializes transfer-then-execute,
the only lever is shrinking upload BYTES (e.g. int8 normals).

Protocol (run ALONE; chained compute so one readback syncs the whole chain):
  A. wall of a ~200 ms chained compute, nothing else         -> base_compute
  B. wall of k x 1.2 MB f16 uploads, nothing else            -> base_upload
  C. dispatch the compute async, immediately do the k uploads on the SAME
     thread, then sync the compute                           -> same_thread
  D. compute on main thread (dispatch+sync), k uploads from a SECOND thread
     started simultaneously (the run_many shape)             -> two_thread
Overlap verdict: C/D ~= max(A, B) -> overlaps; ~= A + B -> serializes.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

# ~200 ms of real device compute: chained bf16 matmuls (MXU-bound, no
# transfers after dispatch). 2048^3 bf16 matmul ~ 0.09 ms on v5e at peak;
# give it enough iterations that the chain dominates dispatch noise.
M = jnp.ones((4096, 4096), jnp.bfloat16)


@jax.jit
def chain(x, iters):
    def body(_, a):
        return (a @ a) * (1.0 / 4096.0)

    return jax.lax.fori_loop(0, iters, body, x)[0, 0]


ITERS = 256
chain(M, 8).block_until_ready()  # compile
# calibrate: one sync'd run
t0 = time.perf_counter()
np.asarray(chain(M, ITERS))
base = (time.perf_counter() - t0) * 1e3
print(f"compute chain ({ITERS} it): {base:7.1f} ms", flush=True)

K_UP = 8
UP = [np.random.rand(100_000, 6).astype(np.float16) for _ in range(K_UP)]


def do_uploads():
    devs = [jax.device_put(u) for u in UP]
    jax.block_until_ready(devs)
    return devs


do_uploads()  # warm any layout caches
t0 = time.perf_counter()
do_uploads()
base_up = (time.perf_counter() - t0) * 1e3
print(f"{K_UP} x 1.2 MB f16 uploads: {base_up:7.1f} ms "
      f"({K_UP * 1.2 / base_up * 1e3:5.1f} MB/s)", flush=True)

for trial in range(3):
    # C: same-thread async dispatch then uploads
    t0 = time.perf_counter()
    fut = chain(M, ITERS)
    do_uploads()
    np.asarray(fut)
    same_thread = (time.perf_counter() - t0) * 1e3

    # D: two threads (run_many shape)
    res = {}

    def up_worker():
        t = time.perf_counter()
        do_uploads()
        res["up"] = (time.perf_counter() - t) * 1e3

    th = threading.Thread(target=up_worker)
    t0 = time.perf_counter()
    th.start()
    np.asarray(chain(M, ITERS))
    th.join()
    two_thread = (time.perf_counter() - t0) * 1e3

    tot = base + base_up
    print(f"trial {trial}: same_thread {same_thread:7.1f} ms | "
          f"two_thread {two_thread:7.1f} ms (upload leg {res['up']:6.1f}) | "
          f"serial-sum {tot:7.1f} | max {max(base, base_up):7.1f}",
          flush=True)

verdict = "OVERLAPS" if two_thread < 0.8 * (base + base_up) else "SERIALIZES"
print(f"verdict: transfers {verdict} with executes", flush=True)
