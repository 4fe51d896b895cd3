"""Mega-kernel vs two-launch packed stream on the TPU chip.

Ground-truth methodology (docs/PERFORMANCE.md): time a pool drain through
``solve_stream`` and divide by the stream's step counter.  Compares the
two-launch packed stream (r3 production) against the resident
k-iterations-per-launch mega-kernel (IPOC_MEGA_KERNEL=1).

Usage: python scripts/mega_bench.py [B] [T] [POOLX]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import ipoc_tpu  # noqa: E402
from ipoc_tpu.models import cartpole  # noqa: E402
from ipoc_tpu.solvers.batched import make_batch  # noqa: E402
from ipoc_tpu.solvers.stream import solve_stream  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
T = int(sys.argv[2]) if len(sys.argv) > 2 else 100
POOLX = int(sys.argv[3]) if len(sys.argv) > 3 else 16
REFILL = int(sys.argv[4]) if len(sys.argv) > 4 else 16

cfg = ipoc_tpu.BATCH_CONFIG
ocp = cartpole.make_ocp(1.0 / T)
x0 = cartpole.initial_state(jnp.float32)
u0, x0b = make_batch(jax.random.PRNGKey(1), x0, B, T, 1,
                     state_scale=0.01, control_scale=0.1, dtype=jnp.float32)
uN = jnp.tile(u0, (POOLX, 1, 1))
xN = jnp.tile(x0b, (POOLX, 1))


def sync(x):
    jax.block_until_ready(x)
    return np.asarray(x)


print(f"B={B} T={T} POOLX={POOLX} platform={jax.devices()[0].platform}",
      flush=True)

for mega in (False, True):
    os.environ["IPOC_MEGA_KERNEL"] = "1" if mega else "0"
    os.environ["IPOC_PACKED_STREAM"] = "1"
    stream = jax.jit(lambda u, x: solve_stream(ocp, u, x, cfg, lanes=B,
                                               refill_every=REFILL))
    t0 = time.perf_counter()
    sol = stream(uN, xN)
    sync(sol.iterations)
    print(f"  compile+first run {time.perf_counter() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sol = stream(uN, xN)
        steps = int(sync(sol.steps))
        ts.append(time.perf_counter() - t0)
    dtm = sorted(ts)[1]
    name = "mega" if mega else "two-launch"
    print(f"stream[{name:10s}]: {dtm / steps * 1e6:9.1f} us/step  "
          f"({steps} steps, {dtm:.3f} s, {B * POOLX / dtm:.0f} solves/s, "
          f"mean_it={float(np.mean(sync(sol.iterations))):.1f})", flush=True)
