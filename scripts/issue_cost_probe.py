"""Measured VPU per-instruction issue cost on (S, 128) f32 tiles.

Backs the roofline residual attribution (docs/PERFORMANCE.md
"Speed-of-light accounting") with a DIRECT measurement instead of
inference (VERDICT r4 #7): a Pallas kernel issuing a known count of
dependent / independent elementwise vector ops per tile shape, timed on
the chip.  The mega kernel's stage programs are scalar-DAG chains of
exactly such ops (ops/pallas/scalarize.py emits one (S, 128) vreg op
per scalar node), so

    predicted kernel time ~= scalar-op count x measured ns/op

is a testable closure of the "per-instruction issue cost is the
bottleneck" claim.

Usage: python scripts/issue_cost_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL = 64


def make_kernel(S, K, chains):
    def kern(x_ref, o_ref):
        def body(_, carry):
            accs = list(carry)
            for j in range(UNROLL):
                i = j % chains
                # dependent multiply-add chain per accumulator lane set;
                # constants prevent folding, dependence prevents
                # reassociation.
                accs[i] = accs[i] * 1.0000001 + 0.0000003
            return tuple(accs)

        init = tuple(x_ref[0] + float(i) for i in range(chains))
        out = lax.fori_loop(0, K, body, init)
        acc = out[0]
        for a in out[1:]:
            acc = acc + a
        o_ref[0] = acc

    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((1, S, 128), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, 128), lambda: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, S, 128), jnp.float32),
    )


def sync(x):
    jax.block_until_ready(x)
    return np.asarray(x)


def measure(S, chains, K1=20000, K2=100000):
    x = jnp.ones((1, S, 128), jnp.float32)
    f1 = jax.jit(lambda x: make_kernel(S, K1, chains)(x))
    f2 = jax.jit(lambda x: make_kernel(S, K2, chains)(x))
    sync(f1(x)); sync(f2(x))  # noqa: E702
    ts1, ts2 = [], []
    for _ in range(5):
        t0 = time.perf_counter(); sync(f1(x))  # noqa: E702
        ts1.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); sync(f2(x))  # noqa: E702
        ts2.append(time.perf_counter() - t0)
    d1, d2 = sorted(ts1)[2], sorted(ts2)[2]
    # slope removes launch/dispatch overhead: extra (K2-K1)*UNROLL ops
    ns_per_op = (d2 - d1) / ((K2 - K1) * UNROLL) * 1e9
    return ns_per_op


if __name__ == "__main__":
    print(f"platform={jax.devices()[0].platform}")
    for S in (8, 16, 32):
        for chains in (1, 4):
            ns = measure(S, chains)
            kind = "dependent" if chains == 1 else "4-indep  "
            # each op is one fused multiply-add on (S,128) = S*128 lanes
            print(f"S={S:2d} {kind}: {ns:7.3f} ns per (S,128) vector op "
                  f"({ns / (S * 128) * 1e3:7.4f} ps/lane)", flush=True)
