"""Speed-of-light (roofline / MFU) accounting for the throughput path.

Answers "is X solves/s fast, or 10x off?" (VERDICT r1 missing #4) by
putting the measured headline against chip peaks:

1. Counts the algorithmic FLOPs of ONE Newton iteration of the benchmark
   configuration with XLA's own cost analysis on the UNFUSED one-iteration
   program (``flat_lane_iter`` with the plain-scan evaluator — numerically
   identical math to the fused Pallas path, so its FLOP count is the
   honest numerator for the kernel path too, which XLA cannot inspect).
2. Multiplies by measured {stream steps x lanes} or {solves/s x mean
   iterations} to get achieved FLOP/s, and divides by peak.
3. Reports the analytic per-lane working set and achieved HBM GB/s, and
   classifies the step as compute-, bandwidth-, or overhead-bound.

Peaks default to TPU v5e (v5 lite): 197 TFLOP/s bf16 matmul, 819 GB/s
HBM.  The solver runs f32 with ``jax_default_matmul_precision=highest``
(~3 bf16 MXU passes per f32 product -> f32-effective matmul peak ~ 1/3 of
bf16); the VPU f32 elementwise peak is ~ (8, 128)-lane * clock, far below
the MXU.  Because the per-stage matrices here are tiny (nx <= 13), the
fused kernels execute almost everything on the VPU — an MXU-normalized
"MFU" therefore understates how close the program is to ITS OWN light
speed; both numbers are printed.

Usage:
    # FLOP counting only (any platform):
    python examples/roofline.py --model cartpole --horizon 100

    # full roofline from a bench measurement:
    python examples/roofline.py --model cartpole --horizon 100 \
        --solves-per-sec 144359 --mean-iters 123
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="cartpole")
    p.add_argument("--horizon", type=int, default=100)
    p.add_argument("--batch", type=int, default=2048,
                   help="lanes, for the batched FLOP count")
    p.add_argument("--solves-per-sec", type=float, default=None)
    p.add_argument("--mean-iters", type=float, default=None,
                   help="mean Newton iterations per solve (bench debug "
                   "output or docs/PERFORMANCE.md)")
    p.add_argument("--peak-tflops-bf16", type=float, default=197.0,
                   help="v5e MXU peak (bf16)")
    p.add_argument("--matmul-passes", type=float, default=3.0,
                   help="bf16 passes per f32 product at precision=highest")
    p.add_argument("--peak-hbm-gbs", type=float, default=819.0)
    p.add_argument("--peak-vpu-tflops", type=float, default=12.3,
                   help="VPU f32 peak estimate: (8,128) lanes x 4 ALUs x "
                   "2 flops x ~1.5 GHz")
    p.add_argument("--path", choices=["fused", "unfused"], default="fused",
                   help="which working-set model to normalize bytes with "
                   "(BATCH_CONFIG streams run the fused kernel)")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    import ipoc_tpu
    from ipoc_tpu.models import cartpole, pendulum, quadrotor, unicycle
    from ipoc_tpu.solvers.ip_newton import FlatLane, flat_lane_init, flat_lane_iter

    model = {"cartpole": cartpole, "pendulum": pendulum,
             "quadrotor": quadrotor, "unicycle": unicycle}[args.model]
    H = args.horizon
    ocp = model.make_ocp(1.0 / H)
    x0 = model.initial_state(jnp.float32)
    nx = x0.shape[0]
    nu = 2 if args.model in ("quadrotor", "unicycle") else 1

    # The unfused one-iteration program, batched over lanes: identical
    # mathematics to the fused kernel path (fused_iter_kernel docstring),
    # countable by XLA.
    cfg = ipoc_tpu.BATCH_CONFIG.replace(
        newton_impl="seq", stage_predictor=False
    )

    def one_iter(lane):
        return flat_lane_iter(ocp, lane, cfg)

    u0 = 0.1 * jnp.ones((args.batch, H, nu), jnp.float32)
    x0b = jnp.broadcast_to(x0, (args.batch, nx))
    lane0 = jax.vmap(lambda u, x: flat_lane_init(ocp, u, x, cfg))(u0, x0b)
    compiled = jax.jit(jax.vmap(one_iter)).lower(lane0).compile()
    ca = compiled.cost_analysis()
    flops_per_step = float(ca.get("flops", 0.0))
    xla_bytes_per_step = float(ca.get("bytes accessed", 0.0))
    flops_per_lane_iter = flops_per_step / args.batch

    # Analytic per-lane working sets per iteration.
    # * unfused: trajectory + controls read/written twice (trial build and
    #   accept) PLUS the per-stage Newton data r/Q/R/M/fx/fu staged through
    #   HBM between the derivative phase and the Riccati kernel.
    # * fused (the production BATCH_CONFIG path): the two-launch kernel
    #   re-derives the model IN-KERNEL (fused_iter_kernel.py) — only the
    #   lane state (x, u) crosses HBM, ~2 reads + 2 writes per iteration.
    stage_data = nu + nx * nx + nu * nu + nx * nu + nx * nx + nx * nu
    lane_state = (H + 1) * nx + H * nu
    bytes_unfused = 4.0 * (2 * 2 * lane_state + H * stage_data)
    bytes_fused = 4.0 * (2 * 2 * lane_state)

    out = {
        "model": args.model, "horizon": H, "nx": nx, "nu": nu,
        "batch": args.batch,
        "flops_per_lane_iter": flops_per_lane_iter,
        "xla_bytes_per_lane_iter": xla_bytes_per_step / args.batch,
        "analytic_bytes_per_lane_iter_unfused": bytes_unfused,
        "analytic_bytes_per_lane_iter_fused": bytes_fused,
        "counted_on_platform": jax.devices()[0].platform,
    }

    if args.solves_per_sec and args.mean_iters:
        iters_per_sec = args.solves_per_sec * args.mean_iters
        achieved_flops = iters_per_sec * flops_per_lane_iter
        path_bytes = bytes_fused if args.path == "fused" else bytes_unfused
        achieved_gbs = iters_per_sec * path_bytes / 1e9
        peak_f32_eff = args.peak_tflops_bf16 / args.matmul_passes
        out.update({
            "path": args.path,
            "solves_per_sec": args.solves_per_sec,
            "mean_iters": args.mean_iters,
            "iters_per_sec": iters_per_sec,
            "achieved_tflops": achieved_flops / 1e12,
            "pct_of_bf16_mxu_peak": 100 * achieved_flops
            / (args.peak_tflops_bf16 * 1e12),
            "pct_of_f32_effective_mxu_peak": 100 * achieved_flops
            / (peak_f32_eff * 1e12),
            "pct_of_vpu_f32_peak": 100 * achieved_flops
            / (args.peak_vpu_tflops * 1e12),
            "achieved_hbm_gbs_analytic": achieved_gbs,
            "pct_of_hbm_peak": 100 * achieved_gbs / args.peak_hbm_gbs,
        })
        # Bound classification.  The per-stage matrices here are tiny
        # (nx <= 13): the fused kernels execute on the VPU, so the VPU
        # fraction — not the MXU one — is the compute axis.  Whichever of
        # {VPU, HBM} holds the larger fraction binds; if both are <25%,
        # the step is overhead-bound (kernel launches, glue ops, sublane
        # padding of nx-wide rows into (8,128) vregs, while-loop sync).
        c = out["pct_of_vpu_f32_peak"]
        b = out["pct_of_hbm_peak"]
        out["bound"] = (
            "overhead" if max(c, b) < 25.0
            else ("compute(vpu)" if c >= b else "bandwidth")
        )
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
