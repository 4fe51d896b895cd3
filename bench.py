"""Benchmark driver: batched constrained-cartpole H=100 IP solves/s.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

On terminal failure (e.g. TPU backend outage) it still prints one parseable
JSON line with an ``"error"`` field instead of dying with a raw traceback,
and exits nonzero.  Backend availability is probed in a subprocess with a
timeout first (the failure mode includes indefinite hangs, not just init
errors), with bounded retry + backoff.

Protocol follows the reference harness (1 untimed warmup to exclude compile,
then timed reps with ``block_until_ready``, median reported — reference
examples/cartpole_runtime.py:115-174), adapted to the TPU throughput story:
a streamed pool of full interior-point solves per timed rep.

Baseline: the reference repo publishes no numbers (BASELINE.md). The
denominator used for ``vs_baseline`` is the BASELINE.json north-star target
pro-rated to one chip: 1e4 solves/s on a v5p-16 (8 chips) => 1250 solves/s
per chip.  vs_baseline > 1 beats the per-chip north star.

The default mode runs BOTH streaming executors and reports the FASTER
one as the ``value`` with its quality record attached.  Multigrid was
PROMOTED to headline eligibility in r5 after the statistics were
settled (VERDICT r4 #5): on a 1.31M-scenario pool the mg solutions on
basin-switched lanes are STRICTLY BETTER than the faithful cold solves
(-0.455% +/- 0.046% SEM, ~9.8 SEM below zero, win-frac 0.543, switch
1.72%, matched lanes equal to 2.2e-6 —
bench_results/BENCH_mg_sem_r05.json), so multigrid is not a quality
trade; on models where the faithful SINGLE-GRID stream (one cold solve
per scenario — reference semantics; basin switching impossible by
construction) is simply faster (pendulum H=100), it stays the
headline.  Both numbers always appear (``"multigrid"`` /
``"single_grid"``).  Set IPOC_BENCH_QUALITY=0 to skip the gate and
report raw multigrid throughput.

Env knobs: IPOC_BENCH_BATCH (default 4096 lanes), IPOC_BENCH_POOL (default
32x lanes), IPOC_BENCH_REPS (default 5), IPOC_BENCH_HORIZON (default 100),
IPOC_BENCH_MODE (mg|stream|batch|nmpc), IPOC_BENCH_REFILL (default 16),
IPOC_BENCH_COARSEN (default 4), IPOC_BENCH_QUALITY (default 1 in mg and
stream modes), IPOC_BENCH_PROBE_RETRIES (default 4; 0 skips the probe),
IPOC_BENCH_IMPL (''|seq|ddp), IPOC_BENCH_DDP_PREDICTOR (0/1),
IPOC_BENCH_NMPC_STEPS / IPOC_BENCH_NMPC_CAP (nmpc mode: closed-loop steps
per rep and Newton-iteration cap per warm resolve).
"""

import json
import os
import statistics
import subprocess
import sys
import time

# Round-2 characterization of the single-launch parallel Newton-trial
# kernel (ops/pallas/newton_kernel.py): it only affects newton_impl="par"
# trials — bench modes all run newton_impl="fused" — and on its own path it
# WINS latency (cartpole par solve, median of 10: H=100 49.9 vs 54.9 ms,
# H=1000 74.7 vs 100.4 ms), so it stays at its default (on).

MODEL = os.environ.get("IPOC_BENCH_MODEL", "cartpole")
# 4096 lanes + 32-sublane packing measured best on v5e (docs/PERFORMANCE.md:
# mg headline 172.1k at B=4096 vs 168.0k at B=2048).
BATCH = int(os.environ.get("IPOC_BENCH_BATCH", "4096"))
# Deep pools amortize the stream's drain tail: steps/scenario falls toward
# mean_iterations/lanes as generations grow (docs/PERFORMANCE.md).
POOL = int(os.environ.get("IPOC_BENCH_POOL", str(32 * BATCH)))
REPS = int(os.environ.get("IPOC_BENCH_REPS", "5"))
HORIZON = int(os.environ.get("IPOC_BENCH_HORIZON", "100"))
MODE = os.environ.get("IPOC_BENCH_MODE", "mg")
IMPL = os.environ.get("IPOC_BENCH_IMPL", "")
COARSEN = int(os.environ.get("IPOC_BENCH_COARSEN", "4"))
# K=32 capture/refill cadence measured best for the packed stream (r3
# sg sweep at B=4096: K=16/24/32 -> 166.3/170.0/170.9k solves/s — the
# packed step is cheap enough that the amortized capture overhead and
# the <=K-1-step idle of finished lanes favor a deeper cadence).
REFILL = int(os.environ.get("IPOC_BENCH_REFILL", "32"))
QUALITY = os.environ.get("IPOC_BENCH_QUALITY", "1") != "0"
PROBE_RETRIES = int(os.environ.get("IPOC_BENCH_PROBE_RETRIES", "4"))
# Cold backend init through the tunnel can exceed 300s right after another
# process released the chip (observed: two 300s probe timeouts, then
# success); 480s keeps one probe attempt long enough to ride that out.
PROBE_TIMEOUT = float(os.environ.get("IPOC_BENCH_PROBE_TIMEOUT", "480"))
# Set IPOC_BENCH_PLATFORM=cpu for a hardware-free smoke run of the whole
# pipeline (tiny sizes recommended); skips the accelerator probe.
PLATFORM = os.environ.get("IPOC_BENCH_PLATFORM", "")
DT = 1.0 / HORIZON  # reference sweep keeps H * dt = 1 s
NORTH_STAR_PER_CHIP = 1e4 / 8.0

NMPC_STEPS = int(os.environ.get("IPOC_BENCH_NMPC_STEPS", "25"))
NMPC_CAP = int(os.environ.get("IPOC_BENCH_NMPC_CAP", "25"))

METRIC = (f"{MODEL}_h{HORIZON}_"
          + (f"{IMPL}_" if IMPL else "")
          + ("nmpc_resolves_per_sec" if MODE == "nmpc"
             else "ip_solves_per_sec"))
UNIT = "resolves/s/chip" if MODE == "nmpc" else "solves/s/chip"


def emit_error(msg: str) -> None:
    print(json.dumps({
        "metric": METRIC, "value": None, "unit": UNIT,
        "vs_baseline": None, "error": msg[-2000:],
    }))


def probe_backend() -> None:
    """Verify the accelerator backend actually executes, in a subprocess
    with a hard timeout (outages manifest as hangs as well as init errors:
    BENCH_r01.json).  Bounded retry with backoff; raises on exhaustion."""
    if PROBE_RETRIES <= 0:  # explicit skip (e.g. known-warm backend)
        return
    code = (
        "import jax, numpy as np;"
        "x = jax.numpy.ones((128, 128));"
        "assert float(np.asarray(x @ x)[0, 0]) == 128.0;"
        "print('backend-ok', jax.devices()[0].platform)"
    )
    delay = 30.0
    last = "unknown"
    for attempt in range(1, PROBE_RETRIES + 1):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                text=True, timeout=PROBE_TIMEOUT,
            )
            if r.returncode == 0 and "backend-ok" in r.stdout:
                return
            last = (r.stderr or r.stdout).strip().splitlines()[-1] if (
                r.stderr or r.stdout).strip() else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            last = f"probe timed out after {PROBE_TIMEOUT:.0f}s"
        if attempt < PROBE_RETRIES:
            print(f"# backend probe attempt {attempt} failed ({last}); "
                  f"retrying in {delay:.0f}s", file=sys.stderr)
            time.sleep(delay)
            delay *= 2
    raise RuntimeError(f"backend unavailable after {PROBE_RETRIES} probe "
                       f"attempts: {last}")


def run() -> dict:
    import jax

    if PLATFORM:  # smoke-test escape hatch (the env pins JAX_PLATFORMS)
        jax.config.update("jax_platforms", PLATFORM)
    import jax.numpy as jnp
    import numpy as np

    def _sync(x):
        """Force completion: on the remote-attached TPU platform used here,
        ``block_until_ready`` returns before execution finishes; a host
        fetch is the only reliable barrier."""
        jax.block_until_ready(x)
        return np.asarray(x)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    import ipoc_tpu
    from ipoc_tpu.models import cartpole, pendulum, quadrotor, unicycle
    from ipoc_tpu.solvers.batched import make_batch, solve_batch
    from ipoc_tpu.solvers.stream import solve_stream, solve_stream_multigrid
    from ipoc_tpu.utils.integrators import rollout

    models = {"cartpole": cartpole, "pendulum": pendulum,
              "quadrotor": quadrotor, "unicycle": unicycle}
    model = models[MODEL]
    ocp = model.make_ocp(DT)
    x0 = model.initial_state(jnp.float32)
    n_scen = POOL if MODE in ("stream", "mg") else BATCH
    nu = 2 if MODEL in ("quadrotor", "unicycle") else 1
    u0, x0b = make_batch(
        jax.random.PRNGKey(1), x0, n_scen, HORIZON, nu,
        state_scale=0.01, control_scale=0.1, dtype=jnp.float32,
    )
    if MODEL == "quadrotor":
        # shift the random warm start around hover thrust (feasible box)
        u0 = u0 + quadrotor.hover_controls(HORIZON, jnp.float32)[None]
    cfg = ipoc_tpu.BATCH_CONFIG
    if os.environ.get("IPOC_BENCH_BARRIER"):
        cfg = cfg.replace(barrier_mode=os.environ["IPOC_BENCH_BARRIER"])
    if IMPL:
        # e.g. IPOC_BENCH_IMPL=ddp — IP-DDP through the same stream
        # machinery (VERDICT r1 #5); seq/par select the Newton evaluator.
        cfg = cfg.replace(newton_impl=IMPL)
        if IMPL == "ddp":
            # Stage predictor on the DDP path: MEASURED r3 on hardware
            # (B=2048: mg 150.9k -> 169.3k solves/s with predictor ON,
            # sg 103.7k -> 105.2k; BENCH_ddp*_r03.json) — default ON.
            # IPOC_BENCH_DDP_PREDICTOR=0 reverts to plain warm starts.
            pred = os.environ.get("IPOC_BENCH_DDP_PREDICTOR", "1")
            cfg = cfg.replace(stage_predictor=pred == "1")

    if MODE == "nmpc":
        # Warm-started NMPC throughput on the headline config (VERDICT r2
        # #4): B independent receding-horizon controllers in lockstep, the
        # whole closed loop ONE XLA program; every step is a warm-started
        # IP resolve from the previous plan (reference MPC-loop semantics:
        # examples/linear_mpc_parallel.py:67-81, warm start by re-solve).
        from ipoc_tpu.mpc import (
            nmpc_loop,
            nmpc_loop_batched,
            nmpc_loop_batched_warm,
        )
        from ipoc_tpu.solvers.packed_stream import (
            batch_packed_eligible,
            solve_batch_packed,
        )

        ncfg = cfg.replace(max_newton_iters=NMPC_CAP)

        # r5 (VERDICT r4 #4): warm barrier re-entry for the replan loop.
        # The FIRST resolve runs the full cold schedule TO CONVERGENCE
        # (cfg's own per-stage cap — a capped, non-converged first plan
        # poisons several subsequent resolves, measured census); every
        # later resolve re-enters at bp=NMPC_WARM_BP from the
        # controller's own previous plan (plan continuity) with per-lane
        # cold fallback, capped at NMPC_WARM_CAP per stage.  Measured at
        # 4096 controllers: 12.74 -> 8.54 ms/step (479k resolves/s),
        # closed-loop realized cost identical to the fully-converged
        # resolver loop and 0.86% BETTER than the r4 capped-cold
        # protocol on the 90.7% of controllers that differ (win-frac
        # 0.981).  IPOC_BENCH_NMPC_WARM=0 reverts to the r4 protocol.
        NMPC_WARM = os.environ.get("IPOC_BENCH_NMPC_WARM", "1") == "1"
        NMPC_WARM_BP = float(os.environ.get("IPOC_BENCH_NMPC_WARM_BP",
                                            "0.02"))
        NMPC_WARM_CAP = int(os.environ.get("IPOC_BENCH_NMPC_WARM_CAP",
                                           "12"))
        wcfg = cfg.replace(max_newton_iters=NMPC_WARM_CAP)

        # r4: the lockstep replan step through the packed mega-kernel
        # batch solver (ONE resident launch per k-block instead of the
        # vmapped staged program) — flat-mode per-lane semantics, pinned
        # ≡ staged.  IPOC_BENCH_NMPC_PACKED=0 reverts to the r3 path.
        # batch_packed_eligible also checks the mega VMEM fit (long
        # horizons) and the mega kill switches, falling back to the
        # vmapped loop instead of raising.
        nmpc_packed = (
            os.environ.get("IPOC_BENCH_NMPC_PACKED", "1") == "1"
            and batch_packed_eligible(ncfg, jnp.float32, x0.shape[-1],
                                      nu, HORIZON, BATCH)
        )
        if nmpc_packed:
            def solve_b(u_warm, x):
                u, _ = solve_batch_packed(ocp, u_warm, x, ncfg)
                return u

            def solve_full(u_warm, x):
                u, _ = solve_batch_packed(ocp, u_warm, x, cfg, k_block=8)
                return u

            def solve_warm(u_warm, x):
                u, _ = solve_batch_packed(ocp, u_warm, x, wcfg, k_block=8,
                                          bp_entry=NMPC_WARM_BP)
                return u

            def loop_fn(x, u):
                # the loops return (steps, B, ...); normalize to the
                # vmapped branch's (B, steps, ...) layout so every
                # downstream consumer is branch-independent.
                if NMPC_WARM:
                    xs, us = nmpc_loop_batched_warm(
                        solve_full, solve_warm, ocp.dynamics, x, u,
                        NMPC_STEPS)
                else:
                    xs, us = nmpc_loop_batched(
                        solve_b, ocp.dynamics, x, u, NMPC_STEPS)
                return xs.swapaxes(0, 1), us.swapaxes(0, 1)

            loop = jax.jit(loop_fn)
        else:
            def solve(u_warm, x):
                u, _ = ipoc_tpu.par_interior_point_optimal_control(
                    ocp, u_warm, x, ncfg
                )
                return u

            loop = jax.jit(jax.vmap(
                lambda x, u: nmpc_loop(solve, ocp.dynamics, x, u,
                                       NMPC_STEPS)
            ))
        u0b = jnp.zeros((BATCH, HORIZON, nu), jnp.float32)
        x0c = x0b[:BATCH]
        xs, us = loop(x0c, u0b)
        _sync(xs[:, -1])
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            xs, us = loop(x0c, u0b)
            _sync(xs[:, -1])
            times.append(time.perf_counter() - t0)
        med = statistics.median(times)
        n_resolves = BATCH * NMPC_STEPS
        return {
            "metric": METRIC,
            "value": round(n_resolves / med, 3),
            "unit": UNIT,
            "vs_baseline": round(n_resolves / med / NORTH_STAR_PER_CHIP, 4),
            "nmpc": {
                "controllers": BATCH,
                "steps": NMPC_STEPS,
                "iter_cap": NMPC_CAP,
                "per_step_ms": round(med / NMPC_STEPS * 1e3, 3),
                "replan_budget_ms": round(DT * 1e3, 3),
                "max_abs_u": float(np.abs(np.asarray(us)).max()),
                "packed_mega_resolver": nmpc_packed,
                "warm_entry": (
                    {"bp_entry": NMPC_WARM_BP, "warm_cap": NMPC_WARM_CAP,
                     "first_solve": "cold full schedule to convergence"}
                    if (nmpc_packed and NMPC_WARM) else None),
            },
        }

    mode = MODE
    if mode == "mg" and HORIZON % COARSEN != 0:
        print(f"# horizon {HORIZON} not divisible by coarsen {COARSEN}; "
              "falling back to single-grid stream", file=sys.stderr)
        mode = "stream"
    if mode == "mg":
        ocp_c = model.make_ocp(DT * COARSEN)
        # Coarse-level evaluator (VERDICT r3 #2): the +2.1% switched-lane
        # cost was decided at the COARSE level — a DDP coarse solve
        # (nonlinear closed-loop rollouts) lands in quality-neutral basins
        # (r4 diagnostic scripts/mg_quality.py: switch 2.26% at +2.01%
        # with the Newton coarse vs 1.64% at -0.32% +- 0.29% SE with the
        # DDP coarse; fine-level impl is irrelevant — identical results).
        # Default "ddp" for the Newton mg mode; IPOC_BENCH_MG_COARSE=fused
        # reverts.  DDP bench runs (IMPL=ddp) already use ddp everywhere.
        mg_coarse = os.environ.get("IPOC_BENCH_MG_COARSE", "ddp")
        step = jax.jit(lambda u, x: solve_stream_multigrid(
            ocp, ocp_c, COARSEN, u, x, cfg, lanes=BATCH,
            refill_every=REFILL,
            coarse_impl=None if mg_coarse == cfg.newton_impl else mg_coarse))
    elif mode == "stream":
        step = jax.jit(lambda u, x: solve_stream(
            ocp, u, x, cfg, lanes=BATCH, refill_every=REFILL))
    else:
        step = jax.jit(lambda u, x: solve_batch(ocp, u, x, cfg))

    # Warmup (compile) — excluded from timing, reference protocol.
    sol = step(u0, x0b)
    _sync(sol.iterations)

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sol = step(u0, x0b)
        _sync(sol.iterations)
        times.append(time.perf_counter() - t0)
    if os.environ.get("IPOC_BENCH_DEBUG"):
        print("times:", times, file=sys.stderr)
        print("iters:", sol.iterations.min(), sol.iterations.max(),
              file=sys.stderr)

    med = statistics.median(times)
    payload = {
        "metric": METRIC,
        "value": round(n_scen / med, 3),
        "unit": UNIT,
        "vs_baseline": round(n_scen / med / NORTH_STAR_PER_CHIP, 4),
    }

    if mode == "stream" and QUALITY:
        # Single-grid stream: one faithful cold solve per scenario
        # (reference semantics, par_interior_point_newton.py:228-254;
        # per-lane ≡ flat ≡ staged-single pinned by tests/test_stream.py) —
        # no basin-switch caveat by construction.  Report convergence
        # health + the pool's raw converged cost.
        def raw_cost(u, x0s):
            x = rollout(ocp.dynamics, u, x0s)
            return ocp.total_cost(x, u, jnp.asarray(1e-9, u.dtype))

        costs = _sync(jax.jit(jax.vmap(raw_cost))(sol.controls, x0b)
                      ).astype(np.float64)
        iters = _sync(sol.iterations)
        payload["quality"] = {
            "basin_switch_frac": 0.0,
            "mean_signed_rel_cost_delta_switched": 0.0,
            "semantics": "single-grid: one faithful cold solve/scenario",
            "mean_iterations": round(float(iters.mean()), 2),
            "max_iterations": int(iters.max()),
            "mean_raw_cost": float(costs.mean()),
            "frac_nonfinite_cost": float(
                (~np.isfinite(costs)).mean()),
        }

    if mode == "mg" and QUALITY:
        # r5 PROMOTION (VERDICT r4 #5, decided by statistics): the bench
        # ``value`` is now the MULTIGRID stream, gate attached.  History:
        # r2 demoted mg from the headline because its switched lanes
        # averaged +2.1% WORSE raw cost; r4's DDP coarse level made them
        # neutral-to-better (-0.39% +/- 0.15% SEM); the r5 big-pool
        # capture (1.31M scenarios, bench_results/BENCH_mg_sem_r05.json)
        # settled it at the verdict's required precision: switched mean
        # -0.455% +/- 0.046% SEM (~9.8 SEM BELOW zero, win-frac 0.543,
        # switch 1.72%, matched mean 2.2e-6) — the mg solutions on
        # switched lanes are STRICTLY BETTER in expectation, so mg is
        # not a quality trade at all.  The faithful single-grid stream
        # (one cold solve per scenario, reference semantics par:228-254)
        # rides along under "single_grid" as provenance.
        mg_value = payload["value"]
        ref_step = jax.jit(lambda u, x: solve_stream(
            ocp, u, x, cfg, lanes=BATCH, refill_every=REFILL))
        ref_sol = ref_step(u0, x0b)
        _sync(ref_sol.iterations)
        sg_times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            ref_sol = ref_step(u0, x0b)
            _sync(ref_sol.iterations)
            sg_times.append(time.perf_counter() - t0)
        sg_med = statistics.median(sg_times)
        payload["single_grid"] = {
            "value": round(n_scen / sg_med, 3),
            "vs_baseline": round(
                n_scen / sg_med / NORTH_STAR_PER_CHIP, 4),
            "quality": {
                "basin_switch_frac": 0.0,
                "mean_signed_rel_cost_delta_switched": 0.0,
                "semantics":
                "single-grid: one faithful cold solve/scenario",
            },
        }

        def raw_cost(u, x0s):
            x = rollout(ocp.dynamics, u, x0s)
            return ocp.total_cost(x, u, jnp.asarray(1e-9, u.dtype))

        costs = jax.jit(jax.vmap(raw_cost))
        c_mg = _sync(costs(sol.controls, x0b)).astype(np.float64)
        c_sg = _sync(costs(ref_sol.controls, x0b)).astype(np.float64)
        rel = np.abs(c_mg - c_sg) / np.maximum(np.abs(c_sg), 1e-12)
        switched = rel > 1e-3  # different local basin, not noise
        matched = ~switched
        sg_value = payload["single_grid"]["value"]
        # Promotion picks the BEST mode per problem: mg where its
        # (settled) gate buys speed; the faithful single-grid stream
        # where it is simply faster (pendulum H=100: sg 763.6k > mg
        # 684.3k, both exact — promoting mg unconditionally would
        # REGRESS such models).
        if mg_value >= sg_value:
            payload["value"] = mg_value
            payload["vs_baseline"] = round(
                mg_value / NORTH_STAR_PER_CHIP, 4)
        else:
            payload["value"] = sg_value
            payload["vs_baseline"] = payload["single_grid"]["vs_baseline"]
        payload["multigrid"] = {
            "value": mg_value,
            "vs_baseline": round(mg_value / NORTH_STAR_PER_CHIP, 4),
            "headline": bool(mg_value >= sg_value),
            "promotion_policy":
            "r5 best-of-mode: mg is headline-ELIGIBLE (cartpole "
            "switched-lane stats settled strictly better, -0.455% +/- "
            "0.046% SEM, BENCH_mg_sem_r05.json); the faster mode per "
            "run is reported as value",
            "quality": {
                "basin_switch_frac": round(float(switched.mean()), 5),
                "mean_rel_cost_delta_matched": float(rel[matched].mean())
                if matched.any() else None,
                "max_rel_cost_delta_matched": float(rel[matched].max())
                if matched.any() else None,
                "mean_signed_rel_cost_delta_switched":
                float(((c_mg - c_sg) / np.maximum(np.abs(c_sg), 1e-12))
                      [switched].mean()) if switched.any() else 0.0,
            },
        }
        if switched.any():
            # Neutrality evidence beyond the mean: the win/loss split and
            # the standard error of the switched-lane mean (a symmetric
            # mix of comparable basins is neutral IN EXPECTATION; the mean
            # alone can sit a fraction of a percent off zero at finite
            # pool sizes).
            sw = ((c_mg - c_sg) / np.maximum(np.abs(c_sg), 1e-12))[switched]
            payload["multigrid"]["quality"].update({
                "switched_win_frac": round(float((sw < 0).mean()), 4),
                "switched_mean_sem": float(sw.std() / np.sqrt(sw.size)),
                "coarse_impl": mg_coarse,
            })
        if mg_value >= sg_value:
            payload["quality"] = payload["multigrid"]["quality"]
        else:
            payload["quality"] = payload["single_grid"]["quality"]
    return payload


def main():
    try:
        if not PLATFORM:
            probe_backend()
        payload = run()
    except Exception as exc:  # noqa: BLE001 — one parseable line, always
        emit_error(f"{type(exc).__name__}: {exc}")
        sys.exit(1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
