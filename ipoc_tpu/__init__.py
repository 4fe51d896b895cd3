"""ipoc_tpu — TPU-native interior-point parallel-in-time optimal control.

A ground-up TPU-first framework with the capabilities of the reference
``noc`` library (casiacob/ip-parallel-optimal-control) plus its external
``paroc`` dependency, re-designed for JAX/XLA/Pallas on TPU device meshes.
"""

import os as _os

import jax as _jax

# TPU matmuls default to bf16 MXU passes for f32 inputs; for an
# interior-point solver chasing ||grad||_inf < 1e-4 through chains of
# thousands of small matrix products, that default is catastrophic
# (measured: relative error ~1e1 in the T=1000 costate scan vs 4e-4 at full
# f32).  The matrices here are tiny, so full-precision passes cost nothing.
# Opt out with IPOC_MATMUL_PRECISION=default.
_prec = _os.environ.get("IPOC_MATMUL_PRECISION", "highest")
if _prec != "default":
    _jax.config.update("jax_default_matmul_precision", _prec)

from ipoc_tpu.config import (
    BATCH_CONFIG,
    DEFAULT_CONFIG,
    FAST_CONFIG,
    SolverConfig,
)
from ipoc_tpu.problem import (
    OCP,
    Derivatives,
    LinearizedOCP,
    barrier_ocp,
    log_barrier,
    unconstrained_ocp,
)
from ipoc_tpu.solvers import (
    interior_point_ddp,
    par_interior_point_optimal_control,
    seq_interior_point_optimal_control,
    solve_stream,
)
from ipoc_tpu.parallel import (
    LQT,
    newton_lqt,
    par_bwd_pass,
    par_costates,
    par_fwd_pass,
    seq_bwd_pass,
    seq_costates,
    seq_fwd_pass,
)

__version__ = "0.1.0"
