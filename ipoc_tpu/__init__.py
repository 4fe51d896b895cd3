"""ipoc_tpu — TPU-native interior-point parallel-in-time optimal control.

A ground-up TPU-first framework with the capabilities of the reference
``noc`` library (casiacob/ip-parallel-optimal-control) plus its external
``paroc`` dependency, re-designed for JAX/XLA/Pallas on TPU device meshes.
"""

from ipoc_tpu.config import DEFAULT_CONFIG, FAST_CONFIG, SolverConfig
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
