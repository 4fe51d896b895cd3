from ipoc_tpu.utils.integrators import (
    closed_loop_rollout,
    discretize_dynamics,
    euler,
    rollout,
    runge_kutta,
    wrap_angle,
)
