from ipoc_tpu.models import (
    cartpole,
    double_integrator,
    pendulum,
    quadrotor,
    unicycle,
)
