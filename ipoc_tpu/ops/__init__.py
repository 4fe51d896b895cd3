from ipoc_tpu.ops.derivatives import (
    check_feasibility,
    compute_derivatives,
    compute_lqr_params,
)
from ipoc_tpu.ops import linalg
