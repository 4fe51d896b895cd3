from ipoc_tpu.parallel.costates import par_costates, seq_costates, affine_combine
from ipoc_tpu.parallel.lqt import (
    LQT,
    LQTStage,
    lqt_stages,
    newton_lqt,
    par_bwd_pass,
    par_fwd_pass,
    seq_bwd_pass,
    seq_bwd_pass_full,
    seq_fwd_pass,
    stage_gains,
)
