from triad_tpu.parallel.dp import (
    distributed_av_loss,
    distributed_tv_loss,
    make_mesh,
)
from triad_tpu.parallel.zero import (
    apply_zero1,
    zero1_state_shardings,
)

__all__ = [
    "distributed_av_loss",
    "distributed_tv_loss",
    "make_mesh",
    "apply_zero1",
    "zero1_state_shardings",
]
