from triad_tpu.parallel.dp import (
    distributed_av_loss,
    distributed_tv_loss,
    make_mesh,
)

__all__ = ["distributed_av_loss", "distributed_tv_loss", "make_mesh"]
