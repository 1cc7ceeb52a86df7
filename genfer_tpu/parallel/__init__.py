from .mesh import (
    make_mesh,
    sharded_conv_1d,
    sharded_conv_2d,
    sharded_inference_step,
)

__all__ = [
    "make_mesh",
    "sharded_conv_1d",
    "sharded_conv_2d",
    "sharded_inference_step",
]
