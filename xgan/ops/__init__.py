from xgan.ops.conv import conv2d, conv_transpose2d
from xgan.ops.norm import batch_norm_train, batch_norm_infer

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "batch_norm_train",
    "batch_norm_infer",
]
