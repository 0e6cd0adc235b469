from .balls import (
    odd_ceil,
    ball_kernel,
    ball_kernel_wrapped,
    fft_ball_conv,
    good_fft_size,
)
from .morphology import dilate, binary_union
from .selection import topn_mask, topn_threshold
from .gwrp import gwrp_pool, gwrp_weights

__all__ = [
    "odd_ceil",
    "ball_kernel",
    "ball_kernel_wrapped",
    "fft_ball_conv",
    "good_fft_size",
    "dilate",
    "binary_union",
    "topn_mask",
    "topn_threshold",
    "gwrp_pool",
    "gwrp_weights",
]
