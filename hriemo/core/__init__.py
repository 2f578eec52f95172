from .masking import (
    masked_mean,
    align_mask_to_length,
    build_fused_mask,
    invert_valid_mask,
    mask_to_bias,
)

__all__ = [
    "masked_mean",
    "align_mask_to_length",
    "build_fused_mask",
    "invert_valid_mask",
    "mask_to_bias",
]
