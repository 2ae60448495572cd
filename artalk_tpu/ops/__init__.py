"""TPU compute primitives: exact resampling, filters, and Pallas kernels."""

from .attention import flash_attention
from .resample1d import area_resize_matrix, linear_resize_matrix, resize_area, resize_linear
from .resize2d import resize_antialias, resize_bilinear
from .savgol import savgol_coeffs, savgol_smooth, smooth_motion_savgol

__all__ = [
    "area_resize_matrix",
    "linear_resize_matrix",
    "resize_area",
    "resize_linear",
    "resize_antialias",
    "resize_bilinear",
    "savgol_coeffs",
    "savgol_smooth",
    "smooth_motion_savgol",
    "flash_attention",
]
