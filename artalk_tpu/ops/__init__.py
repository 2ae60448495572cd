"""TPU compute primitives: exact-resampling matrices, fused attention, filters."""

from .resample1d import area_resize_matrix, linear_resize_matrix, resize_area, resize_linear
from .savgol import savgol_coeffs, savgol_smooth, smooth_motion_savgol

__all__ = [
    "area_resize_matrix",
    "linear_resize_matrix",
    "resize_area",
    "resize_linear",
    "savgol_coeffs",
    "savgol_smooth",
    "smooth_motion_savgol",
]
