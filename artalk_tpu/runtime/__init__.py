"""Native (C++) host runtime: media kernels behind ctypes bindings.

The compute path of this framework is JAX/XLA/Pallas on TPU; the host runtime
around it (media packaging, audio ingest) is native C++ -- the same division
the reference draws by depending on FFmpeg/libav (SURVEY 2.3). The library is
built on demand with the system toolchain and cached; every entry point has a
pure-NumPy fallback so nothing hard-fails without a compiler.
"""

from .media import (native_available, resample_poly, rgb_to_yuv420, write_y4m)

__all__ = ["native_available", "resample_poly", "rgb_to_yuv420", "write_y4m"]
