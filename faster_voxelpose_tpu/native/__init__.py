"""Native host-side kernels (C++ via ctypes).

Compiled lazily with the system toolchain into _cache/; the pure-Python
paths remain as fallbacks so the framework works without a compiler.
"""

from .build import (  # noqa: F401
    load_render_lib,
    load_warp_lib,
    native_available,
    normalize_u8_native,
    warp_normalize_native,
)
