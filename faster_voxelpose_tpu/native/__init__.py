"""Native host-side kernels (C++ via ctypes).

Compiled lazily with the system toolchain into _cache/; the pure-Python
paths remain as fallbacks so the framework works without a compiler.
"""

from .build import load_render_lib, native_available  # noqa: F401
