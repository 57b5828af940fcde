"""Native (C++) host-side components — the non-Python runtime layer.

`libmaa3io.so` is built on demand from loader.cpp (g++ is part of the image);
Python binds via ctypes. If the toolchain is unavailable the callers fall
back to the pure-numpy paths transparently.
"""

from maa3_tpu.native.io import NativeLoader, native_available
