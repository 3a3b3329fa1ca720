"""Native (C) runtime components.

The hot host-side paths that the reference implements in Go/AVX2 assembly are
implemented here as a small C extension (built lazily with the system
toolchain): the FITS payload decoder (byteswap + scale + inline stats). All
callers gate on availability and fall back to vectorized numpy.
"""

from nightlight_tpu.native import fitsio  # noqa: F401
