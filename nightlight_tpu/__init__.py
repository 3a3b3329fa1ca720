"""nightlight_tpu: a TPU-native astrophotography processing framework.

A ground-up JAX/XLA/Pallas rebuild of the capability set of mlnoga/nightlight
(reference: /root/reference): FITS ingest, calibration, debayering, cosmetic
correction, robust statistics, star detection, triangle alignment, outlier-
rejection stacking, (L)RGB / narrowband combination, HSLuv-space curves, and
FITS/TIFF/JPEG export -- exposed through a CLI, a JSON job DSL, and a REST
live-stacking server.

Design stance (see SURVEY.md section 7): the compute path is jitted XLA graphs
plus Pallas kernels operating on device-resident float32 planes; the host side
is a thin ingest/scheduling layer. The JSON job spec (operator `type` tags) and
the per-frame ID-prefixed log line format are kept compatible with the
reference because they are API surface.
"""

__version__ = "0.1.0"

from nightlight_tpu.image import Image  # noqa: F401
