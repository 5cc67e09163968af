"""Numeric constants shared across the renderer.

Mirrors the compile-time constants of the reference renderer
(reference: implementation/src/Defines.h:57-63) so that images are
comparable.  Everything here is a plain Python float/int — JAX traces
them as compile-time constants.
"""

PI = 3.1415926535897932384626433832795
TWO_PI = 2.0 * PI
INV_PI = 1.0 / PI
INV_FOURPI = 1.0 / (4.0 * PI)

# Intersection / offset epsilon (reference: Defines.h:62 `EPSILON 0.00001f`).
EPSILON = 1e-5
DENOM_EPS = EPSILON

# Default maximum path length before forced termination
# (reference: Config.h PathTracingConfig max_path_length = 1000).
MAX_PATH_LENGTH = 1000
