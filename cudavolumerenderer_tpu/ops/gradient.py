"""Density-gradient probes for shading normals and isosurface detection.

Re-expression of the reference's Gradient.h (reference:
implementation/src/Gradient.h:9-39): central/forward finite differences
of the density field in normalized [0, 1] volume coordinates, with
intensity defined as 0 outside the unit cube.  The reference evaluates
these per CUDA thread; here each probe is a masked array program over
the whole wavefront (6 or 4 batched grid samples).

The reference's sign convention is kept: gradient_cd returns
I(p - delta) - I(p + delta) per axis, i.e. MINUS the density gradient —
pointing from dense to sparse, the outward shading-normal direction the
VariableBoundary medium wants (reference: Medium.h:79-104).
"""

from __future__ import annotations

import jax.numpy as jnp

from .grid import Grid, sample

#: probe step in volume coordinates (reference: MIN_STEP, Gradient.h:4)
MIN_STEP = 0.1


def volume_intensity(grid: Grid, p01, interpolation: str = "trilinear"):
    """Density at normalized coords; 0 outside [0, 1]^3
    (reference: getVolumeIntensity, Gradient.h:10-13)."""
    inside = jnp.all(
        jnp.logical_and(p01 >= 0.0, p01 <= 1.0), axis=-1
    )
    v = sample(grid, jnp.clip(p01, 0.0, 1.0), interpolation)
    return jnp.where(inside, v, 0.0)


def gradient_cd(
    grid: Grid, p01, min_step: float = MIN_STEP,
    interpolation: str = "trilinear",
):
    """Central-difference negative gradient (reference: gradientCD,
    Gradient.h:16-27).  Returns (..., 3)."""
    comps = []
    for ax in range(3):
        delta = jnp.zeros((3,), jnp.float32).at[ax].set(min_step)
        hi = volume_intensity(grid, p01 + delta, interpolation)
        lo = volume_intensity(grid, p01 - delta, interpolation)
        comps.append(lo - hi)
    return jnp.stack(comps, axis=-1)


def gradient_fd(
    grid: Grid, p01, min_step: float = MIN_STEP,
    interpolation: str = "trilinear",
):
    """Forward-difference negative gradient (reference: gradientFD,
    Gradient.h:30-39)."""
    i0 = volume_intensity(grid, p01, interpolation)
    comps = []
    for ax in range(3):
        delta = jnp.zeros((3,), jnp.float32).at[ax].set(min_step)
        comps.append(i0 - volume_intensity(grid, p01 + delta,
                                           interpolation))
    return jnp.stack(comps, axis=-1)
