"""Morton (Z-order) codes for spatial ray reordering.

Re-expresses the reference's 30-bit Morton utilities (reference:
implementation/src/Utilities.h:35-70 and the block-level radix sort in
implementation/src/MortonSort.h:12-68) as vectorized uint32 bit math.
The sorting scheduler keys each lane by the Morton code of its current
position inside the medium box so spatially-coherent lanes issue
spatially-coherent grid gathers; dead lanes sort to the end via the max
key (MortonSort.h:39-44).
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
DEAD_KEY = 0xFFFFFFFF  # python int; cast lazily (no import-time arrays)


def expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so they occupy every 3rd bit."""
    v = v.astype(jnp.uint32)
    v = (v * _U32(0x00010001)) & _U32(0xFF0000FF)
    v = (v * _U32(0x00000101)) & _U32(0x0F00F00F)
    v = (v * _U32(0x00000011)) & _U32(0xC30C30C3)
    v = (v * _U32(0x00000005)) & _U32(0x49249249)
    return v


def morton3d(p01: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton code of points in [0,1]^3 (shape (..., 3) → (...,))."""
    q = jnp.clip(p01 * 1024.0, 0.0, 1023.0)
    x = expand_bits(q[..., 0].astype(jnp.uint32))
    y = expand_bits(q[..., 1].astype(jnp.uint32))
    z = expand_bits(q[..., 2].astype(jnp.uint32))
    return x * _U32(4) + y * _U32(2) + z


def ray_sort_keys(
    p_world: jnp.ndarray, box_min: jnp.ndarray, box_max: jnp.ndarray,
    alive: jnp.ndarray,
) -> jnp.ndarray:
    """Sort key per lane: Morton code of the normalized position for live
    lanes, the max key for dead lanes."""
    p01 = (p_world - box_min) / (box_max - box_min)
    return jnp.where(alive, morton3d(p01), _U32(DEAD_KEY))
