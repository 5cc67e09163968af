"""Henyey–Greenstein phase function: pdf and importance sampling, batched.

Re-expresses the reference's HG code (reference: implementation/src/HG.h:26-63
and the HG functor in implementation/src/Volume.h:19-29) as branchless array
math over a ray wavefront; the isotropic |g| < eps branch becomes a where.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import EPSILON, INV_FOURPI, TWO_PI
from . import math3
from .rng import RngState, next_float2


def phase_hg(cos_theta: jnp.ndarray, g) -> jnp.ndarray:
    """HG phase value / pdf (reference: HG.h:26-35)."""
    g = jnp.asarray(g, jnp.float32)
    denom = 1.0 + g * g - 2.0 * g * cos_theta
    return INV_FOURPI * (1.0 - g * g) / jnp.power(denom, 1.5)


def pdf_hg(wi: jnp.ndarray, wo: jnp.ndarray, g) -> jnp.ndarray:
    return phase_hg(math3.dot(wi, wo), g)


def importance_sample_hg(d: jnp.ndarray, g, e1, e2) -> jnp.ndarray:
    """Sample a scattered direction about ``d`` (reference: HG.h:46-63).

    Anisotropic branch inverts the HG CDF; isotropic branch is uniform
    sphere.  Selected per-lane with where so both run in lockstep.
    """
    # NOTE: the reference divides by 2*fabsf(g) (HG.h:53), which mirrors
    # the distribution for g < 0; since it only ever instantiates g = 0
    # (Volume.h:20) the bug is latent there.  We use the correct 2*g.
    g = jnp.broadcast_to(jnp.asarray(g, jnp.float32), e1.shape)
    sqr_term = (1.0 - g * g) / jnp.maximum(1.0 - g + 2.0 * g * e1, 1e-12)
    g_safe = jnp.where(jnp.abs(g) > 1e-12, g, 1.0)
    cos_aniso = (1.0 + g * g - sqr_term * sqr_term) / (2.0 * g_safe)
    cos_iso = 1.0 - 2.0 * e1
    cos_theta = jnp.where(jnp.abs(g) > EPSILON, cos_aniso, cos_iso)
    cos_theta = jnp.clip(cos_theta, -1.0, 1.0)

    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = TWO_PI * e2

    v1, v2 = math3.local_basis(d)
    return math3.spherical_direction(sin_theta, cos_theta, phi, v1, v2, d)


def sample_phase(d: jnp.ndarray, g, rng: RngState, active=None):
    """Draw (e1, e2) and scatter; matches HG::sample draw order
    (reference: Volume.h:24-28)."""
    e1, e2, rng = next_float2(rng, active)
    return importance_sample_hg(d, g, e1, e2), rng
