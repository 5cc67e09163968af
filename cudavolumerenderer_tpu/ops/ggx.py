"""GGX rough-dielectric boundary BSDF, branchless and batched.

Re-expresses the reference's GGX implementation (reference:
implementation/src/GGX.h and the wrapper in implementation/src/Bsdf.h:17-30)
as where-cascade array math: visible-normal sampling (both the Mitsuba
analytic-fit variant used under MITSUBA_COMPARABLE, GGX.h:85-181/288-292,
and the Heitz 2017 variant, GGX.h:186-209), full dielectric Fresnel with
transmitted-cosine output (GGX.h:13-38), reflect/refract (GGX.h:40-50), and
Smith G1 with projected roughness (GGX.h:213-255).  All directions are in
the local shading frame (z = surface normal).  Every lane consumes exactly
three uniforms per sample, keeping RNG streams lockstep.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import EPSILON, PI
from . import math3
from .rng import RngState, next_float, next_float2


def fresnel_dielectric(eta, ndotwi):
    """Full Fresnel for a dielectric; returns (F, ndotwt)
    (reference: GGX.h:13-38).  eta = int_ior / ext_ior."""
    eta = jnp.asarray(eta, jnp.float32)
    scale = jnp.where(ndotwi > 0.0, 1.0 / eta, eta)
    sin_sqr = 1.0 - ndotwi * ndotwi
    ndotwt_sqr = 1.0 - sin_sqr * scale * scale

    tir = ndotwt_sqr <= 0.0
    abs_ndotwi = jnp.abs(ndotwi)
    abs_ndotwt = jnp.sqrt(jnp.maximum(ndotwt_sqr, 0.0))

    rs = (abs_ndotwi - eta * abs_ndotwt) / (abs_ndotwi + eta * abs_ndotwt)
    rp = (eta * abs_ndotwi - abs_ndotwt) / (eta * abs_ndotwi + abs_ndotwt)
    f = 0.5 * (rs * rs + rp * rp)
    ndotwt = jnp.where(ndotwi > 0.0, -abs_ndotwt, abs_ndotwt)

    f = jnp.where(tir, 1.0, f)
    ndotwt = jnp.where(tir, 0.0, ndotwt)

    index_matched = eta == 1.0
    f = jnp.where(index_matched, 0.0, f)
    ndotwt = jnp.where(index_matched, -ndotwi, ndotwt)
    return f, ndotwt


def refract_dir(eta, ndotwi, ndotwt, wi, n):
    """Refracted direction (reference: GGX.h:45-50).  The reference flips
    eta when ndotwt < 0 (i.e. the ray enters the denser side)."""
    eta = jnp.asarray(eta, jnp.float32)
    eta_used = jnp.where(ndotwt < 0.0, 1.0 / eta, eta)
    return n * (ndotwi * eta_used + ndotwt)[..., None] - wi * eta_used[..., None]


def _sample_visible11(theta_i, s1, s2):
    """Slope sampling for alpha = 1 — Mitsuba's analytic fit
    (reference: GGX.h:85-181), vectorized with where-selects."""
    # Normal-incidence special case.
    phi = 2.0 * PI * s2
    r_special = jnp.sqrt(jnp.maximum(0.0, s1 / jnp.maximum(1.0 - s1, 1e-20)))
    special_x = r_special * jnp.cos(phi)
    special_y = r_special * jnp.sin(phi)
    is_special = theta_i < 1e-4

    tan_theta = jnp.tan(theta_i)
    safe_tan = jnp.where(is_special, 1.0, tan_theta)  # avoid 0-div under mask
    a = 1.0 + safe_tan * safe_tan
    g1 = 2.0 / (1.0 + jnp.sqrt(a))

    big_a = (2.0 * s1 / g1) - 1.0
    big_a = jnp.where(
        jnp.abs(big_a) == 1.0, big_a - jnp.sign(big_a) * EPSILON, big_a
    )
    tmp = 1.0 / (big_a * big_a - 1.0)
    b = safe_tan
    d = jnp.sqrt(
        jnp.maximum(0.0, (b * b * tmp * tmp) - ((big_a * big_a - b * b) * tmp))
    )
    slope_x_1 = b * tmp - d
    slope_x_2 = b * tmp + d
    use_1 = jnp.logical_or(big_a < 0.0, slope_x_2 > 1.0 / safe_tan)
    slope_x = jnp.where(use_1, slope_x_1, slope_x_2)

    s_sign = jnp.where(s2 > 0.5, 1.0, -1.0)
    sy = jnp.where(s2 > 0.5, 2.0 * (s2 - 0.5), 2.0 * (0.5 - s2))
    z = (
        sy * (sy * (sy * (-0.365728915865723) + 0.790235037209296)
              - 0.424965825137544)
        + 0.000152998850436920
    ) / (
        sy * (sy * (sy * (sy * 0.169507819808272 - 0.397203533833404)
                    - 0.232500544458471) + 1.0)
        - 0.539825872510702
    )
    slope_y = s_sign * z * jnp.sqrt(1.0 + slope_x * slope_x)

    slope_x = jnp.where(is_special, special_x, slope_x)
    slope_y = jnp.where(is_special, special_y, slope_y)
    return slope_x, slope_y


def sample_vndf_mitsuba(wi, alpha, s1, s2):
    """Visible-normal sampling, Mitsuba variant (reference: GGX.h:143-181)."""
    ax, ay = alpha[..., 0], alpha[..., 1]
    wi_s = math3.normalize(
        jnp.stack([ax * wi[..., 0], ay * wi[..., 1], wi[..., 2]], axis=-1)
    )
    wiz = jnp.clip(wi_s[..., 2], -1.0, 1.0)
    near_pole = wiz >= 0.999999
    theta = jnp.where(near_pole, 0.0, jnp.arccos(wiz))
    phi = jnp.where(near_pole, 0.0, jnp.arctan2(wi_s[..., 1], wi_s[..., 0]))
    sin_phi, cos_phi = jnp.sin(phi), jnp.cos(phi)

    sx, sy = _sample_visible11(theta, s1, s2)
    rx = cos_phi * sx - sin_phi * sy
    ry = sin_phi * sx + cos_phi * sy
    rx = rx * ax
    ry = ry * ay
    inv_norm = 1.0 / jnp.sqrt(rx * rx + ry * ry + 1.0)
    return jnp.stack([-rx * inv_norm, -ry * inv_norm, inv_norm], axis=-1)


def sample_vndf_heitz(wi, alpha, s1, s2):
    """Visible-normal sampling, Heitz 2017 variant (reference: GGX.h:186-209).

    The reference builds the tangent basis from the *unstretched* wi; this
    reproduces that behavior for parity (the variant is only used when
    mitsuba_comparable is off).
    """
    ax, ay = alpha[..., 0], alpha[..., 1]
    stretched = math3.normalize(
        jnp.stack([wi[..., 0] * ax, wi[..., 1] * ay, wi[..., 2]], axis=-1)
    )
    z_axis = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), wi.shape
    )
    t1_generic = math3.normalize(math3.cross(wi, z_axis))
    x_axis = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], jnp.float32), wi.shape
    )
    t1 = jnp.where((wi[..., 2] < 0.9999)[..., None], t1_generic, x_axis)
    t2 = math3.cross(t1, wi)

    a = 1.0 / (1.0 + wi[..., 2])
    r = jnp.sqrt(s1)
    lower = s2 < a
    phi = jnp.where(
        lower,
        s2 / jnp.maximum(a, 1e-12) * PI,
        PI + (s2 - a) / jnp.maximum(1.0 - a, 1e-12) * PI,
    )
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi) * jnp.where(lower, 1.0, wi[..., 2])
    pz = jnp.sqrt(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    n = p1[..., None] * t1 + p2[..., None] * t2 + pz[..., None] * stretched
    return math3.normalize(
        jnp.stack(
            [ax * n[..., 0], ay * n[..., 1], jnp.maximum(0.0, n[..., 2])],
            axis=-1,
        )
    )


def project_roughness(v, alpha):
    """Roughness projected on direction v (reference: GGX.h:214-227)."""
    ax, ay = alpha[..., 0], alpha[..., 1]
    vz = v[..., 2]
    inv_sin2 = 1.0 / jnp.maximum(1.0 - vz * vz, 1e-20)
    cos_phi2 = v[..., 0] * v[..., 0] * inv_sin2
    sin_phi2 = v[..., 1] * v[..., 1] * inv_sin2
    projected = jnp.sqrt(cos_phi2 * ax * ax + sin_phi2 * ay * ay)
    isotropic_or_degenerate = jnp.logical_or(
        ax == ay, (1.0 - vz * vz) <= 0.0
    )
    return jnp.where(isotropic_or_degenerate, ax, projected)


def smith_g1(alpha, v, m):
    """Smith masking term G1 (reference: GGX.h:229-255) with the
    reference's exact degenerate-case ordering."""
    vz = v[..., 2]
    back = math3.dot(v, m) * vz <= 0.0
    temp = 1.0 - vz * vz
    degenerate = temp <= 0.0
    tan_v = jnp.abs(
        jnp.sqrt(jnp.maximum(temp, 0.0)) / jnp.where(vz == 0.0, 1.0, vz)
    )
    proj = project_roughness(v, alpha)
    root = proj * tan_v
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + root * root))
    g = jnp.where(tan_v == 0.0, 1.0, g)
    g = jnp.where(degenerate, 0.0, g)
    g = jnp.where(back, 0.0, g)
    return g


def ggx_sample(
    roughness: jnp.ndarray,  # (..., 2) or (2,)
    eta,  # int_ior / ext_ior
    wi: jnp.ndarray,  # (..., 3) local frame, z = normal
    rng: RngState,
    active=None,
    mitsuba_comparable: bool = True,
):
    """Sample the rough dielectric (reference: GGX.h:265-326).

    Returns (wo, weight, valid, rng).  weight is G1(wo) for valid samples
    and 0 otherwise; invalid lanes keep wo = wi's reflection placeholder
    and must be handled by the caller exactly as the reference kernels do
    (throughput and direction left unchanged).
    """
    alpha = jnp.broadcast_to(
        jnp.asarray(roughness, jnp.float32), wi.shape[:-1] + (2,)
    )
    ndotwi = wi[..., 2]
    sign = jnp.where(ndotwi >= 0.0, 1.0, -1.0)

    s1, s2, rng = next_float2(rng, active)
    if mitsuba_comparable:
        wh = sample_vndf_mitsuba(sign[..., None] * wi, alpha, s1, s2)
    else:
        wh = sample_vndf_heitz(sign[..., None] * wi, alpha, s1, s2)

    whdotwi = math3.dot(wh, wi)
    f, whdotwt = fresnel_dielectric(eta, whdotwi)

    u_choice, rng = next_float(rng, active)
    choose_reflect = u_choice <= f

    wo_reflect = math3.reflect_about(whdotwi, wi, wh)
    reflect_valid = ndotwi * wo_reflect[..., 2] > 0.0

    wo_refract = refract_dir(eta, whdotwi, whdotwt, wi, wh)
    refract_valid = jnp.logical_and(
        whdotwt != 0.0, ndotwi * wo_refract[..., 2] < 0.0
    )

    wo = jnp.where(choose_reflect[..., None], wo_reflect, wo_refract)
    valid = jnp.where(choose_reflect, reflect_valid, refract_valid)
    valid = jnp.logical_and(valid, ndotwi != 0.0)

    weight = jnp.where(valid, smith_g1(alpha, wo, wh), 0.0)
    return wo, weight, valid, rng
