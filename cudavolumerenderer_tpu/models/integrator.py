"""Shared volumetric path-tracing physics over a ray wavefront.

This module is the TPU re-expression of the bounce body that every
reference kernel repeats verbatim (reference:
implementation/src/NaiveVolPTsk_kernel.cuh:35-86 and the identical blocks in
the regeneration/streaming/sorting kernels): intersect the medium AABB →
Woodcock free-flight sampling → either an HG scatter event or a GGX
boundary event → Russian roulette.  Instead of one CUDA thread per path,
the whole wavefront advances through one bounce as a masked array program;
the scheduling strategies in the sibling modules differ only in how lanes
are (re)filled and compacted around this step, exactly mirroring the
reference's kernel family (SURVEY.md §2.5).

Masked-RNG discipline: every stochastic sub-step draws only on the lanes
that take it, so a path's random stream is identical no matter which
scheduler executes it — the property that makes images shard- and
batch-invariant.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import EPSILON
from ..ops import aabb, ggx, math3, phase, woodcock
from ..ops.grid import sample
from ..ops.rng import RngState, next_float
from ..scene.types import RenderSettings, Scene


class PathState(NamedTuple):
    """SoA wavefront state (reference AoS analog: Ray.h:19-57)."""

    o: jnp.ndarray  # (N, 3) origins
    d: jnp.ndarray  # (N, 3) directions
    throughput: jnp.ndarray  # (N, 3)
    radiance: jnp.ndarray  # (N, 3) accumulated per-lane contribution
    alive: jnp.ndarray  # (N,) bool
    rng: RngState  # per-lane RNG
    n_rays: jnp.ndarray  # () int64-ish f32 counter of traced rays


def sample_albedo(scene: Scene, p: jnp.ndarray, settings: RenderSettings):
    """Albedo at a world point (reference: Medium.h:145-148): proper box
    normalization then a volume fetch; returns (..., 3) rgb."""
    med = scene.medium
    p01 = aabb.aabb_transform(med.box_min, med.box_max, p)
    a = sample(med.albedo, p01, settings.interpolation)
    return a[..., :3]


def boundary_event(scene, settings, normal, o_bound, d, tput, rng, mask):
    """Shared boundary event (reference: the GGX block every kernel
    repeats, e.g. NaiveVolPTsk_kernel.cuh:53-66): local frame from the
    cached face normal, GGX reflect/refract (weight = G1) or the null
    pass-through BSDF; invalid microfacet samples leave direction and
    throughput unchanged from the boundary point, exactly as the
    reference does.  Returns (o_out, d_out, tput_out, rng) with updates
    applied only on ``mask`` lanes (others pass through untouched)."""
    fx, fy, fz = math3.frame_from_z(normal)
    wi_local = math3.to_local(fx, fy, fz, math3.normalize(-d))
    if settings.bsdf_kind == "ggx":
        wo_local, weight, valid, rng = ggx.ggx_sample(
            scene.bsdf.roughness, scene.bsdf.eta, wi_local, rng,
            active=mask, mitsuba_comparable=settings.mitsuba_comparable,
        )
        d_bsdf = math3.to_world(fx, fy, fz, wo_local)
    else:  # 'null' pass-through boundary (reference: Bsdf.h:6-15)
        weight = jnp.ones(wi_local.shape[:-1], jnp.float32)
        valid = jnp.ones(wi_local.shape[:-1], bool)
        d_bsdf = d
    ok = jnp.logical_and(mask, valid)
    o_out = jnp.where(
        mask[..., None],
        jnp.where(ok[..., None], o_bound + d_bsdf * EPSILON, o_bound),
        o_bound,
    )
    d_out = jnp.where(ok[..., None], d_bsdf, d)
    tput_out = jnp.where(ok[..., None], tput * weight[..., None], tput)
    return o_out, d_out, tput_out, rng


def russian_roulette(tput, alive, rng, mask):
    """Shared Russian roulette (reference: NaiveVolPTsk_kernel.cuh:75-84):
    p = min(1, max(throughput.rgb)); kill with 1-p, else divide.  Draws
    only on ``mask`` lanes.  Returns (tput, alive, killed, rng)."""
    p_survive = jnp.minimum(1.0, math3.max3(tput))
    u, rng = next_float(rng, mask)
    killed = jnp.logical_and(mask, u > p_survive)
    alive = jnp.logical_and(alive, jnp.logical_not(killed))
    survived = jnp.logical_and(mask, jnp.logical_not(killed))
    tput = jnp.where(
        survived[..., None],
        tput / jnp.maximum(p_survive, 1e-20)[..., None],
        tput,
    )
    return tput, alive, killed, rng


def bounce_step(
    scene: Scene, settings: RenderSettings, state: PathState
) -> PathState:
    """Advance every live lane by one path vertex.

    Faithful to the reference control flow
    (NaiveVolPTsk_kernel.cuh:35-86):
      miss        → radiance += throughput * Le, lane dies;
      medium event→ throughput *= albedo, direction = HG sample;
      boundary    → GGX reflect/refract (weight = G1), or — on an invalid
                    microfacet sample — continue with direction and
                    throughput unchanged from the boundary point;
      then Russian roulette on max(throughput).
    """
    med = scene.medium
    o, d, tput, rad, alive, rng = (
        state.o,
        state.d,
        state.throughput,
        state.radiance,
        state.alive,
        state.rng,
    )

    n_rays = state.n_rays + jnp.sum(alive.astype(jnp.float32))

    isect = aabb.aabb_intersect(med.box_min, med.box_max, o, d)

    # --- miss: escape to the constant environment -------------------------
    miss = jnp.logical_and(alive, jnp.logical_not(isect.hit))
    rad = jnp.where(miss[..., None], rad + tput * scene.le, rad)
    alive = jnp.logical_and(alive, isect.hit)

    # --- free flight through the medium ----------------------------------
    in_medium = jnp.logical_and(alive, isect.inside_volume)
    wres = woodcock.woodcock_track(
        med.density,
        med.box_min,
        med.box_max,
        med.scale,
        med.max_density,
        o,
        d,
        isect.dist,
        rng,
        in_medium,
        settings.interpolation,
    )
    rng = wres.rng
    scattered = wres.scattered
    boundary = jnp.logical_and(alive, jnp.logical_not(scattered))

    # --- boundary event: GGX rough dielectric ----------------------------
    o_bound = o + d * isect.dist[..., None]
    o_boundary_out, d_boundary_out, t_boundary, rng = boundary_event(
        scene, settings, isect.normal, o_bound, d, tput, rng, boundary
    )

    # --- medium event: absorb into albedo, HG scatter --------------------
    o_scat = o + d * wres.t[..., None] - d * EPSILON
    albedo = sample_albedo(scene, o_scat, settings)
    d_scat, rng = phase.sample_phase(d, med.g, rng, active=scattered)

    o = jnp.where(
        scattered[..., None],
        o_scat,
        jnp.where(boundary[..., None], o_boundary_out, o),
    )
    dnew = jnp.where(
        scattered[..., None],
        d_scat,
        jnp.where(boundary[..., None], d_boundary_out, d),
    )
    tput = jnp.where(
        scattered[..., None],
        tput * albedo,
        jnp.where(boundary[..., None], t_boundary, tput),
    )
    d = dnew

    # --- Russian roulette (reference: NaiveVolPTsk_kernel.cuh:75-84) -----
    if settings.russian_roulette:
        tput, alive, _, rng = russian_roulette(tput, alive, rng, alive)

    return PathState(
        o=o, d=d, throughput=tput, radiance=rad, alive=alive, rng=rng,
        n_rays=n_rays,
    )


def trace(
    scene: Scene, settings: RenderSettings, state: PathState
) -> PathState:
    """Run lanes to extinction: bounded `while_loop` over bounce_step.

    The bound is max_path_length (reference: Config.h PathTracingConfig);
    with Russian roulette on, lanes die long before it.
    """

    def cond(carry):
        st, bounce = carry
        return jnp.logical_and(jnp.any(st.alive), bounce < settings.max_path_length)

    def body(carry):
        st, bounce = carry
        return bounce_step(scene, settings, st), bounce + 1

    final, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return final


def initial_state(o, d, rng) -> PathState:
    n = o.shape[:-1]
    return PathState(
        o=o,
        d=d,
        throughput=jnp.ones(n + (3,), jnp.float32),
        radiance=jnp.zeros(n + (3,), jnp.float32),
        alive=jnp.ones(n, bool),
        rng=rng,
        n_rays=jnp.zeros((), jnp.float32),
    )
