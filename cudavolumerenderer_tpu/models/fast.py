"""fastSK: TPU-tuned streaming wavefront (beyond-reference scheduler).

Same physics as every other scheduler, restructured around the measured
cost model of a TPU v5e (XLA gathers ~85 M rows/s regardless of row
width ≤4; scatters ~60 M/s; VPU ~cheap):

1. **Lane-pinned pixels** — lane i owns pixel i % n_pix and renders its
   samples sequentially (sample ids slot, slot+m, ...), accumulating into
   a lane-private register.  The image is a reshape+sum at the end: the
   per-iteration scatter-add that a dynamic work queue needs (the
   reference's atomicVectorAdd analog) disappears entirely.
2. **Fused albedo+density grid** — one (Z, Y, X, 4) table holding
   (albedo.rgb, density): the tracking step's density fetch and the
   scatter event's albedo fetch come from a single 4-channel gather row
   (4-wide rows cost ~1.3x a scalar gather, not 4x).
3. **Stochastic trilinear filtering** — instead of the 8-tap lerp, one
   tap is drawn with probability equal to its trilerp weight.  For
   Woodcock tracking this is *distribution-exact*: the acceptance test
   rho_hat/rho_max >= u with E[rho_hat] = rho(x) thins the majorant
   Poisson process at exactly the same rate as deterministic trilinear,
   so transmittance and collision statistics are unchanged (not just
   unbiased).  The accepted tap doubles as an unbiased stochastic
   filter of the albedo at the collision point.  8x fewer gather rows.

This is not one of the reference's six strategies — it is the scheduler
the reference would have written for this hardware; kernel name `fastSK`.
Images agree with the other schedulers statistically (same estimator
mean), not sample-for-sample (different filtering estimator).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..constants import EPSILON
from ..ops import aabb, camera as cam, phase
from ..ops.rng import RngState, make_rng, next_float, next_uint32
from ..scene.types import RenderSettings, Scene
from . import integrator


def make_fused_grid(scene: Scene) -> jnp.ndarray:
    """(Z*Y*X, 4) rows of (albedo.rgb, density)."""
    alb = scene.medium.albedo.data[..., :3].reshape(-1, 3)
    den = scene.medium.density.data.reshape(-1, 1)
    return jnp.concatenate([alb, den], axis=-1)


def make_fused_grid5(scene: Scene, brick_major: jnp.ndarray) -> jnp.ndarray:
    """(Z*Y*X, 5) rows of (albedo.rgb, density, brick majorant).

    The majorant channel broadcasts each brick's dilated majorant to its
    voxels so the two-level tracker learns a new brick's majorant from
    the same gather row as a density tap — one gather per iteration
    instead of two (PERF.md: iterations are gather-row-bound).  A probe
    at floor(coord) always lands in the brick containing the position
    (bricks partition the voxel lattice), so the channel is exact."""
    bz, by, bx = BRICK
    nz, ny, nx = scene.medium.density.data.shape
    up = jnp.repeat(
        jnp.repeat(jnp.repeat(brick_major, bz, axis=0), by, axis=1),
        bx, axis=2,
    )[:nz, :ny, :nx]
    return jnp.concatenate(
        [make_fused_grid(scene), up.reshape(-1, 1)], axis=-1
    )


# Brick geometry for two-level tracking: (z, y, x) voxels per brick.
# 4*4*8 = 128 entries = one vector row (matches csrc brick_pack).
BRICK = (4, 4, 8)


def brick_majorants(density_zyx: jnp.ndarray) -> jnp.ndarray:
    """Per-brick *dilated* majorants: max over the brick's voxels plus a
    one-voxel border on the high side, so any trilinear tap reachable
    from inside the brick is covered (taps are floor(coord)..floor+1).

    Computed with reduce_window so it jits and differentiates away
    (majorants are stop-gradient by construction of the estimator).
    """
    bz, by, bx = BRICK
    nz, ny, nx = density_zyx.shape
    nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
    padded = jnp.pad(
        density_zyx,
        (
            (0, nbz * bz + 1 - nz),
            (0, nby * by + 1 - ny),
            (0, nbx * bx + 1 - nx),
        ),
    )
    return jax.lax.reduce_window(
        padded,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(bz + 1, by + 1, bx + 1),
        window_strides=(bz, by, bx),
        padding="valid",
    )


class FastState(NamedTuple):
    o: jnp.ndarray
    d: jnp.ndarray
    throughput: jnp.ndarray
    accum: jnp.ndarray  # (N, 3) lane-private radiance sum over finished paths
    samples_done: jnp.ndarray  # (N,) int32 completed paths per lane
    alive: jnp.ndarray  # (N,) current path in flight
    tracking: jnp.ndarray
    t: jnp.ndarray
    max_t: jnp.ndarray
    normal: jnp.ndarray
    rng: RngState
    n_rays: jnp.ndarray
    # two-level tracking extras (unused when two_level=False)
    brick_exit: jnp.ndarray  # (N,) t at which the ray leaves its brick
    inv_sig_local: jnp.ndarray  # (N,) 1/(scale*rho_max_brick)
    # telemetry: loop iterations and lane-iteration occupancy
    n_iters: jnp.ndarray  # () f32
    n_busy: jnp.ndarray  # () f32 — sum over iterations of tracking lanes


def _stochastic_tap(coord, f_bits):
    """Pick the trilerp tap: per axis, the upper neighbor with probability
    frac(coord).  f_bits: 30 random bits (10 per axis) from one draw."""
    c0 = jnp.floor(coord)
    frac = coord - c0
    i0 = c0.astype(jnp.int32)
    ux = ((f_bits >> 0) & 0x3FF).astype(jnp.float32) * (1.0 / 1024.0)
    uy = ((f_bits >> 10) & 0x3FF).astype(jnp.float32) * (1.0 / 1024.0)
    uz = ((f_bits >> 20) & 0x3FF).astype(jnp.float32) * (1.0 / 1024.0)
    up = jnp.stack([ux, uy, uz], axis=-1) < frac
    return i0 + up.astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "settings", "tile_dim", "full_resolution", "spp", "lanes_per_pixel",
        "two_level", "with_stats",
    ),
)
def render_tile(
    scene: Scene,
    camera: cam.Camera,
    settings: RenderSettings,
    tile_dim: Tuple[int, int],
    tile_offset: jnp.ndarray,
    full_resolution: Tuple[int, int],
    spp: int,
    seed,
    path_id_base,
    lanes_per_pixel: int = 1,
    two_level: bool = False,
    with_stats: bool = False,
):
    tw, th = tile_dim
    n_pix = tw * th
    m = lanes_per_pixel
    while spp % m != 0:
        m -= 1
    spp_per_lane = spp // m
    n_lanes = n_pix * m
    med = scene.medium

    nz, ny, nx = med.density.data.shape
    res_minus_1 = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.float32)
    extent = med.box_max - med.box_min
    scale = med.scale
    inv_sigmat = 1.0 / (scale * med.max_density)
    if two_level:
        bz_, by_, bx_ = BRICK
        nbz, nby, nbx = -(-nz // bz_), -(-ny // by_), -(-nx // bx_)
        fused = make_fused_grid5(scene, brick_majorants(med.density.data))
        brick_size = jnp.asarray([bx_, by_, bz_], jnp.float32)
        brick_hi = jnp.asarray([nbx - 1, nby - 1, nbz - 1], jnp.int32)
    else:
        fused = make_fused_grid(scene)

    lane = jnp.arange(n_lanes, dtype=jnp.uint32)
    pix = lane % jnp.uint32(n_pix)
    slot = lane // jnp.uint32(n_pix)
    px = (pix % jnp.uint32(tw)).astype(jnp.float32) + tile_offset[0]
    py = jnp.floor(pix.astype(jnp.float32) / tw) + tile_offset[1]
    pixel_xy = jnp.stack([px, py], axis=-1)

    def path_id_of(samples_done):
        s = slot + jnp.uint32(m) * samples_done.astype(jnp.uint32)
        return s * jnp.uint32(n_pix) + pix + jnp.asarray(
            path_id_base, jnp.uint32
        )

    zero3 = jnp.zeros((n_lanes, 3), jnp.float32)
    state0 = FastState(
        o=zero3, d=zero3.at[:, 2].set(1.0), throughput=jnp.ones_like(zero3),
        accum=zero3, samples_done=jnp.zeros((n_lanes,), jnp.int32),
        alive=jnp.zeros((n_lanes,), bool),
        tracking=jnp.zeros((n_lanes,), bool),
        t=jnp.zeros((n_lanes,), jnp.float32),
        max_t=jnp.zeros((n_lanes,), jnp.float32),
        normal=zero3,
        rng=make_rng(seed, jnp.zeros((n_lanes,), jnp.uint32)),
        n_rays=jnp.zeros((), jnp.float32),
        brick_exit=jnp.full((n_lanes,), -1.0, jnp.float32),
        inv_sig_local=jnp.zeros((n_lanes,), jnp.float32),
        n_iters=jnp.zeros((), jnp.float32),
        n_busy=jnp.zeros((), jnp.float32),
    )

    def cond(carry):
        s = carry
        return jnp.any(
            jnp.logical_or(s.alive, s.samples_done < spp_per_lane)
        )

    def body(s):
        # --- regenerate: next sample of the SAME pixel ------------------
        needs = jnp.logical_and(
            jnp.logical_not(s.alive), s.samples_done < spp_per_lane
        )
        fresh = make_rng(seed, path_id_of(s.samples_done))
        rng = RngState(
            state=jnp.where(needs, fresh.state, s.rng.state),
            inc=jnp.where(needs, fresh.inc, s.rng.inc),
        )
        o_new, d_new, rng = cam.generate_rays(
            camera, pixel_xy, full_resolution, rng, active=needs
        )
        mm = needs[..., None]
        o = jnp.where(mm, o_new, s.o)
        d = jnp.where(mm, d_new, s.d)
        tput = jnp.where(mm, 1.0, s.throughput)
        alive = jnp.logical_or(s.alive, needs)
        tracking = jnp.where(needs, False, s.tracking)

        # --- segment start: AABB + classification ------------------------
        need_isect = jnp.logical_and(alive, jnp.logical_not(tracking))
        n_rays = s.n_rays + jnp.sum(need_isect.astype(jnp.float32))
        isect = aabb.aabb_intersect(med.box_min, med.box_max, o, d)
        miss = jnp.logical_and(need_isect, jnp.logical_not(isect.hit))
        accum = jnp.where(
            miss[..., None], s.accum + tput * scene.le, s.accum
        )
        samples_done = jnp.where(miss, s.samples_done + 1, s.samples_done)
        alive = jnp.logical_and(alive, jnp.logical_not(miss))

        enters = jnp.logical_and(
            need_isect, jnp.logical_and(isect.hit, isect.inside_volume)
        )
        boundary_now = jnp.logical_and(
            need_isect,
            jnp.logical_and(isect.hit, jnp.logical_not(isect.inside_volume)),
        )
        tracking = jnp.logical_or(tracking, enters)
        t = jnp.where(enters, 0.0, s.t)
        max_t = jnp.where(enters, isect.dist, s.max_t)
        normal = jnp.where(need_isect[..., None], isect.normal, s.normal)
        brick_exit = jnp.where(enters, -1.0, s.brick_exit)
        inv_sig_local = s.inv_sig_local

        # --- tracking: fused gather, stochastic filter --------------------
        # fresh segments (enters) step immediately: in two-level mode the
        # need_brick refresh below initializes their brick data in the
        # same iteration; in single-level mode no setup is needed.
        step_mask = tracking
        if two_level:
            # Two-level (sparse-leap) delta tracking with probe-fused
            # gathers: iterations are gather-row-bound (PERF.md), so the
            # brick majorant rides in the fused row's 5th channel and a
            # brick entry costs one deterministic floor-voxel probe —
            # every iteration issues exactly ONE gather row per lane,
            # serving either the probe or the stochastic density tap.
            # Piecewise-majorant tracking stays distribution-exact.
            epsw = jnp.max(extent) * 1e-6
            need_brick = jnp.logical_and(step_mask, t >= brick_exit)
            p_now = o + (t + epsw)[..., None] * d
            coordn = (
                jnp.clip((p_now - med.box_min) / extent, 0.0, 1.0)
                * res_minus_1
            )
            bi = jnp.clip(
                jnp.floor(coordn / brick_size).astype(jnp.int32),
                0,
                brick_hi,
            )
            up = (d > 0.0).astype(jnp.float32)
            bound_coord = (bi.astype(jnp.float32) + up) * brick_size
            bound_world = med.box_min + extent * bound_coord / res_minus_1
            tiny_d = jnp.abs(d) > 1e-12
            t_axes = jnp.where(
                tiny_d,
                (bound_world - o) / jnp.where(tiny_d, d, 1.0),
                jnp.inf,
            )
            exit_new = jnp.maximum(jnp.min(t_axes, axis=-1), t + epsw)
            brick_exit = jnp.where(need_brick, exit_new, brick_exit)
            # probe voxel: floor always lands in the containing brick
            probe_vox = jnp.clip(
                jnp.floor(coordn).astype(jnp.int32),
                0,
                jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.int32),
            )
            probe_flat = (
                probe_vox[..., 2] * ny + probe_vox[..., 1]
            ) * nx + probe_vox[..., 0]

            # stepping lanes use the majorant cached by their probe
            stepping = jnp.logical_and(
                step_mask, jnp.logical_not(need_brick)
            )
            u1, rng = next_float(rng, stepping)
            step = jnp.where(
                stepping,
                -jnp.log(jnp.maximum(u1, EPSILON)) * inv_sig_local,
                0.0,
            )
            t_cand = t + step
            eff_exit = jnp.minimum(brick_exit, max_t)
            crossed_step = jnp.logical_and(stepping, t_cand >= eff_exit)
            inside = jnp.logical_and(
                stepping, jnp.logical_not(crossed_step)
            )

            p = o + t_cand[..., None] * d
            coord = (
                jnp.clip((p - med.box_min) / extent, 0.0, 1.0) * res_minus_1
            )
            tap_bits, rng = next_uint32(rng, inside)
            tap = _stochastic_tap(coord, tap_bits)
            ix = jnp.clip(tap[..., 0], 0, nx - 1)
            iy = jnp.clip(tap[..., 1], 0, ny - 1)
            iz = jnp.clip(tap[..., 2], 0, nz - 1)
            tap_flat = (iz * ny + iy) * nx + ix
            # the single fused gather of the iteration
            idx = jnp.where(need_brick, probe_flat, tap_flat)
            row = jnp.take(fused, idx, axis=0)  # (N, 5)

            # probe results: cache the brick majorant
            rho_b = row[..., 4]
            inv_new = jnp.where(
                rho_b > 0.0,
                1.0 / (scale * jnp.maximum(rho_b, 1e-30)),
                jnp.inf,
            )
            inv_sig_local = jnp.where(need_brick, inv_new, inv_sig_local)
            probe_empty = jnp.logical_and(need_brick, rho_b <= 0.0)

            crossed = jnp.logical_or(crossed_step, probe_empty)
            overran = jnp.logical_and(crossed, max_t <= brick_exit)
            transit = jnp.logical_and(crossed, jnp.logical_not(overran))
            t_new = jnp.where(
                transit,
                brick_exit,
                jnp.where(
                    overran,
                    jnp.maximum(t, max_t),
                    jnp.where(inside, t_cand, t),
                ),
            )

            rho_hat = row[..., 3]
            alb_hat = row[..., :3]
            u2, rng = next_float(rng, inside)
            accepted = jnp.logical_and(
                inside,
                jnp.logical_not(scale * rho_hat * inv_sig_local < u2),
            )
            terminated = jnp.logical_or(overran, accepted)
            scattered = accepted
            t = t_new
            tracking = jnp.logical_and(
                tracking, jnp.logical_not(terminated)
            )
        else:
            u1, rng = next_float(rng, step_mask)
            step = -jnp.log(jnp.maximum(u1, EPSILON)) * inv_sigmat
            t_new = jnp.where(step_mask, t + step, t)
            p = o + t_new[..., None] * d
            coord = (
                jnp.clip((p - med.box_min) / extent, 0.0, 1.0) * res_minus_1
            )
            tap_bits, rng = next_uint32(rng, step_mask)
            tap = _stochastic_tap(coord, tap_bits)
            ix = jnp.clip(tap[..., 0], 0, nx - 1)
            iy = jnp.clip(tap[..., 1], 0, ny - 1)
            iz = jnp.clip(tap[..., 2], 0, nz - 1)
            row = jnp.take(fused, (iz * ny + iy) * nx + ix, axis=0)  # (N,4)
            rho_hat = row[..., 3]
            alb_hat = row[..., :3]
            u2, rng = next_float(rng, step_mask)
            overran = t_new > max_t
            accepted = jnp.logical_not(scale * rho_hat * inv_sigmat < u2)
            terminated = jnp.logical_and(
                step_mask, jnp.logical_or(overran, accepted)
            )
            scattered = jnp.logical_and(
                terminated, jnp.logical_not(overran)
            )
            t = t_new
            tracking = jnp.logical_and(
                tracking, jnp.logical_not(terminated)
            )

        # --- boundary event ----------------------------------------------
        boundary = jnp.logical_or(
            boundary_now, jnp.logical_and(terminated, overran)
        )
        o_bound = jnp.where(
            boundary_now[..., None],
            o + d * isect.dist[..., None],
            o + d * max_t[..., None],
        )
        o_b, d_b, t_b, rng = integrator.boundary_event(
            scene, settings, normal, o_bound, d, tput, rng, boundary
        )

        # --- scatter event: reuse the accepted tap's albedo --------------
        o_s = o + d * t[..., None] - d * EPSILON
        d_s, rng = phase.sample_phase(d, med.g, rng, active=scattered)

        o = jnp.where(
            scattered[..., None], o_s,
            jnp.where(boundary[..., None], o_b, o),
        )
        d = jnp.where(
            scattered[..., None], d_s,
            jnp.where(boundary[..., None], d_b, d),
        )
        tput = jnp.where(
            scattered[..., None], tput * alb_hat,
            jnp.where(boundary[..., None], t_b, tput),
        )

        # --- Russian roulette after events --------------------------------
        had_event = jnp.logical_and(
            alive, jnp.logical_or(scattered, boundary)
        )
        if settings.russian_roulette:
            tput, alive, killed, rng = integrator.russian_roulette(
                tput, alive, rng, had_event
            )
            samples_done = jnp.where(
                killed, samples_done + 1, samples_done
            )

        return FastState(
            o=o, d=d, throughput=tput, accum=accum,
            samples_done=samples_done, alive=alive, tracking=tracking,
            t=t, max_t=max_t, normal=normal, rng=rng, n_rays=n_rays,
            brick_exit=brick_exit, inv_sig_local=inv_sig_local,
            n_iters=s.n_iters + 1.0,
            n_busy=s.n_busy + jnp.sum(tracking.astype(jnp.float32)),
        )

    final = jax.lax.while_loop(cond, body, state0)
    img = final.accum.reshape(m, th, tw, 3).sum(axis=0)
    if with_stats:
        return img, final.n_rays, final.n_iters, final.n_busy
    return img, final.n_rays
