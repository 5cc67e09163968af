"""brickSK: sorted brick-wavefront scheduler around the Pallas kernel.

STATUS: superseded design study (PARITY.md §2.5, PERF.md round-3) —
fastSK (models/fast.py) is the shipping scheduler.  Measured ~0.15
Mrays/s: per-round argsort/permute and early-wavefront brick
fragmentation dominate; kept fully implemented + tested behind
`--kernel brickSK` as the record of why the binned-VMEM-gather road
loses on this hardware.

Fuses three ideas the reference explores
separately into the shape this hardware wants:

  * sortingSK's spatial reordering (SortingVolPTsk_kernel.cuh) becomes a
    per-round argsort of lanes by current brick id, so each 128-lane
    vector row tracks inside one brick;
  * the tracking inner loop runs K steps at a time inside a Pallas
    kernel (ops/pallas/tracking.py) whose density fetches are
    `tpu.dynamic_gather` rows from VMEM-resident dilated brick tables —
    the TPU's answer to the GPU texture cache;
  * two-level delta tracking (models/fast.py) falls out for free: each
    brick's majorant is local, and empty bricks are crossed in the
    wrapper without entering the kernel.

Round structure (lax.while_loop):
  phase A (XLA): consume kernel statuses — scatter events (stochastic
     albedo tap from the fused grid, HG), boundary events (GGX),
     Russian roulette, regeneration of finished lanes (lane-pinned
     pixels, no image scatter), AABB for new segments, DDA brick
     assignment/advance for all tracking lanes (empty bricks leapt here);
  sort: keys = brick id (non-trackable lanes keyed to the end), one
     argsort + one packed-record gather;
  kernel: rows whose lanes match the row's leading brick run K steps;
     stragglers in boundary rows are masked and retry next round.

Per-lane RNG streams are the same (seed, path_id) PCG streams as every
other scheduler; the kernel advances them with identical draws.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..constants import EPSILON
from ..ops import aabb, camera as cam, phase
from ..ops.pallas import tracking as tk
from ..ops.rng import RngState, make_rng, next_uint32
from ..scene.types import RenderSettings, Scene
from . import integrator
from .fast import _stochastic_tap, fused_row_decode, make_fused_grid

MASKED = 4  # extra status: lane sat out the kernel round


class BrickState(NamedTuple):
    o: jnp.ndarray  # (N, 3)
    d: jnp.ndarray
    throughput: jnp.ndarray
    accum: jnp.ndarray
    normal: jnp.ndarray
    t: jnp.ndarray
    max_t: jnp.ndarray
    brick_exit: jnp.ndarray
    inv_sig: jnp.ndarray
    base: jnp.ndarray  # (N, 3) dilated-table base voxel coords (float)
    pix: jnp.ndarray  # (N,) int32
    samples_done: jnp.ndarray
    status: jnp.ndarray  # (N,) int32 kernel status codes
    alive: jnp.ndarray
    tracking: jnp.ndarray
    rng: RngState
    n_rays: jnp.ndarray


def _pack(s: BrickState) -> jnp.ndarray:
    """State → one (N, C) f32 matrix so the sort permutation is a single
    row gather."""
    as_f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
    cols = [
        s.o, s.d, s.throughput, s.accum, s.normal, s.base,
        s.t[:, None], s.max_t[:, None], s.brick_exit[:, None],
        s.inv_sig[:, None],
        as_f(s.pix)[:, None], as_f(s.samples_done)[:, None],
        as_f(s.status)[:, None],
        as_f(s.alive.astype(jnp.int32))[:, None],
        as_f(s.tracking.astype(jnp.int32))[:, None],
        as_f(s.rng.state.astype(jnp.int32))[:, None],
        as_f(s.rng.inc.astype(jnp.int32))[:, None],
    ]
    return jnp.concatenate(cols, axis=1)


def _unpack(m: jnp.ndarray, n_rays) -> BrickState:
    as_i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    as_u = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32)
    return BrickState(
        o=m[:, 0:3], d=m[:, 3:6], throughput=m[:, 6:9], accum=m[:, 9:12],
        normal=m[:, 12:15], base=m[:, 15:18],
        t=m[:, 18], max_t=m[:, 19], brick_exit=m[:, 20], inv_sig=m[:, 21],
        pix=as_i(m[:, 22]), samples_done=as_i(m[:, 23]),
        status=as_i(m[:, 24]),
        alive=as_i(m[:, 25]) != 0, tracking=as_i(m[:, 26]) != 0,
        rng=RngState(state=as_u(m[:, 27]), inc=as_u(m[:, 28])),
        n_rays=n_rays,
    )


@partial(
    jax.jit,
    static_argnames=(
        "settings", "tile_dim", "full_resolution", "spp", "lanes_per_pixel",
        "k_steps", "interpret",
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
    k_steps: int = 8,
    interpret: bool = False,
):
    tw, th = tile_dim
    n_pix = tw * th
    m = lanes_per_pixel
    while spp % m != 0:
        m -= 1
    spp_per_lane = spp // m
    n_lanes = n_pix * m
    if n_lanes % 128 != 0:
        raise ValueError("brickSK needs lane count divisible by 128")
    n_rows = n_lanes // 128
    med = scene.medium

    fused = make_fused_grid(scene)
    tables, brick_major = tk.build_dilated_bricks(med.density.data)
    nbz, nby, nbx = brick_major.shape
    bm_flat = brick_major.reshape(-1)
    nz, ny, nx = med.density.data.shape
    res_minus_1 = jnp.asarray([nx - 1, ny - 1, nz - 1], jnp.float32)
    extent = med.box_max - med.box_min
    scale = med.scale
    bz_, by_, bx_ = tk.BRICK
    brick_size = jnp.asarray([bx_, by_, bz_], jnp.float32)
    brick_hi = jnp.asarray([nbx - 1, nby - 1, nbz - 1], jnp.int32)

    lane = jnp.arange(n_lanes, dtype=jnp.uint32)
    pix0 = (lane % jnp.uint32(n_pix)).astype(jnp.int32)
    slot = lane // jnp.uint32(n_pix)

    def pixel_xy_of(pix):
        px = (pix % tw).astype(jnp.float32) + tile_offset[0]
        py = jnp.floor(pix.astype(jnp.float32) / tw) + tile_offset[1]
        return jnp.stack([px, py], axis=-1)

    def path_id_of(pix, samples_done):
        s = slot + jnp.uint32(m) * samples_done.astype(jnp.uint32)
        return s * jnp.uint32(n_pix) + pix.astype(jnp.uint32) + jnp.asarray(
            path_id_base, jnp.uint32
        )

    zero3 = jnp.zeros((n_lanes, 3), jnp.float32)
    zero1 = jnp.zeros((n_lanes,), jnp.float32)
    state0 = BrickState(
        o=zero3, d=zero3.at[:, 2].set(1.0), throughput=jnp.ones_like(zero3),
        accum=zero3, normal=zero3, base=zero3,
        t=zero1, max_t=zero1, brick_exit=zero1 - 1.0, inv_sig=zero1,
        pix=pix0, samples_done=jnp.zeros((n_lanes,), jnp.int32),
        status=jnp.full((n_lanes,), MASKED, jnp.int32),
        alive=jnp.zeros((n_lanes,), bool),
        tracking=jnp.zeros((n_lanes,), bool),
        rng=make_rng(seed, jnp.zeros((n_lanes,), jnp.uint32)),
        n_rays=jnp.zeros((), jnp.float32),
    )

    def phase_a(s: BrickState) -> BrickState:
        o, d, tput, accum = s.o, s.d, s.throughput, s.accum
        normal, t, max_t = s.normal, s.t, s.max_t
        alive, tracking, rng = s.alive, s.tracking, s.rng
        samples_done, pix = s.samples_done, s.pix
        brick_exit, inv_sig, base = s.brick_exit, s.inv_sig, s.base

        # ---- consume kernel statuses ----------------------------------
        scattered = jnp.logical_and(tracking, s.status == tk.SCATTER)
        exited_box = jnp.logical_and(tracking, s.status == tk.EXIT_BOX)
        exited_brick = jnp.logical_and(tracking, s.status == tk.EXIT_BRICK)

        # brick-exit lanes resume from the brick boundary
        t = jnp.where(exited_brick, brick_exit, t)
        brick_exit = jnp.where(exited_brick, -1.0, brick_exit)
        tracking = jnp.logical_and(
            tracking,
            jnp.logical_not(jnp.logical_or(scattered, exited_box)),
        )

        # ---- scatter event: stochastic albedo tap + HG ------------------
        p_scat = o + t[..., None] * d - d * EPSILON
        coord = (
            jnp.clip((p_scat - med.box_min) / extent, 0.0, 1.0)
            * res_minus_1
        )
        tap_bits, rng = next_uint32(rng, scattered)
        tap = _stochastic_tap(coord, tap_bits)
        ix = jnp.clip(tap[..., 0], 0, nx - 1)
        iy = jnp.clip(tap[..., 1], 0, ny - 1)
        iz = jnp.clip(tap[..., 2], 0, nz - 1)
        row = jnp.take(fused, (iz * ny + iy) * nx + ix, axis=0)
        _, alb_hat = fused_row_decode(scene, row)
        d_scat, rng = phase.sample_phase(d, med.g, rng, active=scattered)
        o = jnp.where(scattered[..., None], p_scat, o)
        d = jnp.where(scattered[..., None], d_scat, d)
        tput = jnp.where(scattered[..., None], tput * alb_hat, tput)

        # ---- boundary event (GGX or null) -------------------------------
        o_bound = o + d * max_t[..., None]
        o_b, d_b, t_b, rng = integrator.boundary_event(
            scene, settings, normal, o_bound, d, tput, rng, exited_box
        )
        o = jnp.where(exited_box[..., None], o_b, o)
        d = d_b
        tput = t_b

        # ---- Russian roulette -------------------------------------------
        had_event = jnp.logical_or(scattered, exited_box)
        if settings.russian_roulette:
            tput, alive, killed, rng = integrator.russian_roulette(
                tput, alive, rng, had_event
            )
            samples_done = jnp.where(killed, samples_done + 1, samples_done)

        # ---- regeneration (lane-pinned pixel, next sample) --------------
        needs = jnp.logical_and(
            jnp.logical_not(alive), samples_done < spp_per_lane
        )
        fresh = make_rng(seed, path_id_of(pix, samples_done))
        rng = RngState(
            state=jnp.where(needs, fresh.state, rng.state),
            inc=jnp.where(needs, fresh.inc, rng.inc),
        )
        o_new, d_new, rng = cam.generate_rays(
            camera, pixel_xy_of(pix), full_resolution, rng, active=needs
        )
        mm = needs[..., None]
        o = jnp.where(mm, o_new, o)
        d = jnp.where(mm, d_new, d)
        tput = jnp.where(mm, 1.0, tput)
        alive = jnp.logical_or(alive, needs)
        tracking = jnp.where(needs, False, tracking)

        # ---- AABB for all segment starts --------------------------------
        need_isect = jnp.logical_and(alive, jnp.logical_not(tracking))
        n_rays = s.n_rays + jnp.sum(need_isect.astype(jnp.float32))
        isect = aabb.aabb_intersect(med.box_min, med.box_max, o, d)
        miss = jnp.logical_and(need_isect, jnp.logical_not(isect.hit))
        accum = jnp.where(miss[..., None], accum + tput * scene.le, accum)
        samples_done = jnp.where(miss, samples_done + 1, samples_done)
        alive = jnp.logical_and(alive, jnp.logical_not(miss))

        enters = jnp.logical_and(
            need_isect, jnp.logical_and(isect.hit, isect.inside_volume)
        )
        boundary_now = jnp.logical_and(
            need_isect,
            jnp.logical_and(isect.hit, jnp.logical_not(isect.inside_volume)),
        )
        # outside-hit lanes jump to the surface and take the boundary
        # event next phase A (flag via EXIT_BOX status + cached normal)
        tracking = jnp.logical_or(tracking, enters)
        t = jnp.where(enters, 0.0, t)
        max_t = jnp.where(enters, isect.dist, max_t)
        max_t = jnp.where(boundary_now, isect.dist, max_t)
        normal = jnp.where(need_isect[..., None], isect.normal, normal)
        brick_exit = jnp.where(enters, -1.0, brick_exit)

        # ---- DDA brick assignment / empty-brick leap --------------------
        # iterate a few times so empty bricks are crossed within phase A
        def brick_step(carry):
            t_c, brick_exit_c, inv_c, base_c, tracking_c, alive_c, \
                accum_c, sd_c, exitbox_c = carry
            needb = jnp.logical_and(tracking_c, t_c >= brick_exit_c)
            epsw = jnp.max(extent) * 1e-6
            p_now = o + (t_c + epsw)[..., None] * d
            coordn = (
                jnp.clip((p_now - med.box_min) / extent, 0.0, 1.0)
                * res_minus_1
            )
            bi = jnp.clip(
                jnp.floor(coordn / brick_size).astype(jnp.int32),
                0, brick_hi,
            )
            bflat = (bi[..., 2] * nby + bi[..., 1]) * nbx + bi[..., 0]
            rho_b = jnp.take(bm_flat, bflat, axis=0)
            up = (d > 0.0).astype(jnp.float32)
            bound_coord = (bi.astype(jnp.float32) + up) * brick_size
            bound_world = med.box_min + extent * bound_coord / res_minus_1
            okd = jnp.abs(d) > 1e-12
            t_axes = jnp.where(
                okd, (bound_world - o) / jnp.where(okd, d, 1.0), jnp.inf
            )
            exit_new = jnp.maximum(jnp.min(t_axes, axis=-1), t_c + epsw)
            brick_exit_c = jnp.where(needb, exit_new, brick_exit_c)
            inv_c = jnp.where(
                needb,
                jnp.where(
                    rho_b > 0.0,
                    1.0 / (scale * jnp.maximum(rho_b, 1e-30)),
                    jnp.inf,
                ),
                inv_c,
            )
            base_new = bi.astype(jnp.float32) * brick_size
            base_c = jnp.where(needb[..., None], base_new, base_c)
            # leap empty bricks now
            empty = jnp.logical_and(
                tracking_c, jnp.logical_not(jnp.isfinite(inv_c))
            )
            hits_box = jnp.logical_and(empty, brick_exit_c >= max_t)
            t_c = jnp.where(
                empty, jnp.minimum(brick_exit_c, max_t), t_c
            )
            exitbox_c = jnp.logical_or(exitbox_c, hits_box)
            tracking_c = jnp.logical_and(
                tracking_c, jnp.logical_not(hits_box)
            )
            return (
                t_c, brick_exit_c, inv_c, base_c, tracking_c, alive_c,
                accum_c, sd_c, exitbox_c,
            )

        carry = (
            t, brick_exit, inv_sig, base, tracking, alive, accum,
            samples_done, jnp.zeros((n_lanes,), bool),
        )
        for _ in range(3):  # leap up to 3 empty bricks per phase A
            carry = brick_step(carry)
        (t, brick_exit, inv_sig, base, tracking, alive, accum,
         samples_done, pend_exitbox) = carry

        # lanes that leapt to the medium exit take the boundary event next
        # phase A; encode via status
        status = jnp.full((n_lanes,), MASKED, jnp.int32)
        status = jnp.where(pend_exitbox, tk.EXIT_BOX, status)
        status = jnp.where(boundary_now, tk.EXIT_BOX, status)
        tracking_for_pend = jnp.logical_or(pend_exitbox, boundary_now)
        # mark these lanes 'tracking' so the status consumer sees them
        tracking = jnp.logical_or(tracking, tracking_for_pend)

        return BrickState(
            o=o, d=d, throughput=tput, accum=accum, normal=normal,
            base=base, t=t, max_t=max_t, brick_exit=brick_exit,
            inv_sig=inv_sig, pix=pix, samples_done=samples_done,
            status=status, alive=alive, tracking=tracking, rng=rng,
            n_rays=n_rays,
        )

    def kernel_round(s: BrickState) -> BrickState:
        # lanes eligible for the kernel: tracking with finite majorant and
        # no pending boundary event
        eligible = jnp.logical_and(
            s.tracking,
            jnp.logical_and(jnp.isfinite(s.inv_sig), s.status == MASKED),
        )
        coordn = (
            jnp.clip(
                (s.o + (s.t + 1e-6)[..., None] * s.d - med.box_min)
                / extent,
                0.0, 1.0,
            )
            * res_minus_1
        )
        bi = jnp.clip(
            jnp.floor(coordn / brick_size).astype(jnp.int32), 0, brick_hi
        )
        bflat = (bi[..., 2] * nby + bi[..., 1]) * nbx + bi[..., 0]
        keys = jnp.where(
            eligible, bflat.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF)
        )
        order = jnp.argsort(keys)
        packed = jnp.take(_pack(s), order, axis=0)
        keys_sorted = jnp.take(keys, order)
        ss = _unpack(packed, s.n_rays)

        key_rows = keys_sorted.reshape(n_rows, 128)
        row_key = key_rows[:, 0]
        lane_ok = key_rows == row_key[:, None]
        usable = jnp.logical_and(
            lane_ok, row_key[:, None] != jnp.uint32(0xFFFFFFFF)
        )

        row_brick = jnp.minimum(
            row_key.astype(jnp.int32), nbx * nby * nbz - 1
        )
        row_tables = jnp.take(tables, row_brick, axis=0)  # (R, 2, 128)

        shape = (n_rows, 128)
        r2 = lambda x: x.reshape(shape)
        status_in = jnp.where(
            usable, tk.RUNNING, MASKED
        ).astype(jnp.int32)

        # rays in voxel-coordinate space (kernel is geometry-free)
        vox_scale = res_minus_1 / extent
        o_vox = (ss.o - med.box_min) * vox_scale
        d_vox = ss.d * vox_scale
        inv_sig_safe = jnp.where(
            jnp.isfinite(ss.inv_sig), ss.inv_sig, 0.0
        )

        t_out, st_out, _tap, rng_state_out = tk.track_rows(
            row_tables,
            r2(o_vox[:, 0]), r2(o_vox[:, 1]), r2(o_vox[:, 2]),
            r2(d_vox[:, 0]), r2(d_vox[:, 1]), r2(d_vox[:, 2]),
            r2(ss.t), r2(ss.max_t), r2(ss.brick_exit),
            r2(ss.base[:, 0]), r2(ss.base[:, 1]), r2(ss.base[:, 2]),
            r2(inv_sig_safe), r2(inv_sig_safe * scale),
            r2(ss.rng.state), r2(ss.rng.inc), status_in,
            n_steps=k_steps, interpret=interpret,
        )
        new_status = jnp.where(
            usable.reshape(-1), st_out.reshape(-1), ss.status
        )
        # kernel lanes still RUNNING at round end are simply masked for
        # the next phase A (no event)
        new_status = jnp.where(
            jnp.logical_and(usable.reshape(-1),
                            new_status == tk.RUNNING),
            MASKED,
            new_status,
        )
        ss = ss._replace(
            t=jnp.where(usable.reshape(-1), t_out.reshape(-1), ss.t),
            status=new_status,
            rng=RngState(
                state=jnp.where(
                    usable.reshape(-1),
                    rng_state_out.reshape(-1),
                    ss.rng.state,
                ),
                inc=ss.rng.inc,
            ),
        )
        return ss

    def cond(carry):
        s = carry
        return jnp.any(
            jnp.logical_or(s.alive, s.samples_done < spp_per_lane)
        )

    def body(s):
        s = phase_a(s)
        s = kernel_round(s)
        return s

    final = jax.lax.while_loop(cond, body, state0)
    # lanes are in arbitrary (sorted) order: scatter-add once at the end
    img = jnp.zeros((n_pix, 3), jnp.float32).at[final.pix].add(
        final.accum, mode="drop"
    )
    return img.reshape(th, tw, 3), final.n_rays


# STATUS (round 1): correct (transmittance/furnace/agreement tests pass,
# runs end to end on TPU) but not yet fast: with 4x4x8 bricks the
# per-round argsort + packed permute + phase-A overhead amortizes over
# too few kernel steps (rays cross a brick in a handful of steps, and
# early-wavefront brick fragmentation leaves rows underfilled), so the
# measured throughput is ~0.15 Mrays/s on bucky-class scenes vs 11+ for
# fastSK.  The path forward (next round): 8x8x8 bricks (6 gather rows),
# persistent kernel with in-kernel block-local binning so the sort never
# leaves VMEM, and event handling fused into the kernel.  Kept in-tree as
# the scaffold for that work and as a second implementation to test the
# Pallas gather path against.
