"""tailPK: persistent Pallas tail kernel for the fastSK cascade.

STATUS: superseded design study (PARITY.md §2.5, PERF.md round-3) —
measured 5.2-5.7 Mrays/s in composition vs 9.4-9.5 for the chained
XLA tail pools (service-round economics); kept correct + tested
behind `--tail-pallas` as the scaffold for an in-kernel-DMA variant.

The cascade's narrow tail pools are latency-bound: a handful of deep
RR-surviving paths step once per XLA while-iteration at a fixed
~0.2 ms floor (two serialized small HBM gathers plus dozens of tiny
ops — PERF.md round-2 tail anatomy: a 4096-lane pool running ~1416
such iterations).  This kernel is the TPU-ISA re-expression of the
reference's persistent-thread tail (the in-kernel loop of
RegenerationVolPTsk_kernel.cuh:147-232, where one launched block keeps
stepping its rays to completion): each surviving path gets one sublane
ROW, its current density neighborhood lives in VMEM, and K whole
tracking steps — including SCATTER events (HG phase sampling,
throughput attenuation, Russian roulette, path-length cap) — run per
kernel invocation with zero HBM traffic.

Data layout (the part that makes it a TPU program, not a CUDA port):

  * (R, 128) arrays with paths on SUBLANES; per-path scalars are
    broadcast across the 128 lanes.  The redundancy is free (the VPU is
    8x128 regardless) and it makes every table lookup expressible as
    `jnp.take_along_axis(slab, idx, axis=1)` — the one gather form
    Mosaic vectorizes (per-row table, per-lane index).
  * The density neighborhood is the path's current DILATED 16^3 brick:
    17^3 voxels (any stochastic-trilinear tap reachable from inside the
    brick, taps go to floor+1) flattened to 39 slabs of 128 lanes.  A
    tap is then 39 take_along_axis + select ops — a few hundred VPU
    cycles instead of a ~100 us HBM gather round.
  * Woodcock majorant = the dilated brick max (exactly
    models/fast.brick_majorants at granularity 16): piecewise majorants
    are free in Woodcock tracking, so switching majorant structure at
    the tail handoff is distribution-exact.

Per step the kernel consumes draws in the wavefront's own per-path PCG
streams (ops/rng.py constants): u1 (flight), then for non-crossing
steps tap-bits + u2 (acceptance), then on scatter e1+e2 (HG) and the RR
uniform — the same per-event draw pattern as the XLA schedulers.  Brick
crossings consume only u1, like the two-level XLA transit.  After a
scatter the kernel re-derives the segment state the XLA body would have
recomputed on its next iteration: box-exit distance and exit-face
normal (ops/aabb.aabb_intersect semantics, same tie-break pick order)
and the brick-exit distance (DDA slab test).

Exits (status): a lane leaves the kernel when it crosses its brick
(NEED_WINDOW — the XLA service pass re-gathers one row of the dilated
brick table), leaves the medium (EXIT_BOX — boundary/GGX event runs in
XLA), or terminates (DEAD — RR kill or path-length cap; regeneration
runs in XLA).  models/fast.py hosts that service loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import EPSILON, TWO_PI

# Tail brick geometry: 16^3 interior, 17^3 dilated, 39 x 128 slabs.
TBRICK = 16
TDIL = TBRICK + 1  # 17
TVOX = TDIL * TDIL * TDIL  # 4913
SLABS = -(-TVOX // 128)  # 39

# Lane status codes.
RUN = 0
NEED_WINDOW = 1
EXIT_BOX = 2
DEAD = 3

_MULT = 747796405  # ops/rng.py PCG multiplier
_U32 = jnp.uint32


def dilated_tail_bricks(density_zyx: jnp.ndarray):
    """(NB, SLABS, 128) dilated 16^3-brick table + (NB,) dilated
    majorants + (nbz, nby, nbx) brick-grid dims.

    Entry b holds the 17^3 voxels [org, org+16]^3 (clamped pad on the
    high side), x-fastest, flat (lz*17+ly)*17+lx, zero-padded to
    SLABS*128.  Built as one big gather from the padded grid so it
    traces/compiles in O(1) ops (a 4913-slice construction like the
    4x4x8 kernel's would melt the tracer at this size)."""
    from ...models.fast import brick_majorants

    d = jnp.asarray(density_zyx, jnp.float32)
    nz, ny, nx = d.shape
    nbz, nby, nbx = -(-nz // TBRICK), -(-ny // TBRICK), -(-nx // TBRICK)
    pz, py, px = nbz * TBRICK + 1, nby * TBRICK + 1, nbx * TBRICK + 1
    pad = jnp.pad(d, ((0, pz - nz), (0, py - ny), (0, px - nx)))
    # global padded flat index for every (brick, local) pair
    bz = jnp.arange(nbz, dtype=jnp.int32) * TBRICK
    by = jnp.arange(nby, dtype=jnp.int32) * TBRICK
    bx = jnp.arange(nbx, dtype=jnp.int32) * TBRICK
    lz = jnp.arange(TDIL, dtype=jnp.int32)
    gz = (bz[:, None] + lz[None, :]).reshape(-1)  # (nbz*17,)
    gy = (by[:, None] + lz[None, :]).reshape(-1)
    gx = (bx[:, None] + lz[None, :]).reshape(-1)
    idx = (
        gz[:, None, None] * (py * px)
        + gy[None, :, None] * px
        + gx[None, None, :]
    )  # (nbz*17, nby*17, nbx*17)
    win = (
        jnp.take(pad.reshape(-1), idx.reshape(-1), axis=0)
        .reshape(nbz, TDIL, nby, TDIL, nbx, TDIL)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(nbz * nby * nbx, TVOX)
    )
    tab = jnp.pad(win, ((0, 0), (0, SLABS * 128 - TVOX)))
    major = brick_majorants(d, (TBRICK, TBRICK, TBRICK)).reshape(-1)
    return tab.reshape(-1, SLABS, 128), major, (nbz, nby, nbx)


def _pcg(state, inc, active):
    """One masked PCG-RXS-M-XS-32 draw (ops/rng.py semantics)."""
    new_state = state * _U32(_MULT) + inc
    s = new_state
    word = ((s >> ((s >> 28) + _U32(4))) ^ s) * _U32(277803737)
    out = (word >> 22) ^ word
    return out, jnp.where(active, new_state, state)


def _uniform(bits):
    # Mosaic-safe uint32 -> f32 via 24-bit int (no u32->f32 cast).
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24)
    )


# Packed scalar parameter row layout (params input, (8, 128) f32).
P_SCALE = 0
P_G = 1
P_AR, P_AG, P_AB = 2, 3, 4  # albedo = A * rho + B per channel
P_BR, P_BG, P_BB = 5, 6, 7
P_BMINX, P_BMINY, P_BMINZ = 8, 9, 10
P_EXTX, P_EXTY, P_EXTZ = 11, 12, 13
P_RM1X, P_RM1Y, P_RM1Z = 14, 15, 16  # res - 1 per axis (float)
P_MAXPATH = 17
P_RR = 18  # 0/1 russian roulette
P_NX, P_NY, P_NZ = 19, 20, 21  # grid dims (float)
N_PARAMS = 22


def make_tail_kernel(n_rows: int, n_steps: int, interpret: bool = False):
    """pallas_call running n_steps tracking steps on n_rows paths.

    Inputs (VMEM): win (R, SLABS, 128) f32; params (8, 128) f32;
    f32 (R,128): ox oy oz dx dy dz tr tg tb t max_t bexit inv_sig
                 rho_max nrm_x nrm_y nrm_z
    i32 (R,128): worg_x worg_y worg_z bounce status
    u32 (R,128): rng_state rng_inc
    Outputs: the same state fields, updated (win and params excluded).
    """
    shape = (n_rows, 128)

    def kernel(
        win_ref, params_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
        tr_ref, tg_ref, tb_ref, t_ref, maxt_ref, bexit_ref,
        invsig_ref, rhomax_ref, nx_ref, nyy_ref, nzz_ref,
        worgx_ref, worgy_ref, worgz_ref, bounce_ref, status_ref,
        rngs_ref, rngi_ref,
        # outputs
        ox_o, oy_o, oz_o, dx_o, dy_o, dz_o,
        tr_o, tg_o, tb_o, t_o, maxt_o, bexit_o,
        invsig_o, rhomax_o, nx_o, nyy_o, nzz_o,
        bounce_o, status_o, rngs_o, rngi_o,
    ):
        def P(i):
            return params_ref[0, i]  # static-index scalar load

        scale = P(P_SCALE)
        g = P(P_G)
        A = (P(P_AR), P(P_AG), P(P_AB))
        B = (P(P_BR), P(P_BG), P(P_BB))
        bmin = (P(P_BMINX), P(P_BMINY), P(P_BMINZ))
        ext = (P(P_EXTX), P(P_EXTY), P(P_EXTZ))
        rm1 = (P(P_RM1X), P(P_RM1Y), P(P_RM1Z))
        max_path = P(P_MAXPATH)
        rr_on = P(P_RR)
        ngrid = (P(P_NX), P(P_NY), P(P_NZ))
        inc = rngi_ref[:]

        def box_exit(ox, oy, oz, dx, dy, dz):
            """Exit distance + face normal for an inside-origin ray —
            ops/aabb.aabb_intersect semantics (dist = smallest tmax for
            interior origins; normal picked in the fixed order
            +x,+y,+z,-x,-y,-z among planes whose t equals dist)."""
            o3 = (ox, oy, oz)
            d3 = (dx, dy, dz)
            ttop, tbot = [], []
            for a in range(3):
                inv = 1.0 / d3[a]
                lo = (bmin[a] - o3[a]) * inv
                hi = (bmin[a] + ext[a] - o3[a]) * inv
                tbot.append(lo)
                ttop.append(hi)
            tmin = [jnp.minimum(ttop[a], tbot[a]) for a in range(3)]
            tmax = [jnp.maximum(ttop[a], tbot[a]) for a in range(3)]
            largest_tmin = jnp.maximum(
                jnp.maximum(tmin[0], tmin[1]), tmin[2]
            )
            smallest_tmax = jnp.minimum(
                jnp.minimum(tmax[0], tmax[1]), tmax[2]
            )
            dist = jnp.where(
                largest_tmin > EPSILON, largest_tmin, smallest_tmax
            )
            nrm = [jnp.zeros_like(dist) for _ in range(3)]
            taken = jnp.zeros_like(dist, dtype=jnp.bool_)
            for t_plane, axis, sign in (
                (ttop[0], 0, 1.0), (ttop[1], 1, 1.0), (ttop[2], 2, 1.0),
                (tbot[0], 0, -1.0), (tbot[1], 1, -1.0), (tbot[2], 2, -1.0),
            ):
                match = jnp.logical_and(
                    jnp.logical_not(taken), dist == t_plane
                )
                nrm[axis] = jnp.where(
                    match, jnp.float32(sign), nrm[axis]
                )
                taken = jnp.logical_or(taken, match)
            return dist, nrm[0], nrm[1], nrm[2]

        def brick_exit_t(ox, oy, oz, dx, dy, dz, t_now, wox, woy, woz):
            """DDA exit distance of the current dilated-brick interior
            [worg, worg+16) in voxel coords (mirrors fast.py's fresh
            brick-exit computation: world-space slab test against the
            brick bounds, floored at t_now + eps)."""
            epsw = jnp.maximum(
                jnp.maximum(ext[0], ext[1]), ext[2]
            ) * jnp.float32(1e-6)
            o3 = (ox, oy, oz)
            d3 = (dx, dy, dz)
            w3 = (wox, woy, woz)
            exit_t = jnp.full_like(ox, jnp.inf)
            for a in range(3):
                up = (d3[a] > 0.0).astype(jnp.float32)
                bound_vox = w3[a].astype(jnp.float32) + up * jnp.float32(
                    TBRICK
                )
                bound_world = bmin[a] + ext[a] * bound_vox / rm1[a]
                okd = jnp.abs(d3[a]) > 1e-12
                t_axis = jnp.where(
                    okd,
                    (bound_world - o3[a]) / jnp.where(okd, d3[a], 1.0),
                    jnp.inf,
                )
                exit_t = jnp.minimum(exit_t, t_axis)
            return jnp.maximum(exit_t, t_now + epsw)

        def step_fn(_, carry):
            (ox, oy, oz, dx, dy, dz, tr, tg, tb, t, max_t, bexit,
             inv_sig, rho_max, nmx, nmy, nmz, wox, woy, woz, bounce,
             status, rstate) = carry
            active = status == RUN

            # ---- flight draw -------------------------------------------
            bits1, rstate = _pcg(rstate, inc, active)
            u1 = _uniform(bits1)
            step = -jnp.log(jnp.maximum(u1, EPSILON)) * inv_sig
            t_cand = t + step
            eff_exit = jnp.minimum(bexit, max_t)
            crossed = jnp.logical_and(active, t_cand >= eff_exit)
            box_closer = max_t <= bexit
            status = jnp.where(
                crossed,
                jnp.where(box_closer, EXIT_BOX, NEED_WINDOW),
                status,
            )
            # crossing lands on the exit plane (two-level transit
            # semantics); EXIT_BOX parks at max_t for the boundary event
            t = jnp.where(
                crossed,
                jnp.where(box_closer, max_t, bexit),
                jnp.where(active, t_cand, t),
            )
            inside = jnp.logical_and(active, jnp.logical_not(crossed))

            # ---- stochastic-trilinear tap ------------------------------
            px = ox + t * dx
            py = oy + t * dy
            pz = oz + t * dz
            cx = jnp.clip((px - bmin[0]) / ext[0], 0.0, 1.0) * rm1[0]
            cy = jnp.clip((py - bmin[1]) / ext[1], 0.0, 1.0) * rm1[1]
            cz = jnp.clip((pz - bmin[2]) / ext[2], 0.0, 1.0) * rm1[2]
            bits2, rstate = _pcg(rstate, inc, inside)
            f10 = jnp.float32(1.0 / 1024.0)
            ux = ((bits2 >> 0) & _U32(0x3FF)).astype(jnp.int32).astype(
                jnp.float32) * f10
            uy = ((bits2 >> 10) & _U32(0x3FF)).astype(jnp.int32).astype(
                jnp.float32) * f10
            uz = ((bits2 >> 20) & _U32(0x3FF)).astype(jnp.int32).astype(
                jnp.float32) * f10
            fx, fy, fz = jnp.floor(cx), jnp.floor(cy), jnp.floor(cz)
            tx = fx.astype(jnp.int32) + (ux < cx - fx).astype(jnp.int32)
            ty = fy.astype(jnp.int32) + (uy < cy - fy).astype(jnp.int32)
            tz = fz.astype(jnp.int32) + (uz < cz - fz).astype(jnp.int32)
            # grid clip (a no-op except where the window touches the
            # grid edge, where it matches the global clip exactly)
            tx = jnp.clip(tx, 0, ngrid[0].astype(jnp.int32) - 1)
            ty = jnp.clip(ty, 0, ngrid[1].astype(jnp.int32) - 1)
            tz = jnp.clip(tz, 0, ngrid[2].astype(jnp.int32) - 1)
            lx = jnp.clip(tx - wox, 0, TDIL - 1)
            ly = jnp.clip(ty - woy, 0, TDIL - 1)
            lz = jnp.clip(tz - woz, 0, TDIL - 1)
            flat = (lz * TDIL + ly) * TDIL + lx
            idx_hi = flat >> 7
            idx_lo = flat & 127
            rho = jnp.zeros(shape, jnp.float32)
            for s in range(SLABS):
                v = jnp.take_along_axis(win_ref[:, s, :], idx_lo, axis=1)
                rho = jnp.where(idx_hi == s, v, rho)

            # ---- acceptance --------------------------------------------
            bits3, rstate = _pcg(rstate, inc, inside)
            u2 = _uniform(bits3)
            accepted = jnp.logical_and(
                inside, jnp.logical_not(scale * rho * inv_sig < u2)
            )

            # ---- scatter event (in kernel) -----------------------------
            # albedo (affine in density; const albedo is A=0)
            alb = (A[0] * rho + B[0], A[1] * rho + B[1], A[2] * rho + B[2])
            e_bits1, rstate = _pcg(rstate, inc, accepted)
            e_bits2, rstate = _pcg(rstate, inc, accepted)
            e1, e2 = _uniform(e_bits1), _uniform(e_bits2)
            # HG sampling (ops/phase.importance_sample_hg formulas)
            gb = jnp.broadcast_to(g, e1.shape)
            sqr = (1.0 - gb * gb) / jnp.maximum(
                1.0 - gb + 2.0 * gb * e1, 1e-12
            )
            g_safe = jnp.where(jnp.abs(gb) > 1e-12, gb, 1.0)
            cos_a = (1.0 + gb * gb - sqr * sqr) / (2.0 * g_safe)
            cos_i = 1.0 - 2.0 * e1
            cos_th = jnp.clip(
                jnp.where(jnp.abs(gb) > EPSILON, cos_a, cos_i), -1.0, 1.0
            )
            sin_th = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_th * cos_th))
            phi = jnp.float32(TWO_PI) * e2
            # local basis (ops/math3.local_basis)
            inv_n1 = 1.0 / jnp.sqrt(
                jnp.maximum(dx * dx + dz * dz, 1e-12)
            )
            v1x, v1y, v1z = dz * inv_n1, jnp.zeros_like(dx), -dx * inv_n1
            # v2 = cross(d, v1)
            v2x = dy * v1z - dz * v1y
            v2y = dz * v1x - dx * v1z
            v2z = dx * v1y - dy * v1x
            cp, sp = jnp.cos(phi), jnp.sin(phi)
            ndx = sin_th * cp * v1x + sin_th * sp * v2x + cos_th * dx
            ndy = sin_th * cp * v1y + sin_th * sp * v2y + cos_th * dy
            ndz = sin_th * cp * v1z + sin_th * sp * v2z + cos_th * dz

            nox = ox + dx * t - dx * EPSILON
            noy = oy + dy * t - dy * EPSILON
            noz = oz + dz * t - dz * EPSILON

            sc = accepted
            ox = jnp.where(sc, nox, ox)
            oy = jnp.where(sc, noy, oy)
            oz = jnp.where(sc, noz, oz)
            dx = jnp.where(sc, ndx, dx)
            dy = jnp.where(sc, ndy, dy)
            dz = jnp.where(sc, ndz, dz)
            tr = jnp.where(sc, tr * alb[0], tr)
            tg = jnp.where(sc, tg * alb[1], tg)
            tb = jnp.where(sc, tb * alb[2], tb)
            bounce = jnp.where(sc, bounce + 1, bounce)

            # path-length cap then Russian roulette (body() order)
            capped = jnp.logical_and(
                sc, bounce.astype(jnp.float32) >= max_path
            )
            status = jnp.where(capped, DEAD, status)
            rr_mask = jnp.logical_and(
                jnp.logical_and(sc, jnp.logical_not(capped)), rr_on > 0.5
            )
            p_surv = jnp.minimum(
                1.0, jnp.maximum(jnp.maximum(tr, tg), tb)
            )
            rr_bits, rstate = _pcg(rstate, inc, rr_mask)
            u_rr = _uniform(rr_bits)
            killed = jnp.logical_and(rr_mask, u_rr > p_surv)
            status = jnp.where(killed, DEAD, status)
            survived = jnp.logical_and(rr_mask, jnp.logical_not(killed))
            inv_p = 1.0 / jnp.maximum(p_surv, 1e-20)
            tr = jnp.where(survived, tr * inv_p, tr)
            tg = jnp.where(survived, tg * inv_p, tg)
            tb = jnp.where(survived, tb * inv_p, tb)

            # surviving scatter: restart the segment from the new pose
            # (the XLA body recomputes this on its next need_isect pass)
            seg = jnp.logical_and(
                sc,
                jnp.logical_and(
                    jnp.logical_not(capped), jnp.logical_not(killed)
                ),
            )
            new_maxt, nx_n, ny_n, nz_n = box_exit(ox, oy, oz, dx, dy, dz)
            max_t = jnp.where(seg, new_maxt, max_t)
            nmx = jnp.where(seg, nx_n, nmx)
            nmy = jnp.where(seg, ny_n, nmy)
            nmz = jnp.where(seg, nz_n, nmz)
            t = jnp.where(seg, 0.0, t)
            new_bexit = brick_exit_t(
                ox, oy, oz, dx, dy, dz, jnp.zeros_like(t), wox, woy, woz
            )
            bexit = jnp.where(seg, new_bexit, bexit)

            return (ox, oy, oz, dx, dy, dz, tr, tg, tb, t, max_t, bexit,
                    inv_sig, rho_max, nmx, nmy, nmz, wox, woy, woz,
                    bounce, status, rstate)

        init = (
            ox_ref[:], oy_ref[:], oz_ref[:],
            dx_ref[:], dy_ref[:], dz_ref[:],
            tr_ref[:], tg_ref[:], tb_ref[:],
            t_ref[:], maxt_ref[:], bexit_ref[:],
            invsig_ref[:], rhomax_ref[:],
            nx_ref[:], nyy_ref[:], nzz_ref[:],
            worgx_ref[:], worgy_ref[:], worgz_ref[:],
            bounce_ref[:], status_ref[:], rngs_ref[:],
        )
        out = jax.lax.fori_loop(0, n_steps, step_fn, init)
        (ox, oy, oz, dx, dy, dz, tr, tg, tb, t, max_t, bexit, inv_sig,
         rho_max, nmx, nmy, nmz, _wx, _wy, _wz, bounce, status,
         rstate) = out
        ox_o[:] = ox
        oy_o[:] = oy
        oz_o[:] = oz
        dx_o[:] = dx
        dy_o[:] = dy
        dz_o[:] = dz
        tr_o[:] = tr
        tg_o[:] = tg
        tb_o[:] = tb
        t_o[:] = t
        maxt_o[:] = max_t
        bexit_o[:] = bexit
        invsig_o[:] = inv_sig
        rhomax_o[:] = rho_max
        nx_o[:] = nmx
        nyy_o[:] = nmy
        nzz_o[:] = nmz
        bounce_o[:] = bounce
        status_o[:] = status
        rngs_o[:] = rstate
        rngi_o[:] = inc

    f32, i32, u32 = jnp.float32, jnp.int32, jnp.uint32
    out_shapes = (
        [jax.ShapeDtypeStruct(shape, f32)] * 17
        + [jax.ShapeDtypeStruct(shape, i32)] * 2
        + [jax.ShapeDtypeStruct(shape, u32)] * 2
    )
    return pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 26,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(21)
        ),
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("n_steps", "interpret"))
def run_tail_steps(
    win, params,
    ox, oy, oz, dx, dy, dz, tr, tg, tb, t, max_t, bexit,
    inv_sig, rho_max, nmx, nmy, nmz,
    worgx, worgy, worgz, bounce, status, rng_state, rng_inc,
    *,
    n_steps: int,
    interpret: bool = False,
):
    """Jitted wrapper: K in-VMEM tracking steps on (R, 128) paths."""
    call = make_tail_kernel(ox.shape[0], n_steps, interpret)
    return call(
        win, params,
        ox, oy, oz, dx, dy, dz, tr, tg, tb, t, max_t, bexit,
        inv_sig, rho_max, nmx, nmy, nmz,
        worgx, worgy, worgz, bounce, status, rng_state, rng_inc,
    )
