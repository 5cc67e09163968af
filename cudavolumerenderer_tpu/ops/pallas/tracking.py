"""Pallas TPU tracking kernel: brick-binned Woodcock stepping.

STATUS: superseded design study (PARITY.md §2.5) — the performance
core of brickSK, which measured well below fastSK (PERF.md round-1/3);
kept tested as the record of the Mosaic dynamic_gather design space.

The performance core of the brickSK scheduler (models/brick.py) — the
TPU-ISA re-expression of the reference's hot loop (Utilities.cuh:134-155)
plus sortingSK's coherence idea (SortingVolPTsk_kernel.cuh) pushed to its
hardware conclusion:

  * rays are binned so each (sublane-)row of 128 lanes tracks inside ONE
    brick of the density grid;
  * the brick's *dilated* voxel table (5x5x9 = 225 taps, padded to two
    128-wide rows) sits in VMEM next to the rays;
  * one tracking step is then pure VPU math plus `tpu.dynamic_gather`
    (jnp.take_along_axis along lanes) — the only gather form Mosaic
    vectorizes — instead of an XLA HBM gather per tap;
  * K steps run per kernel invocation; lanes that scatter, leave their
    brick, or leave the medium fall out of the running mask and report a
    status for the XLA-level wavefront to handle.

Stochastic trilinear filtering (see models/fast.py) makes each step a
single tap; the tap is drawn inside the kernel from the same PCG streams
the rest of the framework uses (ops/rng.py), so the physics is identical.

Rays arrive in *voxel-coordinate space* (origin/direction pre-transformed
by the wrapper) so the kernel needs no scene geometry constants; the
acceptance test uses the per-lane reciprocal brick majorant, so no sigma
scale either.

Brick geometry: interior 4x4x8 voxels (z,y,x); the dilated table covers
voxel range [base, base+(4,4,8)] inclusive per axis = 5x5x9, x-fastest,
flat index (lz*5+ly)*9+lx in [0,225), stored as two 128-lane rows.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...constants import EPSILON

# Interior brick size (z, y, x) and dilated table size.
BRICK = (4, 4, 8)
DILATED = (5, 5, 9)  # 225 voxels
TABLE_W = 128  # lanes per row

_MULT = 747796405
_U32 = jnp.uint32

# Status codes reported per lane.
RUNNING = 0
SCATTER = 1
EXIT_BRICK = 2
EXIT_BOX = 3


def build_dilated_bricks(density_zyx) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(n_bricks, 2, 128) dilated brick tables + per-brick dilated
    majorants.  Row layout: flat (lz*5+ly)*9+lx, split into two 128-wide
    halves (entries 225..255 are zero padding).  Pure jnp (traceable) so
    it differentiates/jits with the scene; XLA fuses the 225 strided
    slices into one re-layout."""
    d = jnp.asarray(density_zyx, jnp.float32)
    nz, ny, nx = d.shape
    bz, by, bx = BRICK
    nbz, nby, nbx = -(-nz // bz), -(-ny // by), -(-nx // bx)
    dz, dy, dx = DILATED
    padded = jnp.pad(
        d,
        (
            (0, nbz * bz + 1 - nz),
            (0, nby * by + 1 - ny),
            (0, nbx * bx + 1 - nx),
        ),
    )
    parts = []
    for oz in range(dz):
        for oy in range(dy):
            for ox in range(dx):
                parts.append(
                    padded[
                        oz : oz + bz * (nbz - 1) + 1 : bz,
                        oy : oy + by * (nby - 1) + 1 : by,
                        ox : ox + bx * (nbx - 1) + 1 : bx,
                    ]
                )
    win = jnp.stack(parts, axis=-1)  # (nbz, nby, nbx, 225)
    n_bricks = nbz * nby * nbx
    tables = jnp.concatenate(
        [
            win.reshape(n_bricks, dz * dy * dx),
            jnp.zeros((n_bricks, 256 - dz * dy * dx), jnp.float32),
        ],
        axis=1,
    )
    majorant = jnp.max(win, axis=-1)
    return tables.reshape(-1, 2, 128), majorant


def _pcg_bits(state, inc, active):
    new_state = state * _U32(_MULT) + inc
    s = new_state
    word = ((s >> ((s >> 28) + _U32(4))) ^ s) * _U32(277803737)
    out = (word >> 22) ^ word
    state = jnp.where(active, new_state, state)
    return out, state


def _uniform(bits):
    # Mosaic has no uint32->f32 cast; >>8 fits in 24 bits so go via int32.
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24)
    )


def make_track_kernel(n_rows: int, n_steps: int, interpret: bool = False):
    """Build the pallas_call for a fixed row/step count.

    17 inputs, all (n_rows, 128) in VMEM:
      tab_lo, tab_hi              — dilated brick density tables
      ox, oy, oz, dx, dy, dz      — rays in voxel-coordinate space
      t, max_t, brick_exit        — distances in world-t units
      base_x, base_y, base_z      — dilated-table base voxel coords
      inv_sig                     — 1/(sigma_scale * rho_max_brick)
      inv_rho_max                 — 1/rho_max_brick
      rng_state, rng_inc, status
    Outputs: t, status, tap (local flat index at scatter), rng_state.
    """
    shape = (n_rows, TABLE_W)

    def kernel(
        tab_lo_ref, tab_hi_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
        t_ref, max_t_ref, brick_exit_ref,
        base_x_ref, base_y_ref, base_z_ref,
        inv_sig_ref, inv_rho_ref, rng_state_ref, rng_inc_ref,
        status_in_ref,
        t_out_ref, status_out_ref, tap_out_ref, rng_state_out_ref,
    ):
        tab_lo = tab_lo_ref[:]
        tab_hi = tab_hi_ref[:]
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        max_t = max_t_ref[:]
        brick_exit = brick_exit_ref[:]
        base_x, base_y, base_z = base_x_ref[:], base_y_ref[:], base_z_ref[:]
        inv_sig = inv_sig_ref[:]
        inv_rho = inv_rho_ref[:]
        inc = rng_inc_ref[:]

        eff_exit = jnp.minimum(brick_exit, max_t)
        box_is_closer = max_t <= brick_exit

        def step_fn(_, carry):
            t, status, tap, state = carry
            active = status == RUNNING
            bits1, state = _pcg_bits(state, inc, active)
            u1 = _uniform(bits1)
            step = -jnp.log(jnp.maximum(u1, EPSILON)) * inv_sig
            t = jnp.where(active, t + step, t)

            crossed = jnp.logical_and(active, t >= eff_exit)
            status = jnp.where(
                crossed,
                jnp.where(box_is_closer, EXIT_BOX, EXIT_BRICK),
                status,
            )
            still = jnp.logical_and(active, jnp.logical_not(crossed))

            lx = ox + t * dx - base_x
            ly = oy + t * dy - base_y
            lz = oz + t * dz - base_z

            bits2, state = _pcg_bits(state, inc, still)
            fx = jnp.floor(lx)
            fy = jnp.floor(ly)
            fz = jnp.floor(lz)
            f10 = jnp.float32(1.0 / 1024.0)
            ux = ((bits2 >> 0) & _U32(0x3FF)).astype(jnp.int32).astype(
                jnp.float32) * f10
            uy = ((bits2 >> 10) & _U32(0x3FF)).astype(jnp.int32).astype(
                jnp.float32) * f10
            uz = ((bits2 >> 20) & _U32(0x3FF)).astype(jnp.int32).astype(
                jnp.float32) * f10
            ix = jnp.clip(
                fx.astype(jnp.int32) + (ux < lx - fx).astype(jnp.int32),
                0, DILATED[2] - 1,
            )
            iy = jnp.clip(
                fy.astype(jnp.int32) + (uy < ly - fy).astype(jnp.int32),
                0, DILATED[1] - 1,
            )
            iz = jnp.clip(
                fz.astype(jnp.int32) + (uz < lz - fz).astype(jnp.int32),
                0, DILATED[0] - 1,
            )
            flat = (iz * DILATED[1] + iy) * DILATED[2] + ix  # [0, 225)
            hi = flat >= TABLE_W
            idx = jnp.where(hi, flat - TABLE_W, flat)
            v_lo = jnp.take_along_axis(tab_lo, idx, axis=1)
            v_hi = jnp.take_along_axis(tab_hi, idx, axis=1)
            rho = jnp.where(hi, v_hi, v_lo)

            bits3, state = _pcg_bits(state, inc, still)
            u2 = _uniform(bits3)
            accept = jnp.logical_and(
                still, jnp.logical_not(rho * inv_rho < u2)
            )
            status = jnp.where(accept, SCATTER, status)
            tap = jnp.where(accept, flat, tap)
            return (t, status, tap, state)

        init = (
            t_ref[:],
            status_in_ref[:],
            jnp.zeros(shape, jnp.int32),
            rng_state_ref[:],
        )
        t, status, tap, state = jax.lax.fori_loop(0, n_steps, step_fn, init)
        t_out_ref[:] = t
        status_out_ref[:] = status
        tap_out_ref[:] = tap
        rng_state_out_ref[:] = state

    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct(shape, f32),
        jax.ShapeDtypeStruct(shape, jnp.int32),
        jax.ShapeDtypeStruct(shape, jnp.int32),
        jax.ShapeDtypeStruct(shape, jnp.uint32),
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 19,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)
        ),
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("n_steps", "interpret"))
def track_rows(
    tables,  # (R, 2, 128)
    ox, oy, oz, dx, dy, dz,  # (R, 128) voxel-space rays
    t, max_t, brick_exit,
    base_x, base_y, base_z,
    inv_sig, inv_rho, rng_state, rng_inc, status,
    *,
    n_steps: int,
    interpret: bool = False,
):
    """Jitted wrapper: run K tracking steps on (R, 128) binned lanes."""
    n_rows = ox.shape[0]
    call = make_track_kernel(n_rows, n_steps, interpret)
    return call(
        tables[:, 0, :], tables[:, 1, :],
        ox, oy, oz, dx, dy, dz,
        t, max_t, brick_exit,
        base_x, base_y, base_z,
        inv_sig, inv_rho, rng_state, rng_inc, status,
    )
