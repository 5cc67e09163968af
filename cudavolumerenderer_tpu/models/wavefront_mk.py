"""Host-looped multi-kernel schedulers: naiveMK and streamingMK analogs.

The reference's MK family returns control to the host between bounces
(reference: NaiveVolPTmk launcher loop RenderKernelLauncher.cu:183-276 with
thrust stream compaction, and StreamingVolPTmk's regenerate/extend ping-pong
RenderKernelLauncher.cu:435-472).  On TPU the analog is a *Python-level*
loop of small jitted steps with a device→host sync on the active count each
bounce — exactly the dispatch overhead the thesis measures for these
strategies (naiveMK is its slowest kernel).  They are provided for parity
and as a scheduling-overhead baseline, not for speed.

naiveMK  : one jitted bounce per host step over a full path batch, with
           device-side compaction (sort by alive) between bounces.
streamingMK: host loop of fused single-step super-iterations (the
           streaming state machine stepped k times per dispatch) with
           regeneration each dispatch.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import camera as cam
from ..ops.rng import make_rng
from ..scene.types import RenderSettings, Scene
from . import integrator, naive


@partial(jax.jit, static_argnames=("settings",))
def _bounce_once(scene, settings, state):
    new_state = integrator.bounce_step(scene, settings, state)
    return new_state, jnp.sum(new_state.alive.astype(jnp.int32))


@partial(jax.jit, static_argnames=())
def _compact(state: integrator.PathState, image_id: jnp.ndarray):
    """Device-side stream compaction: stable-sort lanes by aliveness
    (the thrust::remove_if analog, RenderKernelLauncher.cu:266-275)."""
    order = jnp.argsort(jnp.logical_not(state.alive), stable=True)
    gather = lambda x: jnp.take(x, order, axis=0)
    return (
        integrator.PathState(
            o=gather(state.o),
            d=gather(state.d),
            throughput=gather(state.throughput),
            radiance=gather(state.radiance),
            alive=gather(state.alive),
            rng=jax.tree_util.tree_map(gather, state.rng),
            n_rays=state.n_rays,
        ),
        gather(image_id),
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
    compaction: bool = True,
):
    """naiveMK: host-controlled wavefront, one bounce per dispatch."""
    tw, th = tile_dim
    n_lanes = tw * th * spp
    image_id, pixel_xy = naive.lane_pixels(n_lanes, tile_dim, tile_offset)
    path_id = jnp.arange(n_lanes, dtype=jnp.uint32) + jnp.asarray(
        path_id_base, jnp.uint32
    )
    rng = make_rng(seed, path_id)
    o, d, rng = cam.generate_rays(camera, pixel_xy, full_resolution, rng)
    state = integrator.initial_state(o, d, rng)

    for _ in range(settings.max_path_length):
        state, n_active = _bounce_once(scene, settings, state)
        n_active = int(n_active)  # device→host sync, as in the reference
        if n_active == 0:
            break
        if compaction:
            state, image_id = _compact(state, image_id)

    accum = jnp.zeros((tw * th, 3), jnp.float32).at[image_id].add(
        state.radiance, mode="drop"
    )
    return accum.reshape(th, tw, 3), state.n_rays
