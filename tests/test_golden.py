"""Golden-image regression: fixed-seed renders must be bit-stable on CPU.

The counter-based RNG makes renders deterministic functions of
(scene, seed); these goldens pin the full pipeline (camera, AABB,
Woodcock, HG, GGX, accumulation) against accidental semantic drift.
Regenerate (only when an intentional change alters the estimator) with
the snippet in this file's git history.
"""

import os

import jax.numpy as jnp
import numpy as np

from cudavolumerenderer_tpu.models import fast, naive
from cudavolumerenderer_tpu.ops.camera import make_camera
from cudavolumerenderer_tpu.scene import procedural
from cudavolumerenderer_tpu.scene.raw_builder import albedo_from_density
from cudavolumerenderer_tpu.scene.types import (
    RenderSettings,
    make_medium,
    make_scene,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "data_golden.npz")


def render_args():
    dens = procedural.blob_volume((32, 32, 32))
    alb = albedo_from_density(dens)
    scene = make_scene(make_medium(dens, alb, scale=40.0, max_density=1.0))
    st = RenderSettings.from_flags(True)
    cam = make_camera(16, 16)
    return (
        scene, cam, st, (16, 16), jnp.zeros(2, jnp.float32), (16, 16),
        8, 4242, 0,
    )


class TestGolden:
    def test_naive_matches_golden(self):
        with np.load(GOLDEN) as g:
            expected = g["naive"]
        img, _ = naive.render_tile(*render_args())
        np.testing.assert_allclose(
            np.asarray(img), expected, rtol=1e-6, atol=1e-6
        )

    def test_fast_matches_golden(self):
        with np.load(GOLDEN) as g:
            expected = g["fast"]
        img, _ = fast.render_tile(*render_args())
        np.testing.assert_allclose(
            np.asarray(img), expected, rtol=1e-6, atol=1e-6
        )
