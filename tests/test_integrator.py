"""Integration oracles for the path tracer (SURVEY.md §4 strategy):
white furnace, background passthrough, determinism, sample-batching
invariance, and scheduler agreement."""

import jax.numpy as jnp
import numpy as np
import pytest

from cudavolumerenderer_tpu.models import naive
from cudavolumerenderer_tpu.ops.camera import make_camera
from cudavolumerenderer_tpu.scene import procedural
from cudavolumerenderer_tpu.scene.types import (
    RenderSettings,
    make_medium,
    make_scene,
)


def small_scene(albedo_value=None, scale=40.0, g=0.0):
    dens = procedural.blob_volume()
    if albedo_value is None:
        albedo = np.stack(
            [dens, 0.5 * np.ones_like(dens), 1.0 - dens], axis=-1
        )
    else:
        albedo = np.full(dens.shape + (3,), albedo_value, np.float32)
    med = make_medium(dens, albedo, scale=scale, max_density=1.0, g=g)
    return make_scene(med)


def render(scene, settings, res=32, spp=4, seed=1, base=0):
    camera = make_camera(res, res)
    img, nrays = naive.render_tile(
        scene,
        camera,
        settings,
        (res, res),
        jnp.zeros(2, jnp.float32),
        (res, res),
        spp,
        seed,
        base,
    )
    return np.asarray(img) / spp, float(nrays)


class TestOracles:
    def test_white_furnace(self):
        """Albedo 1 + pass-through boundary: every pixel converges to the
        environment radiance exactly (energy conservation)."""
        scene = small_scene(albedo_value=1.0)
        settings = RenderSettings.from_flags(True, bsdf_kind="null")
        img, _ = render(scene, settings, spp=8)
        np.testing.assert_allclose(img, 1.0, atol=1e-5)

    @pytest.mark.parametrize("g", [0.0, 0.7])
    def test_white_furnace_anisotropic(self, g):
        scene = small_scene(albedo_value=1.0, g=g)
        settings = RenderSettings.from_flags(True, bsdf_kind="null")
        img, _ = render(scene, settings, res=16, spp=4)
        np.testing.assert_allclose(img, 1.0, atol=1e-5)

    def test_zero_density_is_background(self):
        """Near-zero density + pass-through boundary: image equals Le."""
        dens = np.full((8, 8, 8), 1e-12, np.float32)
        albedo = np.ones(dens.shape + (3,), np.float32)
        med = make_medium(dens, albedo, scale=1.0, max_density=1.0)
        scene = make_scene(med)
        settings = RenderSettings.from_flags(True, bsdf_kind="null")
        img, _ = render(scene, settings, res=16, spp=2)
        np.testing.assert_allclose(img, 1.0, atol=1e-4)

    def test_absorbing_medium_darker_than_scattering(self):
        settings = RenderSettings.from_flags(True, bsdf_kind="null")
        bright, _ = render(small_scene(albedo_value=0.95), settings, spp=8)
        dark, _ = render(small_scene(albedo_value=0.3), settings, spp=8)
        assert dark.mean() < bright.mean()

    def test_le_scales_linearly(self):
        scene = small_scene()
        settings = RenderSettings.from_flags(True)
        img1, _ = render(scene, settings, res=16, spp=4)
        scene2 = scene._replace(le=scene.le * 2.0)
        img2, _ = render(scene2, settings, res=16, spp=4)
        np.testing.assert_allclose(img2, img1 * 2.0, rtol=1e-5, atol=1e-6)


class TestInvariances:
    def test_deterministic(self):
        scene = small_scene()
        settings = RenderSettings.from_flags(True)
        a, _ = render(scene, settings, seed=7)
        b, _ = render(scene, settings, seed=7)
        np.testing.assert_array_equal(a, b)

    def test_seed_changes_noise(self):
        scene = small_scene()
        settings = RenderSettings.from_flags(True)
        a, _ = render(scene, settings, seed=7)
        b, _ = render(scene, settings, seed=8)
        assert not np.array_equal(a, b)

    def test_progressive_batching_invariance(self):
        """spp=4 in one launch == two launches of spp=2 with continued
        path-id bases, averaged — the accumulation-semantics contract of
        the progressive renderer."""
        scene = small_scene()
        settings = RenderSettings.from_flags(True)
        res = 16
        one, _ = render(scene, settings, res=res, spp=4, seed=3, base=0)
        a, _ = render(scene, settings, res=res, spp=2, seed=3, base=0)
        b, _ = render(scene, settings, res=res, spp=2, seed=3,
                      base=res * res * 2)
        two = (a + b) / 2
        np.testing.assert_allclose(one, two, rtol=1e-5, atol=1e-6)

    def test_ray_statistics_positive(self):
        scene = small_scene()
        settings = RenderSettings.from_flags(True)
        img, nrays = render(scene, settings, res=16, spp=2)
        assert nrays >= 16 * 16 * 2  # at least one segment per path
