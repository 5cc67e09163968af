"""tailPK — the persistent Pallas tail kernel (ops/pallas/tailpk.py) and
its XLA service loop in fastSK (models/fast.py), run in interpreter mode
on CPU.  Oracles: white-furnace energy conservation (exact), statistical
agreement with the default fastSK estimator, bit-determinism, and the
dilated-brick table's layout/majorant invariants."""

import jax.numpy as jnp
import numpy as np
import pytest

from cudavolumerenderer_tpu.models import fast
from cudavolumerenderer_tpu.ops.camera import make_camera
from cudavolumerenderer_tpu.ops.pallas import tailpk
from cudavolumerenderer_tpu.scene import procedural
from cudavolumerenderer_tpu.scene.types import (
    RenderSettings,
    make_medium,
    make_scene,
)


def small_scene(n=24, scale=12.0, albedo=0.8, seed=0):
    density = procedural.blob_volume((n, n, n), n_blobs=3)
    medium = make_medium(density, albedo, scale=scale, max_density=1.0)
    return make_scene(medium)


def render(scene, settings, res=10, spp=4, seed=3, **kw):
    camera = make_camera(res, res)
    img, n_rays = fast.render_tile(
        scene, camera, settings, (res, res), jnp.zeros(2, jnp.float32),
        (res, res), spp, seed, 0, two_level=True, **kw,
    )
    return np.asarray(img), float(n_rays)


class TestDilatedBricks:
    def test_table_layout_and_majorants(self):
        rs = np.random.RandomState(2)
        d = rs.rand(20, 33, 17).astype(np.float32)
        tab, major, (nbz, nby, nbx) = tailpk.dilated_tail_bricks(
            jnp.asarray(d)
        )
        assert (nbz, nby, nbx) == (2, 3, 2)
        tab = np.asarray(tab).reshape(nbz * nby * nbx, -1)
        major = np.asarray(major)
        pad = np.zeros((33, 49, 33), np.float32)
        pad[:20, :33, :17] = d
        for bz in range(nbz):
            for by in range(nby):
                for bx in range(nbx):
                    b = (bz * nby + by) * nbx + bx
                    win = pad[
                        bz * 16 : bz * 16 + 17,
                        by * 16 : by * 16 + 17,
                        bx * 16 : bx * 16 + 17,
                    ]
                    np.testing.assert_array_equal(
                        tab[b, : tailpk.TVOX], win.reshape(-1)
                    )
                    # dilated majorant covers every tap in the window
                    assert major[b] == pytest.approx(win.max())

    def test_flat_index_matches_kernel_convention(self):
        # kernel: flat = (lz*17+ly)*17+lx on the x-fastest window
        rs = np.random.RandomState(3)
        d = rs.rand(16, 16, 16).astype(np.float32)
        tab, _, _ = tailpk.dilated_tail_bricks(jnp.asarray(d))
        tab = np.asarray(tab).reshape(1, -1)
        for (lz, ly, lx) in [(0, 0, 0), (1, 2, 3), (15, 15, 15),
                             (7, 0, 11)]:
            flat = (lz * 17 + ly) * 17 + lx
            assert tab[0, flat] == d[lz, ly, lx]


class TestTailPkRender:
    def test_furnace_conservation(self):
        """albedo=1 + null boundary BSDF => every pixel exactly 1.0 per
        sample: the whole pipeline (kernel scatters, service boundary,
        regen) conserves energy."""
        scene = small_scene(albedo=1.0, scale=8.0)
        settings = RenderSettings.from_flags(
            True, russian_roulette=False, max_path_length=200,
            bsdf_kind="null",
        )
        spp = 2
        img, _ = render(
            scene, settings, res=6, spp=spp, tail_pallas=True,
            tail_pk_width=16, tail_pk_steps=8, tail_pk_interpret=True,
            min_width=32,
        )
        np.testing.assert_allclose(img, float(spp), rtol=2e-5)

    def test_statistical_agreement_with_default_fastsk(self):
        """Same estimator family, different majorant structure: means
        agree within Monte-Carlo noise."""
        scene = small_scene(albedo=0.85, scale=10.0)
        settings = RenderSettings.from_flags(
            True, russian_roulette=True, max_path_length=64
        )
        spp = 48
        img_pk, nrays_pk = render(
            scene, settings, res=8, spp=spp, seed=5, tail_pallas=True,
            tail_pk_width=32, tail_pk_steps=8, tail_pk_interpret=True,
            min_width=64,
        )
        img_ref, nrays_ref = render(scene, settings, res=8, spp=spp,
                                    seed=5)
        # trajectories differ (different majorant structure, same
        # distribution), so re-entry counts differ only statistically
        assert abs(nrays_pk - nrays_ref) / nrays_ref < 0.1
        a, b = img_pk / spp, img_ref / spp
        # per-pixel MC noise at this spp is ~0.05; compare means tightly
        # and pixels loosely
        assert abs(a.mean() - b.mean()) < 0.02, (a.mean(), b.mean())
        assert np.abs(a - b).max() < 0.25

    def test_deterministic_rerun(self):
        scene = small_scene(albedo=0.7, scale=10.0)
        settings = RenderSettings.from_flags(
            True, russian_roulette=True, max_path_length=32
        )
        kw = dict(
            tail_pallas=True, tail_pk_width=16, tail_pk_steps=4,
            tail_pk_interpret=True, min_width=32,
        )
        img1, _ = render(scene, settings, res=6, spp=4, seed=9, **kw)
        img2, _ = render(scene, settings, res=6, spp=4, seed=9, **kw)
        np.testing.assert_array_equal(img1, img2)

    def test_ggx_boundary_path(self):
        """GGX boundary events route through the XLA service loop."""
        scene = small_scene(albedo=0.8, scale=6.0)
        settings = RenderSettings.from_flags(
            True, russian_roulette=False, max_path_length=16
        )
        spp = 16
        img_pk, _ = render(
            scene, settings, res=6, spp=spp, seed=2, tail_pallas=True,
            tail_pk_width=16, tail_pk_steps=8, tail_pk_interpret=True,
            min_width=32,
        )
        img_ref, _ = render(scene, settings, res=6, spp=spp, seed=2)
        a, b = img_pk / spp, img_ref / spp
        assert np.isfinite(a).all()
        assert abs(a.mean() - b.mean()) < 0.04, (a.mean(), b.mean())

    def test_falls_back_without_affine_albedo(self):
        """A full per-voxel (non-affine) albedo can't run the kernel's
        A*rho+B reconstruction: render_tile silently uses the XLA tail
        (bit-identical to tail_pallas=False)."""
        density = procedural.blob_volume((16, 16, 16), n_blobs=2)
        rs = np.random.RandomState(1)
        albedo = rs.rand(16, 16, 16, 4).astype(np.float32)
        scene = make_scene(
            make_medium(density, albedo, scale=8.0, max_density=1.0)
        )
        settings = RenderSettings.from_flags(True)
        img_pk, _ = render(
            scene, settings, res=6, spp=2, tail_pallas=True,
            tail_pk_interpret=True,
        )
        img_ref, _ = render(scene, settings, res=6, spp=2)
        np.testing.assert_array_equal(img_pk, img_ref)
