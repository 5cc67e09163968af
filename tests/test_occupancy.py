"""Pool autotune + HBM guard (utils/occupancy.py) and the fastSK split
albedo-table degradation — the analogs of the reference's occupancy
tuner (Occupancy.cuh:24-70) and device-capability validation with
zero-copy fallback (Config.h:119-159)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cudavolumerenderer_tpu.models import fast
from cudavolumerenderer_tpu.ops.camera import make_camera
from cudavolumerenderer_tpu.scene import procedural
from cudavolumerenderer_tpu.scene.types import (
    RenderSettings,
    make_medium,
    make_scene,
)
from cudavolumerenderer_tpu.utils import occupancy


class TestPoolAutotune:
    def test_bounded_by_work(self):
        # tiny job: the pool never exceeds the path count (rounded to 256)
        lanes = occupancy.pick_n_lanes(64 * 64, 4, (32, 32, 32))
        assert lanes <= 64 * 64 * 4
        assert lanes % 256 == 0

    def test_bounded_by_memory(self):
        # a 1 GiB budget with a 512^3 grid leaves little lane headroom
        lanes_small = occupancy.pick_n_lanes(
            1024 * 1024, 20, (512, 512, 512), budget=4 << 30
        )
        lanes_big = occupancy.pick_n_lanes(
            1024 * 1024, 20, (32, 32, 32), budget=64 << 30
        )
        assert lanes_small <= lanes_big
        assert lanes_small >= 256

    def test_default_cap(self):
        lanes = occupancy.pick_n_lanes(4096 * 4096, 100, (64, 64, 64))
        assert lanes <= 1 << 17

    def test_validate_pool_warns(self):
        with pytest.warns(UserWarning):
            occupancy.validate_pool(
                1 << 20, (1024, 1024, 1024), budget=1 << 30
            )

    def test_renderer_autotunes_when_unset(self):
        from cudavolumerenderer_tpu.config import Config, Kernel
        from cudavolumerenderer_tpu.models.renderer import create_renderer

        d = procedural.blob_volume()
        scene = make_scene(make_medium(d, 0.9, scale=40.0, max_density=1.0))
        cfg = Config(
            kernel=Kernel.STREAMING_SK, iterations=2, resolution=(16, 16),
            settings=RenderSettings.from_flags(True),
        )
        assert cfg.n_lanes is None
        r = create_renderer(scene, make_camera(16, 16), cfg)
        assert cfg.n_lanes is not None and cfg.n_lanes >= 256
        img = r.render()
        assert np.isfinite(img).all()


class TestHbmGuard:
    def test_plan_fused_small(self):
        assert occupancy.plan_albedo_table((64, 64, 64)) == "fused"

    def test_plan_split_large(self):
        # 8 GiB fused table against a 16 GiB budget -> split
        assert (
            occupancy.plan_albedo_table((768, 768, 768), budget=16 << 30)
            == "split"
        )

    def test_refuses_impossible(self):
        with pytest.raises(MemoryError):
            occupancy.plan_albedo_table((1024, 1024, 1024), budget=8 << 30)


class TestSplitAlbedoMode:
    def _full_albedo_scene(self):
        dens = procedural.blob_volume()
        rng = np.random.default_rng(3)
        # genuinely non-affine per-voxel albedo
        alb = np.clip(
            np.stack(
                [dens ** 2, np.sqrt(dens), rng.random(dens.shape)], -1
            ).astype(np.float32),
            0.05, 1.0,
        )
        scene = make_scene(
            make_medium(dens, alb, scale=40.0, max_density=1.0)
        )
        assert fast._albedo_mode(scene) == "full"
        return scene

    def _args(self, scene, res=16, spp=4):
        return (
            scene, make_camera(res, res), RenderSettings.from_flags(True),
            (res, res), jnp.zeros(2, jnp.float32), (res, res), spp, 7, 0,
        )

    def test_split_matches_fused(self, monkeypatch):
        """Split mode gathers albedo from the scene grid instead of the
        fused copy — identical values, identical draws, so the images
        agree exactly."""
        scene = self._full_albedo_scene()
        args = self._args(scene)
        imgs = {}
        for label, budget in (("fused", None), ("split", 1)):
            if budget is not None:
                # shrink the budget so the plan flips to split (but keep
                # the raw-grids check passing: raw 655 KiB < 80% of 1 MB,
                # fused 512 KiB > 30% of 1 MB)
                monkeypatch.setattr(
                    occupancy, "device_memory_budget",
                    lambda default=0: 1_000_000,
                )
                assert (
                    fast._albedo_mode(scene, allow_split=True) == "split"
                )
            else:
                assert fast._albedo_mode(scene, allow_split=True) == "full"
            for tl in (False, True):
                img, nr = fast.render_tile(*args, two_level=tl)
                imgs[(label, tl)] = (np.asarray(img), float(nr))
            monkeypatch.undo()
            fast.render_tile.clear_cache()
        for tl in (False, True):
            a, nra = imgs[("fused", tl)]
            b, nrb = imgs[("split", tl)]
            assert nra == nrb
            np.testing.assert_allclose(a, b, atol=2e-6)
