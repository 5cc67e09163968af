"""End-to-end inverse rendering: recover a perturbed density grid and
checkpoint/resume round-trip (SURVEY.md §5 checkpoint requirement)."""

import os

import jax.numpy as jnp
import numpy as np

from cudavolumerenderer_tpu.models.differentiable import (
    CameraSpec,
    SceneSpec,
    render_diff,
)
from cudavolumerenderer_tpu.models.inverse import (
    InverseConfig,
    load_checkpoint,
    orbit_camera_specs,
    render_view_targets,
    run_inverse,
    run_inverse_pyramid,
    upsample_density,
)
from cudavolumerenderer_tpu.scene import procedural
from cudavolumerenderer_tpu.scene.types import RenderSettings


def setup(n=6):
    spec = SceneSpec(scale=2.5, max_density=1.0)
    cam = CameraSpec(res_x=8, res_y=8, fov_x_deg=0.4)
    settings = RenderSettings.from_flags(
        True, russian_roulette=False, max_path_length=8, bsdf_kind="null"
    )
    rs = np.random.RandomState(0)
    density = jnp.asarray(
        0.3 + 0.4 * rs.rand(n, n, n).astype(np.float32)
    )
    albedo = jnp.zeros((n, n, n, 4), jnp.float32)
    return spec, cam, settings, density, albedo


class TestInverse:
    def test_recovers_density_direction(self, tmp_path):
        spec, cam, settings, density, albedo = setup()
        config = InverseConfig(
            resolution=(8, 8), spp=96, learning_rate=0.05, n_steps=12,
            checkpoint_dir=str(tmp_path), checkpoint_every=6,
        )
        target = render_diff(
            density, albedo, 999, spec, cam, settings, (8, 8), 256
        ) / 256.0

        d0 = jnp.clip(density * 1.7, 0.0, 1.0)
        d_fit, _, losses = run_inverse(
            target, d0, albedo, spec, cam, settings, config
        )
        assert losses[-1] < losses[0] * 0.7, losses
        # fitted grid is closer to the truth than the init
        err0 = float(jnp.mean((d0 - density) ** 2))
        err1 = float(jnp.mean((d_fit - density) ** 2))
        assert err1 < err0

        # checkpoint round-trip
        d_ck, a_ck, step = load_checkpoint(str(tmp_path), 12)
        assert step == 12
        assert np.asarray(d_ck).shape == density.shape

    def test_multiview_orbit_recovery(self):
        spec, _, settings, density, albedo = setup()
        cams = orbit_camera_specs(3, radius=100.0, res=(8, 8),
                                  fov_x_deg=0.4)
        # orbit poses actually differ (first is default -z pose, second
        # views from the side)
        img0 = render_diff(
            density, albedo, 1, spec, cams[0], settings, (8, 8), 64
        )
        img1 = render_diff(
            density, albedo, 1, spec, cams[1], settings, (8, 8), 64
        )
        assert float(jnp.max(jnp.abs(img0 - img1))) > 1e-3

        targets = jnp.stack(
            [
                render_diff(
                    density, albedo, 999 + v, spec, c, settings, (8, 8),
                    256,
                ) / 256.0
                for v, c in enumerate(cams)
            ]
        )
        config = InverseConfig(
            resolution=(8, 8), spp=64, learning_rate=0.05, n_steps=10,
        )
        d0 = jnp.clip(density * 1.7, 0.0, 1.0)
        d_fit, _, losses = run_inverse(
            targets, d0, albedo, spec, cams, settings, config
        )
        assert losses[-1] < losses[0] * 0.8, losses
        err0 = float(jnp.mean((d0 - density) ** 2))
        err1 = float(jnp.mean((d_fit - density) ** 2))
        assert err1 < err0

    def test_pyramid_multiview_recovery_from_flat_init(self):
        """The BASELINE config 5 recipe at CI scale: recover a 12^3 blob
        grid from a FLAT init (no structure leaked) via multi-view
        orbit targets + coarse-to-fine pyramid + TV prior, with the
        two-level estimator and the traced-camera single-compile loss.
        The full-scale run is benchmarks/inverse_256.py."""
        gt = jnp.asarray(procedural.blob_volume((12, 12, 12), n_blobs=3))
        albedo = jnp.full((1, 1, 1, 4), 0.6, jnp.float32)
        spec = SceneSpec(scale=16.0, max_density=1.0)
        settings = RenderSettings.from_flags(
            True, russian_roulette=False, max_path_length=24
        )
        views = orbit_camera_specs(
            4, radius=100.0, res=(16, 16), fov_x_deg=0.8
        )
        targets = render_view_targets(
            gt, albedo, spec, views, settings, (16, 16), 48, True
        )
        config = InverseConfig(
            resolution=(16, 16), spp=12, learning_rate=0.08, seed=5,
            two_level=True, tv_weight=1e-3, views_per_step=2,
        )
        dens, losses = run_inverse_pyramid(
            targets, views, albedo, spec, settings, config,
            levels=[(6, 10), (12, 14)], init_value=0.25,
        )
        gtn = np.asarray(gt)
        mse0 = float(((0.25 - gtn) ** 2).mean())
        mse1 = float(((np.asarray(dens) - gtn) ** 2).mean())
        # measured 0.38 with these exact (deterministic) seeds
        assert mse1 / mse0 < 0.6, (mse0, mse1)
        assert losses[-1][-1] < losses[0][0] * 0.3

    def test_resume_matches_unbroken_run(self, tmp_path):
        """A run killed at step k and resumed from its checkpoint must
        reproduce the unbroken run's loss trajectory EXACTLY: the
        checkpoint carries the Adam moments and the seed schedule
        derives from (config.seed, step) — VERDICT r2 item 3 (the
        round-2 checkpoint silently dropped opt_state)."""
        from cudavolumerenderer_tpu.models.inverse import (
            find_latest_checkpoint,
            run_inverse_views,
        )
        import optax

        spec, _, settings, density, albedo = setup()
        cams = orbit_camera_specs(2, radius=100.0, res=(8, 8),
                                  fov_x_deg=0.4)
        targets = render_view_targets(
            density, albedo, spec, cams, settings, (8, 8), 32, False
        )
        d0 = jnp.full_like(density, 0.4)
        base = dict(
            resolution=(8, 8), spp=16, learning_rate=0.05, seed=11,
            views_per_step=2,
        )
        # unbroken 8-step run
        cfg_full = InverseConfig(n_steps=8, **base)
        d_full, losses_full, _ = run_inverse_views(
            targets, cams, d0, albedo, spec, settings, cfg_full
        )
        # killed at step 4 (checkpoint every 2), resumed to 8
        ck = str(tmp_path / "ck")
        cfg_part = InverseConfig(
            n_steps=4, checkpoint_dir=ck, checkpoint_every=2, **base
        )
        run_inverse_views(
            targets, cams, d0, albedo, spec, settings, cfg_part
        )
        latest = find_latest_checkpoint(ck)
        assert latest == 4
        optimizer = optax.adam(base["learning_rate"])
        tpl = optimizer.init(d0)
        d_ck, _, step_ck, opt_ck = load_checkpoint(
            ck, latest, opt_state_like=tpl
        )
        assert opt_ck is not None
        cfg_res = InverseConfig(n_steps=8, **base)
        d_res, losses_res, _ = run_inverse_views(
            targets, cams, jnp.asarray(d_ck), albedo, spec, settings,
            cfg_res, opt_state=opt_ck, start_step=step_ck,
        )
        # steps 4..7 of the resumed run match the unbroken run exactly
        np.testing.assert_allclose(
            losses_res, losses_full[4:], rtol=0, atol=0
        )
        np.testing.assert_array_equal(
            np.asarray(d_res), np.asarray(d_full)
        )

    def test_pyramid_resume(self, tmp_path):
        """Pyramid resume restarts from the deepest checkpointed level
        and ends bit-identical to the unbroken pyramid."""
        gt = jnp.asarray(procedural.blob_volume((8, 8, 8), n_blobs=2))
        albedo = jnp.full((1, 1, 1, 4), 0.6, jnp.float32)
        spec = SceneSpec(scale=8.0, max_density=1.0)
        settings = RenderSettings.from_flags(
            True, russian_roulette=False, max_path_length=8
        )
        views = orbit_camera_specs(2, radius=100.0, res=(8, 8),
                                   fov_x_deg=0.8)
        targets = render_view_targets(
            gt, albedo, spec, views, settings, (8, 8), 16, False
        )
        levels = [(4, 4), (8, 4)]
        ck = str(tmp_path / "pyr")
        cfg = InverseConfig(
            resolution=(8, 8), spp=8, learning_rate=0.08, seed=5,
            views_per_step=2, checkpoint_dir=ck, checkpoint_every=2,
        )
        d_full, _ = run_inverse_pyramid(
            targets, views, albedo, spec, settings, cfg, levels
        )
        # wipe the fine level's late checkpoints to simulate a fault
        # mid-level-2, then resume
        for f in sorted(os.listdir(os.path.join(ck, "L8"))):
            step = int(f[len("step_"):-len(".npz")])
            if step > 2:
                os.remove(os.path.join(ck, "L8", f))
        d_res, _ = run_inverse_pyramid(
            targets, views, albedo, spec, settings, cfg, levels,
            resume=True,
        )
        np.testing.assert_array_equal(
            np.asarray(d_res), np.asarray(d_full)
        )

    def test_spp_chunks_must_divide(self):
        from cudavolumerenderer_tpu.models.inverse import (
            run_inverse_views,
        )
        import pytest

        spec, _, settings, density, albedo = setup()
        cams = orbit_camera_specs(2, radius=100.0, res=(8, 8))
        targets = jnp.zeros((2, 8, 8, 3), jnp.float32)
        cfg = InverseConfig(resolution=(8, 8), spp=8, spp_chunks=3,
                            n_steps=1)
        with pytest.raises(ValueError, match="spp_chunks"):
            run_inverse_views(
                targets, cams, density, albedo, spec, settings, cfg
            )

    def test_upsample_density(self):
        d = jnp.asarray(np.random.RandomState(1).rand(4, 4, 4))
        up = upsample_density(d, (8, 8, 8))
        assert up.shape == (8, 8, 8)
        # trilinear resize preserves the mean approximately
        assert abs(float(up.mean()) - float(d.mean())) < 0.05


class TestObservability:
    """Identifiability criterion: per-voxel min escape optical depth
    (inverse.observability_depth) and the shell/interior MSE split."""

    def test_constant_density_analytic(self):
        # constant density d in a unit box, n voxels: min escape depth
        # of voxel i along x is d*scale*min(i, n-1-i)/n (exclusive sum)
        import numpy as np

        from cudavolumerenderer_tpu.models import inverse

        n, d, scale = 8, 0.5, 10.0
        tau = inverse.observability_depth(
            np.full((n, n, n), d, np.float32), scale
        )
        step = d * scale / n
        # face voxels see zero depth; center sees (n/2 - 1 + ... ) steps
        assert tau[0, 0, 0] == 0.0
        expect_center = step * (n // 2 - 1)
        np.testing.assert_allclose(
            tau[n // 2, n // 2, n // 2], expect_center, rtol=1e-6
        )
        # symmetry under flips
        np.testing.assert_allclose(tau, np.flip(tau, 0), rtol=1e-6)

    def test_dense_core_is_unobservable(self):
        # a dense ball: its center must exceed tau_c at large scale,
        # and the split must mark a nonempty shell AND interior
        import numpy as np

        from cudavolumerenderer_tpu.models import inverse
        from cudavolumerenderer_tpu.scene import procedural

        gt = procedural.medical_volume((32, 32, 32), n_blobs=40)
        tau = inverse.observability_depth(gt, 100.0)
        assert tau[16, 16, 16] > 5.0
        split = inverse.split_mse_by_observability(
            np.full_like(gt, 0.25), gt, 0.25, 100.0, tau_c=5.0
        )
        assert split["shell"]["n_voxels"] > 0
        assert split["interior"]["n_voxels"] > 0
        # recovered == init: both ratios are exactly 1
        assert split["shell"]["mse_ratio"] == 1.0
        assert split["interior"]["mse_ratio"] == 1.0

    def test_split_detects_shell_only_recovery(self):
        # a "recovery" equal to truth on the shell but prior-valued in
        # the interior: shell ratio ~0, interior ratio ~1
        import numpy as np

        from cudavolumerenderer_tpu.models import inverse
        from cudavolumerenderer_tpu.scene import procedural

        gt = procedural.medical_volume((32, 32, 32), n_blobs=40)
        tau = inverse.observability_depth(gt, 100.0)
        rec = np.where(tau < 5.0, gt, 0.25)
        split = inverse.split_mse_by_observability(
            rec, gt, 0.25, 100.0, tau_c=5.0
        )
        assert split["shell"]["mse_ratio"] == 0.0
        assert split["interior"]["mse_ratio"] == 1.0
