"""Native .vdb round-trip: the from-scratch OpenVDB archive writer
(scene/vdb.py write_vdb) against the native C++ reader
(csrc/cvr_vdb.cpp via utils/native), with the reference VDBAdapter's
densify semantics (active bbox, inactive = 0)."""

import numpy as np
import pytest

from cudavolumerenderer_tpu.scene import vdb
from cudavolumerenderer_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def sparse_volume(shape=(21, 29, 37), seed=5):
    rs = np.random.RandomState(seed)
    d = rs.rand(*shape).astype(np.float32)
    d[d < 0.7] = 0.0  # sparsity incl. fully-empty leaves
    d[:, 8:16, :] = 0.0
    return d


class TestVdbRoundTrip:
    @pytest.mark.parametrize("compression", ["zip", "none"])
    def test_density_round_trip(self, tmp_path, compression):
        d = sparse_volume()
        path = str(tmp_path / f"rt_{compression}.vdb")
        vdb.write_vdb(path, d, compression=compression)
        bbox, channels = native.vdb_grid_info(path, "density")
        assert channels == 1
        got, _ = native.vdb_densify(path, "density", 1)
        # densified over the ACTIVE bbox: compare against the original
        # cropped to its nonzero extent
        nz = np.nonzero(d)
        lo = [a.min() for a in reversed(nz)]  # x, y, z
        hi = [a.max() for a in reversed(nz)]
        assert list(bbox) == lo + hi
        crop = d[lo[2]:hi[2] + 1, lo[1]:hi[1] + 1, lo[0]:hi[0] + 1]
        np.testing.assert_array_equal(got[..., 0], crop)

    def test_vec3s_albedo_round_trip(self, tmp_path):
        d = sparse_volume()
        alb = np.stack([d, 0.5 * (d > 0), 1.0 - d], axis=-1).astype(
            np.float32
        )
        alb[d == 0] = 0.0
        path = str(tmp_path / "rt3.vdb")
        vdb.write_vdb(path, d, alb)
        got, bbox = native.vdb_densify(path, "albedo", 3)
        nz = np.nonzero(d)
        lo = [a.min() for a in reversed(nz)]
        hi = [a.max() for a in reversed(nz)]
        crop = alb[lo[2]:hi[2] + 1, lo[1]:hi[1] + 1, lo[0]:hi[0] + 1]
        np.testing.assert_array_equal(got, crop)

    def test_missing_grid_raises(self, tmp_path):
        d = sparse_volume()
        path = str(tmp_path / "nogrid.vdb")
        vdb.write_vdb(path, d)
        with pytest.raises((KeyError, RuntimeError)):
            native.vdb_grid_info(path, "albedo")

    def test_load_vdb_scene(self, tmp_path):
        d = sparse_volume()
        alb = np.stack([d, d, d], axis=-1).astype(np.float32)
        path = str(tmp_path / "scene.vdb")
        vdb.write_vdb(path, d, alb)
        scene, camera = vdb.load_vdb_scene(path)
        # VDBSceneBuilder conventions (reference: VDBSceneBuilder.h:40-80)
        assert float(scene.medium.scale) == 100.0
        assert float(scene.medium.max_density) == pytest.approx(
            float(d.max())
        )
        np.testing.assert_allclose(
            np.asarray(scene.medium.box_min), [-0.5, -0.5, -0.5]
        )

    def test_larger_grid_multiple_internal2(self, tmp_path):
        # spans several Internal2 nodes (>128 voxels along x)
        rs = np.random.RandomState(9)
        d = np.zeros((17, 40, 300), np.float32)
        d[3:12, 5:30, 10:290] = (
            rs.rand(9, 25, 280).astype(np.float32) > 0.6
        ) * rs.rand(9, 25, 280).astype(np.float32)
        path = str(tmp_path / "big.vdb")
        vdb.write_vdb(path, d)
        got, bbox = native.vdb_densify(path, "density", 1)
        nzidx = np.nonzero(d)
        lo = [a.min() for a in reversed(nzidx)]
        hi = [a.max() for a in reversed(nzidx)]
        crop = d[lo[2]:hi[2] + 1, lo[1]:hi[1] + 1, lo[0]:hi[0] + 1]
        np.testing.assert_array_equal(got[..., 0], crop)
