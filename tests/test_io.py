"""Scene I/O: .vol round-trip, Mitsuba XML, MHD (incl. zlib), raw builder
transfer function, npz bricks, image writers."""

import os
import zlib

import numpy as np
import pytest

from cudavolumerenderer_tpu.scene import vol
from cudavolumerenderer_tpu.scene.mhd import load_mhd_scene, read_mhd, smooth_step
from cudavolumerenderer_tpu.scene.raw_builder import (
    albedo_from_density,
    load_raw_scene,
    transfer_function,
)
from cudavolumerenderer_tpu.scene.vdb import load_npz_scene, save_npz
from cudavolumerenderer_tpu.scene.xml_builder import load_xml_scene
from cudavolumerenderer_tpu.utils.image import (
    load_hdr,
    save_hdr,
    save_png,
    tonemap,
)


class TestVol:
    def test_roundtrip_scalar(self, tmp_path):
        data = np.random.RandomState(0).rand(4, 5, 6).astype(np.float32)
        p = str(tmp_path / "d.vol")
        vol.write_vol(p, data, (-1, -2, -3), (1, 2, 3))
        back = vol.read_vol(p)
        np.testing.assert_array_equal(back.data, data)
        np.testing.assert_allclose(back.box_min, [-1, -2, -3])
        np.testing.assert_allclose(back.box_max, [1, 2, 3])

    def test_roundtrip_vector(self, tmp_path):
        data = np.random.RandomState(1).rand(3, 3, 3, 3).astype(np.float32)
        p = str(tmp_path / "a.vol")
        vol.write_vol(p, data, (0, 0, 0), (1, 1, 1))
        back = vol.read_vol(p)
        np.testing.assert_array_equal(back.data, data)

    def test_rejects_bad_magic(self, tmp_path):
        p = str(tmp_path / "bad.vol")
        with open(p, "wb") as f:
            f.write(b"NOPE" + b"\x00" * 64)
        with pytest.raises(ValueError, match="not a Mitsuba"):
            vol.read_vol(p)


class TestXml:
    def make_scene_files(self, tmp_path):
        rs = np.random.RandomState(2)
        density = rs.rand(8, 8, 8).astype(np.float32)
        albedo = rs.rand(8, 8, 8, 3).astype(np.float32)
        vol.write_vol(
            str(tmp_path / "density.vol"), density,
            (-0.5, -0.5, -0.5), (0.5, 0.5, 0.5),
        )
        vol.write_vol(
            str(tmp_path / "albedo.vol"), albedo,
            (-0.5, -0.5, -0.5), (0.5, 0.5, 0.5),
        )
        xml = """<scene version="0.5.0">
  <sensor type="perspective">
    <float name="fov" value="30"/>
    <film type="hdrfilm">
      <integer name="width" value="128"/>
      <integer name="height" value="96"/>
    </film>
  </sensor>
  <medium type="heterogeneous" id="smoke">
    <volume name="density" type="gridvolume">
      <string name="filename" value="density.vol"/>
    </volume>
    <volume name="albedo" type="gridvolume">
      <string name="filename" value="albedo.vol"/>
    </volume>
    <float name="scale" value="200"/>
  </medium>
</scene>"""
        # the reference reads the first <string> child's value attr
        xml = xml.replace('name="filename" ', "")
        p = str(tmp_path / "scene.xml")
        with open(p, "w") as f:
            f.write(xml)
        return p, density, albedo

    def test_load(self, tmp_path):
        p, density, albedo = self.make_scene_files(tmp_path)
        scene, camera = load_xml_scene(p)
        np.testing.assert_array_equal(
            np.asarray(scene.medium.density.data), density
        )
        np.testing.assert_array_equal(
            np.asarray(scene.medium.albedo.data)[..., :3], albedo
        )
        assert float(scene.medium.scale) == 200.0
        # majorant is the clamped max (reference vol2Rawf semantics)
        assert float(scene.medium.max_density) == pytest.approx(
            min(1.0, density.max()), rel=1e-6
        )
        # camera: fov 30°, 128x96 film
        import math

        assert float(camera.raster_to_view[0]) == pytest.approx(
            math.tan(30 * math.pi / 360), rel=1e-5
        )


class TestMhd:
    def test_compressed_short(self, tmp_path):
        rs = np.random.RandomState(3)
        volume = (rs.rand(6, 5, 4) * 1000).astype(np.int16)  # (Z,Y,X)
        raw = zlib.compress(volume.tobytes())
        (tmp_path / "t.raw").write_bytes(raw)
        (tmp_path / "t.mhd").write_text(
            "ObjectType = Image\nNDims = 3\nBinaryData = True\n"
            "BinaryDataByteOrderMSB = False\nCompressedData = True\n"
            "DimSize = 4 5 6\nElementType = MET_SHORT\n"
            "ElementDataFile = t.raw\n"
        )
        back = read_mhd(str(tmp_path / "t.mhd"))
        np.testing.assert_array_equal(back, volume.astype(np.float32))

    def test_mha_local_payload(self, tmp_path):
        """.mha single-file MetaImage: binary data follows the
        'ElementDataFile = LOCAL' header line (the dead MhaSceneBuilder's
        format, reference MhaSceneBuilder.h:32-51)."""
        rs = np.random.RandomState(5)
        volume = (rs.rand(5, 4, 3) * 4000).astype(np.uint16)
        header = (
            "ObjectType = Image\nNDims = 3\nBinaryData = True\n"
            "BinaryDataByteOrderMSB = False\nDimSize = 3 4 5\n"
            "ElementType = MET_USHORT\nElementDataFile = LOCAL\n"
        )
        (tmp_path / "t.mha").write_bytes(
            header.encode() + volume.tobytes()
        )
        back = read_mhd(str(tmp_path / "t.mha"))
        np.testing.assert_array_equal(back, volume.astype(np.float32))
        # compressed payload too
        (tmp_path / "c.mha").write_bytes(
            header.replace(
                "BinaryData = True\n",
                "BinaryData = True\nCompressedData = True\n",
            ).encode() + zlib.compress(volume.tobytes())
        )
        back = read_mhd(str(tmp_path / "c.mha"))
        np.testing.assert_array_equal(back, volume.astype(np.float32))
        # extension auto-detection routes .mha to the MHD builder
        from cudavolumerenderer_tpu.config import SceneType
        assert SceneType.detect("x.mha") == SceneType.MHD

    def test_scene_semantics(self, tmp_path):
        volume = np.linspace(0, 255, 4 * 4 * 4).astype(np.uint8)
        (tmp_path / "s.raw").write_bytes(volume.tobytes())
        (tmp_path / "s.mhd").write_text(
            "NDims = 3\nDimSize = 4 4 4\nElementType = MET_UCHAR\n"
            "CompressedData = False\nElementDataFile = s.raw\n"
        )
        scene, camera = load_mhd_scene(str(tmp_path / "s.mhd"))
        d = np.asarray(scene.medium.density.data)
        # smoothstep(0.2, 0.6) of min-max normalized data
        norm = volume.reshape(4, 4, 4).astype(np.float32) / 255.0
        np.testing.assert_allclose(
            d, smooth_step(0.2, 0.6, norm), atol=1e-6
        )
        assert float(scene.medium.scale) == 100.0
        a = np.asarray(scene.medium.albedo.data)
        np.testing.assert_allclose(a[..., 0], d, atol=1e-6)
        np.testing.assert_allclose(a[..., 1], 0.0)


class TestRaw:
    def test_transfer_function_shape(self):
        tf = transfer_function()
        assert tf.shape == (100, 4)
        # reference quirk: segment 1 ends 20% toward red, then snaps
        np.testing.assert_allclose(tf[0, :3], [0.02, 0.2, 0.02], atol=1e-6)
        np.testing.assert_allclose(tf[20, :3], [1.0, 0.02, 0.02], atol=1e-6)

    def test_load(self, tmp_path):
        data = np.random.RandomState(4).randint(
            0, 255, 32 * 32 * 32, dtype=np.uint8
        )
        p = str(tmp_path / "b.raw")
        data.tofile(p)
        scene, camera = load_raw_scene(p)
        d = np.asarray(scene.medium.density.data)
        assert d.shape == (32, 32, 32)
        assert d.max() == pytest.approx(1.0)
        assert float(scene.medium.scale) == 40.0
        assert float(scene.medium.max_density) == 1.0

    def test_wrong_size_raises(self, tmp_path):
        p = str(tmp_path / "tiny.raw")
        np.zeros(10, np.uint8).tofile(p)
        with pytest.raises(ValueError, match="bytes"):
            load_raw_scene(p)


class TestNpz:
    def test_roundtrip(self, tmp_path):
        rs = np.random.RandomState(5)
        density = rs.rand(10, 12, 14).astype(np.float32)
        albedo = rs.rand(10, 12, 14, 3).astype(np.float32)
        p = str(tmp_path / "scene.npz")
        save_npz(p, density, albedo)
        scene, camera = load_npz_scene(p)
        np.testing.assert_array_equal(
            np.asarray(scene.medium.density.data), density
        )
        assert float(scene.medium.scale) == 100.0


class TestImages:
    def test_hdr_roundtrip(self, tmp_path):
        img = np.random.RandomState(6).rand(8, 12, 3).astype(np.float32) * 3
        p = str(tmp_path / "o.hdr")
        save_hdr(p, img)
        back = load_hdr(p)
        tol = img.max(axis=-1, keepdims=True) / 100.0
        assert np.all(np.abs(back - img) <= tol + 1e-3)

    def test_png_magic_and_tonemap(self, tmp_path):
        img = np.random.RandomState(7).rand(8, 8, 3).astype(np.float32)
        p = str(tmp_path / "o.png")
        save_png(p, tonemap(img))
        with open(p, "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"
        t = tonemap(np.asarray([[4.0, 0.25, -1.0]]))
        assert t[0, 0] == 1.0  # clamped
        assert t[0, 2] == 0.0  # negative clamped
        np.testing.assert_allclose(t[0, 1], 0.25 ** (1 / 2.2), rtol=1e-5)
