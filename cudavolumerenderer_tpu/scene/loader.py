"""Scene loading dispatch (reference: ConfigParser::createConfig's builder
selection, ConfigParser.cpp:99-115, with extension auto-detection)."""

from __future__ import annotations

from typing import Tuple

from ..config import Config, SceneType
from ..ops.camera import Camera, make_camera
from .mhd import load_mhd_scene
from .raw_builder import load_raw_scene
from .types import Scene
from .vdb import load_npz_scene, load_vdb_scene
from .xml_builder import load_xml_scene


def load_scene(config: Config) -> Tuple[Scene, Camera]:
    if config.scene_file is None:
        raise ValueError("no scene file provided")
    stype = config.scene_type
    if stype == SceneType.AUTO:
        stype = SceneType.detect(config.scene_file)

    if stype == SceneType.MITSUBA_XML:
        scene, camera = load_xml_scene(config.scene_file)
    elif stype == SceneType.RAW:
        scene, camera = load_raw_scene(config.scene_file)
    elif stype == SceneType.MHD:
        scene, camera = load_mhd_scene(config.scene_file)
    elif stype == SceneType.VDB:
        # native reader (csrc/cvr_vdb.cpp) — no OpenVDB dependency
        scene, camera = load_vdb_scene(config.scene_file)
    elif stype == SceneType.NPZ:
        scene, camera = load_npz_scene(config.scene_file)
    else:
        raise ValueError(f"unhandled scene type {stype}")

    # Resolution override re-derives the camera fov aspect
    # (reference: ConfigParser.cpp:136-151 + Camera::setResolution).
    w, h = config.resolution
    fov_x = _fov_x_of(camera)
    camera = make_camera(
        w, h, fov_x,
        position=tuple(float(v) for v in camera.inv_view[:, 3]),
        mitsuba_comparable=config.settings.mitsuba_comparable,
    )
    return scene, camera


def _fov_x_of(camera: Camera) -> float:
    import math

    return math.degrees(2.0 * math.atan(float(camera.raster_to_view[0])))
