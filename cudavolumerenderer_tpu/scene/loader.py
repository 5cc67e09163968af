"""Scene loading dispatch (reference: ConfigParser::createConfig's builder
selection, ConfigParser.cpp:99-115, with extension auto-detection)."""

from __future__ import annotations

from typing import Tuple

from ..config import Config, SceneType
from ..ops.camera import Camera
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

    w, h = config.resolution
    camera = override_resolution(camera, w, h)
    if not config.settings.mitsuba_comparable:
        # non-MITSUBA_COMPARABLE handedness: the reference negates the
        # camera's right basis vector (Camera.h:30-34).  Loaders build
        # comparable-convention cameras; flip the right COLUMN of the
        # pose here so the convention applies to posed cameras too
        # (the round-4 position-only rebuild used to lose orientation;
        # the round-5 pose-preserving override used to lose this flip).
        import jax.numpy as jnp
        import numpy as np

        inv_view = np.asarray(camera.inv_view).copy()
        inv_view[:, 0] = -inv_view[:, 0]
        camera = camera._replace(inv_view=jnp.asarray(inv_view))
    return scene, camera


def override_resolution(camera: Camera, w: int, h: int) -> Camera:
    """Re-derive ONLY the fov aspect for a resolution override
    (reference: ConfigParser.cpp:136-151 + Camera::setResolution).

    The pose (inv_view: orientation + position) is preserved, so a
    loader that returns a posed look-at camera keeps its orientation."""
    import math

    import jax.numpy as jnp
    import numpy as np

    fov_x = math.degrees(
        2.0 * math.atan(float(camera.raster_to_view[0]))
    )
    fov_y = (float(h) / float(w)) * fov_x
    r2v = np.array(
        [
            math.tan(fov_x * math.pi / 360.0),
            math.tan(fov_y * math.pi / 360.0),
        ],
        np.float32,
    )
    return camera._replace(raster_to_view=jnp.asarray(r2v))
