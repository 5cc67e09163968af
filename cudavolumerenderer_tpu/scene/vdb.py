"""VDB-derived scenes: npz dense-grid interchange + gated pyopenvdb path.

The reference links OpenVDB through an isolation library and flattens
sparse grids to dense linear arrays at load time (reference:
vdb_adapter/VDBAdapter.cpp:56-114, implementation/src/VDBSceneBuilder.h:40-80).
OpenVDB is not available in this environment, so the TPU build splits the
pipeline the same way the reference splits MHD conversion into an offline
Docker step (reference: scripts/convert-mhd/*):

  - `convert_vdb_to_npz` (requires pyopenvdb, gated): offline
    sparse→dense flattening into a .vdb.npz archive holding the dense
    density/albedo arrays plus per-brick occupancy/max-density metadata;
  - `load_npz_scene`: the runtime loader consumed here — dense grids with
    the VDB builder's conventions (natural resolution from the active
    bounding box, AABB forced to [-0.5,0.5]^3, scale 100,
    max_density = max(density)).

The brick metadata (max density per 8^3 brick) is stored for the future
sparse-majorant tracking path even though the base renderer only needs the
dense arrays.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..ops.camera import Camera, make_camera
from .types import Scene, make_medium, make_scene

BRICK = 8


def brick_max_density(density_zyx: np.ndarray, brick: int = BRICK) -> np.ndarray:
    """Per-brick majorants: (Z/b, Y/b, X/b) max over each b^3 brick."""
    nz, ny, nx = density_zyx.shape
    pz = (-nz) % brick
    py = (-ny) % brick
    px = (-nx) % brick
    padded = np.pad(density_zyx, ((0, pz), (0, py), (0, px)))
    bz, by, bx = (
        padded.shape[0] // brick,
        padded.shape[1] // brick,
        padded.shape[2] // brick,
    )
    return (
        padded.reshape(bz, brick, by, brick, bx, brick)
        .max(axis=(1, 3, 5))
        .astype(np.float32)
    )


def save_npz(path: str, density_zyx: np.ndarray, albedo_zyx: np.ndarray) -> None:
    density_zyx = np.asarray(density_zyx, np.float32)
    albedo_zyx = np.asarray(albedo_zyx, np.float32)
    np.savez_compressed(
        path,
        density=density_zyx,
        albedo=albedo_zyx,
        brick_max_density=brick_max_density(density_zyx),
        brick_size=np.int32(BRICK),
    )


def load_npz_scene(path: str) -> Tuple[Scene, Camera]:
    with np.load(path) as archive:
        density = archive["density"].astype(np.float32)
        albedo = archive["albedo"].astype(np.float32)
    medium = make_medium(
        density,
        albedo,
        box_min=(-0.5, -0.5, -0.5),
        box_max=(0.5, 0.5, 0.5),
        scale=100.0,
        max_density=float(density.max()),
    )
    return make_scene(medium), make_camera()


def convert_vdb_to_npz(vdb_path: str, npz_path: str) -> None:
    """Offline converter; requires pyopenvdb (run in the reference's
    conversion container).  Mirrors VDBAdapter: read grids named
    'density' (float) and 'albedo' (vec3), densify the active bounding
    box with inactive voxels = 0."""
    try:
        import pyopenvdb as vdb  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - env without OpenVDB
        raise RuntimeError(
            "pyopenvdb is not installed; run the conversion in the "
            "reference's Docker environment (scripts/convert-mhd) or use "
            "an .npz/.vol scene directly"
        ) from e

    grids = {g.name: g for g in vdb.readAllGridMetadata(vdb_path)}
    if "density" not in grids or "albedo" not in grids:
        raise ValueError(
            f"{vdb_path!r}: expected grids named 'density' and 'albedo'"
        )
    density_grid = vdb.read(vdb_path, "density")
    albedo_grid = vdb.read(vdb_path, "albedo")
    bbox_min, bbox_max = density_grid.evalActiveVoxelBoundingBox()
    shape = tuple(bbox_max[i] - bbox_min[i] + 1 for i in range(3))
    density = np.zeros(shape[::-1], np.float32)
    density_grid.copyToArray(density, ijk=bbox_min)
    albedo = np.zeros(shape[::-1] + (3,), np.float32)
    albedo_grid.copyToArray(albedo, ijk=bbox_min)
    save_npz(npz_path, density, albedo)
