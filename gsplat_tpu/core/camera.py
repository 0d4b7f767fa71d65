"""Camera math and the device-side camera pytree.

Parity targets (reference file:line):
- getWorld2View2 (utils/graphics_utils.py:38-49)
- getProjectionMatrix / getProjectionMatrixShift (utils/graphics_utils.py:51-105)
  — z_sign=+1, depth mapped to [0, zfar/(zfar-znear)] range, principal-point
  shift support for Google Immersive cameras.
- fov2focal / focal2fov (utils/graphics_utils.py:107-111)
- Camera transform stack (scene/cameras.py:57-72): znear=0.01, zfar=100,
  full_proj = proj @ world2view, camera_center = inv(world2view) translation.

Convention note: the torch reference stores matrices *transposed* and
multiplies row-vectors (cameras.py:63,71). We store standard column-vector
matrices (x' = M @ [x, 1]); the composed math is identical.

Host-side constructors are numpy; `CameraParams` is a JAX pytree usable
inside jit (width/height are static metadata so image shapes stay static).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

ZNEAR = 0.01
ZFAR = 100.0


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate=np.array([0.0, 0.0, 0.0]), scale: float = 1.0) -> np.ndarray:
    """World->camera 4x4 (column-vector convention).

    R is the COLMAP-convention camera rotation as stored by the dataset
    readers (cam-to-world rotation, i.e. the reference transposes it into the
    view matrix at utils/graphics_utils.py:40), t the world->cam translation.
    ``translate``/``scale`` recenter/rescale the scene (NeRF++-style norm).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    c2w[:3, 3] = (c2w[:3, 3] + translate) * scale
    return np.linalg.inv(c2w).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float,
                      cx_offset: float = 0.0, cy_offset: float = 0.0,
                      focal_x: float | None = None, focal_y: float | None = None,
                      width: float | None = None, height: float | None = None) -> np.ndarray:
    """OpenGL-style (z_sign=+1) perspective projection, column-vector 4x4.

    With cx/cy given (principal point in pixels), applies the frame-window
    shift of getProjectionMatrixShift (utils/graphics_utils.py:51-83).
    """
    tan_y = math.tan(fovy / 2)
    tan_x = math.tan(fovx / 2)
    top, bottom = tan_y * znear, -tan_y * znear
    right, left = tan_x * znear, -tan_x * znear
    if focal_x is not None:
        off_x = (cx_offset - width / 2) / focal_x * znear
        off_y = (cy_offset - height / 2) / focal_y * znear
        top += off_y
        bottom += off_y
        left += off_x
        right += off_x
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2 * znear / (right - left)
    P[1, 1] = 2 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@dataclasses.dataclass(frozen=True)
class CameraParams:
    """Device-side camera: everything the rasterizer needs, jit-friendly.

    width/height are static pytree metadata (image shapes must be static
    under XLA); the matrices/scalars are traced leaves so cameras can be
    batched/stacked for data parallelism.
    """

    view: jnp.ndarray       # (4,4) world->camera
    full_proj: jnp.ndarray  # (4,4) proj @ view
    cam_pos: jnp.ndarray    # (3,)
    tan_fovx: jnp.ndarray   # ()
    tan_fovy: jnp.ndarray   # ()
    width: int
    height: int

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tan_fovy)


jax.tree_util.register_dataclass(
    CameraParams,
    data_fields=["view", "full_proj", "cam_pos", "tan_fovx", "tan_fovy"],
    meta_fields=["width", "height"],
)


def make_camera(R: np.ndarray, t: np.ndarray, fovx: float, fovy: float,
                width: int, height: int,
                znear: float = ZNEAR, zfar: float = ZFAR,
                translate=np.array([0.0, 0.0, 0.0]), scale: float = 1.0,
                principal_point: tuple[float, float] | None = None,
                focal_px: tuple[float, float] | None = None) -> CameraParams:
    """Build a CameraParams from dataset extrinsics/intrinsics (host-side)."""
    view = world_to_view(R, t, translate, scale)
    if principal_point is not None:
        fx, fy = focal_px if focal_px is not None else (
            fov2focal(fovx, width), fov2focal(fovy, height))
        proj = projection_matrix(znear, zfar, fovx, fovy,
                                 cx_offset=principal_point[0],
                                 cy_offset=principal_point[1],
                                 focal_x=fx, focal_y=fy,
                                 width=width, height=height)
    else:
        proj = projection_matrix(znear, zfar, fovx, fovy)
    full_proj = proj @ view
    cam_pos = np.linalg.inv(view)[:3, 3]
    return CameraParams(
        view=jnp.asarray(view),
        full_proj=jnp.asarray(full_proj),
        cam_pos=jnp.asarray(cam_pos.astype(np.float32)),
        tan_fovx=jnp.asarray(math.tan(fovx / 2), dtype=jnp.float32),
        tan_fovy=jnp.asarray(math.tan(fovy / 2), dtype=jnp.float32),
        width=int(width),
        height=int(height),
    )


def ndc_to_pix(v, size):
    """NDC [-1,1] -> pixel coords (auxiliary.h:41-44)."""
    return ((v + 1.0) * size - 1.0) * 0.5
