"""SIBR live-viewer socket protocol.

Wire-compatible with the reference network_gui
(gaussian_renderer/network_gui.py:26-85): a non-blocking TCP listener; each
message is a little-endian u32 length + JSON body carrying resolution, FoV,
near/far, train/keep-alive flags, scaling modifier, and row-major view /
view-projection matrices (with the SIBR Y/Z sign flips applied on receive);
each reply is the raw RGB byte image followed by a length-prefixed verify
string. The reference transposes matrices for its row-vector convention; we
flip signs identically and transpose into our column-vector CameraParams.
"""

from __future__ import annotations

import json
import socket
from typing import Optional, Tuple

import numpy as np

from gsplat_tpu.core.camera import CameraParams

_listener: Optional[socket.socket] = None
_conn: Optional[socket.socket] = None


def init(host: str = "127.0.0.1", port: int = 6009) -> None:
    global _listener
    _listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    _listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    _listener.bind((host, port))
    _listener.listen()
    _listener.settimeout(0)


def try_connect() -> bool:
    global _conn
    if _listener is None:
        return False
    try:
        _conn, addr = _listener.accept()
        print(f"\nConnected by {addr}")
        _conn.settimeout(None)
        return True
    except (BlockingIOError, socket.timeout, OSError):
        return _conn is not None


def connected() -> bool:
    return _conn is not None


def disconnect() -> None:
    global _conn
    if _conn is not None:
        _conn.close()
        _conn = None


def _read_json() -> dict:
    n = int.from_bytes(_recv_exact(4), "little")
    return json.loads(_recv_exact(n).decode("utf-8"))


def _recv_exact(n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = _conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("viewer disconnected")
        buf += chunk
    return buf


def send(image_bytes: Optional[bytes], verify: str) -> None:
    if image_bytes is not None:
        _conn.sendall(image_bytes)
    _conn.sendall(len(verify).to_bytes(4, "little"))
    _conn.sendall(verify.encode("ascii"))


def receive() -> Tuple[Optional[CameraParams], Optional[dict]]:
    """Read one viewer request. Returns (camera, flags) or (None, None) when
    the viewer sends a zero-resolution keep-alive."""
    msg = _read_json()
    width, height = msg["resolution_x"], msg["resolution_y"]
    if width == 0 or height == 0:
        return None, None

    view = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
    view[:, 1] *= -1
    view[:, 2] *= -1
    full = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
    full[:, 1] *= -1
    # reference stores transposed (row-vector) matrices; ours are standard
    view_t = view.T
    full_t = full.T
    cam_pos = np.linalg.inv(view_t)[:3, 3]

    import jax.numpy as jnp
    import math

    camera = CameraParams(
        view=jnp.asarray(view_t),
        full_proj=jnp.asarray(full_t),
        cam_pos=jnp.asarray(cam_pos),
        tan_fovx=jnp.asarray(math.tan(msg["fov_x"] / 2), jnp.float32),
        tan_fovy=jnp.asarray(math.tan(msg["fov_y"] / 2), jnp.float32),
        width=int(width), height=int(height))
    flags = {
        "train": bool(msg["train"]),
        "shs_python": bool(msg["shs_python"]),
        "rot_scale_python": bool(msg["rot_scale_python"]),
        "keep_alive": bool(msg["keep_alive"]),
        "scaling_modifier": msg["scaling_modifier"],
        "z_near": msg["z_near"], "z_far": msg["z_far"],
    }
    return camera, flags


def image_to_bytes(img01) -> bytes:
    """[H, W, 3] float in [0,1] -> the byte layout the SIBR viewer expects
    (uint8 RGB, C-order)."""
    arr = np.asarray(img01)
    return (np.clip(arr, 0, 1) * 255 + 0.5).astype(np.uint8).tobytes()
