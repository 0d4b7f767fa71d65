"""Viewer wire-protocol test: a fake SIBR client speaks the reference's
socket format (gaussian_renderer/network_gui.py:26-85 — u32-length-prefixed
JSON request carrying row-major sign-flipped matrices; raw RGB bytes + a
length-prefixed verify string back) against our server end."""

import json
import math
import socket
import threading

import numpy as np

from gsplat_tpu.core.camera import make_camera
from gsplat_tpu.viewer import network_gui


def _client_message(width, height, view_t, full_t, fovx, fovy):
    """Build the JSON body exactly as the SIBR remote viewer does: matrices
    are sent row-major in the reference's transposed (row-vector) layout
    with the Y/Z column signs flipped."""
    view = view_t.T.copy()
    view[:, 1] *= -1
    view[:, 2] *= -1
    full = full_t.T.copy()
    full[:, 1] *= -1
    return {
        "resolution_x": width, "resolution_y": height,
        "train": True, "fov_y": fovy, "fov_x": fovx,
        "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False,
        "keep_alive": True, "scaling_modifier": 1.0,
        "view_matrix": view.reshape(-1).tolist(),
        "view_projection_matrix": full.reshape(-1).tolist(),
    }


def test_network_gui_roundtrip():
    port = 16311
    network_gui.init("127.0.0.1", port)
    try:
        w, h = 8, 6
        fovx, fovy = 0.9, 0.7
        cam_ref = make_camera(np.eye(3), np.array([0.1, -0.2, 3.0]),
                              fovx, fovy, w, h)
        msg = _client_message(w, h, np.asarray(cam_ref.view),
                              np.asarray(cam_ref.full_proj), fovx, fovy)

        results = {}

        def client():
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            body = json.dumps(msg).encode("utf-8")
            s.sendall(len(body).to_bytes(4, "little"))
            s.sendall(body)
            img = b""
            while len(img) < w * h * 3:
                img += s.recv(w * h * 3 - len(img))
            n = int.from_bytes(s.recv(4), "little")
            verify = s.recv(n).decode("ascii")
            results["img"] = img
            results["verify"] = verify
            s.close()

        t = threading.Thread(target=client)
        t.start()
        import time

        for _ in range(200):
            if network_gui.try_connect():
                break
            time.sleep(0.02)
        assert network_gui.connected()

        camera, flags = network_gui.receive()
        assert camera is not None
        assert camera.width == w and camera.height == h
        # the server must reconstruct our column-vector matrices exactly
        np.testing.assert_allclose(np.asarray(camera.view),
                                   np.asarray(cam_ref.view), atol=1e-6)
        np.testing.assert_allclose(
            float(camera.tan_fovx), math.tan(fovx / 2), rtol=1e-6)
        assert flags["train"] and flags["keep_alive"]
        assert flags["scaling_modifier"] == 1.0

        img01 = np.linspace(0, 1, w * h * 3, dtype=np.float32
                            ).reshape(h, w, 3)
        network_gui.send(network_gui.image_to_bytes(img01), "trainer")
        t.join(timeout=10)

        assert results["verify"] == "trainer"
        got = np.frombuffer(results["img"], np.uint8).reshape(h, w, 3)
        expect = (np.clip(img01, 0, 1) * 255 + 0.5).astype(np.uint8)
        np.testing.assert_array_equal(got, expect)
    finally:
        network_gui.disconnect()
        network_gui._listener.close()
        network_gui._listener = None
