"""Generate tests/fixtures/quality_cudaport_dyn: a tiny SwinGS-format
DYNAMIC dataset with fully independent ground truth:

- per-frame Gaussian poses come from the REFERENCE's own executed
  ``tempo_utils.rigid_deform`` (torch-cpu, /root/reference/utils/
  tempo_utils.py:51-84), and
- pixels come from the CUDA-port oracle renderer (tests/reference_port.py,
  a numpy transliteration of forward.cu).

No gsplat_tpu renderer or deformation code touches these images, so the
sliding-window trainer's convergence against them validates the full
dynamic pipeline against the reference's semantics
(tests/test_quality_regression.py).

Run once, deliberately:  python scripts/gen_cudaport_dynamic_fixture.py
"""

import hashlib
import importlib.util
import json
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

OUT = os.path.join(ROOT, "tests", "fixtures", "quality_cudaport_dyn")
W, H = 64, 48
FOCAL = 60.0
SH_DEGREE = 1
N_CAMS = 8
N_FRAMES = 4


def make_scene(p=120, seed=33):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.8, 0.8, size=(p, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(-2.4, -1.5, size=(p, 3))).astype(np.float32)
    quats = rng.normal(size=(p, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opa = 1.0 / (1.0 + np.exp(-rng.uniform(0.0, 4.0, size=p)
                              .astype(np.float32)))
    shs = (0.2 * rng.normal(size=(p, (SH_DEGREE + 1) ** 2, 3))
           ).astype(np.float32)
    shs[:, 0, :] += rng.uniform(-0.6, 1.5, size=(p, 3)).astype(np.float32)

    # rigid motion: half the cloud orbits a center while drifting; the
    # rest is static (zero motion params)
    v = np.zeros((p, 3), np.float32)
    rotvec = np.zeros((p, 3), np.float32)
    rotcen = np.zeros((p, 3), np.float32)
    moving = rng.random(p) < 0.5
    v[moving] = np.array([0.02, -0.01, 0.0], np.float32)
    rotvec[moving] = np.array([0.0, 0.0, 0.08], np.float32)
    rotcen[moving] = np.array([0.2, 0.1, 0.0], np.float32)
    return means, scales, quats, opa, shs, v, rotvec, rotcen


def cam_json():
    cams = {}
    for i in range(N_CAMS):
        th = 2 * np.pi * i / N_CAMS
        pos = 3.0 * np.array([np.sin(th), 0.2, -np.cos(th)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        rcw = np.stack([right, up2, fwd], 0)  # w2c rotation rows
        t = -rcw @ pos
        cams[f"camera_{i:02d}.png"] = {
            # reader takes R = SO3.T (cam-to-world); SO3 = w2c rotation
            "extrinsic": {"SO3": rcw.tolist(), "T": t.tolist()},
            "intrinsic": {"width": W, "height": H,
                          "matrix": [[FOCAL, 0.0, W / 2.0],
                                     [0.0, FOCAL, H / 2.0],
                                     [0.0, 0.0, 1.0]]},
        }
    return cams


def main():
    import torch

    import reference_port as refp
    import test_reference_port as trp

    spec = importlib.util.spec_from_file_location(
        "ref_tempo_utils", "/root/reference/utils/tempo_utils.py")
    tempo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tempo)

    from PIL import Image

    means, scales, quats, opa, shs, v, rotvec, rotcen = make_scene()

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "cam.json"), "w") as f:
        json.dump(cam_json(), f, indent=1)

    # sfm-style init cloud (jittered true means) so short calibration
    # trainings start inside the content volume (--init_type sfm)
    from gsplat_tpu.data import colmap as colmap_io

    rng = np.random.default_rng(17)
    pick = rng.choice(means.shape[0], 100, replace=False)
    pts = means[pick] + 0.05 * rng.normal(size=(100, 3)).astype(np.float32)
    colmap_io.write_points3d_binary(
        os.path.join(OUT, "sfm.bin"), pts.astype(np.float64),
        rng.integers(0, 255, size=(100, 3)).astype(np.uint8))
    blank = Image.fromarray(np.zeros((H, W, 3), np.uint8))
    for t in range(N_FRAMES):
        d = os.path.join(OUT, "images_per_frame", str(t))
        os.makedirs(d, exist_ok=True)
        for i in range(N_CAMS):
            blank.save(os.path.join(d, f"camera_{i:02d}.png"))

    # cameras exactly as our reader interprets them
    from gsplat_tpu.data.scene import DynamicScene

    sc = DynamicScene(OUT, "", max_frame=N_FRAMES, num_pts=8,
                      max_in_memory=N_FRAMES + 1)

    for t in range(N_FRAMES):
        # reference-executed rigid deformation at age t
        span = torch.full((means.shape[0],), float(t))
        xyz_t, rot_t = tempo.rigid_deform(
            torch.from_numpy(means), torch.from_numpy(quats),
            torch.from_numpy(v), torch.from_numpy(rotvec),
            torch.from_numpy(rotcen), span)
        rot_t = rot_t / torch.norm(rot_t, dim=1, keepdim=True)
        xyz_t = xyz_t.numpy().astype(np.float32)
        rot_t = rot_t.numpy().astype(np.float32)

        cams = (sc.train_cam_at[t] + sc.test_cam_at[t])
        for cam_obj in cams:
            camera, _ = cam_obj.load()
            view_flat, proj_flat, campos = trp.cam_arrays(camera)
            out = refp.render_full(
                xyz_t, scales, rot_t, opa, shs, SH_DEGREE, view_flat,
                proj_flat, campos, W, H, float(camera.tan_fovx),
                float(camera.tan_fovy), np.zeros(3, np.float32),
                block_x=16, block_y=16)
            img = np.clip(np.transpose(out["color"], (1, 2, 0)), 0, 1)
            path = os.path.join(OUT, "images_per_frame", str(t),
                                os.path.basename(cam_obj.image_name))
            Image.fromarray((img * 255 + 0.5).astype(np.uint8)).save(path)
            print(f"{path}: mean {img.mean():.3f}")

    digest = hashlib.sha256(
        open(os.path.join(OUT, "images_per_frame", "0", "camera_00.png"),
             "rb").read()).hexdigest()[:16]
    with open(os.path.join(OUT, "r0.sha"), "w") as f:
        f.write(digest + "\n")
    print("sha:", digest)


if __name__ == "__main__":
    main()
