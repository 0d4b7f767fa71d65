"""Render a streamed SwinGS scene (streamable.dat) frame by frame.

The working form of the reference's per-frame offline rendering
(render.py:24-55, which is bit-rotted — SURVEY.md §7 quirks): loads the
append-only matured-Gaussian stream produced by train_swin, and for each
requested frame renders every camera with the lifespan-active subset, rigid
motion applied at the Gaussian's age.

Usage:
  python -m gsplat_tpu.eval.render_stream -m <model_path> -s <dataset>
         [--frames 0 10] [--skip_train]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core.quaternion import normalize
from gsplat_tpu.data.scene import DynamicScene
from gsplat_tpu.eval.render import save_png
from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize
from gsplat_tpu.utils.stream import stream_load


def load_stream_state(model_path: str):
    """Load streamable.dat columns as device arrays."""
    data = stream_load(os.path.join(model_path, "format.json"),
                       os.path.join(model_path, "streamable.dat"))
    n = data["xyz"].shape[0]
    print(f"loaded {n} streamed gaussians (sh degree {data['sh_degree']})")
    return data


def render_stream_frame(data, camera, frame: float, bg, settings,
                        deform: bool = False, rigid=None):
    """Render one frame from stream columns. The stream format carries no
    rigid-motion fields (stream_utils.py:16-32 drops them), so deformation
    playback requires the optional ``rigid`` dict of (v, rotvec, rotcen)."""
    start = jnp.asarray(data["start_frame"], jnp.float32)
    end = jnp.asarray(data["end_frame"], jnp.float32)
    active = (start <= frame) & (end > frame)
    xyz = jnp.asarray(data["xyz"])
    rot = jnp.asarray(data["rotation"])
    if deform and rigid is not None:
        from gsplat_tpu.core.quaternion import rigid_deform

        xyz, rot = rigid_deform(xyz, rot, rigid["v"], rigid["rotvec"],
                                rigid["rotcen"], frame - start, mode="screw")
    shs = jnp.concatenate([jnp.asarray(data["f_dc"]),
                           jnp.asarray(data["f_rest"])], axis=1)
    out = rasterize(
        xyz, jnp.exp(jnp.asarray(data["scaling"])), normalize(rot),
        jax.nn.sigmoid(jnp.asarray(data["opacity"]))[:, 0], shs, camera,
        int(data["sh_degree"]), bg, settings, alive=active)
    img = out.image
    if settings.inference:  # CHW bf16 fast path -> [H, W, 3] f32
        img = img.astype(jnp.float32).transpose(1, 2, 0)
    return jnp.clip(img, 0.0, 1.0)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", "-m", required=True)
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--frames", nargs=2, type=int, default=None)
    parser.add_argument("--max_frame", type=int, default=100)
    parser.add_argument("--min_frame", type=int, default=0)
    parser.add_argument("--resolution", "-r", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--white_background", "-w", action="store_true")
    parser.add_argument("--dup_budget", type=int, default=0)
    args = parser.parse_args(argv)

    data = load_stream_state(args.model_path)
    n = data["xyz"].shape[0]
    scene = DynamicScene(args.source_path, "", resolution=args.resolution,
                         max_frame=args.max_frame, min_frame=args.min_frame,
                         shuffle=False)
    bg = jnp.asarray([1.0, 1.0, 1.0] if args.white_background
                     else [0.0, 0.0, 0.0])
    k_dup = args.dup_budget or max(8 * n, 1 << 16)
    # playback is pure inference: bf16 fast path, 128x32 tiles
    settings = RasterizeSettings(
        k_dup=-(-k_dup // 128) * 128, inference=True,
        tile_x=128, tile_y=32,
        interpret=jax.default_backend() == "cpu")
    render_jit = jax.jit(lambda cam, f: render_stream_frame(
        data, cam, f, bg, settings))

    lo, hi = args.frames if args.frames else (0, scene.num_frames)
    splits = [("test", scene.get_test_cams_at)]
    if not args.skip_train:
        splits.append(("train", scene.get_train_cams_at))
    for split, getter in splits:
        out_dir = os.path.join(args.model_path, split, "stream", "renders")
        count = 0
        for f in range(lo, hi):
            for cam_obj in getter([f]):
                camera, gt = cam_obj.load()
                img = np.asarray(render_jit(camera, jnp.asarray(float(f))))
                name = cam_obj.image_name.replace("/", "_")
                save_png(os.path.join(out_dir, f"{name}.png"), img)
                gt_dir = os.path.join(args.model_path, split, "stream", "gt")
                save_png(os.path.join(gt_dir, f"{name}.png"), gt)
                cam_obj.unload()
                count += 1
        print(f"rendered {count} {split} views -> {out_dir}")


if __name__ == "__main__":
    main()
