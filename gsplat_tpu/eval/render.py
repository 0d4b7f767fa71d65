"""Offline render entry: render train/test sets of a trained model to PNGs.

The working equivalent of the reference's render.py (render_sets, :37-55 —
which is bit-rotted in the reference; SURVEY.md §7 quirks). Output layout is
identical: {model}/{split}/ours_{iteration}/renders/*.png + gt/*.png, so the
reference metrics.py protocol applies unchanged.

Usage:
  python -m gsplat_tpu.eval.render -m <model_path> [-s <source>]
         [--iteration N] [--skip_train] [--skip_test]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu import renderer
from gsplat_tpu.data.scene import Scene
from gsplat_tpu.model import gaussians
from gsplat_tpu.train.config import (ModelConfig, PipelineConfig,
                                     add_config_args, extract_config,
                                     load_combined_args)
from gsplat_tpu.train.train_static import make_settings


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
                    ).save(path)


def find_latest_iteration(model_path: str) -> int:
    root = os.path.join(model_path, "point_cloud")
    iters = [int(d.split("_")[-1]) for d in os.listdir(root)
             if d.startswith("iteration_")]
    return max(iters)


def render_set(model_path, split, iteration, cameras, state, settings, bg,
               pipe: PipelineConfig | None = None, n_ps: int = 1,
               n_ts: int = 1):
    pipe = pipe or PipelineConfig()
    renders_dir = os.path.join(model_path, split, f"ours_{iteration}",
                               "renders")
    gt_dir = os.path.join(model_path, split, f"ours_{iteration}", "gt")

    if n_ps > 1:
        # Gaussian-sharded distributed rendering (parallel/pshard.py):
        # params sharded over the mesh, depth-slab partition, ordered
        # compositing fold over ICI
        from gsplat_tpu.parallel.mesh import make_mesh
        from gsplat_tpu.parallel.pshard import make_pshard_render

        assert state.xyz.shape[0] % n_ps == 0, (
            f"--cap_max {state.xyz.shape[0]} must be divisible by "
            f"--pshard {n_ps}")
        mesh = make_mesh(n_ps, axis_name="ps")
        ps_render = make_pshard_render(mesh, settings, state.max_sh_degree)
        shard = {
            "means": state.xyz, "scales": state.get_scaling(),
            "quats": state.get_rotation(),
            "opa": state.get_opacity()[:, 0],
            "shs": state.get_features(), "alive": state.alive_mask,
        }

        def render_one(camera):
            img = ps_render(shard["means"], shard["scales"], shard["quats"],
                            shard["opa"], shard["shs"], shard["alive"],
                            camera, jnp.asarray(bg, jnp.float32))
            return jnp.clip(img, 0.0, 1.0)
    elif n_ts > 1:
        # Image-band sharded rendering (parallel/tileshard.py): params
        # replicated, each device renders a horizontal band — no
        # compositing collective, right for very large frames
        from gsplat_tpu.parallel.mesh import make_mesh
        from gsplat_tpu.parallel.tileshard import make_tileshard_render

        mesh = make_mesh(n_ts, axis_name="sp")
        ts_render = make_tileshard_render(mesh, settings,
                                          state.max_sh_degree, axis="sp")
        args = (state.xyz, state.get_scaling(), state.get_rotation(),
                state.get_opacity()[:, 0], state.get_features(),
                state.alive_mask)

        def render_one(camera):
            img = ts_render(*args, camera, jnp.asarray(bg, jnp.float32))
            return jnp.clip(img, 0.0, 1.0)
    else:
        @jax.jit
        def render_one(camera):
            out = renderer.render(
                camera, state, bg, settings,
                convert_shs_python=pipe.convert_SHs_python,
                compute_cov3d_python=pipe.compute_cov3D_python)
            return jnp.clip(out["render"], 0.0, 1.0)

    for idx, cam_obj in enumerate(cameras):
        camera, gt = cam_obj.load()
        img = np.asarray(render_one(camera))
        save_png(os.path.join(renders_dir, f"{idx:05d}.png"), img)
        save_png(os.path.join(gt_dir, f"{idx:05d}.png"), gt)
        cam_obj.unload()
    print(f"rendered {len(cameras)} {split} views -> {renders_dir}")


def render_sets(model_cfg: ModelConfig, pipe: PipelineConfig,
                iteration: int = -1, skip_train=False, skip_test=False,
                n_ps: int = 1, n_ts: int = 1):
    scene = Scene(model_cfg.source_path, model_cfg.model_path,
                  images=model_cfg.images, eval_split=model_cfg.eval,
                  resolution=model_cfg.resolution,
                  white_background=model_cfg.white_background,
                  init_type=model_cfg.init_type, num_pts=model_cfg.init_pts,
                  shuffle=False)
    if iteration == -1:
        iteration = find_latest_iteration(model_cfg.model_path)
    ply_path = scene.point_cloud_path(iteration)
    state = gaussians.load_ply(ply_path, capacity=model_cfg.cap_max,
                               max_sh_degree=model_cfg.sh_degree)
    print(f"loaded {int(state.n_alive)} gaussians from {ply_path}")

    settings = make_settings(pipe, model_cfg.cap_max)
    bg = jnp.asarray([1.0, 1.0, 1.0] if model_cfg.white_background
                     else [0.0, 0.0, 0.0])
    if not skip_train:
        render_set(model_cfg.model_path, "train", iteration,
                   scene.train_cameras, state, settings, bg, pipe, n_ps,
                   n_ts)
    if not skip_test:
        render_set(model_cfg.model_path, "test", iteration,
                   scene.test_cameras, state, settings, bg, pipe, n_ps,
                   n_ts)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Rendering script parameters")
    add_config_args(parser, ModelConfig())
    add_config_args(parser, PipelineConfig())
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--pshard", type=int, default=1,
                        help="Gaussian-sharded distributed rendering over "
                             "N devices (depth-slab partition + ordered "
                             "compositing)")
    parser.add_argument("--tileshard", type=int, default=1,
                        help="image-band sharded rendering over N devices "
                             "(each device renders H/N rows against the "
                             "full model; no compositing collective)")
    args = load_combined_args(parser) if argv is None else \
        parser.parse_args(argv)
    model_cfg = extract_config(args, ModelConfig)
    pipe = extract_config(args, PipelineConfig)
    print("Rendering " + model_cfg.model_path)
    assert getattr(args, "pshard", 1) == 1 or \
        getattr(args, "tileshard", 1) == 1, \
        "--pshard and --tileshard are mutually exclusive"
    render_sets(model_cfg, pipe, args.iteration, args.skip_train,
                args.skip_test, n_ps=getattr(args, "pshard", 1),
                n_ts=getattr(args, "tileshard", 1))


if __name__ == "__main__":
    main()
