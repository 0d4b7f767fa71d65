"""Standalone live-viewer server: load a trained model, serve SIBR requests.

A working version of the capability the reference wires into its training
loop but leaves disabled (train_static.py:238). Renders on demand at the
viewer-requested resolution.

Usage:
  python -m gsplat_tpu.viewer.serve -m <model_path> [--iteration N]
         [--ip 127.0.0.1] [--port 6009] [--cap_max N] [--sh_degree D]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp

from gsplat_tpu.model import gaussians
from gsplat_tpu.raster.rasterize import RasterizeSettings, rasterize
from gsplat_tpu.viewer import network_gui


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", "-m", required=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--ip", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--cap_max", type=int, default=1_000_000)
    parser.add_argument("--sh_degree", type=int, default=3)
    parser.add_argument("--dup_budget", type=int, default=0)
    args = parser.parse_args(argv)

    from gsplat_tpu.eval.render import find_latest_iteration

    iteration = (args.iteration if args.iteration > 0
                 else find_latest_iteration(args.model_path))
    ply = f"{args.model_path}/point_cloud/iteration_{iteration}/point_cloud.ply"
    state = gaussians.load_ply(ply, capacity=args.cap_max,
                               max_sh_degree=args.sh_degree)
    print(f"serving {int(state.n_alive)} gaussians from {ply}")

    k_dup = args.dup_budget or 8 * args.cap_max
    interpret = jax.default_backend() == "cpu"

    @functools.lru_cache(maxsize=8)
    def render_fn(width, height):
        # Inference path: bf16 feature stream, 128x32 tiles (fewer tile
        # duplicates), background composited in-kernel — the interactive
        # fast path; output converted back to [H, W, 3] f32 for the wire.
        settings = RasterizeSettings(
            k_dup=k_dup, interpret=interpret, inference=True,
            tile_x=128, tile_y=32)

        @jax.jit
        def f(camera, scaling_modifier):
            out = rasterize(state.xyz, state.get_scaling(),
                            state.get_rotation(), state.get_opacity()[:, 0],
                            state.get_features(), camera,
                            state.max_sh_degree, jnp.zeros(3), settings,
                            scale_modifier=scaling_modifier,
                            alive=state.alive_mask)
            img = out.image.astype(jnp.float32).transpose(1, 2, 0)
            return jnp.clip(img, 0.0, 1.0)

        return f

    network_gui.init(args.ip, args.port)
    print(f"listening on {args.ip}:{args.port}")
    while True:
        if not network_gui.try_connect():
            time.sleep(0.05)
            continue
        try:
            camera, flags = network_gui.receive()
            if camera is None:
                network_gui.send(None, args.model_path)
                continue
            img = render_fn(camera.width, camera.height)(
                camera, flags["scaling_modifier"])
            network_gui.send(network_gui.image_to_bytes(img), args.model_path)
            if not flags["keep_alive"]:
                network_gui.disconnect()
        except (ConnectionError, OSError):
            network_gui.disconnect()


if __name__ == "__main__":
    main()
