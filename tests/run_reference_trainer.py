"""Run /root/reference/train_static.py's training() on CPU with the CUDA
extensions shimmed to gsplat_tpu's kernels (see reference_harness.py).

Subprocess entry point for tests/test_trainer_exec_parity.py — mirrors the
reference's __main__ block (train_static.py:212-240) line for line, with a
loss-trajectory recorder wrapped around training_report. Writes
``parity_ref.json`` (per-iteration l1/total losses) into the output model
dir; the final PLY lands at the reference's usual
``point_cloud/iteration_N/point_cloud.ply``.

Usage (must be a fresh interpreter — mutates torch/sys.modules):
  python tests/run_reference_trainer.py -s <fixture> -m <out> \
      --iterations 300 --cap_max 512 [any reference train_static flags]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import reference_harness as rh

    rh.install_cuda_to_cpu()

    # static shim config rides on argv (consumed before the reference
    # parser sees the rest)
    cap = 512
    if "--shim_cap" in argv:
        i = argv.index("--shim_cap")
        cap = int(argv[i + 1])
        del argv[i:i + 2]
    k_dup = 16384
    if "--shim_k_dup" in argv:
        i = argv.index("--shim_k_dup")
        k_dup = int(argv[i + 1])
        del argv[i:i + 2]
    record_rng = None
    if "--record_rng" in argv:
        i = argv.index("--record_rng")
        record_rng = argv[i + 1]
        del argv[i:i + 2]
    rh.install_extension_shims(cap=cap, k_dup=k_dup)
    rh.install_misc_shims()

    sys.path.insert(0, rh.REFERENCE_ROOT)

    if "--swin" in argv:
        argv.remove("--swin")
        return run_swin(argv)

    import train_static as ref_train  # the reference's own module

    rh.patch_bitrotted_scene_methods()

    # --- loss-trajectory recorder around the reference's reporter ---
    losses = []
    orig_report = ref_train.training_report

    def recording_report(tb_writer, iteration, Ll1, loss, l1_loss, elapsed,
                         testing_iterations, scene, renderFunc, renderArgs,
                         args, swin_mgr):
        losses.append((int(iteration), float(Ll1.item()),
                       float(loss.item())))
        return orig_report(tb_writer, iteration, Ll1, loss, l1_loss,
                           elapsed, testing_iterations, scene, renderFunc,
                           renderArgs, args, swin_mgr)

    ref_train.training_report = recording_report

    recorder = None
    if record_rng:
        # densify/noise at iteration i run AFTER training_report(i)
        # (train_static.py:116-140), so the last recorded loss iteration
        # IS the current iteration
        recorder = rh.RngRecorder(
            get_iter=lambda: losses[-1][0] if losses else 0)
        recorder.install(ref_train)

    # --- mirror the reference __main__ (train_static.py:212-240) ---
    from argparse import ArgumentParser

    from arguments import ModelParams, OptimizationParams, PipelineParams
    from utils.general_utils import safe_state

    parser = ArgumentParser(description="Training script parameters")
    lp = ModelParams(parser)
    op = OptimizationParams(parser)
    pp = PipelineParams(parser)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true",
                        default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--frame", type=int, default=0)
    args = parser.parse_args(argv)
    args.save_iterations.append(args.iterations)

    safe_state(args.quiet)  # seeds random/np/torch to 0, stamps stdout

    import torch

    torch.autograd.set_detect_anomaly(args.detect_anomaly)
    ref_train.training(lp.extract(args), op.extract(args), pp.extract(args),
                       args)

    out = os.path.join(args.model_path, "parity_ref.json")
    with open(out, "w") as f:
        json.dump({"losses": losses, "iterations": args.iterations,
                   "cap_max": args.cap_max}, f)
    print(f"wrote {out} ({len(losses)} loss samples)")

    if recorder is not None:
        n_densify = recorder.save(record_rng)
        print(f"wrote {record_rng} ({len(recorder.cameras)} camera picks, "
              f"{len(recorder.noise)} noise draws, "
              f"{n_densify} densify events)")


def run_swin(argv):
    """Run the reference's SLIDING-WINDOW trainer (train_swin.py — the
    fork's actively-used entry) through the same shims. The rigid
    deformation runs in the reference's own torch code
    (utils/tempo_utils.py) UPSTREAM of the shimmed rasterizer, so
    gradients to rigid_v/rotvec/rotcen chain through torch autograd and
    the shim's d_means3D/d_rotations — no extra bridging needed.
    Mirrors train_swin.py:372-380 (__main__)."""
    import random

    import train_swin as ref_swin

    import reference_harness as rh

    rh.patch_bitrotted_scene_methods()

    random.seed(314159)  # train_swin.py:379
    old_argv = sys.argv
    sys.argv = ["train_swin.py"] + argv
    try:
        dataset_args, train_args, pipe_args, args = ref_swin.parse()
    finally:
        sys.argv = old_argv
    ref_swin.train(dataset_args, train_args, pipe_args, args)
    print(f"reference swin run complete -> {args.model_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
