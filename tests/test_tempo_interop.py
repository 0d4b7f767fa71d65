"""Rigid-motion math parity against the REFERENCE's own implementation.

Executes the reference's ``tempo_utils`` (pure torch-cpu code:
rotvec2quat/rotvec2mat/quat_mul/rigid_deform, utils/tempo_utils.py:4-84)
on the same random batches and asserts gsplat_tpu.core.quaternion matches
— an independent check of the deformation semantics every SwinGS render
depends on. Skipped without the reference checkout."""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

REF_TEMPO = "/root/reference/utils/tempo_utils.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_TEMPO), reason="reference checkout not present")


def _ref():
    spec = importlib.util.spec_from_file_location("ref_tempo_utils",
                                                  REF_TEMPO)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_rotvec_quat_mat_match_reference():
    import torch

    ref = _ref()
    from gsplat_tpu.core import quaternion as q

    rng = np.random.default_rng(3)
    rv = rng.normal(scale=1.2, size=(64, 3)).astype(np.float32)
    # include near-zero rotations (the theta -> 0 limit)
    rv[:8] *= 1e-6

    ref_q = ref.rotvec2quat(torch.from_numpy(rv)).numpy()
    got_q = np.asarray(q.rotvec_to_quat(jnp.asarray(rv)))
    np.testing.assert_allclose(got_q, ref_q, atol=2e-6)

    ref_m = ref.rotvec2mat(torch.from_numpy(rv)).numpy()
    got_m = np.asarray(q.rotvec_to_rotmat(jnp.asarray(rv)))
    np.testing.assert_allclose(got_m, ref_m, atol=3e-6)

    q1 = rng.normal(size=(64, 4)).astype(np.float32)
    q2 = rng.normal(size=(64, 4)).astype(np.float32)
    ref_p = ref.quat_mul(torch.from_numpy(q1), torch.from_numpy(q2)).numpy()
    got_p = np.asarray(q.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
    np.testing.assert_allclose(got_p, ref_p, atol=2e-6)


@pytest.mark.parametrize("mode,kw", [("screw", {}),
                                     ("linear", {"linear": True}),
                                     ("skip", {"skip": True})])
def test_rigid_deform_matches_reference(mode, kw):
    import torch

    ref = _ref()
    from gsplat_tpu.core.quaternion import rigid_deform

    rng = np.random.default_rng(9)
    n = 48
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    v = (0.3 * rng.normal(size=(n, 3))).astype(np.float32)
    rotvec = (0.8 * rng.normal(size=(n, 3))).astype(np.float32)
    rotcen = rng.normal(size=(n, 3)).astype(np.float32)
    t = rng.uniform(0.0, 5.0, size=n).astype(np.float32)
    t[:4] = 0.0  # zero-age identity

    tt = {k: torch.from_numpy(a) for k, a in
          dict(xyz=xyz, rot=rot, v=v, rotvec=rotvec, rotcen=rotcen,
               t=t).items()}
    ref_xyz, ref_rot = ref.rigid_deform(tt["xyz"], tt["rot"], tt["v"],
                                        tt["rotvec"], tt["rotcen"], tt["t"],
                                        **kw)
    got_xyz, got_rot = rigid_deform(
        jnp.asarray(xyz), jnp.asarray(rot), jnp.asarray(v),
        jnp.asarray(rotvec), jnp.asarray(rotcen), jnp.asarray(t), mode=mode)
    np.testing.assert_allclose(np.asarray(got_xyz), ref_xyz.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_rot), ref_rot.numpy(),
                               atol=1e-5)
