"""Sliding-window (SwinGS) Gaussian model: lifespans, rigid motion,
mature/rollover, frame-indexed deformable rendering.

TPU-native redesign of the reference SwinGaussianModel
(scene/gaussian_model.py:37-962). Structural differences, all driven by
XLA's static-shape requirement:

- The immature pool is a GaussianState (alive-prefix, capacity = cap_max)
  extended with rigid-motion parameters (rigid_v / rigid_rotvec /
  rigid_rotcen, :101-103) and lifespan arrays (_frame_birth/_frame_start/
  _frame_end, :86-88).
- The matured pool (frozen, :108-121) is a fixed-capacity RING buffer of
  ``buffer_size`` rows (the reference keeps the latest buffer_size matured
  rows by slicing, :496-501 — same retained set, different order).
- Frame-indexed access (get_basic_para_at, :597-649) becomes: rasterize the
  UNION of both pools (static C+B rows) with an activity mask
  (frame_start <= f < frame_end), with rigid deformation applied by age —
  no index_select, no dynamic concat.
- Per-birth-frame relocation (relocate_gs_immuture, :911-962) is an
  unrolled loop over the (static) window size with masked categorical
  sampling per frame.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.core.quaternion import normalize, rigid_deform
from gsplat_tpu.model import mcmc, optim
from gsplat_tpu.model.gaussians import GaussianState, inverse_sigmoid, _pad


@dataclasses.dataclass(frozen=True)
class SwinState:
    """Immature (trainable) + matured (frozen ring) pools."""

    im: GaussianState          # immature pool, capacity C
    rigid_v: jnp.ndarray       # [C, 3]
    rigid_rotvec: jnp.ndarray  # [C, 3]
    rigid_rotcen: jnp.ndarray  # [C, 3]
    frame_birth: jnp.ndarray   # [C] f32
    frame_start: jnp.ndarray   # [C] f32
    frame_end: jnp.ndarray     # [C] f32

    # matured ring buffer, capacity B
    m_xyz: jnp.ndarray
    m_features_dc: jnp.ndarray
    m_features_rest: jnp.ndarray
    m_scaling: jnp.ndarray
    m_rotation: jnp.ndarray
    m_opacity: jnp.ndarray
    m_rigid_v: jnp.ndarray
    m_rigid_rotvec: jnp.ndarray
    m_rigid_rotcen: jnp.ndarray
    m_frame_birth: jnp.ndarray
    m_frame_start: jnp.ndarray
    m_frame_end: jnp.ndarray
    m_count: jnp.ndarray       # [] int32: total ever matured

    max_lifespan: int          # static (== swin_size)
    deform: bool               # static

    @property
    def capacity(self) -> int:
        return self.im.capacity

    @property
    def buffer_size(self) -> int:
        return self.m_xyz.shape[0]

    def params(self) -> Dict[str, jnp.ndarray]:
        """Trainable leaves — the reference's nine optimizer groups
        (gaussian_model.py:304-314)."""
        p = self.im.params()
        p["rigid_v"] = self.rigid_v
        p["rigid_rotvec"] = self.rigid_rotvec
        p["rigid_rotcen"] = self.rigid_rotcen
        return p

    def replace_params(self, p: Dict[str, jnp.ndarray]) -> "SwinState":
        return dataclasses.replace(
            self, im=self.im.replace_params(p),
            rigid_v=p["rigid_v"], rigid_rotvec=p["rigid_rotvec"],
            rigid_rotcen=p["rigid_rotcen"])

    def matured_valid(self) -> jnp.ndarray:
        b = self.buffer_size
        return jnp.arange(b, dtype=jnp.int32) < jnp.minimum(self.m_count, b)


jax.tree_util.register_dataclass(
    SwinState,
    data_fields=["im", "rigid_v", "rigid_rotvec", "rigid_rotcen",
                 "frame_birth", "frame_start", "frame_end",
                 "m_xyz", "m_features_dc", "m_features_rest", "m_scaling",
                 "m_rotation", "m_opacity", "m_rigid_v", "m_rigid_rotvec",
                 "m_rigid_rotcen", "m_frame_birth", "m_frame_start",
                 "m_frame_end", "m_count"],
    meta_fields=["max_lifespan", "deform"],
)


def create_from_points(points, colors, capacity: int, max_sh_degree: int,
                       max_lifespan: int, buffer_size: int, deform: bool,
                       mean_sq_dist=None) -> SwinState:
    """Init mirroring SwinGaussianModel.create_from_pcd
    (gaussian_model.py:253-294): base params like static init, rigid_rotvec
    ~1e-10*x (non-degenerate), rotcen = own position, full first lifespan."""
    from gsplat_tpu.model.gaussians import create_from_points as base_init

    im = base_init(points, colors, capacity, max_sh_degree,
                   mean_sq_dist=mean_sq_dist)
    n = points.shape[0]
    c = capacity
    k = (max_sh_degree + 1) ** 2
    rotvec = np.zeros((n, 3), np.float32)
    rotvec[:, 0] = 1e-10
    zeros3 = lambda: jnp.zeros((c, 3), jnp.float32)  # noqa: E731

    b = buffer_size
    return SwinState(
        im=im,
        rigid_v=zeros3(),
        rigid_rotvec=jnp.asarray(_pad(rotvec, c)),
        rigid_rotcen=jnp.array(im.xyz),  # own buffer (donation safety)
        frame_birth=jnp.zeros((c,), jnp.float32),
        frame_start=jnp.zeros((c,), jnp.float32),
        frame_end=jnp.where(im.alive_mask, float(max_lifespan), 0.0),
        m_xyz=jnp.zeros((b, 3), jnp.float32),
        m_features_dc=jnp.zeros((b, 1, 3), jnp.float32),
        m_features_rest=jnp.zeros((b, k - 1, 3), jnp.float32),
        m_scaling=jnp.zeros((b, 3), jnp.float32),
        m_rotation=jnp.zeros((b, 4), jnp.float32),
        m_opacity=jnp.zeros((b, 1), jnp.float32),
        m_rigid_v=jnp.zeros((b, 3), jnp.float32),
        m_rigid_rotvec=jnp.zeros((b, 3), jnp.float32),
        m_rigid_rotcen=jnp.zeros((b, 3), jnp.float32),
        m_frame_birth=jnp.zeros((b,), jnp.float32),
        m_frame_start=jnp.zeros((b,), jnp.float32),
        m_frame_end=jnp.zeros((b,), jnp.float32),
        m_count=jnp.zeros((), jnp.int32),
        max_lifespan=max_lifespan,
        deform=deform,
    )


def union_params_at(state: SwinState, frame):
    """Deformed, activated parameters of the immature+matured union at a
    frame (the static-shape form of get_basic_para_at,
    gaussian_model.py:597-649). Returns kwargs for rasterize()."""
    im = state.im
    xyz = jnp.concatenate([im.xyz, state.m_xyz])
    rot = jnp.concatenate([im.rotation, state.m_rotation])
    v = jnp.concatenate([state.rigid_v, state.m_rigid_v])
    rotvec = jnp.concatenate([state.rigid_rotvec, state.m_rigid_rotvec])
    rotcen = jnp.concatenate([state.rigid_rotcen, state.m_rigid_rotcen])
    start = jnp.concatenate([state.frame_start, state.m_frame_start])
    end = jnp.concatenate([state.frame_end, state.m_frame_end])
    valid = jnp.concatenate([im.alive_mask, state.matured_valid()])

    active = valid & (start <= frame) & (end > frame)
    age = frame - start
    mode = "screw" if state.deform else "skip"
    xyz_d, rot_d = rigid_deform(xyz, rot, v, rotvec, rotcen, age, mode=mode)

    scaling = jnp.exp(jnp.concatenate([im.scaling, state.m_scaling]))
    opacity = jax.nn.sigmoid(
        jnp.concatenate([im.opacity, state.m_opacity])[:, 0])
    shs = jnp.concatenate([
        jnp.concatenate([im.features_dc, im.features_rest], axis=1),
        jnp.concatenate([state.m_features_dc, state.m_features_rest], axis=1),
    ])
    return dict(means3d=xyz_d, scales=scaling, quats=normalize(rot_d),
                opacities=opacity, shs=shs, alive=active)


def dump_para_as_rgb(xyz, feature, path: str) -> None:
    """Debug dump: positions colored by a normalized parameter field
    (reference dump_para_as_rgb, gaussian_model.py:347-362)."""
    from gsplat_tpu.data import ply

    xyz = np.asarray(xyz)
    feat = np.asarray(feature)
    lo, hi = feat.min(axis=0), feat.max(axis=0)
    rgb = ((feat - lo) / np.maximum(hi - lo, 1e-12) * 255).astype(np.uint8)
    ply.store_point_cloud(path, xyz.astype(np.float32), rgb.astype(np.float32))


def active_immature_mask(state: SwinState, frame):
    return (state.im.alive_mask & (state.frame_start <= frame)
            & (state.frame_end > frame))


def decay_genesis(state: SwinState) -> SwinState:
    """Stagger initial lifespans by opacity rank (gaussian_model.py:439-455):
    sorted by opacity descending, group i of max_lifespan groups gets
    frame_end -= i. (The reference requires n divisible by the group count;
    here groups are split evenly by rank without that constraint.)"""
    c = state.capacity
    alive = state.im.alive_mask
    n = state.im.n_alive
    opa = jnp.where(alive, state.im.opacity[:, 0], -jnp.inf)
    order = jnp.argsort(-opa)  # descending; padding rows last
    rank = jnp.zeros((c,), jnp.int32).at[order].set(
        jnp.arange(c, dtype=jnp.int32))
    groups = state.max_lifespan
    group = (rank * groups) // jnp.maximum(n, 1)
    new_end = state.frame_end - jnp.where(alive, group.astype(jnp.float32), 0.0)
    return dataclasses.replace(state, frame_end=new_end)


def mature_mask(state: SwinState, window_end) -> jnp.ndarray:
    """Immature rows that cannot fill the next window (evolve,
    gaussian_model.py:539)."""
    return state.im.alive_mask & (state.frame_end < window_end)


def extract_rows_host(state: SwinState, mask: np.ndarray) -> dict:
    """Host-side pull of masked immature rows for stream_dump (the CPU copy
    of _mature, gaussian_model.py:497-503)."""
    idx = np.nonzero(np.asarray(mask))[0]
    return {
        "start_frame": np.asarray(state.frame_start)[idx],
        "end_frame": np.asarray(state.frame_end)[idx],
        "birth_frame": np.asarray(state.frame_birth)[idx],
        "xyz": np.asarray(state.im.xyz)[idx],
        "f_dc": np.asarray(state.im.features_dc)[idx],
        "f_rest": np.asarray(state.im.features_rest)[idx],
        "scaling": np.asarray(state.im.scaling)[idx],
        "rotation": np.asarray(state.im.rotation)[idx],
        "opacity": np.asarray(state.im.opacity)[idx],
    }


def mature_and_rollover(state: SwinState, adam: optim.AdamState, mask):
    """Jitted core of evolve (gaussian_model.py:474-528):

    1. copy masked immature rows into the matured ring buffer;
    2. roll the same rows over in place: deform xyz/rotation to their
       end-of-life pose (if deform), lifespan [end, end + max_lifespan),
       Adam moments zeroed at rolled rows (the replace_tensors call,
       :524).
    """
    c = state.capacity
    b = state.buffer_size
    flag = mask.astype(jnp.int32)
    rank = jnp.cumsum(flag) - 1  # rank among matured rows
    pos = jnp.where(mask, (state.m_count + rank) % b, b)  # b => dropped

    def scatter(ring, rows):
        return ring.at[pos].set(rows, mode="drop")

    im = state.im
    new_m = dict(
        m_xyz=scatter(state.m_xyz, im.xyz),
        m_features_dc=scatter(state.m_features_dc, im.features_dc),
        m_features_rest=scatter(state.m_features_rest, im.features_rest),
        m_scaling=scatter(state.m_scaling, im.scaling),
        m_rotation=scatter(state.m_rotation, im.rotation),
        m_opacity=scatter(state.m_opacity, im.opacity),
        m_rigid_v=scatter(state.m_rigid_v, state.rigid_v),
        m_rigid_rotvec=scatter(state.m_rigid_rotvec, state.rigid_rotvec),
        m_rigid_rotcen=scatter(state.m_rigid_rotcen, state.rigid_rotcen),
        m_frame_birth=scatter(state.m_frame_birth, state.frame_birth),
        m_frame_start=scatter(state.m_frame_start, state.frame_start),
        m_frame_end=scatter(state.m_frame_end, state.frame_end),
        m_count=state.m_count + jnp.sum(flag),
    )

    # rollover (gaussian_model.py:508-528)
    new_xyz, new_rot = im.xyz, im.rotation
    if state.deform:
        lifespan = state.frame_end - state.frame_start + 1.0
        xyz_d, rot_d = rigid_deform(im.xyz, im.rotation, state.rigid_v,
                                    state.rigid_rotvec, state.rigid_rotcen,
                                    lifespan, mode="screw")
        new_xyz = jnp.where(mask[:, None], xyz_d, im.xyz)
        new_rot = jnp.where(mask[:, None], rot_d, im.rotation)
        adam = optim.zero_moments_at(adam, mask)

    new_birth = jnp.where(mask, state.frame_end, state.frame_birth)
    new_start = jnp.where(mask, state.frame_end, state.frame_start)
    new_end = jnp.where(mask, state.frame_end + state.max_lifespan,
                        state.frame_end)

    new_im = dataclasses.replace(im, xyz=new_xyz, rotation=new_rot)
    new_state = dataclasses.replace(
        state, im=new_im, frame_birth=new_birth, frame_start=new_start,
        frame_end=new_end, **new_m)
    return new_state, adam


def relocate_immature(state: SwinState, adam: optim.AdamState, key,
                      window_start, *, window_size: int,
                      dead_opacity: float = 0.005):
    """Per-birth-frame relocation (relocate_gs_immuture,
    gaussian_model.py:911-962): for each frame f in the window, dead rows
    born at f teleport onto opacity-sampled templates born at >= f, and
    inherit the template's frame_start. Unrolled over the static window
    size with masked sampling."""
    im = state.im
    c = state.capacity
    alive = im.alive_mask
    opa = im.get_opacity()[:, 0]

    tmpl = jnp.zeros((c,), jnp.int32)
    dead_any = jnp.zeros((c,), jnp.bool_)
    keys = jax.random.split(key, window_size)
    for k in range(window_size):
        f = window_start + jnp.asarray(float(k))
        dead_f = alive & (opa <= dead_opacity) & (state.frame_birth == f)
        src_f = alive & (opa > dead_opacity) & (state.frame_birth >= f)
        probs = jnp.where(src_f, opa, 0.0)
        any_src = jnp.any(probs > 0)
        safe_probs = jnp.where(any_src, probs,
                               jnp.where(alive, 1.0, 0.0))
        t_f = mcmc._sample_templates(keys[k], safe_probs, c)
        use = dead_f & any_src
        tmpl = jnp.where(use, t_f, tmpl)
        dead_any = dead_any | use

    counts = jax.ops.segment_sum(dead_any.astype(jnp.int32), tmpl,
                                 num_segments=c)
    n_per = counts[tmpl] + 1
    o_raw, s_raw = mcmc._relocated_raw(im, tmpl, n_per)
    new_im, template_mask = mcmc._clone_rows(im, dead_any, tmpl, o_raw, s_raw)

    # rigid params follow the template too (gaussian_model.py:944-953)
    def take(leaf, src):
        m = dead_any.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, src[tmpl], leaf)

    new_state = dataclasses.replace(
        state, im=new_im,
        rigid_v=take(state.rigid_v, state.rigid_v),
        rigid_rotvec=take(state.rigid_rotvec, state.rigid_rotvec),
        rigid_rotcen=take(state.rigid_rotcen, state.rigid_rotcen),
        # dead rows inherit the template's frame_start (:962)
        frame_start=jnp.where(dead_any, state.frame_start[tmpl],
                              state.frame_start))
    adam = optim.zero_moments_at(adam, template_mask)
    return new_state, adam


def add_new_gs(state: SwinState, adam: optim.AdamState, key,
               cap_max: int | None = None, growth: float = 1.05):
    """Genesis-only +5% growth (gaussian_model.py:854-909): clones also copy
    rigid params and lifespans from the template; templates sampled from
    opacity>0.005 rows."""
    im = state.im
    c = state.capacity
    cap = c if cap_max is None else min(cap_max, c)
    n = im.n_alive
    target = jnp.minimum(jnp.asarray(cap, jnp.int32),
                         (growth * n.astype(jnp.float32)).astype(jnp.int32))
    target = jnp.maximum(target, n)
    rows = jnp.arange(c, dtype=jnp.int32)
    new_mask = (rows >= n) & (rows < target)

    opa = im.get_opacity()[:, 0]
    src = im.alive_mask & (opa > 0.005)
    probs = jnp.where(src, opa, 0.0)
    any_src = jnp.any(probs > 0)
    probs = jnp.where(any_src, probs, jnp.where(im.alive_mask, 1.0, 0.0))
    t = mcmc._sample_templates(key, probs, c)
    counts = jax.ops.segment_sum(new_mask.astype(jnp.int32), t,
                                 num_segments=c)
    o_raw, s_raw = mcmc._relocated_raw(im, t, counts[t] + 1)
    new_im, template_mask = mcmc._clone_rows(im, new_mask, t, o_raw, s_raw)
    new_im = dataclasses.replace(new_im, n_alive=target)

    def take(leaf):
        m = new_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, leaf[t], leaf)

    new_state = dataclasses.replace(
        state, im=new_im,
        rigid_v=take(state.rigid_v),
        rigid_rotvec=take(state.rigid_rotvec),
        rigid_rotcen=take(state.rigid_rotcen),
        frame_birth=jnp.where(new_mask, state.frame_birth[t],
                              state.frame_birth),
        frame_start=jnp.where(new_mask, state.frame_start[t],
                              state.frame_start),
        frame_end=jnp.where(new_mask, state.frame_end[t], state.frame_end))
    adam = optim.zero_moments_at(adam, template_mask | new_mask)
    return new_state, adam


def inject_noise_active(state: SwinState, key, noise_lr, xyz_lr, frame):
    """Noise only on the ACTIVE immature subset (train_swin.py:244-261)."""
    from gsplat_tpu.core.covariance import covariance_6

    im = state.im
    active = active_immature_mask(state, frame)
    opa = im.get_opacity()
    gate = jax.nn.sigmoid(100.0 * ((1.0 - opa) - 0.995))
    noise = jax.random.normal(key, im.xyz.shape) * gate * noise_lr * xyz_lr
    xx, xy, xz, yy, yz, zz = (covariance_6(
        im.get_scaling(), im.get_rotation())[..., i] for i in range(6))
    nx, ny, nz = noise[:, 0], noise[:, 1], noise[:, 2]
    noise = jnp.stack([xx * nx + xy * ny + xz * nz,
                       xy * nx + yy * ny + yz * nz,
                       xz * nx + yz * ny + zz * nz], axis=-1)
    noise = jnp.where(active[:, None], noise, 0.0)
    return dataclasses.replace(state,
                               im=dataclasses.replace(im, xyz=im.xyz + noise))
