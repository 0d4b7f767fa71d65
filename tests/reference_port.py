"""Independent reference-numerics oracle: a direct numpy transliteration of
the CUDA reference rasterizer forward pass.

Written FROM the CUDA source (NOT from gsplat_tpu) so a shared
misinterpretation between gsplat_tpu/raster/naive.py and the fast path
cannot pass silently (VERDICT r2, missing #1). Sources transliterated:

- computeColorFromSH   /root/reference/submodules/diff-gaussian-rasterization/
                       cuda_rasterizer/forward.cu:20-71 (+ SH constants,
                       auxiliary.h:14-40)
- computeCov2D         forward.cu:74-113
- computeCov3D         forward.cu:118-152
- preprocessCUDA       forward.cu:156-256 (+ in_frustum auxiliary.h:139-164,
                       ndc2Pix auxiliary.h:41-44, getRect auxiliary.h:46-56)
- duplicateWithKeys / radix sort / identifyTileRanges
                       rasterizer_impl.cu:70-138,278-318 (semantics only:
                       stable [tile | depth-bits] order)
- renderCUDA           forward.cu:261-377

Everything is float32 scalar-per-Gaussian math in glm's column-major
conventions, kept deliberately loop-structured (slow, tiny scenes only).
glm::mat3(a0..a8) fills COLUMNS: col0=(a0,a1,a2) etc.; glm m[c][r] indexes
column-then-row. We represent matrices as numpy [row, col] math matrices
and transliterate the constructor argument order accordingly.
"""

from __future__ import annotations

import numpy as np

f32 = np.float32

# auxiliary.h:14-40
SH_C0 = f32(0.28209479177387814)
SH_C1 = f32(0.4886025119029199)
SH_C2 = np.array([1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
                  -1.0925484305920792, 0.5462742152960396], dtype=f32)
SH_C3 = np.array([-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
                  0.3731763325901154, -0.4570457994644658, 1.445305721320277,
                  -0.5900435899266435], dtype=f32)


def compute_color_from_sh(deg: int, sh: np.ndarray, mean: np.ndarray,
                          campos: np.ndarray):
    """forward.cu:20-71. sh [M, 3] f32, mean [3], campos [3].
    Returns (rgb [3] clamped >= 0, clamped [3] bool)."""
    sh = sh.astype(f32)
    dir_ = (mean.astype(f32) - campos.astype(f32))
    dir_ = dir_ / f32(np.sqrt(np.sum(dir_ * dir_, dtype=f32)))
    result = SH_C0 * sh[0]
    if deg > 0:
        x, y, z = dir_[0], dir_[1], dir_[2]
        result = result - SH_C1 * y * sh[1] + SH_C1 * z * sh[2] \
            - SH_C1 * x * sh[3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + SH_C2[0] * xy * sh[4]
                      + SH_C2[1] * yz * sh[5]
                      + SH_C2[2] * (f32(2.0) * zz - xx - yy) * sh[6]
                      + SH_C2[3] * xz * sh[7]
                      + SH_C2[4] * (xx - yy) * sh[8])
            if deg > 2:
                result = (result
                          + SH_C3[0] * y * (f32(3.0) * xx - yy) * sh[9]
                          + SH_C3[1] * xy * z * sh[10]
                          + SH_C3[2] * y * (f32(4.0) * zz - xx - yy) * sh[11]
                          + SH_C3[3] * z * (f32(2.0) * zz - f32(3.0) * xx
                                            - f32(3.0) * yy) * sh[12]
                          + SH_C3[4] * x * (f32(4.0) * zz - xx - yy) * sh[13]
                          + SH_C3[5] * z * (xx - yy) * sh[14]
                          + SH_C3[6] * x * (xx - f32(3.0) * yy) * sh[15])
    result = result + f32(0.5)
    clamped = result < 0
    return np.maximum(result, f32(0.0)), clamped


def transform_point_4x3(p, matrix_flat):
    """auxiliary.h transformPoint4x3: matrix_flat is the CUDA-side flat
    buffer (the torch world_view_transform, i.e. the math matrix stored
    column-major)."""
    m = matrix_flat
    return np.array([
        m[0] * p[0] + m[4] * p[1] + m[8] * p[2] + m[12],
        m[1] * p[0] + m[5] * p[1] + m[9] * p[2] + m[13],
        m[2] * p[0] + m[6] * p[1] + m[10] * p[2] + m[14],
    ], dtype=f32)


def transform_point_4x4(p, matrix_flat):
    m = matrix_flat
    return np.array([
        m[0] * p[0] + m[4] * p[1] + m[8] * p[2] + m[12],
        m[1] * p[0] + m[5] * p[1] + m[9] * p[2] + m[13],
        m[2] * p[0] + m[6] * p[1] + m[10] * p[2] + m[14],
        m[3] * p[0] + m[7] * p[1] + m[11] * p[2] + m[15],
    ], dtype=f32)


def ndc2pix(v, size):
    """auxiliary.h:41-44. The 1.0/0.5 literals are C doubles, so the whole
    expression evaluates in f64 and rounds ONCE on the float return."""
    return f32(((np.float64(v) + 1.0) * size - 1.0) * 0.5)


def get_rect(p, max_radius, grid_x, grid_y, block_x, block_y):
    """auxiliary.h:46-56. int casts truncate toward zero like C."""
    rect_min = (min(grid_x, max(0, int((p[0] - max_radius) / block_x))),
                min(grid_y, max(0, int((p[1] - max_radius) / block_y))))
    rect_max = (min(grid_x, max(0, int((p[0] + max_radius + block_x - 1)
                                       / block_x))),
                min(grid_y, max(0, int((p[1] + max_radius + block_y - 1)
                                       / block_y))))
    return rect_min, rect_max


def compute_cov3d(scale, mod, rot):
    """forward.cu:118-152. rot is used UNNORMALIZED (the reference model
    feeds pre-normalized quaternions; the in-kernel normalization is
    commented out at forward.cu:127). Returns the 6-vector
    (xx, xy, xz, yy, yz, zz)."""
    scale = scale.astype(f32)
    r, x, y, z = (f32(rot[0]), f32(rot[1]), f32(rot[2]), f32(rot[3]))
    S = np.diag([f32(mod) * scale[0], f32(mod) * scale[1],
                 f32(mod) * scale[2]]).astype(f32)
    # glm::mat3 ctor is column-major: first 3 args are COLUMN 0.
    two = f32(2.0)
    R = np.array([
        [1 - two * (y * y + z * z), two * (x * y + r * z), two * (x * z - r * y)],
        [two * (x * y - r * z), 1 - two * (x * x + z * z), two * (y * z + r * x)],
        [two * (x * z + r * y), two * (y * z - r * x), 1 - two * (x * x + y * y)],
    ], dtype=f32)
    # glm M = S * R (both in math convention now: M_math = S_math @ R_math)
    M = (S @ R).astype(f32)
    sigma = (M.T @ M).astype(f32)
    return np.array([sigma[0, 0], sigma[0, 1], sigma[0, 2],
                     sigma[1, 1], sigma[1, 2], sigma[2, 2]], dtype=f32)


def compute_cov2d(mean, focal_x, focal_y, tan_fovx, tan_fovy, cov3d,
                  view_flat):
    """forward.cu:74-113. Returns (cov_xx, cov_xy, cov_yy) AFTER the +0.3
    low-pass."""
    t = transform_point_4x3(mean, view_flat)
    limx = f32(1.3) * f32(tan_fovx)
    limy = f32(1.3) * f32(tan_fovy)
    txtz = t[0] / t[2]
    tytz = t[1] / t[2]
    t[0] = min(limx, max(-limx, txtz)) * t[2]
    t[1] = min(limy, max(-limy, tytz)) * t[2]

    fx, fy = f32(focal_x), f32(focal_y)
    # glm ctor column-major: J_math[row][col] with col0 = first 3 args.
    J = np.array([
        [fx / t[2], f32(0.0), -(fx * t[0]) / (t[2] * t[2])],
        [f32(0.0), fy / t[2], -(fy * t[1]) / (t[2] * t[2])],
        [f32(0.0), f32(0.0), f32(0.0)],
    ], dtype=f32).T  # ctor args fill columns -> transpose the row-literal
    v = view_flat
    # W cols = (v[0],v[4],v[8]), (v[1],v[5],v[9]), (v[2],v[6],v[10])
    W = np.array([
        [v[0], v[1], v[2]],
        [v[4], v[5], v[6]],
        [v[8], v[9], v[10]],
    ], dtype=f32)
    T = (W @ J).astype(f32)
    Vrk = np.array([
        [cov3d[0], cov3d[1], cov3d[2]],
        [cov3d[1], cov3d[3], cov3d[4]],
        [cov3d[2], cov3d[4], cov3d[5]],
    ], dtype=f32)
    cov = (T.T @ Vrk.T @ T).astype(f32)
    return np.array([cov[0, 0] + f32(0.3), cov[1, 0],
                     cov[1, 1] + f32(0.3)], dtype=f32)


def preprocess(means3d, scales, rotations, opacities, shs, deg,
               view_flat, proj_flat, campos, width, height,
               tan_fovx, tan_fovy, block_x=16, block_y=16,
               scale_modifier=1.0, cov3d_precomp=None, colors_precomp=None):
    """preprocessCUDA, forward.cu:156-256. All inputs numpy f32; returns a
    dict of per-Gaussian arrays. radii == 0 <=> culled (matching the
    kernel's early-return with the zero-initialized outputs)."""
    p = means3d.shape[0]
    focal_y = height / (2.0 * tan_fovy)
    focal_x = width / (2.0 * tan_fovx)
    grid_x = (width + block_x - 1) // block_x
    grid_y = (height + block_y - 1) // block_y

    radii = np.zeros(p, np.int32)
    tiles_touched = np.zeros(p, np.uint32)
    depths = np.zeros(p, f32)
    xy = np.zeros((p, 2), f32)
    conic_opacity = np.zeros((p, 4), f32)
    rgb = np.zeros((p, 3), f32)
    clamped = np.zeros((p, 3), bool)
    rects = np.zeros((p, 4), np.int32)

    for i in range(p):
        p_orig = means3d[i].astype(f32)
        # in_frustum (auxiliary.h:139-164): near cull at view z <= 0.2
        p_view = transform_point_4x3(p_orig, view_flat)
        if p_view[2] <= f32(0.2):
            continue
        p_hom = transform_point_4x4(p_orig, proj_flat)
        p_w = f32(1.0) / (p_hom[3] + f32(0.0000001))
        p_proj = p_hom[:3] * p_w

        if cov3d_precomp is not None:
            cov3d = cov3d_precomp[i].astype(f32)
        else:
            cov3d = compute_cov3d(scales[i], scale_modifier, rotations[i])
        cov = compute_cov2d(p_orig, focal_x, focal_y, tan_fovx, tan_fovy,
                            cov3d, view_flat)
        det = cov[0] * cov[2] - cov[1] * cov[1]
        if det == f32(0.0):
            continue
        det_inv = f32(1.0) / det
        conic = np.array([cov[2] * det_inv, -cov[1] * det_inv,
                          cov[0] * det_inv], dtype=f32)
        mid = f32(0.5) * (cov[0] + cov[2])
        lambda1 = mid + f32(np.sqrt(max(f32(0.1), mid * mid - det)))
        lambda2 = mid - f32(np.sqrt(max(f32(0.1), mid * mid - det)))
        my_radius = f32(np.ceil(f32(3.0) * f32(np.sqrt(max(lambda1,
                                                           lambda2)))))
        point_image = np.array([ndc2pix(p_proj[0], width),
                                ndc2pix(p_proj[1], height)], dtype=f32)
        rect_min, rect_max = get_rect(point_image, my_radius, grid_x, grid_y,
                                      block_x, block_y)
        if (rect_max[0] - rect_min[0]) * (rect_max[1] - rect_min[1]) == 0:
            continue
        if colors_precomp is None:
            rgb[i], clamped[i] = compute_color_from_sh(
                deg, shs[i], p_orig, campos)
        else:
            rgb[i] = colors_precomp[i].astype(f32)

        depths[i] = p_view[2]
        radii[i] = np.int32(my_radius)
        xy[i] = point_image
        conic_opacity[i] = [conic[0], conic[1], conic[2],
                            f32(opacities[i])]
        tiles_touched[i] = ((rect_max[1] - rect_min[1])
                            * (rect_max[0] - rect_min[0]))
        rects[i] = [rect_min[0], rect_min[1], rect_max[0], rect_max[1]]

    return dict(radii=radii, tiles_touched=tiles_touched, depths=depths,
                xy=xy, conic_opacity=conic_opacity, rgb=rgb, clamped=clamped,
                rects=rects, grid=(grid_x, grid_y))


def build_tile_lists(pre, grid_x, grid_y):
    """duplicateWithKeys + stable radix sort + identifyTileRanges
    (rasterizer_impl.cu:70-138,278-318): per tile, the Gaussian ids that
    touch it, sorted by depth (ties keep Gaussian-id order: keys are
    emitted in id order and CUB's radix sort is stable)."""
    lists = [[] for _ in range(grid_x * grid_y)]
    order = np.argsort(pre["depths"], kind="stable")
    for i in order:
        if pre["radii"][i] <= 0:
            continue
        x0, y0, x1, y1 = pre["rects"][i]
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                lists[ty * grid_x + tx].append(int(i))
    return lists


def render(pre, lists, width, height, bg, block_x=16, block_y=16):
    """renderCUDA, forward.cu:261-377: per-pixel sequential front-to-back
    blend over the pixel's tile list. Returns (out_color [3, H, W],
    final_T [H, W], n_contrib [H, W], is_used [P])."""
    grid_x, grid_y = pre["grid"]
    out = np.zeros((3, height, width), f32)
    final_t = np.ones((height, width), f32)
    n_contrib = np.zeros((height, width), np.uint32)
    is_used = np.zeros(pre["radii"].shape[0], np.int32)
    bg = np.asarray(bg, f32)

    for tile_y in range(grid_y):
        for tile_x in range(grid_x):
            ids = lists[tile_y * grid_x + tile_x]
            for py in range(tile_y * block_y,
                            min((tile_y + 1) * block_y, height)):
                for px in range(tile_x * block_x,
                                min((tile_x + 1) * block_x, width)):
                    t = f32(1.0)
                    c = np.zeros(3, f32)
                    contributor = 0
                    last_contributor = 0
                    for gid in ids:
                        contributor += 1
                        co = pre["conic_opacity"][gid]
                        dx = pre["xy"][gid][0] - f32(px)
                        dy = pre["xy"][gid][1] - f32(py)
                        power = (f32(-0.5) * (co[0] * dx * dx
                                              + co[2] * dy * dy)
                                 - co[1] * dx * dy)
                        if power > f32(0.0):
                            continue
                        alpha = min(f32(0.99), co[3] * f32(np.exp(power)))
                        if alpha < f32(1.0 / 255.0):
                            continue
                        test_t = t * (1 - alpha)
                        if test_t < f32(0.0001):
                            break  # done=true; later its stay skipped
                        c += pre["rgb"][gid] * alpha * t
                        t = test_t
                        last_contributor = contributor
                        is_used[gid] = 1
                    out[:, py, px] = c + t * bg
                    final_t[py, px] = t
                    n_contrib[py, px] = last_contributor
    return out, final_t, n_contrib, is_used


def render_full(means3d, scales, rotations, opacities, shs, deg, view_flat,
                proj_flat, campos, width, height, tan_fovx, tan_fovy, bg,
                block_x=16, block_y=16, scale_modifier=1.0,
                cov3d_precomp=None, colors_precomp=None):
    """Full reference forward: preprocess -> binning -> blend."""
    pre = preprocess(means3d, scales, rotations, opacities, shs, deg,
                     view_flat, proj_flat, campos, width, height,
                     tan_fovx, tan_fovy, block_x, block_y, scale_modifier,
                     cov3d_precomp, colors_precomp)
    lists = build_tile_lists(pre, *pre["grid"])
    out, final_t, n_contrib, is_used = render(
        pre, lists, width, height, bg, block_x, block_y)
    return dict(pre=pre, color=out, final_t=final_t, n_contrib=n_contrib,
                is_used=is_used)
