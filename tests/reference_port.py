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


# ---------------------------------------------------------------------------
# Backward pass transliteration (backward.cu) — independent gradient oracle.
#
# - renderCUDA (backward)     backward.cu:399-557 (back-to-front re-raster
#                             from final_T / n_contrib; 0.99-clamp
#                             pass-through at :477-481 via dalpha/dG = opa)
# - computeCov2DCUDA          backward.cu:144-274 (x/y_grad_mul clamp masks
#                             at :175-176, denom2inv guard, dL_dmeans
#                             OVERWRITTEN here then += in preprocess)
# - computeCov3D (backward)   backward.cu:278-341 (quaternion used
#                             unnormalized; dnormvdv commented out at :340)
# - computeColorFromSH (bw)   backward.cu:20-139 (PyTorch clamp rule:
#                             clamped channels get zero gradient, :31-34;
#                             dnormvdv for the view direction, auxiliary.h:
#                             107-116)
# - preprocessCUDA (backward) backward.cu:347-396 (screen-space mean2D ->
#                             mean3D through the full projection, with the
#                             +0.0000001 homogeneous epsilon)
# ---------------------------------------------------------------------------


def render_backward(pre, lists, width, height, bg, dl_dpixels, final_t,
                    n_contrib, block_x=16, block_y=16):
    """renderCUDA<C> backward (backward.cu:399-557). ``dl_dpixels`` is
    [3, H, W] f32. Returns dict with dl_dmean2d [P, 3] (NDC-scale x/y, the
    ddelx_dx = 0.5*W convention at :460-461), dl_dconic [P, 4]
    (.x/.y/.w used), dl_dopacity [P], dl_dcolors [P, 3]."""
    grid_x, grid_y = pre["grid"]
    p = pre["radii"].shape[0]
    bg = np.asarray(bg, f32)
    dl_dmean2d = np.zeros((p, 3), f32)
    dl_dconic = np.zeros((p, 4), f32)
    dl_dopacity = np.zeros(p, f32)
    dl_dcolors = np.zeros((p, 3), f32)
    ddelx_dx = f32(0.5 * width)
    ddely_dy = f32(0.5 * height)

    for tile_y in range(grid_y):
        for tile_x in range(grid_x):
            ids = lists[tile_y * grid_x + tile_x]
            for py in range(tile_y * block_y,
                            min((tile_y + 1) * block_y, height)):
                for px in range(tile_x * block_x,
                                min((tile_x + 1) * block_x, width)):
                    t_final = final_t[py, px]
                    t = t_final
                    last_contributor = int(n_contrib[py, px])
                    dl_dpixel = dl_dpixels[:, py, px]
                    accum_rec = np.zeros(3, f32)
                    last_alpha = f32(0.0)
                    last_color = np.zeros(3, f32)
                    bg_dot_dpixel = f32(np.sum(bg * dl_dpixel, dtype=f32))
                    # reverse walk; contributor counts 1-based list position
                    for j in range(len(ids) - 1, -1, -1):
                        if j + 1 > last_contributor:
                            continue
                        gid = ids[j]
                        co = pre["conic_opacity"][gid]
                        dx = pre["xy"][gid][0] - f32(px)
                        dy = pre["xy"][gid][1] - f32(py)
                        power = (f32(-0.5) * (co[0] * dx * dx
                                              + co[2] * dy * dy)
                                 - co[1] * dx * dy)
                        if power > f32(0.0):
                            continue
                        g_exp = f32(np.exp(power))
                        alpha = min(f32(0.99), co[3] * g_exp)
                        if alpha < f32(1.0 / 255.0):
                            continue
                        t = t / (f32(1.0) - alpha)
                        dchannel_dcolor = alpha * t

                        dl_dalpha = f32(0.0)
                        for ch in range(3):
                            c = pre["rgb"][gid][ch]
                            accum_rec[ch] = (last_alpha * last_color[ch]
                                             + (f32(1.0) - last_alpha)
                                             * accum_rec[ch])
                            last_color[ch] = c
                            dl_dalpha += (c - accum_rec[ch]) * dl_dpixel[ch]
                            dl_dcolors[gid, ch] += (dchannel_dcolor
                                                    * dl_dpixel[ch])
                        dl_dalpha *= t
                        last_alpha = alpha
                        dl_dalpha += ((-t_final / (f32(1.0) - alpha))
                                      * bg_dot_dpixel)

                        # 0.99-clamp pass-through: dalpha/dG = opacity even
                        # when the clamp fired (backward.cu:477-481)
                        dl_dg = co[3] * dl_dalpha
                        gdx = g_exp * dx
                        gdy = g_exp * dy
                        dg_ddelx = -gdx * co[0] - gdy * co[1]
                        dg_ddely = -gdy * co[2] - gdx * co[1]
                        dl_dmean2d[gid, 0] += dl_dg * dg_ddelx * ddelx_dx
                        dl_dmean2d[gid, 1] += dl_dg * dg_ddely * ddely_dy
                        dl_dconic[gid, 0] += f32(-0.5) * gdx * dx * dl_dg
                        dl_dconic[gid, 1] += f32(-0.5) * gdx * dy * dl_dg
                        dl_dconic[gid, 3] += f32(-0.5) * gdy * dy * dl_dg
                        dl_dopacity[gid] += g_exp * dl_dalpha
    return dict(dl_dmean2d=dl_dmean2d, dl_dconic=dl_dconic,
                dl_dopacity=dl_dopacity, dl_dcolors=dl_dcolors)


def compute_cov2d_backward(mean, radius, cov3d, focal_x, focal_y,
                           tan_fovx, tan_fovy, view_flat, dl_dconic4):
    """computeCov2DCUDA for one Gaussian (backward.cu:144-274).
    Returns (dl_dmean [3] — the cov2D part, OVERWRITE semantics —
    dl_dcov3d [6])."""
    if not radius > 0:
        return np.zeros(3, f32), np.zeros(6, f32)
    dl_dconic = np.array([dl_dconic4[0], dl_dconic4[1], dl_dconic4[3]],
                         dtype=f32)
    t = transform_point_4x3(mean, view_flat)
    limx = f32(1.3) * f32(tan_fovx)
    limy = f32(1.3) * f32(tan_fovy)
    txtz = t[0] / t[2]
    tytz = t[1] / t[2]
    t[0] = min(limx, max(-limx, txtz)) * t[2]
    t[1] = min(limy, max(-limy, tytz)) * t[2]
    x_grad_mul = f32(0.0) if (txtz < -limx or txtz > limx) else f32(1.0)
    y_grad_mul = f32(0.0) if (tytz < -limy or tytz > limy) else f32(1.0)

    fx, fy = f32(focal_x), f32(focal_y)
    # glm ctor column-major (see compute_cov2d): J_math rows below
    J = np.array([
        [fx / t[2], f32(0.0), -(fx * t[0]) / (t[2] * t[2])],
        [f32(0.0), fy / t[2], -(fy * t[1]) / (t[2] * t[2])],
        [f32(0.0), f32(0.0), f32(0.0)],
    ], dtype=f32).T  # transliteration keeps glm's [col][row] indexing below
    v = view_flat
    W = np.array([
        [v[0], v[1], v[2]],
        [v[4], v[5], v[6]],
        [v[8], v[9], v[10]],
    ], dtype=f32)
    Vrk = np.array([
        [cov3d[0], cov3d[1], cov3d[2]],
        [cov3d[1], cov3d[3], cov3d[4]],
        [cov3d[2], cov3d[4], cov3d[5]],
    ], dtype=f32)
    # glm T = W * J == T_math = W_math @ J_math (J above is already the
    # math matrix after the ctor-arg transpose); the indexed formulas below
    # keep glm's [col][row] indexing via the Tg/Vg helpers.
    T_math = (W @ J).astype(f32)

    def Tg(c, r):  # glm T[c][r]
        return T_math[r, c]

    def Vg(c, r):  # glm Vrk[c][r] (symmetric)
        return Vrk[r, c]

    cov2d_math = (T_math.T @ Vrk.T @ T_math).astype(f32)
    a = cov2d_math[0, 0] + f32(0.3)
    b = cov2d_math[1, 0]   # glm cov2D[0][1]
    c = cov2d_math[1, 1] + f32(0.3)
    denom = a * c - b * b
    denom2inv = f32(1.0) / ((denom * denom) + f32(0.0000001))

    dl_da = denom2inv * (-c * c * dl_dconic[0] + f32(2.0) * b * c
                         * dl_dconic[1] + (denom - a * c) * dl_dconic[2])
    dl_dc = denom2inv * (-a * a * dl_dconic[2] + f32(2.0) * a * b
                         * dl_dconic[1] + (denom - a * c) * dl_dconic[0])
    dl_db = denom2inv * f32(2.0) * (b * c * dl_dconic[0]
                                    - (denom + f32(2.0) * b * b)
                                    * dl_dconic[1]
                                    + a * b * dl_dconic[2])

    dl_dcov3d = np.zeros(6, f32)
    dl_dcov3d[0] = (Tg(0, 0) * Tg(0, 0) * dl_da + Tg(0, 0) * Tg(1, 0)
                    * dl_db + Tg(1, 0) * Tg(1, 0) * dl_dc)
    dl_dcov3d[3] = (Tg(0, 1) * Tg(0, 1) * dl_da + Tg(0, 1) * Tg(1, 1)
                    * dl_db + Tg(1, 1) * Tg(1, 1) * dl_dc)
    dl_dcov3d[5] = (Tg(0, 2) * Tg(0, 2) * dl_da + Tg(0, 2) * Tg(1, 2)
                    * dl_db + Tg(1, 2) * Tg(1, 2) * dl_dc)
    dl_dcov3d[1] = (f32(2.0) * Tg(0, 0) * Tg(0, 1) * dl_da
                    + (Tg(0, 0) * Tg(1, 1) + Tg(0, 1) * Tg(1, 0)) * dl_db
                    + f32(2.0) * Tg(1, 0) * Tg(1, 1) * dl_dc)
    dl_dcov3d[2] = (f32(2.0) * Tg(0, 0) * Tg(0, 2) * dl_da
                    + (Tg(0, 0) * Tg(1, 2) + Tg(0, 2) * Tg(1, 0)) * dl_db
                    + f32(2.0) * Tg(1, 0) * Tg(1, 2) * dl_dc)
    dl_dcov3d[4] = (f32(2.0) * Tg(0, 2) * Tg(0, 1) * dl_da
                    + (Tg(0, 1) * Tg(1, 2) + Tg(0, 2) * Tg(1, 1)) * dl_db
                    + f32(2.0) * Tg(1, 1) * Tg(1, 2) * dl_dc)

    dl_dT00 = (f32(2.0) * (Tg(0, 0) * Vg(0, 0) + Tg(0, 1) * Vg(0, 1)
                           + Tg(0, 2) * Vg(0, 2)) * dl_da
               + (Tg(1, 0) * Vg(0, 0) + Tg(1, 1) * Vg(0, 1)
                  + Tg(1, 2) * Vg(0, 2)) * dl_db)
    dl_dT01 = (f32(2.0) * (Tg(0, 0) * Vg(1, 0) + Tg(0, 1) * Vg(1, 1)
                           + Tg(0, 2) * Vg(1, 2)) * dl_da
               + (Tg(1, 0) * Vg(1, 0) + Tg(1, 1) * Vg(1, 1)
                  + Tg(1, 2) * Vg(1, 2)) * dl_db)
    dl_dT02 = (f32(2.0) * (Tg(0, 0) * Vg(2, 0) + Tg(0, 1) * Vg(2, 1)
                           + Tg(0, 2) * Vg(2, 2)) * dl_da
               + (Tg(1, 0) * Vg(2, 0) + Tg(1, 1) * Vg(2, 1)
                  + Tg(1, 2) * Vg(2, 2)) * dl_db)
    dl_dT10 = (f32(2.0) * (Tg(1, 0) * Vg(0, 0) + Tg(1, 1) * Vg(0, 1)
                           + Tg(1, 2) * Vg(0, 2)) * dl_dc
               + (Tg(0, 0) * Vg(0, 0) + Tg(0, 1) * Vg(0, 1)
                  + Tg(0, 2) * Vg(0, 2)) * dl_db)
    dl_dT11 = (f32(2.0) * (Tg(1, 0) * Vg(1, 0) + Tg(1, 1) * Vg(1, 1)
                           + Tg(1, 2) * Vg(1, 2)) * dl_dc
               + (Tg(0, 0) * Vg(1, 0) + Tg(0, 1) * Vg(1, 1)
                  + Tg(0, 2) * Vg(1, 2)) * dl_db)
    dl_dT12 = (f32(2.0) * (Tg(1, 0) * Vg(2, 0) + Tg(1, 1) * Vg(2, 1)
                           + Tg(1, 2) * Vg(2, 2)) * dl_dc
               + (Tg(0, 0) * Vg(2, 0) + Tg(0, 1) * Vg(2, 1)
                  + Tg(0, 2) * Vg(2, 2)) * dl_db)

    def Wg(c_, r_):  # glm W[c][r]
        return W[r_, c_]

    dl_dJ00 = Wg(0, 0) * dl_dT00 + Wg(0, 1) * dl_dT01 + Wg(0, 2) * dl_dT02
    dl_dJ02 = Wg(2, 0) * dl_dT00 + Wg(2, 1) * dl_dT01 + Wg(2, 2) * dl_dT02
    dl_dJ11 = Wg(1, 0) * dl_dT10 + Wg(1, 1) * dl_dT11 + Wg(1, 2) * dl_dT12
    dl_dJ12 = Wg(2, 0) * dl_dT10 + Wg(2, 1) * dl_dT11 + Wg(2, 2) * dl_dT12

    tz = f32(1.0) / t[2]
    tz2 = tz * tz
    tz3 = tz2 * tz
    dl_dtx = x_grad_mul * -fx * tz2 * dl_dJ02
    dl_dty = y_grad_mul * -fy * tz2 * dl_dJ12
    dl_dtz = (-fx * tz2 * dl_dJ00 - fy * tz2 * dl_dJ11
              + (f32(2.0) * fx * t[0]) * tz3 * dl_dJ02
              + (f32(2.0) * fy * t[1]) * tz3 * dl_dJ12)
    # transformVec4x3Transpose (auxiliary.h:73-82): rotation part only
    m = view_flat
    dl_dmean = np.array([
        m[0] * dl_dtx + m[1] * dl_dty + m[2] * dl_dtz,
        m[4] * dl_dtx + m[5] * dl_dty + m[6] * dl_dtz,
        m[8] * dl_dtx + m[9] * dl_dty + m[10] * dl_dtz,
    ], dtype=f32)
    return dl_dmean, dl_dcov3d


def compute_cov3d_backward(scale, mod, rot, dl_dcov3d):
    """computeCov3D backward for one Gaussian (backward.cu:278-341).
    Quaternion treated as already normalized (dnormvdv commented out,
    :340). Returns (dl_dscale [3], dl_drot [4])."""
    r, x, y, z = (f32(rot[0]), f32(rot[1]), f32(rot[2]), f32(rot[3]))
    two = f32(2.0)
    # R_math rows (same as compute_cov3d)
    R = np.array([
        [1 - two * (y * y + z * z), two * (x * y - r * z), two * (x * z + r * y)],
        [two * (x * y + r * z), 1 - two * (x * x + z * z), two * (y * z - r * x)],
        [two * (x * z - r * y), two * (y * z + r * x), 1 - two * (x * x + y * y)],
    ], dtype=f32).T  # ctor args fill columns
    s = (f32(mod) * scale.astype(f32))
    S = np.diag(s).astype(f32)
    M = (S @ R).astype(f32)
    dl_dSigma = np.array([
        [dl_dcov3d[0], f32(0.5) * dl_dcov3d[1], f32(0.5) * dl_dcov3d[2]],
        [f32(0.5) * dl_dcov3d[1], dl_dcov3d[3], f32(0.5) * dl_dcov3d[4]],
        [f32(0.5) * dl_dcov3d[2], f32(0.5) * dl_dcov3d[4], dl_dcov3d[5]],
    ], dtype=f32)
    dl_dM = (f32(2.0) * M @ dl_dSigma).astype(f32)

    Rt = R.T
    dl_dMt = dl_dM.T

    def col(mat, c_):  # glm mat[c] is a column == numpy [:, c] of math mat
        return mat[:, c_]

    dl_dscale = np.array([
        np.dot(col(Rt, 0), col(dl_dMt, 0)),
        np.dot(col(Rt, 1), col(dl_dMt, 1)),
        np.dot(col(Rt, 2), col(dl_dMt, 2)),
    ], dtype=f32)
    dl_dMt = dl_dMt.copy()
    dl_dMt[:, 0] *= s[0]
    dl_dMt[:, 1] *= s[1]
    dl_dMt[:, 2] *= s[2]

    def Mg(c_, r_):  # glm dL_dMt[c][r]
        return dl_dMt[r_, c_]

    dl_dq = np.array([
        two * z * (Mg(0, 1) - Mg(1, 0)) + two * y * (Mg(2, 0) - Mg(0, 2))
        + two * x * (Mg(1, 2) - Mg(2, 1)),
        two * y * (Mg(1, 0) + Mg(0, 1)) + two * z * (Mg(2, 0) + Mg(0, 2))
        + two * r * (Mg(1, 2) - Mg(2, 1))
        - f32(4.0) * x * (Mg(2, 2) + Mg(1, 1)),
        two * x * (Mg(1, 0) + Mg(0, 1)) + two * r * (Mg(2, 0) - Mg(0, 2))
        + two * z * (Mg(1, 2) + Mg(2, 1))
        - f32(4.0) * y * (Mg(2, 2) + Mg(0, 0)),
        two * r * (Mg(0, 1) - Mg(1, 0)) + two * x * (Mg(2, 0) + Mg(0, 2))
        + two * y * (Mg(1, 2) + Mg(2, 1))
        - f32(4.0) * z * (Mg(1, 1) + Mg(0, 0)),
    ], dtype=f32)
    return dl_dscale, dl_dq


def compute_color_from_sh_backward(deg, sh, mean, campos, clamped, dl_dcolor):
    """computeColorFromSH backward for one Gaussian (backward.cu:20-139).
    Returns (dl_dsh [M, 3], dl_dmean [3] — the view-direction part)."""
    sh = sh.astype(f32)
    dir_orig = mean.astype(f32) - campos.astype(f32)
    length = f32(np.sqrt(np.sum(dir_orig * dir_orig, dtype=f32)))
    dir_ = dir_orig / length
    x, y, z = dir_[0], dir_[1], dir_[2]

    dl_drgb = dl_dcolor.astype(f32).copy()
    dl_drgb[clamped] = f32(0.0)

    m = sh.shape[0]
    dl_dsh = np.zeros((m, 3), f32)
    drgb_dx = np.zeros(3, f32)
    drgb_dy = np.zeros(3, f32)
    drgb_dz = np.zeros(3, f32)

    dl_dsh[0] = SH_C0 * dl_drgb
    if deg > 0:
        dl_dsh[1] = -SH_C1 * y * dl_drgb
        dl_dsh[2] = SH_C1 * z * dl_drgb
        dl_dsh[3] = -SH_C1 * x * dl_drgb
        drgb_dx = -SH_C1 * sh[3]
        drgb_dy = -SH_C1 * sh[1]
        drgb_dz = SH_C1 * sh[2]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            dl_dsh[4] = SH_C2[0] * xy * dl_drgb
            dl_dsh[5] = SH_C2[1] * yz * dl_drgb
            dl_dsh[6] = SH_C2[2] * (f32(2.0) * zz - xx - yy) * dl_drgb
            dl_dsh[7] = SH_C2[3] * xz * dl_drgb
            dl_dsh[8] = SH_C2[4] * (xx - yy) * dl_drgb
            drgb_dx = drgb_dx + (SH_C2[0] * y * sh[4]
                                 + SH_C2[2] * f32(2.0) * -x * sh[6]
                                 + SH_C2[3] * z * sh[7]
                                 + SH_C2[4] * f32(2.0) * x * sh[8])
            drgb_dy = drgb_dy + (SH_C2[0] * x * sh[4]
                                 + SH_C2[1] * z * sh[5]
                                 + SH_C2[2] * f32(2.0) * -y * sh[6]
                                 + SH_C2[4] * f32(2.0) * -y * sh[8])
            drgb_dz = drgb_dz + (SH_C2[1] * y * sh[5]
                                 + SH_C2[2] * f32(4.0) * z * sh[6]
                                 + SH_C2[3] * x * sh[7])
            if deg > 2:
                dl_dsh[9] = SH_C3[0] * y * (f32(3.0) * xx - yy) * dl_drgb
                dl_dsh[10] = SH_C3[1] * xy * z * dl_drgb
                dl_dsh[11] = SH_C3[2] * y * (f32(4.0) * zz - xx - yy) * dl_drgb
                dl_dsh[12] = SH_C3[3] * z * (f32(2.0) * zz - f32(3.0) * xx
                                             - f32(3.0) * yy) * dl_drgb
                dl_dsh[13] = SH_C3[4] * x * (f32(4.0) * zz - xx - yy) * dl_drgb
                dl_dsh[14] = SH_C3[5] * z * (xx - yy) * dl_drgb
                dl_dsh[15] = SH_C3[6] * x * (xx - f32(3.0) * yy) * dl_drgb
                drgb_dx = drgb_dx + (
                    SH_C3[0] * sh[9] * f32(6.0) * xy
                    + SH_C3[1] * sh[10] * yz
                    + SH_C3[2] * sh[11] * f32(-2.0) * xy
                    + SH_C3[3] * sh[12] * f32(-6.0) * xz
                    + SH_C3[4] * sh[13] * (f32(-3.0) * xx + f32(4.0) * zz - yy)
                    + SH_C3[5] * sh[14] * f32(2.0) * xz
                    + SH_C3[6] * sh[15] * f32(3.0) * (xx - yy))
                drgb_dy = drgb_dy + (
                    SH_C3[0] * sh[9] * f32(3.0) * (xx - yy)
                    + SH_C3[1] * sh[10] * xz
                    + SH_C3[2] * sh[11] * (f32(-3.0) * yy + f32(4.0) * zz - xx)
                    + SH_C3[3] * sh[12] * f32(-6.0) * yz
                    + SH_C3[4] * sh[13] * f32(-2.0) * xy
                    + SH_C3[5] * sh[14] * f32(-2.0) * yz
                    + SH_C3[6] * sh[15] * f32(-6.0) * xy)
                drgb_dz = drgb_dz + (
                    SH_C3[1] * sh[10] * xy
                    + SH_C3[2] * sh[11] * f32(8.0) * yz
                    + SH_C3[3] * sh[12] * f32(3.0) * (f32(2.0) * zz - xx - yy)
                    + SH_C3[4] * sh[13] * f32(8.0) * xz
                    + SH_C3[5] * sh[14] * (xx - yy))
    dl_ddir = np.array([np.dot(drgb_dx, dl_drgb),
                        np.dot(drgb_dy, dl_drgb),
                        np.dot(drgb_dz, dl_drgb)], dtype=f32)
    # dnormvdv (auxiliary.h:107-116)
    v = dir_orig
    dv = dl_ddir
    sum2 = v[0] * v[0] + v[1] * v[1] + v[2] * v[2]
    invsum32 = f32(1.0) / f32(np.sqrt(sum2 * sum2 * sum2))
    dl_dmean = np.array([
        ((sum2 - v[0] * v[0]) * dv[0] - v[1] * v[0] * dv[1]
         - v[2] * v[0] * dv[2]) * invsum32,
        (-v[0] * v[1] * dv[0] + (sum2 - v[1] * v[1]) * dv[1]
         - v[2] * v[1] * dv[2]) * invsum32,
        (-v[0] * v[2] * dv[0] - v[1] * v[2] * dv[1]
         + (sum2 - v[2] * v[2]) * dv[2]) * invsum32,
    ], dtype=f32)
    return dl_dsh, dl_dmean


def preprocess_backward(pre, means3d, scales, rotations, shs, deg,
                        view_flat, proj_flat, campos, width, height,
                        tan_fovx, tan_fovy, render_grads,
                        scale_modifier=1.0):
    """computeCov2DCUDA + preprocessCUDA backward (backward.cu:144-396).
    Composes the per-Gaussian chain from render_backward's outputs to
    dl_d{means3d, scales, rotations(normalized q), shs, opacity}."""
    p = means3d.shape[0]
    focal_y = height / (2.0 * tan_fovy)
    focal_x = width / (2.0 * tan_fovx)
    m_sh = shs.shape[1]
    dl_dmeans = np.zeros((p, 3), f32)
    dl_dscales = np.zeros((p, 3), f32)
    dl_drots = np.zeros((p, 4), f32)
    dl_dshs = np.zeros((p, m_sh, 3), f32)

    for i in range(p):
        if not pre["radii"][i] > 0:
            continue
        cov3d = compute_cov3d(scales[i], scale_modifier, rotations[i])
        # computeCov2DCUDA: dL_dmeans OVERWRITTEN with the cov2D part
        dmean_cov, dl_dcov3d = compute_cov2d_backward(
            means3d[i].astype(f32), pre["radii"][i], cov3d, focal_x,
            focal_y, tan_fovx, tan_fovy, view_flat,
            render_grads["dl_dconic"][i])
        dl_dmeans[i] = dmean_cov

        # preprocessCUDA: screen-space mean2D -> mean3D (backward.cu:366-383)
        m = means3d[i].astype(f32)
        pr = proj_flat
        m_hom = transform_point_4x4(m, pr)
        m_w = f32(1.0) / (m_hom[3] + f32(0.0000001))
        mul1 = (pr[0] * m[0] + pr[4] * m[1] + pr[8] * m[2] + pr[12]) \
            * m_w * m_w
        mul2 = (pr[1] * m[0] + pr[5] * m[1] + pr[9] * m[2] + pr[13]) \
            * m_w * m_w
        d2d = render_grads["dl_dmean2d"][i]
        dl_dmeans[i, 0] += ((pr[0] * m_w - pr[3] * mul1) * d2d[0]
                            + (pr[1] * m_w - pr[3] * mul2) * d2d[1])
        dl_dmeans[i, 1] += ((pr[4] * m_w - pr[7] * mul1) * d2d[0]
                            + (pr[5] * m_w - pr[7] * mul2) * d2d[1])
        dl_dmeans[i, 2] += ((pr[8] * m_w - pr[11] * mul1) * d2d[0]
                            + (pr[9] * m_w - pr[11] * mul2) * d2d[1])

        dl_dshs[i], dmean_sh = compute_color_from_sh_backward(
            deg, shs[i], m, campos, pre["clamped"][i],
            render_grads["dl_dcolors"][i])
        dl_dmeans[i] += dmean_sh

        dl_dscales[i], dl_drots[i] = compute_cov3d_backward(
            scales[i], scale_modifier, rotations[i], dl_dcov3d)

    return dict(dl_dmeans=dl_dmeans, dl_dscales=dl_dscales,
                dl_drots=dl_drots, dl_dshs=dl_dshs,
                dl_dopacity=render_grads["dl_dopacity"])


def backward_full(means3d, scales, rotations, opacities, shs, deg,
                  view_flat, proj_flat, campos, width, height,
                  tan_fovx, tan_fovy, bg, dl_dpixels,
                  block_x=16, block_y=16, scale_modifier=1.0):
    """Full reference backward: forward residuals -> render backward ->
    preprocess backward. ``dl_dpixels`` is the [3, H, W] cotangent of the
    (background-composited) output image."""
    fwd = render_full(means3d, scales, rotations, opacities, shs, deg,
                      view_flat, proj_flat, campos, width, height,
                      tan_fovx, tan_fovy, bg, block_x, block_y,
                      scale_modifier)
    pre = fwd["pre"]
    lists = build_tile_lists(pre, *pre["grid"])
    rg = render_backward(pre, lists, width, height, bg, dl_dpixels,
                         fwd["final_t"], fwd["n_contrib"], block_x, block_y)
    out = preprocess_backward(pre, means3d, scales, rotations, shs, deg,
                              view_flat, proj_flat, campos, width, height,
                              tan_fovx, tan_fovy, rg, scale_modifier)
    out["dl_dcolors"] = rg["dl_dcolors"]
    out["dl_dmean2d"] = rg["dl_dmean2d"]
    return out
