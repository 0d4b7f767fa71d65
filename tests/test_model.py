"""Model-layer tests: KNN, Adam parity vs torch, relocation math, MCMC ops."""

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.model import gaussians, knn, mcmc, optim


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(257, 3)).astype(np.float32)
    got = np.asarray(knn.mean_sq_dist_3nn(jnp.asarray(pts), block=64))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expected = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_knn_morton_window_close_to_exact():
    """The large-P Morton-window path (the reference simple-knn's accuracy
    class, simple_knn.cu:133-182) must be near-exact on a uniform cloud:
    most rows exact, none wildly off (it is a scale INIT heuristic)."""
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, size=(4096, 3)).astype(np.float32)
    got = np.asarray(knn._mean_sq_dist_3nn_morton(jnp.asarray(pts),
                                                  block=256))
    # compare against the exact path (IDENTICAL sq-form numerics — a raw
    # brute-force comparison measures f32 cancellation, not window misses)
    exact = np.asarray(knn._mean_sq_dist_3nn_exact(jnp.asarray(pts),
                                                   block=256))
    rel = np.abs(got - exact) / (exact + 1e-12)
    assert (rel < 1e-5).mean() > 0.85, (rel < 1e-5).mean()
    assert np.median(rel) < 1e-6
    # a window miss can only OVERestimate the neighbor distance
    assert np.all(got >= exact - 1e-6 * np.abs(exact))


def test_knn_large_path_exact_on_adversarial_cloud():
    """The large-P path must be EXACT like the reference's boxMeanDist
    (simple_knn.cu:133-182), even when Morton locality is defeated: pairs
    straddling the x=0.5 quantization boundary sort ~half the array apart,
    so the 3-block window misses the twin. The AABB certificate must flag
    every such row and the rescan must recover the exact answer."""
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 1, size=(4096, 3)).astype(np.float32)
    yz = rng.uniform(0.1, 0.9, size=(64, 2)).astype(np.float32)
    left = np.stack([np.full(64, 0.5 - 1e-4, np.float32), yz[:, 0],
                     yz[:, 1]], 1)
    right = np.stack([np.full(64, 0.5 + 1e-4, np.float32), yz[:, 0],
                      yz[:, 1]], 1)
    pts = np.concatenate([base, left, right])
    j = jnp.asarray(pts)
    approx, viol = knn._windowed_3nn(j, block=64)
    approx, viol = np.asarray(approx), np.asarray(viol)
    exact = np.asarray(knn._mean_sq_dist_3nn_exact(j, block=64))
    # the adversarial pairs genuinely defeat the window pass...
    assert np.any(approx > exact * (1 + 1e-3))
    # ...every defeated row is flagged by the certificate...
    bad = approx > exact * (1 + 1e-5) + 1e-12
    assert np.all(viol[bad])
    # ...and the rescan recovers exactness everywhere
    got = np.asarray(knn._mean_sq_dist_3nn_large(j, block=64))
    np.testing.assert_allclose(got, exact, rtol=1e-4)


def test_adam_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(5, 3)).astype(np.float32)
    g = rng.normal(size=(5, 3)).astype(np.float32)

    xt = torch.tensor(x0, requires_grad=True)
    topt = torch.optim.Adam([xt], lr=1e-2, eps=1e-15)
    params = {"xyz": jnp.asarray(x0)}
    st = optim.init(params)
    for i in range(5):
        xt.grad = torch.tensor(g) * (i + 1)
        topt.step()
        params, st = optim.step(params, {"xyz": jnp.asarray(g) * (i + 1)}, st,
                                {"xyz": 1e-2})
    np.testing.assert_allclose(np.asarray(params["xyz"]),
                               xt.detach().numpy(), atol=1e-6)


def test_zero_moments_at():
    params = {"a": jnp.ones((4, 2))}
    st = optim.init(params)
    params, st = optim.step(params, {"a": jnp.ones((4, 2))}, st, {"a": 0.1})
    st = optim.zero_moments_at(st, jnp.asarray([True, False, True, False]))
    mu = np.asarray(st.mu["a"])
    assert np.all(mu[0] == 0) and np.all(mu[2] == 0)
    assert np.all(mu[1] != 0) and np.all(mu[3] != 0)


def _reference_relocation(o_old, s_old, N):
    """Direct double-loop port of cuda_rasterizer/utils.cu:6-36."""
    from scipy.special import comb

    o_new = 1 - (1 - o_old) ** (1.0 / N)
    denom = 0.0
    for i in range(1, N + 1):
        for k in range(0, i):
            denom += comb(i - 1, k) * ((-1) ** k / np.sqrt(k + 1)) * o_new ** (k + 1)
    return o_new, (o_old / denom) * s_old


def test_compute_relocation_matches_reference_series():
    for o in [0.05, 0.3, 0.9, 0.999]:
        for n in [1, 2, 5, 17, 50]:
            o_new, s_new = mcmc.compute_relocation(
                jnp.asarray([o]), jnp.asarray([[1.0, 2.0, 3.0]]),
                jnp.asarray([n]))
            o_ref, s_ref = _reference_relocation(o, np.array([1.0, 2.0, 3.0]), n)
            np.testing.assert_allclose(float(o_new[0]), o_ref, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(s_new[0]), s_ref, rtol=2e-4)


def test_relocation_n1_identity():
    """N=1: opacity unchanged, scale unchanged (denom = o_new)."""
    o_new, s_new = mcmc.compute_relocation(
        jnp.asarray([0.7]), jnp.asarray([[0.5, 0.5, 0.5]]), jnp.asarray([1]))
    np.testing.assert_allclose(float(o_new[0]), 0.7, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_new[0]), [0.5, 0.5, 0.5], rtol=1e-5)


def _make_state(n=20, capacity=64, seed=0, sh_degree=1):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    colors = rng.uniform(0.2, 0.8, size=(n, 3)).astype(np.float32)
    return gaussians.create_from_points(pts, colors, capacity, sh_degree)


def test_create_from_points():
    st = _make_state()
    assert int(st.n_alive) == 20
    assert st.capacity == 64
    # opacity activates to 0.5 exactly
    np.testing.assert_allclose(np.asarray(st.get_opacity())[:20], 0.5,
                               atol=1e-6)
    # rotation is identity quaternion
    np.testing.assert_allclose(np.asarray(st.rotation)[:20, 0], 1.0)
    # scaling is isotropic and finite
    s = np.asarray(st.get_scaling())[:20]
    assert np.all(np.isfinite(s)) and np.all(s > 0)
    assert np.allclose(s[:, 0], s[:, 1])


def test_relocate_moves_dead_to_alive():
    st = _make_state(n=20)
    # make rows 0..4 dead (opacity below threshold)
    opa = np.array(st.opacity)
    opa[:5] = gaussians.inverse_sigmoid(jnp.asarray(0.001))
    import dataclasses
    st = dataclasses.replace(st, opacity=jnp.asarray(opa))
    adam = optim.init(st.params())
    st2, adam2 = mcmc.relocate_gs(st, adam, jax.random.PRNGKey(0))
    new_opa = np.asarray(st2.get_opacity())[:20, 0]
    assert np.all(new_opa[:5] >= 0.005 - 1e-6), "dead rows were not revived"
    assert int(st2.n_alive) == 20
    # dead rows teleported onto template positions
    xyz2 = np.asarray(st2.xyz)[:5]
    xyz_alive = np.asarray(st.xyz)[5:20]
    for row in xyz2:
        assert np.any(np.all(np.isclose(row, xyz_alive, atol=1e-6), axis=1))


def test_add_new_grows_five_percent():
    st = _make_state(n=40, capacity=64)
    adam = optim.init(st.params())
    st2, _ = mcmc.add_new_gs(st, adam, jax.random.PRNGKey(1), cap_max=64)
    assert int(st2.n_alive) == 42  # floor(1.05 * 40)
    # new rows are clones of existing positions
    xyz_new = np.asarray(st2.xyz)[40:42]
    xyz_old = np.asarray(st.xyz)[:40]
    for row in xyz_new:
        assert np.any(np.all(np.isclose(row, xyz_old, atol=1e-6), axis=1))


def test_add_new_respects_cap():
    st = _make_state(n=40, capacity=64)
    adam = optim.init(st.params())
    st2, _ = mcmc.add_new_gs(st, adam, jax.random.PRNGKey(1), cap_max=41)
    assert int(st2.n_alive) == 41


def test_inject_noise_only_transparent():
    st = _make_state(n=20)
    import dataclasses
    opa = np.array(st.opacity)
    opa[:10] = gaussians.inverse_sigmoid(jnp.asarray(0.999))  # opaque: no noise
    opa[10:20] = gaussians.inverse_sigmoid(jnp.asarray(0.001))  # transparent
    st = dataclasses.replace(st, opacity=jnp.asarray(opa))
    st2 = mcmc.inject_noise(st, jax.random.PRNGKey(2), noise_lr=5e4,
                            xyz_lr=1e-4)
    delta = np.abs(np.asarray(st2.xyz) - np.asarray(st.xyz)).max(axis=1)
    assert np.all(delta[:10] < 1e-5), "opaque gaussians should barely move"
    assert np.all(delta[10:20] > 1e-5), "transparent gaussians should move"
    assert np.all(delta[20:] == 0.0), "padding rows must not move"


def test_knn_indices_match_bruteforce():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(130, 3)).astype(np.float32)
    d, idx = knn.knn_indices(jnp.asarray(pts), k=5, block=64)
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expected_idx = np.argsort(d2, axis=1)[:, :5]
    expected_d = np.sort(d2, axis=1)[:, :5]
    np.testing.assert_allclose(np.sort(np.asarray(d), 1), expected_d,
                               rtol=1e-4)
    # index sets match (order within ties can differ)
    assert all(set(np.asarray(idx)[i]) == set(expected_idx[i])
               for i in range(130))


def test_arap_loss_zero_for_rigid_field():
    from gsplat_tpu.train.losses import arap_loss, build_neighbor

    rng = np.random.default_rng(5)
    xyz = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    nbr = build_neighbor(xyz, num_knn=4)
    const = jnp.broadcast_to(jnp.asarray([1.0, 2.0, 3.0]), (64, 3))
    pens = arap_loss(xyz, [const], nbr["indices"])
    np.testing.assert_allclose(np.asarray(pens), [0.0], atol=1e-6)
    varying = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    pens2 = arap_loss(xyz, [varying], nbr["indices"])
    assert float(pens2[0]) > 0.0


def test_sample_templates_distribution_and_masking():
    """Regression for the round-4 sampler rewrite (O(P^2) categorical ->
    inverse-CDF): empirical frequencies must match the weights
    (multinomial-with-replacement semantics of _sample_alives,
    gaussian_model_static.py:412-422) and zero-probability rows —
    including LEADING zeros, which a u=0 draw could otherwise hit — must
    never be selected."""
    import jax

    from gsplat_tpu.model.mcmc import _sample_templates

    probs = jnp.asarray(np.array([0.0, 0.1, 0.0, 0.3, 0.6, 0.0],
                                 np.float32))
    idx = np.asarray(_sample_templates(jax.random.PRNGKey(0), probs,
                                       200_000))
    counts = np.bincount(idx, minlength=6) / 200_000
    assert counts[0] == 0 and counts[2] == 0 and counts[5] == 0, counts
    np.testing.assert_allclose(counts[[1, 3, 4]], [0.1, 0.3, 0.6],
                               atol=0.01)

    # all mass on the last row behind leading zeros
    probs2 = jnp.asarray(np.array([0.0, 0.0, 1e-8], np.float32))
    idx2 = np.asarray(_sample_templates(jax.random.PRNGKey(1), probs2,
                                        10_000))
    assert (idx2 == 2).all(), np.bincount(idx2)


def test_densify_scales_to_large_capacity():
    """The categorical-based sampler materialized O(P^2) work (TPU
    InvalidArgument at cap 1M); keep a capacity-scaling smoke so the
    densify program stays O(P log P). 2^18 rows on CPU: completes in
    seconds, would be minutes/OOM with a [C, C] reduction."""
    import jax

    cap = 1 << 18
    rng = np.random.default_rng(0)
    state = gaussians.create_from_points(
        rng.uniform(-1, 1, (cap, 3)).astype(np.float32),
        rng.uniform(0, 1, (cap, 3)).astype(np.float32),
        capacity=cap, max_sh_degree=1)
    adam = optim.init(state.params())
    s2, a2 = mcmc.relocate_gs(state, adam, jax.random.PRNGKey(0))
    s3, _ = mcmc.add_new_gs(s2, a2, jax.random.PRNGKey(1), cap)
    assert bool(jnp.all(jnp.isfinite(s3.xyz)))
    assert int(s3.n_alive) == cap
