"""Parity tests for the fused sampler-query kernel (ops/fused_query.py).

The kernel fuses warp + positional embedding + SDF trunk + head into one
Pallas call; these tests pin it (in interpret mode) against the layer-by-layer
XLA path in models/nodes.py at bf16 tolerance, and the embedding plan against
embedders.fourier_embed exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hold_tpu.models.embedders import barf_alpha, barf_weights, fourier_embed
from hold_tpu.models.mlp import (
    apply_implicit_trunk,
    implicit_net_shapes,
    implicit_sdf_from_trunk,
    init_implicit_net,
    resolve_weight_norm,
)
from hold_tpu.ops.fused_query import (
    embed_plan,
    fused_hand_sampler_sdf,
    fused_object_sampler_sdf,
    pack_trunk_weights,
    supports_fused_query,
)
from hold_tpu.ops.knn import knn_inverse_warp
from hold_tpu.utils.config import DEFAULT_CONFIG
from hold_tpu.utils.rot import axis_angle_to_matrix

MANO_SPECS = {"pose_dim": 45, "embedding": "fourier"}
OBJ_SPECS = {"pose_dim": 0, "embedding": "barf"}


def _implicit(specs, seed=0):
    opt = DEFAULT_CONFIG["model"]["implicit_network"]
    plan = implicit_net_shapes(opt, specs)
    params = init_implicit_net(jax.random.PRNGKey(seed), opt, specs)
    return opt, plan, resolve_weight_norm(params)


def _bf16_tree(tree):
    return jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), tree)


def _rigid_tfs(rng, B, J, rot_scale=0.3, t_scale=0.05):
    aa = jnp.asarray(rng.randn(B, J, 3) * rot_scale, jnp.float32)
    tfs = jnp.zeros((B, J, 4, 4))
    tfs = tfs.at[..., :3, :3].set(axis_angle_to_matrix(aa))
    tfs = tfs.at[..., :3, 3].set(
        jnp.asarray(rng.randn(B, J, 3) * t_scale, jnp.float32)
    )
    return tfs.at[..., 3, 3].set(1.0)


def test_embed_plan_matches_fourier_embed():
    L = 6
    x = jnp.asarray(np.random.RandomState(0).randn(17, 3) * 0.4, jnp.float32)
    plan = np.asarray(embed_plan(L, None))  # (48, 8)
    arg = plan[:, 4:7] @ np.asarray(x).T  # (48, N)
    emb = (
        plan[:, 0:1] * arg
        + plan[:, 1:2] * np.sin(arg)
        + plan[:, 2:3] * np.cos(arg)
    ) * plan[:, 3:4]
    ref = np.asarray(fourier_embed(x, L))  # (N, 39)
    np.testing.assert_allclose(emb[:39].T, ref, atol=1e-5)
    np.testing.assert_allclose(emb[39:], 0.0)  # pad rows windowed off


def test_embed_plan_barf_window_matches_barf_weights():
    L, step, s, e = 6, 900, 100, 2000
    alpha = barf_alpha(jnp.asarray(step), L, s, e)
    wf = barf_weights(alpha, L)
    window = jnp.concatenate([jnp.ones((3,)), jnp.repeat(wf, 6)])
    plan = np.asarray(embed_plan(L, window))
    # col 3 carries the window in embedding-row order
    np.testing.assert_allclose(plan[:39, 3], np.asarray(window), atol=1e-6)
    np.testing.assert_allclose(plan[39:, 3], 0.0)


def test_supports_fused_query_gates():
    _, plan, _ = _implicit(MANO_SPECS)
    assert supports_fused_query(plan)
    bad = dict(plan, skip_in=(3,))
    assert not supports_fused_query(bad)
    bad = dict(plan, dims=tuple(list(plan["dims"][:-1]) + [0]))
    assert not supports_fused_query(bad)


def test_fused_hand_kernel_matches_xla_path():
    _, plan, resolved = _implicit(MANO_SPECS, seed=0)
    rng = np.random.RandomState(3)
    B, N, V, J, K = 2, 600, 778, 16, 15
    pts = jnp.asarray(rng.randn(B, N, 3) * 0.15, jnp.float32)
    verts = jnp.asarray(rng.randn(B, V, 3) * 0.12, jnp.float32)
    w = rng.rand(B, V, J).astype(np.float32) ** 4  # peaked like skinning
    w = jnp.asarray(w / w.sum(-1, keepdims=True))
    tfs = _rigid_tfs(rng, B, J)

    # reference: interpret-mode warp + bf16 trunk + head (nodes.py fallback)
    x_c, _ = knn_inverse_warp(pts, verts, w, tfs, K=K, interpret=True)
    implicit_bf16 = _bf16_tree(resolved)
    h = apply_implicit_trunk(implicit_bf16, plan, x_c.reshape(-1, 3), None)
    ref = np.asarray(
        implicit_sdf_from_trunk(implicit_bf16, h).astype(jnp.float32)
    ).reshape(B, N)

    pack = pack_trunk_weights(resolved, plan)
    plan_arr = embed_plan(plan["multires"], None)
    got = np.asarray(
        fused_hand_sampler_sdf(
            pts, verts, w, tfs, plan_arr, pack, K=K, interpret=True
        )
    )
    assert got.shape == (B, N)
    # bf16 matmul noise only: both paths round activations to bf16
    np.testing.assert_allclose(got, ref, atol=2e-2)
    assert np.abs(got - ref).mean() < 4e-3


def test_fused_object_kernel_matches_xla_path():
    from hold_tpu.models.nodes import object_deform
    from hold_tpu.utils.transforms import inverse_mat3

    _, plan, resolved = _implicit(OBJ_SPECS, seed=1)
    rng = np.random.RandomState(5)
    B, N = 2, 600
    pts = jnp.asarray(rng.randn(B, N, 3) * 0.3, jnp.float32)
    tfs = _rigid_tfs(rng, B, 1, rot_scale=0.8, t_scale=0.2)[:, 0]

    x_c = object_deform(pts, tfs, inverse=True)
    implicit_bf16 = _bf16_tree(resolved)
    step = jnp.asarray(900)
    h = apply_implicit_trunk(
        implicit_bf16, plan, x_c.reshape(-1, 3),
        jnp.zeros((B * N, 0), jnp.bfloat16), step=step, barf_cfg=(100, 2000),
    )
    ref = np.asarray(
        implicit_sdf_from_trunk(implicit_bf16, h).astype(jnp.float32)
    ).reshape(B, N)

    alpha = barf_alpha(step, plan["multires"], 100, 2000)
    wf = barf_weights(alpha, plan["multires"])
    window = jnp.concatenate([jnp.ones((3,)), jnp.repeat(wf, 6)])
    plan_arr = embed_plan(plan["multires"], window)
    pack = pack_trunk_weights(resolved, plan)
    Rinv = inverse_mat3(tfs[:, :3, :3])
    tf12 = jnp.concatenate([Rinv.reshape(B, 9), tfs[:, :3, 3]], axis=-1)
    got = np.asarray(
        fused_object_sampler_sdf(pts, tf12, plan_arr, pack, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-2)
    assert np.abs(got - ref).mean() < 4e-3

def test_fused_hand_z_kernel_matches_pts_kernel():
    """z-table entry point == pts entry point on points cam + z*dir."""
    from hold_tpu.ops.fused_query import fused_hand_sampler_sdf_z, pack_rays8

    _, plan, resolved = _implicit(MANO_SPECS, seed=0)
    rng = np.random.RandomState(7)
    B, P, S, V, J, K = 2, 6, 128, 778, 16, 15
    dirs = rng.randn(B * P, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    cam = rng.randn(B * P, 3).astype(np.float32) * 0.1
    z = jnp.asarray(np.sort(rng.rand(B, P, S) * 0.6, axis=-1), jnp.float32)
    pts = jnp.asarray(
        cam.reshape(B, P, 1, 3)
        + np.asarray(z)[..., None] * dirs.reshape(B, P, 1, 3)
    ).reshape(B, P * S, 3)
    verts = jnp.asarray(rng.randn(B, V, 3) * 0.12, jnp.float32)
    w = rng.rand(B, V, J).astype(np.float32) ** 4
    w = jnp.asarray(w / w.sum(-1, keepdims=True))
    tfs = _rigid_tfs(rng, B, J)

    pack = pack_trunk_weights(resolved, plan)
    plan_arr = embed_plan(plan["multires"], None)
    ref = np.asarray(
        fused_hand_sampler_sdf(
            pts, verts, w, tfs, plan_arr, pack, K=K, interpret=True
        )
    ).reshape(B, P, S)
    rays8 = pack_rays8(jnp.asarray(dirs), jnp.asarray(cam), B, P, S)
    got = np.asarray(
        fused_hand_sampler_sdf_z(
            rays8, z, verts, w, tfs, plan_arr, pack, K=K, interpret=True
        )
    )
    assert got.shape == (B, P, S)
    np.testing.assert_allclose(got, ref, atol=2e-2)
    assert np.abs(got - ref).mean() < 4e-3


def test_fused_object_z_kernel_matches_pts_kernel():
    from hold_tpu.ops.fused_query import (
        fused_object_sampler_sdf_z,
        pack_rays8,
    )
    from hold_tpu.utils.transforms import inverse_mat3

    _, plan, resolved = _implicit(OBJ_SPECS, seed=1)
    rng = np.random.RandomState(11)
    B, P, S = 2, 10, 128  # P not divisible by the per-tile ray count (4)
    dirs = rng.randn(B * P, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    cam = rng.randn(B * P, 3).astype(np.float32) * 0.1
    z = jnp.asarray(np.sort(rng.rand(B, P, S) * 0.8, axis=-1), jnp.float32)
    pts = jnp.asarray(
        cam.reshape(B, P, 1, 3)
        + np.asarray(z)[..., None] * dirs.reshape(B, P, 1, 3)
    ).reshape(B, P * S, 3)
    tfs = _rigid_tfs(rng, B, 1, rot_scale=0.8, t_scale=0.2)[:, 0]

    plan_arr = embed_plan(plan["multires"], None)
    pack = pack_trunk_weights(resolved, plan)
    Rinv = inverse_mat3(tfs[:, :3, :3])
    tf12 = jnp.concatenate([Rinv.reshape(B, 9), tfs[:, :3, 3]], axis=-1)
    ref = np.asarray(
        fused_object_sampler_sdf(pts, tf12, plan_arr, pack, interpret=True)
    ).reshape(B, P, S)
    rays8 = pack_rays8(jnp.asarray(dirs), jnp.asarray(cam), B, P, S)
    got = np.asarray(
        fused_object_sampler_sdf_z(
            rays8, z, tf12, plan_arr, pack, interpret=True
        )
    )
    assert got.shape == (B, P, S)
    np.testing.assert_allclose(got, ref, atol=2e-2)
    assert np.abs(got - ref).mean() < 4e-3


def test_relu_trunk_close_to_softplus():
    """HOLD_SAMPLER_RELU substitutes relu for softplus(beta=100) in the
    hidden layers.  Per activation the two differ by <= log(2)/100, but the
    gap is one-signed (softplus >= relu) so it accumulates coherently
    through the 8-layer trunk: measured ~0.04 mean SDF deviation at
    geometric init (SDF scale ~0.2).  That is too large for default-on —
    the knob exists to MEASURE the transcendental budget on-chip — so this
    test only pins the deviation's order of magnitude and that the kernel
    compiles/runs in both modes."""
    _, plan, resolved = _implicit(MANO_SPECS, seed=0)
    rng = np.random.RandomState(13)
    B, N, V, J, K = 1, 512, 778, 16, 15
    pts = jnp.asarray(rng.randn(B, N, 3) * 0.15, jnp.float32)
    verts = jnp.asarray(rng.randn(B, V, 3) * 0.12, jnp.float32)
    w = rng.rand(B, V, J).astype(np.float32) ** 4
    w = jnp.asarray(w / w.sum(-1, keepdims=True))
    tfs = _rigid_tfs(rng, B, J)
    pack = pack_trunk_weights(resolved, plan)
    plan_arr = embed_plan(plan["multires"], None)
    soft = np.asarray(fused_hand_sampler_sdf(
        pts, verts, w, tfs, plan_arr, pack, K=K, interpret=True))
    hard = np.asarray(fused_hand_sampler_sdf(
        pts, verts, w, tfs, plan_arr, pack, K=K, interpret=True, relu=True))
    # coherent accumulation bound: well under the SDF scale, far above bf16
    assert np.abs(soft - hard).max() < 0.2
    assert np.abs(soft - hard).mean() < 0.1


def test_sampler_knn_stride_env(monkeypatch):
    """The stride knob subsamples the sampler-stage KNN vertex table; the
    resulting SDF field must stay close to the full-table field (it feeds
    only sample placement)."""
    from hold_tpu.models import nodes as nodes_mod

    monkeypatch.setenv("HOLD_SAMPLER_KNN_STRIDE", "4")
    assert nodes_mod._sampler_knn_stride() == 4
    monkeypatch.delenv("HOLD_SAMPLER_KNN_STRIDE")
    assert nodes_mod._sampler_knn_stride() == 1

    _, plan, resolved = _implicit(MANO_SPECS, seed=0)
    rng = np.random.RandomState(17)
    B, N, V, J, K = 1, 512, 778, 16, 15
    pts = jnp.asarray(rng.randn(B, N, 3) * 0.15, jnp.float32)
    verts = jnp.asarray(rng.randn(B, V, 3) * 0.12, jnp.float32)
    w = rng.rand(B, V, J).astype(np.float32) ** 4
    w = jnp.asarray(w / w.sum(-1, keepdims=True))
    tfs = _rigid_tfs(rng, B, J, rot_scale=0.1, t_scale=0.02)
    pack = pack_trunk_weights(resolved, plan)
    plan_arr = embed_plan(plan["multires"], None)
    full = np.asarray(fused_hand_sampler_sdf(
        pts, verts, w, tfs, plan_arr, pack, K=K, interpret=True))
    sub = np.asarray(fused_hand_sampler_sdf(
        pts, verts[:, ::4], w[:, ::4], tfs, plan_arr, pack, K=K,
        interpret=True))
    # the subsampled warp lands near the full warp for mild poses; the SDF
    # difference must stay below the sampler's convergence epsilon
    assert np.abs(full - sub).mean() < 5e-2
