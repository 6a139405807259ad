"""Parity tests for the fused inference-render kernel (ops/fused_render.py).

The kernel fuses warp + Jacobian-inverse + SDF trunk forward + in-kernel
reverse pass (normals) + feature head + 'pose'-mode color MLP into one Pallas
call; these tests pin it (interpret mode) against the layer-by-layer XLA shade
path from models/nodes.py at bf16 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hold_tpu.models.mlp import (
    _apply_linear,
    apply_implicit_trunk,
    apply_rendering_net,
    implicit_feat_from_trunk,
    implicit_net_shapes,
    implicit_sdf_from_trunk,
    init_implicit_net,
    init_rendering_net,
    rendering_net_shapes,
    resolve_weight_norm,
)
from hold_tpu.ops.fused_query import embed_plan, pack_trunk_weights
from hold_tpu.ops.fused_render import (
    frame_bias0,
    fused_hand_render,
    fused_object_render,
    pack_color_weights,
    pack_trunk_transposed,
    supports_fused_render,
)
from hold_tpu.ops.knn import knn_inverse_warp, knn_jacobian_inverse
from hold_tpu.utils.config import DEFAULT_CONFIG
from hold_tpu.utils.rot import axis_angle_to_matrix
from hold_tpu.utils.transforms import safe_norm

MANO_SPECS = {"pose_dim": 45, "embedding": "fourier"}
OBJ_SPECS = {"pose_dim": 0, "embedding": "fourier"}


def _nets(specs, extra_in=0, seed=0):
    opt_i = DEFAULT_CONFIG["model"]["implicit_network"]
    iplan = implicit_net_shapes(opt_i, specs)
    iparams = resolve_weight_norm(
        init_implicit_net(jax.random.PRNGKey(seed), opt_i, specs)
    )
    opt_r = dict(DEFAULT_CONFIG["model"]["rendering_network"])
    opt_r["d_in"] = opt_r["d_in"] + extra_in
    rplan = rendering_net_shapes(opt_r, specs)
    rparams = resolve_weight_norm(
        init_rendering_net(jax.random.PRNGKey(seed + 7), opt_r, specs)
    )
    return iplan, iparams, rplan, rparams


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


def _xla_shade(iparams, iplan, rparams, rplan, x_c_flat, jinv_flat9,
               feat_extra=None, pose_embed_pp=None, step=None,
               barf_cfg=(0, 1)):
    """Replicates the nodes.py shade path (bf16 trunk/color, f32 sdf head)."""
    imp16 = _bf16_tree(iparams)
    rend16 = _bf16_tree(rparams)
    cond = None if iplan["cond"] == "pose" else jnp.zeros(
        (x_c_flat.shape[0], 0), jnp.bfloat16
    )

    def field(p):
        h = apply_implicit_trunk(imp16, iplan, p, cond, step=step,
                                 barf_cfg=barf_cfg)
        return implicit_sdf_from_trunk(iparams, h), h

    (sdf, h), vjp = jax.vjp(field, x_c_flat)
    g = vjp((jnp.ones_like(sdf), jnp.zeros_like(h)))[0].astype(jnp.float32)
    feat = implicit_feat_from_trunk(imp16, h)
    nrm = jnp.einsum("ni,nij->nj", g, jinv_flat9.reshape(-1, 3, 3))
    nrm = nrm / jnp.maximum(safe_norm(nrm, keepdims=True), 1e-6)
    fv = feat if feat_extra is None else jnp.concatenate(
        [feat, feat_extra.astype(feat.dtype)], axis=-1
    )
    rgb = apply_rendering_net(
        rend16, rplan, x_c_flat, nrm, None, None, fv,
        step=step, barf_cfg=barf_cfg, pose_embed=pose_embed_pp,
    )
    return sdf, rgb, nrm


def test_supports_fused_render_gates():
    iplan, _, rplan, _ = _nets(MANO_SPECS)
    assert supports_fused_render(iplan, rplan)
    assert not supports_fused_render(iplan, dict(rplan, mode="nerf_frame_encoding"))
    assert not supports_fused_render(iplan, dict(rplan, multires_view=4))
    bad = dict(rplan, dims=tuple(list(rplan["dims"][:-1]) + [4]))
    assert not supports_fused_render(iplan, bad)


def test_fused_hand_render_matches_xla_path():
    iplan, iparams, rplan, rparams = _nets(MANO_SPECS, seed=0)
    rng = np.random.RandomState(3)
    B, N, V, J, K = 2, 600, 778, 16, 15
    pts = jnp.asarray(rng.randn(B, N, 3) * 0.15, jnp.float32)
    verts_p = jnp.asarray(rng.randn(B, V, 3) * 0.12, jnp.float32)
    verts_c = jnp.asarray(rng.randn(B, V, 3) * 0.12, jnp.float32)
    w = rng.rand(B, V, J).astype(np.float32) ** 4
    w = jnp.asarray(w / w.sum(-1, keepdims=True))
    tfs = _rigid_tfs(rng, B, J)
    body_pose = jnp.asarray(rng.randn(B, 45) * 0.2, jnp.float32)

    # reference: interpret-mode warp/jinv kernels + XLA shade
    x_c, _ = knn_inverse_warp(pts, verts_p, w, tfs, K=K, interpret=True)
    jinv9 = knn_jacobian_inverse(x_c, verts_c, w, tfs, K=K, interpret=True)
    pe = _apply_linear(rparams["lin_pose"], body_pose)  # (B, 8) f32
    pe_pp = jnp.repeat(pe, N, axis=0)
    ref_sdf, ref_rgb, ref_nrm = _xla_shade(
        iparams, iplan, rparams, rplan, x_c.reshape(-1, 3),
        jinv9.reshape(-1, 9), pose_embed_pp=pe_pp,
    )

    tpack = pack_trunk_weights(iparams, iplan)
    tpack_t = pack_trunk_transposed(iparams, iplan)
    cpack = pack_color_weights(rparams, iparams)
    fb0 = frame_bias0(rparams, pe)
    plan_arr = embed_plan(iplan["multires"], None)
    sdf, rgb, nrm, dist, xc_out = fused_hand_render(
        pts, verts_p, verts_c, w, tfs, plan_arr, tpack, tpack_t, cpack, fb0,
        K=K, interpret=True,
    )

    np.testing.assert_allclose(
        np.asarray(xc_out), np.asarray(x_c), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sdf), np.asarray(ref_sdf).reshape(B, N), atol=2e-2
    )
    assert np.abs(np.asarray(sdf) - np.asarray(ref_sdf).reshape(B, N)).mean() < 4e-3
    # normals pass through a normalisation, rgb through a sigmoid — both
    # contract bf16 noise
    np.testing.assert_allclose(
        np.asarray(rgb), np.asarray(ref_rgb).reshape(B, N, 3), atol=3e-2
    )
    nerr = np.abs(np.asarray(nrm) - np.asarray(ref_nrm).reshape(B, N, 3))
    assert np.quantile(nerr, 0.99) < 0.08, nerr.max()
    # nearest-dist row feeds the outlier mask
    d2 = np.sum(
        (np.asarray(pts)[:, :, None] - np.asarray(verts_p)[:, None]) ** 2, -1
    )
    np.testing.assert_allclose(
        np.asarray(dist), np.sqrt(np.minimum(d2.min(-1), 4.0)), atol=1e-4
    )


def test_fused_object_render_matches_xla_path():
    from hold_tpu.models.nodes import object_deform
    from hold_tpu.utils.transforms import inverse_mat3

    iplan, iparams, rplan, rparams = _nets(OBJ_SPECS, extra_in=32, seed=1)
    rng = np.random.RandomState(5)
    B, N = 2, 600
    pts = jnp.asarray(rng.randn(B, N, 3) * 0.3, jnp.float32)
    tfs = _rigid_tfs(rng, B, 1, rot_scale=0.8, t_scale=0.2)[:, 0]
    tc = jnp.asarray(rng.randn(B, 32) * 0.3, jnp.float32)

    x_c = object_deform(pts, tfs, inverse=True)
    Rinv = inverse_mat3(tfs[:, :3, :3])
    jinv9 = jnp.broadcast_to(Rinv.reshape(B, 1, 9), (B, N, 9))
    pe_pp = jnp.zeros((B * N, 8), jnp.float32)
    tc_pp = jnp.repeat(tc, N, axis=0)
    ref_sdf, ref_rgb, ref_nrm = _xla_shade(
        iparams, iplan, rparams, rplan, x_c.reshape(-1, 3),
        jinv9.reshape(-1, 9), feat_extra=tc_pp, pose_embed_pp=pe_pp,
    )

    tpack = pack_trunk_weights(iparams, iplan)
    tpack_t = pack_trunk_transposed(iparams, iplan)
    cpack = pack_color_weights(rparams, iparams)
    fb0 = frame_bias0(rparams, jnp.zeros((B, 8)), time_code=tc)
    plan_arr = embed_plan(iplan["multires"], None)
    tf12 = jnp.concatenate([Rinv.reshape(B, 9), tfs[:, :3, 3]], axis=-1)
    sdf, rgb, nrm, _, xc_out = fused_object_render(
        pts, tf12, plan_arr, tpack, tpack_t, cpack, fb0, interpret=True,
    )

    np.testing.assert_allclose(np.asarray(xc_out), np.asarray(x_c), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sdf), np.asarray(ref_sdf).reshape(B, N), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(rgb), np.asarray(ref_rgb).reshape(B, N, 3), atol=3e-2
    )
    nerr = np.abs(np.asarray(nrm) - np.asarray(ref_nrm).reshape(B, N, 3))
    assert np.quantile(nerr, 0.99) < 0.08, nerr.max()


def test_trunk_backward_matches_autodiff_f32():
    """The in-kernel reverse pass == jax.grad through the same f32 trunk.

    Runs the kernel's backward math in NumPy-free jnp (via interpret mode on
    a single tile) against autodiff; f32-tight when params are f32."""
    iplan, iparams, rplan, rparams = _nets(MANO_SPECS, seed=2)
    rng = np.random.RandomState(11)
    B, N = 1, 512
    x_c = jnp.asarray(rng.randn(B, N, 3) * 0.2, jnp.float32)

    def sdf_fn(p):
        h = apply_implicit_trunk(iparams, iplan, p, None)
        return implicit_sdf_from_trunk(iparams, h).sum()

    g_ref = jax.grad(sdf_fn)(x_c.reshape(-1, 3))

    # identity "warp": drive the object kernel with an identity transform so
    # x_c passes through unchanged and jinv = I -> normal = normalize(g)
    tf12 = jnp.concatenate(
        [jnp.eye(3).reshape(1, 9), jnp.zeros((1, 3))], axis=-1
    )
    tpack = pack_trunk_weights(iparams, iplan)
    tpack_t = pack_trunk_transposed(iparams, iplan)
    cpack = pack_color_weights(rparams, iparams)
    fb0 = frame_bias0(rparams, jnp.zeros((1, 8)))
    plan_arr = embed_plan(iplan["multires"], None)
    _, _, nrm, _, _ = fused_object_render(
        x_c, tf12, plan_arr, tpack, tpack_t, cpack, fb0, interpret=True,
    )
    ref = g_ref / jnp.maximum(safe_norm(g_ref, keepdims=True), 1e-6)
    nerr = np.abs(np.asarray(nrm).reshape(-1, 3) - np.asarray(ref))
    assert np.quantile(nerr, 0.99) < 0.08, nerr.max()


def test_node_forward_integration_env_toggle(tmp_path, monkeypatch):
    """The nodes.py wiring: mano/object node forwards at training=False take
    the fused path under HOLD_FUSED_RENDER=interpret and match the XLA path
    (factors + sample_dict shapes) at bf16 tolerance."""
    import os

    from hold_tpu.data.synthetic import generate_sequence
    from hold_tpu.data.dataset import SequenceData
    from hold_tpu.models.holdnet import (
        build_scene, get_camera_rays, init_scene_params,
    )
    from hold_tpu.models.nodes import mano_node_forward, object_node_forward
    from hold_tpu.utils.config import load_config

    root = str(tmp_path)
    generate_sequence(os.path.join(root, "toy"), n_frames=3, img_hw=(48, 64))
    seq = SequenceData("toy", root, num_sample=8)
    cfg = load_config()
    opt = dict(cfg["model"])
    opt["scene_bounding_sphere"] = seq.scene_bounding_sphere
    scene = build_scene(opt, {"barf_s": 5, "barf_e": 50}, seq.scene_data())
    params = init_scene_params(jax.random.PRNGKey(0), scene, seq.scene_data())

    rng = np.random.RandomState(0)
    batch_np = seq.sample_tempo_batch(rng, batch_size=1, num_sample=8)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    B, P = batch["uv"].shape[:2]
    rd, cl = get_camera_rays(
        batch["uv"], batch["extrinsics"], batch["intrinsics"]
    )
    rd = rd.reshape(-1, 3)
    cl = jnp.broadcast_to(cl[:, None, :], (B, P, 3)).reshape(-1, 3)
    z_vals = jnp.broadcast_to(
        jnp.linspace(0.2, 2.2, 16)[None], (B * P, 16)
    )

    results = {}
    for tag, env in (
        ("xla", {"HOLD_NO_FUSED_RENDER": "1"}),
        ("fused", {"HOLD_FUSED_RENDER": "interpret"}),
    ):
        monkeypatch.delenv("HOLD_NO_FUSED_RENDER", raising=False)
        monkeypatch.delenv("HOLD_FUSED_RENDER", raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        fh, sdh = mano_node_forward(
            params["right"], scene.servers["right"], scene.plans["right"],
            batch, rd, cl, None, None, None, training=False, z_vals=z_vals,
        )
        fo, sdo = object_node_forward(
            params["object"], scene.servers["object"], scene.plans["object"],
            batch, rd, cl, None, None, None, training=False, z_vals=z_vals,
        )
        results[tag] = jax.device_get((fh, sdh, fo, sdo))

    for i, which in ((0, "hand"), (2, "object")):
        a, b = results["xla"][i], results["fused"][i]
        assert set(a) == set(b)
        for k in ("color", "density", "z_vals"):
            d = np.abs(a[k] - b[k])
            scale = max(np.abs(a[k]).mean(), 1.0)
            assert d.mean() < 2e-2 * scale, (which, k, d.mean(), scale)
    # sample_dict parity: canonical points identical up to kernel padding
    np.testing.assert_allclose(
        results["xla"][1]["canonical_pts"], results["fused"][1]["canonical_pts"],
        atol=1e-4,
    )
    np.testing.assert_allclose(
        results["xla"][3]["canonical_pts"], results["fused"][3]["canonical_pts"],
        atol=1e-4,
    )
