"""Fused training-shade kernel vs plain-jnp math: values AND gradients.

The custom-VJP op (ops/fused_shade.py) must match jax.grad of the identical
tile math run as ordinary XLA — including the second-order chain through
normals (loss -> rgb -> n -> dSDF/dx_c -> trunk Hessian).  Runs the Pallas
kernels in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hold_tpu.models.mlp import (
    init_implicit_net,
    init_rendering_net,
    implicit_net_shapes,
    rendering_net_shapes,
    resolve_weight_norm,
)
from hold_tpu.models.specs import MANO_SPECS
from hold_tpu.ops.fused_query import embed_plan, pack_trunk_weights
from hold_tpu.ops.fused_render import (
    frame_bias0,
    pack_color_weights,
    pack_trunk_transposed,
)
from hold_tpu.ops.fused_shade import _T, _shade_tile, fused_shade_train
from hold_tpu.utils.config import load_config


def _build_packs(key):
    cfg = load_config()
    opt = dict(cfg["model"])
    k1, k2 = jax.random.split(key)
    imp_plan = implicit_net_shapes(opt["implicit_network"], MANO_SPECS)
    rend_plan = rendering_net_shapes(opt["rendering_network"], MANO_SPECS)
    imp = resolve_weight_norm(
        init_implicit_net(k1, opt["implicit_network"], MANO_SPECS))
    rend = resolve_weight_norm(
        init_rendering_net(k2, opt["rendering_network"], MANO_SPECS))
    tw = pack_trunk_weights(imp, imp_plan)
    bw = pack_trunk_transposed(imp, imp_plan)
    cw = pack_color_weights(rend, imp)
    pe = jax.random.normal(jax.random.PRNGKey(5), (2, 8)) * 0.2
    fb0 = frame_bias0(rend, pe)
    plan_arr = embed_plan(imp_plan["multires"], None)
    return plan_arr, tw, bw, cw, fb0


def _reference(xc, jinv9, fb0, plan_arr, tw, bw, cw):
    """Plain-XLA evaluation of the same tile math (vmapped over frames)."""
    B, N = xc.shape[:2]

    def per_frame(xc_f, jinv_f, fb_f):
        sdf, rgb, nrm = _shade_tile(
            xc_f.T, jinv_f.T, fb_f[:, None], plan_arr, tw, bw, cw)
        return sdf[0], rgb.T, nrm.T

    return jax.vmap(per_frame)(xc, jinv9, fb0)


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    plan_arr, tw, bw, cw, fb0 = _build_packs(key)
    B, N = 2, _T  # one tile per frame keeps interpret mode fast
    kx, kj = jax.random.split(jax.random.PRNGKey(1))
    xc = jax.random.normal(kx, (B, N, 3)) * 0.1
    jinv9 = (
        jnp.broadcast_to(jnp.eye(3).reshape(9), (B, N, 9))
        + jax.random.normal(kj, (B, N, 9)) * 0.05
    )
    return plan_arr, tw, bw, cw, fb0, xc, jinv9


def test_forward_matches_reference(setup):
    plan_arr, tw, bw, cw, fb0, xc, jinv9 = setup
    sdf_k, rgb_k, nrm_k = fused_shade_train(
        xc, jinv9, fb0, plan_arr, tw, bw, cw, interpret=True)
    sdf_r, rgb_r, nrm_r = _reference(xc, jinv9, fb0, plan_arr, tw, bw, cw)
    # interpret mode and XLA round bf16 intermediates in different orders;
    # 1e-4 absolute covers the worst observed drift (2.6e-5)
    np.testing.assert_allclose(sdf_k, sdf_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(rgb_k, rgb_r, rtol=1e-4, atol=1e-4)
    # normals renormalize a bf16-noisy gradient — near-degenerate |g| points
    # amplify rounding into direction; bound the tail and the bulk separately
    np.testing.assert_allclose(nrm_k, nrm_r, rtol=5e-2, atol=5e-3)
    assert float(np.mean(np.abs(np.asarray(nrm_k) - np.asarray(nrm_r)))) < 1e-4


def test_gradients_match_reference(setup):
    plan_arr, tw, bw, cw, fb0, xc, jinv9 = setup

    def loss_kernel(xc, jinv9, fb0, tw, bw, cw):
        sdf, rgb, nrm = fused_shade_train(
            xc, jinv9, fb0, plan_arr, tw, bw, cw, interpret=True)
        return (jnp.sum(sdf**2) + jnp.sum(rgb * rgb)
                + jnp.sum(jnp.abs(nrm[..., 0])))

    def loss_ref(xc, jinv9, fb0, tw, bw, cw):
        sdf, rgb, nrm = _reference(xc, jinv9, fb0, plan_arr, tw, bw, cw)
        return (jnp.sum(sdf**2) + jnp.sum(rgb * rgb)
                + jnp.sum(jnp.abs(nrm[..., 0])))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5))(
        xc, jinv9, fb0, tw, bw, cw)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        xc, jinv9, fb0, tw, bw, cw)

    flat_k, _ = jax.tree_util.tree_flatten_with_path(gk)
    flat_r = jax.tree_util.tree_leaves(gr)
    assert len(flat_k) == len(flat_r)
    for (path, a), b in zip(flat_k, flat_r):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a, b, rtol=5e-3, atol=5e-3 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_padding_is_inert(setup):
    """A non-tile-multiple N must give the same outputs/grads as its exact
    prefix within a padded tile-multiple call."""
    plan_arr, tw, bw, cw, fb0, xc, jinv9 = setup
    N_small = _T // 2 + 3
    xc_s, jinv_s = xc[:, :N_small], jinv9[:, :N_small]

    def loss(xc, jinv9):
        sdf, rgb, nrm = fused_shade_train(
            xc, jinv9, fb0, plan_arr, tw, bw, cw, interpret=True)
        return jnp.sum(rgb) + jnp.sum(sdf) + jnp.sum(nrm)

    v1, g1 = jax.value_and_grad(loss, argnums=(0,))(xc_s, jinv_s)

    def loss_full(xc, jinv9):
        sdf, rgb, nrm = fused_shade_train(
            xc, jinv9, fb0, plan_arr, tw, bw, cw, interpret=True)
        return (jnp.sum(rgb[:, :N_small]) + jnp.sum(sdf[:, :N_small])
                + jnp.sum(nrm[:, :N_small]))

    v2, g2 = jax.value_and_grad(loss_full, argnums=(0,))(xc, jinv9)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    np.testing.assert_allclose(
        g1[0], g2[0][:, :N_small], rtol=1e-5, atol=1e-7)


def test_integration_grads_match_xla_path(monkeypatch, tmp_path):
    """Full holdnet train-step gradients: fused shade (interpret) vs the
    chunked XLA path, tiny scene. Pins the nodes.py wiring (pe/fb0 routing,
    jinv broadcast, pack gradients) — not just the kernel math."""
    import os

    from hold_tpu.data.dataset import SequenceData
    from hold_tpu.data.synthetic import generate_sequence
    from hold_tpu.models.holdnet import (
        build_scene, empty_object_mesh_state, init_scene_params,
        holdnet_forward, sample_all_z,
    )
    from hold_tpu.models.losses import compute_losses
    from hold_tpu.utils.config import load_config

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data")
    case = "graft_toy"
    if not os.path.exists(os.path.join(root, case, "build", "data.npy")):
        generate_sequence(os.path.join(root, case), n_frames=6,
                          img_hw=(96, 128))
    seq = SequenceData(case, root, num_sample=16)
    cfg = load_config()
    opt = dict(cfg["model"])
    opt["scene_bounding_sphere"] = seq.scene_bounding_sphere
    opt["ray_sampler"] = dict(
        opt["ray_sampler"], N_samples=8, N_samples_eval=16,
        N_samples_extra=8, max_total_iters=2, beta_iters=3,
    )
    scene = build_scene(opt, {"barf_s": 100, "barf_e": 1000},
                        seq.scene_data())
    params = init_scene_params(jax.random.PRNGKey(0), scene,
                               seq.scene_data())
    mesh_state = empty_object_mesh_state()

    rng = np.random.RandomState(0)
    batch_np = seq.sample_tempo_batch(rng, batch_size=1, num_sample=16)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(3)
    step = jnp.asarray(0)
    epoch = jnp.asarray(0)
    k1, k2 = jax.random.split(key)
    z = sample_all_z(params, scene, batch, k1, step, epoch, training=True)
    z = jax.tree_util.tree_map(jax.lax.stop_gradient, z)

    def loss_fn(p):
        out = holdnet_forward(
            p, scene, batch, mesh_state, k2, step, epoch, training=True,
            z_vals_dict=z,
        )
        return compute_losses(batch, out, scene.node_ids, step)["loss"]

    monkeypatch.setenv("HOLD_NO_FUSED_TRAIN", "1")
    loss_x, grads_x = jax.value_and_grad(loss_fn)(params)
    monkeypatch.delenv("HOLD_NO_FUSED_TRAIN")
    monkeypatch.setenv("HOLD_FUSED_TRAIN", "interpret")
    loss_f, grads_f = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_f), float(loss_x), rtol=2e-3)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(grads_x)
    flat_f = jax.tree_util.tree_leaves(grads_f)
    assert len(flat_x) == len(flat_f)
    for (path, a), b in zip(flat_x, flat_f):
        if "proposal" in jax.tree_util.keystr(path):
            # the proposal net distills toward sample_sdf, which is
            # bf16-path-dependent (fused vs XLA shade); its L1 sign-gradient
            # flips near zero, so these grads legitimately differ between
            # paths. Distillation itself is covered by test_proposal.py.
            continue
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(a).max(), 1e-6)
        # 5e-5 absolute floor + 4% of scale: the two paths round bf16
        # intermediates in different orders, so near-zero entries of
        # small-magnitude tensors (color biases at init, grads ~1e-5)
        # carry bf16 noise either way
        np.testing.assert_allclose(
            b, a, rtol=0.05, atol=0.04 * scale + 5e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
