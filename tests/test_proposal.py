"""Sampler proposal net (FLOP diet): distillation + sampler integration.

The proposal is a small canonical-SDF surrogate that replaces the 8x256
trunk in the error-bound sampler's table-building queries (models/mlp.py
proposal section, models/nodes.py *_sample_z proposal_mode).  These tests
pin: (1) the surrogate can actually fit an SDF through its embedding, (2)
proposal-mode sampling produces valid z tables of the same shape/semantics,
(3) the distillation loss wires into the train step and trains ONLY the
proposal params.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hold_tpu.models.mlp import (
    apply_proposal_net,
    init_proposal_net,
    proposal_net_shapes,
)

PROP_OPT = {"width": 64, "depth": 3, "multires": 6}


def test_proposal_fits_sphere_sdf():
    plan = proposal_net_shapes(PROP_OPT)
    params = init_proposal_net(jax.random.PRNGKey(0), PROP_OPT)
    rs = np.random.RandomState(0)
    x = rs.uniform(-1, 1, (4096, 3)).astype(np.float32)
    y = np.linalg.norm(x, axis=-1) - 0.5

    import optax

    tx = optax.adam(1e-3)
    st = tx.init(params)

    @jax.jit
    def step(p, st, xb, yb):
        def loss(p):
            pred = apply_proposal_net(p, plan, xb, embedding="fourier")
            return jnp.mean(jnp.abs(pred - yb))

        l, g = jax.value_and_grad(loss)(p)
        up, st = tx.update(g, st)
        return optax.apply_updates(p, up), st, l

    xb, yb = jnp.asarray(x), jnp.asarray(y)
    l0 = None
    for i in range(300):
        params, st, l = step(params, st, xb, yb)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.25 * l0, (l0, float(l))
    assert float(l) < 0.02  # a few-mm surrogate is enough to rank samples


@pytest.fixture(scope="module")
def tiny_scene(tmp_path_factory):
    from hold_tpu.data.dataset import SequenceData
    from hold_tpu.data.synthetic import generate_sequence
    from hold_tpu.models.holdnet import build_scene, init_scene_params
    from hold_tpu.utils.config import load_config

    root = str(tmp_path_factory.mktemp("data"))
    generate_sequence(os.path.join(root, "toy"), n_frames=3, img_hw=(60, 80))
    seq = SequenceData("toy", root, num_sample=6)
    cfg = load_config()
    opt = dict(cfg["model"])
    opt["scene_bounding_sphere"] = seq.scene_bounding_sphere
    opt["ray_sampler"] = dict(
        opt["ray_sampler"], N_samples=8, N_samples_eval=16,
        N_samples_extra=4, max_total_iters=2, beta_iters=3,
    )
    scene = build_scene(opt, {"barf_s": 5, "barf_e": 50}, seq.scene_data())
    params = init_scene_params(jax.random.PRNGKey(0), scene, seq.scene_data())
    return seq, scene, params


def test_params_have_proposal_and_sampler_modes_agree_on_shape(tiny_scene):
    from hold_tpu.models.holdnet import sample_all_z

    seq, scene, params = tiny_scene
    for nid in scene.node_ids:
        assert "proposal" in params[nid], nid
        assert scene.plans[nid].proposal is not None

    rng = np.random.RandomState(0)
    batch_np = seq.sample_tempo_batch(rng, batch_size=2, num_sample=6)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(0)
    z_exact = sample_all_z(params, scene, batch, key, jnp.asarray(0),
                           jnp.asarray(0), proposal_mode=False)
    z_prop = sample_all_z(params, scene, batch, key, jnp.asarray(0),
                          jnp.asarray(0), proposal_mode=True)
    for nid in scene.node_ids:
        a, b = np.asarray(z_exact[nid]), np.asarray(z_prop[nid])
        assert a.shape == b.shape
        assert np.isfinite(a).all() and np.isfinite(b).all()
        # both are sorted z tables within [near, far]
        assert (np.diff(b, axis=-1) >= -1e-5).all()
        assert b.min() >= -1e-6


def test_distillation_trains_only_proposal(tiny_scene):
    import optax

    from hold_tpu.models.holdnet import holdnet_forward, sample_all_z
    from hold_tpu.models.holdnet import empty_object_mesh_state
    from hold_tpu.models.losses import compute_losses
    from hold_tpu.train import optimizer_for
    from hold_tpu.utils.config import Cfg

    seq, scene, params = tiny_scene
    mesh_state = empty_object_mesh_state()
    rng = np.random.RandomState(1)
    batch_np = seq.sample_tempo_batch(rng, batch_size=2, num_sample=6)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    key = jax.random.PRNGKey(1)

    tx = optimizer_for(Cfg({"lr": 1e-3, "freeze_pose": False}), params)
    opt_state = tx.init(params)

    def loss_fn(p):
        out = holdnet_forward(
            p, scene, batch, mesh_state, key, jnp.asarray(250),
            jnp.asarray(0), training=True,
            z_vals_dict=sample_all_z(p, scene, batch, key, jnp.asarray(250),
                                     jnp.asarray(0)),
        )
        losses = compute_losses(batch, out, scene.node_ids, jnp.asarray(250))
        return losses["loss"], losses

    (loss, aux), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(params)
    assert np.isfinite(float(loss))
    assert float(aux["loss/proposal"]) > 0.0

    # the proposal loss must flow to proposal params...
    for nid in scene.node_ids:
        gp = np.concatenate([
            np.asarray(l["w"]).ravel()
            for l in grads[nid]["proposal"]["layers"]
        ])
        assert np.abs(gp).max() > 0.0, f"no proposal grad for {nid}"
    # ...and an optimizer step must leave non-proposal params' update rule
    # untouched (proposal group exists and is non-frozen)
    updates, _ = tx.update(grads, opt_state, params)
    up = updates[scene.node_ids[0]]["proposal"]["layers"][0]["w"]
    assert np.abs(np.asarray(up)).max() > 0.0
