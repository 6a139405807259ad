"""Two-hand (ARCTIC-style) scene: right + left + object composition."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hold_tpu.data.dataset import SequenceData
from hold_tpu.data.synthetic import generate_sequence
from hold_tpu.models.holdnet import (
    build_scene,
    empty_object_mesh_state,
    holdnet_forward,
    init_scene_params,
)
from hold_tpu.models.losses import compute_losses
from hold_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def two_hand_seq(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data2h"))
    generate_sequence(
        os.path.join(root, "toy2h"), n_frames=4, img_hw=(72, 96), two_hands=True
    )
    return SequenceData("toy2h", root, num_sample=8)


def test_two_hand_scene_forward_and_grads(two_hand_seq):
    seq = two_hand_seq
    cfg = load_config()
    opt = dict(cfg["model"])
    opt["scene_bounding_sphere"] = seq.scene_bounding_sphere
    opt["ray_sampler"] = dict(
        opt["ray_sampler"], N_samples=8, N_samples_eval=16, N_samples_extra=4,
        max_total_iters=2, beta_iters=3,
    )
    scene = build_scene(opt, {"barf_s": 5, "barf_e": 50}, seq.scene_data())
    assert scene.node_ids == ("right", "left", "object")

    params = init_scene_params(jax.random.PRNGKey(0), scene, seq.scene_data())
    mesh_state = empty_object_mesh_state()
    rng = np.random.RandomState(0)
    batch = {
        k: jnp.asarray(v)
        for k, v in seq.sample_tempo_batch(rng, 1, num_sample=8).items()
    }

    def loss_fn(p):
        out = holdnet_forward(
            p, scene, batch, mesh_state, jax.random.PRNGKey(1),
            jnp.asarray(250), jnp.asarray(0), training=True,
        )
        return compute_losses(batch, out, scene.node_ids, jnp.asarray(250))["loss"]

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    for nid in ("right", "left", "object"):
        g = float(jnp.linalg.norm(grads[nid]["tables"]["transl"]))
        assert np.isfinite(g)
    # left hand must have its own independent field parameters
    a = np.asarray(params["right"]["implicit"]["layers"][0]["v"])
    b = np.asarray(params["left"]["implicit"]["layers"][0]["v"])
    assert not np.allclose(a, b)


def test_two_hand_mask_ids(two_hand_seq):
    rng = np.random.RandomState(0)
    batch = two_hand_seq.sample_tempo_batch(rng, 1, num_sample=32)
    vals = set(np.round(batch["gt_mask"]).astype(int).tolist())
    # right (150) and left (250) regions both present in sampled pixels
    assert any(100 <= v < 200 for v in vals)
    assert any(v >= 200 for v in vals)
