"""The off-surface bound's fail-safe: when the object mesh can't decimate
under the fixed 8,192-vertex buffer, `object_mesh_state_from_mesh` falls back
to `empty_object_mesh_state()` (valid=0).  These tests pin that the fallback
(a) actually triggers with a warning instead of truncating the vertex set,
and (b) training with the invalid state stays finite and only disables the
object's sparseness/eikonal contributions — the photometric path is
untouched (models/holdnet.py:225-246, losses gated at models/losses.py:85-90).
"""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hold_tpu.data.synthetic import generate_sequence
from hold_tpu.data.dataset import SequenceData
from hold_tpu.models.holdnet import (
    build_scene,
    empty_object_mesh_state,
    init_scene_params,
    holdnet_forward,
    object_mesh_state_from_mesh,
    sample_all_z,
)
from hold_tpu.models.losses import compute_losses
from hold_tpu.utils.config import load_config


def _sphere_mesh(n_theta=40, n_phi=40):
    th = np.linspace(0.1, np.pi - 0.1, n_theta)
    ph = np.linspace(0, 2 * np.pi, n_phi, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    v = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                  np.cos(tt)], -1).reshape(-1, 3).astype(np.float32) * 0.1
    f = []
    for i in range(n_theta - 1):
        for j in range(n_phi):
            a = i * n_phi + j
            b = i * n_phi + (j + 1) % n_phi
            c = (i + 1) * n_phi + j
            d = (i + 1) * n_phi + (j + 1) % n_phi
            f += [[a, b, c], [b, d, c]]
    return v, np.asarray(f, np.int64)


def test_decimation_overflow_falls_back(monkeypatch, caplog):
    """If 8 decimation rounds can't fit 8,192 verts, the state must be the
    INVALID one (bound disabled) — never a truncated vertex table, which
    would loosen the off-surface bound and corrupt the sparse loss."""
    import hold_tpu.utils.mesh as UM  # holdnet imports it in-function

    # >8192 input verts so the decimation path actually runs
    v, f = _sphere_mesh(n_theta=100, n_phi=100)

    class _Stuck:
        vertices = np.random.RandomState(0).randn(9000, 3).astype(np.float32)
        faces = np.tile(np.arange(3), (100, 1)).astype(np.int64)

    monkeypatch.setattr(UM, "decimate_mesh", lambda *a, **k: _Stuck())
    with caplog.at_level(logging.WARNING, logger="hold_tpu"):
        state = object_mesh_state_from_mesh(v, f)
    assert float(state["valid"]) == 0.0
    assert "disabling the off-surface vertex bound" in caplog.text
    # the empty state's bound centers are FAR: nothing classifies on-surface
    assert float(np.min(np.asarray(state["bound_centers"]))) >= 1e4


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    generate_sequence(os.path.join(root, "toy"), n_frames=4, img_hw=(72, 96))
    seq = SequenceData("toy", root, num_sample=8)
    cfg = load_config()
    cfg["model"]["ray_sampler"].update(
        N_samples=8, N_samples_eval=16, N_samples_extra=4,
        max_total_iters=2, beta_iters=3,
    )
    opt = dict(cfg["model"])
    opt["scene_bounding_sphere"] = seq.scene_bounding_sphere
    scene = build_scene(opt, {"barf_s": 5, "barf_e": 50}, seq.scene_data())
    params = init_scene_params(jax.random.PRNGKey(0), scene, seq.scene_data())
    rng = np.random.RandomState(0)
    batch_np = seq.sample_tempo_batch(rng, batch_size=2, num_sample=8)
    batch = {k: jnp.asarray(x) for k, x in batch_np.items()}
    return scene, params, batch


def _losses_with(toy, mesh_state, step=1000):
    scene, params, batch = toy
    key = jax.random.PRNGKey(7)
    step = jnp.asarray(step)
    z = sample_all_z(params, scene, batch, key, step, jnp.asarray(5),
                     training=True)
    out = holdnet_forward(params, scene, batch, mesh_state, key, step,
                          jnp.asarray(5), training=True, z_vals_dict=z)
    return compute_losses(batch, out, scene.node_ids, step)


@pytest.mark.slow
def test_invalid_state_trains_finite_and_gates_only_sparse_terms(toy):
    scene, params, batch = toy
    v, f = _sphere_mesh()
    valid_state = object_mesh_state_from_mesh(v, f)
    assert float(valid_state["valid"]) == 1.0

    l_valid = _losses_with(toy, valid_state)
    l_empty = _losses_with(toy, empty_object_mesh_state())

    for l in (l_valid, l_empty):
        for k, x in l.items():
            assert np.isfinite(float(x)), (k, float(x))
    # photometric + semantic losses don't depend on the mesh state at all
    np.testing.assert_allclose(
        float(l_empty["loss/rgb"]), float(l_valid["loss/rgb"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(l_empty["loss/sem"]), float(l_valid["loss/sem"]), rtol=1e-6)
    # the object's sparse/eikonal contributions are gated off by valid=0:
    # the empty-state totals can only be <= the valid-state ones
    assert float(l_empty["loss/opacity_sparse"]) <= float(
        l_valid["loss/opacity_sparse"]) + 1e-9
    assert float(l_empty["loss/eikonal"]) <= float(
        l_valid["loss/eikonal"]) + 1e-9
