"""End-to-end: synthetic sequence -> train a few steps -> mesh -> render.

This is the CPU-sized analog of the reference's fast-dev-run smoke flow
(docs/usage.md:36-50), which was its only end-to-end check."""

import os

import jax
import numpy as np
import pytest

from hold_tpu.data.synthetic import generate_sequence
from hold_tpu.data.dataset import SequenceData
from hold_tpu.utils.config import Cfg, load_config


@pytest.fixture(scope="module")
def toy_seq(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    generate_sequence(os.path.join(root, "toy"), n_frames=4, img_hw=(72, 96))
    return SequenceData("toy", root, num_sample=8)


@pytest.fixture(scope="module")
def trained(toy_seq):
    from hold_tpu.train import run_training

    args = Cfg({
        "case": "toy", "lr": 1e-3, "freeze_pose": False, "fast_dev_run": True,
        "num_sample": 8, "tempo_len": 4, "offset": 1, "log_every": 1,
        "num_epoch": 1, "no_meshing": True, "mute": True, "exp_key": "e2etest00",
        "barf_s": 5, "barf_e": 50, "eval_every_epoch": 100, "load_ckpt": "",
        "load_pose": "", "total_step": 3, "log_root": None, "seed": 0,
    })
    import tempfile

    args.log_root = tempfile.mkdtemp()
    cfg = load_config()
    # extra-tiny sampler for CPU
    cfg["model"]["ray_sampler"].update(
        N_samples=8, N_samples_eval=16, N_samples_extra=4,
        max_total_iters=2, beta_iters=3,
    )
    params, scene, mesh_state, tracker = run_training(
        args, cfg, seq=toy_seq, max_steps=3
    )
    return params, scene, mesh_state, tracker


def test_training_runs_and_logs(trained):
    params, scene, mesh_state, tracker = trained
    metrics_file = os.path.join(tracker.log_dir, "metrics.jsonl")
    assert os.path.exists(metrics_file)
    import json

    lines = [json.loads(l) for l in open(metrics_file)]
    assert len(lines) >= 2
    assert all(np.isfinite(l["loss"]) for l in lines)
    ckpt = os.path.join(tracker.log_dir, "checkpoints", "last")
    assert os.path.exists(ckpt)


def test_checkpoint_roundtrip(trained):
    from hold_tpu.utils.checkpoint import load_checkpoint, to_host

    params, scene, mesh_state, tracker = trained
    ckpt = os.path.join(tracker.log_dir, "checkpoints", "last")
    state = load_checkpoint(ckpt, {"params": to_host(params), "step": 0})
    a = np.asarray(params["right"]["tables"]["transl"])
    b = np.asarray(state["params"]["right"]["tables"]["transl"])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_canonical_meshing(trained):
    from hold_tpu.meshing.cano import mesh_all_cano
    from hold_tpu.utils.checkpoint import to_host

    params, scene, mesh_state, tracker = trained
    meshes = mesh_all_cano(to_host(params), scene, res_scale=4)
    # geometric init => both SDFs start as spheres => meshes must exist
    assert "right" in meshes and "object" in meshes
    for m in meshes.values():
        assert m.vertices.shape[0] > 10
        assert np.isfinite(m.vertices).all()


def test_full_frame_render(trained, toy_seq):
    from hold_tpu.render.renderer import outputs_to_panel, render_frame

    params, scene, mesh_state, tracker = trained
    fb = toy_seq.full_frame_batch(0, downsample=6)
    res = render_frame(params, scene, mesh_state, fb, pixel_per_batch=128)
    H, W = fb["img_hw"]
    assert res["rgb"].shape == (H, W, 3)
    assert np.isfinite(res["rgb"]).all()
    assert res["instance_map"].shape == (H, W)
    panel = outputs_to_panel(res)
    assert panel.shape[0] == H and panel.shape[1] == W * 4


def test_full_frame_render_sharded(trained, toy_seq):
    """Mesh-sharded render must match the single-device render exactly —
    the pixel axis is data-parallel, so GSPMD may not change the math."""
    from hold_tpu.parallel.sharding import make_mesh
    from hold_tpu.render.renderer import render_frame

    params, scene, mesh_state, tracker = trained
    fb = toy_seq.full_frame_batch(0, downsample=6)
    res1 = render_frame(params, scene, mesh_state, fb, pixel_per_batch=128)
    mesh = make_mesh(0)
    res8 = render_frame(params, scene, mesh_state, fb, pixel_per_batch=128,
                        mesh=mesh)
    assert mesh.devices.size == 8
    np.testing.assert_allclose(res8["rgb"], res1["rgb"], atol=2e-5)
    np.testing.assert_allclose(res8["depth"], res1["depth"], atol=2e-4)


def test_dataset_weighted_sampling(toy_seq):
    rng = np.random.RandomState(0)
    batch = toy_seq.sample_tempo_batch(rng, batch_size=2, num_sample=16)
    assert batch["uv"].shape == (4, 16, 2)
    assert batch["gt_rgb"].shape == (64, 3)
    assert batch["gt_mask"].shape == (64,)
    # most samples should fall on fg entities (0.9 bbox bias)
    frac_fg = (batch["gt_mask"] > 25).mean()
    assert frac_fg > 0.4, frac_fg
    # uv within image bounds
    H, W = toy_seq.img_size
    assert batch["uv"][..., 0].max() <= W - 1
    assert batch["uv"][..., 1].max() <= H - 1
