import jax.numpy as jnp
import numpy as np

from hold_tpu.generator.align import AlignmentProblem, project
from hold_tpu.generator.register_mano import (
    fit_mano_to_verts,
    mark_outliers,
    slerp_infill,
)
from hold_tpu.mano.lbs import lbs_forward, mano_full_pose
from hold_tpu.mano.server import build_mano_server


def _gt_hand_sequence(F=3, seed=0):
    rng = np.random.RandomState(seed)
    srv = build_mano_server(True, np.zeros(10))
    poses = np.zeros((F, 48), np.float32)
    poses[:, 0] = 0.3 * rng.randn(F)
    transl = np.array([[0.02, 0.01, 0.0]] * F, np.float32)
    full = mano_full_pose(srv.consts, jnp.asarray(poses[:, :3]),
                          jnp.asarray(poses[:, 3:]))
    out = lbs_forward(srv.consts, jnp.zeros((F, 10)), full)
    verts = np.asarray(out.vertices) + transl[:, None]
    joints = np.asarray(out.joints) + transl[:, None]
    return srv, poses, transl, verts, joints


def test_register_mano_recovers_pose():
    srv, poses, transl, verts, _ = _gt_hand_sequence()
    fit = fit_mano_to_verts(verts, True, coarse_iters=150, fine_iters=150,
                            lr=2e-2)
    # vertex error after fitting should be millimetric
    assert fit["vert_err"].mean() < 0.01, fit["vert_err"]
    np.testing.assert_allclose(fit["transl"], transl, atol=0.02)


def test_outliers_and_slerp_infill():
    err = np.array([0.001, 0.001, 0.5, 0.001, 0.001])
    bad = mark_outliers(err)
    assert bad[2] and not bad[0]
    poses = np.zeros((5, 48), np.float32)
    poses[:, 0] = [0.0, 0.1, 99.0, 0.3, 0.4]  # frame 2 garbage
    transl = np.tile(np.arange(5)[:, None], (1, 3)).astype(np.float32)
    transl[2] = 99.0
    p2, t2 = slerp_infill(poses, transl, bad)
    np.testing.assert_allclose(t2[2], [2.0, 2.0, 2.0], atol=1e-5)
    assert abs(p2[2, 0] - 0.2) < 0.02  # interpolated between 0.1 and 0.3


def test_alignment_recovers_hand_translation():
    srv, poses, transl_gt, verts, joints = _gt_hand_sequence()
    K = np.array([[500.0, 0, 160], [0, 500.0, 120], [0, 0, 1]])
    # targets: projected GT joints with the hand pushed forward so z > 0
    offset = np.array([0.0, 0.0, 0.5], np.float32)
    j2d = np.asarray(project(jnp.asarray(K, jnp.float32),
                             jnp.asarray(joints + offset)))

    prob = AlignmentProblem({"right": j2d}, None, None, K, hands=("right",))
    init = prob.init_params(3)
    # give the right articulation but wrong translation
    init["right"]["pose"] = jnp.asarray(poses[:, 3:])
    init["right"]["global_orient"] = jnp.asarray(poses[:, :3])
    p = prob.fit(init, "h", iters=300, lr=2e-2)
    got = np.asarray(p["right"]["transl"])
    err0 = np.abs(np.asarray(init["right"]["transl"]) - (transl_gt + offset))
    err1 = np.abs(got - (transl_gt + offset))
    assert err1.max() < err0.max() * 0.3, (err0.max(), err1.max())


def test_generator_chain_to_training(tmp_path):
    """The L0->L1 contract as a chain (docs/data_doc.md:30-92 role): noisy v3d
    hand predictions -> register_mano -> align (h/o/ho) -> build_dataset ->
    a build/ dir that SequenceData loads and run_training optimizes."""
    import cv2

    from hold_tpu.data.dataset import SequenceData
    from hold_tpu.generator.build_dataset import (
        build_from_arrays,
        entities_from_fits,
    )
    from hold_tpu.utils.config import Cfg, load_config

    F = 4
    rng = np.random.RandomState(0)

    # --- stage 0: fabricate noisy per-frame v3d hand predictions ----------
    srv, poses_gt, transl_gt, verts_gt, joints_gt = _gt_hand_sequence(F=F)
    noisy_verts = verts_gt + 0.002 * rng.randn(*verts_gt.shape).astype(np.float32)

    # --- stage 1: MANO registration + outlier infill -----------------------
    fit = fit_mano_to_verts(noisy_verts, True, coarse_iters=60,
                            fine_iters=60, lr=3e-2)
    assert fit["vert_err"].mean() < 0.03
    bad = mark_outliers(fit["vert_err"])
    poses48 = np.asarray(fit["poses"])  # (F, 48): global orient ‖ hand pose
    poses48, transl = slerp_infill(poses48, np.asarray(fit["transl"]), bad)

    # --- stage 2: hand-object alignment in front of a camera ---------------
    K = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]], np.float32)
    offset = np.array([0.0, 0.0, 0.6], np.float32)
    j2d = np.asarray(project(jnp.asarray(K), jnp.asarray(joints_gt + offset)))
    pts_cano = (0.03 * rng.randn(40, 3)).astype(np.float32)
    prob = AlignmentProblem({"right": j2d}, None, pts_cano, K, hands=("right",))
    init = prob.init_params(F)
    init["right"]["global_orient"] = jnp.asarray(poses48[:, :3])
    init["right"]["pose"] = jnp.asarray(poses48[:, 3:])
    init["right"]["betas"] = jnp.asarray(fit["betas"])
    p = prob.fit(init, "h", iters=120, lr=3e-2)
    p = prob.fit(p, "o", iters=60, lr=2e-2, scale_unlock_at=30)
    p = prob.fit(p, "ho", iters=30, lr=5e-3)
    hand_z = np.asarray(p["right"]["transl"])[:, 2]
    assert (hand_z > 0.3).all(), hand_z  # aligned in front of the camera

    # --- stage 3: build the training dataset -------------------------------
    img_dir = tmp_path / "frames"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir(); mask_dir.mkdir()
    aligned_verts = np.asarray(prob.hand_joints(p, "right"))
    obj_pts = np.asarray(prob.object_pts(p))
    img_paths, mask_paths = [], []
    for i in range(F):
        img = np.full((60, 80, 3), 60, np.uint8)
        mask = np.zeros((60, 80), np.uint8)
        for pts, code, col in [
            (aligned_verts[i], 150, (200, 120, 90)),
            (obj_pts[i], 50, (90, 200, 120)),
        ]:
            uv = np.asarray(project(jnp.asarray(K), jnp.asarray(pts)))
            for u, v in uv:
                cv2.circle(mask, (int(u), int(v)), 7, int(code), -1)
                cv2.circle(img, (int(u), int(v)), 7, col, -1)
        ip, mp = str(img_dir / f"{i:04d}.png"), str(mask_dir / f"{i:04d}.png")
        cv2.imwrite(ip, img); cv2.imwrite(mp, mask)
        img_paths.append(ip); mask_paths.append(mp)

    w2c = np.tile(np.eye(4, dtype=np.float64), (F, 1, 1))
    w2c[:, 2, 3] = 0.1  # nonzero camera radius for the normalization
    obj6 = np.concatenate(
        [np.asarray(p["object"]["global_orient"]),
         np.asarray(p["object"]["transl"])], axis=-1).astype(np.float32)
    entities = entities_from_fits(
        {"right": {"poses": poses48, "betas": np.asarray(fit["betas"]),
                   "transl": np.asarray(p["right"]["transl"])}},
        obj6, pts_cano, float(np.exp(p["obj_scale_log"])),
    )
    build_from_arrays(str(tmp_path / "chainseq"), img_paths, mask_paths,
                      K, w2c, entities)

    # --- stage 4: the produced build/ dir actually trains -------------------
    from hold_tpu.train import run_training

    seq = SequenceData("chainseq", str(tmp_path), num_sample=8)
    assert seq.n_frames == F
    import tempfile

    args = Cfg({
        "case": "chainseq", "lr": 2e-3, "freeze_pose": False,
        "fast_dev_run": True, "num_sample": 16, "tempo_len": F, "offset": 1,
        "log_every": 1, "num_epoch": 1, "no_meshing": True, "mute": True,
        "exp_key": "chain0000", "barf_s": 5, "barf_e": 50,
        "eval_every_epoch": 100, "load_ckpt": "", "load_pose": "",
        "total_step": 60, "log_root": tempfile.mkdtemp(), "seed": 0,
        "no_vis": True,
    })
    cfg = load_config()
    cfg["model"]["ray_sampler"].update(
        N_samples=8, N_samples_eval=16, N_samples_extra=4,
        max_total_iters=2, beta_iters=3,
    )
    params, scene, mesh_state, tracker = run_training(
        args, cfg, seq=seq, max_steps=60
    )
    import json
    import os

    lines = [json.loads(l) for l in
             open(os.path.join(tracker.log_dir, "metrics.jsonl"))]
    losses = [l["loss"] for l in lines if "loss" in l]
    assert len(losses) >= 40
    assert all(np.isfinite(x) for x in losses)
    # smoothed decrease: single-step losses are noisy at this tiny scale
    first, last = np.mean(losses[:10]), np.mean(losses[-10:])
    assert last < first, (first, last)


def test_build_dataset_roundtrip(tmp_path):
    import cv2

    from hold_tpu.data.dataset import SequenceData
    from hold_tpu.generator.build_dataset import (
        build_from_arrays,
        entities_from_fits,
    )

    F = 3
    img_dir = tmp_path / "frames"
    img_dir.mkdir()
    paths = []
    for i in range(F):
        p = str(img_dir / f"{i:04d}.png")
        cv2.imwrite(p, np.full((60, 80, 3), 100, np.uint8))
        paths.append(p)

    K = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]])
    w2c = np.tile(np.eye(4, dtype=np.float64), (F, 1, 1))
    w2c[:, 2, 3] = 0.5
    fits = {
        "right": {
            "poses": np.zeros((F, 48), np.float32),
            "betas": np.zeros(10, np.float32),
            "transl": np.zeros((F, 3), np.float32),
        }
    }
    entities = entities_from_fits(
        fits, np.zeros((F, 6), np.float32),
        np.random.RandomState(0).randn(50, 3).astype(np.float32), 0.1,
    )
    build = build_from_arrays(
        str(tmp_path / "seq"), paths, None, K, w2c, entities
    )
    seq = SequenceData("seq", str(tmp_path))
    assert seq.n_frames == F
    # decomposed intrinsics match (scale_mat only rescales extrinsics)
    np.testing.assert_allclose(seq.intrinsics_all[0][:3, :3], K, atol=1e-3)
    # camera centers inside the bounding sphere after normalization
    centers = np.stack([e[:3, 3] for e in seq.extrinsics_all])
    assert np.linalg.norm(centers, axis=1).max() <= seq.scene_bounding_sphere
