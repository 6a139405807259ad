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
