"""Noised-init synthetic sequences (data/synthetic.py --pose_noise).

Simulates the real pipeline's noisy initialization: images/masks rendered
from TRUE poses, `entities` perturbed (what training initializes from),
`entities_gt` carrying the truth (what evaluation measures against).
"""

import os

import numpy as np

from hold_tpu.data.synthetic import generate_sequence


def _load(build):
    return np.load(os.path.join(build, "data.npy"), allow_pickle=True).item()


def test_pose_noise_sequence(tmp_path):
    import cv2

    clean = generate_sequence(str(tmp_path / "clean"), n_frames=3,
                              img_hw=(48, 64), seed=3)
    noisy = generate_sequence(str(tmp_path / "noisy"), n_frames=3,
                              img_hw=(48, 64), seed=3, pose_noise=0.1)
    dc, dn = _load(clean), _load(noisy)

    # images are rendered from TRUE poses: identical across the two builds
    for i in range(3):
        a = cv2.imread(os.path.join(clean, "image", f"{i:04d}.png"))
        b = cv2.imread(os.path.join(noisy, "image", f"{i:04d}.png"))
        np.testing.assert_array_equal(a, b)

    # init poses are perturbed ...
    assert not np.allclose(dn["entities"]["right"]["hand_poses"],
                           dc["entities"]["right"]["hand_poses"])
    assert not np.allclose(dn["entities"]["object"]["object_poses"],
                           dc["entities"]["object"]["object_poses"])
    # ... by roughly the requested std on the rotation channels
    diff = (dn["entities"]["right"]["hand_poses"]
            - dc["entities"]["right"]["hand_poses"])
    assert 0.03 < np.std(diff) < 0.3

    # truth is preserved under entities_gt
    assert "entities_gt" not in dc
    gt = dn["entities_gt"]
    np.testing.assert_allclose(gt["right"]["hand_poses"],
                               dc["entities"]["right"]["hand_poses"])
    np.testing.assert_allclose(gt["object"]["object_poses"],
                               dc["entities"]["object"]["object_poses"])


def test_eval_gt_prefers_entities_gt(tmp_path):
    from hold_tpu.data.dataset import SequenceData
    from hold_tpu.eval.io_pred import gt_from_sequence

    generate_sequence(str(tmp_path / "noisy2"), n_frames=3,
                      img_hw=(48, 64), seed=1, pose_noise=0.15)
    generate_sequence(str(tmp_path / "clean2"), n_frames=3,
                      img_hw=(48, 64), seed=1)
    sn = SequenceData("noisy2", str(tmp_path))
    sc = SequenceData("clean2", str(tmp_path))
    gt_n = gt_from_sequence(sn)
    gt_c = gt_from_sequence(sc)
    # evaluation GT is identical to the clean build's — the noise never
    # leaks into the metric targets
    np.testing.assert_allclose(gt_n["j3d_ra.right"], gt_c["j3d_ra.right"],
                               atol=1e-6)
    np.testing.assert_allclose(gt_n["v3d_ra.object"], gt_c["v3d_ra.object"],
                               atol=1e-6)
