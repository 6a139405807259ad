import numpy as np

from hold_tpu.eval.arctic import (
    EXTRACTION_KEYS,
    evaluate_arctic,
    extract_preds,
)
from hold_tpu.eval.gt_arctic import arctic_object_forward


def _fake_pred_gt(F=3, seed=0):
    rng = np.random.RandomState(seed)
    pred = {
        "full_seq_name": "s01_box_grab_01",
        "fnames": [f"{i:04d}.png" for i in range(F)],
        "faces": {
            "right": rng.randint(0, 50, (80, 3)),
            "left": rng.randint(0, 50, (80, 3)),
            "object": rng.randint(0, 50, (60, 3)),
        },
    }
    for side in ("right", "left"):
        j = rng.randn(F, 21, 3) * 0.1
        pred[f"j3d_c.{side}"] = j
        pred[f"j3d_ra.{side}"] = j - j[:, :1]
        pred[f"root.{side}"] = j[:, 0]
        pred[f"v3d_c.{side}"] = rng.randn(F, 778, 3).astype(np.float32) * 0.1
    v_o = rng.randn(F, 50, 3) * 0.05
    pred["v3d_c.object"] = v_o
    pred["root.object"] = v_o.mean(1)
    pred["v3d_ra.object"] = v_o - pred["root.object"][:, None]
    for side in ("right", "left"):
        pred[f"v3d_{side}.object"] = v_o - pred[f"root.{side}"][:, None]
    gt = {k: (v.copy() if isinstance(v, np.ndarray) else v)
          for k, v in pred.items()}
    gt["is_valid"] = np.ones(F, np.float32)
    # perturb predictions by 2mm
    for k in list(pred.keys()):
        if isinstance(pred[k], np.ndarray) and pred[k].dtype.kind == "f":
            pred[k] = pred[k] + 0.002
    pred["verts.right"] = rng.randn(F, 778, 3).astype(np.float32)
    pred["verts.object"] = v_o
    pred["v_posed.left"] = rng.randn(F, 778, 3).astype(np.float32)
    return pred, gt


def test_arctic_object_articulation():
    top = np.array([[1.0, 0, 0], [0, 1, 0]])
    bottom = np.array([[0, 0, 1.0]])
    arti = np.array([0.0, np.pi / 2])
    out = arctic_object_forward(
        top, bottom, arti, np.zeros((2, 3)), np.zeros((2, 3))
    )
    # frame 0: no articulation
    np.testing.assert_allclose(out[0, 0], [1, 0, 0], atol=1e-6)
    # frame 1: top rotated by -90deg about z -> (1,0,0) -> (0,-1,0)
    np.testing.assert_allclose(out[1, 0], [0, -1, 0], atol=1e-6)
    # bottom part static
    np.testing.assert_allclose(out[1, 2], [0, 0, 1], atol=1e-6)


def test_extract_and_evaluate(tmp_path):
    pred, gt = _fake_pred_gt()
    zip_p = extract_preds(pred, str(tmp_path))
    import zipfile

    with zipfile.ZipFile(zip_p) as z:
        names = z.namelist()
    assert any(n.endswith(".npy") for n in names)
    packed = np.load(
        str(tmp_path / "s01_box_grab_01.npy"), allow_pickle=True
    ).item()
    # 16-bit packing + key filter
    assert packed["v3d_c.right"].dtype == np.float16
    assert set(packed.keys()) <= set(EXTRACTION_KEYS)

    metrics = evaluate_arctic(pred, gt, str(tmp_path), icp_iters=5)
    # uniform offsets cancel in root-relative metrics
    assert metrics["mpjpe_ra_r"] < 1e-3
    assert metrics["mpjpe_ra_h"] < 1e-3
    # uniform (2,2,2)mm shift => NN distance 0.2*sqrt(3) cm both ways,
    # cd = 2*d^2 cm^2, ARCTIC reports sqrt => 0.49 cm
    np.testing.assert_allclose(metrics["cd_h"], 0.4899, atol=1e-3)
    assert (tmp_path / "s01_box_grab_01.metric.json").exists()
