"""Real-asset loading paths, exercised with fabricated real-FORMAT fixtures.

The licensed MANO pkls and the HO3D/ARCTIC archives cannot ship in this image,
so every accuracy number so far ran on the synthetic stand-ins.  These tests
prove the REAL loading paths work the day the assets appear: a MANO pkl in the
official on-disk format (chumpy-wrapped arrays, scipy-sparse J_regressor,
uint32 kintree_table with the 0xFFFFFFFF root), and an HO3D v3 sequence layout
(rgb/ + meta/*.pkl) driven through process_ho3d -> gt_ho3d.load_data.

Format references: code/src/model/mano/server.py:121-128 (pkl consumption via
smplx), scripts/process_ho3d.py:25-179 and code/src/utils/io/gt.py (HO3D).
"""

import os
import os.path as op
import pickle

import numpy as np
import pytest

from hold_tpu.mano.model_data import (
    NUM_JOINTS,
    NUM_VERTS,
    PARENTS,
    build_synthetic_mano,
    load_mano,
    load_mano_pkl,
)


class _Ch:
    """Chumpy-array stand-in: the official pkl wraps arrays in chumpy.Ch,
    whose payload is exposed as ``.r`` (model_data._np unwraps it)."""

    def __init__(self, a):
        self.r = np.asarray(a, np.float64)


def _write_official_format_pkl(path: str, is_rhand: bool = True) -> None:
    """Fabricate a pkl with the official MANO field names/dtypes/wrappers."""
    import scipy.sparse as sp

    m = build_synthetic_mano(is_rhand)  # sane geometry, exact topology
    kintree = np.zeros((2, NUM_JOINTS), np.uint32)
    kintree[0] = PARENTS.astype(np.int64).astype(np.uint32)  # root -> 0xFFFFFFFF
    kintree[1] = np.arange(NUM_JOINTS, dtype=np.uint32)
    data = {
        "v_template": _Ch(m.v_template),
        "shapedirs": _Ch(m.shapedirs),  # chumpy in the official pkl
        "posedirs": _Ch(m.posedirs.T.reshape(NUM_VERTS, 3, 135)),
        "J_regressor": sp.csc_matrix(m.J_regressor.astype(np.float64)),
        "weights": _Ch(m.lbs_weights),
        "hands_mean": np.asarray(m.hands_mean, np.float64),
        "kintree_table": kintree,
        "f": m.faces.astype(np.uint32),
        "bs_style": "lbs",
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)


def test_load_mano_pkl_official_format(tmp_path):
    p = str(tmp_path / "MANO_RIGHT.pkl")
    _write_official_format_pkl(p)
    m = load_mano_pkl(p, is_rhand=True)

    assert m.v_template.shape == (NUM_VERTS, 3)
    assert m.shapedirs.shape == (NUM_VERTS, 3, 10)
    assert m.posedirs.shape == (135, NUM_VERTS * 3)
    assert m.J_regressor.shape == (NUM_JOINTS, NUM_VERTS)
    assert m.lbs_weights.shape == (NUM_VERTS, NUM_JOINTS)
    assert m.faces.shape == (1538, 3)
    for a in (m.v_template, m.shapedirs, m.posedirs, m.J_regressor,
              m.lbs_weights, m.hands_mean):
        assert a.dtype == np.float32
    # uint32 0xFFFFFFFF root must come back as -1, not 4294967295 — an
    # un-pinned root silently corrupts the LBS kinematic chain
    assert m.parents[0] == -1
    np.testing.assert_array_equal(m.parents, PARENTS)
    assert not m.synthetic


def test_load_mano_search_order_env(tmp_path, monkeypatch):
    """$MANO_MODEL_DIR with real pkls wins over the synthetic fallback, and
    the loaded model drives the full MANO server + LBS forward."""
    _write_official_format_pkl(str(tmp_path / "MANO_RIGHT.pkl"), True)
    monkeypatch.setenv("MANO_MODEL_DIR", str(tmp_path))

    m = load_mano(is_rhand=True)
    assert not m.synthetic

    import jax.numpy as jnp

    from hold_tpu.mano.lbs import lbs_forward, mano_full_pose
    from hold_tpu.mano.server import build_mano_server, mano_server_forward

    srv = build_mano_server(True, np.zeros(10, np.float32))
    rng = np.random.RandomState(0)
    rot = jnp.asarray(rng.randn(2, 3) * 0.2, jnp.float32)
    pose = jnp.asarray(rng.randn(2, 45) * 0.1, jnp.float32)
    full = mano_full_pose(srv.consts, rot, pose)
    out = lbs_forward(srv.consts, jnp.tile(srv.betas[None], (2, 1)), full)
    assert out.vertices.shape == (2, NUM_VERTS, 3)
    assert np.isfinite(np.asarray(out.vertices)).all()
    assert np.isfinite(np.asarray(out.joints)).all()

    thetas = jnp.concatenate([rot, pose], axis=-1)
    fwd = mano_server_forward(
        srv, jnp.ones((2,)), jnp.zeros((2, 3)), thetas,
        jnp.tile(srv.betas[None], (2, 1)),
    )
    assert np.isfinite(np.asarray(fwd.verts)).all()

    # left hand falls back to synthetic (no MANO_LEFT.pkl in the dir)
    assert load_mano(is_rhand=False).synthetic


def _write_ho3d_sequence(root: str, n_frames: int = 4) -> str:
    """Fabricate an HO3D v3 sequence dir: rgb/NNNN.jpg + meta/NNNN.pkl,
    with frame 2 invalid (None annotations) like real dropped frames."""
    seq_dir = op.join(root, "ABF10")
    os.makedirs(op.join(seq_dir, "rgb"))
    os.makedirs(op.join(seq_dir, "meta"))
    rng = np.random.RandomState(1)
    K = np.array([[614.0, 0, 320.0], [0, 614.0, 240.0], [0, 0, 1]], np.float64)
    for i in range(n_frames):
        with open(op.join(seq_dir, "rgb", f"{i:04d}.jpg"), "wb") as f:
            f.write(b"\xff\xd8\xff\xd9")  # minimal jpeg markers; never decoded
        if i == 2:
            meta = {"handPose": None, "objTrans": None, "handBeta": None,
                    "objName": "021_bleach_cleanser"}
        else:
            meta = {
                "handPose": rng.randn(48) * 0.1,
                "handBeta": rng.randn(10) * 0.03,
                "handTrans": rng.randn(3) * 0.05 + [0, 0, -0.5],
                "objRot": rng.randn(3, 1) * 0.3,
                "objTrans": rng.randn(3) * 0.05 + [0, 0, -0.5],
                "camMat": K,
                "objName": "021_bleach_cleanser",
            }
        with open(op.join(seq_dir, "meta", f"{i:04d}.pkl"), "wb") as f:
            pickle.dump(meta, f)
    return seq_dir


def test_ho3d_process_to_gt_load_chain(tmp_path):
    """Raw HO3D layout -> process_sequence npz -> gt_ho3d.load_data eval bus,
    including corres.txt frame selection and the is_valid mask."""
    from hold_tpu.data.process_ho3d import process_sequence
    from hold_tpu.eval import gt_ho3d

    seq_dir = _write_ho3d_sequence(str(tmp_path))
    ho3d_root = str(tmp_path / "ho3d_assets")
    hands_mean = np.zeros(45, np.float32)
    npz_p = process_sequence(seq_dir, ho3d_root, "ABF10", hands_mean)

    d = np.load(npz_p, allow_pickle=True)
    assert d["hand_pose"].shape == (4, 48)
    assert d["is_valid"].tolist() == [1.0, 1.0, 0.0, 1.0]
    assert np.isfinite(d["hand_pose"]).all()  # invalid frame infilled
    assert str(d["obj_name"]) == "021_bleach_cleanser"

    # scanned object model in the YCB layout
    mdl_dir = op.join(ho3d_root, "models", "021_bleach_cleanser")
    os.makedirs(mdl_dir)
    with open(op.join(mdl_dir, "textured_simple.obj"), "w") as f:
        for v in [(-1, -1, -1), (1, -1, -1), (1, 1, -1), (-1, 1, -1),
                  (-1, -1, 1), (1, -1, 1), (1, 1, 1), (-1, 1, 1)]:
            f.write(f"v {0.05*v[0]} {0.05*v[1]} {0.05*v[2]}\n")
        for a, b, c in [(1, 2, 3), (1, 3, 4), (5, 7, 6), (5, 8, 7),
                        (1, 5, 6), (1, 6, 2), (2, 6, 7), (2, 7, 3),
                        (3, 7, 8), (3, 8, 4), (4, 8, 5), (4, 5, 1)]:
            f.write(f"f {a} {b} {c}\n")

    # build dir with corres.txt choosing frames 0,1,3 (skip the invalid one)
    data_root = str(tmp_path / "data")
    build = op.join(data_root, "hold_ABF10_ho3d", "build")
    os.makedirs(build)
    with open(op.join(build, "corres.txt"), "w") as f:
        for i in (0, 1, 3):
            f.write(f"rgb/{i:04d}.jpg\n")

    bus = gt_ho3d.load_data("hold_ABF10_ho3d", data_root=data_root,
                            ho3d_root=ho3d_root)
    assert bus["v3d_c.right"].shape == (3, NUM_VERTS, 3)
    assert bus["j3d_c.right"].shape[0] == 3
    assert bus["v3d_c.object"].shape == (3, 8, 3)
    assert bus["is_valid"].tolist() == [1.0, 1.0, 1.0]
    assert np.isfinite(bus["v3d_c.right"]).all()
    assert np.isfinite(bus["v3d_ra.object"]).all()
    assert bus["faces"]["object"].shape == (12, 3)
