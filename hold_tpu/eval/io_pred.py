"""Prediction IO: checkpoint -> per-frame meshes/joints in evaluation space.

Functional port of code/src/utils/io/ours.py: rebuild the MANO/object servers
from a trained experiment, run them over every frame's pose table entries, and
map deform-space outputs to the evaluation camera space (y/z axis flip,
inverse scene scale, normalize_shift with negated x — io/ours.py:15-29).
"""

from __future__ import annotations

import os
from glob import glob

import jax.numpy as jnp
import numpy as np

from ..data.dataset import SequenceData
from ..eval.metrics import bbox_centers
from ..mano.server import build_mano_server, mano_server_forward
from ..models.object_model import build_object_server, object_server_forward
from ..utils.checkpoint import latest_checkpoint, load_checkpoint
from ..utils.databus import DataBus

CONVERSION = np.diag([1.0, -1.0, -1.0])


def map_deform2eval(verts: np.ndarray, inv_scale: float,
                    normalize_shift: np.ndarray) -> np.ndarray:
    shift = np.asarray(normalize_shift, np.float64).copy()
    shift[0] *= -1.0
    return np.asarray(verts, np.float64) @ CONVERSION * inv_scale + shift


def load_experiment(exp_dir: str, seq: SequenceData, ckpt: str | None = None):
    """Returns (params, misc) for a checkpoint of an experiment.

    ckpt defaults to the newest checkpoint (reference evaluate.py consumes an
    explicit --sd_p/--ckpt_p state dict; passing `ckpt` matches that).  The
    misc sidecar (canonical meshes etc.) is chosen at-or-before the
    checkpoint's step so trajectory evaluations see the meshes that existed
    at that point in training."""
    if ckpt is None:
        ckpt = latest_checkpoint(exp_dir)
    assert ckpt, f"no checkpoint under {exp_dir}"
    # restore against a freshly-initialised template
    import jax

    from ..models.holdnet import build_scene, init_scene_params
    from ..utils.config import load_config

    cfg = load_config()
    opt = dict(cfg["model"])
    opt["scene_bounding_sphere"] = seq.scene_bounding_sphere
    scene = build_scene(opt, {}, seq.scene_data())
    template = init_scene_params(jax.random.PRNGKey(0), scene, seq.scene_data())
    state = load_checkpoint(ckpt, {"params": template, "step": 0})
    step = int(state.get("step", 0))
    misc_ps = sorted(glob(os.path.join(exp_dir, "misc", "*.npy")))
    # misc at-or-before the checkpoint step; latest otherwise
    eligible = [p for p in misc_ps
                if int(os.path.splitext(os.path.basename(p))[0]) <= step]
    pick = (eligible or misc_ps)[-1:] if misc_ps else []
    misc = np.load(pick[0], allow_pickle=True).item() if pick else {}
    return state["params"], misc, scene


def load_data(exp_dir: str, seq: SequenceData,
              ckpt: str | None = None) -> DataBus:
    """All-frame predictions in eval space (io/ours.py:load_data parity)."""
    params, misc, scene = load_experiment(exp_dir, seq, ckpt=ckpt)
    n = seq.n_frames
    scale = seq.scale
    inv_scale = 1.0 / scale
    normalize_shift = np.asarray(
        seq.data.get("normalize_shift", np.zeros(3)), np.float64
    )

    out = DataBus()
    frame_idx = jnp.arange(n)
    faces = {}
    for nid in scene.node_ids:
        tables = params[nid]["tables"]
        if nid in ("right", "left"):
            srv = scene.servers[nid]
            thetas = jnp.concatenate(
                [tables["global_orient"], tables["pose"]], axis=-1
            )
            betas = jnp.broadcast_to(tables["betas"], (n, 10))
            o = mano_server_forward(
                srv, jnp.full((n,), scale), tables["transl"], thetas, betas
            )
            out[f"verts.{nid}"] = np.asarray(o.verts)
            out[f"jnts.{nid}"] = np.asarray(o.jnts)
            faces[nid] = np.asarray(srv.consts.faces)
        else:
            # evaluation uses the marching-cubes canonical mesh as the object
            # template when available (io/ours.py:44,74-78)
            mesh_cano = misc.get("meshes_cano", {}).get("object")
            if mesh_cano is not None:
                srv = build_object_server(
                    mesh_cano["vertices"], float(np.asarray(params[nid]["obj_scale"])),
                    np.eye(4),
                )
                faces[nid] = np.asarray(mesh_cano["faces"])
            else:
                srv = scene.servers[nid]
                faces[nid] = np.zeros((0, 3), np.int64)
            o = object_server_forward(
                srv, jnp.full((n,), scale), tables["transl"],
                tables["global_orient"],
            )
            out[f"verts.{nid}"] = np.asarray(o.verts)

    for key in list(out.search("verts.").keys()):
        nid = key.split(".")[1]
        out[f"v3d_c.{nid}"] = np.stack(
            [map_deform2eval(v, inv_scale, normalize_shift) for v in out[key]]
        )
    for key in list(out.search("jnts.").keys()):
        nid = key.split(".")[1]
        out[f"j3d_c.{nid}"] = np.stack(
            [map_deform2eval(v, inv_scale, normalize_shift) for v in out[key]]
        )

    for key in list(out.search("j3d_c.").keys()):
        nid = key.split(".")[1]
        out[f"root.{nid}"] = out[key][:, 0]
        out[f"j3d_ra.{nid}"] = out[key] - out[key][:, :1]
    out["root.object"] = bbox_centers(out["v3d_c.object"])
    out["v3d_ra.object"] = (
        out["v3d_c.object"] - out["root.object"][:, None, :]
    )
    if "root.right" in out:
        out["v3d_right.object"] = (
            out["v3d_c.object"] - out["root.right"][:, None, :]
        )
    if "root.left" in out:
        out["v3d_left.object"] = (
            out["v3d_c.object"] - out["root.left"][:, None, :]
        )
    out["faces"] = faces
    out["full_seq_name"] = seq.case
    out["fnames"] = seq.img_paths
    return out


def gt_from_sequence(seq: SequenceData) -> DataBus:
    """Ground truth in eval space derived from the build parameters — exact
    for synthetic sequences (whose data.npy IS the GT); for real captures use
    the dataset-specific GT loaders (gt_ho3d / gt_arctic).

    Noised-init sequences (data/synthetic.py --pose_noise) keep the TRUE
    poses under ``entities_gt`` while ``entities`` carries the perturbed
    initialization; evaluation must use the truth."""
    entities = seq.data.get("entities_gt", seq.entities)
    n = seq.n_frames
    scale = seq.scale
    inv_scale = 1.0 / scale
    normalize_shift = np.asarray(
        seq.data.get("normalize_shift", np.zeros(3)), np.float64
    )

    out = DataBus()
    faces = {}
    for nid in ("right", "left"):
        if nid not in entities:
            continue
        e = entities[nid]
        srv = build_mano_server(nid == "right", e["mean_shape"])
        poses = jnp.asarray(e["hand_poses"])
        o = mano_server_forward(
            srv, jnp.full((n,), scale), jnp.asarray(e["hand_trans"]), poses,
            jnp.broadcast_to(jnp.asarray(e["mean_shape"])[None], (n, 10)),
        )
        out[f"v3d_c.{nid}"] = np.stack(
            [map_deform2eval(v, inv_scale, normalize_shift)
             for v in np.asarray(o.verts)]
        )
        out[f"j3d_c.{nid}"] = np.stack(
            [map_deform2eval(v, inv_scale, normalize_shift)
             for v in np.asarray(o.jnts)]
        )
        faces[nid] = np.asarray(srv.consts.faces)

    e = entities["object"]
    srv = build_object_server(e["pts.cano"], float(e["obj_scale"]), e["norm_mat"])
    o = object_server_forward(
        srv, jnp.full((n,), scale),
        jnp.asarray(e["object_poses"][:, 3:]),
        jnp.asarray(e["object_poses"][:, :3]),
    )
    out["v3d_c.object"] = np.stack(
        [map_deform2eval(v, inv_scale, normalize_shift)
         for v in np.asarray(o.verts)]
    )
    faces["object"] = e.get("faces", np.zeros((0, 3), np.int64))

    for key in list(out.search("j3d_c.").keys()):
        nid = key.split(".")[1]
        out[f"root.{nid}"] = out[key][:, 0]
        out[f"j3d_ra.{nid}"] = out[key] - out[key][:, :1]
    out["root.object"] = bbox_centers(out["v3d_c.object"])
    out["v3d_ra.object"] = out["v3d_c.object"] - out["root.object"][:, None, :]
    if "root.right" in out:
        out["v3d_right.object"] = (
            out["v3d_c.object"] - out["root.right"][:, None, :]
        )
    out["faces"] = faces
    out["is_valid"] = np.ones(n, np.float32)
    return out
