"""Full-image rendering: chunked inference over all pixels of a frame.

Covers the reference's inference path (split_input / merge_output chunking at
code/src/datasets/utils.py:309-341 + HOLD.inference_step chunk loop at
hold.py:169-208) with one fixed-shape jitted chunk executable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.holdnet import holdnet_forward


def make_chunk_renderer(scene, mesh_state, pixel_per_batch: int = 512,
                        mesh=None):
    """Returns render_chunk(params, batch_chunk, mesh_state=None) -> dict of
    (P, C) numpy.

    Two jitted stages (sampler / shading) for the same compiler-stability
    reason as the train step.  mesh_state is a traced argument so one
    compiled renderer serves a whole training run even as the object's
    canonical mesh is refreshed.

    Pass a device ``mesh`` to run each chunk SPMD over its pixel axis —
    GSPMD propagates the sharding through the sampler and shader so
    full-frame renders scale with devices (the train step's ray sharding,
    applied to inference)."""
    from ..models.holdnet import sample_all_z

    default_mesh_state = mesh_state

    sample_fn = jax.jit(
        lambda params, batch: sample_all_z(
            params, scene, batch, None, None, None, training=False
        )
    )

    @jax.jit
    def shade_fn(params, batch, z_vals, mesh_state):
        out = holdnet_forward(
            params, scene, batch, mesh_state, None, None, None,
            training=False, z_vals_dict=z_vals,
        )
        keep = {
            "rgb": out["rgb"],
            "instance_map": out["instance_map"],
            "bg_rgb_only": out["bg_rgb_only"],
            "normal": out["normal"],
            "depth": out["depth"],
            "mask_prob": out["mask_prob"],
            "fg_rgb_vis": out["fg_rgb_vis"],
        }
        for nid in scene.node_ids:
            keep[f"{nid}.fg_rgb_vis"] = out[f"{nid}.fg_rgb_vis"]
            keep[f"{nid}.mask_prob"] = out[f"{nid}.mask_prob"]
            keep[f"{nid}.normal"] = out[f"{nid}.normal"]
        return keep

    def chunk_fn(params, batch, mesh_state=None):
        if mesh is not None:
            from ..parallel.sharding import shard_render_chunk

            batch = shard_render_chunk(batch, mesh)
        z_vals = sample_fn(params, batch)
        ms = default_mesh_state if mesh_state is None else mesh_state
        return shade_fn(params, batch, z_vals, ms)

    return chunk_fn


def render_frame(
    params, scene, mesh_state, frame_batch: dict,
    pixel_per_batch: int = 512,
    chunk_fn=None,
    mesh=None,
) -> dict[str, np.ndarray]:
    """frame_batch from SequenceData.full_frame_batch; returns per-pixel maps
    reshaped to (H, W, C).

    Pass a prebuilt ``chunk_fn`` (make_chunk_renderer) when rendering many
    frames — otherwise each call builds fresh jit wrappers and pays a
    retrace.  With a device ``mesh``, chunks run SPMD over the pixel axis
    (params/mesh_state are committed replicated up front)."""
    if mesh is not None:
        from ..parallel.sharding import replicated

        assert pixel_per_batch % mesh.devices.size == 0, (
            f"pixel_per_batch {pixel_per_batch} must divide the "
            f"{mesh.devices.size}-device mesh"
        )
        params = jax.device_put(params, replicated(mesh))
        mesh_state = jax.device_put(mesh_state, replicated(mesh))
    if chunk_fn is None:
        chunk_fn = make_chunk_renderer(scene, mesh_state, pixel_per_batch,
                                       mesh=mesh)
    H, W = frame_batch["img_hw"]
    uv = frame_batch["uv"]  # (1, HW, 2)
    n_pix = uv.shape[1]
    pad = (-n_pix) % pixel_per_batch
    uv_p = np.concatenate(
        [uv, np.repeat(uv[:, -1:], pad, axis=1)], axis=1
    ) if pad else uv

    outs: dict[str, list] = {}
    base = {
        "frame_idx": jnp.asarray(frame_batch["frame_idx"]),
        "intrinsics": jnp.asarray(frame_batch["intrinsics"]),
        "extrinsics": jnp.asarray(frame_batch["extrinsics"]),
        "scene_scale": jnp.asarray(frame_batch["scene_scale"]),
    }
    for s in range(0, uv_p.shape[1], pixel_per_batch):
        batch = dict(base)
        batch["uv"] = jnp.asarray(uv_p[:, s:s + pixel_per_batch])
        res = chunk_fn(params, batch, mesh_state)
        for k, v in res.items():
            # keep chunk outputs on device: a per-chunk np.asarray would
            # force one synchronous device->host round-trip per chunk (the
            # tunneled TPU pays up to ~1 s each); one device_get at the end
            # lets all chunks dispatch asynchronously
            outs.setdefault(k, []).append(v)

    outs = jax.device_get(outs)
    result = {}
    for k, chunks in outs.items():
        flat = np.concatenate([np.asarray(c) for c in chunks], axis=0)[:n_pix]
        if flat.ndim == 1:
            result[k] = flat.reshape(H, W)
        else:
            result[k] = flat.reshape(H, W, -1)
    return result


def outputs_to_panel(res: dict, gt_rgb: np.ndarray | None = None) -> np.ndarray:
    """Side-by-side visualization panel (vis_utils.py:49-99 analog):
    [gt | rgb | fg_vis | normal | instance]."""
    H, W = res["rgb"].shape[:2]
    tiles = []
    if gt_rgb is not None:
        tiles.append(np.clip(gt_rgb.reshape(H, W, 3), 0, 1))
    tiles.append(np.clip(res["rgb"], 0, 1))
    tiles.append(np.clip(res["fg_rgb_vis"], 0, 1))
    tiles.append(np.clip(res["normal"] * 0.5 + 0.5, 0, 1))
    inst = res["instance_map"].astype(np.float32)
    inst_rgb = np.stack(
        [inst == 1, inst == 2, inst == 3], axis=-1
    ).astype(np.float32)
    tiles.append(inst_rgb)
    return np.concatenate(tiles, axis=1)
