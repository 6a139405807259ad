"""Checkpoint save/restore (orbax, with the reference's ckpt-folder layout).

Layout parity: ``<log_dir>/checkpoints/last`` plus step-tagged folders, and a
``misc/<step>.npy`` sidecar consumed by downstream tools (pose refinement,
evaluation, viewer) — mirroring code/train.py:18-25 + hold.py:57-77.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.StandardCheckpointer()


def save_checkpoint(log_dir: str, step: int, state: dict, keep_last: bool = True):
    root = os.path.abspath(os.path.join(log_dir, "checkpoints"))
    os.makedirs(root, exist_ok=True)
    c = _ckptr()
    path = os.path.join(root, f"step_{step:09d}")
    c.save(path, state, force=True)
    c.wait_until_finished()
    if keep_last:
        last = os.path.join(root, "last")
        tmp = last + ".tmp"
        if os.path.islink(tmp) or os.path.exists(tmp):
            os.remove(tmp)
        os.symlink(os.path.basename(path), tmp)
        os.replace(tmp, last)
    return path


def _merge_into_template(tmpl, restored):
    """Fill `tmpl` from `restored` where keys exist; keep template values
    (fresh inits) for keys the checkpoint predates — lets older checkpoints
    restore into a grown params tree (e.g. the r5 sampler proposal nets)."""
    if isinstance(tmpl, dict) and isinstance(restored, dict):
        return {
            k: _merge_into_template(v, restored[k]) if k in restored else v
            for k, v in tmpl.items()
        }
    if isinstance(tmpl, list) and isinstance(restored, list):
        return [
            _merge_into_template(t, r) for t, r in zip(tmpl, restored)
        ] + list(tmpl[len(restored):])
    return restored if restored is not None else tmpl


def load_checkpoint(path: str, template: dict) -> dict:
    """Restore `template`'s entries from a checkpoint; tolerates checkpoints
    that carry extra top-level entries (e.g. optimizer state) the caller
    didn't ask for, and checkpoints MISSING subtrees the template has (new
    param groups added after the checkpoint was written keep their template
    init)."""
    path = os.path.abspath(path)
    if os.path.islink(path):
        path = os.path.join(os.path.dirname(path), os.readlink(path))
    c = _ckptr()
    try:
        return c.restore(path, template)
    except ValueError:
        # structure mismatch (extra top-level entries, or the checkpoint
        # predates newly-added subtrees): restore raw, merge by key
        full = c.restore(path)
        return {
            k: _merge_into_template(template[k], full.get(k))
            for k in template
        }


def latest_checkpoint(log_dir: str) -> str | None:
    root = os.path.join(log_dir, "checkpoints")
    last = os.path.join(root, "last")
    if os.path.exists(last):
        return last
    if not os.path.isdir(root):
        return None
    steps = sorted(d for d in os.listdir(root) if d.startswith("step_"))
    return os.path.join(root, steps[-1]) if steps else None


def load_params_subset(path: str, params: dict, predicate) -> dict:
    """Restore only entries whose key-path satisfies ``predicate`` —
    functional analog of the reference's filtered state_dict loads
    (--load_pose / --shape_init, code/train.py:60-74, hold_net.py:136-152)."""
    restored = load_checkpoint(path, {"params": params, "step": 0})["params"]

    def merge(cur, new, path_):
        if isinstance(cur, dict):
            return {
                k: merge(cur[k], new[k], path_ + (k,)) for k in cur
            }
        if isinstance(cur, list):
            return [
                merge(c, n, path_ + (i,)) for i, (c, n) in enumerate(zip(cur, new))
            ]
        return new if predicate(path_) else cur

    return merge(params, restored, ())


def save_misc(log_dir: str, step: int, misc: dict) -> str:
    out_p = os.path.join(log_dir, "misc", f"{step:09d}.npy")
    os.makedirs(os.path.dirname(out_p), exist_ok=True)
    np.save(out_p, misc)
    return out_p


def to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)
