"""Multi-restart scaled ICP alignment for the CD_icp / F_icp metrics.

The reference leans on open3d (FPFH RANSAC global registration +
point-to-point ICP with scaling, 600 restarts — code/src/utils/icp.py:113-199);
open3d isn't in this image, so this is a from-scratch scipy/numpy equivalent:
center both meshes, sample surface points, multi-restart over random initial
rotations, iterate (KD-tree correspondences -> scaled Umeyama update), keep
the restart with the best chamfer.  Same acceptance criterion (best CD wins),
same final metric computation.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from .metrics import chamfer_f_scores


def sample_surface(verts: np.ndarray, faces: np.ndarray, n: int,
                   rng: np.random.RandomState) -> np.ndarray:
    """Area-weighted uniform surface sampling."""
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    if area.sum() <= 0:
        idx = rng.randint(0, verts.shape[0], n)
        return verts[idx]
    fidx = rng.choice(faces.shape[0], n, p=area / area.sum())
    u = rng.rand(n, 1)
    v = rng.rand(n, 1)
    flip = (u + v) > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    return (u * v0[fidx] + v * v1[fidx] + (1 - u - v) * v2[fidx]).astype(
        np.float64
    )


def umeyama(src: np.ndarray, dst: np.ndarray, with_scaling: bool = True):
    """Least-squares similarity transform src -> dst (s, R, t)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    sc, dc = src - mu_s, dst - mu_d
    cov = dc.T @ sc / src.shape[0]
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scaling:
        var_s = (sc**2).sum() / src.shape[0]
        s = np.trace(np.diag(D) @ S) / max(var_s, 1e-12)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def icp_once(src: np.ndarray, tgt_tree: cKDTree, tgt: np.ndarray,
             init_R: np.ndarray, max_iters: int = 30,
             dist_threshold: float = 0.01, with_scaling: bool = True):
    """One ICP run from an initial rotation; returns (s, R, t) composite."""
    s_tot, R_tot, t_tot = 1.0, init_R.copy(), np.zeros(3)
    cur = src @ init_R.T
    for _ in range(max_iters):
        d, idx = tgt_tree.query(cur)
        keep = d < dist_threshold
        if keep.sum() < 10:
            keep = np.argsort(d)[: max(int(0.5 * len(d)), 10)]
        s, R, t = umeyama(cur[keep], tgt[idx[keep]], with_scaling)
        cur = s * cur @ R.T + t
        # compose
        R_tot = R @ R_tot
        s_tot = s * s_tot
        t_tot = s * R @ t_tot + t
        if abs(s - 1) < 1e-6 and np.abs(R - np.eye(3)).max() < 1e-6 and \
           np.linalg.norm(t) < 1e-8:
            break
    return s_tot, R_tot, t_tot


def random_rotation(rng: np.random.RandomState) -> np.ndarray:
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def compute_icp_metrics(
    tgt_verts: np.ndarray, tgt_faces: np.ndarray,
    src_verts: np.ndarray, src_faces: np.ndarray,
    num_iters: int = 600, n_sample: int = 1000, seed: int = 0,
):
    """Best (cd cm^2, f5, f10 in [0,1]-scale fractions x100 handled by caller)
    over ICP restarts — role parity with icp.py:compute_icp_metrics.

    Returns (best_cd, best_f5, best_f10) where f* are FRACTIONS in [0,1]
    (the reference multiplies by 100 at the call site, eval_modules.py:70-71).
    """
    rng = np.random.RandomState(seed)
    src_verts = np.asarray(src_verts, np.float64)
    tgt_verts = np.asarray(tgt_verts, np.float64)
    src_c = src_verts - src_verts.mean(0)
    tgt_c = tgt_verts - tgt_verts.mean(0)

    src_pts = sample_surface(src_c, src_faces, n_sample, rng)
    tgt_pts = sample_surface(tgt_c, tgt_faces, n_sample, rng)
    tree = cKDTree(tgt_pts)

    def metrics_for(s, R, t):
        aligned = s * src_c @ R.T + t
        cd, f5, f10 = chamfer_f_scores(aligned, tgt_c)
        return cd, f5 / 100.0, f10 / 100.0

    # identity init first (refine_registration with trans_init=I)
    s, R, t = icp_once(src_pts, tree, tgt_pts, np.eye(3))
    best = metrics_for(s, R, t)

    for _ in range(num_iters):
        R0 = random_rotation(rng)
        s, R, t = icp_once(src_pts, tree, tgt_pts, R0)
        m = metrics_for(s, R, t)
        if m[0] < best[0]:
            best = m
    return best
