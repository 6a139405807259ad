"""Python wrapper for the native MISE + marching-tetrahedra extractor.

Builds ``libmise.so`` on first use (g++ -O3), drives the query/update loop
with batched SDF evaluations on the accelerator, and reproduces the
coordinate mapping + largest-connected-component selection of the reference's
generate_mesh (code/src/utils/meshing.py:9-72).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..utils.mesh import Mesh

_LIB = None


def _build_lib() -> str:
    src_dir = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(src_dir, "csrc", "mise.cpp")
    out = os.path.join(src_dir, "csrc", "libmise.so")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out],
            check=True,
        )
    return out


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_lib())
        lib.mise_create.restype = ctypes.c_void_p
        lib.mise_create.argtypes = [ctypes.c_int32, ctypes.c_int32, ctypes.c_double]
        lib.mise_resolution.restype = ctypes.c_int64
        lib.mise_resolution.argtypes = [ctypes.c_void_p]
        lib.mise_query.restype = ctypes.c_int64
        lib.mise_query.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.mise_update.restype = ctypes.c_int32
        lib.mise_update.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        lib.mise_extract.restype = ctypes.c_int64
        lib.mise_extract.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mise_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def largest_component(verts: np.ndarray, faces: np.ndarray) -> Mesh:
    """Keep the connected component with the largest surface area
    (replaces trimesh.split at meshing.py:61-70). scipy sparse connected
    components — a pure-Python union-find took tens of seconds on the
    ~200k-vertex marching-tetrahedra meshes."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    n = verts.shape[0]
    rows = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    cols = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    adj = coo_matrix(
        (np.ones(rows.shape[0], np.int8), (rows, cols)), shape=(n, n)
    )
    _, roots = connected_components(adj, directed=False)

    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    comp_of_face = roots[faces[:, 0]]
    comps, inv = np.unique(comp_of_face, return_inverse=True)
    comp_area = np.bincount(inv, weights=area)
    best = comps[np.argmax(comp_area)]
    keep_f = comp_of_face == best
    faces_k = faces[keep_f]
    used = np.unique(faces_k)
    remap = np.full(n, -1, np.int64)
    remap[used] = np.arange(used.shape[0])
    return Mesh(verts[used].astype(np.float32), remap[faces_k])


def generate_mesh(
    sdf_fn,
    bbox_verts: np.ndarray,
    level_set: float = 0.0,
    res_init: int = 32,
    res_up: int = 3,
    point_batch: int = 10000,
    keep_largest: bool = True,
) -> Mesh | None:
    """Extract the level set of ``sdf_fn`` inside a padded bbox.

    sdf_fn: (N, 3) world points -> (N,) sdf values (numpy in/out; batch on
    the accelerator inside).  bbox_verts: any point set whose tight bbox
    bounds the surface (meshing.py:13-18 semantics: padded by 1.1, cubic
    scale = max extent).
    """
    lib = _lib()
    bbox_verts = np.asarray(bbox_verts, np.float64)
    gt_bbox = np.stack([bbox_verts.min(axis=0), bbox_verts.max(axis=0)])
    gt_center = 0.5 * (gt_bbox[0] + gt_bbox[1])
    gt_scale = (gt_bbox[1] - gt_bbox[0]).max()
    pad = 1.1

    h = lib.mise_create(res_init, res_up, float(level_set))
    try:
        res = lib.mise_resolution(h)

        def to_world(grid_pts):
            p = (grid_pts / res - 0.5) * pad
            return p * gt_scale + gt_center

        while True:
            n = lib.mise_query(h, None, 0)
            if n == 0:
                break
            coords = np.empty((n, 3), np.int64)
            lib.mise_query(
                h, coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n
            )
            pts = to_world(coords.astype(np.float64))
            vals = np.empty(n, np.float64)
            for s in range(0, n, point_batch):
                e = min(s + point_batch, n)
                vals[s:e] = np.asarray(
                    sdf_fn(pts[s:e].astype(np.float32))
                ).reshape(-1)
            more = lib.mise_update(
                h,
                coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                n,
            )
            if not more:
                break

        nv = lib.mise_extract(h, None, 0, None, 0, None)
        if nv == 0:
            return None
        # generous face bound: ~4 faces per vertex for marching-tet meshes
        max_f = max(nv * 8, 1024)
        verts = np.empty((nv, 3), np.float64)
        faces = np.empty((max_f, 3), np.int64)
        nf = ctypes.c_int64(0)
        lib.mise_extract(
            h,
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            nv,
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            max_f,
            ctypes.byref(nf),
        )
        faces = faces[: nf.value]
        verts_w = to_world(verts).astype(np.float32)
        mesh = Mesh(verts_w, faces)
        if keep_largest and faces.shape[0] > 0:
            mesh = largest_component(mesh.vertices, mesh.faces)
        return mesh
    finally:
        lib.mise_free(h)
