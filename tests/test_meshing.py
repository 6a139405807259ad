import numpy as np

from hold_tpu.meshing.mise import generate_mesh, largest_component
from hold_tpu.utils.mesh import (
    Mesh,
    decimate_mesh,
    load_obj,
    save_obj,
)


def _sphere_sdf(center, r):
    def f(p):
        return np.linalg.norm(p - center, axis=1) - r
    return f


def test_mise_sphere_accuracy(tmp_path):
    m = generate_mesh(
        _sphere_sdf(np.array([0.05, 0.0, 0.0]), 0.3),
        np.array([[-0.4, -0.4, -0.4], [0.5, 0.4, 0.4]]),
        res_init=16, res_up=2,
    )
    r = np.linalg.norm(m.vertices - [0.05, 0, 0], axis=1)
    assert abs(r.mean() - 0.3) < 1e-3
    assert np.abs(r - 0.3).max() < 5e-3
    # watertight: every edge shared by exactly two faces
    from collections import Counter

    cnt = Counter()
    for f in m.faces:
        for a, b in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            cnt[(min(a, b), max(a, b))] += 1
    assert set(cnt.values()) == {2}
    # outward winding: positive signed volume close to sphere volume
    v0, v1, v2 = (m.vertices[m.faces[:, i]] - [0.05, 0, 0] for i in range(3))
    vol = np.einsum("ij,ij->i", v0, np.cross(v1, v2)).sum() / 6.0
    assert abs(vol - 4 / 3 * np.pi * 0.3**3) < 2e-3

    # OBJ roundtrip
    p = str(tmp_path / "m.obj")
    m.export(p)
    back = load_obj(p)
    assert back.vertices.shape == m.vertices.shape


def test_mise_largest_component():
    # two spheres; keep only the bigger one
    big = _sphere_sdf(np.array([-0.25, 0, 0]), 0.2)
    small = _sphere_sdf(np.array([0.3, 0, 0]), 0.08)

    def sdf(p):
        return np.minimum(big(p), small(p))

    m = generate_mesh(
        sdf, np.array([[-0.5, -0.3, -0.3], [0.45, 0.3, 0.3]]),
        res_init=24, res_up=1,
    )
    d_big = np.abs(np.linalg.norm(m.vertices - [-0.25, 0, 0], axis=1) - 0.2)
    assert d_big.max() < 0.02  # every kept vertex lies on the big sphere


def test_mise_empty_field_returns_none():
    m = generate_mesh(
        lambda p: np.ones(p.shape[0]),  # everywhere outside
        np.array([[-1, -1, -1], [1, 1, 1.0]]),
        res_init=8, res_up=0,
    )
    assert m is None


def test_decimate_mesh_reduces_faces():
    m = generate_mesh(
        _sphere_sdf(np.zeros(3), 0.3),
        np.array([[-0.4] * 3, [0.4] * 3]), res_init=16, res_up=1,
    )
    d = decimate_mesh(m.vertices, m.faces, 500)
    assert d.faces.shape[0] <= m.faces.shape[0]
    assert d.faces.shape[0] >= 100
    r = np.linalg.norm(d.vertices, axis=1)
    assert abs(r.mean() - 0.3) < 0.02
