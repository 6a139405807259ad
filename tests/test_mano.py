import jax.numpy as jnp
import numpy as np

from hold_tpu.mano.lbs import (
    constants_from_model,
    lbs_forward,
    mano_full_pose,
    rodrigues,
)
from hold_tpu.mano.model_data import build_synthetic_mano
from hold_tpu.mano.server import build_mano_server, mano_server_forward
from hold_tpu.utils.mesh import (
    SEAL_CIRCLE_V_ID,
    mano_subdivision_operator,
    seal_mano_faces,
)


def test_synthetic_topology_counts():
    md = build_synthetic_mano(True)
    assert md.v_template.shape == (778, 3)
    assert md.faces.shape == (1538, 3)
    assert md.J_regressor.shape == (16, 778)
    assert md.lbs_weights.shape == (778, 16)
    np.testing.assert_allclose(md.lbs_weights.sum(1), 1.0, atol=1e-5)
    np.testing.assert_allclose(md.J_regressor.sum(1), 1.0, atol=1e-5)
    # every vertex except the wrist ring is referenced consistently
    assert md.faces.min() >= 0 and md.faces.max() < 778


def test_synthetic_boundary_is_seal_ring():
    md = build_synthetic_mano(True)
    # boundary edges = edges used by exactly one face
    edges = {}
    for f in md.faces:
        for u, v in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            k = (min(u, v), max(u, v))
            edges[k] = edges.get(k, 0) + 1
    boundary_verts = set()
    for (u, v), c in edges.items():
        if c == 1:
            boundary_verts.update([u, v])
    assert boundary_verts == set(SEAL_CIRCLE_V_ID.tolist())


def test_rodrigues_identity_and_known():
    aa = jnp.zeros((1, 3))
    np.testing.assert_allclose(rodrigues(aa)[0], np.eye(3), atol=1e-5)
    # 90 deg about z
    aa = jnp.asarray([[0.0, 0.0, np.pi / 2]])
    R = np.asarray(rodrigues(aa))[0]
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-5)


def test_lbs_zero_pose_is_shaped_template():
    md = build_synthetic_mano(True)
    c = constants_from_model(md)
    betas = jnp.zeros((1, 10))
    full_pose = jnp.zeros((1, 48))
    out = lbs_forward(c, betas, full_pose)
    np.testing.assert_allclose(out.vertices[0], md.v_template, atol=1e-5)
    # A should be identity at rest
    np.testing.assert_allclose(
        out.A[0], np.tile(np.eye(4), (16, 1, 1)), atol=1e-5
    )


def test_lbs_global_rotation_rotates_everything():
    md = build_synthetic_mano(True)
    c = constants_from_model(md)
    betas = jnp.zeros((1, 10))
    aa = np.zeros((1, 48), np.float32)
    aa[0, :3] = [0, 0, np.pi / 2]
    rest = lbs_forward(c, betas, jnp.zeros((1, 48)))
    out = lbs_forward(c, betas, jnp.asarray(aa))
    R = np.asarray(rodrigues(jnp.asarray(aa[:, :3])))[0]
    # vertices rotate about the root joint
    root = np.asarray(rest.joints)[0, 0]
    expect = (np.asarray(rest.vertices)[0] - root) @ R.T + root
    np.testing.assert_allclose(out.vertices[0], expect, atol=1e-4)


def test_lbs_shape_blend():
    md = build_synthetic_mano(True)
    c = constants_from_model(md)
    betas = jnp.asarray(np.random.RandomState(0).randn(1, 10), jnp.float32)
    out = lbs_forward(c, betas, jnp.zeros((1, 48)))
    expect = md.v_template + np.einsum(
        "l,mkl->mk", np.asarray(betas)[0], md.shapedirs
    )
    np.testing.assert_allclose(out.vertices[0], expect, atol=1e-5)


def test_server_canonical_flat_pose():
    srv = build_mano_server(True, np.zeros(10))
    # canonical pose (thetas = [0, -hands_mean]) must equal the zero-pose LBS
    out = lbs_forward(srv.consts, jnp.zeros((1, 10)), jnp.zeros((1, 48)))
    np.testing.assert_allclose(srv.verts_c, out.vertices, atol=1e-5)
    np.testing.assert_allclose(
        srv.tfs_c_inv, np.tile(np.eye(4), (16, 1, 1)), atol=1e-5
    )


def test_server_forward_scale_transl():
    srv = build_mano_server(True, np.zeros(10))
    thetas = jnp.concatenate(
        [jnp.zeros((2, 3)), -jnp.tile(srv.consts.hands_mean[None], (2, 1))], axis=-1
    )
    s = jnp.asarray([2.0, 2.0])
    t = jnp.asarray([[0.1, 0.2, 0.3]] * 2)
    out = mano_server_forward(srv, s, t, thetas, jnp.zeros((2, 10)))
    expect = np.asarray(srv.verts_c)[0] * 2.0 + np.array([0.1, 0.2, 0.3]) * 2.0
    np.testing.assert_allclose(out.verts[0], expect, atol=1e-5)
    np.testing.assert_allclose(out.verts[1], expect, atol=1e-5)
    # tfs map canonical verts to posed verts
    v_c = np.asarray(srv.verts_c)[0]
    tfs = np.asarray(out.tfs)[0]
    W = np.asarray(srv.skin_weights_c)[0]
    T = np.einsum("vj,jmn->vmn", W, tfs)
    warped = np.einsum("vmn,vn->vm", T[:, :3, :3], v_c) + T[:, :3, 3]
    np.testing.assert_allclose(warped, expect, atol=1e-4)


def test_mano_full_pose_mean_offset():
    md = build_synthetic_mano(True)
    c = constants_from_model(md)
    go = jnp.ones((1, 3)) * 0.1
    hp = jnp.zeros((1, 45))
    fp = mano_full_pose(c, go, hp)
    np.testing.assert_allclose(fp[0, 3:], md.hands_mean, atol=1e-6)


def test_subdivision_operator_shapes():
    md = build_synthetic_mano(True)
    M, faces_div = mano_subdivision_operator(md.faces, True)
    sealed_faces = seal_mano_faces(md.faces, True)
    assert sealed_faces.shape == (1554, 3)
    assert M.shape[1] == 778
    assert faces_div.shape[0] == 4 * 1554
    # partition of unity: subdivided verts are affine combinations
    np.testing.assert_allclose(M.sum(1), 1.0, atol=1e-5)
    # applying to the template produces finite verts inside the bbox
    v = M @ md.v_template
    assert np.isfinite(v).all()
    assert v.min() >= md.v_template.min() - 1e-3
    assert v.max() <= md.v_template.max() + 1e-3
