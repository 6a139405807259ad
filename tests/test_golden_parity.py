"""Transcription-parity golden tests for the numeric cores.

Each suite compares the JAX implementation against a literal NumPy
transcription of the reference's torch code (same pattern as
test_sampler_parity.py):

- LBS:             code/src/utils/external/lbs.py:139-382
- density2weight:  code/src/engine/volsdf_utils.py:220-251
- depth2pts_outside: code/src/model/renderables/background.py:102-135
- BARF window:     code/src/engine/embedders.py:55-125

These are the honest parity evidence in an environment without torch-GPU or
real sequence data: if the transcriptions match the reference line-by-line
and the JAX code matches the transcriptions numerically, the math is the
reference's math.
"""

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# 1. LBS  (reference lbs.py:139-382, transcribed)
# ---------------------------------------------------------------------------


def np_blend_shapes(betas, shape_disps):
    return np.einsum("bl,mkl->bmk", betas, shape_disps)


def np_vertices2joints(J_regressor, vertices):
    return np.einsum("bik,ji->bjk", vertices, J_regressor)


def np_batch_rodrigues(rot_vecs):
    """lbs.py:301-335: angle = norm(aa + 1e-8)."""
    B = rot_vecs.shape[0]
    angle = np.linalg.norm(rot_vecs + 1e-8, axis=1, keepdims=True)
    rot_dir = rot_vecs / angle
    cos = np.cos(angle)[:, None]
    sin = np.sin(angle)[:, None]
    rx, ry, rz = rot_dir[:, 0], rot_dir[:, 1], rot_dir[:, 2]
    zeros = np.zeros(B)
    K = np.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(B, 3, 3)
    ident = np.eye(3)[None]
    return ident + sin * K + (1 - cos) * (K @ K)


def np_transform_mat(R, t):
    """lbs.py:338-347: [R|t] with bottom row [0,0,0,1]."""
    B = R.shape[0]
    T = np.zeros((B, 4, 4))
    T[:, :3, :3] = R
    T[:, :3, 3] = t[:, :, 0]
    T[:, 3, 3] = 1.0
    return T


def np_batch_rigid_transform(rot_mats, joints, parents):
    """lbs.py:350-399 transcription (chain loop + rel_transforms)."""
    joints = joints[..., None]  # (B, J, 3, 1)
    rel_joints = joints.copy()
    rel_joints[:, 1:] = rel_joints[:, 1:] - joints[:, parents[1:]]

    B, J = joints.shape[:2]
    transforms_mat = np_transform_mat(
        rot_mats.reshape(-1, 3, 3), rel_joints.reshape(-1, 3, 1)
    ).reshape(-1, J, 4, 4)

    transform_chain = [transforms_mat[:, 0]]
    for i in range(1, len(parents)):
        transform_chain.append(transform_chain[parents[i]] @ transforms_mat[:, i])
    transforms = np.stack(transform_chain, axis=1)

    posed_joints = transforms[:, :, :3, 3]

    # rel_transforms = transforms - pad(transforms @ pad(joints), left 3 cols)
    joints_homogen = np.concatenate(
        [joints, np.zeros((B, J, 1, 1))], axis=2
    )  # F.pad(joints, [0,0,0,1])
    corr = transforms @ joints_homogen  # (B, J, 4, 1)
    pad_corr = np.zeros_like(transforms)
    pad_corr[:, :, :, 3] = corr[..., 0]
    rel_transforms = transforms - pad_corr
    return posed_joints, rel_transforms


def np_lbs(betas, pose, v_template, shapedirs, posedirs, J_regressor, parents,
           lbs_weights, pose_blend=True):
    """lbs.py:139-253 transcription (pose2rot=True path)."""
    B = max(betas.shape[0], pose.shape[0])
    v_shaped = v_template + np_blend_shapes(betas, shapedirs)
    J = np_vertices2joints(J_regressor, v_shaped)
    ident = np.eye(3)
    rot_mats = np_batch_rodrigues(pose.reshape(-1, 3)).reshape(B, -1, 3, 3)
    pose_feature = (rot_mats[:, 1:, :, :] - ident).reshape(B, -1)
    pose_offsets = (pose_feature @ posedirs).reshape(B, -1, 3)
    v_posed = pose_offsets + v_shaped if pose_blend else v_shaped

    J_transformed, A = np_batch_rigid_transform(rot_mats, J, parents)

    W = np.broadcast_to(lbs_weights[None], (B,) + lbs_weights.shape)
    num_joints = J_regressor.shape[0]
    T = (W @ A.reshape(B, num_joints, 16)).reshape(B, -1, 4, 4)

    homo = np.ones((B, v_posed.shape[1], 1))
    v_posed_homo = np.concatenate([v_posed, homo], axis=2)
    v_homo = T @ v_posed_homo[..., None]
    verts = v_homo[:, :, :3, 0]
    return verts, J_transformed, T, A, v_posed


def _mano_data():
    from hold_tpu.mano.model_data import build_synthetic_mano

    return build_synthetic_mano(True, seed=3)


def test_lbs_golden_vs_transcription():
    from hold_tpu.mano.lbs import constants_from_model, lbs_forward

    md = _mano_data()
    consts = constants_from_model(md)
    rng = np.random.RandomState(0)
    B = 4
    betas = rng.randn(B, 10).astype(np.float64) * 0.5
    pose = rng.randn(B, 48).astype(np.float64) * 0.4

    verts_np, joints_np, T_np, A_np, v_posed_np = np_lbs(
        betas, pose, np.asarray(md.v_template, np.float64),
        np.asarray(md.shapedirs, np.float64),
        np.asarray(md.posedirs, np.float64),
        np.asarray(md.J_regressor, np.float64),
        [int(p) for p in md.parents],
        np.asarray(md.lbs_weights, np.float64),
    )

    out = lbs_forward(
        consts, jnp.asarray(betas, jnp.float32), jnp.asarray(pose, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(out.vertices), verts_np,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.joints)[:, :16], joints_np,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.A), A_np, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.v_posed), v_posed_np,
                               rtol=2e-4, atol=2e-5)


def test_lbs_no_pose_blend():
    from hold_tpu.mano.lbs import constants_from_model, lbs_forward

    md = _mano_data()
    consts = constants_from_model(md)
    rng = np.random.RandomState(1)
    betas = rng.randn(2, 10) * 0.3
    pose = rng.randn(2, 48) * 0.5
    verts_np, *_ = np_lbs(
        betas, pose, np.asarray(md.v_template, np.float64),
        np.asarray(md.shapedirs, np.float64),
        np.asarray(md.posedirs, np.float64),
        np.asarray(md.J_regressor, np.float64),
        [int(p) for p in md.parents],
        np.asarray(md.lbs_weights, np.float64),
        pose_blend=False,
    )
    out = lbs_forward(consts, jnp.asarray(betas, jnp.float32),
                      jnp.asarray(pose, jnp.float32), pose_blend=False)
    np.testing.assert_allclose(np.asarray(out.vertices), verts_np,
                               rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# 2. density2weight  (volsdf_utils.py:220-251, transcribed)
# ---------------------------------------------------------------------------


def np_density2weight(density, z_vals, z_max):
    density = density.reshape(-1, z_vals.shape[1])
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    z_max_dists = z_max[:, None] - z_vals[:, -1:]
    dists = np.concatenate([dists, z_max_dists], -1)

    free_energy = dists * density
    alpha = 1 - np.exp(-free_energy)
    shifted_free_energy = np.concatenate(
        [np.zeros((dists.shape[0], 1)), free_energy], axis=-1
    )
    transmittance = np.exp(-np.cumsum(shifted_free_energy, axis=-1))
    fg_transmittance = transmittance[:, :-1]
    bg_weights = transmittance[:, -1]
    fg_weights = alpha * fg_transmittance
    return fg_weights, bg_weights


def test_density2weight_golden():
    from hold_tpu.render.volsdf import density2weight

    rng = np.random.RandomState(0)
    R, S = 64, 70
    z = np.sort(rng.uniform(0.1, 4.0, (R, S)), axis=-1)
    z_max = z[:, -1] + rng.uniform(0.05, 1.0, R)
    dens = rng.gamma(1.0, 2.0, (R, S))

    fg_np, bg_np = np_density2weight(dens, z, z_max)
    fg, bg = density2weight(jnp.asarray(dens, jnp.float32),
                            jnp.asarray(z, jnp.float32),
                            jnp.asarray(z_max, jnp.float32))
    np.testing.assert_allclose(np.asarray(fg), fg_np, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bg), bg_np, rtol=1e-4, atol=1e-6)
    # weights + leftover transmittance conserve probability
    np.testing.assert_allclose(np.asarray(fg).sum(-1) + np.asarray(bg) >= 0.0,
                               True)


def test_density2weight_zero_density_passthrough():
    from hold_tpu.render.volsdf import density2weight

    z = np.linspace(0.1, 2.0, 32)[None].repeat(8, 0)
    fg, bg = density2weight(jnp.zeros((8, 32)), jnp.asarray(z),
                            jnp.full((8,), 2.5))
    assert np.allclose(np.asarray(fg), 0.0)
    assert np.allclose(np.asarray(bg), 1.0)


# ---------------------------------------------------------------------------
# 3. NeRF++ depth2pts_outside  (background.py:102-135, transcribed)
# ---------------------------------------------------------------------------


def np_depth2pts_outside(ray_o, ray_d, depth, radius):
    o_dot_d = np.sum(ray_d * ray_o, axis=-1)
    under_sqrt = o_dot_d**2 - ((ray_o**2).sum(-1) - radius**2)
    d_sphere = np.sqrt(under_sqrt) - o_dot_d
    p_sphere = ray_o + d_sphere[..., None] * ray_d
    p_mid = ray_o - o_dot_d[..., None] * ray_d
    p_mid_norm = np.linalg.norm(p_mid, axis=-1)

    rot_axis = np.cross(ray_o, p_sphere)
    rot_axis = rot_axis / np.linalg.norm(rot_axis, axis=-1, keepdims=True)
    phi = np.arcsin(p_mid_norm / radius)
    theta = np.arcsin(p_mid_norm * depth)
    rot_angle = (phi - theta)[..., None]

    p_new = (
        p_sphere * np.cos(rot_angle)
        + np.cross(rot_axis, p_sphere) * np.sin(rot_angle)
        + rot_axis * np.sum(rot_axis * p_sphere, -1, keepdims=True)
        * (1.0 - np.cos(rot_angle))
    )
    p_new = p_new / np.linalg.norm(p_new, axis=-1, keepdims=True)
    return np.concatenate([p_new, depth[..., None]], axis=-1)


def test_depth2pts_outside_golden():
    from hold_tpu.render.background import depth2pts_outside

    rng = np.random.RandomState(0)
    R, S = 32, 16
    radius = 3.0
    # camera close enough to the center that p_mid_norm * depth <= 1 — the
    # reference formula's implicit domain (theta = asin(p_mid_norm * depth)
    # inherits NeRF++'s radius-1 convention and NaNs outside it)
    ray_o = rng.uniform(-0.5, 0.5, (R, S, 3))
    ray_d = rng.randn(R, S, 3)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    depth = rng.uniform(0.05, 1.0, (R, S))

    ref = np_depth2pts_outside(ray_o, ray_d, depth, radius)
    got = depth2pts_outside(jnp.asarray(ray_o, jnp.float32),
                            jnp.asarray(ray_d, jnp.float32),
                            jnp.asarray(depth, jnp.float32), radius)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-4, atol=5e-5)


def test_depth2pts_outside_unit_depth_is_sphere_point():
    """With radius=1 (the NeRF++ convention the formula is exact for),
    depth=1 must land exactly on the sphere surface: theta == phi, zero
    rotation, output = normalized sphere intersection."""
    from hold_tpu.render.background import depth2pts_outside

    rng = np.random.RandomState(2)
    ray_o = rng.uniform(-0.3, 0.3, (8, 4, 3))
    ray_d = rng.randn(8, 4, 3)
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    depth = np.ones((8, 4))
    radius = 1.0
    got = np.asarray(depth2pts_outside(
        jnp.asarray(ray_o, jnp.float32), jnp.asarray(ray_d, jnp.float32),
        jnp.asarray(depth, jnp.float32), radius))
    # ref: with theta=phi the rotation angle is 0 -> normalized p_sphere
    o_dot_d = np.sum(ray_d * ray_o, axis=-1)
    d_sphere = np.sqrt(o_dot_d**2 - ((ray_o**2).sum(-1) - radius**2)) - o_dot_d
    p_sphere = ray_o + d_sphere[..., None] * ray_d
    p_unit = p_sphere / np.linalg.norm(p_sphere, axis=-1, keepdims=True)
    np.testing.assert_allclose(got[..., :3], p_unit, atol=2e-4)


# ---------------------------------------------------------------------------
# 4. BARF alpha schedule + cos-window  (embedders.py:55-125, transcribed)
# ---------------------------------------------------------------------------


def np_barf_alphas(num_freq, start, end):
    """embedders.py:74-80: alphas = cat(zeros(start), linspace(0, L, end-start));
    alpha(step) = alphas[min(step, len-1)]."""
    return np.concatenate(
        [np.zeros(start), np.linspace(0.0, num_freq, end - start)]
    )


def np_barf_weights(alpha, L, input_dim, sin_dim=2):
    """embedders.py:88-106 transcription."""
    k = np.arange(L, dtype=np.float64)
    ak = alpha - k
    weights = np.clip(ak, 0, 1)
    cos_idx = np.logical_and(0 <= ak, ak < 1)
    cos_val = (1 - np.cos(ak * np.pi)) / 2
    weights[cos_idx] = cos_val[cos_idx]
    weights = np.repeat(weights[:, None], input_dim * sin_dim, 1).reshape(-1)
    return np.concatenate([np.ones(input_dim), weights])


def test_barf_alpha_schedule_golden():
    from hold_tpu.models.embedders import barf_alpha

    L, start, end = 6, 100, 1000
    alphas = np_barf_alphas(L, start, end)
    for step in [0, 1, 50, 99, 100, 101, 250, 500, 998, 999, 1000, 5000]:
        ref = alphas[min(step, len(alphas) - 1)]
        got = float(barf_alpha(jnp.asarray(step), L, start, end))
        assert abs(got - ref) < 1e-5, (step, got, ref)


def test_barf_window_weights_golden():
    from hold_tpu.models.embedders import barf_weights

    L = 6
    for alpha in [0.0, 0.3, 1.0, 1.5, 2.99, 3.0, 4.7, 6.0]:
        ref = np_barf_weights(alpha, L, input_dim=3)[3:]  # strip input block
        got = np.repeat(np.asarray(barf_weights(jnp.asarray(alpha), L)), 6)
        np.testing.assert_allclose(got, ref, atol=1e-6, err_msg=f"alpha={alpha}")


def test_barf_embed_full_golden():
    """End-to-end: annealed embedding == transcription of embed()*weights."""
    from hold_tpu.models.embedders import barf_alpha, barf_embed

    rng = np.random.RandomState(0)
    x = rng.uniform(-2, 2, (16, 3))
    L, start, end = 6, 10, 50
    for step in [0, 5, 10, 25, 49, 80]:
        alphas = np_barf_alphas(L, start, end)
        alpha = alphas[min(step, len(alphas) - 1)]
        w = np_barf_weights(alpha, L, input_dim=3)
        # reference embed layout: [x | sin(2^0 x), cos(2^0 x), ...]
        blocks = [x]
        for f in 2.0 ** np.arange(L):
            blocks += [np.sin(x * f), np.cos(x * f)]
        ref = np.concatenate(blocks, axis=-1) * w[None]

        a = barf_alpha(jnp.asarray(step), L, start, end)
        got = np.asarray(barf_embed(jnp.asarray(x, jnp.float32), L, a))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f"step={step}")
