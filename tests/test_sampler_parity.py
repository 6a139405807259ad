"""Golden parity: scan-based error-bound sampler vs a literal NumPy
transcription of the reference algorithm (code/src/engine/ray_sampler.py:
128-352, VolSDF Algorithm 1 with a growing sample table).

With training=False every random draw in both implementations becomes a
deterministic linspace, so when no ray converges early (the reference's
global while-loop runs to its max_total_iters cap, which our static version
always does) the two must produce identical z tables up to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from hold_tpu.render.ray_sampler import SamplerConfig, error_bound_z_vals


def np_laplace_density(sdf, beta):
    return (1.0 / beta) * (0.5 + 0.5 * np.sign(sdf) * np.expm1(-np.abs(sdf) / beta))


def np_error_bound(beta0, beta, sdf, z_vals, dists, d_star, eps):
    density = np_laplace_density(sdf, beta)
    shifted = np.concatenate(
        [np.zeros((dists.shape[0], 1)), dists * density[:, :-1]], axis=-1
    )
    integral = np.cumsum(shifted, axis=-1)
    err = np.exp(-d_star / beta) * dists**2 / (4.0 * beta**2)
    err_int = np.cumsum(err, axis=-1)
    bound = (np.clip(np.exp(err_int), None, 1e6) - 1.0) * np.exp(-integral[:, :-1])
    return bound.max(axis=-1)


def np_sample_pdf(bins, cdf0, u):
    R, N = u.shape
    out = np.zeros((R, N))
    for r in range(R):
        inds = np.searchsorted(cdf0[r], u[r], side="right")
        below = np.maximum(inds - 1, 0)
        above = np.minimum(inds, cdf0.shape[1] - 1)
        cg0, cg1 = cdf0[r][below], cdf0[r][above]
        bg0 = bins[r][np.minimum(below, bins.shape[1] - 1)]
        bg1 = bins[r][np.minimum(above, bins.shape[1] - 1)]
        denom = cg1 - cg0
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u[r] - cg0) / denom
        out[r] = bg0 + t * (bg1 - bg0)
    return out


def np_reference_sampler(sdf_fn, dirs, cam, beta0, cfg: SamplerConfig):
    """Literal growing-table transcription (eval mode, no early exit)."""
    R = dirs.shape[0]
    # far from sphere intersection
    d_dot_o = np.sum(dirs * cam, axis=-1, keepdims=True)
    under = d_dot_o**2 - (np.sum(cam * cam, -1, keepdims=True)
                          - cfg.scene_bounding_sphere**2)
    far = (np.sqrt(under) - d_dot_o)
    t = np.linspace(0, 1, cfg.N_samples_eval)
    z_vals = cfg.near * (1 - t)[None] + far * t[None]

    def query(z):
        pts = cam[:, None, :] + z[:, :, None] * dirs[:, None, :]
        return sdf_fn(pts)

    sdf = query(z_vals)
    dists0 = z_vals[:, 1:] - z_vals[:, :-1]
    beta = np.sqrt(np.sum(dists0**2, -1) / (4.0 * np.log(cfg.eps + 1.0)))

    samples = z_vals
    for it in range(cfg.max_total_iters):
        dists = z_vals[:, 1:] - z_vals[:, :-1]
        a, b, c = dists, np.abs(sdf[:, :-1]), np.abs(sdf[:, 1:])
        first = a**2 + b**2 <= c**2
        second = a**2 + c**2 <= b**2
        s = (a + b + c) / 2
        area = np.maximum(s * (s - a) * (s - b) * (s - c), 0.0)
        h = 2.0 * np.sqrt(area) / np.maximum(a, 1e-12)
        mid = (~first) & (~second) & (b + c - a > 0)
        d_star = np.where(first, b, np.where(second, c, np.where(mid, h, 0.0)))
        d_star = np.where(np.sign(sdf[:, 1:]) * np.sign(sdf[:, :-1]) == 1.0,
                          d_star, 0.0)

        # convergence test (SamplerConfig.conv_check): "beta0" is the
        # reference's semantics (ray_sampler.py:207-211 passes beta0 into
        # get_error_bound); "current" is the training default deviation
        conv_beta = (
            np.full((R, 1), beta0) if cfg.conv_check == "beta0"
            else beta[:, None]
        )
        err = np_error_bound(beta0, conv_beta, sdf, z_vals,
                             dists, d_star, cfg.eps)
        beta = np.where(err <= cfg.eps, beta0, beta)
        bmin = np.full(R, beta0)
        bmax = beta.copy()
        for _ in range(cfg.beta_iters):
            bmid = 0.5 * (bmin + bmax)
            e = np_error_bound(beta0, bmid[:, None], sdf, z_vals, dists,
                               d_star, cfg.eps)
            ok = e <= cfg.eps
            bmax = np.where(ok, bmid, bmax)
            bmin = np.where(ok, bmin, bmid)
        beta = bmax

        if it == cfg.max_total_iters - 1:
            break

        dists_inf = np.concatenate([dists, np.full((R, 1), 1e10)], -1)
        density = np_laplace_density(sdf, beta[:, None])
        fe = dists_inf * density
        shifted = np.concatenate([np.zeros((R, 1)), fe[:, :-1]], -1)
        trans = np.exp(-np.cumsum(shifted, -1))
        eps_sec = (np.exp(-d_star / beta[:, None]) * dists_inf[:, :-1]**2
                   / (4 * beta[:, None]**2))
        err_int = np.cumsum(eps_sec, -1)
        bound_op = (np.clip(np.exp(err_int), None, 1e6) - 1.0) * trans[:, :-1]
        pdf = bound_op + cfg.add_tiny
        pdf = pdf / pdf.sum(-1, keepdims=True)
        cdf0 = np.concatenate([np.zeros((R, 1)), np.cumsum(pdf, -1)], -1)
        u = np.broadcast_to(np.linspace(0, 1, cfg.N_samples_eval)[None],
                            (R, cfg.N_samples_eval))
        new = np_sample_pdf(z_vals, cdf0, u)
        new_sdf = query(new)
        order = np.argsort(np.concatenate([z_vals, new], -1), -1)
        z_cat = np.concatenate([z_vals, new], -1)
        s_cat = np.concatenate([sdf, new_sdf], -1)
        z_vals = np.take_along_axis(z_cat, order, -1)
        sdf = np.take_along_axis(s_cat, order, -1)

    # final sample set
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists_inf = np.concatenate([dists, np.full((R, 1), 1e10)], -1)
    density = np_laplace_density(sdf, beta[:, None])
    fe = dists_inf * density
    shifted = np.concatenate([np.zeros((R, 1)), fe[:, :-1]], -1)
    trans = np.exp(-np.cumsum(shifted, -1))
    weights = (1 - np.exp(-fe)) * trans
    pdf = weights[:, :-1] + 1e-5
    pdf = pdf / pdf.sum(-1, keepdims=True)
    cdf0 = np.concatenate([np.zeros((R, 1)), np.cumsum(pdf, -1)], -1)
    u = np.broadcast_to(np.linspace(0, 1, cfg.N_samples)[None],
                        (R, cfg.N_samples))
    z_samples = np_sample_pdf(z_vals, cdf0, u)

    near_col = np.full((R, 1), cfg.near)
    idx = np.linspace(0, z_vals.shape[1] - 1, cfg.N_samples_extra).astype(int)
    z_extra = np.concatenate([near_col, far, z_vals[:, idx]], -1)
    return np.sort(np.concatenate([z_samples, z_extra], -1), -1)


import pytest


@pytest.mark.parametrize("conv_check", ["beta0", "current"])
def test_sampler_matches_reference_transcription(conv_check):
    """beta0: literal reference semantics.  current: the training-default
    deviation (docs/pipeline.md) — same transcription with the convergence
    test at the ray's current beta, so the deviation itself is golden-pinned
    too."""
    R = 32
    rng = np.random.RandomState(0)
    dirs = rng.randn(R, 3)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    cam = np.tile([0.0, 0.0, -2.0], (R, 1))
    # analytic two-sphere SDF keeps most rays unconverged through all rounds
    centers = np.array([[0.0, 0.0, 0.0], [0.4, 0.2, 0.6]])

    def np_sdf(pts):
        d = [np.linalg.norm(pts - c, axis=-1) - r
             for c, r in zip(centers, (0.45, 0.25))]
        return np.minimum(*d)

    def jx_sdf(pts):
        d0 = jnp.linalg.norm(pts - centers[0], axis=-1) - 0.45
        d1 = jnp.linalg.norm(pts - centers[1], axis=-1) - 0.25
        return jnp.minimum(d0, d1)

    cfg = SamplerConfig(
        N_samples=32, N_samples_eval=48, N_samples_extra=16,
        max_total_iters=4, beta_iters=8, scene_bounding_sphere=3.0,
        conv_check=conv_check,
    )
    beta0 = 0.02
    z_ref = np_reference_sampler(np_sdf, dirs, cam, beta0, cfg)
    z_ours = np.asarray(
        error_bound_z_vals(
            None, jx_sdf, jnp.asarray(dirs, jnp.float32),
            jnp.asarray(cam, jnp.float32), jnp.asarray(beta0), cfg,
            training=False,
        )
    )
    assert z_ours.shape == z_ref.shape
    diff = np.abs(z_ours - z_ref)
    # identical sampling decisions; float32-vs-float64 tolerance only
    assert np.median(diff) < 2e-3, np.median(diff)
    assert (diff < 0.05).mean() > 0.97, diff.max()
