"""Ray samplers: stratified uniform + VolSDF error-bound upsampling.

TPU-first re-derivation of the reference's ErrorBoundSampler
(code/src/engine/ray_sampler.py:88-366, VolSDF Algorithm 1).  The reference
uses a data-dependent ``while`` loop that exits once every ray's beta bound
converges; under XLA all shapes must be static, so we unroll the loop to its
cap (``max_total_iters``, which the reference also enforces) and keep
*per-ray* convergence semantics identical:

- a converged ray's beta collapses to beta0 and stays there (the bisection
  below reproduces `beta[err<=eps]=beta0` exactly),
- the extra upsampling iterations a converged ray receives in the static
  version only add samples from its (already tight) error-bound distribution —
  pure refinement, never harm.

The only behavioural difference vs the reference is the absence of the
*global* early exit, i.e. we always pay the worst case — which is what a
static-shape compiler pays anyway.

SDF queries inside the sampler are stop-gradient (the reference wraps them in
torch.no_grad, ray_sampler.py:169-177).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .volsdf import get_sphere_intersections


class SamplerConfig(NamedTuple):
    near: float = 0.0
    N_samples: int = 64
    N_samples_eval: int = 128
    N_samples_extra: int = 32
    eps: float = 0.1
    beta_iters: int = 10
    max_total_iters: int = 5
    add_tiny: float = 1e-6
    scene_bounding_sphere: float = 3.0
    inverse_sphere_bg: bool = True
    N_samples_inverse_sphere: int = 32
    # Where the bisection's convergence test evaluates the error bound.
    # "beta0"   = reference parity (ray_sampler.py:207-211 evaluates
    #             get_error_bound at beta0): unconverged rays keep beta
    #             above beta0 and upsample by the true error bound.
    # "current" = evaluate at the ray's current beta (the pre-r5 behavior):
    #             the bound decreases with beta, so almost every ray snaps
    #             to beta0 immediately and ALL upsampling concentrates at
    #             the current surface estimate (weights-pdf-like).
    # DELIBERATE DEVIATION (docs/pipeline.md "sampler convergence A/B"):
    # training defaults to "current" — measured consistently better
    # reconstruction on bench_seq (10k pretrain CD_ICP 0.66 vs 1.69;
    # 40k from-scratch 0.58 vs 2.27) — while "beta0" is kept, torch-verified
    # against the reference's own sampler (tests/test_torch_parity.py).
    conv_check: str = "current"


def uniform_z_vals(
    rng: jax.Array | None,
    ray_dirs: jnp.ndarray,  # (R, 3)
    cam_loc: jnp.ndarray,  # (R, 3)
    near: float,
    far,  # float or (R, 1) array
    N: int,
    training: bool,
) -> jnp.ndarray:
    """Stratified (training) or even (eval) samples in [near, far]; (R, N).
    near/far: float or (R, 1) arrays."""
    R = ray_dirs.shape[0]
    t = jnp.linspace(0.0, 1.0, N)
    near_arr = jnp.broadcast_to(
        jnp.asarray(near, jnp.float32).reshape(-1, 1), (R, 1)
    )
    far_arr = jnp.broadcast_to(jnp.asarray(far, jnp.float32).reshape(-1, 1), (R, 1))
    z = near_arr * (1.0 - t)[None] + far_arr * t[None]
    if training and rng is not None:
        mids = 0.5 * (z[:, 1:] + z[:, :-1])
        upper = jnp.concatenate([mids, z[:, -1:]], axis=-1)
        lower = jnp.concatenate([z[:, :1], mids], axis=-1)
        u = jax.random.uniform(rng, z.shape)
        z = lower + (upper - lower) * u
    return z


def _laplace_density_beta(sdf: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    alpha = 1.0 / beta
    return alpha * (0.5 + 0.5 * jnp.sign(sdf) * jnp.expm1(-jnp.abs(sdf) / beta))


def _cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Prefix sum along the last axis.

    Measured on-chip: jnp.cumsum (reduce-window lowering) beats
    lax.associative_scan here — the log-depth scan's pad/slice steps
    materialize between fusions and cost ~1.4x the whole sampler."""
    return jnp.cumsum(x, axis=-1)


def _error_bound(beta0, beta, sdf, z_vals, dists, d_star):
    """Per-ray max opacity error bound (ray_sampler.py:354-366).

    beta: (R, 1); sdf/z_vals: (R, S); dists/d_star: (R, S-1)."""
    density = _laplace_density_beta(sdf, beta)
    err_per_sec = jnp.exp(-d_star / beta) * (dists**2) / (4.0 * beta**2)
    shifted = jnp.concatenate(
        [jnp.zeros_like(dists[:, :1]), dists * density[:, :-1]], axis=-1
    )
    integral = _cumsum(shifted)
    err_int = _cumsum(err_per_sec)
    bound = (jnp.clip(jnp.exp(err_int), max=1e6) - 1.0) * jnp.exp(-integral[:, :-1])
    return jnp.max(bound, axis=-1)


def _d_star(z_vals: jnp.ndarray, sdf: jnp.ndarray) -> jnp.ndarray:
    """Theorem-1 lower bound on distance-to-surface inside each interval
    (ray_sampler.py:191-206)."""
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    a, b, c = dists, jnp.abs(sdf[:, :-1]), jnp.abs(sdf[:, 1:])
    first = a**2 + b**2 <= c**2
    second = a**2 + c**2 <= b**2
    s = (a + b + c) / 2.0
    area = jnp.maximum(s * (s - a) * (s - b) * (s - c), 0.0)
    h = 2.0 * jnp.sqrt(area) / jnp.maximum(a, 1e-12)
    mid = (~first) & (~second) & (b + c - a > 0)
    d = jnp.where(first, b, jnp.where(second, c, jnp.where(mid, h, 0.0)))
    same_side = jnp.sign(sdf[:, 1:]) * jnp.sign(sdf[:, :-1]) == 1.0
    return jnp.where(same_side, d, 0.0)


def sample_pdf(
    bins: jnp.ndarray,  # (R, M)
    cdf: jnp.ndarray,  # (R, M) cumulative (no leading zero)
    u: jnp.ndarray,  # (R, N) in [0, 1)
) -> jnp.ndarray:
    """Inverse-transform sampling (ray_sampler.py:281-307).

    TPU notes: the bin index is a compare-and-count over the cdf — identical
    to searchsorted(side="right") on a sorted array, but it compiles to one
    fused compare+reduce instead of the sort+SCATTER that searchsorted
    lowers to (traced at ~4ms per call at production widths,
    scripts/xplane_ops.py).  The four value lookups run as ONE one-hot
    batched matmul — the iota-compare producer fuses into the MXU tiles,
    while explicit take_along_axis gathers cost ~2.5ms each."""
    cdf0 = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)
    W = cdf0.shape[-1]  # == bins.shape[-1] in every call site (M bins, M-1 pdf)
    # searchsorted(cdf0, u, side="right") == #{w : cdf0[w] <= u}
    inds = jnp.sum(
        (cdf0[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1
    )
    above = jnp.minimum(inds, W - 1)

    # value table indexed by `above`: columns are
    # [cdf0[a], cdf0[max(a-1,0)], bins[min(a, W-1)], bins[clamped a-1]]
    bins_c = bins[:, :W]
    cdf_prev = jnp.concatenate([cdf0[:, :1], cdf0[:, :-1]], axis=-1)
    bins_prev = jnp.concatenate([bins_c[:, :1], bins_c[:, :-1]], axis=-1)
    V = jnp.stack([cdf0, cdf_prev, bins_c, bins_prev], axis=-1)  # (R, W, 4)

    onehot = (
        above[:, :, None] == jnp.arange(W)[None, None, :]
    ).astype(bins.dtype)  # (R, N, W); fuses into the dot below
    g = jax.lax.dot_general(
        onehot, V, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (R, N, 4)
    cdf_g1, cdf_g0, bins_g1, bins_g0 = (
        g[..., 0], g[..., 1], g[..., 2], g[..., 3]
    )
    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def error_bound_z_vals(
    rng: jax.Array | None,
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray] | None,  # (R,S,3) -> (R,S)
    ray_dirs: jnp.ndarray,  # (R, 3)
    cam_loc: jnp.ndarray,  # (R, 3)
    beta0: jnp.ndarray,  # scalar current Laplace beta
    cfg: SamplerConfig,
    training: bool,
    query_z_fn: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
    near: jnp.ndarray | None = None,  # (R, 1) per-ray near override
    far: jnp.ndarray | None = None,  # (R, 1) per-ray far override
) -> jnp.ndarray:
    """Final z values per ray: (R, N_samples + 2 + N_samples_extra).

    Structure: an UNROLLED refinement loop over tables that grow by
    N_samples_eval per round — static shapes per round (128, 256, ...), so
    XLA compiles each round's ops at its true size.  This repo first shipped
    a lax.scan over a fixed padded table (padding masked out of the pdf);
    on-chip ablation (scripts/microbench_sampler2.py) showed every round
    paying full-width table ops — the padded form ran the object sampler at
    ~45 ms vs ~7 ms/round at true widths — and the original motivation for
    the scan (per-round query graphs ballooning HLO) does not apply at
    max_total_iters=5 of straight-line code.  Per-ray sampling semantics are
    identical to the reference's growing-table loop (ray_sampler.py:120-200);
    golden parity is asserted by tests/test_sampler_parity.py."""
    R = ray_dirs.shape[0]
    keys = (
        jax.random.split(rng, 4) if rng is not None else [None] * 4
    )

    if far is None:
        if cfg.inverse_sphere_bg:
            far = get_sphere_intersections(
                cam_loc, ray_dirs, r=cfg.scene_bounding_sphere
            )[:, 1:]
        else:
            far = jnp.full((R, 1), 2.0 * cfg.scene_bounding_sphere)
    if near is None:
        near = jnp.full((R, 1), cfg.near)

    z0 = uniform_z_vals(keys[0], ray_dirs, cam_loc, near, far,
                        cfg.N_samples_eval, training)

    def query(z):
        # query_z_fn receives the z table directly — the fused sampler
        # kernels expand cam + z*dir in-kernel, so the (R, S, 3) point
        # tensor never materialises in HBM (ops/fused_query.py)
        if query_z_fn is not None:
            return jax.lax.stop_gradient(query_z_fn(z))
        pts = cam_loc[:, None, :] + z[:, :, None] * ray_dirs[:, None, :]
        return jax.lax.stop_gradient(sdf_fn(pts))

    Ne = cfg.N_samples_eval
    z_vals = z0
    sdf = query(z0)

    # beta upper bound (Lemma 2) from the initial uniform spacing
    dists0 = z0[:, 1:] - z0[:, :-1]
    bound = (1.0 / (4.0 * jnp.log(jnp.asarray(cfg.eps + 1.0)))) * jnp.sum(
        dists0**2, axis=-1
    )
    beta = jnp.sqrt(bound)
    beta0 = jnp.asarray(beta0, jnp.float32)

    def bisect(beta, sdf, z_vals, dists, d_star):
        # convergence test: see SamplerConfig.conv_check.  "beta0" is the
        # reference's semantics (ray_sampler.py:207-211); "current" (the
        # training default) evaluates at the ray's current beta, which
        # snaps nearly every ray to beta0 and concentrates all upsampling
        # at the surface estimate — measured better on bench_seq
        # (docs/pipeline.md).
        conv_beta = (
            jnp.full((R, 1), beta0) if cfg.conv_check == "beta0"
            else beta[:, None]
        )
        conv_err = _error_bound(beta0, conv_beta, sdf, z_vals, dists, d_star)
        beta = jnp.where(conv_err <= cfg.eps, beta0, beta)

        def body(carry):
            beta_min, beta_max = carry
            beta_mid = 0.5 * (beta_min + beta_max)
            err = _error_bound(
                beta0, beta_mid[:, None], sdf, z_vals, dists, d_star
            )
            ok = err <= cfg.eps
            return (
                jnp.where(ok, beta_min, beta_mid),
                jnp.where(ok, beta_mid, beta_max),
            )

        # statically unrolled (beta_iters is ~10): the fori_loop's `while`
        # op cost ~28 ms/step at 10k rays in loop dispatch + forced
        # materialisation of the carry; unrolled, each iteration's
        # elementwise chain fuses with the next
        carry = (jnp.full((R,), beta0), beta)
        for _ in range(cfg.beta_iters):
            carry = body(carry)
        return carry[1]

    # unrolled refinement: each round's ops compile at the table's true
    # width (Ne, 2*Ne, ...) — no padding, no validity masks
    for it in range(cfg.max_total_iters - 1):
        dists = z_vals[:, 1:] - z_vals[:, :-1]
        d_star = _d_star(z_vals, sdf)
        beta = bisect(beta, sdf, z_vals, dists, d_star)

        # error-bound pdf over the current table
        dists_inf = jnp.concatenate([dists, jnp.full((R, 1), 1e10)], axis=-1)
        density = _laplace_density_beta(sdf, beta[:, None])
        free_energy = dists_inf * density
        shifted = jnp.concatenate(
            [jnp.zeros((R, 1)), free_energy[:, :-1]], axis=-1
        )
        transmittance = jnp.exp(-_cumsum(shifted))
        err_per_sec = (
            jnp.exp(-d_star / beta[:, None])
            * (dists_inf[:, :-1] ** 2)
            / (4.0 * beta[:, None] ** 2)
        )
        err_int = _cumsum(err_per_sec)
        bound_opacity = (
            jnp.clip(jnp.exp(err_int), max=1e6) - 1.0
        ) * transmittance[:, :-1]

        pdf = bound_opacity + cfg.add_tiny
        pdf = pdf / jnp.maximum(jnp.sum(pdf, axis=-1, keepdims=True), 1e-30)
        cdf = _cumsum(pdf)

        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, Ne)[None], (R, Ne))
        new_samples = sample_pdf(z_vals, cdf, u)
        new_sdf = query(new_samples)

        # grow the table; variadic lax.sort co-sorts the sdf payload inside
        # the sort kernel — argsort + take_along_axis costs ~30ms per gather
        # on TPU (cross-lane gathers), the payload sort ~2ms
        z_vals = jnp.concatenate([z_vals, new_samples], axis=-1)
        sdf = jnp.concatenate([sdf, new_sdf], axis=-1)
        z_vals, sdf = jax.lax.sort((z_vals, sdf), dimension=-1, num_keys=1)

    # last round: bisect only (the reference's final loop pass does not add
    # samples), then draw the final sample set from transmittance weights
    dists = z_vals[:, 1:] - z_vals[:, :-1]
    d_star = _d_star(z_vals, sdf)
    beta = bisect(beta, sdf, z_vals, dists, d_star)

    dists_inf = jnp.concatenate([dists, jnp.full((R, 1), 1e10)], axis=-1)
    density = _laplace_density_beta(sdf, beta[:, None])
    free_energy = dists_inf * density
    shifted = jnp.concatenate([jnp.zeros((R, 1)), free_energy[:, :-1]], axis=-1)
    transmittance = jnp.exp(-_cumsum(shifted))
    weights = (1.0 - jnp.exp(-free_energy)) * transmittance

    pdf = weights[:, :-1] + 1e-5
    pdf = pdf / jnp.sum(pdf, axis=-1, keepdims=True)
    cdf = _cumsum(pdf)
    N = cfg.N_samples
    if training and keys[1] is not None:
        u = jax.random.uniform(keys[1], (R, N))
    else:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, N)[None], (R, N))
    z_samples = sample_pdf(z_vals, cdf, u)

    # extra samples: near, far, N_extra picks from the refined z table
    near_col = jnp.broadcast_to(near, (R, 1))
    far_col = far
    if cfg.N_samples_extra > 0:
        M = z_vals.shape[1]
        if training and keys[2] is not None:
            idx = jax.random.permutation(keys[2], M)[: cfg.N_samples_extra]
        else:
            idx = jnp.linspace(0, M - 1, cfg.N_samples_extra).astype(jnp.int32)
        z_extra = jnp.concatenate([near_col, far_col, z_vals[:, idx]], axis=-1)
    else:
        z_extra = jnp.concatenate([near_col, far_col], axis=-1)

    z_out = jnp.sort(jnp.concatenate([z_samples, z_extra], axis=-1), axis=-1)
    # the sampler is a sampling *strategy*, not a differentiable quantity —
    # the reference evaluates it entirely under no_grad (ray_sampler.py:170);
    # cutting the gradient here keeps the whole refinement graph out of the
    # backward pass
    return jax.lax.stop_gradient(z_out)


def node_ray_interval(
    cam_loc: jnp.ndarray,  # (R, 3)
    ray_dirs: jnp.ndarray,  # (R, 3) unit
    center: jnp.ndarray,  # (R, 3) node bounding-sphere center (deform space)
    radius: jnp.ndarray,  # (R,) or scalar bounding-sphere radius
    cfg: SamplerConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray [near, far] clipped to the node's bounding sphere.

    FLOP-diet enabler (no reference counterpart — the reference samples every
    node over the full scene range, ray_sampler.py:139-141): a hand occupies
    ~1/20 of the scene-sphere chord, so sampling only the ray∩node-sphere
    segment concentrates the SAME sample budget ~20x tighter.  Rays that
    miss the sphere entirely collapse to a degenerate interval at the scene
    exit — their samples sit far from the node, contribute ~zero density,
    and the composite is unchanged.
    """
    if cfg.inverse_sphere_bg:
        scene_far = get_sphere_intersections(
            cam_loc, ray_dirs, r=cfg.scene_bounding_sphere
        )[:, 1:]
    else:
        scene_far = jnp.full((cam_loc.shape[0], 1), 2.0 * cfg.scene_bounding_sphere)
    oc = cam_loc - center
    b = jnp.sum(oc * ray_dirs, axis=-1, keepdims=True)
    disc = b * b - (
        jnp.sum(oc * oc, axis=-1, keepdims=True)
        - jnp.reshape(radius, (-1, 1)) ** 2
    )
    hit = disc > 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = jnp.clip(-b - sq, cfg.near, None)
    t1 = jnp.clip(-b + sq, cfg.near, None)
    t0 = jnp.minimum(t0, scene_far)
    t1 = jnp.minimum(t1, scene_far)
    near = jnp.where(hit & (t1 > t0), t0, scene_far)
    far = jnp.where(hit & (t1 > t0), t1, scene_far)
    return near, far


def inverse_sphere_z_vals(
    rng: jax.Array | None, num_rays: int, N: int, training: bool
) -> jnp.ndarray:
    """Background (NeRF++) inverse-depth samples in (0, 1]; (R, N).

    Parity with UniformSampler(1.0, 0.0, N, far=1.0).inverse_sample scaled by
    1/scene_bounding_sphere applied by the caller."""
    t = jnp.linspace(0.0, 1.0, N)
    z = jnp.broadcast_to(t[None], (num_rays, N))
    if training and rng is not None:
        mids = 0.5 * (z[:, 1:] + z[:, :-1])
        upper = jnp.concatenate([mids, z[:, -1:]], axis=-1)
        lower = jnp.concatenate([z[:, :1], mids], axis=-1)
        u = jax.random.uniform(rng, z.shape)
        z = lower + (upper - lower) * u
    return z
