"""On-chip correctness + throughput check for the fused render kernel.

CI exercises ops/fused_render.py only in interpret mode
(tests/test_fused_render.py); this script executes the real Pallas lowering
on the attached TPU, asserts it matches interpret mode at production-like
shapes, and reports points/s against the layer-by-layer XLA shade path.

Usage: python scripts/check_fused_render_tpu.py
Exit 0 = pass.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANO_SPECS = {"pose_dim": 45, "embedding": "fourier"}
OBJ_SPECS = {"pose_dim": 0, "embedding": "fourier"}


def _nets(specs, extra_in, seed):
    import jax

    from hold_tpu.models.mlp import (
        implicit_net_shapes,
        init_implicit_net,
        init_rendering_net,
        rendering_net_shapes,
        resolve_weight_norm,
    )
    from hold_tpu.utils.config import DEFAULT_CONFIG

    opt_i = DEFAULT_CONFIG["model"]["implicit_network"]
    iplan = implicit_net_shapes(opt_i, specs)
    iparams = resolve_weight_norm(
        init_implicit_net(jax.random.PRNGKey(seed), opt_i, specs)
    )
    opt_r = dict(DEFAULT_CONFIG["model"]["rendering_network"])
    opt_r["d_in"] = opt_r["d_in"] + extra_in
    rplan = rendering_net_shapes(opt_r, specs)
    rparams = resolve_weight_norm(
        init_rendering_net(jax.random.PRNGKey(seed + 7), opt_r, specs)
    )
    return iplan, iparams, rplan, rparams


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hold_tpu.ops.fused_query import embed_plan, pack_trunk_weights
    from hold_tpu.ops.fused_render import (
        frame_bias0,
        fused_hand_render,
        fused_object_render,
        pack_color_weights,
        pack_trunk_transposed,
    )
    from hold_tpu.models.mlp import _apply_linear
    from hold_tpu.utils.transforms import inverse_mat3

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0].device_kind})")
    if backend != "tpu":
        print("SKIP: no TPU attached — interpret-mode parity is covered by CI")
        return 0

    rng = np.random.RandomState(0)
    B, N, V, J, K = 2, 50176, 778, 16, 15  # ~ a 224x224 frame of points
    pts = jnp.asarray(rng.randn(B, N, 3) * 0.15, jnp.float32)
    verts_p = jnp.asarray(rng.randn(B, V, 3) * 0.12, jnp.float32)
    verts_c = jnp.asarray(rng.randn(B, V, 3) * 0.12, jnp.float32)
    w = rng.rand(B, V, J).astype(np.float32) ** 4
    w = jnp.asarray(w / w.sum(-1, keepdims=True))
    from hold_tpu.utils.rot import axis_angle_to_matrix

    aa = jnp.asarray(rng.randn(B, J, 3) * 0.3, jnp.float32)
    tfs = jnp.zeros((B, J, 4, 4)).at[..., :3, :3].set(
        axis_angle_to_matrix(aa)
    ).at[..., :3, 3].set(
        jnp.asarray(rng.randn(B, J, 3) * 0.05, jnp.float32)
    ).at[..., 3, 3].set(1.0)
    body_pose = jnp.asarray(rng.randn(B, 45) * 0.2, jnp.float32)

    iplan, iparams, rplan, rparams = _nets(MANO_SPECS, 0, 0)
    tpack = pack_trunk_weights(iparams, iplan)
    tpack_t = pack_trunk_transposed(iparams, iplan)
    cpack = pack_color_weights(rparams, iparams)
    pe = _apply_linear(rparams["lin_pose"], body_pose)
    fb0 = frame_bias0(rparams, pe)
    plan_arr = embed_plan(iplan["multires"], None)

    # small-slice parity: on-chip vs interpret
    sl = 2048
    args_small = (pts[:, :sl], verts_p, verts_c, w, tfs, plan_arr, tpack,
                  tpack_t, cpack, fb0)
    got = [np.asarray(x) for x in fused_hand_render(*args_small, K=K)]
    ref = [
        np.asarray(x)
        for x in fused_hand_render(*args_small, K=K, interpret=True)
    ]
    for name, g, r in zip(["sdf", "rgb", "nrm", "dist", "xc"], got, ref):
        err = np.abs(g - r)
        print(f"hand {name}: max|chip-interpret| = {err.max():.2e}")
        assert err.max() < 3e-2, (name, err.max())

    # throughput at frame scale
    f = jax.jit(lambda p: fused_hand_render(
        p, verts_p, verts_c, w, tfs, plan_arr, tpack, tpack_t, cpack, fb0,
        K=K,
    ))
    out = f(pts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = f(pts)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"hand fused render: {B * N / dt / 1e6:.1f} Mpts/s ({dt*1e3:.1f} ms"
          f" for {B}x{N})")

    # object kernel parity
    iplan_o, iparams_o, rplan_o, rparams_o = _nets(OBJ_SPECS, 32, 1)
    tc = jnp.asarray(rng.randn(B, 32) * 0.3, jnp.float32)
    tfs_o = tfs[:, 0]
    Rinv = inverse_mat3(tfs_o[:, :3, :3])
    tf12 = jnp.concatenate([Rinv.reshape(B, 9), tfs_o[:, :3, 3]], axis=-1)
    tpack_o = pack_trunk_weights(iparams_o, iplan_o)
    tpack_to = pack_trunk_transposed(iparams_o, iplan_o)
    cpack_o = pack_color_weights(rparams_o, iparams_o)
    fb0_o = frame_bias0(rparams_o, jnp.zeros((B, 8)), time_code=tc)
    args_o = (pts[:, :sl], tf12, plan_arr, tpack_o, tpack_to, cpack_o, fb0_o)
    got = [np.asarray(x) for x in fused_object_render(*args_o)]
    ref = [np.asarray(x) for x in fused_object_render(*args_o, interpret=True)]
    for name, g, r in zip(["sdf", "rgb", "nrm", "dist", "xc"], got, ref):
        err = np.abs(g - r)
        print(f"object {name}: max|chip-interpret| = {err.max():.2e}")
        assert err.max() < 3e-2, (name, err.max())

    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
