"""On-chip correctness check for the fused sampler-query kernels.

CI exercises ops/fused_query.py only in interpret mode (tests/
test_fused_query.py); this script executes the real Pallas lowering on the
attached TPU and asserts the z-table entry points match interpret mode at
production-like shapes, plus reports throughput.

Usage: python scripts/check_fused_tpu.py
Exit 0 = pass.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


MANO_SPECS = {"pose_dim": 45, "embedding": "fourier"}
OBJ_SPECS = {"pose_dim": 0, "embedding": "barf"}


def _implicit(specs, seed):
    import jax

    from hold_tpu.models.mlp import (
        implicit_net_shapes,
        init_implicit_net,
        resolve_weight_norm,
    )
    from hold_tpu.utils.config import DEFAULT_CONFIG

    opt = DEFAULT_CONFIG["model"]["implicit_network"]
    plan = implicit_net_shapes(opt, specs)
    params = init_implicit_net(jax.random.PRNGKey(seed), opt, specs)
    return plan, resolve_weight_norm(params)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hold_tpu.ops.fused_query import (
        embed_plan,
        fused_hand_sampler_sdf_z,
        fused_object_sampler_sdf_z,
        pack_rays8,
        pack_trunk_weights,
    )
    from hold_tpu.utils.transforms import inverse_mat3

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0].device_kind})")
    if backend != "tpu":
        print("SKIP: no TPU attached — interpret-mode parity is covered by CI")
        return 0

    rng = np.random.RandomState(0)
    B, P, S, V, J, K = 2, 512, 128, 778, 16, 15
    dirs = rng.randn(B * P, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    cam = rng.randn(B * P, 3).astype(np.float32) * 0.1
    z = jnp.asarray(np.sort(rng.rand(B, P, S) * 0.6, axis=-1), jnp.float32)
    rays8 = pack_rays8(jnp.asarray(dirs), jnp.asarray(cam), B, P, S)
    failures = 0

    # hand kernel
    plan, resolved = _implicit(MANO_SPECS, seed=0)
    pack = pack_trunk_weights(resolved, plan)
    plan_arr = embed_plan(plan["multires"], None)
    verts = jnp.asarray(rng.randn(B, V, 3) * 0.12, jnp.float32)
    w = rng.rand(B, V, J).astype(np.float32) ** 4
    w = jnp.asarray(w / w.sum(-1, keepdims=True))
    aa = rng.randn(B, J, 3) * 0.3
    tfs = []
    for b in range(B):
        per = []
        for j in range(J):
            th = np.linalg.norm(aa[b, j]) + 1e-9
            k = aa[b, j] / th
            Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                           [-k[1], k[0], 0]])
            R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = R
            T[:3, 3] = rng.randn(3) * 0.05
            per.append(T)
        tfs.append(per)
    tfs = jnp.asarray(np.asarray(tfs, np.float32))

    got = np.asarray(fused_hand_sampler_sdf_z(
        rays8, z, verts, w, tfs, plan_arr, pack, K=K))
    ref = np.asarray(fused_hand_sampler_sdf_z(
        rays8, z, verts, w, tfs, plan_arr, pack, K=K, interpret=True))
    err = np.abs(got - ref)
    ok = err.max() < 2e-2 and err.mean() < 4e-3
    print(f"hand z-kernel: max|err|={err.max():.2e} mean={err.mean():.2e} "
          f"{'OK' if ok else 'FAIL'}")
    failures += 0 if ok else 1

    t0 = time.time()
    for _ in range(5):
        jax.block_until_ready(fused_hand_sampler_sdf_z(
            rays8, z, verts, w, tfs, plan_arr, pack, K=K))
    dt = (time.time() - t0) / 5
    print(f"hand z-kernel: {B * P * S / dt / 1e6:.1f} Mpts/s")

    # object kernel
    plan_o, resolved_o = _implicit(OBJ_SPECS, seed=1)
    pack_o = pack_trunk_weights(resolved_o, plan_o)
    plan_arr_o = embed_plan(plan_o["multires"], None)
    tf1 = np.asarray(tfs)[:, 0]
    Rinv = inverse_mat3(jnp.asarray(tf1[:, :3, :3]))
    tf12 = jnp.concatenate(
        [Rinv.reshape(B, 9), jnp.asarray(tf1[:, :3, 3])], axis=-1)
    got = np.asarray(fused_object_sampler_sdf_z(
        rays8, z, tf12, plan_arr_o, pack_o))
    ref = np.asarray(fused_object_sampler_sdf_z(
        rays8, z, tf12, plan_arr_o, pack_o, interpret=True))
    err = np.abs(got - ref)
    ok = err.max() < 2e-2 and err.mean() < 4e-3
    print(f"object z-kernel: max|err|={err.max():.2e} mean={err.mean():.2e} "
          f"{'OK' if ok else 'FAIL'}")
    failures += 0 if ok else 1

    return failures


if __name__ == "__main__":
    sys.exit(main())
