"""On-chip correctness check for the fused Pallas KNN kernel.

CI runs the kernel only in interpret mode (tests/test_knn.py) because the
test mesh is CPU; this script executes the real Pallas lowering on the
attached TPU and asserts it matches the XLA fallback at production-like
shapes, plus reports throughput.

Usage: python scripts/check_knn_tpu.py
Exit 0 = pass.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hold_tpu.ops.knn import knn_blend_weights_pallas, knn_blend_weights_xla

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0].device_kind})")
    if backend != "tpu":
        print("SKIP: no TPU attached — interpret-mode parity is covered by CI")
        return 0

    rng = np.random.RandomState(0)
    failures = 0
    for (B, P, V, J, K) in [(2, 4096, 778, 16, 5), (10, 8192, 778, 16, 5),
                            (1, 512, 778, 16, 7)]:
        pts = jnp.asarray(rng.randn(B, P, 3) * 0.1, jnp.float32)
        verts = jnp.asarray(rng.randn(B, V, 3) * 0.1, jnp.float32)
        w = rng.rand(B, V, J).astype(np.float32)
        w /= w.sum(-1, keepdims=True)
        w = jnp.asarray(w)

        w_x, m_x = jax.jit(
            lambda a, b, c: knn_blend_weights_xla(a, b, c, K=K, max_dist=0.1)
        )(pts, verts, w)
        f_p = jax.jit(
            lambda a, b, c: knn_blend_weights_pallas(a, b, c, K=K, max_dist=0.1)
        )
        w_p, m_p = f_p(pts, verts, w)
        jax.block_until_ready(w_p)

        err = float(jnp.max(jnp.abs(w_p - w_x)))
        mm = int(jnp.sum(m_p != m_x))
        n = 20
        t0 = time.time()
        for _ in range(n):
            w_p, m_p = f_p(pts, verts, w)
        jax.block_until_ready(w_p)
        mpts = B * P * n / (time.time() - t0) / 1e6
        ok = err < 2e-2 and mm <= B * P * 0.001  # bf16 blend tolerance
        failures += 0 if ok else 1
        print(f"B{B} P{P} V{V} K{K}: max|dw|={err:.2e} mask_mismatch={mm} "
              f"{mpts:.1f} Mpts/s {'OK' if ok else 'FAIL'}")

    if failures:
        print(f"FAILED: {failures} shape(s)")
        return 1
    print("all shapes OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
