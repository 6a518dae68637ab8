"""Real-TPU verification of the fused Pallas Hamming+best2 kernel.

Checks fused_best2 (compiled, not interpret) against a host-side numpy
reference on random descriptor sets, then times match_descriptors through
the new dispatch at production sizes. Jit-only process (axon gotcha).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from vieo_slam_tpu.ops import matching, pallas_matching

INF = 1 << 30


def numpy_ref(da, db, mask):
    bits = np.unpackbits(da.view(np.uint8), axis=1).sum  # noqa
    # Hamming via popcount on XOR, vectorized
    x = da[:, None, :] ^ db[None, :, :]           # [M,N,8] uint32
    dist = np.zeros(x.shape[:2], np.int32)
    v = x.copy()
    for _ in range(1):
        pass
    # popcount per uint32 via byte view
    byts = x.view(np.uint8).reshape(x.shape[0], x.shape[1], -1)
    lut = np.array([bin(i).count("1") for i in range(256)], np.int32)
    dist = lut[byts].sum(-1)
    d = np.where(mask, dist, INF)
    best_idx = d.argmin(1).astype(np.int32)
    best = d.min(1)
    d2 = d.copy()
    d2[np.arange(d.shape[0]), best_idx] = INF
    second = d2.min(1)
    col_best = d.argmin(0).astype(np.int32)
    return best_idx, np.minimum(best, INF), np.minimum(second, INF), col_best


def main():
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    cases = [(1200, 1200, 0.6), (1200, 4096, 0.1), (375, 375, 0.9),
             (200, 300, 0.5)]
    fused = jax.jit(pallas_matching.fused_best2)
    for (m, n, p) in cases:
        da = rng.randint(0, 2 ** 32, (m, 8), np.uint64).astype(np.uint32)
        db = rng.randint(0, 2 ** 32, (n, 8), np.uint64).astype(np.uint32)
        k = min(m, n) // 4
        db[:k] = da[:k]
        mask = rng.rand(m, n) < p
        out = fused(jax.device_put(da), jax.device_put(db),
                    jax.device_put(mask))
        out = tuple(np.asarray(o) for o in out)
        ref = numpy_ref(da, db, mask)
        row_has = mask.any(1)
        col_has = mask.any(0)
        ok = (np.array_equal(out[1], ref[1])
              and np.array_equal(out[2], ref[2])
              and np.array_equal(out[0][row_has], ref[0][row_has])
              and np.array_equal(out[3][col_has], ref[3][col_has]))
        print(f"case m={m} n={n} p={p}: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            bad = np.nonzero(out[1] != ref[1])[0][:5]
            print("  best rows differ:", bad, out[1][bad], ref[1][bad])
            bad0 = np.nonzero(out[0][row_has] != ref[0][row_has])[0][:5]
            print("  idx rows differ:", bad0)
            badc = np.nonzero(out[3][col_has] != ref[3][col_has])[0][:5]
            print("  col rows differ:", badc)
            raise SystemExit(1)

    # fused_projection_best2: in-kernel window/level mask build
    for (m, n) in [(4096, 1200), (512, 500)]:
        da = rng.randint(0, 2 ** 32, (m, 8), np.uint64).astype(np.uint32)
        db = rng.randint(0, 2 ** 32, (n, 8), np.uint64).astype(np.uint32)
        db[: min(m, n) // 4] = da[: min(m, n) // 4]
        uv_a = (rng.rand(m, 2) * [752, 480]).astype(np.float32)
        uv_b = (rng.rand(n, 2) * [752, 480]).astype(np.float32)
        k = min(n // 2, m)
        uv_b[:k] = uv_a[:k] + rng.randn(k, 2).astype(np.float32) * 10
        lvl_a = rng.randint(0, 8, m).astype(np.int32)
        lvl_b = rng.randint(0, 8, n).astype(np.int32)
        val_a = rng.rand(m) < 0.9
        val_b = rng.rand(n) < 0.9
        r = (15.0 * 1.2 ** lvl_a).astype(np.float32)
        tol = 8
        d2 = np.sum((uv_a[:, None, :] - uv_b[None, :, :]) ** 2, -1)
        mask = ((d2 <= (r[:, None] ** 2))
                & (np.abs(lvl_b[None, :] - lvl_a[:, None]) <= tol)
                & val_a[:, None] & val_b[None, :])
        fproj = jax.jit(lambda *a: pallas_matching.fused_projection_best2(
            *a))
        out = fproj(jax.device_put(da), jax.device_put(db),
                    jax.device_put(uv_a), jax.device_put(r),
                    jax.device_put(lvl_a), jax.device_put(val_a),
                    jax.device_put(uv_b), jax.device_put(lvl_b),
                    jax.device_put(val_b),
                    jnp.asarray(float(tol), jnp.float32))
        out = tuple(np.asarray(o) for o in out)
        ref = numpy_ref(da, db, mask)
        row_has = mask.any(1)
        col_has = mask.any(0)
        ok = (np.array_equal(out[1], ref[1])
              and np.array_equal(out[2], ref[2])
              and np.array_equal(out[0][row_has], ref[0][row_has])
              and np.array_equal(out[3][col_has], ref[3][col_has]))
        print(f"proj case m={m} n={n}: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            raise SystemExit(1)

    # timing: fused kernel alone + full match_descriptors, production size
    m, n = 1200, 1200
    da = jax.device_put(
        rng.randint(0, 2 ** 32, (m, 8), np.uint64).astype(np.uint32))
    db = jax.device_put(
        rng.randint(0, 2 ** 32, (n, 8), np.uint64).astype(np.uint32))
    va = jax.device_put(np.ones(m, bool))
    vb = jax.device_put(np.ones(n, bool))
    mask = jax.device_put(np.ones((m, n), bool))

    md = jax.jit(lambda a, b, x, y: matching.match_descriptors(
        a, b, x, y, max_dist=80, ratio=0.9))

    for name, fn, args in [("fused_best2", fused, (da, db, mask)),
                           ("match_descriptors", md, (da, db, va, vb))]:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(50):
            out = jax.block_until_ready(fn(*args))
        dt = (time.time() - t0) / 50 * 1e3
        print(f"{name}: {dt:.3f} ms")

    # canary: a trivial jit afterwards must still be fast (the pathology
    # check — degraded mode would show ~75 ms here)
    f = jax.jit(lambda x: x * 2.0)
    x = jax.device_put(np.ones((8, 128), np.float32))
    jax.block_until_ready(f(x))
    t0 = time.time()
    for _ in range(20):
        jax.block_until_ready(f(x))
    print(f"canary trivial jit: {(time.time() - t0) / 20 * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
