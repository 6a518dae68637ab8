"""Pallas fused Hamming+best2 kernel vs the XLA reference path.

The kernel (ops/pallas_matching.fused_best2) must be bit-equivalent to
the XLA implementation (hamming_matrix + masked_best2 + column argmin)
including tie-breaking, masking, INF semantics, and non-aligned shapes.
Runs in interpret mode on the CPU test mesh; the same kernel compiles
natively on TPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vieo_slam_tpu.ops import matching, pallas_matching


def _xla_ref(desc_a, desc_b, mask):
    dist = matching.hamming_matrix(desc_a, desc_b)
    best_idx, best, second = matching.masked_best2(dist, mask)
    d = jnp.where(mask, dist, matching.INF)
    col_best_row = jnp.argmin(d, axis=0).astype(jnp.int32)
    return (np.asarray(best_idx), np.asarray(best), np.asarray(second),
            np.asarray(col_best_row))


def _random_case(rng, m, n, p_mask):
    da = rng.randint(0, 2 ** 32, (m, 8), np.uint64).astype(np.uint32)
    db = rng.randint(0, 2 ** 32, (n, 8), np.uint64).astype(np.uint32)
    # duplicated descriptors exercise tie-breaking
    k = min(m, n) // 3
    db[:k] = da[:k]
    mask = rng.rand(m, n) < p_mask
    return da, db, mask


@pytest.mark.parametrize("m,n,p", [
    (64, 64, 0.9),
    (200, 300, 0.5),      # non-128-aligned both dims
    (300, 150, 0.02),     # rows with zero candidates
    (257, 129, 1.0),      # just over tile boundaries
])
def test_fused_best2_matches_xla(m, n, p):
    rng = np.random.RandomState(m + n)
    da, db, mask = _random_case(rng, m, n, p)
    ref = _xla_ref(jnp.asarray(da), jnp.asarray(db), jnp.asarray(mask))
    out = pallas_matching.fused_best2(
        jnp.asarray(da), jnp.asarray(db), jnp.asarray(mask),
        tile_m=128, interpret=True)
    out = tuple(np.asarray(o) for o in out)

    row_has = mask.any(axis=1)
    np.testing.assert_array_equal(out[1], ref[1])          # best dist
    np.testing.assert_array_equal(out[2], ref[2])          # second dist
    # argmin index only defined where a candidate exists
    np.testing.assert_array_equal(out[0][row_has], ref[0][row_has])
    col_has = mask.any(axis=0)
    np.testing.assert_array_equal(out[3][col_has], ref[3][col_has])


def test_fused_best2_all_masked():
    rng = np.random.RandomState(0)
    da, db, _ = _random_case(rng, 32, 48, 1.0)
    mask = np.zeros((32, 48), bool)
    out = pallas_matching.fused_best2(
        jnp.asarray(da), jnp.asarray(db), jnp.asarray(mask), interpret=True)
    assert (np.asarray(out[1]) == (1 << 30)).all()
    assert (np.asarray(out[2]) == (1 << 30)).all()


def test_matchers_same_result_forced_pallas(monkeypatch):
    """End-to-end matcher equality with the kernel forced on (interpret)."""
    rng = np.random.RandomState(3)
    na, nb = 150, 180
    da, db, _ = _random_case(rng, na, nb, 1.0)
    va = rng.rand(na) < 0.9
    vb = rng.rand(nb) < 0.9
    ang_a = rng.rand(na).astype(np.float32) * 2 * np.pi
    ang_b = rng.rand(nb).astype(np.float32) * 2 * np.pi

    def run():
        idx, dist = matching.match_descriptors(
            jnp.asarray(da), jnp.asarray(db),
            jnp.asarray(va), jnp.asarray(vb),
            max_dist=80, ratio=0.9,
            angle_a=jnp.asarray(ang_a), angle_b=jnp.asarray(ang_b))
        return np.asarray(idx), np.asarray(dist)

    monkeypatch.delenv("VIEO_FORCE_PALLAS", raising=False)
    idx_x, dist_x = run()
    monkeypatch.setenv("VIEO_FORCE_PALLAS", "1")
    idx_p, dist_p = run()
    np.testing.assert_array_equal(idx_x, idx_p)
    np.testing.assert_array_equal(dist_x, dist_p)


@pytest.mark.parametrize("m,n", [(64, 64), (200, 300), (300, 129)])
def test_fused_projection_best2_matches_xla(m, n):
    """The in-kernel mask build (window + level + valid) must reproduce
    the XLA search_by_projection mask exactly."""
    rng = np.random.RandomState(m * 7 + n)
    da = rng.randint(0, 2 ** 32, (m, 8), np.uint64).astype(np.uint32)
    db = rng.randint(0, 2 ** 32, (n, 8), np.uint64).astype(np.uint32)
    db[: min(m, n) // 3] = da[: min(m, n) // 3]
    uv_a = rng.rand(m, 2).astype(np.float32) * [640, 480]
    uv_b = rng.rand(n, 2).astype(np.float32) * [640, 480]
    # cluster some points so windows actually overlap
    k = min(n // 2, m)
    uv_b[:k] = uv_a[:k] + rng.randn(k, 2) * 20
    lvl_a = rng.randint(0, 8, m).astype(np.int32)
    lvl_b = rng.randint(0, 8, n).astype(np.int32)
    val_a = rng.rand(m) < 0.9
    val_b = rng.rand(n) < 0.9
    r = (20.0 * 1.2 ** lvl_a).astype(np.float32)
    tol = 2

    d2 = np.sum((uv_a[:, None, :] - uv_b[None, :, :]) ** 2, -1)
    mask = ((d2 <= (r[:, None] ** 2))
            & (np.abs(lvl_b[None, :] - lvl_a[:, None]) <= tol)
            & val_a[:, None] & val_b[None, :])
    ref = _xla_ref(jnp.asarray(da), jnp.asarray(db), jnp.asarray(mask))
    out = pallas_matching.fused_projection_best2(
        jnp.asarray(da), jnp.asarray(db),
        jnp.asarray(uv_a), jnp.asarray(r), jnp.asarray(lvl_a),
        jnp.asarray(val_a),
        jnp.asarray(uv_b), jnp.asarray(lvl_b), jnp.asarray(val_b),
        float(tol), tile_m=128, interpret=True)
    out = tuple(np.asarray(o) for o in out)
    np.testing.assert_array_equal(out[1], ref[1])          # best
    np.testing.assert_array_equal(out[2], ref[2])          # second
    rows_matched = ref[1] < matching.INF
    np.testing.assert_array_equal(out[0][rows_matched],
                                  ref[0][rows_matched])    # best idx
    cols_hit = np.asarray(jnp.min(jnp.where(
        jnp.asarray(mask), matching.hamming_matrix(
            jnp.asarray(da), jnp.asarray(db)), matching.INF),
        axis=0)) < matching.INF
    np.testing.assert_array_equal(out[3][cols_hit], ref[3][cols_hit])
