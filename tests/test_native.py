"""Native odometry ring buffer: C++ vs numpy-fallback equivalence,
windowing semantics, wraparound."""

import numpy as np
import pytest

from vieo_slam_tpu.native import OdomRing, get_lib


def fill(ring, n=100, dt=0.005, t0=10.0):
    ts = t0 + np.arange(n) * dt
    vs = np.stack([np.full(n, i * 0.1, np.float32) for i in range(6)], -1)
    vs[:, 0] = np.arange(n)  # identifiable channel
    ring.push_bulk(ts, vs)
    return ts, vs


class TestOdomRing:
    def test_native_built(self):
        assert get_lib() is not None, "C++ ring should build with g++"
        r = OdomRing(256)
        assert r.native

    def test_push_and_window(self):
        r = OdomRing(1024)
        ts, vs = fill(r, 100)
        assert r.size() == 100
        assert abs(r.latest_time() - ts[-1]) < 1e-12
        vals, dts, mask, n = r.window(ts[10], ts[30], 64)
        # 20 full intervals, boundary-clipped at both ends.
        assert 19 <= n <= 21
        np.testing.assert_allclose(dts[mask].sum(), ts[30] - ts[10],
                                   atol=1e-6)

    def test_boundary_clipping(self):
        r = OdomRing(1024)
        ts, vs = fill(r, 50)
        # Window between two samples: single clipped interval.
        t0 = ts[5] + 0.001
        t1 = ts[6] - 0.001
        vals, dts, mask, n = r.window(t0, t1, 16)
        assert n == 1
        np.testing.assert_allclose(dts[0], t1 - t0, atol=1e-6)
        assert vals[0, 0] == 5  # uses the sample at interval start

    def test_wraparound(self):
        r = OdomRing(64)
        ts, vs = fill(r, 200)   # overwrites: only last 64 kept
        assert r.size() == 64
        vals, dts, mask, n = r.window(ts[150], ts[160], 32)
        assert n >= 9
        assert vals[mask][0, 0] >= 149

    def test_matches_numpy_fallback(self):
        rn = OdomRing(512)
        rp = OdomRing(512)
        rp._lib = None  # force numpy fallback
        rp._t = np.zeros(512, np.float64)
        rp._v = np.zeros((512, 6), np.float32)
        rp._n = 0
        ts, vs = fill(rn, 80)
        fill(rp, 80)
        for (a, b) in [(10.01, 10.12), (10.0, 10.4), (10.37, 10.5)]:
            va, da, ma, na = rn.window(a, b, 64)
            vb, db, mb, nb = rp.window(a, b, 64)
            assert na == nb
            np.testing.assert_allclose(da, db, atol=1e-6)
            np.testing.assert_array_equal(ma, mb)
            np.testing.assert_allclose(va, vb, atol=1e-6)

    def test_overflow_reported(self):
        r = OdomRing(1024)
        ts, vs = fill(r, 100)
        vals, dts, mask, n = r.window(ts[0], ts[-1], 16)
        assert n == 99 and mask.sum() == 16  # clamped but reported
