"""Native C++ visibility-graph core vs the pure-Python implementation."""

import numpy as np
import pytest

from avlmaps_tpu.nav.native import load_native
from avlmaps_tpu.nav.visgraph import VisGraph, line_clear

pytestmark = pytest.mark.skipif(load_native() is None,
                                reason="native build unavailable")


def obstacle_map():
    m = np.ones((60, 60), np.uint8)
    m[20:40, 25:35] = 0
    m[5:10, 5:15] = 0
    return m


def test_native_enabled():
    g = VisGraph(obstacle_map(), use_native=True)
    assert g._native is not None
    assert g._native.n_edges > 0


def test_paths_match_python():
    m = obstacle_map()
    g_native = VisGraph(m, use_native=True)
    g_python = VisGraph(m, use_native=False)
    cases = [((30, 5), (30, 55)), ((5, 50), (50, 5)), ((3, 3), (58, 58)),
             ((45, 5), (5, 45))]
    for start, goal in cases:
        pn = np.asarray(g_native.shortest_path(start, goal))
        pp = np.asarray(g_python.shortest_path(start, goal))
        ln = np.sum(np.hypot(*np.diff(pn, axis=0).T))
        lp = np.sum(np.hypot(*np.diff(pp, axis=0).T))
        # identical graphs => identical optimal path lengths
        np.testing.assert_allclose(ln, lp, rtol=1e-9)
        for a, b in zip(pn[:-1], pn[1:]):
            assert line_clear(m == 0, a, b)


def test_straight_line_shortcut():
    g = VisGraph(obstacle_map(), use_native=True)
    path = g.shortest_path((50, 5), (55, 20))
    assert len(path) == 2


class TestFallbackScale:
    """Perf guard + parity for the pure-Python fallback at production map
    scale (gs≈1000) — the path taken when the C++ core fails to load."""

    def test_gs1000_build_time_and_path_parity(self):
        import time

        rng = np.random.default_rng(0)
        free = np.ones((1000, 1000), np.uint8)
        for _ in range(40):
            r, c = rng.integers(50, 950, 2)
            h, w = rng.integers(20, 80, 2)
            free[r:r + h, c:c + w] = 0

        t0 = time.perf_counter()
        vg = VisGraph(free, use_native=False)
        build_s = time.perf_counter() - t0
        assert build_s < 60, f"fallback build took {build_s:.1f}s at gs=1000"
        assert len(vg.nodes) > 100

        vgn = VisGraph(free, use_native=True)

        def plen(path):
            return sum(float(np.hypot(*(np.asarray(path[i + 1], float)
                                        - np.asarray(path[i], float))))
                       for i in range(len(path) - 1))

        p = vg.shortest_path((10, 10), (980, 980))
        pn = vgn.shortest_path((10, 10), (980, 980))
        assert p and pn
        assert abs(plen(p) - plen(pn)) < 0.05 * plen(pn)
