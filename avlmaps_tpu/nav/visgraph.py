"""Visibility-graph planning over raster obstacle maps.

The reference delegates to pyvisgraph (polygon visibility graph + Dijkstra,
avlmaps/utils/navigation_utils.py:77-197).  This is a from-scratch planner
built for the raster maps we actually have: obstacle contours (simplified
with approxPolyDP) provide the node set, visibility is checked directly
against the obstacle raster (supercover line sampling — no polygon edge
cases), and shortest paths run Dijkstra over the resulting sparse graph.
Consecutive contour vertices are always connected so paths can hug obstacle
boundaries.
"""

from __future__ import annotations

import heapq
import warnings
from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def line_clear(obstacles: np.ndarray, a, b, step: float = 0.5) -> bool:
    """True if the segment a->b crosses no obstacle cell.

    ``obstacles``: bool (H, W), True = blocked.  Samples the segment at
    sub-cell resolution (supercover-ish); endpoints are exempted so nodes
    touching the boundary still connect outward.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    dist = float(np.hypot(*(b - a)))
    n = max(int(dist / step), 1)
    ts = np.linspace(0.0, 1.0, n + 1)[1:-1]
    if ts.size == 0:
        return True
    pts = a[None, :] + ts[:, None] * (b - a)[None, :]
    rows = np.clip(np.round(pts[:, 0]).astype(int), 0,
                   obstacles.shape[0] - 1)
    cols = np.clip(np.round(pts[:, 1]).astype(int), 0,
                   obstacles.shape[1] - 1)
    return not obstacles[rows, cols].any()


class VisGraph:
    """Visibility graph over a binary obstacle map (1 free, 0 occupied)."""

    def __init__(self, obs_map: np.ndarray, simplify_eps: float = 2.0,
                 use_internal_contours: Optional[bool] = None,
                 use_native: bool = True):
        if cv2 is None:
            raise RuntimeError("OpenCV required for contour extraction")
        self.obs_map = np.asarray(obs_map)
        self.obstacles = self.obs_map == 0
        # contour nodes live one dilation ring outside the obstacles so they
        # sit in free space
        inflated = cv2.dilate(self.obstacles.astype(np.uint8),
                              np.ones((3, 3), np.uint8))
        # ALWAYS the full hierarchy: on maps whose border is blocked (the
        # common crop shape) every interior obstacle is a child of the
        # border contour's hole, and RETR_EXTERNAL silently drops them all
        # — the graph ends up node-less and every plan degenerates to the
        # straight line.  For a raster planner extra hole-contour nodes are
        # just more waypoint candidates (visibility is checked against the
        # raster), so the reference's internal-contour distinction
        # (navigation_utils.py:84-86) costs nothing to include always;
        # ``use_internal_contours`` is kept for API compatibility.
        if use_internal_contours is False:
            warnings.warn(
                "use_internal_contours=False is deprecated and ignored: "
                "RETR_EXTERNAL drops every obstacle nested inside a blocked "
                "border contour, so the full hierarchy is always used",
                DeprecationWarning, stacklevel=2)
        contours, _ = cv2.findContours(inflated, cv2.RETR_TREE,
                                       cv2.CHAIN_APPROX_NONE)
        self.polys: List[np.ndarray] = []
        for c in contours:
            poly = self._traversable_poly(c, simplify_eps)
            if len(poly) >= 2:
                self.polys.append(poly)

        self.nodes: List[np.ndarray] = [p for poly in self.polys
                                        for p in poly]
        self._adj: Dict[int, List[Tuple[int, float]]] = {
            i: [] for i in range(len(self.nodes))}

        # native C++ core (edge construction + Dijkstra) when available;
        # pure-Python fallback otherwise (identical clearance semantics)
        self._native = None
        if use_native and self.nodes:
            try:
                from avlmaps_tpu.nav.native import NativeVisGraph

                offsets = np.cumsum([0] + [len(p) for p in self.polys])
                self._native = NativeVisGraph(
                    self.obstacles.astype(np.uint8),
                    np.asarray(self.nodes, np.float64), offsets)
            except Exception:
                self._native = None
        if self._native is None:
            self._build_edges()

    # -- construction -------------------------------------------------------

    def _traversable_poly(self, contour, eps: float) -> np.ndarray:
        """approxPolyDP + traversability refinement.

        Plain Douglas-Peucker trims convex extremities (a disc simplifies
        to 4-8 chords), so the vertex a taut path must turn at can simply
        not exist — measured as a 1.7x optimality ratio on randomized maps
        (tools/planner_eval.py) before this fix.  Remedy: wherever a chord
        between consecutive kept vertices crosses an obstacle, re-insert
        the dropped contour point farthest from that chord (the DP split
        point) until every boundary chord is traversable.  Result: near
        the obstacle the polygon is exactly as dense as tautness requires,
        and elsewhere as sparse as eps allows.
        """
        ring = contour.reshape(-1, 2)[:, ::-1].astype(np.float64)  # (r, c)
        n = len(ring)
        if n < 3:
            return ring
        approx = cv2.approxPolyDP(contour, eps, True).reshape(-1, 2)
        approx_rc = approx[:, ::-1].astype(np.float64)
        # map kept vertices back to ring indices (DP keeps input points;
        # CHAIN_APPROX_NONE gives the dense ring so every vertex matches)
        where = {tuple(p): i for i, p in enumerate(map(tuple, ring))}
        idxs = sorted({where[tuple(p)] for p in map(tuple, approx_rc)
                       if tuple(p) in where})
        if len(idxs) < 2:
            idxs = sorted({0, n // 2})
        free_vertex = ~self.obstacles[ring[:, 0].astype(int),
                                      ring[:, 1].astype(int)]
        for _ in range(32):  # each pass splits every blocked chord once
            new_idxs = []
            changed = False
            for k, a in enumerate(idxs):
                b = idxs[(k + 1) % len(idxs)]
                new_idxs.append(a)
                arc = (b - a) % n
                if arc <= 1:
                    continue
                # vertices on blocked cells (obstacles hugging the image
                # edge, where the dilation ring has nowhere free to sit)
                # can never be taut turn points — don't densify there
                if not (free_vertex[a] and free_vertex[b]):
                    continue
                if line_clear(self.obstacles, ring[a], ring[b]):
                    continue
                # farthest-from-chord point on the dropped arc (DP's own
                # split criterion), as a ring index strictly inside (a, b)
                ts = (np.arange(1, arc)) % n
                pts = ring[(a + ts) % n]
                ab = (ring[b] - ring[a])
                ab = ab / (np.hypot(*ab) or 1.0)
                rel = pts - ring[a]
                d = np.abs(ab[0] * rel[:, 1] - ab[1] * rel[:, 0])
                new_idxs.append((a + 1 + int(np.argmax(d))) % n)
                changed = True
            idxs = sorted(set(new_idxs))
            if not changed:
                break
        # keep only vertices standing on free cells of the ORIGINAL raster:
        # the dilation ring is free by construction around interior
        # obstacles, but contour sections along a blocked image border are
        # not — those vertices can never connect and only bloat the O(V^2)
        # edge pass
        idxs = [i for i in idxs if free_vertex[i]]
        return ring[idxs]

    def _add_edge(self, i: int, j: int):
        d = float(np.hypot(*(self.nodes[i] - self.nodes[j])))
        self._adj[i].append((j, d))
        self._adj[j].append((i, d))

    def _lines_clear_batch(self, a_pts: np.ndarray, b_pts: np.ndarray,
                           step: float = 0.5,
                           chunk: int = 4096) -> np.ndarray:
        """Vectorised :func:`line_clear` over P segment pairs at once.

        Same semantics (0.5-cell sampling with ~0.5-cell endpoint
        exemption), but one numpy gather per length-sorted chunk instead of
        a Python loop per pair — the fallback path was O(V²·L) in
        interpreter time and is now O(V²·L) in vectorised memory ops
        (~100x on a gs≈1000 obstacle map).
        """
        a_pts = np.asarray(a_pts, np.float32)
        b_pts = np.asarray(b_pts, np.float32)
        p = a_pts.shape[0]
        clear = np.ones(p, bool)
        if p == 0:
            return clear
        d = np.hypot(*(b_pts - a_pts).T)
        order = np.argsort(d)
        hgt, wid = self.obstacles.shape
        # linearised blocked lookup: one fused gather per chunk
        blocked_flat = np.ascontiguousarray(self.obstacles.reshape(-1))
        for s0 in range(0, p, chunk):
            sel = order[s0:s0 + chunk]
            dmax = float(d[sel].max())
            n = max(int(dmax / step), 1)
            ts = np.linspace(0.0, 1.0, n + 1, dtype=np.float32)[1:-1]
            if ts.size == 0:
                continue
            a, b = a_pts[sel], b_pts[sel]
            rows = np.clip(np.rint(a[:, 0:1] + ts[None, :]
                                   * (b[:, 0:1] - a[:, 0:1])), 0,
                           hgt - 1).astype(np.intp)
            cols = np.clip(np.rint(a[:, 1:2] + ts[None, :]
                                   * (b[:, 1:2] - a[:, 1:2])), 0,
                           wid - 1).astype(np.intp)
            hit = blocked_flat[rows * wid + cols]
            # endpoint exemption: ignore samples within ~half a cell of
            # either node (matches line_clear's first/last sample spacing)
            arc = ts[None, :] * d[sel][:, None]
            inside = (arc >= 0.49) & ((d[sel][:, None] - arc) >= 0.49)
            clear[sel] = ~(hit & inside).any(axis=1)
        return clear

    def _build_edges(self):
        # boundary edges: consecutive vertices of each contour — but only if
        # the chord is clear (approxPolyDP chords can cut into concave
        # obstacle corners); blocked chords are recovered by visibility edges
        nodes = np.asarray(self.nodes, np.float64)
        boundary = []
        offset = 0
        for poly in self.polys:
            n = len(poly)
            boundary.extend((offset + k, offset + (k + 1) % n)
                            for k in range(n))
            offset += n
        # visibility edges between all node pairs (cross-polygon neighbours
        # included), batched through one vectorised clearance test
        n_nodes = len(self.nodes)
        iu, ju = np.triu_indices(n_nodes, k=1)
        pairs = list(zip(iu.tolist(), ju.tolist()))
        bset = {(min(a, b), max(a, b)) for a, b in boundary if a != b}
        all_pairs = list(bset) + [pq for pq in pairs if pq not in bset]
        all_pairs = np.asarray(all_pairs, np.intp).reshape(-1, 2)
        clear = self._lines_clear_batch(nodes[all_pairs[:, 0]],
                                        nodes[all_pairs[:, 1]])
        for (i, j), ok in zip(all_pairs, clear):
            if ok:
                self._add_edge(int(i), int(j))

    # -- queries ------------------------------------------------------------

    def point_in_obstacle(self, p) -> bool:
        r, c = int(p[0]), int(p[1])
        if not (0 <= r < self.obstacles.shape[0]
                and 0 <= c < self.obstacles.shape[1]):
            return True
        return bool(self.obstacles[r, c])

    def nearest_free(self, p) -> Tuple[int, int]:
        """Nearest free cell to p (the reference's in-obstacle start recovery,
        navigation_utils.py:158-166)."""
        rows, cols = np.where(~self.obstacles)
        d2 = (rows - p[0]) ** 2 + (cols - p[1]) ** 2
        k = int(np.argmin(d2))
        return int(rows[k]), int(cols[k])

    def _connect_point(self, p) -> List[Tuple[int, float]]:
        out = []
        p = np.asarray(p, np.float64)
        for i, node in enumerate(self.nodes):
            if line_clear(self.obstacles, p, node):
                out.append((i, float(np.hypot(*(p - node)))))
        return out

    def shortest_path(self, start, goal) -> List[List[float]]:
        """Euclidean-shortest obstacle-avoiding path start -> goal, both
        (row, col); returns the waypoint list including both endpoints."""
        start = tuple(map(float, start))
        goal = tuple(map(float, goal))
        if self._native is not None:
            path = self._native.plan(start, goal)
            if path is not None:
                return path
            return [list(start), list(goal)]
        if line_clear(self.obstacles, start, goal):
            return [list(start), list(goal)]

        n = len(self.nodes)
        s_edges = self._connect_point(start)
        g_edges = self._connect_point(goal)
        if not s_edges or not g_edges:
            return [list(start), list(goal)]  # degenerate: no visibility

        dist = np.full(n + 2, np.inf)
        prev = np.full(n + 2, -1, np.int64)
        S, G = n, n + 1
        dist[S] = 0.0
        heap = [(0.0, S)]
        adj = {i: list(v) for i, v in self._adj.items()}
        adj[S] = list(s_edges)
        adj[G] = []
        for i, d in g_edges:
            adj.setdefault(i, []).append((G, d))
        while heap:
            d, u = heapq.heappop(heap)
            if d > dist[u]:
                continue
            if u == G:
                break
            for v, w in adj.get(u, []):
                nd = d + w
                if nd < dist[v]:
                    dist[v] = nd
                    prev[v] = u
                    heapq.heappush(heap, (nd, v))
        if not np.isfinite(dist[G]):
            return [list(start), list(goal)]
        path = []
        u = G
        while u != -1:
            if u == S:
                path.append(list(start))
            elif u == G:
                path.append(list(goal))
            else:
                path.append(list(self.nodes[u]))
            u = int(prev[u])
        return path[::-1]


def carve_escape_corridor(obs_map: np.ndarray, point,
                          width: int = 5) -> np.ndarray:
    """Free a corridor from ``point``'s free pocket to the main free region.

    The reference's escape logic (navigation_utils.py:88-98): when the
    robot stands in a free pocket sealed inside an obstacle ring (an
    internal contour — e.g. a mapping artifact walls it in), it draws a
    width-5 FREE line between the closest points of the two contours so
    the planner can exit.  Raster equivalent: connected components of
    free space; if the point's component is not the largest one, carve a
    straight free corridor between the closest (pocket, main) cell pair.
    Returns the carved copy (input untouched); no-op when already
    connected.
    """
    free = (np.asarray(obs_map) != 0).astype(np.uint8)
    n_lbl, labels = cv2.connectedComponents(free, connectivity=8)
    r, c = int(point[0]), int(point[1])
    if free[r, c] == 0:  # point itself on an obstacle: use nearest free
        rows, cols = np.where(free > 0)
        k = int(np.argmin((rows - r) ** 2 + (cols - c) ** 2))
        r, c = int(rows[k]), int(cols[k])
    lbl = labels[r, c]
    sizes = np.bincount(labels.ravel(), minlength=n_lbl)
    sizes[0] = 0  # background (obstacles)
    main = int(np.argmax(np.where(np.arange(n_lbl) == lbl, 0, sizes)))
    if main == 0 or main == lbl or sizes[main] == 0 \
            or sizes[main] < sizes[lbl]:
        # the point's component IS the largest free region: nothing to
        # escape from.  Without this check any unreachable sealed pocket
        # elsewhere on the map (common mapping noise) became the carve
        # target and a width-5 FREE strip was drawn through real walls.
        # Strict comparison: when the pocket exactly TIES the largest
        # other component the robot is still sealed — carve anyway.
        return np.asarray(obs_map)
    pocket = np.argwhere(labels == lbl)
    dist = cv2.distanceTransform((labels != main).astype(np.uint8),
                                 cv2.DIST_L2, 3)
    pa = pocket[int(np.argmin(dist[pocket[:, 0], pocket[:, 1]]))]
    main_px = np.argwhere(labels == main)
    pb = main_px[int(np.argmin((main_px[:, 0] - pa[0]) ** 2
                               + (main_px[:, 1] - pa[1]) ** 2))]
    carved = free.copy()
    cv2.line(carved, (int(pa[1]), int(pa[0])), (int(pb[1]), int(pb[0])),
             1, width)
    return carved


def build_visgraph_with_obs_map(obs_map: np.ndarray,
                                use_internal_contour: bool = False,
                                internal_point=None,
                                vis: bool = False) -> VisGraph:
    """Reference-named constructor (navigation_utils.py:77-119).

    ``use_internal_contour`` + ``internal_point``: when the point sits in
    a free pocket sealed off from the main free region, an escape corridor
    is carved first (reference :88-98 draws a width-5 free line between
    the enclosing contours) and the graph is built on the carved map
    (exposed as ``graph.obs_map``); otherwise internal contours are simply
    included as node sources — the raster planner handles visibility
    inside pockets directly.
    """
    if use_internal_contour and internal_point is not None:
        obs_map = carve_escape_corridor(obs_map, internal_point)
    return VisGraph(obs_map)  # param ignored: full hierarchy always used


def plan_to_pos_v2(start, goal, obstacles: np.ndarray,
                   graph: Optional[VisGraph] = None,
                   vis: bool = False) -> List[List[float]]:
    """Plan on a cropped obstacle map (reference navigation_utils.py:130-197):
    recover from in-obstacle start (nearest free cell prepended) and
    in-obstacle goal (clamped to nearest free cell)."""
    if graph is None:
        graph = VisGraph(obstacles)
    path_prefix: List[List[float]] = []
    s = list(map(float, start))
    if obstacles[int(s[0]), int(s[1])] == 0:
        ns = graph.nearest_free(s)
        path_prefix.append(list(map(float, ns)))
        s = list(map(float, ns))
    g = list(map(float, goal))
    if obstacles[int(g[0]), int(g[1])] == 0:
        g = list(map(float, graph.nearest_free(g)))
    return path_prefix + graph.shortest_path(s, g)
