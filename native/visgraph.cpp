// Native visibility-graph core: raster line-of-sight edge construction and
// Dijkstra shortest paths over the resulting sparse graph.
//
// The reference delegates planning to pyvisgraph (pure Python polygon
// sweep + 4 worker processes, avlmaps/utils/navigation_utils.py:77-197).
// This C++ core implements the same capability for the raster design in
// avlmaps_tpu/nav/visgraph.py: the O(V^2 * L) pairwise visibility test and
// the per-query Dijkstra are the host-side hot loops, so they live here;
// Python keeps contour extraction (OpenCV) and the fallback implementation.
//
// C ABI (ctypes):
//   vg_build(obstacles, H, W, nodes, n_nodes, poly_offsets, n_polys) -> handle
//   vg_plan(handle, start, goal, out_path, max_len) -> path length (or -1)
//   vg_n_edges(handle) -> edge count (introspection/tests)
//   vg_free(handle)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct Graph {
    int h = 0, w = 0;
    std::vector<uint8_t> obstacles;          // 1 = blocked
    std::vector<double> nodes;               // (n, 2) row, col
    std::vector<std::vector<std::pair<int, double>>> adj;
    long n_edges = 0;
};

inline bool cell_blocked(const Graph& g, int r, int c) {
    if (r < 0) r = 0;
    if (c < 0) c = 0;
    if (r >= g.h) r = g.h - 1;
    if (c >= g.w) c = g.w - 1;
    return g.obstacles[static_cast<size_t>(r) * g.w + c] != 0;
}

// Segment clearance by sub-cell sampling, endpoints exempt — must match the
// Python fallback (nav/visgraph.py line_clear, step = 0.5 cells).
bool line_clear(const Graph& g, double r0, double c0, double r1, double c1) {
    const double dr = r1 - r0, dc = c1 - c0;
    const double dist = std::sqrt(dr * dr + dc * dc);
    const int n = std::max(static_cast<int>(dist / 0.5), 1);
    // samples at t = i/n for i in 1..n-1 (linspace(0,1,n+1) interior points)
    for (int i = 1; i < n; ++i) {
        const double t = static_cast<double>(i) / n;
        const int r = static_cast<int>(std::lround(r0 + t * dr));
        const int c = static_cast<int>(std::lround(c0 + t * dc));
        if (cell_blocked(g, r, c)) return false;
    }
    return true;
}

inline double node_dist(const Graph& g, int i, int j) {
    const double dr = g.nodes[2 * i] - g.nodes[2 * j];
    const double dc = g.nodes[2 * i + 1] - g.nodes[2 * j + 1];
    return std::sqrt(dr * dr + dc * dc);
}

}  // namespace

extern "C" {

void* vg_build(const uint8_t* obstacles, int h, int w, const double* nodes,
               int n_nodes, const int* poly_offsets, int n_polys) {
    auto* g = new Graph();
    g->h = h;
    g->w = w;
    g->obstacles.assign(obstacles, obstacles + static_cast<size_t>(h) * w);
    g->nodes.assign(nodes, nodes + static_cast<size_t>(n_nodes) * 2);
    g->adj.assign(n_nodes, {});

    auto add_edge = [&](int i, int j) {
        const double d = node_dist(*g, i, j);
        g->adj[i].push_back({j, d});
        g->adj[j].push_back({i, d});
        ++g->n_edges;
    };

    // boundary edges: consecutive contour vertices, clearance-checked
    // (approxPolyDP chords can cut concave corners; blocked chords are
    // recovered through visibility edges) — must match nav/visgraph.py
    for (int p = 0; p < n_polys; ++p) {
        const int lo = poly_offsets[p];
        const int hi = poly_offsets[p + 1];
        const int n = hi - lo;
        for (int k = 0; k < n; ++k) {
            const int a = lo + k, b = lo + (k + 1) % n;
            if (line_clear(*g, g->nodes[2 * a], g->nodes[2 * a + 1],
                           g->nodes[2 * b], g->nodes[2 * b + 1]))
                add_edge(a, b);
        }
    }

    // visibility edges between all remaining pairs (cross-polygon
    // neighbours included)
    for (int i = 0; i < n_nodes; ++i) {
        std::vector<uint8_t> is_nb(n_nodes, 0);
        for (const auto& e : g->adj[i]) is_nb[e.first] = 1;
        for (int j = i + 1; j < n_nodes; ++j) {
            if (is_nb[j]) continue;
            if (line_clear(*g, g->nodes[2 * i], g->nodes[2 * i + 1],
                           g->nodes[2 * j], g->nodes[2 * j + 1]))
                add_edge(i, j);
        }
    }
    return g;
}

long vg_n_edges(void* handle) {
    return static_cast<Graph*>(handle)->n_edges;
}

// Plan start -> goal; writes (row, col) pairs into out_path.
// Returns number of waypoints written, or -1 if no path / overflow.
int vg_plan(void* handle, double sr, double sc, double gr, double gc,
            double* out_path, int max_len) {
    Graph& g = *static_cast<Graph*>(handle);
    const int n = static_cast<int>(g.adj.size());

    if (line_clear(g, sr, sc, gr, gc)) {
        if (max_len < 2) return -1;
        out_path[0] = sr; out_path[1] = sc;
        out_path[2] = gr; out_path[3] = gc;
        return 2;
    }

    // virtual nodes n (start) and n+1 (goal)
    const int S = n, G = n + 1;
    std::vector<std::vector<std::pair<int, double>>> extra(2);
    for (int i = 0; i < n; ++i) {
        const double nr = g.nodes[2 * i], nc = g.nodes[2 * i + 1];
        if (line_clear(g, sr, sc, nr, nc)) {
            const double dr = nr - sr, dc = nc - sc;
            extra[0].push_back({i, std::sqrt(dr * dr + dc * dc)});
        }
        if (line_clear(g, gr, gc, nr, nc)) {
            const double dr = nr - gr, dc = nc - gc;
            extra[1].push_back({i, std::sqrt(dr * dr + dc * dc)});
        }
    }
    if (extra[0].empty() || extra[1].empty()) return -1;

    std::vector<double> dist(n + 2, 1e30);
    std::vector<int> prev(n + 2, -1);
    using QE = std::pair<double, int>;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> heap;
    dist[S] = 0.0;
    heap.push({0.0, S});
    auto neighbors = [&](int u) -> const std::vector<std::pair<int, double>>& {
        if (u == S) return extra[0];
        return g.adj[u];
    };
    while (!heap.empty()) {
        auto [d, u] = heap.top();
        heap.pop();
        if (d > dist[u]) continue;
        if (u == G) break;
        for (const auto& [v, w] : neighbors(u)) {
            if (d + w < dist[v]) {
                dist[v] = d + w;
                prev[v] = u;
                heap.push({dist[v], v});
            }
        }
        if (u != S) {
            // goal edges: node u may connect to G
            for (const auto& [v, w] : extra[1]) {
                if (v == u && d + w < dist[G]) {
                    dist[G] = d + w;
                    prev[G] = u;
                    heap.push({dist[G], G});
                }
            }
        }
    }
    if (dist[G] >= 1e30) return -1;

    std::vector<int> chain;
    for (int u = G; u != -1; u = prev[u]) chain.push_back(u);
    const int len = static_cast<int>(chain.size());
    if (len > max_len) return -1;
    for (int k = 0; k < len; ++k) {
        const int u = chain[len - 1 - k];
        if (u == S) {
            out_path[2 * k] = sr; out_path[2 * k + 1] = sc;
        } else if (u == G) {
            out_path[2 * k] = gr; out_path[2 * k + 1] = gc;
        } else {
            out_path[2 * k] = g.nodes[2 * u];
            out_path[2 * k + 1] = g.nodes[2 * u + 1];
        }
    }
    return len;
}

void vg_free(void* handle) { delete static_cast<Graph*>(handle); }

}  // extern "C"
