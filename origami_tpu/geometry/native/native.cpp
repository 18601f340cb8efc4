// origami_tpu native geometry kernels.
//
// Role of the reference's pybind11/cppimport concaveman module
// (925 LoC C++ behind origami/concaveman) plus the numba-JIT skeleton
// tracer (origami/core/skeleton.py): a small C library exposed through
// ctypes (pybind11 is not in this image).
//
// Algorithms are the ones implemented in the Python fallbacks
// (origami_tpu/core/hull.py, origami_tpu/core/skeleton.py); this file
// exists for speed on large inputs, not different behavior.
//
// Build: make (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <queue>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// concave hull
// ---------------------------------------------------------------------------

struct Edge { int a, b; };

static inline double seg_dist(double px, double py, double ax, double ay,
                              double bx, double by) {
    double abx = bx - ax, aby = by - ay;
    double l2 = abx * abx + aby * aby;
    double t = l2 < 1e-12 ? 0.0
        : ((px - ax) * abx + (py - ay) * aby) / l2;
    t = t < 0 ? 0 : (t > 1 ? 1 : t);
    double qx = ax + t * abx, qy = ay + t * aby;
    double dx = px - qx, dy = py - qy;
    return std::sqrt(dx * dx + dy * dy);
}

// points: (n, 2) doubles; hull_idx: convex hull vertex indices (ccw);
// out_idx: result ring indices; returns ring length (<= max_out) or -1.
int concave_hull(const double* pts, int n,
                 const int* hull_idx, int hull_n,
                 double concavity, double length_threshold,
                 int* out_idx, int max_out) {
    if (n < 4 || hull_n < 3) return -1;
    std::vector<Edge> edges;
    edges.reserve(n);
    std::vector<char> used(n, 0);
    for (int i = 0; i < hull_n; i++) {
        edges.push_back({hull_idx[i], hull_idx[(i + 1) % hull_n]});
        used[hull_idx[i]] = 1;
    }
    bool changed = true;
    int rounds = 0;
    while (changed && rounds++ < 1024) {
        changed = false;
        std::vector<Edge> next;
        next.reserve(edges.size() + 8);
        for (size_t ei = 0; ei < edges.size(); ei++) {
            const Edge e = edges[ei];
            double ax = pts[2 * e.a], ay = pts[2 * e.a + 1];
            double bx = pts[2 * e.b], by = pts[2 * e.b + 1];
            double elen = std::hypot(bx - ax, by - ay);
            if (elen < length_threshold) { next.push_back(e); continue; }
            // nearest unused point to this edge
            int best = -1; double bestd = 1e30;
            for (int p = 0; p < n; p++) {
                if (used[p]) continue;
                double d = seg_dist(pts[2 * p], pts[2 * p + 1],
                                    ax, ay, bx, by);
                if (d < bestd) { bestd = d; best = p; }
            }
            bool dig = false;
            if (best >= 0 && elen / std::max(bestd, 1e-9) > concavity) {
                // closer-to-this-edge-than-any-other constraint
                double other = 1e30;
                double cx = pts[2 * best], cy = pts[2 * best + 1];
                for (size_t ej = 0; ej < edges.size(); ej++) {
                    if (ej == ei) continue;
                    const Edge& o = edges[ej];
                    double d = seg_dist(
                        cx, cy, pts[2 * o.a], pts[2 * o.a + 1],
                        pts[2 * o.b], pts[2 * o.b + 1]);
                    if (d < other) other = d;
                }
                if (bestd <= other + 1e-9) dig = true;
            }
            if (dig) {
                next.push_back({e.a, best});
                next.push_back({best, e.b});
                used[best] = 1;
                changed = true;
            } else {
                next.push_back(e);
            }
        }
        edges.swap(next);
        if ((int)edges.size() >= max_out) break;
    }
    int m = std::min((int)edges.size(), max_out);
    for (int i = 0; i < m; i++) out_idx[i] = edges[i].a;
    return m;
}

// ---------------------------------------------------------------------------
// skeleton graph tracing
// ---------------------------------------------------------------------------

// skel: (h, w) uint8 mask of a 1-px skeleton. Outputs flattened edge
// paths: every edge is a run of pixel indices (y * w + x); edge k spans
// path_data[path_off[k] .. path_off[k+1]). Returns number of edges, or
// -1 on overflow.
int trace_skeleton(const uint8_t* skel, int h, int w,
                   int32_t* path_data, int path_cap,
                   int32_t* path_off, int off_cap) {
    const int dy[8] = {-1, -1, -1, 0, 0, 1, 1, 1};
    const int dx[8] = {-1, 0, 1, -1, 1, -1, 0, 1};
    auto at = [&](int y, int x) -> bool {
        return y >= 0 && y < h && x >= 0 && x < w && skel[y * w + x];
    };
    auto degree = [&](int y, int x) {
        int d = 0;
        for (int k = 0; k < 8; k++) d += at(y + dy[k], x + dx[k]);
        return d;
    };

    std::vector<int32_t> nodes;   // pixel ids of junctions/endpoints
    std::vector<char> is_node(h * w, 0);
    int32_t first_px = -1;
    for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++)
            if (skel[y * w + x]) {
                if (first_px < 0) first_px = y * w + x;
                if (degree(y, x) != 2) {
                    is_node[y * w + x] = 1;
                    nodes.push_back(y * w + x);
                }
            }
    if (first_px < 0) return 0;
    if (nodes.empty()) {         // pure cycle
        is_node[first_px] = 1;
        nodes.push_back(first_px);
    }

    // walk from each node through degree-2 pixels
    std::vector<char> edge_done(h * w, 0); // first step pixel marker
    int n_edges = 0, n_data = 0;
    if (off_cap < 1) return -1;
    path_off[0] = 0;
    for (int32_t node : nodes) {
        int ny = node / w, nx = node % w;
        for (int k = 0; k < 8; k++) {
            int cy = ny + dy[k], cx = nx + dx[k];
            if (!at(cy, cx)) continue;
            int32_t step = cy * w + cx;
            // dedupe: an edge is identified by its first step pixel
            // unless that pixel is itself a node (short edges)
            if (!is_node[step] && edge_done[step]) continue;
            std::vector<int32_t> path;
            path.push_back(node);
            int py = ny, px = nx;
            int guard = h * w;
            while (!is_node[cy * w + cx] && guard-- > 0) {
                path.push_back(cy * w + cx);
                int fy = -1, fx = -1;
                for (int j = 0; j < 8; j++) {
                    int qy = cy + dy[j], qx = cx + dx[j];
                    if (!at(qy, qx)) continue;
                    if (qy == py && qx == px) continue;
                    // avoid stepping back onto path start immediately
                    fy = qy; fx = qx;
                    if (is_node[qy * w + qx]) break;
                }
                if (fy < 0) break;
                py = cy; px = cx; cy = fy; cx = fx;
            }
            if (is_node[cy * w + cx]) path.push_back(cy * w + cx);
            // mark interior pixels
            for (size_t t = 1; t + 1 < path.size(); t++)
                edge_done[path[t]] = 1;
            // short node-node edges: dedupe by ordering
            if (path.size() == 2 && path[0] > path[1]) continue;
            if (n_data + (int)path.size() > path_cap) return -1;
            if (n_edges + 1 >= off_cap) return -1;
            std::memcpy(path_data + n_data, path.data(),
                        path.size() * sizeof(int32_t));
            n_data += (int)path.size();
            path_off[++n_edges] = n_data;
        }
    }
    return n_edges;
}

}  // extern "C"
