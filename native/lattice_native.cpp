// Native host components for the lattice pipeline.
//
// The adaptive-lattice builder (livae_tpu/ops/lattice.py, mirroring
// reference src/livae/data.py:410-445) dedupes ~10^4-10^5 predicted sites
// per frame by clustering all pairs within 0.35*spacing and averaging each
// cluster. The reference does this with scipy cKDTree.query_pairs + a
// Python union-find; here it is one C pass: spatial grid hash for pair
// discovery (O(N) expected) + union-find with path compression + rank,
// + centroid accumulation. Exposed via ctypes (livae_tpu/ops/native.py)
// with a scipy fallback when the shared library is not built.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cmath>
#include <vector>
#include <unordered_map>
#include <algorithm>

namespace {

struct UnionFind {
    std::vector<int32_t> parent;
    std::vector<int8_t> rank_;

    explicit UnionFind(int32_t n) : parent(n), rank_(n, 0) {
        for (int32_t i = 0; i < n; ++i) parent[i] = i;
    }

    int32_t find(int32_t x) {
        int32_t root = x;
        while (parent[root] != root) root = parent[root];
        while (parent[x] != root) {  // path compression
            int32_t next = parent[x];
            parent[x] = root;
            x = next;
        }
        return root;
    }

    void unite(int32_t a, int32_t b) {
        a = find(a);
        b = find(b);
        if (a == b) return;
        if (rank_[a] < rank_[b]) std::swap(a, b);
        parent[b] = a;
        if (rank_[a] == rank_[b]) ++rank_[a];
    }
};

inline int64_t cell_key(int64_t cx, int64_t cy) {
    return (cx << 32) ^ (cy & 0xffffffffLL);
}

}  // namespace

extern "C" {

// Cluster 2D points: union all pairs with distance < radius, then write
// per-point cluster labels (0..n_clusters-1, ordered by first occurrence)
// and cluster centroids.
//
// points:    [n, 2] float64 (y, x)
// labels:    [n] int32 out
// centroids: [n, 2] float64 out (only the first n_clusters rows are valid)
// returns:   n_clusters (or -1 on invalid input)
int32_t cluster_points(const double* points, int32_t n, double radius,
                       int32_t* labels, double* centroids) {
    if (n <= 0 || radius <= 0.0) return n <= 0 ? 0 : -1;

    const double r2 = radius * radius;
    const double inv_cell = 1.0 / radius;

    // spatial hash: cell size == radius, so neighbors within radius live in
    // the 3x3 cell neighborhood
    std::unordered_map<int64_t, std::vector<int32_t>> grid;
    grid.reserve(static_cast<size_t>(n) * 2);
    std::vector<int64_t> cx(n), cy(n);
    for (int32_t i = 0; i < n; ++i) {
        cy[i] = static_cast<int64_t>(std::floor(points[2 * i] * inv_cell));
        cx[i] = static_cast<int64_t>(std::floor(points[2 * i + 1] * inv_cell));
        grid[cell_key(cx[i], cy[i])].push_back(i);
    }

    UnionFind uf(n);
    for (int32_t i = 0; i < n; ++i) {
        const double yi = points[2 * i], xi = points[2 * i + 1];
        for (int64_t dy = -1; dy <= 1; ++dy) {
            for (int64_t dx = -1; dx <= 1; ++dx) {
                auto it = grid.find(cell_key(cx[i] + dx, cy[i] + dy));
                if (it == grid.end()) continue;
                for (int32_t j : it->second) {
                    if (j <= i) continue;  // each pair once
                    const double ddy = points[2 * j] - yi;
                    const double ddx = points[2 * j + 1] - xi;
                    if (ddy * ddy + ddx * ddx <= r2) uf.unite(i, j);  // <=: match cKDTree.query_pairs
                }
            }
        }
    }

    // stable labels by first occurrence + centroid accumulation
    std::unordered_map<int32_t, int32_t> root_to_label;
    root_to_label.reserve(n);
    int32_t n_clusters = 0;
    std::vector<int32_t> counts;
    counts.reserve(n);
    for (int32_t i = 0; i < n; ++i) {
        const int32_t root = uf.find(i);
        auto it = root_to_label.find(root);
        int32_t label;
        if (it == root_to_label.end()) {
            label = n_clusters++;
            root_to_label.emplace(root, label);
            centroids[2 * label] = 0.0;
            centroids[2 * label + 1] = 0.0;
            counts.push_back(0);
        } else {
            label = it->second;
        }
        labels[i] = label;
        centroids[2 * label] += points[2 * i];
        centroids[2 * label + 1] += points[2 * i + 1];
        ++counts[label];
    }
    for (int32_t c = 0; c < n_clusters; ++c) {
        centroids[2 * c] /= counts[c];
        centroids[2 * c + 1] /= counts[c];
    }
    return n_clusters;
}

// Label sites as atom (1) / vacancy (0): site has a detected atom within
// `threshold`. Brute force over a grid hash of atoms.
//
// sites: [n, 2] float64; atoms: [m, 2] float64; out: [n] int64
void label_sites(const double* sites, int32_t n, const double* atoms,
                 int32_t m, double threshold, int64_t* out) {
    const double t2 = threshold * threshold;
    const double inv_cell = 1.0 / std::max(threshold, 1e-12);
    std::unordered_map<int64_t, std::vector<int32_t>> grid;
    grid.reserve(static_cast<size_t>(m) * 2);
    for (int32_t j = 0; j < m; ++j) {
        const int64_t gy = static_cast<int64_t>(std::floor(atoms[2 * j] * inv_cell));
        const int64_t gx = static_cast<int64_t>(std::floor(atoms[2 * j + 1] * inv_cell));
        grid[cell_key(gx, gy)].push_back(j);
    }
    for (int32_t i = 0; i < n; ++i) {
        const double yi = sites[2 * i], xi = sites[2 * i + 1];
        const int64_t gy = static_cast<int64_t>(std::floor(yi * inv_cell));
        const int64_t gx = static_cast<int64_t>(std::floor(xi * inv_cell));
        int64_t hit = 0;
        for (int64_t dy = -1; dy <= 1 && !hit; ++dy) {
            for (int64_t dx = -1; dx <= 1 && !hit; ++dx) {
                auto it = grid.find(cell_key(gx + dx, gy + dy));
                if (it == grid.end()) continue;
                for (int32_t j : it->second) {
                    const double ddy = atoms[2 * j] - yi;
                    const double ddx = atoms[2 * j + 1] - xi;
                    if (ddy * ddy + ddx * ddx < t2) { hit = 1; break; }
                }
            }
        }
        out[i] = hit;
    }
}

}  // extern "C"
