// Incremental covisibility graph + spanning tree for the host runtime.
//
// Semantic reference: KeyFrame::UpdateConnections / AddConnection /
// UpdateBestCovisibles and the spanning-tree maintenance
// (/root/reference/include/vi_slam/datastructures/keyframe.h:79-93,
// /root/reference/src/datastructures/keyframe.cpp). The reference keeps
// this graph inside the C++ KeyFrame objects under mutexes; here it is a
// standalone native module the Python host calls through ctypes — the
// device map stays pure arrays, and the graph bookkeeping (which is
// pointer-chasing, not math) stays native.
//
// All functions use a plain C ABI. A graph instance is an opaque handle.
// Thread-safety: single-writer (the tracking/mapping host thread), which
// matches how the pipeline sequences keyframe insertion.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct CovisGraph {
    int max_kf;
    // weights[k] : neighbor -> shared-point count
    std::vector<std::unordered_map<int32_t, int32_t>> weights;
    // point -> observing keyframes (small vectors)
    std::unordered_map<int64_t, std::vector<int32_t>> point_obs;
    std::vector<int32_t> parent;    // spanning tree (-1 root / unset)
    std::vector<uint8_t> alive;
};

CovisGraph* as_graph(void* h) { return static_cast<CovisGraph*>(h); }

}  // namespace

extern "C" {

void* covis_create(int32_t max_kf) {
    auto* g = new CovisGraph();
    g->max_kf = max_kf;
    g->weights.resize(max_kf);
    g->parent.assign(max_kf, -1);
    g->alive.assign(max_kf, 0);
    return g;
}

void covis_destroy(void* h) { delete as_graph(h); }

// Register a keyframe and the map points it observes. Updates pairwise
// weights against all prior observers of those points, sets the spanning
// tree parent to the strongest covisible earlier keyframe
// (KeyFrame::UpdateConnections semantics: parent = max-weight neighbor).
void covis_add_keyframe(void* h, int32_t kf, const int64_t* mp_ids,
                        int32_t n_ids) {
    CovisGraph* g = as_graph(h);
    if (kf < 0 || kf >= g->max_kf) return;
    g->alive[kf] = 1;
    auto& wk = g->weights[kf];
    for (int32_t i = 0; i < n_ids; ++i) {
        int64_t mp = mp_ids[i];
        if (mp < 0) continue;
        auto& obs = g->point_obs[mp];
        for (int32_t other : obs) {
            if (other == kf || !g->alive[other]) continue;
            ++wk[other];
            ++g->weights[other][kf];
        }
        if (std::find(obs.begin(), obs.end(), kf) == obs.end())
            obs.push_back(kf);
    }
    // spanning tree: strongest earlier neighbor
    int32_t best = -1, best_w = 0;
    for (const auto& kv : wk) {
        if (kv.first < kf && g->alive[kv.first] && kv.second > best_w) {
            best = kv.first;
            best_w = kv.second;
        }
    }
    if (best < 0 && kf > 0) {
        // fall back to the most recent alive keyframe
        for (int32_t k = kf - 1; k >= 0; --k)
            if (g->alive[k]) { best = k; break; }
    }
    g->parent[kf] = best;
}

// Point fusion / culling: migrate or drop observations.
void covis_remove_point(void* h, int64_t mp) {
    CovisGraph* g = as_graph(h);
    auto it = g->point_obs.find(mp);
    if (it == g->point_obs.end()) return;
    auto& obs = it->second;
    for (size_t a = 0; a < obs.size(); ++a)
        for (size_t b = a + 1; b < obs.size(); ++b) {
            int32_t ka = obs[a], kb = obs[b];
            auto da = g->weights[ka].find(kb);
            if (da != g->weights[ka].end() && --da->second <= 0)
                g->weights[ka].erase(da);
            auto db = g->weights[kb].find(ka);
            if (db != g->weights[kb].end() && --db->second <= 0)
                g->weights[kb].erase(db);
        }
    g->point_obs.erase(it);
}

// Cull a keyframe: drop its edges; children re-parent to its parent
// (KeyFrame::SetBadFlag spanning-tree repair, keyframe.cpp).
void covis_remove_keyframe(void* h, int32_t kf) {
    CovisGraph* g = as_graph(h);
    if (kf < 0 || kf >= g->max_kf || !g->alive[kf]) return;
    for (const auto& kv : g->weights[kf]) g->weights[kv.first].erase(kf);
    g->weights[kf].clear();
    for (auto& kv : g->point_obs) {
        auto& obs = kv.second;
        obs.erase(std::remove(obs.begin(), obs.end(), kf), obs.end());
    }
    int32_t new_parent = g->parent[kf];
    for (int32_t k = 0; k < g->max_kf; ++k)
        if (g->parent[k] == kf) g->parent[k] = new_parent;
    g->alive[kf] = 0;
    g->parent[kf] = -1;
}

// Weight between two keyframes (0 if none).
int32_t covis_weight(void* h, int32_t a, int32_t b) {
    CovisGraph* g = as_graph(h);
    if (a < 0 || a >= g->max_kf) return 0;
    auto it = g->weights[a].find(b);
    return it == g->weights[a].end() ? 0 : it->second;
}

// Top-N covisible neighbors of kf (GetBestCovisibilityKeyFrames). Returns
// count written; out_ids/out_w must hold n.
int32_t covis_best_neighbors(void* h, int32_t kf, int32_t n,
                             int32_t* out_ids, int32_t* out_w) {
    CovisGraph* g = as_graph(h);
    if (kf < 0 || kf >= g->max_kf) return 0;
    std::vector<std::pair<int32_t, int32_t>> v(g->weights[kf].begin(),
                                               g->weights[kf].end());
    std::sort(v.begin(), v.end(), [](auto& x, auto& y) {
        return x.second > y.second || (x.second == y.second && x.first < y.first);
    });
    int32_t m = std::min<int32_t>(n, (int32_t)v.size());
    for (int32_t i = 0; i < m; ++i) {
        out_ids[i] = v[i].first;
        out_w[i] = v[i].second;
    }
    return m;
}

// Fill the full parent array (spanning tree) — out must hold max_kf.
void covis_parents(void* h, int32_t* out) {
    CovisGraph* g = as_graph(h);
    std::memcpy(out, g->parent.data(), sizeof(int32_t) * g->max_kf);
}

// Essential-graph edge set: spanning tree + covisibility >= min_weight +
// caller-supplied loop edges are appended by the caller. Writes (i, j)
// pairs; returns count (bounded by max_edges).
int32_t covis_essential_edges(void* h, int32_t min_weight,
                              int32_t max_edges, int32_t* out_pairs) {
    CovisGraph* g = as_graph(h);
    int32_t n = 0;
    auto push = [&](int32_t a, int32_t b) {
        if (n >= max_edges) return;
        out_pairs[2 * n] = std::min(a, b);
        out_pairs[2 * n + 1] = std::max(a, b);
        ++n;
    };
    for (int32_t k = 0; k < g->max_kf; ++k) {
        if (!g->alive[k]) continue;
        if (g->parent[k] >= 0 && g->alive[g->parent[k]]) push(g->parent[k], k);
        for (const auto& kv : g->weights[k])
            if (kv.first > k && g->alive[kv.first] && kv.second >= min_weight)
                push(k, kv.first);
    }
    // dedupe (tree edges may repeat as covis edges)
    std::vector<std::pair<int32_t, int32_t>> v;
    v.reserve(n);
    for (int32_t i = 0; i < n; ++i)
        v.emplace_back(out_pairs[2 * i], out_pairs[2 * i + 1]);
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
    n = (int32_t)v.size();
    for (int32_t i = 0; i < n; ++i) {
        out_pairs[2 * i] = v[i].first;
        out_pairs[2 * i + 1] = v[i].second;
    }
    return n;
}

}  // extern "C"
