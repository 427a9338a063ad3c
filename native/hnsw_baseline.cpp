// Single-threaded CPU HNSW baseline (VERDICT r2 item 10).
//
// The image has no hnswlib wheel, so this is a from-scratch, -O3
// hnswlib-style HNSW (geometric levels, m/m0=2m links, heuristic
// neighbor selection, ef-bounded best-first search) measured on this
// host to ground bench.py's `vs_baseline` in a number actually produced
// here instead of a literature figure. Algorithm parameters follow the
// reference's defaults (vector_index_writer.rs:54-55: m=16,
// ef_construct=100; hnsw.rs:108: ef = 4*k).
//
// Build:  g++ -O3 -march=native -std=c++17 -o hnsw_baseline hnsw_baseline.cpp
// Run:    ./hnsw_baseline <n> <dim> <k> <n_queries> [m] [ef_c] [ef_s]
// Prints one JSON line: build_s, qps, recall@k vs exact scan.

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <queue>
#include <random>
#include <vector>

static int DIM;

static inline float l2sq(const float* a, const float* b) {
    float s = 0.f;
    for (int i = 0; i < DIM; i++) {
        float d = a[i] - b[i];
        s += d * d;
    }
    return s;
}

struct HNSW {
    int m, m0, ef_c;
    float level_mult;
    std::vector<float> data;              // n x DIM
    std::vector<std::vector<std::vector<uint32_t>>> links;  // [lvl][node]
    std::vector<int> node_level;
    uint32_t entry = 0;
    int max_level = -1;
    std::mt19937 rng{42};
    std::vector<uint32_t> visited_stamp;
    uint32_t stamp = 0;

    const float* vec(uint32_t i) const { return &data[(size_t)i * DIM]; }

    // ef-bounded best-first search on one level; returns max-heap of
    // (dist, id) candidates (worst on top), size <= ef.
    void search_level(const float* q, uint32_t ep, int level, int ef,
                      std::priority_queue<std::pair<float, uint32_t>>& top) {
        stamp++;
        std::priority_queue<std::pair<float, uint32_t>,
                            std::vector<std::pair<float, uint32_t>>,
                            std::greater<>> cand;
        float d0 = l2sq(q, vec(ep));
        cand.push({d0, ep});
        top.push({d0, ep});
        visited_stamp[ep] = stamp;
        while (!cand.empty()) {
            auto [d, u] = cand.top();
            if (d > top.top().first && (int)top.size() >= ef) break;
            cand.pop();
            for (uint32_t v : links[level][u]) {
                if (visited_stamp[v] == stamp) continue;
                visited_stamp[v] = stamp;
                float dv = l2sq(q, vec(v));
                if ((int)top.size() < ef || dv < top.top().first) {
                    cand.push({dv, v});
                    top.push({dv, v});
                    if ((int)top.size() > ef) top.pop();
                }
            }
        }
    }

    // hnswlib heuristic: keep a candidate only if it is closer to q than
    // to every already-selected neighbor.
    std::vector<uint32_t> select_heuristic(
        std::vector<std::pair<float, uint32_t>>& cand, int mm) {
        std::sort(cand.begin(), cand.end());
        std::vector<uint32_t> out;
        for (auto& [d, id] : cand) {
            if ((int)out.size() >= mm) break;
            bool ok = true;
            for (uint32_t s : out)
                if (l2sq(vec(id), vec(s)) < d) { ok = false; break; }
            if (ok) out.push_back(id);
        }
        return out;
    }

    void build(const float* x, int n) {
        data.assign(x, x + (size_t)n * DIM);
        node_level.resize(n);
        visited_stamp.assign(n, 0);
        std::uniform_real_distribution<double> U(0.0, 1.0);
        for (int i = 0; i < n; i++) {
            double r = U(rng);
            node_level[i] = (int)(-std::log(std::max(r, 1e-12)) * level_mult);
        }
        int top_l = *std::max_element(node_level.begin(), node_level.end());
        links.resize(top_l + 1);
        for (int l = 0; l <= top_l; l++) links[l].resize(n);
        for (int i = 0; i < n; i++) insert(i);
    }

    void insert(uint32_t id) {
        int lvl = node_level[id];
        if (max_level < 0) {
            entry = id;
            max_level = lvl;
            return;
        }
        const float* q = vec(id);
        uint32_t ep = entry;
        // greedy descent above the insertion level
        for (int l = max_level; l > lvl; l--) {
            bool moved = true;
            float d = l2sq(q, vec(ep));
            while (moved) {
                moved = false;
                for (uint32_t v : links[l][ep]) {
                    float dv = l2sq(q, vec(v));
                    if (dv < d) { d = dv; ep = v; moved = true; }
                }
            }
        }
        for (int l = std::min(lvl, max_level); l >= 0; l--) {
            std::priority_queue<std::pair<float, uint32_t>> top;
            search_level(q, ep, l, ef_c, top);
            std::vector<std::pair<float, uint32_t>> cand;
            while (!top.empty()) { cand.push_back(top.top()); top.pop(); }
            int mm = l == 0 ? m0 : m;
            auto nbrs = select_heuristic(cand, mm);
            links[l][id] = nbrs;
            for (uint32_t v : nbrs) {
                auto& lv = links[l][v];
                lv.push_back(id);
                if ((int)lv.size() > mm) {
                    std::vector<std::pair<float, uint32_t>> c2;
                    c2.reserve(lv.size());
                    for (uint32_t w : lv) c2.push_back({l2sq(vec(v), vec(w)), w});
                    lv = select_heuristic(c2, mm);
                }
            }
            if (!cand.empty()) ep = cand.front().second;
        }
        if (lvl > max_level) { max_level = lvl; entry = id; }
    }

    std::vector<uint32_t> search(const float* q, int k, int ef) {
        uint32_t ep = entry;
        for (int l = max_level; l > 0; l--) {
            bool moved = true;
            float d = l2sq(q, vec(ep));
            while (moved) {
                moved = false;
                for (uint32_t v : links[l][ep]) {
                    float dv = l2sq(q, vec(v));
                    if (dv < d) { d = dv; ep = v; moved = true; }
                }
            }
        }
        std::priority_queue<std::pair<float, uint32_t>> top;
        search_level(q, ep, 0, std::max(ef, k), top);
        std::vector<std::pair<float, uint32_t>> out;
        while (!top.empty()) { out.push_back(top.top()); top.pop(); }
        std::sort(out.begin(), out.end());
        std::vector<uint32_t> ids;
        for (int i = 0; i < k && i < (int)out.size(); i++)
            ids.push_back(out[i].second);
        return ids;
    }
};

int main(int argc, char** argv) {
    int n = argc > 1 ? atoi(argv[1]) : 1000000;
    DIM = argc > 2 ? atoi(argv[2]) : 128;
    int k = argc > 3 ? atoi(argv[3]) : 10;
    int nq = argc > 4 ? atoi(argv[4]) : 200;
    int m = argc > 5 ? atoi(argv[5]) : 16;
    int ef_c = argc > 6 ? atoi(argv[6]) : 100;
    int ef_s = argc > 7 ? atoi(argv[7]) : 4 * k;

    std::mt19937 rng(7);
    std::normal_distribution<float> N(0.f, 1.f);
    // gaussian-mixture corpus (64 centers, the ivf_bench/bench.py shape):
    // pure iid gaussian is the degenerate worst case for graph ANN
    // (near-equidistant points), not a realistic SIFT-like distribution
    const int n_centers = 64;
    std::vector<float> centers((size_t)n_centers * DIM);
    for (auto& v : centers) v = 4.0f * N(rng);
    std::uniform_int_distribution<int> pickc(0, n_centers - 1);
    std::vector<float> x((size_t)n * DIM);
    for (int i = 0; i < n; i++) {
        int c = pickc(rng);
        for (int d = 0; d < DIM; d++)
            x[(size_t)i * DIM + d] = centers[(size_t)c * DIM + d] + N(rng);
    }
    std::vector<float> qs((size_t)nq * DIM);
    std::uniform_int_distribution<int> pick(0, n - 1);
    for (int i = 0; i < nq; i++) {
        int src = pick(rng);
        for (int d = 0; d < DIM; d++)
            qs[(size_t)i * DIM + d] = x[(size_t)src * DIM + d] + 0.05f * N(rng);
    }

    if (argc > 8) {
        // dump corpus/queries so the TPU bulk build can run on IDENTICAL
        // data (apples-to-apples build-quality table, VERDICT r3 item 5)
        char path[512];
        snprintf(path, sizeof path, "%s.data.f32", argv[8]);
        FILE* f = fopen(path, "wb");
        fwrite(x.data(), sizeof(float), x.size(), f); fclose(f);
        snprintf(path, sizeof path, "%s.queries.f32", argv[8]);
        f = fopen(path, "wb");
        fwrite(qs.data(), sizeof(float), qs.size(), f); fclose(f);
    }

    HNSW h;
    h.m = m; h.m0 = 2 * m; h.ef_c = ef_c;
    h.level_mult = 1.0 / std::log((double)m);
    auto t0 = std::chrono::steady_clock::now();
    h.build(x.data(), n);
    double build_s = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();

    // exact ground truth (brute force per query)
    std::vector<std::vector<uint32_t>> truth(nq);
    for (int i = 0; i < nq; i++) {
        const float* q = &qs[(size_t)i * DIM];
        std::vector<std::pair<float, uint32_t>> all(n);
        for (int j = 0; j < n; j++) all[j] = {l2sq(q, h.vec(j)), (uint32_t)j};
        std::partial_sort(all.begin(), all.begin() + k, all.end());
        for (int j = 0; j < k; j++) truth[i].push_back(all[j].second);
    }

    // ef sweep: one build serves every operating point (search is cheap)
    std::vector<int> efs;
    if (ef_s > 0) efs = {ef_s};
    else efs = {40, 100, 200, 400, 800, 1600};
    for (int ef : efs) {
        t0 = std::chrono::steady_clock::now();
        int hit = 0;
        for (int i = 0; i < nq; i++) {
            auto ids = h.search(&qs[(size_t)i * DIM], k, ef);
            for (uint32_t id : ids)
                for (uint32_t t : truth[i])
                    if (id == t) { hit++; break; }
        }
        double search_s = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        printf("{\"metric\": \"cpu_hnsw_baseline\", \"n\": %d, \"dim\": %d, "
               "\"m\": %d, \"ef_construct\": %d, \"ef_search\": %d, "
               "\"build_s\": %.1f, \"qps\": %.1f, \"recall_at_%d\": %.4f}\n",
               n, DIM, m, ef_c, ef, build_s, nq / search_s, k,
               (double)hit / (nq * k));
        fflush(stdout);
    }
    return 0;
}
