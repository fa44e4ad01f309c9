// Native host-side sparse symbolic kernels.
//
// Reference parity: the integer-only analysis phases of faer's sparse module
// (etree/column counts: faer/src/sparse/linalg/cholesky.rs simplicial mod
// :501; AMD: sparse/linalg/amd.rs:903). These are latency-bound pointer
// chasing — the wrong shape for the TPU — and hot for large patterns, so the
// runtime gets a native implementation (SURVEY §2: "native → host C++ where
// truly hot"), exposed over a C ABI consumed via ctypes
// (faer_tpu/native/__init__.py). The Python implementations remain as
// reference/fallback.
//
// Build: make -C faer_tpu/native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <vector>
#include <algorithm>
#include <queue>
#include <cstring>

extern "C" {

// Liu's elimination tree from a lower-triangular CSC pattern.
// parent_out: length n, -1 for roots.
void faer_etree(int64_t n, const int64_t* col_ptr, const int64_t* row_idx,
                int64_t* parent_out) {
    std::vector<int64_t> ancestor(n, -1);
    std::vector<std::vector<int64_t>> rows(n);
    for (int64_t j = 0; j < n; ++j) {
        for (int64_t p = col_ptr[j]; p < col_ptr[j + 1]; ++p) {
            int64_t i = row_idx[p];
            if (i > j) rows[i].push_back(j);
        }
    }
    for (int64_t j = 0; j < n; ++j) parent_out[j] = -1;
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t k0 : rows[i]) {
            int64_t k = k0;
            while (true) {
                int64_t a = ancestor[k];
                if (a == i) break;
                ancestor[k] = i;
                if (a == -1) { parent_out[k] = i; break; }
                k = a;
            }
        }
    }
}

// Column counts of the Cholesky factor L (pattern sizes incl. diagonal),
// via row-subtree traversal with marking. counts_out: length n.
void faer_col_counts(int64_t n, const int64_t* col_ptr, const int64_t* row_idx,
                     const int64_t* parent, int64_t* counts_out) {
    std::vector<int64_t> mark(n, -1);
    for (int64_t j = 0; j < n; ++j) counts_out[j] = 1;  // diagonal
    std::vector<std::vector<int64_t>> rows(n);
    for (int64_t j = 0; j < n; ++j)
        for (int64_t p = col_ptr[j]; p < col_ptr[j + 1]; ++p) {
            int64_t i = row_idx[p];
            if (i > j) rows[i].push_back(j);
        }
    for (int64_t i = 0; i < n; ++i) {
        mark[i] = i;
        for (int64_t j : rows[i]) {
            int64_t k = j;
            while (k != -1 && k < i && mark[k] != i) {
                counts_out[k] += 1;   // L[i, k] != 0
                mark[k] = i;
                k = parent[k];
            }
        }
    }
}

// Full L pattern: given col_ptr_out already prefix-summed from counts,
// fills row_idx_out (sorted per column: diagonal first then ascending rows
// by construction of increasing i).
void faer_l_pattern(int64_t n, const int64_t* col_ptr, const int64_t* row_idx,
                    const int64_t* parent, const int64_t* lptr,
                    int64_t* l_rows_out) {
    std::vector<int64_t> mark(n, -1), fill(n);
    for (int64_t j = 0; j < n; ++j) {
        fill[j] = lptr[j];
        l_rows_out[fill[j]++] = j;  // diagonal
    }
    std::vector<std::vector<int64_t>> rows(n);
    for (int64_t j = 0; j < n; ++j)
        for (int64_t p = col_ptr[j]; p < col_ptr[j + 1]; ++p) {
            int64_t i = row_idx[p];
            if (i > j) rows[i].push_back(j);
        }
    for (int64_t i = 0; i < n; ++i) {
        mark[i] = i;
        for (int64_t j : rows[i]) {
            int64_t k = j;
            while (k != -1 && k < i && mark[k] != i) {
                l_rows_out[fill[k]++] = i;
                mark[k] = i;
                k = parent[k];
            }
        }
    }
}

// Approximate minimum degree (quotient graph, element absorption, AMD-style
// approximate external degrees). perm_out: length n.
void faer_amd_order(int64_t n, const int64_t* col_ptr, const int64_t* row_idx,
                    int64_t* perm_out) {
    // symmetrized adjacency (sets as sorted vectors)
    std::vector<std::vector<int64_t>> adj(n);
    for (int64_t j = 0; j < n; ++j)
        for (int64_t p = col_ptr[j]; p < col_ptr[j + 1]; ++p) {
            int64_t i = row_idx[p];
            if (i != j) { adj[i].push_back(j); adj[j].push_back(i); }
        }
    for (auto& a : adj) {
        std::sort(a.begin(), a.end());
        a.erase(std::unique(a.begin(), a.end()), a.end());
    }

    std::vector<std::vector<int64_t>> var_elems(n);
    std::vector<std::vector<int64_t>> elem_bound;  // element id → boundary
    std::vector<char> elem_alive;
    std::vector<char> alive(n, 1);
    std::vector<int64_t> degree(n);
    for (int64_t v = 0; v < n; ++v) degree[v] = (int64_t)adj[v].size();

    using QE = std::pair<int64_t, int64_t>;  // (degree, vertex)
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> heap;
    for (int64_t v = 0; v < n; ++v) heap.push({degree[v], v});

    std::vector<int64_t> stamp(n, -1);
    for (int64_t k = 0; k < n; ++k) {
        int64_t v = -1;
        while (true) {
            QE top = heap.top(); heap.pop();
            if (alive[top.second] && top.first == degree[top.second]) {
                v = top.second; break;
            }
        }
        alive[v] = 0;
        perm_out[k] = v;
        // boundary of the new element
        std::vector<int64_t> bound;
        for (int64_t u : adj[v]) if (alive[u]) bound.push_back(u);
        for (int64_t e : var_elems[v]) {
            if (!elem_alive[e]) continue;
            for (int64_t u : elem_bound[e]) if (alive[u]) bound.push_back(u);
        }
        std::sort(bound.begin(), bound.end());
        bound.erase(std::unique(bound.begin(), bound.end()), bound.end());
        for (int64_t e : var_elems[v]) if (e < (int64_t)elem_alive.size()) elem_alive[e] = 0;
        int64_t eid = (int64_t)elem_bound.size();
        elem_bound.push_back(bound);
        elem_alive.push_back(1);
        // mark boundary for fast pruning
        for (int64_t u : bound) stamp[u] = eid;
        for (int64_t u : bound) {
            // prune direct adjacency: drop v and anything in bound
            auto& au = adj[u];
            au.erase(std::remove_if(au.begin(), au.end(), [&](int64_t w) {
                return w == v || stamp[w] == eid || !alive[w];
            }), au.end());
            // refresh element list
            auto& eu = var_elems[u];
            eu.erase(std::remove_if(eu.begin(), eu.end(), [&](int64_t e) {
                return !elem_alive[e];
            }), eu.end());
            eu.push_back(eid);
            // approximate external degree
            int64_t approx = (int64_t)au.size();
            // seen-set via stamping; the key is a monotone thread-local
            // counter so stamps left by a previous matrix can never collide
            static thread_local std::vector<int64_t> seen_stamp;
            static thread_local int64_t stamp_counter = 0;
            if ((int64_t)seen_stamp.size() < n) seen_stamp.assign(n, -1);
            int64_t key = ++stamp_counter;
            for (int64_t e : eu) {
                for (int64_t w : elem_bound[e]) {
                    if (!alive[w] || w == u) continue;
                    if (seen_stamp[w] != key) { seen_stamp[w] = key; ++approx; }
                }
            }
            int64_t newd = std::min(n - k - 1, approx);
            if (newd != degree[u]) {
                degree[u] = newd;
                heap.push({newd, u});
            }
        }
    }
}

}  // extern "C"
