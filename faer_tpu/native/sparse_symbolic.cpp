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
#include <cmath>

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

// Quotient-graph approximate-minimum-degree core shared by AMD and COLAMD:
// element absorption, ADD approximate external degrees, weighted
// supervariables (hash merge) + aggressive absorption (parity with faer
// sparse/linalg/amd.rs:903 and colamd.rs:98). ``init_elems`` seeds the
// element set (COLAMD: each matrix ROW is a clique over the columns it
// touches); AMD passes none and seeds plain adjacency instead.
static void amd_core(int64_t n, std::vector<std::vector<int64_t>>& adj,
                     std::vector<std::vector<int64_t>> init_elems,
                     int64_t* perm_out) {
    std::vector<std::vector<int64_t>> var_elems(n);
    std::vector<std::vector<int64_t>> elem_bound = std::move(init_elems);
    std::vector<char> elem_alive(elem_bound.size(), 1);
    std::vector<char> alive(n, 1);        // 0 once eliminated (output)
    std::vector<int64_t> nv(n, 1);        // supervariable weight; 0 = absorbed
    std::vector<std::vector<int64_t>> members(n);  // absorbed original ids
    std::vector<int64_t> degree(n);
    for (size_t e = 0; e < elem_bound.size(); ++e)
        for (int64_t u : elem_bound[e]) var_elems[u].push_back((int64_t)e);
    {
        // initial external degrees: |adj(v) ∪ (∪_{e∋v} bound_e) \ {v}|
        std::vector<int64_t> seen(n, -1);
        for (int64_t v = 0; v < n; ++v) {
            int64_t d = 0;
            for (int64_t u : adj[v])
                if (u != v && seen[u] != v) { seen[u] = v; ++d; }
            for (int64_t e : var_elems[v])
                for (int64_t u : elem_bound[e])
                    if (u != v && seen[u] != v) { seen[u] = v; ++d; }
            degree[v] = d;
        }
    }

    using QE = std::pair<int64_t, int64_t>;  // (degree, vertex)
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> heap;
    for (int64_t v = 0; v < n; ++v) heap.push({degree[v], v});

    std::vector<int64_t> stamp(n, -1);       // bound membership tag
    std::vector<int64_t> wkey, wval;         // per-element |Le \ Lp| scratch
    int64_t outp = 0;
    while (outp < n) {
        int64_t v = -1;
        while (true) {
            QE top = heap.top(); heap.pop();
            int64_t c = top.second;
            if (alive[c] && nv[c] > 0 && top.first == degree[c]) { v = c; break; }
        }
        alive[v] = 0;
        perm_out[outp++] = v;
        for (int64_t m : members[v]) perm_out[outp++] = m;
        members[v].clear(); members[v].shrink_to_fit();

        // boundary of the new element (dedup via stamp)
        int64_t eid = (int64_t)elem_bound.size();
        std::vector<int64_t> bound;
        int64_t boundw = 0;                  // weighted |Lp|
        auto push_bound = [&](int64_t u) {
            if (alive[u] && nv[u] > 0 && u != v && stamp[u] != eid) {
                stamp[u] = eid;
                bound.push_back(u);
                boundw += nv[u];
            }
        };
        for (int64_t u : adj[v]) push_bound(u);
        for (int64_t e : var_elems[v]) {
            if (!elem_alive[e]) continue;
            for (int64_t u : elem_bound[e]) push_bound(u);
            elem_alive[e] = 0;               // absorbed into the new element
        }
        elem_bound.push_back(bound);
        elem_alive.push_back(1);
        adj[v].clear(); adj[v].shrink_to_fit();
        var_elems[v].clear(); var_elems[v].shrink_to_fit();

        // Amestoy-Davis-Duff approximate degrees: one w(e) = |Le \ Lp|
        // sweep per PIVOT (not the exact union per boundary vertex, which
        // made ordering quadratic on grid graphs)
        if ((int64_t)wkey.size() < (int64_t)elem_bound.size() + 1) {
            wkey.resize(elem_bound.size() + 4096, -1);
            wval.resize(elem_bound.size() + 4096, 0);
        }
        for (int64_t u : bound) {
            for (int64_t e : var_elems[u]) {
                if (!elem_alive[e]) continue;
                if (wkey[e] != eid) {
                    auto& eb = elem_bound[e];
                    int64_t w = 0;
                    eb.erase(std::remove_if(eb.begin(), eb.end(),
                                            [&](int64_t x) {
                                                return !alive[x] || nv[x] <= 0;
                                            }),
                             eb.end());
                    for (int64_t x : eb) w += nv[x];
                    wkey[e] = eid;
                    wval[e] = w;
                }
                wval[e] -= nv[u];            // u ∈ Le ∩ Lp
            }
        }
        // aggressive absorption: Le ⊆ Lp → the element is redundant
        for (int64_t u : bound)
            for (int64_t e : var_elems[u])
                if (elem_alive[e] && wkey[e] == eid && wval[e] <= 0)
                    elem_alive[e] = 0;

        for (int64_t u : bound) {
            // prune direct adjacency: drop v, absorbed vars, anything in bound
            auto& au = adj[u];
            au.erase(std::remove_if(au.begin(), au.end(), [&](int64_t w) {
                return w == v || stamp[w] == eid || !alive[w] || nv[w] <= 0;
            }), au.end());
            // refresh element list
            auto& eu = var_elems[u];
            eu.erase(std::remove_if(eu.begin(), eu.end(), [&](int64_t e) {
                return !elem_alive[e];
            }), eu.end());
            // d(u) ≈ |A_u \ Lp| + |Lp \ u| + Σ_e |Le \ Lp|   (all weighted)
            int64_t approx = boundw - nv[u];
            for (int64_t w : au) approx += nv[w];
            for (int64_t e : eu)
                approx += (wkey[e] == eid && wval[e] > 0) ? wval[e] : 0;
            eu.push_back(eid);
            int64_t newd = std::min(n - outp, approx);
            if (newd != degree[u]) {
                degree[u] = newd;
                heap.push({newd, u});
            }
        }

        // supervariable detection: hash boundary vars by their quotient-graph
        // adjacency; compare within buckets; merge indistinguishable pairs
        // (Adj(i) ∪ {i} == Adj(j) ∪ {j}) so they eliminate together.
        if (bound.size() > 1) {
            // group candidates by (hash bucket) via sort on recomputed key
            std::vector<std::pair<int64_t, int64_t>> hb;
            hb.reserve(bound.size());
            for (int64_t u : bound) {
                int64_t h = 0;
                for (int64_t w : adj[u]) h += w;
                for (int64_t e : var_elems[u]) h += e * 131071;
                hb.push_back({h & 0x7fffffff, u});
            }
            std::sort(hb.begin(), hb.end());
            auto same_sets = [&](int64_t i, int64_t j) {
                if (adj[i].size() != adj[j].size()) return false;
                if (var_elems[i].size() != var_elems[j].size()) return false;
                // element lists: same multiset (order may differ)
                {
                    auto a = var_elems[i], b = var_elems[j];
                    std::sort(a.begin(), a.end());
                    std::sort(b.begin(), b.end());
                    if (a != b) return false;
                }
                // variable lists are kept sorted only initially; compare as
                // multisets ignoring mutual {i, j} entries
                auto a = adj[i], b = adj[j];
                std::sort(a.begin(), a.end());
                std::sort(b.begin(), b.end());
                size_t pa = 0, pb = 0;
                while (pa < a.size() || pb < b.size()) {
                    while (pa < a.size() && a[pa] == j) ++pa;
                    while (pb < b.size() && b[pb] == i) ++pb;
                    if (pa == a.size() && pb == b.size()) break;
                    if (pa == a.size() || pb == b.size()) return false;
                    if (a[pa] != b[pb]) return false;
                    ++pa; ++pb;
                }
                return true;
            };
            for (size_t s = 0; s + 1 < hb.size();) {
                size_t t = s + 1;
                while (t < hb.size() && hb[t].first == hb[s].first) ++t;
                for (size_t i0 = s; i0 < t; ++i0) {
                    int64_t i = hb[i0].second;
                    if (nv[i] <= 0) continue;
                    for (size_t j0 = i0 + 1; j0 < t; ++j0) {
                        int64_t j = hb[j0].second;
                        if (nv[j] <= 0) continue;
                        if (!same_sets(i, j)) continue;
                        // merge j into i
                        nv[i] += nv[j];
                        degree[i] -= nv[j];
                        heap.push({degree[i], i});
                        members[i].push_back(j);
                        members[i].insert(members[i].end(),
                                          members[j].begin(),
                                          members[j].end());
                        members[j].clear(); members[j].shrink_to_fit();
                        nv[j] = 0;
                        adj[j].clear(); adj[j].shrink_to_fit();
                        var_elems[j].clear(); var_elems[j].shrink_to_fit();
                    }
                }
                s = t;
            }
        }
    }
}

// AMD: symmetric pattern, plain adjacency seeds (faer sparse/linalg/amd.rs:903).
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
    amd_core(n, adj, {}, perm_out);
}

// COLAMD: column ordering for LU/QR by minimum degree on the AᵀA pattern
// WITHOUT forming it — each matrix row seeds one quotient-graph element
// (a clique over the columns it touches), exactly faer
// sparse/linalg/colamd.rs:98's structure. Dense rows (boundary larger than
// 16 + 10·√n) are dropped from the seed set like COLAMD's dense-row
// handling — they would fill everything anyway and make degree
// initialization quadratic.
void faer_colamd_order(int64_t m, int64_t n, const int64_t* col_ptr,
                       const int64_t* row_idx, int64_t* perm_out) {
    std::vector<int64_t> row_len(m, 0);
    for (int64_t j = 0; j < n; ++j)
        for (int64_t p = col_ptr[j]; p < col_ptr[j + 1]; ++p)
            ++row_len[row_idx[p]];
    int64_t dense = 16 + (int64_t)(10.0 * std::sqrt((double)n));
    std::vector<int64_t> eid(m, -1);
    std::vector<std::vector<int64_t>> elems;
    for (int64_t i = 0; i < m; ++i)
        if (row_len[i] > 1 && row_len[i] <= dense) {
            eid[i] = (int64_t)elems.size();
            elems.emplace_back();
            elems.back().reserve(row_len[i]);
        }
    for (int64_t j = 0; j < n; ++j)
        for (int64_t p = col_ptr[j]; p < col_ptr[j + 1]; ++p) {
            int64_t e = eid[row_idx[p]];
            if (e >= 0) elems[e].push_back(j);
        }
    std::vector<std::vector<int64_t>> adj(n);
    amd_core(n, adj, std::move(elems), perm_out);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// numeric kernels (round 3): simplicial LLT/LDLT + CSC triangular solves.
// The host-Python per-column orchestration was the sparse numeric wall-time
// floor (BENCH_NOTES round-3 table); these mirror faer's simplicial numeric
// (faer/src/sparse/linalg/cholesky.rs simplicial mod :501) in C++.
// ---------------------------------------------------------------------------

extern "C" {

// Left-looking simplicial LLT over the precomputed L pattern.
// A (permuted, lower triangle) in CSC; L pattern in (lptr, lrow) with rows
// ascending, diagonal first. Writes lval. Returns 0 on success or (j+1) for
// the first non-positive pivot column j. If ldlt != 0, computes unit-L LDLT
// (diagonal of B stored on the L diagonal slots) and never fails on sign.
int64_t faer_chol_numeric(int64_t n, const int64_t* aptr, const int64_t* arow,
                          const double* aval, const int64_t* lptr,
                          const int64_t* lrow, double* lval, int64_t ldlt) {
    // transpose pass: for each row i, the (i, k) entries with k < i
    std::vector<int64_t> rcnt(n + 1, 0);
    for (int64_t k = 0; k < n; ++k)
        for (int64_t p = lptr[k]; p < lptr[k + 1]; ++p)
            if (lrow[p] > k) rcnt[lrow[p] + 1]++;
    std::vector<int64_t> rptr(n + 1, 0);
    for (int64_t i = 0; i < n; ++i) rptr[i + 1] = rptr[i] + rcnt[i + 1];
    std::vector<int64_t> rcol(rptr[n]), rpos(rptr[n]);
    {
        std::vector<int64_t> fill(rptr.begin(), rptr.end() - 1);
        for (int64_t k = 0; k < n; ++k)
            for (int64_t p = lptr[k]; p < lptr[k + 1]; ++p) {
                int64_t i = lrow[p];
                if (i > k) { rcol[fill[i]] = k; rpos[fill[i]] = p; fill[i]++; }
            }
    }
    std::vector<double> work(n, 0.0);
    std::vector<double> diag(ldlt ? n : 0);   // B diagonal for LDLT
    for (int64_t j = 0; j < n; ++j) {
        for (int64_t p = aptr[j]; p < aptr[j + 1]; ++p) work[arow[p]] = aval[p];
        for (int64_t t = rptr[j]; t < rptr[j + 1]; ++t) {
            int64_t k = rcol[t];
            double ljk = lval[rpos[t]];
            if (ljk == 0.0) continue;
            double scale = ldlt ? ljk * diag[k] : ljk;
            // rows >= j of column k start exactly at the (j, k) entry
            for (int64_t p = rpos[t]; p < lptr[k + 1]; ++p)
                work[lrow[p]] -= scale * lval[p];
        }
        double dj = work[j];
        int64_t rj0 = lptr[j], rj1 = lptr[j + 1];
        if (ldlt) {
            if (dj == 0.0) dj = 1e-300;      // caller checks |d| downstream
            diag[j] = dj;
            lval[rj0] = dj;
            for (int64_t p = rj0 + 1; p < rj1; ++p) {
                lval[p] = work[lrow[p]] / dj;
                work[lrow[p]] = 0.0;
            }
        } else {
            if (dj <= 0.0) return j + 1;
            double piv = std::sqrt(dj);
            lval[rj0] = piv;
            for (int64_t p = rj0 + 1; p < rj1; ++p) {
                lval[p] = work[lrow[p]] / piv;
                work[lrow[p]] = 0.0;
            }
        }
        work[j] = 0.0;
    }
    return 0;
}

// CSC lower-triangular solves, k right-hand sides (column-major b, n x k).
// unit != 0 treats the diagonal as 1 (packed LDLT convention skips it).
void faer_lower_solve(int64_t n, int64_t k, const int64_t* lptr,
                      const int64_t* lrow, const double* lval, double* b,
                      int64_t unit) {
    for (int64_t c = 0; c < k; ++c) {
        double* x = b + c * n;
        for (int64_t j = 0; j < n; ++j) {
            double xj = x[j];
            if (!unit)
                for (int64_t p = lptr[j]; p < lptr[j + 1]; ++p)
                    if (lrow[p] == j) { xj /= lval[p]; break; }
            x[j] = xj;
            if (xj != 0.0)
                for (int64_t p = lptr[j]; p < lptr[j + 1]; ++p)
                    if (lrow[p] > j) x[lrow[p]] -= lval[p] * xj;
        }
    }
}

// x = L^T \ b (CSC L, so the transpose solve walks columns backwards).
void faer_lower_transpose_solve(int64_t n, int64_t k, const int64_t* lptr,
                                const int64_t* lrow, const double* lval,
                                double* b, int64_t unit) {
    for (int64_t c = 0; c < k; ++c) {
        double* x = b + c * n;
        for (int64_t j = n - 1; j >= 0; --j) {
            double s = x[j];
            double d = 1.0;
            for (int64_t p = lptr[j]; p < lptr[j + 1]; ++p) {
                int64_t i = lrow[p];
                if (i > j) s -= lval[p] * x[i];
                else if (i == j) d = lval[p];
            }
            x[j] = unit ? s : s / d;
        }
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// supernodal LLT numeric (round 3): left-looking CHOLMOD-style sweep with
// per-descendant dense GEMM updates. Parity: faer supernodal numeric
// (faer/src/sparse/linalg/cholesky.rs:3945, supernodal mod :1412). The
// host-Python per-column rank-1 orchestration was the wall-time floor for
// mid-size fronts; this driver keeps every front dense in one workspace and
// fuses assembly/update/factor in C++.
// ---------------------------------------------------------------------------

namespace {

// C(mr x mc, colmajor ld=mr) += X(mr x K) * Y(mc x K)^T, X/Y colmajor ld=ldx.
// 4-column unrolled rank-K accumulation (compiler-vectorized axpys).
void gemm_nt_acc(int64_t mr, int64_t mc, int64_t K, const double* X,
                 const double* Y, int64_t ldx, double* C) {
    int64_t j = 0;
    for (; j + 4 <= mc; j += 4) {
        double* c0 = C + (j + 0) * mr;
        double* c1 = C + (j + 1) * mr;
        double* c2 = C + (j + 2) * mr;
        double* c3 = C + (j + 3) * mr;
        for (int64_t k = 0; k < K; ++k) {
            const double* xk = X + k * ldx;
            double y0 = Y[j + 0 + k * ldx];
            double y1 = Y[j + 1 + k * ldx];
            double y2 = Y[j + 2 + k * ldx];
            double y3 = Y[j + 3 + k * ldx];
            for (int64_t i = 0; i < mr; ++i) {
                double x = xk[i];
                c0[i] += x * y0;
                c1[i] += x * y1;
                c2[i] += x * y2;
                c3[i] += x * y3;
            }
        }
    }
    for (; j < mc; ++j) {
        double* c0 = C + j * mr;
        for (int64_t k = 0; k < K; ++k) {
            const double* xk = X + k * ldx;
            double y0 = Y[j + k * ldx];
            for (int64_t i = 0; i < mr; ++i) c0[i] += xk[i] * y0;
        }
    }
}

}  // namespace

extern "C" {

// Fundamental supernodes + relaxed amalgamation (Ashcraft-Grimes; same greedy
// left-to-right semantics as sparse/supernodal.py detect_supernodes). Writes
// sn_start (nsn+1), sn_rptr (nsn+1), sn_rows (flattened union patterns;
// capacity must be >= nnz(L) + n). Returns nsn.
int64_t faer_detect_supernodes(int64_t n, const int64_t* parent,
                               const int64_t* counts, const int64_t* lptr,
                               const int64_t* lrow, int64_t relax,
                               double relax_ratio, int64_t* sn_start,
                               int64_t* sn_rptr, int64_t* sn_rows) {
    if (n == 0) { sn_start[0] = 0; sn_rptr[0] = 0; return 0; }
    std::vector<int64_t> starts;
    starts.push_back(0);
    for (int64_t j = 1; j < n; ++j)
        if (!(parent[j - 1] == j && counts[j - 1] == counts[j] + 1))
            starts.push_back(j);
    starts.push_back(n);

    int64_t nsn = 0, rtot = 0;
    std::vector<int64_t> cur(lrow + lptr[starts[0]],
                             lrow + lptr[starts[0] + 1]);
    int64_t cur_start = 0, cur_sep = 0;
    std::vector<int64_t> uni;
    auto flush = [&](int64_t next_start) {
        sn_start[nsn] = cur_start;
        sn_rptr[nsn] = rtot;
        std::copy(cur.begin(), cur.end(), sn_rows + rtot);
        rtot += (int64_t)cur.size();
        ++nsn;
        cur_start = next_start;
    };
    for (size_t s = 1; s + 1 < starts.size(); ++s) {
        int64_t j0 = starts[s];
        const int64_t* nb = lrow + lptr[j0];
        int64_t nn = lptr[j0 + 1] - lptr[j0];
        int64_t w_cur = j0 - cur_start;
        int64_t w_nxt = starts[s + 1] - j0;
        int64_t sep = (cur_sep ? cur_sep : w_cur * (int64_t)cur.size())
                      + w_nxt * nn;
        uni.clear();
        std::set_union(cur.begin(), cur.end(), nb, nb + nn,
                       std::back_inserter(uni));
        int64_t after = (w_cur + w_nxt) * (int64_t)uni.size();
        bool chained = parent[j0 - 1] == j0;
        if (chained && ((w_cur + w_nxt <= relax)
                        || ((double)(after - sep) <= relax_ratio * (double)sep))) {
            cur.swap(uni);
            cur_sep = sep;
        } else {
            flush(j0);
            cur.assign(nb, nb + nn);
            cur_sep = 0;
        }
    }
    flush(n);
    sn_start[nsn] = n;
    sn_rptr[nsn] = rtot;
    return nsn;
}

// Left-looking supernodal LLT.
//   sn_start: (nsn+1) supernode column ranges over the permuted matrix
//   sn_rptr/sn_rows: flattened per-supernode row patterns (ascending,
//                    pivot rows j0..j1-1 first)
//   aptr/arow/aval: permuted lower-triangular A in CSC
//   lptr/lrow: symbolic L (per column, ascending, diagonal first)
//   lval: output values over the L pattern
// Returns 0 on success or s+1 for the first non-positive pivot supernode s.
int64_t faer_supernodal_llt(int64_t n, int64_t nsn, const int64_t* sn_start,
                            const int64_t* sn_rptr, const int64_t* sn_rows,
                            const int64_t* aptr, const int64_t* arow,
                            const double* aval, const int64_t* lptr,
                            const int64_t* lrow, double* lval) {
    // supernode of each column
    std::vector<int64_t> sn_of_col(n);
    for (int64_t s = 0; s < nsn; ++s)
        for (int64_t j = sn_start[s]; j < sn_start[s + 1]; ++j) sn_of_col[j] = s;
    // dense storage offsets per supernode: nr * w doubles each
    std::vector<int64_t> off(nsn + 1, 0);
    for (int64_t s = 0; s < nsn; ++s) {
        int64_t w = sn_start[s + 1] - sn_start[s];
        int64_t nr = sn_rptr[s + 1] - sn_rptr[s];
        off[s + 1] = off[s] + nr * w;
    }
    std::vector<double> dense(off[nsn], 0.0);
    // update linked lists: head[s] → first descendant, chain via nxt[]
    std::vector<int64_t> head(nsn, -1), nxt(nsn, -1), dpos(nsn, 0);
    std::vector<int64_t> relpos(n, -1);
    std::vector<double> scratch;     // per-descendant GEMM buffer

    for (int64_t s = 0; s < nsn; ++s) {
        int64_t j0 = sn_start[s], j1 = sn_start[s + 1], w = j1 - j0;
        const int64_t* rows = sn_rows + sn_rptr[s];
        int64_t nr = sn_rptr[s + 1] - sn_rptr[s];
        double* F = dense.data() + off[s];
        for (int64_t i = 0; i < nr; ++i) relpos[rows[i]] = i;
        // assemble A columns
        for (int64_t j = j0; j < j1; ++j)
            for (int64_t p = aptr[j]; p < aptr[j + 1]; ++p) {
                int64_t i = arow[p];
                if (i >= j) F[relpos[i] + (j - j0) * nr] = aval[p];
            }
        // descendant updates (pop the whole list; entries relink forward)
        int64_t d = head[s];
        head[s] = -1;
        while (d != -1) {
            int64_t dn = nxt[d];
            const int64_t* drows = sn_rows + sn_rptr[d];
            int64_t dnr = sn_rptr[d + 1] - sn_rptr[d];
            int64_t dw = sn_start[d + 1] - sn_start[d];
            const double* Ld = dense.data() + off[d];
            int64_t od = dpos[d];
            int64_t od2 = od;
            while (od2 < dnr && drows[od2] < j1) ++od2;
            int64_t mc = od2 - od, mr = dnr - od;
            if (mc > 0) {
                scratch.assign((size_t)(mr * mc), 0.0);
                gemm_nt_acc(mr, mc, dw, Ld + od, Ld + od, dnr, scratch.data());
                // scatter-subtract into F. relaxed-amalgamation padding can
                // put union rows of d outside this front's pattern; those
                // contributions are exact zeros in exact arithmetic (the
                // Python path's `keep` filter) — skip them.
                for (int64_t jj = 0; jj < mc; ++jj) {
                    int64_t cj = drows[od + jj] - j0;   // pivot col in front
                    double* fc = F + cj * nr;
                    const double* cc = scratch.data() + jj * mr;
                    for (int64_t ii = 0; ii < mr; ++ii) {
                        int64_t rp = relpos[drows[od + ii]];
                        if (rp >= 0) fc[rp] -= cc[ii];
                    }
                }
            }
            dpos[d] = od2;
            if (od2 < dnr) {
                int64_t t = sn_of_col[drows[od2]];
                nxt[d] = head[t];
                head[t] = d;
            }
            d = dn;
        }
        // dense panel factor: left-looking within the supernode
        for (int64_t k = 0; k < w; ++k) {
            double* fk = F + k * nr;
            for (int64_t m = 0; m < k; ++m) {
                double lkm = F[k + m * nr];
                if (lkm == 0.0) continue;
                const double* fm = F + m * nr;
                for (int64_t i = k; i < nr; ++i) fk[i] -= fm[i] * lkm;
            }
            double dkk = fk[k];
            if (dkk <= 0.0) {
                for (int64_t i = 0; i < nr; ++i) relpos[rows[i]] = -1;
                return s + 1;
            }
            double piv = std::sqrt(dkk);
            fk[k] = piv;
            double inv = 1.0 / piv;
            for (int64_t i = k + 1; i < nr; ++i) fk[i] *= inv;
        }
        // scatter into the L pattern
        for (int64_t j = j0; j < j1; ++j) {
            double* fc = F + (j - j0) * nr;
            for (int64_t p = lptr[j]; p < lptr[j + 1]; ++p)
                lval[p] = fc[relpos[lrow[p]]];
        }
        for (int64_t i = 0; i < nr; ++i) relpos[rows[i]] = -1;
        // link into the first ancestor this supernode updates
        if (nr > w) {
            dpos[s] = w;
            int64_t t = sn_of_col[rows[w]];
            nxt[s] = head[t];
            head[t] = s;
        }
    }
    return 0;
}

}  // extern "C"

extern "C" {

// Gilbert-Peierls sparse LU with threshold partial pivoting (the simplicial
// numeric of faer/src/sparse/linalg/lu.rs:1331, in C++ for host wall time).
// L columns carry ORIGINAL row ids (caller remaps to pivot order); U columns
// carry pivot positions (ascending not guaranteed; caller sorts).
// Returns 0 on success, j+1 if column j is singular, or -(needed_capacity)
// when cap is too small (caller retries).
int64_t faer_gp_lu(int64_t n, const int64_t* aptr, const int64_t* arow,
                   const double* aval, const int64_t* colperm,
                   double pivot_threshold, int64_t cap,
                   int64_t* lptr, int64_t* lrow, double* lval,
                   int64_t* uptr, int64_t* urow, double* uval,
                   int64_t* rowperm) {
    std::vector<int64_t> pinv(n, -1);
    std::vector<double> x(n, 0.0);
    std::vector<int64_t> topo;   topo.reserve(n);
    std::vector<int64_t> dfs_node; dfs_node.reserve(n);
    std::vector<int64_t> dfs_ptr;  dfs_ptr.reserve(n);
    std::vector<char> mark(n, 0);
    std::vector<int64_t> touched; touched.reserve(n);
    int64_t lnnz = 0, unnz = 0;
    lptr[0] = 0; uptr[0] = 0;
    for (int64_t j = 0; j < n; ++j) {
        int64_t cj = colperm ? colperm[j] : j;
        topo.clear(); touched.clear();
        // DFS reach through finished L columns (by pivot position)
        for (int64_t p = aptr[cj]; p < aptr[cj + 1]; ++p) {
            int64_t start = arow[p];
            if (mark[start]) continue;
            dfs_node.clear(); dfs_ptr.clear();
            dfs_node.push_back(start);
            dfs_ptr.push_back(pinv[start] >= 0 ? lptr[pinv[start]] : -1);
            mark[start] = 1; touched.push_back(start);
            while (!dfs_node.empty()) {
                int64_t node = dfs_node.back();
                int64_t k = pinv[node];
                if (k < 0) { topo.push_back(node); dfs_node.pop_back(); dfs_ptr.pop_back(); continue; }
                int64_t& q = dfs_ptr.back();
                bool descended = false;
                while (q < lptr[k + 1]) {
                    int64_t child = lrow[q]; ++q;
                    if (!mark[child]) {
                        mark[child] = 1; touched.push_back(child);
                        dfs_node.push_back(child);
                        dfs_ptr.push_back(pinv[child] >= 0 ? lptr[pinv[child]] : -1);
                        descended = true;
                        break;
                    }
                }
                if (!descended && q >= lptr[k + 1]) {
                    topo.push_back(node); dfs_node.pop_back(); dfs_ptr.pop_back();
                }
            }
        }
        // numeric scatter solve in topological order (topo is reverse-post)
        for (int64_t p = aptr[cj]; p < aptr[cj + 1]; ++p) x[arow[p]] = aval[p];
        for (int64_t t = (int64_t)topo.size() - 1; t >= 0; --t) {
            int64_t node = topo[t];
            int64_t k = pinv[node];
            if (k < 0) continue;
            double xk = x[node];
            if (xk != 0.0)
                for (int64_t p = lptr[k]; p < lptr[k + 1]; ++p)
                    x[lrow[p]] -= lval[p] * xk;
        }
        // threshold partial pivot among unfinished rows
        double cmax = 0.0; int64_t prow = -1;
        for (int64_t node : touched)
            if (pinv[node] < 0) {
                double m = std::abs(x[node]);
                if (m > cmax) { cmax = m; prow = node; }
            }
        if (prow < 0 || cmax == 0.0) {
            for (int64_t node : touched) { mark[node] = 0; x[node] = 0.0; }
            return j + 1;
        }
        if (pivot_threshold < 1.0 && !mark[cj]) { /* diag not in pattern */ }
        if (pivot_threshold < 1.0 && mark[cj] && pinv[cj] < 0
            && std::abs(x[cj]) >= pivot_threshold * cmax)
            prow = cj;                       // sparsity-preserving diagonal
        double pv = x[prow];
        pinv[prow] = j; rowperm[j] = prow;
        // counts
        int64_t nl = 0, nu = 0;
        for (int64_t node : touched) {
            if (node == prow) continue;
            if (pinv[node] >= 0 && pinv[node] < j) nu++;
            else if (pinv[node] < 0 && x[node] != 0.0) nl++;
        }
        if (lnnz + nl > cap || unnz + nu + 1 > cap) {
            for (int64_t node : touched) { mark[node] = 0; x[node] = 0.0; }
            int64_t need = (lnnz + nl > unnz + nu + 1 ? lnnz + nl : unnz + nu + 1);
            return -(need * (n) / (j + 1) + n);   // growth-scaled retry hint
        }
        for (int64_t node : touched) {
            if (pinv[node] >= 0 && pinv[node] < j && node != prow) {
                urow[unnz] = pinv[node]; uval[unnz] = x[node]; unnz++;
            } else if (node != prow && pinv[node] < 0 && x[node] != 0.0) {
                lrow[lnnz] = node; lval[lnnz] = x[node] / pv; lnnz++;
            }
            mark[node] = 0; x[node] = 0.0;
        }
        urow[unnz] = j; uval[unnz] = pv; unnz++;   // diagonal of U
        x[prow] = 0.0;
        lptr[j + 1] = lnnz;
        uptr[j + 1] = unnz;
    }
    return 0;
}

}  // extern "C"
