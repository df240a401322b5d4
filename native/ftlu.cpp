// Sparse LU with Markowitz pivoting and Forrest–Tomlin updates.
//
// Native counterpart of the reference's flagship basis-inverse maintenance
// (src/algorithm/two_phase/tableau/inverse_maintenance/carry/lower_upper/):
//   - Markowitz-ordered right-looking factorization with threshold pivoting
//     (decomposition/mod.rs:27-138 plays this role with exact rationals);
//   - the Forrest–Tomlin-style update: replace a column of U with the
//     L-solved spike, rotate its pivot position to the back, and restore
//     triangularity with ONE row eta (mod.rs:66-155, eta_file.rs:14-134,
//     permutation/rotate_to_back.rs) — numerically stable over thousands of
//     pivots where product-form etas compound error.
//
// Original design in C++ (the reference is Rust and exact-rational; this is
// the float engine the host dual simplex / crossover push run on).  Exposed
// through a plain C ABI consumed via ctypes (no pybind11 in this image).
//
//  ftlu_create(m, indptr, indices, data)  — factorize an m×m CSC matrix
//  ftlu_ok(h)                             — 1 iff the factorization succeeded
//  ftlu_ftran(h, v)                       — in-place solve  B x = v
//  ftlu_btran(h, v)                       — in-place solve  Bᵀ x = v
//  ftlu_update(h, r, nnz, rows, vals)     — basis column r := new column
//                                           (0 ok, 1 = refactorize, -1 = bad)
//  ftlu_nupdates(h), ftlu_fill(h), ftlu_free(h)
//
// Differentially tested against scipy.sparse.linalg.splu and against fresh
// refactorizations after long random update sequences
// (tests/test_ftlu.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <utility>
#include <vector>

namespace {

using Entry = std::pair<int32_t, double>;  // (column slot, value)

struct FtLU {
  int32_t m = 0;
  bool ok = false;

  // L from factorization: one eta per pivot step, applied in order.
  // Step t: w[rows[k]] -= vals[k] * w[prow[t]] for k in [start[t], start[t+1]).
  std::vector<int32_t> l_prow;
  std::vector<int32_t> l_start;
  std::vector<int32_t> l_rows;
  std::vector<double> l_vals;

  // U, row-wise, in scattered slot space; triangular w.r.t. the pivot
  // order: urow[ord_row[t]] has entries only in columns ord_col[u], u >= t.
  std::vector<std::vector<Entry>> urow;   // sorted by column slot
  std::vector<std::vector<int32_t>> ucol_rows;  // lazy row lists per column
  std::vector<int32_t> ord_row, ord_col;  // position -> slot
  std::vector<int32_t> rowpos, colpos;    // slot -> position
  std::vector<double> diag_of_col;        // pivot value keyed by column slot

  // Forrest–Tomlin row etas, applied (FTRAN) in creation order:
  //   w[erow[k]] -= sum vals * w[rows]   over [estart[k], estart[k+1])
  std::vector<int32_t> e_row;
  std::vector<int32_t> e_start{0};
  std::vector<int32_t> e_rows;
  std::vector<double> e_vals;
  int32_t nupdates = 0;

  std::vector<double> work;  // scratch, size m
};

inline void urow_insert(std::vector<Entry>& row, int32_t c, double v) {
  auto it = std::lower_bound(
      row.begin(), row.end(), c,
      [](const Entry& e, int32_t col) { return e.first < col; });
  row.insert(it, {c, v});
}

inline double urow_get(const std::vector<Entry>& row, int32_t c) {
  auto it = std::lower_bound(
      row.begin(), row.end(), c,
      [](const Entry& e, int32_t col) { return e.first < col; });
  return (it != row.end() && it->first == c) ? it->second : 0.0;
}

inline bool urow_erase(std::vector<Entry>& row, int32_t c) {
  auto it = std::lower_bound(
      row.begin(), row.end(), c,
      [](const Entry& e, int32_t col) { return e.first < col; });
  if (it != row.end() && it->first == c) {
    row.erase(it);
    return true;
  }
  return false;
}

// ---------------------------------------------------------------------------
// Factorization: right-looking elimination, Markowitz cost (nnz_r-1)(nnz_c-1)
// with threshold pivoting |a| >= tau * colmax, count-bucketed column search.
// ---------------------------------------------------------------------------

bool factorize(FtLU& F, const int32_t* indptr, const int32_t* indices,
               const double* data) {
  const int32_t m = F.m;
  const double tau = 0.1;       // threshold-pivoting factor
  const double tiny = 1e-300;   // structurally-zero cutoff

  // working rows (sorted by column) + column row-lists + counts
  std::vector<std::vector<Entry>> arow(m);
  std::vector<std::vector<int32_t>> colrows(m);
  std::vector<int32_t> rowcnt(m, 0), colcnt(m, 0);
  for (int32_t c = 0; c < m; ++c) {
    for (int32_t p = indptr[c]; p < indptr[c + 1]; ++p) {
      const int32_t r = indices[p];
      const double v = data[p];
      if (std::fabs(v) <= tiny) continue;
      arow[r].push_back({c, v});
      colrows[c].push_back(r);
      ++rowcnt[r];
      ++colcnt[c];
    }
  }
  for (auto& row : arow)
    std::sort(row.begin(), row.end());

  std::vector<char> row_active(m, 1), col_active(m, 1);

  // count buckets over columns (lazy re-bucketing on pop)
  std::vector<std::vector<int32_t>> bucket(m + 1);
  for (int32_t c = 0; c < m; ++c) bucket[std::min(colcnt[c], m)].push_back(c);

  F.l_prow.resize(m);
  F.l_start.assign(m + 1, 0);
  F.urow.assign(m, {});
  F.ucol_rows.assign(m, {});
  F.ord_row.resize(m);
  F.ord_col.resize(m);
  F.rowpos.assign(m, -1);
  F.colpos.assign(m, -1);
  F.diag_of_col.assign(m, 0.0);

  const int kCand = 4;  // candidate columns examined per pivot (Suhl-style)
  std::vector<char> seen(m, 0);  // colrows dedup scratch

  for (int32_t t = 0; t < m; ++t) {
    // ---- pivot selection
    int32_t best_r = -1, best_c = -1;
    double best_v = 0.0;
    long best_cost = -1;
    int examined = 0;
    for (int32_t cnt = 1; cnt <= m && best_cost != 0; ++cnt) {
      if (best_cost >= 0 &&
          (long)(cnt - 1) * (cnt - 1) >= best_cost)
        break;  // no cheaper pivot can exist in later buckets
      auto& bk = bucket[cnt];
      for (size_t bi = 0; bi < bk.size();) {
        const int32_t c = bk[bi];
        if (!col_active[c]) {
          bk[bi] = bk.back();
          bk.pop_back();
          continue;
        }
        // compact the column (dedup + drop stale rows), find colmax
        double colmax = 0.0;
        auto& cr = colrows[c];
        size_t w = 0;
        for (size_t k = 0; k < cr.size(); ++k) {
          const int32_t r = cr[k];
          if (!row_active[r] || seen[r]) continue;
          const double v = urow_get(arow[r], c);
          if (std::fabs(v) <= tiny) continue;
          seen[r] = 1;
          cr[w++] = r;
          colmax = std::max(colmax, std::fabs(v));
        }
        cr.resize(w);
        for (int32_t r : cr) seen[r] = 0;
        colcnt[c] = (int32_t)w;
        if (w == 0) {
          col_active[c] = 0;  // structurally empty: singular
          bk[bi] = bk.back();
          bk.pop_back();
          continue;
        }
        if (std::min((int32_t)w, m) != cnt) {
          // mis-bucketed: move to the true bucket.  A LOWER true count
          // still gets evaluated now (its bucket was already passed this
          // step); a higher one waits for its later bucket.
          bk[bi] = bk.back();
          bk.pop_back();
          bucket[std::min((int32_t)w, m)].push_back(c);
          if ((int32_t)w > cnt) continue;
        } else {
          ++bi;
        }
        // threshold-eligible row with the smallest row count
        int32_t cand_r = -1;
        double cand_v = 0.0;
        for (int32_t r : cr) {
          const double v = urow_get(arow[r], c);
          if (std::fabs(v) < tau * colmax) continue;
          if (cand_r < 0 || rowcnt[r] < rowcnt[cand_r] ||
              (rowcnt[r] == rowcnt[cand_r] &&
               std::fabs(v) > std::fabs(cand_v))) {
            cand_r = r;
            cand_v = v;
          }
        }
        if (cand_r < 0) continue;
        const long cost = (long)(colcnt[c] - 1) * (rowcnt[cand_r] - 1);
        if (best_cost < 0 || cost < best_cost ||
            (cost == best_cost && std::fabs(cand_v) > std::fabs(best_v))) {
          best_cost = cost;
          best_r = cand_r;
          best_c = c;
          best_v = cand_v;
        }
        if (++examined >= kCand && best_cost >= 0) break;
      }
      if (examined >= kCand && best_cost >= 0) break;
    }
    if (best_r < 0) return false;  // no admissible pivot: singular

    const int32_t pr = best_r, pc = best_c;
    const double pv = best_v;
    F.ord_row[t] = pr;
    F.ord_col[t] = pc;
    F.rowpos[pr] = t;
    F.colpos[pc] = t;
    F.diag_of_col[pc] = pv;
    row_active[pr] = 0;
    col_active[pc] = 0;

    // the pivot row becomes U's row pr (its active-column entries)
    F.urow[pr] = arow[pr];
    for (const auto& e : F.urow[pr]) F.ucol_rows[e.first].push_back(pr);

    // eliminate the pivot column from the remaining active rows
    F.l_prow[t] = pr;
    auto& cr = colrows[pc];
    for (int32_t r : cr) {
      if (!row_active[r]) continue;
      const double v = urow_get(arow[r], pc);
      if (std::fabs(v) <= tiny) continue;
      const double f = v / pv;
      F.l_rows.push_back(r);
      F.l_vals.push_back(f);
      // row_r -= f * row_pr  (merge of two sorted vectors)
      const auto& prow = arow[pr];
      std::vector<Entry> merged;
      merged.reserve(arow[r].size() + prow.size());
      size_t i = 0, j = 0;
      const auto& rrow = arow[r];
      while (i < rrow.size() || j < prow.size()) {
        if (j >= prow.size() ||
            (i < rrow.size() && rrow[i].first < prow[j].first)) {
          merged.push_back(rrow[i++]);
        } else if (i >= rrow.size() || prow[j].first < rrow[i].first) {
          const int32_t c2 = prow[j].first;
          if (c2 != pc && col_active[c2]) {
            const double nv = -f * prow[j].second;
            if (std::fabs(nv) > tiny) {
              merged.push_back({c2, nv});  // fill-in
              colrows[c2].push_back(r);
              ++colcnt[c2];
            }
          }
          ++j;
        } else {  // same column
          const int32_t c2 = rrow[i].first;
          const double nv = rrow[i].second - f * prow[j].second;
          if (c2 != pc && std::fabs(nv) > tiny)
            merged.push_back({c2, nv});
          else if (c2 != pc)
            --colcnt[c2];  // exact cancellation (lazy colrows cleanup)
          ++i;
          ++j;
        }
      }
      rowcnt[r] = (int32_t)merged.size();
      arow[r] = std::move(merged);
    }
    F.l_start[t + 1] = (int32_t)F.l_rows.size();
    arow[pr].clear();
    arow[pr].shrink_to_fit();
  }
  return true;
}

// ---------------------------------------------------------------------------
// Solves
// ---------------------------------------------------------------------------

void apply_lower(const FtLU& F, double* w) {
  // L etas in factorization order, then FT row etas in creation order
  const int32_t m = F.m;
  for (int32_t t = 0; t < m; ++t) {
    const double wp = w[F.l_prow[t]];
    if (wp == 0.0) continue;
    for (int32_t k = F.l_start[t]; k < F.l_start[t + 1]; ++k)
      w[F.l_rows[k]] -= F.l_vals[k] * wp;
  }
  for (int32_t k = 0; k < F.nupdates; ++k) {
    double s = 0.0;
    for (int32_t p = F.e_start[k]; p < F.e_start[k + 1]; ++p)
      s += F.e_vals[p] * w[F.e_rows[p]];
    w[F.e_row[k]] -= s;
  }
}

void apply_lower_t(const FtLU& F, double* w) {
  // transposed FT row etas in reverse order, then transposed L etas
  for (int32_t k = F.nupdates - 1; k >= 0; --k) {
    const double wr = w[F.e_row[k]];
    if (wr == 0.0) continue;
    for (int32_t p = F.e_start[k]; p < F.e_start[k + 1]; ++p)
      w[F.e_rows[p]] -= F.e_vals[p] * wr;
  }
  for (int32_t t = F.m - 1; t >= 0; --t) {
    double s = 0.0;
    for (int32_t k = F.l_start[t]; k < F.l_start[t + 1]; ++k)
      s += F.l_vals[k] * w[F.l_rows[k]];
    w[F.l_prow[t]] -= s;
  }
}

void solve_upper(const FtLU& F, double* w) {
  // back substitution over pivot positions (w indexed by row on input,
  // result indexed by column); x written into scratch then copied out
  const int32_t m = F.m;
  std::vector<double>& x = const_cast<FtLU&>(F).work;
  for (int32_t t = m - 1; t >= 0; --t) {
    const int32_t r = F.ord_row[t], c = F.ord_col[t];
    double s = w[r];
    for (const auto& e : F.urow[r])
      if (e.first != c) s -= e.second * x[e.first];
    x[c] = s / F.diag_of_col[c];
  }
  std::memcpy(w, x.data(), m * sizeof(double));
}

void solve_upper_t(const FtLU& F, double* w) {
  // forward substitution on Uᵀ: v indexed by column on input, result
  // indexed by row.  accum[c] collects sum_{u<t} U[r_u, c] * y[r_u].
  const int32_t m = F.m;
  std::vector<double>& accum = const_cast<FtLU&>(F).work;
  std::fill(accum.begin(), accum.end(), 0.0);
  for (int32_t t = 0; t < m; ++t) {
    const int32_t r = F.ord_row[t], c = F.ord_col[t];
    const double y = (w[c] - accum[c]) / F.diag_of_col[c];
    for (const auto& e : F.urow[r])
      if (e.first != c) accum[e.first] += e.second * y;
    w[c] = y;  // stash temporarily keyed by column
  }
  // remap: result y is keyed by ROW slot (y[r_t] = stash[c_t])
  std::vector<double> out(m);
  for (int32_t t = 0; t < m; ++t) out[F.ord_row[t]] = w[F.ord_col[t]];
  std::memcpy(w, out.data(), m * sizeof(double));
}

// ---------------------------------------------------------------------------
// Forrest–Tomlin update
// ---------------------------------------------------------------------------

int update(FtLU& F, int32_t slot, int32_t nnz, const int32_t* rows,
           const double* vals) {
  const int32_t m = F.m;
  if (slot < 0 || slot >= m) return -1;

  // 1. spike s = (L · etas)⁻¹ a_q
  std::vector<double> s(m, 0.0);
  for (int32_t k = 0; k < nnz; ++k) s[rows[k]] = vals[k];
  apply_lower(F, s.data());
  double smax = 0.0;
  for (int32_t i = 0; i < m; ++i) smax = std::max(smax, std::fabs(s[i]));
  if (!(smax > 0.0) || !std::isfinite(smax)) return -1;
  const double drop = 1e-14 * smax;

  const int32_t t0 = F.colpos[slot];
  const int32_t spike_row = F.ord_row[t0];

  // 2. remove U's column `slot` (entries live in rows at positions <= t0)
  for (int32_t r : F.ucol_rows[slot]) urow_erase(F.urow[r], slot);
  F.ucol_rows[slot].clear();

  // 3. insert the spike as the new column `slot`
  for (int32_t i = 0; i < m; ++i) {
    if (std::fabs(s[i]) <= drop) continue;
    urow_insert(F.urow[i], slot, s[i]);
    F.ucol_rows[slot].push_back(i);
  }

  // 4. rotate position t0 to the back
  for (int32_t u = t0; u + 1 < m; ++u) {
    F.ord_row[u] = F.ord_row[u + 1];
    F.ord_col[u] = F.ord_col[u + 1];
    F.rowpos[F.ord_row[u]] = u;
    F.colpos[F.ord_col[u]] = u;
  }
  F.ord_row[m - 1] = spike_row;
  F.ord_col[m - 1] = slot;
  F.rowpos[spike_row] = m - 1;
  F.colpos[slot] = m - 1;

  // 5. eliminate the spiked row's entries at positions < m-1 with ONE
  //    row eta; process by increasing position so fill joins the queue
  std::map<int32_t, double> pend;  // position -> value (excluding last)
  double last_val = 0.0;
  for (const auto& e : F.urow[spike_row]) {
    const int32_t p = F.colpos[e.first];
    if (p == m - 1)
      last_val = e.second;
    else
      pend[p] = e.second;
  }
  const size_t eta_begin = F.e_rows.size();
  double rowmax = smax;
  for (auto it = pend.begin(); it != pend.end(); it = pend.begin()) {
    const int32_t u = it->first;
    const double val = it->second;
    pend.erase(it);
    rowmax = std::max(rowmax, std::fabs(val));
    if (std::fabs(val) <= 1e-14 * rowmax) continue;
    const int32_t ru = F.ord_row[u], cu = F.ord_col[u];
    const double f = val / F.diag_of_col[cu];
    F.e_rows.push_back(ru);
    F.e_vals.push_back(f);
    for (const auto& e : F.urow[ru]) {
      if (e.first == cu) continue;
      const int32_t p = F.colpos[e.first];
      if (p == m - 1)
        last_val -= f * e.second;
      else
        pend[p] -= f * e.second;
    }
  }
  if (F.e_rows.size() == eta_begin) {
    // no elimination was needed (spike already triangular)
  }
  F.e_row.push_back(spike_row);
  F.e_start.push_back((int32_t)F.e_rows.size());
  ++F.nupdates;

  // 6. the spiked row now holds only its new diagonal
  F.urow[spike_row].assign(1, {slot, last_val});
  F.ucol_rows[slot].push_back(spike_row);
  F.diag_of_col[slot] = last_val;

  if (!std::isfinite(last_val) || std::fabs(last_val) <= 1e-9 * smax)
    return 1;  // numerically unreliable: caller should refactorize
  return 0;
}

}  // namespace

extern "C" {

void* ftlu_create(int32_t m, const int32_t* indptr, const int32_t* indices,
                  const double* data) {
  FtLU* F = new FtLU();
  F->m = m;
  F->work.assign((size_t)m + 1, 0.0);
  F->ok = factorize(*F, indptr, indices, data);
  return F;
}

int32_t ftlu_ok(void* h) { return static_cast<FtLU*>(h)->ok ? 1 : 0; }

void ftlu_ftran(void* h, double* v) {
  FtLU& F = *static_cast<FtLU*>(h);
  apply_lower(F, v);
  solve_upper(F, v);
}

void ftlu_btran(void* h, double* v) {
  FtLU& F = *static_cast<FtLU*>(h);
  solve_upper_t(F, v);
  apply_lower_t(F, v);
}

int32_t ftlu_update(void* h, int32_t slot, int32_t nnz, const int32_t* rows,
                    const double* vals) {
  return update(*static_cast<FtLU*>(h), slot, nnz, rows, vals);
}

int32_t ftlu_nupdates(void* h) { return static_cast<FtLU*>(h)->nupdates; }

// total stored nonzeros (diagnostic: L + U + eta fill)
int64_t ftlu_fill(void* h) {
  FtLU& F = *static_cast<FtLU*>(h);
  int64_t n = (int64_t)F.l_vals.size() + (int64_t)F.e_vals.size();
  for (const auto& row : F.urow) n += (int64_t)row.size();
  return n;
}

void ftlu_free(void* h) { delete static_cast<FtLU*>(h); }

}  // extern "C"
