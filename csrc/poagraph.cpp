// Native POA variation-graph runtime — C++ twin of vechat_tpu/ops/poagraph.py
// (the host oracle), exposed through a C API for ctypes. Same semantics as
// the reference's modified spoa graph (vendor/spoa/src/graph.cpp), with every
// order-sensitive behaviour preserved:
//   * edge merge by first (tail->head) hit in out-edge insertion order
//     (graph.cpp:94-107)
//   * aligned-node ring construction order (graph.cpp:260-279)
//   * iterative-DFS topological sort with aligned bundles adjacent
//     (graph.cpp:301-371)
//   * prune decisions computed against pre-prune state; IEEE 0/0 -> NaN
//     comparisons keep-condition false (graph.cpp:811-982)
//   * connected components discovered in id order, preorder DFS, `>=` size
//     tie-break, weights reset to 0 in the extracted subgraph
//     (graph.cpp:984-1089)
//   * AddWeights gap-reset chains (graph.cpp:1104-1165)
//   * heaviest-bundle consensus with `<=` predecessor tie-break
//     (graph.cpp:534-638)
// plus a scalar linear-gap sequence-to-graph aligner with the exact DP and
// traceback preference order of the scalar reference engine
// (sisd_alignment_engine.cpp:292-459) as the host fallback path.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <set>
#include <vector>

namespace {

struct Edge {
  int tail;
  int head;
  long long weight;
  std::vector<int> labels;
};

struct Graph {
  std::vector<int> codes;
  std::vector<std::vector<int>> inedges;   // edge indices, insertion order
  std::vector<std::vector<int>> outedges;  // edge indices, insertion order
  std::vector<std::vector<int>> aligned;
  std::vector<Edge> edges;
  std::vector<int> sequences;  // begin node per sequence (-1 for none)
  std::vector<int> rank_to_node;
  std::vector<int> consensus;

  int add_node(int code) {
    codes.push_back(code);
    inedges.emplace_back();
    outedges.emplace_back();
    aligned.emplace_back();
    return static_cast<int>(codes.size()) - 1;
  }

  void add_edge(int tail, int head, long long weight) {
    for (int ei : outedges[tail]) {
      if (edges[ei].head == head) {
        edges[ei].labels.push_back(static_cast<int>(sequences.size()));
        edges[ei].weight += weight;
        return;
      }
    }
    Edge e;
    e.tail = tail;
    e.head = head;
    e.weight = weight;
    e.labels.push_back(static_cast<int>(sequences.size()));
    edges.push_back(std::move(e));
    int ei = static_cast<int>(edges.size()) - 1;
    outedges[tail].push_back(ei);
    inedges[head].push_back(ei);
  }

  // label-free edge insert for alignment-only graphs (positional subgraphs
  // are aligned against and discarded — nothing reads labels or merges
  // duplicate edges there, and the label vector is one heap allocation per
  // edge on the window hot path)
  void add_edge_nolabel(int tail, int head, long long weight) {
    Edge e;
    e.tail = tail;
    e.head = head;
    e.weight = weight;
    edges.push_back(std::move(e));
    int ei = static_cast<int>(edges.size()) - 1;
    outedges[tail].push_back(ei);
    inedges[head].push_back(ei);
  }

  int add_run(const uint8_t* s, const uint32_t* w, int begin, int end) {
    if (begin == end) return -1;
    int prev = -1;
    for (int i = begin; i < end; ++i) {
      int curr = add_node(s[i]);
      if (prev != -1) {
        add_edge(prev, curr, static_cast<long long>(w[i - 1]) + w[i]);
      }
      prev = curr;
    }
    return static_cast<int>(codes.size()) - (end - begin);
  }

  // Rank order = DFS post-order over predecessor dependencies with
  // aligned-bundle grouping: a bundle's representative emits itself plus
  // its whole aligned ring contiguously, and ring members scheduled as part
  // of a bundle never emit on their own. The EMISSION ORDER must match the
  // reference engine's exactly — DP row order IS the rank order, so
  // byte-parity of every downstream alignment depends on it (verified by
  // the native-vs-oracle order tests and scripts/diff_reference.py).
  void topological_sort() {
    const int n = static_cast<int>(codes.size());
    rank_to_node.clear();
    rank_to_node.reserve(n);
    std::vector<uint8_t> emitted(n, 0);
    std::vector<uint8_t> in_bundle(n, 0);  // scheduled via an aligned ring
    // work stack of (node, revisit-phase) pairs; a node is expanded on its
    // first visit (phase 0) and re-examined after its dependencies (phase 1)
    std::vector<std::pair<int, uint8_t>> work;
    for (int root = 0; root < n; ++root) {
      if (emitted[root] || in_bundle[root]) continue;
      work.emplace_back(root, 0);
      while (!work.empty()) {
        const int node = work.back().first;
        const bool revisit = work.back().second != 0;
        if (emitted[node]) {
          work.pop_back();
          continue;
        }
        // collect still-unmet dependencies: predecessor tails, then (for a
        // bundle representative) the aligned ring, claiming ring members
        size_t before = work.size();
        if (!revisit) work.back().second = 1;
        for (int ei : inedges[node]) {
          const int dep = edges[ei].tail;
          if (!emitted[dep]) work.emplace_back(dep, 0);
        }
        if (!in_bundle[node]) {
          for (int ring : aligned[node]) {
            if (!emitted[ring]) {
              work.emplace_back(ring, 0);
              in_bundle[ring] = 1;
            }
          }
        }
        if (work.size() != before) continue;  // dependencies first
        emitted[node] = 1;
        if (!in_bundle[node]) {
          rank_to_node.push_back(node);
          for (int ring : aligned[node]) rank_to_node.push_back(ring);
        }
        work.pop_back();
      }
    }
  }

  void add_alignment(const int* an, const int* ap, int alen, const uint8_t* s,
                     int slen, const uint32_t* w) {
    if (slen == 0) return;
    if (alen == 0) {
      sequences.push_back(add_run(s, w, 0, slen));
      topological_sort();
      return;
    }
    int vfront = -1, vback = -1;
    for (int i = 0; i < alen; ++i) {
      if (ap[i] != -1) {
        if (vfront == -1) vfront = ap[i];
        vback = ap[i];
      }
    }
    int begin = add_run(s, w, 0, vfront);
    int prev = begin != -1 ? static_cast<int>(codes.size()) - 1 : -1;
    int last = add_run(s, w, vback + 1, slen);

    for (int i = 0; i < alen; ++i) {
      if (ap[i] == -1) continue;
      int code = s[ap[i]];
      int curr;
      if (an[i] == -1) {
        curr = add_node(code);
      } else {
        int jt = an[i];
        if (codes[jt] == code) {
          curr = jt;
        } else {
          curr = -1;
          for (int k : aligned[jt]) {
            if (codes[k] == code) {
              curr = k;
              break;
            }
          }
          if (curr == -1) {
            curr = add_node(code);
            for (int k : aligned[jt]) {
              aligned[k].push_back(curr);
              aligned[curr].push_back(k);
            }
            aligned[jt].push_back(curr);
            aligned[curr].push_back(jt);
          }
        }
      }
      if (begin == -1) begin = curr;
      if (prev != -1) {
        add_edge(prev, curr, static_cast<long long>(w[ap[i] - 1]) + w[ap[i]]);
      }
      prev = curr;
    }
    if (last != -1) {
      add_edge(prev, last, static_cast<long long>(w[vback]) + w[vback + 1]);
    }
    sequences.push_back(begin);
    topological_sort();
  }

  int add_weights(const int* an, const int* ap, int alen, int slen,
                  const uint32_t* w) {
    if (slen == 0) return 1;
    if (alen == 0) return 0;  // unalignable read skipped (graph.cpp:1131-1134)
    int prev = -1;
    for (int i = 0; i < alen; ++i) {
      if (an[i] == -1 || ap[i] == -1) {
        prev = -1;
        continue;
      }
      int curr = an[i];
      if (prev != -1) {
        add_edge(prev, curr, static_cast<long long>(w[ap[i] - 1]) + w[ap[i]]);
      }
      prev = curr;
    }
    return 1;
  }

  void prune(double min_conf, double min_supp, double avg_weight) {
    size_t ne = edges.size();
    std::vector<uint8_t> drop(ne, 0);
    for (size_t i = 0; i < ne; ++i) {
      const Edge& e = edges[i];
      // min_weight is always 0 in the pipeline (src/window.cpp:311)
      double total_out = 0;
      for (int ei : outedges[e.tail]) total_out += edges[ei].weight;
      double conf_uv = e.weight / total_out;  // 0/0 -> NaN -> pruned
      double supp = e.weight / avg_weight;
      double total_in = 0;
      for (int ei : inedges[e.head]) total_in += edges[ei].weight;
      double conf_vu = e.weight / total_in;
      bool keep = conf_uv >= min_conf && conf_vu >= min_conf && supp >= min_supp;
      drop[i] = keep ? 0 : 1;
    }
    // rebuild edge storage compactly, preserving relative order everywhere
    std::vector<int> remap(ne, -1);
    std::vector<Edge> kept;
    kept.reserve(ne);
    for (size_t i = 0; i < ne; ++i) {
      if (!drop[i]) {
        remap[i] = static_cast<int>(kept.size());
        kept.push_back(std::move(edges[i]));
      }
    }
    edges = std::move(kept);
    for (auto& v : inedges) {
      std::vector<int> nv;
      for (int ei : v)
        if (remap[ei] != -1) nv.push_back(remap[ei]);
      v = std::move(nv);
    }
    for (auto& v : outedges) {
      std::vector<int> nv;
      for (int ei : v)
        if (remap[ei] != -1) nv.push_back(remap[ei]);
      v = std::move(nv);
    }
  }

  // preorder DFS components: start ids ascending; neighbours = in-edge tails
  // then out-edge heads, each in slot order (graph.cpp:984-1019)
  Graph* largest_subgraph() const {
    int n = static_cast<int>(codes.size());
    std::vector<uint8_t> visited(n, 0);
    std::vector<int> best;
    std::vector<int> comp;
    // iterative emulation of the recursive DFS preorder
    struct Frame {
      int node;
      size_t next;
      std::vector<int> adj;
    };
    for (int v0 = 0; v0 < n; ++v0) {
      if (visited[v0]) continue;
      comp.clear();
      std::vector<Frame> stack;
      auto adjacency = [&](int v) {
        std::vector<int> adj;
        for (int ei : inedges[v]) adj.push_back(edges[ei].tail);
        for (int ei : outedges[v]) adj.push_back(edges[ei].head);
        return adj;
      };
      visited[v0] = 1;
      comp.push_back(v0);
      stack.push_back({v0, 0, adjacency(v0)});
      while (!stack.empty()) {
        Frame& f = stack.back();
        bool advanced = false;
        while (f.next < f.adj.size()) {
          int u = f.adj[f.next++];
          if (!visited[u]) {
            visited[u] = 1;
            comp.push_back(u);
            stack.push_back({u, 0, adjacency(u)});
            advanced = true;
            break;
          }
        }
        if (!advanced) stack.pop_back();
      }
      if (comp.size() >= best.size()) best = comp;  // `>=`: last CC wins
    }

    Graph* sub = new Graph();
    std::vector<int> v2sub(n, -1);
    for (int v : best) {
      v2sub[v] = sub->add_node(codes[v]);
    }
    for (int v : best) {
      for (int ei : outedges[v]) {
        // always a fresh edge, weight 0, label 0 (graph.cpp:1091-1096)
        Edge e;
        e.tail = v2sub[v];
        e.head = v2sub[edges[ei].head];
        e.weight = 0;
        e.labels.push_back(0);
        sub->edges.push_back(std::move(e));
        int nei = static_cast<int>(sub->edges.size()) - 1;
        sub->outedges[v2sub[v]].push_back(nei);
        sub->inedges[v2sub[edges[ei].head]].push_back(nei);
      }
    }
    sub->topological_sort();
    return sub;
  }

  Graph* subgraph(int begin, int end, std::vector<int>* sub_to_graph) const {
    int n = static_cast<int>(codes.size());
    // backwards reachability from `end` down to ids >= `begin`
    // (graph.cpp:640-666)
    std::vector<uint8_t> keep(n, 0);
    std::vector<int> stack{end};
    while (!stack.empty()) {
      int curr = stack.back();
      stack.pop_back();
      if (!keep[curr] && curr >= begin) {
        for (int ei : inedges[curr]) stack.push_back(edges[ei].tail);
        for (int a : aligned[curr]) stack.push_back(a);
        keep[curr] = 1;
      }
    }
    Graph* sub = new Graph();
    std::vector<int> g2s(n, -1);
    sub_to_graph->clear();
    int nk = 0;
    for (int v = 0; v < n; ++v) nk += keep[v];
    sub->codes.reserve(nk);
    sub->inedges.reserve(nk);
    sub->outedges.reserve(nk);
    sub->aligned.reserve(nk);
    sub_to_graph->reserve(nk);
    for (int v = 0; v < n; ++v) {
      if (!keep[v]) continue;
      int sv = sub->add_node(codes[v]);
      g2s[v] = sv;
      sub_to_graph->push_back(v);
    }
    for (int v = 0; v < n; ++v) {
      if (!keep[v]) continue;
      int sv = g2s[v];
      for (int ei : inedges[v]) {
        if (g2s[edges[ei].tail] != -1) {
          // edges arrive tail-deduplicated from the parent, so the
          // label-free fast insert preserves edge identity and order
          sub->add_edge_nolabel(g2s[edges[ei].tail], sv, edges[ei].weight);
        }
      }
      for (int a : aligned[v]) {
        if (g2s[a] != -1) sub->aligned[sv].push_back(g2s[a]);
      }
    }
    sub->topological_sort();
    return sub;
  }

  int coverage(int v) const {
    std::set<int> labels;
    for (int ei : inedges[v])
      labels.insert(edges[ei].labels.begin(), edges[ei].labels.end());
    for (int ei : outedges[v])
      labels.insert(edges[ei].labels.begin(), edges[ei].labels.end());
    return static_cast<int>(labels.size());
  }

  int branch_completion(int rank, std::vector<long long>* scores,
                        std::vector<int>* preds) {
    int start = rank_to_node[rank];
    for (int ei : outedges[start]) {
      for (int ej : inedges[edges[ei].head]) {
        if (edges[ej].tail != start) (*scores)[edges[ej].tail] = -1;
      }
    }
    int maxn = -1;
    for (size_t i = rank + 1; i < rank_to_node.size(); ++i) {
      int v = rank_to_node[i];
      (*scores)[v] = -1;
      (*preds)[v] = -1;
      for (int ei : inedges[v]) {
        const Edge& e = edges[ei];
        if ((*scores)[e.tail] == -1) continue;
        if ((*scores)[v] < e.weight ||
            ((*scores)[v] == e.weight &&
             (*scores)[(*preds)[v]] <= (*scores)[e.tail])) {
          (*scores)[v] = e.weight;
          (*preds)[v] = e.tail;
        }
      }
      if ((*preds)[v] != -1) (*scores)[v] += (*scores)[(*preds)[v]];
      if (maxn == -1 || (*scores)[maxn] < (*scores)[v]) maxn = v;
    }
    return maxn;
  }

  void traverse_heaviest_bundle() {
    if (rank_to_node.empty()) return;
    int n = static_cast<int>(codes.size());
    std::vector<int> preds(n, -1);
    std::vector<long long> scores(n, -1);
    int maxn = -1;
    for (int v : rank_to_node) {
      for (int ei : inedges[v]) {
        const Edge& e = edges[ei];
        if (scores[v] < e.weight ||
            (scores[v] == e.weight && scores[preds[v]] <= scores[e.tail])) {
          scores[v] = e.weight;
          preds[v] = e.tail;
        }
      }
      if (preds[v] != -1) scores[v] += scores[preds[v]];
      if (maxn == -1 || scores[maxn] < scores[v]) maxn = v;
    }
    if (!outedges[maxn].empty()) {
      std::vector<int> rank_of(n, 0);
      for (size_t i = 0; i < rank_to_node.size(); ++i)
        rank_of[rank_to_node[i]] = static_cast<int>(i);
      while (!outedges[maxn].empty()) {
        maxn = branch_completion(rank_of[maxn], &scores, &preds);
      }
    }
    consensus.clear();
    while (preds[maxn] != -1) {
      consensus.push_back(maxn);
      maxn = preds[maxn];
    }
    consensus.push_back(maxn);
    std::reverse(consensus.begin(), consensus.end());
  }
};

// ------------------------- scalar linear aligner --------------------------

constexpr int32_t kNegInf = std::numeric_limits<int32_t>::min() + 1024;

// returns alignment length; fills out_nodes/out_pos (node id or -1, pos or -1)
// Traceback of the linear-gap sequence-to-graph DP, preference: diagonal per
// in-edge slot, vertical per slot, horizontal (sisd_alignment_engine.cpp:
// 369-459). Strided cell accessor so the single-sequence path (lane_stride 1)
// and the lane-batched fill (lane_stride LANES, H offset by lane) share the
// exact same walk.
template <typename HT>
static int traceback_linear(const Graph& g, const std::vector<int>& rank_of,
                            const uint8_t* seq, int type, int m, int x, int gp,
                            const HT* H, size_t row_stride,
                            size_t lane_stride, int max_i, int max_j,
                            int* out_nodes, int* out_pos, int cap) {
  auto cell = [&](int ci, int cj) -> int32_t {
    return H[static_cast<size_t>(ci) * row_stride * lane_stride +
             static_cast<size_t>(cj) * lane_stride];
  };
  std::vector<int> rn, rp;
  int i = max_i, j = max_j;
  auto keep_going = [&]() {
    if (type == 1) return cell(i, j) != 0;
    if (type == 0) return !(i == 0 && j == 0);
    return !(i == 0 || j == 0);
  };
  int prev_i = 0, prev_j = 0;
  while (keep_going()) {
    int32_t h_ij = cell(i, j);
    bool found = false;
    if (i != 0 && j != 0) {
      int v = g.rank_to_node[i - 1];
      int32_t mc = (seq[j - 1] == g.codes[v]) ? m : x;
      const std::vector<int>& ins = g.inedges[v];
      size_t np = ins.empty() ? 1 : ins.size();
      for (size_t p = 0; p < np && !found; ++p) {
        int pi = ins.empty() ? 0 : rank_of[g.edges[ins[p]].tail] + 1;
        if (h_ij == cell(pi, j - 1) + mc) {
          prev_i = pi;
          prev_j = j - 1;
          found = true;
        }
      }
    }
    if (!found && i != 0) {
      int v = g.rank_to_node[i - 1];
      const std::vector<int>& ins = g.inedges[v];
      size_t np = ins.empty() ? 1 : ins.size();
      for (size_t p = 0; p < np && !found; ++p) {
        int pi = ins.empty() ? 0 : rank_of[g.edges[ins[p]].tail] + 1;
        if (h_ij == cell(pi, j) + gp) {
          prev_i = pi;
          prev_j = j;
          found = true;
        }
      }
    }
    if (!found && h_ij == cell(i, j - 1) + gp) {
      prev_i = i;
      prev_j = j - 1;
      found = true;
    }
    rn.push_back(i == prev_i ? -1 : g.rank_to_node[i - 1]);
    rp.push_back(j == prev_j ? -1 : j - 1);
    i = prev_i;
    j = prev_j;
  }
  int cnt = static_cast<int>(rn.size());
  if (cnt > cap) return -1;
  for (int k = 0; k < cnt; ++k) {
    out_nodes[k] = rn[cnt - 1 - k];
    out_pos[k] = rp[cnt - 1 - k];
  }
  return cnt;
}

int align_linear(const Graph& g, const uint8_t* seq, int slen, int type,
                 int m, int x, int gp, int* out_nodes, int* out_pos, int cap) {
  int n = static_cast<int>(g.codes.size());
  if (n == 0 || slen == 0) return 0;
  int W = slen + 1;
  std::vector<int> rank_of(n, 0);
  for (size_t i = 0; i < g.rank_to_node.size(); ++i)
    rank_of[g.rank_to_node[i]] = static_cast<int>(i);

  std::vector<int32_t> H(static_cast<size_t>(n + 1) * W, 0);
  auto row = [&](int i) { return H.data() + static_cast<size_t>(i) * W; };

  if (type == 0) {  // nw
    for (int j = 0; j < W; ++j) row(0)[j] = j * gp;
    for (int v : g.rank_to_node) {
      int i = rank_of[v] + 1;
      int32_t pen;
      if (g.inedges[v].empty()) {
        pen = 0;
      } else {
        pen = kNegInf;
        for (int ei : g.inedges[v])
          pen = std::max(pen, row(rank_of[g.edges[ei].tail] + 1)[0]);
      }
      row(i)[0] = pen + gp;
    }
  } else if (type == 2) {  // ov
    for (int j = 0; j < W; ++j) row(0)[j] = j * gp;
  }

  int32_t max_score = type == 1 ? 0 : kNegInf;
  int max_i = 0, max_j = 0;

  // per-node row fill: profile row hoisted once per node (reused by every
  // predecessor pass, vectorized); the in-row gap close stays serial (its
  // loop-carried max has no compiler-vectorizable form without intrinsics
  // — the lane-batched path below is the vector formulation) with maximum
  // tracking folded in, exactly the reference engine's scan order
  std::vector<int32_t> prof(W);
  for (int v : g.rank_to_node) {
    int i = rank_of[v] + 1;
    int code = g.codes[v];
    int32_t* __restrict__ Hr = row(i);
    const std::vector<int>& ins = g.inedges[v];
    size_t np = ins.empty() ? 1 : ins.size();
    int32_t* __restrict__ pf = prof.data();
    for (int j = 1; j < W; ++j) pf[j] = (seq[j - 1] == code) ? m : x;
    for (size_t p = 0; p < np; ++p) {
      int pi = ins.empty() ? 0 : rank_of[g.edges[ins[p]].tail] + 1;
      const int32_t* __restrict__ Hp = row(pi);
      if (p == 0) {
        for (int j = 1; j < W; ++j)
          Hr[j] = std::max(Hp[j - 1] + pf[j], Hp[j] + gp);
      } else {
        for (int j = 1; j < W; ++j) {
          int32_t cand = std::max(Hp[j - 1] + pf[j], Hp[j] + gp);
          Hr[j] = std::max(Hr[j], cand);
        }
      }
    }
    for (int j = 1; j < W; ++j) {
      Hr[j] = std::max(Hr[j - 1] + gp, Hr[j]);
      if (type == 1) {
        Hr[j] = std::max(Hr[j], 0);
        if (max_score < Hr[j]) {
          max_score = Hr[j];
          max_i = i;
          max_j = j;
        }
      } else if (type == 0) {
        if (g.outedges[v].empty() && j == W - 1 && max_score < Hr[j]) {
          max_score = Hr[j];
          max_i = i;
          max_j = j;
        }
      } else {
        if (g.outedges[v].empty() && max_score < Hr[j]) {
          max_score = Hr[j];
          max_i = i;
          max_j = j;
        }
      }
    }
  }

  if (max_i == 0 && max_j == 0) return 0;
  return traceback_linear(g, rank_of, seq, type, m, x, gp, H.data(), W, 1,
                          max_i, max_j, out_nodes, out_pos, cap);
}

// Lane-batched linear-gap DP: aligns up to kLanes sequences against the SAME
// graph simultaneously, one SIMD lane per sequence (the vertical batching
// cudapoa uses across a window's sequences — here it vectorizes the host
// fallback path instead). Every lane computes exactly the scalar recurrence
// of align_linear (identical adds, maxes, strict-greater maximum tracking
// with first-j/first-row tie wins), so per-lane results are byte-identical
// to one-at-a-time align_linear calls; the shared traceback helper walks
// each lane with a stride. Two structural points make it fast:
//   * ONE fused pass per column: all predecessor candidates, the serial
//     in-row gap close (carried in registers) and the row-maximum tracking
//     happen per column, so each H row is streamed exactly once — the
//     separate-pass formulation was H-bandwidth-bound, not compute-bound;
//   * int16 cells when the worst-case |score| fits (always true for 500 bp
//     windows; (n + maxlen + 2) * maxpen < 30000 guard), halving traffic
//     and doubling lanes per vector; int32 cells otherwise. Identical
//     arithmetic either way — scores never overflow the chosen width.
// Lanes beyond nseq / shorter lanes compute padding cells that are never
// read (per-lane length masks keep them out of max tracking).
constexpr int kLanes = 32;

template <typename HT>
static void align_linear_batch_t(const Graph& g, const uint8_t* const* seqs,
                                 const int* lens, int nseq, int type, int m,
                                 int x, int gp, int* out_nodes, int* out_pos,
                                 int* out_cnt, int cap) {
  const int n = static_cast<int>(g.codes.size());
  int maxlen = 0;
  for (int l = 0; l < nseq; ++l) maxlen = std::max(maxlen, lens[l]);
  const int W = maxlen + 1;
  constexpr int L = kLanes;
  const HT neg_inf = std::is_same<HT, int16_t>::value
                         ? static_cast<HT>(-30000)
                         : static_cast<HT>(kNegInf);
  std::vector<int> rank_of(n, 0);
  for (size_t i = 0; i < g.rank_to_node.size(); ++i)
    rank_of[g.rank_to_node[i]] = static_cast<int>(i);
  const size_t rs = static_cast<size_t>(W) * L;
  thread_local std::vector<HT> hbuf;
  // per-pool-thread high-water buffer: release it when a much smaller
  // problem follows so -t threads don't retain deep-window footprints
  // (tens of MB each) for the rest of the process
  const size_t hneed = static_cast<size_t>(n + 1) * rs;
  if (hbuf.size() > (8u << 20) / sizeof(HT) && hbuf.size() > 8 * hneed) {
    hbuf.clear();
    hbuf.shrink_to_fit();
  }
  if (hbuf.size() < hneed) hbuf.resize(hneed);
  HT* H = hbuf.data();
  // lane-width codes for the interleaved sequences: a uint8 buffer makes
  // gcc pick a tiny vector factor for the mixed-width compare
  thread_local std::vector<HT> sbuf;
  if (sbuf.size() < static_cast<size_t>(maxlen) * L)
    sbuf.resize(static_cast<size_t>(maxlen) * L);
  HT* S = sbuf.data();
  int lensL[kLanes];
  for (int l = 0; l < L; ++l) lensL[l] = l < nseq ? lens[l] : 0;
  for (int j = 0; j < maxlen; ++j)
    for (int l = 0; l < L; ++l)
      S[static_cast<size_t>(j) * L + l] =
          (j < lensL[l]) ? static_cast<HT>(seqs[l][j]) : static_cast<HT>(-1);

  // row 0 and (rank-ordered) column 0, mirroring align_linear's init
  for (int j = 0; j < W; ++j) {
    const HT v = static_cast<HT>((type == 1) ? 0 : j * gp);
    for (int l = 0; l < L; ++l) H[static_cast<size_t>(j) * L + l] = v;
  }
  for (int v : g.rank_to_node) {
    const int i = rank_of[v] + 1;
    HT c0 = 0;
    if (type == 0) {
      HT pen;
      if (g.inedges[v].empty()) {
        pen = 0;
      } else {
        pen = neg_inf;
        for (int ei : g.inedges[v])
          pen = std::max(
              pen, H[static_cast<size_t>(rank_of[g.edges[ei].tail] + 1) * rs]);
      }
      c0 = static_cast<HT>(pen + gp);
    }
    HT* hr = H + static_cast<size_t>(i) * rs;
    for (int l = 0; l < L; ++l) hr[l] = c0;
  }

  int32_t max_score[kLanes];
  int max_i[kLanes], max_j[kLanes];
  for (int l = 0; l < L; ++l) {
    max_score[l] = type == 1 ? 0 : kNegInf;
    max_i[l] = 0;
    max_j[l] = 0;
  }

  const HT hm = static_cast<HT>(m), hx = static_cast<HT>(x),
           hgp = static_cast<HT>(gp);
  int pred_rows[16];
  std::vector<int> pred_rows_big;
  for (int v : g.rank_to_node) {
    const int i = rank_of[v] + 1;
    const HT code = static_cast<HT>(g.codes[v]);
    HT* __restrict__ hr = H + static_cast<size_t>(i) * rs;
    const std::vector<int>& ins = g.inedges[v];
    const int np =
        ins.empty() ? 1 : static_cast<int>(ins.size());
    const int* pr;
    if (np <= 16) {
      for (int p = 0; p < np; ++p)
        pred_rows[p] =
            ins.empty() ? 0 : rank_of[g.edges[ins[p]].tail] + 1;
      pr = pred_rows;
    } else {
      pred_rows_big.resize(np);
      for (int p = 0; p < np; ++p)
        pred_rows_big[p] = rank_of[g.edges[ins[p]].tail] + 1;
      pr = pred_rows_big.data();
    }
    const bool track_row =
        type == 1 || (type == 2 && g.outedges[v].empty());
    // ONE fused pass per column: predecessor candidates, the register-
    // carried in-row gap close, and the row-maximum tracking (within a row
    // the FIRST j with the row maximum wins — strict-greater updates,
    // ascending j, exactly align_linear's scan order; across rows the
    // earliest rank wins)
    HT carry[kLanes], rm[kLanes];
    int32_t rj[kLanes];
    for (int l = 0; l < L; ++l) {
      carry[l] = hr[l];
      rm[l] = std::numeric_limits<HT>::min();
      rj[l] = 0;
    }
    // np==1 / np==2 cover almost every node in a near-linear POA graph:
    // fully fused single lane-loop per column, no intermediate array
    if (np == 1) {
      const HT* __restrict__ hp0 = H + static_cast<size_t>(pr[0]) * rs;
      for (int j = 1; j < W; ++j) {
        const HT* __restrict__ sd = S + static_cast<size_t>(j - 1) * L;
        const HT* __restrict__ hp = hp0 + static_cast<size_t>(j - 1) * L;
        HT* __restrict__ ho = hr + static_cast<size_t>(j) * L;
        for (int l = 0; l < L; ++l) {
          const HT prof = (sd[l] == code) ? hm : hx;
          HT vv = std::max(static_cast<HT>(hp[l] + prof),
                           static_cast<HT>(hp[L + l] + hgp));
          vv = std::max(static_cast<HT>(carry[l] + hgp), vv);
          if (type == 1) vv = std::max(vv, static_cast<HT>(0));
          ho[l] = vv;
          carry[l] = vv;
          const HT tv = (track_row && sd[l] != static_cast<HT>(-1))
                            ? vv
                            : std::numeric_limits<HT>::min();
          if (tv > rm[l]) {
            rm[l] = tv;
            rj[l] = j;
          }
        }
      }
    } else if (np == 2) {
      const HT* __restrict__ hp0 = H + static_cast<size_t>(pr[0]) * rs;
      const HT* __restrict__ hp1 = H + static_cast<size_t>(pr[1]) * rs;
      for (int j = 1; j < W; ++j) {
        const HT* __restrict__ sd = S + static_cast<size_t>(j - 1) * L;
        const HT* __restrict__ hpa = hp0 + static_cast<size_t>(j - 1) * L;
        const HT* __restrict__ hpb = hp1 + static_cast<size_t>(j - 1) * L;
        HT* __restrict__ ho = hr + static_cast<size_t>(j) * L;
        for (int l = 0; l < L; ++l) {
          const HT prof = (sd[l] == code) ? hm : hx;
          const HT ca = std::max(static_cast<HT>(hpa[l] + prof),
                                 static_cast<HT>(hpa[L + l] + hgp));
          const HT cb = std::max(static_cast<HT>(hpb[l] + prof),
                                 static_cast<HT>(hpb[L + l] + hgp));
          HT vv = std::max(ca, cb);
          vv = std::max(static_cast<HT>(carry[l] + hgp), vv);
          if (type == 1) vv = std::max(vv, static_cast<HT>(0));
          ho[l] = vv;
          carry[l] = vv;
          const HT tv = (track_row && sd[l] != static_cast<HT>(-1))
                            ? vv
                            : std::numeric_limits<HT>::min();
          if (tv > rm[l]) {
            rm[l] = tv;
            rj[l] = j;
          }
        }
      }
    } else {
      for (int j = 1; j < W; ++j) {
        const HT* __restrict__ sd = S + static_cast<size_t>(j - 1) * L;
        HT* __restrict__ ho = hr + static_cast<size_t>(j) * L;
        HT acc[kLanes];
        {
          const HT* __restrict__ hp = H + static_cast<size_t>(pr[0]) * rs +
                                      static_cast<size_t>(j - 1) * L;
          for (int l = 0; l < L; ++l) {
            const HT prof = (sd[l] == code) ? hm : hx;
            acc[l] = std::max(static_cast<HT>(hp[l] + prof),
                              static_cast<HT>(hp[L + l] + hgp));
          }
        }
        for (int p = 1; p < np; ++p) {
          const HT* __restrict__ hp = H + static_cast<size_t>(pr[p]) * rs +
                                      static_cast<size_t>(j - 1) * L;
          for (int l = 0; l < L; ++l) {
            const HT prof = (sd[l] == code) ? hm : hx;
            const HT cand = std::max(static_cast<HT>(hp[l] + prof),
                                     static_cast<HT>(hp[L + l] + hgp));
            acc[l] = std::max(acc[l], cand);
          }
        }
        for (int l = 0; l < L; ++l) {
          HT vv = std::max(static_cast<HT>(carry[l] + hgp), acc[l]);
          if (type == 1) vv = std::max(vv, static_cast<HT>(0));
          ho[l] = vv;
          carry[l] = vv;
          // sd[l] == -1 marks padding columns for this lane (j > lens[l])
          const HT tv = (track_row && sd[l] != static_cast<HT>(-1))
                            ? vv
                            : std::numeric_limits<HT>::min();
          if (tv > rm[l]) {
            rm[l] = tv;
            rj[l] = j;
          }
        }
      }
    }
    if (track_row) {
      for (int l = 0; l < nseq; ++l) {
        if (lensL[l] > 0 && max_score[l] < static_cast<int32_t>(rm[l])) {
          max_score[l] = rm[l];
          max_i[l] = i;
          max_j[l] = rj[l];
        }
      }
    }
    if (type == 0 && g.outedges[v].empty()) {
      for (int l = 0; l < nseq; ++l) {
        if (lensL[l] == 0) continue;
        const int32_t vv = hr[static_cast<size_t>(lensL[l]) * L + l];
        if (max_score[l] < vv) {
          max_score[l] = vv;
          max_i[l] = i;
          max_j[l] = lensL[l];
        }
      }
    }
  }

  for (int l = 0; l < nseq; ++l) {
    if (lensL[l] == 0 || (max_i[l] == 0 && max_j[l] == 0)) {
      out_cnt[l] = 0;
      continue;
    }
    out_cnt[l] = traceback_linear(
        g, rank_of, seqs[l], type, m, x, gp, H + l, W, L, max_i[l], max_j[l],
        out_nodes + static_cast<size_t>(l) * cap,
        out_pos + static_cast<size_t>(l) * cap, cap);
  }
}

static void align_linear_batch(const Graph& g, const uint8_t* const* seqs,
                               const int* lens, int nseq, int type, int m,
                               int x, int gp, int* out_nodes, int* out_pos,
                               int* out_cnt, int cap) {
  const int n = static_cast<int>(g.codes.size());
  int maxlen = 0;
  for (int l = 0; l < nseq; ++l) maxlen = std::max(maxlen, lens[l]);
  if (n == 0 || maxlen == 0) {
    for (int l = 0; l < nseq; ++l) out_cnt[l] = 0;
    return;
  }
  const int maxpen =
      std::max({std::abs(m), std::abs(x), std::abs(gp)});
  const long long bound =
      static_cast<long long>(n + maxlen + 2) * maxpen;
  if (bound < 29000) {
    align_linear_batch_t<int16_t>(g, seqs, lens, nseq, type, m, x, gp,
                                  out_nodes, out_pos, out_cnt, cap);
  } else {
    align_linear_batch_t<int32_t>(g, seqs, lens, nseq, type, m, x, gp,
                                  out_nodes, out_pos, out_cnt, cap);
  }
}

}  // namespace

extern "C" {

void* poa_create() { return new Graph(); }
void poa_free(void* g) { delete static_cast<Graph*>(g); }
int poa_num_nodes(void* g) {
  return static_cast<int>(static_cast<Graph*>(g)->codes.size());
}
int poa_num_edges(void* g) {
  return static_cast<int>(static_cast<Graph*>(g)->edges.size());
}
long long poa_total_edge_weight(void* g) {
  long long s = 0;
  for (const auto& e : static_cast<Graph*>(g)->edges) s += e.weight;
  return s;
}

void poa_add_alignment(void* g, const int* an, const int* ap, int alen,
                       const uint8_t* s, int slen, const uint32_t* w) {
  static_cast<Graph*>(g)->add_alignment(an, ap, alen, s, slen, w);
}

int poa_add_weights(void* g, const int* an, const int* ap, int alen, int slen,
                    const uint32_t* w) {
  return static_cast<Graph*>(g)->add_weights(an, ap, alen, slen, w);
}

void poa_prune(void* g, double min_conf, double min_supp, double avg_weight) {
  static_cast<Graph*>(g)->prune(min_conf, min_supp, avg_weight);
}

void* poa_largest_subgraph(void* g) {
  return static_cast<Graph*>(g)->largest_subgraph();
}

void* poa_subgraph(void* g, int begin, int end, int* out_map, int* out_len) {
  std::vector<int> m;
  Graph* sub = static_cast<Graph*>(g)->subgraph(begin, end, &m);
  *out_len = static_cast<int>(m.size());
  std::memcpy(out_map, m.data(), m.size() * sizeof(int));
  return sub;
}

int poa_corrected(void* g, const int* an, int alen, uint8_t* out) {
  Graph* gr = static_cast<Graph*>(g);
  int k = 0;
  for (int i = 0; i < alen; ++i) {
    if (an[i] != -1) out[k++] = static_cast<uint8_t>(gr->codes[an[i]]);
  }
  return k;
}

int poa_consensus(void* g, uint8_t* out_codes, int* out_cov, int want_cov) {
  Graph* gr = static_cast<Graph*>(g);
  gr->traverse_heaviest_bundle();
  int k = 0;
  for (int v : gr->consensus) {
    out_codes[k] = static_cast<uint8_t>(gr->codes[v]);
    if (want_cov) {
      int c = gr->coverage(v);
      for (int a : gr->aligned[v]) c += gr->coverage(a);
      out_cov[k] = c;
    }
    ++k;
  }
  return k;
}

int poa_max_in_degree(void* g) {
  Graph* gr = static_cast<Graph*>(g);
  int d = 0;
  for (const auto& v : gr->inedges)
    d = std::max(d, static_cast<int>(v.size()));
  return d;
}

// dense export in DP-rank order for the device kernel: preds are DP row
// indices (rank+1), slot order = in-edge insertion order, "no in-edges" ->
// single pred pointing at row 0, padding repeats slot 0.
int poa_dense(void* g, int n_cap, int p_cap, int* codes, int* preds,
              int* node_id, int* sink, int* n_nodes) {
  Graph* gr = static_cast<Graph*>(g);
  int n = static_cast<int>(gr->codes.size());
  if (n > n_cap) return 0;
  std::vector<int> rank_of(n, 0);
  for (size_t i = 0; i < gr->rank_to_node.size(); ++i)
    rank_of[gr->rank_to_node[i]] = static_cast<int>(i);
  std::memset(codes, 0, sizeof(int) * n_cap);
  std::memset(preds, 0, sizeof(int) * n_cap * p_cap);
  std::memset(node_id, 0, sizeof(int) * n_cap);
  std::memset(sink, 0, sizeof(int) * n_cap);
  for (int r = 0; r < n; ++r) {
    int v = gr->rank_to_node[r];
    codes[r] = gr->codes[v];
    node_id[r] = v;
    sink[r] = gr->outedges[v].empty() ? 1 : 0;
    const auto& ins = gr->inedges[v];
    if (static_cast<int>(ins.size()) > p_cap) return 0;
    int first = ins.empty() ? 0 : rank_of[gr->edges[ins[0]].tail] + 1;
    for (int p = 0; p < p_cap; ++p) {
      // preds laid out slot-major [p_cap][n_cap] to match the kernel
      preds[p * n_cap + r] =
          p < static_cast<int>(ins.size())
              ? rank_of[gr->edges[ins[p]].tail] + 1
              : first;
    }
  }
  *n_nodes = n;
  return 1;
}

// Flat edge-list export for the device graph cycle
// (vechat_tpu/ops/kernels/graph_cycle.py): codes indexed by node id; edges
// in insertion order, which IS every per-node in/out slot order (add_edge
// appends globally; prune's compaction is monotone). Returns 0 when caps
// are exceeded — caller falls back to the host cycle.
int poa_edges(void* gv, int n_cap, int e_cap, int* codes, int* tails,
              int* heads, int* weights, int* n_nodes, int* n_edges) {
  Graph* g = static_cast<Graph*>(gv);
  int n = static_cast<int>(g->codes.size());
  int m = static_cast<int>(g->edges.size());
  if (n > n_cap || m > e_cap) return 0;
  for (int i = 0; i < n; ++i) codes[i] = g->codes[i];
  for (int i = 0; i < m; ++i) {
    tails[i] = g->edges[i].tail;
    heads[i] = g->edges[i].head;
    long long w = g->edges[i].weight;
    weights[i] = w > 0x7fffffffLL ? 0x7fffffff : static_cast<int>(w);
  }
  *n_nodes = n;
  *n_edges = m;
  return 1;
}

int poa_align(void* g, const uint8_t* seq, int slen, int type, int m, int x,
              int gp, int* out_nodes, int* out_pos, int cap) {
  return align_linear(*static_cast<Graph*>(g), seq, slen, type, m, x, gp,
                      out_nodes, out_pos, cap);
}

// Lane-batched variant: seqs_flat holds nseq sequences back to back
// (offsets from lens); outputs are [nseq][cap] slabs + per-seq counts
// (-1 on per-seq overflow). nseq must be <= kLanes; results are
// byte-identical to nseq scalar poa_align calls.
int poa_align_batch(void* g, const uint8_t* seqs_flat, const int32_t* lens,
                    int nseq, int type, int m, int x, int gp, int* out_nodes,
                    int* out_pos, int* out_cnt, int cap) {
  if (nseq <= 0) return 0;
  if (nseq > kLanes) return -1;
  const uint8_t* ptrs[kLanes];
  int ilens[kLanes];
  size_t off = 0;
  for (int l = 0; l < nseq; ++l) {
    ptrs[l] = seqs_flat + off;
    ilens[l] = lens[l];
    off += static_cast<size_t>(lens[l]);
  }
  align_linear_batch(*static_cast<Graph*>(g), ptrs, ilens, nseq, type, m, x,
                     gp, out_nodes, out_pos, out_cnt, cap);
  return 0;
}

// Full graph serialization (the cereal role; reference:
// vendor/spoa/include/spoa/graph.hpp:195-297). Flat arrays only; the
// in/out-edge slot vectors are ascending in edge index by construction
// (add_edge appends, prune's remap is monotone), so load() reconstructs
// them exactly by scanning the edge array in order; ranks come from the
// deterministic topological sort.
void poa_save_sizes(void* gv, int* n, int* m, int* nlab, int* nal,
                    int* nseq) {
  Graph* g = static_cast<Graph*>(gv);
  *n = static_cast<int>(g->codes.size());
  *m = static_cast<int>(g->edges.size());
  long long labs = 0;
  for (const auto& e : g->edges) labs += e.labels.size();
  *nlab = static_cast<int>(labs);
  long long als = 0;
  for (const auto& a : g->aligned) als += a.size();
  *nal = static_cast<int>(als);
  *nseq = static_cast<int>(g->sequences.size());
}

void poa_save(void* gv, int* codes, int* tails, int* heads, long long* w,
              int* lab_off, int* labels, int* al_off, int* al, int* seqs) {
  Graph* g = static_cast<Graph*>(gv);
  int n = static_cast<int>(g->codes.size());
  int m = static_cast<int>(g->edges.size());
  for (int i = 0; i < n; ++i) codes[i] = g->codes[i];
  int lk = 0;
  for (int i = 0; i < m; ++i) {
    const Edge& e = g->edges[i];
    tails[i] = e.tail;
    heads[i] = e.head;
    w[i] = e.weight;
    lab_off[i] = lk;
    for (int l : e.labels) labels[lk++] = l;
  }
  lab_off[m] = lk;
  int ak = 0;
  for (int i = 0; i < n; ++i) {
    al_off[i] = ak;
    for (int a : g->aligned[i]) al[ak++] = a;
  }
  al_off[n] = ak;
  for (size_t i = 0; i < g->sequences.size(); ++i) seqs[i] = g->sequences[i];
}

void* poa_load(int n, int m, int nseq, const int* codes, const int* tails,
               const int* heads, const long long* w, const int* lab_off,
               const int* labels, const int* al_off, const int* al,
               const int* seqs) {
  Graph* g = new Graph();
  for (int i = 0; i < n; ++i) g->add_node(codes[i]);
  g->edges.reserve(m);
  for (int i = 0; i < m; ++i) {
    Edge e;
    e.tail = tails[i];
    e.head = heads[i];
    e.weight = w[i];
    for (int k = lab_off[i]; k < lab_off[i + 1]; ++k)
      e.labels.push_back(labels[k]);
    g->edges.push_back(std::move(e));
    g->outedges[tails[i]].push_back(i);
    g->inedges[heads[i]].push_back(i);
  }
  for (int i = 0; i < n; ++i)
    for (int k = al_off[i]; k < al_off[i + 1]; ++k)
      g->aligned[i].push_back(al[k]);
  for (int i = 0; i < nseq; ++i) g->sequences.push_back(seqs[i]);
  if (n > 0) g->topological_sort();
  return g;
}

// Pairwise global edit-distance alignment (the edlib role, host fast path).
// Identical DP and traceback tie-breaks to ops/pairwise.py:_full_dp_cigar
// (diagonal, then 'D' = consume target, then 'I' = consume query), so the
// CIGARs are byte-identical to the Python reference implementation.
// Returns op count (ops written M/I/D into out_ops, forward order), or -1 on
// overflow. Memory: one direction byte per cell + two rolling rows.
// Banded variant: computes only cells with |i - j*lq/lt...| within a band of
// half-width w around the corner-to-corner diagonal. If the resulting
// distance is <= w the alignment is globally optimal (standard Ukkonen
// argument); the caller doubles w otherwise. Returns -2 when the distance
// exceeds the band (retry with a larger band), -1 on buffer overflow.
static int pw_align_banded(const uint8_t* q, int lq, const uint8_t* t, int lt,
                           int w, char* out_ops, int cap) {
  const int64_t INF = 1 << 28;
  int width = 2 * w + 1;
  // cell (i, j) stored at row i, offset j - center(i) + w, center(i) = i*lt/lq
  std::vector<int32_t> prev(width), curr(width);
  std::vector<uint8_t> dir(static_cast<size_t>(lq + 1) * width);
  auto center = [&](int i) { return static_cast<int>((int64_t)i * lt / lq); };
  // row 0
  for (int off = 0; off < width; ++off) {
    int j = off - w;  // center(0) = 0
    prev[off] = (j >= 0 && j <= lt) ? j : INF;
    dir[off] = 1;
  }
  for (int i = 1; i <= lq; ++i) {
    int c = center(i), cp = center(i - 1);
    int shift = c - cp;  // how much the band moved right
    uint8_t* drow = dir.data() + static_cast<size_t>(i) * width;
    const uint8_t qc = q[i - 1];
    for (int off = 0; off < width; ++off) {
      int j = c + off - w;
      if (j < 0 || j > lt) {
        curr[off] = INF;
        continue;
      }
      // prev row offsets: j-1 -> off + shift - 1 ; j -> off + shift
      int po1 = off + shift - 1, po = off + shift;
      int32_t d = (j >= 1 && po1 >= 0 && po1 < width) ? prev[po1] : INF;
      if (d < INF) d += (qc == t[j - 1] ? 0 : 1);
      int32_t up = (po >= 0 && po < width) ? prev[po] : INF;
      if (up < INF) up += 1;
      int32_t left = (off >= 1) ? curr[off - 1] : INF;
      if (left < INF) left += 1;
      if (j == 0) {
        curr[off] = i;
        drow[off] = 2;
        continue;
      }
      int32_t best = d;
      uint8_t dd = 0;
      if (left < best) {
        best = left;
        dd = 1;
      }
      if (up < best) {
        best = up;
        dd = 2;
      }
      if (best == d) {
        dd = 0;
      } else if (best == left) {
        dd = 1;
      }
      curr[off] = best;
      drow[off] = dd;
    }
    std::swap(prev, curr);
  }
  int final_off = lt - center(lq) + w;  // == w
  if (final_off < 0 || final_off >= width) return -2;
  int32_t dist = prev[final_off];
  // sloped-band safety: an optimal path deviates from the corner-to-corner
  // diagonal by at most dist + |lq - lt|; require that within the band
  int skew = lq > lt ? lq - lt : lt - lq;
  if (dist >= INF || dist + skew > w) return -2;  // widen and retry
  // traceback
  std::vector<char> ops;
  ops.reserve(lq + lt);
  int i = lq, j = lt;
  while (i > 0 || j > 0) {
    int off = j - center(i) + w;
    uint8_t dd = dir[static_cast<size_t>(i) * width + off];
    if (i > 0 && j > 0 && dd == 0) {
      ops.push_back('M');
      --i;
      --j;
    } else if (j > 0 && (dd == 1 || i == 0)) {
      ops.push_back('D');
      --j;
    } else {
      ops.push_back('I');
      --i;
    }
  }
  int cnt = static_cast<int>(ops.size());
  if (cnt > cap) return -1;
  for (int k = 0; k < cnt; ++k) out_ops[k] = ops[cnt - 1 - k];
  return cnt;
}

// Myers bit-parallel NW edit distance (the algorithm family edlib uses:
// Myers 1999, in Hyyro's blocked formulation with horizontal-delta chaining
// between 64-row blocks) with per-column D0/HP bit stores for an exact
// traceback. 64 DP cells per word op, ~30-60x the scalar row DP.
//
// The traceback is provably identical to the full-matrix scalar DP above:
//   - prefer 'M'  iff  H[i][j] == H[i-1][j-1] + sub, i.e. the diagonal
//     delta (0 if the stored D0 bit is set, else +1) equals sub;
//   - else prefer 'D'  iff  H[i][j] == H[i][j-1] + 1, i.e. the stored
//     (unshifted) HP bit for row i is set;
//   - else 'I' (then necessarily H[i][j] == H[i-1][j] + 1).
// These are exactly the dir-byte rules of the scalar DP, re-expressed in
// the delta encoding, so CIGARs stay byte-identical to _full_dp_cigar at
// every size. Memory: 16 bytes per 64-cell block per column.
// Returns op count, or -1 on out_ops overflow.
static int pw_align_myers(const uint8_t* q, int lq, const uint8_t* t, int lt,
                          char* out_ops, int cap) {
  const int W = 64;
  const int nb = (lq + W - 1) / W;
  const size_t stride = static_cast<size_t>(nb);
  std::vector<uint64_t> d0s(stride * (lt + 1));
  std::vector<uint64_t> hps(stride * (lt + 1));
  int amax = 0;
  for (int i = 0; i < lq; ++i) amax = std::max(amax, (int)q[i]);
  for (int j = 0; j < lt; ++j) amax = std::max(amax, (int)t[j]);
  std::vector<uint64_t> peq(static_cast<size_t>(amax + 1) * nb, 0);
  for (int i = 0; i < lq; ++i)
    peq[static_cast<size_t>(q[i]) * nb + i / W] |= 1ull << (i % W);
  std::vector<uint64_t> pv(nb, ~0ull), mv(nb, 0);
  for (int j = 1; j <= lt; ++j) {
    const uint64_t* eq = &peq[static_cast<size_t>(t[j - 1]) * nb];
    uint64_t* d0col = &d0s[stride * j];
    uint64_t* hpcol = &hps[stride * j];
    int hin = 1;  // NW top row: H[0][j] - H[0][j-1] = +1
    for (int b = 0; b < nb; ++b) {
      uint64_t p = pv[b], m = mv[b], e = eq[b];
      if (hin < 0) e |= 1ull;
      uint64_t d0 = (((e & p) + p) ^ p) | e | m;
      uint64_t hp = m | ~(d0 | p);
      uint64_t hn = p & d0;
      d0col[b] = d0;
      hpcol[b] = hp;
      int hout = (hp >> 63) & 1 ? 1 : ((hn >> 63) & 1 ? -1 : 0);
      hp = (hp << 1) | (hin > 0 ? 1ull : 0ull);
      hn = (hn << 1) | (hin < 0 ? 1ull : 0ull);
      pv[b] = hn | ~(d0 | hp);
      mv[b] = hp & d0;
      hin = hout;
    }
  }
  std::vector<char> ops;
  ops.reserve(lq + lt);
  int i = lq, j = lt;
  while (i > 0 || j > 0) {
    if (i == 0) {
      ops.push_back('D');
      --j;
      continue;
    }
    if (j == 0) {
      ops.push_back('I');
      --i;
      continue;
    }
    const int b = (i - 1) / W, bit = (i - 1) % W;
    const int sub = (q[i - 1] == t[j - 1]) ? 0 : 1;
    const int diag_delta = ((d0s[stride * j + b] >> bit) & 1) ? 0 : 1;
    if (diag_delta == sub) {
      ops.push_back('M');
      --i;
      --j;
    } else if ((hps[stride * j + b] >> bit) & 1) {
      ops.push_back('D');
      --j;
    } else {
      ops.push_back('I');
      --i;
    }
  }
  int cnt = static_cast<int>(ops.size());
  if (cnt > cap) return -1;
  for (int k = 0; k < cnt; ++k) out_ops[k] = ops[cnt - 1 - k];
  return cnt;
}

int pw_align(const uint8_t* q, int lq, const uint8_t* t, int lt,
             char* out_ops, int cap) {
  if (lq == 0) {
    if (lt > cap) return -1;
    for (int j = 0; j < lt; ++j) out_ops[j] = 'D';
    return lt;
  }
  if (lt == 0) {
    if (lq > cap) return -1;
    for (int i = 0; i < lq; ++i) out_ops[i] = 'I';
    return lq;
  }
  size_t cells = static_cast<size_t>(lq + 1) * (lt + 1);
  // bit-parallel path for everything beyond tiny: byte-identical CIGARs to
  // the scalar full DP below (see pw_align_myers) at ~1/64 the cell ops.
  // The D0/HP stores cost cells/4 bytes; above ~2G cells fall back to the
  // distance-banded variant (optimal distance, tie path may differ).
  if (cells > 4'096) {
    if (cells <= 2'000'000'000ull) {
      return pw_align_myers(q, lq, t, lt, out_ops, cap);
    }
    int skew = lq > lt ? lq - lt : lt - lq;
    int w = 64 + skew;
    int wmax = lq + lt;
    while (w < wmax) {
      int r = pw_align_banded(q, lq, t, lt, w, out_ops, cap);
      if (r == -1) return -1;
      if (r >= 0) {
        return r;
      }
      w *= 2;
    }
    // fall through to full DP as last resort
  }
  std::vector<uint8_t> dir(cells);  // 0 diag, 1 'D', 2 'I'
  std::vector<int32_t> prev(lt + 1), curr(lt + 1);
  for (int j = 0; j <= lt; ++j) {
    prev[j] = j;
    dir[j] = 1;  // top row: all 'D'
  }
  for (int i = 1; i <= lq; ++i) {
    curr[0] = i;
    dir[static_cast<size_t>(i) * (lt + 1)] = 2;  // left column: 'I'
    const uint8_t qc = q[i - 1];
    uint8_t* drow = dir.data() + static_cast<size_t>(i) * (lt + 1);
    for (int j = 1; j <= lt; ++j) {
      int32_t d = prev[j - 1] + (qc == t[j - 1] ? 0 : 1);
      int32_t up = prev[j] + 1;
      int32_t left = curr[j - 1] + 1;
      // min with traceback preference diag > 'D'(left) > 'I'(up)
      int32_t best = d;
      uint8_t dd = 0;
      if (left < best) {
        best = left;
        dd = 1;
      }
      if (up < best) {
        best = up;
        dd = 2;
      }
      // re-derive the preferred direction for equal costs, matching the
      // Python traceback's check order
      if (best == d) {
        dd = 0;
      } else if (best == left) {
        dd = 1;
      }
      curr[j] = best;
      drow[j] = dd;
    }
    std::swap(prev, curr);
  }
  // traceback
  std::vector<char> ops;
  ops.reserve(lq + lt);
  int i = lq, j = lt;
  while (i > 0 || j > 0) {
    uint8_t dd = dir[static_cast<size_t>(i) * (lt + 1) + j];
    if (i > 0 && j > 0 && dd == 0) {
      ops.push_back('M');
      --i;
      --j;
    } else if (j > 0 && (dd == 1 || i == 0)) {
      ops.push_back('D');
      --j;
    } else {
      ops.push_back('I');
      --i;
    }
  }
  int cnt = static_cast<int>(ops.size());
  if (cnt > cap) return -1;
  for (int k = 0; k < cnt; ++k) out_ops[k] = ops[cnt - 1 - k];
  return cnt;
}

// One whole realign round as a single native call (the host twin of the
// device graph-cycle program's realign step): lane-batch-align every
// sequence against the (structurally frozen) pruned graph, then apply
// AddWeights in the caller's original order — windows.py's realign loop
// semantics (backbone first, then layers in sorted order,
// src/window.cpp:329-386) with zero per-sequence Python round-trips.
// modes[i]: 0 = NW with (m, x, gp); 1 = SW with (sm, sx, sgp).
// Alignments are computed grouped by mode (the graph does not change
// while aligning), then AddWeights applies in index order — only the
// application order is semantically ordered. Returns 0, or -1 on error.
int poa_realign_round(void* gv, const uint8_t* seqs_flat, const int32_t* lens,
                      const uint8_t* modes, const uint32_t* weights_flat,
                      int nseq, int m, int x, int gp, int sm, int sx,
                      int sgp) {
  Graph& g = *static_cast<Graph*>(gv);
  if (nseq <= 0) return 0;
  std::vector<size_t> off(nseq + 1, 0);
  int maxlen = 0;
  for (int i = 0; i < nseq; ++i) {
    off[i + 1] = off[i] + static_cast<size_t>(lens[i]);
    maxlen = std::max(maxlen, lens[i]);
  }
  const int cap = static_cast<int>(g.codes.size()) + maxlen + 2;
  // alignment store: [nseq][cap] node/pos + counts
  std::vector<int> an(static_cast<size_t>(nseq) * cap);
  std::vector<int> ap(static_cast<size_t>(nseq) * cap);
  std::vector<int> cnt(nseq, 0);
  for (int mode = 0; mode <= 1; ++mode) {
    const int am = mode ? sm : m, ax = mode ? sx : x, ag = mode ? sgp : gp;
    const int atype = mode ? 1 : 0;
    const uint8_t* ptrs[kLanes];
    int blens[kLanes];
    int bidx[kLanes];
    int nb = 0;
    auto flush = [&]() {
      if (!nb) return;
      int bcnt[kLanes];
      std::vector<int> on(static_cast<size_t>(nb) * cap);
      std::vector<int> op(static_cast<size_t>(nb) * cap);
      align_linear_batch(g, ptrs, blens, nb, atype, am, ax, ag, on.data(),
                         op.data(), bcnt, cap);
      for (int l = 0; l < nb; ++l) {
        const int i = bidx[l];
        cnt[i] = std::max(bcnt[l], 0);
        std::memcpy(&an[static_cast<size_t>(i) * cap],
                    &on[static_cast<size_t>(l) * cap],
                    static_cast<size_t>(cnt[i]) * sizeof(int));
        std::memcpy(&ap[static_cast<size_t>(i) * cap],
                    &op[static_cast<size_t>(l) * cap],
                    static_cast<size_t>(cnt[i]) * sizeof(int));
      }
      nb = 0;
    };
    for (int i = 0; i < nseq; ++i) {
      if (modes[i] != mode || lens[i] == 0) continue;
      ptrs[nb] = seqs_flat + off[i];
      blens[nb] = lens[i];
      bidx[nb] = i;
      if (++nb == kLanes) flush();
    }
    flush();
  }
  for (int i = 0; i < nseq; ++i) {
    g.add_weights(&an[static_cast<size_t>(i) * cap],
                  &ap[static_cast<size_t>(i) * cap], cnt[i], lens[i],
                  weights_flat + off[i]);
  }
  return 0;
}

// As pw_align but emits the run-length-encoded CIGAR string directly
// ("123M4D..."), so the caller skips per-op list work entirely. Returns the
// string length written to out (no NUL), or -1 on overflow.
int pw_align_cigar(const uint8_t* q, int lq, const uint8_t* t, int lt,
                   char* out, int cap) {
  thread_local std::vector<char> ops;
  if (ops.size() < static_cast<size_t>(lq + lt + 2))
    ops.resize(static_cast<size_t>(lq + lt + 2));
  int n = pw_align(q, lq, t, lt, ops.data(), static_cast<int>(ops.size()));
  if (n < 0) return -1;
  int o = 0;
  int i = 0;
  while (i < n) {
    int j = i;
    while (j < n && ops[j] == ops[i]) ++j;
    char num[16];
    int len = std::snprintf(num, sizeof num, "%d", j - i);
    if (o + len + 1 > cap) return -1;
    std::memcpy(out + o, num, len);
    o += len;
    out[o++] = ops[i];
    i = j;
  }
  return o;
}

// Scored chaining DP over diagonal-clustered anchors (minimap2's chain
// score in place of the greedy monotone accept set — VERDICT r2 item 8).
// Anchors arrive sorted by (cluster, query_start); clusters never span
// read pairs. For each cluster the DP picks the best-scoring colinear
// chain with minimap2-like scoring: contribution min(dq, dt, k) minus a
// drift+gap penalty, bounded predecessor lookback. out_keep marks anchors
// on each cluster's best chain; out_score stores the cluster's best chain
// score (written at every anchor of the cluster for easy host reduction).
//
// cl:      [m] ascending cluster id per anchor
// a_s:     [m] query start of anchor (every anchor spans exactly k bases,
//          so the query end is implicit: a_s + k)
// b_sgn:   [m] signed target pos: +b_s on same strand, -b_s on opposite
//          (colinear predecessors must have smaller signed value)
// k:       k-mer length
// lookback: max predecessors examined per anchor (minimap2 uses 25-64)
int chain_clusters(const int64_t* cl, const int64_t* a_s,
                   const int64_t* b_sgn, int64_t m, int k, int lookback,
                   uint8_t* out_keep, float* out_score) {
  if (m <= 0) return 0;
  std::vector<float> f(m);
  std::vector<int64_t> pre(m);
  int64_t i0 = 0;
  while (i0 < m) {
    int64_t i1 = i0;
    while (i1 < m && cl[i1] == cl[i0]) ++i1;
    // DP within [i0, i1)
    float best = -1e30f;
    int64_t best_i = i0;
    for (int64_t i = i0; i < i1; ++i) {
      f[i] = (float)k;  // chain of just this anchor
      pre[i] = -1;
      int64_t jlo = i - lookback < i0 ? i0 : i - lookback;
      for (int64_t j = i - 1; j >= jlo; --j) {
        int64_t dq = a_s[i] - a_s[j];
        int64_t dt = b_sgn[i] - b_sgn[j];
        if (dq <= 0 || dt <= 0) continue;  // must advance on both reads
        int64_t dmin = dq < dt ? dq : dt;
        int64_t dmax = dq < dt ? dt : dq;
        float w = (float)(dmin < k ? dmin : k);  // new matching bases
        float drift = (float)(dq > dt ? dq - dt : dt - dq);
        // minimap2-flavored cost: linear drift + soft log gap penalty
        float cost = 0.1f * drift + 0.15f * (float)__builtin_log2l(
            (long double)(dmax + 1));
        float cand = f[j] + w - cost;
        if (cand > f[i]) {
          f[i] = cand;
          pre[i] = j;
        }
      }
      if (f[i] > best) {
        best = f[i];
        best_i = i;
      }
    }
    for (int64_t i = i0; i < i1; ++i) {
      out_keep[i] = 0;
      out_score[i] = best;
    }
    for (int64_t i = best_i; i >= 0; i = pre[i]) out_keep[i] = 1;
    i0 = i1;
  }
  return 0;
}

// Layer processing order for window consensus. The reference sorts
// rank[1..n] (sequence indices; rank[0] is the backbone) with std::sort on
// `positions_[l].first < positions_[r].first` (src/window.cpp:97,210) —
// UNSTABLE, so equal-begin layers land in libstdc++-introsort order, and
// POA construction is order-sensitive. Byte-parity with the reference
// binary requires replaying the very same sort: same initial permutation
// [1..n], same comparator, same std::sort. out_order receives 0-based
// layer indices (value l-1 for sequence index l).
int layer_sort_order(const int32_t* begins, int n, int32_t* out_order) {
  std::vector<uint32_t> rank(static_cast<size_t>(n) + 1);
  for (int i = 0; i <= n; ++i) rank[i] = static_cast<uint32_t>(i);
  std::sort(rank.begin() + 1, rank.end(), [&](uint32_t l, uint32_t r) {
    return begins[l - 1] < begins[r - 1];
  });
  for (int i = 0; i < n; ++i) out_order[i] = static_cast<int32_t>(rank[i + 1]) - 1;
  return 0;
}

}  // extern "C"
