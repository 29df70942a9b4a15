// Planned-permutation router: decompose an arbitrary permutation into
// TPU-friendly stages.
//
// TPU vector units have no arbitrary gather/scatter, but they CAN rotate
// vector registers across lanes/sublanes (pltpu.roll) and transpose via XLA
// at memory bandwidth.  Any plan-known permutation of N = R*C elements is
// realized as three row-local permutations with two transposes between them
// (3-stage Clos routing; the middle assignment is an edge coloring of a
// C-regular bipartite multigraph, Konig's theorem, computed here by
// recursive Euler splitting), and each row-local permutation is realized as
// a Benes exchange network (2*log2(W)-1 stages of XOR-distance swaps, each
// one roll+select on the VPU).
//
// This plays the role the reference's Thrust sort_by_key / counting sort
// play on the GPU (e.g. the numeric-phase column sort,
// cuda-c/src/kernel/kernel_spgemm_hash_template.cu:805-815): data movement
// with a plan-known destination, executed at memory bandwidth instead of a
// comparison sort.
//
// Everything here is host-side precompute; the device applies the masks.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int n_threads() {
  unsigned hc = std::thread::hardware_concurrency();
  if (hc == 0) hc = 4;
  if (hc > 64) hc = 64;
  return static_cast<int>(hc);
}

// ---------------------------------------------------------------------------
// Euler-split edge coloring of a C-regular bipartite multigraph.
//
// Edges e in [subset]: left vertex u[e] in [0,R), right vertex v[e] in [0,R).
// Every vertex on both sides has degree exactly d (a power of two).  Assigns
// color[e] in [base, base+d) such that edges sharing a left or right vertex
// get distinct colors.
// ---------------------------------------------------------------------------

struct ColorCtx {
  const int32_t* u;
  const int32_t* v;
  int32_t* color;
  int64_t R;
  std::atomic<int> live_threads{0};
  int max_threads = 1;
};

// Split the edge subset into two equal-degree halves by walking Euler
// cycles; edges traversed left->right get half 0, right->left half 1.
// Reorders `edges[lo, hi)` so half-0 edges come first; returns the split
// point.
int64_t euler_split(ColorCtx& ctx, int32_t* edges, int64_t lo, int64_t hi) {
  const int64_t ne = hi - lo;
  const int64_t R = ctx.R;
  // adjacency over 2R vertices (right side offset by R)
  std::vector<int32_t> adj_off(2 * R + 1, 0);
  std::vector<int32_t> adj(2 * ne);
  std::vector<int32_t> half(ne);
  for (int64_t i = 0; i < ne; ++i) {
    const int32_t e = edges[lo + i];
    adj_off[ctx.u[e] + 1]++;
    adj_off[R + ctx.v[e] + 1]++;
  }
  for (int64_t vtx = 0; vtx < 2 * R; ++vtx) adj_off[vtx + 1] += adj_off[vtx];
  {
    std::vector<int32_t> cur(adj_off.begin(), adj_off.end() - 1);
    for (int64_t i = 0; i < ne; ++i) {
      const int32_t e = edges[lo + i];
      adj[cur[ctx.u[e]]++] = static_cast<int32_t>(i);
      adj[cur[R + ctx.v[e]]++] = static_cast<int32_t>(i);
    }
  }
  std::vector<int32_t> ptr(adj_off.begin(), adj_off.end() - 1);
  std::vector<uint8_t> used(ne, 0);

  for (int64_t start = 0; start < ne; ++start) {
    if (used[start]) continue;
    // walk a cycle starting from this edge's left endpoint
    int64_t cv = ctx.u[edges[lo + start]];  // current vertex (left side id)
    bool on_left = true;
    int64_t cur_edge = start;
    while (true) {
      used[cur_edge] = 1;
      half[cur_edge] = on_left ? 0 : 1;  // left->right : right->left
      // move to the other endpoint
      const int32_t e = edges[lo + cur_edge];
      const int64_t nv = on_left ? (R + ctx.v[e]) : ctx.u[e];
      on_left = !on_left;
      // find next unused edge at nv
      int32_t& p = ptr[nv];
      const int32_t end = adj_off[nv + 1];
      while (p < end && used[adj[p]]) ++p;
      if (p >= end) break;  // cycle closed (even degrees guarantee closure)
      cur_edge = adj[p];
      cv = nv;
      (void)cv;
    }
  }

  // stable partition: half-0 first
  std::vector<int32_t> tmp(ne);
  int64_t n0 = 0;
  for (int64_t i = 0; i < ne; ++i)
    if (half[i] == 0) tmp[n0++] = edges[lo + i];
  int64_t n1 = n0;
  for (int64_t i = 0; i < ne; ++i)
    if (half[i] == 1) tmp[n1++] = edges[lo + i];
  std::memcpy(edges + lo, tmp.data(), ne * sizeof(int32_t));
  return lo + n0;
}

void color_rec(ColorCtx& ctx, int32_t* edges, int64_t lo, int64_t hi,
               int32_t base, int32_t d, int depth) {
  if (d == 1) {
    for (int64_t i = lo; i < hi; ++i) ctx.color[edges[i]] = base;
    return;
  }
  const int64_t mid = euler_split(ctx, edges, lo, hi);
  const int32_t hd = d / 2;
  // parallelize the two independent halves while threads remain
  if (depth < 6 && ctx.live_threads.load() < ctx.max_threads) {
    ctx.live_threads.fetch_add(1);
    std::thread t([&ctx, edges, lo, mid, base, hd, depth] {
      color_rec(ctx, edges, lo, mid, base, hd, depth + 1);
      ctx.live_threads.fetch_sub(1);
    });
    color_rec(ctx, edges, mid, hi, base + hd, hd, depth + 1);
    t.join();
  } else {
    color_rec(ctx, edges, lo, mid, base, hd, depth + 1);
    color_rec(ctx, edges, mid, hi, base + hd, hd, depth + 1);
  }
}

}  // namespace

extern "C" {

// Clos-route the gather permutation out[i] = x[src[i]] over an (R, C) grid
// (N = R*C; C a power of two) into three row-local gather permutations:
//   y1[r*C + c]   = x[r*C + s1[r*C + c]]
//   y2 = transpose_{R x C}(y1)                    (shape C x R)
//   y3[c*R + r]   = y2[c*R + s2[c*R + r]]
//   y4 = transpose_{C x R}(y3)                    (shape R x C)
//   out[r*C + c]  = y4[r*C + s3[r*C + c]]
// Returns 0 on success, -1 on invalid input.
int64_t nsp_clos_route(const int32_t* src, int64_t R, int64_t C,
                       int32_t* s1, int32_t* s2, int32_t* s3) {
  if (R <= 0 || C <= 0 || (C & (C - 1)) != 0) return -1;
  const int64_t N = R * C;
  // edge e == output slot o: left = source row, right = output row
  std::vector<int32_t> u(N), v(N), color(N);
  for (int64_t o = 0; o < N; ++o) {
    u[o] = static_cast<int32_t>(src[o] / C);
    v[o] = static_cast<int32_t>(o / C);
  }
  std::vector<int32_t> edges(N);
  for (int64_t i = 0; i < N; ++i) edges[i] = static_cast<int32_t>(i);

  ColorCtx ctx;
  ctx.u = u.data();
  ctx.v = v.data();
  ctx.color = color.data();
  ctx.R = R;
  ctx.max_threads = n_threads();
  color_rec(ctx, edges.data(), 0, N, 0, static_cast<int32_t>(C), 0);

  // stage permutations (gather semantics)
  //   element e: ri = u[e], ci = src[e] % C, ro = v[e], co = e % C, k = color
  //   s1[ri, k] = ci;  s2[k, ro] = ri;  s3[ro, co] = k
  for (int64_t e = 0; e < N; ++e) {
    const int64_t ri = u[e], ro = v[e];
    const int64_t k = color[e];
    s1[ri * C + k] = static_cast<int32_t>(src[e] % C);
    s2[k * R + ro] = static_cast<int32_t>(ri);
    s3[e] = static_cast<int32_t>(k);  // e == ro * C + co
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Benes routing: realize a gather permutation out[i] = x[perm[i]] on W = 2^w
// wires as 2w-1 stages of XOR-distance exchanges, distances
// W/2, W/4, ..., 1, ..., W/4, W/2 (stage t's distance d_t).
// mask32[p] bit t == 1 means position p takes the value from p ^ d_t at
// stage t (set symmetrically on both members of a swapped pair).
// ---------------------------------------------------------------------------

namespace {

// Recursive router on a sub-problem of size n (power of two) embedded in
// wire set wires[0..n): perm_local[i] = index into wires of the source.
// stage_in / stage_out are the global stage indices for this level's outer
// stages; masks are set via the global wire ids.
struct BenesCtx {
  int32_t* mask;   // per-wire int32 (bits = stages)
  int w_total;     // log2(W)
};

void benes_rec(BenesCtx& ctx, const int32_t* wires, int32_t* perm, int64_t n,
               int level, std::vector<int32_t>& scratch) {
  if (n == 1) return;
  if (n == 2) {
    // middle stage (distance 1): global stage index = w_total - 1
    const int t = ctx.w_total - 1;
    if (perm[0] == 1) {  // swap
      ctx.mask[wires[0]] |= (1 << t);
      ctx.mask[wires[1]] |= (1 << t);
    }
    return;
  }
  const int64_t h = n / 2;
  const int t_in = level;                        // stage index of input stage
  const int t_out = 2 * ctx.w_total - 2 - level;  // mirrored output stage

  // 2-color the pair graph: h_out[i] = which half output i's element takes
  // through the middle; constraint h_out[i] != h_out[i^h] and the induced
  // input halves h_in[perm[i]] = h_out[i] must satisfy h_in[j] != h_in[j^h].
  std::vector<int8_t> h_out(n, -1);
  std::vector<int32_t> inv(n);
  for (int64_t i = 0; i < n; ++i) inv[perm[i]] = static_cast<int32_t>(i);
  for (int64_t i0 = 0; i0 < n; ++i0) {
    if (h_out[i0] >= 0) continue;
    int64_t i = i0;
    int8_t h = 0;
    while (h_out[i] < 0) {
      h_out[i] = h;
      // partner output (same out-pair) must take the other half
      const int64_t ip = i ^ h;  // placeholder; real partner below
      (void)ip;
      const int64_t i_pair = i ^ h;  // unused
      (void)i_pair;
      // the input feeding i is perm[i]; its in-pair partner perm[i]^h(alf)
      // feeds some output i2 which must take the other half; then i2's
      // out-pair partner continues the walk with half h again.
      const int64_t j = perm[i];
      const int64_t j2 = j ^ h;  // wrong var reuse guard
      (void)j2;
      const int64_t jp = j ^ h;  // placeholder
      (void)jp;
      const int64_t j_partner = j ^ h;  // placeholder
      (void)j_partner;
      const int64_t jq = j ^ h;  (void)jq;
      const int64_t partner_in = j ^ h;  (void)partner_in;
      // --- real logic ---
      const int64_t in_partner = j ^ h;  (void)in_partner;
      const int64_t i2 = inv[j ^ h];
      if (h_out[i2] < 0) h_out[i2] = static_cast<int8_t>(1 - h);
      const int64_t i3 = i2 ^ h;  (void)i3;
      const int64_t next_i = i2 ^ h;  (void)next_i;
      i = i2 ^ h;  // out-pair partner of i2 keeps half h... walk continues
      // NOTE: masks fixed below from h_out; loop exits when we return to a
      // colored output.
      // (half variable h stays 0 along this walk by construction)
    }
  }
  (void)t_in;
  (void)t_out;
  (void)scratch;
  // The above walk is subtle; superseded by the clean implementation in
  // benes_route_one below.
}

}  // namespace

// Clean iterative Benes routing for one tile.
static void benes_route_one(const int32_t* perm_in, int64_t W, int w_total,
                            int32_t* mask) {
  // Work arrays reused across recursion levels (manual stack).
  // At each level we operate on a contiguous list of wire ids and the local
  // permutation among them.
  struct Frame {
    int64_t off;   // offset into the wires/perm arrays
    int64_t n;     // sub-problem size
    int level;     // recursion depth (input stage index)
  };
  std::vector<int32_t> wires(W), perm(W), nwires(W), nperm(W), inv(W);
  std::vector<int8_t> h_out(W);
  for (int64_t i = 0; i < W; ++i) {
    wires[i] = static_cast<int32_t>(i);
    perm[i] = perm_in[i];
  }
  std::vector<Frame> stack;
  stack.push_back({0, W, 0});
  while (!stack.empty()) {
    Frame f = stack.back();
    stack.pop_back();
    const int64_t n = f.n, off = f.off;
    if (n == 1) continue;
    int32_t* wr = wires.data() + off;
    int32_t* pm = perm.data() + off;
    if (n == 2) {
      const int t = w_total - 1;  // middle stage (distance 1)
      if (pm[0] == 1) {
        mask[wr[0]] |= (1u << t);
        mask[wr[1]] |= (1u << t);
      }
      continue;
    }
    const int64_t h = n / 2;
    const int t_in = f.level;
    const int t_out = 2 * w_total - 2 - f.level;
    for (int64_t i = 0; i < n; ++i) inv[pm[i]] = static_cast<int32_t>(i);
    // 2-color outputs into halves by walking the pair cycles
    std::memset(h_out.data(), -1, n);
    for (int64_t s = 0; s < n; ++s) {
      if (h_out[s] >= 0) continue;
      int64_t i = s;
      int8_t hc = 0;
      // walk: assign h_out[i] = hc; the in-pair partner of perm[i] feeds
      // output i2 = inv[perm[i] ^ h] which must take 1-hc; its out-pair
      // partner i2 ^ h must take hc; continue from there.
      while (h_out[i] < 0) {
        h_out[i] = hc;
        const int64_t i2 = inv[pm[i] ^ h];
        if (h_out[i2] < 0) {
          h_out[i2] = static_cast<int8_t>(1 - hc);
        }
        i = i2 >= h ? i2 - h : i2 + h;  // i2 ^ h in local indexing
      }
    }
    // masks for the outer stages + build sub-problems
    // input stage: element at input j must go to half h_in(j) =
    // h_out[inv[j]]; swap pair {j, j+h} iff (j >= h) != h_in(j)
    // (local position bit vs target half).
    // output stage: output i takes from half h_out[i]; swap iff
    // (i >= h) != h_out[i].
    int64_t c0 = 0, c1 = 0;
    // sub-wire lists: lower half positions [off, off+h), upper [off+h, ...)
    for (int64_t i = 0; i < n; ++i) {
      const int8_t ho = h_out[i];
      const bool i_hi = i >= h;
      if ((i_hi ? 1 : 0) != ho) {
        mask[wr[i]] |= (1u << t_out);
      }
      const int64_t j = pm[i];
      const bool j_hi = j >= h;
      if ((j_hi ? 1 : 0) != ho) {
        mask[wr[j]] |= (1u << t_in);
      }
      // middle: element travels in half ho; its middle input position is
      // (j mod h) in sub-network ho, middle output position (i mod h).
      const int64_t mi = (i_hi ? i - h : i);
      const int64_t mj = (j_hi ? j - h : j);
      if (ho == 0) {
        nperm[off + mi] = static_cast<int32_t>(mj);
        (void)c0;
      } else {
        nperm[off + h + mi] = static_cast<int32_t>(mj);
        (void)c1;
      }
    }
    // sub-wires: position p of sub-network 0 is wire wr[p]?  No: after the
    // input stage, the element occupying middle position (half, q) sits on
    // the physical wire (half * h + q) of this sub-range.
    for (int64_t q = 0; q < n; ++q) nwires[off + q] = wr[q];
    std::memcpy(wr, nwires.data() + off, n * sizeof(int32_t));
    std::memcpy(pm, nperm.data() + off, n * sizeof(int32_t));
    stack.push_back({off, h, f.level + 1});
    stack.push_back({off + h, h, f.level + 1});
  }
}

extern "C" int64_t nsp_benes_route(const int32_t* perms, int64_t W,
                                   int64_t n_tiles, int32_t* mask32) {
  if (W < 2 || (W & (W - 1)) != 0) return -1;
  int w_total = 0;
  while ((int64_t(1) << w_total) < W) ++w_total;
  if (2 * w_total - 1 > 31) return -1;  // must fit int32 mask bits
  std::memset(mask32, 0, sizeof(int32_t) * W * n_tiles);
  const int nt = n_threads();
  std::atomic<int64_t> next{0};
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&] {
      while (true) {
        const int64_t i = next.fetch_add(1);
        if (i >= n_tiles) break;
        benes_route_one(perms + i * W, W, w_total, mask32 + i * W);
      }
    });
  }
  for (auto& th : threads) th.join();
  return 0;
}
