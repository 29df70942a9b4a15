// Planned-permutation router: decompose an arbitrary permutation into
// TPU-friendly stages.
//
// TPU vector units have no arbitrary gather/scatter, but they CAN rotate
// vector registers across lanes/sublanes (pltpu.roll) and transpose via XLA
// at memory bandwidth.  Any plan-known permutation of N = R*Cu elements is
// realized as a 3-stage Clos network with a 2x-expanded middle layer
// (Cs = 2*Cu >= 2*Cu - 1 middle columns make the network strictly
// non-blocking, so a greedy first-fit routes it in one linear pass -- no
// edge-coloring needed, which matters on a single host core):
//
//   stage 1 (row-local, width Cs): virtual row = [x row (Cu) | zeros (Cu)]
//   transpose (R, Cs) -> (Cs, R)
//   stage 2 (row-local, width R)
//   transpose back
//   stage 3 (row-local, width Cs); the first Cu slots are the output row
//
// Each row-local permutation is realized as a Benes exchange network
// (2*log2(W)-1 stages of XOR-distance swaps, each one roll+select on the
// VPU); mask bit t of a position's int32 says "swap with the partner at
// stage t's distance".
//
// This plays the role the reference's Thrust sort_by_key / counting sort
// play on the GPU (e.g. the numeric-phase column sort,
// cuda-c/src/kernel/kernel_spgemm_hash_template.cu:805-815): data movement
// with a plan-known destination, executed at memory bandwidth instead of a
// comparison sort.  Everything here is host-side precompute; the device
// only applies the masks.

#include <cstdint>
#include <cstring>
#include <vector>
#include <thread>
#include <cstdlib>
#include <algorithm>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {

// ---------------------------------------------------------------------------
// Benes routing for one tile: realize the gather permutation
// out[i] = x[perm[i]] on W = 2^w wires as 2w-1 XOR-exchange stages with
// distances W/2, W/4, ..., 1, ..., W/4, W/2.  mask[p] bit t == 1 means
// position p takes the value from p ^ d_t at stage t (set symmetrically on
// both members of a swapped pair).
//
// Iterative level sweep: at level l the perm array holds 2^l independent
// sub-permutations of size W >> l in place; each is 2-colored (walking the
// pair cycles), outer-stage mask bits are set, and the two middle
// sub-permutations are written back in place for the next level.
// Identity sub-permutations are skipped (their masks stay zero) -- the
// common case for slack/padding regions.
// ---------------------------------------------------------------------------

// int32 scratch: AVX-512 gather/scatter only exists at 32/64-bit lanes,
// and the SIMD passes over inv/nxt/emission win far more than the uint16
// footprint saved (W=2048 tiles are 32 KB of scratch — still L1; the
// visited flag rides bit 31 of nxt, so no separate vis array).
struct BenesScratch {
  std::vector<int32_t> perm, nperm, inv, nxt;
  void resize(int64_t W) {
    perm.resize(W);
    nperm.resize(W);
    inv.resize(W);
    nxt.resize(W);
  }
};

constexpr uint32_t kVis = 0x80000000u;

// Flat-position transform of the 128x128 block transpose
// (N/16384, 128, 128).transpose(0, 2, 1): the device's transposed-middle
// Benes layout (sublane rolls are ~free; lane rolls cost ~8 cyc/vreg).
inline int64_t trans128(int64_t p) {
  return (p & ~int64_t(16383)) | ((p & 127) << 7) | ((p >> 7) & 127);
}

// Route one tile.  The 2-coloring walk follows cycles of the explicit
// successor permutation next(i) = inv[perm[i] ^ h] ^ h, built in a
// throughput-friendly independent pass so the serial chase costs one
// dependent L1 load per step.  A walked cycle is the 0-colored half;
// its XOR-h image is the 1-colored partner cycle (Benes pair-graph
// cycles are even, so the two never collide); the scan skips starts
// whose pair cycle was already walked.
// split_k > 0: emit the first/last split_k stages' bits to `mask` (outer)
// and all other stages' bits to `mask_t` at the 128x128-transposed flat
// position (both arrays indexed from the GLOBAL flat base `gbase`) — this
// produces the device's (outer, transposed-middle) mask pair directly,
// replacing a 2-pass numpy split + strided transpose per stage.
// split_k == 0 (mask_t == nullptr): classic single-array emission.
#if defined(__AVX512F__)
// 16-lane flat-position transform of the 128x128 block transpose.
inline __m512i trans128_v(__m512i p) {
  const __m512i lo7 = _mm512_set1_epi32(127);
  const __m512i hi = _mm512_andnot_si512(_mm512_set1_epi32(16383), p);
  const __m512i a = _mm512_slli_epi32(_mm512_and_si512(p, lo7), 7);
  const __m512i b =
      _mm512_and_si512(_mm512_srli_epi32(p, 7), lo7);
  return _mm512_or_si512(hi, _mm512_or_si512(a, b));
}
#endif

void benes_route_one(const int32_t* perm_in, int64_t W, int w_total,
                     int64_t gbase, int32_t* mask, int32_t* mask_t,
                     int split_k, BenesScratch& S) {
  int32_t* pm_lvl = S.perm.data();
  int32_t* np_lvl = S.nperm.data();
  std::memcpy(pm_lvl, perm_in, sizeof(int32_t) * W);
  for (int level = 0;; ++level) {
    const int64_t n = W >> level;
    if (n < 2) break;
    const int64_t h = n / 2;
    const int t_in = level;
    const int t_out = 2 * w_total - 2 - level;
    // both stages of a level share outer/middle-ness: t_in=level is outer
    // iff level < k, and t_out = 2w-2-level >= s_total-k iff level < k
    const bool to_mid = (mask_t != nullptr) && level >= split_k;
    int32_t* dst = to_mid ? mask_t : mask;
    const bool last_level = (n >> 1) < 2;
    for (int64_t off = 0; off < W; off += n) {
      int32_t* pm = pm_lvl + off;
      int32_t* np = np_lvl + off;
      // identity fast path (slack / padding): children need LOCAL values.
      // Chunked early exit: a non-identity tile bails within 256 slots
      // instead of scanning all n.
      bool ident = true;
      for (int64_t c = 0; c < n && ident; c += 256) {
        const int64_t e = c + 256 < n ? c + 256 : n;
        bool blk = true;
        for (int64_t i = c; i < e; ++i) blk &= (pm[i] == i);
        ident = blk;
      }
      if (ident) {
        if (!last_level)
          for (int64_t i = 0; i < n; ++i)
            np[i] = static_cast<int32_t>(i & (h - 1));
        continue;
      }
      if (n == 2) {
        if (pm[0] == 1) {
          const int64_t p0 = gbase + off;
          if (to_mid) {
            dst[trans128(p0)] |= (1u << (w_total - 1));
            dst[trans128(p0 + 1)] |= (1u << (w_total - 1));
          } else {
            dst[p0] |= (1u << (w_total - 1));
            dst[p0 + 1] |= (1u << (w_total - 1));
          }
        }
        continue;
      }
      int32_t* inv = S.inv.data();
      int32_t* nxt = S.nxt.data();
      const int64_t gp = gbase + off;
#if defined(__AVX512F__)
      if (n >= 64) {
        const __m512i vh = _mm512_set1_epi32(static_cast<int32_t>(h));
        const __m512i lane =
            _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
                              13, 14, 15);
        // inv[pm[i]] = i ; nxt[i] = inv[pm[i] ^ h] ^ h  (two passes; the
        // second's gather needs the full inv)
        for (int64_t i = 0; i < n; i += 16) {
          const __m512i vp = _mm512_loadu_si512(pm + i);
          const __m512i vi =
              _mm512_add_epi32(lane, _mm512_set1_epi32((int32_t)i));
          _mm512_i32scatter_epi32(inv, vp, vi, 4);
        }
        for (int64_t i = 0; i < n; i += 16) {
          const __m512i vp = _mm512_loadu_si512(pm + i);
          const __m512i vx = _mm512_xor_si512(vp, vh);
          const __m512i g = _mm512_i32gather_epi32(vx, inv, 4);
          _mm512_storeu_si512(nxt + i, _mm512_xor_si512(g, vh));
        }
        // serial cycle walk; visited flag rides bit 31 of nxt
        for (int64_t s = 0; s < n; ++s) {
          if ((uint32_t)(nxt[s] | nxt[s ^ h]) & kVis) continue;
          int64_t i = s;
          do {
            const uint32_t nx = (uint32_t)nxt[i];
            nxt[i] = (int32_t)(nx | kVis);
            i = nx & 0x7fffffffu;
          } while (i != s);
        }
        // vectorized emission: per 16 lanes, two bijective
        // gather-or-scatter chains + the middle sub-perm scatter
        const __m512i vgp = _mm512_set1_epi32((int32_t)gp);
        const __m512i vh1 = _mm512_set1_epi32((int32_t)(h - 1));
        const __m512i one = _mm512_set1_epi32(1);
        const int lh = __builtin_ctzll((uint64_t)h);
        for (int64_t i = 0; i < n; i += 16) {
          const __m512i vi =
              _mm512_add_epi32(lane, _mm512_set1_epi32((int32_t)i));
          const __m512i vj = _mm512_loadu_si512(pm + i);
          const __m512i vn = _mm512_loadu_si512(nxt + i);
          const __m512i ho = _mm512_xor_si512(
              _mm512_srli_epi32(vn, 31), one);
          const __m512i ci = _mm512_xor_si512(
              _mm512_and_si512(_mm512_srli_epi32(vi, lh), one), ho);
          const __m512i cj = _mm512_xor_si512(
              _mm512_and_si512(_mm512_srli_epi32(vj, lh), one), ho);
          __m512i p1 = _mm512_add_epi32(vgp, vi);
          __m512i p2 = _mm512_add_epi32(vgp, vj);
          if (to_mid) {
            p1 = trans128_v(p1);
            p2 = trans128_v(p2);
          }
          __m512i x = _mm512_i32gather_epi32(p1, dst, 4);
          x = _mm512_or_si512(x, _mm512_slli_epi32(ci, t_out));
          _mm512_i32scatter_epi32(dst, p1, x, 4);
          __m512i y = _mm512_i32gather_epi32(p2, dst, 4);
          y = _mm512_or_si512(y, _mm512_slli_epi32(cj, t_in));
          _mm512_i32scatter_epi32(dst, p2, y, 4);
          // np[ho * h + (i & (h-1))] = j & (h-1); h >= 32 here, so the
          // 16 destinations are distinct within the vector
          const __m512i nip = _mm512_add_epi32(
              _mm512_slli_epi32(ho, lh), _mm512_and_si512(vi, vh1));
          _mm512_i32scatter_epi32(np, nip,
                                  _mm512_and_si512(vj, vh1), 4);
        }
        continue;
      }
#endif
      for (int64_t i = 0; i < n; ++i) inv[pm[i]] = static_cast<int32_t>(i);
      for (int64_t i = 0; i < n; ++i)
        nxt[i] = inv[pm[i] ^ h] ^ static_cast<int32_t>(h);
      for (int64_t s = 0; s < n; ++s) {
        if ((uint32_t)(nxt[s] | nxt[s ^ h]) & kVis) continue;
        int64_t i = s;
        do {
          const uint32_t nx = (uint32_t)nxt[i];
          nxt[i] = (int32_t)(nx | kVis);
          i = nx & 0x7fffffffu;
        } while (i != s);
      }
      // masks + middle sub-perms; color(i) = 0 iff its cycle was walked.
      // Branchless emission: the swap conditions are ~coin flips, so the
      // mispredict cost of conditional stores dwarfs an unconditional RMW
      // of a possibly-zero bit.
      if (to_mid) {
        for (int64_t i = 0; i < n; ++i) {
          const uint32_t ho = ((uint32_t)nxt[i] >> 31) ^ 1u;
          const int64_t j = pm[i];
          const uint32_t ci = (i >= h ? 1u : 0u) ^ ho;
          const uint32_t cj = (j >= h ? 1u : 0u) ^ ho;
          dst[trans128(gp + i)] |= (ci << t_out);
          dst[trans128(gp + j)] |= (cj << t_in);
          np[static_cast<int64_t>(ho) * h + (i & (h - 1))] =
              static_cast<int32_t>(j & (h - 1));
        }
      } else {
        for (int64_t i = 0; i < n; ++i) {
          const uint32_t ho = ((uint32_t)nxt[i] >> 31) ^ 1u;
          const int64_t j = pm[i];
          const uint32_t ci = (i >= h ? 1u : 0u) ^ ho;
          const uint32_t cj = (j >= h ? 1u : 0u) ^ ho;
          dst[gp + i] |= (ci << t_out);
          dst[gp + j] |= (cj << t_in);
          np[static_cast<int64_t>(ho) * h + (i & (h - 1))] =
              static_cast<int32_t>(j & (h - 1));
        }
      }
    }
    std::swap(pm_lvl, np_lvl);
  }
}

// Run fn(tile_range) over [0, n_tiles) on NSPARSE_THREADS threads
// (default: hardware concurrency; 1 = inline).  Each worker owns its
// scratch; mask words of distinct tiles never alias (identity tiles are
// skipped — their masks are already zero).
template <typename F>
static void for_tiles_mt(int64_t n_tiles, F&& fn) {
  int nt = 1;
  if (const char* e = std::getenv("NSPARSE_THREADS")) {
    nt = std::max(1, atoi(e));
  } else {
    nt = std::max(1u, std::thread::hardware_concurrency());
  }
  nt = (int)std::min<int64_t>(nt, std::max<int64_t>(n_tiles, 1));
  if (nt <= 1) {
    fn(int64_t(0), n_tiles);
    return;
  }
  std::vector<std::thread> ws;
  const int64_t per = (n_tiles + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int64_t lo = t * per, hi = std::min<int64_t>(n_tiles, lo + per);
    if (lo >= hi) break;
    ws.emplace_back([&fn, lo, hi] { fn(lo, hi); });
  }
  for (auto& w : ws) w.join();
}

static inline bool is_identity_tile(const int32_t* p, int64_t W) {
  for (int64_t i = 0; i < W; ++i)
    if (p[i] != (int32_t)i) return false;
  return true;
}

}  // namespace

extern "C" {

// Route n_tiles independent W-wire gather permutations (concatenated in
// `perms`) into per-wire int32 stage masks.  Returns 0, or -1 when W is
// not a power of two >= 2 or the 2*log2(W)-1 stages exceed 31 mask bits.
int64_t nsp_benes_route(const int32_t* perms, int64_t W, int64_t n_tiles,
                        int32_t* mask32) {
  if (W < 2 || (W & (W - 1)) != 0) return -1;
  int w_total = 0;
  while ((int64_t(1) << w_total) < W) ++w_total;
  if (2 * w_total - 1 > 31) return -1;
  std::memset(mask32, 0, sizeof(int32_t) * W * n_tiles);
  for_tiles_mt(n_tiles, [&](int64_t lo, int64_t hi) {
    BenesScratch scratch;
    scratch.resize(W);
    for (int64_t i = lo; i < hi; ++i) {
      if (is_identity_tile(perms + i * W, W)) continue;
      benes_route_one(perms + i * W, W, w_total, 0, mask32 + i * W,
                      nullptr, 0, scratch);
    }
  });
  return 0;
}

// Split emission: outer (first/last `split_k` stages) bits to `mo`, all
// middle-stage bits to `mt` at the 128x128-transposed flat position —
// exactly the (m, t) mask pair ShufflePlan stores.  Requires the total
// element count to be a multiple of 16384 (the transpose block).
int64_t nsp_benes_route_split(const int32_t* perms, int64_t W,
                              int64_t n_tiles, int32_t* mo, int32_t* mt,
                              int64_t split_k) {
  if (W < 2 || (W & (W - 1)) != 0) return -1;
  int w_total = 0;
  while ((int64_t(1) << w_total) < W) ++w_total;
  if (2 * w_total - 1 > 31) return -1;
  if ((W * n_tiles) % 16384 != 0) return -2;
  std::memset(mo, 0, sizeof(int32_t) * W * n_tiles);
  std::memset(mt, 0, sizeof(int32_t) * W * n_tiles);
  for_tiles_mt(n_tiles, [&](int64_t lo, int64_t hi) {
    BenesScratch scratch;
    scratch.resize(W);
    for (int64_t i = lo; i < hi; ++i) {
      if (is_identity_tile(perms + i * W, W)) continue;
      benes_route_one(perms + i * W, W, w_total, i * W, mo, mt,
                      static_cast<int>(split_k), scratch);
    }
  });
  return 0;
}

// Greedy slack-Clos routing of the gather permutation out[t] = x[src[t]]
// over an (R, Cu) grid with a Cs-wide middle layer:
//   virtual input rows  v[r] = [x[r*Cu : (r+1)*Cu] | zeros(Cs-Cu)]
//   y1[r, c]  = v[r][s1[r*Cs + c]]                                 (stage 1)
//   y2 = transpose_{R x Cs}(y1)
//   y3[m, q]  = y2[m*R + s2[m*R + q]]                              (stage 2)
//   y4 = transpose_{Cs x R}(y3)
//   out[r*Cu + c] = y4[r*Cs + s3[r*Cs + c]]  for c < Cu            (stage 3)
// s1/s3 have R*Cs entries, s2 has Cs*R; every row of each stage is a full
// permutation of its width (slack slots are completed arbitrarily), so the
// stages can be Benes-routed.
//
// When Cs >= 2*Cu - 1 first-fit can never block (strict-nonblocking
// bound).  For tighter middles (Cu <= Cs < 2*Cu - 1, less device traffic)
// blocked pairs are rearranged with Paull's alternating-chain repair —
// a rearrangeable Clos (Slepian-Duguid) always admits the route.
// Requires R, Cs powers of two.  Returns 0 on success, <0 on bad input.
int64_t nsp_clos_route_slack(const int32_t* src, int64_t R, int64_t Cu,
                             int64_t Cs, int32_t* s1, int32_t* s2,
                             int32_t* s3) {
  if (R <= 0 || Cu <= 1 || Cs < Cu) return -1;
  if ((R & (R - 1)) != 0 || (Cs & (Cs - 1)) != 0) return -1;
  const int64_t N = R * Cu;
  const int64_t words = Cs / 64;
  if (Cs < 64) return -1;
  const bool need_repair = Cs < 2 * Cu - 1;

  std::memset(s1, -1, sizeof(int32_t) * R * Cs);
  std::memset(s2, -1, sizeof(int32_t) * Cs * R);
  std::memset(s3, -1, sizeof(int32_t) * R * Cs);

  std::vector<uint64_t> used_src(R * words, 0), used_dst(R * words, 0);
  // pair bookkeeping for repair: which target slot t occupies (m, row)
  std::vector<int32_t> occ_s, occ_t;
  if (need_repair) {
    occ_s.assign(Cs * R, -1);
    occ_t.assign(Cs * R, -1);
  }

  auto set_bit = [](uint64_t* w, int64_t m) {
    w[m >> 6] |= (uint64_t(1) << (m & 63));
  };
  auto clr_bit = [](uint64_t* w, int64_t m) {
    w[m >> 6] &= ~(uint64_t(1) << (m & 63));
  };
  auto first_free = [words](const uint64_t* w) -> int64_t {
    for (int64_t i = 0; i < words; ++i)
      if (w[i] != ~uint64_t(0)) return i * 64 + __builtin_ctzll(~w[i]);
    return -1;
  };

  // stages are emitted directly on insert (and cleared on the rare
  // repair-chain remove): this drops the former mid_of array and its
  // final N-sweep emission pass — ~25% of the routing wall time at the
  // 12M-target assembly networks.
  auto insert = [&](int64_t t, int64_t m) {
    const int64_t rs = src[t] / Cu, rt = t / Cu;
    set_bit(used_src.data() + rs * words, m);
    set_bit(used_dst.data() + rt * words, m);
    if (need_repair) {
      occ_s[m * R + rs] = static_cast<int32_t>(t);
      occ_t[m * R + rt] = static_cast<int32_t>(t);
    }
    s1[rs * Cs + m] = static_cast<int32_t>(src[t] % Cu);
    s2[m * R + rt] = static_cast<int32_t>(rs);
    s3[rt * Cs + (t % Cu)] = static_cast<int32_t>(m);
  };
  auto remove = [&](int64_t t, int64_t m) {
    const int64_t rs = src[t] / Cu, rt = t / Cu;
    clr_bit(used_src.data() + rs * words, m);
    clr_bit(used_dst.data() + rt * words, m);
    occ_s[m * R + rs] = -1;
    occ_t[m * R + rt] = -1;
    s1[rs * Cs + m] = -1;
    s2[m * R + rt] = -1;
    s3[rt * Cs + (t % Cu)] = -1;
  };

  for (int64_t t = 0; t < N; ++t) {
    const int64_t rs = src[t] / Cu, rt = t / Cu;
    const uint64_t* us = used_src.data() + rs * words;
    const uint64_t* ud = used_dst.data() + rt * words;
    int64_t m = -1;
    for (int64_t w = 0; w < words; ++w) {
      const uint64_t both = us[w] | ud[w];
      if (both != ~uint64_t(0)) {
        m = w * 64 + __builtin_ctzll(~both);
        break;
      }
    }
    if (m >= 0) {
      insert(t, m);
      continue;
    }
    if (!need_repair) return -2;  // cannot happen at Cs >= 2*Cu - 1
    // Paull's rearrangement: a free at the source row, b free at the
    // target row (both exist: each row has Cu <= Cs slots used... < Cs).
    const int64_t a = first_free(us);
    const int64_t b = first_free(ud);
    if (a < 0 || b < 0) return -3;  // row over capacity: Cu > Cs
    // displace the pair at (a, rt) to make room for t at a, then walk the
    // alternating chain between columns a and b
    int64_t t_move = occ_t[a * R + rt];
    if (t_move >= 0) remove(t_move, a);
    insert(t, a);
    bool into_b = true;  // next insertion column: alternates b, a, b, ...
    int64_t guard = 8 * R + 16;
    while (t_move >= 0) {
      if (--guard < 0) return -4;  // chain bound exceeded (bug guard)
      const int64_t rs_m = src[t_move] / Cu, rt_m = t_move / Cu;
      const int64_t col = into_b ? b : a;
      // the alternation guarantees `col` is free on one side; the other
      // side may hold a conflicting pair that gets displaced next
      int64_t t_next = occ_s[col * R + rs_m];
      if (t_next < 0) t_next = occ_t[col * R + rt_m];
      if (t_next >= 0) remove(t_next, col);
      insert(t_move, col);
      t_move = t_next;
      into_b = !into_b;
    }
  }

  // complete every stage row to a full permutation of its width.  Prefer
  // row[i] = i for don't-care slots: identity-heavy slack regions collapse
  // to the Benes router's identity fast path (and zero mask bits), which
  // is most of the routing cost at 2x middle slack.
  std::vector<uint64_t> seen;
  auto complete = [&seen](int32_t* row, int64_t W) {
    seen.assign((W + 63) / 64, 0);
    for (int64_t i = 0; i < W; ++i) {
      const int32_t v = row[i];
      if (v >= 0) seen[v >> 6] |= (uint64_t(1) << (v & 63));
    }
    for (int64_t i = 0; i < W; ++i)
      if (row[i] < 0 && !(seen[i >> 6] & (uint64_t(1) << (i & 63)))) {
        row[i] = static_cast<int32_t>(i);
        seen[i >> 6] |= (uint64_t(1) << (i & 63));
      }
    int64_t next = 0;
    for (int64_t i = 0; i < W; ++i) {
      if (row[i] >= 0) continue;
      while (seen[next >> 6] & (uint64_t(1) << (next & 63))) ++next;
      row[i] = static_cast<int32_t>(next);
      seen[next >> 6] |= (uint64_t(1) << (next & 63));
    }
  };
  for (int64_t r = 0; r < R; ++r) complete(s1 + r * Cs, Cs);
  for (int64_t m = 0; m < Cs; ++m) complete(s2 + m * R, R);
  for (int64_t r = 0; r < R; ++r) complete(s3 + r * Cs, Cs);
  return 0;
}

}  // extern "C"
