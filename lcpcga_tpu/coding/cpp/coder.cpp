// Native entropy coding runtime: rANS range coder + octree coordinate codec.
//
// TPU-native replacement for the two native coding dependencies of the
// reference (SURVEY.md §2.2):
//   * CompressAI's C++ rANS extension (behind EntropyBottleneck /
//     GaussianConditional .compress/.decompress,
//     /root/reference/model/entropy_models.py:189,352,372) — here a
//     byte-wise rANS with 16-bit quantized CDFs and an escape+bypass
//     path for out-of-support symbols;
//   * the MPEG G-PCC `tmc3` subprocess used for lossless latent
//     coordinate coding (/root/reference/model/model.py:318-395) — here
//     an in-process octree occupancy coder with adaptive binary
//     contexts (no temp PLY files, no process spawn).
//
// Exposed as a C ABI for ctypes (pybind11 is not available in the
// build image). All functions return a negative value on error.
//
// Build: g++ -O3 -shared -fPIC -o libcoder.so coder.cpp

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <unordered_map>

namespace {

// ---------------------------------------------------------------------------
// rANS (byte-wise renormalization, 16-bit probability precision)
// ---------------------------------------------------------------------------

constexpr uint32_t kProbBits = 16;
constexpr uint32_t kProbScale = 1u << kProbBits;
constexpr uint32_t kRansL = 1u << 23;  // lower bound of the state interval

struct RansEncoder {
  std::vector<uint8_t> bytes;  // emitted in reverse; reversed at finish
  uint32_t x = kRansL;

  inline void put(uint32_t start, uint32_t freq) {
    uint32_t x_max = ((kRansL >> kProbBits) << 8) * freq;
    while (x >= x_max) {
      bytes.push_back(static_cast<uint8_t>(x & 0xff));
      x >>= 8;
    }
    x = ((x / freq) << kProbBits) + (x % freq) + start;
  }

  // Bypass: n raw bits (n <= 16), uniform distribution. The state must
  // stay below (kRansL << 8) after the push: renorm while x >= 2^(31-n).
  inline void put_bits(uint32_t bits, uint32_t n) {
    uint32_t x_max = (kRansL << 8) >> n;
    while (x >= x_max) {
      bytes.push_back(static_cast<uint8_t>(x & 0xff));
      x >>= 8;
    }
    x = (x << n) | (bits & ((1u << n) - 1u));
  }

  int finish(uint8_t* out, int capacity) {
    bytes.push_back(static_cast<uint8_t>(x & 0xff));
    bytes.push_back(static_cast<uint8_t>((x >> 8) & 0xff));
    bytes.push_back(static_cast<uint8_t>((x >> 16) & 0xff));
    bytes.push_back(static_cast<uint8_t>((x >> 24) & 0xff));
    if (static_cast<int>(bytes.size()) > capacity) return -1;
    // Reverse so the decoder reads forward.
    for (size_t i = 0; i < bytes.size(); ++i)
      out[i] = bytes[bytes.size() - 1 - i];
    return static_cast<int>(bytes.size());
  }
};

struct RansDecoder {
  const uint8_t* in;
  int len;
  int pos = 0;
  uint32_t x = 0;

  void init(const uint8_t* data, int n) {
    in = data;
    len = n;
    pos = 0;
    x = 0;
    for (int i = 0; i < 4 && pos < len; ++i) x = (x << 8) | in[pos++];
  }

  inline uint32_t peek() const { return x & (kProbScale - 1); }

  inline void advance(uint32_t start, uint32_t freq) {
    x = freq * (x >> kProbBits) + (x & (kProbScale - 1)) - start;
    while (x < kRansL && pos < len) x = (x << 8) | in[pos++];
  }

  inline uint32_t get_bits(uint32_t n) {
    uint32_t bits = x & ((1u << n) - 1u);
    x >>= n;
    while (x < kRansL && pos < len) x = (x << 8) | in[pos++];
    return bits;
  }
};

// Overflow (escape) value <-> unsigned mapping. v_raw is the symbol
// index relative to the CDF support [0, num_sym-2]; escape covers
// v_raw < 0 and v_raw >= num_sym-1.
inline uint32_t overflow_to_unsigned(int64_t v_raw, int64_t esc) {
  return v_raw >= esc ? static_cast<uint32_t>(2 * (v_raw - esc))
                      : static_cast<uint32_t>(2 * (-v_raw) - 1);
}

inline int64_t overflow_from_unsigned(uint32_t u, int64_t esc) {
  return (u & 1u) ? -static_cast<int64_t>((u + 1) >> 1)
                  : esc + static_cast<int64_t>(u >> 1);
}

constexpr uint32_t kChunkBits = 3;  // bypass chunk payload bits (+1 continue bit)

}  // namespace

extern "C" {

// values[i]: integer coded value; context i uses cdfs row indexes[i].
// CDF row: length L (cdf_lengths), num_symbols = L-1 (last = escape),
// cdf[L-1] == 1<<16, values decode to symbol + offsets[row].
int rans_encode(const int32_t* values, const int32_t* indexes, int n,
                const int32_t* cdfs, int cdf_stride, const int32_t* cdf_lengths,
                const int32_t* offsets, uint8_t* out, int out_capacity) {
  RansEncoder enc;
  enc.bytes.reserve(n * 2 + 16);
  // rANS is LIFO: process in reverse so the decoder reads forward.
  for (int i = n - 1; i >= 0; --i) {
    int32_t ctx = indexes[i];
    const int32_t* cdf = cdfs + static_cast<int64_t>(ctx) * cdf_stride;
    int32_t L = cdf_lengths[ctx];
    int64_t num_sym = L - 1;
    int64_t esc = num_sym - 1;
    int64_t v = static_cast<int64_t>(values[i]) - offsets[ctx];
    int64_t sym;
    if (v >= 0 && v < esc) {
      sym = v;
    } else {
      sym = esc;
      // Bypass chunks are read by the decoder low-to-high after the
      // escape symbol; being LIFO we push them high-to-low first.
      uint32_t u = overflow_to_unsigned(v, esc);
      std::vector<uint32_t> chunks;
      while (u >= (1u << kChunkBits)) {
        chunks.push_back((1u << kChunkBits) | (u & ((1u << kChunkBits) - 1u)));
        u >>= kChunkBits;
      }
      chunks.push_back(u);
      for (int c = static_cast<int>(chunks.size()) - 1; c >= 0; --c)
        enc.put_bits(chunks[c], kChunkBits + 1);
    }
    uint32_t start = static_cast<uint32_t>(cdf[sym]);
    uint32_t freq = static_cast<uint32_t>(cdf[sym + 1] - cdf[sym]);
    enc.put(start, freq);
  }
  return enc.finish(out, out_capacity);
}

int rans_decode(const uint8_t* in, int in_len, const int32_t* indexes, int n,
                const int32_t* cdfs, int cdf_stride, const int32_t* cdf_lengths,
                const int32_t* offsets, int32_t* values_out) {
  RansDecoder dec;
  dec.init(in, in_len);
  for (int i = 0; i < n; ++i) {
    int32_t ctx = indexes[i];
    const int32_t* cdf = cdfs + static_cast<int64_t>(ctx) * cdf_stride;
    int32_t L = cdf_lengths[ctx];
    int64_t num_sym = L - 1;
    int64_t esc = num_sym - 1;
    uint32_t slot = dec.peek();
    // Binary search: largest s with cdf[s] <= slot.
    int lo = 0, hi = static_cast<int>(num_sym) - 1;
    while (lo < hi) {
      int mid = (lo + hi + 1) >> 1;
      if (static_cast<uint32_t>(cdf[mid]) <= slot) lo = mid;
      else hi = mid - 1;
    }
    int64_t sym = lo;
    dec.advance(static_cast<uint32_t>(cdf[sym]),
                static_cast<uint32_t>(cdf[sym + 1] - cdf[sym]));
    int64_t v;
    if (sym == esc) {
      uint32_t u = 0;
      uint32_t shift = 0;
      for (;;) {
        uint32_t chunk = dec.get_bits(kChunkBits + 1);
        u |= (chunk & ((1u << kChunkBits) - 1u)) << shift;
        shift += kChunkBits;
        if (!(chunk >> kChunkBits)) break;
        if (shift > 60) return -2;  // corrupt stream guard
      }
      v = overflow_from_unsigned(u, esc);
    } else {
      v = sym;
    }
    values_out[i] = static_cast<int32_t>(v + offsets[ctx]);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Adaptive binary range coder + octree occupancy codec
// ---------------------------------------------------------------------------

namespace {

struct BinEncoder {
  std::vector<uint8_t> out;
  uint32_t low = 0;
  uint32_t range = 0xFFFFFFFFu;

  inline void encode(int bit, uint16_t* prob) {
    encode_p(bit, *prob);
    if (bit == 0)
      *prob += (65536 - *prob) >> 5;
    else
      *prob -= *prob >> 5;
  }

  // Code one bit against a fixed probability (no adaptation here;
  // callers owning mixed-context models adapt their tables themselves).
  inline void encode_p(int bit, uint16_t prob) {
    // prob = P(bit==0) in [1, 2^16-1]
    uint32_t split = (static_cast<uint64_t>(range) * prob) >> 16;
    if (bit == 0) {
      range = split;
    } else {
      uint32_t add = split + 1;
      low += add;
      if (low < add) carry();  // propagate carry
      range -= add;
    }
    while (range < (1u << 24)) {
      out.push_back(static_cast<uint8_t>(low >> 24));
      low <<= 8;
      range = (range << 8) | 0xff;
    }
  }

  void carry() {
    // Propagate carry into already-emitted bytes.
    for (int i = static_cast<int>(out.size()) - 1; i >= 0; --i) {
      if (++out[i] != 0) return;
    }
  }

  void finish() {
    for (int i = 0; i < 4; ++i) {
      out.push_back(static_cast<uint8_t>(low >> 24));
      low <<= 8;
    }
  }
};

struct BinDecoder {
  const uint8_t* in;
  int len;
  int pos = 0;
  uint32_t code = 0;
  uint32_t range = 0xFFFFFFFFu;

  void init(const uint8_t* data, int n) {
    in = data;
    len = n;
    pos = 0;
    code = 0;
    range = 0xFFFFFFFFu;
    for (int i = 0; i < 4; ++i) code = (code << 8) | (pos < len ? in[pos++] : 0);
  }

  inline int decode(uint16_t* prob) {
    int bit = decode_p(*prob);
    if (bit == 0)
      *prob += (65536 - *prob) >> 5;
    else
      *prob -= *prob >> 5;
    return bit;
  }

  inline int decode_p(uint16_t prob) {
    uint32_t split = (static_cast<uint64_t>(range) * prob) >> 16;
    int bit;
    if (code <= split) {
      bit = 0;
      range = split;
    } else {
      bit = 1;
      code -= split + 1;
      range -= split + 1;
    }
    while (range < (1u << 24)) {
      code = (code << 8) | (pos < len ? in[pos++] : 0);
      range = (range << 8) | 0xff;
    }
    return bit;
  }
};

// Context model for one octree occupancy bit. Coding is breadth-first
// (level-sequential), so BOTH sides know the complete set of occupied
// nodes at the current level before any of its children bits are coded
// — the context can therefore use the node's full (non-causal)
// 6-face-neighbor occupancy pattern, the strongest predictor of where
// a surface continues. This is the same class of context tmc3's
// neighbour-pattern occupancy coding uses
// (/root/reference/model/model.py:318-395 shells out to tmc3 for
// exactly this job); implementation here is original and in-process.
//
// Three probability tables are mixed with visit-count confidence
// weights, so sparse contexts fall back to well-visited coarse ones
// (a typical latent cloud codes only ~100k bits against the 16k-row
// fine table — plain use of the fine table alone dilutes):
//   coarse: (level, child octant, occupied-siblings-so-far, parent octant)
//   fine:   (level, child octant, occ-so-far, 64 face-neighbor patterns)
//   sib:    (level, partial occupancy byte (1<<c)|prev_bits — the full
//           already-coded sibling pattern, 256 states)
constexpr int kMaxLevelCtx = 8;
constexpr int kNumCoarse = kMaxLevelCtx * 8 * 4 * 9;
constexpr int kNumFine = kMaxLevelCtx * 8 * 4 * 64;
constexpr int kNumSib = kMaxLevelCtx * 256;
constexpr int kNumAdj = kMaxLevelCtx * 8 * 27;

inline int lvl_cap(int level) {
  return level < kMaxLevelCtx ? level : kMaxLevelCtx - 1;
}

inline int coarse_index(int level, int child, int occ_so_far, int parent_child) {
  int o = occ_so_far < 3 ? occ_so_far : 3;
  return ((lvl_cap(level) * 8 + child) * 4 + o) * 9 + (parent_child + 1);
}

inline int fine_index(int level, int child, int occ_so_far, int nbr6) {
  int o = occ_so_far < 3 ? occ_so_far : 3;
  return ((lvl_cap(level) * 8 + child) * 4 + o) * 64 + nbr6;
}

inline int sib_index(int level, int child, int prev_bits) {
  return lvl_cap(level) * 256 + ((1 << child) | prev_bits);
}

inline int adj_index(int level, int child, int adj3) {
  return (lvl_cap(level) * 8 + child) * 27 + adj3;
}

struct CtxTable {
  std::vector<uint16_t> prob;
  std::vector<uint8_t> count;
  explicit CtxTable(int n) : prob(n, 32768), count(n, 0) {}

  inline uint32_t weight(int i) const {
    uint32_t c = count[i];
    return 1 + (c < 48 ? c : 48);
  }

  inline void adapt(int i, int bit) {
    // Faster adaptation while young (shift 4), slower when mature.
    int shift = count[i] < 16 ? 4 : 5;
    if (bit == 0)
      prob[i] += (65536 - prob[i]) >> shift;
    else
      prob[i] -= prob[i] >> shift;
    if (count[i] < 255) ++count[i];
  }
};

inline uint16_t mix4(const CtxTable& tc, int ic, const CtxTable& tf, int if_,
                     const CtxTable& ts, int is_, const CtxTable& ta, int ia) {
  uint64_t wc = tc.weight(ic), wf = 6 * tf.weight(if_), ws = 3 * ts.weight(is_),
           wa = 16 * ta.weight(ia);
  uint64_t num = wc * tc.prob[ic] + wf * tf.prob[if_] + ws * ts.prob[is_] +
                 wa * ta.prob[ia];
  uint32_t p = static_cast<uint32_t>(num / (wc + wf + ws + wa));
  if (p < 1) p = 1;
  if (p > 65535) p = 65535;
  return static_cast<uint16_t>(p);
}

struct Key3 {
  int32_t x, y, z;
};

struct OctNode {
  int lo, hi;        // encoder: point range (unused on decode)
  int32_t x, y, z;   // node coords at its level
  int8_t parent_child;
};

inline uint64_t pack_node(int32_t x, int32_t y, int32_t z) {
  return (static_cast<uint64_t>(static_cast<uint32_t>(x)) << 42) |
         (static_cast<uint64_t>(static_cast<uint32_t>(y)) << 21) |
         static_cast<uint64_t>(static_cast<uint32_t>(z));
}

// Sorted packed keys of every occupied node at the current level, for
// O(log N) face-neighbor membership tests.
inline int nbr6_pattern(const std::vector<uint64_t>& keys, int32_t x,
                        int32_t y, int32_t z, int32_t hi) {
  static const int32_t D[6][3] = {{-1, 0, 0}, {1, 0, 0},  {0, -1, 0},
                                  {0, 1, 0},  {0, 0, -1}, {0, 0, 1}};
  int pat = 0;
  for (int i = 0; i < 6; ++i) {
    int32_t nx = x + D[i][0], ny = y + D[i][1], nz = z + D[i][2];
    if (nx < 0 || ny < 0 || nz < 0 || nx > hi || ny > hi || nz > hi) continue;
    if (std::binary_search(keys.begin(), keys.end(), pack_node(nx, ny, nz)))
      pat |= 1 << i;
  }
  return pat;
}

// Per-axis state of the three abutting child voxels in the negative
// directions (all causally coded in Morton order: a -x/-y/-z face
// neighbor with equal remaining coords always has a smaller Morton
// code). 0 = region empty at the parent level, 1 = abutting child
// empty, 2 = abutting child occupied.
inline int adj3_state(int32_t x, int32_t y, int32_t z, int c, int prev_bits,
                      const std::unordered_map<uint64_t, uint8_t>& bytes) {
  static const int kBit[3] = {4, 2, 1};
  int s = 0;
  for (int a = 0; a < 3; ++a) {
    int state;
    if (c & kBit[a]) {
      // Abutting voxel is the sibling with this axis bit cleared
      // (smaller child index -> already in prev_bits).
      state = 1 + ((prev_bits >> (c & ~kBit[a])) & 1);
    } else {
      int32_t nx = x - (a == 0), ny = y - (a == 1), nz = z - (a == 2);
      if (nx < 0 || ny < 0 || nz < 0) {
        state = 0;
      } else {
        auto it = bytes.find(pack_node(nx, ny, nz));
        state = it == bytes.end() ? 0 : 1 + ((it->second >> (c | kBit[a])) & 1);
      }
    }
    s = s * 3 + state;
  }
  return s;
}

struct OctContexts {
  CtxTable coarse, fine, sib, adj;
  OctContexts()
      : coarse(kNumCoarse), fine(kNumFine), sib(kNumSib), adj(kNumAdj) {}
};

}  // namespace

// coords: n unique voxels, each in [0, 2^depth). Returns bytes written.
int octree_encode(const int32_t* coords, int n, int depth, uint8_t* out,
                  int out_capacity) {
  if (n <= 0) return 0;
  std::vector<Key3> pts(n);
  for (int i = 0; i < n; ++i)
    pts[i] = {coords[i * 3], coords[i * 3 + 1], coords[i * 3 + 2]};
  // Morton order sort (bit-interleaved x,y,z — x most significant, the
  // child enumeration order of the level sweep).
  std::sort(pts.begin(), pts.end(), [depth](const Key3& a, const Key3& b) {
    for (int s = depth - 1; s >= 0; --s) {
      int ca = (((a.x >> s) & 1) << 2) | (((a.y >> s) & 1) << 1) | ((a.z >> s) & 1);
      int cb = (((b.x >> s) & 1) << 2) | (((b.y >> s) & 1) << 1) | ((b.z >> s) & 1);
      if (ca != cb) return ca < cb;
    }
    return false;
  });
  BinEncoder enc;
  OctContexts ctx;
  std::vector<OctNode> cur = {{0, n, 0, 0, 0, -1}}, next;
  for (int level = 0; level < depth; ++level) {
    int shift = depth - 1 - level;
    std::vector<uint64_t> keys;
    keys.reserve(cur.size());
    for (const OctNode& nd : cur) keys.push_back(pack_node(nd.x, nd.y, nd.z));
    std::sort(keys.begin(), keys.end());
    int32_t hi_coord = (level == 0) ? 0 : ((1 << level) - 1);
    std::unordered_map<uint64_t, uint8_t> bytes;
    bytes.reserve(cur.size() * 2);
    next.clear();
    for (const OctNode& nd : cur) {
      int child_lo[9];
      child_lo[0] = nd.lo;
      int idx = nd.lo;
      for (int c = 0; c < 8; ++c) {
        while (idx < nd.hi) {
          const Key3& p = pts[idx];
          int cc = (((p.x >> shift) & 1) << 2) | (((p.y >> shift) & 1) << 1) |
                   ((p.z >> shift) & 1);
          if (cc != c) break;
          ++idx;
        }
        child_lo[c + 1] = idx;
      }
      int nbr = nbr6_pattern(keys, nd.x, nd.y, nd.z, hi_coord);
      int occ = 0, prev_bits = 0;
      for (int c = 0; c < 8; ++c) {
        int bit = child_lo[c + 1] > child_lo[c] ? 1 : 0;
        int ic = coarse_index(level, c, occ, nd.parent_child);
        int if_ = fine_index(level, c, occ, nbr);
        int is_ = sib_index(level, c, prev_bits);
        int ia = adj_index(level, c,
                           adj3_state(nd.x, nd.y, nd.z, c, prev_bits, bytes));
        enc.encode_p(bit, mix4(ctx.coarse, ic, ctx.fine, if_, ctx.sib, is_,
                               ctx.adj, ia));
        ctx.coarse.adapt(ic, bit);
        ctx.fine.adapt(if_, bit);
        ctx.sib.adapt(is_, bit);
        ctx.adj.adapt(ia, bit);
        occ += bit;
        prev_bits |= bit << c;
      }
      bytes.emplace(pack_node(nd.x, nd.y, nd.z),
                    static_cast<uint8_t>(prev_bits));
      for (int c = 0; c < 8; ++c) {
        if (child_lo[c + 1] > child_lo[c]) {
          next.push_back({child_lo[c], child_lo[c + 1],
                          (nd.x << 1) | ((c >> 2) & 1),
                          (nd.y << 1) | ((c >> 1) & 1),
                          (nd.z << 1) | (c & 1), static_cast<int8_t>(c)});
        }
      }
    }
    cur.swap(next);
  }
  enc.finish();
  if (static_cast<int>(enc.out.size()) > out_capacity) return -1;
  std::memcpy(out, enc.out.data(), enc.out.size());
  return static_cast<int>(enc.out.size());
}

// Returns number of decoded coordinates (triplets in coords_out).
int octree_decode(const uint8_t* in, int in_len, int depth, int32_t* coords_out,
                  int out_capacity) {
  if (in_len <= 0) return 0;
  BinDecoder dec;
  dec.init(in, in_len);
  OctContexts ctx;
  std::vector<OctNode> cur = {{0, 0, 0, 0, 0, -1}}, next;
  for (int level = 0; level < depth; ++level) {
    std::vector<uint64_t> keys;
    keys.reserve(cur.size());
    for (const OctNode& nd : cur) keys.push_back(pack_node(nd.x, nd.y, nd.z));
    std::sort(keys.begin(), keys.end());
    int32_t hi_coord = (level == 0) ? 0 : ((1 << level) - 1);
    std::unordered_map<uint64_t, uint8_t> bytes;
    bytes.reserve(cur.size() * 2);
    next.clear();
    for (const OctNode& nd : cur) {
      int nbr = nbr6_pattern(keys, nd.x, nd.y, nd.z, hi_coord);
      int occ = 0, prev_bits = 0;
      int bits[8];
      for (int c = 0; c < 8; ++c) {
        int ic = coarse_index(level, c, occ, nd.parent_child);
        int if_ = fine_index(level, c, occ, nbr);
        int is_ = sib_index(level, c, prev_bits);
        int ia = adj_index(level, c,
                           adj3_state(nd.x, nd.y, nd.z, c, prev_bits, bytes));
        bits[c] = dec.decode_p(mix4(ctx.coarse, ic, ctx.fine, if_, ctx.sib,
                                    is_, ctx.adj, ia));
        ctx.coarse.adapt(ic, bits[c]);
        ctx.fine.adapt(if_, bits[c]);
        ctx.sib.adapt(is_, bits[c]);
        ctx.adj.adapt(ia, bits[c]);
        occ += bits[c];
        prev_bits |= bits[c] << c;
      }
      bytes.emplace(pack_node(nd.x, nd.y, nd.z),
                    static_cast<uint8_t>(prev_bits));
      for (int c = 0; c < 8; ++c) {
        if (bits[c]) {
          next.push_back({0, 0, (nd.x << 1) | ((c >> 2) & 1),
                          (nd.y << 1) | ((c >> 1) & 1),
                          (nd.z << 1) | (c & 1), static_cast<int8_t>(c)});
        }
      }
    }
    if (static_cast<int>(next.size()) > out_capacity) return -1;
    cur.swap(next);
  }
  if (static_cast<int>(cur.size()) > out_capacity) return -1;
  for (size_t i = 0; i < cur.size(); ++i) {
    coords_out[i * 3 + 0] = cur[i].x;
    coords_out[i * 3 + 1] = cur[i].y;
    coords_out[i * 3 + 2] = cur[i].z;
  }
  return static_cast<int>(cur.size());
}

}  // extern "C"
