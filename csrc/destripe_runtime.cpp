// Native runtime for aind_smartspim_destripe_tpu: blosc1 chunk codec
// (byte/bit-shuffle + zstd via system libzstd).
//
// This is the hot host-side path of the streaming pipeline: every Zarr chunk
// read/written crosses this codec. Calls are made through ctypes (which drops
// the GIL), so a Python thread pool fans chunk encode/decode across cores.
//
// Frame format: c-blosc 1.x (see io/blosc.py docstring). Flags bit 0x10
// advertises the non-split block layout used by zstd frames.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>
#include <thread>
#include <atomic>
#include <zstd.h>

namespace {

constexpr size_t kHeaderSize = 16;
constexpr size_t kDefaultBlock = 1 << 18;  // 256 KiB

inline void store_u32(uint8_t* p, uint32_t v) {
  p[0] = v & 0xff; p[1] = (v >> 8) & 0xff; p[2] = (v >> 16) & 0xff; p[3] = (v >> 24) & 0xff;
}
inline uint32_t load_u32(const uint8_t* p) {
  return uint32_t(p[0]) | uint32_t(p[1]) << 8 | uint32_t(p[2]) << 16 | uint32_t(p[3]) << 24;
}

void byte_shuffle(const uint8_t* src, uint8_t* dst, size_t n, size_t ts) {
  if (ts <= 1 || n < ts) { std::memcpy(dst, src, n); return; }
  const size_t nelem = n / ts;
  for (size_t j = 0; j < ts; ++j) {
    const uint8_t* s = src + j;
    uint8_t* d = dst + j * nelem;
    for (size_t i = 0; i < nelem; ++i) d[i] = s[i * ts];
  }
  std::memcpy(dst + nelem * ts, src + nelem * ts, n - nelem * ts);
}

void byte_unshuffle(const uint8_t* src, uint8_t* dst, size_t n, size_t ts) {
  if (ts <= 1 || n < ts) { std::memcpy(dst, src, n); return; }
  const size_t nelem = n / ts;
  for (size_t j = 0; j < ts; ++j) {
    const uint8_t* s = src + j * nelem;
    uint8_t* d = dst + j;
    for (size_t i = 0; i < nelem; ++i) d[i * ts] = s[i];
  }
  std::memcpy(dst + nelem * ts, src + nelem * ts, n - nelem * ts);
}

// 8x8 bit-matrix transpose (Hacker's Delight). With rows packed as the bytes
// of x (row i = byte i, bit j = column j), output byte b holds, at bit j,
// bit b of input byte j.
inline uint64_t trans_bit_8x8(uint64_t x) {
  uint64_t t;
  t = (x ^ (x >> 7)) & 0x00AA00AA00AA00AAULL; x = x ^ t ^ (t << 7);
  t = (x ^ (x >> 14)) & 0x0000CCCC0000CCCCULL; x = x ^ t ^ (t << 14);
  t = (x ^ (x >> 28)) & 0x00000000F0F0F0F0ULL; x = x ^ t ^ (t << 28);
  return x;
}

// c-blosc bitshuffle of one block: full bit-plane transpose (bit b of every
// element grouped, LSB-first) — but ONLY when the block is a whole number of
// 8-element groups; c-blosc's shuffle.c passes unaligned blocks through
// unchanged (verified against libblosc with crafted raw-stored frames).
void bit_shuffle(const uint8_t* src, uint8_t* dst, size_t n, size_t ts) {
  if (ts < 1 || n % (ts * 8) != 0) { std::memcpy(dst, src, n); return; }
  const size_t ngroups = n / (ts * 8);
  for (size_t g = 0; g < ngroups; ++g) {
    const uint8_t* base = src + g * 8 * ts;
    for (size_t k = 0; k < ts; ++k) {
      uint64_t x = 0;
      for (size_t j = 0; j < 8; ++j)
        x |= uint64_t(base[j * ts + k]) << (8 * j);
      x = trans_bit_8x8(x);
      for (size_t b = 0; b < 8; ++b) {
        dst[(k * 8 + b) * ngroups + g] = uint8_t(x & 0xff);
        x >>= 8;
      }
    }
  }
}

void bit_unshuffle(const uint8_t* src, uint8_t* dst, size_t n, size_t ts) {
  if (ts < 1 || n % (ts * 8) != 0) { std::memcpy(dst, src, n); return; }
  const size_t ngroups = n / (ts * 8);
  for (size_t g = 0; g < ngroups; ++g) {
    uint8_t* base = dst + g * 8 * ts;
    for (size_t k = 0; k < ts; ++k) {
      uint64_t x = 0;
      for (size_t b = 0; b < 8; ++b)
        x |= uint64_t(src[(k * 8 + b) * ngroups + g]) << (8 * b);
      x = trans_bit_8x8(x);
      for (size_t j = 0; j < 8; ++j) {
        base[j * ts + k] = uint8_t(x & 0xff);
        x >>= 8;
      }
    }
  }
}

size_t pick_blocksize(size_t nbytes, size_t ts, bool bitshuf) {
  size_t bs = std::min(kDefaultBlock, nbytes ? nbytes : size_t(1));
  // Element-aligned blocks; bitshuffle wants whole 8-element groups so the
  // non-final blocks actually get transposed.
  const size_t align = bitshuf ? ts * 8 : ts;
  bs = std::max(bs, align);
  if (align > 1) bs -= bs % align;
  bs = std::max(bs, align);
  // c-blosc rejects frames whose header blocksize exceeds nbytes.
  if (nbytes && bs > nbytes) bs = nbytes;
  return bs;
}

}  // namespace

extern "C" {

// Encode one blosc1 frame. shuffle: 0=none, 1=byte, 2=bit. Returns frame
// length or negative on error (-1 dest too small, -2 bad args).
long long blosc1_compress(const char* src_, size_t nbytes, int typesize,
                          int clevel, int shuffle, char* dst_, size_t dstsize) {
  const uint8_t* src = reinterpret_cast<const uint8_t*>(src_);
  uint8_t* dst = reinterpret_cast<uint8_t*>(dst_);
  if (typesize < 1 || typesize > 255 || nbytes > 0xffffffffULL) return -2;
  if (dstsize < kHeaderSize + nbytes + 4096) return -1;

  const size_t ts = size_t(typesize);
  const bool do_bitshuffle = (shuffle == 2);
  const size_t bs = pick_blocksize(nbytes, ts, do_bitshuffle);
  const size_t nblocks = nbytes ? (nbytes + bs - 1) / bs : 1;

  uint8_t flags = 0x10;  // non-split layout
  const bool do_shuffle = (shuffle == 1) && typesize > 1;
  if (do_shuffle) flags |= 0x01;
  if (do_bitshuffle) flags |= 0x04;
  flags |= 4 << 5;  // zstd

  dst[0] = 2; dst[1] = 1; dst[2] = flags; dst[3] = uint8_t(typesize);
  store_u32(dst + 4, uint32_t(nbytes));
  store_u32(dst + 8, uint32_t(bs));

  size_t pos = kHeaderSize + 4 * nblocks;
  std::vector<uint8_t> work(bs);
  std::vector<uint8_t> cbuf(ZSTD_compressBound(bs) + 16);

  for (size_t b = 0; b < nblocks; ++b) {
    const size_t off = b * bs;
    const size_t neblock = std::min(bs, nbytes - off);
    const uint8_t* blk = src + off;
    if (do_shuffle) {
      byte_shuffle(blk, work.data(), neblock, ts);
      blk = work.data();
    } else if (do_bitshuffle) {
      bit_shuffle(blk, work.data(), neblock, ts);
      blk = work.data();
    }
    const size_t csize =
        ZSTD_compress(cbuf.data(), cbuf.size(), blk, neblock, clevel);
    const uint8_t* payload;
    size_t plen;
    if (ZSTD_isError(csize) || csize >= neblock) {
      payload = blk; plen = neblock;  // stored raw: csize == neblock
    } else {
      payload = cbuf.data(); plen = csize;
    }
    if (pos + 4 + plen > dstsize) return -1;
    store_u32(dst + kHeaderSize + 4 * b, uint32_t(pos));
    store_u32(dst + pos, uint32_t(plen));
    std::memcpy(dst + pos + 4, payload, plen);
    pos += 4 + plen;
  }

  if (pos >= nbytes + kHeaderSize) {
    // Incompressible: memcpy frame.
    dst[2] = uint8_t((flags & 0xF0) | 0x02);
    store_u32(dst + 12, uint32_t(nbytes + kHeaderSize));
    std::memcpy(dst + kHeaderSize, src, nbytes);
    return (long long)(nbytes + kHeaderSize);
  }
  store_u32(dst + 12, uint32_t(pos));
  return (long long)pos;
}

// Decode one blosc1 frame (zstd or memcpy; byte shuffle). Returns the number
// of bytes written or negative on error.
long long blosc1_decompress(const char* src_, size_t srclen, char* dst_,
                            size_t dstsize) {
  const uint8_t* src = reinterpret_cast<const uint8_t*>(src_);
  uint8_t* dst = reinterpret_cast<uint8_t*>(dst_);
  if (srclen < kHeaderSize) return -2;
  const uint8_t flags = src[2];
  const size_t ts = src[3];
  const size_t nbytes = load_u32(src + 4);
  const size_t bs = load_u32(src + 8);
  if (dstsize < nbytes) return -1;

  if (flags & 0x02) {  // memcpyed
    if (srclen < kHeaderSize + nbytes) return -2;
    std::memcpy(dst, src + kHeaderSize, nbytes);
    return (long long)nbytes;
  }
  const int codec = (flags >> 5) & 0x7;
  if (codec != 4) return -3;  // zstd only in the native path

  const size_t nblocks = nbytes ? (nbytes + bs - 1) / bs : 1;
  if (srclen < kHeaderSize + 4 * nblocks) return -2;

  const bool shuffled = (flags & 0x01) || (flags & 0x04);
  std::vector<uint8_t> work(shuffled ? bs : 0);
  for (size_t b = 0; b < nblocks; ++b) {
    const size_t out_off = b * bs;
    const size_t neblock = std::min(bs, nbytes - out_off);
    const size_t boff = load_u32(src + kHeaderSize + 4 * b);
    if (boff + 4 > srclen) return -2;
    const size_t csize = load_u32(src + boff);
    if (boff + 4 + csize > srclen) return -2;
    uint8_t* out = shuffled ? work.data() : dst + out_off;
    if (csize == neblock) {
      std::memcpy(out, src + boff + 4, neblock);
    } else {
      const size_t r = ZSTD_decompress(out, neblock, src + boff + 4, csize);
      if (ZSTD_isError(r) || r != neblock) return -4;
    }
    if (flags & 0x01) byte_unshuffle(work.data(), dst + out_off, neblock, ts);
    else if (flags & 0x04) bit_unshuffle(work.data(), dst + out_off, neblock, ts);
  }
  return (long long)nbytes;
}

// Parallel batch encode: n frames, concatenated IO through offset arrays.
// Returns 0 on success; per-frame lengths written to out_lens.
int blosc1_compress_batch(int n, const char** srcs, const size_t* lens,
                          int typesize, int clevel, int shuffle, char** dsts,
                          const size_t* dst_caps, long long* out_lens,
                          int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  std::atomic_int next_idx{0};
  auto worker = [&]() {
    for (;;) {
      int i = next_idx.fetch_add(1);
      if (i >= n) return;
      out_lens[i] = blosc1_compress(srcs[i], lens[i], typesize, clevel, shuffle,
                                    dsts[i], dst_caps[i]);
    }
  };
  const int nt = std::min(n, n_threads);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  for (int i = 0; i < n; ++i)
    if (out_lens[i] < 0) return int(out_lens[i]);
  return 0;
}

int blosc1_decompress_batch(int n, const char** srcs, const size_t* lens,
                            char** dsts, const size_t* dst_caps,
                            long long* out_lens, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  std::atomic_int next_idx{0};
  auto worker = [&]() {
    for (;;) {
      int i = next_idx.fetch_add(1);
      if (i >= n) return;
      out_lens[i] = blosc1_decompress(srcs[i], lens[i], dsts[i], dst_caps[i]);
    }
  };
  const int nt = std::min(n, n_threads);
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  for (int i = 0; i < n; ++i)
    if (out_lens[i] < 0) return int(out_lens[i]);
  return 0;
}

}  // extern "C"
