// cvr_native: native data-path kernels for the TPU volume renderer.
//
// The reference implements its data path in C++ (scene file parsing in
// XmlSceneBuilder/RawSceneBuilder, sparse->dense flattening in
// vdb_adapter/VDBAdapter.cpp, Morton re-layout in Volume::ZYXToMortonOrder,
// image encoding via stb).  This library is the TPU build's equivalent:
// host-side preprocessing that feeds device arrays, exposed to Python via
// ctypes (see cudavolumerenderer_tpu/utils/native.py) with pure-NumPy
// fallbacks when the shared object is absent.
//
// Build: make -C csrc   (g++ -O3 -march=native -shared -fPIC)
//
// Exported (C ABI):
//   cvr_vol_header       — parse a Mitsuba .vol v3 header
//   cvr_vol_read_data    — read the payload into a caller buffer
//   cvr_morton_reorder   — (Z,Y,X[,C]) x-fastest -> 30-bit Morton order
//   cvr_brick_pack       — (Z,Y,X[,C]) -> brick-major layout (bz,by,bx
//                          bricks of 4x4x8 voxels, x-fastest in brick),
//                          padding with 0; also emits per-brick max
//   cvr_brick_max        — per-brick majorants only
//   cvr_rgbe_encode      — float RGB -> Radiance RGBE bytes
//   cvr_normalize_u8     — uint8 volume -> float32 normalized by max

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------- vol io
struct VolHeader {
  int32_t encoding;
  int32_t nx, ny, nz;
  int32_t channels;
  float box_min[3];
  float box_max[3];
};

// Returns 0 on success, negative error codes otherwise.
int cvr_vol_header(const char* path, VolHeader* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  char magic[3];
  uint8_t version;
  if (std::fread(magic, 1, 3, f) != 3 || std::memcmp(magic, "VOL", 3) != 0) {
    std::fclose(f);
    return -2;
  }
  if (std::fread(&version, 1, 1, f) != 1 || version != 3) {
    std::fclose(f);
    return -3;
  }
  int ok = 1;
  ok &= std::fread(&out->encoding, 4, 1, f) == 1;
  ok &= std::fread(&out->nx, 4, 1, f) == 1;
  ok &= std::fread(&out->ny, 4, 1, f) == 1;
  ok &= std::fread(&out->nz, 4, 1, f) == 1;
  ok &= std::fread(&out->channels, 4, 1, f) == 1;
  ok &= std::fread(out->box_min, 4, 3, f) == 3;
  ok &= std::fread(out->box_max, 4, 3, f) == 3;
  std::fclose(f);
  return ok ? 0 : -4;
}

int cvr_vol_read_data(const char* path, float* out, int64_t count) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, 48, SEEK_SET) != 0) {  // 3+1+5*4+6*4 header bytes
    std::fclose(f);
    return -2;
  }
  int64_t got = (int64_t)std::fread(out, 4, (size_t)count, f);
  std::fclose(f);
  return got == count ? 0 : -3;
}

// ------------------------------------------------------------- morton
static inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

static inline uint32_t morton3(uint32_t x, uint32_t y, uint32_t z) {
  return expand_bits(x) * 4 + expand_bits(y) * 2 + expand_bits(z);
}

// src: x-fastest (Z,Y,X,C).  dst must hold next_pow2-cubed entries? No —
// dst holds nx*ny*nz*c entries; voxels are written at the rank of their
// morton code among occupied codes (dimensions need not be equal or
// powers of two: we sort by code by counting).  For simplicity and
// performance we require dims <= 1024 and use the dense code directly
// when dims are powers of two; otherwise we fall back to row-major copy.
int cvr_morton_reorder(const float* src, float* dst, int32_t nx, int32_t ny,
                       int32_t nz, int32_t c) {
  auto is_pow2 = [](int32_t v) { return v > 0 && (v & (v - 1)) == 0; };
  if (!is_pow2(nx) || !is_pow2(ny) || !is_pow2(nz) || nx != ny || ny != nz) {
    return -1;  // caller keeps row-major layout
  }
  const int64_t n = (int64_t)nx * ny * nz;
  for (int32_t z = 0; z < nz; ++z) {
    for (int32_t y = 0; y < ny; ++y) {
      for (int32_t x = 0; x < nx; ++x) {
        const int64_t lin = ((int64_t)z * ny + y) * nx + x;
        const uint32_t code = morton3((uint32_t)x, (uint32_t)y, (uint32_t)z);
        if ((int64_t)code >= n) return -2;
        std::memcpy(dst + (int64_t)code * c, src + lin * c,
                    sizeof(float) * (size_t)c);
      }
    }
  }
  return 0;
}

// ------------------------------------------------------------- bricks
// Brick geometry chosen for the TPU's (sublane, lane) = (8, 128) tiling:
// 4x4x8 voxels = 128 entries, x-fastest inside the brick, so one brick is
// exactly one 128-lane vector row for tpu.dynamic_gather.
static const int BX = 8, BY = 4, BZ = 4;  // x-fastest: 8*4*4 = 128

int cvr_brick_pack(const float* src, float* dst, float* brick_max,
                   int32_t nx, int32_t ny, int32_t nz, int32_t c) {
  const int32_t nbx = (nx + BX - 1) / BX;
  const int32_t nby = (ny + BY - 1) / BY;
  const int32_t nbz = (nz + BZ - 1) / BZ;
  const int64_t brick_elems = (int64_t)BX * BY * BZ * c;
  for (int32_t bz = 0; bz < nbz; ++bz) {
    for (int32_t by = 0; by < nby; ++by) {
      for (int32_t bx = 0; bx < nbx; ++bx) {
        const int64_t b = ((int64_t)bz * nby + by) * nbx + bx;
        float* out = dst + b * brick_elems;
        float mx = 0.0f;
        for (int32_t lz = 0; lz < BZ; ++lz) {
          for (int32_t ly = 0; ly < BY; ++ly) {
            for (int32_t lx = 0; lx < BX; ++lx) {
              const int32_t x = bx * BX + lx;
              const int32_t y = by * BY + ly;
              const int32_t z = bz * BZ + lz;
              const int64_t o = (((int64_t)lz * BY + ly) * BX + lx) * c;
              if (x < nx && y < ny && z < nz) {
                const int64_t lin = (((int64_t)z * ny + y) * nx + x) * c;
                std::memcpy(out + o, src + lin, sizeof(float) * (size_t)c);
                // density is the last channel by fused-grid convention
                mx = std::max(mx, src[lin + c - 1]);
              } else {
                std::memset(out + o, 0, sizeof(float) * (size_t)c);
              }
            }
          }
        }
        if (brick_max) brick_max[b] = mx;
      }
    }
  }
  return 0;
}

int cvr_brick_max(const float* density, float* brick_max, int32_t nx,
                  int32_t ny, int32_t nz) {
  const int32_t nbx = (nx + BX - 1) / BX;
  const int32_t nby = (ny + BY - 1) / BY;
  const int32_t nbz = (nz + BZ - 1) / BZ;
  for (int32_t bz = 0; bz < nbz; ++bz)
    for (int32_t by = 0; by < nby; ++by)
      for (int32_t bx = 0; bx < nbx; ++bx) {
        float mx = 0.0f;
        for (int32_t lz = 0; lz < BZ; ++lz)
          for (int32_t ly = 0; ly < BY; ++ly)
            for (int32_t lx = 0; lx < BX; ++lx) {
              const int32_t x = bx * BX + lx, y = by * BY + ly,
                            z = bz * BZ + lz;
              if (x < nx && y < ny && z < nz)
                mx = std::max(mx,
                              density[((int64_t)z * ny + y) * nx + x]);
            }
        brick_max[((int64_t)bz * nby + by) * nbx + bx] = mx;
      }
  return 0;
}

// ------------------------------------------------------------- images
int cvr_rgbe_encode(const float* rgb, uint8_t* rgbe, int64_t n_pixels) {
  for (int64_t i = 0; i < n_pixels; ++i) {
    const float r = std::max(rgb[i * 3 + 0], 0.0f);
    const float g = std::max(rgb[i * 3 + 1], 0.0f);
    const float b = std::max(rgb[i * 3 + 2], 0.0f);
    const float m = std::max(r, std::max(g, b));
    uint8_t* out = rgbe + i * 4;
    if (m < 1e-32f) {
      out[0] = out[1] = out[2] = out[3] = 0;
      continue;
    }
    int e;
    const float mant = std::frexp(m, &e);
    const float scale = mant * 256.0f / m;
    out[0] = (uint8_t)std::min(r * scale, 255.0f);
    out[1] = (uint8_t)std::min(g * scale, 255.0f);
    out[2] = (uint8_t)std::min(b * scale, 255.0f);
    out[3] = (uint8_t)(e + 128);
  }
  return 0;
}

int cvr_normalize_u8(const uint8_t* src, float* dst, int64_t n) {
  uint8_t mx = 0;
  for (int64_t i = 0; i < n; ++i) mx = std::max(mx, src[i]);
  const float inv = mx > 0 ? 1.0f / (float)mx : 0.0f;
  for (int64_t i = 0; i < n; ++i) dst[i] = (float)src[i] * inv;
  return 0;
}

}  // extern "C"
