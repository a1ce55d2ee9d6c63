// Native scene builder for seqdex_tpu.
//
// The TPU-native analog of the reference's native scene construction
// (IsaacGym's C++ asset/actor pipeline behind `gym.load_asset` /
// `create_actor` / `gym.prepare_sim`): the host-side work of compiling a
// scene — contact pair-mask construction, box point sampling, binary-STL
// bounds — is O(P*C) and runs per scene build; in Python it dominates
// build time for heap scenes (132 bricks -> ~5M pair iterations).
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency); the Python
// side (`seqdex_tpu/sim/scene.py`) falls back to numpy when the shared
// library has not been built. Build: `make -C native` (g++ -O3 -shared).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>

extern "C" {

// Build the (P, C) contact pair mask.
//   pt_entry / col_entry: geometry-entry id of each point / collider
//   pt_owner_kind/owner, col_owner_kind/owner: ownership (kind, index)
//   pt_group / col_group: collision groups (>=0 and equal -> filtered)
// mask_out: uint8 row-major (P, C), 1 = pair enabled.
void build_pair_mask(
    int64_t P, int64_t C,
    const int32_t* pt_entry, const int32_t* pt_owner_kind,
    const int32_t* pt_owner, const int32_t* pt_group,
    const int32_t* col_entry, const int32_t* col_owner_kind,
    const int32_t* col_owner, const int32_t* col_group,
    uint8_t* mask_out) {
  for (int64_t p = 0; p < P; ++p) {
    const int32_t pe = pt_entry[p];
    const int32_t pk = pt_owner_kind[p];
    const int32_t po = pt_owner[p];
    const int32_t pg = pt_group[p];
    uint8_t* row = mask_out + p * C;
    for (int64_t c = 0; c < C; ++c) {
      const bool same_entry = pe == col_entry[c];
      const bool same_owner = (pk == col_owner_kind[c]) && (po == col_owner[c]);
      const bool same_group = (pg >= 0) && (col_group[c] >= 0) && (pg == col_group[c]);
      row[c] = (same_entry || same_owner || same_group) ? 0 : 1;
    }
  }
}

// Sample contact points on a box: corners (8), optional edge midpoints (12),
// optional face centers (6). Returns the number of points written.
// out: (max_pts, 3) float64.
int64_t box_points(const double* half, int32_t detail, double* out) {
  int64_t n = 0;
  for (int sx = -1; sx <= 1; sx += 2)
    for (int sy = -1; sy <= 1; sy += 2)
      for (int sz = -1; sz <= 1; sz += 2) {
        out[n * 3 + 0] = sx * half[0];
        out[n * 3 + 1] = sy * half[1];
        out[n * 3 + 2] = sz * half[2];
        ++n;
      }
  if (detail >= 1) {
    for (int axis_zero = 0; axis_zero < 3; ++axis_zero) {
      const int a = (axis_zero + 1) % 3, b = (axis_zero + 2) % 3;
      // match the numpy reference ordering: others = sorted remaining axes
      const int o0 = axis_zero == 0 ? 1 : 0;
      const int o1 = axis_zero == 2 ? 1 : 2;
      for (int s1 = -1; s1 <= 1; s1 += 2)
        for (int s2 = -1; s2 <= 1; s2 += 2) {
          double* pt = out + n * 3;
          pt[0] = pt[1] = pt[2] = 0.0;
          pt[o0] = s1 * half[o0];
          pt[o1] = s2 * half[o1];
          ++n;
        }
      (void)a; (void)b;
    }
  }
  if (detail >= 2) {
    for (int axis = 0; axis < 3; ++axis)
      for (int s = -1; s <= 1; s += 2) {
        double* pt = out + n * 3;
        pt[0] = pt[1] = pt[2] = 0.0;
        pt[axis] = s * half[axis];
        ++n;
      }
  }
  return n;
}

// Bounding box of a binary STL. Returns 0 on success.
int32_t stl_bounds(const char* path, double* half_out, double* center_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned char header[84];
  if (fread(header, 1, 84, f) != 84) { fclose(f); return -2; }
  uint32_t ntri;
  memcpy(&ntri, header + 80, 4);
  float lo[3] = {1e30f, 1e30f, 1e30f};
  float hi[3] = {-1e30f, -1e30f, -1e30f};
  for (uint32_t t = 0; t < ntri; ++t) {
    unsigned char rec[50];
    if (fread(rec, 1, 50, f) != 50) { fclose(f); return -3; }
    for (int v = 0; v < 3; ++v) {
      float xyz[3];
      memcpy(xyz, rec + 12 + v * 12, 12);
      for (int k = 0; k < 3; ++k) {
        if (xyz[k] < lo[k]) lo[k] = xyz[k];
        if (xyz[k] > hi[k]) hi[k] = xyz[k];
      }
    }
  }
  fclose(f);
  for (int k = 0; k < 3; ++k) {
    half_out[k] = (hi[k] - lo[k]) / 2.0;
    center_out[k] = (hi[k] + lo[k]) / 2.0;
  }
  return 0;
}

}  // extern "C"
