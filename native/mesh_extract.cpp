// Native mesh extraction from a dense TSDF volume (marching tetrahedra).
//
// Plays the role of Open3D's C++ `ScalableTSDFVolume.extract_triangle_mesh`
// in the reference pipeline (inference_pipeline.py:786): the TPU keeps the
// TSDF on-device for the generate->map->re-query loop; final mesh export is
// host-side batch work, so it lives in native code for speed.
//
// Marching tetrahedra instead of marching cubes: each cell splits into six
// tetrahedra sharing the 0-7 diagonal; per-tet surface extraction has only
// 16 sign cases, all derivable in code (no lookup tables). Output is a
// triangle soup (3 interpolated vertices + per-vertex colors per triangle).
//
// Build: make -C native   (produces libsgam_native.so; ctypes binding in
// sgam_neurips22_tpu/mapping/mesh.py)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

inline V3 lerp_edge(const V3 &a, const V3 &b, float va, float vb, float iso) {
  float denom = vb - va;
  float t = (denom == 0.0f) ? 0.5f : (iso - va) / denom;
  if (t < 0.0f) t = 0.0f;
  if (t > 1.0f) t = 1.0f;
  return {a.x + t * (b.x - a.x), a.y + t * (b.y - a.y), a.z + t * (b.z - a.z)};
}

// The six tetrahedra covering a unit cube, as corner indices (cube corners
// are bit-coded: bit0 = +x, bit1 = +y, bit2 = +z). All share diagonal 0-7.
constexpr int kTets[6][4] = {
    {0, 1, 3, 7}, {0, 3, 2, 7}, {0, 2, 6, 7},
    {0, 6, 4, 7}, {0, 4, 5, 7}, {0, 5, 1, 7},
};

struct Emitter {
  float *verts;
  float *cols;
  int64_t cap;    // max triangles
  int64_t count;  // triangles emitted (keeps counting past cap)

  void tri(const V3 &a, const V3 &b, const V3 &c, const V3 &ca, const V3 &cb,
           const V3 &cc) {
    if (count < cap) {
      float *v = verts + count * 9;
      v[0] = a.x; v[1] = a.y; v[2] = a.z;
      v[3] = b.x; v[4] = b.y; v[5] = b.z;
      v[6] = c.x; v[7] = c.y; v[8] = c.z;
      float *cl = cols + count * 9;
      cl[0] = ca.x; cl[1] = ca.y; cl[2] = ca.z;
      cl[3] = cb.x; cl[4] = cb.y; cl[5] = cb.z;
      cl[6] = cc.x; cl[7] = cc.y; cl[8] = cc.z;
    }
    ++count;
  }
};

// Extract the iso-surface inside one tetrahedron.
void do_tet(const V3 p[4], const float val[4], const V3 col[4], float iso,
            Emitter &em) {
  int code = 0;
  for (int i = 0; i < 4; ++i)
    if (val[i] < iso) code |= 1 << i;
  if (code == 0 || code == 15) return;

  // Collect the (up to 4) edges whose endpoints straddle the iso value.
  static constexpr int kEdges[6][2] = {{0, 1}, {0, 2}, {0, 3},
                                       {1, 2}, {1, 3}, {2, 3}};
  V3 pts[4], cls[4];
  int inside_single = -1;
  int n_inside = __builtin_popcount(code);
  if (n_inside == 1 || n_inside == 3) {
    // one corner separated from the other three -> one triangle
    for (int i = 0; i < 4; ++i) {
      bool in = (code >> i) & 1;
      if ((n_inside == 1 && in) || (n_inside == 3 && !in)) inside_single = i;
    }
    int k = 0;
    for (int e = 0; e < 6; ++e) {
      int a = kEdges[e][0], b = kEdges[e][1];
      if (a == inside_single || b == inside_single) {
        int other = (a == inside_single) ? b : a;
        pts[k] = lerp_edge(p[inside_single], p[other], val[inside_single],
                           val[other], iso);
        cls[k] = lerp_edge(col[inside_single], col[other], val[inside_single],
                           val[other], iso);
        ++k;
      }
    }
    em.tri(pts[0], pts[1], pts[2], cls[0], cls[1], cls[2]);
  } else {
    // two-vs-two split -> quad -> two triangles. Find the two inside
    // corners; the four crossing edges connect inside<->outside.
    int in_ids[2], out_ids[2], ni = 0, no = 0;
    for (int i = 0; i < 4; ++i) {
      if ((code >> i) & 1) in_ids[ni++] = i;
      else out_ids[no++] = i;
    }
    // quad corners ordered to form a planar strip: (i0,o0), (i0,o1),
    // (i1,o1), (i1,o0)
    auto mk = [&](int a, int b, V3 &pp, V3 &cc) {
      pp = lerp_edge(p[a], p[b], val[a], val[b], iso);
      cc = lerp_edge(col[a], col[b], val[a], val[b], iso);
    };
    V3 q0, q1, q2, q3, c0, c1, c2, c3;
    mk(in_ids[0], out_ids[0], q0, c0);
    mk(in_ids[0], out_ids[1], q1, c1);
    mk(in_ids[1], out_ids[1], q2, c2);
    mk(in_ids[1], out_ids[0], q3, c3);
    em.tri(q0, q1, q2, c0, c1, c2);
    em.tri(q0, q2, q3, c0, c2, c3);
  }
}

}  // namespace

extern "C" {

// Returns the TOTAL number of triangles on the surface. At most `max_tris`
// are written to out_verts/out_cols (9 floats each: 3 vertices / colors).
// Call twice: once with max_tris=0 to size buffers, once to fill them.
// `has_color` == 0 ignores `color` entirely (pass any non-null pointer) and
// emits gray — callers then skip materializing an [X*Y*Z*3] color grid,
// which for a 100M-voxel volume would be >1 GB of host memory.
int64_t tsdf_extract_mesh(const float *tsdf, const float *weight,
                          const float *color, int32_t X, int32_t Y, int32_t Z,
                          float ox, float oy, float oz, float voxel, float iso,
                          float *out_verts, float *out_cols,
                          int64_t max_tris, int32_t has_color) {
  Emitter em{out_verts, out_cols, max_tris, 0};
  const int64_t sy = Z, sx = (int64_t)Y * Z;
  for (int32_t x = 0; x + 1 < X; ++x) {
    for (int32_t y = 0; y + 1 < Y; ++y) {
      for (int32_t z = 0; z + 1 < Z; ++z) {
        V3 p[8];
        float v[8];
        V3 c[8];
        bool observed = true;
        for (int k = 0; k < 8; ++k) {
          int32_t cx = x + (k & 1), cy = y + ((k >> 1) & 1),
                  cz = z + ((k >> 2) & 1);
          int64_t idx = cx * sx + cy * sy + cz;
          if (weight[idx] <= 0.0f) {
            observed = false;
            break;
          }
          v[k] = tsdf[idx];
          p[k] = {ox + (cx + 0.5f) * voxel, oy + (cy + 0.5f) * voxel,
                  oz + (cz + 0.5f) * voxel};
          c[k] = has_color
                     ? V3{color[idx * 3], color[idx * 3 + 1], color[idx * 3 + 2]}
                     : V3{0.5f, 0.5f, 0.5f};
        }
        if (!observed) continue;
        // quick reject: all same side
        bool any_in = false, any_out = false;
        for (int k = 0; k < 8; ++k)
          (v[k] < iso ? any_in : any_out) = true;
        if (!any_in || !any_out) continue;
        for (const auto &tet : kTets) {
          V3 tp[4], tc[4];
          float tv[4];
          for (int k = 0; k < 4; ++k) {
            tp[k] = p[tet[k]];
            tv[k] = v[tet[k]];
            tc[k] = c[tet[k]];
          }
          do_tet(tp, tv, tc, iso, em);
        }
      }
    }
  }
  return em.count;
}

// Bumped on any extern-C signature change; the ctypes loader refuses a
// mismatched (stale) library instead of calling through a wrong ABI.
int32_t sgam_native_abi_version() { return 4; }  // 4: + sgpk_gather (split rgb/depth outputs)

}  // extern "C"
