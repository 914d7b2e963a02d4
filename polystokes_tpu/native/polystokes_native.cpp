// Host-side native runtime helpers for polystokes_tpu.
//
// TPU-native equivalents of the reference's C++ host machinery:
//  * ps_connected_components — union-find region labeling of REDUCED
//    cells across faces with liquid weight > 0 (the role of Houdini's
//    SIM_VolumetricConnectedComponentBuilder in the reference classifier,
//    exec/HDK_PolyStokesSolver_Classifier.cpp:218-239).  Used as the
//    host-side fallback/verifier for the on-device iterative
//    min-propagation (large untiled domains have O(domain-diameter)
//    propagation depth on device; union-find is O(N alpha(N)) on host).
//  * ps_write_mtx / ps_write_mtx_vector — MatrixMarket export matching
//    the reference's Eigen::saveMarket usage (Solver.cpp:533-606).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int64_t> parent;
  explicit UnionFind(int64_t n) : parent(n) {
    for (int64_t i = 0; i < n; ++i) parent[i] = i;
  }
  int64_t find(int64_t a) {
    while (parent[a] != a) {
      parent[a] = parent[parent[a]];
      a = parent[a];
    }
    return a;
  }
  void unite(int64_t a, int64_t b) {
    a = find(a);
    b = find(b);
    if (a != b) parent[b] = a;
  }
};

constexpr int8_t kReduced = 4;  // classify.REDUCED

}  // namespace

extern "C" {

// labels: int8 [nx*ny*nz] (C order); face liquid weights for the three
// axes with shapes (nx+1,ny,nz), (nx,ny+1,nz), (nx,ny,nz+1); out:
// int32 region id per cell (-1 for non-REDUCED).  Returns the number of
// components.
int64_t ps_connected_components(const int8_t* labels, const float* fwx,
                                const float* fwy, const float* fwz,
                                int64_t nx, int64_t ny, int64_t nz,
                                int32_t* out) {
  const int64_t n = nx * ny * nz;
  UnionFind uf(n);
  auto cid = [&](int64_t i, int64_t j, int64_t k) {
    return (i * ny + j) * nz + k;
  };
  // x-faces index (i,j,k) in (nx+1,ny,nz): face between cells i-1 and i
  auto fx = [&](int64_t i, int64_t j, int64_t k) {
    return (i * ny + j) * nz + k;
  };
  auto fy = [&](int64_t i, int64_t j, int64_t k) {
    return (i * (ny + 1) + j) * nz + k;
  };
  auto fz = [&](int64_t i, int64_t j, int64_t k) {
    return (i * ny + j) * (nz + 1) + k;
  };

  for (int64_t i = 0; i < nx; ++i)
    for (int64_t j = 0; j < ny; ++j)
      for (int64_t k = 0; k < nz; ++k) {
        const int64_t c = cid(i, j, k);
        if (labels[c] != kReduced) continue;
        if (i + 1 < nx && labels[cid(i + 1, j, k)] == kReduced &&
            fwx[fx(i + 1, j, k)] > 0.f)
          uf.unite(c, cid(i + 1, j, k));
        if (j + 1 < ny && labels[cid(i, j + 1, k)] == kReduced &&
            fwy[fy(i, j + 1, k)] > 0.f)
          uf.unite(c, cid(i, j + 1, k));
        if (k + 1 < nz && labels[cid(i, j, k + 1)] == kReduced &&
            fwz[fz(i, j, k + 1)] > 0.f)
          uf.unite(c, cid(i, j, k + 1));
      }

  // compact root ids to 0..count-1
  std::vector<int32_t> remap(n, -1);
  int32_t count = 0;
  for (int64_t c = 0; c < n; ++c) {
    if (labels[c] != kReduced) {
      out[c] = -1;
      continue;
    }
    const int64_t r = uf.find(c);
    if (remap[r] < 0) remap[r] = count++;
    out[c] = remap[r];
  }
  return count;
}

// MatrixMarket coordinate-format sparse export (general real).
int ps_write_mtx(const char* path, int64_t nrows, int64_t ncols, int64_t nnz,
                 const int64_t* rows, const int64_t* cols,
                 const double* vals) {
  FILE* f = std::fopen(path, "w");
  if (!f) return -1;
  std::fprintf(f, "%%%%MatrixMarket matrix coordinate real general\n");
  std::fprintf(f, "%lld %lld %lld\n", (long long)nrows, (long long)ncols,
               (long long)nnz);
  for (int64_t i = 0; i < nnz; ++i)
    std::fprintf(f, "%lld %lld %.17g\n", (long long)(rows[i] + 1),
                 (long long)(cols[i] + 1), vals[i]);
  std::fclose(f);
  return 0;
}

// MatrixMarket dense-vector export (array format).
int ps_write_mtx_vector(const char* path, int64_t n, const double* vals) {
  FILE* f = std::fopen(path, "w");
  if (!f) return -1;
  std::fprintf(f, "%%%%MatrixMarket matrix array real general\n");
  std::fprintf(f, "%lld 1\n", (long long)n);
  for (int64_t i = 0; i < n; ++i) std::fprintf(f, "%.17g\n", vals[i]);
  std::fclose(f);
  return 0;
}

}  // extern "C"
