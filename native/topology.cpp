// proton_tpu native host runtime: mesh topology construction.
//
// The reference (ProtoN) builds its mesh with std::sort + std::unique over
// face objects (src/core/core_bits/basic_mesh.hpp:289-291) and answers
// topology queries with per-element binary searches. Here the host-side
// topology pipeline — edge extraction, face dedup, cell->face maps and the
// face->cell incidence transpose — is a small C++ library driven through
// ctypes, with a NumPy fallback in Python (proton_tpu/core/mesh.py). The
// device never sees any of this: it consumes the finished index arrays.
//
// Build: make -C native   (produces libproton_native.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Edge {
    int64_t lo, hi;     // sorted point ids
    int64_t cell;       // owning cell
    int32_t slot;       // local edge index in the cell
    int8_t bnd;         // boundary code of the raw edge

    bool operator<(const Edge& o) const {
        if (lo != o.lo) return lo < o.lo;
        return hi < o.hi;
    }
    bool same_face(const Edge& o) const {
        return lo == o.lo && hi == o.hi;
    }
};

}  // namespace

extern "C" {

// Build the deduplicated face table and per-cell face ids from padded cell
// connectivity.
//
// Inputs:
//   C, Pmax     cell count, padded points-per-cell
//   cell_ptids  [C * Pmax] int64, padding repeats the last valid id
//   cell_npts   [C] int64
//   edge_bnd    [C * Pmax] int8 boundary code per raw edge (BND_*),
//               already computed by the caller (0 for interior)
// Outputs (caller-allocated):
//   face_ptids  [cap * 2] int32 — sorted unique faces
//   face_bnd    [cap] int8 — max of duplicate edge codes
//   cell_faces  [C * Pmax] int32 — global face id per local edge; padded
//               slots repeat the last valid face id
//   face_cells  [cap * 2] int32 — owning cells (missing -> C)
//   face_slot   [cap * 2] int32 — local edge index within the owner
// Returns the number of unique faces, or -1 if it exceeds `cap`.
int64_t proton_build_topology(int64_t C, int64_t Pmax,
                              const int64_t* cell_ptids,
                              const int64_t* cell_npts,
                              const int8_t* edge_bnd,
                              int64_t cap,
                              int32_t* face_ptids,
                              int8_t* face_bnd,
                              int32_t* cell_faces,
                              int32_t* face_cells,
                              int32_t* face_slot) {
    std::vector<Edge> edges;
    edges.reserve(static_cast<size_t>(C) * Pmax);

    for (int64_t c = 0; c < C; ++c) {
        const int64_t n = cell_npts[c];
        for (int64_t k = 0; k < n; ++k) {
            const int64_t a = cell_ptids[c * Pmax + k];
            const int64_t b = cell_ptids[c * Pmax + (k + 1 < n ? k + 1 : 0)];
            Edge e;
            e.lo = std::min(a, b);
            e.hi = std::max(a, b);
            e.cell = c;
            e.slot = static_cast<int32_t>(k);
            e.bnd = edge_bnd[c * Pmax + k];
            edges.push_back(e);
        }
    }

    std::sort(edges.begin(), edges.end());

    int64_t nf = -1;
    for (size_t i = 0; i < edges.size(); ++i) {
        const Edge& e = edges[i];
        if (nf < 0 || !(e.lo == face_ptids[2 * nf] &&
                        e.hi == face_ptids[2 * nf + 1])) {
            ++nf;
            if (nf >= cap) return -1;
            face_ptids[2 * nf] = static_cast<int32_t>(e.lo);
            face_ptids[2 * nf + 1] = static_cast<int32_t>(e.hi);
            face_bnd[nf] = e.bnd;
            face_cells[2 * nf] = static_cast<int32_t>(e.cell);
            face_slot[2 * nf] = e.slot;
            face_cells[2 * nf + 1] = static_cast<int32_t>(C);
            face_slot[2 * nf + 1] = 0;
        } else {
            if (e.bnd > face_bnd[nf]) face_bnd[nf] = e.bnd;
            face_cells[2 * nf + 1] = static_cast<int32_t>(e.cell);
            face_slot[2 * nf + 1] = e.slot;
        }
        cell_faces[e.cell * Pmax + e.slot] = static_cast<int32_t>(nf);
    }
    const int64_t n_faces = nf + 1;

    // pad cell_faces: repeat the last valid face id
    for (int64_t c = 0; c < C; ++c) {
        const int64_t n = cell_npts[c];
        const int32_t last = cell_faces[c * Pmax + (n - 1)];
        for (int64_t k = n; k < Pmax; ++k)
            cell_faces[c * Pmax + k] = last;
    }

    return n_faces;
}

// Structured grid connectivity (mesh_impl generators,
// basic_mesh.hpp:230-298): fills points [ (Nx+1)*(Ny+1)*2 ] and
// cell_ptids [ Nx*Ny*4 ] in the reference's row-major CCW layout.
void proton_structured_grid(int64_t Nx, int64_t Ny,
                            double min_x, double max_x,
                            double min_y, double max_y,
                            double* points, int64_t* cell_ptids,
                            int8_t* edge_bnd /* C*4, DIRICHLET borders */) {
    const double hx = (max_x - min_x) / Nx;
    const double hy = (max_y - min_y) / Ny;
    int64_t p = 0;
    for (int64_t j = 0; j <= Ny; ++j) {
        for (int64_t i = 0; i <= Nx; ++i) {
            points[2 * p] = min_x + i * hx;
            points[2 * p + 1] = min_y + j * hy;
            ++p;
        }
    }
    int64_t c = 0;
    for (int64_t j = 0; j < Ny; ++j) {
        for (int64_t i = 0; i < Nx; ++i) {
            const int64_t p0 = j * (Nx + 1) + i;
            cell_ptids[4 * c] = p0;
            cell_ptids[4 * c + 1] = p0 + 1;
            cell_ptids[4 * c + 2] = p0 + Nx + 2;
            cell_ptids[4 * c + 3] = p0 + Nx + 1;
            // local edges: bottom, right, top, left (DIRICHLET == 1)
            edge_bnd[4 * c] = (j == 0) ? 1 : 0;
            edge_bnd[4 * c + 1] = (i == Nx - 1) ? 1 : 0;
            edge_bnd[4 * c + 2] = (j == Ny - 1) ? 1 : 0;
            edge_bnd[4 * c + 3] = (i == 0) ? 1 : 0;
            ++c;
        }
    }
}

}  // extern "C"
