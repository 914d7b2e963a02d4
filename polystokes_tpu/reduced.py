"""Per-region polynomial reduction: COM, least-squares fits, reduced mass
and interior-viscosity Galerkin matrices, and the J coupling operators.

TPU-native re-design of the reference's threaded per-region sweeps
(exec/HDK_PolyStokesSolver.cpp:1275-1909 and _AssembleBlocks.cpp): thread-
local accumulation + serial merge becomes batched reductions into dense
[R, D, D] tensors, and the per-region 26x26 LU factorizations
(fullPivLu / .inverse()) become batched solves on the MXU.

Key algebraic simplification (exactly equivalent to the reference's
pair-wise sweep, buildReducedViscosityMatrixSystemsInteriorOnly,
Solver.cpp:1485-1694): summing the reference's 4 (cell) / 16 (edge)
ordered stencil pairs per stress sample gives rank-1 outer products,

  V_r  =  sum_{reduced cells}    (mu_c / dx^2)       * d_c d_c^T
        + sum_{interior edges} 0.5 (mu_e / dx^2)     * u_e u_e^T

with d_c = c(upper face) - c(lower face) and u_e the signed sum of the 4
surrounding faces' basis rows.  This is the Galerkin projection of the
stress-divergence operator restricted to region-interior stencils.

Two execution paths:

* tiled (default): with tiling on, every region lives in one tile cube
  (classify.enforce_one_region_per_cube guarantees exactly one), so all
  per-region reductions become dense per-cube reshapes + einsums (batched
  matmuls on the MXU) followed by a tiny [ncubes] scatter.  The CG hot
  loop contains NO scatter (the reference's hot kernel is the analogous
  26-row-block SpMV, lib/include/ApplyPressureStressMatrix.h:102-179).
  Faces of axis a at index f > 0 belong to cube (f-1)//T along a (index 0
  is never reduced when tile_padding >= 1); interior edges likewise along
  their two offset axes.

* general (do_tile=False): segmented scatter-adds with a static region
  bound.

TPU layout note: all basis tensors keep the D axis LEADING (grid axes
trailing) or as [ncubes, D, T^3] — a trailing size-26 axis would be padded
to the 128-lane tile (5x memory).  Offsets are handled as separate x/y/z
component arrays for the same reason.

All basis evaluations use offsets in CELL units (see basis.py) — an exact
diagonal re-parameterization of the reference's world-unit coefficients.
"""
from __future__ import annotations

import dataclasses
from contextlib import contextmanager as _contextmanager
from typing import Tuple

import jax
import jax.numpy as jnp

from .basis import conversion_coefficients, conversion_coefficients_xyz
from .classify import REDUCED, Classification, is_active
from .config import SolverParams
from .grid import EDGE_OFFSET_AXES, Grid, face_offsets
from .operators import face_at_cell


def _coord_axis(shape, a: int, dtype):
    c = jnp.arange(shape[a], dtype=dtype).reshape([-1 if i == a else 1 for i in range(3)])
    return jnp.broadcast_to(c, shape)


# ---------------------------------------------------------------------------
# General (segmented) reductions — the do_tile=False fallback
# ---------------------------------------------------------------------------

def segment_sum_vec(vals_leading, ids, R):
    """vals [D, grid...] summed by ids [grid...] -> [R, D]."""
    D = vals_leading.shape[0]
    flat = vals_leading.reshape(D, -1).T
    seg = jnp.where(ids.reshape(-1) >= 0, ids.reshape(-1), R)
    return jax.ops.segment_sum(flat, seg, num_segments=R + 1)[:R]


def segment_rank1(C1, C2, w, ids, R, chunk=1 << 16):
    """[R, D, D] accumulation of w * C1 C2^T grouped by ids.

    C1, C2: [D, grid...]; processed in chunks so the [chunk, D, D]
    intermediate stays small."""
    D = C1.shape[0]
    C1 = C1.reshape(D, -1).T
    C2 = C2.reshape(D, -1).T
    w = w.reshape(-1)
    seg = jnp.where((ids.reshape(-1) >= 0) & (w != 0), ids.reshape(-1), R)
    N = C1.shape[0]
    if N <= chunk:
        outer = (w[:, None] * C1)[:, :, None] * C2[:, None, :]
        return jax.ops.segment_sum(outer.reshape(N, D * D), seg, num_segments=R + 1)[:R].reshape(R, D, D)

    nchunks = -(-N // chunk)
    padN = nchunks * chunk
    C1 = jnp.pad(C1, ((0, padN - N), (0, 0)))
    C2 = jnp.pad(C2, ((0, padN - N), (0, 0)))
    w = jnp.pad(w, (0, padN - N))
    seg = jnp.pad(seg, (0, padN - N), constant_values=R)

    def body(acc, args):
        c1, c2, ww, ss = args
        outer = (ww[:, None] * c1)[:, :, None] * c2[:, None, :]
        return acc + jax.ops.segment_sum(outer.reshape(chunk, D * D), ss, num_segments=R + 1), None

    acc0 = jnp.zeros((R + 1, D * D), dtype=C1.dtype)
    acc, _ = jax.lax.scan(
        body, acc0,
        (C1.reshape(nchunks, chunk, D), C2.reshape(nchunks, chunk, D),
         w.reshape(nchunks, chunk), seg.reshape(nchunks, chunk)),
    )
    return acc[:R].reshape(R, D, D)


# ---------------------------------------------------------------------------
# Tiled (scatter-free) reductions
# ---------------------------------------------------------------------------

def _use_tiled(params: SolverParams) -> bool:
    """Whether the cube-major (scatter-free) reduction/J-coupling paths
    apply.  Tiled regions are cubes by construction; general (untiled)
    regions qualify when classify() ran the cube-alignment hygiene
    (params.cube_regions), which guarantees one region per tile cube."""
    if params.do_tile:
        return params.tile_padding >= 1
    return params.cube_regions


_GSPMD_GRID_SPEC = None  # (mesh, (axis0, axis1)) set by parallel.sharding


@_contextmanager
def gspmd_grid_spec(mesh, axes):
    """Trace-time context: pin grid-shaped fields entering the cube-major
    reshapes to the canonical (x, y)-slab sharding.  Without it GSPMD is
    free to z-shard the weight-product intermediates of the moments leg,
    and converting a z-sharded slice to the cube-batch layout triggers an
    'involuntary full rematerialization' (last-resort replicate) in the
    SPMD partitioner.  Used by parallel.sharding.sharded_step around the
    GSPMD (non-shard_map) path."""
    global _GSPMD_GRID_SPEC
    prev = _GSPMD_GRID_SPEC
    _GSPMD_GRID_SPEC = (mesh, tuple(axes))
    try:
        yield
    finally:
        _GSPMD_GRID_SPEC = prev


def _constrain_grid(x):
    if _GSPMD_GRID_SPEC is None:
        return x
    mesh, axes = _GSPMD_GRID_SPEC
    from jax.sharding import NamedSharding, PartitionSpec

    spec = [None, None, None]
    for i, a in enumerate(axes[:2]):
        spec[i] = a
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, PartitionSpec(*spec)))


def _to_cube_multiple(arr, facelike_axes, T: int, cs):
    """Drop index 0 along `facelike_axes` and zero-pad every axis to the
    cube multiple cs[i]*T.  The result reshapes to the 6-D block view as a
    pure view of contiguous memory."""
    x = _constrain_grid(arr)
    for ax in facelike_axes:
        sl = [slice(None)] * 3
        sl[ax] = slice(1, None)
        x = x[tuple(sl)]
    pads = [(0, cs[i] * T - x.shape[i]) for i in range(3)]
    return jnp.pad(x, pads)


def block_sum(arr, facelike_axes, T: int, cs):
    """Per-cube sum -> [ncubes], one axis at a time (z first, as a
    lane-dimension reduction).  Every intermediate keeps a wide trailing
    dim, so nothing pads to the 128-lane tile (a single 6-D cube-major
    reduction materializes [.,T,.,T,.,T] transposes padded 8x at 256^3)."""
    x = _to_cube_multiple(arr, facelike_axes, T, cs)
    # z: [X, Y, cs2*T] -> [X, Y, cs2, T] (view) -> sum last axis
    x = x.reshape(cs[0] * T, cs[1] * T, cs[2], T).sum(axis=3)
    # y: [X, cs1, T, cs2] -> sum over the local-y axis
    x = x.reshape(cs[0] * T, cs[1], T, cs[2]).sum(axis=2)
    # x: [cs0, T, cs1, cs2]
    x = x.reshape(cs[0], T, cs[1], cs[2]).sum(axis=1)
    return x.reshape(cs[0] * cs[1] * cs[2])


def block_broadcast(vals, facelike_axes, T: int, cs, out_shape):
    """[ncubes] -> [grid...]: broadcast each cube's value over its cells,
    re-inserting a zero plane at index 0 along the facelike axes.  Axis at
    a time, like block_sum, to keep intermediates tile-friendly."""
    x = vals.reshape(cs[0], cs[1], cs[2])
    x = jnp.broadcast_to(x[:, :, :, None], (cs[0], cs[1], cs[2], T)).reshape(cs[0], cs[1], cs[2] * T)
    x = jnp.broadcast_to(x[:, :, None, :], (cs[0], cs[1], T, cs[2] * T)).reshape(cs[0], cs[1] * T, cs[2] * T)
    x = jnp.broadcast_to(x[:, None, :, :], (cs[0], T, cs[1] * T, cs[2] * T)).reshape(cs[0] * T, cs[1] * T, cs[2] * T)
    crop = list(out_shape)
    pad = [(0, 0)] * 3
    for ax in facelike_axes:
        crop[ax] -= 1
        pad[ax] = (1, 0)
    x = x[tuple(slice(0, c) for c in crop)]
    return jnp.pad(x, pad)


def _cube_scatter(vals, region_of_cube, R: int):
    seg = jnp.where(region_of_cube >= 0, region_of_cube, R)
    return jax.ops.segment_sum(vals, seg, num_segments=R + 1)[:R]


class _Accumulator:
    """Per-region reduction dispatcher (tiled or segmented).

    All C / vals arguments use the leading-D layout [D, grid...]."""

    def __init__(self, grid: Grid, cls: Classification, params: SolverParams, R: int):
        self.cls = cls
        self.R = R
        self.tiled = _use_tiled(params)
        if self.tiled:
            self.T = params.tile_size
            self.cs = tuple(-(-n // self.T) for n in grid.res)
            self.roc = cls.region_of_cube

    def _facelike(self, family):
        return () if family == "cell" else EDGE_OFFSET_AXES[family[1]]

    def vec(self, vals, family):
        """vals [D, grid...] -> [R, D]."""
        if self.tiled:
            fl = self._facelike(family)
            cols = [block_sum(vals[d], fl, self.T, self.cs) for d in range(vals.shape[0])]
            return _cube_scatter(jnp.stack(cols, axis=-1), self.roc, self.R)
        return segment_sum_vec(vals, self._ids(family), self.R)

    def _ids(self, family):
        if family == "cell":
            red = self.cls.cell_labels == REDUCED
            return jnp.where(red, self.cls.cell_region, -1)
        e = family[1]
        red = self.cls.edge_labels[e] == REDUCED
        return jnp.where(red, self.cls.edge_region[e], -1)

    # -- monomial-moment forms: never materialize [D, grid] basis tensors.
    #    sum_i w_i (A1 m1_i)(A2 m2_i)^T  =  A1 (sum_i w_i m1_i m2_i^T) A2^T
    #    with K <= 10 monomials instead of D = 26 basis rows — this keeps
    #    the 256^3 setup inside HBM (a [26, grid] tensor is 1.7 GB there).

    def rank1_mono(self, mono1, mono2, w, A1, A2, family):
        """mono1/mono2: lists of K [grid...] arrays; A1 [D,K1], A2 [D,K2].
        Tiled path: per-(k,l) block sums of w*m1_k*m2_l (fused full-grid
        multiply-reduces, exploiting symmetry when the operands coincide)
        -> [R, K1, K2] moments -> A1 Mom A2^T."""
        if self.tiled:
            fl = self._facelike(family)
            K1, K2 = len(mono1), len(mono2)
            sym = mono2 is mono1
            mom = [[None] * K2 for _ in range(K1)]
            cols = []
            for k in range(K1):
                for l in range(K2):
                    if sym and l < k:
                        mom[k][l] = mom[l][k]
                        continue
                    mom[k][l] = block_sum(w * mono1[k] * mono2[l], fl, self.T, self.cs)
            momc = jnp.stack([jnp.stack(row, axis=-1) for row in mom], axis=-2)  # [nc, K1, K2]
            momR = _cube_scatter(momc.reshape(momc.shape[0], -1), self.roc, self.R)
            momR = momR.reshape(self.R, K1, K2)
            return jnp.einsum("dk,rkl,el->rde", A1, momR, A2)
        C1 = jnp.einsum("dk,k...->d...", A1, jnp.stack(mono1, axis=0))
        C2 = C1 if (mono2 is mono1 and A2 is A1) else jnp.einsum("dk,k...->d...", A2, jnp.stack(mono2, axis=0))
        return segment_rank1(C1, C2, w, self._ids(family), self.R)

    def vec_mono(self, mono, w, A, family):
        """[R, D] accumulation of w * (A m):  A (sum w m)."""
        if self.tiled:
            fl = self._facelike(family)
            mb = jnp.stack([block_sum(w * m, fl, self.T, self.cs) for m in mono], axis=-1)
            mR = _cube_scatter(mb, self.roc, self.R)  # [R, K]
            return mR @ A.T
        C = jnp.einsum("dk,k...->d...", A, jnp.stack(mono, axis=0))
        return segment_sum_vec(C * w[None], self._ids(family), self.R)


# ---------------------------------------------------------------------------
# Gram-form reduced setup (tiled/cube path)
#
# Every per-region matrix build_reduced needs is a sum of terms
# w * m_k(p + d1) * m_l(p + d2) with CONSTANT shifts d (faces sit at
# +-0.5 from cells, edge-adjacent faces at fixed offsets from edges).
# Monomial products are single monomials, so ONE per-region moment vector
# of the degree-2K product monomials per weight field (the "Gram")
# yields every shifted pair matrix algebraically through constant
# monomial shift matrices:  sum w m(p+d1) m(p+d2)^T = S(d1) G S(d2)^T.
#
# The Gram itself is a MATMUL: within a cube the local cell coordinates
# are the same for every cube, so per-cube product-monomial moments are
#   mom_local = W_cube_major[nc, T^3] @ M_local[T^3, P]   (MXU)
# with M_local CONSTANT, followed by a per-cube degree-4 monomial shift
# from the cube origin to the region COM (m4(l + d) = S4(d) m4(l); S4
# entries are binomial-coefficient polynomials in the per-cube offset d).
# One grid-sized transpose per weight field replaces ~1.5k full-grid
# multiply-reduce sweeps (build_reduced was 2.8 s of the 7 s per-solve
# setup at 256^3 as pairwise sums, and still ~2.5 s as per-monomial
# reshape-reductions; the matmul form is bandwidth-bound at ~11 grid
# reads).
# ---------------------------------------------------------------------------

def _monomial_product_table(basis):
    """(idx [K, K] int, plist): product-monomial exponent table.  The
    first K products are the base monomials themselves (j=0 row)."""
    import numpy as np

    from .config import BasisOrder

    if basis == BasisOrder.QUADRATIC:
        exps = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1), (2, 0, 0),
                (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1), (0, 0, 2)]
    else:
        exps = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1)]
    K = len(exps)
    table = {}
    plist = []
    idx = np.zeros((K, K), np.int32)
    for j in range(K):
        for l in range(K):
            e = tuple(a + b for a, b in zip(exps[j], exps[l]))
            if e not in table:
                table[e] = len(plist)
                plist.append(e)
            idx[j, l] = table[e]
    return idx, plist


def _local_moment_matrix(T: int, plist, dtype):
    """Constant [T^3, P] monomial values at CENTERED in-cube coordinates
    loc_j = j - (T-1)/2 (symmetric about the cube center, which keeps the
    shift-to-COM recombination well-conditioned for single-cube regions).
    In-cube order is (x, y, z) row-major, matching _cube_major's reshape.
    The facelike +1 index offset (cube c owns global indices c*T+1..c*T+T
    along facelike axes after _to_cube_multiple drops index 0) is folded
    into the per-cube shift vector, so one matrix serves every family."""
    import numpy as np

    loc = np.arange(T, dtype=np.float64) - (T - 1) / 2.0
    lx = loc[:, None, None]
    ly = loc[None, :, None]
    lz = loc[None, None, :]
    cols = [(lx ** e[0]) * (ly ** e[1]) * (lz ** e[2]) * np.ones((T, T, T)) for e in plist]
    return jnp.asarray(np.stack([c.reshape(-1) for c in cols], axis=-1), dtype)


def _cube_major(arr, facelike_axes, T: int, cs):
    """[grid...] -> [ncubes, T^3] cube-major view (same crop/pad rules as
    block_sum; cube order matches region_of_cube, in-cube order matches
    _local_moment_matrix)."""
    x = _to_cube_multiple(arr, facelike_axes, T, cs)
    x = x.reshape(cs[0], T, cs[1], T, cs[2], T)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(cs[0] * cs[1] * cs[2], T * T * T)


def _shift4_tables(plist):
    """Numpy constants (CO [P, P], EX [P, P, 3]) for the degree-4 monomial
    shift  m_e(l + d) = sum_k CO[e,k] * d^EX[e,k] * m_k(l)  with
    CO[e,k] = prod_i C(e_i, k_i)  (zero unless k <= e componentwise)."""
    import math

    import numpy as np

    P = len(plist)
    CO = np.zeros((P, P))
    EX = np.zeros((P, P, 3), np.int32)
    pidx = {e: i for i, e in enumerate(plist)}
    for ei, e in enumerate(plist):
        for kx in range(e[0] + 1):
            for ky in range(e[1] + 1):
                for kz in range(e[2] + 1):
                    k = (kx, ky, kz)
                    ki = pidx.get(k)
                    if ki is None:
                        continue
                    CO[ei, ki] = math.comb(e[0], kx) * math.comb(e[1], ky) * math.comb(e[2], kz)
                    EX[ei, ki] = (e[0] - kx, e[1] - ky, e[2] - kz)
    return CO, EX


def _shift_moments(mom_local, d, CO, EX, max_pow: int):
    """Per-cube shift of product-monomial moments: [nc, P], d [nc, 3] ->
    [nc, P] moments about l + d (i.e. evaluated at positions local + d)."""
    dp = [jnp.stack([d[:, i] ** p for p in range(max_pow + 1)], axis=-1) for i in range(3)]
    S = CO[None] * dp[0][:, EX[:, :, 0]] * dp[1][:, EX[:, :, 1]] * dp[2][:, EX[:, :, 2]]
    return jnp.einsum("cek,ck->ce", S, mom_local)


def _const_shift(delta, basis, dtype):
    """[K, K] constant S with m(p + delta) = S m(p)."""
    from .basis import monomial_shift_matrix

    c = [jnp.asarray(-d, dtype) for d in delta]
    return monomial_shift_matrix(c[0], c[1], c[2], basis)


def _build_reduced_gram(grid, cls, com, velocity, viscosity_c, viscosity_e, params, R, acc):
    """(fitM, fitb, mr, vr) via per-weight Grams (module section doc).
    Exactly the sums of the pairwise path, reassociated: each Gram holds
    per-region product-monomial moments about the region COM; constant
    shift matrices produce the lo/hi/edge-face variants."""
    from .basis import monomial_matrix
    from .classify import is_active as _is_active
    from .grid import shift as _shift_arr

    import numpy as np

    dtype = params.dtype
    D = params.reduced_dof
    T, cs, roc = acc.T, acc.cs, acc.roc
    red_cell = cls.cell_labels == REDUCED
    idx_tab, plist = _monomial_product_table(params.basis)
    K = n_monomials_of(params)
    max_pow = max(max(e) for e in plist)
    inv_dx2 = jnp.asarray(1.0 / (grid.dx * grid.dx), dtype)
    rho = jnp.asarray(params.effective_density, dtype)
    idx_tab_j = jnp.asarray(idx_tab)
    CO, EX = _shift4_tables(plist)
    CO = jnp.asarray(CO, dtype)
    EX = jnp.asarray(EX)

    # per-cube shift from the cube CENTER to the region COM (centered
    # local coordinates; see _local_moment_matrix)
    nc = cs[0] * cs[1] * cs[2]
    ci = np.arange(nc)
    origins = np.stack([ci // (cs[1] * cs[2]), (ci // cs[2]) % cs[1], ci % cs[2]], axis=-1) * T
    com_c = com[jnp.clip(roc, 0)]  # [nc, 3]; invalid cubes dropped in scatter
    d_cube = jnp.asarray(origins + (T - 1) / 2.0, dtype) - com_c.astype(dtype)

    mloc = _local_moment_matrix(T, plist, dtype)

    def cube_moments(w, facelike):
        mom_local = _cube_major(w, facelike, T, cs) @ mloc  # [nc, P]
        offs = jnp.asarray([1.0 if a in facelike else 0.0 for a in range(3)], dtype)
        return _shift_moments(mom_local, d_cube + offs, CO, EX, max_pow)

    def gram_of(w, facelike=()):
        mom = cube_moments(w, facelike)
        M = _cube_scatter(mom, roc, R)  # [R, P]
        return M[:, idx_tab_j]  # [R, K, K]

    def moments1(g):
        mom = cube_moments(g, ())
        return _cube_scatter(mom, roc, R)[:, :K]  # [R, K]

    active_cell = _is_active(cls.cell_labels)
    w_visc = red_cell.astype(dtype) * viscosity_c.astype(dtype) * inv_dx2
    G_red = gram_of(red_cell.astype(dtype))
    G_visc = gram_of(w_visc)

    fitM = jnp.zeros((R, D, D), dtype)
    fitb = jnp.zeros((R, D), dtype)
    mr = jnp.zeros((R, D, D), dtype)
    vr = jnp.zeros((R, D, D), dtype)

    def quad(AS1, G, AS2):
        return jnp.einsum("dk,rkl,el->rde", AS1, G, AS2)

    for a in range(3):
        A = jnp.asarray(monomial_matrix(a, params.basis), dtype)
        d_lo = [0.0, 0.0, 0.0]
        d_lo[a] = -0.5
        d_hi = [0.0, 0.0, 0.0]
        d_hi[a] = 0.5
        AS_lo = A @ _const_shift(d_lo, params.basis, dtype)
        AS_hi = A @ _const_shift(d_hi, params.basis, dtype)
        dl = [0, 0, 0]
        dl[a] = -1
        dh = [0, 0, 0]
        dh[a] = 1
        nb_lo = _shift_arr(active_cell, tuple(dl), fill=False)
        nb_hi = _shift_arr(active_cell, tuple(dh), fill=False)
        w_lo = (red_cell & nb_lo).astype(dtype)
        w_hi = (red_cell & nb_hi).astype(dtype)
        G_lo = gram_of(w_lo)
        G_hi = gram_of(w_hi)
        fitM = fitM + quad(AS_lo, G_lo, AS_lo) + quad(AS_hi, G_hi, AS_hi)
        mr = mr + rho * (quad(AS_lo, G_red, AS_lo) + quad(AS_hi, G_hi, AS_hi))
        ASd = AS_hi - AS_lo
        vr = vr + quad(ASd, G_visc, ASd)

        u_lo = face_at_cell(velocity[a].astype(dtype), a, 0)
        u_hi = face_at_cell(velocity[a].astype(dtype), a, 1)
        m1_lo = moments1(w_lo * u_lo)
        m1_hi = moments1(w_hi * u_hi)
        fitb = fitb + m1_lo @ AS_lo.T + m1_hi @ AS_hi.T

    # edge shear terms: u = sum over the 4 surrounding faces of
    # sigma_f c(f) with constant face offsets from the edge sample
    for e in range(3):
        p_ax, q_ax = EDGE_OFFSET_AXES[e]
        Bsum = None
        for fa, other in ((p_ax, q_ax), (q_ax, p_ax)):
            off = face_offsets(fa)
            d_up = list(off)
            d_dn = list(off)
            d_dn[other] -= 1.0
            A_fa = jnp.asarray(monomial_matrix(fa, params.basis), dtype)
            Bterm = A_fa @ (_const_shift(d_dn, params.basis, dtype) - _const_shift(d_up, params.basis, dtype))
            Bsum = Bterm if Bsum is None else Bsum + Bterm
        w = (cls.edge_labels[e] == REDUCED).astype(dtype) * 0.5 * viscosity_e[e].astype(dtype) * inv_dx2
        G_e = gram_of(w, EDGE_OFFSET_AXES[e])
        vr = vr + quad(Bsum, G_e, Bsum)

    return fitM, fitb, mr, vr


def n_monomials_of(params):
    from .basis import n_monomials

    return n_monomials(params.basis)


# ---------------------------------------------------------------------------
# Region geometry
# ---------------------------------------------------------------------------

def center_of_masses(cls: Classification, R: int, dtype, acc: "_Accumulator"):
    """[R, 3] mean cell coordinate per region, cell units (the reference
    scales by dx, Solver.cpp:329-372; we keep cell units to match the
    basis parameterization)."""
    red = cls.cell_labels == REDUCED
    m = red.astype(dtype)
    shape = cls.cell_labels.shape
    vals = jnp.stack([_coord_axis(shape, a, dtype) * m for a in range(3)] + [m], axis=0)
    sums = acc.vec(vals, "cell")
    counts = sums[:, 3]
    com = sums[:, :3] / jnp.maximum(counts, 1.0)[:, None]
    return com, counts


def gather_com_xyz(com, region_ids):
    """Per-sample COM components (three [grid...] arrays)."""
    safe = jnp.clip(region_ids, 0, com.shape[0] - 1)
    ok = region_ids >= 0
    return tuple(jnp.where(ok, com[safe, i], 0.0) for i in range(3))


def gather_com(com, region_ids):
    safe = jnp.clip(region_ids, 0, com.shape[0] - 1)
    out = com[safe]
    return jnp.where((region_ids >= 0)[..., None], out, 0.0)


def _cell_face_basis_pair(cls, com, axis: int, params: SolverParams):
    """[D, nx,ny,nz] basis rows at every cell's lower / upper face of
    `axis` (offsets cell -+ 0.5 e_axis - com)."""
    dtype = params.dtype
    shape = cls.cell_labels.shape
    cx, cy, cz = gather_com_xyz(com, cls.cell_region)
    px = _coord_axis(shape, 0, dtype) - cx
    py = _coord_axis(shape, 1, dtype) - cy
    pz = _coord_axis(shape, 2, dtype) - cz
    p = [px, py, pz]
    p_lo = list(p)
    p_hi = list(p)
    p_lo[axis] = p[axis] - 0.5
    p_hi[axis] = p[axis] + 0.5
    c_lo = conversion_coefficients_xyz(*p_lo, axis, params.basis, stack_axis=0)
    c_hi = conversion_coefficients_xyz(*p_hi, axis, params.basis, stack_axis=0)
    return c_lo, c_hi


# ---------------------------------------------------------------------------
# Reduced data
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ReducedData:
    com: jnp.ndarray  # [R, 3]
    cell_counts: jnp.ndarray  # [R]
    mr: jnp.ndarray  # [R, D, D] mass
    vr: jnp.ndarray  # [R, D, D] interior viscosity
    binv: jnp.ndarray  # [R, D, D] inv(Mr/dt + 2 Vr)
    best_fit: jnp.ndarray  # [R, D]
    b_w: jnp.ndarray  # [R, D] = Mr @ best_fit


def build_reduced(grid: Grid, cls: Classification, velocity, viscosity_c, viscosity_e, params: SolverParams, R: int) -> ReducedData:
    from .basis import monomial_matrix, monomials_xyz

    dtype = params.dtype
    D = params.reduced_dof
    red_cell = cls.cell_labels == REDUCED
    acc = _Accumulator(grid, cls, params, R)

    com, counts = center_of_masses(cls, R, dtype, acc)

    if acc.tiled:
        # Gram fast path: every shifted-pair sum through per-weight
        # product-monomial moments (see _build_reduced_gram)
        fitM, fitb, mr, vr = _build_reduced_gram(
            grid, cls, com, velocity, viscosity_c, viscosity_e, params, R, acc
        )
        from .linalg import solve_spd

        eye = jnp.eye(D, dtype=dtype)
        valid = cls.region_valid
        fitM_safe = jnp.where(valid[:, None, None], fitM, eye)
        best_fit = solve_spd(fitM_safe, fitb[..., None])[..., 0]
        best_fit = jnp.where(valid[:, None], best_fit, 0.0)
        return ReducedData(com=com, cell_counts=counts, mr=mr, vr=vr, binv=jnp.zeros_like(mr), best_fit=best_fit, b_w=jnp.zeros_like(best_fit))

    from .grid import shift as _shift

    def cell_face_monomials(axis, side):
        """Monomials at every cell's lower/upper face of `axis`."""
        shape = cls.cell_labels.shape
        cx, cy, cz = gather_com_xyz(com, cls.cell_region)
        p = [
            _coord_axis(shape, 0, dtype) - cx,
            _coord_axis(shape, 1, dtype) - cy,
            _coord_axis(shape, 2, dtype) - cz,
        ]
        p[axis] = p[axis] + (0.5 if side else -0.5)
        return monomials_xyz(p[0], p[1], p[2], params.basis)

    # ---- least-squares best fit (Solver.cpp:1331-1399): faces of reduced
    # cells whose across-cell neighbor is ACTIVE contribute c c^T and
    # u_face * c.
    # ---- reduced mass (Solver.cpp:1406-1482): lower face always, upper
    # face only when the neighbor is ACTIVE (counts shared faces once).
    fitM = jnp.zeros((R, D, D), dtype)
    fitb = jnp.zeros((R, D), dtype)
    mr = jnp.zeros((R, D, D), dtype)
    rho = jnp.asarray(params.effective_density, dtype)
    active_cell = is_active(cls.cell_labels)
    inv_dx2 = jnp.asarray(1.0 / (grid.dx * grid.dx), dtype)
    vr = jnp.zeros((R, D, D), dtype)
    w_visc = red_cell.astype(dtype) * viscosity_c.astype(dtype) * inv_dx2

    for a in range(3):
        A = jnp.asarray(monomial_matrix(a, params.basis), dtype)
        m_lo_list = cell_face_monomials(a, 0)
        m_hi_list = cell_face_monomials(a, 1)
        d_lo = [0, 0, 0]
        d_lo[a] = -1
        d_hi = [0, 0, 0]
        d_hi[a] = 1
        nb_lo = _shift(active_cell, tuple(d_lo), fill=False)
        nb_hi = _shift(active_cell, tuple(d_hi), fill=False)
        u_lo = face_at_cell(velocity[a].astype(dtype), a, 0)
        u_hi = face_at_cell(velocity[a].astype(dtype), a, 1)

        w_lo = (red_cell & nb_lo).astype(dtype)
        w_hi = (red_cell & nb_hi).astype(dtype)
        fitM = fitM + acc.rank1_mono(m_lo_list, m_lo_list, w_lo, A, A, "cell")
        fitM = fitM + acc.rank1_mono(m_hi_list, m_hi_list, w_hi, A, A, "cell")
        fitb = fitb + acc.vec_mono(m_lo_list, w_lo * u_lo, A, "cell")
        fitb = fitb + acc.vec_mono(m_hi_list, w_hi * u_hi, A, "cell")

        mr = mr + acc.rank1_mono(m_lo_list, m_lo_list, rho * red_cell.astype(dtype), A, A, "cell")
        mr = mr + acc.rank1_mono(m_hi_list, m_hi_list, rho * w_hi, A, A, "cell")

        # interior viscosity, cell-centered term (rank-1 form; module doc):
        # d = c_hi - c_lo = A (m_hi - m_lo)
        dm = [h - l for h, l in zip(m_hi_list, m_lo_list)]
        vr = vr + acc.rank1_mono(dm, dm, w_visc, A, A, "cell")

    # edge terms: 0.5 mu_e/dx^2 * u u^T over strictly REDUCED edges, with
    # u = sum over the 4 surrounding faces of s * c(face)  (s = +1 on the
    # lower offset side, -1 on the edge itself).  u mixes the two face
    # families p, q:  u = [A_p | A_q] [dm_p ; dm_q].
    for e in range(3):
        p, q = EDGE_OFFSET_AXES[e]
        edge_red = cls.edge_labels[e] == REDUCED
        eshape = cls.edge_labels[e].shape
        ex, ey, ez = gather_com_xyz(com, cls.edge_region[e])
        pos = [
            _coord_axis(eshape, 0, dtype) - ex,
            _coord_axis(eshape, 1, dtype) - ey,
            _coord_axis(eshape, 2, dtype) - ez,
        ]
        mono_stack = []
        A_parts = []
        for fa, other in ((p, q), (q, p)):
            off = face_offsets(fa)
            up = [pos[i] + off[i] for i in range(3)]
            dn = list(up)
            dn[other] = up[other] - 1.0
            m_up = monomials_xyz(up[0], up[1], up[2], params.basis)
            m_dn = monomials_xyz(dn[0], dn[1], dn[2], params.basis)
            mono_stack.extend([d_ - u_ for d_, u_ in zip(m_dn, m_up)])
            A_parts.append(monomial_matrix(fa, params.basis))
        import numpy as _np

        A_stack = jnp.asarray(_np.concatenate(A_parts, axis=1), dtype)
        w = edge_red.astype(dtype) * 0.5 * viscosity_e[e].astype(dtype) * inv_dx2
        vr = vr + acc.rank1_mono(mono_stack, mono_stack, w, A_stack, A_stack, ("edge", e))

    # ---- batched least-squares solve (reference: per-region fullPivLu,
    # Solver.cpp:401-416) on the MXU
    from .linalg import solve_spd

    eye = jnp.eye(D, dtype=dtype)
    valid = cls.region_valid
    fitM_safe = jnp.where(valid[:, None, None], fitM, eye)
    best_fit = solve_spd(fitM_safe, fitb[..., None])[..., 0]
    best_fit = jnp.where(valid[:, None], best_fit, 0.0)

    return ReducedData(com=com, cell_counts=counts, mr=mr, vr=vr, binv=jnp.zeros_like(mr), best_fit=best_fit, b_w=jnp.zeros_like(best_fit))


def viscosity_incl_boundary(grid: Grid, cls: Classification, com, viscosity_c, viscosity_e, params: SolverParams, R: int):
    """Incl-boundary reduced viscosity matrices [R, D, D] — the reference's
    buildReducedViscosityMatrixSystems variant (Solver.cpp:1696-1909), used
    by no active scheme but part of the component surface.

    Unlike the interior-only sweep (gating on the *sample* being strictly
    inside a region), this sweeps reduced FACES: every cell/edge stress
    sample contributes the pairs of its adjacent faces that are reduced.
    The same rank-1 identity applies with per-face gating:

      V_r = sum_cells  (mu_c/dx^2)      u_c u_c^T,
            u_c = c(hi)*chi_hi - c(lo)*chi_lo
          + sum_edges 0.5 (mu_e/dx^2)   u_e u_e^T,
            u_e = sum_{4 faces} sigma_f c(f) * chi_f

    with chi_f = 1[face reduced] (the reference's adjacentInteriorIndex >=
    0 check) and the sample accumulated into the gated faces' region."""
    from .basis import monomial_matrix, monomials_xyz

    dtype = params.dtype
    D = params.reduced_dof
    inv_dx2 = jnp.asarray(1.0 / (grid.dx * grid.dx), dtype)
    vr = jnp.zeros((R, D, D), dtype)

    def face_red(a):
        return (cls.face_labels[a] == REDUCED) & (cls.face_region[a] >= 0)

    # ---- cell-centered terms
    shape = cls.cell_labels.shape
    for a in range(3):
        A = jnp.asarray(monomial_matrix(a, params.basis), dtype)
        chi_lo = face_at_cell(face_red(a).astype(dtype), a, 0)
        chi_hi = face_at_cell(face_red(a).astype(dtype), a, 1)
        reg_lo = face_at_cell(cls.face_region[a], a, 0)
        reg_hi = face_at_cell(cls.face_region[a], a, 1)
        # region of the gated faces (they agree when both reduced)
        ids = jnp.maximum(
            jnp.where(chi_lo > 0, reg_lo, -1), jnp.where(chi_hi > 0, reg_hi, -1)
        )
        # offsets use the gated faces' region COM (they share a region)
        gx, gy, gz = gather_com_xyz(com, ids)
        p = [
            _coord_axis(shape, 0, dtype) - gx,
            _coord_axis(shape, 1, dtype) - gy,
            _coord_axis(shape, 2, dtype) - gz,
        ]
        p_lo = list(p)
        p_hi = list(p)
        p_lo[a] = p[a] - 0.5
        p_hi[a] = p[a] + 0.5
        m_lo = monomials_xyz(p_lo[0], p_lo[1], p_lo[2], params.basis)
        m_hi = monomials_xyz(p_hi[0], p_hi[1], p_hi[2], params.basis)
        dm = [h * chi_hi - l * chi_lo for h, l in zip(m_hi, m_lo)]
        w = viscosity_c.astype(dtype) * inv_dx2 * (ids >= 0).astype(dtype)
        C = jnp.einsum("dk,k...->d...", A, jnp.stack(dm, axis=0))
        vr = vr + segment_rank1(C, C, w, ids, R)

    # ---- edge-centered terms
    for e in range(3):
        p_ax, q_ax = EDGE_OFFSET_AXES[e]
        eshape = cls.edge_labels[e].shape
        chi = {}
        regs = {}
        for fa, other in ((p_ax, q_ax), (q_ax, p_ax)):
            # faces of axis fa around edge g: d=1 -> face index g (the
            # "up"/at-edge position), d=0 -> face index g - e_t ("dn")
            red = face_red(fa).astype(dtype)
            reg = cls.face_region[fa]
            t = 3 - fa - e  # == other

            def edge_view(arr, d, fill, t=t):
                pad = [(0, 0)] * 3
                pad[t] = (1, 0) if d == 0 else (0, 1)
                return jnp.pad(arr, pad, constant_values=fill)

            chi[(fa, 0)] = edge_view(red, 0, 0)
            chi[(fa, 1)] = edge_view(red, 1, 0)
            regs[(fa, 0)] = edge_view(reg, 0, -1)
            regs[(fa, 1)] = edge_view(reg, 1, -1)
        ids = jnp.full(eshape, -1, jnp.int32)
        for key, c in chi.items():
            ids = jnp.maximum(ids, jnp.where(c > 0, regs[key].astype(jnp.int32), -1))
        gx, gy, gz = gather_com_xyz(com, ids)
        pos = [
            _coord_axis(eshape, 0, dtype) - gx,
            _coord_axis(eshape, 1, dtype) - gy,
            _coord_axis(eshape, 2, dtype) - gz,
        ]
        mono_stack = []
        A_parts = []
        for fa, other in ((p_ax, q_ax), (q_ax, p_ax)):
            off = face_offsets(fa)
            up = [pos[i] + off[i] for i in range(3)]
            dn = list(up)
            dn[other] = up[other] - 1.0
            m_up = monomials_xyz(up[0], up[1], up[2], params.basis)
            m_dn = monomials_xyz(dn[0], dn[1], dn[2], params.basis)
            mono_stack.extend([
                d_ * chi[(fa, 0)] - u_ * chi[(fa, 1)] for d_, u_ in zip(m_dn, m_up)
            ])
            A_parts.append(monomial_matrix(fa, params.basis))
        import numpy as _np

        A_stack = jnp.asarray(_np.concatenate(A_parts, axis=1), dtype)
        w = 0.5 * viscosity_e[e].astype(dtype) * inv_dx2 * (ids >= 0).astype(dtype)
        C = jnp.einsum("dk,k...->d...", A_stack, jnp.stack(mono_stack, axis=0))
        vr = vr + segment_rank1(C, C, w, ids, R)
    return vr


def finalize_reduced(rd: ReducedData, valid, dt, dtype, D):
    """B = Mr/dt + 2 Vr per region; invert (AssembleBlocks.cpp:196-244)."""
    from .linalg import inv_spd

    eye = jnp.eye(D, dtype=dtype)
    B = rd.mr / dt + 2.0 * rd.vr
    B_safe = jnp.where(valid[:, None, None], B, eye)
    binv = inv_spd(B_safe)
    binv = jnp.where(valid[:, None, None], binv, 0.0)
    b_w = jnp.einsum("rij,rj->ri", rd.mr, rd.best_fit)
    return dataclasses.replace(rd, binv=binv, b_w=b_w)


# ---------------------------------------------------------------------------
# Tiled J coupling (scatter-free)
# ---------------------------------------------------------------------------

def _face_offset_grids(cls: Classification, com, axis: int, params: SolverParams, T: int, cs):
    """Full-grid (face-shaped) offset component arrays: face position minus
    the COM of the face's cube's region (broadcast per cube)."""
    dtype = params.dtype
    shape = cls.face_region[axis].shape
    off = face_offsets(axis)
    safe = jnp.clip(cls.region_of_cube, 0, com.shape[0] - 1)
    ok = cls.region_of_cube >= 0
    out = []
    for i in range(3):
        com_i = jnp.where(ok, com[safe, i], 0.0)
        com_grid = block_broadcast(com_i, (axis,), T, cs, shape)
        out.append(_coord_axis(shape, i, dtype) + off[i] - com_grid)
    return out


def reduce_J_tiled(grid: Grid, cls: Classification, com, s_faces, params: SolverParams, R: int):
    """y = J x, monomial-factored:  C^a = A^a M  with A^a a constant
    [D, K] matrix and M the K monomials of the face offsets.  Per axis we
    reduce K moments  mu[c, k] = sum_t s * m_k  (the monomials are
    recomputed on the fly from iota — no HBM traffic) and combine
    y += mu A^T."""
    from .basis import monomial_matrix, monomials_xyz

    T = params.tile_size
    cs = tuple(-(-n // T) for n in grid.res)
    nc = cs[0] * cs[1] * cs[2]
    D = params.reduced_dof
    y_cube = jnp.zeros((nc, D), dtype=params.dtype)
    for a in range(3):
        reg = cls.face_region[a]
        red = (cls.face_labels[a] == REDUCED) & (reg >= 0)
        s = jnp.where(red, s_faces[a], 0.0)
        ox, oy, oz = _face_offset_grids(cls, com, a, params, T, cs)
        mono = monomials_xyz(ox, oy, oz, params.basis)
        mu = jnp.stack([block_sum(s * m, (a,), T, cs) for m in mono], axis=-1)  # [nc, K]
        A = jnp.asarray(monomial_matrix(a, params.basis), params.dtype)
        y_cube = y_cube + mu @ A.T
    return _cube_scatter(y_cube, cls.region_of_cube, R)


def expand_J_tiled(grid: Grid, cls: Classification, com, w, params: SolverParams):
    """u = J^T w rows, monomial-factored: v = w A per cube, then
    u = sum_k v_k m_k elementwise (fused with the monomial computation)."""
    from .basis import monomial_matrix, monomials_xyz

    T = params.tile_size
    cs = tuple(-(-n // T) for n in grid.res)
    safe = jnp.clip(cls.region_of_cube, 0, w.shape[0] - 1)
    w_cube = jnp.where((cls.region_of_cube >= 0)[:, None], w[safe], 0.0)
    out = []
    for a in range(3):
        A = jnp.asarray(monomial_matrix(a, params.basis), params.dtype)
        v = w_cube @ A  # [nc, K]
        fshape = cls.face_region[a].shape
        ox, oy, oz = _face_offset_grids(cls, com, a, params, T, cs)
        mono = monomials_xyz(ox, oy, oz, params.basis)
        u_face = sum(
            block_broadcast(v[:, k], (a,), T, cs, fshape) * mono[k]
            for k in range(len(mono))
        )
        red = (cls.face_labels[a] == REDUCED) & (cls.face_region[a] >= 0)
        out.append(jnp.where(red, u_face, 0.0))
    return out


# ---------------------------------------------------------------------------
# J coupling entry points
# ---------------------------------------------------------------------------

def _face_basis_leading(cls, com, axis: int, params: SolverParams):
    """[D, face grid...] basis rows for every face of `axis` (general path)."""
    dtype = params.dtype
    shape = cls.face_region[axis].shape
    cx, cy, cz = gather_com_xyz(com, cls.face_region[axis])
    off = face_offsets(axis)
    px = _coord_axis(shape, 0, dtype) + off[0] - cx
    py = _coord_axis(shape, 1, dtype) + off[1] - cy
    pz = _coord_axis(shape, 2, dtype) + off[2] - cz
    return conversion_coefficients_xyz(px, py, pz, axis, params.basis, stack_axis=0)


def _face_monomials_general(cls, com, axis: int, params: SolverParams):
    """Monomial list at every face of `axis` about the face's region COM."""
    from .basis import monomials_xyz

    dtype = params.dtype
    shape = cls.face_region[axis].shape
    cx, cy, cz = gather_com_xyz(com, cls.face_region[axis])
    off = face_offsets(axis)
    px = _coord_axis(shape, 0, dtype) + off[0] - cx
    py = _coord_axis(shape, 1, dtype) + off[1] - cy
    pz = _coord_axis(shape, 2, dtype) + off[2] - cz
    return monomials_xyz(px, py, pz, params.basis)


def reduce_J(grid: Grid, cls: Classification, com, s_faces, params: SolverParams, R: int):
    """y = J x: accumulate basis-weighted face stencil values per region.

    General path is monomial-factored like the tiled one: K-wide segment
    sums of s*m_k followed by a tiny [R, K] @ A^T — never materializing
    the [D=26, grid] basis tensor."""
    if _use_tiled(params):
        return reduce_J_tiled(grid, cls, com, s_faces, params, R)
    from .basis import monomial_matrix

    y = jnp.zeros((R, params.reduced_dof), dtype=params.dtype)
    for a in range(3):
        reg = cls.face_region[a]
        red = (cls.face_labels[a] == REDUCED) & (reg >= 0)
        s = jnp.where(red, s_faces[a], 0.0)
        mono = _face_monomials_general(cls, com, a, params)
        vals = jnp.stack([s * m for m in mono], axis=0)  # [K, grid]
        mu = segment_sum_vec(vals, jnp.where(red, reg, -1), R)  # [R, K]
        A = jnp.asarray(monomial_matrix(a, params.basis), params.dtype)
        y = y + mu @ A.T
    return y


def expand_J(grid: Grid, cls: Classification, com, w, params: SolverParams):
    """u_face = basis(face) . w[region] on reduced faces == J^T w rows.

    General path: v = w A per region ([R, K]), then K scalar per-face
    gathers u = sum_k v_k[reg] * m_k — instead of a 26-wide gather of w
    plus the [26, grid] basis tensor."""
    if _use_tiled(params):
        return expand_J_tiled(grid, cls, com, w, params)
    from .basis import monomial_matrix

    out = []
    for a in range(3):
        reg = cls.face_region[a]
        red = (cls.face_labels[a] == REDUCED) & (reg >= 0)
        safe = jnp.clip(reg, 0, w.shape[0] - 1)
        A = jnp.asarray(monomial_matrix(a, params.basis), params.dtype)
        v = w @ A  # [R, K]
        mono = _face_monomials_general(cls, com, a, params)
        u = sum(v[:, k][safe] * mono[k] for k in range(len(mono)))
        out.append(jnp.where(red, u, 0.0))
    return out
