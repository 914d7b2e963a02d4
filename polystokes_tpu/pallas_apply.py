"""Fused Pallas TPU kernels for the pressure-stress Schur apply — the CG
hot kernel (reference: ApplyPressureStressMatrix::applyMatrixVectorProducts,
lib/include/ApplyPressureStressMatrix.h:102-179).

The XLA path (operators.forward_face_values / transpose_from_faces) runs
as several stencil kernels that re-read the gated weight fields; here the
whole grid branch — forward stencil, -dt*McInv scaling, transpose, and the
uInv mass terms — fuses into ONE kernel that reads every array once.

Packed layout
-------------
All 7 solve fields and all coefficient fields are stored channel-stacked
as [C, nx, ny, nz] so every channel is exactly lane-aligned at n=128/256
(face/edge arrays natively carry +1 extents that would pad 129 -> 256
lanes).  Natural-index mapping:

  * p, tc (cells)      slot (i,j,k) = cell (i,j,k)
  * face family a      natural face f (f_a in [1..n]) -> slot f - e_a
  * edge family e      natural edge g (g_p, g_q in [1..n]) -> slot g-e_p-e_q

i.e. the index-0 planes of face/edge arrays are dropped.  This is exact
whenever no face/edge on the domain boundary is active — true for any
scene whose liquid does not touch the domain box (all builders; the
`boundary_active` stat in step() counts violations).  In slot space the
stencils become (t = 3 - a - e):

  s_a[i]    = ffw_a[i] * ( g_a[i+e_a] - g_a[i] + sum_e (h_e[i-e_t] - h_e[i]) )
  p[c]     += clw[c] * sum_a (w_a[c-e_a] - w_a[c])
  tc_a[c]  += -clw[c] * (w_a[c-e_a] - w_a[c]) - uinv2_c[c] * x_tc_a[c]
  te_e[j]  += elw_e[j] * sum_a (w_a[j+e_t] - w_a[j]) - uinv2_e[j] * x_te_e[j]

with g_a = clw*(p - tc_a), h_e = elw_e*x_te_e, and
w_a = ffw_a * (-dtmcinv_a * s_a): the transpose carries the SAME ffw face
factor as the forward (G^T vs G) — at solid-cut faces (ffw < 1) dropping
it makes the operator wrong and asymmetric (transpose_from_faces,
operators.py:260 multiplies by ffw again).

Blocks tile (x, y) with a 2-cell halo (host-side zero pad); z stays whole
(full lane dimension).  In-kernel +-1 shifts along x/y are rolls whose
wrap garbage stays outside the 2-deep interior; z shifts are lane rolls
with explicit boundary zeroing.

Coefficient channels (pre-scaled at assembly):
  0 clw_s | 1-3 elw_s | 4-6 ffw | 7-9 dt*mc_inv | 10 0.5*uinv_c | 11-13 0.5*uinv_e
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid import EDGE_OFFSET_AXES
from .operators import PTau

# halos: shifts reach depth 2, but Mosaic requires the second-to-last
# block dimension to be divisible by 8, so the y halo is padded to 4
HALO_X = 2
HALO_Y = 4


def _subgrid(T: int, bx: int, by: int):
    """(xpb, ypb): grid sub-blocks per cube along x / y (1 when a block
    covers >= 1 whole cube on that axis).  When the tile exceeds the block
    on an axis the moments/expand kernels process PARTIAL cubes: the
    reduced kernels run on a 3-D grid (cube_i, cube_j, sub) whose
    innermost dimension enumerates the xpb*ypb sub-blocks of one cube
    column, and the moment partials accumulate across those consecutive
    visits — the TPU grid is sequential, so the revisited VMEM output
    block persists between them.  This is what lets tile 32/64 cubes run
    through 16x8 blocks (the reference's best published tile is 64,
    results/figures/Timings_ArmadilloDrop.png)."""
    return max(T // bx, 1), max(T // by, 1)

# coefficient channel indices
C_CLW = 0
C_ELW = 1  # +e
C_FFW = 4  # +a
C_DTMCINV = 7  # +a
C_UINV2C = 10
C_UINV2E = 11  # +e
C_RED = 14  # +a: reduced-face masks (float 0/1)
N_COEFF = 17


def _t_axis(a: int, e: int) -> int:
    return 3 - a - e


# ---------------------------------------------------------------------------
# Packing (XLA-side)
# ---------------------------------------------------------------------------

def _face_to_slot(arr, a):
    """Drop natural face index 0 along a (assumed inactive)."""
    sl = [slice(None)] * 3
    sl[a] = slice(1, None)
    return arr[tuple(sl)]


def _edge_to_slot(arr, e):
    p, q = EDGE_OFFSET_AXES[e]
    sl = [slice(None)] * 3
    sl[p] = slice(1, None)
    sl[q] = slice(1, None)
    return arr[tuple(sl)]


def _slot_to_face(arr, a):
    pad = [(0, 0)] * 3
    pad[a] = (1, 0)
    return jnp.pad(arr, pad)


def _slot_to_edge(arr, e):
    p, q = EDGE_OFFSET_AXES[e]
    pad = [(0, 0)] * 3
    pad[p] = (1, 0)
    pad[q] = (1, 0)
    return jnp.pad(arr, pad)


def pack_ptau(x: PTau) -> jnp.ndarray:
    """PTau -> [7, nx, ny, nz]."""
    chans = [x.p] + list(x.tc) + [_edge_to_slot(x.te[e], e) for e in range(3)]
    return jnp.stack(chans, axis=0)


def unpack_ptau(packed: jnp.ndarray) -> PTau:
    return PTau(
        p=packed[0],
        tc=tuple(packed[1 + a] for a in range(3)),
        te=tuple(_slot_to_edge(packed[4 + e], e) for e in range(3)),
    )


def pack_coeffs(asm, cls=None, storage_dtype=None, pad=True) -> jnp.ndarray:
    """Assembled -> [17, nx+2Hx, ny+2Hy, nz] pre-scaled, pre-halo-padded
    coefficient stack (built once per step, reused every iteration).  The
    last 3 channels are the reduced-face masks — OMITTED when cls is None
    (uniform solves get a [14, ...] stack: the uniform kernels never read
    C_RED, and dropping the dead channels saves 3 halo-window sweeps per
    iteration).  Kernel wrappers size their coefficient window from
    coeffs.shape[0], so both stacks flow through the same code.
    `pad=False` returns the unpadded stack (the sharded path pads
    per-shard with a real neighbor halo, parallel/shard_apply).

    `storage_dtype=jnp.bfloat16` halves the stack's per-iteration HBM
    traffic.  This keeps the operator exactly symmetric (the forward and
    transpose sides read the SAME rounded values) and SPD (gated weights
    stay nonnegative); it perturbs the operator by the bf16 rounding of
    each coefficient (~0.4% relative), which shifts iteration counts
    slightly but not the solved system's tolerance semantics — kernel
    arithmetic stays f32 (jnp promotes bf16*f32)."""
    from .classify import REDUCED

    chans = [asm.clw_s]
    chans += [_edge_to_slot(asm.elw_s[e], e) for e in range(3)]
    chans += [_face_to_slot(asm.ffw[a], a) for a in range(3)]
    chans += [_face_to_slot(asm.dt * asm.mc_inv[a], a) for a in range(3)]
    chans += [0.5 * asm.uinv_c]
    chans += [_edge_to_slot(0.5 * asm.uinv_e[e], e) for e in range(3)]
    dtype = asm.clw_s.dtype
    if cls is not None:
        for a in range(3):
            red = (cls.face_labels[a] == REDUCED) & (cls.face_region[a] >= 0)
            chans.append(_face_to_slot(red.astype(dtype), a))
    stack = jnp.stack(chans, axis=0)
    if storage_dtype is not None:
        stack = stack.astype(storage_dtype)
    return _pad_halo(stack) if pad else stack


def _pad_halo(x):
    """Zero halo along x and y (axes -3, -2)."""
    pad = [(0, 0)] * x.ndim
    pad[-3] = (HALO_X, HALO_X)
    pad[-2] = (HALO_Y, HALO_Y)
    return jnp.pad(x, pad)


# ---------------------------------------------------------------------------
# In-kernel shift helpers
# ---------------------------------------------------------------------------

def _roll(v, d, axis):
    """out[i] = v[i + d] (circular); pltpu.roll wants non-negative shifts."""
    return pltpu.roll(v, (-d) % v.shape[axis], axis=axis)


def _shift_x(v, d):
    """v at (x + d): roll along axis 0.  Wrap garbage stays in the halo."""
    return _roll(v, d, 0)


def _shift_y(v, d):
    return _roll(v, d, 1)


def _shift_z(v, d):
    """v at (z + d) with zero fill at the real domain boundary."""
    nz = v.shape[2]
    rolled = _roll(v, d, 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, dimension=2)
    if d > 0:
        return jnp.where(lane < nz - d, rolled, 0.0)
    return jnp.where(lane >= -d, rolled, 0.0)


_SHIFTS = (_shift_x, _shift_y, _shift_z)


def _shift(v, axis, d):
    return _SHIFTS[axis](v, d)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _forward_s(xr, cr):
    """s_a (list of 3) on the extended block from x/coeff block refs."""
    p = xr[0]
    h = [cr[C_ELW + e] * xr[4 + e] for e in range(3)]
    s = []
    for a in range(3):
        g = cr[C_CLW] * (p - xr[1 + a])
        v = _shift(g, a, 1) - g
        for e in range(3):
            if e == a:
                continue
            t = _t_axis(a, e)
            v = v + _shift(h[e], t, -1) - h[e]
        s.append(cr[C_FFW + a] * v)
    return s


def _transpose_out(xr, cr, w, out_ref, extra=None):
    """out channels from face values w (slot space), incl. the uInv mass
    terms; writes the interior [HALO:-HALO, HALO:-HALO].  The transpose
    side carries its own ffw factor (G^T has the same face weight as G —
    transpose_from_faces multiplies f by ffw again, operators.py:260);
    without it the operator is wrong (and asymmetric) at solid-cut faces."""
    itr = (slice(HALO_X, w[0].shape[0] - HALO_X), slice(HALO_Y, w[0].shape[1] - HALO_Y), slice(None))
    w = [cr[C_FFW + a] * w[a] for a in range(3)]
    dsum = []
    p_acc = None
    for a in range(3):
        d = _shift(w[a], a, -1) - w[a]
        dsum.append(d)
        p_acc = d if p_acc is None else p_acc + d
    clw = cr[C_CLW]
    out_ref[0] = (clw * p_acc)[itr]
    for a in range(3):
        out_ref[1 + a] = (-clw * dsum[a] - cr[C_UINV2C] * xr[1 + a])[itr]
    for e in range(3):
        p_ax, q_ax = EDGE_OFFSET_AXES[e]
        acc = None
        for a in (p_ax, q_ax):
            t = _t_axis(a, e)
            v = _shift(w[a], t, 1) - w[a]
            acc = v if acc is None else acc + v
        out_ref[4 + e] = (cr[C_ELW + e] * acc - cr[C_UINV2E + e] * xr[4 + e])[itr]


def _apply_kernel_uniform(xr, cr, out_ref):
    s = _forward_s(xr, cr)
    w = [-cr[C_DTMCINV + a] * s[a] for a in range(3)]
    _transpose_out(xr, cr, w, out_ref)


def _forward_kernel(xr, cr, s_ref):
    s = _forward_s(xr, cr)
    itr = (slice(HALO_X, s[0].shape[0] - HALO_X), slice(HALO_Y, s[0].shape[1] - HALO_Y), slice(None))
    for a in range(3):
        s_ref[a] = s[a][itr]


def _combine_kernel(xr, cr, sr, ur, out_ref):
    """fv = -dtmcinv*s - u_red; transpose + mass terms."""
    w = [-cr[C_DTMCINV + a] * sr[a] - ur[a] for a in range(3)]
    _transpose_out(xr, cr, w, out_ref)


def _apply_reduced_kernel(xr, cr, ur, out_ref):
    """The full reduced apply given precomputed u = J^T BInv J x face
    values: recomputes s in-block (cheaper than materializing it to HBM),
    fv = -dtmcinv*s - u, transpose + mass terms."""
    s = _forward_s(xr, cr)
    w = [-cr[C_DTMCINV + a] * s[a] - ur[a] for a in range(3)]
    _transpose_out(xr, cr, w, out_ref)


def _make_moments_kernel(basis, K, T, bx, by, nz, mono_fn):
    """Kernel: per-cube monomial moments of the reduced-masked s (see
    _mom_block).  Outputs mom[max(bx//T,1), max(by//T,1), 3K, cs2]; when
    the tile exceeds the block the output block is revisited by the
    xpb*ypb consecutive sub-grid steps that each add a partial-cube
    contribution."""

    def kernel(xr, cr, mom_ref):
        s = _forward_s(xr, cr)
        _mom_block(s, cr, K, T, bx, by, nz, mono_fn, mom_ref)

    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _make_expand_kernel(K, T, bx, by, nz, mono_fn):
    """Kernel: evaluate the region polynomials on reduced faces,
    u_a = chi_a * sum_k v[cube, aK+k] * m_k(p - cube_origin), with v given
    in the cube-origin monomial basis ([cs0, cs1, 3K, cs2]).  The per-z-
    cube coefficients expand to full-z rows via one MXU matmul against the
    z-cube indicator."""
    xpb, ypb = _subgrid(T, bx, by)
    spb = xpb * ypb
    wx, wy = min(T, bx), min(T, by)
    cpbx, cpby = max(bx // T, 1), max(by // T, 1)
    cs2 = nz // T

    def kernel(red_ref, v_ref, u_ref):
        # compute dtype comes from the coefficients: the red mask may be
        # stored bf16 (exact 0/1 values) to halve its read traffic
        dtype = v_ref.dtype
        sub = pl.program_id(2) if spb > 1 else None
        zi = jax.lax.broadcasted_iota(jnp.int32, (cs2, nz), 1)
        ci = jax.lax.broadcasted_iota(jnp.int32, (cs2, nz), 0)
        Zt = (zi // T == ci).astype(dtype)  # (cs2, nz)
        lz3 = jax.lax.broadcasted_iota(jnp.int32, (wx, wy, nz), 2)
        pz_local = (lz3 - T * (lz3 // T)).astype(dtype)
        lx3 = jax.lax.broadcasted_iota(jnp.int32, (wx, wy, nz), 0).astype(dtype)
        ly3 = jax.lax.broadcasted_iota(jnp.int32, (wx, wy, nz), 1).astype(dtype)
        if xpb > 1:
            lx3 = lx3 + ((sub // ypb) * bx).astype(dtype)
        if ypb > 1:
            ly3 = ly3 + ((sub % ypb) * by).astype(dtype)
        for a in range(3):
            for lc in range(cpbx):
                for mc in range(cpby):
                    vrow = v_ref[lc, mc, a * K : (a + 1) * K, :]  # (K, cs2)
                    vfull = jnp.dot(vrow, Zt, preferred_element_type=dtype, precision="highest")  # (K, nz)
                    pos = [lx3, ly3, pz_local]
                    pos[a] = pos[a] + 0.5
                    mono = mono_fn(pos[0], pos[1], pos[2])
                    acc = None
                    for k in range(K):
                        term = mono[k] * vfull[k][None, None, :]
                        acc = term if acc is None else acc + term
                    xsl = slice(lc * wx, (lc + 1) * wx)
                    ysl = slice(mc * wy, (mc + 1) * wy)
                    chi = red_ref[a, xsl, ysl, :]
                    u_ref[a, xsl, ysl, :] = acc * chi

    return kernel


def expand_packed(v_origin, red_packed, res, T, basis, interpret=None):
    """u faces [3, nx, ny, nz] from cube-origin-basis coefficients
    v_origin [cs0, cs1, 3K, cs2] — the fused replacement for
    expand_J_tiled's K block_broadcast passes per axis.  `red_packed`
    [3, nx, ny, nz] is the unpadded reduced-face mask (a halo-offset
    Element window start would break Mosaic's sublane alignment)."""
    from .basis import monomials_xyz, n_monomials

    interpret = _auto_interpret(interpret)
    nx, ny, nz = res
    bx, by = _blocks_for(res)
    xpb, ypb = _subgrid(T, bx, by)
    K = n_monomials(basis)
    cs = tuple(-(-n // T) for n in res)

    def mono_fn(ox, oy, oz):
        return monomials_xyz(ox, oy, oz, basis)

    kernel = _make_expand_kernel(K, T, bx, by, nz, mono_fn)

    def blk_spec(c):
        return pl.BlockSpec(
            (c, bx, by, nz),
            lambda i, j, s: (0, i * xpb + s // ypb, j * ypb + s % ypb, 0),
            memory_space=None if interpret else pltpu.VMEM,
        )

    v_spec = _mom_spec(T, bx, by, K, cs, interpret)
    return pl.pallas_call(
        kernel,
        grid=(nx // (bx * xpb), ny // (by * ypb), xpb * ypb),
        in_specs=[blk_spec(3), v_spec],
        out_specs=blk_spec(3),
        out_shape=jax.ShapeDtypeStruct((3, nx, ny, nz), v_origin.dtype),
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(red_packed, v_origin)


def _pick_block(n):
    for b in (16, 8):
        if n % b == 0:
            return b
    raise ValueError(f"pallas path needs x/y resolution divisible by 8 (got {n})")


def _blocks_for(res):
    """(bx, by) with a VMEM budget guard: the ~27-channel window set
    (bx+2Hx, by+2Hy, nz) must stay under the 16MB scoped-vmem limit.
    At nz=256 only y halves (16x8 windows = ~9MB; keeping bx=16 lets
    tile-16 cubes stay whole along x — the partial-cube accumulation in
    _mom_block handles y); past nz=256 x halves too."""
    nx, ny, nz = res
    bx, by = _pick_block(nx), _pick_block(ny)
    if nz > 128 and by == 16 and ny % 8 == 0:
        by = 8
    if nz > 256 and bx == 16 and nx % 8 == 0:
        bx = 8
    return bx, by


def _mom_spec(T, bx, by, K, cs, interpret):
    """BlockSpec for the [cs0, cs1, 3K, cs2] moment/coefficient arrays:
    block (max(bx//T, 1), max(by//T, 1), 3K, cs2) at cube-column index
    (i, j) of the 3-D sub-grid; when the tile exceeds the block the spb
    consecutive sub-grid steps of one cube column map to the SAME block
    (partial-cube accumulation, _mom_block)."""
    cpbx, cpby = max(bx // T, 1), max(by // T, 1)

    def index_map(i, j, s):
        return (i, j, 0, 0)

    return pl.BlockSpec(
        (cpbx, cpby, 3 * K, cs[2]), index_map,
        memory_space=None if interpret else pltpu.VMEM,
    )


def _grid_and_specs(res: Tuple[int, int, int], chans_in, interpret: bool, T=None):
    """Overlapping halo windows via all-Element BlockSpecs: inputs are
    pre-padded by HALO along x/y, and the block at x/y block index
    (bi, bj) reads the element window [bi*bx, bi*bx + bx + 2*HALO) of the
    padded array.

    The grid is 3-D (i, j, s): (i, j) walk cube columns of footprint
    (bx*xpb, by*ypb) and the innermost s enumerates the xpb*ypb
    sub-blocks of that column, so all sub-blocks of one cube are
    consecutive grid steps and a cube-indexed output block can accumulate
    across them (the TPU grid is sequential).  Without a tile (T=None) or
    when blocks already cover whole cubes, spb == 1 and the grid reduces
    to the plain block walk."""
    nx, ny, nz = res
    bx, by = _blocks_for(res)
    xpb, ypb = _subgrid(T, bx, by) if T is not None else (1, 1)
    spb = xpb * ypb
    grid = (nx // (bx * xpb), ny // (by * ypb), spb)

    def in_spec(c):
        return pl.BlockSpec(
            (pl.Element(c), pl.Element(bx + 2 * HALO_X), pl.Element(by + 2 * HALO_Y), pl.Element(nz)),
            lambda i, j, s: (0, (i * xpb + s // ypb) * bx, (j * ypb + s % ypb) * by, 0),
            memory_space=None if interpret else pltpu.VMEM,
        )

    def out_spec(c):
        return pl.BlockSpec(
            (c, bx, by, nz), lambda i, j, s: (0, i * xpb + s // ypb, j * ypb + s % ypb, 0),
            memory_space=None if interpret else pltpu.VMEM,
        )

    return grid, [in_spec(c) for c in chans_in], out_spec


def _block_ij(T, bx, by):
    """(bi, bj): the x/y block index of the current 3-D-grid step (the
    flattened position pap partials are recorded at)."""
    xpb, ypb = _subgrid(T, bx, by) if T is not None else (1, 1)
    i, j = pl.program_id(0), pl.program_id(1)
    if xpb * ypb == 1:
        return i, j
    s = pl.program_id(2)
    return i * xpb + s // ypb, j * ypb + s % ypb


def _auto_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _vmem_kwargs(interpret):
    """Raise the per-kernel scoped-VMEM limit: at nz=256 the 17-channel
    coefficient window [17, bx+2Hx, by+2Hy, nz] alone is ~5.6MB and the
    double-buffered window set exceeds Mosaic's 16MB default (v5e has
    128MB physical VMEM, so ~20MB of windows is comfortably legal)."""
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)}


def apply_uniform_packed(xp, coeffs_padded, res, interpret=None, prepadded=False):
    """out = (grid part of A) x, packed [7,...] -> [7,...], one fused kernel.
    `prepadded=True` means xp already carries the halo (the sharded path
    pads per-shard with real neighbor data)."""
    interpret = _auto_interpret(interpret)
    nx, ny, nz = res
    grid, (xspec, cspec), out_spec = _grid_and_specs(res, (7, coeffs_padded.shape[0]), interpret)
    return pl.pallas_call(
        _apply_kernel_uniform,
        grid=grid,
        in_specs=[xspec, cspec],
        out_specs=out_spec(7),
        out_shape=jax.ShapeDtypeStruct((7, nx, ny, nz), xp.dtype),
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(xp if prepadded else _pad_halo(xp), coeffs_padded)


def forward_s_packed(xp, coeffs_padded, res, interpret=None):
    """s = [G Dt] x on all faces (slot space), packed [3,...]."""
    interpret = _auto_interpret(interpret)
    nx, ny, nz = res
    grid, (xspec, cspec), out_spec = _grid_and_specs(res, (7, coeffs_padded.shape[0]), interpret)
    return pl.pallas_call(
        _forward_kernel,
        grid=grid,
        in_specs=[xspec, cspec],
        out_specs=out_spec(3),
        out_shape=jax.ShapeDtypeStruct((3, nx, ny, nz), xp.dtype),
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(_pad_halo(xp), coeffs_padded)


def combine_packed(xp, coeffs_padded, sp, up, res, interpret=None):
    """out = [G Dt]^T (-dt McInv s - u_red) - mass terms."""
    interpret = _auto_interpret(interpret)
    nx, ny, nz = res
    grid, (xspec, cspec, sspec, uspec), out_spec = _grid_and_specs(res, (7, coeffs_padded.shape[0], 3, 3), interpret)
    return pl.pallas_call(
        _combine_kernel,
        grid=grid,
        in_specs=[xspec, cspec, sspec, uspec],
        out_specs=out_spec(7),
        out_shape=jax.ShapeDtypeStruct((7, nx, ny, nz), xp.dtype),
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(_pad_halo(xp), coeffs_padded, _pad_halo(sp), _pad_halo(up))


def apply_reduced_packed(xp_padded, coeffs_padded, up, res, interpret=None, up_prepadded=False):
    """Fused reduced apply from pre-padded x and the XLA-expanded u.
    `up_prepadded=True` means up already carries the halo (sharded path:
    real neighbor data — reduced faces can sit 1 slot from a cube/shard
    boundary in the untiled cube-regions mode)."""
    interpret = _auto_interpret(interpret)
    nx, ny, nz = res
    grid, (xspec, cspec, uspec), out_spec = _grid_and_specs(res, (7, coeffs_padded.shape[0], 3), interpret)
    return pl.pallas_call(
        _apply_reduced_kernel,
        grid=grid,
        in_specs=[xspec, cspec, uspec],
        out_specs=out_spec(7),
        out_shape=jax.ShapeDtypeStruct((7, nx, ny, nz), xp_padded.dtype),
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(xp_padded, coeffs_padded, up if up_prepadded else _pad_halo(up))


def _transpose_contrib(cr, w):
    """The 7 output contributions of transposing face values w (no mass
    terms, no x): the u-branch of the split apply.  Like _transpose_out,
    the transpose carries its own ffw face factor."""
    dsum = []
    p_acc = None
    w = [cr[C_FFW + a] * w[a] for a in range(3)]
    for a in range(3):
        d = _shift(w[a], a, -1) - w[a]
        dsum.append(d)
        p_acc = d if p_acc is None else p_acc + d
    clw = cr[C_CLW]
    out = [clw * p_acc]
    for a in range(3):
        out.append(-clw * dsum[a])
    for e in range(3):
        p_ax, q_ax = EDGE_OFFSET_AXES[e]
        acc = None
        for a in (p_ax, q_ax):
            t = _t_axis(a, e)
            v = _shift(w[a], t, 1) - w[a]
            acc = v if acc is None else acc + v
        out.append(cr[C_ELW + e] * acc)
    return out


def _mom_block(s, cr, K, T, bx, by, nz, mono_fn, mom_ref):
    """Per-cube monomial moments of the reduced-masked s, taken about each
    cube's ORIGIN (lower corner) — positions stay in [0, T], so fp32 is
    well-conditioned and no COM data enters the kernel; the XLA side
    shifts moments to COM-relative with monomial_shift_matrix.  Shared
    body of the moments kernel and the fused grid-apply kernel.

    Mosaic-friendly reductions: sublane sums over (x, y) to a (K, nz) row
    block, then one MXU matmul against the 0/1 z-cube indicator matrix
    gives all per-z-cube sums at once.

    When the block is smaller than the tile on x or y each grid block
    covers a PARTIAL slice of the cube; the xpb*ypb consecutive
    innermost-grid (program_id(2)) blocks that share one output cube
    block accumulate into it (the revisited VMEM output block persists
    between sequential grid steps: the first sub-block writes, the rest
    add)."""
    dtype = s[0].dtype
    xpb, ypb = _subgrid(T, bx, by)
    spb = xpb * ypb
    wx, wy = min(T, bx), min(T, by)
    cpbx, cpby = max(bx // T, 1), max(by // T, 1)
    sub = pl.program_id(2) if spb > 1 else None
    zi = jax.lax.broadcasted_iota(jnp.int32, (nz, nz // T), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (nz, nz // T), 1)
    Z = (zi // T == ci).astype(dtype)
    lz3 = jax.lax.broadcasted_iota(jnp.int32, (wx, wy, nz), 2)
    pz_local = (lz3 - T * (lz3 // T)).astype(dtype)
    lx3 = jax.lax.broadcasted_iota(jnp.int32, (wx, wy, nz), 0).astype(dtype)
    ly3 = jax.lax.broadcasted_iota(jnp.int32, (wx, wy, nz), 1).astype(dtype)
    if xpb > 1:
        lx3 = lx3 + ((sub // ypb) * bx).astype(dtype)
    if ypb > 1:
        ly3 = ly3 + ((sub % ypb) * by).astype(dtype)
    for a in range(3):
        sm = s[a] * cr[C_RED + a]
        for lc in range(cpbx):
            for mc in range(cpby):
                blk = sm[
                    HALO_X + lc * wx : HALO_X + (lc + 1) * wx,
                    HALO_Y + mc * wy : HALO_Y + (mc + 1) * wy,
                    :,
                ]
                pos = [lx3, ly3, pz_local]
                pos[a] = pos[a] + 0.5
                mono = mono_fn(pos[0], pos[1], pos[2])
                rows = jnp.stack(
                    [jnp.sum(blk * mono[k], axis=(0, 1)) for k in range(K)], axis=0
                )
                val = jnp.dot(rows, Z, preferred_element_type=dtype, precision="highest")
                idx = (lc, mc, slice(a * K, (a + 1) * K), slice(None))
                if spb == 1:
                    mom_ref[idx] = val
                else:
                    @pl.when(sub == 0)
                    def _init(val=val, idx=idx):
                        mom_ref[idx] = val

                    @pl.when(sub != 0)
                    def _acc(val=val, idx=idx):
                        mom_ref[idx] = mom_ref[idx] + val


def _make_grid_mom_kernel(K, T, bx, by, nz, mono_fn):
    """Fused kernel: the full grid branch of the apply (forward + transpose
    + mass terms), the per-cube moments of the reduced-masked s, and the
    block-partial <x, out_grid> (for the CG pAp dot) — one read of the
    x/coefficient windows instead of the former two passes."""

    def kernel(xr, cr, out_ref, mom_ref, pap_ref):
        s = _forward_s(xr, cr)
        w = [-cr[C_DTMCINV + a] * s[a] for a in range(3)]
        _transpose_out(xr, cr, w, out_ref)
        _mom_block(s, cr, K, T, bx, by, nz, mono_fn, mom_ref)
        itr = (slice(HALO_X, s[0].shape[0] - HALO_X), slice(HALO_Y, s[0].shape[1] - HALO_Y), slice(None))
        acc = None
        for c in range(7):
            t = jnp.sum(xr[c][itr] * out_ref[c])
            acc = t if acc is None else acc + t
        bi, bj = _block_ij(T, bx, by)
        pap_ref[bi, bj] = acc

    return kernel


def _grid_uniform_pap_kernel(xr, cr, out_ref, pap_ref):
    """Uniform apply + block-partial <x, out>."""
    s = _forward_s(xr, cr)
    w = [-cr[C_DTMCINV + a] * s[a] for a in range(3)]
    _transpose_out(xr, cr, w, out_ref)
    itr = (slice(HALO_X, s[0].shape[0] - HALO_X), slice(HALO_Y, s[0].shape[1] - HALO_Y), slice(None))
    acc = None
    for c in range(7):
        t = jnp.sum(xr[c][itr] * out_ref[c])
        acc = t if acc is None else acc + t
    pap_ref[pl.program_id(0), pl.program_id(1)] = acc


def _finish_kernel(c7r, gr, ur, out_ref):
    """out = out_grid + [G Dt]^T(-u).  gr is a plain interior block; c7r /
    ur are halo windows of the padded coeff (first 7 channels: clw, elw,
    ffw — the transpose needs ffw) and u stacks.  The u-branch pAp contribution is NOT computed here: it equals
    -sum(mom * v) in the per-cube coefficient space (<x, F^T(-chi J v)> =
    -<chi F x, J v> = -sum_k mom_k v_k, same cube-origin basis on both
    sides), which the caller evaluates on the tiny moment arrays."""
    w = [-ur[a] for a in range(3)]
    contrib = _transpose_contrib(c7r, w)
    itr = (slice(HALO_X, w[0].shape[0] - HALO_X), slice(HALO_Y, w[0].shape[1] - HALO_Y), slice(None))
    for c in range(7):
        out_ref[c] = gr[c] + contrib[c][itr]


def _transpose_u_kernel(c7r, ur, out_ref):
    """out = [G Dt]^T u (positive sign, no mass terms, no grid branch):
    the transpose leg of the REGION_ARROW preconditioner's Woodbury
    correction (solver.make_preconditioner_packed)."""
    w = [ur[a] for a in range(3)]
    contrib = _transpose_contrib(c7r, w)
    itr = (slice(HALO_X, w[0].shape[0] - HALO_X), slice(HALO_Y, w[0].shape[1] - HALO_Y), slice(None))
    for c in range(7):
        out_ref[c] = contrib[c][itr]


def transpose_u_packed(coeffs_padded, up, res, interpret=None):
    """[G Dt]^T applied to face values up (slot space) -> packed [7,...]."""
    interpret = _auto_interpret(interpret)
    nx, ny, nz = res
    bx, by = _blocks_for(res)
    grid = (nx // bx, ny // by)

    def halo_spec(c):
        return pl.BlockSpec(
            (pl.Element(c), pl.Element(bx + 2 * HALO_X), pl.Element(by + 2 * HALO_Y), pl.Element(nz)),
            lambda i, j: (0, i * bx, j * by, 0),
            memory_space=None if interpret else pltpu.VMEM,
        )

    def plain_spec(c):
        return pl.BlockSpec(
            (c, bx, by, nz), lambda i, j: (0, i, j, 0),
            memory_space=None if interpret else pltpu.VMEM,
        )

    return pl.pallas_call(
        _transpose_u_kernel,
        grid=grid,
        in_specs=[halo_spec(7), halo_spec(3)],
        out_specs=plain_spec(7),
        out_shape=jax.ShapeDtypeStruct((7, nx, ny, nz), up.dtype),
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(coeffs_padded, _pad_halo(up))


def _pap_spec(interpret, nbx, nby):
    """Whole-array SMEM block written at [program_id] — Mosaic rejects
    sub-(8, 128) blocked specs, but a full-array scalar-memory block with
    one element written per grid step lowers fine (the TPU grid is
    sequential, so the buffer persists across steps)."""
    return pl.BlockSpec(
        (nbx, nby), lambda *g: (0, 0),
        memory_space=None if interpret else pltpu.SMEM,
    )


def grid_mom_pap_packed(xp_padded, coeffs_padded, res, T, basis, interpret=None):
    """(out_grid, mom, pap_partials): the fused first pass of the reduced
    apply.  out_grid is the complete grid branch (incl. mass terms); mom
    are cube-origin moments of the reduced-masked s; pap_partials[i, j]
    sum to <x, out_grid x>."""
    from .basis import monomials_xyz, n_monomials

    interpret = _auto_interpret(interpret)
    nx, ny, nz = res
    bx, by = _blocks_for(res)
    K = n_monomials(basis)
    cs = tuple(-(-n // T) for n in res)

    def mono_fn(ox, oy, oz):
        return monomials_xyz(ox, oy, oz, basis)

    kernel = _make_grid_mom_kernel(K, T, bx, by, nz, mono_fn)
    grid, (xspec, cspec), out_spec = _grid_and_specs(res, (7, coeffs_padded.shape[0]), interpret, T=T)
    mom_spec = _mom_spec(T, bx, by, K, cs, interpret)
    dtype = xp_padded.dtype
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[xspec, cspec],
        out_specs=[out_spec(7), mom_spec, _pap_spec(interpret, nx // bx, ny // by)],
        out_shape=[
            jax.ShapeDtypeStruct((7, nx, ny, nz), dtype),
            jax.ShapeDtypeStruct((cs[0], cs[1], 3 * K, cs[2]), dtype),
            jax.ShapeDtypeStruct((nx // bx, ny // by), dtype),
        ],
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(xp_padded, coeffs_padded)


def apply_uniform_pap_packed(xp, coeffs_padded, res, interpret=None):
    """(out, pap_partials) for the uniform apply."""
    interpret = _auto_interpret(interpret)
    nx, ny, nz = res
    bx, by = _blocks_for(res)
    grid, (xspec, cspec), out_spec = _grid_and_specs(res, (7, coeffs_padded.shape[0]), interpret)
    return pl.pallas_call(
        _grid_uniform_pap_kernel,
        grid=grid,
        in_specs=[xspec, cspec],
        out_specs=[out_spec(7), _pap_spec(interpret, nx // bx, ny // by)],
        out_shape=[
            jax.ShapeDtypeStruct((7, nx, ny, nz), xp.dtype),
            jax.ShapeDtypeStruct((nx // bx, ny // by), xp.dtype),
        ],
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(_pad_halo(xp), coeffs_padded)


def finish_packed(coeffs_padded, out_grid, up, res, interpret=None):
    """out = out_grid + [G Dt]^T(-u) — the reduced-branch transpose.  The
    pAp contribution of this branch is -sum(mom * v) (see _finish_kernel),
    evaluated by the caller on the tiny per-cube arrays, so this pass no
    longer reads x."""
    interpret = _auto_interpret(interpret)
    nx, ny, nz = res
    bx, by = _blocks_for(res)
    grid = (nx // bx, ny // by)

    def halo_spec(c):
        return pl.BlockSpec(
            (pl.Element(c), pl.Element(bx + 2 * HALO_X), pl.Element(by + 2 * HALO_Y), pl.Element(nz)),
            lambda i, j: (0, i * bx, j * by, 0),
            memory_space=None if interpret else pltpu.VMEM,
        )

    def plain_spec(c):
        return pl.BlockSpec(
            (c, bx, by, nz), lambda i, j: (0, i, j, 0),
            memory_space=None if interpret else pltpu.VMEM,
        )

    return pl.pallas_call(
        _finish_kernel,
        grid=grid,
        in_specs=[halo_spec(7), plain_spec(7), halo_spec(3)],
        out_specs=plain_spec(7),
        out_shape=jax.ShapeDtypeStruct((7, nx, ny, nz), out_grid.dtype),
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(coeffs_padded, out_grid, _pad_halo(up))


def _make_finish_update_kernel(kind):
    """Fused reduced-branch finish + CG vector update: computes
    ap = out_grid + [G Dt]^T(-u) in-block (Ap is never materialized to
    HBM), then x' = x + a p, r' = r - a ap, z = M^-1 r' and the three loop
    dots — one pass replacing the former finish + cg_update pair."""

    def kernel(*refs):
        if kind == "none":
            al, c4r, gr, ur, xr, rr_, pr, xo, ro, zo, part = refs
            fr = None
        else:
            al, c4r, gr, ur, xr, rr_, pr, fr, xo, ro, zo, part = refs
        a = al[0]
        w = [-ur[ax] for ax in range(3)]
        contrib = _transpose_contrib(c4r, w)
        itr = (slice(HALO_X, w[0].shape[0] - HALO_X), slice(HALO_Y, w[0].shape[1] - HALO_Y), slice(None))
        xs = [xr[c] + a * pr[c] for c in range(7)]
        rs = [rr_[c] - a * (gr[c] + contrib[c][itr]) for c in range(7)]
        if kind == "arrow":
            z_p = (rs[0] + sum(fr[_ARROW_KD + i] * rs[1 + i] for i in range(3))) * fr[_ARROW_SCHUR]
            zs = [z_p]
            zs += [(rs[1 + i] + fr[_ARROW_K + i] * z_p) * fr[_ARROW_INVD + i] for i in range(3)]
            zs += [rs[4 + e] * fr[_ARROW_TEINV + e] for e in range(3)]
        elif kind == "diag":
            zs = [fr[c] * rs[c] for c in range(7)]
        else:
            zs = rs
        acc_rr = acc_xx = acc_rz = None
        for c in range(7):
            xo[c] = xs[c]
            ro[c] = rs[c]
            zo[c] = zs[c]
            t_rr = jnp.sum(rs[c] * rs[c])
            t_xx = jnp.sum(xs[c] * xs[c])
            t_rz = jnp.sum(rs[c] * zs[c])
            acc_rr = t_rr if acc_rr is None else acc_rr + t_rr
            acc_xx = t_xx if acc_xx is None else acc_xx + t_xx
            acc_rz = t_rz if acc_rz is None else acc_rz + t_rz
        i, j = pl.program_id(0), pl.program_id(1)
        part[0, i, j] = acc_rr
        part[1, i, j] = acc_xx
        part[2, i, j] = acc_rz

    return kernel


def finish_update_packed(xp, rp, pp, alpha, coeffs_padded, out_grid, up, factors=None, kind="none", interpret=None):
    """(x', r', z, rr, xx, rz): the fused finish+update (see
    _make_finish_update_kernel).  `out_grid` + expanded `up` stand in for
    Ap; `alpha` must already include the reduced pAp term (-sum(mom*v))."""
    interpret = _auto_interpret(interpret)
    nx, ny, nz = xp.shape[-3:]
    bx, by = _blocks_for((nx, ny, nz))
    grid = (nx // bx, ny // by)
    dtype = xp.dtype

    def halo_spec(c):
        return pl.BlockSpec(
            (pl.Element(c), pl.Element(bx + 2 * HALO_X), pl.Element(by + 2 * HALO_Y), pl.Element(nz)),
            lambda i, j: (0, i * bx, j * by, 0),
            memory_space=None if interpret else pltpu.VMEM,
        )

    def plain_spec(c):
        return pl.BlockSpec(
            (c, bx, by, nz), lambda i, j: (0, i, j, 0),
            memory_space=None if interpret else pltpu.VMEM,
        )

    scalar_spec = pl.BlockSpec(
        (1,), lambda i, j: (0,),
        memory_space=None if interpret else pltpu.SMEM,
    )
    part_spec = pl.BlockSpec(
        (3, grid[0], grid[1]), lambda i, j: (0, 0, 0),
        memory_space=None if interpret else pltpu.SMEM,
    )
    ins = [jnp.reshape(alpha.astype(dtype), (1,)), coeffs_padded, out_grid, _pad_halo(up), xp, rp, pp]
    in_specs = [scalar_spec, halo_spec(7), plain_spec(7), halo_spec(3), plain_spec(7), plain_spec(7), plain_spec(7)]
    if kind == "arrow":
        ins.append(factors)
        in_specs.append(plain_spec(N_ARROW))
    elif kind == "diag":
        ins.append(factors)
        in_specs.append(plain_spec(7))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    xo, ro, zo, part = pl.pallas_call(
        _make_finish_update_kernel(kind),
        grid=grid,
        in_specs=in_specs,
        out_specs=[plain_spec(7), plain_spec(7), plain_spec(7), part_spec],
        out_shape=[
            jax.ShapeDtypeStruct((7, nx, ny, nz), dtype),
            jax.ShapeDtypeStruct((7, nx, ny, nz), dtype),
            jax.ShapeDtypeStruct((7, nx, ny, nz), dtype),
            jax.ShapeDtypeStruct((3, grid[0], grid[1]), dtype),
        ],
        interpret=interpret,
        **kwargs,
    )(*ins)
    sums = jnp.sum(part, axis=(1, 2))
    return xo, ro, zo, sums[0], sums[1], sums[2]


# ---------------------------------------------------------------------------
# Fully-fused reduced finish: the polynomial expand is evaluated IN the
# finish+update kernel (on the halo window, in registers), so the face
# values `up` never round-trip through HBM — removing the expand kernel,
# the XLA halo pad of up, and the finish pass's halo re-read of it
# (reference analog: the reduced expansion J v inside
# ApplyPressureStressMatrix.h:102-179 is likewise fused into the apply).
#
# Window decomposition: each (x, y) window splits into statically-sized
# segments [low fringe | cpb whole-cube (or whole-block) slices | high
# fringe]; a fringe (HALO_X/HALO_Y <= min(tile, block)) always lies in a
# single cube, whose index is plain traced arithmetic on program_id — so
# one polynomial evaluation per cell, no per-cube masking sweeps, and a
# plain 2-D grid even when the tile exceeds the block.
# ---------------------------------------------------------------------------


def _axis_segments(pid, b, T, H):
    """Static (window_offset, length) segments along one block axis plus
    the traced cube index owning each.  Requires H <= min(T, b) (single-
    cube fringes) and T | b or b | T (pallas_compatible)."""
    base = pid * b
    w = min(T, b)
    segs = [(0, H, (base - 1) // T)]
    for m in range(max(b // T, 1)):
        segs.append((H + m * w, w, base // T + m))
    segs.append((H + b, H, (base + b) // T))
    return segs


def _expand_u_window(vr, redr, K, T, bx, by, nz, cs, wsx, wsy, mono_fn):
    """u_a (3 window-shaped register arrays): region polynomials evaluated
    on the reduced faces of the (bx+2Hx, by+2Hy) halo window.  `vr` is the
    element-windowed [wsx, wsy, 3K, cs2] slab of cube-origin coefficients;
    `redr` the halo window of the reduced-face masks (coeff channels
    14-16).  Out-of-domain fringe cells use a clamped cube (finite garbage
    positions) and are zeroed by the mask, which is genuinely 0 in the
    pre-padded coefficient halo."""
    dtype = vr.dtype
    i, j = pl.program_id(0), pl.program_id(1)
    cs2 = cs[2]
    zi = jax.lax.broadcasted_iota(jnp.int32, (cs2, nz), 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, (cs2, nz), 0)
    Zt = (zi // T == ci).astype(dtype)  # (cs2, nz)
    sx0 = jnp.clip((i * bx - 1) // T, 0, cs[0] - wsx)
    sy0 = jnp.clip((j * by - 1) // T, 0, cs[1] - wsy)
    xsegs = _axis_segments(i, bx, T, HALO_X)
    ysegs = _axis_segments(j, by, T, HALO_Y)
    u = []
    for a in range(3):
        rows = []
        for ox, lx, cgx in xsegs:
            cols = []
            for oy, ly, cgy in ysegs:
                cgxc = jnp.clip(cgx, 0, cs[0] - 1)
                cgyc = jnp.clip(cgy, 0, cs[1] - 1)
                vrow = vr[cgxc - sx0, cgyc - sy0, a * K : (a + 1) * K, :]  # (K, cs2)
                vfull = jnp.dot(vrow, Zt, preferred_element_type=dtype, precision="highest")  # (K, nz)
                fx = (i * bx - HALO_X + ox - cgxc * T).astype(dtype)
                fy = (j * by - HALO_Y + oy - cgyc * T).astype(dtype)
                px = jax.lax.broadcasted_iota(jnp.int32, (lx, ly, nz), 0).astype(dtype) + fx
                py = jax.lax.broadcasted_iota(jnp.int32, (lx, ly, nz), 1).astype(dtype) + fy
                lz = jax.lax.broadcasted_iota(jnp.int32, (lx, ly, nz), 2)
                pz = (lz - T * (lz // T)).astype(dtype)
                pos = [px, py, pz]
                pos[a] = pos[a] + 0.5
                mono = mono_fn(pos[0], pos[1], pos[2])
                acc = None
                for k in range(K):
                    term = mono[k] * vfull[k][None, None, :]
                    acc = term if acc is None else acc + term
                chi = redr[a, ox : ox + lx, oy : oy + ly, :]
                cols.append(acc * chi)
            rows.append(jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0])
        u.append(jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0])
    return u


def _make_exp_finish_update_kernel(kind, K, T, bx, by, nz, cs, wsx, wsy, mono_fn):
    """finish_update with the expand leg fused in: u is expanded on the
    halo window in registers, then ap = out_grid + [G Dt]^T(-u), then the
    CG vector update + loop dots (see _make_finish_update_kernel)."""

    def kernel(*refs):
        if kind == "none":
            al, c7r, redr, vr, gr, xr, rr_, pr, xo, ro, zo, part = refs
            fr = None
        else:
            al, c7r, redr, vr, gr, xr, rr_, pr, fr, xo, ro, zo, part = refs
        a = al[0]
        u = _expand_u_window(vr, redr, K, T, bx, by, nz, cs, wsx, wsy, mono_fn)
        w = [-u[ax] for ax in range(3)]
        contrib = _transpose_contrib(c7r, w)
        itr = (slice(HALO_X, w[0].shape[0] - HALO_X), slice(HALO_Y, w[0].shape[1] - HALO_Y), slice(None))
        xs = [xr[c] + a * pr[c] for c in range(7)]
        rs = [rr_[c] - a * (gr[c] + contrib[c][itr]) for c in range(7)]
        if kind == "arrow":
            z_p = (rs[0] + sum(fr[_ARROW_KD + i] * rs[1 + i] for i in range(3))) * fr[_ARROW_SCHUR]
            zs = [z_p]
            zs += [(rs[1 + i] + fr[_ARROW_K + i] * z_p) * fr[_ARROW_INVD + i] for i in range(3)]
            zs += [rs[4 + e] * fr[_ARROW_TEINV + e] for e in range(3)]
        elif kind == "diag":
            zs = [fr[c] * rs[c] for c in range(7)]
        else:
            zs = rs
        acc_rr = acc_xx = acc_rz = None
        for c in range(7):
            xo[c] = xs[c]
            ro[c] = rs[c]
            zo[c] = zs[c]
            t_rr = jnp.sum(rs[c] * rs[c])
            t_xx = jnp.sum(xs[c] * xs[c])
            t_rz = jnp.sum(rs[c] * zs[c])
            acc_rr = t_rr if acc_rr is None else acc_rr + t_rr
            acc_xx = t_xx if acc_xx is None else acc_xx + t_xx
            acc_rz = t_rz if acc_rz is None else acc_rz + t_rz
        i, j = pl.program_id(0), pl.program_id(1)
        part[0, i, j] = acc_rr
        part[1, i, j] = acc_xx
        part[2, i, j] = acc_rz

    return kernel


def exp_finish_supported(res, T) -> bool:
    """Whether the fully-fused expand+finish+update kernel covers this
    config: fringes must lie in a single cube (halo <= min(tile, block))."""
    try:
        bx, by = _blocks_for(res)
    except ValueError:
        return False
    return min(T, bx) >= HALO_X and min(T, by) >= HALO_Y


def exp_finish_update_packed(xp, rp, pp, alpha, coeffs_padded, out_grid, v_arr, res, T, basis, factors=None, kind="none", interpret=None):
    """(x', r', z, rr, xx, rz): fused expand + finish + CG update.  `v_arr`
    is the [cs0, cs1, 3K, cs2] cube-origin coefficient slab (the tiny
    region-algebra output); `up` is never materialized.  `alpha` must
    already include the reduced pAp term (-sum(mom*v))."""
    from .basis import monomials_xyz, n_monomials

    interpret = _auto_interpret(interpret)
    nx, ny, nz = res
    bx, by = _blocks_for(res)
    K = n_monomials(basis)
    cs = tuple(-(-n // T) for n in res)
    cpbx, cpby = max(bx // T, 1), max(by // T, 1)
    wsx, wsy = min(cpbx + 2, cs[0]), min(cpby + 2, cs[1])
    grid = (nx // bx, ny // by)
    dtype = xp.dtype
    if not exp_finish_supported(res, T):
        raise ValueError(f"fused expand+finish needs halo <= min(tile, block); T={T} blocks=({bx},{by})")

    def mono_fn(ox, oy, oz):
        return monomials_xyz(ox, oy, oz, basis)

    def halo_spec(c, c0=0):
        return pl.BlockSpec(
            (pl.Element(c), pl.Element(bx + 2 * HALO_X), pl.Element(by + 2 * HALO_Y), pl.Element(nz)),
            lambda i, j: (c0, i * bx, j * by, 0),
            memory_space=None if interpret else pltpu.VMEM,
        )

    def plain_spec(c):
        return pl.BlockSpec(
            (c, bx, by, nz), lambda i, j: (0, i, j, 0),
            memory_space=None if interpret else pltpu.VMEM,
        )

    v_spec = pl.BlockSpec(
        (pl.Element(wsx), pl.Element(wsy), pl.Element(3 * K), pl.Element(cs[2])),
        lambda i, j: (
            jnp.clip((i * bx - 1) // T, 0, cs[0] - wsx),
            jnp.clip((j * by - 1) // T, 0, cs[1] - wsy),
            0,
            0,
        ),
        memory_space=None if interpret else pltpu.VMEM,
    )
    scalar_spec = pl.BlockSpec(
        (1,), lambda i, j: (0,),
        memory_space=None if interpret else pltpu.SMEM,
    )
    part_spec = pl.BlockSpec(
        (3, grid[0], grid[1]), lambda i, j: (0, 0, 0),
        memory_space=None if interpret else pltpu.SMEM,
    )
    ins = [
        jnp.reshape(alpha.astype(dtype), (1,)),
        coeffs_padded,
        coeffs_padded,
        v_arr,
        out_grid,
        xp,
        rp,
        pp,
    ]
    in_specs = [
        scalar_spec,
        halo_spec(7),
        halo_spec(3, c0=C_RED),
        v_spec,
        plain_spec(7),
        plain_spec(7),
        plain_spec(7),
        plain_spec(7),
    ]
    if kind == "arrow":
        ins.append(factors)
        in_specs.append(plain_spec(N_ARROW))
    elif kind == "diag":
        ins.append(factors)
        in_specs.append(plain_spec(7))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    xo, ro, zo, part = pl.pallas_call(
        _make_exp_finish_update_kernel(kind, K, T, bx, by, nz, cs, wsx, wsy, mono_fn),
        grid=grid,
        in_specs=in_specs,
        out_specs=[plain_spec(7), plain_spec(7), plain_spec(7), part_spec],
        out_shape=[
            jax.ShapeDtypeStruct((7, nx, ny, nz), dtype),
            jax.ShapeDtypeStruct((7, nx, ny, nz), dtype),
            jax.ShapeDtypeStruct((7, nx, ny, nz), dtype),
            jax.ShapeDtypeStruct((3, grid[0], grid[1]), dtype),
        ],
        interpret=interpret,
        **kwargs,
    )(*ins)
    sums = jnp.sum(part, axis=(1, 2))
    return xo, ro, zo, sums[0], sums[1], sums[2]


# ---------------------------------------------------------------------------
# Fused CG update: x' = x + a p, r' = r - a Ap, z = M^-1 r', and the three
# loop dots (<r',r'>, <x',x'>, <r',z>) — one pointwise kernel replacing two
# axpys, the preconditioner pass, and three separate reductions (~6 HBM
# sweeps per iteration -> 1).  The preconditioners that qualify are
# pointwise in the packed layout: identity, Jacobi diagonal, CELL_ARROW.
# ---------------------------------------------------------------------------

# arrow factor channel layout for pack_arrow_factors
_ARROW_KD = 0  # +a
_ARROW_SCHUR = 3
_ARROW_K = 4  # +a
_ARROW_INVD = 7  # +a
_ARROW_TEINV = 10  # +e
N_ARROW = 13


def pack_arrow_factors(factors: dict) -> jnp.ndarray:
    """precond_factors_packed dict -> [13, nx, ny, nz] channel stack."""
    chans = list(factors["kd"]) + [factors["inv_schur"]] + list(factors["k"])
    chans += list(factors["inv_d"]) + list(factors["te_inv_s"])
    return jnp.stack(chans, axis=0)


def _make_cg_update_kernel(kind):
    def kernel(*refs):
        if kind == "none":
            al, xr, rr_, pr, apr, xo, ro, zo, part = refs
            fr = None
        else:
            al, xr, rr_, pr, apr, fr, xo, ro, zo, part = refs
        a = al[0]
        xs = [xr[c] + a * pr[c] for c in range(7)]
        rs = [rr_[c] - a * apr[c] for c in range(7)]
        if kind == "arrow":
            z_p = (rs[0] + sum(fr[_ARROW_KD + i] * rs[1 + i] for i in range(3))) * fr[_ARROW_SCHUR]
            zs = [z_p]
            zs += [(rs[1 + i] + fr[_ARROW_K + i] * z_p) * fr[_ARROW_INVD + i] for i in range(3)]
            zs += [rs[4 + e] * fr[_ARROW_TEINV + e] for e in range(3)]
        elif kind == "diag":
            zs = [fr[c] * rs[c] for c in range(7)]
        else:
            zs = rs
        acc_rr = acc_xx = acc_rz = None
        for c in range(7):
            xo[c] = xs[c]
            ro[c] = rs[c]
            zo[c] = zs[c]
            t_rr = jnp.sum(rs[c] * rs[c])
            t_xx = jnp.sum(xs[c] * xs[c])
            t_rz = jnp.sum(rs[c] * zs[c])
            acc_rr = t_rr if acc_rr is None else acc_rr + t_rr
            acc_xx = t_xx if acc_xx is None else acc_xx + t_xx
            acc_rz = t_rz if acc_rz is None else acc_rz + t_rz
        i, j = pl.program_id(0), pl.program_id(1)
        part[0, i, j] = acc_rr
        part[1, i, j] = acc_xx
        part[2, i, j] = acc_rz

    return kernel


def cg_update_packed(xp, rp, pp, app, alpha, factors=None, kind="none", interpret=None):
    """(x', r', z, rr, xx, rz): the fused CG vector update (see above).
    `alpha` is a traced scalar; `factors` is the packed preconditioner
    stack ([13,...] arrow / [7,...] diagonal inverse / None)."""
    interpret = _auto_interpret(interpret)
    nx, ny, nz = xp.shape[-3:]
    bx, by = _blocks_for((nx, ny, nz))
    grid = (nx // bx, ny // by)
    dtype = xp.dtype

    def plain_spec(c):
        return pl.BlockSpec(
            (c, bx, by, nz), lambda i, j: (0, i, j, 0),
            memory_space=None if interpret else pltpu.VMEM,
        )

    scalar_spec = pl.BlockSpec(
        (1,), lambda i, j: (0,),
        memory_space=None if interpret else pltpu.SMEM,
    )
    part_spec = pl.BlockSpec(
        (3, grid[0], grid[1]), lambda i, j: (0, 0, 0),
        memory_space=None if interpret else pltpu.SMEM,
    )
    ins = [jnp.reshape(alpha.astype(dtype), (1,)), xp, rp, pp, app]
    in_specs = [scalar_spec] + [plain_spec(7)] * 4
    if kind == "arrow":
        ins.append(factors)
        in_specs.append(plain_spec(N_ARROW))
    elif kind == "diag":
        ins.append(factors)
        in_specs.append(plain_spec(7))
    xo, ro, zo, part = pl.pallas_call(
        _make_cg_update_kernel(kind),
        grid=grid,
        in_specs=in_specs,
        out_specs=[plain_spec(7), plain_spec(7), plain_spec(7), part_spec],
        out_shape=[
            jax.ShapeDtypeStruct((7, nx, ny, nz), dtype),
            jax.ShapeDtypeStruct((7, nx, ny, nz), dtype),
            jax.ShapeDtypeStruct((7, nx, ny, nz), dtype),
            jax.ShapeDtypeStruct((3, grid[0], grid[1]), dtype),
        ],
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(*ins)
    sums = jnp.sum(part, axis=(1, 2))
    return xo, ro, zo, sums[0], sums[1], sums[2]


def pallas_compatible(grid_res, params) -> bool:
    """Static check for the packed kernel path: x/y divisible by the block
    size, and (when reduced) the tile size commensurate with the block on
    each axis — whole cubes per block OR whole blocks per cube (the 3-D
    sub-grid accumulates partial-cube moments across the consecutive
    sub-blocks of one cube, so tiles up to the full axis extent work;
    the reference's best published tile is 64, HDK_PolyStokes.C:130)."""
    try:
        bx, by = _blocks_for(grid_res)
    except ValueError:
        return False
    if params.do_reduced_regions:
        if params.do_tile and params.tile_padding < 1:
            return False
        if not params.do_tile and not params.cube_regions:
            return False  # literal general regions: no cube-aligned map
        T = params.tile_size
        if bx % T and T % bx:
            return False  # x: whole cubes per block OR whole blocks per cube
        if by % T and T % by:
            return False  # y: same commensurability along y
        if any(n % T for n in grid_res):
            return False
    return True


def moments_packed(xp_padded, coeffs_padded, res, T, basis, interpret=None):
    """Per-cube monomial moments (about cube origins) of the
    reduced-masked s: the fused replacement for reduce_J_tiled's 3*K
    full-grid block_sum passes.  Returns [cs0, cs1, 3K, cs2]."""
    from .basis import monomials_xyz, n_monomials

    interpret = _auto_interpret(interpret)
    nx, ny, nz = res
    bx, by = _blocks_for(res)
    K = n_monomials(basis)
    cs = tuple(-(-n // T) for n in res)

    def mono_fn(ox, oy, oz):
        return monomials_xyz(ox, oy, oz, basis)

    kernel = _make_moments_kernel(basis, K, T, bx, by, nz, mono_fn)
    grid, (xspec, cspec), _ = _grid_and_specs(res, (7, coeffs_padded.shape[0]), interpret, T=T)
    mom_spec = _mom_spec(T, bx, by, K, cs, interpret)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[xspec, cspec],
        out_specs=mom_spec,
        out_shape=jax.ShapeDtypeStruct((cs[0], cs[1], 3 * K, cs[2]), xp_padded.dtype),
        interpret=interpret,
        **_vmem_kwargs(interpret),
    )(xp_padded, coeffs_padded)
