"""A-DEF2 two-level deflation for the pressure-stress Schur system.

A two-level correction for the low-frequency cluster the CELL_ARROW
block preconditioner cannot see.  The A-DEF2 combination
(Tang, Nabben, Vuik & Erlangga, J. Sci. Comput. 39, 2009):

    z = z1 + W E^-1 W^T (r - A z1),      z1 = M^-1 r (arrow),
    E = W^T (-A) W,
    x0' = x0 - W E^-1 W^T (b - A x0)     (start with W^T r0 = 0)

with W = per-cube constants of each of the 7 solve families (p, tau_cc,
tau_e) masked to the active DOFs.  Measured effect (fp64 lab,
benchmarks/diag_spectrum.py --cg at 32^3 tile 8): arrow-only 525
iterations -> A-DEF2 419; device honey_coil 24^3 fp64: 361 -> 310.
A ~15-20% iteration cut for one extra operator apply per iteration —
worth enabling only when the apply is cheap relative to the iteration
(the fused Pallas path) or the scene is iteration-bound.  Linear extra
modes or a finer coarse lattice do not help (451 / 422 in the lab) —
const-per-cube at the tile size is the sweet spot.  Additive two-level
and Woodbury rank-26 corrections both fail outright (lab record in the
round-2/3 session notes).

No reference equivalent: the reference ships the identity preconditioner
(Preconditioners.cpp:4-9); this is a TPU-native addition that makes the
reduced solve beat the uniform solve in wall-clock, reproducing the
reference's headline result (results/figures/Timings_ArmadilloDrop.png).

Cost: setup builds E with 27-color x 7-family probe applies (the support
of A w_cube reaches at most 2 cells beyond the cube, so cubes 3 apart get
disjoint output aggregates — one lax.map over 189 probes); per iteration
the only extra full-size work is one operator application inside
W^T A z1.  Coarse solves use a pre-inverted, diagonally equilibrated E
(one [k, k] matvec per iteration, k = 7 * n_cubes).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from .classify import Classification, is_active
from .config import SolverParams
from .grid import Grid


@dataclasses.dataclass(frozen=True)
class DeflationState:
    """Per-step deflation operators (a jit-friendly pytree)."""

    masks: jnp.ndarray  # [7, nx, ny, nz] DOF masks in packed layout
    e: jnp.ndarray  # [k, k] E = W^T(-A)W (kept for iterative refinement)
    einv: jnp.ndarray  # [k, k] equilibrated inverse of E
    cs: tuple  # static: coarse lattice shape
    tile: int  # static: coarse cube size


jax.tree_util.register_dataclass(
    DeflationState, data_fields=["masks", "e", "einv"], meta_fields=["cs", "tile"]
)


def deflation_tile(grid: Grid, params: SolverParams) -> int:
    """The coarse cube size: params.deflation_tile, defaulting to the
    reduction tile (and to 16 for untiled/uniform solves)."""
    tc = params.deflation_tile
    if tc <= 0:
        tc = params.tile_size if (params.do_reduced_regions and params.do_tile) else 16
    return tc


# dense-E ceiling: E is [k, k] with k = 7 * n_cubes, built and inverted
# densely — k=8192 is 256MB for E + the same for the inverse, the
# practical device limit (128^3/tile16 -> k=3584; 256^3 needs
# deflation_tile >= 32 -> k=3584 again)
MAX_COARSE_DOFS = 8192


def deflation_supported(grid: Grid, params: SolverParams) -> bool:
    """Static feasibility: the coarse lattice must tile the grid exactly,
    the dense coarse operator must fit (MAX_COARSE_DOFS — raise
    params.deflation_tile at high resolution), and (for reduced solves)
    regions must be cube-local so probe supports stay within one cube
    ring — i.e. the tiled path with the coarse tile a multiple of the
    reduction tile."""
    tc = deflation_tile(grid, params)
    if any(n % tc for n in grid.res):
        return False
    nc = 1
    for n in grid.res:
        nc *= n // tc
    if 7 * nc > MAX_COARSE_DOFS:
        return False
    if params.do_reduced_regions:
        if not params.do_tile:
            return False  # general regions have unbounded probe support
        if tc % params.tile_size:
            return False
    return True


def packed_masks(grid: Grid, cls: Classification, dtype) -> jnp.ndarray:
    """Active-DOF masks per packed channel (the DOF sets of the explicit
    operators: p/tau_c live on active cells, tau_e on active edges;
    export.ExplicitOperators)."""
    from .pallas_apply import _edge_to_slot

    cell = is_active(cls.cell_labels).astype(dtype)
    chans = [cell, cell, cell, cell]
    chans += [_edge_to_slot(is_active(cls.edge_labels[e]).astype(dtype), e) for e in range(3)]
    return jnp.stack(chans, axis=0)


def _restrict(xp: jnp.ndarray, masks: jnp.ndarray, cs, T: int) -> jnp.ndarray:
    """W^T x: masked per-cube sums, [7, nx, ny, nz] -> [7*nc] (f-major)."""
    v = (masks * xp).reshape(7, cs[0], T, cs[1], T, cs[2], T)
    return v.sum(axis=(2, 4, 6)).reshape(-1)


def _prolong(mu: jnp.ndarray, masks: jnp.ndarray, cs, T: int) -> jnp.ndarray:
    """W mu: broadcast each cube's coefficient over its masked DOFs."""
    f = mu.reshape(7, cs[0], 1, cs[1], 1, cs[2], 1)
    f = jnp.broadcast_to(f, (7, cs[0], T, cs[1], T, cs[2], T))
    return masks * f.reshape(masks.shape)


def build_deflation(
    grid: Grid,
    cls: Classification,
    params: SolverParams,
    apply_packed: Callable,
) -> DeflationState:
    """Build W masks and the inverted coarse operator E^-1.

    `apply_packed` is the full Schur apply on packed [7, ...] vectors (A,
    negative definite).  E[(f',c'),(f,c)] = -w_{f'c'}^T A w_{fc}; columns
    are extracted by 27-coloring the cube lattice (spacing 3) so that each
    aggregation cube sees at most one lit probe cube.
    """
    dtype = params.dtype
    T = deflation_tile(grid, params)
    assert all(n % T == 0 for n in grid.res), "deflation tile must divide the grid"
    cs = tuple(n // T for n in grid.res)
    nc = cs[0] * cs[1] * cs[2]
    k = 7 * nc

    masks = packed_masks(grid, cls, dtype)

    # cube coordinate fields (cell resolution)
    ii = jnp.arange(grid.res[0]) // T
    jj = jnp.arange(grid.res[1]) // T
    kk = jnp.arange(grid.res[2]) // T

    # probe schedule: 27 colors x 7 families
    colors = jnp.stack(
        jnp.meshgrid(jnp.arange(3), jnp.arange(3), jnp.arange(3), indexing="ij"), axis=-1
    ).reshape(-1, 3)
    fams = jnp.arange(7)
    sched = jnp.concatenate(
        [
            jnp.repeat(colors, 7, axis=0),
            jnp.tile(fams, 27)[:, None],
        ],
        axis=1,
    )  # [189, 4]

    def one_probe(cf):
        cx, cy, cz, f = cf[0], cf[1], cf[2], cf[3]
        lit = (
            ((ii % 3) == cx)[:, None, None]
            & ((jj % 3) == cy)[None, :, None]
            & ((kk % 3) == cz)[None, None, :]
        ).astype(dtype)
        onehot = (jnp.arange(7) == f).astype(dtype)[:, None, None, None]
        w = masks * lit[None] * onehot
        y = apply_packed(w)
        return (masks * y).reshape(7, cs[0], T, cs[1], T, cs[2], T).sum(axis=(2, 4, 6))

    agg = jax.lax.map(one_probe, sched)  # [189, 7, cs0, cs1, cs2]
    agg = agg.reshape(189, 7, nc)

    # assemble E: for column (f, c) read pass (color(c), f), rows (f', c')
    # over the 27-neighbor ring of c
    cgrid = jnp.stack(
        jnp.meshgrid(jnp.arange(cs[0]), jnp.arange(cs[1]), jnp.arange(cs[2]), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)  # [nc, 3] cube coords
    color_of = (cgrid[:, 0] % 3) * 9 + (cgrid[:, 1] % 3) * 3 + (cgrid[:, 2] % 3)  # [nc]
    deltas = colors - 1  # [27, 3] in {-1,0,1}^3
    nbr = cgrid[:, None, :] + deltas[None, :, :]  # [nc, 27, 3]
    valid = jnp.all((nbr >= 0) & (nbr < jnp.asarray(cs)), axis=-1)  # [nc, 27]
    nbr_flat = (
        nbr[..., 0].clip(0, cs[0] - 1) * cs[1] * cs[2]
        + nbr[..., 1].clip(0, cs[1] - 1) * cs[2]
        + nbr[..., 2].clip(0, cs[2] - 1)
    )  # [nc, 27]

    # vals[c, f, d, f'] = agg[color_of(c)*7 + f, f', nbr_flat[c, d]]
    pass_idx = color_of[:, None] * 7 + jnp.arange(7)[None, :]  # [nc, 7]
    vals = agg[pass_idx[:, :, None, None], jnp.arange(7)[None, None, None, :], nbr_flat[:, None, :, None]]
    vals = jnp.where(valid[:, None, :, None], vals, 0.0)

    rows = jnp.broadcast_to(
        (jnp.arange(7)[None, None, None, :] * nc + nbr_flat[:, None, :, None]).astype(jnp.int32),
        vals.shape,
    )
    cols = jnp.broadcast_to(
        (jnp.arange(7)[None, :, None, None] * nc + jnp.arange(nc)[:, None, None, None]).astype(jnp.int32),
        vals.shape,
    )
    E = jnp.zeros((k, k), dtype).at[rows.reshape(-1), cols.reshape(-1)].add(-vals.reshape(-1))
    E = 0.5 * (E + E.T)

    # equilibrate + regularize dead coarse DOFs, invert once
    d = jnp.diagonal(E)
    dead = d <= 0
    s = jnp.where(dead, 0.0, 1.0 / jnp.sqrt(jnp.where(dead, 1.0, d)))
    Eeq = E * s[:, None] * s[None, :] + jnp.diag(dead.astype(dtype))
    Eeq = Eeq + 1e-6 * jnp.eye(k, dtype=dtype)
    einv_eq = jnp.linalg.inv(Eeq)
    einv = einv_eq * s[:, None] * s[None, :]

    return DeflationState(masks=masks, e=E, einv=einv, cs=cs, tile=T)


def coarse_solve(defl: DeflationState, q: jnp.ndarray) -> jnp.ndarray:
    """E^-1 q with one iterative-refinement step (guards the fp32 inverse
    against the coarse operator's conditioning)."""
    mu = defl.einv @ q
    return mu + defl.einv @ (q - defl.e @ mu)


def deflated_precond_packed(
    defl: DeflationState, apply_packed: Callable, base: Callable = None
) -> Callable:
    """The A-DEF2 preconditioner on packed vectors:
    z = z1 + W E^-1 W^T (r - A z1), z1 = base(r)."""

    def solve(rp):
        z1 = base(rp) if base is not None else rp
        az1 = apply_packed(z1)
        # r - (-A) z1 = r + A z1 (A is the negative operator)
        q = _restrict(rp + az1, defl.masks, defl.cs, defl.tile)
        mu = coarse_solve(defl, q)
        return z1 + _prolong(mu, defl.masks, defl.cs, defl.tile)

    return solve


def deflate_guess_packed(defl: DeflationState, apply_packed: Callable, b, x0):
    """x0' = x0 - W E^-1 W^T (b - A x0): makes W^T r0 = 0, required by the
    A-DEF2 theory (and measurably faster in the lab)."""
    r0 = b - apply_packed(x0)
    mu = coarse_solve(defl, _restrict(r0, defl.masks, defl.cs, defl.tile))
    return x0 - _prolong(mu, defl.masks, defl.cs, defl.tile)


def deflated_precond_ptau(defl: DeflationState, apply_ptau: Callable, base: Callable = None) -> Callable:
    """A-DEF2 on PTau vectors (the non-Pallas device path): internal
    restriction/prolongation run through the packed adapters."""
    from .pallas_apply import pack_ptau, unpack_ptau

    def solve(r):
        z1 = base(r) if base is not None else r
        az1 = apply_ptau(z1)
        q = _restrict(pack_ptau(r) + pack_ptau(az1), defl.masks, defl.cs, defl.tile)
        mu = coarse_solve(defl, q)
        corr = unpack_ptau(_prolong(mu, defl.masks, defl.cs, defl.tile))
        return jax.tree.map(jnp.add, z1, corr)

    return solve


def deflate_guess_ptau(defl: DeflationState, apply_ptau: Callable, b, x0):
    from .pallas_apply import pack_ptau, unpack_ptau

    r0 = jax.tree.map(jnp.subtract, b, apply_ptau(x0))
    mu = coarse_solve(defl, _restrict(pack_ptau(r0), defl.masks, defl.cs, defl.tile))
    corr = unpack_ptau(_prolong(mu, defl.masks, defl.cs, defl.tile))
    return jax.tree.map(jnp.subtract, x0, corr)
