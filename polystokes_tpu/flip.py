"""TPU-native FLIP/PIC particle loop around the Stokes microsolver.

The reference node is a microsolver inside Houdini's FLIP loop
(reference README.md:26-28): Houdini owns the particles, advection, and
surface tracking, and HDK_PolyStokes replaces the viscous pressure
projection.  This module is the TPU-native stand-in for that host loop,
so the built-in scenes run end-to-end with the same outer structure the
reference's results assume (sim.py's grid semi-Lagrangian loop remains as
the cheaper alternative).

Per frame:  P2G transfer -> gravity -> Stokes solve (polystokes step)
            -> FLIP/PIC blended G2P -> RK2 particle advection
            -> particle surface rebuild (SDF)

TPU-first design choices:
- FIXED particle buffer (static shapes) with ADAPTIVE RECYCLING inside
  it: the total slot budget is chosen at seed time, but each frame kills
  particles that escaped the liquid and reseeds under-dense liquid cells
  from the dead-slot pool (`reseed`, all static-shape: per-cell deficits
  -> cumsum -> searchsorted slot assignment).  This is the TPU analog of
  Houdini's adaptive reseeding; the remaining deviation is that the
  GLOBAL budget is fixed — a uniformly growing liquid volume saturates
  the pool (overfull cells are bounded by the budget, not thinned).
- P2G is 8 vectorized scatter-adds per axis (the trilinear corners) into
  the MAC face grids — XLA lowers `.at[].add` to native TPU scatters.
- G2P/advection are gathers (`_trilinear`), fully batched over P.
- The surface SDF rebuild is a whole-grid distance propagation
  (`lax.fori_loop` of 6-neighbor min sweeps) from the particle
  occupancy mask — bounded, branch-free, grid-parallel.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import SolverParams
from .grid import Grid, face_offsets
from .sim import _trilinear, _velocity_at
from .solver import Scene, step


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlipState:
    """Particle state (cell units: position p sits at world p*dx)."""

    pos: jnp.ndarray  # [P, 3] float, cell units
    vel: jnp.ndarray  # [P, 3] float, world units
    alive: jnp.ndarray  # [P] float 0/1


def seed_particles(
    grid: Grid, surface_sdf, max_particles: int, ppc_axis: int = 2, seed: int = 0, dtype=jnp.float32
) -> FlipState:
    """Host-side seeding: a jittered ppc_axis^3-per-cell lattice restricted
    to liquid cells (sdf < 0), packed into a fixed [max_particles, 3]
    buffer (excess dropped deterministically, underfill marked dead).
    Runs once per simulation, in numpy."""
    sdf = np.asarray(surface_sdf)
    rng = np.random.default_rng(seed)
    liquid = np.argwhere(sdf < 0.0)  # [L, 3] cell indices
    q = ppc_axis
    # lattice offsets within the cell: (k + 0.5)/q + jitter
    offs = (np.stack(np.meshgrid(*([np.arange(q)] * 3), indexing="ij"), -1).reshape(-1, 3) + 0.5) / q
    pos = (liquid[:, None, :] + offs[None, :, :]).reshape(-1, 3)
    pos = pos + rng.uniform(-0.5 / q, 0.5 / q, pos.shape)
    if len(pos) > max_particles:
        sel = rng.permutation(len(pos))[:max_particles]
        pos = pos[sel]
    alive = np.zeros(max_particles, np.float32)
    alive[: len(pos)] = 1.0
    buf = np.zeros((max_particles, 3), np.float32)
    buf[: len(pos)] = pos
    return FlipState(
        pos=jnp.asarray(buf, dtype), vel=jnp.zeros((max_particles, 3), dtype),
        alive=jnp.asarray(alive, dtype),
    )


def _corner_scatter(acc, wacc, idx0, frac, w, val):
    """Accumulate trilinear-weighted `val` (and weights) into acc/wacc at
    the 8 corners around idx0+frac.  All [P]-vectorized."""
    shape = acc.shape
    for dx_ in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cw = (
                    (frac[:, 0] if dx_ else 1.0 - frac[:, 0])
                    * (frac[:, 1] if dy else 1.0 - frac[:, 1])
                    * (frac[:, 2] if dz else 1.0 - frac[:, 2])
                ) * w
                ix = jnp.clip(idx0[:, 0] + dx_, 0, shape[0] - 1)
                iy = jnp.clip(idx0[:, 1] + dy, 0, shape[1] - 1)
                iz = jnp.clip(idx0[:, 2] + dz, 0, shape[2] - 1)
                acc = acc.at[ix, iy, iz].add(cw * val)
                wacc = wacc.at[ix, iy, iz].add(cw)
    return acc, wacc


def p2g(state: FlipState, grid: Grid, dtype=jnp.float32):
    """Particle -> MAC grid velocity transfer.  Returns (vel, coverage):
    per-axis face arrays and the per-face weight sums (0 where no particle
    reaches the face — callers keep the prior grid velocity there)."""
    vels, covs = [], []
    for a in range(3):
        fshape = tuple(n + (1 if i == a else 0) for i, n in enumerate(grid.res))
        acc = jnp.zeros(fshape, dtype)
        wacc = jnp.zeros(fshape, dtype)
        # face a of cell i sits at cell-unit position i - 1/2 along a:
        # sample position in FACE index space is pos + 0.5 along a
        off = jnp.asarray([0.5 if i == a else 0.0 for i in range(3)], dtype)
        p = state.pos + off[None, :]
        idx0 = jnp.floor(p).astype(jnp.int32)
        idx0 = jnp.clip(idx0, 0, jnp.asarray([s - 2 for s in fshape]))
        frac = p - idx0
        acc, wacc = _corner_scatter(acc, wacc, idx0, frac, state.alive, state.vel[:, a])
        vels.append(acc / jnp.where(wacc > 0, wacc, 1.0))
        covs.append(wacc)
    return tuple(vels), tuple(covs)


def g2p_flip(state: FlipState, vel_old, vel_new, alpha: float = 0.95) -> FlipState:
    """FLIP/PIC blended grid -> particle update:
    v_p' = alpha * (v_p + dv_interp) + (1 - alpha) * v_new_interp."""
    px, py, pz = state.pos[:, 0], state.pos[:, 1], state.pos[:, 2]
    un = _velocity_at(vel_new, px, py, pz)
    uo = _velocity_at(vel_old, px, py, pz)
    new = jnp.stack(un, axis=-1)
    delta = new - jnp.stack(uo, axis=-1)
    v = alpha * (state.vel + delta) + (1.0 - alpha) * new
    return dataclasses.replace(state, vel=v)


def advect_particles(state: FlipState, vel, dt_over_dx, res) -> FlipState:
    """RK2 (midpoint) particle advection in the grid velocity; positions
    clamped to the domain interior."""
    px, py, pz = state.pos[:, 0], state.pos[:, 1], state.pos[:, 2]
    u1 = _velocity_at(vel, px, py, pz)
    mx = px + 0.5 * dt_over_dx * u1[0]
    my = py + 0.5 * dt_over_dx * u1[1]
    mz = pz + 0.5 * dt_over_dx * u1[2]
    u2 = _velocity_at(vel, mx, my, mz)
    new = jnp.stack(
        [px + dt_over_dx * u2[0], py + dt_over_dx * u2[1], pz + dt_over_dx * u2[2]], axis=-1
    )
    lo = jnp.asarray([0.01] * 3, new.dtype)
    hi = jnp.asarray([n - 0.01 for n in res], new.dtype)
    return dataclasses.replace(state, pos=jnp.clip(new, lo, hi))


def surface_from_particles(state: FlipState, grid: Grid, radius: float = 0.9, sweeps: int = 6, dtype=jnp.float32):
    """Particle surface rebuild: occupancy scatter -> two bounded
    6-neighbor distance propagations (outside/inside) -> signed distance
    in world units, minus the particle radius (cell units).

    The propagation is exact on the sweeps-wide band around the surface
    (all the solver's classifiers look at) and clamps beyond it."""
    occ = jnp.zeros(grid.res, dtype)
    idx = jnp.clip(jnp.round(state.pos - 0.5).astype(jnp.int32), 0, jnp.asarray([n - 1 for n in grid.res]))
    occ = occ.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(state.alive)
    inside = occ > 0

    big = jnp.asarray(float(sweeps + 1), dtype)

    def _nbr(d, ax, delta):
        """d at index i+delta along ax, `big` beyond the boundary."""
        pad = [(0, 0)] * 3
        sl = [slice(None)] * 3
        if delta > 0:
            pad[ax] = (0, 1)
            sl[ax] = slice(1, None)
        else:
            pad[ax] = (1, 0)
            sl[ax] = slice(0, -1)
        return jnp.pad(d[tuple(sl)], pad, constant_values=big)

    def sweep_min(d):
        m = d
        for ax in range(3):
            m = jnp.minimum(m, _nbr(d, ax, 1) + 1.0)
            m = jnp.minimum(m, _nbr(d, ax, -1) + 1.0)
        return m

    def prop(mask):
        d0 = jnp.where(mask, 0.0, big)
        return jax.lax.fori_loop(0, sweeps, lambda _, d: sweep_min(d), d0)

    d_out = prop(inside)  # distance to liquid, in cells (0 inside)
    d_in = prop(~inside)  # distance to air, in cells (0 outside)
    phi_cells = jnp.where(inside, -(d_in - 0.5), d_out - 0.5) - radius
    return phi_cells * jnp.asarray(grid.dx, dtype)


# R3 low-discrepancy constants (plastic-number sequence): deterministic
# in-cell jitter for reseeded particles without threading an RNG key
_R3 = (0.8191725133961645, 0.6710436067037893, 0.5497004779019703)


def _cell_counts(state: FlipState, res):
    idx = jnp.clip(
        jnp.round(state.pos - 0.5).astype(jnp.int32), 0, jnp.asarray([n - 1 for n in res])
    )
    cnt = jnp.zeros(res, state.alive.dtype).at[idx[:, 0], idx[:, 1], idx[:, 2]].add(state.alive)
    return cnt, idx


def reseed(
    state: FlipState,
    grid: Grid,
    surface_sdf,
    vel,
    frame_idx,
    min_ppc: float = 3.0,
    target_ppc: int = 8,
    kill_dist_cells: float = 1.5,
    interior_margin_cells: float = 1.0,
) -> FlipState:
    """Adaptive particle recycling within the fixed slot budget (the TPU
    analog of Houdini's FLIP reseeding, which the reference's host loop
    relies on — reference README.md:26-28):

      1. kill particles that escaped the liquid (sampled SDF > kill_dist)
      2. refill liquid cells with fewer than `min_ppc` live particles up
         to `target_ppc`, assigning dead slots to deficit cells by rank
         (cumsum over per-cell deficits + searchsorted — static shapes)

    New particles get a low-discrepancy in-cell jitter (no RNG key) and
    the grid velocity at their position.  When total deficit exceeds the
    dead pool, cells earlier in lexicographic order fill first."""
    dtype = state.pos.dtype
    res = grid.res
    dx = jnp.asarray(grid.dx, dtype)

    # 1. kill escapees
    phi_p = _trilinear(surface_sdf.astype(dtype), state.pos[:, 0] - 0.5, state.pos[:, 1] - 0.5, state.pos[:, 2] - 0.5)
    alive = state.alive * (phi_p < kill_dist_cells * dx).astype(dtype)
    state = dataclasses.replace(state, alive=alive)

    # 2. per-cell deficits over STRICTLY INTERIOR liquid cells (margin
    # keeps the refill off the SDF's smoothing shell around the particle
    # cloud — refilling phi ~ -0.4dx shell cells would inflate the liquid
    # by one cell per frame through the occupancy -> surface feedback)
    cnt, _ = _cell_counts(state, res)
    liquid = surface_sdf < -interior_margin_cells * dx
    need = jnp.where(liquid & (cnt < min_ppc), jnp.asarray(float(target_ppc), dtype) - cnt, 0.0)
    need = jnp.maximum(jnp.round(need), 0.0).astype(jnp.int32).reshape(-1)
    cum = jnp.cumsum(need)
    total_need = cum[-1]

    # dead-slot ranks (0-based among dead slots)
    dead = alive <= 0
    rank = jnp.cumsum(dead.astype(jnp.int32)) - 1
    fill = dead & (rank < total_need)

    # target cell of each filled slot: first cell whose cumulative need
    # interval contains the slot's rank
    cell_flat = jnp.searchsorted(cum, rank, side="right")
    cell_flat = jnp.clip(cell_flat, 0, need.shape[0] - 1)
    cz = cell_flat % res[2]
    cy = (cell_flat // res[2]) % res[1]
    cx = cell_flat // (res[1] * res[2])

    # in-cell low-discrepancy jitter keyed by (slot, within-cell ordinal,
    # frame): u = fract(seq * R3); scaled into the cell's interior
    ordinal = rank - jnp.where(cell_flat > 0, cum[cell_flat - 1], 0)
    seq = (
        ordinal.astype(dtype)[:, None]
        + jnp.asarray(frame_idx, dtype) * jnp.asarray(target_ppc + 1, dtype)
    )
    u = jnp.mod(seq * jnp.asarray(_R3, dtype)[None, :], 1.0)
    new_pos = jnp.stack([cx, cy, cz], axis=-1).astype(dtype) + 0.1 + 0.8 * u

    pos = jnp.where(fill[:, None], new_pos, state.pos)
    uvel = _velocity_at(vel, pos[:, 0], pos[:, 1], pos[:, 2])
    new_vel = jnp.stack(uvel, axis=-1)
    velp = jnp.where(fill[:, None], new_vel, state.vel)
    alive = jnp.where(fill, jnp.asarray(1.0, dtype), alive)
    return FlipState(pos=pos, vel=velp, alive=alive)


@partial(jax.jit, static_argnames=("grid", "params", "gravity_axis", "do_reseed"))
def flip_frame(
    grid: Grid,
    scene: Scene,
    state: FlipState,
    params: SolverParams,
    gravity: float = -9.8,
    gravity_axis: int = 2,
    alpha: float = 0.95,
    do_reseed: bool = False,
    frame_idx=0,
):
    """One FLIP frame.  Returns (scene', state', stats).  With `do_reseed`
    the frame ends with a kill + refill pass over the advected particles
    (see `reseed`) against the post-advection particle surface."""
    dtype = params.dtype
    dt = scene.dt
    dt_over_dx = dt / jnp.asarray(grid.dx, dtype)

    pvel, cov = p2g(state, grid, dtype)
    # faces no particle reaches keep the prior grid velocity (Houdini
    # keeps the previous field outside the particle band too)
    vel = tuple(jnp.where(cov[a] > 0, pvel[a], scene.velocity[a].astype(dtype)) for a in range(3))
    surf = surface_from_particles(state, grid, dtype=dtype)

    vel = list(vel)
    vel[gravity_axis] = vel[gravity_axis] + jnp.asarray(gravity, dtype) * dt
    vel_old = tuple(vel)
    scene = dataclasses.replace(scene, velocity=vel_old, surface_sdf=surf)

    new_vel, valid, stats = step(grid, scene, params)

    state = g2p_flip(state, vel_old, new_vel, alpha)
    state = advect_particles(state, new_vel, dt_over_dx, grid.res)
    if do_reseed:
        surf2 = surface_from_particles(state, grid, dtype=dtype)
        state = reseed(state, grid, surf2, new_vel, frame_idx)
    out = dataclasses.replace(scene, velocity=new_vel)
    return out, state, stats


def simulate_flip(
    grid: Grid,
    scene: Scene,
    params: SolverParams,
    frames: int,
    max_particles: int = 1 << 20,
    gravity: float = -9.8,
    alpha: float = 0.95,
    seed: int = 0,
    callback=None,
    do_reseed: bool = True,
):
    """Run `frames` FLIP frames from `scene` (particles seeded from its
    surface SDF).  Returns (final scene, final state, list of stats).
    Adaptive recycling (`reseed`) is on by default, matching the Houdini
    host loop the reference assumes."""
    state = seed_particles(grid, scene.surface_sdf, max_particles, seed=seed, dtype=params.dtype)
    all_stats = []
    for k in range(frames):
        scene, state, stats = flip_frame(
            grid, scene, state, params, gravity, alpha=alpha, do_reseed=do_reseed, frame_idx=k
        )
        all_stats.append({m: v for m, v in stats.items()})
        if callback is not None:
            callback(k, scene, state, stats)
    return scene, state, all_stats
