"""A-DEF2 deflation (deflation.py): coarse operator correctness against
the explicit sparse system, and the iteration-count win it exists for.

The coarse space is per-cube constants of the 7 solve families; the lab
numbers this is validated against: benchmarks/diag_spectrum.py --adef2
(419 iters vs 525 arrow-only at 32^3 fp64 — a ~15-20% cut)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polystokes_tpu import SolverParams, step
from polystokes_tpu.classify import classify, effective_max_regions, is_active
from polystokes_tpu.config import PreconditionerType
from polystokes_tpu.scenes.builders import honey_coil
from polystokes_tpu.solver import _make_deflation, assemble
from polystokes_tpu.weights import compute_weights

BASE = dict(
    do_reduced_regions=True,
    do_tile=True,
    tile_size=8,
    tile_padding=2,
    preconditioner=PreconditionerType.CELL_ARROW,
    bicgstab_fallback=False,
    use_pallas=False,
    dtype=jnp.float64,
)


@pytest.mark.quick
def test_coarse_operator_matches_explicit():
    """Device-built E == W^T (-A) W with the explicit schur matrix."""
    import scipy.sparse as sp

    from polystokes_tpu.export import ExplicitOperators

    params = SolverParams(**BASE, deflation=True)
    grid, scene = honey_coil(n=16, dtype=jnp.float64)
    R = effective_max_regions(grid, params)
    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    cls = classify(grid, lw, fw, params)
    asm, _ = assemble(grid, scene, cls, lw, fw, params, R)

    defl = _make_deflation(grid, cls, asm, params)
    assert defl is not None
    T, cs = defl.tile, defl.cs
    nc = cs[0] * cs[1] * cs[2]

    ops = ExplicitOperators(grid, cls, asm, params)
    A = ops.schur_matrix().tocsr()
    n = ops.nP + ops.nS

    # W in the explicit DOF layout, mirroring the packed slot convention
    # (edge natural index g >= 1 -> slot g-1; the dropped index-0 planes
    # carry no DOFs for interior scenes)
    rows, cols = [], []

    def cube_flat(ci, cj, ck):
        return (ci * cs[1] + cj) * cs[2] + ck

    ci3 = np.nonzero(np.asarray(ops.cell_idx) >= 0)
    cell_ids = np.asarray(ops.cell_idx)[ci3]
    cell_cube = cube_flat(ci3[0] // T, ci3[1] // T, ci3[2] // T)
    for fam in range(4):  # p, tau_xx, tau_yy, tau_zz
        off = 0 if fam == 0 else ops.nP + (fam - 1) * ops.nP
        rows.append(off + cell_ids)
        cols.append(fam * nc + cell_cube)
    from polystokes_tpu.grid import EDGE_OFFSET_AXES

    for e in range(3):
        ei3 = np.nonzero(np.asarray(ops.edge_idx[e]) >= 0)
        ids = np.asarray(ops.edge_idx[e])[ei3]
        off = ops.nP + 3 * ops.nP + sum(ops.nE[:e])
        p_ax, q_ax = EDGE_OFFSET_AXES[e]
        coord = [ei3[0].copy(), ei3[1].copy(), ei3[2].copy()]
        keep = (coord[p_ax] >= 1) & (coord[q_ax] >= 1)
        coord = [c[keep] for c in coord]
        coord[p_ax] = coord[p_ax] - 1
        coord[q_ax] = coord[q_ax] - 1
        rows.append(off + ids[keep])
        cols.append((4 + e) * nc + cube_flat(coord[0] // T, coord[1] // T, coord[2] // T))
    W = sp.coo_matrix(
        (np.ones(sum(len(r) for r in rows)), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, 7 * nc),
    ).tocsr()
    E_ref = -(W.T @ A @ W).toarray()
    E_dev = np.asarray(defl.e)
    assert np.allclose(E_dev, E_ref, rtol=1e-9, atol=1e-9 * max(1.0, np.abs(E_ref).max()))


def test_deflation_cuts_iterations_and_matches():
    """Deflated CG converges in measurably fewer iterations (~15% on this
    case; 361 -> 310 at the time of writing) and to the same solution."""
    grid, scene = honey_coil(n=24, dtype=jnp.float64)
    res = {}
    for defl in (False, True):
        p = SolverParams(**BASE, max_iterations=4000, deflation=defl)
        vel, valid, stats = step(grid, scene, p)
        assert bool(stats["converged"])
        res[defl] = (int(stats["iterations"]), vel)
    it_plain, vel_plain = res[False]
    it_defl, vel_defl = res[True]
    assert it_defl < 0.95 * it_plain, (it_defl, it_plain)
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(vel_defl[a]), np.asarray(vel_plain[a]), rtol=0, atol=2e-2
        )


@pytest.mark.quick
def test_guess_projection_zeroes_coarse_residual():
    from polystokes_tpu.deflation import _restrict, deflate_guess_packed
    from polystokes_tpu.pallas_apply import pack_ptau
    from polystokes_tpu.solver import build_rhs, make_apply

    params = SolverParams(**BASE, deflation=True)
    grid, scene = honey_coil(n=16, dtype=jnp.float64)
    R = effective_max_regions(grid, params)
    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    cls = classify(grid, lw, fw, params)
    asm, _ = assemble(grid, scene, cls, lw, fw, params, R)
    defl = _make_deflation(grid, cls, asm, params)
    inner = make_apply(grid, cls, asm, params, R)

    from polystokes_tpu.pallas_apply import unpack_ptau

    def ap(xp):
        return pack_ptau(inner(unpack_ptau(xp)))

    b = pack_ptau(build_rhs(grid, cls, asm, params, R))
    x0 = deflate_guess_packed(defl, ap, b, jnp.zeros_like(b))
    q = _restrict(b - ap(x0), defl.masks, defl.cs, defl.tile)
    scale = float(jnp.linalg.norm(_restrict(b, defl.masks, defl.cs, defl.tile)))
    assert float(jnp.linalg.norm(q)) <= 1e-8 * max(scale, 1.0)
