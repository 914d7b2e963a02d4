"""Semantic tests for the label pipeline (reference:
exec/HDK_PolyStokesSolver_Classifier.cpp)."""
import jax.numpy as jnp
import numpy as np

from polystokes_tpu import sdf
from polystokes_tpu.classify import (
    ACTIVEFLUID,
    BOUNDARY,
    REDUCED,
    SOLID,
    UNSOLVED,
    classify,
    is_active,
    is_reduced,
)
from polystokes_tpu.config import SolverParams
from polystokes_tpu.grid import Grid
from polystokes_tpu.weights import compute_weights


def run_classify(res=(14, 12, 12), tile=6, pad=2, reduced=True, solid_floor=False):
    grid = Grid(res=res, dx=1.0 / max(res))
    params = SolverParams(
        dtype=jnp.float64,
        do_reduced_regions=reduced,
        do_tile=True,
        tile_size=tile,
        tile_padding=pad,
    )
    surface = jnp.full(res, -1.0)
    if solid_floor:
        coll = sdf.sample_at_centers(sdf.plane((0, 0, 1.0), 0.2), res, grid.dx, jnp.float64)
    else:
        coll = jnp.full(res, 1.0)
    lw, fw = compute_weights(grid, surface, coll, jnp.float64)
    cls = classify(grid, lw, fw, params)
    return grid, params, cls, lw, fw


def test_all_liquid_tiled_structure():
    grid, params, cls, lw, fw = run_classify()
    lbl = np.asarray(cls.cell_labels)
    # no UNSOLVED / SOLID anywhere (everything liquid, no collision)
    assert np.all((lbl == ACTIVEFLUID) | (lbl == REDUCED))
    # the solid boundary band (domain border, width 2) is active
    assert np.all(lbl[:2] == ACTIVEFLUID) and np.all(lbl[-2:] == ACTIVEFLUID)
    # tile slabs (coordinate % 6 == 0) are active
    assert np.all(lbl[6, :, :] != REDUCED)
    assert np.all(lbl[:, 6, :] != REDUCED)
    # some interior is reduced
    assert np.any(lbl == REDUCED)
    # every reduced cell has a region id; actives don't
    reg = np.asarray(cls.cell_region)
    assert np.all(reg[lbl == REDUCED] >= 0)
    assert np.all(reg[lbl != REDUCED] < 0)
    assert int(cls.n_regions) >= 2
    assert not bool(cls.region_overflow)


def test_regions_have_min_extent():
    grid, params, cls, lw, fw = run_classify()
    lbl = np.asarray(cls.cell_labels)
    reg = np.asarray(cls.cell_region)
    for r in np.unique(reg[reg >= 0]):
        cells = np.argwhere(reg == r)
        ext = cells.max(axis=0) - cells.min(axis=0) + 1
        assert np.all(ext >= 4), f"region {r} extent {ext}"


def test_no_active_cell_touches_two_regions():
    """The invariant enforced by fixReducedRegionBoundaries."""
    grid, params, cls, lw, fw = run_classify()
    lbl = np.asarray(cls.cell_labels)
    reg = np.asarray(cls.cell_region)
    nx, ny, nz = grid.res
    for c in np.argwhere(lbl == ACTIVEFLUID):
        seen = set()
        for a in range(3):
            for d in (-1, 1):
                n = c.copy()
                n[a] += d
                if 0 <= n[a] < grid.res[a]:
                    if lbl[tuple(n)] == REDUCED:
                        seen.add(int(reg[tuple(n)]))
        assert len(seen) <= 1


def test_face_labels_follow_cells():
    grid, params, cls, lw, fw = run_classify()
    lbl = np.asarray(cls.cell_labels)
    for a in range(3):
        fl = np.asarray(cls.face_labels[a])
        fr = np.asarray(cls.face_region[a])
        # faces adjacent to a reduced cell are REDUCED with that region id
        for f in np.argwhere(fl == REDUCED):
            up = f.copy()
            lo = f.copy()
            lo[a] -= 1
            regs = []
            for c in (up, lo):
                if 0 <= c[a] < grid.res[a] and lbl[tuple(c)] == REDUCED:
                    regs.append(int(np.asarray(cls.cell_region)[tuple(c)]))
            assert regs, f"reduced face {f} with no reduced neighbor"
            assert fr[tuple(f)] in regs
        # active faces have no region id
        assert np.all(fr[fl == ACTIVEFLUID] < 0)


def test_edge_boundary_label_is_active_and_reduced():
    grid, params, cls, lw, fw = run_classify()
    found_boundary = False
    for e in range(3):
        el = np.asarray(cls.edge_labels[e])
        er = np.asarray(cls.edge_region[e])
        bnd = el == BOUNDARY
        found_boundary = found_boundary or bnd.any()
        # BOUNDARY edges carry a region id and count as active+reduced
        assert np.all(er[bnd] >= 0)
        assert np.all(er[el == REDUCED] >= 0)
    assert found_boundary


def test_solid_floor_labels():
    grid, params, cls, lw, fw = run_classify(solid_floor=True)
    lbl = np.asarray(cls.cell_labels)
    # bottom cells are SOLID (fluid weight == 0)
    assert np.all(lbl[:, :, 0] == SOLID)
    # cells just above the solid are active (solid boundary band)
    k = int(np.argwhere(np.asarray(lw["center"])[7, 7] >= 0).min())
    solid_top = np.max(np.argwhere(lbl[7, 7] == SOLID))
    assert lbl[7, 7, solid_top + 1] == ACTIVEFLUID
    assert lbl[7, 7, solid_top + 2] == ACTIVEFLUID


def test_uniform_mode_no_regions():
    grid, params, cls, lw, fw = run_classify(reduced=False)
    lbl = np.asarray(cls.cell_labels)
    assert not np.any(lbl == REDUCED)
    assert int(cls.n_regions) == 0
