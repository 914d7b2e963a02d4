"""Two disconnected interior blobs inside one tile cube: the tiled path
keeps only one region per cube (the other blob demotes to uniform DOFs)."""
import jax.numpy as jnp
import numpy as np

from polystokes_tpu import Scene, SolverParams, step
from polystokes_tpu import sdf
from polystokes_tpu.classify import REDUCED, classify
from polystokes_tpu.config import SolverParams
from polystokes_tpu.grid import Grid
from polystokes_tpu.weights import compute_weights


def test_two_blobs_one_cube():
    # one 24^3 cube (tile 24) containing two separated liquid blobs, each
    # big enough to have a >=4-wide interior after bands
    n = 24
    grid = Grid(res=(n, n, n), dx=1.0 / n)
    params = SolverParams(
        dtype=jnp.float64,
        do_tile=True,
        tile_size=24,
        tile_padding=1,
        liquid_boundary_layer_size=2,
        solid_boundary_layer_size=2,
    )
    blob1 = sdf.box((0.05, 0.05, 0.05), (0.95, 0.95, 0.42))
    blob2 = sdf.box((0.05, 0.05, 0.58), (0.95, 0.95, 0.95))
    surf = sdf.sample_at_centers(sdf.union(blob1, blob2), grid.res, grid.dx, jnp.float64)
    coll = jnp.full(grid.res, 1.0)
    lw, fw = compute_weights(grid, surf, coll, jnp.float64)
    cls = classify(grid, lw, fw, params)

    lbl = np.asarray(cls.cell_labels)
    reg = np.asarray(cls.cell_region)
    regions = np.unique(reg[reg >= 0])
    # exactly one region survives in the single cube
    assert int(cls.n_regions) == 1
    assert len(regions) == 1
    # the surviving region is one connected blob (all its cells in one
    # z-halfspace)
    zs = np.argwhere(reg == regions[0])[:, 2]
    assert zs.max() < n // 2 or zs.min() >= n // 2
    # the other blob's interior stays solvable as uniform DOFs
    assert np.any(lbl == 3)  # ACTIVEFLUID
