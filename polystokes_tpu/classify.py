"""Grid classification: material labels, boundary bands, tiles, regions.

TPU-native re-design of the reference classifier
(exec/HDK_PolyStokesSolver_Classifier.cpp, 1794 LoC).  The reference's
serial BFS flood fills become iterated masked dilations; Houdini's
connected-component builder becomes iterative min-label propagation; the
serial region-boundary fix becomes a bounded fixed-point sweep; DOF
numbering is replaced by masks (the solver is matrix-free).

Label values (semantics match lib/include/units.h:55-66):
  UNSOLVED     — not in the solve
  SOLID        — inside collision geometry
  GENERICFLUID — in-solve, not yet split into active/reduced
  ACTIVEFLUID  — full grid DOFs
  REDUCED      — represented by a region polynomial
  BOUNDARY     — edges only: simultaneously active and reduced
                 (exec/HDK_PolyStokesSolver.h:708-716)
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SolverParams
from .grid import Grid, shift

# numpy scalars, NOT jnp: module-level jnp scalars initialize the JAX
# backend at import time, before the CLI can select a platform (with the
# axon remote-TPU shim registered, `JAX_PLATFORMS=cpu python -m
# polystokes_tpu.run` would initialize — and hang on — the remote
# backend).  numpy scalars behave identically inside traced expressions.
UNSOLVED = np.int8(0)
SOLID = np.int8(1)
GENERICFLUID = np.int8(2)
ACTIVEFLUID = np.int8(3)
REDUCED = np.int8(4)
BOUNDARY = np.int8(5)

INVALID_REGION = np.int32(-1)


def is_active(lbl):
    return (lbl == ACTIVEFLUID) | (lbl == BOUNDARY)


def is_reduced(lbl):
    return (lbl == REDUCED) | (lbl == BOUNDARY)


def is_solved(lbl):
    return (lbl == GENERICFLUID) | (lbl == ACTIVEFLUID) | (lbl == REDUCED) | (lbl == BOUNDARY)


def lower_faces(face_arr, axis):
    """Center-shaped view of each cell's lower face (face index == cell index)."""
    n = face_arr.shape[axis] - 1
    sl = [slice(None)] * 3
    sl[axis] = slice(0, n)
    return face_arr[tuple(sl)]


def upper_faces(face_arr, axis):
    """Center-shaped view of each cell's upper face (face index == cell index + 1)."""
    sl = [slice(None)] * 3
    sl[axis] = slice(1, None)
    return face_arr[tuple(sl)]


def _unit(axis, d):
    v = [0, 0, 0]
    v[axis] = d
    return tuple(v)


# ---------------------------------------------------------------------------
# Cell classification (reference: classifyCells, Classifier.cpp:57-128)
# ---------------------------------------------------------------------------

def classify_cells(liquid_w, fluid_w) -> jnp.ndarray:
    """UNSOLVED / SOLID / GENERICFLUID from the integration weights.

    A cell is in-solve if its center liquid weight > 0 or any adjacent face
    liquid weight > 0; it is SOLID if its center fluid weight == 0.
    """
    in_solve = liquid_w["center"] > 0
    for a in range(3):
        fw = liquid_w[f"face{a}"]
        in_solve = in_solve | (lower_faces(fw, a) > 0) | (upper_faces(fw, a) > 0)
    solid = fluid_w["center"] == 0
    labels = jnp.where(in_solve, jnp.where(solid, SOLID, GENERICFLUID), UNSOLVED)
    return labels.astype(jnp.int8)


# ---------------------------------------------------------------------------
# Boundary bands (reference: constructAirBoundaryLayer /
# constructSolidBoundaryLayer, Classifier.cpp:292-703)
# ---------------------------------------------------------------------------

def _frontier_neighbors(frontier, liquid_w):
    """Cells face-adjacent to `frontier` across faces with liquid weight > 0."""
    out = jnp.zeros_like(frontier)
    for a in range(3):
        fw = liquid_w[f"face{a}"]
        lo_ok = lower_faces(fw, a) > 0
        hi_ok = upper_faces(fw, a) > 0
        out = out | (shift(frontier, _unit(a, -1)) & lo_ok)
        out = out | (shift(frontier, _unit(a, 1)) & hi_ok)
    return out


def construct_air_boundary_layer(labels, liquid_w, n_layers: int):
    """Flood ACTIVEFLUID inward from the liquid/air boundary.

    Matches the reference loop structure exactly: the loop body runs
    ``n_layers - 1`` times (Classifier.cpp:331-361), so the default
    ``activeLiquidBoundaryLayerSize = 2`` produces one converted layer.
    """
    generic = labels == GENERICFLUID
    unsolved_nb = jnp.zeros_like(generic)
    weight_lt1 = jnp.zeros_like(generic)
    is_unsolved = labels == UNSOLVED
    for a in range(3):
        # adjacent UNSOLVED cell (out-of-range neighbors don't count)
        unsolved_nb = unsolved_nb | shift(is_unsolved, _unit(a, -1)) | shift(is_unsolved, _unit(a, 1))
        fw = liquid_w[f"face{a}"]
        weight_lt1 = weight_lt1 | (lower_faces(fw, a) < 1.0) | (upper_faces(fw, a) < 1.0)
    frontier = generic & (unsolved_nb | weight_lt1)

    for layer in range(n_layers - 1):
        labels = jnp.where(frontier, ACTIVEFLUID, labels)
        if layer < n_layers - 2:
            generic = labels == GENERICFLUID
            frontier = generic & _frontier_neighbors(frontier, liquid_w)
    return labels


def construct_solid_boundary_layer(labels, liquid_w, n_layers: int):
    """Flood ACTIVEFLUID inward from solid contact (and the domain border),
    with a visited mask so the band can pass through already-active cells
    (Classifier.cpp:511-703)."""
    fluid_like = (labels == GENERICFLUID) | (labels == ACTIVEFLUID)
    is_solid = labels == SOLID
    near_solid = jnp.zeros_like(fluid_like)
    at_border = jnp.zeros_like(fluid_like)
    for a in range(3):
        near_solid = near_solid | shift(is_solid, _unit(a, -1)) | shift(is_solid, _unit(a, 1))
        idx = jnp.arange(labels.shape[a])
        bord = (idx == 0) | (idx == labels.shape[a] - 1)
        at_border = at_border | bord.reshape([-1 if i == a else 1 for i in range(3)])
    frontier = fluid_like & (near_solid | at_border)

    visited = jnp.zeros_like(frontier)
    for layer in range(n_layers):
        labels = jnp.where(frontier, ACTIVEFLUID, labels)
        visited = visited | frontier
        if layer < n_layers - 1:
            cand = (labels == GENERICFLUID) | (labels == ACTIVEFLUID)
            frontier = ~visited & cand & _frontier_neighbors(frontier, liquid_w)
    return labels


def construct_tiles(labels, tile_size: int, tile_padding: int):
    """Slice the interior into cubes: GENERICFLUID cells whose i, j or k
    falls in [0, padding) mod tile_size become ACTIVEFLUID
    (Classifier.cpp:706-746)."""
    in_pad = jnp.zeros(labels.shape, dtype=bool)
    for a in range(3):
        idx = jnp.arange(labels.shape[a]) % tile_size < tile_padding
        in_pad = in_pad | idx.reshape([-1 if i == a else 1 for i in range(3)])
    return jnp.where((labels == GENERICFLUID) & in_pad, ACTIVEFLUID, labels)


def construct_reduced_regions(labels, liquid_w, params: SolverParams):
    """GENERICFLUID -> ACTIVEFLUID (bands, tiles) or REDUCED (interior).

    Reference: constructReducedRegions, Classifier.cpp:180-190.
    """
    labels = construct_air_boundary_layer(labels, liquid_w, params.liquid_boundary_layer_size)
    labels = construct_solid_boundary_layer(labels, liquid_w, params.solid_boundary_layer_size)
    if params.do_tile:
        labels = construct_tiles(labels, params.tile_size, params.tile_padding)
    labels = jnp.where(labels == GENERICFLUID, REDUCED, labels)
    return labels


# ---------------------------------------------------------------------------
# Connected components (replaces SIM_VolumetricConnectedComponentBuilder,
# Classifier.cpp:218-239): iterative min-label propagation between REDUCED
# cells whose shared face has liquid weight > 0.
# ---------------------------------------------------------------------------

def connected_components(labels, liquid_w, max_iters: int):
    """Return per-cell component label (min linear index in component; -1
    where not REDUCED).

    TPU-native run-scan propagation: each outer sweep spreads the
    component minimum across ENTIRE straight runs of connected cells on
    every axis via bidirectional distance-doubling (log2(n) shift/min
    steps per axis — pure pads/slices and VPU mins, zero gathers; a
    general gather of the full grid runs ~1000x below HBM streaming rate
    on TPU, see sim.advect_field).  Convergence therefore takes
    O(path bends) outer sweeps — geometry complexity, NOT component
    diameter — bounded by `max_iters` (an un-merged component then splits
    into several regions, each still valid: the conservative direction);
    with tiling on, components are confined to tile cubes and converge in
    a few sweeps."""
    red = labels == REDUCED
    n = labels.size
    big = jnp.int32(n)
    lin = jnp.arange(n, dtype=jnp.int32).reshape(labels.shape)
    comp0 = jnp.where(red, lin, big)

    # link_lo[a][i] = cell i is connected to its lower axis-a neighbor
    # (both REDUCED, shared face has liquid weight > 0)
    link_lo = []
    for a in range(3):
        fw = liquid_w[f"face{a}"]
        link_lo.append(red & shift(red, _unit(a, -1), fill=False) & (lower_faces(fw, a) > 0))

    def _run_min(m, a):
        """min over each cell's maximal connected run along axis a."""
        fdn = link_lo[a]                                  # span to i-d all linked
        fup = shift(link_lo[a], _unit(a, 1), fill=False)  # span to i+d all linked
        d = 1
        na = m.shape[a]
        while d < na:
            dn = shift(m, _unit(a, -d), fill=n)
            up = shift(m, _unit(a, d), fill=n)
            m = jnp.minimum(m, jnp.where(fdn, dn, big))
            m = jnp.minimum(m, jnp.where(fup, up, big))
            fdn = fdn & shift(fdn, _unit(a, -d), fill=False)
            fup = fup & shift(fup, _unit(a, d), fill=False)
            d *= 2
        return m

    def body(state):
        comp, _, k = state
        new = comp
        for a in range(3):
            new = _run_min(new, a)
        changed = jnp.any(new != comp)
        return new, changed, k + 1

    def cond(state):
        return state[1] & (state[2] < max_iters)

    comp, _, _ = jax.lax.while_loop(cond, body, (comp0, jnp.bool_(True), jnp.int32(0)))
    return jnp.where(red, comp, INVALID_REGION)


def connected_components_callback(labels, liquid_w):
    """Host-side union-find CC (native/polystokes_native.cpp) wired into
    the jitted pipeline via jax.pure_callback — the O(N α(N)) alternative
    to the O(diameter) device propagation for large UNTILED domains (the
    reference uses Houdini's host CC builder, Classifier.cpp:218-239).
    Opt-in via SolverParams.cc_host_callback; produces the same partition
    as `connected_components` up to component relabeling (compact_regions
    is label-agnostic)."""
    import numpy as np

    shape = labels.shape

    def host_cc(lbl, fwx, fwy, fwz):
        from .native import connected_components_host

        res = connected_components_host(
            np.asarray(lbl), np.asarray(fwx), np.asarray(fwy), np.asarray(fwz)
        )
        if res is None:  # native lib unavailable: pure-numpy union-find
            return _numpy_cc(np.asarray(lbl), np.asarray(fwx), np.asarray(fwy), np.asarray(fwz))
        return res[0].astype(np.int32)

    out_shape = jax.ShapeDtypeStruct(shape, jnp.int32)
    return jax.pure_callback(
        host_cc,
        out_shape,
        labels,
        liquid_w["face0"],
        liquid_w["face1"],
        liquid_w["face2"],
        vmap_method="sequential",
    )


def _numpy_cc(labels, fwx, fwy, fwz):
    """scipy fallback union-find when the native .so cannot be built."""
    import numpy as np
    from scipy import ndimage

    red = labels == int(REDUCED)
    # connectivity only across faces with positive liquid weight: emulate
    # by severing cells whose shared face has zero weight — scipy's label
    # uses full 6-connectivity, so handle the (rare) zero-weight-face case
    # by a manual union-find sweep instead when any such face exists
    interior_x = fwx[1:-1] > 0
    interior_y = fwy[:, 1:-1] > 0
    interior_z = fwz[:, :, 1:-1] > 0
    if interior_x.all() and interior_y.all() and interior_z.all():
        lab, _n = ndimage.label(red)
        return np.where(red, lab - 1, -1).astype(np.int32)
    n = labels.size
    parent = np.arange(n, dtype=np.int64)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    idx = np.arange(n).reshape(labels.shape)
    for a, fw in ((0, fwx), (1, fwy), (2, fwz)):
        sl_lo = [slice(None)] * 3
        sl_lo[a] = slice(0, labels.shape[a] - 1)
        sl_hi = [slice(None)] * 3
        sl_hi[a] = slice(1, labels.shape[a])
        sl_f = [slice(None)] * 3
        sl_f[a] = slice(1, labels.shape[a])
        ok = red[tuple(sl_lo)] & red[tuple(sl_hi)] & (fw[tuple(sl_f)] > 0)
        lo = idx[tuple(sl_lo)][ok]
        hi = idx[tuple(sl_hi)][ok]
        for i, j in zip(lo.ravel(), hi.ravel()):
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
    roots = np.array([find(i) for i in range(n)]).reshape(labels.shape)
    return np.where(red, roots, -1).astype(np.int32)


def compact_regions(comp, max_regions: int):
    """Map arbitrary component labels to dense region slots [0, max_regions).

    Component labels are min-linear-indices in [0, comp.size) (the CC
    propagation's fixed point), so the dense relabel is a presence
    scatter + prefix sum over the linear index space — replacing the
    former jnp.unique sort, which cost ~1.5 s alone at 256^3 (the full
    16.7M-element sort dominated classify).  Slot order (increasing
    component label) matches the sorted order the unique path produced.

    Returns (region_ids, region_valid, n_regions, overflowed).
    """
    n = comp.size
    flat = comp.ravel()
    ok = flat >= 0
    # presence flags over the linear index space; scatter then prefix-sum
    present = jnp.zeros((n,), jnp.int32).at[jnp.where(ok, flat, 0)].max(ok.astype(jnp.int32))
    first_rank = jnp.cumsum(present) - present  # rank of each label value
    n_regions_total = first_rank[-1] + present[-1]
    pos = first_rank[jnp.clip(flat, 0, n - 1)].reshape(comp.shape)
    region_ids = jnp.where((comp >= 0) & (pos < max_regions), pos.astype(jnp.int32), INVALID_REGION)
    n_regions = jnp.minimum(n_regions_total, max_regions).astype(jnp.int32)
    region_valid = jnp.arange(max_regions, dtype=jnp.int32) < n_regions
    # overflow: some component label didn't fit into max_regions slots
    overflowed = n_regions_total > max_regions
    return region_ids, region_valid, n_regions, overflowed


# ---------------------------------------------------------------------------
# Region hygiene (reference: fixReducedRegionBoundaries,
# Classifier.cpp:1074-1172 and fixSmallReducedRegions, :1175-1262)
# ---------------------------------------------------------------------------

def fix_region_boundaries(labels, region_ids, max_iters: int):
    """Ensure no ACTIVEFLUID cell touches two different reduced regions:
    wherever one does, demote *all* its REDUCED neighbors to ACTIVEFLUID.
    Bounded fixed-point iteration of the reference's serial sweep."""

    def body(i, state):
        labels, region_ids = state
        red = labels == REDUCED
        reg = jnp.where(red, region_ids, INVALID_REGION)
        big = jnp.int32(2**30)
        mn = jnp.full(labels.shape, big, dtype=jnp.int32)
        mx = jnp.full(labels.shape, -1, dtype=jnp.int32)
        for a in range(3):
            for d in (-1, 1):
                nb = shift(reg, _unit(a, d), fill=-1)
                mn = jnp.minimum(mn, jnp.where(nb >= 0, nb, big))
                mx = jnp.maximum(mx, nb)
        bad = (labels == ACTIVEFLUID) & (mx >= 0) & (mn != mx)
        # demote reduced neighbors of bad cells
        demote = jnp.zeros(labels.shape, dtype=bool)
        for a in range(3):
            for d in (-1, 1):
                demote = demote | shift(bad, _unit(a, d))
        demote = demote & red
        labels = jnp.where(demote, ACTIVEFLUID, labels)
        region_ids = jnp.where(demote, INVALID_REGION, region_ids)
        return labels, region_ids

    return jax.lax.fori_loop(0, max_iters, body, (labels, region_ids))


def cube_shape(res, tile_size: int):
    return tuple(-(-n // tile_size) for n in res)


def cell_cube_ids(shape, tile_size: int):
    """Flattened tile-cube id per cell."""
    cs = cube_shape(shape, tile_size)
    idx = None
    for a in range(3):
        c = (jnp.arange(shape[a], dtype=jnp.int32) // tile_size).reshape(
            [-1 if i == a else 1 for i in range(3)]
        )
        idx = c if idx is None else idx * cs[a] + c
    return idx, cs


def _cube_min(arr, tile_size: int, cs, fill):
    """Per-cube min of a cell array -> [ncubes], axis-at-a-time reshape
    reductions (no scatter; the cube-reduction analog of
    reduced.block_sum).  `fill` pads ragged extents."""
    x = arr
    pads = [(0, cs[i] * tile_size - x.shape[i]) for i in range(3)]
    if any(p[1] for p in pads):
        x = jnp.pad(x, pads, constant_values=fill)
    T = tile_size
    x = x.reshape(cs[0] * T, cs[1] * T, cs[2], T).min(axis=3)
    x = x.reshape(cs[0] * T, cs[1], T, cs[2]).min(axis=2)
    x = x.reshape(cs[0], T, cs[1], cs[2]).min(axis=1)
    return x.reshape(cs[0] * cs[1] * cs[2])


def enforce_one_region_per_cube(labels, region_ids, region_valid, tile_size: int, max_regions: int):
    """Cube-alignment hygiene: keep only the lowest-id region per tile
    cube and demote the rest to ACTIVEFLUID.  This enables the dense
    per-cube (scatter-free) reduction path while keeping the Galerkin
    spaces exact; the reference would keep the extra components as
    separate regions — here they simply stay uniform DOFs.

    With tiling on, every region is confined to one tile cube (the
    padding slabs separate cubes), so only extra disconnected components
    inside a cube are demoted.  With tiling OFF (general regions), a
    region freely spans many cubes — a region keeps all its cells unless
    a LOWER-id region shares one of its cubes, in which case only the
    cells inside that shared cube are demoted.  Correctness of the
    per-cube J coupling then follows from fix_region_boundaries: a
    REDUCED face always has both adjacent cells in the same region, and
    its slot cube (the lower cell's cube) keeps exactly that region."""
    red = labels == REDUCED
    cubes, cs = cell_cube_ids(labels.shape, tile_size)
    ncubes = cs[0] * cs[1] * cs[2]
    big = jnp.int32(2**30)
    # per-cube min region id: a pure reshape reduction (the former
    # cell-level segment_min scattered 16.7M entries at 256^3)
    cube_min = _cube_min(jnp.where(red, region_ids, big), tile_size, cs, big)
    keep_reg = cube_min[cubes]  # per-cell: the cube's kept region id
    demote = red & (region_ids != keep_reg)
    labels = jnp.where(demote, ACTIVEFLUID, labels)
    region_ids = jnp.where(demote, INVALID_REGION, region_ids)

    # a region survives iff it still has cells == iff it is some cube's
    # kept (min) region: scatter over the tiny cube array, not the cells.
    # cube_min can be INVALID_REGION (-1) when every red cell in the cube
    # carries an invalid id (region overflow); such cubes must not mark
    # slot 0 present
    kept_ok = (cube_min >= 0) & (cube_min < big)
    present = jnp.zeros((max_regions,), jnp.int32).at[
        jnp.where(kept_ok, jnp.clip(cube_min, 0, max_regions - 1), 0)
    ].max(kept_ok.astype(jnp.int32))
    region_valid = region_valid & (present > 0)

    # region slot per cube (-1 when the cube has no region)
    region_of_cube = jnp.where(kept_ok, cube_min, INVALID_REGION)
    return labels, region_ids, region_valid, region_of_cube


def fix_small_regions(labels, region_ids, region_valid, max_regions: int):
    """Remove regions thinner than 4 cells in any axis (reference keeps a
    region only if bbox extent >= 4: `min > max-3` -> remove)."""
    red = labels == REDUCED
    seg = jnp.where(red, region_ids, max_regions).ravel()
    big = jnp.int32(2**30)
    # one segment_min over a [N, 6] stack of (coord, -coord) per axis in
    # place of six independent cell-level segment passes (each paid its
    # own 16.7M-element scatter at 256^3)
    cols = []
    for a in range(3):
        coord = jnp.arange(labels.shape[a], dtype=jnp.int32).reshape(
            [-1 if i == a else 1 for i in range(3)]
        )
        coord = jnp.broadcast_to(coord, labels.shape).ravel()
        cols.append(jnp.where(red.ravel(), coord, big))
        cols.append(jnp.where(red.ravel(), -coord, big))
    stacked = jnp.stack(cols, axis=-1)  # [N, 6]
    ext = jax.ops.segment_min(stacked, seg, num_segments=max_regions + 1)[:max_regions]
    remove = jnp.zeros((max_regions,), dtype=bool)
    for a in range(3):
        mn, neg_mx = ext[:, 2 * a], ext[:, 2 * a + 1]
        remove = remove | ((-neg_mx) - mn + 1 <= 3)
    remove = remove & region_valid
    region_valid = region_valid & ~remove

    cell_remove = red & (region_ids >= 0) & remove[jnp.clip(region_ids, 0, max_regions - 1)]
    labels = jnp.where(cell_remove, ACTIVEFLUID, labels)
    region_ids = jnp.where(cell_remove, INVALID_REGION, region_ids)
    return labels, region_ids, region_valid


# ---------------------------------------------------------------------------
# Face / edge classification (reference: Classifier.cpp:752-1067)
# ---------------------------------------------------------------------------

def classify_faces(liquid_w, fluid_w, axis: int) -> jnp.ndarray:
    """findFaceLabelFromCenter (Classifier.cpp:784-832): a face is in the
    system if either adjacent cell's center liquid weight > 0 or any of the
    4 surrounding edges' liquid weight > 0; in-system faces are SOLID if
    the face fluid weight < 0.5, else GENERICFLUID."""
    cw = liquid_w["center"]
    pad = [(0, 0)] * 3
    pad[axis] = (1, 1)
    cw_p = jnp.pad(cw, pad, constant_values=0.0)
    n = cw.shape[axis]

    def sl(start):
        s = [slice(None)] * 3
        s[axis] = slice(start, start + n + 1)
        return tuple(s)

    active = (cw_p[sl(0)] > 0) | (cw_p[sl(1)] > 0)

    # surrounding edges: for face axis a and edge family e != a the two
    # edges are at offsets 0 and +1 along t = 3 - a - e of the edge array.
    for e in range(3):
        if e == axis:
            continue
        t = 3 - axis - e
        ew = liquid_w[f"edge{e}"]
        # edge array has +1 extent along t relative to the face array
        n_t = ew.shape[t] - 1
        s0 = [slice(None)] * 3
        s0[t] = slice(0, n_t)
        s1 = [slice(None)] * 3
        s1[t] = slice(1, n_t + 1)
        active = active | (ew[tuple(s0)] > 0) | (ew[tuple(s1)] > 0)

    fw = fluid_w[f"face{axis}"]
    labels = jnp.where(active, jnp.where(fw < 0.5, SOLID, GENERICFLUID), UNSOLVED)
    return labels.astype(jnp.int8)


def classify_edges(liquid_w, fluid_w, edge_axis: int) -> jnp.ndarray:
    """findEdgeLabelFromFaceAlt (Classifier.cpp:1021-1067): an edge is
    GENERICFLUID iff its own liquid and fluid weights are nonzero and all 4
    surrounding face liquid weights are nonzero; otherwise UNSOLVED."""
    e = edge_axis
    ew_l = liquid_w[f"edge{e}"]
    ew_f = fluid_w[f"edge{e}"]
    ok = (ew_l > 0) & (ew_f > 0)
    from .grid import EDGE_OFFSET_AXES

    p, q = EDGE_OFFSET_AXES[e]
    # surrounding faces: the two face families with axes p and q.  For the
    # face family with axis p, the two faces neighbor the edge along q:
    # face = edge - {0,1}*e_q (gives edge-shaped views of the face array,
    # padded with 0 outside).
    for fa, other in ((p, q), (q, p)):
        fw = liquid_w[f"face{fa}"]
        # face array extent along `other` is n, edge array extent is n+1
        pad = [(0, 0)] * 3
        pad[other] = (1, 1)
        fw_p = jnp.pad(fw, pad, constant_values=0.0)
        n_o = fw.shape[other]

        def sl(start):
            s = [slice(None)] * 3
            s[other] = slice(start, start + n_o + 1)
            return tuple(s)

        ok = ok & (fw_p[sl(0)] > 0) & (fw_p[sl(1)] > 0)
    return jnp.where(ok, GENERICFLUID, UNSOLVED).astype(jnp.int8)


# ---------------------------------------------------------------------------
# Reduced index propagation to faces and edges
# (reference: Classifier.cpp:1473-1732)
# ---------------------------------------------------------------------------

def _demote_foreign_cube_faces(face_labels, face_region, region_of_cube, tile_size: int, axis: int, res):
    """Relabel REDUCED faces whose slot cube's kept region differs from
    the face's own region (see classify() untiled branch) as ACTIVEFLUID."""
    cs = cube_shape(res, tile_size)
    roc3 = region_of_cube.reshape(cs)
    shape = face_labels.shape
    idx = []
    for i in range(3):
        c = jnp.arange(shape[i], dtype=jnp.int32)
        if i == axis:
            c = c - 1  # slot = lower adjacent cell; natural 0 -> outside
        idx.append(jnp.clip(c // tile_size, 0, cs[i] - 1).reshape([-1 if j == i else 1 for j in range(3)]))
    cube_reg = roc3[idx[0], idx[1], idx[2]]
    outside = (jnp.arange(shape[axis], dtype=jnp.int32) == 0).reshape([-1 if j == axis else 1 for j in range(3)])
    bad = (face_labels == REDUCED) & ((face_region != cube_reg) | outside)
    new_labels = jnp.where(bad, ACTIVEFLUID, face_labels)
    new_region = jnp.where(bad, INVALID_REGION, face_region)
    return new_labels.astype(jnp.int8), new_region.astype(jnp.int32)


def face_reduced_indices(cell_labels, cell_region, face_labels, axis: int):
    """A face whose adjacent cell is REDUCED inherits that cell's region id
    (preferring the upper cell, findFaceReducedIndexFromCenter,
    Classifier.cpp:1498-1528) and is relabeled REDUCED."""
    red = cell_labels == REDUCED
    reg = jnp.where(red, cell_region, INVALID_REGION)
    pad = [(0, 0)] * 3
    pad[axis] = (1, 1)
    reg_p = jnp.pad(reg, pad, constant_values=INVALID_REGION)
    n = cell_labels.shape[axis]

    def sl(start):
        s = [slice(None)] * 3
        s[axis] = slice(start, start + n + 1)
        return tuple(s)

    upper = reg_p[sl(1)]  # cell at face index (upper side)
    lower = reg_p[sl(0)]  # cell at face index - 1
    idx = jnp.where(upper >= 0, upper, lower)
    new_labels = jnp.where(idx >= 0, REDUCED, face_labels)
    return new_labels.astype(jnp.int8), idx.astype(jnp.int32)


def edge_reduced_indices(face_labels, face_regions, edge_labels, edge_axis: int):
    """Edges with all 4 surrounding faces REDUCED become REDUCED; with some
    (but not all) REDUCED become BOUNDARY.  The region id is taken from the
    reference's priority order (Classifier.cpp:1534-1659)."""
    from .grid import EDGE_OFFSET_AXES

    e = edge_axis
    p, q = EDGE_OFFSET_AXES[e]

    def face_views(fa, other):
        """Two edge-shaped views (offsets 0 and -1 along `other`) of face
        family `fa`'s labels and regions."""
        fl = face_labels[fa]
        fr = face_regions[fa]
        pad = [(0, 0)] * 3
        pad[other] = (1, 1)
        fl_p = jnp.pad(fl, pad, constant_values=UNSOLVED)
        fr_p = jnp.pad(fr, pad, constant_values=INVALID_REGION)
        n_o = fl.shape[other]

        def sl(start):
            s = [slice(None)] * 3
            s[other] = slice(start, start + n_o + 1)
            return tuple(s)

        return (fl_p[sl(1)], fr_p[sl(1)]), (fl_p[sl(0)], fr_p[sl(0)])

    # Priority order per reference: EDGEXY (e=2, p=0(x), q=1(y)):
    #   faceX(i,j,k), faceX(i,j-1,k), faceY(i,j,k), faceY(i-1,j,k)
    # i.e. [face p at +0, face p at -1 along q, face q at +0, face q at -1
    # along p].  Same pattern holds for EDGEXZ.  For EDGEYZ (e=0, p=1(y),
    # q=2(z)): faceY(i,j,k), faceY(i,j,k-1), faceZ(i,j,k), faceZ(i,j-1,k)
    # — again [p@0, p@-1(q), q@0, q@-1(p)].
    (pl0, pr0), (pl1, pr1) = face_views(p, q)
    (ql0, qr0), (ql1, qr1) = face_views(q, p)
    checks = [(pl0, pr0), (pl1, pr1), (ql0, qr0), (ql1, qr1)]

    all_red = (pl0 == REDUCED) & (pl1 == REDUCED) & (ql0 == REDUCED) & (ql1 == REDUCED)
    any_red = (pl0 == REDUCED) | (pl1 == REDUCED) | (ql0 == REDUCED) | (ql1 == REDUCED)

    # all-reduced id choice: the reference takes one of the surrounding
    # REDUCED faces' ids (Classifier.cpp:1495-1577); after the region
    # boundary fix all four share one id, so face p @ 0 is equivalent.
    all_idx = pr0

    # boundary id: first REDUCED face in priority order
    bnd_idx = jnp.full(pl0.shape, INVALID_REGION, dtype=jnp.int32)
    for lbl, reg in reversed(checks):
        bnd_idx = jnp.where(lbl == REDUCED, reg, bnd_idx)

    new_labels = jnp.where(all_red, REDUCED, jnp.where(any_red, BOUNDARY, edge_labels))
    idx = jnp.where(all_red, all_idx, jnp.where(any_red, bnd_idx, INVALID_REGION))
    return new_labels.astype(jnp.int8), idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Full classification bundle
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Classification:
    """All labels / region ids for one solve (pytree of arrays)."""

    cell_labels: jnp.ndarray
    face_labels: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    edge_labels: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    cell_region: jnp.ndarray
    face_region: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    edge_region: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    region_valid: jnp.ndarray  # [max_regions]
    n_regions: jnp.ndarray  # scalar int32
    region_overflow: jnp.ndarray  # scalar bool
    region_of_cube: jnp.ndarray  # [ncubes] region slot per tile cube (tiled)


jax.tree_util.register_dataclass(
    Classification,
    data_fields=[
        "cell_labels", "face_labels", "edge_labels", "cell_region",
        "face_region", "edge_region", "region_valid", "n_regions",
        "region_overflow", "region_of_cube",
    ],
    meta_fields=[],
)


def effective_max_regions(grid: Grid, params: SolverParams) -> int:
    if not params.do_reduced_regions:
        return 1
    if params.do_tile:
        import math

        t = params.tile_size
        ncubes = math.prod((n + t - 1) // t for n in grid.res)
        return max(2 * ncubes, 64)
    return params.max_regions


def classify(grid: Grid, liquid_w, fluid_w, params: SolverParams) -> Classification:
    """Full label pipeline, mirroring solveGasSubclass's classification
    stages (exec/HDK_PolyStokes.C:356-404)."""
    max_regions = effective_max_regions(grid, params)
    cell_labels = classify_cells(liquid_w, fluid_w)

    if params.do_reduced_regions:
        cell_labels = construct_reduced_regions(cell_labels, liquid_w, params)
    else:
        cell_labels = jnp.where(cell_labels == GENERICFLUID, ACTIVEFLUID, cell_labels)

    face_labels = [classify_faces(liquid_w, fluid_w, a) for a in range(3)]
    edge_labels = [classify_edges(liquid_w, fluid_w, e) for e in range(3)]

    if params.do_reduced_regions:
        cc_iters = 4 * params.tile_size if params.do_tile else sum(grid.res)
        if params.cc_host_callback and not params.do_tile:
            comp = connected_components_callback(cell_labels, liquid_w)
        else:
            comp = connected_components(cell_labels, liquid_w, cc_iters)
        cell_region, region_valid, n_regions, overflow = compact_regions(comp, max_regions)
        cell_labels, cell_region = fix_region_boundaries(cell_labels, cell_region, params.region_fix_max_iters)
        cell_labels, cell_region, region_valid = fix_small_regions(cell_labels, cell_region, region_valid, max_regions)
        if params.do_tile or params.cube_regions:
            # cube-aligned region map (tiled regions ARE cubes; for
            # general regions the same hygiene keys the cube-major
            # reduction/J-coupling fast paths at tile_size granularity)
            cell_labels, cell_region, region_valid, region_of_cube = enforce_one_region_per_cube(
                cell_labels, cell_region, region_valid, params.tile_size, max_regions
            )
        else:
            region_of_cube = jnp.zeros((1,), jnp.int32) - 1
        n_regions = jnp.sum(region_valid).astype(jnp.int32)

        fl, fr = [], []
        for a in range(3):
            nl, nr = face_reduced_indices(cell_labels, cell_region, face_labels[a], a)
            if not params.do_tile and params.cube_regions:
                # cube-alignment for faces: a REDUCED face is keyed (in the
                # cube-major J-coupling and setup reductions) by its SLOT
                # cube — the cube of its lower adjacent cell.  For general
                # regions the region's lower skin can land exactly on a
                # cube boundary, putting the face in a cube whose kept
                # region differs (or that has none); demote those faces to
                # ACTIVEFLUID (conservative: they become real velocity
                # DOFs).  Tiled regions can't produce this case (padding
                # slabs keep every region's faces inside its own cube).
                nl, nr = _demote_foreign_cube_faces(nl, nr, region_of_cube, params.tile_size, a, grid.res)
            fl.append(nl)
            fr.append(nr)
        face_labels = fl
        el, er = [], []
        for e in range(3):
            nl, nr = edge_reduced_indices(face_labels, fr, edge_labels[e], e)
            el.append(nl)
            er.append(nr)
        edge_labels = el
        edge_region = er
        face_region = fr
    else:
        cell_region = jnp.full(grid.center_shape, INVALID_REGION, dtype=jnp.int32)
        face_region = [jnp.full(grid.face_shape(a), INVALID_REGION, dtype=jnp.int32) for a in range(3)]
        edge_region = [jnp.full(grid.edge_shape(e), INVALID_REGION, dtype=jnp.int32) for e in range(3)]
        region_valid = jnp.zeros((max_regions,), dtype=bool)
        n_regions = jnp.int32(0)
        overflow = jnp.bool_(False)
        region_of_cube = jnp.zeros((1,), jnp.int32) - 1

    # Remaining GENERICFLUID faces/edges/cells become ACTIVEFLUID
    # (construct*ActiveIndices, Classifier.cpp:257-284).
    cell_labels = jnp.where(cell_labels == GENERICFLUID, ACTIVEFLUID, cell_labels)
    face_labels = [jnp.where(l == GENERICFLUID, ACTIVEFLUID, l).astype(jnp.int8) for l in face_labels]
    edge_labels = [jnp.where(l == GENERICFLUID, ACTIVEFLUID, l).astype(jnp.int8) for l in edge_labels]

    return Classification(
        cell_labels=cell_labels,
        face_labels=tuple(face_labels),
        edge_labels=tuple(edge_labels),
        cell_region=cell_region,
        face_region=tuple(face_region),
        edge_region=tuple(edge_region),
        region_valid=region_valid,
        n_regions=n_regions,
        region_overflow=overflow,
        region_of_cube=region_of_cube,
    )
