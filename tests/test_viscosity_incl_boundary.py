"""Incl-boundary reduced viscosity variant vs a literal loop port of the
reference sweep (buildReducedViscosityMatrixSystems, Solver.cpp:1696-1909)."""
import numpy as np
import pytest

import jax.numpy as jnp

from polystokes_tpu.basis import conversion_coefficients
from polystokes_tpu.classify import REDUCED
from polystokes_tpu.grid import EDGE_OFFSET_AXES, face_offsets
from polystokes_tpu.solver import edge_viscosity

from test_operators import build_all, make_case


def _loop_oracle(grid, cls, com, visc_c, visc_e, params, R):
    D = params.reduced_dof
    dx = grid.dx
    com = np.asarray(com)
    vr = np.zeros((R, D, D))
    face_lbl = [np.asarray(cls.face_labels[a]) for a in range(3)]
    face_reg = [np.asarray(cls.face_region[a]) for a in range(3)]

    def red(a, idx):
        if any(idx[i] < 0 or idx[i] >= face_lbl[a].shape[i] for i in range(3)):
            return -1
        if face_lbl[a][tuple(idx)] == REDUCED and face_reg[a][tuple(idx)] >= 0:
            return int(face_reg[a][tuple(idx)])
        return -1

    def coeff(a, idx, r):
        pos = np.array(idx, float) + np.asarray(face_offsets(a))
        return np.asarray(conversion_coefficients(jnp.asarray(pos - com[r]), a, params.basis))

    res = grid.res
    for a in range(3):
        for sidx in np.argwhere((face_lbl[a] == REDUCED) & (face_reg[a] >= 0)):
            r_self = red(a, sidx)
            c_self = coeff(a, sidx, r_self)
            # cell-centered terms
            for div_dir in (0, 1):
                cell = sidx.copy()
                cell[a] += div_dir - 1
                if cell[a] < 0 or cell[a] >= res[a]:
                    continue
                div_sign = -1.0 if div_dir == 0 else 1.0
                mu = float(np.asarray(visc_c)[tuple(cell)])
                for grad_dir in (0, 1):
                    adj = cell.copy()
                    adj[a] += grad_dir
                    grad_sign = -1.0 if grad_dir == 0 else 1.0
                    r_adj = red(a, adj)
                    if r_adj < 0:
                        continue
                    assert r_adj == r_self
                    contrib = -div_sign * grad_sign * mu / (dx * dx)
                    vr[r_self] += contrib * np.outer(c_self, coeff(a, adj, r_adj))
            # edge-centered terms
            for e in range(3):
                if e == a:
                    continue
                t = 3 - a - e
                for div_dir in (0, 1):
                    edge = sidx.copy()
                    edge[t] += div_dir
                    div_sign = -1.0 if div_dir == 0 else 1.0
                    mu = float(np.asarray(visc_e[e])[tuple(edge)])
                    for grad_axis in range(3):
                        if grad_axis == e:
                            continue
                        fa = 3 - grad_axis - e
                        t2 = 3 - e - fa
                        for grad_dir in (0, 1):
                            adj = edge.copy()
                            adj[t2] += grad_dir - 1
                            grad_sign = -1.0 if grad_dir == 0 else 1.0
                            r_adj = red(fa, adj)
                            if r_adj < 0:
                                continue
                            assert r_adj == r_self
                            contrib = -0.5 * div_sign * grad_sign * mu / (dx * dx)
                            vr[r_self] += contrib * np.outer(c_self, coeff(fa, adj, r_adj))
    return vr


def test_incl_boundary_viscosity_matches_loop_oracle():
    from polystokes_tpu.reduced import viscosity_incl_boundary

    grid, params, scene = make_case(reduced=True, solid=False)
    R, lw, fw, cls, asm, rd, orc = build_all(grid, params, scene)
    visc_e = [edge_viscosity(scene.viscosity, e) for e in range(3)]
    vr = np.asarray(viscosity_incl_boundary(grid, cls, asm.com, scene.viscosity, visc_e, params, R))
    vro = _loop_oracle(grid, cls, asm.com, scene.viscosity, visc_e, params, R)
    scale = max(np.abs(vro).max(), 1.0)
    assert np.abs(vr - vro).max() < 1e-8 * scale
    assert np.abs(vro).max() > 0  # nontrivial case
