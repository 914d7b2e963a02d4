"""Slow, loop-based NumPy/SciPy oracle for the variational Stokes
operators.

This is an *independent* straight-line implementation of the assembly
rules (reference: exec/HDK_PolyStokesSolver_ConstructMatrixBlocks.cpp and
the per-region sweeps in exec/HDK_PolyStokesSolver.cpp:1275-1694), written
with explicit Python loops and scipy sparse matrices.  The production code
in polystokes_tpu is vectorized/matrix-free; agreement between the two on
random small grids is the correctness oracle (the reference itself has no
tests; its .mtx export was designed for exactly this kind of external
check, Solver.cpp:533-566).

Takes the classification (labels/regions) and weights as plain numpy
inputs.  DOF ordering is lexicographic per family.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from polystokes_tpu.config import MINWEIGHT, BasisOrder

UNSOLVED, SOLID, GENERICFLUID, ACTIVEFLUID, REDUCED, BOUNDARY = 0, 1, 2, 3, 4, 5


def is_active(l):
    return l == ACTIVEFLUID or l == BOUNDARY


def is_reduced(l):
    return l == REDUCED or l == BOUNDARY


def basis_row(offset, axis, basis=BasisOrder.QUADRATIC):
    """Pure-NumPy basis table (layout pinned by tests/test_basis.py)."""
    x, y, z = float(offset[0]), float(offset[1]), float(offset[2])
    if basis == BasisOrder.QUADRATIC:
        v = np.zeros(26)
        if axis == 0:
            v[[0]] = 1.0
            v[3:12] = [x, y, z, x * x, x * y, x * z, y * y, y * z, z * z]
        elif axis == 1:
            v[[1]] = 1.0
            v[12:21] = [x, y, z, x * x, x * y, x * z, y * y, y * z, z * z]
        else:
            v[2] = 1.0
            v[3] = -z
            v[6] = -2 * x * z
            v[7] = -y * z
            v[8] = -0.5 * z * z
            v[13] = -z
            v[16] = -x * z
            v[18] = -2 * y * z
            v[19] = -0.5 * z * z
            v[21:26] = [x, y, x * x, x * y, y * y]
        return v
    v = np.zeros(11)
    if axis == 0:
        v[0] = 1.0
        v[3:6] = [x, y, z]
    elif axis == 1:
        v[1] = 1.0
        v[6:9] = [x, y, z]
    else:
        v[2] = 1.0
        v[3] = -z
        v[7] = -z
        v[9:11] = [x, y]
    return v


class Oracle:
    def __init__(self, res, dx, dt, labels, weights, velocity, collision_velocity, visc_c, visc_e, density, cell_region, face_region, edge_region, n_regions, basis=BasisOrder.QUADRATIC):
        self.res = res
        self.dx = dx
        self.dt = dt
        self.inv_dx = 1.0 / dx
        self.cell_labels, self.face_labels, self.edge_labels = labels
        self.lw, self.fw = weights  # dicts of numpy arrays
        self.vel = velocity
        self.svel = collision_velocity
        self.visc_c = visc_c
        self.visc_e = visc_e
        self.rho = density
        self.cell_region = cell_region
        self.face_region = face_region
        self.edge_region = edge_region
        self.R = n_regions
        self.basis = basis
        self.D = basis.value
        self._number_dofs()

    # -- DOF numbering (lexicographic) --------------------------------
    def _number_dofs(self):
        def number(labels):
            idx = -np.ones(labels.shape, dtype=np.int64)
            n = 0
            it = np.ndindex(labels.shape)
            for c in it:
                if is_active(labels[c]):
                    idx[c] = n
                    n += 1
            return idx, n

        self.cell_idx, self.nP = number(self.cell_labels)
        self.face_idx = []
        self.nF = []
        for a in range(3):
            ix, n = number(self.face_labels[a])
            self.face_idx.append(ix)
            self.nF.append(n)
        self.edge_idx = []
        self.nE = []
        for e in range(3):
            ix, n = number(self.edge_labels[e])
            self.edge_idx.append(ix)
            self.nE.append(n)
        self.nV = sum(self.nF)
        # stress layout: [txx | tyy | tzz | tyz | txz | txy]
        self.nS = 3 * self.nP + sum(self.nE)

    def vdof(self, a, f):
        return self.face_idx[a][f] + sum(self.nF[:a])

    def center_stress_dof(self, axis, c):
        return self.cell_idx[c] + axis * self.nP

    def edge_stress_dof(self, e, g):
        return self.edge_idx[e][g] + 3 * self.nP + sum(self.nE[:e])

    # -- geometry helpers ---------------------------------------------
    def face_pos(self, a, f):
        p = np.array(f, dtype=float)
        p[a] -= 0.5
        return p

    def in_cells(self, c):
        return all(0 <= c[i] < self.res[i] for i in range(3))

    # -- matrices ------------------------------------------------------
    def build(self, com):
        """Build G, Dt, Mc, uInv, JG, JDt, b_v, rhs_p, rhs_s."""
        res = self.res
        G = sp.lil_matrix((self.nV, self.nP))
        Dt = sp.lil_matrix((self.nV, self.nS))
        JG = sp.lil_matrix((self.R * self.D, self.nP))
        JDt = sp.lil_matrix((self.R * self.D, self.nS))
        Mc = np.zeros(self.nV)
        b_v = np.zeros(self.nV)
        rhs_p = np.zeros(self.nP)
        rhs_s = np.zeros(self.nS)

        for a in range(3):
            fshape = self.face_labels[a].shape
            for f in np.ndindex(fshape):
                lbl = self.face_labels[a][f]
                act = is_active(lbl)
                red = lbl == REDUCED
                if not (act or red):
                    continue
                ffw = self.fw[f"face{a}"][f]
                flw = self.lw[f"face{a}"][f]
                if act:
                    vol = np.clip(ffw * flw, MINWEIGHT**2, 1.0)
                    i = self.vdof(a, f)
                    Mc[i] = vol * self.rho
                    b_v[i] = self.vel[a][f] * vol * self.rho
                if red:
                    reg = self.face_region[a][f]
                    off = self.face_pos(a, f) - com[reg]
                    cvec = basis_row(off, a, self.basis)

                # pressure + center-stress stencils over the 2 adjacent cells
                for d in (0, 1):
                    cell = list(f)
                    cell[a] += d - 1
                    cell = tuple(cell)
                    if not (0 <= cell[a] < res[a]):
                        continue
                    sign = -1.0 if d == 0 else 1.0
                    if is_active(self.cell_labels[cell]):
                        coeff = ffw * self.lw["center"][cell] * self.inv_dx
                        if coeff <= 0:
                            continue
                        ci = self.cell_idx[cell]
                        si = self.center_stress_dof(a, cell)
                        if act:
                            i = self.vdof(a, f)
                            G[i, ci] += sign * coeff
                            Dt[i, si] += -sign * coeff
                            sv = self.svel[a][f]
                            if self.fw["center"][cell] < 1.0:
                                rhs_p[ci] += -sign * coeff * sv
                                rhs_s[si] += -sign * coeff * sv
                            if ffw < 1.0:
                                rhs_p[ci] += sign * coeff * sv
                                rhs_s[si] += sign * coeff * sv
                        elif red:
                            for n in range(self.D):
                                JG[self.D * reg + n, ci] += sign * coeff * cvec[n]
                                JDt[self.D * reg + n, si] += -sign * coeff * cvec[n]

                # edge (shear) stress stencils
                for e in range(3):
                    if e == a:
                        continue
                    t = 3 - a - e
                    for d in (0, 1):
                        g = list(f)
                        g[t] += d
                        g = tuple(g)
                        sign = -1.0 if d == 0 else 1.0
                        if not all(0 <= g[i] < self.edge_labels[e].shape[i] for i in range(3)):
                            continue
                        if is_active(self.edge_labels[e][g]):
                            coeff = ffw * self.lw[f"edge{e}"][g] * self.inv_dx
                            if coeff <= 0:
                                continue
                            si = self.edge_stress_dof(e, g)
                            if act:
                                i = self.vdof(a, f)
                                Dt[i, si] += -sign * coeff
                                sv = self.svel[a][f]
                                if self.fw[f"edge{e}"][g] < 1.0:
                                    rhs_s[si] += -sign * coeff * sv
                                if ffw < 1.0:
                                    rhs_s[si] += sign * coeff * sv
                            elif red:
                                for n in range(self.D):
                                    JDt[self.D * reg + n, si] += -sign * coeff * cvec[n]

        # stress diagonals
        uInv = np.zeros(self.nS)
        for c in np.ndindex(tuple(res)):
            if is_active(self.cell_labels[c]):
                vw = np.clip(self.fw["center"][c], MINWEIGHT, 1.0) * self.lw["center"][c]
                iv = np.clip(1.0 / self.visc_c[c], 0.0, 1e10)
                val = iv * np.clip(vw, 1e-2, 1.0)
                for axis in range(3):
                    uInv[self.center_stress_dof(axis, c)] = val
        for e in range(3):
            for g in np.ndindex(self.edge_labels[e].shape):
                if is_active(self.edge_labels[e][g]):
                    vw = np.clip(self.fw[f"edge{e}"][g], MINWEIGHT, 1.0) * self.lw[f"edge{e}"][g]
                    iv = np.clip(1.0 / self.visc_e[e][g], 0.0, 1e10)
                    uInv[self.edge_stress_dof(e, g)] = 2.0 * iv * vw

        return G.tocsr(), Dt.tocsr(), JG.tocsr(), JDt.tocsr(), Mc, uInv, b_v, rhs_p, rhs_s

    # -- per-region quantities ----------------------------------------
    def coms(self):
        com = np.zeros((self.R, 3))
        cnt = np.zeros(self.R)
        for c in np.ndindex(tuple(self.res)):
            if self.cell_labels[c] == REDUCED:
                r = self.cell_region[c]
                com[r] += np.array(c, dtype=float)
                cnt[r] += 1
        com /= np.maximum(cnt, 1)[:, None]
        return com, cnt

    def best_fit(self, com):
        M = np.zeros((self.R, self.D, self.D))
        b = np.zeros((self.R, self.D))
        for c in np.ndindex(tuple(self.res)):
            if self.cell_labels[c] != REDUCED:
                continue
            r = self.cell_region[c]
            for a in range(3):
                for d in (0, 1):
                    nb = list(c)
                    nb[a] += 2 * d - 1
                    nb = tuple(nb)
                    if not (0 <= nb[a] < self.res[a]):
                        continue
                    if not is_active(self.cell_labels[nb]):
                        continue
                    off = np.array(c, dtype=float)
                    off[a] += 0.5 if d == 1 else -0.5
                    off -= com[r]
                    cv = basis_row(off, a, self.basis)
                    M[r] += np.outer(cv, cv)
                    f = list(c)
                    f[a] += d
                    b[r] += self.vel[a][tuple(f)] * cv
        w = np.zeros((self.R, self.D))
        for r in range(self.R):
            w[r] = np.linalg.solve(M[r], b[r]) if M[r].any() else 0.0
        return M, b, w

    def reduced_mass(self, com):
        Mr = np.zeros((self.R, self.D, self.D))
        for c in np.ndindex(tuple(self.res)):
            if self.cell_labels[c] != REDUCED:
                continue
            r = self.cell_region[c]
            for a in range(3):
                for d in (0, 1):
                    apply_face = d == 0
                    if not apply_face:
                        nb = list(c)
                        nb[a] += 1
                        nb = tuple(nb)
                        if 0 <= nb[a] < self.res[a] and is_active(self.cell_labels[nb]):
                            apply_face = True
                    if apply_face:
                        off = np.array(c, dtype=float)
                        off[a] += 0.5 if d == 1 else -0.5
                        off -= com[r]
                        cv = basis_row(off, a, self.basis)
                        Mr[r] += self.rho * np.outer(cv, cv)
        return Mr

    def reduced_viscosity_interior(self, com):
        """The reference's pair-wise sweep, transcribed literally
        (Solver.cpp:1485-1694) — validates the production rank-1 form."""
        Vr = np.zeros((self.R, self.D, self.D))
        res = self.res
        for a in range(3):
            fshape = self.face_labels[a].shape
            for f in np.ndindex(fshape):
                r = self.face_region[a][f]
                if r < 0 or self.face_labels[a][f] != REDUCED:
                    continue
                off_self = self.face_pos(a, f) - com[r]
                c_self = basis_row(off_self, a, self.basis)
                # cell-centered terms
                for d in (0, 1):
                    cell = list(f)
                    cell[a] += d - 1
                    cell = tuple(cell)
                    if not (0 <= cell[a] < res[a]):
                        continue
                    if self.cell_labels[cell] != REDUCED:
                        continue
                    sd = -1.0 if d == 0 else 1.0
                    visc = self.visc_c[cell]
                    for gdir in (0, 1):
                        adj = list(cell)
                        adj[a] += gdir
                        adj = tuple(adj)
                        sg = -1.0 if gdir == 0 else 1.0
                        ra = self.face_region[a][adj]
                        if ra < 0 or self.face_labels[a][adj] != REDUCED:
                            continue
                        contrib = -sd * sg * visc / (self.dx * self.dx)
                        off_adj = self.face_pos(a, adj) - com[ra]
                        c_adj = basis_row(off_adj, a, self.basis)
                        Vr[r] += contrib * np.outer(c_self, c_adj)
                # edge-centered terms
                for e in range(3):
                    if e == a:
                        continue
                    t = 3 - a - e
                    for d in (0, 1):
                        g = list(f)
                        g[t] += d
                        g = tuple(g)
                        sd = -1.0 if d == 0 else 1.0
                        if not all(0 <= g[i] < self.edge_labels[e].shape[i] for i in range(3)):
                            continue
                        if self.edge_labels[e][g] != REDUCED:
                            continue
                        visc = self.visc_e[e][g]
                        for ga in range(3):
                            if ga == e:
                                continue
                            fa = 3 - ga - e
                            for gd in (0, 1):
                                adj = list(g)
                                adj[ga] += gd - 1
                                adj = tuple(adj)
                                sg = -1.0 if gd == 0 else 1.0
                                if not all(0 <= adj[i] < self.face_labels[fa].shape[i] for i in range(3)):
                                    continue
                                ra = self.face_region[fa][adj]
                                if ra < 0 or self.face_labels[fa][adj] != REDUCED:
                                    continue
                                contrib = -0.5 * sd * sg * visc / (self.dx * self.dx)
                                off_adj = self.face_pos(fa, adj) - com[ra]
                                c_adj = basis_row(off_adj, fa, self.basis)
                                Vr[r] += contrib * np.outer(c_self, c_adj)
        return Vr

    # -- full pressure-stress system ----------------------------------
    def schur_system(self, com):
        """A = -dt [G Dt]^T McInv [G Dt] - [JG JDt]^T BInv [JG JDt]
        - 0.5 diag(0, uInv)  and  b (AssembleSystem.cpp:381-419)."""
        G, Dt, JG, JDt, Mc, uInv, b_v, rhs_p, rhs_s = self.build(com)
        Mr = self.reduced_mass(com)
        Vr = self.reduced_viscosity_interior(com)
        _, _, w_fit = self.best_fit(com)
        B = Mr / self.dt + 2.0 * Vr
        BInv = np.zeros_like(B)
        b_w = np.zeros(self.R * self.D)
        for r in range(self.R):
            if B[r].any():
                BInv[r] = np.linalg.inv(B[r])
            b_w[self.D * r : self.D * (r + 1)] = Mr[r] @ w_fit[r]
        BInv_blk = sp.block_diag([BInv[r] for r in range(self.R)]) if self.R else sp.csr_matrix((0, 0))

        McInv = sp.diags(np.where(Mc > 0, 1.0 / np.where(Mc > 0, Mc, 1), 0.0))
        GD = sp.hstack([G, Dt]).tocsr()
        JGD = sp.hstack([JG, JDt]).tocsr()
        A = -self.dt * (GD.T @ McInv @ GD)
        if self.R:
            A = A - JGD.T @ BInv_blk @ JGD
        uvec = np.concatenate([np.zeros(self.nP), uInv])
        A = A - 0.5 * sp.diags(uvec)

        b1 = -(G.T @ (McInv @ b_v))
        b2 = -(Dt.T @ (McInv @ b_v))
        if self.R:
            z = BInv_blk @ b_w / self.dt
            b1 = b1 - JG.T @ z
            b2 = b2 - JDt.T @ z
        b = np.concatenate([b1 + rhs_p, b2 + rhs_s])
        return A.tocsr(), b, dict(G=G, Dt=Dt, JG=JG, JDt=JDt, Mc=Mc, uInv=uInv, b_v=b_v, rhs_p=rhs_p, rhs_s=rhs_s, Mr=Mr, Vr=Vr, BInv=BInv, b_w=b_w, w_fit=w_fit)
