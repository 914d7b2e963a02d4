#!/usr/bin/env python
"""Diagnostic: generalized spectrum of the CELL_ARROW-preconditioned
pressure-stress Schur system on a small tiled-reduced scene.

Finds the near-null modes of the pencil (-A, M) (M = arrow preconditioner)
that make the reduced 128^3 solve need ~4.4k CG iterations vs 1.9k uniform
(BENCH_SUITE.json), and reports WHERE those eigenvectors live:
  * family split (p / tau_center / tau_edge energy fractions)
  * locality: energy on cells adjacent to reduced faces (the region skin)
    vs the uniform band interior
  * overlap with the reduced coupling: ||J S v|| vs ||v||

Usage: JAX_PLATFORMS=cpu python benchmarks/diag_spectrum.py [--n 32] [--k 12]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--viscosity", type=float, default=None,
                    help="override the scene viscosity (regime study: the "
                    "reduced/uniform iteration ratio may be a high-viscosity "
                    "phenomenon — 0.5/mu mass terms degenerate the tau block)")
    ap.add_argument("--tile", type=int, default=8)
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--uniform", action="store_true")
    ap.add_argument("--cg", action="store_true", help="run exact fp64 arrow-PCG instead of eigs")
    ap.add_argument("--fp32", action="store_true", help="with --cg: simulate fp32 arithmetic")
    ap.add_argument("--woodbury", choices=["exact", "blockdiag", "binv"], default=None,
                    help="with --cg: arrow + low-rank region correction "
                    "M_w^-1 = Minv - Minv U^T C^-1 U Minv, C = B + U Minv U^T "
                    "(exact / per-region block-diagonal / C = B only)")
    ap.add_argument("--twolevel", choices=["const", "linear"], default=None,
                    help="with --cg: additive 2-level arrow + per-cube coarse "
                    "correction z = Minv r + P Ac^-1 P^T r (const: 7 modes/cube; "
                    "linear: +3 p-gradient modes/cube)")
    ap.add_argument("--adef2", action="store_true",
                    help="with --twolevel: A-DEF2 combination z = z1 + Q(r - A z1), "
                    "z1 = Minv r, Q = P Ac^-1 P^T (Tang/Nabben/Vuik/Erlangga 2009), "
                    "plus the Q b start vector")
    ap.add_argument("--coarse-tile", type=int, default=0, help="coarse cube size (default: --tile)")
    ap.add_argument("--drop-coupling", action="store_true",
                    help="with --cg: remove the J^T BInv J term from A (solve the "
                    "gated grid operator alone) — isolates whether the reduced "
                    "iteration gap comes from the coupling or from the holes the "
                    "gating cuts into the grid part")
    ap.add_argument("--ritz", type=int, default=0,
                    help="with --cg: run this many iterations and print the Lanczos "
                    "Ritz-value histogram of M^-1(-A) (spectrum shape comparison)")
    ap.add_argument("--skin", choices=["exact", "gs"], default=None,
                    help="with --cg: symmetric multiplicative combination of the "
                    "arrow with a solver on the skin band (cells adjacent to "
                    "reduced faces): exact block solve (upper bound of any band "
                    "smoother) or symmetric Gauss-Seidel sweeps")
    ap.add_argument("--skin-width", type=int, default=1,
                    help="dilate the skin band to this many cells")
    ap.add_argument("--skin-sweeps", type=int, default=1,
                    help="symmetric GS sweeps per application (--skin gs)")
    ap.add_argument("--no-qred", action="store_true",
                    help="build the arrow M WITHOUT the reduced-coupling diagonal "
                    "q_red — tests whether folding the J^T BInv J diagonal into M "
                    "smears the coupling's near-null cluster (identity treatment of "
                    "the coupling keeps the cluster at the mass value)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from polystokes_tpu import SolverParams
    from polystokes_tpu.classify import REDUCED, classify, effective_max_regions, is_active
    from polystokes_tpu.config import PreconditionerType
    from polystokes_tpu.export import ExplicitOperators
    from polystokes_tpu.precond import cell_arrow_factors
    from polystokes_tpu.scenes.builders import honey_coil
    from polystokes_tpu.solver import assemble
    from polystokes_tpu.weights import compute_weights

    params = SolverParams(
        dtype=jnp.float64,
        do_reduced_regions=not args.uniform,
        do_tile=True,
        tile_size=args.tile,
        tile_padding=2,
        preconditioner=PreconditionerType.CELL_ARROW,
    )
    kw = {"viscosity": args.viscosity} if args.viscosity is not None else {}
    grid, scene = honey_coil(n=args.n, dtype=jnp.float64, **kw)
    R = effective_max_regions(grid, params)
    lw, fw = compute_weights(grid, scene.surface_sdf, scene.collision_sdf, params.dtype)
    cls = classify(grid, lw, fw, params)
    asm, rd = assemble(grid, scene, cls, lw, fw, params, R)
    ops = ExplicitOperators(grid, cls, asm, params)
    A = ops.schur_matrix().tocsr()  # negative definite
    if args.drop_coupling and not args.uniform:
        import scipy.sparse as _sp

        JGD = _sp.hstack([ops.JG(), ops.JDt()]).tocsr()
        A = (A + JGD.T @ ops.BInv() @ JGD).tocsr()
        # rows that only had coupling go singular: regularize + zero b there
        dead_nc = np.asarray(np.abs(A).sum(axis=1)).ravel() == 0
        if dead_nc.any():
            print(f"drop-coupling: regularizing {int(dead_nc.sum())} empty rows")
            A = (A - _sp.diags(dead_nc.astype(np.float64))).tocsr()
    nP, nS = ops.nP, ops.nS
    n = nP + nS
    print(f"n = {n} ({nP} p + {nS} tau), regions = {int(cls.n_regions)}", flush=True)

    # ---- explicit arrow M in the packed layout
    import dataclasses as _dc

    m_params = _dc.replace(params, do_reduced_regions=False) if args.no_qred else params
    k, inv_d, kd, inv_schur, te_inv = cell_arrow_factors(grid, cls, asm, m_params)
    k = [np.asarray(x) for x in k]
    h = np.asarray(0.5 * asm.uinv_c)
    cell_m = np.asarray(ops.cell_idx >= 0)
    nC = int(cell_m.sum())
    kx, ky, kz = (x[cell_m] for x in k)
    hh = h[cell_m]
    rows, cols, vals = [], [], []
    pid = np.arange(nC)
    tid = [nP + a * nC + np.arange(nC) for a in range(3)]

    def add(r, c, v):
        rows.append(r)
        cols.append(c)
        vals.append(v)

    add(pid, pid, kx + ky + kz)
    for a, ka in enumerate((kx, ky, kz)):
        add(pid, tid[a], -ka)
        add(tid[a], pid, -ka)
        add(tid[a], tid[a], ka + hh)
    off = nP + 3 * nC
    for e in range(3):
        m = np.asarray(ops.edge_idx[e] >= 0)
        ne = int(m.sum())
        dinv = np.asarray(te_inv[e])[m]
        d = np.where(dinv > 0, 1.0 / np.where(dinv > 0, dinv, 1.0), 1.0)
        eid = off + np.arange(ne)
        add(eid, eid, d)
        off += ne
    M = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))), shape=(n, n)
    )
    # regularize singular p-rows (cells with no face coupling at all)
    schur_diag = (kx * hh / (kx + hh + 1e-300)) + (ky * hh / (ky + hh + 1e-300)) + (kz * hh / (kz + hh + 1e-300))
    sing = schur_diag <= 0
    if sing.any():
        print(f"regularizing {int(sing.sum())} zero-coupling p rows in M")
        M = M + sp.csr_matrix((np.where(sing, 1.0, 0.0), (pid, pid)), shape=(n, n))

    if args.woodbury == "exact" and not args.cg:
        # eigen-anatomy of the exactly-coupling-corrected preconditioner:
        # M_full = arrow + U^T BInv U (explicit, region-local sparse)
        U_ = sp.hstack([ops.JG().tocsr(), ops.JDt().tocsr()]).tocsr()
        M = (M + (U_.T @ ops.BInv() @ U_)).tocsr()
        print("eigs against M = arrow + U^T BInv U (exact coupling)")

    if args.cg:
        # exact-arithmetic arrow-preconditioned CG on the explicit system:
        # isolates the spectral story from fp32 apply noise
        dt_np = np.float32 if args.fp32 else np.float64
        Af = A.astype(dt_np).tocsr()
        Mf = M.astype(dt_np).tocsr()
        # b from the device path
        from polystokes_tpu.solver import build_rhs

        b_pt = build_rhs(grid, cls, asm, params, R)
        b = np.concatenate(
            [np.asarray(b_pt.p)[cell_m]]
            + [np.asarray(b_pt.tc[a])[cell_m] for a in range(3)]
            + [np.asarray(b_pt.te[e])[np.asarray(ops.edge_idx[e] >= 0)] for e in range(3)]
        ).astype(dt_np)
        if args.drop_coupling and not args.uniform:
            b[np.asarray((A != 0).sum(axis=1)).ravel() <= 1] = 0.0
        Minv = spla.factorized(M.tocsc())

        if args.woodbury:
            # U maps packed (p, tau) -> region coefficient space [R*D]
            U = sp.hstack([ops.JG().tocsr(), ops.JDt().tocsr()]).tocsr()
            nz_rows = np.unique(U.nonzero()[0])
            D = params.reduced_dof
            Rl = U.shape[0] // D
            B = ops.B().tocsr()
            MinvUt = np.zeros((n, len(nz_rows)))
            Ud = U[nz_rows].toarray()
            for j, _ in enumerate(nz_rows):
                MinvUt[:, j] = Minv(Ud[j])
            G = Ud @ MinvUt  # [m, m] Gram on the live coefficient rows
            Bl = B[nz_rows][:, nz_rows].toarray()
            C = Bl + G
            if args.woodbury == "binv":
                C = Bl
            elif args.woodbury == "blockdiag":
                # zero cross-region blocks
                reg_of = nz_rows // D
                mask = reg_of[:, None] == reg_of[None, :]
                C = np.where(mask, C, 0.0)
            Cinv = np.linalg.inv(C)
            print(f"woodbury({args.woodbury}): live rows {len(nz_rows)} of {U.shape[0]}", flush=True)

            def Mw(r):
                z1 = Minv(r)
                y = Ud @ z1
                g = Cinv @ y
                return z1 - MinvUt @ g

            apply_M = Mw
        elif args.twolevel:
            # additive 2-level: coarse space = per-cube aggregates of each
            # family (p / tc_a / te_e), optionally + p-gradient modes
            T = args.coarse_tile or args.tile
            cs = tuple(-(-nn // T) for nn in grid.res)

            def cube_of(idx3, shape):
                return (
                    (idx3[0] // T) * cs[1] * cs[2]
                    + (idx3[1] // T) * cs[2]
                    + (idx3[2] // T)
                )

            cols_r, cols_c, cols_v = [], [], []
            ncubes = cs[0] * cs[1] * cs[2]
            col_ofs = 0

            def add_family(dof_ids, pos3, modes):
                nonlocal col_ofs
                cube = cube_of(pos3, grid.res)
                for m_i, mv in enumerate(modes):
                    cols_r.append(dof_ids)
                    cols_c.append(col_ofs + cube * len(modes) + m_i)
                    cols_v.append(mv)
                col_ofs += ncubes * len(modes)

            # p family
            ii, jj, kk = np.nonzero(cell_m)
            p_ids = np.arange(nP)
            ctr = [(x % T).astype(np.float64) - (T - 1) / 2 for x in (ii, jj, kk)]
            p_modes = [np.ones(nP)]
            if args.twolevel == "linear":
                p_modes += [c / T for c in ctr]
            add_family(p_ids, (ii, jj, kk), p_modes)
            for a in range(3):
                add_family(nP + a * nC + np.arange(nC), (ii, jj, kk), [np.ones(nC)])
            o = nP + 3 * nC
            for e in range(3):
                m = np.asarray(ops.edge_idx[e] >= 0)
                ei, ej, ek = np.nonzero(m)
                ne = int(m.sum())
                add_family(o + np.arange(ne), (ei, ej, ek), [np.ones(ne)])
                o += ne
            P = sp.csr_matrix(
                (np.concatenate(cols_v), (np.concatenate(cols_r), np.concatenate(cols_c))),
                shape=(n, col_ofs),
            )
            # drop empty / near-empty coarse columns
            colmass = np.asarray((P.power(2)).sum(axis=0)).ravel()
            keep_c = colmass > 0
            P = P[:, keep_c].tocsr()
            Ac = (P.T @ (-A) @ P).toarray()
            # regularize zero rows (coarse dofs over dead fine dofs)
            dz = np.abs(np.diag(Ac)) <= 0
            Ac[dz, dz] = 1.0
            Acinv = np.linalg.inv(Ac)
            print(f"twolevel({args.twolevel}, T={T}): coarse size {P.shape[1]}", flush=True)
            Pc = P.tocsc()
            Nmat = (-A).tocsr()

            if args.adef2:
                # A-DEF2: z = z1 + Q(r - A z1).  The only A product sits
                # inside P^T(.), so on device it reduces to (A W)^T z1 —
                # stored patches + a fused moments pass, no extra apply.
                def M2(r):
                    z1 = Minv(r)
                    return z1 + P @ (Acinv @ (Pc.T @ (r - Nmat @ z1)))
            elif os.environ.get("TWOLEVEL_MULT") == "1":
                # symmetric multiplicative: smooth, coarse-correct, smooth
                def M2(r):
                    z1 = Minv(r)
                    r1 = r - Nmat @ z1
                    z2 = z1 + P @ (Acinv @ (Pc.T @ r1))
                    return z2 + Minv(r - Nmat @ z2)
            else:
                def M2(r):
                    return Minv(r) + P @ (Acinv @ (Pc.T @ r))

            apply_M = M2
        else:
            apply_M = Minv

        # skin mask for residual tracking
        if not args.uniform:
            red_faces_t = [
                np.asarray((cls.face_labels[a] == REDUCED) & (cls.face_region[a] >= 0)) for a in range(3)
            ]
            sk = np.zeros(grid.res, bool)
            for a in range(3):
                sl_lo = [slice(None)] * 3
                sl_lo[a] = slice(0, grid.res[a])
                sl_hi = [slice(None)] * 3
                sl_hi[a] = slice(1, grid.res[a] + 1)
                sk |= red_faces_t[a][tuple(sl_lo)] | red_faces_t[a][tuple(sl_hi)]
            skin_flag = sk[cell_m]
        else:
            skin_flag = None

        if args.skin and not args.uniform:
            # Band-aware smoother experiment (VERDICT r4 item 7): the hard
            # tiled modes are "mixed grid/skin" — test whether a solver on
            # the skin band (cells within --skin-width of a reduced face,
            # ALL their DOF families) fixes them.  `exact` factorizes the
            # skin block of N = -A (the idealized upper bound of any
            # line/plane GS on the band); `gs` runs --skin-sweeps symmetric
            # Gauss-Seidel sweeps on that block.  Combined with the arrow
            # as symmetric multiplicative Schwarz (SPD):
            #   z1 = S r;  z2 = z1 + Minv(r - N z1);  z = z2 + S(r - N z2)
            from scipy import ndimage as _ndi

            skd = _ndi.binary_dilation(sk, iterations=max(args.skin_width - 1, 0)) if args.skin_width > 1 else sk
            sel = [np.flatnonzero(skd[cell_m])]                       # p
            sel += [nP + a * nC + sel[0] for a in range(3)]           # tau_c
            o = nP + 3 * nC
            for e in range(3):
                m = np.asarray(ops.edge_idx[e] >= 0)
                ei, ej, ek = np.nonzero(m)
                ci = np.minimum(ei, grid.res[0] - 1)
                cj = np.minimum(ej, grid.res[1] - 1)
                ck = np.minimum(ek, grid.res[2] - 1)
                sel.append(o + np.flatnonzero(skd[ci, cj, ck]))
                o += int(m.sum())
            skin_ids = np.concatenate(sel)
            Nmat_s = (-A).tocsr()
            Ns = Nmat_s[skin_ids][:, skin_ids].tocsc()
            # regularize empty rows (dead DOFs inside the band bbox)
            dz = np.asarray(np.abs(Ns).sum(axis=1)).ravel() == 0
            if dz.any():
                Ns = Ns + sp.diags(dz.astype(np.float64))
            print(f"skin({args.skin}, width={args.skin_width}): {len(skin_ids)} of {n} DOFs", flush=True)
            if args.skin == "exact":
                Ns_solve = spla.factorized(Ns)
            else:
                L = sp.tril(Ns, format="csr")
                Uu = sp.triu(Ns, k=1, format="csr")
                Lt = sp.tril(Ns, k=-1, format="csr")
                Ut = sp.triu(Ns, format="csr")

                def Ns_solve(rs_, sweeps=args.skin_sweeps):
                    zz = np.zeros_like(rs_)
                    for _ in range(sweeps):
                        zz = spla.spsolve_triangular(L, rs_ - Uu @ zz, lower=True)
                        zz = spla.spsolve_triangular(Ut, rs_ - Lt @ zz, lower=False)
                    return zz

            base_M = apply_M

            def S(r_):
                z = np.zeros(n)
                z[skin_ids] = Ns_solve(r_[skin_ids])
                return z

            def M_skin(r_):
                z1 = S(r_)
                z2 = z1 + base_M(r_ - Nmat_s @ z1)
                return z2 + S(r_ - Nmat_s @ z2)

            apply_M = M_skin

        x = np.zeros_like(b)
        if args.twolevel and args.adef2:
            # start vector with W^T r0 = 0: x0 = W (W^T A W)^-1 W^T b
            # (A = -N, so the sign flips vs Acinv which inverts P^T N P)
            x = -(P @ (Acinv @ (Pc.T @ b))).astype(dt_np)
        r = b - Af @ x
        if args.ritz < 0:
            rng = np.random.default_rng(0)
            r = rng.standard_normal(n).astype(dt_np)  # full-spectrum probe
            args.ritz = -args.ritz
        z = apply_M(r.astype(np.float64)).astype(dt_np)
        p = z.copy()
        rs = float(r @ z)
        tol2 = params.tolerance**2
        it = 0
        alphas, betas = [], []
        max_it = args.ritz if args.ritz else 30000
        for it in range(1, max_it + 1):
            Ap = Af @ p
            # note: A is negative definite -> pAp < 0, alpha < 0; the
            # Lanczos relations below use |alpha| via the sign flip
            alpha = rs / float(p @ Ap)
            x += alpha * p
            r -= alpha * Ap
            rr = float(r @ r)
            xx = float(x @ x)
            rre = min(rr, rr / xx if xx > 0 else rr)
            if not args.ritz and rre < tol2:
                break
            z = apply_M(r.astype(np.float64)).astype(dt_np)
            rs_new = float(r @ z)
            beta = rs_new / rs
            alphas.append(-alpha)  # spectrum of M^-1(-A)
            betas.append(beta)
            p = z + beta * p
            rs = rs_new
            if it % 200 == 0:
                rp = float(np.sum(r[:nP] ** 2))
                rtc = float(np.sum(r[nP : nP + 3 * nC] ** 2))
                rte = float(np.sum(r[nP + 3 * nC :] ** 2))
                rskin = float(np.sum(r[:nP][skin_flag] ** 2)) if skin_flag is not None else 0.0
                print(
                    f"  iter {it}: rre = {rre:.3e}  rr(p/tc/te) = {rp:.2e}/{rtc:.2e}/{rte:.2e}"
                    f"  p-skin frac {rskin / max(rp, 1e-300):.2f}",
                    flush=True,
                )
        if args.ritz:
            m = len(alphas)
            Td = np.zeros(m)
            Te = np.zeros(m - 1)
            for j in range(m):
                Td[j] = 1.0 / alphas[j] + (betas[j - 1] / alphas[j - 1] if j > 0 else 0.0)
                if j < m - 1:
                    Te[j] = np.sqrt(betas[j]) / abs(alphas[j])
            ev = np.linalg.eigvalsh(np.diag(Td) + np.diag(Te, 1) + np.diag(Te, -1))
            ev = ev[ev > 0]
            print(f"ritz values ({'uniform' if args.uniform else 'reduced'}, m={m}):")
            print("  min/max:", ev.min(), ev.max(), " cond:", ev.max() / ev.min())
            qs = np.quantile(ev, [0, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 1.0])
            print("  quantiles:", np.array2string(qs, precision=3))
            hist, edges = np.histogram(np.log10(ev), bins=24)
            for h, e0, e1 in zip(hist, edges[:-1], edges[1:]):
                print(f"  10^{e0:6.2f}..10^{e1:6.2f}: {h}")
            return
        print(f"CG ({'fp32' if args.fp32 else 'fp64'}, {'uniform' if args.uniform else 'reduced'}):"
              f" {it} iterations, rre = {rre:.3e}")
        print(f"  ||b||^2 = {float(b @ b):.4e}  ||x||^2 = {xx:.4e}  ||r||^2 = {rr:.4e}")
        return

    # ---- restrict to the live subspace: -A is exactly singular on DOFs
    # with zero diagonal (cells whose every adjacent face is out of
    # system); b is zero there too, so CG never touches them.
    dA = (-A).diagonal()
    live = dA != 0.0
    n_dead = int((~live).sum())
    print(f"dead DOFs (zero A-diagonal): {n_dead} of {n} "
          f"({int((~live[:nP]).sum())} p, {int((~live[nP:]).sum())} tau)")
    keep = np.where(live)[0]
    Ar = (-A).tocsr()[keep][:, keep].tocsc()
    Mr = M.tocsr()[keep][:, keep].tocsc()

    def embed(Vr):
        V = np.zeros((n, Vr.shape[1]))
        V[keep] = Vr
        return V

    print("factorizing -A ...", flush=True)
    lu = spla.splu(Ar)
    OPinv = spla.LinearOperator(Ar.shape, matvec=lambda x: lu.solve(x))
    print("eigsh (smallest) ...", flush=True)
    w_small, Vr_ = spla.eigsh(Ar, k=args.k, M=Mr, sigma=0, OPinv=OPinv, which="LM")
    V = embed(Vr_)
    print("eigsh (largest) ...", flush=True)
    w_large = spla.eigsh(Ar, k=4, M=Mr, which="LA", return_eigenvectors=False, maxiter=5000)
    print("smallest gen-eigs:", np.sort(w_small))
    print("largest  gen-eigs:", np.sort(w_large))
    print("gen condition ~", np.max(w_large) / np.min(np.abs(w_small)))

    # ---- eigenvector anatomy
    # masks: cells adjacent to a reduced face (region skin)
    red_faces = [
        np.asarray((cls.face_labels[a] == REDUCED) & (cls.face_region[a] >= 0)) for a in range(3)
    ]
    skin_cell = np.zeros(grid.res, bool)
    for a in range(3):
        sl_lo = [slice(None)] * 3
        sl_lo[a] = slice(0, grid.res[a])
        sl_hi = [slice(None)] * 3
        sl_hi[a] = slice(1, grid.res[a] + 1)
        skin_cell |= red_faces[a][tuple(sl_lo)] | red_faces[a][tuple(sl_hi)]
    skin_p = skin_cell[cell_m]

    # the reduced coupling operator JS restricted to packed vectors
    from polystokes_tpu.operators import PTau
    from polystokes_tpu.operators import forward_face_values
    from polystokes_tpu.reduced import reduce_J

    def unpack(x):
        p = np.zeros(grid.res)
        p[cell_m] = x[:nP]
        tc = []
        for a in range(3):
            arr = np.zeros(grid.res)
            arr[cell_m] = x[nP + a * nC : nP + (a + 1) * nC]
            tc.append(jnp.asarray(arr))
        te = []
        o = nP + 3 * nC
        for e in range(3):
            m = np.asarray(ops.edge_idx[e] >= 0)
            ne = int(m.sum())
            arr = np.zeros(m.shape)
            arr[m] = x[o : o + ne]
            te.append(jnp.asarray(arr))
            o += ne
        return PTau(p=jnp.asarray(p), tc=tuple(tc), te=tuple(te))

    print("\nmode | lambda      | %p   %tc  %te  | %skin(p) | ||JSv||/||v||")
    order = np.argsort(np.abs(w_small))
    for i in order:
        v = V[:, i]
        lam = w_small[i]
        ep = float(np.sum(v[:nP] ** 2))
        etc = float(np.sum(v[nP : nP + 3 * nC] ** 2))
        ete = float(np.sum(v[nP + 3 * nC :] ** 2))
        tot = ep + etc + ete
        pskin = float(np.sum(v[:nP][skin_p] ** 2) / max(ep, 1e-300))
        xp = unpack(v)
        s = forward_face_values(asm, xp)
        if not args.uniform:
            y = np.asarray(reduce_J(grid, cls, asm.com, s, params, R))
            js = float(np.linalg.norm(y))
        else:
            js = 0.0
        print(
            f"{i:4d} | {lam:11.4e} | {100*ep/tot:4.0f} {100*etc/tot:4.0f} {100*ete/tot:4.0f}"
            f" | {100*pskin:7.1f}% | {js:.3e}"
        )

    # spatial profile of the worst mode: energy per z-slab and a region-id map hint
    v = V[:, order[0]]
    pfield = np.zeros(grid.res)
    pfield[cell_m] = v[:nP]
    prof = (pfield**2).sum(axis=(0, 1))
    print("\nworst-mode p-energy by z-slab:", np.array2string(prof / max(prof.sum(), 1e-300), precision=2, max_line_width=200))


if __name__ == "__main__":
    main()
