"""Configuration for the TPU-native PolyStokes solver.

Mirrors the reference node's parameter schema (27 DOP parameters,
reference: exec/HDK_PolyStokes.C:86-220) plus the compile-time switches in
lib/include/units.h:9-18 (QUADRATIC_REGIONS vs AFFINE_REGIONS), expressed as
one runtime dataclass.  Enum-typed options mirror lib/include/units.h:47-94.
"""
from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp


class MatrixScheme(enum.Enum):
    """Which system layout to assemble (reference: units.h:76-83).

    PRESSURE_STRESS is the UI default; the others dispatch through the
    host explicit path (host_solve.solve_host / export.solve_explicit),
    the analog of assemble() (AssembleSystem.cpp:4-37)."""

    PRESSURE_STRESS = "pressure_stress"
    ALL_DOFS = "all_dofs"
    PRESSURE_VELOCITY = "pressure_velocity"
    ALL_DOFS_EXPLICIT_INTERIOR_STRESS = "all_dofs_explicit_interior_stress"


class SolverType(enum.Enum):
    """Which Krylov driver to use (reference: units.h:85-94).

    PCG_MATRIX_VECTOR_PRODUCTS is the reference UI default
    (HDK_PolyStokes.C:160-168): matrix-free PCG on the pressure-stress
    Schur complement, with a BiCGStab retry on non-convergence
    (HDK_PolyStokesSolver.cpp:784-799).
    """

    PCG_MATRIX_VECTOR_PRODUCTS = "pcg_matrix_vector_products"
    BICGSTAB = "bicgstab"
    MINRES = "minres"
    EIGEN = "eigen"  # host explicit path (host_solve.solve_host)


class PreconditionerType(enum.Enum):
    """Preconditioner choice (reference: units.h:47-53).

    The reference hardcodes IDENTITY (Preconditioners.cpp:4-9); its
    GS_SMOOTHER / EQ_14 alternatives target the explicit velocity-pressure
    layout and live in the host path (export.solve_explicit).  CELL_ARROW
    and MULTIGRID are TPU-native additions for the device Schur system
    (see precond.py / multigrid.py).
    """

    IDENTITY = "identity"
    DIAGONAL = "diagonal"
    CELL_ARROW = "cell_arrow"
    MULTIGRID = "multigrid"
    # CELL_ARROW + the exact per-region boundary-face restriction of
    # J^T BInv J via a Woodbury correction (precond.make_region_arrow) —
    # the region-boundary-aware block targeting the reduced system's
    # extra stiffness (spirit of lib/src/Preconditioner.cpp:30-158's
    # exact reduced solve inside the block-GS smoother).
    REGION_ARROW = "region_arrow"


class BasisOrder(enum.Enum):
    """Polynomial reduction basis (reference: units.h:9-18)."""

    QUADRATIC = 26  # QUADRATIC_REGIONS, REDUCED_DOF = 26
    AFFINE = 11  # AFFINE_REGIONS, REDUCED_DOF = 11


# Reference constants (exec/HDK_PolyStokesSolver.h:226-227).
MINWEIGHT = 0.1
NSAMPLES = 2


@dataclasses.dataclass(frozen=True)
class SolverParams:
    """All solver knobs; defaults match the reference node defaults
    (exec/HDK_PolyStokes.C:124-206 PRM defaults)."""

    # -- discretization / solve control
    tolerance: float = 1e-3  # HDK_PolyStokes.C:145
    max_iterations: int = 5000  # HDK_PolyStokes.C:148
    do_solve: bool = True
    keep_non_converged: bool = True  # keepNonConvergedResults, PRMoneDefaults
    # warm start: feeds constructGuessVectors (Solver.cpp:521-531) into the
    # host EIGEN path (the reference's default matrix-free PCG zeroes its
    # guess, Solver.cpp:770 — parity).  device_warm_start additionally
    # seeds the device PCG with the same guess (TPU-native opt-in).
    use_warm_start: bool = True
    device_warm_start: bool = False

    # -- reduction topology
    do_reduced_regions: bool = True
    do_tile: bool = True
    tile_size: int = 16  # HDK_PolyStokes.C:130
    tile_padding: int = 2  # HDK_PolyStokes.C:132
    liquid_boundary_layer_size: int = 2  # HDK_PolyStokes.C:124
    solid_boundary_layer_size: int = 2  # HDK_PolyStokes.C:126
    basis: BasisOrder = BasisOrder.QUADRATIC
    # Static bound on region slots for jit; ignored by the tiled path
    # (which uses one slot per tile cube).
    max_regions: int = 1024
    # Bound on iterations of the region-boundary separation sweep
    # (reference: serial while loop, Classifier.cpp:1093-1171).
    region_fix_max_iters: int = 8
    # Untiled path: run connected components on the host (native
    # union-find via jax.pure_callback, O(N α(N))) instead of the
    # O(diameter) on-device min-propagation — the analog of the
    # reference's host CC builder (Classifier.cpp:218-239).
    cc_host_callback: bool = False
    # Untiled general regions: run the cube-alignment hygiene
    # (classify.enforce_one_region_per_cube at tile_size granularity) so
    # the cube-major reduction + packed Pallas J-coupling paths apply to
    # arbitrary region shapes.  Costs nothing when regions don't share a
    # cube; otherwise demotes the higher-id region's cells in the shared
    # cube to uniform DOFs (exact, conservative).  Set False for the
    # reference-literal region shapes (general segment path, much slower).
    cube_regions: bool = True

    # -- material
    constant_density: float = 1.0
    min_density: float = 1.0  # HDK_PolyStokes.C: theMinDensityName default 1
    max_density: float = 100000.0

    # -- matrix & solver scheme
    matrix_scheme: MatrixScheme = MatrixScheme.PRESSURE_STRESS
    solver_type: SolverType = SolverType.PCG_MATRIX_VECTOR_PRODUCTS
    preconditioner: PreconditionerType = PreconditionerType.IDENTITY
    bicgstab_fallback: bool = True
    # A-DEF2 two-level deflation on top of the device preconditioner
    # (deflation.py; TPU-native addition — the reference has no analog).
    # deflation_tile 0 means "use the reduction tile size".
    deflation: bool = False
    deflation_tile: int = 0
    # use the fused apply+<p,Ap> kernels inside CG (packed path only);
    # set False to fall back to separate apply + tree_dot
    fuse_pap: bool = True
    # fuse the CG vector update (axpys + pointwise preconditioner + loop
    # dots) into one Pallas kernel (packed path; identity/diagonal/
    # cell_arrow preconditioners; ignored under deflation, whose
    # preconditioner applies the operator). Default off until validated
    # on hardware per-config.
    fuse_update: bool = False
    # under fuse_update on the reduced path, evaluate the polynomial
    # expand INSIDE the finish+update kernel (pallas_apply.
    # exp_finish_update_packed): the expanded face values never
    # round-trip through HBM — one fewer kernel + ~12 fewer channel
    # sweeps per iteration.  Falls back automatically when the config
    # is outside the fused kernel's support (halo > min(tile, block)).
    fuse_expand: bool = True
    # store the packed coefficient stack in bfloat16 (kernel math stays
    # f32): halves the loop-constant HBM traffic per iteration at ~0.4%
    # coefficient rounding; symmetry/SPD-preserving (pack_coeffs doc)
    coeff_bf16: bool = False

    # -- multigrid preconditioner knobs (multigrid.py; TPU-native addition)
    mg_levels: int = 5  # max levels incl. finest
    mg_coarsest: int = 4  # stop coarsening below this resolution
    mg_smooth_degree: int = 3  # Chebyshev(arrow) smoother degree per half-sweep
    mg_coarse_iters: int = 4  # extra Chebyshev sweeps at the coarsest level

    # -- numerics (TPU-first: fp32 compute by default, fp64 opt-in)
    dtype: jnp.dtype = jnp.float32

    # -- fused Pallas apply (pallas_apply.py).  Requires x/y resolution
    # divisible by 8 and no active face/edge on the domain boundary (the
    # packed layout drops those index-0 planes; step() reports a
    # `boundary_active` stat that must be 0).  Off by default for exact
    # layout-independence parity; the bench/CLI opt in.
    use_pallas: bool = False

    # -- observability
    export_matrices: bool = False
    export_component_matrices: bool = False
    export_stats: bool = False
    export_prefix: str = "output_data/polystokes."

    @property
    def reduced_dof(self) -> int:
        return self.basis.value

    @property
    def effective_density(self) -> float:
        """constant_density clamped into [min_density, max_density] (the
        reference node's density min/max knobs bound the sampled density
        field; with constant density the clamp applies directly)."""
        return min(max(self.constant_density, self.min_density), self.max_density)

    def __post_init__(self):
        if self.min_density > self.max_density:
            raise ValueError(f"min_density {self.min_density} > max_density {self.max_density}")
        if self.tile_size < 1 or self.tile_padding < 0:
            raise ValueError("tile_size >= 1 and tile_padding >= 0 required")

    def replace(self, **kw) -> "SolverParams":
        return dataclasses.replace(self, **kw)
