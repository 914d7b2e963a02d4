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
    """Which system layout to assemble (reference: units.h:76-83)."""

    PRESSURE_STRESS = "pressure_stress"
    ALL_DOFS = "all_dofs"
    PRESSURE_VELOCITY = "pressure_velocity"


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


class PreconditionerType(enum.Enum):
    """Preconditioner choice (reference: units.h:47-53).

    The reference hardcodes IDENTITY (Preconditioners.cpp:4-9).
    """

    IDENTITY = "identity"
    DIAGONAL = "diagonal"


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
    use_warm_start: bool = True

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

    # -- material
    constant_density: float = 1.0
    min_density: float = 1.0  # HDK_PolyStokes.C: theMinDensityName default 1
    max_density: float = 100000.0

    # -- matrix & solver scheme
    matrix_scheme: MatrixScheme = MatrixScheme.PRESSURE_STRESS
    solver_type: SolverType = SolverType.PCG_MATRIX_VECTOR_PRODUCTS
    preconditioner: PreconditionerType = PreconditionerType.IDENTITY
    bicgstab_fallback: bool = True

    # -- numerics (TPU-first: fp32 compute by default, fp64 opt-in)
    dtype: jnp.dtype = jnp.float32

    # -- observability
    export_matrices: bool = False
    export_component_matrices: bool = False
    export_stats: bool = False
    export_prefix: str = "output_data/polystokes."

    @property
    def reduced_dof(self) -> int:
        return self.basis.value

    def replace(self, **kw) -> "SolverParams":
        return dataclasses.replace(self, **kw)
