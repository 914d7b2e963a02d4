"""polystokes_tpu — a TPU-native (JAX/XLA/Pallas) viscous-liquid Stokes
engine with the capabilities of the SIGGRAPH 2023 "PolyStokes" reference
implementation (panuelosj/polystokes), re-designed TPU-first.

Public API:
  Grid, Scene, SolverParams, step
"""

from .config import (
    BasisOrder,
    MatrixScheme,
    PreconditionerType,
    SolverParams,
    SolverType,
)
from .grid import Grid
from .solver import Scene, step

__all__ = [
    "BasisOrder",
    "Grid",
    "MatrixScheme",
    "PreconditionerType",
    "Scene",
    "SolverParams",
    "SolverType",
    "step",
]

__version__ = "0.1.0"
