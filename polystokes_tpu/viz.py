"""Grid visualization: render exported solver grids as PNG slice maps.

The observability analog of the reference's printAllData point-cloud
dumps (exec/HDK_PolyStokesSolver.cpp:1031-1268): where the reference
renders every label/region/weight grid as viewable Houdini point clouds,
this renders the same grids (from the npz written by
``export.export_grids`` / ``export.export_solution``) as orthogonal
slice images — the natural debugging surface for a headless TPU run.

Usage (CLI)::

    python -m polystokes_tpu.viz out/grids.npz               # all grids, mid-slices
    python -m polystokes_tpu.viz out/grids.npz --axis 0 --index 40
    python -m polystokes_tpu.viz out/solution.npz --out dir/

Label grids (``*_labels``) render with a fixed categorical palette
(matching classify.py's label enum), region grids with a cyclic palette
over region ids, and float grids (weights, solution fields, residuals)
with a signed/unsigned colormap picked from the data range.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

# classify.py label enum order: UNLABELED, LIQUID/ACTIVE, REDUCED, BOUNDARY,
# SOLID, AIR (values there are small ints; palette indexed by value)
_LABEL_COLORS = [
    (0.92, 0.92, 0.92),  # 0 unlabeled / outside
    (0.22, 0.49, 0.72),  # 1 active
    (0.89, 0.47, 0.20),  # 2 reduced / interior
    (0.30, 0.69, 0.29),  # 3 boundary
    (0.40, 0.40, 0.40),  # 4 solid
    (0.97, 0.93, 0.58),  # 5 air
    (0.60, 0.31, 0.64),  # 6+
    (0.85, 0.37, 0.56),
]


def _slice(arr: np.ndarray, axis: int, index: int | None):
    if index is None:
        index = arr.shape[axis] // 2
    index = int(np.clip(index, 0, arr.shape[axis] - 1))
    return np.take(arr, index, axis=axis), index


def render_grid(ax, name: str, sl: np.ndarray):
    """Render one 2-D slice onto a matplotlib axes with a style picked by
    the grid kind (labels / regions / float fields)."""
    from matplotlib.colors import ListedColormap

    if name.endswith("_labels"):
        n = len(_LABEL_COLORS)
        img = ax.imshow(
            sl.T, origin="lower", interpolation="nearest",
            cmap=ListedColormap(_LABEL_COLORS), vmin=-0.5, vmax=n - 0.5,
        )
    elif name.endswith("_region"):
        vis = np.where(sl >= 0, sl % 20, np.nan)
        img = ax.imshow(vis.T, origin="lower", interpolation="nearest", cmap="tab20", vmin=-0.5, vmax=19.5)
    else:
        s = sl.astype(np.float64)
        finite = s[np.isfinite(s)]
        lim = float(np.max(np.abs(finite))) if finite.size else 1.0
        lim = lim if lim > 0 else 1.0
        if finite.size and float(np.min(finite)) < 0:
            img = ax.imshow(s.T, origin="lower", interpolation="nearest", cmap="RdBu_r", vmin=-lim, vmax=lim)
        else:
            img = ax.imshow(s.T, origin="lower", interpolation="nearest", cmap="viridis", vmin=0, vmax=lim)
    ax.set_title(name, fontsize=8)
    ax.set_xticks([])
    ax.set_yticks([])
    return img


def render_npz(
    path: str,
    out_dir: str | None = None,
    axis: int = 2,
    index: int | None = None,
    names: list[str] | None = None,
    per_grid: bool = False,
) -> list[str]:
    """Render every (or the named) 3-D grids in an exported npz to PNG.

    Returns the list of files written.  By default one contact-sheet PNG
    per npz; ``per_grid`` writes one PNG per grid instead."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.load(path)
    keys = [k for k in data.files if data[k].ndim == 3]
    if names:
        keys = [k for k in keys if any(n in k for n in names)]
    if not keys:
        raise ValueError(f"{path}: no 3-D grids to render (available: {data.files})")
    out_dir = out_dir or os.path.dirname(path) or "."
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(path))[0]
    written = []

    if per_grid:
        for k in keys:
            sl, idx = _slice(data[k], axis, index)
            fig, ax = plt.subplots(figsize=(5, 5), dpi=150)
            im = render_grid(ax, k, sl)
            fig.colorbar(im, ax=ax, shrink=0.8)
            fig.suptitle(f"{stem}:{k}  axis={axis} slice={idx}", fontsize=9)
            f = os.path.join(out_dir, f"{stem}_{k}_a{axis}.png")
            fig.savefig(f, bbox_inches="tight")
            plt.close(fig)
            written.append(f)
        return written

    ncol = min(4, len(keys))
    nrow = -(-len(keys) // ncol)
    fig, axes = plt.subplots(nrow, ncol, figsize=(3.2 * ncol, 3.4 * nrow), dpi=130, squeeze=False)
    idx_used = None
    for ax_i, k in enumerate(keys):
        sl, idx_used = _slice(data[k], axis, index)
        render_grid(axes[ax_i // ncol][ax_i % ncol], k, sl)
    for j in range(len(keys), nrow * ncol):
        axes[j // ncol][j % ncol].axis("off")
    fig.suptitle(f"{stem}  axis={axis} slice={idx_used}", fontsize=10)
    f = os.path.join(out_dir, f"{stem}_a{axis}.png")
    fig.savefig(f, bbox_inches="tight")
    plt.close(fig)
    return [f]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("npz", help="grids.npz / solution.npz / residuals npz from export.py")
    ap.add_argument("--out", default=None, help="output directory (default: beside the npz)")
    ap.add_argument("--axis", type=int, default=2, choices=[0, 1, 2])
    ap.add_argument("--index", type=int, default=None, help="slice index (default: middle)")
    ap.add_argument("--grids", nargs="*", default=None, help="substring filter on grid names")
    ap.add_argument("--per-grid", action="store_true", help="one PNG per grid with a colorbar")
    args = ap.parse_args(argv)
    for f in render_npz(args.npz, args.out, args.axis, args.index, args.grids, args.per_grid):
        print(f)


if __name__ == "__main__":
    main()
