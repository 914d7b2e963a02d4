"""viz.py: PNG slice rendering of exported grid npz files (the analog of
the reference's printAllData point-cloud visualization,
Solver.cpp:1031-1268)."""
import numpy as np
import pytest

from polystokes_tpu.viz import render_npz


@pytest.mark.quick
def test_render_contact_sheet_and_per_grid(tmp_path):
    rng = np.random.default_rng(0)
    n = 12
    npz = tmp_path / "grids.npz"
    np.savez(
        npz,
        cell_labels=rng.integers(0, 5, (n, n, n)),
        cell_region=rng.integers(-1, 4, (n, n, n)),
        liquid_center=rng.random((n, n, n)),
        p=rng.standard_normal((n, n, n)),
        stats_scalar=np.float64(3.0),  # non-3D entries are skipped
    )
    files = render_npz(str(npz), out_dir=str(tmp_path / "out"))
    assert len(files) == 1
    import os

    assert os.path.getsize(files[0]) > 1000

    files = render_npz(str(npz), out_dir=str(tmp_path / "out"), axis=0, index=3, per_grid=True)
    assert len(files) == 4
    for f in files:
        assert os.path.getsize(f) > 1000


@pytest.mark.quick
def test_render_name_filter_and_empty_error(tmp_path):
    npz = tmp_path / "g.npz"
    np.savez(npz, face0_labels=np.zeros((4, 4, 4), np.int32), scalar=np.float32(1.0))
    files = render_npz(str(npz), out_dir=str(tmp_path), names=["face0"])
    assert len(files) == 1
    with pytest.raises(ValueError):
        render_npz(str(npz), out_dir=str(tmp_path), names=["nonexistent"])
