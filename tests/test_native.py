"""Tests for the native C++ host helpers."""
import numpy as np
import scipy.io
import scipy.sparse as sp

from polystokes_tpu.native import connected_components_host, get_lib, write_mtx, write_mtx_vector


def test_native_builds():
    assert get_lib() is not None


def test_union_find_components():
    nx, ny, nz = 8, 6, 6
    labels = np.zeros((nx, ny, nz), dtype=np.int8)
    REDUCED = 4
    labels[1:3, 1:5, 1:5] = REDUCED
    labels[5:7, 1:5, 1:5] = REDUCED  # disconnected blob
    fwx = np.ones((nx + 1, ny, nz), np.float32)
    fwy = np.ones((nx, ny + 1, nz), np.float32)
    fwz = np.ones((nx, ny, nz + 1), np.float32)
    out, count = connected_components_host(labels, fwx, fwy, fwz)
    assert count == 2
    assert out[1, 1, 1] == out[2, 4, 4]
    assert out[1, 1, 1] != out[5, 1, 1]
    assert out[0, 0, 0] == -1

    # zero-weight face splits a component
    fwx[2] = 0.0  # faces between cells x=1 and x=2
    out, count = connected_components_host(labels, fwx, fwy, fwz)
    assert count == 3


def test_mtx_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    m = sp.random(17, 13, density=0.2, random_state=0)
    p = str(tmp_path / "m.mtx")
    assert write_mtx(p, m)
    m2 = scipy.io.mmread(p)
    np.testing.assert_allclose(m.toarray(), m2.toarray(), atol=1e-15)

    v = rng.standard_normal(11)
    pv = str(tmp_path / "v.mtx")
    assert write_mtx_vector(pv, v)
    v2 = np.asarray(scipy.io.mmread(pv)).ravel()
    np.testing.assert_allclose(v, v2, atol=1e-15)
