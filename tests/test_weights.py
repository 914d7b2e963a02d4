"""Tests for supersampled cut-cell integration weights
(reference: buildIntegrationWeightsAlt, Solver.cpp:239-326)."""
import jax.numpy as jnp
import numpy as np

from polystokes_tpu import sdf
from polystokes_tpu.grid import Grid
from polystokes_tpu.weights import compute_weights


def _grid(n=16, dx=1.0 / 16):
    return Grid(res=(n, n, n), dx=dx)


def test_all_liquid_no_solid():
    g = _grid()
    surf = jnp.full(g.res, -1.0)
    coll = jnp.full(g.res, 1.0)
    lw, fw = compute_weights(g, surf, coll, jnp.float64)
    for k, v in lw.items():
        np.testing.assert_allclose(np.asarray(v), 1.0)
    for k, v in fw.items():
        np.testing.assert_allclose(np.asarray(v), 1.0)


def test_halfspace_plane_weights():
    """A liquid half-space x < 0.5 (in world units): face weights along the
    interface must transition 1 -> 0 and the interface face gets a
    fractional value."""
    g = _grid(n=8, dx=1.0 / 8)
    f = sdf.plane((1.0, 0.0, 0.0), 0.5)
    surf = sdf.sample_at_centers(f, g.res, g.dx, jnp.float64)
    coll = jnp.full(g.res, 1.0)
    lw, _ = compute_weights(g, surf, coll, jnp.float64)
    c = np.asarray(lw["center"])
    # cell centers at x = i*dx: inside for i*dx < 0.5 -> i <= 3
    assert np.all(c[:3] == 1.0)
    assert np.all(c[6:] == 0.0)
    # the x-face at i=4 sits at x=3.5*dx=0.4375; supersamples at
    # x in {0.40625, 0.46875} -> both inside -> weight 1
    fx = np.asarray(lw["face0"])
    assert np.all(fx[:4] == 1.0)
    # face at i=5 (x=0.5625): samples at 0.53125, 0.59375 -> outside
    assert np.all(fx[6:] == 0.0)


def test_sphere_volume_fraction_reasonable():
    """Total liquid volume from center weights should approximate the
    sphere volume within a few percent."""
    g = _grid(n=32, dx=1.0 / 32)
    f = sdf.sphere((0.5, 0.5, 0.5), 0.3)
    surf = sdf.sample_at_centers(f, g.res, g.dx, jnp.float64)
    coll = jnp.full(g.res, 1.0)
    lw, _ = compute_weights(g, surf, coll, jnp.float64)
    vol = float(jnp.sum(lw["center"])) * g.dx**3
    expect = 4.0 / 3.0 * np.pi * 0.3**3
    assert abs(vol - expect) / expect < 0.05


def test_solid_weights_inverted():
    """fluid weight = 0 deep inside solid, 1 outside."""
    g = _grid(n=16, dx=1.0 / 16)
    f = sdf.sphere((0.5, 0.5, 0.5), 0.25)
    coll = sdf.sample_at_centers(f, g.res, g.dx, jnp.float64)
    surf = jnp.full(g.res, -1.0)
    _, fw = compute_weights(g, surf, coll, jnp.float64)
    c = np.asarray(fw["center"])
    assert c[8, 8, 8] == 0.0  # center of the solid sphere
    assert c[0, 0, 0] == 1.0


def test_face_edge_shapes():
    g = _grid(n=6, dx=1.0)
    surf = jnp.full(g.res, -1.0)
    coll = jnp.full(g.res, 1.0)
    lw, fw = compute_weights(g, surf, coll, jnp.float64)
    assert lw["face0"].shape == (7, 6, 6)
    assert lw["face1"].shape == (6, 7, 6)
    assert lw["face2"].shape == (6, 6, 7)
    assert lw["edge0"].shape == (6, 7, 7)  # YZ edges (run along x)
    assert lw["edge1"].shape == (7, 6, 7)
    assert lw["edge2"].shape == (7, 7, 6)
