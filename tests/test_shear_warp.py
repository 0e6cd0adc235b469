"""Shear-decomposed affine warp (ops/shear_warp.py) vs the gather path."""

import numpy as np
import pytest


def _theta(key, scale, rotate, translate):
    import jax

    from rsuper_tpu.data.augment import _affine_theta

    return _affine_theta(jax.random.PRNGKey(key), scale, rotate, translate,
                         (0.0, 0.0, 0.0))


@pytest.mark.parametrize("key", [0, 1, 2, 3])
def test_pass_matrices_reproduce_theta(key):
    """The decomposition is exact as a coordinate map: multiplying the pass
    matrices in application order must reproduce theta to float precision
    (ordering, Euler extraction and Paeth signs all live or die here)."""
    import jax.numpy as jnp

    from rsuper_tpu.ops.shear_warp import decompose_affine, pass_matrix

    th = _theta(key, (0.2, 0.2, 0.2), (30.0, 30.0, 30.0), (0.1, 0.1, 0.1))
    passes, d = decompose_affine(th)
    prod = jnp.eye(4)
    for p in passes:
        prod = prod @ pass_matrix(p)
    np.testing.assert_allclose(np.asarray(prod[:3]), np.asarray(th),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(d) > 0)


def test_scale_translate_matches_gather_exactly():
    """With no rotation the pass pipeline is separable trilinear — the same
    interpolant as map_coordinates, so the two paths must agree to float
    noise even on a white-noise volume."""
    import jax.numpy as jnp

    from rsuper_tpu.data.augment import affine_sample_window
    from rsuper_tpu.ops.shear_warp import shear_affine_window

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(24, 30, 28)).astype(np.float32))
    # rotation-free theta built directly (_affine_theta always draws up to
    # max(rotate, 1.0) degrees, which would leave sub-voxel shears in)
    th = jnp.asarray(
        np.array([[1.1, 0, 0, 0.13],
                  [0, 1.2, 0, 0.08],
                  [0, 0, 0.91, -0.086]], np.float32))
    crop = (16, 20, 18)
    starts = tuple((s - c) // 2 for s, c in zip(vol.shape, crop))
    ref = affine_sample_window(vol, th, crop, starts, order=1)
    got = shear_affine_window(vol, th, crop, starts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_rotation_close_on_structured_volumes():
    """With rotation the multi-pass interpolant differs from trilinear only
    at the highest frequencies (it low-passes slightly more). On smooth and
    band-limited volumes — the regime of real CT — the two paths must agree
    closely in the interior; borders zero-fill differently by design."""
    import jax.numpy as jnp

    from rsuper_tpu.data.augment import affine_sample_window, gaussian_blur
    from rsuper_tpu.ops.shear_warp import shear_affine_window

    n = (28, 32, 30)
    zz, yy, xx = np.meshgrid(*[np.linspace(-1, 1, k) for k in n],
                             indexing="ij")
    smooth = np.sin(2.1 * zz + 0.5) * np.cos(1.7 * yy) + 0.5 * np.sin(
        1.3 * xx + 0.2 * yy)
    th = _theta(7, (0.1, 0.1, 0.1), (30.0, 30.0, 30.0), (0.05, 0.05, 0.05))
    crop = (18, 22, 20)
    starts = tuple((s - c) // 2 for s, c in zip(n, crop))
    sl = tuple(slice(3, -3) for _ in range(3))

    vol = jnp.asarray(smooth.astype(np.float32))
    ref = np.asarray(affine_sample_window(vol, th, crop, starts, order=1))
    got = np.asarray(shear_affine_window(vol, th, crop, starts))
    np.testing.assert_allclose(got[sl], ref[sl], atol=0.02)

    rng = np.random.default_rng(1)
    tex = gaussian_blur(jnp.asarray(rng.normal(size=n).astype(np.float32)),
                        sigma=1.2)
    reft = np.asarray(affine_sample_window(tex, th, crop, starts,
                                           order=1))[sl]
    gott = np.asarray(shear_affine_window(tex, th, crop, starts))[sl]
    corr = np.corrcoef(reft.ravel(), gott.ravel())[0, 1]
    assert corr > 0.98, corr
