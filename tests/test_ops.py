"""Golden tests for the core ball/morphology/selection/GWRP ops.

These encode the invariants the reference enforces at runtime or via its
synthetic harnesses (SURVEY.md §4: ``apply_ball_convolution_and_save``,
``generate_input_and_process_volume``, pseudo-mask volume tolerances).
"""

import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi
import pytest

from rsuper_tpu.ops import (
    ball_kernel,
    fft_ball_conv,
    dilate,
    topn_mask,
    gwrp_pool,
    gwrp_weights,
    odd_ceil,
    good_fft_size,
)
from rsuper_tpu.ops.balls import insert_ball, reference_kernel_size
from rsuper_tpu.ops.gwrp import gwrp_weights_exact, gwrp_weights_binned


# ---------------------------------------------------------------- ball kernels
def test_odd_ceil():
    assert odd_ceil(7) == 7
    assert odd_ceil(7.1) == 9
    assert odd_ceil(8) == 9
    assert float(odd_ceil(jnp.float32(8.0))) == 9.0


def test_ball_kernel_matches_reference_geometry():
    # d=7 -> d_odd=7, box = odd(ceil(8.4)) = 9, radius 3.5
    k = np.asarray(ball_kernel(7))
    assert k.shape == (9, 9, 9)
    c = 4
    assert k[c, c, c] == 1
    # offset (3,1,1): dist = sqrt(11) ~ 3.317 <= 3.5 -> inside
    assert k[c + 3, c + 1, c + 1] == 1
    # offset (3,2,0): dist = sqrt(13) ~ 3.606 > 3.5 -> outside
    assert k[c + 3, c + 2, c] == 0
    # symmetric
    assert np.array_equal(k, k[::-1]) and np.array_equal(k, k.transpose(2, 1, 0))


def test_gaussian_ball_kernel_normalized_and_peaked():
    k = np.asarray(ball_kernel(11, gaussian=True, gaussian_std=1.5))
    assert abs(k.sum() - 1.0) < 1e-5
    assert k.max() == k[k.shape[0] // 2, k.shape[1] // 2, k.shape[2] // 2]
    assert (k >= 0).all()


def test_good_fft_size():
    assert good_fft_size(128) == 128
    assert good_fft_size(129) == 135
    assert good_fft_size(208) == 210


# ------------------------------------------------------------------- FFT conv
def test_fft_ball_conv_matches_direct():
    rng = np.random.default_rng(0)
    x = rng.random((24, 20, 28)).astype(np.float32)
    for d, gaussian in [(5, False), (9, True), (15, False)]:
        k = np.asarray(ball_kernel(d, gaussian=gaussian))
        want = ndi.convolve(x, k, mode="constant")
        got = np.asarray(
            fft_ball_conv(jnp.asarray(x), d, gaussian=gaussian, max_diameter=16)
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_fft_ball_conv_centering():
    # Reference harness apply_ball_convolution_and_save: a centred cube stays
    # centred under ball convolution (losses_foundation.py:1896-1955).
    x = np.zeros((48, 48, 48), np.float32)
    x[20:29, 20:29, 20:29] = 1.0
    out = np.asarray(fft_ball_conv(jnp.asarray(x), 11, gaussian=True, max_diameter=16))
    com = ndi.center_of_mass(out)
    assert np.allclose(com, (24, 24, 24), atol=0.05)
    assert np.unravel_index(out.argmax(), out.shape) == (24, 24, 24)


def test_fft_ball_conv_no_wraparound():
    # Mass at one corner must not leak to the opposite corner.
    x = np.zeros((32, 32, 32), np.float32)
    x[0, 0, 0] = 1.0
    out = np.asarray(fft_ball_conv(jnp.asarray(x), 9, max_diameter=16))
    assert out[-1, -1, -1] == pytest.approx(0.0, abs=1e-3)
    assert out[0, 0, 0] == pytest.approx(1.0, abs=1e-3)


# ------------------------------------------------------------------- dilation
def _scipy_ball(k):
    return np.asarray(ball_kernel(k)) > 0


@pytest.mark.parametrize("ks", [3, 5, 7, 13])
def test_dilate_matches_scipy(ks):
    rng = np.random.default_rng(1)
    x = (rng.random((20, 22, 18)) > 0.97).astype(np.float32)
    want = ndi.binary_dilation(x > 0, structure=_scipy_ball(ks)).astype(np.float32)
    got = np.asarray(dilate(jnp.asarray(x), ks))
    np.testing.assert_array_equal(got, want)


def test_dilate_channelwise_no_mixing():
    x = np.zeros((10, 10, 10, 2), np.float32)
    x[5, 5, 5, 0] = 1.0
    out = np.asarray(dilate(jnp.asarray(x), 3))
    assert out[..., 1].sum() == 0
    assert out[..., 0].sum() > 1


def test_dilate_kernel1_identity():
    x = (np.random.default_rng(2).random((8, 8, 8)) > 0.5).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(dilate(jnp.asarray(x), 1)), x)


def test_dilate_fft_matches_direct():
    rng = np.random.default_rng(3)
    x = (rng.random((24, 24, 24)) > 0.98).astype(np.float32)
    a = np.asarray(dilate(jnp.asarray(x), 13, method="direct"))
    b = np.asarray(dilate(jnp.asarray(x), 13, method="fft"))
    np.testing.assert_array_equal(a, b)


# ------------------------------------------------------------------ selection
def test_topn_mask_counts():
    rng = np.random.default_rng(4)
    x = rng.random((32, 32, 32)).astype(np.float32)
    for n in [10, 500, 5000]:
        m = np.asarray(topn_mask(jnp.asarray(x), n))
        assert abs(m.sum() - n) <= max(2, 0.01 * n)
        # selected entries are all >= every unselected entry
        assert x[m > 0].min() >= x[m == 0].max() - 1e-6


def test_topn_mask_excludes_zeros():
    x = np.zeros((16, 16, 16), np.float32)
    x[0, 0, :5] = [0.9, 0.8, 0.7, 0.6, 0.5]
    m = np.asarray(topn_mask(jnp.asarray(x), 3))
    assert m.sum() == 3
    assert m[0, 0, :3].all()
    # n greater than positive count -> all positives, no zeros
    m = np.asarray(topn_mask(jnp.asarray(x), 1000))
    assert m.sum() == 5


def test_insert_ball_matches_volume():
    m = np.asarray(insert_ball((40, 40, 40), tuple(jnp.asarray(c) for c in (20, 20, 20)), 11))
    k = np.asarray(ball_kernel(11))
    assert m.sum() == k.sum()
    # clipped at border
    m2 = np.asarray(insert_ball((40, 40, 40), tuple(jnp.asarray(c) for c in (0, 0, 0)), 11))
    assert 0 < m2.sum() < m.sum()


def test_reference_kernel_size():
    assert reference_kernel_size(7) == 9  # ceil(1.2*7)=9
    assert reference_kernel_size(15) == 19  # ceil(1.2*15)=18 -> 19


# ----------------------------------------------------------------------- GWRP
def test_gwrp_pool_uniform_input():
    x = jnp.ones((8, 8, 8))
    assert float(gwrp_pool(x, n=50, c=0.75)) == pytest.approx(1.0, abs=1e-5)


def test_gwrp_weights_exact_properties():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((10, 10, 10)).astype(np.float32))
    n = 100
    w = np.asarray(gwrp_weights_exact(x, n, c=0.5))
    assert w.sum() == pytest.approx(1.0, rel=1e-5)
    assert (w > 0).sum() == n  # hard cutoff
    xf = np.asarray(x).ravel()
    wf = w.ravel()
    # weights are monotone non-increasing in value rank
    order = np.argsort(-xf)
    ws = wf[order]
    assert (np.diff(ws[:n]) <= 1e-9).all()
    # top-n weights hold c of the *raw* (unnormalised) geometric mass:
    # after hard cutoff + renorm the sum is 1 by construction; check decay d
    d = (1 - 0.5) ** (1.0 / n)
    assert ws[0] / ws[n - 1] == pytest.approx(d ** -(n - 1), rel=1e-3)


def test_gwrp_weights_binned_close_to_exact():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((12, 12, 12)).astype(np.float32))
    n = 200
    we = np.asarray(gwrp_weights_exact(x, n, c=0.5))
    wb = np.asarray(gwrp_weights_binned(x, n, c=0.5, levels=4096))
    assert wb.sum() == pytest.approx(1.0, rel=1e-4)
    # same support up to bin-tie resolution and close total-variation distance
    assert np.abs(we - wb).sum() < 0.05


def test_gwrp_weights_binned_radix_matches_onehot_oracle():
    # the radix (16x16) ranking must be BIT-IDENTICAL to the direct
    # levels-wide one-hot ranking it replaced
    rng = np.random.default_rng(11)
    x = rng.random((10, 11, 12)).astype(np.float32)
    x[x < 0.3] = 0.0  # include non-positive voxels (rank L path)
    for levels in (256, 1024):
        flat = x.reshape(-1)
        hi = max(flat.max(), 1e-30)
        b = np.clip(np.ceil(flat / hi * levels).astype(np.int64), 0, levels) - 1
        counts = np.bincount(b[b >= 0], minlength=levels)
        higher = counts[::-1].cumsum()[::-1] - counts
        ranks = np.where(b < 0, float(flat.size), higher[np.maximum(b, 0)])
        n, c = 140, 0.5
        d = (1.0 - c) ** (1.0 / max(n, 1.0))
        w = np.where(ranks < n, d**ranks, 0.0)
        w = (w / max(w.sum(), 1e-30)).reshape(x.shape).astype(np.float32)
        got = np.asarray(gwrp_weights_binned(
            jnp.asarray(x), n, c=c, levels=levels))
        np.testing.assert_allclose(got, w, rtol=1e-5, atol=1e-8)


def test_gwrp_weights_binned_zero_excluded():
    x = np.zeros((8, 8, 8), np.float32)
    x[0, 0, :4] = [0.4, 0.3, 0.2, 0.1]
    w = np.asarray(gwrp_weights(jnp.asarray(x), 2, c=0.5, method="binned"))
    assert (w.ravel()[4:] == 0).all()
    assert (w[0, 0, :2] > 0).all()
    assert w[0, 0, 3] == 0


def test_pallas_topn_matches_reference():
    from rsuper_tpu.ops.pallas_topn import pallas_topn_threshold
    from rsuper_tpu.ops.selection import topn_threshold

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.random((20, 24, 28)).astype(np.float32))
    for n in [1, 100, 3000]:
        a = float(pallas_topn_threshold(x, n, interpret=True))
        b = float(topn_threshold(x, n))
        assert a == pytest.approx(b, abs=1e-7)


def test_pallas_topn_multi_matches():
    from rsuper_tpu.ops.pallas_topn import pallas_topn_threshold_multi
    from rsuper_tpu.ops.selection import topn_masks_multi, topn_threshold

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.random((16, 20, 24)).astype(np.float32))
    ns = jnp.asarray([5.0, 200.0, 2000.0])
    ts = np.asarray(pallas_topn_threshold_multi(x, ns, interpret=True))
    for t, n in zip(ts, [5, 200, 2000]):
        assert t == pytest.approx(float(topn_threshold(x, n)), abs=1e-7)
    masks = np.asarray(topn_masks_multi(x, ns))
    assert masks.shape == (3, 16, 20, 24)
    for m, n in zip(masks, [5, 200, 2000]):
        assert abs(m.sum() - n) <= max(2, 0.01 * n)


def test_pallas_topn_batched_matches():
    from rsuper_tpu.ops.pallas_topn import pallas_topn_threshold_multi_batched
    from rsuper_tpu.ops.selection import topn_masks_multi_batched, topn_threshold

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.random((3, 16, 20, 24)).astype(np.float32))
    ns = jnp.asarray([[5.0, 200.0], [50.0, 1000.0], [1.0, 7000.0]])
    ts = np.asarray(pallas_topn_threshold_multi_batched(x, ns, interpret=True))
    assert ts.shape == (3, 2)
    for b in range(3):
        for k in range(2):
            ref = float(topn_threshold(x[b], float(ns[b, k])))
            assert ts[b, k] == pytest.approx(ref, abs=1e-7)
    masks = np.asarray(topn_masks_multi_batched(x, ns))
    assert masks.shape == (3, 2, 16, 20, 24)
    for b in range(3):
        for k, n in enumerate(np.asarray(ns)[b]):
            assert abs(masks[b, k].sum() - n) <= max(2, 0.01 * n)


def test_isolate_tumor_batched_matches_single():
    from rsuper_tpu.losses.ball import (
        BallLossConfig, isolate_tumor, isolate_tumor_batched,
    )

    cfg = BallLossConfig(max_diameter=24, topn_iters=30)
    rng = np.random.default_rng(14)
    x = np.zeros((2, 24, 24, 24), np.float32)
    x[0, 6:14, 6:14, 6:14] = rng.random((8, 8, 8)) * 0.5 + 0.5
    x[1, 2:20, 2:20, 2:20] = rng.random((18, 18, 18)) * 0.3
    dia = jnp.asarray([8.0, 12.0])
    vol = jnp.asarray([250.0, 700.0])
    mb, msb, mbb = isolate_tumor_batched(jnp.asarray(x), dia, vol, cfg)
    for b in range(2):
        m1, ms1, mb1 = isolate_tumor(jnp.asarray(x[b]), dia[b], vol[b], cfg)
        np.testing.assert_array_equal(np.asarray(mb)[b], np.asarray(m1))
        np.testing.assert_array_equal(np.asarray(msb)[b], np.asarray(ms1))
        np.testing.assert_array_equal(np.asarray(mbb)[b], np.asarray(mb1))


def test_ball_counts_match_materialised():
    # the closed-form O(D·H) counts must equal the materialised-ball sums
    # EXACTLY — the ball loss's volume-raise rule and growth ladder compare
    # them against integer reported volumes.
    from rsuper_tpu.ops.balls import (
        ball_count_clipped, ball_count_wrapped, ball_kernel_wrapped,
    )

    shape = (20, 24, 28)
    for d in [1.0, 2.3, 3.0, 5.0, 9.7, 17.0, 23.0, 27.0, 40.0]:
        want = float(jnp.sum(ball_kernel_wrapped(shape, jnp.float32(d))))
        got = float(ball_count_wrapped(shape, jnp.float32(d)))
        assert got == want, (d, got, want)

    rng = np.random.default_rng(3)
    for _ in range(12):
        c = tuple(jnp.int32(rng.integers(0, s)) for s in shape)
        d = jnp.float32(rng.uniform(1.0, 35.0))
        want = float(jnp.sum(insert_ball(shape, c, d)))
        got = float(ball_count_clipped(shape, c, d))
        assert got == want, (c, float(d), got, want)
    # border-clipped corner case at every extreme
    for c in [(jnp.int32(0), jnp.int32(0), jnp.int32(0)),
              (jnp.int32(19), jnp.int32(23), jnp.int32(27))]:
        for d in [3.0, 11.0, 30.0]:
            want = float(jnp.sum(insert_ball(shape, c, jnp.float32(d))))
            got = float(ball_count_clipped(shape, c, jnp.float32(d)))
            assert got == want, (c, d, got, want)


def test_dilate_cf_maxpool_variant():
    from rsuper_tpu.ops.morphology import dilate_cf

    x = np.zeros((1, 1, 16, 16, 16), np.float32)
    x[0, 0, 8, 8, 8] = 1.0
    out = np.asarray(dilate_cf(jnp.asarray(x), 7, method="maxpool"))
    # k=7 -> cube size int(7/sqrt2)=4 -> 5; reach 2 per axis
    assert out[0, 0, 8, 8, 8] == 1 and out[0, 0, 8, 8, 10] == 1
    assert out[0, 0, 8, 8, 11] == 0
    assert out[0, 0, 10, 10, 10] == 1  # cube corner included


def test_dilate_cf_ball5_exact():
    from rsuper_tpu.ops.morphology import dilate_cf

    rng = np.random.default_rng(13)
    x = (rng.random((2, 18, 20, 22)) > 0.97).astype(np.float32)
    got = np.asarray(dilate_cf(jnp.asarray(x), 5))  # auto -> ball5 fast path
    want = np.stack([
        ndi.binary_dilation(x[i] > 0, structure=_scipy_ball(5)).astype(np.float32)
        for i in range(2)
    ])
    np.testing.assert_array_equal(got, want)


def test_dilate_cf_ball7_exact():
    """auto k=7 routes to the (ball5 ⊕ cross) ∪ corners decomposition —
    must equal scipy's exact radius-3.5 Euclidean ball voxel-for-voxel."""
    from rsuper_tpu.ops.morphology import dilate_cf

    rng = np.random.default_rng(29)
    x = (rng.random((2, 18, 20, 22)) > 0.97).astype(np.float32)
    got = np.asarray(dilate_cf(jnp.asarray(x), 7))  # auto -> ball7 fast path
    want = np.stack([
        ndi.binary_dilation(x[i] > 0, structure=_scipy_ball(7)).astype(np.float32)
        for i in range(2)
    ])
    np.testing.assert_array_equal(got, want)
    # sparse single-voxel probe: corner (2,2,2) is IN the ball (12 <= 12.25),
    # (3,2,0) (13) and (3,3,*) are OUT
    y = np.zeros((1, 16, 16, 16), np.float32)
    y[0, 8, 8, 8] = 1.0
    out = np.asarray(dilate_cf(jnp.asarray(y), 7))
    assert out[0, 10, 10, 10] == 1 and out[0, 11, 8, 8] == 1
    assert out[0, 11, 10, 8] == 0 and out[0, 11, 11, 8] == 0


def test_dilate_cf_ball3_exact():
    """ball(radius 1.5) = the 18-neighbourhood; the pair-plane union
    decomposition must match scipy voxel-for-voxel."""
    from rsuper_tpu.ops.morphology import _dilate_ball3_cf

    rng = np.random.default_rng(5)
    x = (rng.random((2, 14, 15, 16)) > 0.95).astype(np.float32)
    got = np.asarray(_dilate_ball3_cf(jnp.asarray(x)))
    want = np.stack([
        ndi.binary_dilation(x[i] > 0, structure=_scipy_ball(3)).astype(np.float32)
        for i in range(2)
    ])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ks", [11, 15, 31])
def test_dilate_cf_iter_matches_reference_decomposition(ks):
    """method='iter' must equal the reference's dilate_volume semantics
    (losses_foundation.py:22-47): radius//3 iterated ball(7) passes + one
    ball(2·rem+1) remainder pass, each an exact discrete Euclidean ball."""
    from rsuper_tpu.ops.morphology import dilate_cf

    rng = np.random.default_rng(ks)
    x = (rng.random((1, 20, 22, 24)) > 0.995).astype(np.float32)
    got = np.asarray(dilate_cf(jnp.asarray(x), ks, method="iter"))
    want = x[0] > 0
    radius = (ks - 1) // 2
    n7, rem = divmod(radius, 3)
    for _ in range(n7):
        want = ndi.binary_dilation(want, structure=_scipy_ball(7))
    if rem:
        want = ndi.binary_dilation(want, structure=_scipy_ball(2 * rem + 1))
    np.testing.assert_array_equal(got[0], want.astype(np.float32))


# ------------------------------------------------------------ channel-first conv
class TestConvCF:
    """Pallas channel-first 3x3x3 conv vs flax nn.Conv golden values.

    The XLA dispatch path runs everywhere; the Pallas kernel itself is
    validated in interpret mode (real lowering is exercised by bench.py on
    TPU hardware)."""

    @pytest.fixture(params=["a", "d", "e"])
    def form(self, request, monkeypatch):
        """Pin the dot formulation ("a" per-tap / "d" kh-stacked / "e"
        kh+kw-K-stacked) so every kernel family gets interpret-mode coverage
        regardless of what the hardware-calibrated table would pick. The
        H-tiled dispatch has no "e" kernels and silently runs "a" there."""
        from rsuper_tpu.ops import conv_cf

        monkeypatch.setattr(conv_cf, "_form_override", request.param)
        return request.param

    def _golden(self, x_cl, w):
        import flax.linen as nn

        conv = nn.Conv(w.shape[-1], (3, 3, 3), padding="SAME", use_bias=False)
        return conv.apply({"params": {"kernel": w}}, x_cl)

    def _setup(self, B=2, C=8, Co=8, S=(6, 8, 10), seed=0):
        rng = np.random.default_rng(seed)
        x_cl = rng.normal(size=(B, *S, C)).astype(np.float32)
        w = rng.normal(size=(3, 3, 3, C, Co)).astype(np.float32) * 0.2
        return jnp.asarray(x_cl), jnp.asarray(w)

    def test_xla_path_matches_flax(self):
        from rsuper_tpu.ops.conv_cf import conv3x3x3_cf

        x_cl, w = self._setup()
        x_cf = jnp.moveaxis(x_cl, -1, 2)
        got = jnp.moveaxis(conv3x3x3_cf(x_cf, w), 2, -1)
        np.testing.assert_allclose(got, self._golden(x_cl, w), atol=1e-4)

    def test_pallas_interpret_matches_flax(self, form):
        from rsuper_tpu.ops.conv_cf import conv3x3x3_cf

        x_cl, w = self._setup()
        x_cf = jnp.moveaxis(x_cl, -1, 2)
        got = jnp.moveaxis(
            conv3x3x3_cf(x_cf, w, force_pallas=True, interpret=True), 2, -1
        )
        np.testing.assert_allclose(got, self._golden(x_cl, w), atol=1e-4)

    def test_pallas_channel_chunking_matches_flax(self, form):
        """C_in > 64 splits into VMEM-sized chunks summed outside the kernel
        (the decoder's 96-channel concat input OOM'd scoped vmem on v5e)."""
        from rsuper_tpu.ops.conv_cf import conv3x3x3_cf

        x_cl, w = self._setup(B=1, C=96, Co=8, S=(4, 6, 8), seed=2)
        x_cf = jnp.moveaxis(x_cl, -1, 2)
        got = jnp.moveaxis(
            conv3x3x3_cf(x_cf, w, force_pallas=True, interpret=True), 2, -1
        )
        np.testing.assert_allclose(got, self._golden(x_cl, w), atol=1e-3)

        # grads through the chunked path (dgrad Co>64 + wgrad concat)
        import jax

        def f(mode):
            def g(x, w):
                y = conv3x3x3_cf(x, w, force_pallas=mode, interpret=mode)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return g

        gx_p, gw_p = jax.grad(f(True), argnums=(0, 1))(x_cf, w)
        gx_x, gw_x = jax.grad(f(False), argnums=(0, 1))(x_cf, w)
        np.testing.assert_allclose(gx_p, gx_x, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(gw_p, gw_x, rtol=1e-4, atol=1e-2)

    def test_pallas_per_tap_mode_matches_flax(self, monkeypatch):
        """Large planes (128³) switch to 27 per-tap dots without the kw-concat
        patch buffer; force the mode via the budget and check both fwd+grads."""
        import jax

        from rsuper_tpu.ops import conv_cf

        monkeypatch.setattr(conv_cf, "_CONCAT_BUDGET", 0)
        x_cl, w = self._setup(B=1, C=4, Co=6, S=(4, 6, 8), seed=3)
        x_cf = jnp.moveaxis(x_cl, -1, 2)
        got = jnp.moveaxis(
            conv_cf.conv3x3x3_cf(x_cf, w, force_pallas=True, interpret=True),
            2, -1,
        )
        np.testing.assert_allclose(got, self._golden(x_cl, w), atol=1e-4)

        def f(mode):
            def g(x, w):
                y = conv_cf.conv3x3x3_cf(x, w, force_pallas=mode, interpret=mode)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return g

        gx_p, gw_p = jax.grad(f(True), argnums=(0, 1))(x_cf, w)
        gx_x, gw_x = jax.grad(f(False), argnums=(0, 1))(x_cf, w)
        np.testing.assert_allclose(gx_p, gx_x, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(gw_p, gw_x, rtol=1e-4, atol=1e-2)

    @pytest.mark.parametrize("shape", [(1, 32), (2, 32), (1, 8)])
    def test_pallas_form_f_small_ci(self, monkeypatch, shape):
        """Form "f" (all 27 taps stacked into K — the tiny-Ci stem class):
        fwd + both grads vs XLA. The override also routes this conv's dgrad
        (Ci=Co_fwd, Co=Ci_fwd) and wgrad through "f" when eligible."""
        import jax

        from rsuper_tpu.ops import conv_cf

        monkeypatch.setattr(conv_cf, "_form_override", "f")
        Ci, Co = shape
        x_cl, w = self._setup(B=2, C=Ci, Co=Co, S=(5, 6, 10), seed=7)
        x_cf = jnp.moveaxis(x_cl, -1, 2)
        got = jnp.moveaxis(
            conv_cf.conv3x3x3_cf(x_cf, w, force_pallas=True, interpret=True),
            2, -1,
        )
        np.testing.assert_allclose(got, self._golden(x_cl, w), atol=1e-4)

        def f(mode):
            def g(x, w):
                y = conv_cf.conv3x3x3_cf(x, w, force_pallas=mode,
                                         interpret=mode)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return g

        gx_p, gw_p = jax.grad(f(True), argnums=(0, 1))(x_cf, w)
        gx_x, gw_x = jax.grad(f(False), argnums=(0, 1))(x_cf, w)
        np.testing.assert_allclose(gx_p, gx_x, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(gw_p, gw_x, rtol=1e-4, atol=1e-2)

    def test_pallas_form_g_small_co(self, monkeypatch):
        """Form "g" (kh/kw stacked along M with output shifts — the tiny-Co
        stem-dgrad/outc class): fwd + both grads vs XLA. The wgrad and the
        Co=32 dgrad are ineligible for "g" and must silently downgrade."""
        import jax

        from rsuper_tpu.ops import conv_cf

        monkeypatch.setattr(conv_cf, "_form_override", "g")
        x_cl, w = self._setup(B=2, C=32, Co=1, S=(5, 6, 10), seed=8)
        x_cf = jnp.moveaxis(x_cl, -1, 2)
        got = jnp.moveaxis(
            conv_cf.conv3x3x3_cf(x_cf, w, force_pallas=True, interpret=True),
            2, -1,
        )
        np.testing.assert_allclose(got, self._golden(x_cl, w), atol=1e-4)

        def f(mode):
            def g(x, w):
                y = conv_cf.conv3x3x3_cf(x, w, force_pallas=mode,
                                         interpret=mode)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return g

        gx_p, gw_p = jax.grad(f(True), argnums=(0, 1))(x_cf, w)
        gx_x, gw_x = jax.grad(f(False), argnums=(0, 1))(x_cf, w)
        np.testing.assert_allclose(gx_p, gx_x, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(gw_p, gw_x, rtol=1e-4, atol=1e-2)

    def test_pallas_ht_mode_matches_flax(self, monkeypatch, form):
        """H-tiled kernels (the 128³ path: plane larger than the whole-plane
        VMEM budget, W 128-divisible) — multi-tile grid with h-halo refs,
        fwd + both grads vs the XLA path."""
        import jax

        from rsuper_tpu.ops import conv_cf

        monkeypatch.setattr(conv_cf, "_PLANE_LANES", 0)  # force HT dispatch
        monkeypatch.setattr(conv_cf, "_pick_th", lambda H, W, C: 2)
        x_cl, w = self._setup(B=2, C=4, Co=6, S=(4, 6, 128), seed=4)
        x_cf = jnp.moveaxis(x_cl, -1, 2)
        got = jnp.moveaxis(
            conv_cf.conv3x3x3_cf(x_cf, w, force_pallas=True, interpret=True),
            2, -1,
        )
        np.testing.assert_allclose(got, self._golden(x_cl, w), atol=1e-4)

        def f(mode):
            def g(x, w):
                y = conv_cf.conv3x3x3_cf(x, w, force_pallas=mode, interpret=mode)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return g

        gx_p, gw_p = jax.grad(f(True), argnums=(0, 1))(x_cf, w)
        gx_x, gw_x = jax.grad(f(False), argnums=(0, 1))(x_cf, w)
        np.testing.assert_allclose(gx_p, gx_x, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(gw_p, gw_x, rtol=1e-4, atol=1e-2)

    def test_pallas_ht_channel_chunking(self, monkeypatch, form):
        """HT path with C_in > chunk ceiling (the 128³ decoder concat input)."""
        from rsuper_tpu.ops import conv_cf

        monkeypatch.setattr(conv_cf, "_PLANE_LANES", 0)
        monkeypatch.setattr(conv_cf, "_CI_CHUNK", 8)
        x_cl, w = self._setup(B=1, C=12, Co=4, S=(3, 4, 128), seed=5)
        x_cf = jnp.moveaxis(x_cl, -1, 2)
        got = jnp.moveaxis(
            conv_cf.conv3x3x3_cf(x_cf, w, force_pallas=True, interpret=True),
            2, -1,
        )
        np.testing.assert_allclose(got, self._golden(x_cl, w), atol=1e-3)

    def test_unsupported_plane_falls_back_to_xla(self):
        """Planes too big for whole-plane mode with a non-128-divisible W must
        dispatch to XLA instead of a kernel that would OOM scoped VMEM."""
        from rsuper_tpu.ops import conv_cf

        assert conv_cf.cf_plane_supported(96, 96)
        assert conv_cf.cf_plane_supported(128, 128)
        assert conv_cf.cf_plane_supported(200, 256)
        assert not conv_cf.cf_plane_supported(112, 112)
        x_cl, w = self._setup(B=1, C=2, Co=2, S=(2, 112, 112), seed=6)
        x_cf = jnp.moveaxis(x_cl, -1, 2)
        got = jnp.moveaxis(
            conv_cf.conv3x3x3_cf(x_cf, w, force_pallas=True), 2, -1
        )
        np.testing.assert_allclose(got, self._golden(x_cl, w), atol=1e-4)

    def _fused_golden(self, x_cf, w, eps=1e-4):
        """Unfused reference: channel-first IN (no affine) → relu → conv."""
        import jax

        from rsuper_tpu.models.layers import instance_norm_cf
        from rsuper_tpu.ops.conv_cf import _conv3_cf_xla

        a = jax.nn.relu(instance_norm_cf(x_cf, eps))
        return _conv3_cf_xla(a, w)

    @pytest.mark.parametrize("ht", [False, True])
    def test_fused_in_relu_conv_matches_unfused(self, monkeypatch, ht, form):
        """Fused IN+relu+conv epilogue (whole-plane and H-tiled kernels):
        forward and both grads vs the unfused norm→relu→conv chain."""
        import jax

        from rsuper_tpu.ops import conv_cf

        if ht:
            monkeypatch.setattr(conv_cf, "_PLANE_LANES", 0)
            monkeypatch.setattr(conv_cf, "_pick_th", lambda H, W, C: 2)
            x_cl, w = self._setup(B=2, C=4, Co=6, S=(4, 6, 128), seed=7)
        else:
            x_cl, w = self._setup(B=2, C=8, Co=8, S=(6, 8, 10), seed=7)
        x_cf = jnp.moveaxis(x_cl, -1, 2)

        got = conv_cf.in_relu_conv3x3x3_cf(x_cf, w, force_pallas=True,
                                           interpret=True)
        want = self._fused_golden(x_cf, w)
        np.testing.assert_allclose(got, want, atol=1e-4)

        def f(fused):
            def g(x, w):
                if fused:
                    y = conv_cf.in_relu_conv3x3x3_cf(
                        x, w, force_pallas=True, interpret=True)
                else:
                    y = self._fused_golden(x, w)
                return jnp.sum(y.astype(jnp.float32) ** 2)
            return g

        gx_p, gw_p = jax.grad(f(True), argnums=(0, 1))(x_cf, w)
        gx_x, gw_x = jax.grad(f(False), argnums=(0, 1))(x_cf, w)
        np.testing.assert_allclose(gx_p, gx_x, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(gw_p, gw_x, rtol=1e-4, atol=1e-2)

    def test_fused_in_relu_conv_chunked(self, monkeypatch, form):
        """Fused epilogue through the channel-chunk path: stats slice per
        chunk (per-channel normalisation is chunk-independent)."""
        from rsuper_tpu.ops import conv_cf

        monkeypatch.setattr(conv_cf, "_CI_CHUNK", 8)
        x_cl, w = self._setup(B=1, C=12, Co=4, S=(3, 4, 8), seed=8)
        x_cf = jnp.moveaxis(x_cl, -1, 2)
        got = conv_cf.in_relu_conv3x3x3_cf(x_cf, w, force_pallas=True,
                                           interpret=True)
        np.testing.assert_allclose(got, self._fused_golden(x_cf, w),
                                   atol=1e-3)

    def test_pallas_gradients_match_xla(self, form):
        import jax

        from rsuper_tpu.ops.conv_cf import conv3x3x3_cf

        x_cl, w = self._setup(B=1, C=4, Co=6, S=(4, 6, 8))
        x_cf = jnp.moveaxis(x_cl, -1, 2)
        cot = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 4, 6, 6, 8)).astype(np.float32)
        )

        def f_pallas(x, w):
            return jnp.sum(
                conv3x3x3_cf(x, w, force_pallas=True, interpret=True) * cot
            )

        def f_xla(x, w):
            return jnp.sum(conv3x3x3_cf(x, w) * cot)

        gx_p, gw_p = jax.grad(f_pallas, argnums=(0, 1))(x_cf, w)
        gx_x, gw_x = jax.grad(f_xla, argnums=(0, 1))(x_cf, w)
        np.testing.assert_allclose(gx_p, gx_x, atol=1e-4)
        np.testing.assert_allclose(gw_p, gw_x, atol=1e-3)


def test_depthwise_conv_pallas_matches_xla():
    """ops/dwconv.py: the channel-last Pallas depthwise 3^3 conv matches the
    XLA grouped-conv semantics (fwd + both grads), incl. volume edges."""
    import jax

    from rsuper_tpu.ops import dwconv

    rng = np.random.default_rng(3)
    # shapes cover: single tile, multi-C-chunk, odd H (TH=1), multi-H-tile
    for (B, D, H, W, C) in [(1, 6, 8, 8, 128), (2, 4, 5, 8, 256),
                            (1, 3, 12, 12, 256)]:
        x = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, 3, 1, C)) * 0.2, jnp.float32)
        assert dwconv.dw_supported(x.shape, x.dtype)

        def f_p(x, w):
            return jnp.sum(dwconv.depthwise_conv3x3x3(
                x, w, force_pallas=True, interpret=True) ** 2)

        def f_x(x, w):
            return jnp.sum(dwconv._dw_xla(x, w) ** 2)

        lp, (gxp, gwp) = jax.value_and_grad(f_p, (0, 1))(x, w)
        lx, (gxx, gwx) = jax.value_and_grad(f_x, (0, 1))(x, w)
        assert abs(float(lp - lx)) < 1e-2 * max(1.0, abs(float(lx)))
        assert float(jnp.max(jnp.abs(gxp - gxx))) < 1e-3
        scale = max(1.0, float(jnp.max(jnp.abs(gwx))))
        assert float(jnp.max(jnp.abs(gwp - gwx))) < 1e-3 * scale

    # gate rejects non-128-divisible channels (lane packing is the point)
    # and whole planes that overflow the scoped-VMEM budget (fall to XLA);
    # the largest production site — 64^2 in-plane bf16 at 128^3 training —
    # must pass
    assert not dwconv.dw_supported((1, 4, 8, 8, 96), jnp.float32)
    assert not dwconv.dw_supported((1, 4, 512, 512, 256), jnp.bfloat16)
    assert dwconv.dw_supported((2, 64, 64, 64, 256), jnp.bfloat16)


def test_pallas_disabled_scope_restores_flag():
    """The spatial train step scopes ``pallas_disabled()`` around its trace
    (train/step.py); the flag must restore on exit — including on error — so
    other graphs traced in the same process keep the Pallas kernels."""
    from rsuper_tpu.ops import dispatch

    assert dispatch._PALLAS_ENABLED
    with dispatch.pallas_disabled():
        assert not dispatch._PALLAS_ENABLED
        with dispatch.pallas_disabled():  # reentrant
            assert not dispatch._PALLAS_ENABLED
        assert not dispatch._PALLAS_ENABLED
    assert dispatch._PALLAS_ENABLED
    with pytest.raises(RuntimeError):
        with dispatch.pallas_disabled():
            raise RuntimeError("boom")
    assert dispatch._PALLAS_ENABLED


def test_topn_dispatch_flag_consulted_per_call(monkeypatch):
    """The Pallas/XLA choice for the top-N ops must be resolved at EVERY
    call (as a static jit key), never baked into a cached inner trace — a
    trace cached outside a ``pallas_disabled()`` scope must not leak the
    Pallas custom call into a spatially-sharded trace at the same shapes
    (review r3: selection.py consulted the flag only at first trace)."""
    from rsuper_tpu.ops import selection

    calls = []

    def probe():
        calls.append(1)
        return False

    monkeypatch.setattr(selection, "_use_pallas", probe)
    x = jnp.arange(64.0).reshape(8, 8)
    selection.topn_mask(x, jnp.float32(5.0))
    selection.topn_mask(x, jnp.float32(5.0))
    selection.topn_masks_multi_batched(x[None], jnp.asarray([[5.0, 9.0]]))
    selection.topn_masks_multi_batched(x[None], jnp.asarray([[5.0, 9.0]]))
    assert len(calls) == 4
