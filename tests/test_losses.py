"""Golden and invariant tests for the R-Super losses.

Encodes the reference's documented invariants (SURVEY.md §4): volume-loss
dead zone and continuity, pseudo-mask volume tolerances of isolate_tumor,
known-voxel masking, adaptive-Tversky alpha behaviour, dispatcher weighting.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rsuper_tpu.losses import (
    LesionChannelMap,
    LossConfig,
    adaptive_tversky_dice,
    ball_loss,
    calculate_loss,
    dice_based_volume_loss,
    get_known_voxels,
    isolate_tumor,
    masked_bce_with_logits,
    volume_loss,
)
from rsuper_tpu.losses.ball import BallLossConfig
from rsuper_tpu.losses.classification import classification_loss
from rsuper_tpu.losses.info_nce import symmetric_info_nce
from rsuper_tpu.losses.genesis import model_genesis_loss

CLASSES = ["background", "kidney_lesion", "pancreas", "pancreatic_lesion"]
LMAP = LesionChannelMap.from_classes(CLASSES)  # lesion channels: kidney, pancreas


# ------------------------------------------------------------------ lesion map
def test_lesion_map_groups():
    assert LMAP.lesion_names == ("kidney_lesion", "pancreas_lesion")
    assert LMAP.groups == ((1,), (3,))
    m = LesionChannelMap.from_classes(
        ["liver_lesion_1", "liver_lesion_2", "pancreatic_pdac", "aorta"]
    )
    assert m.lesion_names == ("liver_lesion", "pancreas_pdac")
    assert m.groups == ((0, 1), (2,))


def test_lesion_map_merge_is_max():
    m = LesionChannelMap.from_classes(["liver_lesion_1", "liver_lesion_2"])
    x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 1, 2, 2, 2))
    x = jnp.concatenate([x, 2 * x], axis=0).transpose(1, 2, 3, 4, 0)[None]
    out = m.merge(x)
    assert out.shape == x.shape[:-1] + (1,)
    np.testing.assert_array_equal(np.asarray(out[..., 0]), np.asarray(x[..., 1]))


# ----------------------------------------------------------- volume loss maths
def test_dice_based_volume_loss_dead_zone_and_values():
    y = jnp.float32(1000.0)
    # inside the ±10% band -> 0
    for x in [900.0, 1000.0, 1100.0]:
        assert float(dice_based_volume_loss(jnp.float32(x), y, 0.1)) == pytest.approx(
            0.0, abs=1e-4
        )
    # hand-computed: x=0 -> 1000/1500 - 100/2400
    want = 1000.0 / 1500.0 - 100.0 / 2400.0
    assert float(dice_based_volume_loss(jnp.float32(0.0), y, 0.1)) == pytest.approx(
        want, rel=1e-5
    )
    # continuity at the boundary
    eps = 1e-2
    a = float(dice_based_volume_loss(jnp.float32(900.0 - eps), y, 0.1))
    assert 0 <= a < 1e-4
    # zero ground truth: E keeps it finite; min(y,100) dead-zone collapses
    assert float(dice_based_volume_loss(jnp.float32(0.0), jnp.float32(0.0), 0.1)) == 0.0
    assert 0 < float(dice_based_volume_loss(jnp.float32(500.0), jnp.float32(0.0), 0.1)) < 1


def _mk_report_batch(S=24, logit_val=-12.0):
    """One CT-Report item: pancreatic lesion reported, no voxel labels."""
    C = len(CLASSES)
    logits = np.full((1, S, S, S, C), logit_val, np.float32)
    labels = np.zeros((1, S, S, S, C), np.float32)
    seg = np.zeros((1, S, S, S, C), np.float32)
    seg[0, 8:16, 8:16, 8:16, CLASSES.index("pancreatic_lesion")] = 1.0
    unk = seg.copy()
    vols = np.zeros((1, 10), np.float32)
    vols[0, 0] = 300.0
    return map(jnp.asarray, (logits, labels, seg, unk, vols))


def test_volume_loss_zero_prediction_penalised():
    logits, labels, seg, unk, vols = _mk_report_batch()
    loss = float(volume_loss(logits, seg, vols, labels, unk, LMAP, tolerance=0.1))
    # pred vol ~ 0 vs 300 -> dbv(0, 300) = 300/800 - min... per-channel mean over 2
    want = dice_based_volume_loss(jnp.float32(0.0), jnp.float32(300.0), 0.1) / 2.0
    assert loss == pytest.approx(float(want), rel=1e-3)


def test_volume_loss_correct_volume_is_zero():
    logits, labels, seg, unk, vols = _mk_report_batch()
    # put ~300 voxels of certain prediction inside the segment
    l = np.asarray(logits).copy()
    ci = CLASSES.index("pancreatic_lesion")
    l[0, 8:16, 8:16, 8:13, ci] = 12.0  # 8*8*5 = 320 voxels ~ within 10% of 300
    loss = float(volume_loss(jnp.asarray(l), seg, vols, labels, unk, LMAP, tolerance=0.1))
    assert loss == pytest.approx(0.0, abs=1e-3)


def test_volume_loss_ignores_per_voxel_annotated_channels():
    logits, labels, seg, unk, vols = _mk_report_batch()
    # mark the lesion channel as per-voxel annotated -> its prediction is zeroed
    lab = np.asarray(labels).copy()
    lab[0, 0, 0, 0, CLASSES.index("pancreatic_lesion")] = 1.0
    l = np.asarray(logits).copy()
    l[0, 8:16, 8:16, 8:16, CLASSES.index("pancreatic_lesion")] = 12.0
    loss_annotated = float(
        volume_loss(jnp.asarray(l), seg, vols, jnp.asarray(lab), unk, LMAP)
    )
    # prediction zeroed -> same as empty prediction
    loss_empty = float(volume_loss(logits, seg, vols, jnp.asarray(lab), unk, LMAP))
    assert loss_annotated == pytest.approx(loss_empty, rel=1e-4)


# --------------------------------------------------------- segmentation losses
def test_known_voxels_margin():
    unk = np.zeros((1, 16, 16, 16, 1), np.float32)
    unk[0, 8, 8, 8, 0] = 1.0
    known = np.asarray(get_known_voxels(jnp.asarray(unk), dilation=5))
    assert known[0, 8, 8, 8, 0] == 0
    assert known[0, 8, 8, 6, 0] == 0  # within ball radius 2.5
    assert known[0, 8, 8, 5, 0] == 1  # outside
    assert known.min() == 0 and known.max() == 1


def test_masked_bce_ignores_unknown():
    logits = jnp.zeros((1, 8, 8, 8, 2))
    targets = jnp.zeros((1, 8, 8, 8, 2))
    known = np.ones((1, 8, 8, 8, 2), np.float32)
    base = float(masked_bce_with_logits(logits, targets, jnp.asarray(known)))
    # huge error in a masked voxel changes nothing
    l2 = np.zeros((1, 8, 8, 8, 2), np.float32)
    l2[0, 0, 0, 0, 0] = 50.0
    known[0, 0, 0, 0, 0] = 0.0
    got = float(masked_bce_with_logits(jnp.asarray(l2), targets, jnp.asarray(known)))
    assert got == pytest.approx(base - np.log(2.0) / l2.size, rel=1e-3)


def test_adaptive_tversky_perfect_and_masking():
    t = np.zeros((1, 8, 8, 8, 1), np.float32)
    t[0, 2:6, 2:6, 2:6, 0] = 1.0
    logits = jnp.asarray(np.where(t > 0, 20.0, -20.0).astype(np.float32))
    ones = jnp.ones_like(logits)
    assert float(adaptive_tversky_dice(logits, jnp.asarray(t), ones)) < 1e-4
    # wrong in a masked region -> unchanged
    l2 = np.asarray(logits).copy()
    l2[0, 7, 7, 7, 0] = 20.0
    known = np.ones_like(t)
    known[0, 7, 7, 7, 0] = 0.0
    assert float(
        adaptive_tversky_dice(jnp.asarray(l2), jnp.asarray(t), jnp.asarray(known))
    ) < 1e-4


def test_adaptive_tversky_alpha_clamps():
    # all false positives -> alpha = 1 clamped to 0.8; loss < 1 even with no TP
    logits = jnp.full((1, 8, 8, 8, 1), 20.0)
    targets = jnp.zeros_like(logits)
    ones = jnp.ones_like(logits)
    loss = float(adaptive_tversky_dice(logits, targets, ones))
    assert loss == pytest.approx(1.0, abs=1e-5)  # num=0 -> dice 0 -> loss 1


# ------------------------------------------------------------------- ball loss
BALL_CFG = BallLossConfig(max_diameter=24, gwrp_levels=128)


def test_isolate_tumor_cube_roundtrip():
    # Reference harness generate_input_and_process_volume
    # (losses_foundation.py:1958): a bright cube must be recovered as a
    # ball-bounded pseudo-mask centred on the cube.
    rng = np.random.default_rng(7)
    S = 40
    x = np.zeros((S, S, S), np.float32)
    x[10:30, 10:30, 10:30] = rng.random((20, 20, 20)).astype(np.float32) * 0.5 + 0.5
    m, ms, mb = jax.jit(
        lambda a: isolate_tumor(a, jnp.float32(15.0), jnp.float32(900.0), BALL_CFG)
    )(jnp.asarray(x))
    m, ms, mb = map(np.asarray, (m, ms, mb))
    # ball voxel count for d=15 (odd) radius 7.5
    ballcount = float(np.sum(np.asarray(
        __import__("rsuper_tpu.ops.balls", fromlist=["ball_kernel"]).ball_kernel(15)
    )))
    vol_eff = ballcount - 1
    # reference invariants (losses_foundation.py:1462-1465, 1524-1527)
    assert m.sum() > 0.5 * vol_eff
    assert m.sum() < vol_eff * (1.2**3) * 3
    assert ms.sum() <= m.sum() <= mb.sum() + 1
    # mask centred on the cube centre
    com = np.array([(m * g).sum() / m.sum() for g in np.meshgrid(
        *[np.arange(S)] * 3, indexing="ij")])
    # the conv response is ~flat wherever the ball fits inside the cube, so the
    # argmax is an arbitrary interior point: the mask must sit inside the cube.
    assert np.allclose(com, [19.5, 19.5, 19.5], atol=5.0)
    # mask is binary and inside the cube+margin region
    assert set(np.unique(m)) <= {0.0, 1.0}


def test_isolate_tumor_corner_clipping_grows_ball():
    # a tumor at the volume corner: the insertion ball is clipped, the
    # reference grows it until the reported volume fits (:1450-1461).
    S = 32
    x = np.zeros((S, S, S), np.float32)
    x[:8, :8, :8] = 0.9
    m, ms, mb = jax.jit(
        lambda a: isolate_tumor(a, jnp.float32(9.0), jnp.float32(300.0), BALL_CFG)
    )(jnp.asarray(x))
    assert float(np.asarray(m).sum()) > 0


def _mk_ball_batch(S=32, with_tumor=True, pred_logit=-8.0):
    C = len(CLASSES)
    ci = CLASSES.index("pancreatic_lesion")
    logits = np.full((2, S, S, S, C), -8.0, np.float32)
    labels = np.zeros((2, S, S, S, C), np.float32)
    seg = np.zeros((2, S, S, S, C), np.float32)
    unk = np.zeros((2, S, S, S, C), np.float32)
    vols = np.zeros((2, 10), np.float32)
    dias = np.zeros((2, 10, 3), np.float32)
    if with_tumor:
        seg[0, 8:24, 8:24, 8:24, ci] = 1.0
        unk[0, 8:24, 8:24, 8:24, ci] = 1.0
        vols[0, 0] = 250.0
        dias[0, 0] = [8.0, 8.0, 8.0]
        logits[0, 12:20, 12:20, 12:20, ci] = pred_logit
    return map(jnp.asarray, (logits, labels, unk, seg, vols, dias))


def test_ball_loss_rewards_matching_prediction():
    # prediction centred on the reported tumor -> lower BCE than an empty one
    lo_match = ball_loss(*_mk_ball_batch(pred_logit=8.0), LMAP, BALL_CFG)
    lo_empty = ball_loss(*_mk_ball_batch(pred_logit=-8.0), LMAP, BALL_CFG)
    assert float(lo_match["ball_loss_bce"]) < float(lo_empty["ball_loss_bce"])


def test_ball_loss_no_tumor_pushes_to_zero():
    logits, labels, unk, seg, vols, dias = _mk_ball_batch(with_tumor=False)
    out = ball_loss(logits, labels, unk, seg, vols, dias, LMAP, BALL_CFG)
    # all-negative logits, no tumor -> tiny BCE toward zero
    assert float(out["ball_loss_bce"]) < 1e-3
    # positive logits somewhere -> penalised
    l2 = np.asarray(logits).copy()
    l2[0, 4:8, 4:8, 4:8, CLASSES.index("kidney_lesion")] = 8.0
    out2 = ball_loss(jnp.asarray(l2), labels, unk, seg, vols, dias, LMAP, BALL_CFG)
    assert float(out2["ball_loss_bce"]) > float(out["ball_loss_bce"])


def test_ball_loss_gradients_flow():
    logits, labels, unk, seg, vols, dias = _mk_ball_batch(pred_logit=2.0)

    def f(l):
        return ball_loss(l, labels, unk, seg, vols, dias, LMAP, BALL_CFG)[
            "ball_loss_bce"
        ]

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


# ----------------------------------------------------------------- dispatcher
def test_calculate_loss_deep_supervision_and_overall():
    logits, labels, seg, unk, vols = _mk_report_batch(S=24)
    dias = np.zeros((1, 10, 3), np.float32)
    dias[0, 0] = [8.0, 8.0, 8.0]
    cfg = LossConfig(loss="dice")  # volume loss only: fast
    out = calculate_loss(
        {"segmentation": [logits, logits]},
        labels,
        unk,
        seg,
        vols,
        jnp.asarray(dias),
        LMAP,
        cfg,
    )
    assert set(out) >= {"segmentation", "dice_volume_loss", "overall"}
    total = sum(float(v) for k, v in out.items() if k != "overall")
    assert float(out["overall"]) == pytest.approx(total, rel=1e-5)
    # aux weights: single-head 'dice' loss at weight 1 vs two heads at 0.5+0.5
    out1 = calculate_loss(
        {"segmentation": logits}, labels, unk, seg, vols, jnp.asarray(dias), LMAP, cfg
    )
    assert float(out["dice_volume_loss"]) == pytest.approx(
        float(out1["dice_volume_loss"]), rel=1e-5
    )


def test_calculate_loss_ball_dice_last_routes_heads():
    # head 0 -> ball loss; head 1 -> volume loss
    logits, labels, seg, unk, vols = _mk_report_batch(S=24)
    dias = np.zeros((1, 10, 3), np.float32)
    dias[0, 0] = [8.0, 8.0, 8.0]
    cfg = LossConfig(loss="ball_dice_last")
    out = calculate_loss(
        {"segmentation": [logits, logits]},
        labels,
        unk,
        seg,
        vols,
        jnp.asarray(dias),
        LMAP,
        cfg,
    )
    assert "ball_loss_bce" in out and "dice_volume_loss" in out
    assert np.isfinite(float(out["overall"]))


def test_calculate_loss_model_genesis():
    x = jnp.ones((1, 8, 8, 8, 1))
    out = calculate_loss(
        {"segmentation": x * 2.0}, x, None, None, None, None, LMAP, model_genesis=True
    )
    assert float(out["overall"]) == pytest.approx(1.0)


# -------------------------------------------------- classification / clip / mg
def test_classification_loss_presence_and_unknown_masking():
    C = len(CLASSES)
    S = 8
    labels = np.zeros((2, S, S, S, C), np.float32)
    labels[0, 2, 2, 2, CLASSES.index("pancreatic_lesion")] = 1.0
    unk = np.zeros_like(labels)
    nl = len(LMAP.lesion_class_indices())
    good_logits = np.full((2, nl), -8.0, np.float32)
    # lesion_class_indices order: kidney_lesion (idx1), pancreatic_lesion (idx3)
    good_logits[0, 1] = 8.0
    loss = float(
        classification_loss(
            jnp.asarray(good_logits), jnp.asarray(labels), jnp.asarray(unk), None, LMAP
        )
    )
    assert loss < 1e-3
    # unknown + negative label -> masked out
    unk[1, :, :, :, CLASSES.index("kidney_lesion")] = 1.0
    bad = good_logits.copy()
    bad[1, 0] = 8.0  # wrongly predicts kidney lesion, but it's unknown
    loss2 = float(
        classification_loss(
            jnp.asarray(bad), jnp.asarray(labels), jnp.asarray(unk), None, LMAP
        )
    )
    assert loss2 < 1e-3


def test_symmetric_info_nce_prefers_aligned():
    rng = np.random.default_rng(0)
    e = rng.normal(size=(4, 16)).astype(np.float32)
    aligned = float(symmetric_info_nce(jnp.asarray(e), jnp.asarray(e)))
    shuffled = float(symmetric_info_nce(jnp.asarray(e), jnp.asarray(e[::-1])))
    assert aligned < shuffled


def test_info_nce_zero_embedding_gradient_finite():
    """A CLIP head whose pooled spatial map collapses to one voxel emits
    EXACTLY zero at init (instance norm of a single token + zero biases);
    the InfoNCE gradient must stay finite there or the first update poisons
    the weights (regression: train_cli clip_pretrain NaN at step 2)."""
    import jax

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))

    def loss(q):
        return symmetric_info_nce(q, k)

    g = jax.grad(loss)(jnp.zeros((4, 16), jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0  # signal still flows off the zero point


def test_model_genesis_loss():
    a = jnp.zeros((2, 4, 4, 4, 1))
    out = model_genesis_loss(a + 3.0, a)
    assert float(out["overall"]) == pytest.approx(9.0)
