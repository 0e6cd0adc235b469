"""Model zoo shape/gradient tests (32³ inputs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsuper_tpu.models import get_model


def _init_and_run(arch, args=None, S=32, C=5, aux=None):
    model = get_model(arch, C, args or {}, dtype=jnp.float32)
    x = jnp.ones((1, S, S, S, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    return model, params, out


def test_unet3d_shapes():
    _, params, out = _init_and_run("resunet")
    seg = out["segmentation"]
    assert seg.shape == (1, 32, 32, 32, 5)
    assert seg.dtype == jnp.float32


def test_unet3d_aux_head():
    _, _, out = _init_and_run("resunet", {"aux_head": True})
    main, aux = out["segmentation"]
    assert main.shape == aux.shape == (1, 32, 32, 32, 5)


def test_medformer_shapes_and_aux():
    _, params, out = _init_and_run("medformer")
    main, aux = out["segmentation"]
    assert main.shape == (1, 32, 32, 32, 5)
    assert aux.shape == (1, 32, 32, 32, 5)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    assert n_params > 1e6


@pytest.mark.slow
def test_medformer_cf_fullres_equivalent():
    """The channel-first full-res execution (Pallas conv layout path) must be
    a pure re-layout: identical parameter tree, same outputs and gradients as
    the channels-last path given the same params."""
    args = {"base_chan": 4, "chan_num": (8, 16, 16, 16, 16, 16, 8, 4),
            "num_heads": (1, 2, 2, 2, 2, 2, 1, 1), "fusion_dim": 16,
            "fusion_heads": 2, "trans_num": (0, 1, 1, 1, 1, 1, 0, 0),
            "conv_num": (1, 0, 0, 0, 0, 0, 1, 1), "remat": False}
    m_cl = get_model("medformer", 3, {**args, "cf_fullres": False},
                     dtype=jnp.float32)
    m_cf = get_model("medformer", 3,
                     {**args, "cf_fullres": True, "cf_halfres": True},
                     dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)),
        jnp.float32,
    )
    p_cl = m_cl.init(jax.random.PRNGKey(0), x)
    p_cf = m_cf.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(p_cl) == jax.tree.structure(p_cf)
    for a, b in zip(jax.tree.leaves(p_cl), jax.tree.leaves(p_cf)):
        assert a.shape == b.shape

    out_cl = m_cl.apply(p_cl, x)["segmentation"][0]
    out_cf = m_cf.apply(p_cl, x)["segmentation"][0]  # same params
    np.testing.assert_allclose(out_cf, out_cl, atol=2e-4)

    def loss(params, model):
        return jnp.sum(model.apply(params, x)["segmentation"][0] ** 2)

    g_cl = jax.grad(loss)(p_cl, m_cl)
    g_cf = jax.grad(loss)(p_cl, m_cf)
    # float accumulation-order noise through the deep graph reaches ~1e-3
    # relative on O(100)-O(1000) gradient values (weight-draw dependent: the
    # DepthwiseConv3 rename reshuffled the init streams and moved the tail);
    # real layout bugs are O(1) relative
    for a, b in zip(jax.tree.leaves(g_cl), jax.tree.leaves(g_cf)):
        np.testing.assert_allclose(a, b, rtol=3e-3, atol=5e-2)


@pytest.mark.slow
def test_medformer_branches():
    _, _, out = _init_and_run(
        "medformer", {"classification_classes": 3, "clip_branch": True, "clip_feats": 16}
    )
    assert out["classification"].shape == (1, 3)
    assert out["clip"].shape == (1, 16)


@pytest.mark.slow
def test_medformer_gradients_finite():
    model = get_model("medformer", 2, {}, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        out = model.apply(p, x)["segmentation"][0]
        return jnp.mean(out**2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_model_factory_unknown():
    with pytest.raises(ValueError):
        get_model("nope", 2)


@pytest.mark.parametrize("arch,args", [
    ("vnet", {"base_chan": 8}),
    ("attention_unet", {"base_chan": 4}),
    ("unetpp", {"base_chan": 4, "depth": 3}),
])
def test_model_zoo_alternatives(arch, args):
    _, _, out = _init_and_run(arch, args)
    assert out["segmentation"].shape == (1, 32, 32, 32, 5)


def test_unetr():
    _, _, out = _init_and_run(
        "unetr",
        {"img_size": (32, 32, 32), "hidden_size": 64, "mlp_dim": 128,
         "num_heads": 4, "num_layers": 4, "feature_size": 8},
    )
    assert out["segmentation"].shape == (1, 32, 32, 32, 5)


@pytest.mark.slow
def test_swin_unetr():
    _, _, out = _init_and_run(
        "swin_unetr", {"feature_size": 12, "num_heads": (2, 2, 2, 2),
                       "window_size": 2, "depths": (2, 2, 2, 2)}
    )
    assert out["segmentation"].shape == (1, 32, 32, 32, 5)


def test_nnformer_and_vtunet():
    _, _, out = _init_and_run(
        "nnformer", {"embed_dim": 8, "num_heads": (2, 2, 2), "window_size": 2}
    )
    main, aux = out["segmentation"]
    assert main.shape == aux.shape == (1, 32, 32, 32, 5)
    _, _, out = _init_and_run(
        "vtunet", {"embed_dim": 8, "num_heads": (2, 2, 2), "window_size": 2}
    )
    assert out["segmentation"].shape == (1, 32, 32, 32, 5)


@pytest.mark.parametrize("arch", ["unet_2d", "attention_unet_2d",
                                  "transunet_2d", "dual_attention_unet_2d"])
def test_dim2_models(arch):
    model = get_model(arch, 4, {"base_chan": 8, "hidden": 32, "heads": 4},
                      dtype=jnp.float32)
    x = jnp.ones((1, 64, 64, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["segmentation"].shape == (1, 64, 64, 4)


@pytest.mark.parametrize("arch,args", [
    ("swin_unet_2d", {"embed_dim": 12, "depths": (1, 1, 1),
                      "num_heads": (2, 2, 2), "window_size": 2}),
    ("unetpp_2d", {"base_chan": 4, "depth": 3}),
    ("medformer_2d", {"base_chan": 4, "map_size": 4,
                      "num_heads": (1, 2, 2, 2, 2, 2, 1, 1),
                      "fusion_dim": 16, "fusion_heads": 2}),
])
def test_dim2_zoo_models(arch, args):
    """2D transformer zoo parity (reference dim2/{swin_unet,unetpp,
    medformer}.py): shape contract + finite outputs."""
    model = get_model(arch, 4, args, dtype=jnp.float32)
    x = jnp.ones((1, 64, 64, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["segmentation"].shape == (1, 64, 64, 4)
    assert bool(jnp.all(jnp.isfinite(out["segmentation"])))


def test_dual_attention_modules_start_as_identity():
    """DANet PAM/CAM gates are zero-initialised (reference
    dual_attention_utils.py:87,122): at init both modules must pass their
    input through unchanged, and the gate must receive gradient."""
    from rsuper_tpu.models.dim2 import (ChannelAttention2D,
                                        PositionAttention2D)

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    for mod in (PositionAttention2D(), ChannelAttention2D()):
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
        g = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(params)
        gamma = jax.tree.leaves(
            {k: v for k, v in jax.tree_util.tree_flatten_with_path(g)[0]
             if "gamma" in str(k)})
        assert any(float(jnp.abs(x).max()) > 0 for x in gamma)


def test_medformer_2d_aux():
    model = get_model(
        "medformer_2d", 3,
        {"base_chan": 4, "map_size": 4, "aux_loss": True,
         "num_heads": (1, 2, 2, 2, 2, 2, 1, 1),
         "fusion_dim": 16, "fusion_heads": 2},
        dtype=jnp.float32,
    )
    x = jnp.ones((1, 32, 32, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    logits, aux = out["segmentation"]
    assert logits.shape == (1, 32, 32, 3) and aux.shape == (1, 32, 32, 3)


def test_instance_norm_custom_vjp_matches_autodiff():
    """Forward matches torch-InstanceNorm3d semantics; the hand-written VJP
    matches autodiff of the straightforward definition."""
    from rsuper_tpu.models.layers import instance_norm

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 5, 6, 7, 4)).astype(np.float32) * 10 + 3)

    def reference_norm(x, eps=1e-4):
        spatial = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=spatial, keepdims=True)
        var = jnp.var(x, axis=spatial, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps)

    np.testing.assert_allclose(
        np.asarray(instance_norm(x)), np.asarray(reference_norm(x)),
        rtol=2e-5, atol=2e-5,
    )
    cot = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    g1 = jax.grad(lambda a: jnp.sum(instance_norm(a) * cot))(x)
    g2 = jax.grad(lambda a: jnp.sum(reference_norm(a) * cot))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-4)


def test_instance_norm_axes_matches_merged_instance_norm():
    """PatchMerging normalises the pre-transpose space-to-depth view
    (instance_norm_axes over (D',H',W') of the split view); that must equal
    instance_norm applied to the merged channels-last tensor — same stats per
    merged (sd,sh,sw,c) channel, elementwise apply commutes with transpose."""
    from rsuper_tpu.models.layers import instance_norm, instance_norm_axes

    rng = np.random.default_rng(7)
    b, d, h, w, c = 2, 8, 8, 8, 3
    x = jnp.asarray(rng.normal(size=(b, d, h, w, c)), jnp.float32)

    split = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    got = instance_norm_axes(split, (1, 3, 5))
    got = got.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, d // 2, h // 2,
                                                        w // 2, 8 * c)

    merged = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
    merged = merged.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, d // 2, h // 2, w // 2, 8 * c)
    want = instance_norm(merged)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # gradients through the custom VJP agree with the merged formulation
    g1 = jax.grad(lambda t: jnp.sum(
        instance_norm_axes(t.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c),
                           (1, 3, 5)) ** 3))(x)
    g2 = jax.grad(lambda t: jnp.sum(instance_norm(
        t.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 5, 2, 4, 6, 7)
        .reshape(b, d // 2, h // 2, w // 2, 8 * c)) ** 3))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)
