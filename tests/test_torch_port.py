"""Forward parity of imported reference torch checkpoints.

Loads the LIVE reference MedFormer (``/root/reference/rsuper_train/model/
dim3/medformer.py``) on CPU, converts its randomly-initialised state_dict
with :mod:`rsuper_tpu.models.torch_port`, and checks our
``MedFormer(torch_port=True)`` computes the same function — the strongest
possible evidence that (a) the architecture is the reference's and (b) users
can carry their trained ``.pth`` weights over
(``tools/convert_torch_checkpoint.py``).

Skipped when the reference checkout or torch is unavailable.
"""

import importlib
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF_DIM3 = Path("/root/reference/rsuper_train/model/dim3")

torch = pytest.importorskip("torch")
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not REF_DIM3.exists(),
                       reason="reference checkout not present"),
]

# tiny-but-complete config: conv stages, attention stages (2 blocks in one
# stage to cover the feat_dim==out_dim no-shortcut case), map fusion,
# map shortcuts, aux head, classification branch
TINY = dict(
    base_chan=4,
    chan_num=(8, 16, 32, 40, 32, 16, 8, 4),
    conv_num=(2, 0, 0, 0, 0, 0, 2, 2),
    trans_num=(0, 1, 2, 1, 1, 1, 0, 0),
    num_heads=(1, 2, 2, 2, 2, 2, 1, 1),
    fusion_depth=1,
)
NUM_CLASSES = 3


def _load_ref_medformer():
    """Import the reference medformer module without running the package
    __init__ (which pulls every architecture and their dependencies)."""
    if "refdim3" not in sys.modules:
        pkg = types.ModuleType("refdim3")
        pkg.__path__ = [str(REF_DIM3)]
        sys.modules["refdim3"] = pkg
    return importlib.import_module("refdim3.medformer")


@pytest.fixture(scope="module")
def ref_and_converted():
    ref_mf = _load_ref_medformer()
    nn = torch.nn
    torch.manual_seed(0)
    tm = ref_mf.MedFormer(
        in_chan=1, num_classes=NUM_CLASSES, base_chan=TINY["base_chan"],
        map_size=[3, 3, 3], conv_block="BasicBlock",
        conv_num=list(TINY["conv_num"]), trans_num=list(TINY["trans_num"]),
        chan_num=list(TINY["chan_num"]), num_heads=list(TINY["num_heads"]),
        fusion_depth=TINY["fusion_depth"], fusion_dim=40, fusion_heads=2,
        expansion=2, proj_type="depthwise", norm="in", act="relu",
        kernel_size=[[3, 3, 3]] * 5, scale=[[2, 2, 2]] * 4, aux_loss=True,
        classification_branch=True, class_list_cls=["a", "b"],
    )
    # the reference hard-codes ClassificationBranch(in_dim=160) for its
    # production width (medformer.py:13); at the tiny width the reducer must
    # be rebuilt to the actual extra_layer output (chan_num[3]//2)
    tm.classification_branch.reducer = nn.Conv3d(
        TINY["chan_num"][3] // 2, 64, kernel_size=1)
    tm.eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from rsuper_tpu.models.torch_port import convert_state_dict

    params, missing, unused = convert_state_dict(
        state, strict=True, classification=True, **TINY)
    # every torch parameter must be consumed — unused keys mean the map (or
    # our architecture) silently dropped something
    assert unused == [], f"unconverted torch keys: {unused[:10]}"
    return tm, params


def _flax_model(**kw):
    from rsuper_tpu.models.medformer import MedFormer

    return MedFormer(
        num_classes=NUM_CLASSES, base_chan=TINY["base_chan"],
        chan_num=TINY["chan_num"], conv_num=TINY["conv_num"],
        trans_num=TINY["trans_num"], num_heads=TINY["num_heads"],
        fusion_depth=TINY["fusion_depth"], fusion_dim=40, fusion_heads=2,
        expansion=2, aux_loss=True, classification_classes=2,
        remat=False, torch_port=True, **kw)


def test_converted_tree_matches_init(ref_and_converted):
    import jax
    import jax.numpy as jnp

    from rsuper_tpu.models.torch_port import verify_against_template

    _, params = ref_and_converted
    model = _flax_model(cf_fullres=False, cf_halfres=False)
    tmpl = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 64, 1)))["params"]
    assert verify_against_template(params, tmpl) == []


@pytest.mark.parametrize("cf", [False, True])
def test_forward_parity(ref_and_converted, cf):
    """Converted weights reproduce the reference forward pass — on both the
    channels-last path and the channel-first Pallas-layout path (which on CPU
    runs the same math through the XLA fallback)."""
    import jax.numpy as jnp

    tm, params = ref_and_converted
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 64, 64, 64, 1)).astype(np.float32)

    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.moveaxis(x, -1, 1)))
    t_seg = t_out["segmentation"][0].numpy()
    t_aux = t_out["segmentation"][1].numpy()
    t_cls = t_out["classification"].numpy()

    model = _flax_model(cf_fullres=cf, cf_halfres=cf)
    j_out = model.apply({"params": params}, jnp.asarray(x))
    j_seg = np.moveaxis(np.asarray(j_out["segmentation"][0]), -1, 1)
    j_aux = np.moveaxis(np.asarray(j_out["segmentation"][1]), -1, 1)
    j_cls = np.asarray(j_out["classification"])

    np.testing.assert_allclose(j_seg, t_seg, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(j_aux, t_aux, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(j_cls, t_cls, rtol=2e-3, atol=2e-3)


def test_align_corners_resize_matches_torch():
    """resize_trilinear(align_corners=True) == F.interpolate(...,
    align_corners=True) — the interpolation the port relies on."""
    import jax.numpy as jnp

    from rsuper_tpu.models.layers import resize_trilinear

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4, 5, 6, 3)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(np.moveaxis(x, -1, 1)), size=(9, 10, 11),
        mode="trilinear", align_corners=True).numpy()
    got = np.moveaxis(
        np.asarray(resize_trilinear(jnp.asarray(x), (9, 10, 11),
                                    align_corners=True)), -1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_roundtrip_export(ref_and_converted):
    """flax→torch export inverts the import exactly: every torch tensor
    survives convert→export bitwise."""
    tm, params = ref_and_converted
    from rsuper_tpu.models.torch_port import export_state_dict

    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    back = export_state_dict(params, classification=True, **TINY)
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k], err_msg=k)
