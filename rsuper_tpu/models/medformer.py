"""MedFormer 3D — the R-Super flagship model — in flax.linen, channels-last.

Functional equivalent of the reference's hybrid CNN-transformer U-Net
(``rsuper_train/model/dim3/medformer.py:81`` + ``medformer_utils.py``): a conv
stem, three encoder stages with **bidirectional attention** between feature
tokens and a tiny pooled *semantic map* (3x3x3 = 27 tokens), cross-scale
semantic-map fusion, and a decoder with map shortcuts plus deep supervision.

TPU-first notes
---------------
* Channels-last everywhere; the attention is (L_feat × 27) — skinny matmuls
  that XLA fuses well; no flash attention needed at these sequence lengths.
* The head split uses the standard (heads, dim_head) channel factorisation
  (the reference uses a transposed (dim_head, heads) view — an equivalent
  re-parameterisation of the learned projections).
* Upsampling is XLA-native trilinear (half-pixel centers; see
  ``layers.resize_trilinear``). ``torch_port=True`` switches to the
  reference's align-corners interpolation + torch norm eps so checkpoints
  imported via ``models/torch_port.py`` reproduce its forward pass exactly.
* Deep supervision head: 1x1x1 conv on the second decoder stage, upsampled to
  input size (reference ``medformer.py:191-195``).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.conv_cf import cf_plane_supported
from .layers import (
    BLOCKS,
    BasicBlockCF,
    CFConv1,
    CFConv3,
    ConvNormAct,
    DepthwiseSeparableConv,
    MBConv,
    FusedMBConv,
    TransformerBlock,
    instance_norm,
    instance_norm_axes,
    resize_trilinear,
    resize_trilinear_cf,
)

Dtype = Any


class SemanticMapGeneration(nn.Module):
    """Pool a feature map into a (3, 3, 3, map_dim) semantic map via learned
    spatial attention (reference ``medformer_utils.py:206-231``)."""

    map_dim: int
    map_size: Tuple[int, int, int] = (3, 3, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        code = self.map_size[0] * self.map_size[1] * self.map_size[2]
        feat = nn.Conv(self.map_dim, (3, 3, 3), padding="SAME", use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32)(x)
        weight = nn.Conv(code, (3, 3, 3), padding="SAME", use_bias=False,
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        feat = feat.reshape(b, -1, self.map_dim)  # (B, S, map_dim)
        weight = weight.reshape(b, -1, code)  # (B, S, code)
        weight = jax.nn.softmax(weight.astype(jnp.float32), axis=1).astype(x.dtype)
        sem = jnp.einsum("bsm,bsk->bkm", feat, weight)  # (B, code, map_dim)
        return sem.reshape(b, *self.map_size, self.map_dim)


class BidirectionAttention(nn.Module):
    """Cross-attention in both directions between feature tokens and the 27
    semantic-map tokens (reference ``medformer_utils.py:13-99``)."""

    map_dim: int
    out_dim: int
    heads: int
    dim_head: int
    map_size: Tuple[int, int, int] = (3, 3, 3)
    proj_type: str = "depthwise"
    kernel_size: Any = 3
    no_map_out: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, sem):
        b, d, h, w, _ = feat.shape
        inner = self.heads * self.dim_head

        if self.proj_type == "depthwise":
            feat_qv = DepthwiseSeparableConv(inner * 2, self.kernel_size,
                                             dtype=self.dtype)(feat)
        else:
            feat_qv = nn.Conv(inner * 2, (1, 1, 1), use_bias=False,
                              dtype=self.dtype, param_dtype=jnp.float32)(feat)
        map_qv = nn.Conv(inner * 2, (1, 1, 1), use_bias=False,
                         dtype=self.dtype, param_dtype=jnp.float32)(sem)

        def tokens(t):
            """(B, *, inner*2) -> q, v each (B, heads, L, dim_head)."""
            t = t.reshape(b, -1, 2, self.heads, self.dim_head)
            t = t.transpose(2, 0, 3, 1, 4)
            return t[0], t[1]

        feat_q, feat_v = tokens(feat_qv)
        map_q, map_v = tokens(map_qv)

        attn = jnp.einsum("bhid,bhjd->bhij", feat_q, map_q) * (self.dim_head**-0.5)
        attn32 = attn.astype(jnp.float32)
        feat_map_attn = jax.nn.softmax(attn32, axis=-1).astype(feat.dtype)
        map_feat_attn = jax.nn.softmax(attn32, axis=-2).astype(feat.dtype)

        feat_out = jnp.einsum("bhij,bhjd->bhid", feat_map_attn, map_v)
        feat_out = feat_out.transpose(0, 2, 1, 3).reshape(b, d, h, w, inner)
        map_out = jnp.einsum("bhji,bhjd->bhid", map_feat_attn, feat_v)
        map_out = map_out.transpose(0, 2, 1, 3).reshape(b, *self.map_size, inner)

        if self.proj_type == "depthwise":
            feat_out = DepthwiseSeparableConv(self.out_dim, self.kernel_size,
                                              dtype=self.dtype)(feat_out)
        else:
            feat_out = nn.Conv(self.out_dim, (1, 1, 1), use_bias=False,
                               dtype=self.dtype, param_dtype=jnp.float32)(feat_out)
        if not self.no_map_out:
            map_out = nn.Conv(self.map_dim, (1, 1, 1), use_bias=False,
                              dtype=self.dtype, param_dtype=jnp.float32)(map_out)
        return feat_out, map_out


class BidirectionAttentionBlock(nn.Module):
    """norm → bidirectional attention → residual + MBConv feed-forward
    (reference ``medformer_utils.py:104-140``)."""

    map_dim: int
    out_dim: int
    heads: int
    dim_head: int
    expansion: int = 4
    map_size: Tuple[int, int, int] = (3, 3, 3)
    proj_type: str = "depthwise"
    kernel_size: Any = 3
    no_map_out: bool = False
    norm: str = "in"
    act: str = "relu"
    # the reference builds these two norms straight from nn.InstanceNorm3d
    # (medformer_utils.py:114-115) — torch default eps 1e-5, unlike its
    # ConvNormAct's explicit 1e-4. torch_port mirrors that for imported
    # checkpoints; our default keeps the uniform 1e-4.
    norm_eps: float = 1e-4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sem):
        feat = instance_norm(x, self.norm_eps)
        mapp = instance_norm(sem, self.norm_eps)
        out, map_out = BidirectionAttention(
            self.map_dim, self.out_dim, self.heads, self.dim_head,
            map_size=self.map_size, proj_type=self.proj_type,
            kernel_size=self.kernel_size, no_map_out=self.no_map_out,
            dtype=self.dtype,
        )(feat, mapp)
        shortcut = x
        if x.shape[-1] != self.out_dim:
            shortcut = ConvNormAct(self.out_dim, 1, norm=self.norm, act=self.act,
                                   preact=True, dtype=self.dtype)(x)
        out = out + shortcut
        FF = MBConv if self.proj_type == "depthwise" else FusedMBConv
        out = FF(self.out_dim, expansion=self.expansion,
                 kernel_size=self.kernel_size if self.proj_type == "depthwise" else 1,
                 norm=self.norm, act=self.act, dtype=self.dtype)(out)
        if not self.no_map_out:
            map_out = map_out + sem
        return out, map_out


class BasicLayer(nn.Module):
    """Stack of bidirectional-attention blocks (reference ``medformer_utils.py:180``)."""

    num_blocks: int
    map_dim: int
    out_dim: int
    heads: int
    dim_head: int
    expansion: int = 4
    map_size: Tuple[int, int, int] = (3, 3, 3)
    proj_type: str = "depthwise"
    kernel_size: Any = 3
    no_map_out: bool = False
    norm: str = "in"
    act: str = "relu"
    norm_eps: float = 1e-4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sem):
        for i in range(self.num_blocks):
            last = i == self.num_blocks - 1
            x, sem = BidirectionAttentionBlock(
                self.map_dim, self.out_dim, self.heads, self.dim_head,
                expansion=self.expansion, map_size=self.map_size,
                proj_type=self.proj_type, kernel_size=self.kernel_size,
                no_map_out=self.no_map_out and last,
                norm=self.norm, act=self.act, norm_eps=self.norm_eps,
                dtype=self.dtype,
            )(x, sem)
        return x, sem


def cf_convs_ok(conv_num, conv_block, norm, kernel_size, h, w, itemsize):
    """True when a DownBlockMF's conv blocks can run channel-first: shared
    between DownBlockMF's internal gate and MedFormer's cf_output decision so
    the two can never disagree about the layout of the returned tensor."""
    return (
        conv_num > 0
        and conv_block == "BasicBlock"
        and norm == "in"
        and kernel_size == 3
        and cf_plane_supported(h, w, itemsize)
    )


class PatchMerging(nn.Module):
    """Space-to-depth downsample + norm + depthwise-separable reduction
    (reference ``medformer_utils.py:142-178``)."""

    out_dim: int
    down_scale: Tuple[int, int, int] = (2, 2, 2)
    proj_type: str = "depthwise"
    kernel_size: Any = 3
    # reference PatchMerging norms with torch-default eps (1e-5,
    # medformer_utils.py:162) — torch_port parity knob
    norm_eps: float = 1e-4
    dtype: Dtype = jnp.float32

    # input arrives depth-major channel-first (B, D, C, H, W) — static
    # attribute (not a call arg) so nn.remat never sees a python bool operand
    cf_input: bool = False

    @nn.compact
    def __call__(self, x):
        sd, sh, sw = self.down_scale
        if self.cf_input:
            # (B, D, C, H, W) from the CF stages: fold space-to-depth and the
            # CF→channels-last move into ONE transpose (the separate moveaxis
            # was a full-tensor relayout copy — ~1 ms/step at 96³ f32 in the
            # round-3 trace). The merged channel order (sd, sh, sw, c) is
            # identical to the channels-last path, so parameters transfer.
            b, d, c, h, w = x.shape
            x = x.reshape(b, d // sd, sd, c, h // sh, sh, w // sw, sw)
            # normalise BEFORE transposing: stats per merged channel are the
            # (D', H', W') reductions of the split view, and the elementwise
            # apply commutes with the transpose — so the big space-to-depth
            # copy runs in the compute dtype, not f32 (instance_norm_axes)
            x = instance_norm_axes(x, (1, 4, 6), self.norm_eps)
            x = x.transpose(0, 1, 4, 6, 2, 5, 7, 3)
        else:
            b, d, h, w, c = x.shape
            x = x.reshape(b, d // sd, sd, h // sh, sh, w // sw, sw, c)
            x = instance_norm_axes(x, (1, 3, 5), self.norm_eps)
            x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(b, d // sd, h // sh, w // sw, sd * sh * sw * c)
        if self.proj_type == "depthwise":
            return DepthwiseSeparableConv(self.out_dim, self.kernel_size,
                                          dtype=self.dtype)(x)
        return nn.Conv(self.out_dim, (1, 1, 1), use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32)(x)


class DownBlockMF(nn.Module):
    """patch-merge → conv blocks → (semantic-map generation) → attention blocks
    (reference ``medformer_utils.py:284-324``)."""

    out_dim: int
    conv_num: int
    trans_num: int
    heads: int = 4
    dim_head: int = 64
    expansion: int = 4
    down_scale: Tuple[int, int, int] = (2, 2, 2)
    map_size: Tuple[int, int, int] = (3, 3, 3)
    proj_type: str = "depthwise"
    kernel_size: Any = 3
    conv_block: str = "BasicBlock"
    norm: str = "in"
    act: str = "relu"
    map_generate: bool = False
    # run the conv blocks channel-first through the Pallas conv (the 48³
    # stage pays a 2x lane-padding tax channels-last); transposed back before
    # the attention layers. Parameter tree unchanged.
    cf_convs: bool = False
    cf_input: bool = False
    # return the (B, D, C, H, W) conv output directly instead of transposing
    # back to channels-last — only legal when the CF conv path is active and
    # nothing downstream in this block needs channels-last (no semantic map,
    # no attention). The caller must compute the same gate via cf_convs_ok.
    cf_output: bool = False
    torch_port: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        block_eps = 1e-5 if self.torch_port else 1e-4
        x = PatchMerging(self.out_dim, self.down_scale, self.proj_type,
                         self.kernel_size, norm_eps=block_eps,
                         dtype=self.dtype, cf_input=self.cf_input)(x)
        use_cf = self.cf_convs and cf_convs_ok(
            self.conv_num, self.conv_block, self.norm, self.kernel_size,
            x.shape[2], x.shape[3], jnp.dtype(self.dtype).itemsize,
        )
        if self.cf_output and not (use_cf and not self.map_generate
                                   and self.trans_num == 0):
            raise ValueError(
                "cf_output requires the CF conv path with no semantic map or "
                "attention in the block — the caller's gate is out of sync"
            )
        if use_cf:
            xc = jnp.moveaxis(x, -1, 2)  # (B, D, C, H, W) — conv_cf layout
            for i in range(self.conv_num):
                xc = BasicBlockCF(self.out_dim, norm=self.norm, act=self.act,
                                  dtype=self.dtype, name=f"BasicBlock_{i}")(xc)
            if self.cf_output:
                return xc, None
            x = jnp.moveaxis(xc, 2, -1)
        else:
            Block = BLOCKS[self.conv_block]
            for _ in range(self.conv_num):
                x = Block(self.out_dim, kernel_size=self.kernel_size,
                          norm=self.norm, act=self.act, dtype=self.dtype)(x)
        sem = None
        if self.map_generate:
            sem = SemanticMapGeneration(self.out_dim, self.map_size,
                                        dtype=self.dtype)(x)
        if self.trans_num > 0:
            x, sem = BasicLayer(
                self.trans_num, self.out_dim, self.out_dim, self.heads,
                self.dim_head, expansion=self.expansion, map_size=self.map_size,
                proj_type=self.proj_type, kernel_size=self.kernel_size,
                norm=self.norm, act=self.act, norm_eps=block_eps,
                dtype=self.dtype,
            )(x, sem)
        return x, sem


class UpBlockMF(nn.Module):
    """upsample + skip-concat (+ map shortcut) → attention blocks → conv blocks
    (reference ``medformer_utils.py:326-376``)."""

    out_dim: int
    conv_num: int
    trans_num: int
    heads: int = 4
    dim_head: int = 64
    expansion: int = 4
    map_size: Tuple[int, int, int] = (3, 3, 3)
    proj_type: str = "depthwise"
    kernel_size: Any = 3
    conv_block: str = "BasicBlock"
    norm: str = "in"
    act: str = "relu"
    map_shortcut: bool = False
    no_map_out: bool = False
    torch_port: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_low, x_skip, map_low, map_skip=None):
        x = resize_trilinear(x_low, x_skip.shape[1:4],
                             align_corners=self.torch_port).astype(x_low.dtype)
        feat = jnp.concatenate([x, x_skip.astype(x.dtype)], axis=-1)

        if self.map_shortcut and map_skip is not None:
            sem = jnp.concatenate([map_low, map_skip], axis=-1)
            sem = nn.Conv(self.out_dim, (1, 1, 1), use_bias=False,
                          dtype=self.dtype, param_dtype=jnp.float32)(sem)
        else:
            sem = map_low

        if self.trans_num > 0:
            feat, sem = BasicLayer(
                self.trans_num, self.out_dim, self.out_dim, self.heads,
                self.dim_head, expansion=self.expansion, map_size=self.map_size,
                proj_type=self.proj_type, kernel_size=self.kernel_size,
                no_map_out=self.no_map_out, norm=self.norm, act=self.act,
                norm_eps=1e-5 if self.torch_port else 1e-4,
                dtype=self.dtype,
            )(feat, sem)
        Block = BLOCKS[self.conv_block]
        for _ in range(self.conv_num):
            feat = Block(self.out_dim, kernel_size=self.kernel_size,
                         norm=self.norm, act=self.act, dtype=self.dtype)(feat)
        return feat, sem


class UpBlockCF(nn.Module):
    """Channel-first mirror of `UpBlockMF` for the no-attention full-res
    decoder stage (trans_num = 0, no map shortcut): upsample + skip-concat +
    conv blocks, all in (B, C, D, H, W) layout. Parameter tree matches
    UpBlockMF exactly (BasicBlock_0..n), so pass ``name="UpBlockMF_3"``.

    Rationale: at 96³ with C = 32 the channels-last layout pays a 4× lane-
    padding tax on every activation — this stage alone was >35% of the train
    step (docs/perf.md round 2). The CF layout keeps W in the lanes.
    """

    out_dim: int
    conv_num: int
    norm: str = "in"
    act: str = "relu"
    torch_port: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_low_cf, x_skip_cf, map_low, map_skip=None):
        sk = x_skip_cf.shape
        x = resize_trilinear_cf(x_low_cf, (sk[1], sk[3], sk[4]),
                                align_corners=self.torch_port).astype(
            x_low_cf.dtype
        )
        feat = jnp.concatenate([x, x_skip_cf.astype(x.dtype)], axis=2)
        for i in range(self.conv_num):
            feat = BasicBlockCF(self.out_dim, norm=self.norm, act=self.act,
                                dtype=self.dtype, name=f"BasicBlock_{i}")(feat)
        return feat, map_low


class SemanticMapFusion(nn.Module):
    """Fuse the 3 encoder semantic maps with a small transformer
    (reference ``medformer_utils.py:234-264``)."""

    dim: int
    heads: int
    depth: int = 2
    ln_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, maps):
        b = maps[0].shape[0]
        in_dims = [m.shape[-1] for m in maps]
        toks = []
        for i, m in enumerate(maps):
            t = nn.Conv(self.dim, (1, 1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"in_proj{i}")(m)
            toks.append(t.reshape(b, -1, self.dim))
        lens = [t.shape[1] for t in toks]
        fused = TransformerBlock(self.depth, self.heads, self.dim // self.heads,
                                 self.dim, ln_eps=self.ln_eps,
                                 dtype=self.dtype)(
            jnp.concatenate(toks, axis=1)
        )
        outs = []
        start = 0
        for i, m in enumerate(maps):
            seg = fused[:, start : start + lens[i]]
            start += lens[i]
            seg = seg.reshape(b, *m.shape[1:4], self.dim)
            outs.append(
                nn.Conv(in_dims[i], (1, 1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"out_proj{i}")(seg)
            )
        return outs


class ClassificationBranch(nn.Module):
    """Bottleneck classifier: reducer 1x1 conv → transformer → mean pool →
    linear head (reference ``medformer.py:12-78``)."""

    num_outputs: int
    reduced_dim: int = 64
    heads: int = 4
    dim_head: int = 16
    mlp_dim: int = 320
    ln_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        x = nn.Conv(self.reduced_dim, (1, 1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        t = x.reshape(b, -1, self.reduced_dim)
        t = TransformerBlock(1, self.heads, self.dim_head, self.mlp_dim,
                             ln_eps=self.ln_eps, dtype=self.dtype)(t)
        t = jnp.mean(t, axis=1)
        return nn.Dense(self.num_outputs, dtype=jnp.float32,
                        param_dtype=jnp.float32)(t)


class MedFormer(nn.Module):
    """Returns ``{'segmentation': [logits, aux] | logits, 'classification'?,
    'clip'?}`` — the reference's output contract (``medformer.py:205-222``)."""

    num_classes: int
    base_chan: int = 32
    map_size: Tuple[int, int, int] = (3, 3, 3)
    conv_block: str = "BasicBlock"
    conv_num: Sequence[int] = (2, 0, 0, 0, 0, 0, 2, 2)
    trans_num: Sequence[int] = (0, 2, 4, 6, 4, 2, 0, 0)
    chan_num: Sequence[int] = (64, 128, 256, 320, 256, 128, 64, 32)
    num_heads: Sequence[int] = (1, 4, 8, 10, 8, 4, 1, 1)
    fusion_depth: int = 2
    fusion_dim: int = 320
    fusion_heads: int = 10
    expansion: int = 4
    proj_type: str = "depthwise"
    norm: str = "in"
    act: str = "relu"
    kernel_size: Sequence[Any] = (3, 3, 3, 3, 3)
    scale: Sequence[Any] = ((2, 2, 2),) * 4
    aux_loss: bool = True
    classification_classes: int = 0
    clip_branch: bool = False
    clip_feats: int = 768
    remat: bool = True  # rematerialise down/up blocks (3D activations are the
    # memory ceiling on 16 GB chips; ~1/3 extra flops buys fitting 96-128^3)
    # run the full-resolution stem + last decoder stage in channel-first
    # layout with the Pallas conv (ops/conv_cf.py) — identical math and
    # parameter tree, ~4x less lane padding at C=base_chan on TPU
    cf_fullres: bool = True
    # also run the 48³-stage conv blocks (down(0) + up(6)) channel-first —
    # the multi-row depth tiles (conv_cf TD) amortise the tiny-row grid
    # overhead that made single-row CF lose there (8.66 → 9.62 patches/s)
    cf_halfres: bool = True
    # reproduce the reference torch model's exact numerics for checkpoints
    # imported via models/torch_port.py: align_corners=True upsampling
    # (medformer_utils.py:363) and torch-default eps (1e-5) in the norms the
    # reference does NOT build through ConvNormAct. Training from scratch
    # keeps the defaults (half-pixel, uniform 1e-4).
    torch_port: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cn, tn, ch, nh = self.conv_num, self.trans_num, self.chan_num, self.num_heads
        dim_head = [ch[i] // nh[i] for i in range(8)]
        scale = [s if isinstance(s, tuple) else (s,) * 3 for s in self.scale]
        Down = nn.remat(DownBlockMF) if self.remat else DownBlockMF
        Up = nn.remat(UpBlockMF) if self.remat else UpBlockMF
        x = x.astype(self.dtype)

        use_cf = (
            self.cf_fullres
            and self.conv_block == "BasicBlock"
            and self.norm == "in"
            and tn[7] == 0
            and self.kernel_size[0] == 3
            and x.shape[1] % 2 == 0
            # whole planes run the whole-plane kernels inside the byte
            # budget; larger planes (the 128³ headline patch size) use the
            # H-tiled kernels, which need a 128-divisible W
            and cf_plane_supported(x.shape[2], x.shape[3],
                                   jnp.dtype(self.dtype).itemsize)
        )

        # conv stem
        if use_cf:
            x_cf = jnp.moveaxis(x, -1, 2)  # (B, D, 1, H, W)
            x0_cf = CFConv3(self.base_chan, dtype=self.dtype, name="Conv_0")(x_cf)
            x0_cf = BasicBlockCF(self.base_chan, norm=self.norm, act=self.act,
                                 dtype=self.dtype, name="BasicBlock_0")(x0_cf)
            # DownBlockMF_0 consumes the CF tensor directly (its PatchMerging
            # folds space-to-depth + the layout move into one transpose); the
            # channels-last x0 view is never materialised on this path
            x0 = None
        else:
            x0 = nn.Conv(self.base_chan, (3, 3, 3), padding="SAME", use_bias=False,
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
            x0 = BLOCKS[self.conv_block](self.base_chan, kernel_size=self.kernel_size[0],
                                         norm=self.norm, act=self.act,
                                         dtype=self.dtype)(x0)
            x0_cf = None

        def down(i, inp, map_generate, cf_input=False, cf_output=False):
            return Down(
                ch[i], cn[i], tn[i], heads=nh[i], dim_head=dim_head[i],
                expansion=self.expansion, down_scale=scale[i],
                map_size=self.map_size, proj_type=self.proj_type,
                kernel_size=self.kernel_size[min(i + 1, 4)],
                conv_block=self.conv_block, norm=self.norm, act=self.act,
                map_generate=map_generate,
                cf_convs=self.cf_halfres and i == 0,
                cf_input=cf_input,
                cf_output=cf_output,
                torch_port=self.torch_port,
                dtype=self.dtype,
            )(inp)

        # stage 0 stays channel-first end-to-end when its conv path supports
        # it: DownBlockMF_0 returns (B, D, C, H, W) and both consumers (the
        # stage-1 patch merge and the UpBlockMF_2 skip) take CF natively —
        # two more full-tensor relayout copies gone
        cf1 = (
            use_cf
            and self.cf_halfres
            and tn[0] == 0
            and cf_convs_ok(cn[0], self.conv_block, self.norm,
                            self.kernel_size[1],
                            x.shape[2] // scale[0][1],
                            x.shape[3] // scale[0][2],
                            jnp.dtype(self.dtype).itemsize)
        )
        x1, _ = down(0, x0_cf if use_cf else x0, False, cf_input=use_cf,
                     cf_output=cf1)
        x1_cf = x1 if cf1 else None
        if cf1 and (tn[6] != 0 or not self.cf_halfres):
            x1 = jnp.moveaxis(x1_cf, 2, -1)  # the up(6) path needs CL
        x2, map2 = down(1, x1_cf if cf1 else x1, True, cf_input=cf1)
        x3, map3 = down(2, x2, True)
        x4, map4 = down(3, x3, True)

        y_class = None
        if self.classification_classes:
            feats, _ = DownBlockMF(
                ch[3] // 2, 0, 1, heads=4, dim_head=dim_head[3],
                expansion=self.expansion, down_scale=scale[3],
                map_size=self.map_size, proj_type=self.proj_type,
                kernel_size=self.kernel_size[4], conv_block=self.conv_block,
                norm=self.norm, act=self.act, map_generate=True,
                torch_port=self.torch_port,
                dtype=self.dtype, name="cls_extra",
            )(x4)
            y_class = ClassificationBranch(
                self.classification_classes,
                ln_eps=1e-5 if self.torch_port else 1e-6,
                dtype=self.dtype, name="cls_branch")(feats)
        y_clip = None
        if self.clip_branch:
            feats, _ = DownBlockMF(
                ch[3] // 2, 0, 1, heads=4, dim_head=dim_head[3],
                expansion=self.expansion, down_scale=scale[3],
                map_size=self.map_size, proj_type=self.proj_type,
                kernel_size=self.kernel_size[4], conv_block=self.conv_block,
                norm=self.norm, act=self.act, map_generate=True,
                torch_port=self.torch_port,
                dtype=self.dtype, name="clip_extra",
            )(x4)
            y_clip = ClassificationBranch(
                self.clip_feats, ln_eps=1e-5 if self.torch_port else 1e-6,
                dtype=self.dtype, name="clip_branch")(feats)

        map2, map3, map4 = SemanticMapFusion(
            self.fusion_dim, self.fusion_heads, depth=self.fusion_depth,
            ln_eps=1e-5 if self.torch_port else 1e-6,
            dtype=self.dtype,
        )([map2, map3, map4])

        def up(i, a, b_skip, m1, m2, map_shortcut, no_map_out=False):
            return Up(
                ch[i], cn[i], tn[i], heads=nh[i], dim_head=dim_head[i],
                expansion=self.expansion, map_size=self.map_size,
                proj_type=self.proj_type, kernel_size=self.kernel_size[7 - i],
                conv_block=self.conv_block, norm=self.norm, act=self.act,
                map_shortcut=map_shortcut, no_map_out=no_map_out,
                torch_port=self.torch_port, dtype=self.dtype,
            )(a, b_skip, m1, m2)

        out, sem = up(4, x4, x3, map4, map3, True)
        out, sem = up(5, out, x2, sem, map2, True, no_map_out=True)

        aux = None
        if self.aux_loss:
            a = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="aux_out")(out)
            aux = resize_trilinear(a, x.shape[1:4],
                                   align_corners=self.torch_port)

        if use_cf:
            UpCF = nn.remat(UpBlockCF) if self.remat else UpBlockCF
            if self.cf_halfres and tn[6] == 0:
                out_cf, sem = UpCF(
                    ch[6], cn[6], norm=self.norm, act=self.act,
                    torch_port=self.torch_port,
                    dtype=self.dtype, name="UpBlockMF_2",
                )(jnp.moveaxis(out, -1, 2),
                  x1_cf if cf1 else jnp.moveaxis(x1, -1, 2), sem, None)
            else:
                out, sem = up(6, out, x1, sem, None, False)
                out_cf = jnp.moveaxis(out, -1, 2)
            out_cf, sem = UpCF(
                ch[7], cn[7], norm=self.norm, act=self.act,
                torch_port=self.torch_port,
                dtype=self.dtype, name="UpBlockMF_3",
            )(out_cf, x0_cf, sem, None)
            logits = jnp.moveaxis(
                CFConv1(self.num_classes, dtype=self.dtype, name="outc")(out_cf),
                2, -1,
            )
        else:
            out, sem = up(6, out, x1, sem, None, False)
            out, sem = up(7, out, x0, sem, None, False)
            logits = nn.Conv(self.num_classes, (1, 1, 1), dtype=self.dtype,
                             param_dtype=jnp.float32, name="outc")(out)

        ret = {"segmentation": [logits, aux] if self.aux_loss else logits}
        if self.classification_classes:
            ret["classification"] = y_class
        if self.clip_branch:
            ret["clip"] = y_clip
        return ret
