"""Shared 3D building blocks (flax.linen, channels-last NDHWC).

Functional equivalents of the reference's ``rsuper_train/model/dim3/conv_layers.py``
(ConvNormAct :16, BasicBlock :71, Bottleneck :99, DepthwiseSeparableConv :129,
SEBlock :159, MBConv :197, FusedMBConv :241) and ``trans_layers.py`` (Mlp :16,
Attention :45, TransformerBlock :102), re-designed for XLA:TPU:

* channels-last layout — channels ride the 128-wide vector lanes and convs hit
  the MXU without layout transposes;
* InstanceNorm is a two-reduction fused elementwise op (no affine parameters,
  matching torch ``InstanceNorm3d`` defaults, eps 1e-4 per ConvNormAct);
* compute dtype is configurable (bf16 by default in training) with float32
  parameters and float32 normalisation statistics.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dwconv import depthwise_conv3x3x3

Dtype = Any
KernelArg = Union[int, Sequence[int]]


def _kernel3(kernel_size: KernelArg) -> Tuple[int, int, int]:
    if isinstance(kernel_size, int):
        return (kernel_size,) * 3
    return tuple(kernel_size)  # type: ignore[return-value]


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm(x, eps: float = 1e-4):
    """Per-sample, per-channel normalisation over spatial dims (no affine).

    torch ``InstanceNorm3d(C, eps=1e-4, affine=False)`` semantics. Statistics
    in float32 regardless of compute dtype.

    Hand-written VJP: at 96³ volumes these norms are pure HBM bandwidth, and
    autodiff of the mean/var graph emits ~6 reduction+elementwise sweeps;
    the closed-form gradient ``dx = inv·(dy - E[dy] - y·E[dy·y])`` needs one
    fused reduction pass + one elementwise pass (measured 41 ms/step of norm
    time on v5e before, see docs/perf.md round 2).
    """
    return _instance_norm_fwd(x, eps)[0]


def _instance_norm_fwd(x, eps: float):
    spatial = tuple(range(1, x.ndim - 1))
    n = 1
    for d in spatial:
        n *= x.shape[d]
    # forward keeps the materialized x32 (sibling-fused s1/s2 sweeps + the
    # apply all read it): the round-5c A/B that moved these reduces onto the
    # bf16 tensor with dtype= accumulators REGRESSED the forward ~40%
    # (strided bf16 multi-axis reductions lower worse than one f32
    # materialize + fast sweeps — PatchMerging fwd 4.3 -> 6.1 ms/step,
    # exp_profile96_r5b.log); the same restructure in the BACKWARD is a
    # measured win and stays (see _instance_norm_bwd)
    x32 = x.astype(jnp.float32)
    s1 = jnp.sum(x32, axis=spatial, keepdims=True)
    s2 = jnp.sum(x32 * x32, axis=spatial, keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = ((x32 - mean) * inv).astype(x.dtype)
    return y, (y, inv)


def _instance_norm_bwd(eps: float, res, dy):
    y, inv = res
    spatial = tuple(range(1, dy.ndim - 1))
    m1 = jnp.mean(dy, axis=spatial, keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(dy * y, axis=spatial, keepdims=True, dtype=jnp.float32)
    dx = (inv * (dy.astype(jnp.float32) - m1
                 - y.astype(jnp.float32) * m2)).astype(dy.dtype)
    return (dx,)


instance_norm.defvjp(_instance_norm_fwd, _instance_norm_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def instance_norm_cf(x, eps: float = 1e-4):
    """`instance_norm` for depth-major channel-first (B, D, C, H, W)
    tensors — spatial axes (1, 3, 4). Same closed-form custom VJP."""
    return _instance_norm_cf_fwd(x, eps)[0]


def _instance_norm_cf_fwd(x, eps: float):
    spatial = (1,) + tuple(range(3, x.ndim))
    n = 1
    for d in spatial:
        n *= x.shape[d]
    x32 = x.astype(jnp.float32)  # see _instance_norm_fwd: fwd keeps x32
    s1 = jnp.sum(x32, axis=spatial, keepdims=True)
    s2 = jnp.sum(x32 * x32, axis=spatial, keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = ((x32 - mean) * inv).astype(x.dtype)
    return y, (y, inv)


def _instance_norm_cf_bwd(eps: float, res, dy):
    y, inv = res
    spatial = (1,) + tuple(range(3, dy.ndim))
    m1 = jnp.mean(dy, axis=spatial, keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(dy * y, axis=spatial, keepdims=True, dtype=jnp.float32)
    dx = (inv * (dy.astype(jnp.float32) - m1
                 - y.astype(jnp.float32) * m2)).astype(dy.dtype)
    return (dx,)


instance_norm_cf.defvjp(_instance_norm_cf_fwd, _instance_norm_cf_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm_axes(x, spatial_axes, eps: float = 1e-4):
    """`instance_norm` with explicit spatial axes (all other non-batch axes
    are treated as channels). Lets PatchMerging normalise the PRE-transpose
    space-to-depth view: stats per merged channel (sd, sh, sw, c) are the
    reductions over (D', H', W') of the split view, and the elementwise apply
    commutes with the transpose — so the big space-to-depth transpose runs in
    the compute dtype instead of the f32 XLA hoists instance_norm's shared
    x32 convert into (copy.10700, ~1.15 ms/step in the round-3 trace)."""
    return _instance_norm_axes_fwd(x, spatial_axes, eps)[0]


def _instance_norm_axes_fwd(x, spatial_axes, eps: float):
    n = 1
    for d in spatial_axes:
        n *= x.shape[d]
    x32 = x.astype(jnp.float32)  # see _instance_norm_fwd: fwd keeps x32
    s1 = jnp.sum(x32, axis=spatial_axes, keepdims=True)
    s2 = jnp.sum(x32 * x32, axis=spatial_axes, keepdims=True)
    mean = s1 / n
    var = jnp.maximum(s2 / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    y = ((x32 - mean) * inv).astype(x.dtype)
    return y, (y, inv)


def _instance_norm_axes_bwd(spatial_axes, eps: float, res, dy):
    # same single-consumer rule as the forward: m1/m2 reduce bf16 inputs
    # with f32 accumulators, and dx's own casts fuse into its one
    # elementwise chain
    y, inv = res
    m1 = jnp.mean(dy, axis=spatial_axes, keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(dy * y, axis=spatial_axes, keepdims=True,
                  dtype=jnp.float32)
    dx = (inv * (dy.astype(jnp.float32) - m1
                 - y.astype(jnp.float32) * m2)).astype(dy.dtype)
    return (dx,)


instance_norm_axes.defvjp(_instance_norm_axes_fwd, _instance_norm_axes_bwd)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis with learnable scale/bias
    (reference ``trans_layers.py:118`` 'channels_first' LayerNorm)."""

    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * w + b).astype(self.dtype)


def make_norm(norm: str):
    """'in' -> InstanceNorm, 'ln' -> channel LayerNorm, 'none' -> identity.

    BatchNorm is intentionally not offered: the reference converts BN to
    SyncBatchNorm under DDP (``train_ddp.py:662``); on TPU cross-replica BN
    adds a collective per layer while the shipped configs all use 'in'
    (``config/abdomenatlas_ufo/medformer_3d.yaml``) — InstanceNorm is the
    supported default.
    """
    if norm == "in":
        return lambda: instance_norm
    if norm == "none":
        return lambda: (lambda x: x)
    raise ValueError(f"unsupported norm {norm!r} (use 'in' or 'none')")


def make_act(act: str) -> Callable:
    return {
        "relu": nn.relu,
        "relu6": nn.relu6,
        "gelu": nn.gelu,
        "silu": nn.silu,
        "none": lambda x: x,
    }[act]


class DepthwiseConv3(nn.Module):
    """3³ stride-1 depthwise conv, routed to the Pallas channel-last kernel
    (``ops/dwconv.py``) on TPU — XLA's grouped-conv lowering is 10-20× off
    the bandwidth bound at these shapes (docs/perf.md round 3). Same params
    and init as ``nn.Conv(c, (3,3,3), feature_group_count=c)``."""

    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, 1, c), jnp.float32)
        y = depthwise_conv3x3x3(x.astype(self.dtype), kernel)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (c,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class ConvNormAct(nn.Module):
    """conv → norm → act (or pre-activation: norm → act → conv).

    Reference ``conv_layers.py:16-54``.
    """

    features: int
    kernel_size: KernelArg = 3
    strides: KernelArg = 1
    groups: int = 1
    norm: str = "in"
    act: str = "relu"
    preact: bool = False
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        strides = (_kernel3(self.strides)
                   if not isinstance(self.strides, int)
                   else (self.strides,) * 3)
        if (self.groups > 1 and self.groups == self.features
                and x.shape[-1] == self.groups
                and _kernel3(self.kernel_size) == (3, 3, 3)
                and strides == (1, 1, 1)):
            conv = DepthwiseConv3(use_bias=self.use_bias, dtype=self.dtype)
        else:
            conv = nn.Conv(
                self.features,
                _kernel3(self.kernel_size),
                strides=strides,
                padding="SAME",
                feature_group_count=self.groups,
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )
        norm_fn = make_norm(self.norm)()
        act_fn = make_act(self.act)
        if self.preact:
            return conv(act_fn(norm_fn(x)))
        return act_fn(norm_fn(conv(x)))


class BasicBlock(nn.Module):
    """Two pre-activated 3x3x3 convs + shortcut (reference ``conv_layers.py:71``)."""

    features: int
    kernel_size: KernelArg = 3
    strides: int = 1
    norm: str = "in"
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = ConvNormAct(
            self.features, self.kernel_size, self.strides,
            norm=self.norm, act=self.act, preact=True, dtype=self.dtype,
        )(x)
        out = ConvNormAct(
            self.features, self.kernel_size, 1,
            norm=self.norm, act=self.act, preact=True, dtype=self.dtype,
        )(out)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = ConvNormAct(
                self.features, self.kernel_size, self.strides,
                norm=self.norm, act=self.act, preact=True, dtype=self.dtype,
            )(x)
        return out + x


class Bottleneck(nn.Module):
    """1x1 → 3x3 → 1x1 pre-activated bottleneck (reference ``conv_layers.py:99``)."""

    features: int
    kernel_size: KernelArg = 3
    strides: int = 1
    norm: str = "in"
    act: str = "relu"
    dtype: Dtype = jnp.float32
    expansion: int = 2

    @nn.compact
    def __call__(self, x):
        mid = self.features // self.expansion
        out = ConvNormAct(mid, 1, 1, norm=self.norm, act=self.act, preact=True,
                          dtype=self.dtype)(x)
        out = ConvNormAct(mid, self.kernel_size, self.strides, norm=self.norm,
                          act=self.act, preact=True, dtype=self.dtype)(out)
        out = ConvNormAct(self.features, 1, 1, norm=self.norm, act=self.act,
                          preact=True, dtype=self.dtype)(out)
        if self.strides != 1 or x.shape[-1] != self.features:
            x = ConvNormAct(self.features, self.kernel_size, self.strides,
                            norm=self.norm, act=self.act, preact=True,
                            dtype=self.dtype)(x)
        return out + x


class DepthwiseSeparableConv(nn.Module):
    """depthwise k³ conv + pointwise 1x1 (reference ``conv_layers.py:129``)."""

    features: int
    kernel_size: KernelArg = 3
    strides: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if _kernel3(self.kernel_size) == (3, 3, 3) and self.strides == 1:
            x = DepthwiseConv3(use_bias=self.use_bias, dtype=self.dtype)(x)
        else:
            x = nn.Conv(
                c, _kernel3(self.kernel_size), strides=(self.strides,) * 3,
                padding="SAME", feature_group_count=c, use_bias=self.use_bias,
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        return nn.Conv(
            self.features, (1, 1, 1), use_bias=self.use_bias,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x)


class SEBlock(nn.Module):
    """Squeeze-and-excitation (reference ``conv_layers.py:159``)."""

    ratio: int = 4
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3), keepdims=True)
        s = nn.Conv(c // self.ratio, (1, 1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(s.astype(x.dtype))
        s = make_act(self.act)(s)
        s = nn.Conv(c, (1, 1, 1), dtype=self.dtype, param_dtype=jnp.float32)(s)
        return x * jax.nn.sigmoid(s)


class MBConv(nn.Module):
    """Inverted-residual block with SE (reference ``conv_layers.py:197``)."""

    features: int
    expansion: int = 4
    kernel_size: KernelArg = 3
    strides: int = 1
    se: bool = True
    norm: str = "in"
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        expanded = self.expansion * x.shape[-1]
        out = x
        if self.expansion != 1:
            out = ConvNormAct(expanded, 1, 1, norm=self.norm, act=self.act,
                              preact=True, dtype=self.dtype)(out)
        out = ConvNormAct(expanded, self.kernel_size, self.strides,
                          groups=expanded, norm=self.norm, act=self.act,
                          preact=True, dtype=self.dtype)(out)
        if self.se:
            out = SEBlock(act=self.act, dtype=self.dtype)(out)
        out = ConvNormAct(self.features, 1, 1, norm=self.norm, act="none",
                          preact=True, dtype=self.dtype)(out)
        if x.shape[-1] != self.features or self.strides != 1:
            residual = ConvNormAct(self.features, self.kernel_size, self.strides,
                                   norm="none", act="none", dtype=self.dtype)(x)
        return out + residual


class FusedMBConv(nn.Module):
    """MBConv with the expand+depthwise fused into one dense conv
    (reference ``conv_layers.py:241``)."""

    features: int
    expansion: int = 4
    kernel_size: KernelArg = 3
    strides: int = 1
    se: bool = True
    norm: str = "in"
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        expanded = self.expansion * x.shape[-1]
        out = ConvNormAct(expanded, self.kernel_size, self.strides,
                          norm=self.norm, act=self.act, preact=True,
                          dtype=self.dtype)(x)
        if self.se:
            out = SEBlock(act=self.act, dtype=self.dtype)(out)
        out = ConvNormAct(self.features, 1, 1, norm=self.norm, act="none",
                          preact=True, dtype=self.dtype)(out)
        if x.shape[-1] != self.features or self.strides != 1:
            residual = ConvNormAct(self.features, self.kernel_size, self.strides,
                                   norm="none", act="none", dtype=self.dtype)(x)
        return out + residual


BLOCKS = {
    "ConvNormAct": ConvNormAct,
    "BasicBlock": BasicBlock,
    "Bottleneck": Bottleneck,
    "MBConv": MBConv,
    "FusedMBConv": FusedMBConv,
}


class Mlp(nn.Module):
    hidden: int
    out: Optional[int] = None
    act: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = self.out or x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = make_act(self.act)(x)
        return nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32)(x)


class MultiHeadSelfAttention(nn.Module):
    """Token self-attention (reference ``trans_layers.py:45``). Sequence
    lengths here are tiny (pooled semantic maps), so plain softmax attention
    is already optimal — no flash/pallas needed."""

    heads: int
    dim_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            b, l, _ = t.shape
            return t.reshape(b, l, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        attn = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head**-0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        b, h, l, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, h * d)
        return nn.Dense(x.shape[-1], dtype=self.dtype, param_dtype=jnp.float32)(out)


class TransformerBlock(nn.Module):
    """Pre-LN transformer on (B, L, C) tokens (reference ``trans_layers.py:102``).

    ``ln_eps`` defaults to flax's 1e-6; MedFormer ``torch_port`` sets the
    torch ``nn.LayerNorm`` default 1e-5 for imported-checkpoint parity."""

    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    ln_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(self.depth):
            h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
            x = x + MultiHeadSelfAttention(self.heads, self.dim_head,
                                           dtype=self.dtype)(h)
            h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
            x = x + Mlp(self.mlp_dim, dtype=self.dtype)(h)
        return x


class CFConv3(nn.Module):
    """3³ SAME conv on channel-first (B, C, D, H, W) tensors via the Pallas
    channel-first kernel (``ops/conv_cf.py``) — XLA conv on non-TPU backends.

    Parameter-compatible with ``nn.Conv(features, (3,3,3), use_bias=False)``:
    same ``kernel`` name, shape and init, so checkpoints transfer between the
    channels-last and channel-first execution paths. Give it ``name="Conv_0"``
    to occupy the exact slot flax would auto-assign to nn.Conv.

    ``fuse_in_relu`` computes ``conv(relu(instance_norm(x)))`` with the
    IN+relu epilogue fused into the kernel's row loads (the preact
    ConvNormAct pattern) — the normalized activation never touches HBM.
    Operands are depth-major channel-first (B, D, C, H, W).
    """

    features: int
    fuse_in_relu: bool = False
    eps: float = 1e-4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.conv_cf import conv3x3x3_cf, in_relu_conv3x3x3_cf

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, x.shape[2], self.features),
            jnp.float32,
        )
        if self.fuse_in_relu:
            return in_relu_conv3x3x3_cf(x.astype(self.dtype), kernel,
                                        eps=self.eps)
        return conv3x3x3_cf(x.astype(self.dtype), kernel)


class CFConv1(nn.Module):
    """1×1×1 conv (pointwise einsum) on (B, D, C, H, W) tensors; parameter-
    compatible with ``nn.Conv(features, (1,1,1))`` (kernel + bias)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, 1, x.shape[2], self.features),
            jnp.float32,
        )
        y = jnp.einsum(
            "bdchw,co->bdohw",
            x.astype(self.dtype),
            kernel[0, 0, 0].astype(self.dtype),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)[None, None, :, None, None]
        return y


class ConvNormActCF(nn.Module):
    """Channel-first mirror of `ConvNormAct` (3³ conv, preact path only — the
    full-res blocks are all pre-activated). Same param tree: Conv_0/kernel."""

    features: int
    norm: str = "in"
    act: str = "relu"
    preact: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.preact and self.norm == "in" and self.act == "relu":
            # fused epilogue: IN+relu applied inside the conv kernel
            return CFConv3(self.features, fuse_in_relu=True,
                           dtype=self.dtype, name="Conv_0")(x)
        conv = CFConv3(self.features, dtype=self.dtype, name="Conv_0")
        norm_fn = instance_norm_cf if self.norm == "in" else (lambda v: v)
        act_fn = make_act(self.act)
        if self.preact:
            return conv(act_fn(norm_fn(x)))
        return act_fn(norm_fn(conv(x)))


class _Conv0Kernel(nn.Module):
    """Parameter-only module: declares ``Conv_0/kernel`` at the exact path
    (shape, init and RNG stream) flax would give ``CFConv3(name="Conv_0")``,
    without executing a conv — used to pair two convs into one kernel call
    while keeping the checkpoint tree identical."""

    features: int

    @nn.compact
    def __call__(self, c_in: int):
        class _P(nn.Module):
            features: int

            @nn.compact
            def __call__(self, c_in: int):
                return self.param(
                    "kernel",
                    nn.initializers.lecun_normal(),
                    (3, 3, 3, c_in, self.features),
                    jnp.float32,
                )

        return _P(self.features, name="Conv_0")(c_in)


class BasicBlockCF(nn.Module):
    """Channel-first mirror of `BasicBlock` — identical parameter tree
    (ConvNormAct_0/1 + optional ConvNormAct_2 shortcut).

    When the block changes channel count, ConvNormAct_0 and the ConvNormAct_2
    shortcut consume the SAME pre-activated input ``relu(IN(x))`` — they run
    as ONE fused-epilogue kernel call with the two weight tensors stacked
    along the output-channel axis. That doubles the MXU M-occupancy of the
    dominant full-res dots (C_out 32 uses 32 of 128 sublanes), reads ``x``
    from HBM once instead of twice, computes the IN epilogue once, and the
    custom VJP batches both dgrads/wgrads into single dots."""

    features: int
    norm: str = "in"
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pair = (x.shape[2] != self.features
                and self.norm == "in" and self.act == "relu")
        if pair:
            from ..ops.conv_cf import in_relu_conv3x3x3_cf

            k0 = _Conv0Kernel(self.features, name="ConvNormAct_0")(x.shape[2])
            k2 = _Conv0Kernel(self.features, name="ConvNormAct_2")(x.shape[2])
            both = in_relu_conv3x3x3_cf(
                x.astype(self.dtype), jnp.concatenate([k0, k2], axis=-1)
            )
            out, x = both[:, :, : self.features], both[:, :, self.features:]
        else:
            out = ConvNormActCF(self.features, norm=self.norm, act=self.act,
                                dtype=self.dtype, name="ConvNormAct_0")(x)
        out = ConvNormActCF(self.features, norm=self.norm, act=self.act,
                            dtype=self.dtype, name="ConvNormAct_1")(out)
        if not pair and x.shape[2] != self.features:
            x = ConvNormActCF(self.features, norm=self.norm, act=self.act,
                              dtype=self.dtype, name="ConvNormAct_2")(x)
        return out + x


def _align_corners_weights(n_out: int, n_in: int):
    """(n_out, n_in) linear-interpolation matrix with torch
    ``align_corners=True`` sampling: output i reads input i·(n_in−1)/(n_out−1).
    Built in numpy at trace time (static shapes); resizing becomes one small
    matmul per axis — MXU-friendly and exactly the torch kernel's math."""
    import numpy as np

    w = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        w[:, 0] = 1.0
        return w
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, n_in - 2)
    frac = (src - lo).astype(np.float32)
    w[np.arange(n_out), lo] = 1.0 - frac
    w[np.arange(n_out), lo + 1] = frac
    return w


def _resize_axes_ac(x, size, axes):
    """Per-axis align-corners linear resample of the given axes to `size`."""
    for ax, n_out in zip(axes, size):
        if x.shape[ax] == n_out:
            continue
        w = jnp.asarray(_align_corners_weights(n_out, x.shape[ax]),
                        dtype=x.dtype)
        x = jnp.moveaxis(jnp.tensordot(w, x, axes=(1, ax)), 0, ax)
    return x


def resize_trilinear_cf(x, size, align_corners: bool = False):
    """Trilinear resize of (B, D, C, H, W) to spatial `size` = (D', H', W')
    (the C axis, position 2, is untouched — jax.image.resize only resamples
    dims whose size changes)."""
    if align_corners:
        return _resize_axes_ac(x, size, (1, 3, 4))
    b, c = x.shape[0], x.shape[2]
    return jax.image.resize(x, (b, size[0], c, size[1], size[2]),
                            method="linear")


def resize_trilinear(x, size, align_corners: bool = False):
    """Trilinear resize of (B, D, H, W, C) to spatial `size`.

    XLA-native `jax.image.resize` (half-pixel centers) by default. The
    reference uses torch align_corners=True interpolation
    (``medformer.py:193``, ``medformer_utils.py:363``); for a from-scratch
    framework the half-pixel convention is the standard choice and trains
    identically — ``align_corners=True`` (MedFormer ``torch_port``) exists so
    checkpoints imported from the reference reproduce its forward pass
    (``models/torch_port.py``).
    """
    if align_corners:
        return _resize_axes_ac(x, size, (1, 2, 3))
    b, _, _, _, c = x.shape
    return jax.image.resize(x, (b, *size, c), method="linear")
