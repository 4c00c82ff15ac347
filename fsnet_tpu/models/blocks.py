"""Reusable network blocks (flax.linen, NHWC).

Re-implements the reference blocks library
(``vision_base/networks/blocks/blocks.py``) TPU-first: explicit symmetric
paddings so conv arithmetic matches the torch reference exactly (XLA's 'SAME'
disagrees with torch for stride-2), NHWC layout throughout, and BatchNorm with
an optional cross-replica axis (the SyncBN analogue: ``lax.pmean`` over the
mesh 'data' axis, reference ``scripts/train.py:101``).

All modules take ``train: bool`` at call time; BN running statistics live in
the ``batch_stats`` collection per flax convention.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def pad2d(x: jnp.ndarray, pad: int, mode: str) -> jnp.ndarray:
    """NHWC spatial pad with an explicit transpose rule.

    XLA's autodiff of ``jnp.pad(mode='edge'/'reflect')`` lowers to a
    scatter-heavy backward that dominated the decoder's step time on TPU
    (~35 ms at bs12@192x640); the transpose is really just slice-sum folds,
    written out here."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=mode)


def _pad2d_fwd(x, pad, mode):
    return pad2d(x, pad, mode), None


def _fold_edge(g, p, axis):
    """Transpose of edge padding along ``axis``: the first/last interior rows
    absorb the p replicated strips."""
    sl = [slice(None)] * g.ndim

    def take(a, b):
        sl2 = list(sl)
        sl2[axis] = slice(a, b)
        return g[tuple(sl2)]

    lead = jnp.sum(take(0, p + 1), axis=axis, keepdims=True)
    tail = jnp.sum(take(g.shape[axis] - (p + 1), g.shape[axis]), axis=axis,
                   keepdims=True)
    return jnp.concatenate([lead, take(p + 1, g.shape[axis] - (p + 1)), tail],
                           axis=axis)


def _fold_reflect1(g, axis):
    """Transpose of reflect padding (pad=1): row 1 absorbs the top strip,
    row H-2 the bottom strip."""
    sl = [slice(None)] * g.ndim

    def take(a, b):
        sl2 = list(sl)
        sl2[axis] = slice(a, b) if b is not None else slice(a, None)
        return g[tuple(sl2)]

    n = g.shape[axis]
    return jnp.concatenate([
        take(1, 2),
        take(2, 3) + take(0, 1),
        take(3, n - 3),
        take(n - 3, n - 2) + take(n - 1, None),
        take(n - 2, n - 1),
    ], axis=axis)


def _pad2d_bwd(pad, mode, _, g):
    if mode == "edge":
        g = _fold_edge(g, pad, 1)
        g = _fold_edge(g, pad, 2)
    elif mode == "reflect":
        assert pad == 1, "reflect transpose implemented for pad=1"
        g = _fold_reflect1(g, 1)
        g = _fold_reflect1(g, 2)
    else:  # constant
        g = g[:, pad:-pad or None, pad:-pad or None]
    return (g,)


pad2d.defvjp(_pad2d_fwd, _pad2d_bwd)


def _pair(x) -> Tuple[int, int]:
    if isinstance(x, int):
        return (x, x)
    return tuple(x)  # type: ignore[return-value]


class BatchNorm(nn.Module):
    """BatchNorm2d with torch-compatible defaults and optional SyncBN.

    ``axis_name='data'`` makes the batch statistics a cross-replica ``pmean``
    when the module runs inside shard_map/pjit with that mesh axis — the
    TPU-native equivalent of ``torch.nn.SyncBatchNorm``
    (reference ``scripts/train.py:100-102``).
    ``frozen`` pins the module to running statistics regardless of ``train``
    (the reference's ``norm_eval`` / ``freeze_bn``, ``resnet.py:169-196``).
    """

    momentum: float = 0.9  # flax convention: torch momentum 0.1 == 0.9 here
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    frozen: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 packed_C: Optional[int] = None) -> jnp.ndarray:
        use_running_average = (not train) or self.frozen
        if packed_C is not None:
            # width-packed path (x is [B, H, W/P, P*packed_C]): moments and
            # normalize run lane-full via the fast_conv helpers; parameter/
            # stat names mirror nn.BatchNorm's 'bn' scope exactly (same
            # checkpoint format as the standard path — the equivalence
            # ConvBnReLU's packed path already relies on)
            from ..ops import fast_conv as fc

            scale, bias, mean_v, var_v = _BnVars(packed_C, name="bn")()
            if use_running_average:
                mean, var = mean_v.value, var_v.value
            else:
                mean, var = fc.batch_moments_packed(x, packed_C)
                if self.axis_name is not None:
                    m2 = var + jnp.square(mean)
                    mean = jax.lax.pmean(mean, self.axis_name)
                    m2 = jax.lax.pmean(m2, self.axis_name)
                    var = m2 - jnp.square(mean)
                if not self.is_initializing():
                    mean_v.value = (self.momentum * mean_v.value
                                    + (1 - self.momentum) * mean)
                    var_v.value = (self.momentum * var_v.value
                                   + (1 - self.momentum) * var)
            return fc.batchnorm_packed(x, packed_C, mean, var, scale, bias,
                                       epsilon=self.epsilon)
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            axis_name=self.axis_name if (train and not self.frozen) else None,
            name="bn",
        )(x)


class _ConvParams(nn.Module):
    """Declares exactly the parameters ``nn.Conv`` would (same names, shapes,
    initializers) without running it — lets the width-packed conv path share
    one checkpoint format with the standard path."""

    features: int
    in_features: int
    kernel_size: Tuple[int, int] = (3, 3)
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (*self.kernel_size, self.in_features, self.features))
        if not self.use_bias:
            return k, None
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


class _BnVars(nn.Module):
    """Declares exactly what ``nn.BatchNorm`` would (params scale/bias,
    batch_stats mean/var) for the packed BN path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,), jnp.float32))
        return scale, bias, mean, var


class _BnScope(nn.Module):
    """Name-compatibility wrapper: BatchNorm nests its nn.BatchNorm under
    'bn', so the packed path mirrors <parent>/norm/bn/{scale,bias,...}."""

    features: int

    @nn.compact
    def __call__(self):
        return _BnVars(self.features, name="bn")()


class ConvBnReLU(nn.Module):
    """conv -> BN -> (ReLU) with torch-style explicit padding
    (reference ``blocks.py:33-55``). ``padding_mode`` extends the torch arg:
    'zeros' (default) or 'replicate' (edge) — the decoder's second upconv uses
    replicate (reference ``depth_encoder.py:57``).

    Passing ``packed_C`` switches to the TPU width-packed path: ``x`` is then
    a [B, H, NB, P*packed_C] packed tensor (``fsnet_tpu.ops.fast_conv``) and
    the 3x3 conv runs as one block-Toeplitz MXU matmul with the SAME
    parameters (identical checkpoint format either way)."""

    input_features: int = 1  # kept for API parity; flax infers input channels
    output_features: int = 1
    kernel_size: Union[int, Tuple[int, int]] = (1, 1)
    stride: Union[int, Tuple[int, int]] = (1, 1)
    padding: str = "SAME"
    dilation: int = 1
    groups: int = 1
    relu: bool = True
    padding_mode: str = "zeros"
    norm_axis_name: Optional[str] = None
    norm_frozen: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True,
                 packed_C: Optional[int] = None) -> jnp.ndarray:
        if packed_C is not None:
            return self._call_packed(x, train, packed_C)
        k = _pair(self.kernel_size)
        pad = (int((k[0] - 1) / 2) * self.dilation
               if self.padding.lower() == "same" else 0)
        if pad > 0 and self.padding_mode == "replicate":
            x = pad2d(x, pad, "edge")
            conv_padding: Any = "VALID"
        else:
            conv_padding = ((pad, pad), (pad, pad))
        x = nn.Conv(
            features=self.output_features,
            kernel_size=k,
            strides=_pair(self.stride),
            padding=conv_padding,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=True,
            name="conv",
        )(x)
        x = BatchNorm(axis_name=self.norm_axis_name, frozen=self.norm_frozen,
                      name="norm")(x, train=train)
        if self.relu:
            x = jax.nn.relu(x)
        return x

    def _call_packed(self, xp, train: bool, C) -> jnp.ndarray:
        """Width-packed conv+BN+ReLU; math identical to the standard path.
        ``xp``/``C`` may be tuples of parts (an unmaterialized channel
        concat, see :func:`fsnet_tpu.ops.fast_conv.conv3x3_packed`)."""
        from ..ops import fast_conv as fc

        assert _pair(self.kernel_size) == (3, 3), self.kernel_size
        assert _pair(self.stride) == (1, 1) and self.dilation == 1
        assert str(self.padding).lower() == "same", self.padding
        assert self.groups == 1, self.groups
        Co = self.output_features
        C_total = sum(C) if isinstance(C, (tuple, list)) else C
        k, b = _ConvParams(Co, C_total, name="conv")()
        pad_mode = "replicate" if self.padding_mode == "replicate" else "zeros"
        moments = None
        use_ra_pre = (not train) or self.norm_frozen
        if not use_ra_pre:
            # train-mode BN: the conv kernel's moments epilogue ships the
            # per-lane sum/sum-sq with the conv — zero extra reads of the
            # activation (fc.conv3x3_packed_bn; XLA fallback is the same
            # math as batch_moments_packed)
            xp, s1, s2 = fc.conv3x3_packed_bn(xp, k, b, C=C,
                                              pad_mode=pad_mode)
            P = xp.shape[-1] // Co
            n = xp.shape[0] * xp.shape[1] * xp.shape[2] * P
            mean = jnp.sum(s1.reshape(P, Co), axis=0) / n
            m2 = jnp.sum(s2.reshape(P, Co), axis=0) / n
            moments = (mean, m2 - jnp.square(mean))
        else:
            xp = fc.conv3x3_packed(xp, k, b, C=C, pad_mode=pad_mode)

        scale, bias, mean_v, var_v = _BnScope(Co, name="norm")()
        momentum, eps = 0.9, 1e-5
        use_ra = use_ra_pre
        if use_ra:
            mean, var = mean_v.value, var_v.value
        else:
            mean, var = moments
            if self.norm_axis_name is not None:
                m2 = var + jnp.square(mean)
                mean = jax.lax.pmean(mean, self.norm_axis_name)
                m2 = jax.lax.pmean(m2, self.norm_axis_name)
                var = m2 - jnp.square(mean)
            if not self.is_initializing():
                mean_v.value = momentum * mean_v.value + (1 - momentum) * mean
                var_v.value = momentum * var_v.value + (1 - momentum) * var
        xp = fc.batchnorm_packed(xp, Co, mean, var, scale, bias, epsilon=eps)
        if self.relu:
            xp = jax.nn.relu(xp)
        return xp


class ConvReLU(nn.Module):
    """conv -> ReLU (reference ``blocks.py:57-71``)."""

    input_features: int = 1
    output_features: int = 1
    kernel_size: Union[int, Tuple[int, int]] = (1, 1)
    stride: Union[int, Tuple[int, int]] = (1, 1)
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        k = _pair(self.kernel_size)
        pad = int((k[0] - 1) / 2) if self.padding.lower() == "same" else 0
        x = nn.Conv(self.output_features, k, strides=_pair(self.stride),
                    padding=((pad, pad), (pad, pad)), name="conv")(x)
        return jax.nn.relu(x)


class Conv3x3(nn.Module):
    """Reflection-pad (or zero-pad) + 3x3 VALID conv (reference ``blocks.py:73-88``)."""

    in_channels: int = 0
    out_channels: int = 1
    use_refl: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mode = "reflect" if self.use_refl else "constant"
        x = pad2d(x, 1, mode)
        return nn.Conv(self.out_channels, (3, 3), padding="VALID", name="conv")(x)


class ConvELU(nn.Module):
    """Conv3x3 -> ELU (reference ``blocks.py:90-103``)."""

    in_channels: int = 0
    out_channels: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv3x3(self.in_channels, self.out_channels, name="conv")(x)
        return jax.nn.elu(x)


class Scale(nn.Module):
    """Learnable scalar multiplier (reference ``blocks.py:5-20``)."""

    scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.param("scale", lambda key: jnp.asarray(self.scale, jnp.float32))
        return x * s


class LinearBnReLU(nn.Module):
    """linear -> GroupNorm(16) -> LeakyReLU (reference ``blocks.py:105-119``)."""

    input_features: int = 1
    num_hiddens: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.num_hiddens, name="linear")(x)
        x = nn.GroupNorm(num_groups=16, name="gn")(x)
        return nn.leaky_relu(x, negative_slope=0.01)


class LinearDropoutReLU(nn.Module):
    """linear -> dropout -> ReLU (reference ``blocks.py:121-135``)."""

    input_features: int = 1
    num_hiddens: int = 1
    drop: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.num_hiddens, name="linear")(x)
        x = nn.Dropout(rate=self.drop, deterministic=not train)(x)
        return jax.nn.relu(x)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference ``blocks.py:418-439``)."""

    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.drop_prob == 0.0 or not train:
            return x
        keep_prob = 1.0 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep_prob + jax.random.uniform(rng, shape, x.dtype))
        return x / keep_prob * mask


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbour upsample (NHWC). The decoder's hot path — two
    repeats lower to cheap broadcasts on TPU (vs. a general resize gather)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, H * 2, W * 2, C)


def _interp_matrix(in_size: int, out_size: int, align_corners: bool,
                   dtype) -> jnp.ndarray:
    """Dense 1D bilinear interpolation matrix [out, in] (two-hot rows)."""
    if align_corners and out_size > 1 and in_size > 1:
        pos = jnp.linspace(0.0, in_size - 1.0, out_size, dtype=dtype)
    else:
        pos = (jnp.arange(out_size, dtype=dtype) + 0.5) * (in_size / out_size) - 0.5
        pos = jnp.clip(pos, 0.0, in_size - 1.0)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    f = pos - i0.astype(dtype)
    cols = jnp.arange(in_size)
    m = ((cols[None, :] == i0[:, None]) * (1.0 - f[:, None])
         + (cols[None, :] == i1[:, None]) * f[:, None])
    return m.astype(dtype)


def interpolate_bilinear(x: jnp.ndarray, out_h: int, out_w: int,
                         align_corners: bool = True) -> jnp.ndarray:
    """Bilinear resize matching ``F.interpolate(..., align_corners=True/False)``.

    Used to upsample per-scale depth to full resolution
    (reference ``monodepth2_decoder.py:63-64``). Axis-aligned resizing is
    separable, so it runs as two small dense matmuls on the MXU instead of
    per-pixel gathers (which XLA lowers very slowly on TPU).
    """
    B, H, W, C = x.shape
    dtype = x.dtype
    Ay = _interp_matrix(H, out_h, align_corners, dtype)   # [out_h, H]
    Ax = _interp_matrix(W, out_w, align_corners, dtype)   # [out_w, W]
    x = jnp.einsum("oh,bhwc->bowc", Ay, x,
                   preferred_element_type=dtype)
    return jnp.einsum("pw,bowc->bopc", Ax, x,
                      preferred_element_type=dtype)


def adaptive_avg_pool2d(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Torch-compatible adaptive average pool (NHWC). Used to build per-scale
    target pyramids (reference ``monodepth2_decoder.py:216-217``).

    When in/out sizes divide evenly this is a plain reshape-mean (the common
    case: power-of-two pyramids); otherwise falls back to torch's variable
    window arithmetic.
    """
    B, H, W, C = x.shape
    if H % out_h == 0 and W % out_w == 0:
        x = x.reshape(B, out_h, H // out_h, out_w, W // out_w, C)
        return x.mean(axis=(2, 4))
    # variable windows: start = floor(i*H/out), end = ceil((i+1)*H/out)
    ys = [(int(jnp.floor(i * H / out_h)), int(-(-((i + 1) * H) // out_h)))
          for i in range(out_h)]
    xs = [(int(jnp.floor(j * W / out_w)), int(-(-((j + 1) * W) // out_w)))
          for j in range(out_w)]
    rows = []
    for (y0, y1) in ys:
        cols = [x[:, y0:y1, x0:x1, :].mean(axis=(1, 2)) for (x0, x1) in xs]
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


def max_pool_3x3_s2_p1(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``MaxPool2d(kernel_size=3, stride=2, padding=1)`` on NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class DeDict(nn.Module):
    """Extract one entry from a dict output (reference ``blocks.py:22-31``)."""

    name_key: str = "features"

    def __call__(self, x):
        return x[self.name_key]


def to_ntuple(n: int):
    """Int -> n-tuple helper family (reference ``vision_base/networks/utils/
    maths.py`` ``to_1tuple``..``to_4tuple``)."""

    def parse(x):
        if isinstance(x, (tuple, list)):
            return tuple(x)
        return tuple([x] * n)

    return parse


to_1tuple = to_ntuple(1)
to_2tuple = to_ntuple(2)
to_3tuple = to_ntuple(3)
to_4tuple = to_ntuple(4)
