"""Building-block layers with torch-matching initialization semantics.

The reference trains from scratch with torch default / xavier inits
(text2vec/subLayer.py:26-28, module.py:213-214, vec2wav/utils.py init_weights),
so matching the init *distributions* matters for training parity.  All
sequence tensors are feature-last ``[B, T, C]`` (TPU/XLA-idiomatic; the
reference's ``[B, C, T]`` transposes disappear).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Dtype = Any

# ---------------------------------------------------------------------------
# torch-style initializers (flax kernel layouts)
# ---------------------------------------------------------------------------

def calculate_gain(nonlinearity: str) -> float:
    # torch.nn.init.calculate_gain subset used by the reference
    return {"linear": 1.0, "relu": math.sqrt(2.0), "tanh": 5.0 / 3.0,
            "sigmoid": 1.0}[nonlinearity]


def _fan_in_out(shape: Sequence[int]) -> Tuple[int, int]:
    """Fan in/out for flax kernels: dense (in, out); convNd (*k, in, out)."""
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    return fan_in, fan_out


def xavier_uniform(gain: float = 1.0) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fan_in_out(shape)
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_default_kernel_init() -> Callable:
    """torch Linear/Conv default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fan_in_out(shape)
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_default_bias_init(fan_in: int) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(std: float, mean: float = 0.0) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init


# ---------------------------------------------------------------------------
# Dense / Conv wrappers
# ---------------------------------------------------------------------------

class Linear(nn.Module):
    """nn.Linear with xavier_uniform(gain) weights + torch-default bias
    (reference: text2vec/subLayer.py:11-31)."""

    features: int
    use_bias: bool = True
    w_init_gain: str = "linear"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=xavier_uniform(calculate_gain(self.w_init_gain)),
            bias_init=torch_default_bias_init(in_features),
            dtype=self.dtype,
        )(x)


class TorchLinear(nn.Module):
    """nn.Linear with torch *default* init (used where the reference does not
    re-init, e.g. attention fc / CBN projection / generator fcs)."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or torch_default_kernel_init(),
            bias_init=self.bias_init or torch_default_bias_init(in_features),
            dtype=self.dtype,
        )(x)


class Conv1d(nn.Module):
    """1-D convolution over [B, T, C] with explicit symmetric int padding,
    matching torch.nn.Conv1d semantics (incl. default init when
    ``w_init_gain is None``)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    w_init_gain: Optional[str] = None  # None -> torch default init
    dtype: Optional[Dtype] = None
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * self.kernel_size
        if self.kernel_init is not None:
            k_init = self.kernel_init
        elif self.w_init_gain is not None:
            k_init = xavier_uniform(calculate_gain(self.w_init_gain))
        else:
            k_init = torch_default_kernel_init()
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=k_init,
            bias_init=torch_default_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


class PartialConv1d(nn.Module):
    """Partial-padding 1-D convolution (reference: text2vec/module.py:366-418,
    selectable through ConvNorm's ``use_partial_padding``, module.py:420-453).

    Positions where the kernel window overlaps zero padding (or masked-out
    samples) are rescaled by ``window_size / coverage`` so the padding does
    not bias border outputs; fully-masked positions are zeroed.  Matches the
    reference including its ``1e-6`` denominator (so even interior positions
    carry a ``k/(k+1e-6)`` factor).

    The parameter tree is identical to :class:`Conv1d` (``Conv_0/{kernel,
    bias}``) so checkpoints import interchangeably.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    w_init_gain: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, mask_in: Optional[jnp.ndarray] = None):
        """x: [B, T, C]; mask_in: optional [B, T, 1] (or [B, T]) validity mask."""
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size
        if self.w_init_gain is not None:
            k_init = xavier_uniform(calculate_gain(self.w_init_gain))
        else:
            k_init = torch_default_kernel_init()
        conv = nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,),
            use_bias=self.use_bias,
            kernel_init=k_init,
            bias_init=torch_default_bias_init(fan_in),
            dtype=self.dtype,
            name="Conv_0",
        )

        if mask_in is not None and mask_in.ndim == 2:
            mask_in = mask_in[..., None]
        # coverage of each output position: conv of the mask (or all-ones)
        # with a ones kernel (reference module.py:397-404)
        if mask_in is None:
            ones = jnp.ones((1, x.shape[1], 1), dtype=x.dtype)
        else:
            ones = mask_in.astype(x.dtype)
        coverage = lax.conv_general_dilated(
            ones,
            jnp.ones((self.kernel_size, 1, 1), dtype=x.dtype),
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        mask_ratio = self.kernel_size / (coverage + 1e-6)
        update_mask = jnp.clip(coverage, 0.0, 1.0)
        mask_ratio = mask_ratio * update_mask

        raw = conv(x * mask_in.astype(x.dtype) if mask_in is not None else x)
        if self.use_bias:
            b = conv.variables["params"]["bias"]
            out = (raw - b) * mask_ratio + b
            out = out * update_mask
        else:
            out = raw * mask_ratio
        return out


class Conv2dNHWC(nn.Module):
    """2-D conv over [B, H, W, C] with torch-like explicit padding."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size[0] * self.kernel_size[1]
        return nn.Conv(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or torch_default_kernel_init(),
            bias_init=torch_default_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------

class LayerNorm(nn.Module):
    """torch-eps LayerNorm over the last dim."""

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype)(x)


class BatchNorm(nn.Module):
    """BatchNorm over [B, T, C] (stats over B and T), torch eps/momentum.

    ``axis_name`` syncs statistics across the data-parallel mesh axis — the
    TPU-native replacement for the per-replica BN the reference runs under
    DDP.
    """

    use_running_average: bool
    use_scale: bool = True
    use_bias: bool = True
    momentum: float = 0.9  # flax convention; == torch momentum 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x)


class Highway(nn.Module):
    """Highway layer (reference: text2vec/module.py:247-260): H bias zeroed,
    T (gate) bias at -1."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        H = nn.Dense(
            self.features,
            kernel_init=torch_default_kernel_init(),
            bias_init=nn.initializers.zeros,
        )(x)
        T = nn.Dense(
            self.features,
            kernel_init=torch_default_kernel_init(),
            bias_init=nn.initializers.constant(-1.0),
        )(x)
        del in_f
        H = nn.relu(H)
        T = nn.sigmoid(T)
        return H * T + x * (1.0 - T)


# ---------------------------------------------------------------------------
# Weight norm (reparam g * v / ||v||, torch dim=0 == per-out-channel)
# ---------------------------------------------------------------------------

def _weight_norm_kernel(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """flax kernels are (*spatial, in, out); torch weight_norm(dim=0) keeps
    the norm per *output* channel (the last flax axis)."""
    reduce_axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(v * v, axis=reduce_axes, keepdims=True) + 1e-32)
    return g * v / norm


class WNConv1d(nn.Module):
    """weight_norm(Conv1d) over [B, T, C] (reference: vec2wav/models.py convs).

    ``w_std`` != None applies HiFi-GAN's ``init_weights`` N(0, w_std)
    (vec2wav/utils.py init_weights, mean=0 std=0.01) to the direction param;
    g is initialized to ||v|| per torch.nn.utils.weight_norm.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    w_std: Optional[float] = None
    folded: bool = False  # inference export: v pre-folded, skip normalization
    # fuse_lrelu_residual: compute lrelu(x) -> conv -> + x in ONE Pallas
    # kernel (inference fast path; falls back to XLA when the kernel's shape
    # constraints don't hold). The lrelu/residual then must NOT be applied by
    # the caller.
    fuse_lrelu_residual: bool = False
    lrelu_slope: float = 0.1
    # "mxu_tiled": route grouped convs through ops.tiled_conv (MXU-packed
    # repack, measured 6-20x on the MSD G=16 layers); None = lax conv.
    conv_impl: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * self.kernel_size
        kshape = (self.kernel_size, in_ch // self.groups, self.features)
        if self.w_std is not None:
            v_init = normal_init(self.w_std)
        else:
            v_init = torch_default_kernel_init()
        v = self.param("v", v_init, kshape)
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(
                jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-32
            ),
            (1, 1, self.features),
        )
        kernel = v if self.folded else _weight_norm_kernel(v, g)
        bias = (
            self.param("bias", torch_default_bias_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        dt = self.dtype or x.dtype

        if self.fuse_lrelu_residual:
            from wavthruvec_pytorch_tpu.ops.fused_resblock import (
                fused_conv_residual,
                fused_supported,
            )

            if fused_supported(x.shape, self.features, self.kernel_size,
                               self.stride, self.groups, self.padding,
                               self.dilation, dt):
                b = bias if bias is not None else jnp.zeros((self.features,))
                return fused_conv_residual(
                    x, kernel, b, dilation=self.dilation,
                    neg_slope=self.lrelu_slope,
                )
            # fallback: same math through XLA
            xt = jnp.where(x >= 0, x, self.lrelu_slope * x)
            out = lax.conv_general_dilated(
                xt.astype(dt), kernel.astype(dt),
                window_strides=(self.stride,),
                padding=[(self.padding, self.padding)],
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=self.groups,
            )
            if bias is not None:
                out = out + bias.astype(dt)
            return out + x

        out = _conv1d_impl(
            x.astype(dt), kernel.astype(dt), self.stride, self.padding,
            self.dilation, self.groups, self.conv_impl, self.features,
        )
        if bias is not None:
            out = out + bias.astype(dt)
        return out


def _conv1d_impl(x, kernel, stride, padding, dilation, groups, conv_impl,
                 features):
    """lax conv or the MXU-packed repack (ops/tiled_conv.py) when selected
    and applicable — identical semantics either way."""
    if conv_impl == "mxu_tiled":
        from wavthruvec_pytorch_tpu.ops.tiled_conv import (
            mxu_grouped_conv1d,
            tiled_conv_supported,
        )

        if tiled_conv_supported(kernel.shape[0], stride, dilation, groups,
                                features, t_in=x.shape[1]):
            return mxu_grouped_conv1d(x, kernel, stride, padding, groups)
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )


class WNConvTranspose1d(nn.Module):
    """weight_norm(ConvTranspose1d) matching torch semantics exactly:
    output length = (T-1)*stride - 2*padding + kernel_size.

    Implemented as lhs-dilated conv with a flipped kernel — the composition
    XLA lowers to a single MXU-friendly conv (reference upsamplers:
    vec2wav/models.py:89-92).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    w_std: Optional[float] = 0.01  # HiFi-GAN init_weights
    folded: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # torch ConvTranspose1d weight is [in, out, k]; fan_in for the default
        # bias init uses in_channels * k... torch computes fan_in from
        # weight.shape -> in*k? For ConvTranspose torch fan_in = out*k; the
        # bias bound barely matters (w_std path overrides weights anyway).
        fan_in = in_ch * self.kernel_size
        kshape = (self.kernel_size, in_ch, self.features)
        v_init = normal_init(self.w_std) if self.w_std is not None else torch_default_kernel_init()
        v = self.param("v", v_init, kshape)
        # torch weight_norm(dim=0) on ConvTranspose normalizes per *input*
        # channel (dim 0 of [in, out, k]) == flax axis 1 of (k, in, out).
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2), keepdims=True) + 1e-32)
        g = self.param("g", lambda key, shape: norm, (1, in_ch, 1))
        kernel = v if self.folded else g * v / norm
        bias = (
            self.param("bias", torch_default_bias_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        dt = self.dtype or x.dtype
        # transposed conv == insert (stride-1) zeros between inputs, pad both
        # sides with (k - 1 - padding), regular conv with the flipped kernel.
        flipped = jnp.flip(kernel, axis=0)
        pad = self.kernel_size - 1 - self.padding
        out = lax.conv_general_dilated(
            x.astype(dt),
            flipped.astype(dt),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if bias is not None:
            out = out + bias.astype(dt)
        return out


class WNConv2d(nn.Module):
    """weight_norm(Conv2d) over [B, H, W, C] (MPD stacks, vec2wav/models.py:164-171)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel_size[0] * self.kernel_size[1]
        kshape = (*self.kernel_size, in_ch, self.features)
        v = self.param("v", torch_default_kernel_init(), kshape)
        g = self.param(
            "g",
            lambda key, shape: jnp.sqrt(
                jnp.sum(v * v, axis=(0, 1, 2), keepdims=True) + 1e-32
            ),
            (1, 1, 1, self.features),
        )
        kernel = _weight_norm_kernel(v, g)
        bias = (
            self.param("bias", torch_default_bias_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        dt = self.dtype or x.dtype
        out = lax.conv_general_dilated(
            x.astype(dt),
            kernel.astype(dt),
            window_strides=self.strides,
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            out = out + bias.astype(dt)
        return out


# ---------------------------------------------------------------------------
# Spectral norm (power iteration, torch-style: 1 iter per training forward)
# ---------------------------------------------------------------------------

class SpectralNormDense(nn.Module):
    """spectral_norm(nn.Linear): weight / sigma_max, sigma estimated with one
    power iteration per update step; the ``u`` vector lives in the
    ``spectral`` variable collection (reference: vec2wav/modules.py:16,
    MSD first scale vec2wav/models.py:221).
    """

    features: int
    update_stats: bool = True
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    eps: float = 1e-12
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init or torch_default_kernel_init(),
            (in_f, self.features),
        )
        bias = (
            self.param(
                "bias",
                self.bias_init or torch_default_bias_init(in_f),
                (self.features,),
            )
            if self.use_bias
            else None
        )
        # torch parametrization: weight [out, in], u in R^out, v in R^in.
        # torch stores BOTH u and v; train mode iterates (v <- n(W^T u),
        # u <- n(W v)) then sigma = u.W v; eval mode reuses the stored u, v
        # without iterating.
        u_var = self.variable(
            "spectral",
            "u",
            lambda: _l2n(
                jax.random.normal(jax.random.PRNGKey(0), (self.features,)),
                self.eps,
            ),
        )
        v_var = self.variable(
            "spectral",
            "v",
            lambda: _l2n(
                jax.random.normal(jax.random.PRNGKey(1), (in_f,)), self.eps
            ),
        )
        w_t = kernel.T  # [out, in]
        if self.update_stats:
            v = _l2n(jnp.matmul(u_var.value, w_t), self.eps)  # W^T u -> [in]
            u = _l2n(jnp.matmul(w_t, v), self.eps)  # W v -> [out]
            if not self.is_initializing():
                u_var.value = lax.stop_gradient(u)
                v_var.value = lax.stop_gradient(v)
        else:
            u, v = u_var.value, v_var.value
        # sigma = u^T W v with u, v detached (torch keeps W in the grad path)
        u_sg = lax.stop_gradient(u)
        v_sg = lax.stop_gradient(v)
        sigma = jnp.einsum("o,oi,i->", u_sg, w_t, v_sg)
        w_sn = kernel / sigma
        out = jnp.matmul(x.astype(self.dtype or x.dtype), w_sn.astype(self.dtype or x.dtype))
        if bias is not None:
            out = out + bias
        return out


def _l2n(v: jnp.ndarray, eps: float) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v), eps)


class SpectralNormConv1d(nn.Module):
    """spectral_norm(Conv1d) for the first MSD scale (vec2wav/models.py:221-223).

    torch reshapes the conv weight to [out, in*k] for the power iteration.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    update_stats: bool = True
    eps: float = 1e-12
    conv_impl: Optional[str] = None  # see WNConv1d
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * self.kernel_size
        kshape = (self.kernel_size, in_ch // self.groups, self.features)
        kernel = self.param("kernel", torch_default_kernel_init(), kshape)
        bias = (
            self.param("bias", torch_default_bias_init(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        # torch reshapes weight [out, in, k] -> [out, in*k]; our flax kernel
        # is (k, in, out) so transpose to (out, in, k) before flattening to
        # keep the stored-v layout identical to torch's.
        w_mat = jnp.transpose(kernel, (2, 1, 0)).reshape(self.features, -1)
        dim_v = w_mat.shape[1]
        u_var = self.variable(
            "spectral", "u",
            lambda: _l2n(
                jax.random.normal(jax.random.PRNGKey(0), (self.features,)),
                self.eps,
            ),
        )
        v_var = self.variable(
            "spectral", "v",
            lambda: _l2n(
                jax.random.normal(jax.random.PRNGKey(1), (dim_v,)), self.eps
            ),
        )
        if self.update_stats:
            v = _l2n(jnp.matmul(u_var.value, w_mat), self.eps)
            u = _l2n(jnp.matmul(w_mat, v), self.eps)
            if not self.is_initializing():
                u_var.value = lax.stop_gradient(u)
                v_var.value = lax.stop_gradient(v)
        else:
            u, v = u_var.value, v_var.value
        u_sg = lax.stop_gradient(u)
        v_sg = lax.stop_gradient(v)
        sigma = jnp.einsum("o,oi,i->", u_sg, w_mat, v_sg)
        kernel_sn = kernel / sigma
        dt = self.dtype or x.dtype
        out = _conv1d_impl(
            x.astype(dt), kernel_sn.astype(dt), self.stride, self.padding,
            1, self.groups, self.conv_impl, self.features,
        )
        if bias is not None:
            out = out + bias.astype(dt)
        return out


# ---------------------------------------------------------------------------
# GRU (for CBHG) — torch-gate-math via lax.scan
# ---------------------------------------------------------------------------

_GRU_UNROLL = 8


def _gru_gates(gi_t, gh):
    """torch nn.GRU gate math from input/hidden projections ([B, 3H] each)."""
    i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = nn.sigmoid(i_r + h_r)
    z = nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return r, z, n, h_n


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gru_stacked(xs, w_ih, w_hh, b_ih, b_hh, impl="scan"):
    """D independent GRU directions in ONE scan: [D, B, T, C] -> [D, B, T, H]
    (torch gate math; weights [D, C|H, 3H], biases [D, 3H]).

    ``impl="pallas"`` runs the forward recurrence through the Pallas kernel
    (ops/gru_pallas.py: w_hh VMEM-resident in bf16 across all T steps —
    TPU default matmul precision — with the per-step input/output rows
    auto-pipelined); falls back to the scan when shapes don't fit VMEM.
    The backward pass is the same custom VJP either way.

    Two performance properties, both measured at CBHG shapes
    (tools/cbhg_profile.py, B16 T1024 H1024):

    * custom VJP: autodiff of the scan accumulates the ``w_hh`` gradient —
      a rank-B outer product into a [H, 3H] accumulator — INSIDE the
      backward loop.  Here the backward scan carries only [D, B, H] and
      stacks the per-step gate gradients; every weight gradient is then one
      large MXU einsum outside the loop.  Math is exactly the autodiff
      backward, just reassociated.
    * direction fusion: a [B, H] recurrence step is a tiny 16-row matmul —
      latency-bound on the serial chain, not throughput-bound.  Running
      both BiGRU directions in the same scan gives each step two
      INDEPENDENT matmuls to pipeline.
    """
    ys, _, _ = _gru_fwd_core(xs, w_ih, w_hh, b_ih, b_hh, impl)
    return ys


def _gru_fwd_core(xs, w_ih, w_hh, b_ih, b_hh, impl="scan"):
    D, B, T, C = xs.shape
    H = w_hh.shape[1]
    gi = jnp.einsum("dbtc,dch->dbth", xs, w_ih) + b_ih[:, None, None]

    if impl == "pallas":
        from wavthruvec_pytorch_tpu.ops.gru_pallas import (
            gru_fwd_pallas,
            gru_pallas_supported,
        )

        if gru_pallas_supported(D, B, H):
            interpret = jax.devices()[0].platform != "tpu"
            ys = gru_fwd_pallas(gi, w_hh, b_hh, interpret=interpret)
            hs = jnp.moveaxis(ys, 2, 0)  # [T, D, B, H]
            hprev = jnp.concatenate(
                [jnp.zeros((1, D, B, H), xs.dtype), hs[:-1]], axis=0
            )
            return ys, gi, hprev

    def step(h, gi_t):  # h [D, B, H], gi_t [D, B, 3H]
        gh = jnp.einsum("dbh,dhg->dbg", h, w_hh) + b_hh[:, None]
        r, z, n, _ = _gru_gates(gi_t, gh)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((D, B, H), xs.dtype)
    _, hs = lax.scan(step, h0, jnp.moveaxis(gi, 2, 0), unroll=_GRU_UNROLL)
    ys = jnp.moveaxis(hs, 0, 2)  # [D, B, T, H]
    # h_{t-1} sequence for the backward pass ([T, D, B, H])
    hprev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    return ys, gi, hprev


def _gru_stacked_fwd(xs, w_ih, w_hh, b_ih, b_hh, impl="scan"):
    ys, gi, hprev = _gru_fwd_core(xs, w_ih, w_hh, b_ih, b_hh, impl)
    return ys, (xs, gi, hprev, w_ih, w_hh, b_hh)


def _gru_stacked_bwd(impl, res, dys):
    xs, gi, hprev, w_ih, w_hh, b_hh = res
    D, B, _, _ = xs.shape
    H = w_hh.shape[1]
    # pack the three per-step inputs into ONE array and emit ONE output per
    # step: each scan input/output is a dynamic-slice/update in the loop
    # body, and those per-step ops — not the matmuls — dominate the
    # backward's step cost at these tiny [B, H] shapes.
    packed = jnp.concatenate(
        [jnp.moveaxis(dys, 2, 0), jnp.moveaxis(gi, 2, 0), hprev], axis=-1
    )  # [T, D, B, H + 3H + H]

    def bstep(dh, inp):
        dy_t = inp[..., :H]
        gi_t = inp[..., H:4 * H]
        hp = inp[..., 4 * H:]
        g = dy_t + dh  # total gradient on h_t
        gh = jnp.einsum("dbh,dhg->dbg", hp, w_hh) + b_hh[:, None]  # recompute
        r, z, n, h_n = _gru_gates(gi_t, gh)
        dz = g * (hp - n)
        dn_pre = g * (1.0 - z) * (1.0 - n * n)
        dr = dn_pre * h_n
        dhn = dn_pre * r
        dz_pre = dz * z * (1.0 - z)
        dr_pre = dr * r * (1.0 - r)
        # dgi = [dr_pre, dz_pre, dn_pre]; dgh = [dr_pre, dz_pre, dhn] —
        # emit the union [dr_pre, dz_pre, dn_pre, dhn] once (4H, not 6H)
        out = jnp.concatenate([dr_pre, dz_pre, dn_pre, dhn], axis=-1)
        dh_prev = g * z + jnp.einsum(
            "dbg,dhg->dbh",
            jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1), w_hh)
        return dh_prev, out

    dh_T = jnp.zeros((D, B, H), xs.dtype)
    _, outs = lax.scan(bstep, dh_T, packed, reverse=True, unroll=_GRU_UNROLL)
    dgi_seq = outs[..., :3 * H]  # [T, D, B, 3H]
    dgh_seq = jnp.concatenate(
        [outs[..., :2 * H], outs[..., 3 * H:]], axis=-1)
    # weight grads as single large matmuls (the whole point of this VJP)
    dw_hh = jnp.einsum("tdbh,tdbg->dhg", hprev, dgh_seq)
    db_hh = jnp.sum(dgh_seq, axis=(0, 2))
    dgi_bt = jnp.moveaxis(dgi_seq, 0, 2)  # [D, B, T, 3H]
    dw_ih = jnp.einsum("dbtc,dbtg->dcg", xs, dgi_bt)
    db_ih = jnp.sum(dgi_bt, axis=(1, 2))
    dxs = jnp.einsum("dbtg,dcg->dbtc", dgi_bt, w_ih)
    return dxs, dw_ih, dw_hh, db_ih, db_hh


gru_stacked.defvjp(_gru_stacked_fwd, _gru_stacked_bwd)


def gru_direction(xs, w_ih, w_hh, b_ih, b_hh):
    """Single-direction convenience wrapper over :func:`gru_stacked`."""
    return gru_stacked(xs[None], w_ih[None], w_hh[None],
                       b_ih[None], b_hh[None])[0]


class BiGRU(nn.Module):
    """Bidirectional single-layer GRU over [B, T, C] -> [B, T, 2*H].

    torch gate math (nn.GRU): r/z gates sigmoid, candidate uses
    ``r * (W_hn h + b_hn)``; all params U(±1/sqrt(H)).  Both directions run
    in ONE ``lax.scan`` with a custom VJP (:func:`gru_stacked`) — the
    reference feeds the padded sequence without packing
    (text2vec/module.py:356-358), so no length masking here.
    """

    hidden: int
    unroll: int = 8
    impl: str = "scan"  # "pallas": VMEM-resident Pallas forward recurrence

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        bound = 1.0 / math.sqrt(self.hidden)

        def u_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        def params_for(name: str):
            return (
                self.param(f"{name}_w_ih", u_init, (C, 3 * self.hidden)),
                self.param(f"{name}_w_hh", u_init, (self.hidden, 3 * self.hidden)),
                self.param(f"{name}_b_ih", u_init, (3 * self.hidden,)),
                self.param(f"{name}_b_hh", u_init, (3 * self.hidden,)),
            )

        fwd_p = params_for("fwd")
        bwd_p = params_for("bwd")
        xs = jnp.stack([x, jnp.flip(x, axis=1)])  # [2, B, T, C]
        stacked = [jnp.stack([a, b]) for a, b in zip(fwd_p, bwd_p)]
        ys = gru_stacked(xs, *stacked, self.impl)  # [2, B, T, H]
        return jnp.concatenate([ys[0], jnp.flip(ys[1], axis=1)], axis=-1)
