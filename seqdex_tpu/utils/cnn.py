"""Vision feature trunk for T-value-with-vision experiments.

TPU-native analog of the reference's `FeatureTunk`
(`utils/cnn_module.py:56-97`, imported by
`policy_sequencing/terminal_value_function.py:10`): a residual conv block
over the input image, adaptive average pooling to 4x4, then a two-layer
hardswish MLP head. The reference wraps torchvision modules; this is a
self-contained NHWC JAX implementation whose convs XLA maps onto the MXU
(channels in the minor dimension, fp32 accumulation).

Used the same way: as the image encoder in front of a T-value head when the
transition observation includes camera frames instead of state vectors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ConvParams(NamedTuple):
    w: jnp.ndarray  # (kh, kw, cin, cout)
    b: jnp.ndarray


class FeatureTunkParams(NamedTuple):
    conv1: ConvParams
    conv2: ConvParams
    head1: tuple  # (w, b)
    head2: tuple


def _conv_init(key, kh, kw, cin, cout):
    # kaiming-normal fan_out, matching the reference init (`cnn_module.py:63-66`)
    fan_out = kh * kw * cout
    std = jnp.sqrt(2.0 / fan_out)
    return ConvParams(
        w=jax.random.normal(key, (kh, kw, cin, cout), dtype=jnp.float32) * std,
        b=jnp.zeros((cout,), dtype=jnp.float32),
    )


def init_feature_tunk(key, input_dim: int = 6, output_dim: int = 1,
                      head_hidden: int = 256) -> FeatureTunkParams:
    """input_dim = image channels (reference default 6: RGB + aux planes)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    head_in = input_dim * 16  # 4x4 adaptive pool, flattened
    w3 = jax.random.normal(k3, (head_in, head_hidden), dtype=jnp.float32) * 0.01
    w4 = jax.random.normal(k4, (head_hidden, output_dim), dtype=jnp.float32) * 0.01
    return FeatureTunkParams(
        conv1=_conv_init(k1, 3, 3, input_dim, input_dim),
        conv2=_conv_init(k2, 3, 3, input_dim, input_dim),
        head1=(w3, jnp.zeros((head_hidden,), jnp.float32)),
        head2=(w4, jnp.zeros((output_dim,), jnp.float32)),
    )


def _conv(p: ConvParams, x):
    y = jax.lax.conv_general_dilated(
        x, p.w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p.b


def _adaptive_avg_pool(x, out_hw: int = 4):
    """AdaptiveAvgPool2d(4) over NHWC — static-shape mean over equal bins."""
    n, h, w, c = x.shape
    # pad so h, w divide out_hw (static python-side arithmetic)
    ph = (-h) % out_hw
    pw = (-w) % out_hw
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        h, w = h + ph, w + pw
    x = x.reshape(n, out_hw, h // out_hw, out_hw, w // out_hw, c)
    return x.mean(axis=(2, 4))  # (n, 4, 4, c)


def feature_tunk_apply(params: FeatureTunkParams, images: jnp.ndarray) -> jnp.ndarray:
    """images: (N, H, W, C) float32 -> (N, output_dim).

    Residual BasicBlock (conv-relu-conv + identity, relu) -> 4x4 avg pool ->
    flatten -> Linear/hardswish/Linear, mirroring `cnn_module.py:91-97`.
    """
    identity = images
    y = jax.nn.relu(_conv(params.conv1, images))
    y = _conv(params.conv2, y)
    y = jax.nn.relu(y + identity)
    y = _adaptive_avg_pool(y, 4)
    y = y.reshape(y.shape[0], -1)
    w1, b1 = params.head1
    w2, b2 = params.head2
    y = jax.nn.hard_swish(y @ w1 + b1)
    return y @ w2 + b2
