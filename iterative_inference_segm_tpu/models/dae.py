"""Conditional denoising autoencoder (DAE) over segmentation probability maps.

TPU-native rebuild of ``[ref: models/DAE_h.py]`` (``buildDAE``): the DAE maps
a corrupted class-probability map ``y~`` (noisy one-hot GT, or frozen-FCN
softmax output) back toward the clean ground truth, optionally *conditioned*
on intermediate FCN-8 feature maps ``h`` concatenated at the matching spatial
scale. By Alain & Bengio (2014), ``r(y~, h) - y~`` then estimates the
conditional score ``d log p(y|h) / dy`` — the quantity the iterative
inference loop follows.

Architecture (re-designed, not transliterated): a conv/pool encoder over the
probability map with channel widths (64, 128, 256, 512), feature-map
conditioning by channel-concat at the scale where the FCN tap lives, a
bottleneck conv, and a mirrored decoder of learned bilinear-initialized
transposed convs with encoder skip-concats, ending in a 1x1 conv + softmax so
the output is again a probability map. Ceil-mode pooling matches the FCN-8
encoder exactly, so ``h`` taps align shape-for-shape at every scale
(360x480 -> 23x30 at /16, etc.).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from iterative_inference_segm_tpu.ops.conv import (
    conv2d,
    conv_transpose2d,
    crop_to,
    init_conv,
    init_conv_transpose_bilinear,
    max_pool,
)
from iterative_inference_segm_tpu.models.fcn8 import FCN8_FEATURE_CHANNELS

# Spatial scale (log2 downsampling factor) of each conditioning tap.
_H_SCALE = {
    "input": 0,
    "pool1": 1,
    "pool2": 2,
    "pool3": 3,
    "pool4": 4,
    "pool5": 5,
    "fc7": 5,
}

# Channel width of each conditioning tap (input = RGB image).
DAE_H_CHANNELS = dict(FCN8_FEATURE_CHANNELS, input=3)

_ENC_WIDTHS = (64, 128, 256, 512)


def init_dae(
    key: jax.Array,
    *,
    n_classes: int = 11,
    h_specs: Mapping[str, int] | None = None,
    depth: int = 4,
    dtype=jnp.float32,
) -> dict:
    """Initialize the DAE param pytree.

    h_specs maps conditioning tap name -> channel count, mirroring the
    reference's ``concat_h`` flag in ``[ref: train_dae.py]`` (default
    conditioning on 'pool4'). ``depth`` is the number of pooling stages
    (4 -> bottleneck at /16).
    """
    if h_specs is None:
        h_specs = {"pool4": DAE_H_CHANNELS["pool4"]}
    for name in h_specs:
        if name not in _H_SCALE:
            raise ValueError(f"unknown conditioning tap {name!r}; known: {sorted(_H_SCALE)}")
        if _H_SCALE[name] > depth:
            raise ValueError(f"tap {name!r} lives at scale /{2 ** _H_SCALE[name]} deeper than depth {depth}")

    params: dict = {}
    keys = iter(jax.random.split(key, 64))
    widths = _ENC_WIDTHS[:depth]

    # h taps concatenated at the *input* of the conv at their scale.
    def h_extra(scale: int) -> int:
        return sum(c for n, c in h_specs.items() if _H_SCALE[n] == scale)

    cin = n_classes + h_extra(0)
    for i, cout in enumerate(widths):
        params[f"enc{i + 1}"] = init_conv(next(keys), 3, 3, cin, cout, dtype=dtype, scale="he")
        cin = cout + h_extra(i + 1)

    params["bottleneck"] = init_conv(next(keys), 3, 3, cin, widths[-1], dtype=dtype, scale="he")

    cin = widths[-1]
    for i in reversed(range(len(widths))):
        skip_c = widths[i]
        params[f"up{i + 1}"] = init_conv_transpose_bilinear(4, cin, cin, dtype=dtype)
        params[f"dec{i + 1}"] = init_conv(
            next(keys), 3, 3, cin + skip_c, max(skip_c, 64), dtype=dtype, scale="he"
        )
        cin = max(skip_c, 64)

    params["out"] = init_conv(next(keys), 1, 1, cin, n_classes, dtype=dtype)
    return params


def dae_apply(
    params: dict,
    y: jax.Array,
    h: Mapping[str, jax.Array] | None = None,
    *,
    depth: int = 4,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """DAE forward: corrupted probability map (+ conditioning) -> denoised map.

    y: (B, H, W, C) probability map; h: dict of FCN-8 feature taps.
    Returns (B, H, W, C) softmax probabilities at the input resolution.

    The whole function is differentiable in ``y`` — the iterative-inference
    engine takes ``jax.vjp`` through it (``[ref: iterative_inference.py]``
    does the same via ``T.grad`` through the Theano graph).
    """
    h = dict(h or {})
    by_scale: dict[int, list[jax.Array]] = {}
    for name, v in h.items():
        by_scale.setdefault(_H_SCALE[name], []).append(v)

    def concat_h(x: jax.Array, scale: int) -> jax.Array:
        for v in by_scale.get(scale, []):
            v = v.astype(x.dtype)
            v = crop_to(v, min(v.shape[1], x.shape[1]), min(v.shape[2], x.shape[2]))
            x = crop_to(x, v.shape[1], v.shape[2])
            x = jnp.concatenate([x, v], axis=-1)
        return x

    x = y.astype(compute_dtype)
    x = concat_h(x, 0)
    skips = []
    widths = _ENC_WIDTHS[:depth]
    for i in range(len(widths)):
        p = params[f"enc{i + 1}"]
        x = jax.nn.relu(conv2d(x, p["w"], p["b"], padding="SAME"))
        skips.append(x)
        x = max_pool(x, window=2, stride=2, ceil_mode=True)
        x = concat_h(x, i + 1)

    p = params["bottleneck"]
    x = jax.nn.relu(conv2d(x, p["w"], p["b"], padding="SAME"))

    for i in reversed(range(len(widths))):
        skip = skips[i]
        x = conv_transpose2d(x, params[f"up{i + 1}"]["w"].astype(x.dtype), stride=2)
        x = crop_to(x, skip.shape[1], skip.shape[2])
        x = jnp.concatenate([x, skip], axis=-1)
        p = params[f"dec{i + 1}"]
        x = jax.nn.relu(conv2d(x, p["w"], p["b"], padding="SAME"))

    p = params["out"]
    logits = conv2d(
        x.astype(jnp.float32), p["w"].astype(jnp.float32), p["b"].astype(jnp.float32), padding="SAME"
    )
    logits = crop_to(logits, y.shape[1], y.shape[2])
    return jax.nn.softmax(logits, axis=-1)
