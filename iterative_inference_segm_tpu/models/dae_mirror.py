"""Mirror-architecture conditional DAE — the reference-parity variant.

The flagship DAE in ``models/dae.py`` is a deliberate TPU re-design (lean
score-fusion decoder). This module is the STRICT-PARITY counterpart of the
reference's ``buildDAE`` (``[ref: models/DAE_h.py]``, SURVEY.md §3.1): a
conv/pool encoder mirrored by an unpool/conv decoder, with the classic
tied/untied weight knob — so a reference-trained DAE checkpoint has a
landing spot (VERDICT r2 missing #2) and the ±0.3-IoU parity check against
the reference's published pipeline is a two-command import the day real
weights appear.

Architecture (mirror semantics, TPU-idiomatic lowering):

* **Encoder** — per stage ``i``: 3x3 conv (``cin_i -> widths[i]``) + ReLU +
  ceil-mode 2x2 max-pool. FCN-8 conditioning taps ``h`` are channel-
  concatenated at the input of the conv at their scale, exactly like the
  reference's ConcatLayers (and like ``models/dae.py``).
* **Decoder** — the exact ADJOINT structure of the encoder, deepest-first:
  switch-based max-unpool (``ops.conv.max_unpool`` — the VJP-of-max_pool
  formulation, which XLA lowers to ``select_and_scatter`` with no
  materialized switch tensors, unlike Theano's argmax-switch unpooling) +
  3x3 conv back to the encoder stage's input channels + ReLU. Where the
  encoder concatenated ``h``, the decoder slices those channels off (the
  adjoint of concat is a split) — so the decoder lands back at
  ``n_classes`` channels at full resolution.
* **Tied weights** — with ``tied=True`` the decoder's stage-``i`` conv
  kernel is the adjoint of the encoder's: ``W_dec = flip_hw(W_enc)^T`` on
  the channel axes (for odd SAME-padded kernels this IS the transpose of
  the convolution operator when shapes are preserved). Decoder stages then
  carry only their own biases. ``tied=False`` (the reference's default)
  gives each decoder conv a fresh kernel of the mirrored shape.
* **Head** — a fresh 1x1 ``out`` conv (n_classes -> n_classes) + softmax in
  both modes.
* **Bottleneck conditioning** — taps at the deepest scale (e.g. the default
  pool4 with depth=4) are concatenated at the bottleneck and absorbed by a
  dedicated ``mid`` 3x3 conv back to ``widths[-1]`` channels (always
  untied: a pure mirror has no op at the bottleneck to consume a concat).

PROVENANCE NOTE (SURVEY.md §0): the reference mount is empty, so the exact
layer list of ``buildDAE`` is reconstructed from SURVEY.md §3.1 [K]. The
positional checkpoint order assumed by ``import_mirror_lasagne_npz`` below
(encoder convs shallow->deep, decoder convs deep->shallow in build order,
``out`` last; Lasagne OIHW kernels; tied checkpoints storing decoder biases
only) is the natural Lasagne build order for that topology, and MUST be
re-verified against the real ``models/DAE_h.py`` at first contact.

Fully differentiable in ``y`` (score AND energy refinement modes run
through it); the pooling switches are constants under differentiation,
matching the reference where ``T.grad`` does not flow through argmax.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from iterative_inference_segm_tpu.models.dae import _H_SCALE, DAE_H_CHANNELS, DEFAULT_WIDTHS
from iterative_inference_segm_tpu.ops.conv import (
    conv2d,
    crop_to,
    init_conv,
    max_pool,
    max_unpool,
)


def _h_extra(h_specs: Mapping[str, int], scale: int) -> int:
    return sum(c for n, c in h_specs.items() if _H_SCALE[n] == scale)


def _enc_cins(n_classes: int, h_specs: Mapping[str, int], depth: int, widths) -> list[int]:
    """Input channel count of each encoder conv (h concat included)."""
    cins = []
    cin = n_classes + _h_extra(h_specs, 0)
    for i in range(depth):
        cins.append(cin)
        cin = widths[i] + _h_extra(h_specs, i + 1)
    return cins


def init_mirror_dae(
    key: jax.Array,
    *,
    n_classes: int = 11,
    h_specs: Mapping[str, int] | None = None,
    depth: int = 4,
    widths: tuple[int, ...] = DEFAULT_WIDTHS,
    tied: bool = False,
    dtype=jnp.float32,
) -> dict:
    """Param pytree for the mirror DAE.

    ``h_specs`` maps tap name -> channels (like ``models.dae.init_dae``);
    taps at scales 0..depth-1 are consumed by the next encoder conv; taps at
    the bottleneck scale (== depth, e.g. the default pool4 at depth=4) are
    consumed by a dedicated ``mid`` 3x3 conv back to ``widths[-1]`` channels
    (always untied, like ``out`` — a pure mirror has no op at the bottleneck
    to absorb a concat). ``tied=True`` omits decoder kernels (derived from
    the encoder at apply time); biases are always per-layer (classic DAE
    tying shares W only).
    """
    if h_specs is None:
        h_specs = {"pool4": DAE_H_CHANNELS["pool4"]}
    for name in h_specs:
        if name not in _H_SCALE:
            raise ValueError(f"unknown conditioning tap {name!r}; known: {sorted(_H_SCALE)}")
        if _H_SCALE[name] > depth:
            raise ValueError(
                f"mirror DAE consumes taps at scales 0..{depth}; "
                f"tap {name!r} lives at scale {_H_SCALE[name]} (raise depth)"
            )
    if depth > len(widths):
        raise ValueError(f"depth {depth} exceeds len(widths) {len(widths)}")
    widths = tuple(widths[:depth])

    params: dict = {}
    keys = iter(jax.random.split(key, 2 * depth + 3))
    cins = _enc_cins(n_classes, h_specs, depth, widths)
    for i in range(depth):
        params[f"enc{i + 1}"] = init_conv(
            next(keys), 3, 3, cins[i], widths[i], dtype=dtype, scale="he"
        )
    h_mid = _h_extra(h_specs, depth)
    if h_mid:
        params["mid"] = init_conv(
            next(keys), 3, 3, widths[-1] + h_mid, widths[-1], dtype=dtype, scale="he"
        )
    for i in reversed(range(depth)):
        if tied:
            params[f"dec{i + 1}"] = {"b": jnp.zeros((cins[i],), dtype=dtype)}
        else:
            params[f"dec{i + 1}"] = init_conv(
                next(keys), 3, 3, widths[i], cins[i], dtype=dtype, scale="he"
            )
    params["out"] = init_conv(next(keys), 1, 1, n_classes, n_classes, dtype=dtype)
    return params


def mirror_tied_of(params: dict) -> bool:
    """Whether a mirror-DAE param tree is weight-tied (no decoder kernels)."""
    return "w" not in params["dec1"]


def mirror_depth_of(params: dict) -> int:
    return sum(1 for k in params if k.startswith("enc"))


def adjoint_kernel(w: jax.Array) -> jax.Array:
    """Adjoint of a SAME-padded odd conv kernel: spatial flip + channel
    transpose. ``conv2d(., adjoint_kernel(w), padding='SAME')`` is the exact
    transpose of ``conv2d(., w, padding='SAME')`` when input and output
    spatial shapes coincide (odd k, symmetric padding)."""
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


def mirror_dae_apply(
    params: dict,
    y: jax.Array,
    h: Mapping[str, jax.Array] | None = None,
    *,
    depth: int | None = None,
    compute_dtype=jnp.float32,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Mirror DAE forward: corrupted prob map (+ conditioning) -> denoised map.

    y: (B, H, W, C); h: dict of FCN-8 taps at scales 0..depth-1. Returns
    (B, H, W, C) softmax probabilities. Tied/untied is inferred from the
    params (``mirror_tied_of``).
    """
    if depth is None:
        depth = mirror_depth_of(params)
    tied = mirror_tied_of(params)
    n_classes = int(params["out"]["w"].shape[-1])
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
    # base_ch[i]: channels the decoder must slice back to at scale i — the
    # encoder conv's input width MINUS that scale's h channels (the adjoint
    # of concat is a split; the h part is discarded on the way back up)
    base_ch = [int(y.shape[-1])]
    pres = []  # pre-pool activations: pooling switches + unpool target shapes
    for i in range(depth):
        p = params[f"enc{i + 1}"]
        pre = jax.nn.relu(conv2d(x, p["w"], p["b"], padding="SAME"))
        pres.append(pre)
        base_ch.append(int(pre.shape[-1]))
        x = max_pool(pre, window=2, stride=2, ceil_mode=True)
        x = concat_h(x, i + 1)

    d = x
    if "mid" in params:
        p = params["mid"]
        d = jax.nn.relu(conv2d(d, p["w"], p["b"], padding="SAME"))
    for i in reversed(range(depth)):
        pre = pres[i]
        want_h, want_w = -(-pre.shape[1] // 2), -(-pre.shape[2] // 2)
        if (int(d.shape[1]), int(d.shape[2])) != (want_h, want_w):
            raise ValueError(
                f"mirror decoder stage {i + 1}: carry {d.shape[1:3]} does not "
                f"match the encoder's pooled shape {(want_h, want_w)} — a "
                "conditioning tap cropped the encoder mid-chain; use taps "
                "whose shapes align with the DAE's ceil-mode chain (FCN-8 "
                "taps on the same input do)"
            )
        d = max_unpool(d, pre, window=2, stride=2)
        p = params[f"dec{i + 1}"]
        w = adjoint_kernel(params[f"enc{i + 1}"]["w"]) if tied else p["w"]
        d = conv2d(d, w.astype(d.dtype), p["b"], padding="SAME")
        # slice off the channels the encoder's concat_h added at this scale
        d = d[..., : base_ch[i]]
        if i > 0:
            d = jax.nn.relu(d)

    p = params["out"]
    logits = conv2d(d, p["w"], p["b"], padding="SAME")
    logits = crop_to(logits, y.shape[1], y.shape[2])
    if out_dtype == jnp.bfloat16:
        return jax.nn.softmax(logits.astype(jnp.bfloat16), axis=-1)
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(out_dtype)
