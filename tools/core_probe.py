#!/usr/bin/env python
"""Decompose dae_core: encoder vs bottleneck vs decoder cost at the flagship
config (batch 128, half-res input, bf16). Decides whether a parallel-deconv
decoder rewrite (collapse the sequential score-fusion chain by linearity)
has enough headroom to be worth building.

Relay-proof timing (fori_loop chaining inside one jit)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

B, C = 128, 11
Hh, Wh = 180, 240
LOOP = 10


def timed(fn, operands, label, perturb_idx=0):
    @jax.jit
    def run(*ops):
        def body(i, acc):
            x = ops[perturb_idx]
            perturbed = (
                ops[:perturb_idx]
                + (x + (acc * jnp.float32(1e-38)).astype(x.dtype),)
                + ops[perturb_idx + 1 :]
            )
            return acc + jnp.float32(fn(*perturbed))

        return lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

    jax.device_get(run(*operands))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(*operands))
        best = min(best, (time.perf_counter() - t0) / LOOP)
    print(f"{label:<54s} {best * 1e3:8.3f} ms/call {best / B * 1e3:8.5f} ms/img", flush=True)
    return best


def main():
    from iterative_inference_segm_tpu.models.dae import DAE_H_CHANNELS, init_dae
    from iterative_inference_segm_tpu.ops.conv import conv2d, conv_transpose2d, crop_to, max_pool

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    dae = init_dae(jax.random.PRNGKey(1), n_classes=C,
                   h_specs={"pool4": DAE_H_CHANNELS["pool4"]}, depth=3, stem_pool=1)
    dae = jax.tree.map(lambda v: v.astype(dt) if v.dtype == jnp.float32 else v, dae)
    x = jax.nn.softmax(jax.random.normal(key, (B, Hh, Wh, C)), -1).astype(dt)
    hb = jax.random.normal(jax.random.PRNGKey(2), (B, 23, 30, 128), dt)  # folded h bias

    def encoder(x):
        skips = []
        h = x
        for i in range(3):
            p = dae[f"enc{i + 1}"]
            h = jax.nn.relu(conv2d(h, p["w"], p["b"], padding="SAME"))
            skips.append(h)
            h = max_pool(h, window=2, stride=2, ceil_mode=True)
        p = dae["bottleneck"]
        h = jax.nn.relu(conv2d(h, p["w"][:, :, :128], p["b"], padding="SAME") + crop_to(hb, h.shape[1], h.shape[2]).astype(h.dtype))
        return h, skips

    def enc_only(x, hb):
        h, _ = encoder(x)
        return jnp.sum(h.astype(jnp.float32))

    def full_core(x, hb):
        h, skips = encoder(x)
        p = dae["score_bottleneck"]
        s = conv2d(h, p["w"], p["b"], padding="SAME")
        for i in reversed(range(3)):
            sk = skips[i]
            s = conv_transpose2d(s, dae[f"up{i + 1}"]["w"], stride=2)
            p = dae[f"score_enc{i + 1}"]
            skc = conv2d(sk, p["w"], p["b"], padding="SAME")
            s = crop_to(s, skc.shape[1], skc.shape[2]) + skc
        p = dae["out"]
        s = conv2d(s, p["w"], p["b"], padding="SAME")
        return jnp.sum(s.astype(jnp.float32))

    def dec_scores_only(x, hb):
        # the per-level 1x1 score convs of the skips (parallel-izable part
        # that stays in BOTH designs)
        h, skips = encoder(x)
        tot = jnp.float32(0)
        for i in range(3):
            p = dae[f"score_enc{i + 1}"]
            tot = tot + jnp.sum(conv2d(skips[i], p["w"], p["b"], padding="SAME").astype(jnp.float32))
        return tot + jnp.sum(h.astype(jnp.float32))

    def enc_strided(x, hb):
        # candidate redesign: stride-2 convs replace conv+maxpool — removes
        # three reduce_window passes AND quarters each conv's positions.
        # NOTE: skips then live at the POST-reduction scale (90,45,23) —
        # the decoder chain consumes them there (same class-width algebra).
        h = x
        for i in range(3):
            p = dae[f"enc{i + 1}"]
            h = jax.nn.relu(conv2d(h, p["w"], p["b"], stride=2, padding="SAME"))
        p = dae["bottleneck"]
        h = jax.nn.relu(conv2d(h, p["w"][:, :, :128], p["b"], padding="SAME") + crop_to(hb, h.shape[1], h.shape[2]).astype(h.dtype))
        return jnp.sum(h.astype(jnp.float32))

    def core_strided(x, hb):
        h = x
        skips = []
        for i in range(3):
            p = dae[f"enc{i + 1}"]
            h = jax.nn.relu(conv2d(h, p["w"], p["b"], stride=2, padding="SAME"))
            skips.append(h)
        p = dae["bottleneck"]
        h = jax.nn.relu(conv2d(h, p["w"][:, :, :128], p["b"], padding="SAME") + crop_to(hb, h.shape[1], h.shape[2]).astype(h.dtype))
        p = dae["score_bottleneck"]
        s = conv2d(h, p["w"], p["b"], padding="SAME")
        for i in reversed(range(3)):
            sk = skips[i]
            p = dae[f"score_enc{i + 1}"]
            skc = conv2d(sk, p["w"], p["b"], padding="SAME")
            s = crop_to(s, skc.shape[1], skc.shape[2]) + skc
            s = conv_transpose2d(s, dae[f"up{i + 1}"]["w"], stride=2)
        s = crop_to(s, x.shape[1], x.shape[2])
        p = dae["out"]
        s = conv2d(s, p["w"], p["b"], padding="SAME")
        return jnp.sum(s.astype(jnp.float32))

    timed(enc_only, (x, hb), "encoder + bottleneck only")
    timed(dec_scores_only, (x, hb), "encoder + skip 1x1 scores (no deconv chain)")
    timed(full_core, (x, hb), "full core (enc + decoder chain + out)")
    timed(enc_strided, (x, hb), "STRIDED encoder + bottleneck (candidate)")
    timed(core_strided, (x, hb), "STRIDED full core (candidate)")


if __name__ == "__main__":
    main()
