#!/usr/bin/env python
"""Can the half engine's per-step tail get cheaper by conv folding?

VERDICT r2 #4: the benched flagship pays ~0.050 ms/img per pooled step while
the core alone measures ~0.040 — the gap is the per-step tail at the pooled
scale (up1 deconv + score_enc1 + out + score_input + softmax + blend, each a
materialized pass at 180x240). Since ``out`` is a 1x1 LINEAR map applied to
a sum, it can be composed into the kernels that feed it (exact
reassociation, like precompute_bottleneck_h):

    out(up1(u) + se1(k) + b_se1) + b_out
  = up1'(u) + se1'(k) + b'     with W' = W @ W_out composed once per call.

Variants measured (full step: core + tail + softmax + blend, batch 128,
bf16, flagship stem1/d3 shapes):

  v0: current step (5 full-scale passes: up1, se1+add, out, si+add, softmax+blend)
  v1: out folded into up1'/se1'  (4 passes)
  v2: v1 + merge se1'+si into ONE 3x3 conv on concat(skip1, x) (3 passes,
      but 3x the tail FLOPs: 9*43*11 vs 32*11 + 9*11*11 per px)
  also: K=5 scan of each variant (the deployment context), and the same
  fold applied to the K=0 full-res rectification.

Correctness: every variant is checked against v0 in f32 before timing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

B, C = 128, 11
H2, W2 = 180, 240  # pooled scale of 360x480
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
    print(f"{label:<58s} {best * 1e3:8.3f} ms/call {best / B * 1e3:8.5f} ms/img", flush=True)
    return best


def main():
    from iterative_inference_segm_tpu.models.dae import DAE_H_CHANNELS, init_dae
    from iterative_inference_segm_tpu.ops.conv import (
        conv2d,
        conv_transpose2d,
        crop_to,
        max_pool,
    )

    dt = jnp.bfloat16
    dae = init_dae(jax.random.PRNGKey(1), n_classes=C,
                   h_specs={"pool4": DAE_H_CHANNELS["pool4"]}, depth=3, stem_pool=1)
    # randomize the bilinear-init deconvs so correctness checks are non-trivial
    for k in ("up1", "up2", "up3", "up_stem1"):
        dae[k] = {"w": 0.1 * jax.random.normal(jax.random.PRNGKey(hash(k) % 2**31),
                                               dae[k]["w"].shape)}
    daeb = jax.tree.map(lambda v: v.astype(dt) if v.dtype == jnp.float32 else v, dae)
    x = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (B, H2, W2, C)), -1).astype(dt)
    hb = jax.random.normal(jax.random.PRNGKey(2), (B, 23, 30, 128), dt)

    def encoder(p, x):
        skips = []
        h = x
        for i in range(3):
            q = p[f"enc{i + 1}"]
            h = jax.nn.relu(conv2d(h, q["w"], q["b"], padding="SAME"))
            skips.append(h)
            h = max_pool(h, window=2, stride=2, ceil_mode=True)
        q = p["bottleneck"]
        h = jax.nn.relu(
            conv2d(h, q["w"][:, :, :128], q["b"], padding="SAME")
            + crop_to(hb, h.shape[1], h.shape[2]).astype(h.dtype)
        )
        return h, skips

    def decode_to_predense(p, h, skips):
        """Decoder up to (but not including) the up1 stage: returns the
        /2-of-pooled-scale map that feeds up1."""
        q = p["score_bottleneck"]
        s = conv2d(h, q["w"], q["b"], padding="SAME")
        for i in (2, 1):
            s = conv_transpose2d(s, p[f"up{i + 1}"]["w"], stride=2)
            q = p[f"score_enc{i + 1}"]
            sk = conv2d(skips[i], q["w"], q["b"], padding="SAME")
            s = crop_to(s, sk.shape[1], sk.shape[2])
            s = s + sk
        return s  # at 90x120, C channels — up1's input

    def step_v0(p, x):
        h, skips = encoder(p, x)
        u = decode_to_predense(p, h, skips)
        s = conv_transpose2d(u, p["up1"]["w"], stride=2)
        q = p["score_enc1"]
        sk = conv2d(skips[0], q["w"], q["b"], padding="SAME")
        s = crop_to(s, sk.shape[1], sk.shape[2]) + sk
        q = p["out"]
        s = conv2d(s, q["w"], q["b"], padding="SAME")
        q = p["score_input"]
        logits = s + conv2d(x, q["w"], q["b"], padding="SAME")
        r = jax.nn.softmax(logits, -1)
        return x - jnp.asarray(0.1, x.dtype) * (x - r)

    def folded_kernels(p, merge_si: bool):
        """Compose 'out' into up1/se1 (f32, cast to param dtype)."""
        f32 = jnp.float32
        w_out = p["out"]["w"][0, 0].astype(f32)          # (C, C)
        b_out = p["out"]["b"].astype(f32)
        up1 = p["up1"]["w"].astype(f32)                   # (4,4,C,C)
        se1_w = p["score_enc1"]["w"].astype(f32)          # (1,1,32,C)
        se1_b = p["score_enc1"]["b"].astype(f32)
        up1p = jnp.einsum("hwim,mo->hwio", up1, w_out)
        se1p_w = jnp.einsum("hwim,mo->hwio", se1_w, w_out)
        bp = se1_b @ w_out + b_out
        dt_ = p["up1"]["w"].dtype
        out = {
            "up1p": up1p.astype(dt_),
            "se1p_w": se1p_w.astype(dt_),
            "bp": bp.astype(dt_),
        }
        if merge_si:
            si_w = p["score_input"]["w"].astype(f32)      # (3,3,C,C)
            si_b = p["score_input"]["b"].astype(f32)
            # one 3x3 kernel over concat(skip1[32], x[C]): se1' centered
            k = jnp.zeros((3, 3, 32 + C, C), f32)
            k = k.at[1, 1, :32, :].set(se1p_w[0, 0])
            k = k.at[:, :, 32:, :].set(si_w)
            out["cat_w"] = k.astype(dt_)
            out["cat_b"] = (bp + si_b).astype(dt_)
        return out

    def step_v1(p, fk, x):
        h, skips = encoder(p, x)
        u = decode_to_predense(p, h, skips)
        s = conv_transpose2d(u, fk["up1p"], stride=2)
        sk = conv2d(skips[0], fk["se1p_w"], fk["bp"], padding="SAME")
        s = crop_to(s, sk.shape[1], sk.shape[2]) + sk
        q = p["score_input"]
        logits = s + conv2d(x, q["w"], q["b"], padding="SAME")
        r = jax.nn.softmax(logits, -1)
        return x - jnp.asarray(0.1, x.dtype) * (x - r)

    def step_v2(p, fk, x):
        h, skips = encoder(p, x)
        u = decode_to_predense(p, h, skips)
        s = conv_transpose2d(u, fk["up1p"], stride=2)
        cat = jnp.concatenate([skips[0], x.astype(skips[0].dtype)], axis=-1)
        sk = conv2d(cat, fk["cat_w"], fk["cat_b"], padding="SAME")
        logits = crop_to(s, sk.shape[1], sk.shape[2]) + sk
        r = jax.nn.softmax(logits, -1)
        return x - jnp.asarray(0.1, x.dtype) * (x - r)

    # ---- correctness in f32 (encoder casts the bf16 hb bias internally) ----
    xf = x.astype(jnp.float32)
    fk32 = folded_kernels(dae, True)
    v0 = step_v0(dae, xf)
    v1 = step_v1(dae, fk32, xf)
    v2 = step_v2(dae, fk32, xf)
    e1 = float(jnp.abs(v1 - v0).max())
    e2 = float(jnp.abs(v2 - v0).max())
    print(f"fold correctness (f32 max abs err): v1 {e1:.2e}  v2 {e2:.2e}", flush=True)
    assert e1 < 1e-3 and e2 < 1e-3  # f32 reassociation of the composed mix

    fk = folded_kernels(daeb, True)

    # ---- single-step timings ----
    timed(lambda xx: jnp.sum(step_v0(daeb, xx).astype(jnp.float32)), (x,), "step v0 (current)")
    timed(lambda xx: jnp.sum(step_v1(daeb, fk, xx).astype(jnp.float32)), (x,), "step v1 (out folded)")
    timed(lambda xx: jnp.sum(step_v2(daeb, fk, xx).astype(jnp.float32)), (x,), "step v2 (out folded + concat-merged tail)")

    # ---- K=5 scan timings (deployment context) ----
    def scan5(step, xx):
        y, _ = lax.scan(lambda c, _: (step(c), None), xx, None, length=5)
        return jnp.sum(y.astype(jnp.float32))

    timed(lambda xx: scan5(lambda c: step_v0(daeb, c), xx), (x,), "K=5 scan v0")
    timed(lambda xx: scan5(lambda c: step_v1(daeb, fk, c), xx), (x,), "K=5 scan v1")
    timed(lambda xx: scan5(lambda c: step_v2(daeb, fk, c), xx), (x,), "K=5 scan v2")


if __name__ == "__main__":
    main()
