#!/usr/bin/env python
"""Decompose the flagship pipeline cost at the bench config (batch 128, bf16).

Measures, per image: FCN backbone, FCN decoder, K-step scan marginal cost,
and the full-res tail ops of one DAE step in isolation. Timing chains
executions into an on-device accumulator and device_gets once (the axon
relay makes block_until_ready a no-op).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timed(f, args, label, batch, iters=8, reps=2):
    jf = jax.jit(f)
    jax.device_get(jf(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            s = jf(*args)
            acc = s if acc is None else acc + s
        jax.device_get(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:<46s} {best * 1e3:8.3f} ms/iter  {best / batch * 1e3:7.4f} ms/img", flush=True)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--stem-pool", type=int, default=1)
    p.add_argument("--depth", type=int, default=3)
    args = p.parse_args()

    from iterative_inference_segm_tpu.models import init_fcn8, fcn8_apply, init_dae, dae_apply
    from iterative_inference_segm_tpu.models.dae import DAE_H_CHANNELS
    from iterative_inference_segm_tpu.inference.iterative import refinement_scan

    B, H, W, C = args.batch, 360, 480, 11
    cd = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    fcn = init_fcn8(key, n_classes=C)
    dae = init_dae(jax.random.PRNGKey(1), n_classes=C,
                   h_specs={"pool4": DAE_H_CHANNELS["pool4"]},
                   depth=args.depth, stem_pool=args.stem_pool)
    x = jax.random.normal(key, (B, H, W, 3), jnp.float32)

    def s(v):
        return jnp.sum(v, dtype=jnp.float32) if v.dtype != jnp.int32 else jnp.sum(v)

    # NOTE: params must be ARGUMENTS of the jitted fns — closing over them
    # bakes them into the HLO as literals and the axon relay rejects the
    # oversized compile request (HTTP 413).
    def backbone(fcn, x):
        _, h = fcn8_apply(fcn, x, return_features=("fc7",), compute_dtype=cd)
        return s(h["fc7"])

    def full_fcn(fcn, x):
        y0, h = fcn8_apply(fcn, x, return_features=("pool4",), compute_dtype=cd)
        return s(y0) + s(h["pool4"])

    def steps_fn(k):
        def f(fcn, dae, x):
            y0, h = fcn8_apply(fcn, x, return_features=("pool4",), compute_dtype=cd)
            dfn = lambda y: dae_apply(dae, y, h, depth=args.depth, compute_dtype=cd)
            yk = refinement_scan(dfn, y0, eps=0.1, num_steps=k, mode="score")
            return s(yk)
        return f

    timed(backbone, (fcn, x), "FCN backbone (to fc7)", B)
    timed(full_fcn, (fcn, x), "FCN fwd + decoder (y0 + pool4)", B)
    t0s = timed(steps_fn(0), (fcn, dae, x), "pipeline K=0", B)
    t1s = timed(steps_fn(1), (fcn, dae, x), "pipeline K=1", B)
    t5s = timed(steps_fn(5), (fcn, dae, x), "pipeline K=5", B)
    print(f"  -> marginal per step: {(t5s - t1s) / 4 / B * 1e3:.4f} ms/img; first step {(t1s - t0s) / B * 1e3:.4f}", flush=True)

    # one DAE apply alone (no scan) on a fixed y
    y = jax.nn.softmax(jax.random.normal(key, (B, H, W, C), jnp.float32), -1)
    _, h = jax.jit(lambda fcn, x: fcn8_apply(fcn, x, return_features=("pool4",), compute_dtype=cd))(fcn, x)
    h = {"pool4": h["pool4"]}
    timed(lambda dae, y, h: s(dae_apply(dae, y, h, depth=args.depth, compute_dtype=cd)),
          (dae, y, h), "one dae_apply (f32 y in)", B)

    # tail ops in isolation (flagship stem1: up_stem deconv + score_input + softmax + update)
    from iterative_inference_segm_tpu.ops.conv import conv2d, conv_transpose2d, avg_pool

    s_half = jax.random.normal(key, (B, 180, 240, C), cd)
    w_up = dae["up_stem1"]["w"].astype(cd)
    w_si = dae["score_input"]["w"].astype(cd)
    b_si = dae["score_input"]["b"].astype(cd)

    def tail(y, s_half, w_up, w_si, b_si):
        u = conv_transpose2d(s_half, w_up, stride=2)
        u = u[:, :H, :W, :]
        r = jax.nn.softmax((u + conv2d(y.astype(cd), w_si, b_si, padding="SAME")).astype(jnp.float32), -1)
        ynew = (1 - 0.1) * y + 0.1 * r
        return s(ynew)

    timed(tail, (y, s_half, w_up, w_si, b_si), "tail: deconv+conv3x3+softmax+update (f32 y)", B)
    y16 = y.astype(cd)

    def tail16(y, s_half, w_up, w_si, b_si):
        u = conv_transpose2d(s_half, w_up, stride=2)
        u = u[:, :H, :W, :]
        r = jax.nn.softmax(u + conv2d(y, w_si, b_si, padding="SAME"), -1)
        ynew = (1 - jnp.bfloat16(0.1)) * y + jnp.bfloat16(0.1) * r
        return s(ynew)

    timed(tail16, (y16, s_half, w_up, w_si, b_si), "tail all-bf16 state", B)

    # stem ops
    timed(lambda y: s(avg_pool(y.astype(cd), window=2, stride=2)), (y,), "stem avg_pool f32->bf16 @/1", B)
    timed(lambda y: s(avg_pool(y, window=2, stride=2)), (y16,), "stem avg_pool bf16 @/1", B)

    # encoder+decoder mid-res only (stem already applied): reuse dae_apply on half-res y with stem0 params
    # declare the /16 tap (512ch) at 'pool3' scale: relative to the half-res
    # input it sits at /8 = scale 3 = depth, mirroring the flagship geometry
    dae0 = init_dae(jax.random.PRNGKey(2), n_classes=C,
                    h_specs={"pool3": 512},
                    depth=args.depth, stem_pool=0)
    yh = jax.random.normal(key, (B, 180, 240, C), cd)
    h_half = {"pool4": jax.tree.map(lambda v: v, h["pool4"])}

    def middle(dae0, yh, h):
        # encoder/decoder at /2 and below: stem0 dae on the half-res map,
        # conditioning tap pool4 is at /16 relative to full = /8 relative to yh
        return s(dae_apply(dae0, yh, {"pool3": h["pool4"]}, depth=args.depth, compute_dtype=cd))

    try:
        timed(middle, (dae0, yh, h), "mid-res enc+dec (stem0 dae on half-res)", B)
    except Exception as e:
        print(f"  mid-res probe skipped: {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
