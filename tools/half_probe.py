#!/usr/bin/env python
"""Decompose the HALF-engine flagship cost and probe its remaining levers.

Measures (batch 128, bf16, 360x480):
  * one half-res refinement step (dae_core + half_logits + softmax + update)
    for the flagship widths and leaner width/depth variants;
  * the final full-res rectification for tail='full' vs tail='sep';
  * end-to-end half pipelines for each candidate configuration.

Timing chains executions into an on-device accumulator and device_gets once
(the axon relay makes block_until_ready a no-op — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timed(f, args, label, batch, iters=8, reps=2, perturb_idx=1):
    # iterations chained INSIDE one jit via fori_loop (CLAUDE.md: host-side
    # dispatch loops pay ~3 ms per call through the relay and corrupt
    # small-op measurements). The scalar accumulator perturbs the operand at
    # ``perturb_idx`` (an input array, NOT the param pytree — perturbing
    # params would add a full param-sweep of HBM traffic per iteration) by
    # ~0 so XLA cannot CSE the iterations away.
    from jax import lax

    @jax.jit
    def run(*ops):
        def body(i, acc):
            x = ops[perturb_idx]
            perturbed = (
                ops[:perturb_idx]
                + (x + (acc * jnp.float32(1e-38)).astype(x.dtype),)
                + ops[perturb_idx + 1 :]
            )
            return acc + jnp.float32(f(*perturbed))

        return lax.fori_loop(0, iters, body, jnp.float32(0.0))

    jax.device_get(run(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(run(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{label:<58s} {best * 1e3:8.3f} ms/iter  {best / batch * 1e3:7.4f} ms/img", flush=True)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    args = p.parse_args()

    from iterative_inference_segm_tpu.models import init_fcn8, fcn8_apply, init_dae
    from iterative_inference_segm_tpu.models.dae import (
        DAE_H_CHANNELS,
        dae_core,
        precompute_bottleneck_h,
    )
    from iterative_inference_segm_tpu.inference.fused import (
        half_logits,
        full_logits,
        halfres_refinement_scan,
    )

    B, H, W, C = args.batch, 360, 480, 11
    cd = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    fcn = init_fcn8(key, n_classes=C)
    x = jax.random.normal(key, (B, H, W, 3), jnp.float32)
    y0 = jax.nn.softmax(jax.random.normal(key, (B, H, W, C), jnp.float32), -1).astype(cd)
    xh = jax.nn.softmax(jax.random.normal(key, (B, H // 2, W // 2, C), jnp.float32), -1).astype(cd)

    _, h = jax.jit(
        lambda fcn, x: fcn8_apply(fcn, x, return_features=("pool4",), compute_dtype=cd)
    )(fcn, x)
    h = {"pool4": h["pool4"]}

    def s(v):
        return jnp.sum(v, dtype=jnp.float32)

    configs = [
        ("flagship d3 (32,64,128)", 3, (32, 64, 128), "full"),
        ("lean d3 (24,48,96)", 3, (24, 48, 96), "full"),
        ("lean d3 (16,32,64)", 3, (16, 32, 64), "full"),
        # depth 2 is invalid here: stem_pool+depth=3 puts the deepest scale
        # at /8, above the pool4 (/16) conditioning tap
        ("flagship sep tail", 3, (32, 64, 128), "sep"),
    ]

    for label, depth, widths, tail in configs:
        dae = init_dae(
            jax.random.PRNGKey(1), n_classes=C,
            h_specs={"pool4": DAE_H_CHANNELS["pool4"]},
            depth=depth, stem_pool=1, widths=widths, tail=tail,
        )

        def one_step(dae, xh, h):
            bh = precompute_bottleneck_h(dae, h, depth=depth, stem_pool=1, in_hw=(H // 2, W // 2))
            sc = dae_core(dae, xh.astype(cd), bh[2], depth=depth, stem_pool=1, bottleneck_h=bh)
            r = jax.nn.softmax(half_logits(dae, xh, sc.astype(cd)), -1)
            return s(xh - jnp.bfloat16(0.1) * (xh - r))

        def rect(dae, xh, y0, h):
            bh = precompute_bottleneck_h(dae, h, depth=depth, stem_pool=1, in_hw=(H // 2, W // 2))
            sk = dae_core(dae, xh.astype(cd), bh[2], depth=depth, stem_pool=1, bottleneck_h=bh)
            r = jax.nn.softmax(full_logits(dae, sk.astype(cd), y0), -1)
            yk = y0 - jnp.bfloat16(0.1) * (y0 - r)
            return jnp.sum(jnp.argmax(yk, -1), dtype=jnp.int32)

        def pipe(fcn, dae, x):
            y0p, hp = fcn8_apply(fcn, x, return_features=("pool4",), compute_dtype=cd, probs_dtype=cd)
            bh = precompute_bottleneck_h(dae, hp, depth=depth, stem_pool=1, in_hw=(H // 2, W // 2))
            core = lambda yp: dae_core(dae, yp.astype(cd), bh[2], depth=depth, stem_pool=1, bottleneck_h=bh)
            yk = halfres_refinement_scan(dae, core, y0p, eps=0.1, num_steps=5, state_dtype=cd)
            return jnp.sum(jnp.argmax(yk, -1), dtype=jnp.int32)

        t_step = timed(one_step, (dae, xh, h), f"{label}: one half-res step", B)
        t_rect = timed(rect, (dae, xh, y0, h), f"{label}: rectification (core+tail+argmax)", B)
        t_pipe = timed(pipe, (fcn, dae, x), f"{label}: FULL pipeline K=5", B, perturb_idx=2)
        print(f"  -> {label}: pipeline {B / t_pipe:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
