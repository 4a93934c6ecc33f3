#!/usr/bin/env python
"""Microbenchmark individual DAE-step ops on the TPU to find the slow one."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from iterative_inference_segm_tpu.ops.conv import conv2d, conv_transpose2d, max_pool, avg_pool
from iterative_inference_segm_tpu.ops.conv import init_conv, bilinear_kernel

B, H, W, C = 32, 360, 480, 11
ITERS = 20


def timed(fn, args, label):
    f = jax.jit(fn)
    jax.device_get(f(*args))
    t0 = time.perf_counter()
    acc = None
    for _ in range(ITERS):
        s = f(*args)
        acc = s if acc is None else acc + s
    jax.device_get(acc)
    per = (time.perf_counter() - t0) / ITERS
    print(f"{label:<50s} {per * 1e3:8.3f} ms/iter  {per / B * 1e3:7.3f} ms/img", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    y = jax.nn.softmax(jax.random.normal(key, (B, H, W, C), jnp.float32), -1)
    y16 = y.astype(jnp.bfloat16)
    p_enc1 = init_conv(key, 3, 3, C, 32, dtype=jnp.float32)
    w32 = p_enc1["w"].astype(jnp.bfloat16)
    b32 = p_enc1["b"].astype(jnp.bfloat16)
    x32 = jax.random.normal(key, (B, H, W, 32), jnp.bfloat16)
    x180 = jax.random.normal(key, (B, 180, 240, 32), jnp.bfloat16)
    up_w = bilinear_kernel(4, C, C).astype(jnp.float32)
    s_half = jax.random.normal(key, (B, 180, 240, C), jnp.float32)
    sc_w = init_conv(key, 1, 1, 32, C)["w"]

    timed(lambda v: jnp.sum(v * 1.0001, dtype=jnp.float32), (y,), "elementwise pass f32 (B,H,W,11)")
    timed(lambda v: jnp.sum(jax.nn.softmax(v, -1), dtype=jnp.float32), (y,), "softmax f32 (B,H,W,11)")
    timed(lambda v: jnp.sum(conv2d(v, w32, b32), dtype=jnp.float32), (y16,), "conv3x3 11->32 bf16 @/1")
    timed(lambda v: jnp.sum(conv2d(v, jnp.zeros((3, 3, 32, 32), jnp.bfloat16)), dtype=jnp.float32), (x32,), "conv3x3 32->32 bf16 @/1")
    timed(lambda v: jnp.sum(max_pool(v), dtype=jnp.float32), (x32,), "max_pool 2x2 bf16 @/1 (32ch)")
    timed(lambda v: jnp.sum(max_pool(v), dtype=jnp.float32), (y,), "max_pool 2x2 f32 @/1 (11ch)")
    timed(lambda v: jnp.sum(avg_pool(v), dtype=jnp.float32), (y,), "avg_pool 2x2 f32 @/1 (11ch)")
    timed(lambda v: jnp.sum(conv2d(v, jnp.zeros((3, 3, 32, 64), jnp.bfloat16)), dtype=jnp.float32), (x180,), "conv3x3 32->64 bf16 @/2")
    timed(lambda v: jnp.sum(conv_transpose2d(v, up_w, stride=2), dtype=jnp.float32), (s_half,), "deconv k4s2 11->11 f32 /2->/1")
    timed(
        lambda v: jnp.sum(conv_transpose2d(v.astype(jnp.bfloat16), up_w.astype(jnp.bfloat16), stride=2), dtype=jnp.float32),
        (s_half,),
        "deconv k4s2 11->11 bf16 /2->/1",
    )
    timed(lambda v: jnp.sum(conv2d(v, sc_w.astype(jnp.bfloat16)), dtype=jnp.float32), (x32,), "score 1x1 32->11 bf16 @/1")
    # fused chain: enc1+pool (the first stage exactly as dae_apply does it)
    def stage1(v):
        h = jax.nn.relu(conv2d(v.astype(jnp.bfloat16), w32, b32))
        return jnp.sum(max_pool(h), dtype=jnp.float32)
    timed(stage1, (y,), "stage1: cast+conv+relu+pool @/1")


if __name__ == "__main__":
    main()
