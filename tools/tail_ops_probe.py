#!/usr/bin/env python
"""Per-op decomposition of the NHWC refinement tail (relay-proof timing)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

B, C, Hh, Wh = 128, 11, 180, 240
H, W = 2 * Hh, 2 * Wh
LOOP = 10


def timed(fn, x, extra, label):
    @jax.jit
    def run(x, extra):
        def body(i, acc):
            xp = x + (acc * jnp.float32(1e-38)).astype(x.dtype)
            return acc + fn(xp, *extra)

        return lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

    jax.device_get(run(x, extra))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(x, extra))
        best = min(best, (time.perf_counter() - t0) / LOOP)
    print(f"{label:<56s} {best * 1e3:8.3f} ms/call {best / B * 1e3:8.5f} ms/img", flush=True)
    return best


def red(v):
    return jnp.sum(v.astype(jnp.float32))


def main():
    from iterative_inference_segm_tpu.ops.conv import (
        avg_pool,
        bilinear_kernel,
        conv2d,
        conv_transpose2d,
        conv_transpose2d_phase,
        _conv_transpose2d_dilated,
        init_conv,
    )

    dt = jnp.bfloat16
    y = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C)), -1).astype(dt)
    s = jax.random.normal(jax.random.PRNGKey(1), (B, Hh, Wh, C), dt)
    w_up = bilinear_kernel(4, C, C).astype(dt)
    w_si = init_conv(jax.random.PRNGKey(2), 3, 3, C, C)["w"].astype(dt)
    b_si = jnp.zeros((C,), dt)

    timed(lambda y: red(y), y, (), "baseline full-res (perturb+reduce)")
    timed(lambda s: red(s), s, (), "baseline half-res")
    timed(lambda s: red(conv_transpose2d_phase(s, w_up, stride=2)), s, (),
          "deconv k4s2 phase-major (conv44 + interleave)")
    timed(lambda s: red(_conv_transpose2d_dilated(s, w_up, stride=2)), s, (),
          "deconv k4s2 input-dilated")

    # phase conv WITHOUT the interleave (output stays 44-channel half-res)
    def deconv_no_interleave(s):
        from iterative_inference_segm_tpu.ops import conv as cv

        w3 = jnp.zeros((3, 3, C, 4 * C), dtype=s.dtype)  # same shape as real w3
        return red(lax.conv_general_dilated(
            s, w3, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))

    timed(deconv_no_interleave, s, (), "phase conv 11->44 only (no interleave)")

    timed(lambda y: red(conv2d(y, w_si, b_si)), y, (), "conv3x3 11->11 full-res")
    timed(lambda y: red(jax.nn.softmax(y.astype(jnp.float32), -1)), y, (),
          "softmax f32 full-res")
    timed(lambda y: red(jax.nn.softmax(y, -1)), y, (), "softmax bf16 full-res")
    timed(lambda y: red(y - jnp.bfloat16(0.1) * (y - y * jnp.bfloat16(0.99))), y, (),
          "update elementwise full-res")
    timed(lambda y: red(avg_pool(y, window=2, stride=2)), y, (), "avg_pool 2x2 full-res")

    # grouped (depthwise) full-res 3x3
    from iterative_inference_segm_tpu.ops.conv import conv2d_depthwise, delta_kernel_depthwise

    w_dw = delta_kernel_depthwise(3, C).astype(dt)
    timed(lambda y: red(conv2d_depthwise(y, w_dw)), y, (), "conv3x3 depthwise full-res")

    # phase-channel layout tail candidate: conv3x3 44->44 at HALF res
    y_pc = jax.random.normal(jax.random.PRNGKey(3), (B, Hh, Wh, 4 * C), dt)
    w44 = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 4 * C, 4 * C), dt) * 0.05
    timed(lambda yp: red(conv2d(yp, w44)), y_pc, (), "conv3x3 44->44 half-res (phase-channel)")
    # grouped softmax over 4 groups of 11 in lane dim
    timed(lambda yp: red(jax.nn.softmax(yp.reshape(B, Hh, Wh, 4, C), -1).reshape(B, Hh, Wh, 4 * C)),
          y_pc, (), "grouped softmax (4x11) half-res")
    # phase pool: mean of 4 channel groups
    timed(lambda yp: red(jnp.mean(yp.reshape(B, Hh, Wh, 4, C), 3)), y_pc, (),
          "phase-channel pool to 11ch")
    # full-res NHWC <-> phase-channel converts
    timed(lambda y: red(y.reshape(B, Hh, 2, Wh, 2, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, Hh, Wh, 4 * C)),
          y, (), "NHWC full-res -> phase-channel")


if __name__ == "__main__":
    main()
