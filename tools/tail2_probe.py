#!/usr/bin/env python
"""Second-generation tail probes: channel-major (NCHW) pointwise tail,
softmax dtype variants, avg-pool formulations.

Motivation (tools/tail_ops_probe.py, v5e, batch 128, bf16): per-op marginal
costs of the full-res tail are pass-count-bound, and every op that REDUCES
over the lane-resident C=11 dim (softmax, argmax, grouped variants) pays a
lane-padding/reshuffle tax. In channel-MAJOR layout those reductions become
accumulations over 11 (H, W) slabs — pure elementwise vreg work over a
dense minor dim (W on lanes), which XLA can fuse without lane shuffles.

Timings are relay-proof (fori_loop chaining inside one jit, device_get once).
"""

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


def timed(fn, operands, label):
    @jax.jit
    def run(*ops):
        def body(i, acc):
            perturbed = tuple(
                o + (acc * jnp.float32(1e-38)).astype(o.dtype) for o in ops
            )
            return acc + fn(*perturbed)

        return lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

    jax.device_get(run(*operands))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(*operands))
        best = min(best, (time.perf_counter() - t0) / LOOP)
    print(f"{label:<58s} {best * 1e3:8.3f} ms/call {best / B * 1e3:8.5f} ms/img", flush=True)
    return best


def red(v):
    return jnp.sum(v.astype(jnp.float32))


def main():
    from iterative_inference_segm_tpu.ops.conv import (
        avg_pool,
        bilinear_kernel,
        conv2d,
        init_conv,
        _precision_for,
    )

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    y = jax.nn.softmax(jax.random.normal(key, (B, H, W, C)), -1).astype(dt)
    y_cm = jnp.transpose(y, (0, 3, 1, 2))  # channel-major
    logits = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C), jnp.float32)
    s = jax.random.normal(jax.random.PRNGKey(2), (B, Hh, Wh, C), dt)
    w_up = bilinear_kernel(4, C, C).astype(dt)
    w_si = init_conv(jax.random.PRNGKey(3), 3, 3, C, C)["w"].astype(dt)
    b_si = jnp.zeros((C,), dt)
    eps = jnp.bfloat16(0.1)

    timed(lambda y: red(y), (y,), "baseline NHWC full-res")
    timed(lambda y: red(y), (y_cm,), "baseline NCHW full-res")

    # --- pointwise tail: softmax + blend + argmax ------------------------
    def tail_nhwc(u, y):
        r = jax.nn.softmax(u, -1)
        yk = y - eps * (y - r)
        return jnp.sum(jnp.argmax(yk, -1), dtype=jnp.int32).astype(jnp.float32)

    def tail_nchw(u_cm, y_cm):
        r = jax.nn.softmax(u_cm, 1)
        yk = y_cm - eps * (y_cm - r)
        return jnp.sum(jnp.argmax(yk, 1), dtype=jnp.int32).astype(jnp.float32)

    u = jax.random.normal(jax.random.PRNGKey(4), (B, H, W, C), dt)
    u_cm = jnp.transpose(u, (0, 3, 1, 2))
    timed(tail_nhwc, (u, y), "softmax+blend+argmax NHWC")
    timed(tail_nchw, (u_cm, y_cm), "softmax+blend+argmax NCHW")

    # --- FCN probs softmax variants --------------------------------------
    timed(lambda l: red(jax.nn.softmax(l, -1).astype(dt)), (logits,),
          "probs: softmax f32->bf16 NHWC (current)")
    timed(lambda l: red(jax.nn.softmax(l.astype(dt), -1)), (logits,),
          "probs: cast bf16 then softmax NHWC")
    timed(lambda l: red(jax.nn.softmax(l, 1).astype(dt)),
          (jnp.transpose(logits, (0, 3, 1, 2)),), "probs: softmax f32->bf16 NCHW")

    # --- conv emitting NCHW ----------------------------------------------
    def conv_si_nhwc(y):
        return red(conv2d(y, w_si, b_si, padding="SAME"))

    def conv_si_to_nchw(y):
        out = lax.conv_general_dilated(
            y, w_si, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NCHW"),
            precision=_precision_for(y.dtype),
        )
        return red(out + b_si[None, :, None, None].astype(out.dtype))

    def conv_si_nchw_in_out(y_cm):
        out = lax.conv_general_dilated(
            y_cm, w_si, (1, 1), "SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            precision=_precision_for(y_cm.dtype),
        )
        return red(out + b_si[None, :, None, None].astype(out.dtype))

    timed(conv_si_nhwc, (y,), "conv3x3 CxC full-res NHWC->NHWC (current)")
    timed(conv_si_to_nchw, (y,), "conv3x3 CxC full-res NHWC->NCHW")
    timed(conv_si_nchw_in_out, (y_cm,), "conv3x3 CxC full-res NCHW->NCHW")

    # transpose cost on its own
    timed(lambda y: red(jnp.transpose(y, (0, 3, 1, 2))), (y,), "transpose NHWC->NCHW full-res")

    # --- avg-pool variants (the half engine's x0 = avg_pool(y0)) ---------
    timed(lambda y: red(avg_pool(y, window=2, stride=2)), (y,),
          "avg_pool reduce_window bf16 (current)")

    def pool_reshape(y):
        b, h, w, c = y.shape
        g = y.reshape(b, h // 2, 2, w // 2, 2, c)
        return red((g[:, :, 0, :, 0] + g[:, :, 1, :, 0] + g[:, :, 0, :, 1] + g[:, :, 1, :, 1]) * jnp.bfloat16(0.25))

    def pool_slice(y):
        q = (y[:, 0::2, 0::2] + y[:, 1::2, 0::2] + y[:, 0::2, 1::2] + y[:, 1::2, 1::2])
        return red(q * jnp.bfloat16(0.25))

    timed(pool_reshape, (y,), "avg_pool via reshape+phase-add")
    timed(pool_slice, (y,), "avg_pool via strided slices")

    def pool_conv(y):
        wp = jnp.full((2, 2, 1, 1), 0.25, dt)
        wp = wp * jnp.eye(C, dtype=dt)[None, None]
        return red(conv2d(y, wp, stride=2, padding="VALID"))

    timed(pool_conv, (y,), "avg_pool via 2x2 stride-2 conv (dense eye)")

    # --- full rectification tail chains ----------------------------------
    from iterative_inference_segm_tpu.ops.conv import conv_transpose2d

    def rect_nhwc(s, y):
        u = conv_transpose2d(s, w_up, stride=2)
        t = u + conv2d(y, w_si, b_si, padding="SAME")
        r = jax.nn.softmax(t, -1)
        yk = y - eps * (y - r)
        return jnp.sum(jnp.argmax(yk, -1), dtype=jnp.int32).astype(jnp.float32)

    def rect_nchw(s, y, y_cm):
        # convs stay NHWC-in (fast path) but emit NCHW; pointwise in NCHW
        from iterative_inference_segm_tpu.ops.conv import conv_transpose2d_phase

        u = conv_transpose2d_phase(s, w_up, stride=2)  # NHWC out
        u_cm = lax.conv_general_dilated(
            y, w_si, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NCHW"),
            precision=_precision_for(y.dtype),
        ) + jnp.transpose(u, (0, 3, 1, 2)) + b_si[None, :, None, None].astype(dt)
        r = jax.nn.softmax(u_cm, 1)
        yk = y_cm - eps * (y_cm - r)
        return jnp.sum(jnp.argmax(yk, 1), dtype=jnp.int32).astype(jnp.float32)

    timed(rect_nhwc, (s, y), "RECT: full tail NHWC (current)")
    timed(rect_nchw, (s, y, y_cm), "RECT: convs->NCHW + pointwise NCHW")


if __name__ == "__main__":
    main()
