#!/usr/bin/env python
"""Backbone pool + conv1 probes: is reduce_window leaving bandwidth on the
table at the VGG stem, and can conv1_2+pool1 fuse via a phase-strided conv?

Context: tools/tail_ops_probe.py measured reduce_window avg-pool at C=11
running ~3x slower than a 2x2 stride-2 conv formulation. pool1 runs on a
(360,480,64) bf16 map — if max-pool has the same problem there, that's a
direct backbone win. Also measures the phase-strided conv1_2 variant
(stride-2 conv emitting all 4 output phases as channels, group-max = pool1)
whose arithmetic was previously rejected on paper; measure it for real.

Relay-proof timing (fori_loop chaining, one device_get).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

B = 128
LOOP = 8


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
    return jnp.sum(v.astype(jnp.float32)[..., 0])


def main():
    from iterative_inference_segm_tpu.ops.conv import conv2d, max_pool, _precision_for

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    for (h, w, c) in [(360, 480, 64), (180, 240, 128)]:
        x = jax.random.normal(key, (B, h, w, c), dt)
        timed(lambda x: red(x), (x,), f"baseline read ({h},{w},{c})")
        timed(lambda x: red(max_pool(x, window=2, stride=2, ceil_mode=True)), (x,),
              f"max_pool reduce_window ({h},{w},{c})")

        def pool_reshape(x):
            b, hh, ww, cc = x.shape
            g = x.reshape(b, hh // 2, 2, ww // 2, 2, cc)
            m = jnp.maximum(g[:, :, 0], g[:, :, 1])
            return red(jnp.maximum(m[:, :, :, 0], m[:, :, :, 1]))

        timed(pool_reshape, (x,), f"max_pool reshape+maximum ({h},{w},{c})")

    # conv1 block variants ------------------------------------------------
    x1 = jax.random.normal(key, (B, 360, 480, 64), dt)  # conv1_1 output
    w3 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64), dt) * 0.05
    b3 = jnp.zeros((64,), dt)

    def conv12_pool(x):
        h = jax.nn.relu(conv2d(x, w3, b3, padding="SAME"))
        return red(max_pool(h, window=2, stride=2, ceil_mode=True))

    timed(conv12_pool, (x1,), "conv1_2 + reduce_window pool1 (current)")

    def conv12_pool_reshape(x):
        h = jax.nn.relu(conv2d(x, w3, b3, padding="SAME"))
        b, hh, ww, cc = h.shape
        g = h.reshape(b, hh // 2, 2, ww // 2, 2, cc)
        m = jnp.maximum(g[:, :, 0], g[:, :, 1])
        return red(jnp.maximum(m[:, :, :, 0], m[:, :, :, 1]))

    timed(conv12_pool_reshape, (x1,), "conv1_2 + reshape-max pool1")

    # phase-strided conv1_2: stride-2 conv emitting 4 phases x 64ch, then
    # group-max over phases == conv + pool1 fused.
    w4 = jnp.zeros((4, 4, 64, 256), dt)
    for ph in range(2):
        for pw in range(2):
            phase = ph * 2 + pw
            w4 = w4.at[ph : ph + 3, pw : pw + 3, :, phase * 64 : (phase + 1) * 64].set(w3)
    b4 = jnp.tile(b3, 4)

    def conv12_phase(x):
        out = lax.conv_general_dilated(
            x, w4, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=_precision_for(x.dtype),
        )
        out = jax.nn.relu(out + b4)
        m = jnp.maximum(out[..., :128], out[..., 128:])
        return red(jnp.maximum(m[..., :64], m[..., 64:]))

    timed(conv12_phase, (x1,), "conv1_2 phase-strided conv + group-max (fused pool)")

    # sanity: equivalence of the three on a small slice
    xs = x1[:2, :16, :16]
    a = max_pool(jax.nn.relu(conv2d(xs, w3, b3, padding="SAME")), window=2, stride=2, ceil_mode=True)
    out = lax.conv_general_dilated(
        xs, w4, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_precision_for(xs.dtype),
    )
    out = jax.nn.relu(out + b4)
    m = jnp.maximum(out[..., :128], out[..., 128:])
    cphase = jnp.maximum(m[..., :64], m[..., 64:])
    err = jnp.max(jnp.abs(a.astype(jnp.float32) - cphase.astype(jnp.float32)))
    print(f"phase-conv vs conv+pool max abs err: {float(err):.2e}", flush=True)


if __name__ == "__main__":
    main()
