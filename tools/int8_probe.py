#!/usr/bin/env python
"""Does this v5e expose an int8 MXU path through XLA? (round-3 gate)

v5e peak is 394 int8 TOPS vs 197 bf16 TFLOPS; if XLA lowers int8
convs/dots onto the int8 MXU mode, a PTQ fast-config could halve the
backbone's 0.94 ms/img. Round-1 lax.dot probes suggested no; this is the
definitive conv-shaped measurement (relay-proof timing).
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
LOOP = 10


def timed(fn, args, label):
    """Perturb the FIRST arg with the accumulator each iteration — without
    this the conv is loop-invariant and XLA hoists it out of the fori_loop
    (first version of this probe 'measured' 386 bf16 TF/s, 2x peak)."""

    @jax.jit
    def run(x, w):
        def body(i, acc):
            # perturb the (small) weight, not the activations: keeps the
            # anti-hoist dependency cheap relative to the conv under test
            wp = (w.astype(jnp.float32) + acc * jnp.float32(1e-30)).astype(w.dtype)
            return acc + fn(x, wp)

        return lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

    try:
        jax.device_get(run(*args))
    except Exception as e:
        print(f"{label:<52s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(*args))
        best = min(best, (time.perf_counter() - t0) / LOOP)
    print(f"{label:<52s} {best * 1e3:8.3f} ms/call {best / B * 1e3:8.5f} ms/img", flush=True)
    return best


def main():
    key = jax.random.PRNGKey(0)
    # conv4_2-shaped workload: (B,45,60,512) x (3,3,512,512) = 12.7 GF/img
    x8 = jax.random.randint(key, (B, 45, 60, 512), -127, 127, jnp.int8)
    w8 = jax.random.randint(jax.random.PRNGKey(1), (3, 3, 512, 512), -127, 127, jnp.int8)
    xb = x8.astype(jnp.bfloat16)
    wb = w8.astype(jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv_i8(x, w):
        return jnp.sum(
            lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
        ).astype(jnp.float32)

    def conv_bf16(x, w):
        return jnp.sum(
            lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
            .astype(jnp.float32)
        )

    t_bf = timed(conv_bf16, (xb, wb), "conv 3x3 512->512 @45x60 bf16")
    t_i8 = timed(conv_i8, (x8, w8), "conv 3x3 512->512 @45x60 int8->int32")

    # dot-shaped: (N, K) @ (K, M)
    a8 = jax.random.randint(key, (8192, 2048), -127, 127, jnp.int8)
    b8 = jax.random.randint(jax.random.PRNGKey(2), (2048, 2048), -127, 127, jnp.int8)
    timed(lambda a, b: jnp.sum(jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                                       preferred_element_type=jnp.float32)),
          (a8, b8), "dot 8192x2048x2048 bf16")
    timed(lambda a, b: jnp.sum(jnp.dot(a, b, preferred_element_type=jnp.int32)).astype(jnp.float32),
          (a8, b8), "dot 8192x2048x2048 int8->int32")
    if t_bf and t_i8:
        print(f"int8/bf16 conv speedup: {t_bf / t_i8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
