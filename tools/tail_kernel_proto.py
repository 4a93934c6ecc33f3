#!/usr/bin/env python
"""Prototype: fused refinement-tail kernel formulations, timed on TPU.

Tail (per refinement step, full-res):
    logits = u + y @ W + b        # score_input 1x1 conv
    r = softmax(logits, -1)
    y_new = (1 - eps) * y + eps * r

Baseline = XLA composition. Variants:
  A: Pallas, (N, C) blocks, matmul via explicit unroll over C columns
  B: Pallas, (N, C) blocks, jnp.dot with padded weight
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 32, 360, 480, 11
N = B * H * W
TILE = 1024
ITERS = 20


def xla_tail(u, y, w, b, eps):
    logits = u + jnp.einsum("nc,cd->nd", y, w) + b
    r = jax.nn.softmax(logits, axis=-1)
    return (1.0 - eps) * y + eps * r


def kernel_unroll(eps_ref, w_ref, b_ref, u_ref, y_ref, out_ref, *, n_classes):
    y = y_ref[:]
    u = u_ref[:]
    cols = []
    for c in range(n_classes):
        acc = b_ref[0, c]
        for k in range(n_classes):
            acc = acc + y[:, k] * w_ref[k, c]
        cols.append(acc + u[:, c])
    logits = jnp.stack(cols, axis=1)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    r = e / jnp.sum(e, axis=1, keepdims=True)
    eps = eps_ref[0]
    out_ref[:] = (1.0 - eps) * y + eps * r


def kernel_dot(eps_ref, w_ref, b_ref, u_ref, y_ref, out_ref, *, n_classes):
    y = y_ref[:]
    logits = u_ref[:] + jnp.dot(y, w_ref[:], preferred_element_type=jnp.float32) + b_ref[0, :]
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    r = e / jnp.sum(e, axis=1, keepdims=True)
    eps = eps_ref[0]
    out_ref[:] = (1.0 - eps) * y + eps * r


def make_pallas(kernel):
    @jax.jit
    def f(u, y, w, b, eps):
        return pl.pallas_call(
            functools.partial(kernel, n_classes=C),
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
            grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # eps (1,)
                pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(eps, w, b[None, :], u, y)
    return f


def timed(f, args, label):
    out = jax.device_get(f(*args))
    t0 = time.perf_counter()
    acc = None
    for _ in range(ITERS):
        s = jnp.sum(f(*args)[:, 0])
        acc = s if acc is None else acc + s
    jax.device_get(acc)
    per = (time.perf_counter() - t0) / ITERS
    print(f"{label:<30s} {per * 1e3:8.3f} ms/iter  {per / B * 1e3:7.3f} ms/img", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    u = jax.random.normal(key, (N, C), jnp.float32)
    y = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (N, C)), -1)
    w = jax.random.normal(jax.random.PRNGKey(2), (C, C), jnp.float32) * 0.1
    b = jnp.zeros((C,), jnp.float32)
    eps = jnp.asarray([0.1], jnp.float32)

    ref = timed(jax.jit(lambda u, y, w, b, e: xla_tail(u, y, w, b, e[0])), (u, y, w, b, eps), "XLA composition")
    for name, kern in [("pallas unroll", kernel_unroll), ("pallas dot", kernel_dot)]:
        try:
            got = timed(make_pallas(kern), (u, y, w, b, eps), name)
            err = np.abs(np.asarray(got) - np.asarray(ref)).max()
            print(f"    max err vs XLA: {err:.2e}", flush=True)
        except Exception as e:
            print(f"    {name} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
