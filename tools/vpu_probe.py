#!/usr/bin/env python
"""Probe VPU throughput + Mosaic op support for the fused-tail kernel design.

All repetitions are chained INSIDE one jitted fori_loop (single dispatch,
single device_get) — through the axon relay, per-dispatch latency is ~ms and
swamps small kernels if you loop on the host.
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

R, C, W = 36, 11, 240
NH = 5
B = 32
LOOP = 20


def fma_kernel(x_ref, w_ref, o_ref, *, n_fma):
    x = x_ref[:].astype(jnp.float32)
    acc = x
    for i in range(n_fma):
        acc = acc + x * w_ref[i % 8, 0]
    o_ref[:] = acc.astype(x_ref.dtype)


def make_fma_loop(n_fma, dtype):
    def call(x, w):
        return pl.pallas_call(
            functools.partial(fma_kernel, n_fma=n_fma),
            out_shape=jax.ShapeDtypeStruct((B * NH, R, C, W), dtype),
            grid=(B * NH,),
            in_specs=[
                pl.BlockSpec((1, R, C, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, R, C, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        )(x, w)

    @jax.jit
    def f(x, w):
        def body(_, carry):
            return call(carry, w)

        out = jax.lax.fori_loop(0, LOOP, body, x)
        return jnp.sum(out[0, 0].astype(jnp.float32))

    return f


def bench_loop(f, args, label):
    jax.device_get(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(f(*args))
        best = min(best, (time.perf_counter() - t0) / LOOP)
    print(f"{label:<46s} {best * 1e3:8.4f} ms/call {best / B * 1e3:8.5f} ms/img-eq", flush=True)
    return best


def pattern_kernel(x_ref, k_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # (R, C, W)
    kc = k_ref[0]  # (C, 1)
    a = x * kc
    zeros = jnp.zeros((R, C, 1), jnp.float32)
    left = jnp.concatenate([zeros, a[:, :, :-1]], axis=2)
    right = jnp.concatenate([a[:, :, 1:], zeros], axis=2)
    up = jnp.concatenate([a[1:], jnp.zeros((1, C, W), jnp.float32)], axis=0)
    s = a + 0.5 * left + 0.25 * right + 0.125 * up
    s = s + s[:, 3:4, :] * 0.01
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    r = e / jnp.sum(e, axis=1, keepdims=True)
    o_ref[0] = r.astype(o_ref.dtype)


def run_patterns(dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, R, C, W), dtype)
    k = jnp.linspace(0.5, 1.5, C, dtype=jnp.float32).reshape(1, C, 1)

    def call(x, k):
        return pl.pallas_call(
            pattern_kernel,
            out_shape=jax.ShapeDtypeStruct((B, R, C, W), dtype),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, R, C, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R, C, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        )(x, k)

    @jax.jit
    def f(x, k):
        def body(_, carry):
            return call(carry, k)

        out = jax.lax.fori_loop(0, LOOP, body, x)
        return jnp.sum(out[0, 0].astype(jnp.float32))

    try:
        bench_loop(f, (x, k), f"pattern kernel ({dtype.__name__})")
        print("  patterns compile+run OK", flush=True)
    except Exception as e:
        print(f"  pattern kernel FAILED ({dtype.__name__}): {type(e).__name__}: {str(e)[:300]}", flush=True)


def main():
    w = jnp.linspace(0.9, 1.1, 8, dtype=jnp.float32).reshape(8, 1)
    for dtype in (jnp.bfloat16, jnp.float32):
        x = jax.random.normal(jax.random.PRNGKey(0), (B * NH, R, C, W), dtype)
        results = {}
        for n in (2, 26, 50, 100):
            try:
                results[n] = bench_loop(make_fma_loop(n, dtype), (x, w), f"fma chain n={n:3d} {dtype.__name__}")
            except Exception as e:
                print(f"fma n={n} {dtype.__name__} FAILED: {str(e)[:200]}", flush=True)
        if 26 in results and 100 in results:
            dt = results[100] - results[26]
            phys_c = 16 if dtype == jnp.bfloat16 else 16  # C=11 -> 16 sublanes both
            vregs_per_block = R * phys_c * 256 / (2048 if dtype == jnp.bfloat16 else 1024)
            total_vregs = 74 * vregs_per_block * B * NH
            print(f"   marginal 26->100: {dt * 1e3:.4f} ms for 74 passes -> "
                  f"{total_vregs / max(dt, 1e-9) / 1e9:.1f} Gvreg/s "
                  f"({dt / 74 / (B * NH) * 1e9:.0f} ns/pass/block)", flush=True)
    run_patterns(jnp.bfloat16)
    run_patterns(jnp.float32)


if __name__ == "__main__":
    main()
