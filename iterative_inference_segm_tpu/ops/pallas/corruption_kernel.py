"""Fused one-hot + Gaussian-noise + softmax corruption as ONE Pallas kernel.

Rebuild of the reference's ``GaussianNoiseLayerSoftmax``
(``[ref: layers/mylayers.py]``) as a single VMEM-resident pass:

    out = softmax(one_hot(labels) + sigma * N(0, 1), axis=classes)

The unfused composition writes three (B, H, W, C) f32 tensors to HBM
(one-hot, noise, logits) before the softmax reads them back; at CamVid
training shapes that is ~3x the op's unavoidable traffic. Here the one-hot
is built from a lane iota, the Gaussian noise from a counter-based hash RNG
(murmur3 finalizer + Box-Muller, evaluated entirely on the VPU), and the
softmax runs in registers — one HBM read of the labels, one write of the
result.

A counter-based RNG is used instead of ``pltpu.prng_random_bits`` so the
kernel is bit-deterministic given (seed, element index) on every backend —
including the CPU interpreter used by the test suite (whose hardware-PRNG
stub returns zeros) — and stateless across grid steps.

The kernel computes in a 128-lane padded class space (TPU lane width) and
the wrapper slices back to ``n_classes``; padded lanes are masked to -inf
before the softmax so they carry no probability mass.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TILE = 512  # pixels per grid step (sublane dim), f32 tile-aligned


def _murmur3_fmix(x: jax.Array) -> jax.Array:
    """Murmur3 finalizer: full-avalanche uint32 -> uint32 hash."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _uniform_from_bits(bits: jax.Array) -> jax.Array:
    """uint32 random bits -> f32 uniform in (0, 1]. Top 24 bits, exactly
    representable; +1 keeps it strictly positive for the Box-Muller log.
    Mosaic has no uint32->f32 cast, so bitcast the (<2^24, hence sign-safe)
    shifted value to int32 before converting."""
    u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32)
    return (u + 1.0) * (1.0 / 16777216.0)


def _corrupt_kernel(seed_ref, sigma_ref, labels_ref, out_ref, *, n_classes: int):
    labels = labels_ref[:]  # (TILE, 1) int32
    col = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _LANES), dimension=1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _LANES), dimension=0)
    onehot = jnp.where(col == labels, 1.0, 0.0)  # void (>=C) rows -> all zero

    # counter-based gaussian noise: unique uint32 counter per element
    pix = pl.program_id(0) * _TILE + row
    ctr = (pix.astype(jnp.uint32) * jnp.uint32(_LANES) + col.astype(jnp.uint32))
    seed = seed_ref[0].astype(jnp.uint32)
    b1 = _murmur3_fmix(ctr * jnp.uint32(0x9E3779B9) + seed)
    b2 = _murmur3_fmix(ctr * jnp.uint32(0x85EBCA77) + (seed ^ jnp.uint32(0xDEADBEEF)))
    u1 = _uniform_from_bits(b1)
    u2 = _uniform_from_bits(b2)
    noise = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * math.pi) * u2)

    logits = onehot + sigma_ref[0] * noise
    logits = jnp.where(col < n_classes, logits, -jnp.inf)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    out_ref[:] = e / jnp.sum(e, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("n_classes", "interpret"))
def _corrupt_padded(labels_flat, seed, sigma, *, n_classes: int, interpret: bool):
    n = labels_flat.shape[0]
    grid = n // _TILE
    return pl.pallas_call(
        functools.partial(_corrupt_kernel, n_classes=n_classes),
        out_shape=jax.ShapeDtypeStruct((n, _LANES), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sigma (1,)
            pl.BlockSpec((_TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, sigma, labels_flat[:, None])


def _corrupt_probs_kernel(seed_ref, sigma_ref, probs_ref, out_ref, *, n_classes: int):
    """softmax(probs + sigma*N(0,1)) — corruption of an existing probability
    map (the 'natural corruption' regime applies extra noise to frozen-FCN
    outputs, ``[ref: train_dae.py]``). Same fused structure as the one-hot
    kernel, but the clean signal is read instead of synthesized."""
    col = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _LANES), dimension=1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_TILE, _LANES), dimension=0)
    pix = pl.program_id(0) * _TILE + row
    ctr = pix.astype(jnp.uint32) * jnp.uint32(_LANES) + col.astype(jnp.uint32)
    seed = seed_ref[0].astype(jnp.uint32)
    b1 = _murmur3_fmix(ctr * jnp.uint32(0x9E3779B9) + seed)
    b2 = _murmur3_fmix(ctr * jnp.uint32(0x85EBCA77) + (seed ^ jnp.uint32(0xDEADBEEF)))
    noise = jnp.sqrt(-2.0 * jnp.log(_uniform_from_bits(b1))) * jnp.cos(
        (2.0 * math.pi) * _uniform_from_bits(b2)
    )
    logits = probs_ref[:] + sigma_ref[0] * noise
    logits = jnp.where(col < n_classes, logits, -jnp.inf)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    out_ref[:] = e / jnp.sum(e, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("n_classes", "interpret"))
def _corrupt_probs_padded(probs_flat, seed, sigma, *, n_classes: int, interpret: bool):
    n = probs_flat.shape[0]
    return pl.pallas_call(
        functools.partial(_corrupt_probs_kernel, n_classes=n_classes),
        out_shape=jax.ShapeDtypeStruct((n, _LANES), jnp.float32),
        grid=(n // _TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, sigma, probs_flat)


def corrupt_probs_pallas(
    probs: jax.Array,
    key: jax.Array,
    *,
    sigma: float | jax.Array,
) -> jax.Array:
    """Fused softmax(probs + sigma*N(0,1)) over the class axis.

    Drop-in for ``ops.corruption.corrupt_probs`` (different noise stream)."""
    *lead, n_classes = probs.shape
    if n_classes > _LANES:
        raise ValueError(f"n_classes {n_classes} exceeds lane width {_LANES}")
    n = math.prod(lead)
    n_pad = -(-n // _TILE) * _TILE

    flat = probs.reshape(n, n_classes).astype(jnp.float32)
    flat = jnp.pad(flat, ((0, n_pad - n), (0, _LANES - n_classes)))

    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    seed = (kd[0] ^ (kd[-1] << 7)).astype(jnp.int32).reshape(1)
    sigma_arr = jnp.asarray(sigma, jnp.float32).reshape(1)

    on_tpu = jax.devices()[0].platform == "tpu"
    out = _corrupt_probs_padded(flat, seed, sigma_arr, n_classes=n_classes, interpret=not on_tpu)
    out = out[:n, :n_classes]
    return jax.lax.stop_gradient(out.reshape(*lead, n_classes))


def corrupt_onehot_pallas(
    labels: jax.Array,
    key: jax.Array,
    *,
    n_classes: int,
    sigma: float | jax.Array,
) -> jax.Array:
    """Fused softmax(one_hot(labels) + sigma*N(0,1)): (B,H,W) -> (B,H,W,C).

    Drop-in for ``ops.corruption.corrupt_onehot`` (different PRNG stream, so
    draws differ sample-for-sample; the distribution matches). Runs the TPU
    kernel natively on TPU and under the Pallas TPU interpreter elsewhere.
    """
    if n_classes > _LANES:
        raise ValueError(f"n_classes {n_classes} exceeds lane width {_LANES}")
    shape = labels.shape
    n = math.prod(shape)
    n_pad = -(-n // _TILE) * _TILE

    flat = labels.reshape(-1).astype(jnp.int32)
    if n_pad != n:
        flat = jnp.concatenate([flat, jnp.full((n_pad - n,), n_classes, jnp.int32)])

    kd = jax.random.key_data(key).astype(jnp.uint32).reshape(-1)
    seed = (kd[0] ^ (kd[-1] << 7)).astype(jnp.int32).reshape(1)
    sigma_arr = jnp.asarray(sigma, jnp.float32).reshape(1)

    on_tpu = jax.devices()[0].platform == "tpu"
    out = _corrupt_padded(flat, seed, sigma_arr, n_classes=n_classes, interpret=not on_tpu)
    out = out[:n, :n_classes]
    return jax.lax.stop_gradient(out.reshape(*shape, n_classes))
