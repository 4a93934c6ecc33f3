#!/usr/bin/env python
"""In-graph augmentation micro-probe (VERDICT r3 missing #3 follow-up).

POSTSCRIPT (read first): the "augment=True cells fall 3x off the
no-augment line" observation that motivated this probe turned out to be
a per-process warm-up measurement artifact, not a property of the
program — see tools/train_bench.py's docstring and aug_step_probe.py.
With warmed best-of-3 timing the in-graph augmentation costs <2% of the
full train step at b64. This probe's standalone numbers below remain
valid (and consistent: the augmentation alone is ~0.02-0.05 ms/img, far
too cheap to explain the artifact that was chased).

The augmentation is `random_crop_and_flip` (data/pipeline.py): a vmapped
`dynamic_slice` per sample plus a `where`-selected flip — both lower to
gathers on TPU. This probe times the augmentation step ALONE at training
shapes against re-formulations that produce BITWISE-identical outputs
from the same RNG draws:

  A. current      vmap(dynamic_slice) + where(flip, reversed, cropped)
  B. gather2      take_along_axis rows then cols, flip folded into the
                  column indices (one fused gather pair, no reverse copy)
  C. onehot-mxu   crop = two batched one-hot matmuls (rows then cols),
                  flip folded into the column one-hot — the image crop
                  rides the MXU; labels go through B's integer gather
  D. slice+fold   vmap(dynamic_slice) for the crop (contiguous slice,
                  not a general gather) + flip via take_along_axis on
                  the already-cropped tensor

Timing: iterations chained inside one jit via a perturbation carrier
(CLAUDE.md — block_until_ready does not block through the relay).

Usage (real TPU):  python tools/aug_probe.py [--batch 64] [--crops 224,128]
"""

from __future__ import annotations

import argparse
import sys
import time

import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from iterative_inference_segm_tpu.data.pipeline import random_crop_and_flip

LOOP = 30


def _draws(key, b, h, w, crop):
    """The shared RNG protocol (identical to data/pipeline.py's draws)."""
    ch, cw = crop
    k_off, k_flip = jax.random.split(key)
    oy = jax.random.randint(k_off, (b,), 0, h - ch + 1)
    ox = jax.random.randint(jax.random.fold_in(k_off, 1), (b,), 0, w - cw + 1)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))
    return oy, ox, flip


def _col_indices(ox, flip, cw):
    """Column gather indices with the horizontal flip folded in: the flip of
    a [ox, ox+cw) crop reads columns ox + cw-1-j."""
    j = jnp.arange(cw)
    return ox[:, None] + jnp.where(flip[:, None], cw - 1 - j, j)


def aug_current(key, image, labels, crop):
    return random_crop_and_flip(key, image, labels, crop=crop)


def aug_gather2(key, image, labels, crop):
    b, h, w, _ = image.shape
    ch, cw = crop
    oy, ox, flip = _draws(key, b, h, w, crop)
    rows = oy[:, None] + jnp.arange(ch)            # (B, ch)
    cols = _col_indices(ox, flip, cw)              # (B, cw)
    img = jnp.take_along_axis(image, rows[:, :, None, None], axis=1)
    img = jnp.take_along_axis(img, cols[:, None, :, None], axis=2)
    lab = jnp.take_along_axis(labels, rows[:, :, None], axis=1)
    lab = jnp.take_along_axis(lab, cols[:, None, :], axis=2)
    return img, lab


def aug_onehot(key, image, labels, crop):
    b, h, w, _ = image.shape
    ch, cw = crop
    oy, ox, flip = _draws(key, b, h, w, crop)
    rows = oy[:, None] + jnp.arange(ch)
    cols = _col_indices(ox, flip, cw)
    R = jax.nn.one_hot(rows, h, dtype=image.dtype)     # (B, ch, H)
    C = jax.nn.one_hot(cols, w, dtype=image.dtype)     # (B, cw, W)
    img = jnp.einsum("bih,bhwc->biwc", R, image)
    img = jnp.einsum("bjw,biwc->bijc", C, img)
    lab = jnp.take_along_axis(labels, rows[:, :, None], axis=1)
    lab = jnp.take_along_axis(lab, cols[:, None, :], axis=2)
    return img, lab


def aug_slice_fold(key, image, labels, crop):
    b, h, w, _ = image.shape
    ch, cw = crop
    oy, ox, flip = _draws(key, b, h, w, crop)

    def one(img, lab, oy, ox):
        return (
            lax.dynamic_slice(img, (oy, ox, 0), (ch, cw, img.shape[-1])),
            lax.dynamic_slice(lab, (oy, ox), (ch, cw)),
        )

    img, lab = jax.vmap(one)(image, labels, oy, ox)
    j = jnp.arange(cw)
    cols = jnp.where(flip[:, None], cw - 1 - j, j)     # (B, cw), local
    img = jnp.take_along_axis(img, cols[:, None, :, None], axis=2)
    lab = jnp.take_along_axis(lab, cols[:, None, :], axis=2)
    return img, lab


VARIANTS = [
    ("A current (vmap dyn_slice + where-flip)", aug_current),
    ("B gather2 (take_along_axis, folded flip)", aug_gather2),
    ("C onehot-mxu (crop as 2 batched matmuls)", aug_onehot),
    ("D slice+fold (dyn_slice crop, gather flip)", aug_slice_fold),
]


def timed(fn, key, image, labels, crop, label, batch):
    @jax.jit
    def run(image, labels):
        def body(i, acc):
            xp = image + (acc * jnp.float32(1e-38)).astype(image.dtype)
            img, lab = fn(jax.random.fold_in(key, i), xp, labels, crop)
            # consume the FULL outputs — a narrow slice here lets XLA
            # shrink the gather itself and under-measure the variant
            return acc + jnp.sum(img.astype(jnp.float32)) + jnp.sum(lab).astype(jnp.float32)

        return lax.fori_loop(0, LOOP, body, jnp.float32(0.0))

    jax.device_get(run(image, labels))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(run(image, labels))
        best = min(best, (time.perf_counter() - t0) / LOOP)
    print(
        f"{label:<46s} {best * 1e3:8.3f} ms/call {best / batch * 1e3:8.5f} ms/img",
        flush=True,
    )
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--crops", type=str, default="224,128")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((args.batch, args.height, args.width, 3), np.float32))
    labels = jnp.asarray(rng.integers(0, 11, (args.batch, args.height, args.width)).astype(np.int32))
    key = jax.random.PRNGKey(7)

    for crop_s in args.crops.split(","):
        crop = (int(crop_s), int(crop_s))
        print(f"=== batch={args.batch} {args.height}x{args.width} -> crop {crop} ===")
        # bitwise-equality check against the current implementation first
        ref_i, ref_l = jax.device_get(jax.jit(lambda k, i, l: aug_current(k, i, l, crop))(key, image, labels))
        for label, fn in VARIANTS[1:]:
            got_i, got_l = jax.device_get(jax.jit(lambda k, i, l, fn=fn: fn(k, i, l, crop))(key, image, labels))
            ok = np.array_equal(ref_i, got_i) and np.array_equal(ref_l, got_l)
            # C is expected to MISMATCH: f32 matmul on the MXU truncates
            # through bf16 passes, so one-hot selection is not pixel-exact.
            # It is timed for information only and is NOT adoptable (a crop
            # must be bitwise — it selects pixels, it doesn't approximate).
            print(f"  equality {label.split()[0]}: {'OK' if ok else 'MISMATCH (informational only)'}")
            if not ok and label.split()[0] != "C":
                sys.exit(f"variant {label} is not bitwise-equal; fix before timing")
        for label, fn in VARIANTS:
            timed(fn, key, image, labels, crop, label, args.batch)


if __name__ == "__main__":
    main()
