"""Jittable preprocessing: normalize, random crop, horizontal flip.

The reference's augmentation lives host-side in ``dataset_loaders`` threads
(SURVEY.md §4.5: crop 224x224 train / full-size eval, hflip, normalize).
Here every transform is a pure jax function on batched arrays so it fuses
into the training program on-chip; the host only decodes bytes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from iterative_inference_segm_tpu.data.config_datasets import DatasetConfig


def normalize_image(
    x: jax.Array, cfg: DatasetConfig, *, input_scale: float = 1.0
) -> jax.Array:
    """(x/input_scale - mean) / std with per-dataset statistics; any float
    dtype in, f32 out.

    ``input_scale`` declares the input encoding explicitly: 1.0 (default) for
    the repo-wide [0,1] convention (every in-repo loader emits [0,1] f32),
    255.0 for raw byte-range input. The encoding is a property of the data
    source, never inferred from batch content — a data-dependent guess would
    normalize a genuinely dark [0,255] image differently from its batch-mates.
    """
    x = x.astype(jnp.float32)
    if input_scale != 1.0:
        x = x / jnp.float32(input_scale)
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    return (x - mean) / std


def random_crop_and_flip(
    key: jax.Array,
    image: jax.Array,
    labels: jax.Array,
    *,
    crop: tuple[int, int],
) -> tuple[jax.Array, jax.Array]:
    """Per-sample random crop + horizontal flip for a batch (vmapped inside).

    image: (B, H, W, C) f32; labels: (B, H, W) int. Crop offsets and flip
    bits are drawn per sample. Uses dynamic_slice so the compiled program has
    static output shapes (TPU requirement).
    """
    b, h, w, _ = image.shape
    ch, cw = crop
    k_off, k_flip = jax.random.split(key)
    oy = jax.random.randint(k_off, (b,), 0, h - ch + 1)
    ox = jax.random.randint(jax.random.fold_in(k_off, 1), (b,), 0, w - cw + 1)
    flip = jax.random.bernoulli(k_flip, 0.5, (b,))

    def one(img, lab, oy, ox, fl):
        img_c = jax.lax.dynamic_slice(img, (oy, ox, 0), (ch, cw, img.shape[-1]))
        lab_c = jax.lax.dynamic_slice(lab, (oy, ox), (ch, cw))
        img_c = jnp.where(fl, img_c[:, ::-1, :], img_c)
        lab_c = jnp.where(fl, lab_c[:, ::-1], lab_c)
        return img_c, lab_c

    # No materialization barrier needed: measured in the FULL train step
    # with warmed best-of-3 timing (tools/aug_step_probe.py, 2026-08-18,
    # v5e), in-graph crop+flip costs <2% vs pre-cropped inputs at b64
    # (crop-128: 1295 vs 1317 img/s; crop-224: 464 vs 464), and adding an
    # optimization_barrier after the crop is neutral. (An earlier "3x
    # augmentation cost / barrier win" was a per-process warm-up
    # measurement artifact — see the probe's docstring.) The <2% result is
    # b64-specific: the r5 roofline sweep found -26% at crop-128 b128/b256
    # (TRAIN_HISTORY.jsonl; ARCHITECTURE.md "Training-path roofline") —
    # tools/aug_order_probe.py A/Bs the crop-before-normalize orders.
    return jax.vmap(one)(image, labels, oy, ox, flip)


def eval_preprocess(image: jax.Array, cfg: DatasetConfig) -> jax.Array:
    """Full-resolution eval path: normalization only (reference evaluates at
    native 360x480 without crops)."""
    return normalize_image(image, cfg)
