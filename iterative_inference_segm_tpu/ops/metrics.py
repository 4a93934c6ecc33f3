"""Segmentation metrics: confusion-matrix accumulation, per-class IoU, accuracy.

Rebuild of ``[ref: metrics.py]`` ``jaccard(...)`` / ``accuracy(...)``. The
reference accumulates per-batch confusion counts on the host; here the
confusion matrix is a jittable on-device reduction (one scatter-add per
batch), so evaluation loops stay on-chip and metrics stream back as a single
(C, C) array.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SegMetrics(NamedTuple):
    """Aggregated segmentation metrics."""

    per_class_iou: jax.Array  # (C,) f64-ish f32; nan-free (0 where class absent)
    mean_iou: jax.Array  # scalar, mean over classes present in union
    pixel_accuracy: jax.Array  # scalar
    valid_pixels: jax.Array  # scalar int


def confusion_matrix(
    pred: jax.Array,
    labels: jax.Array,
    *,
    n_classes: int,
) -> jax.Array:
    """(C, C) confusion counts over non-void pixels; rows=true, cols=pred.

    pred, labels: integer maps of identical shape. Labels outside
    [0, n_classes) are void and excluded — same masking as the reference.
    """
    valid = (labels >= 0) & (labels < n_classes)
    t = jnp.where(valid, labels, 0).astype(jnp.int32).reshape(-1)
    p = jnp.clip(pred, 0, n_classes - 1).astype(jnp.int32).reshape(-1)
    v = valid.reshape(-1)
    idx = t * n_classes + p
    counts = jnp.zeros((n_classes * n_classes,), jnp.int32).at[idx].add(
        v.astype(jnp.int32)
    )
    return counts.reshape(n_classes, n_classes)


def metrics_from_confusion(cm: jax.Array) -> SegMetrics:
    """Per-class IoU / mIoU / accuracy from a (C, C) confusion matrix."""
    cm = cm.astype(jnp.float32)
    diag = jnp.diagonal(cm)
    row = jnp.sum(cm, axis=1)
    col = jnp.sum(cm, axis=0)
    union = row + col - diag
    present = union > 0
    iou = jnp.where(present, diag / jnp.maximum(union, 1.0), 0.0)
    mean_iou = jnp.sum(iou) / jnp.maximum(jnp.sum(present), 1)
    total = jnp.sum(cm)
    acc = jnp.sum(diag) / jnp.maximum(total, 1.0)
    return SegMetrics(
        per_class_iou=iou,
        mean_iou=mean_iou,
        pixel_accuracy=acc,
        valid_pixels=total.astype(jnp.int32),
    )


def jaccard(pred: jax.Array, labels: jax.Array, *, n_classes: int) -> SegMetrics:
    """One-shot per-class IoU for a batch (accumulate cm across batches for
    dataset-level numbers, as the reference's epoch loop does)."""
    return metrics_from_confusion(confusion_matrix(pred, labels, n_classes=n_classes))


def pixel_accuracy(pred: jax.Array, labels: jax.Array, *, n_classes: int) -> jax.Array:
    valid = (labels >= 0) & (labels < n_classes)
    correct = (pred == labels) & valid
    return jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)
