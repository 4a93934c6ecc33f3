"""Import reference-era weights (Caffe/torch OIHW layouts) into this framework.

The reference initializes FCN-8 from Caffe-converted VGG16 ``.npz`` files
(``[ref: models/fcn8.py]`` load_weights, SURVEY.md §6 'pretrained VGG/FCN
init loaded from converted Caffe .npz'). Those store conv weights as
(out, in, kh, kw) [OIHW] and fully-connected fc6/fc7 as flat matrices; this
framework is NHWC/HWIO. These converters make any such checkpoint loadable,
so parity against reference weights can be checked bit-for-bit whenever a
real checkpoint is available.
"""

from __future__ import annotations

import numpy as np

# canonical VGG16 conv layer order (matches models/fcn8._VGG)
VGG16_CONV_NAMES = (
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3",
)


def oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    """(out, in, kh, kw) -> (kh, kw, in, out)."""
    if w.ndim != 4:
        raise ValueError(f"expected 4-D OIHW weight, got shape {w.shape}")
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def fc_to_conv_hwio(w: np.ndarray, kh: int, kw: int, cin: int) -> np.ndarray:
    """Flat FC matrix (out, cin*kh*kw) in Caffe C,H,W flattening order ->
    (kh, kw, cin, out) conv weight (the fc6-as-conv conversion)."""
    out = w.shape[0]
    if w.ndim != 2 or w.shape[1] != cin * kh * kw:
        raise ValueError(f"expected ({out}, {cin * kh * kw}) FC weight, got {w.shape}")
    w = w.reshape(out, cin, kh, kw)  # O, I, H, W (Caffe flattening)
    return oihw_to_hwio(w)


def import_vgg16_oihw(weights: dict, params: dict, *, strict: bool = False) -> dict:
    """Overlay OIHW-layout VGG16 conv weights onto an init_fcn8 pytree.

    ``weights`` maps layer name -> {'w': OIHW array, 'b': (out,) array}
    (or tuples). Layers absent from ``weights`` keep their initialization —
    matching the reference behavior where score/upsampling layers are
    freshly initialized and only the VGG stack is pretrained.
    """
    import jax.numpy as jnp

    out = dict(params)
    for name in VGG16_CONV_NAMES:
        if name not in weights:
            if strict:
                raise KeyError(f"missing pretrained layer {name!r}")
            continue
        entry = weights[name]
        w, b = (entry["w"], entry["b"]) if isinstance(entry, dict) else entry
        w = oihw_to_hwio(np.asarray(w))
        b = np.asarray(b)
        if w.shape != tuple(params[name]["w"].shape):
            raise ValueError(
                f"{name}: converted shape {w.shape} != model shape {tuple(params[name]['w'].shape)}"
            )
        out[name] = {
            "w": jnp.asarray(w, dtype=params[name]["w"].dtype),
            "b": jnp.asarray(b, dtype=params[name]["b"].dtype),
        }
    return out
