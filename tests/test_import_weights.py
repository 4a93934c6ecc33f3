"""OIHW (Caffe/torch) weight-import converters."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iterative_inference_segm_tpu.models import init_fcn8, fcn8_apply
from iterative_inference_segm_tpu.ops.conv import conv2d
from iterative_inference_segm_tpu.utils.import_weights import (
    fc_to_conv_hwio,
    import_vgg16_oihw,
    oihw_to_hwio,
)


def test_oihw_to_hwio_equivalence():
    # an OIHW conv applied via torch-style semantics == converted HWIO conv
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 6, 6, 3)).astype(np.float32)
    w_oihw = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    w_hwio = oihw_to_hwio(w_oihw)
    out = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w_hwio), padding="SAME"))
    # manual correlation in OIHW terms
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((1, 6, 6, 4), np.float32)
    for o in range(4):
        for i in range(6):
            for j in range(6):
                patch = xp[0, i : i + 3, j : j + 3, :]  # H,W,I
                ref[0, i, j, o] = np.sum(patch * np.transpose(w_oihw[o], (1, 2, 0)))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_fc_to_conv_hwio_shape_and_order():
    rng = np.random.default_rng(1)
    cin, kh, kw, out = 5, 2, 3, 7
    w_fc = rng.normal(size=(out, cin * kh * kw)).astype(np.float32)
    w = fc_to_conv_hwio(w_fc, kh, kw, cin)
    assert w.shape == (kh, kw, cin, out)
    # element check: fc column index = ((i * kh) + h) * kw + w_ (C,H,W order)
    i, h, w_, o = 3, 1, 2, 4
    np.testing.assert_allclose(w[h, w_, i, o], w_fc[o, (i * kh + h) * kw + w_])


def test_fc_to_conv_rejects_bad_shape():
    with pytest.raises(ValueError):
        fc_to_conv_hwio(np.zeros((4, 10)), 2, 2, 3)


def test_import_vgg16_overlay():
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=3, fc_channels=8)
    rng = np.random.default_rng(2)
    pretrained = {
        "conv1_1": {
            "w": rng.normal(size=(64, 3, 3, 3)).astype(np.float32),
            "b": rng.normal(size=(64,)).astype(np.float32),
        }
    }
    merged = import_vgg16_oihw(pretrained, params)
    np.testing.assert_allclose(
        np.asarray(merged["conv1_1"]["w"]),
        oihw_to_hwio(pretrained["conv1_1"]["w"]),
        rtol=1e-6,
    )
    # untouched layers keep their init
    np.testing.assert_array_equal(
        np.asarray(merged["conv1_2"]["w"]), np.asarray(params["conv1_2"]["w"])
    )
    # the merged tree still runs
    probs, _ = fcn8_apply(merged, jnp.zeros((1, 32, 32, 3)))
    assert probs.shape == (1, 32, 32, 3)


def test_import_strict_missing_raises():
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=3, fc_channels=8)
    with pytest.raises(KeyError):
        import_vgg16_oihw({}, params, strict=True)


def test_import_shape_mismatch_raises():
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=3, fc_channels=8)
    with pytest.raises(ValueError):
        import_vgg16_oihw(
            {"conv1_1": {"w": np.zeros((64, 4, 3, 3), np.float32), "b": np.zeros(64, np.float32)}},
            params,
        )
