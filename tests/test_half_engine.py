"""Half-resolution refinement engine (the throughput configuration)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iterative_inference_segm_tpu.models import init_fcn8, fcn8_apply
from iterative_inference_segm_tpu.models.dae import init_dae, dae_core
from iterative_inference_segm_tpu.inference.fused import (
    full_logits,
    half_logits,
    halfres_refinement_scan,
    make_half_refiner,
)
from iterative_inference_segm_tpu.inference.search import grid_search_eps_k_half
from iterative_inference_segm_tpu.ops.conv import avg_pool

C = 5


def _dae(tail):
    return init_dae(
        jax.random.PRNGKey(1), n_classes=C, h_specs={"pool4": 512}, depth=3,
        stem_pool=1, tail=tail, widths=(8, 16, 32),
    )


def _setup(tail="full"):
    fcn = init_fcn8(jax.random.PRNGKey(0), n_classes=C, fc_channels=16)
    dae = _dae(tail)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 48, 64, 3))
    return fcn, dae, x


@pytest.mark.parametrize("tail", ["full", "sep"])
def test_half_refiner_runs_and_moves_iterate(tail):
    fcn, dae, x = _setup(tail)
    refine = make_half_refiner(fcn8_apply, fcn, dae, eps=0.3, num_steps=3,
                               h_taps=("pool4",), depth=3)
    y0, yk = refine(x)
    assert yk.shape == y0.shape == (2, 48, 64, C)
    assert np.isfinite(np.asarray(yk, np.float32)).all()
    # probability-map-ish output (convex blend of y0 and a softmax)
    assert float(jnp.abs(jnp.sum(yk, -1) - 1.0).max()) < 1e-3
    assert float(jnp.abs(yk - y0).max()) > 1e-5


def test_half_engine_k0_is_one_rectification_not_identity():
    """num_steps=0 applies exactly one full-res rectification from x_0."""
    fcn, dae, x = _setup()
    y0, h = fcn8_apply(fcn, x, return_features=("pool4",))
    core_fn = lambda xx: dae_core(dae, xx, h, depth=3, stem_pool=1)
    got = halfres_refinement_scan(dae, core_fn, y0, eps=0.25, num_steps=0)

    x0 = avg_pool(y0, window=2, stride=2)
    s0 = core_fn(x0)
    r = jax.nn.softmax(full_logits(dae, s0, y0), -1)
    want = y0 - 0.25 * (y0 - r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_half_engine_rejects_odd_and_wrong_stem():
    fcn, dae, _ = _setup()
    y_odd = jnp.zeros((1, 47, 64, C))
    with pytest.raises(ValueError):
        halfres_refinement_scan(dae, lambda x: x, y_odd, eps=0.1, num_steps=1)
    dae0 = init_dae(jax.random.PRNGKey(1), n_classes=C, h_specs={"pool4": 512},
                    depth=4, stem_pool=0)
    with pytest.raises(ValueError):
        halfres_refinement_scan(dae0, lambda x: x, jnp.zeros((1, 48, 64, C)),
                                eps=0.1, num_steps=1)


def test_half_logits_match_general_tail_at_half_res():
    """For the 'full' tail, half_logits == s + score_input conv (definition)."""
    from iterative_inference_segm_tpu.ops.conv import conv2d

    dae = _dae("full")
    x = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (2, 8, 12, C)), -1)
    s = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 12, C))
    got = half_logits(dae, x, s)
    p = dae["score_input"]
    want = s + conv2d(x, p["w"], p["b"], padding="SAME")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_precomputed_bottleneck_h_is_exact():
    """conv(concat(x, h), W) == conv(x, W_x) + conv(h, W_h): the folded
    conditioning bias is an exact reassociation (f32)."""
    from iterative_inference_segm_tpu.models.dae import precompute_bottleneck_h

    dae = _dae("full")
    h = {"pool4": jax.random.normal(jax.random.PRNGKey(7), (2, 3, 4, 512))}
    x_half = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(8), (2, 24, 32, C)), -1)

    ref = dae_core(dae, x_half, h, depth=3, stem_pool=1)
    bh = precompute_bottleneck_h(dae, h, depth=3, stem_pool=1, in_hw=(24, 32))
    got = dae_core(dae, x_half, bh[2], depth=3, stem_pool=1, bottleneck_h=bh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # no bottleneck-scale taps -> no-op passthrough
    none_bh = precompute_bottleneck_h(dae, {}, depth=3, stem_pool=1, in_hw=(24, 32))
    assert none_bh[0] is None


def test_half_search_scores_match_engine():
    """Search row k must equal running the engine with num_steps=k."""
    from iterative_inference_segm_tpu.ops.metrics import confusion_matrix, metrics_from_confusion

    fcn, dae, x = _setup()
    labels = jax.random.randint(jax.random.PRNGKey(5), (2, 48, 64), 0, C)
    res = grid_search_eps_k_half(
        fcn8_apply, fcn, dae, [(np.asarray(x), np.asarray(labels))],
        n_classes=C, eps_grid=[0.3], k_max=2, h_taps=("pool4",), depth=3,
    )
    assert res["miou"].shape == (1, 3)
    for k in range(3):
        refine = make_half_refiner(fcn8_apply, fcn, dae, eps=0.3, num_steps=k,
                                   h_taps=("pool4",), depth=3)
        _, yk = refine(x)
        cm = confusion_matrix(jnp.argmax(yk, -1), labels, n_classes=C)
        miou = float(metrics_from_confusion(cm).mean_iou)
        np.testing.assert_allclose(res["miou"][0, k], miou, atol=1e-6)


def test_strided_encoder_shapes_grads_and_fold():
    """encoder='stride' (stride-2 convs, post-reduction skips): same param
    tree, same output scale, differentiable, and the bottleneck-h fold stays
    an exact reassociation."""
    from iterative_inference_segm_tpu.models.dae import precompute_bottleneck_h

    dae = _dae("full")
    h = {"pool4": jax.random.normal(jax.random.PRNGKey(7), (2, 3, 4, 512))}
    x_half = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(8), (2, 24, 32, C)), -1)

    s = dae_core(dae, x_half, h, depth=3, stem_pool=1, encoder="stride")
    assert s.shape == (2, 24, 32, C)

    bh = precompute_bottleneck_h(dae, h, depth=3, stem_pool=1, in_hw=(24, 32))
    got = dae_core(dae, x_half, bh[2], depth=3, stem_pool=1, bottleneck_h=bh,
                   encoder="stride")
    np.testing.assert_allclose(np.asarray(got), np.asarray(s), rtol=1e-5, atol=1e-5)

    g = jax.grad(
        lambda y: jnp.sum(dae_core(dae, y, h, depth=3, stem_pool=1, encoder="stride") ** 2)
    )(x_half)
    assert g.shape == x_half.shape
    assert bool(jnp.any(g != 0))

    with pytest.raises(ValueError, match="encoder"):
        dae_core(dae, x_half, h, depth=3, stem_pool=1, encoder="bogus")


def test_strided_encoder_odd_sizes_and_dae_apply():
    from iterative_inference_segm_tpu.models import dae_apply

    dae = _dae("full")
    h = {"pool4": jax.random.normal(jax.random.PRNGKey(7), (1, 3, 4, 512))}
    y = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(9), (1, 45, 62, C)), -1)
    out = dae_apply(dae, y, h, depth=3, encoder="stride")
    assert out.shape == y.shape
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-4)


def test_half_refiner_strided_runs_and_moves_iterate():
    from iterative_inference_segm_tpu.inference.fused import make_half_refiner

    fcn, dae, x = _setup("full")
    refine = make_half_refiner(fcn8_apply, fcn, dae, eps=0.3, num_steps=2,
                               h_taps=("pool4",), depth=3, encoder="stride")
    y0, yk = refine(x)
    assert yk.shape == y0.shape
    assert float(jnp.abs(yk - y0).max()) > 1e-6


def test_half_search_strided_runs():
    fcn, dae, x = _setup("full")
    import numpy as _np

    rng = _np.random.default_rng(0)
    batches = [(
        rng.normal(size=(2, 48, 64, 3)).astype(_np.float32),
        rng.integers(0, C, size=(2, 48, 64)).astype(_np.int32),
    )]
    res = grid_search_eps_k_half(
        fcn8_apply, fcn, dae, batches, n_classes=C, eps_grid=[0.2], k_max=2,
        depth=3, encoder="stride",
    )
    assert res["miou"].shape == (1, 3)
    assert _np.all(_np.isfinite(res["miou"]))


def test_half_energy_matches_independent_composition():
    """Golden for --engine half --mode energy (VERDICT r2 #5): the engine's
    trajectory must equal an independently-written composition — K energy
    steps on the pooled map (grad through core + half tail) then one
    tail-Jacobian rectification — built here straight from jax.grad, not
    from the engine's helpers."""
    fcn, dae, x = _setup()
    y0, h = fcn8_apply(fcn, x, return_features=("pool4",))
    core_fn = lambda xx: dae_core(dae, xx, h, depth=3, stem_pool=1)
    eps, K = 0.2, 3

    got = halfres_refinement_scan(dae, core_fn, y0, eps=eps, num_steps=K,
                                  mode="energy")

    xc = avg_pool(y0, window=2, stride=2)

    def denoise_half(xx):
        return jax.nn.softmax(half_logits(dae, xx, core_fn(xx)), -1)

    for _ in range(K):
        g = jax.grad(lambda t: 0.5 * jnp.sum(jnp.square(t - denoise_half(t))))(xc)
        xc = xc - eps * g
    s_k = core_fn(xc)

    def denoise_full(yy):
        return jax.nn.softmax(full_logits(dae, s_k, yy), -1)

    g = jax.grad(lambda t: 0.5 * jnp.sum(jnp.square(t - denoise_full(t))))(y0)
    want = y0 - eps * g
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_half_energy_differs_from_score_and_is_finite():
    fcn, dae, x = _setup()
    for mode in ("score", "energy"):
        refine = make_half_refiner(fcn8_apply, fcn, dae, eps=0.2, num_steps=2,
                                   h_taps=("pool4",), depth=3, mode=mode)
        y0, yk = refine(x)
        assert np.isfinite(np.asarray(yk, np.float32)).all()
        if mode == "score":
            yk_score = yk
    assert float(jnp.abs(yk - yk_score).max()) > 1e-6


def test_half_search_energy_rows_match_engine():
    from iterative_inference_segm_tpu.ops.metrics import confusion_matrix, metrics_from_confusion

    fcn, dae, x = _setup()
    labels = jax.random.randint(jax.random.PRNGKey(5), (2, 48, 64), 0, C)
    res = grid_search_eps_k_half(
        fcn8_apply, fcn, dae, [(np.asarray(x), np.asarray(labels))],
        n_classes=C, eps_grid=[0.2], k_max=1, h_taps=("pool4",), depth=3,
        mode="energy",
    )
    for k in range(2):
        refine = make_half_refiner(fcn8_apply, fcn, dae, eps=0.2, num_steps=k,
                                   h_taps=("pool4",), depth=3, mode="energy")
        _, yk = refine(x)
        cm = confusion_matrix(jnp.argmax(yk, -1), labels, n_classes=C)
        miou = float(metrics_from_confusion(cm).mean_iou)
        np.testing.assert_allclose(res["miou"][0, k], miou, atol=1e-6)


def test_half_rejects_unknown_mode():
    fcn, dae, x = _setup()
    y0 = jnp.zeros((1, 48, 64, C))
    with pytest.raises(ValueError, match="mode"):
        halfres_refinement_scan(dae, lambda t: t, y0, eps=0.1, num_steps=1,
                                mode="bogus")


# --- quarter engine (stem_pool=2): the same pooled-iteration engine one
# scale deeper — every per-step pass costs 1/16 of full res ---


def _dae_q():
    return init_dae(
        jax.random.PRNGKey(1), n_classes=C, h_specs={"pool4": 512}, depth=2,
        stem_pool=2, widths=(8, 16),
    )


def test_quarter_engine_k0_is_one_rectification():
    """stem_pool=2: x0 = avg_pool^2(y0); rectification chains up_stem1+up_stem2."""
    from iterative_inference_segm_tpu.models.dae import dae_stem_pool_of

    fcn = init_fcn8(jax.random.PRNGKey(0), n_classes=C, fc_channels=16)
    dae = _dae_q()
    assert dae_stem_pool_of(dae) == 2
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 48, 64, 3))
    y0, h = fcn8_apply(fcn, x, return_features=("pool4",))
    core_fn = lambda xx: dae_core(dae, xx, h, depth=2, stem_pool=2)
    got = halfres_refinement_scan(dae, core_fn, y0, eps=0.25, num_steps=0)

    x0 = avg_pool(avg_pool(y0, window=2, stride=2), window=2, stride=2)
    s0 = core_fn(x0)
    r = jax.nn.softmax(full_logits(dae, s0, y0), -1)
    want = y0 - 0.25 * (y0 - r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_quarter_folded_matches_unfolded_and_refiner_runs():
    dae = _dae_q()
    # non-trivial out/deconvs (they init as identity/bilinear)
    dae["out"] = {
        "w": 0.5 * jax.random.normal(jax.random.PRNGKey(9), dae["out"]["w"].shape),
        "b": 0.1 * jax.random.normal(jax.random.PRNGKey(10), dae["out"]["b"].shape),
    }
    h = {"pool4": jax.random.normal(jax.random.PRNGKey(7), (2, 3, 4, 512))}
    y0 = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(3), (2, 48, 64, C)), -1)
    from iterative_inference_segm_tpu.inference.fused import (
        halfres_refinement_scan_folded,
    )

    core_fn = lambda xx: dae_core(dae, xx, h, depth=2, stem_pool=2)
    predense_fn = lambda xx: dae_core(dae, xx, h, depth=2, stem_pool=2, predense=True)
    want = halfres_refinement_scan(dae, core_fn, y0, eps=0.3, num_steps=2)
    got = halfres_refinement_scan_folded(dae, predense_fn, y0, eps=0.3, num_steps=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)

    fcn = init_fcn8(jax.random.PRNGKey(0), n_classes=C, fc_channels=16)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 48, 64, 3))
    refine = make_half_refiner(fcn8_apply, fcn, dae, eps=0.3, num_steps=2,
                               h_taps=("pool4",), depth=2)
    r0, rk = refine(x)
    assert rk.shape == r0.shape
    assert float(jnp.abs(rk - r0).max()) > 1e-6


def test_quarter_search_rows_match_engine():
    from iterative_inference_segm_tpu.ops.metrics import confusion_matrix, metrics_from_confusion

    fcn = init_fcn8(jax.random.PRNGKey(0), n_classes=C, fc_channels=16)
    dae = _dae_q()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 48, 64, 3))
    labels = jax.random.randint(jax.random.PRNGKey(5), (2, 48, 64), 0, C)
    res = grid_search_eps_k_half(
        fcn8_apply, fcn, dae, [(np.asarray(x), np.asarray(labels))],
        n_classes=C, eps_grid=[0.3], k_max=1, h_taps=("pool4",), depth=2,
    )
    for k in range(2):
        refine = make_half_refiner(fcn8_apply, fcn, dae, eps=0.3, num_steps=k,
                                   h_taps=("pool4",), depth=2)
        _, yk = refine(x)
        cm = confusion_matrix(jnp.argmax(yk, -1), labels, n_classes=C)
        miou = float(metrics_from_confusion(cm).mean_iou)
        np.testing.assert_allclose(res["miou"][0, k], miou, atol=1e-6)


def test_quarter_divisibility_error():
    dae = _dae_q()
    y0 = jnp.zeros((1, 46, 64, C))  # 46 % 4 != 0
    with pytest.raises(ValueError, match="divisible by 4"):
        halfres_refinement_scan(dae, lambda t: t, y0, eps=0.1, num_steps=1)
