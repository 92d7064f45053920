"""Grad-CAM explainability (irp_tpu/explain.py, run_predict.py --gradcam).

The reference has no explainability (its closest artifact is the
correct/incorrect galleries, reference functions/final.py:27-152).
These tests lock the net-new contract: the head-split equivalence the
VJP relies on, gradient correctness against finite differences, CAM
shape/range/normalization, class-conditionality, padding-batch
invariance, and the CLI overlay path end-to-end.

The fixture model uses image_size=64 (spatial map 2x2 — 32 would
collapse it to 1x1) and a POSITIVE-weight head: backbone activations
are post-ReLU (>= 0), so positive head weights guarantee positive
channel importances and a provably nonzero CAM — random-signed heads
can legitimately produce the all-zero map (uniformly negative pre-ReLU)
which would make these assertions vacuous.
"""

import os

import jax
import numpy as np
import pytest

from irp_tpu.config import ModelConfig
from irp_tpu.models.classifier import init_classifier

TINY = ModelConfig(depth=18, num_classes=3, image_size=64, hidden_dim=16,
                   compute_dtype="float32")


@pytest.fixture(scope="module")
def predictor():
    import jax.numpy as jnp

    from irp_tpu.infer import make_predictor

    _, variables = init_classifier(TINY, jax.random.PRNGKey(0),
                                   image_size=64)
    variables = jax.tree_util.tree_map(lambda x: x, dict(variables))
    params = variables["params"]
    rng = np.random.default_rng(1)
    for name in ("head_dense1", "head_dense2"):
        k = np.asarray(params[name]["kernel"])
        params[name]["kernel"] = jnp.asarray(
            np.abs(rng.normal(size=k.shape)).astype(k.dtype) * 0.1)
        params[name]["bias"] = jnp.zeros_like(params[name]["bias"])
    return make_predictor(variables, cfg=TINY, batch_size=4,
                          class_names=["cat", "dog", "fox"])


@pytest.fixture(scope="module")
def images80():
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, (5, 80, 80, 3), dtype=np.uint8)


def test_head_split_matches_full_forward(predictor, images80):
    """head(spatial.mean) must equal __call__ logits at eval — the
    equivalence the CAM's VJP differentiates through."""
    import jax.numpy as jnp

    from irp_tpu.ops.preprocess import eval_preprocess_batch

    p = predictor
    variables = {"params": p.params, "batch_stats": p.batch_stats}
    x = eval_preprocess_batch(images80, 64, jnp.float32)
    full = p.model.apply(variables, x, train=False)
    spatial = p.model.apply(variables, x, method="spatial_features")
    split = p.model.apply(variables,
                          spatial.astype(jnp.float32).mean(axis=(1, 2)),
                          method="head")
    np.testing.assert_allclose(np.asarray(split), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_vjp_matches_finite_differences(predictor, images80):
    """The d(logit)/d(spatial) gradient under the CAM is the true one."""
    import jax.numpy as jnp

    from irp_tpu.ops.preprocess import eval_preprocess_batch

    p = predictor
    variables = {"params": p.params, "batch_stats": p.batch_stats}
    x = eval_preprocess_batch(images80[:1], 64, jnp.float32)
    spatial = np.asarray(
        p.model.apply(variables, x, method="spatial_features"), np.float64)

    def logit0(sp):
        out = p.model.apply(variables,
                            jnp.asarray(sp, jnp.float32).mean(axis=(1, 2)),
                            method="head")
        return float(np.asarray(out)[0, 0])

    grad = np.asarray(jax.grad(lambda sp: p.model.apply(
        variables, sp.mean(axis=(1, 2)), method="head")[0, 0])(
        jnp.asarray(spatial, jnp.float32)))
    eps = 1e-3
    rng = np.random.default_rng(0)
    for _ in range(4):
        idx = tuple(rng.integers(0, s) for s in spatial.shape)
        bumped = spatial.copy()
        bumped[idx] += eps
        fd = (logit0(bumped) - logit0(spatial)) / eps
        assert abs(fd - grad[idx]) < 5e-3, (idx, fd, grad[idx])


def test_cam_shape_range_and_padding_invariance(predictor, images80):
    from irp_tpu.explain import GradCAM

    g = GradCAM(predictor)
    cams, logits = g.explain(images80)          # 5 imgs, batch 4 -> pad
    assert cams.shape == (5, 64, 64) and logits.shape == (5, 3)
    assert cams.dtype == np.float32
    assert (cams >= 0).all() and (cams <= 1).all()
    # positive-weight head => nonzero map => exact min-max normalization
    np.testing.assert_allclose(cams.max(axis=(1, 2)), 1.0, atol=1e-5)
    np.testing.assert_allclose(cams.min(axis=(1, 2)), 0.0, atol=1e-5)
    # logits agree with the serving forward
    probs = predictor.predict_probs(images80)
    np.testing.assert_allclose(
        np.exp(logits) / np.exp(logits).sum(1, keepdims=True), probs,
        rtol=1e-4, atol=1e-5)
    # tail padding must not change full-batch results
    cams4, _ = g.explain(images80[:4])
    np.testing.assert_allclose(cams4, cams[:4], rtol=1e-5, atol=1e-6)
    # a smaller dedicated batch shape (the serving daemon's mode)
    # produces identical maps
    small = GradCAM(predictor, batch_size=2)
    cams_s, logits_s = small.explain(images80)
    np.testing.assert_allclose(cams_s, cams, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(logits_s, logits, rtol=1e-5, atol=1e-5)
    with pytest.raises(ValueError, match="batch_size"):
        GradCAM(predictor, batch_size=0)


def test_cam_is_class_conditional(predictor, images80):
    """Different target classes give different maps (the 'discriminative'
    in class-discriminative localization)."""
    from irp_tpu.explain import GradCAM

    g = GradCAM(predictor)
    cams0, _ = g.explain(images80[:2], class_idx=np.array([0, 0]))
    cams1, _ = g.explain(images80[:2], class_idx=np.array([1, 1]))
    assert np.abs(cams0 - cams1).max() > 1e-3
    # scalar class broadcast + argmax default both accepted
    cams_s, _ = g.explain(images80[:2], class_idx=0)
    np.testing.assert_allclose(cams_s, cams0, rtol=1e-5, atol=1e-6)
    cams_am, logits = g.explain(images80[:2])
    picked, _ = g.explain(images80[:2],
                          class_idx=np.argmax(logits, axis=1))
    np.testing.assert_allclose(cams_am, picked, rtol=1e-5, atol=1e-6)


def test_cam_all_negative_map_is_zero(predictor, images80):
    """A uniformly non-positive pre-ReLU map yields the all-zero CAM
    (not NaNs from the 0/0 normalization)."""
    import jax.numpy as jnp

    from irp_tpu.infer import make_predictor
    from irp_tpu.explain import GradCAM

    p = predictor
    params = jax.tree_util.tree_map(lambda x: x, dict(p.params))
    # negate the final layer: all channel importances flip negative
    params["head_dense2"]["kernel"] = -jnp.asarray(
        params["head_dense2"]["kernel"])
    neg = make_predictor({"params": params, "batch_stats": p.batch_stats},
                         cfg=TINY, batch_size=4)
    cams, _ = GradCAM(neg).explain(images80[:2], class_idx=np.array([0, 0]))
    assert np.isfinite(cams).all()
    np.testing.assert_allclose(cams, 0.0, atol=1e-6)


def test_cam_validates_input(predictor):
    from irp_tpu.explain import GradCAM

    g = GradCAM(predictor)
    with pytest.raises(ValueError, match="eval crop"):
        g.explain(np.zeros((1, 16, 16, 3), np.uint8))
    with pytest.raises(ValueError, match="class_idx"):
        g.explain(np.zeros((2, 80, 80, 3), np.uint8),
                  class_idx=np.array([0]))
    with pytest.raises(ValueError, match="class_idx"):
        g.explain(np.zeros((1, 80, 80, 3), np.uint8),
                  class_idx=np.array([7]))
    cams, logits = g.explain(np.zeros((0, 80, 80, 3), np.uint8))
    assert cams.shape == (0, 64, 64) and logits.shape == (0, 3)


def test_overlay_and_crop_helpers(images80):
    from irp_tpu.explain import center_crop_u8, overlay_cam

    cropped = center_crop_u8(images80, 64)
    assert cropped.shape == (5, 64, 64, 3)
    # offsets match ops/preprocess.center_crop: (80-64)//2 = 8
    np.testing.assert_array_equal(cropped[0], images80[0, 8:72, 8:72])
    cam = np.zeros((64, 64), np.float32)
    cam[8:16, 8:16] = 1.0
    out = overlay_cam(cropped[0], cam)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    # heatmap resize path: a differently-sized cam still overlays
    out2 = overlay_cam(cropped[0], np.ones((7, 7), np.float32) * 0.5)
    assert out2.shape == (64, 64, 3)


def test_run_predict_gradcam_cli(tmp_path, predictor):
    from PIL import Image

    from irp_tpu.train.checkpoint import save_weights_npz

    import run_predict

    weights = tmp_path / "w.npz"
    save_weights_npz(str(weights), predictor.params, predictor.batch_stats,
                     meta={"image_size": 64})
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (96, 96, 3),
                                     dtype=np.uint8)).save(
            img_dir / f"im{i}.jpg")
    cam_dir = tmp_path / "cams"
    rc = run_predict.main([
        "--weights", str(weights), "--images", str(img_dir),
        "--classes", "cat,dog,fox", "--cpu",
        "--gradcam", str(cam_dir),
        "--out", str(tmp_path / "preds.csv")])
    assert rc == 0
    pngs = sorted(os.listdir(cam_dir))
    assert len(pngs) == 3 and all(p.endswith("_gradcam.png") for p in pngs)
    arr = np.asarray(Image.open(cam_dir / pngs[0]))
    assert arr.shape == (64, 64, 3)
    # --gradcam with --shards is rejected
    rc = run_predict.main(["--weights", str(weights), "--shards", "x*.tar",
                           "--cpu", "--gradcam", str(cam_dir)])
    assert rc == 2


def test_run_predict_gradcam_tta_scores_match_tta_contract(tmp_path,
                                                           predictor):
    """--tta --gradcam must report the SAME scores as --tta alone: the
    CSV comes from the flip-averaged forward, not the explain program's
    single-view logits, and the overlay is pinned to that reported
    class."""
    import csv as csvmod

    from PIL import Image

    from irp_tpu.train.checkpoint import save_weights_npz

    import run_predict

    weights = tmp_path / "w.npz"
    save_weights_npz(str(weights), predictor.params, predictor.batch_stats,
                     meta={"image_size": 64})
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(11)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (96, 96, 3),
                                     dtype=np.uint8)).save(
            img_dir / f"im{i}.jpg")
    out_plain = tmp_path / "tta.csv"
    rc = run_predict.main([
        "--weights", str(weights), "--images", str(img_dir),
        "--classes", "cat,dog,fox", "--cpu", "--tta",
        "--out", str(out_plain)])
    assert rc == 0
    out_cam = tmp_path / "tta_cam.csv"
    rc = run_predict.main([
        "--weights", str(weights), "--images", str(img_dir),
        "--classes", "cat,dog,fox", "--cpu", "--tta",
        "--gradcam", str(tmp_path / "cams"),
        "--out", str(out_cam)])
    assert rc == 0
    rows_plain = list(csvmod.DictReader(open(out_plain)))
    rows_cam = list(csvmod.DictReader(open(out_cam)))
    assert rows_plain == rows_cam  # identical labels AND probabilities
