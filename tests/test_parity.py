"""Quality-parity harness tests (facegen/eval/parity.py).

Statistics are validated against closed forms; the report is exercised
end-to-end on tiny fresh-initialized GANs (no training needed — the
harness measures whatever checkpoints it is given).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facegen.eval.parity import (
    d_penultimate_features,
    frechet_distance,
    ks_2samp,
    min_nn_distances,
    parity_report,
    self_report,
    spearman,
)
from facegen.models import gan


def test_spearman_perfect_and_inverted():
    x = np.asarray([1.0, 3.0, 2.0, 5.0, 4.0])
    assert spearman(x, x * 2.0 + 1.0) == pytest.approx(1.0)
    assert spearman(x, -x) == pytest.approx(-1.0)
    # monotone transform invariance
    assert spearman(x, np.exp(x)) == pytest.approx(1.0)


def test_ks_same_vs_shifted():
    rng = np.random.default_rng(0)
    a = rng.normal(size=800)
    stat_same, p_same = ks_2samp(a, rng.normal(size=800))
    stat_diff, p_diff = ks_2samp(a, rng.normal(3.0, 1.0, size=800))
    assert stat_same < 0.1 and p_same > 0.05
    assert stat_diff > 0.8 and p_diff < 1e-10


def test_frechet_identical_is_zero_and_shift_is_mu_sq():
    rng = np.random.default_rng(1)
    f = rng.normal(size=(500, 8))
    assert frechet_distance(f, f) == pytest.approx(0.0, abs=1e-6)
    # pure mean shift of delta on every dim adds ~8 * delta^2
    shifted = f + 0.5
    d = frechet_distance(f, shifted)
    assert d == pytest.approx(8 * 0.25, rel=0.05)


def _frechet_exact(a, b, eps=1e-6):
    """The dense dim^3 reference formula (the slow path in
    frechet_distance), for validating the rank-deficient Gram fast path."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mu_a, mu_b = a.mean(0), b.mean(0)
    ca = np.cov(a, rowvar=False) + eps * np.eye(a.shape[1])
    cb = np.cov(b, rowvar=False) + eps * np.eye(b.shape[1])
    diff = mu_a - mu_b
    wa, va = np.linalg.eigh(ca)
    sa = (va * np.sqrt(np.clip(wa, 0, None))) @ va.T
    wm = np.clip(np.linalg.eigvalsh(sa @ cb @ sa), 0.0, None)
    return float(diff @ diff + np.trace(ca) + np.trace(cb)
                 - 2.0 * np.sqrt(wm).sum())


def test_frechet_gram_fast_path_matches_exact():
    # n < dim triggers the Gram fast path; it must agree with the dense
    # eigendecomposition formula (up to the eps*I ridge the fast path
    # legitimately drops)
    rng = np.random.default_rng(2)
    dim = 100
    a = rng.normal(size=(60, dim))
    b = 0.8 * rng.normal(size=(80, dim)) + 0.3
    d_fast = frechet_distance(a, b)
    # exact (up to eigh roundoff) against the eps=0 dense formula — the
    # fast path computes the same quantity without the ridge
    assert d_fast == pytest.approx(_frechet_exact(a, b, eps=0.0), rel=1e-6)
    # the ridge the fast path drops perturbs the dense path only at the
    # ~dim*sqrt(eps) scale (≈0.1% here)
    assert d_fast == pytest.approx(_frechet_exact(a, b), rel=2e-3)
    # mixed case: one side bigger than dim (the vs-real pairs)
    big = rng.normal(size=(300, dim)) * 1.1
    assert frechet_distance(a, big) == pytest.approx(
        _frechet_exact(a, big, eps=0.0), rel=1e-6)
    # symmetry of the fast path
    assert frechet_distance(b, a) == pytest.approx(d_fast, rel=1e-9)


def test_min_nn_distances_exact_tiny():
    train = np.zeros((4, 2, 2, 1), np.float32)
    train[1] += 1.0
    q = np.full((1, 2, 2, 1), 0.25, np.float32)
    d = min_nn_distances(q, train)
    # closest is the all-zeros image: sqrt(4 * 0.25^2) = 0.5
    assert d[0] == pytest.approx(0.5, abs=1e-4)


def test_d_features_shape_and_determinism():
    g, d, b = gan.init_gan(jax.random.key(0), 16, 1, 16,
                           reference_init=False)
    imgs = np.asarray(
        jax.random.uniform(jax.random.key(1), (5, 16, 16, 1)))
    f1 = d_penultimate_features(d, b, imgs, batch=4)
    f2 = d_penultimate_features(d, b, imgs, batch=8)
    assert f1.shape[0] == 5 and f1.ndim == 2
    # batching / padding must not change values
    np.testing.assert_allclose(f1, f2, rtol=1e-5, atol=1e-5)


def test_parity_report_end_to_end_and_self_consistency():
    key = jax.random.key(0)
    g_a, d_a, b_a = gan.init_gan(jax.random.key(1), 16, 1, 16,
                                 reference_init=False)
    g_b, d_b, b_b = gan.init_gan(jax.random.key(2), 16, 1, 16,
                                 reference_init=False)
    train = np.asarray(
        jax.random.uniform(jax.random.key(3), (64, 16, 16, 1)))

    rep = parity_report(g_a, d_a, b_a, g_b, d_b, b_b, train,
                        n_samples=32, noise_dim_a=16, noise_dim_b=16,
                        key=key, compute_dtype="float32")
    assert set(rep) >= {"rank_correlation", "nn_distance",
                        "frechet_d_features", "parity"}
    assert -1.0 <= rep["rank_correlation"]["spearman_rho"] <= 1.0
    assert 0.0 <= rep["nn_distance"]["ks_stat"] <= 1.0

    # a checkpoint is parity with itself: rho == 1 (same D on the same
    # pool), and NN-distance draws from the identical distribution
    rep_aa = parity_report(g_a, d_a, b_a, g_a, d_a, b_a, train,
                           n_samples=32, noise_dim_a=16, noise_dim_b=16,
                           key=key, compute_dtype="float32")
    assert rep_aa["rank_correlation"]["spearman_rho"] == pytest.approx(1.0)
    assert rep_aa["parity"]["nn_parity"]


def test_slice_grid_roundtrip_and_order():
    from facegen.eval.refgrid import slice_grid

    # build a 2x3 grid of 4px tiles with distinct constant values in [0,1]
    vals = np.arange(6, dtype=np.float32) / 10.0
    tiles = np.broadcast_to(vals.reshape(6, 1, 1, 1), (6, 4, 4, 3))
    grid = tiles.reshape(2, 3, 4, 4, 3).transpose(0, 2, 1, 3, 4)
    grid = grid.reshape(8, 12, 3)
    out = slice_grid(grid, tile=4)
    assert out.shape == (6, 4, 4, 3)
    # row-major order preserved
    np.testing.assert_allclose(out[:, 0, 0, 0], vals)
    # uint8 input rescales to [0,1]
    out8 = slice_grid((grid * 400).astype(np.uint8), tile=4)
    assert out8.max() <= 1.0
    with pytest.raises(ValueError):
        slice_grid(grid, tile=5)


def test_train_set_nn_calibration_closed_form():
    from facegen.eval.parity import train_set_nn_calibration

    # constant images with pixel values 0, .1, .5, 1 at 2x2x1: the L2
    # distance between constants a,b is 2|a-b|, so the leave-one-out
    # nearest-other distances are exactly [.2, .2, .8, 1.0]
    vals = np.asarray([0.0, 0.1, 0.5, 1.0], np.float32)
    train = np.broadcast_to(vals.reshape(4, 1, 1, 1), (4, 2, 2, 1))
    cal = train_set_nn_calibration(train)
    assert cal["nn_leave_one_out"]["mean"] == pytest.approx(0.55, abs=1e-4)
    # half-vs-half pairs 2 images against the other 2: every value is a
    # real cross-pair distance, bounded by the extreme pair (2.0)
    hvh = cal["nn_half_vs_half"]
    assert 0.0 < hvh["p10"] <= hvh["mean"] <= hvh["p90"] <= 2.0


def test_sample_report_against_raw_population():
    from facegen.eval.parity import sample_report

    g, d, b = gan.init_gan(jax.random.key(0), 16, 1, 16,
                           reference_init=False)
    train = np.asarray(
        jax.random.uniform(jax.random.key(3), (48, 16, 16, 1)))
    raw = np.asarray(jax.random.uniform(jax.random.key(4), (32, 16, 16, 1)))
    rep = sample_report(g, d, b, raw, train, n_samples=24, noise_dim=16,
                        compute_dtype="float32")
    assert rep["n_samples"] == {"ours": 24, "reference": 32}
    assert 0.0 <= rep["d_score"]["ks_stat"] <= 1.0
    assert np.isfinite(rep["frechet_d_features"]["ours_vs_reference"])
    assert "nn_distance" in rep and "ours_vs_real" in rep["frechet_d_features"]
    # checkpoint-independent pixel-space Fréchet rides along
    assert set(rep["frechet_pixels"]) == {"ours_vs_reference",
                                          "ours_vs_real",
                                          "reference_vs_real"}
    assert all(np.isfinite(v) for v in rep["frechet_pixels"].values())
    # the train set's own NN spacing rides along as the yardstick
    assert rep["calibration"]["nn_leave_one_out"]["mean"] > 0.0
    # without a train set the train-relative stats are omitted
    rep2 = sample_report(g, d, b, raw, None, n_samples=8, noise_dim=16,
                         compute_dtype="float32")
    assert "nn_distance" not in rep2
    assert list(rep2["frechet_d_features"]) == ["ours_vs_reference"]


def test_self_report_fields():
    g, d, b = gan.init_gan(jax.random.key(0), 16, 1, 16,
                           reference_init=False)
    train = np.asarray(
        jax.random.uniform(jax.random.key(3), (48, 16, 16, 1)))
    rep = self_report(g, d, b, train, n_samples=16, noise_dim=16,
                      compute_dtype="float32")
    assert rep["nn_distance"]["mean"] > 0
    assert np.isfinite(rep["frechet_vs_real"])


def test_cli_cross_scale_samples_b(tmp_path):
    """The CLI compares a 16px checkpoint against a 32px-tile published
    grid by downscaling the sliced population to the checkpoint's scale
    (the load-time bilinear route every training image takes,
    dataset.lua:90-95)."""
    import json

    from PIL import Image

    from facegen.config import TrainConfig
    from facegen.eval import parity
    from facegen.train.loop import Trainer

    cfg = TrainConfig(
        batch_size=8, scale=16, grayscale=True, noise_dim=16,
        n_epoch=8, compute_dtype="float32", reference_init=False,
        synthetic_data=True, save=str(tmp_path / "logs"), noplot=True,
    ).validate()
    Trainer(cfg, verbose=False).save()

    # a 2x2 grid of 32px tiles (the published-artifact layout)
    rng = np.random.default_rng(0)
    grid = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    grid_path = tmp_path / "grid.png"
    Image.fromarray(grid).save(grid_path)

    out = tmp_path / "report.json"
    parity.main([
        "--network_a", str(tmp_path / "logs" / "adversarial"),
        "--samples_b", str(grid_path), "--tile", "32",
        "--synthetic", "--n", "6", "--n_train", "12",
        "--out", str(out),
    ])
    rep = json.loads(out.read_text())
    assert rep["n_samples"] == {"ours": 6, "reference": 4}
    assert np.isfinite(rep["frechet_pixels"]["ours_vs_reference"])
    assert "nn_distance" in rep
