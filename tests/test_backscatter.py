"""Backscattering estimation (utils/backscatter.py) — mirrors the analysis
of the reference's fine-calibration notebook
(examples/Fine_Calibration_with_Backscattering.ipynb)."""

import numpy as np

from pyrecode_tpu.utils import backscatter as bs


def test_nn_distances_matches_bruteforce_and_batch():
    rng = np.random.default_rng(0)
    frames = [rng.uniform(0, 100, (n, 2)) for n in (5, 2, 17, 1, 0, 30)]
    ref = np.concatenate([bs.nn_distances(c) for c in frames if len(c) >= 2])
    got = bs.nn_distances_batch(frames)
    assert got.shape == ref.shape
    assert np.allclose(np.sort(got), np.sort(ref), rtol=1e-5)


def test_simulate_events_ratio_and_bounds():
    rng = np.random.default_rng(1)
    frames = bs.simulate_events([100] * 4, ratio=9.0, scale=2.0,
                                shape=(64, 64), rng=rng)
    for c in frames:
        assert c.shape == (100, 2)
        assert (c[:, 0] >= 0).all() and (c[:, 0] < 64).all()
        assert (c[:, 1] >= 0).all() and (c[:, 1] < 64).all()


def test_ks_statistic_sane():
    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, 2000)
    d_same, p_same = bs.ks_statistic(a, rng.normal(0, 1, 2000))
    d_diff, p_diff = bs.ks_statistic(a, rng.normal(3, 1, 2000))
    assert d_same < 0.08 and p_same > 0.01
    assert d_diff > 0.8 and p_diff < 1e-10


def test_fisher_combined_orders_evidence():
    strong = bs.fisher_combined([1e-4] * 5)
    weak = bs.fisher_combined([0.5] * 5)
    assert strong < 1e-6 < weak


def test_sweep_recovers_simulation_parameters():
    """Observed data generated at (ratio=4, scale=2) must score a smaller
    mean KS D near the true parameters than far away."""
    rng = np.random.default_rng(3)
    observed = bs.simulate_events([150] * 20, ratio=4.0, scale=2.0,
                                  shape=(256, 256), rng=rng)
    res = bs.sweep_backscatter_params(
        observed, ratios=[1.0, 4.0, 40.0], scales=[2.0], shape=(256, 256),
        n_sims=6, rng=np.random.default_rng(4))
    D = res["D"][:, 0]
    assert D[1] < D[0] and D[1] < D[2], D
    assert res["best"][0] == 4.0
    assert res["q"].shape == (3, 1)
