"""Fine calibration with backscattering estimation, end to end.

Script version of the reference's fine-calibration workflow
(examples/Fine_Calibration_with_Backscattering.ipynb) on mock DE-16-style
data:

 1. per-pixel dark median + std (device-batched)
 2. DE-16 common-mode correction
 3. global threshold from a Gaussian fit of the intensity histogram
 4. dose rate from connected-component event counts
 5. per-pixel gain thresholds from top-k order statistics
 6. backscattering parameter estimation: simulate primary+backscattered
    events, compare nearest-neighbor distance distributions (KS test,
    device-batched NN distances), Fisher-combined over repeats

Run: python examples/fine_calibration.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from pyrecode_tpu.utils.backscatter import (nn_distances_batch,
                                            simulate_events,
                                            sweep_backscatter_params)
from pyrecode_tpu.utils.calibration import (accurate_pixel_thresholds,
                                            count_events, fit_global_sigma,
                                            pixel_median_std)
from pyrecode_tpu.utils.converters import apply_DE16_common_mode_correction


def main():
    rng = np.random.default_rng(7)
    H = W = 256
    n_dark, n_flat = 64, 64

    # mock detector data: dark noise + sparse electron puddles in the flats
    dark = rng.normal(100, 3, (n_dark, H, W)).astype(np.float32)
    flats = rng.normal(100, 3, (n_flat, H, W)).astype(np.float32)
    n_events_true = 60
    for f in flats:
        ev = rng.integers(1, H - 1, (n_events_true, 2))
        f[ev[:, 0], ev[:, 1]] += rng.uniform(60, 120, n_events_true)
        f[ev[:, 0] + 1, ev[:, 1]] += rng.uniform(10, 40, n_events_true)

    # 1. dark statistics (device)
    med, std = pixel_median_std(dark)
    print(f"dark median mean={med.mean():.2f} std mean={std.mean():.2f}")

    # 2. common-mode correction (DE-16 column blocks)
    corrected = np.stack([
        apply_DE16_common_mode_correction(f - med) for f in flats])
    print(f"common-mode corrected: residual row mean "
          f"{np.abs(corrected.mean(axis=(0, 2))).mean():.3f}")

    # 3. global threshold: Gaussian sigma of the noise histogram
    sigma = fit_global_sigma(flats, med, n_stats_frames=16)
    thr4 = 4.0 * sigma
    print(f"global sigma={sigma:.2f} -> 4-sigma threshold {thr4:.1f}")

    # 4. dose rate via connected components above the threshold
    counts = [count_events(corrected[i], np.full((H, W), thr4))[0]
              for i in range(8)]
    dose = np.mean(counts) / (H * W)
    print(f"events/frame ~ {np.mean(counts):.1f} "
          f"(true {n_events_true}) -> dose {dose:.2e} e/px/frame")

    # 5. per-pixel gain thresholds from top-k order statistics
    k = max(int(round(dose * n_flat)), 1)
    acc = accurate_pixel_thresholds(corrected, np.full((H, W), thr4,
                                                       np.float32), k)
    print(f"per-pixel thresholds: median {np.median(acc):.1f} (k={k})")

    # 6. backscattering estimation on observed event coordinates
    true_ratio, true_scale = 6.0, 2.5
    observed = simulate_events([120] * 40, true_ratio, true_scale, (H, W),
                               rng=rng)
    obs_nn = nn_distances_batch(observed)
    print(f"observed NN distances: n={obs_nn.size} "
          f"median={np.median(obs_nn):.2f}")
    res = sweep_backscatter_params(
        observed, ratios=[2.0, 6.0, 18.0], scales=[1.0, 2.5, 6.0],
        shape=(H, W), n_sims=5, rng=np.random.default_rng(11))
    print(f"best (ratio, scale) = {res['best']} "
          f"(true ({true_ratio}, {true_scale}))")
    print("mean KS D grid:")
    print(np.array_str(res["D"], precision=3))


if __name__ == "__main__":
    main()
