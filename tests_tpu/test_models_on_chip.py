"""On-hardware numeric gate for the serving MODELS (round 5).

The raster gate (test_raster_on_chip.py) covers the Mosaic kernels;
this covers the plain-XLA model path: the same BFMNet / PixRefer G /
mel-frontend forwards, from the same serialized parameters and inputs,
computed on XLA:CPU (subprocess) and on the real TPU, must agree within
calibrated precision bands.  Catches XLA:TPU lowering/layout regressions
in the models that no interpret-mode or CPU-mesh test can see.

Tolerances: the TPU's default matmul precision runs bf16 passes with
f32 accumulation, so conv/GRU stacks drift at the 1e-3-level by design;
the frontend runs precision=HIGHEST but log-mel amplifies f32 FFT
roundoff without bound on silent bins, so mel gates only audible bins.
Measured on a healthy chip (2026-08, v5e via axon): coeff MAE 2.4e-4 /
max 9.9e-4, gan_out MAE 2.8e-4 / max 3.0e-3, mel (audible-bin-masked)
MAE 1.9e-5 / max 1.1e-4 — bounds ~10-30x those.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_GEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "_gen_model_goldens.py")

# (golden key, MAE bound, max-abs bound); scales: coeff ~O(1) exp
# coefficients, gan_* tanh/sigmoid in [-1,1], mel log-mel ~O(1..10)
_BOUNDS = {
    "coeff": (3e-3, 3e-2),
    "gan_out": (6e-3, 8e-2),
    "gan_alpha": (6e-3, 8e-2),
    "gan_fg": (6e-3, 8e-2),
    # masked to audible bins (golden > -6); the log slope at the mask
    # edge (linear ~2.5e-3) turns the ~1e-5-absolute f32 FFT roundoff
    # into ~4e-3 of log-mel, so the max bound sits above that
    "mel": (1e-3, 2e-2),
}


@pytest.mark.slow  # ~5-20 min: golden subprocess + tunnel admission;
# the <2 min default tier (pytest tests_tpu/ -m "not slow") stays the
# raster parity gate
def test_model_forwards_match_cpu_on_chip(tmp_path):
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip(f"needs a real TPU (backend: {jax.default_backend()})")

    golden_path = tmp_path / "model_goldens.npz"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, _GEN, str(golden_path)], check=True,
                   env=env, cwd=os.path.dirname(_GEN))
    golden = np.load(golden_path)

    import _model_cases as cases
    params = {"bfmnet": golden["bfmnet_params"].tobytes(),
              "pixrefer": golden["pixrefer_params"].tobytes()}
    got = cases.compute_outputs(params)

    failures = {}
    for key, (mae_bound, max_bound) in _BOUNDS.items():
        want = golden[key]
        have = got[key]
        assert have.shape == want.shape, (key, have.shape, want.shape)
        assert np.isfinite(have).all(), f"{key}: non-finite on TPU"
        diff = np.abs(have.astype(np.float64) - want.astype(np.float64))
        if key == "mel":
            # log-mel is unbounded on sub-noise-floor bins under f32 FFT
            # roundoff (PARITY.md); gate only bins with real energy
            mask = want > -6.0
            assert mask.mean() > 0.5, "golden mel mostly silent"
            diff = diff[mask]
        mae, mx = float(diff.mean()), float(diff.max())
        if mae > mae_bound or mx > max_bound:
            failures[key] = f"MAE {mae:.2e} (bound {mae_bound:.0e}), " \
                            f"max {mx:.2e} (bound {max_bound:.0e})"
        print(f"{key}: MAE {mae:.2e}  max {mx:.2e}")
    assert not failures, failures
