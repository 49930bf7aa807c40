"""Golden-side of the on-chip model gate: run the shared forward cases
on CPU (float64-free, but XLA:CPU f32 — the numerics the interpret-mode
suite already certifies) and save params + outputs.

Invoked by tests_tpu/test_models_on_chip.py in a subprocess with
JAX_PLATFORMS=cpu; runnable by hand:

    JAX_PLATFORMS=cpu python tests_tpu/_gen_model_goldens.py out.npz
"""

import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))  # repo root: voicepuppet_tpu


def main(path: str):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import _model_cases as cases

    params = cases.init_params()
    outs = cases.compute_outputs(params)
    np.savez(path,
             bfmnet_params=np.frombuffer(params["bfmnet"], np.uint8),
             pixrefer_params=np.frombuffer(params["pixrefer"], np.uint8),
             **outs)
    print("goldens written:", path, {k: v.shape for k, v in outs.items()})


if __name__ == "__main__":
    main(sys.argv[1])
