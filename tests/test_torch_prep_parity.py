"""Released-checkpoint compatibility for the torch prep models, certified
against the LITERAL reference module as the naming oracle.

The reference loads its released prep checkpoints by exact state_dict key
(`state['state_dict']` strictly into UnetMobilenetV2,
make_data_from_GRID.py:505-507; the whole pickled DataParallel(DIMModel)
out of BEST_checkpoint.tar, :510-513).  These tests import
/root/reference/datasets/models.py itself (torchvision stubbed — it is
absent from this image and unused when pretrained/pretrain=False),
fabricate checkpoints with the reference's ACTUAL key names and module
pickles, and assert that:

* every reference parameter loads into our modules (100% key+shape match),
* forward outputs agree value-for-value once weights are shared (graph
  identity, not just naming),
* a scrambled checkpoint still fails loudly.

Slow tier: builds full-size MobileNetV2/DIM modules on one CPU core.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_PATH = "/root/reference/datasets/models.py"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.exists(REF_PATH),
                       reason="reference mount not available"),
]


@pytest.fixture(scope="module")
def torch():
    import torch
    return torch


@pytest.fixture(scope="module")
def ref(torch):
    """Import the reference models module under an ephemeral name.

    torchvision is stubbed (only touched by UnetResNet's constructor and
    DIMModel(pretrain=True), neither exercised here).  The module is
    registered in sys.modules so torch.save can pickle its classes, and
    REMOVED again by the fixture finalizer — the DIM tar-unpickling test
    relies on the classes being unimportable at load time, exactly like
    the real release whose training package we don't have."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.SimpleNamespace()
        sys.modules["torchvision"] = tv
    spec = importlib.util.spec_from_file_location("_vp_ref_prep_models",
                                                  REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.modules["_vp_ref_prep_models"] = mod
    yield mod
    sys.modules.pop("_vp_ref_prep_models", None)


def _assert_full_match(torch, ours, theirs_sd):
    own = ours.state_dict()
    theirs = {k: v for k, v in theirs_sd.items()}
    assert set(own) == set(theirs), (
        sorted(set(own) ^ set(theirs))[:10])
    for k in own:
        assert tuple(own[k].shape) == tuple(theirs[k].shape), k


def test_unet_mobilenet_release_layout_loads_exactly(ref, torch, tmp_path):
    """mobilenetV2_model_checkpoint_metric.pth layout: {'state_dict': ...}
    with the reference's key names loads 100% and reproduces the
    reference forward value-for-value."""
    from voicepuppet_tpu.tools.models_torch import UnetMobilenetV2

    torch.manual_seed(0)
    rm = ref.UnetMobilenetV2(pretrained=False).eval()
    path = str(tmp_path / "mobilenetV2_model_checkpoint_metric.pth")
    torch.save({"state_dict": rm.state_dict(), "epoch": 7,
                "best_metric": 0.5}, path)

    ours = UnetMobilenetV2().eval()
    _assert_full_match(torch, ours, rm.state_dict())
    n = ours.load_state(path)
    assert n == len(ours.state_dict())

    x = torch.rand(1, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = rm(x)
        got = ours(x)
    assert tuple(got.shape) == tuple(want.shape) == (1, 1, 32, 32)
    np.testing.assert_allclose(got.numpy(), want.numpy(),
                               rtol=0, atol=1e-6)


def test_unet_mobilenet_scrambled_keys_fail_loudly(ref, torch, tmp_path):
    torch.manual_seed(0)
    rm = ref.UnetMobilenetV2(pretrained=False)
    sd = {f"mangled.{k}": v for k, v in rm.state_dict().items()}
    path = str(tmp_path / "scrambled.pth")
    torch.save({"state_dict": sd}, path)
    from voicepuppet_tpu.tools.models_torch import UnetMobilenetV2
    with pytest.raises(ValueError, match="remapping"):
        UnetMobilenetV2().load_state(path)


def test_dim_release_tar_loads_without_training_package(ref, torch,
                                                        tmp_path):
    """BEST_checkpoint.tar layout: {'model': DataParallel(DIMModel)} — a
    full-module pickle.  Saved with the reference classes importable,
    loaded AFTER they are gone from sys.modules: the skeleton unpickler
    must reconstruct the state_dict and our DIMMatting must consume it
    key-for-key, then match the reference forward."""
    from voicepuppet_tpu.tools.models_torch import DIMMatting

    torch.manual_seed(0)
    rm = ref.DIMModel(pretrain=False).eval()
    path = str(tmp_path / "BEST_checkpoint.tar")
    torch.save({"model": torch.nn.DataParallel(rm), "epoch": 3}, path)

    # make the pickled classes unimportable, as in production
    saved = sys.modules.pop("_vp_ref_prep_models")
    try:
        ours = DIMMatting().eval()
        _assert_full_match(torch, ours, rm.state_dict())
        n = ours.load_state(path)
        assert n == len(ours.state_dict())
    finally:
        sys.modules["_vp_ref_prep_models"] = saved

    x = torch.rand(1, 4, 32, 32, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        want = rm(x)
        got = ours(x)
    assert tuple(got.shape) == tuple(want.shape) == (1, 32, 32)
    np.testing.assert_allclose(got.numpy(), want.numpy(),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("model", ["resnet34", "resnet50"])
def test_unet_resnet_reference_naming(ref, torch, tmp_path, model):
    """UnetResNet decoder naming certified against the reference source;
    the torchvision encoder is stubbed with our torchvision-naming trunk
    (torchvision absent from this image), so encoder keys follow the same
    convention on both sides."""
    from voicepuppet_tpu.tools import models_torch as mt

    tv = sys.modules["torchvision"]
    torch.manual_seed(0)
    setattr(tv.models, model,
            lambda pretrained=False: mt._TVResNet(model))
    rm = ref.UnetResNet(pretrained=False, model=model).eval()
    path = str(tmp_path / f"unet_{model}.pth")
    torch.save({"state_dict": rm.state_dict()}, path)

    ours = mt.UnetResNet(model=model).eval()
    _assert_full_match(torch, ours, rm.state_dict())
    n = ours.load_state(path)
    assert n == len(ours.state_dict())

    x = torch.rand(1, 3, 64, 64, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        want = rm(x)
        got = ours(x)
    np.testing.assert_allclose(got.numpy(), want.numpy(),
                               rtol=0, atol=1e-6)
