"""All five trainer CLIs run end-to-end on the virtual 8-device CPU mesh
at the REFERENCE batch sizes (BFMNet 4, PixRefer 2, PixFlow 3, ATNet 16,
VGNet 4; train_*.py) — exercising mesh-safe batch rounding
(mesh_global_batch), the on-disk dataset loaders, checkpointing, and the
metrics logger through each ``main()``.  Model widths are shrunk via the
YAML profile; batch-size semantics are what's under test."""

import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

PR_S = 256      # pixrefer panel size (its 8-level U-Net needs >= 256)
PF_S = 64       # pixflow panel size (no U-Net skips; 64 suffices)
VG_S = 32       # vgnet image size


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Two dataset flavors: coeff/landmark/wav clips (bfmnet/atnet) and
    image-sequence clips (pixrefer/pixflow panels; vgnet frames)."""
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("ds")
    rng = np.random.RandomState(0)

    def write_clip(d, frames, panel=None, frame_size=None):
        d.mkdir()
        coeff = rng.randn(frames, 257).astype(np.float32) * 0.1
        np.savetxt(d / "bfmcoeff.txt", coeff, fmt="%.5f", delimiter=",")
        # landmarks in [40, 180] px of a 224 canvas, eyes blinking
        lmk = (rng.rand(frames, 136) * 140 + 40).astype(np.float32)
        np.savetxt(d / "landmark.txt", lmk, fmt="%.3f", delimiter=",")
        pcm = 0.3 * np.sin(2 * np.pi * 220 *
                           np.arange(frames * 640) / 16000.0)
        wavfile.write(d / "audio.wav", 16000,
                      (pcm * 32767).astype(np.int16))
        for i in range(frames):
            if panel is not None:
                img = (rng.rand(panel[0], panel[1], 3) * 255).astype(
                    np.uint8)
            else:
                img = (rng.rand(frame_size, frame_size, 3) * 255).astype(
                    np.uint8)
            Image.fromarray(img).save(d / f"{i}.jpg")
        return frames

    seq_dir = root / "seq"
    seq_dir.mkdir()
    lines = []
    for k in range(2):
        n = write_clip(seq_dir / f"clip{k}", 60, frame_size=VG_S)
        lines.append(f"{seq_dir / f'clip{k}'}|{n}")
    (root / "train_seq.txt").write_text("\n".join(lines) + "\n")

    for tag, size in (("pr", PR_S), ("pf", PF_S)):
        panel_dir = root / f"panel_{tag}"
        panel_dir.mkdir()
        lines = []
        for k in range(2):
            n = write_clip(panel_dir / f"clip{k}", 8, panel=(size, 3 * size))
            lines.append(f"{panel_dir / f'clip{k}'}|{n}")
        (root / f"train_panel_{tag}.txt").write_text("\n".join(lines) + "\n")
    return root


def make_yaml(tmp_path, dataset, list_name, save_interval=1000):
    y = f"""
default:
  model_dir: {tmp_path}/allmodels
  train_dataset_path: {dataset}/{list_name}
  eval_dataset_path: {dataset}/{list_name}
  bfmnet:
    batch_size: 4
    backbone_width_mult: 0.25
    thinresnet_output_channels: 32
    encode_embedding_size: 32
    rnn_hidden_size: 32
    training: {{save_interval: {save_interval}, eval_interval: 1000}}
  pixrefer:
    batch_size: 2
    ngf: 4
    ndf: 4
    img_size: {PR_S}
    training: {{save_interval: {save_interval}}}
  pixflow:
    batch_size: 3
    ngf: 4
    ndf: 4
    img_size: {PF_S}
    training: {{save_interval: {save_interval}}}
  atnet:
    batch_size: 16
    thinresnet_output_channels: 32
    encode_embedding_size: 32
    rnn_hidden_size: 32
    training: {{save_interval: {save_interval}}}
  vgnet:
    batch_size: 4
    img_size: {VG_S}
    training: {{save_interval: {save_interval}}}
"""
    p = tmp_path / f"params_{list_name}.yml"
    p.write_text(y)
    return str(p)


def run_main(main, tmp_path, cfg_path, name, *extra):
    main(["--config_path", cfg_path, "--steps", "2",
          "--ckpt_dir", str(tmp_path / f"ckpt_{name}"),
          "--log_dir", str(tmp_path / f"log_{name}")] + list(extra))
    log = tmp_path / f"log_{name}" / f"{name}_metrics.jsonl"
    assert log.exists(), f"{name}: no metrics written"
    assert len(log.read_text().strip().splitlines()) >= 2


def test_bfmnet_cli(dataset, tmp_path):
    import glob
    from voicepuppet_tpu.train import bfmnet_trainer
    cfg_path = make_yaml(tmp_path, dataset, "train_seq.txt")
    # --profile_steps also pins the ProfilerHook plumbing end-to-end
    # (SURVEY §5: the reference has no tracing at all)
    run_main(bfmnet_trainer.main, tmp_path, cfg_path, "bfmnet",
             "--profile_steps", "1", "--profile_start", "1")
    traces = glob.glob(
        str(tmp_path / "log_bfmnet" / "profile" / "**" / "*"),
        recursive=True)
    assert any(p.endswith(".xplane.pb") or p.endswith(".json.gz")
               for p in traces), f"no profiler trace written: {traces}"


def test_atnet_cli(dataset, tmp_path):
    from voicepuppet_tpu.train import atnet_trainer
    cfg_path = make_yaml(tmp_path, dataset, "train_seq.txt")
    run_main(atnet_trainer.main, tmp_path, cfg_path, "atnet")


def test_vgnet_cli(dataset, tmp_path):
    from voicepuppet_tpu.train import vgnet_trainer
    cfg_path = make_yaml(tmp_path, dataset, "train_seq.txt")
    run_main(vgnet_trainer.main, tmp_path, cfg_path, "vgnet")


def test_pixrefer_cli(dataset, tmp_path):
    from voicepuppet_tpu.train import pixrefer_trainer
    cfg_path = make_yaml(tmp_path, dataset, "train_panel_pr.txt")
    run_main(pixrefer_trainer.main, tmp_path, cfg_path, "pixrefer")


def test_pixflow_cli(dataset, tmp_path):
    # --dtype bfloat16 pins the mixed-precision CLI path end-to-end on the
    # cheap 64px config (the GAN trainers share the flag's plumbing)
    from voicepuppet_tpu.train import pixflow_trainer
    cfg_path = make_yaml(tmp_path, dataset, "train_panel_pf.txt")
    run_main(pixflow_trainer.main, tmp_path, cfg_path, "pixflow",
             "--dtype", "bfloat16")


def test_train_then_synthesize_via_cli_only(dataset, tmp_path):
    """The product loop with no Python API use: train BFMNet + PixRefer via
    their CLIs (checkpoints saved), then synthesize from the saved orbax
    dirs through the synthesize CLI's --bfmnet_ckpt/--pixrefer_ckpt (the
    reference composes two checkpoints the same way;
    infer_bfmvid.py:207-218)."""
    from scipy.io import wavfile
    from voicepuppet_tpu.pipeline import synthesize as synth_cli
    from voicepuppet_tpu.train import bfmnet_trainer, pixrefer_trainer

    cfg_path = make_yaml(tmp_path, dataset, "train_seq.txt",
                         save_interval=1)
    bfm_ckpt = tmp_path / "ckpt_bfmnet"
    px_ckpt = tmp_path / "ckpt_pixrefer"
    bfmnet_trainer.main(["--config_path", cfg_path, "--steps", "2",
                         "--ckpt_dir", str(bfm_ckpt),
                         "--log_dir", str(tmp_path / "log_b")])
    cfg_path_px = make_yaml(tmp_path, dataset, "train_panel_pr.txt",
                            save_interval=1)
    pixrefer_trainer.main(["--config_path", cfg_path_px, "--steps", "2",
                           "--ckpt_dir", str(px_ckpt),
                           "--log_dir", str(tmp_path / "log_p")])
    assert any(bfm_ckpt.iterdir()) and any(px_ckpt.iterdir())

    # synthesize inputs: a 3-panel image + a wav
    from PIL import Image
    rng = np.random.RandomState(3)
    panel = (rng.rand(PR_S, 3 * PR_S, 3) * 255).astype(np.uint8)
    Image.fromarray(panel).save(tmp_path / "panel.jpg")
    pcm = 0.3 * np.sin(2 * np.pi * 220 * np.arange(8000) / 16000.0)
    wavfile.write(tmp_path / "in.wav", 16000,
                  (pcm * 32767).astype(np.int16))

    out_dir = tmp_path / "out"
    synth_cli.main(["--config_path", cfg_path_px,
                    "--bfmnet_ckpt", str(bfm_ckpt),
                    "--pixrefer_ckpt", str(px_ckpt),
                    "--out_dir", str(out_dir),
                    str(tmp_path / "panel.jpg"), str(tmp_path / "in.wav")])
    pngs = sorted(out_dir.glob("*.png"))
    assert len(pngs) >= 10  # ~13 frames from 0.5 s at 25 fps
    frame = np.asarray(Image.open(pngs[0]))
    assert frame.shape == (PR_S, PR_S, 3)
