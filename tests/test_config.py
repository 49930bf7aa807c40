import dataclasses

import pytest

from voicepuppet_tpu.config import Config, MelConfig, load_config


def test_defaults_derive_stride_constants():
    cfg = Config()
    # ref: generator/generator.py:47-52 — 16000/25 = 640, 640/128 = 5
    assert cfg.frame_wav_scale == 640
    assert cfg.frame_mfcc_scale == 5
    # ref: generator/generator.py:478 — hop*(T*5-1)+win
    assert cfg.pcm_length_for_frames(24) == 128 * (24 * 5 - 1) + 512


def test_invalid_stride_rejected():
    with pytest.raises(ValueError):
        Config(mel=MelConfig(hop_step=100))


def test_yaml_reference_schema(tmp_path):
    yml = tmp_path / "params.yml"
    yml.write_text(
        """
default: &DEFAULT
  train_dataset_path: config/train.txt
  model_dir: /tmp/models
  sample_file:
    wav_name: a.wav
  mel:
    sample_rate: 16000
    hop_step: 128
  frame_rate: 25
  training:
    learning_rate: 0.002
"""
    )
    cfg = load_config(str(yml))
    assert cfg.model_dir == "/tmp/models"
    assert cfg.dataset.wav_name == "a.wav"
    assert cfg.training.learning_rate == 0.002
    assert cfg.bfmnet.rnn_hidden_size == 256  # per-model default retained


def test_config_is_hashable_for_jit_closure():
    hash(Config())


def test_yaml_training_block_distributes_to_models(tmp_path):
    """The shared ``training:`` block reaches per-model training configs
    for non-pinned fields; model-pinned fields (e.g. BFMNet's lr, which
    the reference hard-codes after the YAML load, bfmnet.py:153-157) keep
    their defaults; explicit per-model blocks win."""
    yml = tmp_path / "params.yml"
    yml.write_text(
        """
default: &DEFAULT
  training:
    learning_rate: 0.002
    max_grad_norm: 10.0
    epochs: 7
  pixrefer:
    training:
      epochs: 3
"""
    )
    cfg = load_config(str(yml))
    # shared non-pinned knobs propagate
    assert cfg.bfmnet.training.max_grad_norm == 10.0
    assert cfg.bfmnet.training.epochs == 7
    assert cfg.atnet.training.epochs == 7
    # model-pinned lr schedules are untouched by the shared block
    assert cfg.bfmnet.training.learning_rate == 1e-4
    assert cfg.pixrefer.training.learning_rate == 3e-4
    # explicit per-model block beats the shared block
    assert cfg.pixrefer.training.epochs == 3
    assert cfg.pixrefer.training.max_grad_norm == 10.0
