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
