"""CLI config-building tests: YAML + dotted overrides + deep merge."""

import argparse
import json

import pytest

from triad_tpu.cli.train import apply_overrides, build_config


def _ns(**kw):
    base = dict(config=None, set=None, output_dir=None, steps=None)
    base.update(kw)
    return argparse.Namespace(**base)


def test_defaults():
    cfg = build_config(_ns())
    assert cfg.data.batch_size_av == 22
    assert cfg.loss.matmul_precision == "highest"


def test_dotted_overrides():
    cfg = build_config(_ns(set=[
        "train.num_epochs=3",
        "data.batch_size_av=16",
        "loss.matmul_precision=\"default\"",
        "model.hubert.conv_dim=[16,16]",
    ]))
    assert cfg.train.num_epochs == 3
    assert cfg.data.batch_size_av == 16
    assert cfg.loss.matmul_precision == "default"
    assert cfg.model.hubert.conv_dim == (16, 16)


def test_yaml_config(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("train:\n  num_epochs: 7\nmesh:\n  num_devices: 4\n")
    cfg = build_config(_ns(config=str(f)))
    assert cfg.train.num_epochs == 7
    assert cfg.mesh.num_devices == 4


def test_override_beats_file(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("train:\n  num_epochs: 7\n")
    cfg = build_config(_ns(config=str(f), set=["train.num_epochs=2"]))
    assert cfg.train.num_epochs == 2


def test_bad_override_rejected():
    with pytest.raises(ValueError):
        apply_overrides({}, ["no_equals_sign"])


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        build_config(_ns(set=["train.not_a_field=1"]))
