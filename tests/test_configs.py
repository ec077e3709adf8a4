"""Config-system semantics tests (reference configs.py:13-106 rules)."""

from argparse import Namespace
from datetime import datetime
from pathlib import Path

import pytest

import medical_image_segmentation_with_visual_prompts_tpu.utils.configs as cfg
from medical_image_segmentation_with_visual_prompts_tpu.utils import get_full_configs


def _args(**kw):
    base = dict(
        mode="fit", training_mode="downstream", configs="",
        load_ckpt_backbone=False, load_ckpt_backbone_path="",
        save_ckpt_backbone=False, save_ckpt_backbone_path="",
        load_ckpt_prompt_tokens=False, load_ckpt_prompt_tokens_path="",
        save_ckpt_prompt_tokens=False, save_ckpt_prompt_tokens_path="",
        use_encoder_prompting=False, use_decoder_prompting=False,
        backbone="swin_unetr", run_name="myrun",
    )
    base.update(kw)
    return Namespace(**base)


@pytest.fixture
def yaml_file(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("alpha: 3\nbackbone: from_yaml\n")
    return p


def test_yaml_overrides_cli(yaml_file):
    # YAML wins on duplicate keys (reference configs.py:28, which
    # contradicts its own README — code behavior is authoritative).
    conf = get_full_configs(_args(configs=str(yaml_file)))
    assert conf.backbone == "from_yaml"
    assert conf.alpha == 3


def test_missing_yaml_raises():
    with pytest.raises(FileNotFoundError):
        get_full_configs(_args(configs="/nonexistent/path.yml"))


def test_run_name_and_log_dirs(yaml_file):
    now = datetime(2026, 8, 16, 1, 2, 3)
    conf = get_full_configs(_args(configs=str(yaml_file)), now=now)
    # run_name = {mode}_{backbone}_{MMDDHHMMSS}_{run_name}; backbone comes
    # from the merged configs (YAML override applies first).
    assert conf.run_name == "fit_from_yaml_0816010203_myrun"
    assert conf.log_dir == cfg.DEFAULT_ROOT_LOG_DIR / conf.run_name
    assert conf.summary_dir == conf.log_dir / "summary"


def test_load_ckpt_requires_existing(yaml_file):
    with pytest.raises(FileNotFoundError):
        get_full_configs(_args(configs=str(yaml_file),
                               load_ckpt_backbone=True,
                               load_ckpt_backbone_path="/no/such.ckpt"))
    with pytest.raises(ValueError):
        get_full_configs(_args(configs=str(yaml_file),
                               load_ckpt_backbone=True,
                               load_ckpt_backbone_path=""))


def test_load_ckpt_resolution_order(yaml_file, tmp_path):
    ck = tmp_path / "b.ckpt"
    ck.write_bytes(b"x")
    conf = get_full_configs(_args(configs=str(yaml_file),
                                  load_ckpt_backbone=True,
                                  load_ckpt_backbone_path=str(ck)))
    assert conf.load_ckpt_backbone_path == ck


def test_load_ckpt_default_dir(yaml_file, monkeypatch, tmp_path):
    monkeypatch.setattr(cfg, "DEFAULT_CKPT_DIR", tmp_path / "checkpoints")
    d = tmp_path / "checkpoints" / "prompt_tokens"
    d.mkdir(parents=True)
    (d / "p.ckpt").write_bytes(b"x")
    conf = get_full_configs(_args(configs=str(yaml_file),
                                  load_ckpt_prompt_tokens=True,
                                  load_ckpt_prompt_tokens_path="p.ckpt"))
    assert conf.load_ckpt_prompt_tokens_path == d / "p.ckpt"


def test_save_ckpt_defaults_to_run_name(yaml_file, monkeypatch, tmp_path):
    monkeypatch.setattr(cfg, "DEFAULT_CKPT_DIR", tmp_path / "ckpts")
    conf = get_full_configs(_args(configs=str(yaml_file),
                                  save_ckpt_backbone=True,
                                  save_ckpt_prompt_tokens=True))
    assert conf.save_ckpt_backbone_path == \
        tmp_path / "ckpts" / "backbone" / conf.run_name
    assert conf.save_ckpt_prompt_tokens_path == \
        tmp_path / "ckpts" / "prompt_tokens" / conf.run_name


def test_save_ckpt_absolute_kept(yaml_file):
    conf = get_full_configs(_args(configs=str(yaml_file),
                                  save_ckpt_backbone=True,
                                  save_ckpt_backbone_path="/abs/dir"))
    assert conf.save_ckpt_backbone_path == Path("/abs/dir")


def test_schedules():
    from medical_image_segmentation_with_visual_prompts_tpu.utils import (
        step_decay, warmup_cosine)
    # Schedules are jnp-traceable (optax passes traced counts); compare
    # at float32 precision.
    s = warmup_cosine(1.0, warmup_steps=10, t_total=110)
    assert float(s(0)) == 0.0
    assert abs(float(s(5)) - 0.5) < 1e-6
    assert abs(float(s(10)) - 1.0) < 1e-6   # cosine at progress 0
    assert abs(float(s(60)) - 0.5) < 1e-6   # halfway: cos(pi/2) -> 0.5
    assert abs(float(s(110)) - 0.0) < 1e-6  # end of schedule
    d = step_decay(2.0, step_size=100, gamma=0.8)
    assert d(0) == 2.0 and d(99) == 2.0
    assert abs(d(100) - 1.6) < 1e-12
    assert abs(d(250) - 2.0 * 0.8 ** 2) < 1e-12
