"""Configuration system: argparse Namespace merged with a YAML file.

Behavioral parity with the reference config layer
(/root/reference/src/utils/configs.py:13-106):

* The YAML file is looked up as absolute path, then ``~``-expanded path,
  then relative to the default ``configurations/`` directory.
* On duplicate keys the YAML value wins over the CLI value
  (reference configs.py:28 — note the reference README claims the
  opposite; we follow the code's behavior).
* Checkpoint *load* paths are resolved absolute → ``~``-expanded →
  relative to the default checkpoint dir (``checkpoints/backbone`` or
  ``checkpoints/prompt_tokens``) and must exist
  (configs.py:31-65).
* Checkpoint *save* paths resolve the same way but need not exist; when
  empty they default to ``<default ckpt dir>/<family>/<run_name>``
  (configs.py:66-99).
* ``run_name = {mode}_{backbone}_{MMDDHHMMSS}_{run_name}``
  (configs.py:67-70), and ``log_dir``/``summary_dir`` derive from it
  (configs.py:101-104).
"""

from __future__ import annotations

from argparse import Namespace
from datetime import datetime
from pathlib import Path

import yaml

# Default directories live next to the package, mirroring the reference's
# repo-root `configurations/`, `checkpoints/`, `logs/` layout
# (reference configs.py:7-9).  MIVP_CKPT_DIR / MIVP_LOG_DIR relocate the
# write roots (sandboxed CI runs of the example workflow scripts).
import os as _os

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
DEFAULT_CONFIG_DIR = _REPO_ROOT / "configurations"
DEFAULT_CKPT_DIR = Path(_os.environ.get("MIVP_CKPT_DIR",
                                        _REPO_ROOT / "checkpoints"))
DEFAULT_ROOT_LOG_DIR = Path(_os.environ.get("MIVP_LOG_DIR",
                                            _REPO_ROOT / "logs"))


def _resolve_existing(path_str: str, default_dir: Path) -> Path:
    """Resolve a path that must exist: absolute → ~ → default_dir-relative."""
    pth = Path(path_str)
    if pth.is_absolute() and pth.exists():
        return pth
    if pth.expanduser().exists():
        return pth.expanduser()
    if (default_dir / pth).exists():
        return default_dir / pth
    raise FileNotFoundError(f"The checkpoint path {path_str!r} does not exist!")


def _resolve_save(path_str: str, default_dir: Path) -> Path:
    """Resolve a save path: absolute → ~ → default_dir-relative (may not exist)."""
    pth = Path(path_str)
    if pth.is_absolute():
        return pth
    if "~" in str(pth):
        return pth.expanduser()
    return default_dir / pth


def get_full_configs(args: Namespace, now: datetime | None = None) -> Namespace:
    """Merge argparse configs with YAML configs and resolve derived paths."""
    full_configs = dict(vars(args))

    # Locate and merge the YAML file (YAML wins on duplicates,
    # reference configs.py:16-28).
    config_pth = Path(args.configs)
    if config_pth.is_absolute() and config_pth.exists():
        yaml_path = config_pth
    elif config_pth.expanduser().exists():
        yaml_path = config_pth.expanduser()
    elif (DEFAULT_CONFIG_DIR / config_pth).exists():
        yaml_path = DEFAULT_CONFIG_DIR / config_pth
    else:
        raise FileNotFoundError("The configuration file does not exist!")
    with open(yaml_path, "r") as f:
        more_configs = yaml.safe_load(f) or {}
    full_configs.update(more_configs)

    # Load-checkpoint paths must exist (reference configs.py:31-65).
    if getattr(args, "load_ckpt_backbone", False) is True:
        if args.load_ckpt_backbone_path == "":
            raise ValueError("The backbone checkpoint path is empty!")
        full_configs["load_ckpt_backbone_path"] = _resolve_existing(
            args.load_ckpt_backbone_path, DEFAULT_CKPT_DIR / "backbone")
    if getattr(args, "load_ckpt_prompt_tokens", False) is True:
        if args.load_ckpt_prompt_tokens_path == "":
            raise ValueError("The prompt tokens checkpoint path is empty!")
        full_configs["load_ckpt_prompt_tokens_path"] = _resolve_existing(
            args.load_ckpt_prompt_tokens_path, DEFAULT_CKPT_DIR / "prompt_tokens")

    # Timestamped run name (reference configs.py:67-70).
    timestamp = (now or datetime.now()).strftime("%m%d%H%M%S")
    run_name = (full_configs["mode"] + "_"
                + full_configs["backbone"] + "_"
                + timestamp + "_" + args.run_name)
    full_configs["run_name"] = run_name

    # Save-checkpoint paths (reference configs.py:71-99).
    if getattr(args, "save_ckpt_backbone", False) is True:
        if args.save_ckpt_backbone_path != "":
            full_configs["save_ckpt_backbone_path"] = _resolve_save(
                args.save_ckpt_backbone_path, DEFAULT_CKPT_DIR / "backbone")
        else:
            full_configs["save_ckpt_backbone_path"] = \
                DEFAULT_CKPT_DIR / "backbone" / run_name
    if getattr(args, "save_ckpt_prompt_tokens", False) is True:
        if args.save_ckpt_prompt_tokens_path != "":
            full_configs["save_ckpt_prompt_tokens_path"] = _resolve_save(
                args.save_ckpt_prompt_tokens_path, DEFAULT_CKPT_DIR / "prompt_tokens")
        else:
            full_configs["save_ckpt_prompt_tokens_path"] = \
                DEFAULT_CKPT_DIR / "prompt_tokens" / run_name

    # Logger and scalar-summary dirs (reference configs.py:101-104).
    log_dir = Path(DEFAULT_ROOT_LOG_DIR) / run_name
    full_configs["log_dir"] = log_dir
    full_configs["summary_dir"] = log_dir / "summary"

    return Namespace(**full_configs)
