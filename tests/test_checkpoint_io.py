"""Checkpoint file/directory path semantics (utils/checkpoint.py).

The per-epoch directory layout mirrors reference segmentation.py:145-154
(``<dir>/<epoch:04d>.pt``); loading from the directory itself picks the
latest epoch — a usability superset of the reference's file-only
``torch.load``.
"""

import numpy as np
import pytest

from medical_image_segmentation_with_visual_prompts_tpu.utils.checkpoint import (
    load_checkpoint, save_checkpoint)


def _state(val):
    return {"params": {"w": np.full((2, 3), val, np.float32)}}


def test_dir_path_writes_per_epoch_files(tmp_path):
    d = tmp_path / "run1"
    p0 = save_checkpoint(d, 0, _state(0.0))
    p5 = save_checkpoint(d, 5, _state(5.0))
    assert p0 == d / "0000.ckpt" and p5 == d / "0005.ckpt"
    assert sorted(x.name for x in d.glob("*.ckpt")) == ["0000.ckpt",
                                                        "0005.ckpt"]


def test_load_from_dir_picks_latest_epoch(tmp_path):
    d = tmp_path / "run1"
    for epoch in (0, 20, 3):  # out-of-order writes; zero-padded names sort
        save_checkpoint(d, epoch, _state(float(epoch)))
    ck = load_checkpoint(d)
    assert ck["current_epoch"] == 20
    np.testing.assert_array_equal(ck["model_state_dict"]["params"]["w"],
                                  np.full((2, 3), 20.0, np.float32))


def test_load_from_explicit_file_still_works(tmp_path):
    f = tmp_path / "one.ckpt"
    save_checkpoint(f, 7, _state(7.0))
    assert f.is_file()
    assert load_checkpoint(f)["current_epoch"] == 7


def test_load_from_empty_dir_raises(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(FileNotFoundError):
        load_checkpoint(d)
