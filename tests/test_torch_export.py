"""Reverse converter (flax -> reference torch state_dict) tests.

Both roundtrip directions must be exact: every importer transform is a
lossless transpose/flip, so export(import(sd)) == sd on all parameter
keys and import(export(vars)) == vars leaf-for-leaf.
"""

import numpy as np
import torch

from medical_image_segmentation_with_visual_prompts_tpu.models import \
    ModelConfig
from medical_image_segmentation_with_visual_prompts_tpu.utils.torch_export \
    import export_state_dict
from medical_image_segmentation_with_visual_prompts_tpu.utils.torch_import \
    import build_key_rules, import_state_dict, load_torch

from test_torch_import import TINY, _init_vars, _synthetic_state_dict


def test_export_inverts_import():
    conf = ModelConfig(**TINY)
    _, variables = _init_vars(conf)
    sd = _synthetic_state_dict(conf, variables, np.random.default_rng(0))
    new_vars, report = import_state_dict(sd, variables, conf)
    assert not report["unmatched_torch_keys"]
    back = export_state_dict(new_vars, conf)
    rules = build_key_rules(conf)
    for key, rule in rules.items():
        if rule is None:
            if key.endswith("num_batches_tracked"):
                assert back[key].dtype == np.int64
            else:
                assert key not in back  # derived pe.relative_dist_*
            continue
        np.testing.assert_array_equal(back[key], sd[key], err_msg=key)


def test_import_inverts_export():
    from flax import traverse_util
    conf = ModelConfig(**TINY)
    _, variables = _init_vars(conf)
    sd = export_state_dict(variables, conf)
    re_vars, report = import_state_dict(sd, variables, conf)
    assert not report["unmatched_torch_keys"]
    assert not report["unfilled_ours"], report["unfilled_ours"][:10]
    for coll in ("params", "batch_stats"):
        a = traverse_util.flatten_dict(variables[coll])
        b = traverse_util.flatten_dict(re_vars[coll])
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg="/".join(k))


def test_export_pt_file_roundtrip(tmp_path):
    """torch.save payload written by the CLI path loads via load_torch
    and re-imports exactly."""
    conf = ModelConfig(**TINY)
    _, variables = _init_vars(conf)
    sd = export_state_dict(variables, conf)
    pt = tmp_path / "exported.pt"
    torch.save({"model_state_dict":
                {k: torch.from_numpy(np.array(v))
                 for k, v in sd.items()}}, pt)
    loaded = load_torch(pt)
    re_vars, report = import_state_dict(loaded, variables, conf)
    assert not report["unmatched_torch_keys"]
    assert not report["unfilled_ours"]
