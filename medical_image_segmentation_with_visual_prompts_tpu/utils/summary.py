"""Model summary: per-module parameter counts.

Equivalent of the reference's ``torchinfo.summary(model)`` logged at
train start (multi_view.py:108, students_teacher.py:141,
segmentation.py:87).
"""

from __future__ import annotations

import numpy as np
from flax import traverse_util


def model_summary(params) -> str:
    flat = traverse_util.flatten_dict(params)
    per_module = {}
    for path, value in flat.items():
        per_module[path[0]] = per_module.get(path[0], 0) + int(np.size(value))
    total = sum(per_module.values())
    lines = ["Model summary (parameters per top-level module):"]
    for name in sorted(per_module):
        lines.append(f"  {name:32s} {per_module[name]:>12,d}")
    lines.append(f"  {'TOTAL':32s} {total:>12,d}")
    return "\n".join(lines)
