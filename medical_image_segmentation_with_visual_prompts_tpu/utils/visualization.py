"""PNG visualization dumpers (the reference's ``view`` outputs).

Equivalents of /root/reference/src/modules/utils.py:133-264
(``view_reconstruction``, ``view_prototype``,
``view_prototype_students_teacher``, ``view_segmentation``): per-slice
grayscale panels resized to 128x128, concatenated horizontally per row
and vertically across rows, written to ``~/image_outputs/{rec,prt,
seg_new}`` and gated by the ``view`` config (example_configs.yml:110).

Implementation uses PIL (cv2 is not in this environment).  The reference
indexes batch element 1 in ``view_segmentation`` and crashes on batch
size 1 (SURVEY appendix bug #10); this version uses element 0.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

try:
    from PIL import Image
    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False

import os

# Reference writes to ~/image_outputs (modules/utils.py:152 etc.);
# overridable for tests/deployments.
_OUT_ROOT = Path(os.environ.get("MIVP_VIEW_DIR", "~/image_outputs"))


def _resize128(arr: np.ndarray, nearest: bool) -> np.ndarray:
    img = Image.fromarray(arr.astype(np.float32))
    img = img.resize((128, 128),
                     Image.NEAREST if nearest else Image.BICUBIC)
    return np.asarray(img)


def _save(panel: np.ndarray, subdir: str, fname: str) -> Path:
    save_dir = (_OUT_ROOT / subdir).expanduser()
    save_dir.mkdir(exist_ok=True, parents=True)
    path = save_dir / fname
    Image.fromarray(np.clip(panel, 0, 255).astype(np.uint8)).save(path)
    return path


def _slices(vol: np.ndarray, n_slices: int, scale: float,
            nearest: bool) -> np.ndarray:
    """[H, W, D] volume -> horizontal strip of n_slices panels."""
    st = max(vol.shape[2] // n_slices, 1)
    return np.concatenate(
        [_resize128(vol[:, :, i * st] * scale, nearest)
         for i in range(n_slices)], axis=1)


def view_reconstruction(name, n_slices, epoch, step, ori_img=None,
                        rec_img=None):
    """ori/rec: [B, H, W, D, C] channels-last arrays (ref :133-157)."""
    if not _HAVE_PIL:
        return None
    ori = np.asarray(ori_img)[0, ..., 0]
    rec = np.asarray(rec_img)[0, ..., 0]
    panel = np.concatenate([_slices(ori, n_slices, 255.0, False),
                            _slices(rec, n_slices, 255.0, False)], axis=0)
    return _save(panel, "rec", f"epoch{epoch}_step{step}_{name[0]}_rec.png")


def view_prototype(name, n_slices, epoch, step, c, prt1=None, prt2=None):
    """(ref :160-186); prt: [B, H, W, D, C]."""
    if not _HAVE_PIL:
        return None
    scale = 255 // c
    rows = [_slices(np.asarray(p)[0, ..., 0], n_slices, scale, True)
            for p in (prt1, prt2)]
    return _save(np.concatenate(rows, axis=0), "prt",
                 f"epoch{epoch}_step{step}_{name}_prt.png")


def view_prototype_students_teacher(name, n_slices, epoch, step, chs,
                                    prt_tch=None, img_tch=None,
                                    prt_sts=None, img_sts=None):
    """(ref :189-228); latent maps are argmax'd over channels."""
    if not _HAVE_PIL:
        return None
    rows = []

    def block(img, prt):
        img0 = np.asarray(img)[0, ..., 0]
        lab = np.argmax(np.asarray(prt)[0], axis=-1)
        return np.concatenate(
            [_slices(img0, n_slices, 255.0, False),
             _slices(lab.astype(np.float32), n_slices, 255 // chs, True)],
            axis=0)

    rows.append(block(img_tch, prt_tch))
    for img, prt in zip(img_sts or [], prt_sts or []):
        rows.append(block(img, prt))
    return _save(np.concatenate(rows, axis=0), "prt",
                 f"epoch{epoch}_step{step}_{name[0]}_prt.png")


def view_segmentation(name, n_slices, epoch, step, seg_pred=None,
                      seg_target=None, img=None, n_classes=None):
    """(ref :230-264); channels-last logits/labels; batch element 0."""
    if not _HAVE_PIL:
        return None
    scale = 255 // n_classes
    pred = np.argmax(np.asarray(seg_pred)[0], axis=-1).astype(np.float32)
    tgt = np.asarray(seg_target)[0, ..., 0].astype(np.float32)
    rows = [_slices(pred, n_slices, scale, True),
            _slices(tgt, n_slices, scale, True)]
    if img is not None:
        rows.append(_slices(np.asarray(img)[0, ..., 0], n_slices, scale,
                            True))
    nm = name if isinstance(name, str) else name[0]
    return _save(np.concatenate(rows, axis=0), "seg_new",
                 f"epoch{epoch}_step{step}_{nm}_seg.png")
