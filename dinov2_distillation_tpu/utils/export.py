"""Anyma/detectron2 export: flax student subtree -> torch-convention keys.

Reverse of the import translators in ``torch_import.py``: walks the trained
student backbone (params + batch_stats) and emits ``backbone.*`` keys in the
detectron2 naming that the reference's export produced
(``scripts/convert_to_anyma.py:23-39`` kept torch layer names under a
``backbone.`` prefix; loss/projector weights are excluded).
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from .logger import get_logger
from .torch_import import _flatten

logger = get_logger()

_BN_INV = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}


def _conv_back(w: np.ndarray) -> np.ndarray:
    """HWIO -> OIHW."""
    return w.transpose(3, 2, 0, 1) if w.ndim == 4 else w


_INVERSE: Dict[str, Callable[[Tuple[str, ...], str], Optional[str]]] = {}


def register_inverse(family: str):
    def deco(fn):
        _INVERSE[family] = fn
        return fn
    return deco


@register_inverse("resnet")
def _inv_resnet(path: Tuple[str, ...], collection: str) -> Optional[str]:
    # ('stem','conv','kernel') -> stem.conv1.weight ; ('stem','bn',leaf) -> stem.conv1.norm.*
    if path[0] == "stem":
        if path[1] == "conv":
            return "stem.conv1.weight"
        if path[1] == "bn":
            return f"stem.conv1.norm.{_BN_INV[path[2]]}"
        return None
    m = re.match(r"res(\d)_(\d+)", path[0])
    if m:
        stage, block = m.groups()
        mod = path[1]  # conv1|conv2|conv3|shortcut
        if path[2] == "conv":
            return f"res{stage}.{block}.{mod}.weight"
        if path[2] == "bn":
            return f"res{stage}.{block}.{mod}.norm.{_BN_INV[path[3]]}"
    return None


@register_inverse("stdc")
def _inv_stdc(path: Tuple[str, ...], collection: str) -> Optional[str]:
    m = re.match(r"features_(\d+)", path[0])
    if not m:
        return None
    feat = f"features.{m.group(1)}"
    rest = path[1:]
    if rest[0] == "conv":
        return f"{feat}.conv.weight"
    if rest[0] == "bn":
        return f"{feat}.bn.{_BN_INV[rest[1]]}"
    m2 = re.match(r"conv_(\d+)", rest[0])
    if m2:
        if rest[1] == "conv":
            return f"{feat}.conv_list.{m2.group(1)}.conv.weight"
        if rest[1] == "bn":
            return f"{feat}.conv_list.{m2.group(1)}.bn.{_BN_INV[rest[2]]}"
    if rest[0] == "avd_conv":
        return f"{feat}.avd_layer.0.weight"
    if rest[0] == "avd_bn":
        return f"{feat}.avd_layer.1.{_BN_INV[rest[1]]}"
    if rest[0] == "skip_dw":
        return f"{feat}.skip.0.weight"
    if rest[0] == "skip_dw_bn":
        return f"{feat}.skip.1.{_BN_INV[rest[1]]}"
    if rest[0] == "skip_pw":
        return f"{feat}.skip.2.weight"
    if rest[0] == "skip_pw_bn":
        return f"{feat}.skip.3.{_BN_INV[rest[1]]}"
    return None


def _load_inverse_registry():
    if len(_INVERSE) > 2:
        return
    from . import translators as T

    _INVERSE.update({
        "convnext": T.inverse_convnext,
        "darknet": T.inverse_darknet,
        "mit": T.inverse_mit,
        "mobilenet_v2": T.inverse_mobilenet_v2,
        "presnet": T.inverse_presnet,
        "swin": T.inverse_swin,
        "efficientnet": T.inverse_efficientnet,
        "mobilenet_v3_small": T.make_mobilenet_v3_translator("small")[1],
        "mobilenet_v3_large": T.make_mobilenet_v3_translator("large")[1],
        "mobilenetv3_small": T.make_timm_mobilenetv3_translator("small")[1],
        "mobilenetv3_large": T.make_timm_mobilenetv3_translator("large")[1],
    })


def infer_family(params: Any) -> str:
    """Identify the backbone family from the param-tree module names.

    The reference never needed this (its checkpoints carry torch keys); our
    orbax trees are flax module trees, whose top-level names are
    family-distinctive (VERDICT r2 item 6). mobilenet_v3 size is resolved by
    block count (torchvision small=11 / large=15 bnecks); the timm-layout
    export ('mobilenetv3_*') shares the same trunk and must be requested
    explicitly via --family."""
    tops = set()
    for path in _flatten(params):
        p = path[1:] if path and path[0] == "backbone" else path
        if p:
            tops.add(p[0])

    def has(pattern):
        return any(re.match(pattern, t) for t in tops)

    if has(r"features_\d+$"):
        return "stdc"
    if "stem" in tops and has(r"res\d_\d+$"):
        return "resnet"
    if has(r"conv1_\d$"):
        return "presnet"
    if has(r"p\d_conv$") or has(r"p\d_c2f$"):
        return "darknet"
    if has(r"patch_embed\d$"):
        return "mit"
    if "patch_embed" in tops:
        return "swin"
    if "conv1" in tops and has(r"layer\d+_\d+$"):
        return "mobilenet_v2"
    if "lastconv" in tops and has(r"block_\d+$"):
        n_blocks = len({t for t in tops if re.match(r"block_\d+$", t)})
        return "mobilenet_v3_small" if n_blocks <= 11 else "mobilenet_v3_large"
    if "stem_conv" in tops:
        if has(r"stage_\d_block_\d+$"):
            return "convnext"
        if has(r"stage\d_(conv|sdta)\d+$"):
            return "edgenext"
        if has(r"stage\d_block\d+$"):
            return "efficientnet"
    raise ValueError(
        f"Could not infer backbone family from param tree (top-level modules: "
        f"{sorted(tops)}); pass --family explicitly")


def _edgenext_inverse_from_tree(params: Any):
    """Build the edgenext inverse with n_conv counted from the tree itself
    (the stage split is variant-dependent; the tree carries it)."""
    from .translators import make_edgenext_translator

    n_conv = [0, 0, 0, 0]
    n_sdta = [0, 0, 0, 0]
    for path in _flatten(params):
        p = path[1:] if path and path[0] == "backbone" else path
        if not p:
            continue
        m = re.match(r"stage(\d)_(conv|sdta)(\d+)$", p[0])
        if m:
            i, kind, j = int(m.group(1)), m.group(2), int(m.group(3))
            tgt = n_conv if kind == "conv" else n_sdta
            tgt[i] = max(tgt[i], j + 1)
    depths = [c + s for c, s in zip(n_conv, n_sdta)]
    return make_edgenext_translator(depths, n_sdta)[1]


def flax_student_to_torch_keys(
    family: str, params: Any, batch_stats: Any
) -> Dict[str, np.ndarray]:
    _load_inverse_registry()
    if family == "mobilenet_v3":
        raise ValueError("pass 'mobilenet_v3_small' or 'mobilenet_v3_large' "
                         "(the features[] layout depends on the size)")
    if family == "edgenext":
        inv = _edgenext_inverse_from_tree(params)
    else:
        inv = _INVERSE.get(family)
    if inv is None:
        raise NotImplementedError(f"No export translator for family '{family}'")
    out: Dict[str, np.ndarray] = {}
    skipped = []
    for collection, tree in (("params", params), ("batch_stats", batch_stats)):
        if tree is None:
            continue
        for path, val in _flatten(tree).items():
            # strip the wrapper's 'backbone' root
            p = path[1:] if path and path[0] == "backbone" else path
            key = inv(p, collection)
            if key is None:
                skipped.append("/".join(path))
                continue
            arr = np.asarray(val)
            if key.endswith(".weight") and arr.ndim == 4:
                arr = _conv_back(arr)
            elif key.endswith(".weight") and arr.ndim == 2 and p[-1] == "kernel":
                arr = arr.T  # flax Dense (in, out) -> torch Linear (out, in)
            out[f"backbone.{key}"] = arr
    if skipped:
        logger.info(f"export: skipped {len(skipped)} non-exportable leaves "
                    f"(first: {skipped[:5]})")
    return out


def restore_raw_checkpoint(checkpoint_dir: str, which: str = "best"):
    """Restore an orbax checkpoint as a raw numpy pytree (no template)."""
    import orbax.checkpoint as ocp

    checkpoint_dir = os.path.abspath(checkpoint_dir)
    sub = os.path.join(checkpoint_dir, which)
    root = sub if os.path.isdir(sub) else checkpoint_dir
    with ocp.CheckpointManager(root) as mgr:
        step = mgr.best_step() if which == "best" else mgr.latest_step()
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {root}")
        return mgr.restore(step)


def export_student_to_anyma(
    checkpoint_dir: str, which: str = "best", family: Optional[str] = None
) -> Dict[str, np.ndarray]:
    restored = restore_raw_checkpoint(checkpoint_dir, which)
    state = restored["state"] if "state" in restored else restored
    params = state["params"]["student"]
    stats = (state.get("batch_stats") or {}).get("student")
    if family is None:
        family = infer_family(params)
    return flax_student_to_torch_keys(family, params, stats)
