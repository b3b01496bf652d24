"""YAML configuration system with dotted CLI overrides.

Replaces the reference's OmegaConf usage (``train.py:347-348``) with a small
self-contained attribute-dict tree, and actually implements the dotted
``key.path=value`` CLI overrides that the reference README documents but never
implemented (``readme.md:272-276`` vs ``train.py:319-326``).

Schema parity (reference ``config/config.yaml:1-85``):
  wandb {project, tags, notes}
  student {model_name, student_keys, checkpoint_path?}
  teacher {model_name, teacher_key?}
  data_transform {global_crops_scale, global_crops_size}
  optimizer {type, kwargs, scheduler{type, kwargs, monitor, interval, frequency}}
  loss {losses: [{type, weight, kwargs{alpha, window_shapes, self_query,
                                       softmax_scale, num_heads, name}}]}
  train {max_epochs, accelerator, devices, num_nodes, strategy,
         resume_from_checkpoint?, accumulate_grad_batches}
  data_loader {data_dir[], val_dir?, batch_size, num_workers}
  checkpoints {dirpath, monitor, mode, save_top_k}
  precision (optional top-level; default bf16 on TPU)

Derived fields (reference ``train.py:86-122,188-190``): teacher.out_dim,
teacher.teacher_key, teacher.n_patches, per-loss teacher_dims / pos_dims /
pos_hw / query_hw, and student_dims injected from the instantiated student's
channel table.
"""

from __future__ import annotations

import copy
from typing import Any, Dict, Iterator, List, Optional

import yaml

# Embedding dim per DINOv2 teacher variant (reference train.py:103-108).
TEACHER_DIMS: Dict[str, int] = {
    "dinov2_vits14": 384,
    "dinov2_vitb14": 768,
    "dinov2_vitl14": 1024,
    "dinov2_vitg14": 1536,
}

TEACHER_PATCH_SIZE = 14


class ConfigNode(dict):
    """A dict with attribute access, nesting, and ``.get`` semantics.

    Behaves like an OmegaConf DictConfig for the subset of operations the
    framework uses: ``cfg.a.b``, ``cfg['a']``, ``cfg.a.get('x', default)``,
    assignment (``cfg.a.b = v``), and conversion back to plain containers.
    """

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = _wrap(v)

    # --- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __setitem__(self, name: str, value: Any) -> None:
        super().__setitem__(name, _wrap(value))

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError:
            raise AttributeError(name)

    # --- helpers ------------------------------------------------------------
    def to_container(self) -> Dict[str, Any]:
        """Deep-convert to plain dict/list (for logging and serialization)."""
        return _unwrap(self)

    def clone(self) -> "ConfigNode":
        return ConfigNode(copy.deepcopy(self.to_container()))

    def merge(self, other: Dict[str, Any]) -> "ConfigNode":
        """Recursively merge ``other`` on top of this config (in place)."""
        for k, v in other.items():
            if k in self and isinstance(self[k], ConfigNode) and isinstance(v, dict):
                self[k].merge(v)
            else:
                self[k] = _wrap(v)
        return self


_SCI_FLOAT = __import__("re").compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _wrap(v: Any) -> Any:
    if isinstance(v, ConfigNode):
        return v
    if isinstance(v, dict):
        return ConfigNode(v)
    if isinstance(v, (list, tuple)):
        return [_wrap(x) for x in v]
    if isinstance(v, str) and _SCI_FLOAT.match(v):
        # PyYAML 1.1 leaves dot-less scientific notation ('1e-3') as a
        # string; OmegaConf (which the reference used) yields a float.
        return float(v)
    return v


def _unwrap(v: Any) -> Any:
    if isinstance(v, dict):
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_unwrap(x) for x in v]
    return v


def load_config(path: str, overrides: Optional[List[str]] = None) -> ConfigNode:
    """Load a YAML config and apply ``key.path=value`` dotted overrides."""
    with open(path, "r") as f:
        cfg = ConfigNode(yaml.safe_load(f) or {})
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg


def apply_overrides(cfg: ConfigNode, overrides: List[str]) -> ConfigNode:
    """Apply dotted overrides like ``optimizer.kwargs.lr=3e-4``.

    Values are parsed with YAML, so ``true``, ``[1,2]``, ``null``, ``1e-3``
    all become the expected Python types. Intermediate nodes are created on
    demand; list elements can be addressed numerically:
    ``loss.losses.0.weight=2.0``.
    """
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override must look like key.path=value, got: {ov!r}")
        key, _, raw = ov.partition("=")
        value = yaml.safe_load(raw) if raw != "" else None
        node: Any = cfg
        parts = key.strip().split(".")
        for i, part in enumerate(parts[:-1]):
            nxt = parts[i + 1]
            if isinstance(node, list):
                node = node[int(part)]
            else:
                if part not in node:
                    node[part] = [] if nxt.isdigit() else ConfigNode()
                node = node[part]
        last = parts[-1]
        if isinstance(node, list):
            idx = int(last)
            if idx == len(node):
                node.append(_wrap(value))
            else:
                node[idx] = _wrap(value)
        else:
            node[last] = value
    return cfg


def derive_config(cfg: ConfigNode) -> ConfigNode:
    """Resolve derived fields before model construction.

    Mirrors the reference's ``DistillationTrainer._handle_config``
    (train.py:86-122): teacher embed dim lookup, default teacher feature key,
    patch-grid size from crop size, and per-ScaleKD-loss kwarg injection.
    """
    teacher_name = cfg.teacher.model_name
    if teacher_name not in TEACHER_DIMS:
        raise KeyError(
            f"Unknown teacher '{teacher_name}'; expected one of {sorted(TEACHER_DIMS)}"
        )
    cfg.teacher.out_dim = TEACHER_DIMS[teacher_name]
    cfg.teacher.teacher_key = cfg.teacher.get("teacher_key", "feature_map")
    crop = cfg.data_transform.global_crops_size
    if isinstance(crop, int):
        crop = [crop, crop]
        cfg.data_transform.global_crops_size = crop
    cfg.teacher.n_patches = [
        crop[0] // TEACHER_PATCH_SIZE,
        crop[1] // TEACHER_PATCH_SIZE,
    ]

    for loss in cfg.loss.losses:
        if loss.type == "scalekd":
            loss.kwargs.teacher_dims = cfg.teacher.out_dim
            loss.kwargs.pos_dims = cfg.teacher.out_dim
            loss.kwargs.pos_hw = [int(cfg.teacher.n_patches[0]), int(cfg.teacher.n_patches[1])]
            loss.kwargs.query_hw = [int(cfg.teacher.n_patches[0]), int(cfg.teacher.n_patches[1])]
    return cfg


def inject_student_dims(cfg: ConfigNode, feature_channels: Dict[str, int]) -> ConfigNode:
    """Inject per-loss ``student_dims`` from the student's channel table.

    Mirrors reference ``train.py:188-190``: the loss name encodes the feature
    level (``scalekd_res5`` → ``res5``) and student_dims comes from the
    wrapper's ``feature_channels`` property.
    """
    for loss in cfg.loss.losses:
        if loss.type == "scalekd":
            level = loss.kwargs.name.split("_")[1]
            loss.kwargs.student_dims = int(feature_channels[level])
    return cfg


def iter_scalekd_losses(cfg: ConfigNode) -> Iterator[ConfigNode]:
    for loss in cfg.loss.losses:
        if loss.type == "scalekd":
            yield loss
