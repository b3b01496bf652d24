"""Student model zoo — factory, registry, and the resize-to-teacher-grid wrapper.

TPU-native counterpart of the reference ``models/model_zoo.py``: a registry of
backbone families keyed by the first token of ``model_name`` (``mobilenet``
special-cased to include its version — reference :83-88), and a wrapper whose
keystone contract is **bilinear-resizing every requested feature level to the
teacher patch grid** with ``align_corners=False`` semantics
(reference :116-129). All maps are NHWC.

Backbone module contract (replaces reference ``models/wrappers/base.py:6-17``):
each family module exposes ``build(model_name, dtype) -> (flax.linen.Module,
feature_channels: Dict[str, int])`` where the module's ``__call__(x, train)``
returns ``{'res2'..'res5': (B, H, W, C)}``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import resize_nhwc

# Family id -> builder. Populated lazily to keep imports cheap; families are
# the reference MODEL_MAP keys (model_zoo.py:59-74).
_BUILDERS: Dict[str, Callable[..., Tuple[nn.Module, Dict[str, int]]]] = {}


def register_family(name: str):
    def deco(fn):
        _BUILDERS[name] = fn
        return fn
    return deco


# (family key, backbone module, builder attribute). The last three are the
# reference's timm family (timm_wrapper.py:6-21) as native ports.
_FAMILY_TABLE = [
    ("resnet", "resnet", "build"),
    ("stdc", "stdc", "build"),
    ("convnext", "convnext", "build"),
    ("darknet", "darknet", "build"),
    ("mit", "mit", "build"),
    ("mobilenet_v2", "mobilenet_v2", "build"),
    ("mobilenet_v3", "mobilenet_v3", "build"),
    ("presnet", "presnet", "build"),
    ("swin", "swin", "build"),
    ("efficientnet", "efficientnet", "build"),
    ("edgenext", "edgenext", "build"),
    ("mobilenetv3", "mobilenet_v3", "build_timm_style"),
]


def _load_builders():
    if _BUILDERS:
        return
    import importlib

    for key, mod_name, attr in _FAMILY_TABLE:
        try:
            mod = importlib.import_module(f".backbones.{mod_name}", package=__package__)
        except ImportError:
            continue  # family not built yet
        if hasattr(mod, attr):
            _BUILDERS[key] = getattr(mod, attr)


def family_id(model_name: str) -> str:
    """Parse the registry key out of a model name (reference :83-88)."""
    model_id = model_name.split("_")[0].lower()
    if model_id == "mobilenet":
        model_id = model_id + "_" + model_name.split("_")[1].lower()
    return model_id


class StudentWrapper(nn.Module):
    """Backbone + resize-to-teacher-grid (reference ModelWrapper :97-129)."""

    backbone: nn.Module
    n_patches: Tuple[int, int]
    target_features: Tuple[str, ...]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> Dict[str, jnp.ndarray]:
        features = self.backbone(x, train)
        matched: Dict[str, jnp.ndarray] = {}
        for feat in self.target_features:
            if feat in features:
                matched[feat] = resize_nhwc(
                    features[feat], (self.n_patches[0], self.n_patches[1]), "bilinear"
                )
        return matched


def create_student(
    model_name: str,
    n_patches,
    target_features: List[str],
    dtype: Any = jnp.bfloat16,
    backbone_kwargs: Dict[str, Any] | None = None,
) -> Tuple[StudentWrapper, Dict[str, int]]:
    """Instantiate a wrapped student; returns (module, feature_channels).

    ``backbone_kwargs`` forwards family-specific options to the builder
    (today: resnet's ``norm`` / ``freeze_at`` — reference
    resnet_wrapper.py:62-74); families that don't accept them raise."""
    _load_builders()
    fid = family_id(model_name)
    if fid not in _BUILDERS:
        raise KeyError(f"Unknown student family '{fid}' (from '{model_name}'); "
                       f"known: {sorted(_BUILDERS)}")
    backbone, channels = _BUILDERS[fid](model_name, dtype=dtype,
                                        **(backbone_kwargs or {}))
    wrapper = StudentWrapper(
        backbone=backbone,
        n_patches=tuple(int(p) for p in n_patches),
        target_features=tuple(target_features),
    )
    return wrapper, channels


def freeze_mask_fn(model_name: str, backbone_kwargs: Dict[str, Any] | None):
    """Optimizer freeze mask for ``optim.create_optimizer(freeze_mask=...)``:
    callable(params)->bool tree, True where the reference's freeze
    machinery (freeze_at / FrozenBN) excludes a param from training.
    Returns None when nothing is frozen (the reference's shipped configs)."""
    kw = backbone_kwargs or {}
    norm = str(kw.get("norm", "BN"))
    freeze_at = int(kw.get("freeze_at", 0) or 0)
    if norm != "FrozenBN" and freeze_at <= 0:
        return None
    if family_id(model_name) != "resnet":
        raise NotImplementedError(
            "freeze_at/FrozenBN masking is implemented for the resnet family "
            "(the only family whose reference wrapper exposes them)")
    from .backbones.resnet import frozen_path_predicate

    pred = frozen_path_predicate(norm, freeze_at)

    def mask(params):
        import jax

        def leaf_mask(path, _):
            segs = [getattr(p, "key", getattr(p, "name", str(p)))
                    for p in path]
            # paths look like ('student','backbone','stem','bn','scale') in
            # the full train tree, or start at the backbone in unit tests
            if "backbone" in segs:
                segs = segs[segs.index("backbone") + 1:]
            return pred(segs)

        return jax.tree_util.tree_map_with_path(leaf_mask, params)

    return mask


def available_families() -> List[str]:
    _load_builders()
    return sorted(_BUILDERS)
