"""Torch/pickle checkpoint importers: teacher weights + student init.

The reference pulled its teacher from torch.hub at runtime
(``models/backbones/dinov2.py:20``) and loaded student init weights from
detectron2-style ``.pkl`` / torch ``.pth`` files with per-family key remaps
(``train/distillation_module.py:381-438``). The hub dependency is dead in a
zero-egress TPU environment, so both paths become explicit host-side
importers into flax param/batch-stat trees.

Torch is used **only** here, on host, to deserialize ``.pth`` files — never
on the compute path.

Layout conversions:
  conv  OIHW -> HWIO            (depthwise: torch (C,1,kh,kw) -> (kh,kw,1,C))
  linear (out,in) -> (in,out)
  BN    weight/bias -> scale/bias (params); running_mean/var -> mean/var
        (batch_stats)

Per-family prefix handling (reference :413-424): stdc strips ``cp.backbone.``;
mit/darknet/mobilenet_v2/presnet strip ``backbone.``; mobilenet_v3 strips
``backbone.`` and drops ``classifier``; everything else loads as-is. Loads
are non-strict with logged missing/unexpected/matched key counts (:427-438).
"""

from __future__ import annotations

import pickle
import re
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from .logger import get_logger

logger = get_logger()


def load_raw_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pkl`` (detectron2 ``{'model': {k: ndarray}}``) or ``.pth``
    torch checkpoint as a flat {key: numpy} dict."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            ckpt = pickle.load(f, encoding="latin1")
        state = ckpt["model"] if "model" in ckpt else ckpt
    elif path.endswith(".pth") or path.endswith(".ckpt"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        state = ckpt.get("state_dict", ckpt.get("model", ckpt))
        state = {k: v for k, v in state.items()}
    else:
        raise ValueError(f"Unsupported checkpoint format: {path}")
    out = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


# --- tree plumbing ----------------------------------------------------------

def _flatten(tree: Any, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    flat = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            flat.update(_flatten(v, prefix + (k,)))
    else:
        flat[prefix] = tree
    return flat


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def apply_mapped_weights(
    template: Any,
    mapped: Dict[Tuple[str, ...], np.ndarray],
    *,
    what: str,
) -> Any:
    """Overlay mapped weights onto a template tree (non-strict: shape
    mismatches and unknown paths are reported, not fatal — reference uses
    ``strict=False``)."""
    import jax.numpy as jnp

    flat = _flatten(template)
    matched, missing, bad_shape = [], [], []
    unexpected = [p for p in mapped if p not in flat]
    for path, target in flat.items():
        if path not in mapped:
            missing.append(path)
            continue
        src = mapped[path]
        if (tuple(src.shape) != tuple(target.shape)
                and path[-1] == "relative_position_bias_table"
                and src.ndim == 2 and target.ndim == 2
                and src.shape[1] == target.shape[1]):
            # Swin rel-pos table from a different window / pretrain image
            # size: bicubic-resize the (2w-1, 2w-1) grid per head (reference
            # swin_wrapper.py:81-86 + swin.py:89-199 checkpoint adaptation)
            src = _resize_rel_pos_table(src, target.shape[0])
            logger.info(f"  resized rel-pos table at {'/'.join(path)} "
                        f"-> {tuple(src.shape)}")
        if tuple(src.shape) != tuple(target.shape):
            bad_shape.append((path, src.shape, tuple(target.shape)))
            continue
        flat[path] = jnp.asarray(src, dtype=target.dtype)
        matched.append(path)
    logger.info(
        f"{what}: matched {len(matched)} | missing {len(missing)} | "
        f"unexpected {len(unexpected)} | shape-mismatch {len(bad_shape)}")
    for p in missing[:20]:
        logger.info(f"  missing: {'/'.join(p)}")
    for p, s, t in bad_shape[:20]:
        logger.warning(f"  shape mismatch at {'/'.join(p)}: ckpt {s} vs model {t}")
    return _unflatten(flat)


def _torch_bicubic_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) 1-D weight matrix reproducing torch
    ``F.interpolate(mode='bicubic', align_corners=False)`` exactly:
    half-pixel centers, cubic-convolution kernel a=-0.75 (NOT the Keys
    a=-0.5 jax uses), 4 taps with border-clamped indices, no antialias."""
    a = -0.75

    def kernel(x):
        x = abs(x)
        if x <= 1:
            return ((a + 2) * x - (a + 3)) * x * x + 1
        if x < 2:
            return a * (((x - 5) * x + 8) * x - 4)
        return 0.0

    scale = in_size / out_size
    w = np.zeros((out_size, in_size), np.float32)
    for o in range(out_size):
        pos = (o + 0.5) * scale - 0.5
        i0 = int(np.floor(pos))
        t = pos - i0
        for k in range(-1, 3):
            idx = min(max(i0 + k, 0), in_size - 1)  # torch clamps taps
            w[o, idx] += kernel(t - k)
    return w


def _resize_rel_pos_table(src: np.ndarray, target_len: int) -> np.ndarray:
    """((2w'-1)^2, H) -> ((2w-1)^2, H): per-head bicubic resize of the
    relative-position-bias grid with exact torch
    ``F.interpolate(mode='bicubic')`` semantics (host-side numpy — runs
    once at load time). Reference checkpoint adaptation:
    swin_wrapper.py:81-86."""
    s1 = int(round(src.shape[0] ** 0.5))
    s2 = int(round(target_len ** 0.5))
    assert s1 * s1 == src.shape[0] and s2 * s2 == target_len, (
        src.shape, target_len)
    grid = np.asarray(src, np.float32).reshape(s1, s1, src.shape[1])
    w = _torch_bicubic_weights(s1, s2)
    out = np.einsum("oh,hwc->owc", w, grid)
    out = np.einsum("ow,hwc->hoc", w, out)
    return out.reshape(target_len, src.shape[1])


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO; depthwise (O,1,kh,kw) -> (kh,kw,1,O)."""
    if w.ndim != 4:
        return w
    if w.shape[1] == 1 and w.shape[0] > 1:
        return w.transpose(2, 3, 1, 0)
    return w.transpose(2, 3, 1, 0)


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    return w.T if w.ndim == 2 else w


# --- teacher ----------------------------------------------------------------

def map_dinov2_keys(state: Dict[str, np.ndarray]) -> Dict[Tuple[str, ...], np.ndarray]:
    """DINOv2 hub state_dict -> our flax teacher param paths
    (models/vit.py naming: patch_embed, blocks_N/{norm1,attn,ls1,norm2,mlp,ls2},
    norm, cls_token, pos_embed)."""
    mapped: Dict[Tuple[str, ...], np.ndarray] = {}
    for k, v in state.items():
        if k in ("cls_token", "pos_embed"):
            mapped[(k,)] = v
            continue
        if k == "mask_token":
            continue  # unused at inference
        if k.startswith("patch_embed.proj."):
            leaf = "kernel" if k.endswith("weight") else "bias"
            mapped[("patch_embed", leaf)] = _conv_kernel(v) if leaf == "kernel" else v
            continue
        if k in ("norm.weight", "norm.bias"):
            mapped[("norm", "scale" if k.endswith("weight") else "bias")] = v
            continue
        m = re.match(r"blocks\.(\d+)\.(.+)", k)
        if not m:
            logger.info(f"  teacher key skipped: {k}")
            continue
        blk, rest = f"blocks_{m.group(1)}", m.group(2)
        if rest.startswith("norm1.") or rest.startswith("norm2."):
            norm, leaf = rest.split(".")
            mapped[(blk, norm, "scale" if leaf == "weight" else "bias")] = v
        elif rest.startswith("attn.qkv.") or rest.startswith("attn.proj."):
            _, sub, leaf = rest.split(".")
            mapped[(blk, "attn", sub, "kernel" if leaf == "weight" else "bias")] = \
                _dense_kernel(v) if leaf == "weight" else v
        elif rest in ("ls1.gamma", "ls2.gamma"):
            ls, _ = rest.split(".")
            mapped[(blk, ls, "gamma")] = v
        elif rest.startswith("mlp."):
            parts = rest.split(".")  # mlp.fc1.weight | mlp.w12.weight ...
            sub, leaf = parts[1], parts[2]
            mapped[(blk, "mlp", sub, "kernel" if leaf == "weight" else "bias")] = \
                _dense_kernel(v) if leaf == "weight" else v
        else:
            logger.info(f"  teacher key skipped: {k}")
    return mapped


def load_dinov2_teacher(path: str, template_params: Any, model_name: str) -> Any:
    logger.info(f"Loading teacher weights from {path} ({model_name})")
    state = load_raw_state_dict(path)
    mapped = map_dinov2_keys(state)
    return apply_mapped_weights(template_params, mapped, what=f"teacher {model_name}")


# --- students ----------------------------------------------------------------

# family -> key translator: torch key -> (collection, flax path) or None.
# collection is "params" or "batch_stats".
_TRANSLATORS: Dict[str, Callable] = {}


def register_translator(family: str):
    def deco(fn):
        _TRANSLATORS[family] = fn
        return fn
    return deco


def _bn_leaf(leaf: str) -> Optional[Tuple[str, str]]:
    return {
        "weight": ("params", "scale"),
        "bias": ("params", "bias"),
        "running_mean": ("batch_stats", "mean"),
        "running_var": ("batch_stats", "var"),
    }.get(leaf)


@register_translator("resnet")
def _translate_resnet(key: str):
    """detectron2 R-XX.pkl: stem.conv1.{weight,norm.*},
    res{s}.{b}.{conv1,conv2,conv3,shortcut}.{weight,norm.*}
    -> our resnet.py naming (stem, res{s}_{b}/conv{i}/{conv,bn})."""
    m = re.match(r"stem\.conv1\.(.+)", key)
    if m:
        rest = m.group(1)
        if rest == "weight":
            return ("params", ("stem", "conv", "kernel"), _conv_kernel)
        m2 = re.match(r"norm\.(.+)", rest)
        if m2:
            hit = _bn_leaf(m2.group(1))
            if hit:
                return (hit[0], ("stem", "bn", hit[1]), None)
        return None
    m = re.match(r"res(\d)\.(\d+)\.(conv\d|shortcut)\.(.+)", key)
    if m:
        stage, block, conv, rest = m.groups()
        base = (f"res{stage}_{block}", conv)
        if rest == "weight":
            return ("params", base + ("conv", "kernel"), _conv_kernel)
        m2 = re.match(r"norm\.(.+)", rest)
        if m2:
            hit = _bn_leaf(m2.group(1))
            if hit:
                return (hit[0], base + ("bn", hit[1]), None)
    return None


@register_translator("stdc")
def _translate_stdc(key: str):
    """STDCNet pkl/pth (after stripping ``cp.backbone.``):
    features.N.conv.* / features.N.bn.* (stems),
    features.N.conv_list.M.{conv,bn}.*,
    features.N.avd_layer.{0,1}.*, features.N.skip.* (cat: AvgPool has no
    params; add: skip.{0,1,2,3})."""
    m = re.match(r"features\.(\d+)\.(.+)", key)
    if not m:
        return None
    feat = f"features_{int(m.group(1))}"
    rest = m.group(2)

    m2 = re.match(r"conv\.(.+)", rest)
    if m2 and m2.group(1) == "weight":
        return ("params", (feat, "conv", "kernel"), _conv_kernel)
    m2 = re.match(r"bn\.(.+)", rest)
    if m2:
        hit = _bn_leaf(m2.group(1))
        if hit:
            return (hit[0], (feat, "bn", hit[1]), None)

    m2 = re.match(r"conv_list\.(\d+)\.conv\.weight$", rest)
    if m2:
        return ("params", (feat, f"conv_{m2.group(1)}", "conv", "kernel"), _conv_kernel)
    m2 = re.match(r"conv_list\.(\d+)\.bn\.(.+)", rest)
    if m2:
        hit = _bn_leaf(m2.group(2))
        if hit:
            return (hit[0], (feat, f"conv_{m2.group(1)}", "bn", hit[1]), None)

    m2 = re.match(r"avd_layer\.0\.weight$", rest)
    if m2:
        return ("params", (feat, "avd_conv", "kernel"), _conv_kernel)
    m2 = re.match(r"avd_layer\.1\.(.+)", rest)
    if m2:
        hit = _bn_leaf(m2.group(1))
        if hit:
            return (hit[0], (feat, "avd_bn", hit[1]), None)

    # AddBottleneck skip: Sequential(dwconv, bn, pwconv, bn)
    m2 = re.match(r"skip\.(\d)\.(.+)", rest)
    if m2:
        idx, leaf = m2.groups()
        names = {"0": ("skip_dw", "kernel"), "2": ("skip_pw", "kernel")}
        if leaf == "weight" and idx in names:
            mod, _ = names[idx]
            return ("params", (feat, mod, "kernel"), _conv_kernel)
        bn_names = {"1": "skip_dw_bn", "3": "skip_pw_bn"}
        hit = _bn_leaf(leaf)
        if hit and idx in bn_names:
            return (hit[0], (feat, bn_names[idx], hit[1]), None)
    return None


_PREFIX_STRIP = {
    # reference distillation_module.py:413-424
    "stdc": "cp.backbone.",
    "mit": "backbone.",
    "darknet": "backbone.",
    "mobilenet_v2": "backbone.",
    "presnet": "backbone.",
    "mobilenet_v3": "backbone.",
}


def get_translator(model_name: str):
    """Resolve the forward translator for a model (some families need the
    variant's layout: mobilenet_v3 block tables, edgenext stage split)."""
    from ..models.zoo import family_id
    from . import translators as T  # registers the static families

    fam = family_id(model_name)
    if fam == "mobilenet_v3":
        size = "small" if "small" in model_name else "large"
        return fam, T.make_mobilenet_v3_translator(size)[0]
    if fam == "edgenext":
        from ..models.backbones.edgenext import _VARIANTS

        v = _VARIANTS[model_name]
        return fam, T.make_edgenext_translator(v["depths"], (0, 1, 1, 1))[0]
    if fam == "mobilenetv3":
        # timm-format layout (reference models/backbones/timm.py:270-274)
        size = "small" if "small" in model_name else "large"
        return fam, T.make_timm_mobilenetv3_translator(size)[0]
    translator = _TRANSLATORS.get(fam)
    if translator is None:
        raise NotImplementedError(
            f"No weight translator registered for family '{fam}'")
    return fam, translator


def load_student_checkpoint(
    path: str,
    model_name: str,
    template_params: Any,
    template_stats: Any,
) -> Tuple[Any, Any]:
    """Returns (params, batch_stats) with imported weights overlaid."""
    fam, translator = get_translator(model_name)
    logger.info(f"Loading student checkpoint from: {path} (family {fam})")
    state = load_raw_state_dict(path)

    strip = _PREFIX_STRIP.get(fam)
    if strip:
        state = {k.replace(strip, ""): v for k, v in state.items()}
    if fam == "mobilenet_v3":
        state = {k: v for k, v in state.items() if "classifier" not in k}

    mapped_params: Dict[Tuple[str, ...], np.ndarray] = {}
    mapped_stats: Dict[Tuple[str, ...], np.ndarray] = {}
    untranslated = []
    for k, v in state.items():
        hit = translator(k)
        if hit is None:
            if "num_batches_tracked" not in k:
                untranslated.append(k)
            continue
        collection, flax_path, transform = hit
        v2 = transform(v) if transform else v
        # our student tree roots at 'backbone' inside the wrapper
        full_path = ("backbone",) + tuple(flax_path)
        (mapped_params if collection == "params" else mapped_stats)[full_path] = v2
    if untranslated:
        logger.info(f"  {len(untranslated)} untranslated checkpoint keys "
                    f"(first: {untranslated[:5]})")

    params = apply_mapped_weights(template_params, mapped_params,
                                  what=f"student {model_name} params")
    stats = apply_mapped_weights(template_stats, mapped_stats,
                                 what=f"student {model_name} batch_stats") \
        if template_stats else template_stats
    return params, stats
