"""Per-family torch-key <-> flax-path translators (the long tail).

Companion to torch_import.py (which holds the machinery plus the resnet/stdc
translators). Each family's forward translator maps a torch state-dict key
(as found in the reference's init checkpoints — sources cited per family) to
``(collection, flax_path, transform)``; each inverse maps a flax path back to
the torch key for the Anyma/detectron2 export.

Leaf conventions (see torch_import.py): conv OIHW->HWIO, linear transposed,
BN weight/bias/running_mean/running_var -> scale/bias + batch_stats
mean/var, LayerNorm weight->scale.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

from .torch_import import (
    _bn_leaf,
    _conv_kernel,
    _dense_kernel,
    register_translator,
)

_BN_INV = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}


def _ln(leaf: str) -> Optional[str]:
    return {"weight": "scale", "bias": "bias"}.get(leaf)


# --------------------------------------------------------------------------
# ConvNeXt-V2 (reference models/backbones/convnext.py:90-167)
# torch: downsample_layers.0.{0=conv,1=LN}; downsample_layers.i.{0=LN,1=conv};
#        stages.{i}.{j}.{dwconv,norm,pwconv1,grn,pwconv2}
# flax:  stem_conv, stem_norm, downsample_norm_i, downsample_conv_i,
#        stage_{i}_block_{j}/{dwconv,norm,pwconv1,grn,pwconv2}
# --------------------------------------------------------------------------

@register_translator("convnext")
def translate_convnext(key: str):
    m = re.match(r"downsample_layers\.(\d)\.(\d)\.(weight|bias)", key)
    if m:
        i, sub, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
        if i == 0:
            if sub == 0:  # stem conv
                return ("params", ("stem_conv", "kernel" if leaf == "weight" else "bias"),
                        _conv_kernel if leaf == "weight" else None)
            return ("params", ("stem_norm", _ln(leaf)), None)
        if sub == 0:  # LN
            return ("params", (f"downsample_norm_{i}", _ln(leaf)), None)
        return ("params", (f"downsample_conv_{i}", "kernel" if leaf == "weight" else "bias"),
                _conv_kernel if leaf == "weight" else None)

    m = re.match(r"stages\.(\d)\.(\d+)\.(dwconv|norm|pwconv1|grn|pwconv2)\.(weight|bias|gamma|beta)", key)
    if m:
        i, j, mod, leaf = m.groups()
        base = (f"stage_{i}_block_{j}", mod)
        if mod == "dwconv":
            return ("params", base + ("kernel" if leaf == "weight" else "bias",),
                    _conv_kernel if leaf == "weight" else None)
        if mod == "norm":
            return ("params", base + (_ln(leaf),), None)
        if mod in ("pwconv1", "pwconv2"):
            return ("params", base + ("kernel" if leaf == "weight" else "bias",),
                    _dense_kernel if leaf == "weight" else None)
        if mod == "grn":  # gamma/beta shaped (1,1,1,C) both sides
            return ("params", base + (leaf,), None)
    return None


def inverse_convnext(path: Tuple[str, ...], collection: str) -> Optional[str]:
    mod = path[0]
    if mod == "stem_conv":
        return f"downsample_layers.0.0.{'weight' if path[1] == 'kernel' else 'bias'}"
    if mod == "stem_norm":
        return f"downsample_layers.0.1.{'weight' if path[1] == 'scale' else 'bias'}"
    m = re.match(r"downsample_norm_(\d)", mod)
    if m:
        return f"downsample_layers.{m.group(1)}.0.{'weight' if path[1] == 'scale' else 'bias'}"
    m = re.match(r"downsample_conv_(\d)", mod)
    if m:
        return f"downsample_layers.{m.group(1)}.1.{'weight' if path[1] == 'kernel' else 'bias'}"
    m = re.match(r"stage_(\d)_block_(\d+)", mod)
    if m:
        sub = path[1]
        leaf = path[2]
        tleaf = {"kernel": "weight", "scale": "weight", "bias": "bias",
                 "gamma": "gamma", "beta": "beta"}[leaf]
        return f"stages.{m.group(1)}.{m.group(2)}.{sub}.{tleaf}"
    return None


# --------------------------------------------------------------------------
# DarkNet / YOLOv8 (reference models/backbones/darknet.py:114-166)
# torch: p1.0.{conv,bn}; p{s}.0.{conv,bn}; p{s}.1.{cv1,cv2}.{conv,bn};
#        p{s}.1.m.{i}.{cv1,cv2}.{conv,bn}
# flax:  p1_conv/{conv,bn}; p{s}_conv; p{s}_c2f/{cv1,cv2,m_{i}/{cv1,cv2}}
# --------------------------------------------------------------------------

@register_translator("darknet")
def translate_darknet(key: str):
    m = re.match(r"p(\d)\.(\d)\.(.+)", key)
    if not m:
        return None
    stage, idx, rest = int(m.group(1)), int(m.group(2)), m.group(3)

    def conv_cell(base: Tuple[str, ...], rest: str):
        m2 = re.match(r"conv\.(weight)$", rest)
        if m2:
            return ("params", base + ("conv", "kernel"), _conv_kernel)
        m2 = re.match(r"bn\.(.+)", rest)
        if m2:
            hit = _bn_leaf(m2.group(1))
            if hit:
                return (hit[0], base + ("bn", hit[1]), None)
        return None

    if idx == 0:
        return conv_cell((f"p{stage}_conv",), rest)
    # idx == 1: the C2f
    m2 = re.match(r"(cv1|cv2)\.(.+)", rest)
    if m2:
        return conv_cell((f"p{stage}_c2f", m2.group(1)), m2.group(2))
    m2 = re.match(r"m\.(\d+)\.(cv1|cv2)\.(.+)", rest)
    if m2:
        return conv_cell((f"p{stage}_c2f", f"m_{m2.group(1)}", m2.group(2)), m2.group(3))
    return None


def inverse_darknet(path: Tuple[str, ...], collection: str) -> Optional[str]:
    def cell(rest: Tuple[str, ...]):
        if rest[0] == "conv":
            return "conv.weight"
        if rest[0] == "bn":
            return f"bn.{_BN_INV[rest[1]]}"
        return None

    m = re.match(r"p(\d)_conv", path[0])
    if m:
        c = cell(path[1:])
        return f"p{m.group(1)}.0.{c}" if c else None
    m = re.match(r"p(\d)_c2f", path[0])
    if m:
        if path[1] in ("cv1", "cv2"):
            c = cell(path[2:])
            return f"p{m.group(1)}.1.{path[1]}.{c}" if c else None
        m2 = re.match(r"m_(\d+)", path[1])
        if m2:
            c = cell(path[3:])
            return f"p{m.group(1)}.1.m.{m2.group(1)}.{path[2]}.{c}" if c else None
    return None


# --------------------------------------------------------------------------
# MiT / SegFormer (reference models/backbones/mit.py:272-522)
# torch: patch_embed{s}.{proj,norm}; block{s}.{j}.{norm1, attn.{q,kv,proj,
#        sr,norm}, norm2, mlp.{fc1, dwconv.dwconv, fc2}}; norm{s}
# flax:  patch_embed{s}, patch_norm{s}, block{s}_{j}/{norm1, attn/{q,kv,sr,
#        norm,proj}, norm2, mlp/{fc1,dwconv,fc2}}, norm{s}
# --------------------------------------------------------------------------

@register_translator("mit")
def translate_mit(key: str):
    m = re.match(r"patch_embed(\d)\.proj\.(weight|bias)", key)
    if m:
        return ("params", (f"patch_embed{m.group(1)}",
                           "kernel" if m.group(2) == "weight" else "bias"),
                _conv_kernel if m.group(2) == "weight" else None)
    m = re.match(r"patch_embed(\d)\.norm\.(weight|bias)", key)
    if m:
        return ("params", (f"patch_norm{m.group(1)}", _ln(m.group(2))), None)
    m = re.match(r"norm(\d)\.(weight|bias)", key)
    if m:
        return ("params", (f"norm{m.group(1)}", _ln(m.group(2))), None)
    m = re.match(r"block(\d)\.(\d+)\.(.+)", key)
    if not m:
        return None
    base = (f"block{m.group(1)}_{m.group(2)}",)
    rest = m.group(3)
    m2 = re.match(r"(norm1|norm2)\.(weight|bias)", rest)
    if m2:
        return ("params", base + (m2.group(1), _ln(m2.group(2))), None)
    m2 = re.match(r"attn\.(q|kv|proj)\.(weight|bias)", rest)
    if m2:
        return ("params", base + ("attn", m2.group(1),
                                  "kernel" if m2.group(2) == "weight" else "bias"),
                _dense_kernel if m2.group(2) == "weight" else None)
    m2 = re.match(r"attn\.sr\.(weight|bias)", rest)
    if m2:
        return ("params", base + ("attn", "sr",
                                  "kernel" if m2.group(1) == "weight" else "bias"),
                _conv_kernel if m2.group(1) == "weight" else None)
    m2 = re.match(r"attn\.norm\.(weight|bias)", rest)
    if m2:
        return ("params", base + ("attn", "norm", _ln(m2.group(1))), None)
    m2 = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)", rest)
    if m2:
        return ("params", base + ("mlp", m2.group(1),
                                  "kernel" if m2.group(2) == "weight" else "bias"),
                _dense_kernel if m2.group(2) == "weight" else None)
    m2 = re.match(r"mlp\.dwconv\.dwconv\.(weight|bias)", rest)
    if m2:
        return ("params", base + ("mlp", "dwconv",
                                  "kernel" if m2.group(1) == "weight" else "bias"),
                _conv_kernel if m2.group(1) == "weight" else None)
    return None


def inverse_mit(path: Tuple[str, ...], collection: str) -> Optional[str]:
    p0 = path[0]
    m = re.match(r"patch_embed(\d)$", p0)
    if m:
        return f"patch_embed{m.group(1)}.proj." + ("weight" if path[1] == "kernel" else "bias")
    m = re.match(r"patch_norm(\d)$", p0)
    if m:
        return f"patch_embed{m.group(1)}.norm." + ("weight" if path[1] == "scale" else "bias")
    m = re.match(r"norm(\d)$", p0)
    if m:
        return f"norm{m.group(1)}." + ("weight" if path[1] == "scale" else "bias")
    m = re.match(r"block(\d)_(\d+)", p0)
    if m:
        prefix = f"block{m.group(1)}.{m.group(2)}"
        rest = path[1:]
        lf = {"kernel": "weight", "scale": "weight", "bias": "bias"}
        if rest[0] in ("norm1", "norm2"):
            return f"{prefix}.{rest[0]}.{lf[rest[1]]}"
        if rest[0] == "attn":
            if rest[1] in ("q", "kv", "proj", "sr", "norm"):
                return f"{prefix}.attn.{rest[1]}.{lf[rest[2]]}"
        if rest[0] == "mlp":
            if rest[1] == "dwconv":
                return f"{prefix}.mlp.dwconv.dwconv.{lf[rest[2]]}"
            return f"{prefix}.mlp.{rest[1]}.{lf[rest[2]]}"
    return None


# --------------------------------------------------------------------------
# MobileNetV2, mmdet-style (reference models/backbones/mobilenet_v2.py)
# torch: conv1.weight + conv1.norm.*; layer{i}.{j}.conv.{k}.weight +
#        .conv.{k}.norm.* (k: 0=expand,1=dw,2=project; 2 entries w/o expand)
# flax:  conv1/{conv,bn}; layer{i}_{j}/{expand,dw,project}/{conv,bn}
# --------------------------------------------------------------------------

_MNV2_EXPAND1_LAYERS = {1}  # layer1 has expand_ratio 1 (arch_settings row 0)


@register_translator("mobilenet_v2")
def translate_mobilenet_v2(key: str):
    m = re.match(r"conv1\.(.+)", key)
    if m:
        rest = m.group(1)
        if rest == "weight":
            return ("params", ("conv1", "conv", "kernel"), _conv_kernel)
        m2 = re.match(r"norm\.(.+)", rest)
        if m2:
            hit = _bn_leaf(m2.group(1))
            if hit:
                return (hit[0], ("conv1", "bn", hit[1]), None)
        return None
    m = re.match(r"layer(\d)\.(\d+)\.conv\.(\d)\.(.+)", key)
    if not m:
        return None
    li, bj, k, rest = int(m.group(1)), m.group(2), int(m.group(3)), m.group(4)
    names = ["dw", "project"] if li in _MNV2_EXPAND1_LAYERS else ["expand", "dw", "project"]
    if k >= len(names):
        return None
    base = (f"layer{li}_{bj}", names[k])
    if rest == "weight":
        return ("params", base + ("conv", "kernel"), _conv_kernel)
    m2 = re.match(r"norm\.(.+)", rest)
    if m2:
        hit = _bn_leaf(m2.group(1))
        if hit:
            return (hit[0], base + ("bn", hit[1]), None)
    return None


def inverse_mobilenet_v2(path: Tuple[str, ...], collection: str) -> Optional[str]:
    if path[0] == "conv1":
        if path[1] == "conv":
            return "conv1.weight"
        return f"conv1.norm.{_BN_INV[path[2]]}"
    m = re.match(r"layer(\d)_(\d+)", path[0])
    if m:
        li = int(m.group(1))
        names = ["dw", "project"] if li in _MNV2_EXPAND1_LAYERS else ["expand", "dw", "project"]
        if path[1] not in names:
            return None
        k = names.index(path[1])
        prefix = f"layer{li}.{m.group(2)}.conv.{k}"
        if path[2] == "conv":
            return f"{prefix}.weight"
        return f"{prefix}.norm.{_BN_INV[path[3]]}"
    return None


# --------------------------------------------------------------------------
# MobileNetV3, torchvision (reference models/backbones/mobilenet_v3.py)
# torch: features.0.{0=conv,1=bn}; features.{i}.block.{k}.{0=conv,1=bn} and
#        block.{k}.{fc1,fc2} for SE; features.{last}.{0,1}
# flax:  stem_{conv,bn}; block_{i-1}/{expand_*,dw_*,se/{fc1,fc2},project_*};
#        lastconv{,_bn}
# --------------------------------------------------------------------------

def _mnv3_block_submodules(has_expand: bool, has_se: bool):
    mods = []
    if has_expand:
        mods.append("expand")
    mods.append("dw")
    if has_se:
        mods.append("se")
    mods.append("project")
    return mods


def make_mobilenet_v3_translator(size: str):
    from ..models.backbones.mobilenet_v3 import _conf

    blocks, _last = _conf(size, False)
    layouts = [
        _mnv3_block_submodules(b.expanded != b.in_ch, b.use_se) for b in blocks
    ]
    n_feats = len(blocks) + 2  # stem + blocks + lastconv

    def translate(key: str):
        m = re.match(r"features\.(\d+)\.(.+)", key)
        if not m:
            return None
        fi, rest = int(m.group(1)), m.group(2)
        if fi == 0 or fi == n_feats - 1:
            prefix = "stem" if fi == 0 else "lastconv"
            m2 = re.match(r"(\d)\.(.+)", rest)
            if not m2:
                return None
            sub, leaf = int(m2.group(1)), m2.group(2)
            if sub == 0 and leaf == "weight":
                name = "stem_conv" if fi == 0 else "lastconv"
                return ("params", (name, "kernel"), _conv_kernel)
            if sub == 1:
                hit = _bn_leaf(leaf)
                if hit:
                    name = "stem_bn" if fi == 0 else "lastconv_bn"
                    return (hit[0], (name, hit[1]), None)
            return None
        bi = fi - 1
        layout = layouts[bi]
        m2 = re.match(r"block\.(\d)\.(.+)", rest)
        if not m2:
            return None
        k, rest2 = int(m2.group(1)), m2.group(2)
        if k >= len(layout):
            return None
        mod = layout[k]
        base = (f"block_{bi}",)
        if mod == "se":
            m3 = re.match(r"(fc1|fc2)\.(weight|bias)", rest2)
            if m3:
                return ("params", base + ("se", m3.group(1),
                                          "kernel" if m3.group(2) == "weight" else "bias"),
                        _conv_kernel if m3.group(2) == "weight" else None)
            return None
        m3 = re.match(r"(\d)\.(.+)", rest2)
        if not m3:
            return None
        sub, leaf = int(m3.group(1)), m3.group(2)
        if sub == 0 and leaf == "weight":
            return ("params", base + (f"{mod}_conv", "kernel"), _conv_kernel)
        if sub == 1:
            hit = _bn_leaf(leaf)
            if hit:
                return (hit[0], base + (f"{mod}_bn", hit[1]), None)
        return None

    def inverse(path: Tuple[str, ...], collection: str) -> Optional[str]:
        p0 = path[0]
        if p0 in ("stem_conv", "stem_bn", "lastconv", "lastconv_bn"):
            fi = 0 if p0.startswith("stem") else n_feats - 1
            if p0.endswith("_bn"):
                return f"features.{fi}.1.{_BN_INV[path[1]]}"
            return f"features.{fi}.0.weight"
        m = re.match(r"block_(\d+)", p0)
        if m:
            bi = int(m.group(1))
            layout = layouts[bi]
            sub = path[1]
            if sub == "se":
                return f"features.{bi + 1}.block.{layout.index('se')}.{path[2]}." + \
                    ("weight" if path[3] == "kernel" else "bias")
            mod = sub.rsplit("_", 1)[0]  # expand_conv -> expand
            if mod not in layout:
                return None
            k = layout.index(mod)
            if sub.endswith("_conv"):
                return f"features.{bi + 1}.block.{k}.0.weight"
            return f"features.{bi + 1}.block.{k}.1.{_BN_INV[path[2]]}"
        return None

    return translate, inverse


# --------------------------------------------------------------------------
# PResNet (reference models/backbones/presnet.py)
# torch: conv1.conv1_{1,2,3}.{conv,norm}; res_layers.{i}.blocks.{j}.
#        branch2{a,b,c}.{conv,norm}; .short.{conv,norm} or .short.conv.{conv,norm}
# flax:  conv1_{1,2,3}/{conv,bn}; res{s}_{j}/{branch2a..c,short,short_conv}/{conv,bn}
# --------------------------------------------------------------------------

@register_translator("presnet")
def translate_presnet(key: str):
    def cell(base, rest):
        if rest == "conv.weight":
            return ("params", base + ("conv", "kernel"), _conv_kernel)
        m2 = re.match(r"norm\.(.+)", rest)
        if m2:
            hit = _bn_leaf(m2.group(1))
            if hit:
                return (hit[0], base + ("bn", hit[1]), None)
        return None

    m = re.match(r"conv1\.conv1_(\d)\.(.+)", key)
    if m:
        return cell((f"conv1_{m.group(1)}",), m.group(2))
    m = re.match(r"res_layers\.(\d)\.blocks\.(\d+)\.(.+)", key)
    if not m:
        return None
    stage = int(m.group(1)) + 2
    base0 = f"res{stage}_{m.group(2)}"
    rest = m.group(3)
    m2 = re.match(r"(branch2[abc])\.(.+)", rest)
    if m2:
        return cell((base0, m2.group(1)), m2.group(2))
    # variant-d pool+conv shortcut nests a ConvNormLayer under 'short.conv'
    # (short.conv.conv.weight / short.conv.norm.*); the plain projection
    # shortcut is the ConvNormLayer itself (short.conv.weight / short.norm.*)
    m2 = re.match(r"short\.conv\.(conv\.weight|norm\..+)", rest)
    if m2:
        return cell((base0, "short_conv"), m2.group(1))
    m2 = re.match(r"short\.(conv\.weight|norm\..+)", rest)
    if m2:
        return cell((base0, "short"), m2.group(1))
    return None


def inverse_presnet(path: Tuple[str, ...], collection: str) -> Optional[str]:
    def cell(rest):
        if rest[0] == "conv":
            return "conv.weight"
        if rest[0] == "bn":
            return f"norm.{_BN_INV[rest[1]]}"
        return None

    m = re.match(r"conv1_(\d)", path[0])
    if m:
        c = cell(path[1:])
        return f"conv1.conv1_{m.group(1)}.{c}" if c else None
    m = re.match(r"res(\d)_(\d+)", path[0])
    if m:
        prefix = f"res_layers.{int(m.group(1)) - 2}.blocks.{m.group(2)}"
        sub = path[1]
        c = cell(path[2:])
        if c is None:
            return None
        if sub.startswith("branch2"):
            return f"{prefix}.{sub}.{c}"
        if sub == "short_conv":
            return f"{prefix}.short.conv.{c}"
        if sub == "short":
            return f"{prefix}.short.{c}"
    return None


# --------------------------------------------------------------------------
# Swin (reference models/backbones/swin.py:541-732)
# torch: patch_embed.{proj,norm}; layers.{i}.blocks.{j}.{norm1, attn.{qkv,
#        proj,relative_position_bias_table}, norm2, mlp.{fc1,fc2}};
#        layers.{i}.downsample.{norm,reduction}; norm{i} (stage out norms)
# flax:  patch_embed, patch_norm; stage{i}_block{j}/{norm1, attn/{qkv,proj,
#        relative_position_bias_table}, norm2, mlp_fc1, mlp_fc2};
#        downsample{i}/{norm,reduction}; out_norm{i}
# --------------------------------------------------------------------------

@register_translator("swin")
def translate_swin(key: str):
    if key.startswith("patch_embed.proj."):
        leaf = key.rsplit(".", 1)[1]
        return ("params", ("patch_embed", "kernel" if leaf == "weight" else "bias"),
                _conv_kernel if leaf == "weight" else None)
    if key.startswith("patch_embed.norm."):
        return ("params", ("patch_norm", _ln(key.rsplit(".", 1)[1])), None)
    m = re.match(r"norm(\d)\.(weight|bias)", key)
    if m:
        return ("params", (f"out_norm{m.group(1)}", _ln(m.group(2))), None)
    m = re.match(r"layers\.(\d)\.downsample\.(norm|reduction)\.(weight|bias)", key)
    if m:
        i, sub, leaf = m.groups()
        if sub == "norm":
            return ("params", (f"downsample{i}", "norm", _ln(leaf)), None)
        return ("params", (f"downsample{i}", "reduction", "kernel"), _dense_kernel)
    m = re.match(r"layers\.(\d)\.blocks\.(\d+)\.(.+)", key)
    if not m:
        return None
    base0 = f"stage{m.group(1)}_block{m.group(2)}"
    rest = m.group(3)
    m2 = re.match(r"(norm1|norm2)\.(weight|bias)", rest)
    if m2:
        return ("params", (base0, m2.group(1), _ln(m2.group(2))), None)
    if rest == "attn.relative_position_bias_table":
        return ("params", (base0, "attn", "relative_position_bias_table"), None)
    if rest == "attn.relative_position_index":
        return None  # static buffer, recomputed
    m2 = re.match(r"attn\.(qkv|proj)\.(weight|bias)", rest)
    if m2:
        return ("params", (base0, "attn", m2.group(1),
                           "kernel" if m2.group(2) == "weight" else "bias"),
                _dense_kernel if m2.group(2) == "weight" else None)
    m2 = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)", rest)
    if m2:
        return ("params", (base0, f"mlp_{m2.group(1)}",
                           "kernel" if m2.group(2) == "weight" else "bias"),
                _dense_kernel if m2.group(2) == "weight" else None)
    return None


def inverse_swin(path: Tuple[str, ...], collection: str) -> Optional[str]:
    lf = {"kernel": "weight", "scale": "weight", "bias": "bias"}
    if path[0] == "patch_embed":
        return f"patch_embed.proj.{lf[path[1]]}"
    if path[0] == "patch_norm":
        return f"patch_embed.norm.{lf[path[1]]}"
    m = re.match(r"out_norm(\d)", path[0])
    if m:
        return f"norm{m.group(1)}.{lf[path[1]]}"
    m = re.match(r"downsample(\d)", path[0])
    if m:
        if path[1] == "norm":
            return f"layers.{m.group(1)}.downsample.norm.{lf[path[2]]}"
        return f"layers.{m.group(1)}.downsample.reduction.weight"
    m = re.match(r"stage(\d)_block(\d+)", path[0])
    if m:
        prefix = f"layers.{m.group(1)}.blocks.{m.group(2)}"
        rest = path[1:]
        if rest[0] in ("norm1", "norm2"):
            return f"{prefix}.{rest[0]}.{lf[rest[1]]}"
        if rest[0] == "attn":
            if rest[1] == "relative_position_bias_table":
                return f"{prefix}.attn.relative_position_bias_table"
            return f"{prefix}.attn.{rest[1]}.{lf[rest[2]]}"
        if rest[0] in ("mlp_fc1", "mlp_fc2"):
            return f"{prefix}.mlp.{rest[0][4:]}.{lf[rest[1]]}"
    return None


# --------------------------------------------------------------------------
# EfficientNet (timm naming; reference loaded these via
# timm.create_model(pretrained=True) — models/backbones/timm.py:270-272)
# torch: conv_stem, bn1; blocks.{s}.{b}.{conv_pw,bn1,conv_dw,bn2,
#        se.conv_reduce,se.conv_expand,conv_pwl,bn3} (stage0: conv_dw,bn1,
#        se.*, conv_pw,bn2)
# flax:  stem_{conv,bn}; stage{s}_block{b}/{expand_*,dw_*,se_*,project_*}
# --------------------------------------------------------------------------

@register_translator("efficientnet")
def translate_efficientnet(key: str):
    if key == "conv_stem.weight":
        return ("params", ("stem_conv", "kernel"), _conv_kernel)
    m = re.match(r"bn1\.(.+)", key)
    if m:
        hit = _bn_leaf(m.group(1))
        if hit:
            return (hit[0], ("stem_bn", hit[1]), None)
        return None
    m = re.match(r"blocks\.(\d)\.(\d+)\.(.+)", key)
    if not m:
        return None
    s, b, rest = int(m.group(1)), m.group(2), m.group(3)
    base = (f"stage{s}_block{b}",)
    stage0 = s == 0  # DepthwiseSeparable: no expand conv
    conv_map = ({"conv_dw": "dw_conv", "conv_pw": "project_conv"} if stage0 else
                {"conv_pw": "expand_conv", "conv_dw": "dw_conv", "conv_pwl": "project_conv"})
    bn_map = ({"bn1": "dw_bn", "bn2": "project_bn"} if stage0 else
              {"bn1": "expand_bn", "bn2": "dw_bn", "bn3": "project_bn"})
    m2 = re.match(r"(conv_pwl|conv_pw|conv_dw)\.weight", rest)
    if m2 and m2.group(1) in conv_map:
        return ("params", base + (conv_map[m2.group(1)], "kernel"), _conv_kernel)
    m2 = re.match(r"(bn\d)\.(.+)", rest)
    if m2 and m2.group(1) in bn_map:
        hit = _bn_leaf(m2.group(2))
        if hit:
            return (hit[0], base + (bn_map[m2.group(1)], hit[1]), None)
        return None
    m2 = re.match(r"se\.conv_(reduce|expand)\.(weight|bias)", rest)
    if m2:
        return ("params", base + (f"se_{m2.group(1)}",
                                  "kernel" if m2.group(2) == "weight" else "bias"),
                _conv_kernel if m2.group(2) == "weight" else None)
    return None


def inverse_efficientnet(path: Tuple[str, ...], collection: str) -> Optional[str]:
    if path[0] == "stem_conv":
        return "conv_stem.weight"
    if path[0] == "stem_bn":
        return f"bn1.{_BN_INV[path[1]]}"
    m = re.match(r"stage(\d)_block(\d+)", path[0])
    if not m:
        return None
    s, b = int(m.group(1)), m.group(2)
    stage0 = s == 0
    conv_inv = ({"dw_conv": "conv_dw", "project_conv": "conv_pw"} if stage0 else
                {"expand_conv": "conv_pw", "dw_conv": "conv_dw", "project_conv": "conv_pwl"})
    bn_inv = ({"dw_bn": "bn1", "project_bn": "bn2"} if stage0 else
              {"expand_bn": "bn1", "dw_bn": "bn2", "project_bn": "bn3"})
    prefix = f"blocks.{s}.{b}"
    sub = path[1]
    if sub in conv_inv:
        return f"{prefix}.{conv_inv[sub]}.weight"
    if sub in bn_inv:
        return f"{prefix}.{bn_inv[sub]}.{_BN_INV[path[2]]}"
    if sub in ("se_reduce", "se_expand"):
        return f"{prefix}.se.conv_{sub[3:]}." + ("weight" if path[2] == "kernel" else "bias")
    return None


# --------------------------------------------------------------------------
# EdgeNeXt (timm naming)
# torch: stem.{0=conv,1=norm}; stages.{i}.downsample.{0=norm,1=conv};
#        stages.{i}.blocks.{j}.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma} (conv) |
#        {convs.{k},pos_embd.token_projection,norm_xca,gamma_xca,
#         xca.{qkv,proj,temperature},norm,mlp.fc1,mlp.fc2,gamma} (SDTA)
# flax:  stem_{conv,norm}; downsample_{norm,conv}_{i};
#        stage{i}_conv{j}/..., stage{i}_sdta{j}/...
# --------------------------------------------------------------------------

def make_edgenext_translator(depths, global_blocks):
    n_conv = [d - g for d, g in zip(depths, global_blocks)]

    def translate(key: str):
        m = re.match(r"stem\.(\d)\.(weight|bias)", key)
        if m:
            if m.group(1) == "0":
                return ("params", ("stem_conv", "kernel" if m.group(2) == "weight" else "bias"),
                        _conv_kernel if m.group(2) == "weight" else None)
            return ("params", ("stem_norm", _ln(m.group(2))), None)
        m = re.match(r"stages\.(\d)\.downsample\.(\d)\.(weight|bias)", key)
        if m:
            i, sub, leaf = m.groups()
            if sub == "0":
                return ("params", (f"downsample_norm_{i}", _ln(leaf)), None)
            return ("params", (f"downsample_conv_{i}", "kernel" if leaf == "weight" else "bias"),
                    _conv_kernel if leaf == "weight" else None)
        m = re.match(r"stages\.(\d)\.blocks\.(\d+)\.(.+)", key)
        if not m:
            return None
        i, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        is_sdta = j >= n_conv[i]
        base = (f"stage{i}_sdta{j - n_conv[i]}",) if is_sdta else (f"stage{i}_conv{j}",)
        lf = {"kernel": "weight"}
        if not is_sdta:
            m2 = re.match(r"conv_dw\.(weight|bias)", rest)
            if m2:
                return ("params", base + ("dwconv", "kernel" if m2.group(1) == "weight" else "bias"),
                        _conv_kernel if m2.group(1) == "weight" else None)
            m2 = re.match(r"norm\.(weight|bias)", rest)
            if m2:
                return ("params", base + ("norm", _ln(m2.group(1))), None)
            m2 = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)", rest)
            if m2:
                return ("params", base + (f"pwconv{1 if m2.group(1) == 'fc1' else 2}",
                                          "kernel" if m2.group(2) == "weight" else "bias"),
                        _dense_kernel if m2.group(2) == "weight" else None)
            if rest == "gamma":
                return ("params", base + ("gamma",), None)
            return None
        # SDTA block
        m2 = re.match(r"convs\.(\d)\.(weight|bias)", rest)
        if m2:
            return ("params", base + (f"dw_{m2.group(1)}",
                                      "kernel" if m2.group(2) == "weight" else "bias"),
                    _conv_kernel if m2.group(2) == "weight" else None)
        m2 = re.match(r"pos_embd\.token_projection\.(weight|bias)", rest)
        if m2:
            return ("params", base + ("pos_embd", "token_projection",
                                      "kernel" if m2.group(1) == "weight" else "bias"),
                    _conv_kernel if m2.group(1) == "weight" else None)
        m2 = re.match(r"norm_xca\.(weight|bias)", rest)
        if m2:
            return ("params", base + ("norm_xca", _ln(m2.group(1))), None)
        if rest == "gamma_xca":
            return ("params", base + ("gamma_xca",), None)
        m2 = re.match(r"xca\.(qkv|proj)\.(weight|bias)", rest)
        if m2:
            return ("params", base + ("xca", m2.group(1),
                                      "kernel" if m2.group(2) == "weight" else "bias"),
                    _dense_kernel if m2.group(2) == "weight" else None)
        if rest == "xca.temperature":
            return ("params", base + ("xca", "temperature"), None)
        m2 = re.match(r"norm\.(weight|bias)", rest)
        if m2:
            return ("params", base + ("norm", _ln(m2.group(1))), None)
        m2 = re.match(r"mlp\.(fc1|fc2)\.(weight|bias)", rest)
        if m2:
            return ("params", base + (f"pwconv{1 if m2.group(1) == 'fc1' else 2}",
                                      "kernel" if m2.group(2) == "weight" else "bias"),
                    _dense_kernel if m2.group(2) == "weight" else None)
        if rest == "gamma":
            return ("params", base + ("gamma",), None)
        return None

    def inverse(path, collection):
        if collection != "params":
            return None
        p0 = path[0]
        if p0 == "stem_conv":
            return f"stem.0.{'weight' if path[1] == 'kernel' else 'bias'}"
        if p0 == "stem_norm":
            return f"stem.1.{'weight' if path[1] == 'scale' else 'bias'}"
        m = re.match(r"downsample_norm_(\d)", p0)
        if m:
            return f"stages.{m.group(1)}.downsample.0." + \
                ("weight" if path[1] == "scale" else "bias")
        m = re.match(r"downsample_conv_(\d)", p0)
        if m:
            return f"stages.{m.group(1)}.downsample.1." + \
                ("weight" if path[1] == "kernel" else "bias")
        m = re.match(r"stage(\d)_(conv|sdta)(\d+)", p0)
        if not m:
            return None
        i = int(m.group(1))
        j = int(m.group(3)) + (n_conv[i] if m.group(2) == "sdta" else 0)
        prefix = f"stages.{i}.blocks.{j}"
        rest = path[1:]
        wb = lambda leaf, w="kernel": "weight" if leaf == w else "bias"  # noqa: E731
        if rest[0] == "dwconv":
            return f"{prefix}.conv_dw.{wb(rest[1])}"
        m2 = re.match(r"dw_(\d)", rest[0])
        if m2:
            return f"{prefix}.convs.{m2.group(1)}.{wb(rest[1])}"
        if rest[0] == "pos_embd":
            return f"{prefix}.pos_embd.token_projection.{wb(rest[2])}"
        if rest[0] in ("norm", "norm_xca"):
            return f"{prefix}.{rest[0]}.{wb(rest[1], 'scale')}"
        if rest[0] in ("pwconv1", "pwconv2"):
            return f"{prefix}.mlp.fc{rest[0][-1]}.{wb(rest[1])}"
        if rest[0] in ("gamma", "gamma_xca"):
            return f"{prefix}.{rest[0]}"
        if rest[0] == "xca":
            if rest[1] == "temperature":
                return f"{prefix}.xca.temperature"
            return f"{prefix}.xca.{rest[1]}.{wb(rest[2])}"
        return None

    return translate, inverse


# --------------------------------------------------------------------------
# timm-format MobileNetV3 (reference served these via timm pretrained
# weights, models/backbones/timm.py:270-274; names timm_wrapper.py:16-21).
# torch (timm): conv_stem.weight, bn1.*; blocks.{s}.{j}.{...} where the
#   stages group the SAME flat bneck sequence as the torchvision table
#   (small depths [1,2,3,2,3], large [1,2,3,4,2,3]) plus a trailing
#   ConvBnAct stage (the 1x1 head conv); block 0 is DepthwiseSeparableConv
#   (conv_dw/bn1, se, conv_pw/bn2 — no expand), the rest InvertedResidual
#   (conv_pw/bn1 expand, conv_dw/bn2, se.conv_{reduce,expand}, conv_pwl/bn3).
# flax: the torchvision-layout trunk (models/backbones/mobilenet_v3.py) —
#   stem_conv/stem_bn, block_{i}/{expand,dw,project}_{conv,bn} + se/fc{1,2},
#   lastconv/lastconv_bn.
# Note: timm BNs use eps 1e-5 vs the trunk's torchvision 1e-3 — a negligible
# inference delta for trained running_vars, documented here for the record.
# --------------------------------------------------------------------------

_TIMM_MNV3_DEPTHS = {"small": [1, 2, 3, 2, 3], "large": [1, 2, 3, 4, 2, 3]}


def make_timm_mobilenetv3_translator(size: str):
    from ..models.backbones.mobilenet_v3 import _conf

    blocks, _last = _conf(size, False)
    layouts = [
        _mnv3_block_submodules(b.expanded != b.in_ch, b.use_se) for b in blocks
    ]
    depths = _TIMM_MNV3_DEPTHS[size]
    assert sum(depths) == len(blocks)
    conv_stage = len(depths)  # trailing ConvBnAct stage index
    # (stage, j) -> flat block index and back
    flat_of = {}
    starts = []
    i = 0
    for s, d in enumerate(depths):
        starts.append(i)
        for j in range(d):
            flat_of[(s, j)] = i
            i += 1

    # timm submodule names per position in our layout list
    def timm_names(layout):
        # ds block: dw->(conv_dw,bn1), se, project->(conv_pw,bn2)
        # ir block: expand->(conv_pw,bn1), dw->(conv_dw,bn2), se,
        #           project->(conv_pwl,bn3)
        names = {}
        if "expand" in layout:
            names["expand"] = ("conv_pw", "bn1")
            names["dw"] = ("conv_dw", "bn2")
            names["project"] = ("conv_pwl", "bn3")
        else:
            names["dw"] = ("conv_dw", "bn1")
            names["project"] = ("conv_pw", "bn2")
        return names

    def translate(key: str):
        if key == "conv_stem.weight":
            return ("params", ("stem_conv", "kernel"), _conv_kernel)
        m = re.match(r"bn1\.(.+)", key)
        if m:
            hit = _bn_leaf(m.group(1))
            if hit:
                return (hit[0], ("stem_bn", hit[1]), None)
            return None
        m = re.match(r"blocks\.(\d+)\.(\d+)\.(.+)", key)
        if not m:
            return None
        s, j, rest = int(m.group(1)), int(m.group(2)), m.group(3)
        if s == conv_stage:
            if rest == "conv.weight":
                return ("params", ("lastconv", "kernel"), _conv_kernel)
            m2 = re.match(r"bn1\.(.+)", rest)
            if m2:
                hit = _bn_leaf(m2.group(1))
                if hit:
                    return (hit[0], ("lastconv_bn", hit[1]), None)
            return None
        if (s, j) not in flat_of:
            return None
        bi = flat_of[(s, j)]
        layout = layouts[bi]
        base = (f"block_{bi}",)
        m2 = re.match(r"se\.conv_(reduce|expand)\.(weight|bias)", rest)
        if m2 and "se" in layout:
            fc = "fc1" if m2.group(1) == "reduce" else "fc2"
            return ("params", base + ("se", fc,
                                      "kernel" if m2.group(2) == "weight" else "bias"),
                    _conv_kernel if m2.group(2) == "weight" else None)
        names = timm_names(layout)
        for mod, (conv_name, bn_name) in names.items():
            if rest == f"{conv_name}.weight":
                return ("params", base + (f"{mod}_conv", "kernel"), _conv_kernel)
            m2 = re.match(rf"{bn_name}\.(.+)", rest)
            if m2:
                hit = _bn_leaf(m2.group(1))
                if hit:
                    return (hit[0], base + (f"{mod}_bn", hit[1]), None)
        return None

    def stage_of(bi: int):
        for s in range(len(depths) - 1, -1, -1):
            if bi >= starts[s]:
                return s, bi - starts[s]
        raise IndexError(bi)

    def inverse(path: Tuple[str, ...], collection: str) -> Optional[str]:
        p0 = path[0]
        if p0 == "stem_conv":
            return "conv_stem.weight"
        if p0 == "stem_bn":
            return f"bn1.{_BN_INV[path[1]]}"
        if p0 == "lastconv":
            return f"blocks.{conv_stage}.0.conv.weight"
        if p0 == "lastconv_bn":
            return f"blocks.{conv_stage}.0.bn1.{_BN_INV[path[1]]}"
        m = re.match(r"block_(\d+)", p0)
        if not m:
            return None
        bi = int(m.group(1))
        s, j = stage_of(bi)
        layout = layouts[bi]
        prefix = f"blocks.{s}.{j}"
        sub = path[1]
        if sub == "se":
            red = "reduce" if path[2] == "fc1" else "expand"
            leaf = "weight" if path[3] == "kernel" else "bias"
            return f"{prefix}.se.conv_{red}.{leaf}"
        names = timm_names(layout)
        mod = sub.rsplit("_", 1)[0]
        if mod not in names:
            return None
        conv_name, bn_name = names[mod]
        if sub.endswith("_conv"):
            return f"{prefix}.{conv_name}.weight"
        return f"{prefix}.{bn_name}.{_BN_INV[path[2]]}"

    return translate, inverse
