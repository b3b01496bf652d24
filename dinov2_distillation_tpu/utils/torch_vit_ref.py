"""Weights-driven torch re-implementation of the DINOv2 hub forward.

This is the *verification oracle* for the native JAX teacher
(``models/vit.py``): it consumes a real (or synthetic) hub ``state_dict``
and reproduces the published forward semantics of
``torch.hub.load('facebookresearch/dinov2', ...)`` — the teacher the
reference wraps (``/root/reference/models/backbones/dinov2.py:20,32-46``).
Torch runs host-side only; nothing here touches the compute path.

Every semantic choice is pinned to its upstream source
(github.com/facebookresearch/dinov2, ``dinov2/`` package):

* patch embedding: ``Conv2d(3, D, kernel=14, stride=14)``
  — ``dinov2/layers/patch_embed.py`` (class ``PatchEmbed``).
* pos-embed interpolation: scale-factor bicubic with
  ``interpolate_offset=0.1`` added to the TARGET grid before dividing by
  the pretrain grid, ``antialias=False`` (``interpolate_antialias``
  defaults False) — ``dinov2/models/vision_transformer.py``
  (``DinoVisionTransformer.interpolate_pos_encoding``). The published
  checkpoints were trained at 518 px -> 37x37 grid.
* LayerNorm eps 1e-6 — ``vision_transformer.py``
  (``norm_layer=partial(nn.LayerNorm, eps=1e-6)``).
* attention: fused qkv linear; logits ``(q * head_dim**-0.5) @ k^T``,
  plain softmax, no attention dropout at eval
  — ``dinov2/layers/attention.py`` (class ``Attention``).
* LayerScale: per-channel learnable ``gamma`` multiplying each residual
  branch — ``dinov2/layers/layer_scale.py``.
* MLP: 4x hidden, ``nn.GELU`` (exact erf form, torch default)
  — ``dinov2/layers/mlp.py``.
* SwiGLUFFNFused (vitg): ``w12`` -> ``chunk(2)`` -> ``silu(x1) * x2`` ->
  ``w3``; hidden = int(4 * dim * 2/3) aligned to 8 = 4096 for dim 1536
  — ``dinov2/layers/swiglu_ffn.py``.
* block order: pre-norm residual (norm1 -> attn -> ls1 -> +, norm2 ->
  ffn -> ls2 -> +) — ``dinov2/layers/block.py`` (class ``Block``;
  drop_path is identity at eval).
* output contract: ``get_intermediate_layers(x, n=1,
  return_class_token=True)`` applies the final ``norm`` (``norm=True``
  default) and returns last-layer patch tokens (CLS split off)
  — ``vision_transformer.py`` (``get_intermediate_layers``, ``_get_
  intermediate_layers_not_chunked``); the reference reshapes them to a
  (B, D, H/14, W/14) feature map (``models/backbones/dinov2.py:38-45``).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

PATCH = 14


def infer_arch(sd: Dict) -> Dict[str, int | str]:
    """Infer (dim, depth, pos_grid, ffn, hidden) from a hub state dict;
    heads follow the published tables (``models/vit.py`` VIT_CONFIGS,
    reference dim table ``/root/reference/train.py:103-108``)."""
    dim = int(sd["cls_token"].shape[-1])
    depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    n_pos = int(sd["pos_embed"].shape[1]) - 1
    pos_grid = int(round(n_pos ** 0.5))
    swiglu = any(".mlp.w12." in k for k in sd)
    heads = {384: 6, 768: 12, 1024: 16, 1536: 24}[dim]
    hidden = (int(sd[f"blocks.0.mlp.w12.weight"].shape[0]) // 2 if swiglu
              else int(sd["blocks.0.mlp.fc1.weight"].shape[0]))
    return {"dim": dim, "depth": depth, "heads": heads, "pos_grid": pos_grid,
            "ffn": "swiglu" if swiglu else "mlp", "hidden": hidden}


def torch_block(sd, prefix: str, x, dim: int, heads: int):
    """One pre-norm DINOv2 block (``dinov2/layers/block.py`` Block.forward
    at eval: drop_path = identity). Detects the FFN flavor from the keys."""
    import torch
    import torch.nn.functional as F

    p = prefix
    h = F.layer_norm(x, (dim,), sd[p + "norm1.weight"], sd[p + "norm1.bias"],
                     eps=1e-6)
    qkv = F.linear(h, sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"])
    B, N, _ = qkv.shape
    hd = dim // heads
    qkv = qkv.reshape(B, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
    attn = attn.softmax(dim=-1)
    o = (attn @ v).transpose(1, 2).reshape(B, N, dim)
    o = F.linear(o, sd[p + "attn.proj.weight"], sd[p + "attn.proj.bias"])
    x = x + sd[p + "ls1.gamma"] * o
    h = F.layer_norm(x, (dim,), sd[p + "norm2.weight"], sd[p + "norm2.bias"],
                     eps=1e-6)
    if (p + "mlp.w12.weight") in sd:  # SwiGLUFFNFused (vitg)
        x12 = F.linear(h, sd[p + "mlp.w12.weight"], sd[p + "mlp.w12.bias"])
        x1, x2 = x12.chunk(2, dim=-1)
        h = F.linear(F.silu(x1) * x2,
                     sd[p + "mlp.w3.weight"], sd[p + "mlp.w3.bias"])
    else:
        h = F.linear(h, sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"])
        h = F.gelu(h)  # exact erf form, torch nn.GELU default
        h = F.linear(h, sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"])
    return x + sd[p + "ls2.gamma"] * h


def torch_forward_intermediates(
    sd: Dict, images_nhwc: np.ndarray,
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Full hub-semantics forward. Returns (per-block OUTPUT token
    sequences [depth arrays of (B, 1+N, D)], final NHWC patch feature
    map after the output norm)."""
    import torch
    import torch.nn.functional as F

    sd = {k: (torch.from_numpy(np.asarray(v)) if not torch.is_tensor(v)
              else v).float() for k, v in sd.items()}
    arch = infer_arch(sd)
    dim, depth, heads, M = (arch["dim"], arch["depth"], arch["heads"],
                            arch["pos_grid"])

    x = torch.from_numpy(np.transpose(images_nhwc, (0, 3, 1, 2))).float()
    w = F.conv2d(x, sd["patch_embed.proj.weight"],
                 sd["patch_embed.proj.bias"], stride=PATCH)
    B, _, gh, gw = w.shape
    tokens = w.flatten(2).transpose(1, 2)  # (B, N, D)
    pos = sd["pos_embed"]
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    if (gh, gw) != (M, M):
        # DinoVisionTransformer.interpolate_pos_encoding: scale-factor
        # bicubic with interpolate_offset=0.1, antialias=False
        pp = patch_pos.reshape(1, M, M, dim).permute(0, 3, 1, 2)
        pp = F.interpolate(
            pp, scale_factor=((gh + 0.1) / M, (gw + 0.1) / M),
            mode="bicubic", antialias=False)
        assert pp.shape[-2:] == (gh, gw), (pp.shape, gh, gw)
        patch_pos = pp.permute(0, 2, 3, 1).reshape(1, gh * gw, dim)
    cls = sd["cls_token"].expand(B, -1, -1)
    t = torch.cat([cls, tokens], 1) + torch.cat([cls_pos, patch_pos], 1)

    with torch.no_grad():
        per_block = []
        for i in range(depth):
            t = torch_block(sd, f"blocks.{i}.", t, dim, heads)
            per_block.append(t.numpy())
        t = F.layer_norm(t, (dim,), sd["norm.weight"], sd["norm.bias"],
                         eps=1e-6)
    feature_map = t[:, 1:].reshape(B, gh, gw, dim).numpy()
    return per_block, feature_map
