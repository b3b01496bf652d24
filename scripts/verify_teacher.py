#!/usr/bin/env python
"""Verify the native JAX teacher against REAL published DINOv2 weights.

The reference's entire distillation signal flows through
``torch.hub.load('facebookresearch/dinov2', <model>)``
(``/root/reference/models/backbones/dinov2.py:20``); our build replaces the
hub with a native flax ViT + a weight importer. A silent key/layout/
semantics mismatch in either would poison every training run while the
synthetic-weight goldens stay green — this harness is the evidence pass
(VERDICT r3 next #2):

  1. load the weights file through the REAL importer
     (``utils.torch_import.load_dinov2_teacher``),
  2. run the hub block math (``utils.torch_vit_ref`` — torch, host-side,
     upstream-cited) and the JAX teacher on the same fixed inputs,
  3. report per-block max|delta| of the token stream and the final
     feature-map cosine / max|delta|.

Usage:
  python scripts/verify_teacher.py /path/dinov2_vits14_pretrain.pth \
      [--model dinov2_vits14] [--px 224] [--batch 2] [--seed 0]

Exit code 0 iff final cosine >= 0.9999 and max|delta| small at fp32.
Download the official checkpoints from the DINOv2 release page, e.g.
``dinov2_vits14_pretrain.pth`` (this container has no egress; run this
wherever the weights file lives).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("weights", help="hub state_dict (.pth) or detectron2 .pkl")
    p.add_argument("--model", default=None,
                   help="dinov2_vit{s,b,l,g}14 (default: inferred from dims)")
    p.add_argument("--px", type=int, default=224)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cosine-min", type=float, default=0.9999)
    p.add_argument("--block-tol", type=float, default=None,
                   help="per-block max|delta| bound (default: skip gate, "
                   "report only — magnitudes scale with depth)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")

    from dinov2_distillation_tpu.models.vit import VIT_CONFIGS, DINOv2ViT
    from dinov2_distillation_tpu.utils import torch_import, torch_vit_ref

    state = torch_import.load_raw_state_dict(args.weights)
    arch = torch_vit_ref.infer_arch(state)
    name = args.model
    if name is None:
        name = {384: "dinov2_vits14", 768: "dinov2_vitb14",
                1024: "dinov2_vitl14", 1536: "dinov2_vitg14"}[arch["dim"]]
    cfg = VIT_CONFIGS[name]
    assert (cfg.embed_dim, cfg.depth) == (arch["dim"], arch["depth"]), (
        f"weights are {arch}, config {name} is "
        f"(dim={cfg.embed_dim}, depth={cfg.depth})")
    print(f"# weights: {args.weights}")
    print(f"# arch: {name} {arch}")

    # fp32 end to end: semantic mismatches must not hide in bf16 noise
    model = DINOv2ViT(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(args.seed)
    images = rng.standard_normal(
        (args.batch, args.px, args.px, 3)).astype(np.float32)

    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.px, args.px, 3))))()
    params = torch_import.load_dinov2_teacher(
        args.weights, variables["params"], name)
    variables = {"params": params}

    # --- torch oracle ----------------------------------------------------
    per_block_t, feat_t = torch_vit_ref.torch_forward_intermediates(
        state, images)

    # --- JAX per-block: embed once, step block by block ------------------
    tokens = jax.jit(lambda v, x: model.apply(v, x, method=model.embed))(
        variables, jnp.asarray(images))
    block_report = []
    fwd_blocks = jax.jit(
        lambda v, t, i: model.apply(v, t, i, i + 1,
                                    method=model.forward_blocks),
        static_argnums=2)
    for i in range(cfg.depth):
        tokens = fwd_blocks(variables, tokens, i)
        d = float(np.max(np.abs(np.asarray(tokens) - per_block_t[i])))
        block_report.append(d)
        print(f"block {i:2d}: max|delta| = {d:.3e}")

    feat_j = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x)["feature_map"])(
            variables, jnp.asarray(images)))
    dmax = float(np.max(np.abs(feat_j - feat_t)))
    a = feat_j.reshape(-1, cfg.embed_dim)
    b = feat_t.reshape(-1, cfg.embed_dim)
    cos = float(np.mean(np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12)))
    scale = float(np.mean(np.abs(feat_t)))
    print(f"final feature_map: cosine={cos:.7f} max|delta|={dmax:.3e} "
          f"(mean|teacher|={scale:.3e})")

    ok = cos >= args.cosine_min
    if args.block_tol is not None:
        ok = ok and max(block_report) <= args.block_tol
    print(json.dumps({"ok": bool(ok), "model": name, "cosine": cos,
                      "final_max_delta": dmax,
                      "block_max_delta": max(block_report),
                      "px": args.px, "batch": args.batch}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
