#!/usr/bin/env python
"""Export a trained student to the Anyma/detectron2 pickle layout.

Counterpart of reference ``scripts/convert_to_anyma.py:5-39``: pull only the
student backbone out of a training checkpoint, rename to ``backbone.*`` torch
keys, convert to numpy, and pickle ``{"model": ..., "__author__":
"dinov2_distilled", "matching_heuristics": True}`` so detectron2-style
consumers can load it.

Because our checkpoints are orbax trees (not torch state dicts), the export
walks the flax student subtree and emits detectron2-convention keys via the
same per-family translators used for import (run in reverse).

Usage: python scripts/convert_to_anyma.py <checkpoint_dir> <out.pkl> [--family resnet_50]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dinov2_distillation_tpu.utils.export import export_student_to_anyma  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="orbax checkpoint dir (…/checkpoints) or best/last subdir")
    p.add_argument("output", help="output .pkl path")
    p.add_argument("--which", choices=["best", "last"], default="best")
    p.add_argument("--family", default=None,
                   help="backbone family for key translation (e.g. resnet, "
                        "stdc, convnext, swin, mit, darknet, presnet, "
                        "mobilenet_v2, mobilenet_v3_small/large, "
                        "mobilenetv3_small/large (timm layout), "
                        "efficientnet, edgenext); inferred from the param "
                        "tree when omitted")
    args = p.parse_args()

    model = export_student_to_anyma(
        args.checkpoint, which=args.which, family=args.family)
    payload = {
        "model": {k: np.asarray(v) for k, v in model.items()},
        "__author__": "dinov2_distilled",
        "matching_heuristics": True,
    }
    with open(args.output, "wb") as f:
        pickle.dump(payload, f)
    print(f"Wrote {len(model)} tensors to {args.output}")


if __name__ == "__main__":
    main()
