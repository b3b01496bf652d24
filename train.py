#!/usr/bin/env python
"""CLI entry point: ``python train.py --config configs/config.yaml [k.path=v ...]``.

Counterpart of the reference ``train.py:291-355``, with the dotted-override
surface the reference README documents but never implemented
(``readme.md:272-276``) actually working.
"""

import argparse
import sys

from dinov2_distillation_tpu.config import load_config
from dinov2_distillation_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from dinov2_distillation_tpu.train.loop import DistillationTrainer  # noqa: E402
from dinov2_distillation_tpu.utils.logger import get_logger  # noqa: E402


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="TPU-native DINOv2 distillation")
    parser.add_argument(
        "--config", type=str, default="./configs/config.yaml",
        help="Path to the YAML config file",
    )
    parser.add_argument(
        "overrides", nargs="*",
        help="Dotted config overrides: k.path=v, or the reference README's "
             "--k.path v form (readme.md:275)",
    )
    if argv is None:
        argv = sys.argv[1:]
    return parser.parse_args(_fold_dashed_overrides(argv))


def _fold_dashed_overrides(argv):
    """Rewrite ``--train.max_epochs 100`` / ``--a.b=c`` into ``a.b=c``
    before argparse sees them — the dashed form is what the reference
    README documents (readme.md:275). Dotted keys only; ``--config``/-h
    pass through untouched."""
    out, it = [], iter(argv)
    for tok in it:
        if tok.startswith("--") and "." in tok.split("=", 1)[0]:
            if "=" in tok:
                out.append(tok[2:])
            else:
                try:
                    out.append(f"{tok[2:]}={next(it)}")
                except StopIteration:
                    out.append(tok)  # trailing key: let argparse report it
        else:
            out.append(tok)
    return out


def main(argv=None) -> None:
    args = parse_args(argv)
    cfg = load_config(args.config, overrides=args.overrides)

    # Multi-host: one JAX process per TPU host over ICI/DCN (replaces the
    # reference's Lightning DDP num_nodes — config train.num_nodes > 1 or
    # standard TPU pod env vars trigger distributed init).
    import os

    if int(cfg.get("train", {}).get("num_nodes", 1) or 1) > 1 or \
            os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") or \
            os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()
        from dinov2_distillation_tpu.utils.logger import reconfigure_logger

        # imports configured the singleton before the rank existed
        reconfigure_logger(rank=jax.process_index())
        get_logger().info(
            f"jax.distributed initialized: process {jax.process_index()}/"
            f"{jax.process_count()}")

    trainer = DistillationTrainer(cfg)
    trainer.fit()


if __name__ == "__main__":
    sys.exit(main())
