#!/usr/bin/env python
"""Benchmark: distillation step throughput on the flagship config.

Measures images/sec/chip for the north-star workload — dinov2_vits14 ->
stdc_2 with dual ScaleKD heads (res4 + res5), 224px crops — on real device
steps (teacher fwd + student fwd/bwd + projector losses + AdamW update),
batches prefed as device arrays so the number is the chip's, not the host
pipeline's.

Baseline (BASELINE.md): the reference's 2-GPU DDP run achieved ~635 img/s
total => ~317.5 img/s per GPU (AMP fp16, batch 256/GPU).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N/317.5}
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dinov2_distillation_tpu.utils.jax_setup import enable_compilation_cache

enable_compilation_cache()

from dinov2_distillation_tpu.config import load_config, derive_config, inject_student_dims  # noqa: E402
from dinov2_distillation_tpu.models.vit import create_teacher
from dinov2_distillation_tpu.models.zoo import create_student
from dinov2_distillation_tpu.parallel.mesh import create_mesh, batch_sharding, replicated
from dinov2_distillation_tpu.train.distill import DistillationModel, build_loss_specs
from dinov2_distillation_tpu.train.optim import create_optimizer
from dinov2_distillation_tpu.train.state import init_state, make_train_step

BASELINE_IMG_PER_SEC_PER_CHIP = 635.0 / 2  # reference: 2x GPU DDP, run.ipynb

# TPU v5e per-chip bf16 peak (public spec: 197 TFLOP/s). Overridable for
# other chip generations: DKT_PEAK_TFLOPS=<N>.
PEAK_FLOPS = float(__import__("os").environ.get("DKT_PEAK_TFLOPS", "197")) * 1e12


def step_flops(step, state, batch):
    """FLOPs of one compiled train step, from XLA's own cost model
    (``Compiled.cost_analysis()`` — the same count ``xprof`` roofs against).

    Lower-bound caveat: Pallas custom kernels are opaque to the HLO cost
    model (the fused projector / ViT-block / augment kernels report no
    flops), so the derived ``mfu`` is a floor, not an estimate."""
    try:
        ca = step.lower(state, batch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def ensure_corpus(dirpath: str, n: int, size=(500, 375)) -> None:
    """Synthesize a JPEG corpus once (smooth low-frequency images — realistic
    compression/decode cost, unlike white noise which bloats JPEG)."""
    import os

    from PIL import Image

    os.makedirs(dirpath, exist_ok=True)
    have = len([f for f in os.listdir(dirpath) if f.endswith(".jpg")])
    if have >= n:
        return
    rng = np.random.default_rng(1234)
    for i in range(have, n):
        low = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
        img = Image.fromarray(low).resize(size, Image.BILINEAR)
        img.save(os.path.join(dirpath, f"img_{i:05d}.jpg"), quality=90)


def run_e2e(args, cfg, mesh, state, step, global_batch: int, crop: int) -> int:
    """Loader-fed throughput: the full data path feeding the train step.

    Two modes (both include the complete stochastic augmentation — RRC,
    flip, RandAugment(9,9), erase — on device, re-randomized per step):

      * default: the ``DeviceFrameCache`` loader — frames decoded + staged
        to HBM once, each step gathers a shuffled batch on device and
        augments it under jit. This is the TPU-native steady-state for
        datasets that fit in HBM (this 1-CPU host decodes ~365 img/s and
        its host->device link moves ~0.03 GB/s; both would otherwise idle a
        ~1800 img/s chip — measured r3).
      * --e2e-stream: the streaming host loader (native JPEG decode ->
        staged uint8 -> H2D -> device augment) — the reference-shaped path
        (torch DataLoader, datasets/CustomDataset.py:156-182), bounded here
        by host decode + link, reported for the record."""
    from dinov2_distillation_tpu.data.augment import StagingTransform
    from dinov2_distillation_tpu.data.dataset import ImageFolderDataset
    from dinov2_distillation_tpu.data.device_augment import augment_batch
    from dinov2_distillation_tpu.data.device_cache import DeviceFrameCache
    from dinov2_distillation_tpu.data.loader import DataLoader
    from dinov2_distillation_tpu.parallel.mesh import shard_batch

    corpus = "/tmp/dkt_bench_corpus"
    ensure_corpus(corpus, n=max(2 * global_batch, 1024))
    staging = int(cfg.data_loader.get("staging_size", 256))
    transform = StagingTransform(staging_size=staging)
    arng = jax.random.PRNGKey(0)
    scale = tuple(float(s) for s in cfg.data_transform.global_crops_scale)
    stream = bool(getattr(args, "e2e_stream", False))
    last = {}  # last augmented batch (for the post-hoc flops/mfu lookup)

    if stream:
        loader = DataLoader(
            ImageFolderDataset([corpus]), transform, batch_size=global_batch,
            num_workers=int(cfg.data_loader.get("num_workers", 4)),
            drop_last=True, seed=0)

        def run(n_steps, state, metrics=None):
            i, epoch = 0, 0
            while i < n_steps:
                loader.set_epoch(epoch)
                for batch in loader:
                    staged = shard_batch(batch, mesh)
                    aug = augment_batch(
                        staged["image"], jax.random.fold_in(arng, i),
                        crop_size=crop, scale=scale)
                    last["aug"] = aug
                    state, metrics = step(state, aug)
                    i += 1
                    if i >= n_steps:
                        break
                epoch += 1
            return state, metrics
    else:
        from dinov2_distillation_tpu.data.device_cache import gather_frames

        cache = DeviceFrameCache(
            ImageFolderDataset([corpus]), transform,
            batch_size=global_batch, mesh=mesh, seed=0)

        @jax.jit
        def gather_augment(frames, idx, rng):
            got = gather_frames(frames, idx, mesh=mesh,
                                shard_size=cache.shard_size,
                                per_device=cache.per_device)
            return augment_batch(got, rng, crop_size=crop, scale=scale)

        def run(n_steps, state, metrics=None):
            i, epoch = 0, 0
            while i < n_steps:
                cache.set_epoch(epoch)
                for item in cache:
                    aug = gather_augment(cache.frames, item["indices"],
                                         jax.random.fold_in(arng, i))
                    last["aug"] = aug
                    state, metrics = step(state, aug)
                    i += 1
                    if i >= n_steps:
                        break
                epoch += 1
            return state, metrics

    state, metrics = run(args.warmup, state)
    float(metrics["loss"])  # sync (see tunnel note below)
    if getattr(args, "profile", None) and not getattr(args, "_collect", False):
        from dinov2_distillation_tpu.utils.profiling import trace_steps

        with trace_steps(args.profile):
            state, metrics = run(3, state)
            float(metrics["loss"])
    t0 = time.perf_counter()
    state, metrics = run(args.steps, state)
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    img_per_sec = args.steps * global_batch / dt
    per_chip_rate = img_per_sec / mesh.size
    mode = ("streaming host decode + H2D + device augment" if stream
            else "HBM frame cache + device gather + device augment")
    result = {
        "metric": f"E2E distill images/sec/chip (loader-fed: {mode} + step)",
        "value": round(per_chip_rate, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip_rate / BASELINE_IMG_PER_SEC_PER_CHIP, 3),
        "detail": {
            "chips": mesh.size,
            "global_batch": global_batch,
            "steps": args.steps,
            "step_time_ms": round(1000 * dt / args.steps, 2),
            "staging_size": staging,
            "final_loss": final_loss,
        },
    }
    flops = step_flops(step, state, last.get("aug"))
    if flops:
        result["detail"]["flops_per_step"] = flops
        result["detail"]["mfu"] = round(
            flops / (dt / args.steps) / (PEAK_FLOPS * mesh.size), 4)
    if getattr(args, "_collect", False):
        return result
    print(json.dumps(result))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config.yaml")
    p.add_argument("overrides", nargs="*", help="dotted config overrides")
    p.add_argument("--batch", type=int, default=None, help="per-chip batch (default from config)")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--quick", action="store_true", help="small batch / few steps")
    p.add_argument("--profile", metavar="LOGDIR", default=None,
                   help="capture a jax.profiler trace of 3 steps to LOGDIR")
    p.add_argument("--e2e", action="store_true",
                   help="loader-fed system benchmark: HBM frame cache + "
                        "device gather + device augmentation + step")
    p.add_argument("--e2e-stream", action="store_true",
                   help="with --e2e: stream through the host loader (JPEG "
                        "decode + H2D) instead of the device frame cache")
    p.add_argument("--teacher", default=None,
                   help="teacher variant override (dinov2_vit{s,b,l,g}14) — "
                        "measures the same distill step under a bigger "
                        "teacher (reference variant table train.py:103-108)")
    args = p.parse_args(argv)

    if args.teacher:
        args.overrides = list(args.overrides) + [
            f"teacher.model_name={args.teacher}"]
    cfg = derive_config(load_config(args.config, overrides=args.overrides))
    if args.teacher:
        # projector heads must divide the teacher dims (the flagship config
        # is tuned for vits14's 384); snap each head count to the largest
        # divisor <= the configured value, like a user re-tuning the config
        dims = int(cfg.teacher.out_dim)
        for spec in cfg.loss.losses:
            h = int(spec.kwargs.num_heads)
            while dims % h:
                h -= 1
            if h != int(spec.kwargs.num_heads):
                print(f"# {spec.kwargs.name}: num_heads "
                      f"{int(spec.kwargs.num_heads)} -> {h} (teacher dims {dims})",
                      file=sys.stderr)
                spec.kwargs.num_heads = h
    if args.quick:
        args.steps, args.warmup = 10, 3
        per_chip = args.batch or 32
    else:
        per_chip = args.batch or int(cfg.data_loader.batch_size)

    mesh = create_mesh()
    n_chips = mesh.size
    global_batch = per_chip * mesh.shape["data"]
    h, w = cfg.data_transform.global_crops_size

    teacher = create_teacher(cfg.teacher.model_name)
    student, channels = create_student(
        cfg.student.model_name, cfg.teacher.n_patches, list(cfg.student.student_keys))
    inject_student_dims(cfg, channels)
    model = DistillationModel(
        teacher=teacher, student=student, loss_specs=build_loss_specs(cfg))
    tx, _ = create_optimizer(cfg.optimizer.to_container(), updates_per_epoch=100)

    rng = np.random.default_rng(0)
    def make_batch(i):
        return {
            "image": rng.integers(0, 256, (global_batch, h, w, 3), dtype=np.uint8),
            "erase": np.zeros((global_batch, 4), np.int32),
        }

    sharding = batch_sharding(mesh)
    batches = [
        jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), make_batch(i))
        for i in range(2)
    ]

    state = init_state(model, tx, batches[0], seed=0)
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(model, tx)

    if args.e2e or args.e2e_stream:
        return run_e2e(args, cfg, mesh, state, step, global_batch, h)

    for i in range(args.warmup):
        state, metrics = step(state, batches[i % 2])
    # NOTE: under the axon TPU tunnel block_until_ready returns at enqueue;
    # only a device->host transfer truly synchronizes. Fetch a scalar.
    float(metrics["loss"])

    if args.profile:
        from dinov2_distillation_tpu.utils.profiling import trace_steps

        with trace_steps(args.profile):
            for i in range(3):
                state, metrics = step(state, batches[i % 2])
            float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, batches[i % 2])
    final_loss = float(metrics["loss"])  # forces completion of the whole chain
    dt = time.perf_counter() - t0

    img_per_sec = args.steps * global_batch / dt
    per_chip_rate = img_per_sec / n_chips
    tname = cfg.teacher.model_name.replace("dinov2_", "")
    metric_name = (f"distill images/sec/chip ({tname}->"
                   f"{cfg.student.model_name}, dual scalekd)")
    result = {
        "metric": metric_name,
        "value": round(per_chip_rate, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip_rate / BASELINE_IMG_PER_SEC_PER_CHIP, 3),
        "detail": {
            "chips": n_chips,
            "per_chip_batch": per_chip,
            "global_batch": global_batch,
            "steps": args.steps,
            "step_time_ms": round(1000 * dt / args.steps, 2),
            "final_loss": final_loss,
        },
    }
    flops = step_flops(step, state, batches[0])
    if flops:
        result["detail"]["flops_per_step"] = flops
        result["detail"]["mfu"] = round(
            flops / (dt / args.steps) / (PEAK_FLOPS * n_chips), 4)
        result["detail"]["mfu_note"] = (
            "XLA cost-model flops / step_time / peak; Pallas kernels are "
            "opaque to the cost model, so this is a floor")
    if not args.quick:
        # the loader-fed system number rides along in detail (VERDICT r2:
        # a chip-only rate describes a chip the input path may starve)
        saved = (args.steps, args.warmup)
        try:
            args._collect = True
            args.steps, args.warmup = 15, 3
            e2e = run_e2e(args, cfg, mesh, state, step, global_batch, h)
            result["detail"]["e2e_img_per_sec_per_chip"] = e2e["value"]
            result["detail"]["e2e_metric"] = e2e["metric"]
            result["detail"]["e2e_step_time_ms"] = e2e["detail"]["step_time_ms"]
        except Exception as exc:  # never lose the headline number
            result["detail"]["e2e_error"] = str(exc)[:200]
        finally:
            args.steps, args.warmup = saved
            args._collect = False
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
