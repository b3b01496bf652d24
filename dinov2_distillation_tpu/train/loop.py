"""Training orchestration: the TPU-native ``DistillationTrainer``.

Counterpart of the reference's ``DistillationTrainer`` + Lightning ``Trainer``
(``train.py:26-288``): builds transform -> loaders -> teacher+student ->
DistillationModel -> optimizer -> jitted steps, then runs the epoch loop with
validation, monitored checkpointing (top-k + last), resume, metric logging,
and throughput meters. One process per TPU host; devices form a
(data, model) mesh; batches are globally sharded over the data axis
(replaces Lightning DDP/NCCL — SURVEY.md §2.6).

Log-dir layout parity: ``logs/<student>/distillation/version_N/`` with
``checkpoints/`` inside (reference ``train.py:243-254``).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ConfigNode, derive_config, inject_student_dims
from ..data.augment import DataAugmentationDINO
from ..data.loader import build_loaders
from ..models.vit import create_teacher
from ..models.zoo import create_student
from ..parallel.mesh import DATA_AXIS, create_mesh, replicated, shard_batch
from ..utils.checkpoint import DistillCheckpointManager
from ..utils.logger import get_logger
from ..utils.metrics import MetricLogger, ThroughputMeter
from .distill import DistillationModel, build_loss_specs
from .optim import create_optimizer, create_plateau_controller, set_lr_scale
from .state import init_state, make_eval_step, make_train_step

logger = get_logger()


def _precision_dtype(cfg) -> Any:
    prec = str(cfg.get("precision", 16))
    if prec in ("32", "32-true", "fp32", "float32"):
        return jnp.float32
    # 16 / bf16 / 16-mixed all map to bfloat16 on TPU (reference AMP fp16)
    return jnp.bfloat16


def _next_version_dir(root: str) -> str:
    """Next ``version_N`` under root, agreed across hosts.

    Orbax saves are cross-process collectives, so every host must operate on
    the SAME directory: host 0 scans the filesystem and the chosen index is
    broadcast to all hosts (reference analog: Lightning's TensorBoardLogger
    version pick, ``train.py:243-244``, which rank-broadcasts internally).
    """
    from ..parallel import comm

    if comm.is_main_process():
        os.makedirs(root, exist_ok=True)
        existing = [d for d in os.listdir(root) if d.startswith("version_")]
        nums = [int(d.split("_")[1]) for d in existing if d.split("_")[1].isdigit()]
        version = max(nums) + 1 if nums else 0
    else:
        version = -1
    if comm.get_world_size() > 1:
        version = int(comm.all_gather(version)[0])
    return os.path.join(root, f"version_{version}")


class DistillationTrainer:
    def __init__(self, config: ConfigNode, *, log_root: Optional[str] = None):
        logger.info("Starting DistillationTrainer initialization...")
        self.cfg = derive_config(config)
        cfg = self.cfg
        self.dtype = _precision_dtype(cfg)

        # --- mesh / distribution ------------------------------------------
        self.mesh = create_mesh(model_parallel=int(cfg.train.get("model_parallel", 1)))
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.is_main = self.process_index == 0
        n_data = self.mesh.shape[DATA_AXIS]
        logger.info(f"Mesh: data={n_data} model={self.mesh.shape['model']} "
                    f"({self.process_count} host(s))")

        # --- data ----------------------------------------------------------
        # augment_on_device moves ALL stochastic augmentation under jit
        # (data/device_augment.py); the host only decodes + stages frames.
        self.augment_on_device = bool(cfg.data_loader.get("augment_on_device", False))
        if self.augment_on_device:
            from ..data.augment import StagingTransform

            self.transform = StagingTransform(
                staging_size=int(cfg.data_loader.get("staging_size", 256)))
        else:
            self.transform = DataAugmentationDINO(
                global_crops_scale=tuple(cfg.data_transform.global_crops_scale),
                global_crops_size=tuple(cfg.data_transform.global_crops_size),
            )
        # config batch_size is per-chip (reference: per-GPU, config.yaml:75)
        per_chip = int(cfg.data_loader.batch_size)
        self.global_batch = per_chip * n_data
        per_host = self.global_batch // self.process_count
        data_cfg = cfg.clone()
        data_cfg.data_loader.batch_size = per_host
        cache_mode = str(cfg.data_loader.get("cache", "none")).lower()
        loaders = None
        if self.augment_on_device and cache_mode == "device":
            # dataset lives in HBM — sharded over the mesh data axis, each
            # host staging only its 1/world; batches are shard-local
            # on-device gathers (r3: this host decodes ~365 img/s and its
            # H2D link is ~0.03 GB/s — both starve the chip; see
            # data/device_cache.py)
            from ..data.device_cache import build_cached_loaders

            try:
                loaders = build_cached_loaders(
                    data_cfg, self.transform, mesh=self.mesh,
                    global_batch=self.global_batch)
            except ValueError as exc:
                logger.warning(f"device cache unavailable ({exc}); "
                               "falling back to the streaming loader")
        elif cache_mode == "device" and not self.augment_on_device:
            logger.warning("data_loader.cache=device requires "
                           "augment_on_device; using the streaming loader")
        if loaders is None:
            loaders = build_loaders(
                data_cfg, self.transform,
                process_index=self.process_index,
                process_count=self.process_count,
            )
        self.train_loader, self.val_loader = loaders
        logger.info(f"Batches/epoch: train={len(self.train_loader)} "
                    f"val={len(self.val_loader)} (global batch {self.global_batch})")
        if len(self.train_loader) == 0:
            # static shapes drop the ragged final batch, so a dataset
            # smaller than the global batch would otherwise train ZERO
            # steps per epoch with no signal (bit r4's own test authoring)
            logger.warning(
                f"train dataset smaller than the global batch "
                f"({self.global_batch}): every epoch runs 0 steps — shrink "
                f"data_loader.batch_size or grow the dataset")

        # --- models --------------------------------------------------------
        # BN statistics scope (reference: per-replica BN for non-timm
        # students, SyncBN only for timm — models/backbones/timm.py:273-274).
        # Default mirrors that: sync (global-batch) BN for the timm-origin
        # families, per-replica grouped moments (one group per data shard,
        # no cross-device moment reduction) otherwise; `train.sync_bn`
        # overrides either way.
        from ..models.backbones.common import set_bn_groups
        from ..models.zoo import family_id

        _TIMM_FAMILIES = {"efficientnet", "edgenext", "mobilenetv3"}
        sync_default = family_id(cfg.student.model_name) in _TIMM_FAMILIES
        self.sync_bn = bool(cfg.train.get("sync_bn", sync_default))
        set_bn_groups(1 if self.sync_bn else n_data)
        if not self.sync_bn:
            logger.info(f"Per-replica BatchNorm: {n_data} stat groups")
        self.teacher = create_teacher(cfg.teacher.model_name, dtype=self.dtype)
        # family-specific backbone options (today: resnet norm/freeze_at —
        # reference resnet_wrapper.py:62-74, freeze machinery resnet.py:697-719)
        bk = {}
        if cfg.student.get("norm", None):
            bk["norm"] = str(cfg.student.norm)
        if cfg.student.get("freeze_at", None):
            bk["freeze_at"] = int(cfg.student.freeze_at)
        self.backbone_kwargs = bk
        self.student, self.feature_channels = create_student(
            cfg.student.model_name, cfg.teacher.n_patches,
            list(cfg.student.student_keys), dtype=self.dtype,
            backbone_kwargs=bk or None,
        )
        inject_student_dims(cfg, self.feature_channels)
        self.loss_specs = build_loss_specs(cfg)
        self.model = DistillationModel(
            teacher=self.teacher, student=self.student,
            loss_specs=self.loss_specs, teacher_key=cfg.teacher.teacher_key,
            dtype=self.dtype,
        )

        # --- optimizer -----------------------------------------------------
        self.accum = int(cfg.train.get("accumulate_grad_batches", 1) or 1)
        updates_per_epoch = max(1, len(self.train_loader) // self.accum)
        from ..models.zoo import freeze_mask_fn

        self.tx, self.schedule = create_optimizer(
            cfg.optimizer.to_container(), updates_per_epoch, self.accum,
            clip_norm=1.0,  # Lightning gradient_clip_val=1.0 (train.py:267)
            freeze_mask=freeze_mask_fn(cfg.student.model_name, bk),
        )
        # ReduceLROnPlateau: host-side controller fed from val metrics
        # (reference scheduler dict with monitor/frequency,
        # train/distillation_module.py:495-501)
        plateau = create_plateau_controller(cfg.optimizer.to_container())
        if plateau is not None:
            self.plateau, self.plateau_monitor, self.plateau_frequency = plateau
            logger.info(
                f"ReduceLROnPlateau on '{self.plateau_monitor}' "
                f"every {self.plateau_frequency} epoch(s)")
        else:
            self.plateau = None

        # --- logging / checkpointing --------------------------------------
        root = log_root or os.path.join("logs", cfg.student.model_name, "distillation")
        self.log_dir = _next_version_dir(root)  # host-agreed version_N
        ckpt_cfg = cfg.get("checkpoints", ConfigNode())
        self.monitor = ckpt_cfg.get("monitor", "val_scalekd_res5_spatial_similarity")
        # config `checkpoints.dirpath` overrides the version-dir default
        # (reference schema field config/config.yaml:81)
        self.ckpt_dir = ckpt_cfg.get("dirpath", None) or os.path.join(
            self.log_dir, "checkpoints")
        self.ckpt = DistillCheckpointManager(
            self.ckpt_dir,
            monitor=self.monitor,
            mode=ckpt_cfg.get("mode", "max"),
            save_top_k=int(ckpt_cfg.get("save_top_k", 1)),
        )
        run_name = f"{cfg.student.model_name}_{cfg.teacher.model_name}"
        self.metrics = MetricLogger(
            self.log_dir, is_main_process=self.is_main,
            wandb_cfg=cfg.get("wandb", None) and cfg.wandb.to_container(),
            run_name=run_name, hparams=cfg.to_container(),
        )
        self.log_every = int(cfg.train.get("log_every_n_steps", 10))

        # --- state / steps -------------------------------------------------
        self.state = None
        self.start_epoch = 0
        self._aug_rng = jax.random.PRNGKey(
            int(cfg.train.get("seed", 0)) ^ 0x5EED)
        self.train_step = make_train_step(self.model, self.tx)
        self.eval_step = make_eval_step(self.model)
        logger.info("DistillationTrainer initialized.")

    # --- state construction ---------------------------------------------

    def _sample_batch(self) -> Dict[str, np.ndarray]:
        # model-input geometry (post device-augment if enabled)
        h, w = (int(s) for s in self.cfg.data_transform.global_crops_size)
        per_host = self.global_batch // self.process_count
        return {
            "image": np.zeros((per_host, h, w, 3), np.uint8),
            "erase": np.zeros((per_host, 4), np.int32),
        }

    def _augment_on_device(self, global_batch, stream: int, idx: int):
        """Run the jitted augmentation pipeline on a staged global batch."""
        from ..data.device_augment import augment_batch

        rng = jax.random.fold_in(
            jax.random.fold_in(self._aug_rng, stream), idx)
        kw = dict(
            crop_size=int(self.cfg.data_transform.global_crops_size[0]),
            scale=tuple(self.cfg.data_transform.global_crops_scale),
        )
        if "indices" in global_batch:
            # CachedLoader path: fuse the HBM frame gather into the jitted
            # augmentation program (one dispatch, no eager 50 MB batch); the
            # gather is shard-local under shard_map on a >1-wide data axis
            # (data/device_cache.gather_frames) and the output is pinned to
            # the data-axis batch sharding (ADVICE r3)
            if not hasattr(self, "_gather_fns"):
                self._gather_fns = {}
            loader = self.train_loader if stream == 0 else self.val_loader
            fn = self._gather_fns.get(stream)
            if fn is None:
                from ..data.device_cache import gather_frames

                cache = loader.cache
                mesh = self.mesh

                def _fn(frames, idx, r, *, _c=cache, _m=mesh):
                    got = gather_frames(frames, idx, mesh=_m,
                                        shard_size=_c.shard_size,
                                        per_device=_c.per_device)
                    return augment_batch(got, r, **kw)

                fn = self._gather_fns[stream] = jax.jit(_fn)
            out = fn(loader.cache.frames, global_batch["indices"], rng)
        else:
            out = augment_batch(global_batch["image"], rng, **kw)
        # equalize-capacity overflow counter: keep it out of the step input
        # (device scalar; fetched lazily at log points — ADVICE r3)
        self._eq_overflow = out.pop("aug_eq_overflow", None)
        # carry non-image keys (e.g. the val validity mask) through
        for k, v in global_batch.items():
            if k not in ("image", "erase", "indices"):
                out[k] = v
        return out

    def setup_state(self) -> None:
        if self.state is not None:
            return
        t0 = time.time()
        state = init_state(self.model, self.tx, self._sample_batch(),
                           seed=int(self.cfg.train.get("seed", 0)))
        state = self._load_pretrained(state)
        # replicate state over the mesh
        self.state = jax.device_put(state, replicated(self.mesh))
        logger.info(f"State initialized in {time.time() - t0:.1f}s "
                    f"({_param_count(self.state.params):.1f}M trainable, "
                    f"{_param_count(self.state.teacher_params):.1f}M teacher frozen)")

    def _load_pretrained(self, state):
        """Teacher weights + student init checkpoint (reference
        ``_load_student_checkpoint`` distillation_module.py:381-438)."""
        from ..utils import torch_import

        tpath = self.cfg.teacher.get("checkpoint_path", None)
        if tpath:
            teacher_params = torch_import.load_dinov2_teacher(
                tpath, state.teacher_params, self.cfg.teacher.model_name)
            state = state.replace(teacher_params=teacher_params)
        else:
            logger.warning(
                "No teacher.checkpoint_path given — teacher runs with random "
                "weights (the reference pulled weights from torch.hub, which "
                "requires network access).")

        spath = self.cfg.student.get("checkpoint_path", None)
        if spath:
            student_params, student_stats = torch_import.load_student_checkpoint(
                spath, self.cfg.student.model_name,
                state.params["student"], state.batch_stats.get("student", {}))
            new_params = dict(state.params)
            new_params["student"] = student_params
            new_stats = dict(state.batch_stats)
            if student_stats is not None:
                new_stats["student"] = student_stats
            state = state.replace(params=new_params, batch_stats=new_stats)
        return state

    # --- resume -----------------------------------------------------------

    def maybe_resume(self) -> None:
        resume = self.cfg.train.get("resume_from_checkpoint", None)
        if not resume:
            return
        self.setup_state()
        path = resume if isinstance(resume, str) and resume not in ("auto", "last") \
            else self.ckpt_dir
        mgr = self.ckpt if path == self.ckpt_dir \
            else DistillCheckpointManager(path, monitor=self.monitor)
        extra_tmpl: Dict[str, Any] = {"epoch": 0}
        if self.plateau:
            extra_tmpl["plateau"] = self.plateau.state_dict()
        restored = mgr.restore_last(self.state, extra_tmpl)
        if restored is None:
            logger.warning(f"No checkpoint found to resume from at {path}")
            return
        step, state, extra = restored
        self.state = jax.device_put(state, replicated(self.mesh))
        self.start_epoch = int(extra.get("epoch", 0)) + 1
        if self.plateau and "plateau" in extra:
            # opt-state scale came back with the checkpoint; the controller's
            # best/patience counters ride the extra dict
            self.plateau.load_state_dict(extra["plateau"])
        logger.info(f"Resumed at step {step}, starting epoch {self.start_epoch}")

    # --- epoch loops --------------------------------------------------------

    def _opt_step(self) -> int:
        return int(self.state.step) // self.accum

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        self.train_loader.set_epoch(epoch)
        meter = ThroughputMeter()
        last: Dict[str, float] = {}
        device_fed = getattr(self.train_loader, "device_resident", False)
        for i, batch in enumerate(self.train_loader):
            global_batch = batch if device_fed else shard_batch(batch, self.mesh)
            if self.augment_on_device:
                global_batch = self._augment_on_device(
                    global_batch, stream=0, idx=epoch * len(self.train_loader) + i)
            self.state, metrics = self.train_step(self.state, global_batch)
            if (i + 1) % self.log_every == 0 or i == len(self.train_loader) - 1:
                host = {f"train_{k}": float(v) for k, v in metrics.items()}
                host["lr"] = float(self.schedule(self._opt_step())) * (
                    self.plateau.scale if self.plateau else 1.0)
                host["epoch"] = epoch
                if meter.steps_measured > 0:
                    host["images_per_sec"] = meter.images_per_sec
                    host["images_per_sec_per_chip"] = (
                        meter.images_per_sec / max(1, self.mesh.size))
                if getattr(self, "_eq_overflow", None) is not None:
                    host["aug_eq_overflow"] = float(self._eq_overflow)
                self.metrics.log_scalars(int(self.state.step), host)
                last = host
            meter.tick(self.global_batch)
        if meter.steps_measured > 0:
            logger.info(
                f"epoch {epoch}: {meter.images_per_sec:.1f} img/s "
                f"({meter.images_per_sec / max(1, self.mesh.size):.1f}/chip), "
                f"train_loss={last.get('train_loss', float('nan')):.4f}")
        return last

    def validate(self, epoch: int) -> Dict[str, float]:
        self.val_loader.set_epoch(epoch)
        sums: Dict[str, float] = defaultdict(float)
        n = 0
        device_fed = getattr(self.val_loader, "device_resident", False)
        for i, batch in enumerate(self.val_loader):
            # validity mask: 1 for real samples; shard_batch zero-pads it
            # when wrap-padding to a data-axis multiple (CachedLoader yields
            # its own wrap mask)
            batch = dict(batch)
            if "mask" not in batch:
                batch["mask"] = np.ones(batch["image"].shape[0], np.float32)
            global_batch = batch if device_fed else shard_batch(batch, self.mesh)
            if self.augment_on_device:
                # parity: validation uses the stochastic train transform
                global_batch = self._augment_on_device(
                    global_batch, stream=1, idx=epoch * len(self.val_loader) + i)
            metrics = self.eval_step(self.state, global_batch)
            w = float(metrics.pop("_weight", self.global_batch))
            for k, v in metrics.items():
                sums[k] += float(v) * w
            n += w
        if n == 0:
            return {}
        val = {f"val_{k}": v / n for k, v in sums.items()}
        val["epoch"] = epoch
        self.metrics.log_scalars(int(self.state.step), val)
        logger.info(f"epoch {epoch} val: " + ", ".join(
            f"{k}={v:.4f}" for k, v in sorted(val.items()) if k != "epoch"))
        return val

    def _plateau_step(self, epoch: int, val_metrics: Dict[str, float]) -> None:
        """Feed the monitored val metric to ReduceLROnPlateau every
        ``frequency`` epochs and push any new LR scale into the opt state."""
        if not self.plateau or not val_metrics:
            return
        if (epoch + 1) % self.plateau_frequency != 0:
            return
        value = val_metrics.get(self.plateau_monitor)
        if value is None:
            logger.warning(
                f"ReduceLROnPlateau monitor '{self.plateau_monitor}' not in "
                f"val metrics; available: {sorted(val_metrics)}")
            return
        old = self.plateau.scale
        new = self.plateau.step(float(value))
        if new != old:
            logger.info(f"ReduceLROnPlateau: LR scale {old:g} -> {new:g} "
                        f"({self.plateau_monitor}={value:.5f})")
            self.state = self.state.replace(
                opt_state=set_lr_scale(self.state.opt_state, new))

    def fit(self) -> Dict[str, float]:
        self.maybe_resume()
        self.setup_state()
        max_epochs = int(self.cfg.train.max_epochs)
        val_metrics: Dict[str, float] = {}
        for epoch in range(self.start_epoch, max_epochs):
            t0 = time.time()
            self.train_epoch(epoch)
            val_metrics = self.validate(epoch)
            self._plateau_step(epoch, val_metrics)
            # save every epoch even when the val split is empty (no metrics):
            # the manager still writes `last`, so a run with a 0-batch val
            # loader remains crash-recoverable (reference save_last=True,
            # train.py:253, fires per-epoch regardless of val output)
            extra = {"epoch": epoch}
            if self.plateau:
                extra["plateau"] = self.plateau.state_dict()
            self.ckpt.save(int(self.state.step), self.state, val_metrics,
                           extra=extra)
            logger.info(f"epoch {epoch} done in {time.time() - t0:.1f}s")
        self.ckpt.wait()
        self.metrics.close()
        logger.info("Training process finished.")
        return val_metrics


def _param_count(tree) -> float:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree)) / 1e6
