"""The distillation model: frozen teacher + student + ScaleKD loss heads.

TPU-native counterpart of the reference's ``DistillationModule``
(``train/distillation_module.py:15-502``) minus the runtime concerns (which
live in train/loop.py): one flax module whose ``__call__`` runs the full
forward — teacher features (gradient-stopped), student features, and the
composite ScaleKD loss — returning ``(total_loss, metrics)`` ready for
``jax.value_and_grad`` under jit.

Behavioral parity quirks, all load-bearing for metric parity (SURVEY.md §3.2):
  * losses iterate in *sorted name order* and ``break`` after the res5 head
    (reference :207-224);
  * non-res5 levels project the student features, forward both projections
    through a *suffix of frozen teacher blocks* (the TPP cascade), hand them
    to the next level as spatial/frequency queries, and score **both**
    branches with the *spatial* loss — no DCT below res5 (reference :227-243);
  * teacher block range: ``start = int(depth * {res2:.25, res3:.50,
    res4:.75})``, ``end = int(depth/4) - 1`` except res4 where
    ``end = depth - 1`` (reference :162-178) — empty for res2/res3 on
    12-block ViT-S, blocks [9, 11) for res4;
  * teacher parameters are frozen but the cascade is *not* gradient-stopped:
    gradients flow through the frozen blocks back to the projectors.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..losses.scalekd import ScaleKD, frequency_loss_fn, spatial_loss_fn
from ..models.vit import DINOv2ViT
from ..models.zoo import StudentWrapper

_STAGE_FRACS = {"res2": 0.25, "res3": 0.50, "res4": 0.75}


def teacher_block_range(depth: int, level: str) -> Tuple[int, int]:
    """Block suffix [start, end) for the TPP cascade (reference :162-178)."""
    start = int(depth * _STAGE_FRACS[level])
    end = int(depth / 4) - 1
    if level == "res4":
        end = depth - 1
    return start, end


class DistillationModel(nn.Module):
    """Teacher + student + loss heads as one jittable forward."""

    teacher: DINOv2ViT
    student: StudentWrapper
    # Static loss plan: tuple of (name, weight, kwargs-dict) in config order.
    loss_specs: Tuple[Tuple[str, float, Any], ...]
    teacher_key: str = "feature_map"
    dtype: Any = jnp.bfloat16

    def setup(self):
        heads = {}
        for name, _weight, kwargs in self.loss_specs:
            heads[name] = ScaleKD(
                student_dim=int(kwargs["student_dims"]),
                teacher_dim=int(kwargs["teacher_dims"]),
                query_hw=tuple(kwargs["query_hw"]),
                pos_dim=int(kwargs["pos_dims"]),
                alpha=tuple(kwargs.get("alpha", (0.08, 0.06))),
                window_shapes=tuple(kwargs.get("window_shapes", (1, 1))),
                self_query=bool(kwargs.get("self_query", True)),
                softmax_scale=tuple(kwargs.get("softmax_scale", (5.0, 5.0))),
                num_heads=int(kwargs.get("num_heads", 8)),
                dtype=self.dtype,
            )
        # dict-valued submodule attr: flax names each head "loss_heads_<name>"
        self.loss_heads = heads
        self.loss_weights = {name: float(w) for name, w, _ in self.loss_specs}

    def extract_features(
        self, images: jnp.ndarray, train: bool = True
    ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
        """Student feature dict + gradient-stopped teacher map
        (reference ``_extract_features`` :311-337)."""
        teacher_map = jax.lax.stop_gradient(self.teacher(images)[self.teacher_key])
        student_feats = self.student(images, train)
        return student_feats, teacher_map

    def compute_losses(
        self,
        student_feats: Dict[str, jnp.ndarray],
        teacher_map: jnp.ndarray,
        train: bool = True,
        sample_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Composite loss (reference ``_compute_losses`` :180-246)."""
        total = jnp.asarray(0.0, jnp.float32)
        metrics: Dict[str, jnp.ndarray] = {}

        spatial_query: Optional[jnp.ndarray] = None
        frequency_query: Optional[jnp.ndarray] = None
        depth = self.teacher.cfg.depth

        for name in sorted(self.loss_weights.keys()):
            level = name.split("_")[1]
            head = self.loss_heads[name]
            weight = self.loss_weights[name]

            if "res5" in name:
                out = head(
                    student_feats[level], teacher_map,
                    query_s=spatial_query, query_f=frequency_query, train=train,
                    sample_mask=sample_mask,
                )
                metrics[f"{name}_total_loss"] = out["loss"] * weight
                metrics[f"{name}_frequency_loss"] = out["frequency_loss"] * weight
                metrics[f"{name}_spatial_loss"] = out["spatial_loss"] * weight
                metrics[f"{name}_spatial_similarity"] = out["spatial_similarity"]
                metrics[f"{name}_frequency_similarity"] = out["frequency_similarity"]
                total = total + out["loss"] * weight
                break

            queries = None if spatial_query is None else jnp.stack(
                [spatial_query, frequency_query])
            pair = head.project_pair(student_feats[level], queries, train=train)
            start, end = teacher_block_range(depth, level)
            if end > start:
                # Both branches traverse the SAME frozen blocks — batch them
                # into one pass (halves kernel dispatches and weight traffic).
                two, b, n, d = pair.shape
                both = self.teacher.forward_blocks(pair.reshape(two * b, n, d), start, end)
                pair = both.reshape(two, b, n, d)
            feat_spat, feat_freq = pair[0], pair[1]
            spatial_query = feat_spat
            frequency_query = feat_freq

            alpha0 = float(head.alpha[0])
            # Quirk: the "frequency" branch below res5 also uses the spatial
            # loss (reference :237) — no DCT/DC-removal at res4.
            from ..losses.scalekd import fused_loss_mode, fused_pair_losses

            mode = fused_loss_mode(pair.shape[2], teacher_map.shape[-1]) \
                if sample_mask is None else "off"
            if mode != "off":
                (spat_loss, spat_sim), (freq_loss, freq_sim) = \
                    fused_pair_losses(pair, teacher_map, (alpha0, alpha0),
                                      (0, 0), mode)
            else:
                spat_loss, spat_sim = spatial_loss_fn(
                    feat_spat, teacher_map, alpha0, sample_mask)
                freq_loss, freq_sim = spatial_loss_fn(
                    feat_freq, teacher_map, alpha0, sample_mask)

            metrics[f"{name}_total_loss"] = (spat_loss + freq_loss) * weight
            metrics[f"{name}_frequency_loss"] = freq_loss * weight
            metrics[f"{name}_spatial_loss"] = spat_loss * weight
            metrics[f"{name}_spatial_similarity"] = spat_sim
            metrics[f"{name}_frequency_similarity"] = freq_sim
            total = total + (spat_loss + freq_loss) * weight

        metrics["loss"] = total
        return total, metrics

    def __call__(
        self, images: jnp.ndarray, train: bool = True,
        sample_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        student_feats, teacher_map = self.extract_features(images, train)
        return self.compute_losses(student_feats, teacher_map, train, sample_mask)


def build_loss_specs(cfg) -> Tuple[Tuple[str, float, Dict[str, Any]], ...]:
    """Extract the static (name, weight, kwargs) loss plan from a config
    (reference ``_initialize_loss`` :112-137; name defaults to the type)."""
    specs: List[Tuple[str, float, Dict[str, Any]]] = []
    for spec in cfg.loss.losses:
        if spec["type"] != "scalekd":
            raise KeyError(f"Unknown loss type {spec['type']!r}; registry: ['scalekd']")
        kwargs = spec["kwargs"].to_container() if hasattr(spec["kwargs"], "to_container") \
            else dict(spec["kwargs"])
        name = kwargs.get("name", spec["type"])
        specs.append((name, float(spec["weight"]), kwargs))
    return tuple(specs)
