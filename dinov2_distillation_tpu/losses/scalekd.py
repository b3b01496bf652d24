"""ScaleKD loss stack — attention projectors + spatial/frequency losses.

TPU-native re-design of the reference loss subsystem
(``losses/scalekd.py``, 472 LoC): per feature level, two trainable
``AttentionProjector``s lift student features into teacher token space
(spatial path / frequency path), then the loss is channel-normalized MSE
against the teacher map — plain for the spatial branch, DC-component-removed
for the frequency branch.

Layout: all feature maps are NHWC; projector outputs are (B, N, D) token
sequences, matching the teacher's patch tokens. Loss math runs in fp32.

Parity quirks preserved (SURVEY.md §2.2/§3.2):
  * per-branch ``softmax_scale`` multiplying the attention logits
    (reference :308),
  * learnable query embedding iff ``self_query``; else an external query is
    mandatory (reference :219-236),
  * FFN activation is ReLU despite the reference's act_cfg saying GeLU
    (reference :448),
  * frequency loss zeroes only the DC coefficient (reference :114-115) — on
    TPU this is computed as mean-subtraction, which is mathematically
    identical to the DCT->zero-DC->IDCT round-trip (tested against the
    transform-domain form in tests/test_dct.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import fused_attention, token_major_attention

_NORM_EPS = 1e-12  # torch F.normalize default


def _l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, _NORM_EPS)


def _tokens_to_map(tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, N, D) row-major tokens -> (B, H, W, D)."""
    b, n, d = tokens.shape
    assert n == h * w, f"token count {n} != {h}x{w}"
    return tokens.reshape(b, h, w, d)


def _masked_batch_stats(sq_err: jnp.ndarray, cos: jnp.ndarray, alpha: float,
                        sample_mask: Optional[jnp.ndarray]):
    """Reduce per-sample sq-err sums (B,) and cosine sums (B,) to the
    reference's ``sum/B*alpha`` loss and mean similarity; with a validity
    mask, padded samples (mask 0) are excluded from both numerator and
    denominator so wrap-padded val batches are unbiased (VERDICT r2 #10)."""
    if sample_mask is None:
        return jnp.mean(sq_err) * alpha, jnp.mean(cos)
    m = sample_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(sq_err * m) / denom * alpha, jnp.sum(cos * m) / denom


def fused_loss_mode(n_tokens: int, dim: int) -> str:
    """Resolve the fused spatial/freq loss path (ops/scalekd_loss.py):
    DKT_FUSED_LOSS=0 forces XLA, =interpret runs the kernel on CPU for
    tests, default uses the kernel on TPU when shapes are lane-aligned."""
    import os

    from ..ops.scalekd_loss import loss_fusion_supported

    flag = os.environ.get("DKT_FUSED_LOSS", "1")
    if flag == "0" or not loss_fusion_supported(n_tokens, dim):
        return "off"
    if flag == "interpret":
        return "interpret"
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    return "on" if on_tpu else "off"


def fused_pair_losses(pair: jnp.ndarray, teacher_map: jnp.ndarray,
                      alphas, freq_flags, mode: str):
    """(2, B, N, D) branch pair + (B, H, W, D) teacher -> per-branch
    (loss, similarity) via the fused kernel (reference math
    losses/scalekd.py:67-127; scaling sum/B*alpha, mean cosine)."""
    from ..ops.scalekd_loss import pair_loss_sums

    b, h, w, d = teacher_map.shape
    n = h * w
    tmap = teacher_map.astype(jnp.float32).reshape(b, n, d)
    sums = pair_loss_sums(pair, tmap, tuple(freq_flags), mode == "interpret")
    out = []
    for k in range(2):
        out.append((sums[k, 0] / b * alphas[k], sums[k, 1] / (b * n)))
    return out


def spatial_loss_fn(
    student_tokens: jnp.ndarray, teacher_map: jnp.ndarray, alpha: float,
    sample_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Channel-normalized MSE (sum / batch * alpha) + mean cosine similarity.

    Reference ``get_spat_loss`` (losses/scalekd.py:67-92): student tokens are
    reshaped onto the teacher grid, both maps L2-normalized along channels,
    ``MSELoss(reduction='sum') / B * alpha``; the similarity monitor is the
    mean channel-wise cosine similarity. ``sample_mask`` (B,) of 0/1
    excludes padded samples (identical result when all-ones).
    """
    b, h, w, d = teacher_map.shape
    s = _tokens_to_map(student_tokens, h, w).astype(jnp.float32)
    t = teacher_map.astype(jnp.float32)
    s = _l2_normalize(s, axis=-1)
    t = _l2_normalize(t, axis=-1)
    sq = jnp.sum((s - t) ** 2, axis=(1, 2, 3))
    cos = jnp.mean(jnp.sum(s * t, axis=-1), axis=(1, 2))
    return _masked_batch_stats(sq, cos, alpha, sample_mask)


def frequency_loss_fn(
    student_tokens: jnp.ndarray, teacher_map: jnp.ndarray, alpha: float,
    sample_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DC-removed channel-normalized MSE + similarity.

    Reference ``get_freq_loss`` (losses/scalekd.py:95-127): 2-D DCT both
    maps, zero the DC coefficient, inverse DCT, normalize, MSE-sum / B *
    alpha. Zeroing exactly the (0,0) DCT coefficient of an orthogonal-basis
    pair that round-trips to identity is equivalent to removing the spatial
    mean, which is how we compute it (no transform needed on the hot path).
    """
    b, h, w, d = teacher_map.shape
    s = _tokens_to_map(student_tokens, h, w).astype(jnp.float32)
    t = teacher_map.astype(jnp.float32)
    s = s - jnp.mean(s, axis=(1, 2), keepdims=True)
    t = t - jnp.mean(t, axis=(1, 2), keepdims=True)
    s = _l2_normalize(s, axis=-1)
    t = _l2_normalize(t, axis=-1)
    sq = jnp.sum((s - t) ** 2, axis=(1, 2, 3))
    cos = jnp.mean(jnp.sum(s * t, axis=-1), axis=(1, 2))
    return _masked_batch_stats(sq, cos, alpha, sample_mask)


class FFN(nn.Module):
    """Two-layer MLP with residual; ReLU (reference losses/scalekd.py:431-471)."""

    dim: int
    hidden: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class WindowMultiheadPosAttention(nn.Module):
    """Cross-attention: query from pos/query tokens, key/value from student.

    Reference ``losses/scalekd.py:248-335``. Logits are scaled by
    ``head_dim**-0.5 * softmax_scale``; optional window partitioning reshapes
    the token grid into ``window_shapes`` local windows (a *local* attention
    trick, not distribution — SURVEY.md §5).
    """

    embed_dim: int
    num_heads: int
    pos_dim: int
    window_shapes: Tuple[int, int] = (1, 1)
    softmax_scale: float = 5.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pos_emb: jnp.ndarray,
        softmax_scale: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, n, _ = x.shape
        n_out = pos_emb.shape[1]
        if self.embed_dim % self.num_heads:
            # reference parity: torch's (B, N, nh, hd) reshape throws on a
            # non-dividing head count (scalekd.py:303-306); the lane-slice
            # formulation would otherwise silently DROP the tail channels
            # (found r4: vitl teacher_dims=1024 with the config's 24 heads)
            raise ValueError(
                f"embed_dim {self.embed_dim} not divisible by num_heads "
                f"{self.num_heads}")
        nh, hd = self.num_heads, self.embed_dim // self.num_heads
        wh, ww = self.window_shapes
        n_windows = wh * ww

        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q")(pos_emb)
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v")(x)

        if softmax_scale is not None:
            # dynamic per-branch scale (vmapped projector pairs): folding the
            # logit scale into q is equivalent to scaling the scores
            q = q * softmax_scale.astype(q.dtype)
            scale = hd ** -0.5
        else:
            scale = hd ** -0.5 * self.softmax_scale

        if n_windows > 1:
            qh = q.reshape(b, n_out, nh, hd).transpose(0, 2, 1, 3)
            kh = k.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
            vh = v.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
            out = fused_attention(
                self._separate_tokens(qh), self._separate_tokens(kh),
                self._separate_tokens(vh), scale=scale)
            out = out.reshape(b, nh, n_out, hd).transpose(0, 2, 1, 3)
            out = out.reshape(b, n_out, self.embed_dim)
        else:
            # token-major: heads are lane slices in-kernel (no transposes,
            # no head-dim padding — vital at head_dim 16/24)
            out = token_major_attention(q, k, v, nh, scale=scale)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(out)

    def _separate_tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        """Partition a square token grid into local windows
        (reference :327-335): (B, H_heads, N, hd) ->
        (B, H_heads * wh * ww, N / (wh*ww), hd)."""
        b, nh, n, hd = x.shape
        side = int(round(n ** 0.5))
        assert side * side == n, f"windowed attention needs a square grid, got {n}"
        wh, ww = self.window_shapes
        x = x.reshape(b, nh, wh, side // wh, ww, side // ww, hd)
        x = x.transpose(0, 1, 2, 4, 3, 5, 6)
        return x.reshape(b, nh * wh * ww, -1, hd)


class AttentionProjector(nn.Module):
    """Student -> teacher-token-space projector (reference :177-245).

    1x1 conv + BN + ReLU on the student map, add a learnable 2-D pos-embed,
    cross-attend with either an external query (TPP cascade) or a learnable
    query embedding, residual, pre-norm FFN, final LayerNorm. Output is a
    (B, H*W, teacher_dims) token sequence.
    """

    student_dim: int
    teacher_dim: int
    hw: Tuple[int, int]
    pos_dim: int
    window_shapes: Tuple[int, int] = (1, 1)
    self_query: bool = True
    softmax_scale: float = 5.0
    num_heads: int = 8
    dtype: Any = jnp.bfloat16

    def setup(self):
        # setup-style (not nn.compact) so ``head``/``tail`` can run as
        # separate lifted-vmap methods and the fused projector-tail kernel
        # can read the tail submodules' raw params (models/vit.py pattern).
        # Attribute names reproduce the previous inline names, keeping the
        # param tree (and every importer/checkpoint) unchanged.
        self.proj_conv = nn.Conv(
            self.teacher_dim, (1, 1), dtype=self.dtype, name="proj_conv")
        from ..models.backbones.common import batch_norm

        # BN honors the per-replica/sync scope flag like every student BN
        # (the projector is part of the optimized model, so DDP would have
        # given it per-replica stats too)
        self.proj_bn = batch_norm(None, name="proj_bn", dtype=self.dtype)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, self.hw[0], self.hw[1], self.teacher_dim))
        if self.self_query:
            self.query_embed = self.param(
                "query_embed",
                nn.initializers.normal(1.0),  # torch nn.Embedding default N(0,1)
                (self.hw[0] * self.hw[1], self.teacher_dim))
        self.pos_attention = WindowMultiheadPosAttention(
            embed_dim=self.teacher_dim,
            num_heads=self.num_heads,
            pos_dim=self.pos_dim,
            window_shapes=tuple(self.window_shapes),
            softmax_scale=self.softmax_scale,
            dtype=self.dtype,
            name="pos_attention",
        )
        self.norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        self.ffn = FFN(self.teacher_dim, self.teacher_dim * 4,
                       dtype=self.dtype, name="ffn")
        self.norm_2 = nn.LayerNorm(dtype=self.dtype, name="norm_2")

    def head(
        self,
        x: jnp.ndarray,
        query: Optional[jnp.ndarray] = None,
        use_external_query: Optional[bool] = None,
        train: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """conv+BN+ReLU+pos-add and query resolution -> (s_tokens, q_tokens)."""
        h, w = self.hw
        b = x.shape[0]
        if use_external_query is None:
            use_external_query = query is not None

        if use_external_query:
            pos_emb = query  # (B, N, D) external query tokens (TPP cascade)
        elif self.self_query:
            pos_emb = jnp.broadcast_to(
                self.query_embed[None].astype(self.dtype),
                (b, h * w, self.teacher_dim))
        else:
            raise ValueError(
                "AttentionProjector with self_query=False requires an external query "
                "(reference losses/scalekd.py:231-236)"
            )

        s = self.proj_conv(x.astype(self.dtype))
        s = self.proj_bn(s, use_running_average=not train)
        s = nn.relu(s)
        s = s + self.pos_embed.astype(s.dtype)
        s_tokens = s.reshape(b, h * w, self.teacher_dim)
        return s_tokens, pos_emb.astype(self.dtype)

    def tail(
        self,
        s_tokens: jnp.ndarray,
        q_tokens: jnp.ndarray,
        softmax_scale: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Attention + residual + LN + FFN + LN (the fused-kernel region)."""
        attn_out = self.pos_attention(s_tokens, q_tokens, softmax_scale)
        fea = attn_out + s_tokens
        fea = self.norm(fea)
        fea = self.ffn(fea)
        return self.norm_2(fea)

    def tail_params(self):
        """Raw param subtrees of the tail submodules (for the fused kernel)."""
        return {
            "attn": self.pos_attention.variables["params"],
            "norm": self.norm.variables["params"],
            "ffn": self.ffn.variables["params"],
            "norm_2": self.norm_2.variables["params"],
        }

    def __call__(
        self,
        x: jnp.ndarray,
        query: Optional[jnp.ndarray] = None,
        softmax_scale: Optional[jnp.ndarray] = None,
        # static flags are positional: flax's lifted vmap drops kwargs
        use_external_query: Optional[bool] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        s_tokens, pos_emb = self.head(x, query, use_external_query, train)
        return self.tail(s_tokens, pos_emb, softmax_scale)


class ScaleKD(nn.Module):
    """Per-level ScaleKD loss module (reference ``losses/scalekd.py:12-127``).

    Holds the two projectors (``projector_0`` = spatial path, ``projector_1``
    = frequency path). ``__call__`` is the res5 composite; lower levels use
    ``project_feat_spat`` / ``project_feat_freq`` directly and feed the TPP
    cascade (see train/distill.py).
    """

    student_dim: int
    teacher_dim: int
    query_hw: Tuple[int, int]
    pos_dim: int
    alpha: Tuple[float, float] = (0.08, 0.06)
    window_shapes: Tuple[int, int] = (1, 1)
    self_query: bool = True
    softmax_scale: Tuple[float, float] = (5.0, 5.0)
    num_heads: int = 8
    dtype: Any = jnp.bfloat16

    def setup(self):
        # The spatial (idx 0) and frequency (idx 1) projectors are the same
        # architecture with independent parameters (reference :29-30). vmap
        # over a leading branch axis runs both in one set of XLA ops at twice
        # the arithmetic intensity — measurably faster than two subgraphs on
        # TPU. Per-branch softmax_scale is passed as a mapped argument.
        lift = dict(
            out_axes=0,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
        )
        vmapped = nn.vmap(
            AttentionProjector,
            methods={
                # x broadcast; query + softmax_scale stacked; flags static
                "__call__": dict(in_axes=(None, 0, 0, None, None), **lift),
                # fused-tail path: lifted head (conv+BN+pos+query resolve),
                # tail runs as one Pallas kernel on the stacked pair
                "head": dict(in_axes=(None, 0, None, None), **lift),
            },
        )
        self.projectors = vmapped(
            student_dim=self.student_dim,
            teacher_dim=self.teacher_dim,
            hw=tuple(self.query_hw),
            pos_dim=self.pos_dim,
            window_shapes=tuple(self.window_shapes),
            self_query=self.self_query,
            num_heads=self.num_heads,
            dtype=self.dtype,
        )

    def project_pair(
        self,
        preds_S: jnp.ndarray,
        queries: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
    ) -> jnp.ndarray:
        """Run both projectors; ``queries`` is (2, B, N, D) stacked
        [spatial_query, frequency_query] or None. Returns (2, B, N, D)."""
        h, w = self.query_hw
        b = preds_S.shape[0]
        use_external = queries is not None
        if queries is None:
            if not self.self_query:
                raise ValueError(
                    "AttentionProjector with self_query=False requires an "
                    "external query (reference losses/scalekd.py:231-236)")
            queries = jnp.zeros((2, b, h * w, self.teacher_dim), self.dtype)
        scales = jnp.asarray(self.softmax_scale, jnp.float32)
        mode = self._fused_tail_mode(h * w)
        if mode != "off":
            from ..ops.projector import fused_projector_tail

            s_tokens, q_tokens = self.projectors.head(
                preds_S, queries, use_external, train)
            pv = self.projectors.variables["params"]
            tail_tree = {
                "attn": {k_: pv["pos_attention"][k_] for k_ in ("q", "k", "v", "proj")},
                "norm": pv["norm"],
                "ffn": pv["ffn"],
                "norm_2": pv["norm_2"],
            }
            return fused_projector_tail(
                s_tokens, q_tokens, scales, tail_tree, self.num_heads,
                mode == "interpret")
        return self.projectors(preds_S, queries, scales, use_external, train)

    def _fused_tail_mode(self, n_tokens: int) -> str:
        import os

        from ..ops.projector import projector_tail_supported

        flag = os.environ.get("DKT_FUSED_PROJ", "1")
        if self.is_initializing() or flag == "0":
            return "off"
        if not projector_tail_supported(
                n_tokens, self.teacher_dim, self.num_heads, self.window_shapes):
            return "off"
        if flag == "interpret":  # CPU wiring tests
            return "interpret"
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        return "on" if on_tpu else "off"

    def __call__(
        self,
        preds_S: jnp.ndarray,
        preds_T: jnp.ndarray,
        query_s: Optional[jnp.ndarray] = None,
        query_f: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
        sample_mask: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        if (query_s is None) != (query_f is None):
            raise ValueError("query_s and query_f must both be given or both None")
        queries = None if query_s is None else jnp.stack([query_s, query_f])
        pair = self.project_pair(preds_S, queries, train=train)
        mode = fused_loss_mode(pair.shape[2], preds_T.shape[-1]) \
            if sample_mask is None else "off"
        if mode != "off":
            (spat_loss, spat_sim), (freq_loss, freq_sim) = fused_pair_losses(
                pair, preds_T, self.alpha, (0, 1), mode)
        else:
            s_spat, s_freq = pair[0], pair[1]
            spat_loss, spat_sim = spatial_loss_fn(
                s_spat, preds_T, self.alpha[0], sample_mask)
            freq_loss, freq_sim = frequency_loss_fn(
                s_freq, preds_T, self.alpha[1], sample_mask)
        return {
            "spatial_loss": spat_loss,
            "frequency_loss": freq_loss,
            "spatial_similarity": spat_sim,
            "frequency_similarity": freq_sim,
            "loss": spat_loss + freq_loss,
        }

    # API-parity helpers (reference ScaleKD.project_feat_spat/freq :56-64).
    # They run the vmapped pair and select one branch — use project_pair on
    # hot paths.
    def project_feat_spat(
        self, preds_S: jnp.ndarray, query: Optional[jnp.ndarray] = None, *, train: bool = True
    ) -> jnp.ndarray:
        queries = None if query is None else jnp.stack([query, query])
        return self.project_pair(preds_S, queries, train=train)[0]

    def project_feat_freq(
        self, preds_S: jnp.ndarray, query: Optional[jnp.ndarray] = None, *, train: bool = True
    ) -> jnp.ndarray:
        queries = None if query is None else jnp.stack([query, query])
        return self.project_pair(preds_S, queries, train=train)[1]
