"""Checkpoint machinery: orbax save/restore round-trip with monitor
semantics, torch-layout import translators, and the anyma export inverse."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinov2_distillation_tpu.utils.checkpoint import DistillCheckpointManager
from dinov2_distillation_tpu.utils import torch_import
from dinov2_distillation_tpu.utils.export import flax_student_to_torch_keys


# --- orbax round trip --------------------------------------------------------

def _tiny_state():
    return {
        "params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
        "step": jnp.asarray(5, jnp.int32),
    }


def test_checkpoint_roundtrip_and_monitor(tmp_path):
    mgr = DistillCheckpointManager(
        str(tmp_path / "ck"), monitor="val_sim", mode="max", save_top_k=1)
    state = _tiny_state()
    mgr.save(1, state, {"val_sim": 0.5})
    mgr.save(2, {**state, "step": jnp.asarray(10, jnp.int32)}, {"val_sim": 0.9})
    mgr.save(3, {**state, "step": jnp.asarray(15, jnp.int32)}, {"val_sim": 0.7})
    mgr.wait()

    assert mgr.best_step() == 2  # max val_sim

    restored = mgr.restore_last(state)
    assert restored is not None
    step, rstate, _ = restored
    assert step == 3
    assert int(rstate["step"]) == 15

    step, rstate, _ = mgr.restore_best(state)
    assert step == 2 and int(rstate["step"]) == 10
    np.testing.assert_array_equal(np.asarray(rstate["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    mgr.close()


# --- torch import ------------------------------------------------------------

def _build_stdc_template():
    from dinov2_distillation_tpu.models.backbones.stdc import build

    net, _ = build("stdc_1", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda: net.init(jax.random.PRNGKey(0), x, False))()
    return variables["params"], variables["batch_stats"]


def _fake_torch_stdc_state(params, stats):
    """Manufacture a torch-convention STDC state dict (detectron2 pkl shape
    conventions) from our flax template via the export inverse — then verify
    the import translator maps it back onto the exact same tree."""
    wrapped_p = {"backbone": params}
    wrapped_s = {"backbone": stats}
    flat = flax_student_to_torch_keys("stdc", wrapped_p, wrapped_s)
    # exported keys carry the 'backbone.' prefix the reference strips for stdc
    # after removing 'cp.backbone.'; emulate the on-disk 'cp.backbone.' form
    return {"cp." + k: v for k, v in flat.items()}


def test_stdc_pkl_import_roundtrip(tmp_path):
    params, stats = _build_stdc_template()
    state = _fake_torch_stdc_state(params, stats)
    # randomize so we can detect that values actually landed
    state = {k: np.random.default_rng(hash(k) % 2**32).standard_normal(v.shape)
             .astype(np.float32) for k, v in state.items()}
    pkl = tmp_path / "STDCNet1.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"model": state}, f)

    new_params, new_stats = torch_import.load_student_checkpoint(
        str(pkl), "stdc_1", {"backbone": params}, {"backbone": stats})

    # every leaf must have been replaced by the checkpoint values
    back = flax_student_to_torch_keys("stdc", new_params, new_stats)
    assert len(back) == len(state)
    for k, v in back.items():
        np.testing.assert_allclose(v, state["cp." + k], rtol=1e-6,
                                   err_msg=f"mismatch at {k}")


def _build_resnet_template(depth=18):
    from dinov2_distillation_tpu.models.backbones.resnet import build

    net, _ = build(f"resnet_{depth}", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(lambda: net.init(jax.random.PRNGKey(0), x, False))()
    return variables["params"], variables["batch_stats"]


def test_resnet_pkl_import_roundtrip(tmp_path):
    params, stats = _build_resnet_template()
    flat = flax_student_to_torch_keys("resnet", {"backbone": params}, {"backbone": stats})
    # resnet pkls have NO 'backbone.' prefix (detectron2 R-18.pkl layout)
    state = {k.replace("backbone.", ""): np.random.default_rng(i)
             .standard_normal(v.shape).astype(np.float32)
             for i, (k, v) in enumerate(sorted(flat.items()))}
    pkl = tmp_path / "R-18.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"model": state}, f)

    new_params, new_stats = torch_import.load_student_checkpoint(
        str(pkl), "resnet_18", {"backbone": params}, {"backbone": stats})
    back = flax_student_to_torch_keys("resnet", new_params, new_stats)
    for k, v in back.items():
        np.testing.assert_allclose(v, state[k.replace("backbone.", "")], rtol=1e-6)


def _build_template(model_name, img=64):
    from dinov2_distillation_tpu.models import zoo

    zoo._load_builders()
    net, _ = zoo._BUILDERS[zoo.family_id(model_name)](model_name, dtype=jnp.float32)
    x = jnp.zeros((1, img, img, 3), jnp.float32)
    variables = jax.jit(lambda: net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, False))()
    return variables["params"], variables.get("batch_stats", {})


# family checkpoints carry different key prefixes on disk
# (reference distillation_module.py:413-424)
_DISK_PREFIX = {
    "stdc": "cp.backbone.", "mit": "backbone.", "darknet": "backbone.",
    "mobilenet_v2": "backbone.", "presnet": "backbone.",
    "mobilenet_v3": "backbone.",
}

_ROUNDTRIP_CASES = [
    ("convnext_atto", "convnext"),
    ("darknet_n", "darknet"),
    ("mit_b0", "mit"),
    ("mobilenet_v2", "mobilenet_v2"),
    ("mobilenet_v3_small", "mobilenet_v3_small"),
    ("mobilenetv3_small_100", "mobilenetv3_small"),
    ("mobilenetv3_large_075", "mobilenetv3_large"),
    ("presnet_18", "presnet"),
    ("presnet_50", "presnet"),
    ("swin_tiny", "swin"),
    ("efficientnet_b0", "efficientnet"),
    ("edgenext_xx_small", "edgenext"),
]


@pytest.mark.parametrize("model_name,inv_family", _ROUNDTRIP_CASES,
                         ids=[c[0] for c in _ROUNDTRIP_CASES])
def test_family_import_roundtrip(model_name, inv_family, tmp_path):
    """Export inverse -> fake torch pkl -> import -> identical tree."""
    from dinov2_distillation_tpu.models.zoo import family_id

    params, stats = _build_template(model_name)
    flat = flax_student_to_torch_keys(inv_family, {"backbone": params},
                                      {"backbone": stats})
    assert flat, f"no exportable leaves for {model_name}"
    prefix = _DISK_PREFIX.get(family_id(model_name), "")
    state = {prefix + k.replace("backbone.", "", 1): np.random.default_rng(i)
             .standard_normal(v.shape).astype(np.float32)
             for i, (k, v) in enumerate(sorted(flat.items()))}
    pkl = tmp_path / f"{model_name}.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"model": state}, f)

    new_params, new_stats = torch_import.load_student_checkpoint(
        str(pkl), model_name, {"backbone": params}, {"backbone": stats})
    back = flax_student_to_torch_keys(inv_family, new_params, new_stats)
    assert len(back) == len(state)
    for k, v in back.items():
        want = state[prefix + k.replace("backbone.", "", 1)]
        np.testing.assert_allclose(v, want, rtol=1e-6, err_msg=f"{model_name}: {k}")


def test_import_covers_all_params():
    """Every param leaf of each family template must be reachable from some
    torch key (no silently-uninitializable weights)."""
    from dinov2_distillation_tpu.utils.torch_import import _flatten

    for model_name, inv_family in _ROUNDTRIP_CASES:
        params, stats = _build_template(model_name)
        flat_t = flax_student_to_torch_keys(inv_family, {"backbone": params},
                                            {"backbone": stats})
        n_leaves = len(_flatten(params)) + len(_flatten(stats))
        assert len(flat_t) == n_leaves, (
            f"{model_name}: {n_leaves - len(flat_t)} leaves not exportable")


def test_edgenext_translator_keys():
    from dinov2_distillation_tpu.utils.translators import make_edgenext_translator

    t, _ = make_edgenext_translator((2, 2, 6, 2), (0, 1, 1, 1))
    assert t("stem.0.weight")[1] == ("stem_conv", "kernel")
    assert t("stem.1.weight")[1] == ("stem_norm", "scale")
    assert t("stages.1.downsample.1.weight")[1] == ("downsample_conv_1", "kernel")
    assert t("stages.0.blocks.0.conv_dw.weight")[1] == ("stage0_conv0", "dwconv", "kernel")
    assert t("stages.0.blocks.0.gamma")[1] == ("stage0_conv0", "gamma")
    # stage 1: depth 2, one SDTA at the end -> blocks.1 is the SDTA
    assert t("stages.1.blocks.1.xca.qkv.weight")[1] == ("stage1_sdta0", "xca", "qkv", "kernel")
    assert t("stages.1.blocks.1.convs.0.weight")[1] == ("stage1_sdta0", "dw_0", "kernel")
    assert t("stages.1.blocks.1.mlp.fc1.weight")[1] == ("stage1_sdta0", "pwconv1", "kernel")
    assert t("stages.1.blocks.1.pos_embd.token_projection.weight")[1] == \
        ("stage1_sdta0", "pos_embd", "token_projection", "kernel")


def test_teacher_key_mapping_covers_vit():
    """Synthesize a DINOv2-hub-convention state dict for a tiny ViT and check
    every teacher param leaf is covered by the mapper."""
    from dinov2_distillation_tpu.models.vit import DINOv2ViT, ViTConfig

    cfg = ViTConfig("tiny", 32, 2, 2, pos_grid=7)
    model = DINOv2ViT(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 28, 28, 3), jnp.float32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()["params"]

    d = cfg.embed_dim
    state = {
        "cls_token": np.zeros((1, 1, d), np.float32),
        "pos_embed": np.zeros((1, 1 + 49, d), np.float32),
        "mask_token": np.zeros((1, d), np.float32),
        "patch_embed.proj.weight": np.zeros((d, 3, 14, 14), np.float32),
        "patch_embed.proj.bias": np.zeros((d,), np.float32),
        "norm.weight": np.ones((d,), np.float32),
        "norm.bias": np.zeros((d,), np.float32),
    }
    for i in range(cfg.depth):
        p = f"blocks.{i}."
        state.update({
            p + "norm1.weight": np.ones((d,), np.float32),
            p + "norm1.bias": np.zeros((d,), np.float32),
            p + "attn.qkv.weight": np.zeros((3 * d, d), np.float32),
            p + "attn.qkv.bias": np.zeros((3 * d,), np.float32),
            p + "attn.proj.weight": np.zeros((d, d), np.float32),
            p + "attn.proj.bias": np.zeros((d,), np.float32),
            p + "ls1.gamma": np.ones((d,), np.float32),
            p + "norm2.weight": np.ones((d,), np.float32),
            p + "norm2.bias": np.zeros((d,), np.float32),
            p + "mlp.fc1.weight": np.zeros((4 * d, d), np.float32),
            p + "mlp.fc1.bias": np.zeros((4 * d,), np.float32),
            p + "mlp.fc2.weight": np.zeros((d, 4 * d), np.float32),
            p + "mlp.fc2.bias": np.zeros((d,), np.float32),
            p + "ls2.gamma": np.ones((d,), np.float32),
        })
    mapped = torch_import.map_dinov2_keys(state)
    flat_template = torch_import._flatten(params)
    missing = [p for p in flat_template if p not in mapped]
    assert not missing, f"unmapped teacher params: {missing[:10]}"
    # shape compatibility (transposes applied)
    for path, v in flat_template.items():
        assert tuple(mapped[path].shape) == tuple(v.shape), path


# --- family auto-inference + export CLI (VERDICT r2 item 6) -----------------

_INFER_CASES = [
    ("resnet_50", "resnet"), ("stdc_1", "stdc"),
    ("convnext_atto", "convnext"), ("darknet_n", "darknet"),
    ("mit_b0", "mit"), ("mobilenet_v2", "mobilenet_v2"),
    ("mobilenet_v3_small", "mobilenet_v3_small"),
    ("mobilenet_v3_large", "mobilenet_v3_large"),
    ("presnet_18", "presnet"), ("swin_tiny", "swin"),
    ("efficientnet_b0", "efficientnet"), ("edgenext_xx_small", "edgenext"),
]


@pytest.mark.parametrize("model_name,want", _INFER_CASES,
                         ids=[c[0] for c in _INFER_CASES])
def test_infer_family(model_name, want):
    from dinov2_distillation_tpu.utils.export import infer_family

    params, _ = _build_template(model_name)
    assert infer_family({"backbone": params}) == want


def _run_export_cli(tmp_path, model_name, family_flag=None):
    """Build a real orbax checkpoint for a tiny student and drive the CLI."""
    import runpy
    import sys

    from dinov2_distillation_tpu.utils.checkpoint import DistillCheckpointManager

    params, stats = _build_template(model_name)
    state = {
        "params": {"student": {"backbone": params}},
        "batch_stats": {"student": {"backbone": stats}},
    }
    ckpt_dir = str(tmp_path / "checkpoints")
    mgr = DistillCheckpointManager(ckpt_dir)
    mgr.save(0, state, {"val_scalekd_res5_spatial_similarity": 0.5})
    mgr.close()

    out = str(tmp_path / "exported.pkl")
    argv = ["convert_to_anyma.py", ckpt_dir, out]
    if family_flag:
        argv += ["--family", family_flag]
    old = sys.argv
    sys.argv = argv
    try:
        runpy.run_path("scripts/convert_to_anyma.py", run_name="__main__")
    finally:
        sys.argv = old
    with open(out, "rb") as f:
        payload = pickle.load(f)
    assert payload["__author__"] == "dinov2_distilled"
    assert payload["matching_heuristics"] is True
    return payload["model"]


def test_export_cli_convnext(tmp_path):
    model = _run_export_cli(tmp_path, "convnext_atto")
    assert any(k.startswith("backbone.stages.") for k in model)
    assert len(model) > 20


def test_export_cli_swin_with_family_flag(tmp_path):
    model = _run_export_cli(tmp_path, "swin_tiny", family_flag="swin")
    assert any("attn.qkv.weight" in k for k in model)
    assert any("relative_position_bias_table" in k for k in model)
