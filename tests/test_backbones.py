"""Stage shape / stride / channel-table goldens per backbone family
(SURVEY.md §2.3 tables) and the wrapper's resize-to-grid contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinov2_distillation_tpu.models.zoo import available_families, create_student, family_id

_IMG = 64  # divisible by 32; keeps CPU compile fast

_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
# torchvision-tap strides (SURVEY.md §2.3 mobilenet_v3: taps are C2/C3/C4/last,
# one level deeper than the detectron2 convention — the reference's hardcoded
# {4,8,16,32} table does not match its own taps; actual shapes win)
_MNV3_STRIDES = {"res2": 8, "res3": 16, "res4": 32, "res5": 32}
_MNV3_OS8 = {"res2": 8, "res3": 16, "res4": 16, "res5": 16}
_MNV2_OS8 = {"res2": 4, "res3": 8, "res4": 8, "res5": 8}

# (model_name, expected channel table, strides). Extended as families land.
CASES = [
    ("stdc_1", {"res2": 64, "res3": 256, "res4": 512, "res5": 1024}, _STRIDES),
    ("stdc_2", {"res2": 64, "res3": 256, "res4": 512, "res5": 1024}, _STRIDES),
    ("resnet_18", {"res2": 64, "res3": 128, "res4": 256, "res5": 512}, _STRIDES),
    ("resnet_50", {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}, _STRIDES),
    ("convnext_atto", {"res2": 40, "res3": 80, "res4": 160, "res5": 320}, _STRIDES),
    ("convnext_tiny", {"res2": 96, "res3": 192, "res4": 384, "res5": 768}, _STRIDES),
    ("mobilenet_v2", {"res2": 24, "res3": 32, "res4": 96, "res5": 320}, _STRIDES),
    ("mobilenet_v2_os8", {"res2": 24, "res3": 32, "res4": 96, "res5": 320}, _MNV2_OS8),
    ("mobilenet_v3_small", {"res2": 24, "res3": 40, "res4": 96, "res5": 576}, _MNV3_STRIDES),
    ("mobilenet_v3_large", {"res2": 40, "res3": 80, "res4": 160, "res5": 960}, _MNV3_STRIDES),
    ("mobilenet_v3_small_os8", {"res2": 24, "res3": 40, "res4": 96, "res5": 576}, _MNV3_OS8),
    ("mobilenetv3_small_050", {"res2": 16, "res3": 24, "res4": 48, "res5": 288}, _MNV3_STRIDES),
    ("darknet_n", {"res2": 32, "res3": 64, "res4": 128, "res5": 256}, _STRIDES),
    ("darknet_m", {"res2": 96, "res3": 192, "res4": 384, "res5": 576}, _STRIDES),
    ("presnet_18", {"res2": 64, "res3": 128, "res4": 256, "res5": 512}, _STRIDES),
    ("presnet_50", {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}, _STRIDES),
    ("mit_b0", {"res2": 32, "res3": 64, "res4": 160, "res5": 256}, _STRIDES),
    ("mit_b2", {"res2": 64, "res3": 128, "res4": 320, "res5": 512}, _STRIDES),
    ("swin_tiny", {"res2": 96, "res3": 192, "res4": 384, "res5": 768}, _STRIDES),
    ("efficientnet_b0", {"res2": 24, "res3": 40, "res4": 112, "res5": 320}, _STRIDES),
    ("efficientnet_b2", {"res2": 24, "res3": 48, "res4": 120, "res5": 352}, _STRIDES),
    ("edgenext_xx_small", {"res2": 24, "res3": 48, "res4": 88, "res5": 168}, _STRIDES),
]


@pytest.mark.parametrize("model_name,channels,strides", CASES, ids=[c[0] for c in CASES])
def test_backbone_stage_shapes(model_name, channels, strides, rng):
    backbone_builder_check(model_name, channels, rng, strides=strides)


def backbone_builder_check(model_name, channels, rng, strides=_STRIDES, img=_IMG):
    from dinov2_distillation_tpu.models import zoo

    zoo._load_builders()
    builder = zoo._BUILDERS[family_id(model_name)]
    net, got_channels = builder(model_name, dtype=jnp.float32)
    assert got_channels == channels

    x = jnp.asarray(rng.standard_normal((1, img, img, 3)).astype(np.float32))
    variables = jax.jit(lambda: net.init(jax.random.PRNGKey(0), x, False))()
    feats = jax.jit(lambda v: net.apply(v, x, False))(variables)
    for level, ch in channels.items():
        assert level in feats, f"{model_name} missing {level}"
        s = strides[level]
        assert feats[level].shape == (1, img // s, img // s, ch), (
            f"{model_name} {level}: {feats[level].shape}"
        )


def test_wrapper_resizes_to_teacher_grid(rng):
    student, channels = create_student(
        "stdc_1", (16, 16), ["res5", "res4"], dtype=jnp.float32
    )
    x = jnp.asarray(rng.standard_normal((2, 224, 224, 3)).astype(np.float32))
    variables = jax.jit(lambda: student.init(jax.random.PRNGKey(0), x, False))()
    feats = jax.jit(lambda v: student.apply(v, x, False))(variables)
    assert set(feats) == {"res4", "res5"}
    assert feats["res4"].shape == (2, 16, 16, channels["res4"])
    assert feats["res5"].shape == (2, 16, 16, channels["res5"])


def test_family_id_parsing():
    assert family_id("resnet_50") == "resnet"
    assert family_id("mobilenet_v2_os8") == "mobilenet_v2"
    assert family_id("mobilenet_v3_large") == "mobilenet_v3"
    assert family_id("mobilenetv3_large_100") == "mobilenetv3"
    assert family_id("edgenext_xx_small") == "edgenext"


def test_available_families_nonempty():
    fams = available_families()
    assert "stdc" in fams and "resnet" in fams
