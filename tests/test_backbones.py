"""Stage shape / stride / channel-table goldens per backbone family
(SURVEY.md §2.3 tables) and the wrapper's resize-to-grid contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinov2_distillation_tpu.models.zoo import available_families, create_student, family_id

_IMG = 64  # divisible by 32; keeps CPU compile fast

# (model_name, expected channel table). Extended as families are added.
CASES = [
    ("stdc_1", {"res2": 64, "res3": 256, "res4": 512, "res5": 1024}),
    ("stdc_2", {"res2": 64, "res3": 256, "res4": 512, "res5": 1024}),
    ("resnet_18", {"res2": 64, "res3": 128, "res4": 256, "res5": 512}),
    ("resnet_50", {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}),
]

_STRIDES = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}


@pytest.mark.parametrize("model_name,channels", CASES, ids=[c[0] for c in CASES])
def test_backbone_stage_shapes(model_name, channels, rng):
    backbone_builder_check(model_name, channels, rng)


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
