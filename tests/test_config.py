"""Config system: YAML load, dotted overrides, derived fields."""

import pytest

from dinov2_distillation_tpu.config import (
    ConfigNode,
    apply_overrides,
    derive_config,
    inject_student_dims,
    load_config,
)


def _base_cfg():
    return ConfigNode({
        "teacher": {"model_name": "dinov2_vits14"},
        "data_transform": {"global_crops_scale": [0.08, 1.0],
                           "global_crops_size": [224, 224]},
        "loss": {"losses": [
            {"type": "scalekd", "weight": 1, "kwargs": {"name": "scalekd_res4"}},
            {"type": "scalekd", "weight": 1.0, "kwargs": {"name": "scalekd_res5"}},
        ]},
    })


def test_derive_teacher_fields():
    cfg = derive_config(_base_cfg())
    assert cfg.teacher.out_dim == 384
    assert cfg.teacher.teacher_key == "feature_map"
    assert cfg.teacher.n_patches == [16, 16]
    for loss in cfg.loss.losses:
        assert loss.kwargs.teacher_dims == 384
        assert loss.kwargs.pos_dims == 384
        assert loss.kwargs.pos_hw == [16, 16]
        assert loss.kwargs.query_hw == [16, 16]


def test_derive_unknown_teacher_raises():
    cfg = _base_cfg()
    cfg.teacher.model_name = "dinov2_vith14"
    with pytest.raises(KeyError):
        derive_config(cfg)


def test_inject_student_dims():
    cfg = derive_config(_base_cfg())
    inject_student_dims(cfg, {"res4": 512, "res5": 1024})
    assert cfg.loss.losses[0].kwargs.student_dims == 512
    assert cfg.loss.losses[1].kwargs.student_dims == 1024


def test_dotted_overrides_types():
    cfg = _base_cfg()
    apply_overrides(cfg, [
        "optimizer.type=AdamW",
        "optimizer.kwargs.lr=1e-3",          # dot-less sci notation -> float
        "optimizer.kwargs.betas=[0.9, 0.95]",
        "train.max_epochs=50",
        "student.checkpoint_path=null",
        "loss.losses.0.weight=2.0",
    ])
    assert cfg.optimizer.type == "AdamW"
    assert cfg.optimizer.kwargs.lr == pytest.approx(1e-3)
    assert isinstance(cfg.optimizer.kwargs.lr, float)
    assert cfg.optimizer.kwargs.betas == [0.9, 0.95]
    assert cfg.train.max_epochs == 50
    assert cfg.student.checkpoint_path is None
    assert cfg.loss.losses[0].weight == 2.0


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("optimizer:\n  kwargs:\n    lr: 1e-3\n    wd: 0.01\n")
    cfg = load_config(str(p), overrides=["optimizer.kwargs.lr=5e-4"])
    assert cfg.optimizer.kwargs.lr == pytest.approx(5e-4)
    assert cfg.optimizer.kwargs.wd == pytest.approx(0.01)
    container = cfg.to_container()
    assert isinstance(container, dict) and not isinstance(container, ConfigNode)


def test_bad_override_raises():
    with pytest.raises(ValueError):
        apply_overrides(_base_cfg(), ["no_equals_sign"])


def test_cli_dashed_override_syntax():
    """The reference README documents ``--train.max_epochs 100``-style
    overrides (readme.md:275, never implemented there); both that form and
    the plain ``k.path=v`` form must parse (train.py:_fold_dashed_overrides)."""
    from train import parse_args

    a = parse_args(["--config", "c.yaml", "--train.max_epochs", "100",
                    "optimizer.kwargs.lr=5e-4", "--wandb.project=x"])
    assert a.config == "c.yaml"
    assert a.overrides == ["train.max_epochs=100",
                           "optimizer.kwargs.lr=5e-4", "wandb.project=x"]
