"""Logger helpers, metric logger, throughput meter, profiling StepTimer."""

import json
import logging
import time

from dinov2_distillation_tpu.utils.logger import (
    get_logger,
    log_every_n,
    log_first_n,
    log_every_n_seconds,
)
from dinov2_distillation_tpu.utils.metrics import MetricLogger, ThroughputMeter
from dinov2_distillation_tpu.utils.profiling import StepTimer


def test_get_logger_singleton():
    a = get_logger()
    b = get_logger()
    assert a is b
    assert a.name == "dinov2_distillation_tpu"


def test_log_first_n(caplog):
    logger = get_logger()
    logger.propagate = True
    try:
        with caplog.at_level(logging.INFO, logger=logger.name):
            for _ in range(5):
                log_first_n(logging.INFO, "only-twice", n=2)
        assert sum("only-twice" in r.message for r in caplog.records) == 2
    finally:
        logger.propagate = False


def test_log_every_n(caplog):
    logger = get_logger()
    logger.propagate = True
    try:
        with caplog.at_level(logging.INFO, logger=logger.name):
            for _ in range(7):
                log_every_n(logging.INFO, "every-3", n=3)
        assert sum("every-3" in r.message for r in caplog.records) == 3  # 1,4,7
    finally:
        logger.propagate = False


def test_log_every_n_seconds(caplog):
    logger = get_logger()
    logger.propagate = True
    try:
        with caplog.at_level(logging.INFO, logger=logger.name):
            for _ in range(10):
                log_every_n_seconds(logging.INFO, "rate-limited", n=60)
        assert sum("rate-limited" in r.message for r in caplog.records) == 1
    finally:
        logger.propagate = False


def test_metric_logger_jsonl(tmp_path):
    m = MetricLogger(str(tmp_path), use_tensorboard=False)
    m.log_scalars(1, {"loss": 1.5})
    m.log_scalars(2, {"loss": 1.25, "lr": 1e-3})
    m.close()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 1.5
    assert lines[1]["lr"] == 1e-3


def test_metric_logger_non_main_writes_nothing(tmp_path):
    m = MetricLogger(str(tmp_path / "sub"), is_main_process=False)
    m.log_scalars(1, {"loss": 1.0})
    m.close()
    assert not (tmp_path / "sub").exists()


def test_throughput_meter():
    meter = ThroughputMeter(warmup_steps=1)
    for _ in range(4):
        meter.tick(10)
        time.sleep(0.01)
    assert meter.steps_measured == 3
    assert 100 < meter.images_per_sec < 4000


def test_step_timer():
    t = StepTimer()
    t.phase("data")
    time.sleep(0.01)
    t.phase("step")
    time.sleep(0.02)
    t.stop()
    s = t.summary()
    assert set(s) == {"data", "step", "total"}
    assert s["step"] > s["data"] > 0


def test_swin_rel_pos_table_interpolation_on_load():
    """A rel-pos bias table saved at a different window size must be
    bicubic-resized onto the model's grid at load time (reference
    swin_wrapper.py:81-86), matching torch F.interpolate semantics."""
    import numpy as np
    import pytest

    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from dinov2_distillation_tpu.utils.torch_import import (
        _resize_rel_pos_table, apply_mapped_weights)

    rng = np.random.default_rng(3)
    heads = 3
    src = rng.standard_normal((23 * 23, heads)).astype(np.float32)  # w'=12
    got = _resize_rel_pos_table(src, 13 * 13)                       # w=7
    want = F.interpolate(
        torch.from_numpy(src).reshape(23, 23, heads).permute(2, 0, 1)[None],
        size=(13, 13), mode="bicubic", align_corners=False,
    )[0].permute(1, 2, 0).reshape(13 * 13, heads).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    # and the overlay path resizes instead of rejecting the mismatch
    import jax.numpy as jnp

    template = {"attn": {"relative_position_bias_table":
                         jnp.zeros((13 * 13, heads), jnp.float32)}}
    out = apply_mapped_weights(
        template, {("attn", "relative_position_bias_table"): src},
        what="swin rel-pos test")
    np.testing.assert_allclose(
        np.asarray(out["attn"]["relative_position_bias_table"]), want,
        atol=2e-5, rtol=1e-4)


def test_reconfigure_logger_applies_rank(tmp_path):
    """After jax.distributed.initialize the import-time singleton must be
    re-rankable: rank>0 logs to stderr at ERROR and gets a .rankN file
    (reference utils/logger.py:420-422, :456-481); rank 0 restores the
    stdout INFO handler. The singleton identity is preserved for holders
    of earlier get_logger() references."""
    import sys

    from dinov2_distillation_tpu.utils.logger import reconfigure_logger

    held = get_logger()
    out = str(tmp_path / "log.txt")
    lg = reconfigure_logger(rank=2, output=out)
    try:
        assert lg is held  # same logging.Logger object, new handlers
        streams = [getattr(h, "stream", None) for h in lg.handlers]
        assert sys.stderr in streams
        levels = {h.level for h in lg.handlers
                  if getattr(h, "stream", None) is sys.stderr}
        assert levels == {logging.ERROR}
        lg.error("boom from rank 2")
        assert (tmp_path / "log.txt.rank2").exists()
        assert "boom from rank 2" in (tmp_path / "log.txt.rank2").read_text()
    finally:
        lg2 = reconfigure_logger(rank=0)
        assert any(getattr(h, "stream", None) is sys.stdout
                   for h in lg2.handlers)
