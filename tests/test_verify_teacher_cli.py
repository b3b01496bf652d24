"""End-to-end drive of the verify_teacher CLI (VERDICT r4 weak #5).

``scripts/verify_teacher.py`` is the one off-container evidence tool (real
DINOv2 weights can only be verified where egress exists), so its argument
parsing, both checkpoint-deserialization branches (.pth torch / .pkl
detectron2), and the exit-code gates must be proven here with synthetic
weights written to real files — it cannot be allowed to fail on first real
use.
"""

import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from test_teacher_manifest import hub_manifest  # noqa: E402
import verify_teacher  # noqa: E402

pytestmark = pytest.mark.slow  # 12-block torch oracle + jit compiles


def _synthetic_state(model_name="dinov2_vits14", seed=0):
    rng = np.random.default_rng(seed)
    state = {}
    for k, shp in hub_manifest(model_name).items():
        if k.endswith("gamma"):
            v = np.full(shp, 1e-5, np.float32)  # LayerScale init scale
        elif k.endswith("norm1.weight") or k.endswith("norm2.weight") \
                or k == "norm.weight":
            v = np.ones(shp, np.float32)
        else:
            v = (0.02 * rng.standard_normal(shp)).astype(np.float32)
        state[k] = v
    return state


def test_cli_pth_roundtrip_passes(tmp_path):
    import torch

    state = _synthetic_state()
    path = str(tmp_path / "dinov2_vits14_pretrain.pth")
    torch.save({k: torch.from_numpy(v) for k, v in state.items()}, path)
    rc = verify_teacher.main([path, "--px", "28", "--batch", "1"])
    assert rc == 0


def test_cli_pkl_branch_and_failure_gate(tmp_path):
    state = _synthetic_state(seed=1)
    path = str(tmp_path / "teacher.pkl")
    with open(path, "wb") as f:
        pickle.dump({"model": state}, f)
    # same weights through the .pkl branch -> pass
    assert verify_teacher.main([path, "--px", "28", "--batch", "1"]) == 0
    # an impossible cosine floor must flip the exit code (the gate is live)
    assert verify_teacher.main(
        [path, "--px", "28", "--batch", "1", "--cosine-min", "1.1"]) == 1
