"""Comm helpers: single-process semantics (multi-host paths exercise the
same API; the CPU test env has one process)."""

from dinov2_distillation_tpu.parallel import comm


def test_single_process_semantics():
    assert comm.get_world_size() == 1
    assert comm.get_rank() == 0
    assert comm.is_main_process()
    assert comm.get_local_size() == 8  # virtual CPU mesh
    comm.synchronize()  # no-op, must not hang
    assert comm.all_gather({"a": 1}) == [{"a": 1}]
    assert comm.gather([1, 2], dst=0) == [[1, 2]]
    assert isinstance(comm.shared_random_seed(), int)
    out = comm.reduce_dict({"x": 2.0, "y": 3.0})
    assert out == {"x": 2.0, "y": 3.0}
