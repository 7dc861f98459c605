import numpy as np

from shasta_tpu.data.store import RunStore


def test_store_roundtrip(tmp_path):
    rs = RunStore(str(tmp_path / "run"))
    a = {"x": np.arange(10, dtype=np.int64), "y": np.ones((3, 2), np.float32)}
    rs.save_stage("Reads", a)
    assert rs.has_stage("Reads")
    rs.save_info("k", 10)

    rs2 = RunStore(str(tmp_path / "run"), create=False)
    b = rs2.load_stage("Reads")
    assert np.array_equal(a["x"], b["x"])
    assert np.array_equal(a["y"], b["y"])
    assert rs2.get_info("k") == 10
    assert rs2.stage_names() == ["Reads"]

    rs2.remove_stage("Reads")
    assert not rs2.has_stage("Reads")
