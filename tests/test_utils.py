"""
Utils tests (mirrors reference tests/test_utils.py coverage: CPU-limit env
fallbacks, folder creation, JSON reading) plus the tracing additions.
"""

import json
import logging
import os
from unittest import mock

import pytest

from aind_smartspim_destripe_tpu.runtime.tracing import StageTimer, annotate
from aind_smartspim_destripe_tpu.utils import utils


def test_cpu_limit_env_co_cpus():
    with mock.patch.dict(os.environ, {"CO_CPUS": "14"}):
        assert utils.get_code_ocean_cpu_limit() == "14"


def test_cpu_limit_aws_batch():
    env = {k: v for k, v in os.environ.items() if k != "CO_CPUS"}
    env["AWS_BATCH_JOB_ID"] = "job-1"
    with mock.patch.dict(os.environ, env, clear=True):
        assert utils.get_code_ocean_cpu_limit() == 1


def test_cpu_limit_fallback_positive():
    env = {k: v for k, v in os.environ.items()
           if k not in ("CO_CPUS", "AWS_BATCH_JOB_ID")}
    with mock.patch.dict(os.environ, env, clear=True):
        assert int(utils.get_code_ocean_cpu_limit()) >= 1


def test_get_size_units():
    assert utils.get_size(1253656) == "1.20MB"
    assert utils.get_size(1253656678) == "1.17GB"
    assert utils.get_size(10) == "10.00B"


def test_create_folder_and_json(tmp_path):
    target = tmp_path / "a" / "b"
    utils.create_folder(str(target))
    assert target.is_dir()
    utils.create_folder(str(target))  # idempotent

    p = tmp_path / "x.json"
    p.write_text(json.dumps({"k": 1}))
    assert utils.read_json_as_dict(str(p)) == {"k": 1}
    assert utils.read_json_as_dict(str(tmp_path / "missing.json")) == {}
    # broken encoding tolerated
    with open(tmp_path / "bad.json", "wb") as f:
        f.write(b'{"k": "v\xff"}')
    assert utils.read_json_as_dict(str(tmp_path / "bad.json")) == {"k": "v"}


def test_read_image_directory_structure(tmp_path):
    for col in ("100", "200"):
        for row in ("100_400", "100_500") if col == "100" else ("200_400", "200_500"):
            pass
    ch = tmp_path / "Ex_488_Em_525"
    for col in ("471320", "489620"):
        for row in ("461360", "470000"):
            d = ch / col / f"{col}_{row}"
            d.mkdir(parents=True)
            (d / "0.tiff").write_bytes(b"x")
    struct = utils.read_image_directory_structure(str(tmp_path), "Ex_.*")
    key = list(struct.keys())[0]
    assert key.name == "Ex_488_Em_525"
    assert set(struct[key].keys()) == {"471320", "489620"}
    with pytest.raises(ValueError):
        utils.read_image_directory_structure(str(tmp_path), "Nope_.*")


def test_resource_profiler_and_graphs(tmp_path):
    prof = utils.ResourceProfiler(interval=0).start()
    import time

    time.sleep(0.15)
    prof.stop()
    assert len(prof.time_points) >= 1
    prof.save_graphs(str(tmp_path), "test")
    assert (tmp_path / "test_compute_resources.png").exists()
    # empty profile -> no crash, no file
    utils.generate_resources_graphs([], [], [], str(tmp_path), "empty")
    assert not (tmp_path / "empty_compute_resources.png").exists()


def test_create_logger_writes_file(tmp_path):
    logger = utils.create_logger(str(tmp_path))
    logger.info("hello destripe")
    logging.shutdown()
    logs = list(tmp_path.glob("destripe_log_*.log"))
    assert logs and "hello destripe" in logs[0].read_text()


def test_stage_timer():
    t = StageTimer()
    with t.stage("read", pixels=10_000_000):
        pass
    with t.stage("read", pixels=10_000_000):
        pass
    s = t.summary()
    assert s["read"]["seconds"] >= 0
    with annotate("region"):
        pass
