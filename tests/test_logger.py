"""KV logger: formats, mean accumulation, profile scopes."""

import json
import time

import numpy as np
import pytest

from condmdi_tpu.utils import logger


class TestLogger:
    def test_logkv_dumpkvs(self, tmp_path):
        logger.configure(str(tmp_path), format_strs=["log", "json", "csv"])
        logger.logkv("loss", 1.5)
        logger.logkv("step", 3)
        out = logger.dumpkvs()
        assert out == {"loss": 1.5, "step": 3}
        # json line written
        lines = open(tmp_path / "progress.json").read().strip().splitlines()
        assert json.loads(lines[-1])["loss"] == 1.5
        # csv header
        assert "loss" in open(tmp_path / "progress.csv").readline()

    def test_logkv_mean(self, tmp_path):
        logger.configure(str(tmp_path), format_strs=[])
        logger.logkv_mean("x", 1.0)
        logger.logkv_mean("x", 3.0)
        out = logger.dumpkvs()
        assert out["x"] == 2.0

    def test_csv_new_columns(self, tmp_path):
        logger.configure(str(tmp_path), format_strs=["csv"])
        logger.logkv("a", 1)
        logger.dumpkvs()
        logger.logkv("a", 2)
        logger.logkv("b", 5)
        logger.dumpkvs()
        header = open(tmp_path / "progress.csv").readline().strip().split(",")
        assert set(header) == {"a", "b"}

    def test_profile_scope(self, tmp_path):
        logger.configure(str(tmp_path), format_strs=[])

        with logger.profile_kv("myscope"):
            time.sleep(0.01)
        out = logger.dumpkvs()
        assert out["wait_myscope"] >= 0.01

        @logger.profile("fn")
        def slow():
            time.sleep(0.01)
            return 7

        assert slow() == 7
        assert logger.dumpkvs()["wait_fn"] >= 0.01

    @pytest.mark.slow  # drags in the tensorboard writer stack (~18 s)
    def test_tensorboard_format(self, tmp_path):
        pytest_ = __import__("pytest")
        pytest_.importorskip("tensorboardX")
        logger.configure(str(tmp_path), format_strs=["tensorboard"])
        logger.logkv("loss", 0.5)
        logger.logkv("step", 1)
        logger.dumpkvs()
        import glob
        assert glob.glob(str(tmp_path / "tb" / "events.*"))
