"""Structured logger parity (reference pkg/logger/logger.go)."""

import json
import logging

import pytest

from featherstore_ray import logger as fsr_logger


@pytest.fixture(autouse=True)
def _reset_logger():
    yield
    fsr_logger._global = None
    logging.getLogger("featherstore_ray").handlers.clear()


def test_json_format_to_file(tmp_path):
    path = tmp_path / "engine.log"
    lg = fsr_logger.initialize(level="debug", format="json",
                               output=str(path))
    lg.info("plain message")
    fsr_logger.log("warning", "ingest slow", feature_set="fs1", rows=42)
    for h in lg.handlers:
        h.flush()
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert lines[0]["msg"] == "plain message"
    assert lines[0]["level"] == "info" and "timestamp" in lines[0]
    assert lines[1]["feature_set"] == "fs1" and lines[1]["rows"] == 42
    assert lines[1]["level"] == "warning"
    assert ":" in lines[1]["caller"]


def test_level_filtering_and_console(tmp_path, capsys):
    lg = fsr_logger.initialize(level="warning", format="console",
                               output="stderr")
    lg.info("dropped")
    lg.error("kept")
    err = capsys.readouterr().err
    assert "dropped" not in err and "kept" in err


def test_env_configuration(tmp_path, monkeypatch):
    path = tmp_path / "env.log"
    monkeypatch.setenv("FSR_LOG_LEVEL", "error")
    monkeypatch.setenv("FSR_LOG_FORMAT", "json")
    monkeypatch.setenv("FSR_LOG_OUTPUT", str(path))
    fsr_logger._global = None
    lg = fsr_logger.get_logger()
    lg.warning("dropped")
    lg.error("kept")
    for h in lg.handlers:
        h.flush()
    lines = path.read_text().splitlines()
    assert len(lines) == 1 and json.loads(lines[0])["msg"] == "kept"


def test_invalid_config_rejected():
    with pytest.raises(ValueError):
        fsr_logger.initialize(level="nope")
    with pytest.raises(ValueError):
        fsr_logger.initialize(format="xml")
