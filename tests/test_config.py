"""EngineConfig: defaults < YAML file < FSR_* env precedence
(mirrors pkg/config/config.go:71-96 LoadConfig)."""

import pytest

from featherstore_ray.config import EngineConfig


def test_load_file_then_env_precedence(tmp_path, monkeypatch):
    cfg_file = tmp_path / "featherstore.yaml"
    cfg_file.write_text(
        "# engine config\n"
        "compression: lz4\n"
        "num_buckets: 32\n"
        "rolling_window_hours: 48\n"
    )
    monkeypatch.setenv("FSR_NUM_BUCKETS", "16")  # env beats file
    cfg = EngineConfig.load(str(cfg_file))
    assert cfg.compression == "lz4"          # file beats default
    assert cfg.num_buckets == 16             # env beats file
    assert cfg.rolling_window_hours == 48
    assert cfg.row_group_size == 131_072     # untouched default


def test_load_path_from_env_and_unknown_key(tmp_path, monkeypatch):
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text("compression: snappy\n")
    monkeypatch.setenv("FSR_CONFIG", str(cfg_file))
    assert EngineConfig.load().compression == "snappy"

    bad = tmp_path / "bad.yaml"
    bad.write_text("no_such_knob: 1\n")
    with pytest.raises(ValueError, match="unknown config key"):
        EngineConfig.load(str(bad))


def test_load_without_file_matches_from_env(monkeypatch):
    monkeypatch.setenv("FSR_MAX_POOL_SIZE", "4")
    assert EngineConfig.load() == EngineConfig.from_env()
