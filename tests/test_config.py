"""EngineConfig resolution (A20/A21): option > env > default, typed parsing,
reference bugs fixed."""

from __future__ import annotations

import pytest

from logspout_kinesis_tests_spark.config import EngineConfig, getopt


def test_defaults_match_reference():
    cfg = EngineConfig.from_route()
    # logspoutkinesis.go defaults: buffer 10000 (:123), flush 1s (:131),
    # batch 10 (:139), attempts 10 (:147), stat 1s (:155)
    assert cfg.stream_name == "logbuffer-dev"
    assert cfg.buffer_size == 10_000
    assert cfg.flush_interval_s == 1.0
    assert cfg.batch_size == 10
    assert cfg.max_attempts_per_record == 10
    assert cfg.stat_interval_s == 1.0
    assert cfg.docker_host == "unknown-docker-host"  # go:81 default
    assert cfg.use_v0_layout is False


def test_options_override_defaults():
    cfg = EngineConfig.from_route(
        "my-stream",
        {
            "buffer_size": "500",  # works here; dead code in the reference (go:126)
            "flush_interval": "5",
            "batch_size": "100",
            "max_attempts_per_record": "3",
            "stat_interval": "2",  # intended key; reference reads "start_interval" (go:156)
            "use_v0_layout": "true",
        },
    )
    assert cfg.stream_name == "my-stream"
    assert cfg.buffer_size == 500
    assert cfg.flush_interval_s == 5.0
    assert cfg.batch_size == 100
    assert cfg.max_attempts_per_record == 3
    assert cfg.stat_interval_s == 2.0
    assert cfg.use_v0_layout is True


def test_env_fallback_and_option_precedence(monkeypatch):
    monkeypatch.setenv("LK_DOCKER_HOST", "env-host")
    monkeypatch.setenv("LK_USE_V0_LAYOUT", "1")
    cfg = EngineConfig.from_route()
    assert cfg.docker_host == "env-host"
    assert cfg.use_v0_layout is True
    # explicit option beats env (route.Options checked first, go:84-87)
    cfg2 = EngineConfig.from_route(options={"use_v0_layout": "false"})
    assert cfg2.use_v0_layout is False


def test_malformed_values_fall_back_to_defaults():
    cfg = EngineConfig.from_route(options={"batch_size": "not-a-number", "flush_interval": ""})
    assert cfg.batch_size == 10
    assert cfg.flush_interval_s == 1.0


def test_getopt(monkeypatch):
    monkeypatch.delenv("SOME_UNSET_VAR", raising=False)
    assert getopt("SOME_UNSET_VAR", "fallback") == "fallback"
    monkeypatch.setenv("SOME_UNSET_VAR", "")
    assert getopt("SOME_UNSET_VAR", "fallback") == "fallback"  # empty = unset (go:176)
    monkeypatch.setenv("SOME_UNSET_VAR", "x")
    assert getopt("SOME_UNSET_VAR", "fallback") == "x"
