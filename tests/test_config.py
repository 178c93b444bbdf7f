"""R23 config load/validate parity (mirrors internal/config/load_test.go style)."""

from __future__ import annotations

import pytest

from better_cdc_spark.config import ConfigError, EngineConfig, load, with_overrides


def test_defaults_load_and_validate():
    cfg = load(env={})
    assert cfg.database == "testdb"
    assert cfg.batch_size == 500
    assert cfg.checkpoint_interval_s == 1.0
    assert cfg.duplicate_window_s == 120.0
    assert cfg.failure_policy == "dlq"
    assert cfg.table_filter == ()


def test_env_overrides():
    cfg = load(
        env={
            "DATABASE_NAME": "prod",
            "TABLE_FILTER": "public.users, public.orders",
            "BATCH_SIZE": "1000",
            "FAILURE_POLICY": "skip",
        }
    )
    assert cfg.database == "prod"
    assert cfg.table_filter == ("public.users", "public.orders")
    assert cfg.batch_size == 1000
    assert cfg.failure_policy == "skip"


@pytest.mark.parametrize(
    "env,frag",
    [
        ({"FAILURE_POLICY": "explode"}, "failure_policy"),
        ({"BATCH_SIZE": "0"}, "batch_size"),
        ({"BATCH_SIZE": "abc"}, "malformed"),
        ({"DUPLICATE_WINDOW": "-1"}, "duplicate_window_s"),
        ({"TABLE_FILTER": "nodotschema"}, "schema.table"),
        ({"DATABASE_NAME": "bad.name"}, "database"),
        ({"SUBJECT_PREFIX": "cdc", "DLQ_SUBJECT_PREFIX": "cdc"}, "differ"),
        ({"DLQ_SUBJECT_PREFIX": "has space"}, "dlq_subject_prefix"),
    ],
)
def test_invalid_configs_rejected(env, frag):
    with pytest.raises(ConfigError, match=frag):
        load(env=env)


def test_with_overrides_revalidates():
    cfg = EngineConfig().validate()
    assert with_overrides(cfg, batch_size=10).batch_size == 10
    with pytest.raises(ConfigError):
        with_overrides(cfg, failure_policy="nope")


def test_pipeline_accepts_engine_config(spark, tmp_path):
    from better_cdc_spark.streaming.pipeline import CDCStreamPipeline

    cfg = load(
        env={
            "DATABASE_NAME": "proddb",
            "TABLE_FILTER": "public.users",
            "MAX_FILES_PER_TRIGGER": "3",
        }
    )
    pipe = CDCStreamPipeline(
        spark, str(tmp_path / "src"), str(tmp_path / "work"), config=cfg
    )
    assert pipe.database == "proddb"
    assert pipe.allowlist == ["public.users"]
    assert pipe.max_files == 3
