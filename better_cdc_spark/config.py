"""Engine configuration: load from env with defaults, cross-field validation.

R23 parity (internal/config/load.go:13-190, config.go:106-234): the
reference loads ~30 env vars, applies defaults, and validates cross-field
invariants — failure policy membership, positive sizes/intervals, subject
token shape, and the NATS-wildcard check that the DLQ subject space is
disjoint from the data subject space. The Spark engine keeps the same
contract with the knobs that still exist here (several reference knobs —
buffer sizes, async in-flight caps, retry backoff — evaporate into Spark's
own scheduler/checkpoint machinery, SURVEY.md §4.2).

Env vars use the reference's names where the semantic survives
(DATABASE_NAME, TABLE_FILTER, BATCH_SIZE, CHECKPOINT_INTERVAL,
DUPLICATE_WINDOW, FAILURE_POLICY, DLQ_SUBJECT_PREFIX, SUBJECT_PREFIX).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field, replace

from better_cdc_spark.cdc.dlq import POLICIES

_TOKEN_RE = re.compile(r"^[A-Za-z0-9_-]+$")
_TABLE_RE = re.compile(r"^[A-Za-z0-9_-]+\.[A-Za-z0-9_-]+$")


class ConfigError(ValueError):
    """Invalid engine configuration (reference: Config.Validate errors)."""


@dataclass(frozen=True)
class EngineConfig:
    """Validated engine settings; construct via load() or directly."""

    database: str = "testdb"
    # schema.table allowlist; empty = all tables (R4; main.go:174-183)
    table_filter: tuple[str, ...] = field(default_factory=tuple)
    subject_prefix: str = "cdc"
    dlq_subject_prefix: str = "dlq"
    failure_policy: str = "dlq"  # crash | dlq | skip (config.go:154-164)
    batch_size: int = 500  # events per flush (config.go:82)
    checkpoint_interval_s: float = 1.0  # (config.go:87)
    duplicate_window_s: float = 120.0  # dedup window (config.go:100)
    max_files_per_trigger: int = 1  # micro-batch rate limit (R19 analog)
    # Transport stream subject filters (NATS wildcard grammar: '*' one
    # token, '>' tail). Empty = "{subject_prefix}.>" (config.go:192-197).
    stream_subjects: tuple[str, ...] = field(default_factory=tuple)
    # Health/metrics HTTP bind, "host:port" or ":port" for all interfaces
    # (HEALTH_ADDR; config.go:26,90 default ":8080" — the address
    # monitoring/prometheus/prometheus.yml scrapes)
    health_addr: str = ":8080"

    def health_host_port(self) -> tuple[str, int]:
        """Split health_addr for HealthServer(host=..., port=...); a bare
        ':port' binds all interfaces like Go's net.Listen."""
        host, _, port = self.health_addr.rpartition(":")
        return (host or "0.0.0.0", int(port))

    def validate(self) -> "EngineConfig":
        if not self.database or not _TOKEN_RE.match(self.database):
            raise ConfigError(f"database must be a bare token, got {self.database!r}")
        for t in self.table_filter:
            if not _TABLE_RE.match(t):
                raise ConfigError(f"table_filter entries must be schema.table, got {t!r}")
        if self.failure_policy not in POLICIES:
            raise ConfigError(
                f"failure_policy must be one of {POLICIES}, got {self.failure_policy!r}"
            )
        for name, v in (("batch_size", self.batch_size),
                        ("max_files_per_trigger", self.max_files_per_trigger)):
            if v < 1:
                raise ConfigError(f"{name} must be >= 1, got {v}")
        for name, v in (("checkpoint_interval_s", self.checkpoint_interval_s),
                        ("duplicate_window_s", self.duplicate_window_s)):
            if v < 0:
                raise ConfigError(f"{name} must be >= 0, got {v}")
        for name, v in (("subject_prefix", self.subject_prefix),
                        ("dlq_subject_prefix", self.dlq_subject_prefix)):
            if not _TOKEN_RE.match(v):
                raise ConfigError(f"{name} must be a bare subject token, got {v!r}")
        # The reference validates that DLQ subjects are covered by the stream
        # but do not collide with data subjects (config.go:188-234). With
        # subjects "{prefix}.{db}.{schema}.{table}", disjointness reduces to
        # distinct first tokens.
        # port 0 allowed: ephemeral bind, same as Go's net.Listen(":0")
        if not re.fullmatch(r"[\w.\-]*:\d{1,5}", self.health_addr) or not (
            0 <= int(self.health_addr.rpartition(":")[2]) < 65536
        ):
            raise ConfigError(
                f"health_addr must be host:port or :port, got {self.health_addr!r}"
            )
        if self.dlq_subject_prefix == self.subject_prefix:
            raise ConfigError(
                "dlq_subject_prefix must differ from subject_prefix "
                f"(both {self.subject_prefix!r}) — DLQ records would collide "
                "with data subjects"
            )
        # Wildcard subject covering (config.go:160-164, 188-234): under
        # policy=dlq, the DLQ pattern "{prefix}.{db}.*.*" must be covered
        # by the transport's stream subject filters, or quarantined
        # records would be published into the void.
        if self.failure_policy == "dlq" and not subject_filters_cover(
            self.effective_stream_subjects(),
            dlq_subject_pattern(self.dlq_subject_prefix, self.database),
        ):
            raise ConfigError(
                f"DLQ subject pattern "
                f"{dlq_subject_pattern(self.dlq_subject_prefix, self.database)!r} "
                f"is not covered by stream_subjects "
                f"{list(self.effective_stream_subjects())}"
            )
        return self

    def effective_stream_subjects(self) -> tuple[str, ...]:
        """Configured filters, or catch-alls under both roots
        (effectiveStreamSubjects, config.go:192-197 — the reference nests
        DLQ under the data prefix, "cdc.dlq.…", so one catch-all covers
        both; this engine keeps the prefixes disjoint, so the default
        covers each root explicitly)."""
        return self.stream_subjects or (
            f"{self.subject_prefix}.>",
            f"{self.dlq_subject_prefix}.>",
        )


def dlq_subject_pattern(prefix: str, database: str) -> str:
    """The wildcard pattern DLQ publishes match: "{prefix}.{db}.*.*"
    (schema and table vary per record) — dlqSubjectPattern, config.go:188."""
    return ".".join((_subject_token(prefix), _subject_token(database), "*", "*"))


def _subject_token(s: str) -> str:
    """Sanitize one literal subject token (subjectToken, config.go:199-205)."""
    s = s.strip()
    if not s:
        return "_"
    return s.replace(" ", "_").replace("*", "_").replace(">", "_")


def subject_filters_cover(filters: tuple[str, ...], pattern: str) -> bool:
    """True iff any filter covers every subject matching `pattern`.

    NATS wildcard grammar ('*' = exactly one token, '>' = one-or-more
    trailing tokens); port of subjectFilterTokensCover, config.go:206-234:
    a filter token covers a pattern '*' only if it is itself '*', and a
    pattern '>' only if it is '>' in tail position.
    """

    def covers(f: list[str], p: list[str]) -> bool:
        if not f:
            return not p
        if f[0] == ">":
            return len(f) == 1
        if not p:
            return False
        if p[0] == ">":
            return f[0] == ">" and len(f) == 1
        if p[0] == "*":
            if f[0] != "*":
                return False
        elif f[0] != "*" and f[0] != p[0]:
            return False
        return covers(f[1:], p[1:])

    return any(covers(f.split("."), pattern.split(".")) for f in filters)


def load(env: dict[str, str] | None = None) -> EngineConfig:
    """Build an EngineConfig from environment variables + defaults."""
    e = os.environ if env is None else env

    def get(name: str, default: str) -> str:
        return e.get(name, default)

    try:
        cfg = EngineConfig(
            database=get("DATABASE_NAME", "testdb"),
            table_filter=tuple(
                t.strip() for t in get("TABLE_FILTER", "").split(",") if t.strip()
            ),
            subject_prefix=get("SUBJECT_PREFIX", "cdc"),
            dlq_subject_prefix=get("DLQ_SUBJECT_PREFIX", "dlq"),
            failure_policy=get("FAILURE_POLICY", "dlq"),
            batch_size=int(get("BATCH_SIZE", "500")),
            checkpoint_interval_s=float(get("CHECKPOINT_INTERVAL", "1.0")),
            duplicate_window_s=float(get("DUPLICATE_WINDOW", "120.0")),
            max_files_per_trigger=int(get("MAX_FILES_PER_TRIGGER", "1")),
            stream_subjects=tuple(
                s.strip() for s in get("STREAM_SUBJECTS", "").split(",") if s.strip()
            ),
            health_addr=get("HEALTH_ADDR", ":8080"),
        )
    except ValueError as exc:  # int()/float() parse failures
        raise ConfigError(f"malformed numeric env var: {exc}") from exc
    return cfg.validate()


def with_overrides(cfg: EngineConfig, **kwargs) -> EngineConfig:
    """Functional update + revalidation."""
    return replace(cfg, **kwargs).validate()
