"""Ordered ack-gated publish engine vs a scriptable fake transport.

Mirrors the reference's mock-publisher scenarios
(/root/reference/internal/engine/engine_test.go:209-560 and
/root/reference/internal/publisher/waitforacks_test.go:30-179): ordered
single-item batches, retry-then-succeed, exhausted retries never publish
the tail, unordered mode retries only failures, permanent errors stop
burning retries, dlq/skip/crash policies, partial failure does not
checkpoint, and partial-ack timeout accounting. Pure driver-side logic —
no Spark session needed, so this file is cheap and deterministic.
"""

from __future__ import annotations

import pytest

from better_cdc_spark.streaming.publish_retry import (
    ApiError,
    BadSubjectError,
    BatchResult,
    MaxPayloadError,
    OrderedPublishEngine,
    PendingAck,
    PublishError,
    PublishItem,
    calculate_backoff,
    is_permanent_publish_error,
    publish_and_checkpoint,
)


class FakeClock:
    def __init__(self) -> None:
        self.now = 0.0

    def __call__(self) -> float:
        return self.now

    def sleep(self, s: float) -> None:
        self.now += s


class ScriptedTransport:
    """mockBatchPublisher analog: per-call scripted failures.

    failures_per_attempt[k] = indices (within that call's batch) that
    fail on the k-th publish_batch_async call. publish_errors[k] raises
    at the call level instead. slow_ack_after[k] = seconds until acks
    resolve (None = immediately). item_errors maps event_id -> exception
    to attach (e.g. MaxPayloadError for a poison message).
    """

    def __init__(self, clock: FakeClock) -> None:
        self.clock = clock
        self.calls = 0
        self.batches: list[list[str]] = []
        self.failures_per_attempt: list[list[int]] = []
        self.publish_errors: list[Exception | None] = []
        self.slow_ack_after: list[float | None] = []
        self.item_errors: dict[str, Exception] = {}

    def publish_batch_async(self, items) -> list[PendingAck]:
        k = self.calls
        self.calls += 1
        self.batches.append([i.event_id for i in items])
        if k < len(self.publish_errors) and self.publish_errors[k] is not None:
            raise self.publish_errors[k]
        failing = set(
            self.failures_per_attempt[k] if k < len(self.failures_per_attempt) else []
        )
        delay = self.slow_ack_after[k] if k < len(self.slow_ack_after) else None
        pending = []
        for j, item in enumerate(items):
            err = self.item_errors.get(item.event_id)
            fail = j in failing or err is not None
            p = PendingAck(
                subject=item.subject,
                event_id=item.event_id,
                acked=not fail,
                err=err if err is not None else (PublishError("nack") if fail else None),
            )
            if delay is None:
                p.resolved = True
            else:
                p.resolve_at = self.clock.now + delay
            pending.append(p)
        return pending


def make_engine(clock: FakeClock, **kw) -> OrderedPublishEngine:
    kw.setdefault("publish_timeout_s", 5.0)
    return OrderedPublishEngine(sleep=clock.sleep, clock=clock, **kw)


def make_items(n: int) -> list[PublishItem]:
    return [
        PublishItem(subject=f"test.{i}", event_id=str(i), position=f"0/{i}")
        for i in range(n)
    ]


# -- classification / backoff -------------------------------------------------


def test_permanent_error_allowlist_is_conservative():
    assert is_permanent_publish_error(MaxPayloadError("too big"))
    assert is_permanent_publish_error(BadSubjectError("bad"))
    assert is_permanent_publish_error(ApiError(ApiError.MESSAGE_SIZE_EXCEEDS_MAXIMUM))
    # anything unrecognized is transient — infrastructure failures crash,
    # they don't skip data (errors.go:16-18)
    assert not is_permanent_publish_error(ApiError(10058))
    assert not is_permanent_publish_error(TimeoutError("timeout"))
    assert not is_permanent_publish_error(ConnectionError("refused"))
    assert not is_permanent_publish_error(None)


def test_backoff_doubles_to_cap():
    # engine_test.go TestCalculateBackoff: 1s, 2s, 4s, 8s, 8s...
    assert [calculate_backoff(a) for a in (1, 2, 3, 4, 5, 10)] == [
        1.0, 2.0, 4.0, 8.0, 8.0, 8.0,
    ]


# -- ordered publish ----------------------------------------------------------


def test_all_succeed_first_attempt_publishes_ordered_single_item_batches():
    clock = FakeClock()
    t = ScriptedTransport(clock)
    e = make_engine(clock, max_publish_retries=3)
    result = e.publish_with_retry(t, make_items(3))
    assert result.is_complete() and result.succeeded == 3 and result.failed == 0
    assert t.batches == [["0"], ["1"], ["2"]]
    assert result.last_success_position == "0/2"


def test_partial_failure_recovery_retries_before_advancing():
    # item 1 fails once; item 2 is published only after item 1's retry acks
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.failures_per_attempt = [[], [0], [], []]
    e = make_engine(clock, max_publish_retries=1)
    result = e.publish_with_retry(t, make_items(3))
    assert result.is_complete() and result.succeeded == 3
    assert t.batches == [["0"], ["1"], ["1"], ["2"]]
    assert e.retry_count == 1
    assert clock.now >= 1.0  # one backoff slept


def test_exhausted_retries_never_publish_the_tail():
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.failures_per_attempt = [[], [0], [0]]
    e = make_engine(clock, max_publish_retries=1)
    result = e.publish_with_retry(t, make_items(3))
    assert result.first_error is not None
    assert result.succeeded == 1 and result.failed == 2
    # ordering invariant: item 2 must never hit the wire after item 1 fails
    assert t.batches == [["0"], ["1"], ["1"]]
    # checkpointable position is the contiguous prefix only
    assert result.last_success_position == "0/0"


def test_publish_call_level_errors_are_retried():
    # PublishBatchAsync itself errors twice (connection refused, timeout),
    # then succeeds — TestPublishWithRetry_PublishBatchError parity
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.publish_errors = [ConnectionError("refused"), TimeoutError("timeout"), None]
    e = make_engine(clock, max_publish_retries=3)
    result = e.publish_with_retry(t, make_items(1))
    assert result.is_complete()
    assert t.calls == 3


def test_unordered_unsafe_mode_retries_only_failed_items():
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.failures_per_attempt = [[1], []]
    e = make_engine(clock, max_publish_retries=1, unsafe_unordered=True)
    result = e.publish_with_retry(t, make_items(3))
    assert result.is_complete() and result.succeeded == 3
    assert t.batches == [["0", "1", "2"], ["1"]]


# -- permanent errors + failure policies --------------------------------------


def test_permanent_error_stops_retries_and_crash_policy_fails_fast():
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.item_errors["1"] = MaxPayloadError("exceeds max payload")
    e = make_engine(clock, max_publish_retries=5)
    result = e.publish_with_retry(t, make_items(3))
    # one attempt for item 1, not six — poison messages don't burn retries
    assert t.batches == [["0"], ["1"]]
    assert e.retry_count == 0
    assert isinstance(result.first_error, MaxPayloadError)
    assert result.succeeded == 1 and result.failed == 2


def test_dlq_policy_quarantines_poison_and_continues():
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.item_errors["1"] = ApiError(ApiError.MESSAGE_SIZE_EXCEEDS_MAXIMUM)
    quarantined = []
    e = make_engine(
        clock,
        max_publish_retries=2,
        failure_policy="dlq",
        quarantine_cb=lambda item, err: quarantined.append((item.event_id, err)),
    )
    result = e.publish_with_retry(t, make_items(3))
    assert result.is_complete()  # quarantine resolves the item
    assert [q[0] for q in quarantined] == ["1"]
    assert isinstance(quarantined[0][1], ApiError)
    # the tail still publishes, in order
    assert t.batches == [["0"], ["1"], ["2"]]


def test_dlq_policy_does_not_quarantine_transient_failures():
    # transient exhaustion under dlq policy still crashes the batch:
    # the allowlist is the only path to the DLQ (errors.go:16-18)
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.failures_per_attempt = [[0], [0], [0]]
    e = make_engine(clock, max_publish_retries=2, failure_policy="dlq")
    result = e.publish_with_retry(t, make_items(1))
    assert not result.is_complete()
    assert result.quarantined == []


def test_skip_policy_counts_and_continues():
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.item_errors["1"] = MaxPayloadError("too big")
    e = make_engine(clock, max_publish_retries=0, failure_policy="skip")
    result = e.publish_with_retry(t, make_items(3))
    assert result.succeeded == 2 and result.failed == 1
    assert [i.event_id for i in result.skipped] == ["1"]
    assert result.is_resolved() and not result.is_complete()
    assert t.batches == [["0"], ["1"], ["2"]]


def test_skip_policy_does_not_cover_transient_exhaustion():
    # quarantinesPoison covers dlq AND skip, but only for PERMANENT
    # classifications — a transiently failing broker still crashes the
    # batch under skip (engine.go:228-232 + errors.go:16-18)
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.failures_per_attempt = [[0], [0]]
    e = make_engine(clock, max_publish_retries=1, failure_policy="skip")
    result = e.publish_with_retry(t, make_items(1))
    assert not result.is_resolved()
    assert result.skipped == []


def test_unknown_policy_rejected():
    with pytest.raises(ValueError):
        OrderedPublishEngine(failure_policy="yolo")


# -- ack waiting --------------------------------------------------------------


def test_wait_for_acks_partial_ack_then_timeout_counts_resolved():
    # waitforacks_test.go:60-105: 2 of 3 resolve, the third never does;
    # the error must reflect 2 resolved, and the item is retryable
    clock = FakeClock()
    e = make_engine(clock, max_publish_retries=0)
    pending = [
        PendingAck("s", "0", acked=True, resolved=True),
        PendingAck("s", "1", acked=True, resolved=True),
        PendingAck("s", "2"),  # never resolves
    ]
    ok, resolved, err = e.wait_for_acks(pending, timeout_s=0.05)
    assert ok == 2 and resolved == 2
    assert isinstance(err, TimeoutError) and "2/3" in str(err)


def test_slow_ack_within_timeout_succeeds():
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.slow_ack_after = [2.0]
    e = make_engine(clock, max_publish_retries=0, publish_timeout_s=5.0)
    result = e.publish_with_retry(t, make_items(1))
    assert result.is_complete()
    assert clock.now == pytest.approx(2.0)


def test_slow_ack_past_timeout_is_retried_then_succeeds():
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.slow_ack_after = [10.0, None]  # first ack lands after the 5s timeout
    e = make_engine(clock, max_publish_retries=1, publish_timeout_s=5.0)
    result = e.publish_with_retry(t, make_items(1))
    assert result.is_complete()
    assert t.calls == 2
    assert e.retry_count == 1


# -- checkpoint gating --------------------------------------------------------


def test_partial_failure_does_not_checkpoint():
    # TestFlushWithBatchPublish_PartialFailureDoesNotCheckpoint parity:
    # the commit position is a tx boundary; a hole anywhere blocks the ack
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.failures_per_attempt = [[], [0]]
    e = make_engine(clock, max_publish_retries=0)
    acked = []
    result = publish_and_checkpoint(
        e, t, make_items(2), commit_position="0/30", checkpoint_cb=acked.append
    )
    assert not result.is_complete()
    assert acked == []  # no checkpoint, even though item 0 published
    assert result.last_success_position == "0/0"  # diagnostics only


def test_full_success_checkpoints_commit_position():
    clock = FakeClock()
    t = ScriptedTransport(clock)
    e = make_engine(clock, max_publish_retries=0)
    acked = []
    result = publish_and_checkpoint(
        e, t, make_items(2), commit_position="0/30", checkpoint_cb=acked.append
    )
    assert result.is_complete()
    assert acked == ["0/30"]


def test_skip_policy_resolves_batch_and_checkpoints():
    # an operator choosing 'skip' accepts the loss; the batch must
    # advance or it would re-deliver the poison message forever
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.item_errors["0"] = BadSubjectError("bad subject")
    e = make_engine(clock, max_publish_retries=0, failure_policy="skip")
    acked = []
    result = publish_and_checkpoint(
        e, t, make_items(2), commit_position="0/30", checkpoint_cb=acked.append
    )
    assert result.is_resolved()
    assert acked == ["0/30"]


def test_build_final_result_contiguous_prefix():
    # buildFinalResult parity (engine_test.go:450-495): succeeded pattern
    # [T, F, T, F] -> 2/2 counts, last contiguous position = item 0
    clock = FakeClock()
    e = make_engine(clock)
    items = make_items(4)
    result = e._finalize(
        BatchResult(total=4), items, [True, False, True, False], PublishError("x")
    )
    assert result.succeeded == 2 and result.failed == 2
    assert result.last_success_position == "0/0"


def test_unordered_timeout_failures_carry_first_error():
    # acks that never resolve and carry no err: the batch must still
    # report WHY it failed (the synthesized timeout), never
    # failed>0 with first_error=None
    clock = FakeClock()
    t = ScriptedTransport(clock)
    t.slow_ack_after = [1e9, 1e9]  # far past every timeout
    e = make_engine(clock, max_publish_retries=1, unsafe_unordered=True,
                    publish_timeout_s=0.5)
    result = e.publish_with_retry(t, make_items(2))
    assert result.failed == 2
    assert isinstance(result.first_error, TimeoutError)
