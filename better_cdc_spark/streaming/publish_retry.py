"""Ordered, ack-gated publish with retry/backoff and failure policies.

The reference engine commits a CDC batch to the broker one item at a
time, never advancing past an unacknowledged item (ordering is a
delivery-correctness property for CDC), retrying transient failures
with exponential backoff, classifying permanent ("poison") errors via a
conservative allowlist, and resolving exhausted failures through a
failure policy (crash / dlq-quarantine / skip). Checkpointing is gated
on the LAST CONTIGUOUS success so a partial failure can never ack WAL
positions past an unpublished event.

Reference parity (all behaviors mirrored, none transliterated):
- ordered publish + retry + permanent break:
  /root/reference/internal/engine/engine.go:447-534
- unordered unsafe mode (retry failed items only):
  /root/reference/internal/engine/engine.go:538-600 and the
  `unsafeUnorderedAsyncPublish` flag semantics
- exponential backoff 1s base doubling to an 8s cap:
  /root/reference/internal/engine/engine.go:697-704
- permanent-error allowlist (max payload, bad subject, API 10054):
  /root/reference/internal/publisher/errors.go:19-31
- contiguous-success checkpoint position:
  /root/reference/internal/engine/engine.go:676-694 (buildFinalResult)

This module is deliberately transport-agnostic: a `Transport` is any
object with ``publish_batch_async(items) -> list[PendingAck]``. The
production JetStreamShapedSink wraps its file/broker I/O in one; tests
drive the engine with a scriptable in-process fake (fail-nth, slow-ack,
max-payload) — the same strategy as the reference's mockBatchPublisher
(engine_test.go:120-199).

Spark context: this engine runs driver-side inside foreachBatch over
the COLLECTED envelope batch (bounded by the batch size dial, 500 in
the reference), exactly like the reference's per-event publish loop;
the heavy lifting (normalize, serialize, dedup) stays in executors.
"""

from __future__ import annotations

import time as _time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

BASE_RETRY_BACKOFF_S = 1.0
MAX_RETRY_BACKOFF_S = 8.0


# -- error taxonomy ----------------------------------------------------------


class PublishError(Exception):
    """Base class for transport-reported publish failures."""


class MaxPayloadError(PublishError):
    """Message exceeds the broker's max payload (nats.ErrMaxPayload analog)."""


class BadSubjectError(PublishError):
    """Malformed subject (nats.ErrBadSubject analog)."""


class ApiError(PublishError):
    """Broker API error with a numeric code (nats.APIError analog)."""

    #: JetStream "message size exceeds maximum" (errors.go:13)
    MESSAGE_SIZE_EXCEEDS_MAXIMUM = 10054

    def __init__(self, code: int, msg: str = "") -> None:
        super().__init__(msg or f"api error {code}")
        self.code = code


def is_permanent_publish_error(err: BaseException | None) -> bool:
    """Poison-message classification (errors.go:19-31).

    Deliberately conservative: anything unrecognized is TRANSIENT, so
    infrastructure failures (timeouts, disconnects, auth misconfig) keep
    crashing the engine instead of silently skipping data.
    """
    if err is None:
        return False
    if isinstance(err, (MaxPayloadError, BadSubjectError)):
        return True
    if isinstance(err, ApiError):
        return err.code == ApiError.MESSAGE_SIZE_EXCEEDS_MAXIMUM
    return False


# -- publish data model ------------------------------------------------------


@dataclass
class PublishItem:
    subject: str
    event_id: str
    payload: bytes = b""
    position: str = ""  # LSN-analog; monotone within a batch


@dataclass
class PendingAck:
    """Async publish handle (publisher.PendingAck analog)."""

    subject: str
    event_id: str
    acked: bool = False
    err: BaseException | None = None
    #: terminal-state flag — a transport returning an already-complete
    #: ack MUST set resolved=True; an ack with resolved=False and no
    #: resolve_at stays outstanding until something external resolves it
    #: (the stuck-ack case), and times out
    resolved: bool = False
    #: optional monotonic deadline at which the ack self-resolves
    #: (scheduled resolution for fakes / polled transports)
    resolve_at: float | None = None


@dataclass
class BatchResult:
    total: int
    succeeded: int = 0
    failed: int = 0
    first_error: BaseException | None = None
    last_success_position: str | None = None
    quarantined: list[PublishItem] = field(default_factory=list)
    skipped: list[PublishItem] = field(default_factory=list)

    def is_complete(self) -> bool:
        return self.failed == 0 and self.succeeded == self.total

    def is_resolved(self) -> bool:
        """Every item reached a terminal disposition: published,
        quarantined (counted in succeeded), or skipped by policy. This —
        not is_complete — is the checkpoint gate: an operator choosing
        'skip' accepts the loss, so the batch must advance or it would
        re-deliver forever; a crash-policy failure leaves items
        unresolved and blocks the checkpoint."""
        return self.succeeded + len(self.skipped) == self.total


def calculate_backoff(attempt: int) -> float:
    """1s doubling, 8s cap (engine.go:697-704)."""
    backoff = BASE_RETRY_BACKOFF_S * (1 << (attempt - 1))
    return min(backoff, MAX_RETRY_BACKOFF_S)


# -- the engine --------------------------------------------------------------


class OrderedPublishEngine:
    """publishWithRetry (engine.go:430-600), transport- and clock-injectable.

    failure_policy: 'crash' (default — stop, return the error), 'dlq'
    (quarantine the poison item via quarantine_cb and continue), 'skip'
    (count and continue). DLQ/skip apply ONLY after retries exhaust or a
    permanent error is classified, matching the reference.
    """

    def __init__(
        self,
        max_publish_retries: int = 3,
        publish_timeout_s: float = 5.0,
        failure_policy: str = "crash",
        unsafe_unordered: bool = False,
        quarantine_cb: Callable[[PublishItem, BaseException | None], None] | None = None,
        sleep: Callable[[float], None] = _time.sleep,
        clock: Callable[[], float] = _time.monotonic,
    ) -> None:
        if failure_policy not in ("crash", "dlq", "skip"):
            raise ValueError(f"unknown failure policy {failure_policy!r}")
        self.max_publish_retries = max_publish_retries
        self.publish_timeout_s = publish_timeout_s
        self.failure_policy = failure_policy
        self.unsafe_unordered = unsafe_unordered
        self.quarantine_cb = quarantine_cb
        self.sleep = sleep
        self.clock = clock
        self.retry_count = 0  # PublishRetries metric analog

    # -- ack waiting (WaitForAcks, jetstream.go/waitforacks_test.go) -----

    @staticmethod
    def _abandon_unresolved(transport, pending: Sequence[PendingAck]) -> None:
        """Release transport-side tracking of acks the engine gave up on.

        Optional protocol hook: transports that keep a token→PendingAck
        registry (NATS reply inboxes, socket request ids) implement
        ``forget``; without it, every timed-out ack's registration lives
        until disconnect while retries add fresh tokens."""
        unresolved = [p for p in pending if not p.resolved]
        if not unresolved:
            return
        forget = getattr(transport, "forget", None)
        if forget is not None:
            forget(unresolved)

    def wait_for_acks(
        self, pending: Sequence[PendingAck], timeout_s: float
    ) -> tuple[int, int, BaseException | None]:
        """Resolve pending acks up to the timeout; returns
        (succeeded, resolved, first_error). An unresolved ack at the
        deadline counts as neither acked nor errored — the caller
        retries it (TestWaitForAcks_PartialAckThenTimeout parity)."""
        deadline = self.clock() + timeout_s
        first_error: BaseException | None = None
        while True:
            now = self.clock()
            for p in pending:
                if not p.resolved and p.resolve_at is not None and now >= p.resolve_at:
                    p.resolved = True
            if all(p.resolved for p in pending) or now >= deadline:
                break
            nxt = min(
                [p.resolve_at for p in pending if not p.resolved and p.resolve_at is not None],
                default=deadline,
            )
            # Cap each sleep at a small poll interval: a transport that
            # resolves acks from another thread (resolved flag set
            # externally, no resolve_at) must be observed promptly, not
            # after the full publish timeout.
            self.sleep(max(0.0, min(nxt, deadline, now + 0.05) - now))
        succeeded = sum(1 for p in pending if p.resolved and p.acked and p.err is None)
        resolved = sum(1 for p in pending if p.resolved)
        for p in pending:
            if p.resolved and p.err is not None and first_error is None:
                first_error = p.err
        if resolved < len(pending) and first_error is None:
            first_error = TimeoutError(
                f"timeout: {resolved}/{len(pending)} acks resolved"
            )
        return succeeded, resolved, first_error

    # -- ordered path ----------------------------------------------------

    def publish_with_retry(self, transport, items: Sequence[PublishItem]) -> BatchResult:
        if self.unsafe_unordered:
            return self._publish_unordered(transport, items)
        return self._publish_ordered(transport, items)

    def _publish_ordered(self, transport, items: Sequence[PublishItem]) -> BatchResult:
        result = BatchResult(total=len(items))
        succeeded = [False] * len(items)
        for idx, item in enumerate(items):
            last_error: BaseException | None = None
            permanent = False
            for attempt in range(self.max_publish_retries + 1):
                if attempt > 0:
                    self.retry_count += 1
                    self.sleep(calculate_backoff(attempt))
                try:
                    pending = transport.publish_batch_async([item])
                except Exception as exc:  # PublishBatchAsync-level error
                    last_error = exc
                    if is_permanent_publish_error(exc):
                        permanent = True
                        break
                    continue
                ok, _resolved, err = self.wait_for_acks(pending, self.publish_timeout_s)
                if ok == 1:
                    succeeded[idx] = True
                    last_error = None
                    break
                # the retry republishes under a fresh ack handle — tell the
                # transport to stop tracking the abandoned one (unbounded
                # registry growth otherwise; see Transport.forget)
                self._abandon_unresolved(transport, pending)
                last_error = err or PublishError(
                    f"publish item {idx} was not acknowledged"
                )
                if is_permanent_publish_error(last_error):
                    # Retrying a poison message cannot succeed; stop burning
                    # retries and let the failure policy decide.
                    permanent = True
                    break
            if not succeeded[idx]:
                # dlq/skip resolve PERMANENT failures only (the
                # reference's quarantinesPoison covers both policies,
                # engine.go:228-232); transient exhaustion crashes under
                # every policy — infrastructure failures must not
                # silently drop data
                if permanent and self.failure_policy == "dlq":
                    if self.quarantine_cb is not None:
                        self.quarantine_cb(item, last_error)
                    result.quarantined.append(item)
                    succeeded[idx] = True  # quarantine resolves the item
                    continue
                if permanent and self.failure_policy == "skip":
                    result.skipped.append(item)
                    continue
                return self._finalize(result, items, succeeded, last_error)
        return self._finalize(result, items, succeeded, None)

    def _publish_unordered(self, transport, items: Sequence[PublishItem]) -> BatchResult:
        """Unsafe mode: whole batch async, retry ONLY the failed items.
        Later items can commit before earlier failures — documented as
        ordering-unsafe, exactly like the reference flag."""
        result = BatchResult(total=len(items))
        succeeded = [False] * len(items)
        remaining = list(range(len(items)))
        last_error: BaseException | None = None
        for attempt in range(self.max_publish_retries + 1):
            if not remaining:
                break
            if attempt > 0:
                self.retry_count += 1
                self.sleep(calculate_backoff(attempt))
            batch = [items[i] for i in remaining]
            try:
                pending = transport.publish_batch_async(batch)
            except Exception as exc:
                last_error = exc
                if is_permanent_publish_error(exc):
                    break
                continue
            _ok, _resolved, wait_err = self.wait_for_acks(
                pending, self.publish_timeout_s
            )
            self._abandon_unresolved(transport, pending)
            still_failed = []
            for i, p in zip(remaining, pending):
                if p.resolved and p.acked and p.err is None:
                    succeeded[i] = True
                else:
                    still_failed.append(i)
                    if p.err is not None:
                        last_error = p.err
            if still_failed and last_error is None:
                # pure timeout failures carry no per-ack err; surface the
                # synthesized wait error so the result never reports
                # failed items with first_error=None
                last_error = wait_err
            remaining = still_failed
        return self._finalize(
            result, items, succeeded, last_error if remaining else None
        )

    def _finalize(
        self,
        result: BatchResult,
        items: Sequence[PublishItem],
        succeeded: list[bool],
        err: BaseException | None,
    ) -> BatchResult:
        """buildFinalResult (engine.go:676-694): counts + the LAST
        CONTIGUOUS success position — the only position a checkpoint may
        ack, so a partial failure never checkpoints past a hole."""
        result.succeeded = sum(succeeded)
        skipped_ids = {id(i) for i in result.skipped}
        result.failed = sum(
            1
            for i, ok in enumerate(succeeded)
            if not ok and id(items[i]) not in skipped_ids
        ) + len(result.skipped)
        result.first_error = err
        last = -1
        for i, ok in enumerate(succeeded):
            if not ok:
                break
            last = i
        if last >= 0:
            result.last_success_position = items[last].position
        return result


def publish_and_checkpoint(
    engine: OrderedPublishEngine,
    transport,
    items: Sequence[PublishItem],
    commit_position: str,
    checkpoint_cb: Callable[[str], None],
) -> BatchResult:
    """Flush + checkpoint gate: the checkpoint acks the batch's COMMIT
    position and only when the whole batch resolved — a partial failure
    must not checkpoint at all, because the commit position is a
    transaction boundary and acking it would skip the unpublished tail
    on restart (TestFlushWithBatchPublish_PartialFailureDoesNotCheckpoint,
    engine_test.go:496-560). `last_success_position` on the result is
    resume DIAGNOSTICS (the contiguous prefix), never the ack value."""
    result = engine.publish_with_retry(transport, items)
    if result.is_resolved():
        checkpoint_cb(commit_position)
    return result
