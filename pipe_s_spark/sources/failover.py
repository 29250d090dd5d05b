"""Source failover: primary/backup endpoint rotation + endpoint-change
detection — the reference's master-failover machinery restated for
Spark sources.

Parity targets:

- Switch-by-IP (`/root/reference/pkg/input/mysql/binlog/binloginput.go:
  199-210`): try the primary address, on failure try the backup —
  here generalized to an ordered endpoint list tried in sequence, for
  batch reads (:class:`FailoverSource`) and stream starts / mid-run
  failures (:func:`start_stream_with_failover`,
  :func:`supervise_stream_with_failover`).
- Switch-by-DNS (`dnstracker.go:24-104` + `binloginput.go:216-221`):
  poll a resolver, and when the resolution CHANGES, surface it so the
  owner restarts the pipeline against the new master —
  :class:`EndpointChangeTracker` mirrors the sorted-dedup compare and
  the tolerate-resolution-failure behavior, firing a callback instead
  of RaiseError.

Why restart-based failover is the right Spark shape: the reference
resumes after reconnect because the binlog position lives in its
StateStore (`serverinfo.go:30-46` loads the master status, the
position store replays from there). Structured Streaming's checkpoint
IS that state store — a restarted query resumes its offsets exactly
once regardless of which replica endpoint it reads from, so failover
needs no data-path code at all, only endpoint rotation around
``start``. At 100 TB that matters: failover cost is O(restart), never
a re-scan.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SourceUnavailableError(RuntimeError):
    """Every endpoint failed; carries per-endpoint causes."""

    def __init__(self, attempts: list[tuple[str, Exception]]):
        self.attempts = attempts
        detail = "; ".join(f"{ep}: {type(e).__name__}: {e}" for ep, e in attempts)
        super().__init__(f"all {len(attempts)} endpoints failed: {detail}")


class FailoverSource:
    """Batch-read failover across an ordered endpoint list.

    ``reader(spark, endpoint)`` builds the DataFrame for one endpoint
    (a parquet path, a JDBC URL, a Kafka bootstrap string); endpoints
    are tried in order and the first that both builds AND passes
    ``probe`` wins. The default probe is ``df.take(1)``: it
    materializes one full row, so a dead endpoint behind a
    valid-looking plan fails HERE, not deep inside a downstream job
    (``count()``/``isEmpty()`` are NOT sufficient probes — they prune
    columns, skipping the very expressions that would touch the
    source).
    """

    def __init__(
        self,
        endpoints: Sequence[str],
        reader: Callable[[SparkSession, str], DataFrame],
        probe: Callable[[DataFrame], Any] | None = None,
    ):
        if not endpoints:
            raise ValueError("endpoints must be non-empty")
        self.endpoints = list(endpoints)
        self.reader = reader
        self.probe = probe if probe is not None else (lambda df: df.take(1))
        #: endpoint that served the last successful read (None before)
        self.active_endpoint: str | None = None

    def read(self, spark: SparkSession) -> DataFrame:
        attempts: list[tuple[str, Exception]] = []
        for ep in self.endpoints:
            try:
                df = self.reader(spark, ep)
                self.probe(df)
            except Exception as e:  # noqa: BLE001 — every source error means "next replica"
                attempts.append((ep, e))
                continue
            self.active_endpoint = ep
            return df
        raise SourceUnavailableError(attempts)


def start_stream_with_failover(
    endpoints: Sequence[str],
    start: Callable[[str], Any],
):
    """Start a streaming query, rotating endpoints on START failure —
    the SwitchByIP start path (binloginput.go:199-210). ``start(ep)``
    builds and starts the query against one endpoint; all attempts
    share one checkpoint, so whichever replica wins resumes the same
    offsets. Returns ``(query, endpoint)``."""
    attempts: list[tuple[str, Exception]] = []
    for ep in endpoints:
        try:
            return start(ep), ep
        except Exception as e:  # noqa: BLE001
            attempts.append((ep, e))
    raise SourceUnavailableError(attempts)


def supervise_stream_with_failover(
    endpoints: Sequence[str],
    start: Callable[[str], Any],
    max_restarts: int = 3,
    await_timeout_s: float | None = None,
) -> str:
    """Run a BOUNDED stream (availableNow-style) to completion with
    mid-run failover: if the query dies (start failure or
    StreamingQueryException), restart against the next endpoint,
    wrapping around, up to ``max_restarts`` restarts. The shared
    checkpoint makes each restart resume, not reprocess. Returns the
    endpoint that completed the run.

    This is the Task-restart loop the reference runs around RaiseError
    (task restarts the input after a failover signal); long-running
    production queries would do the same in their driver loop."""
    attempts: list[tuple[str, Exception]] = []
    n = len(list(endpoints))
    for i in range(max_restarts + 1):
        ep = list(endpoints)[i % n]
        try:
            q = start(ep)
            q.awaitTermination(await_timeout_s) if await_timeout_s else q.awaitTermination()
            return ep
        except Exception as e:  # noqa: BLE001
            attempts.append((ep, e))
    raise SourceUnavailableError(attempts)


class EndpointChangeTracker:
    """Detect that a logical endpoint now resolves differently — the
    DNS-change half of master failover (dnstracker.go:66-104).

    ``resolve()`` returns the current resolution (one address or a
    list); :meth:`poll` compares against the last seen resolution
    (sorted, deduplicated, exactly like the reference) and fires
    ``on_change(old, new)`` once per change. Resolution FAILURES are
    tolerated: the tracker keeps the old view and reports no change
    (dnstracker.go:90-96) — a flaky resolver must not trigger
    spurious failovers. Drive ``poll`` from the owner's schedule (the
    reference ticks every DefaultDNSCheckInterval ms)."""

    def __init__(
        self,
        resolve: Callable[[], str | Sequence[str]],
        on_change: Callable[[list[str], list[str]], None],
    ):
        self.resolve = resolve
        self.on_change = on_change
        self._current: list[str] = []

    @staticmethod
    def _norm(r: str | Sequence[str]) -> list[str]:
        items = [r] if isinstance(r, str) else list(r)
        return sorted(set(items))

    def poll(self) -> bool:
        """Returns True (and fires the callback) iff the resolution
        changed since the last successful poll."""
        try:
            new = self._norm(self.resolve())
            if not new:
                return False
        except Exception:  # noqa: BLE001 — resolution failure != change
            return False
        if not self._current:
            # first successful resolution just seeds the baseline
            self._current = new
            return False
        if new == self._current:
            return False
        old, self._current = self._current, new
        self.on_change(old, new)
        return True
