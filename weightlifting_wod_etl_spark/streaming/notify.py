"""Completion notification — OP22 of the reference, Spark-native.

Reference: the state machine's final step publishes an SNS SMS with the
execution name and start time
(``SemiStructureInvictusPost_stateMachine.yml:112-123``). The Spark analog
is a ``StreamingQueryListener``: the engine invokes it on query start /
progress / termination, and the listener appends one JSON-lines record per
event to a notifications log — the pluggable seam where a production
deployment would call SNS/Slack/webhook instead.

Driver-side by design: listener callbacks run on the driver event bus,
never on executors, so the notification cost is O(batches), independent of
data volume — exactly like the reference's single post-pipeline publish.
The SNS/boto3 transport itself stays out of the engine (credentials and
endpoints are deployment config, OP24), but the event contract — what the
reference puts in the message — is fully produced here.
"""

from __future__ import annotations

import json
import os
import threading
import time

from pyspark.sql.streaming import StreamingQueryListener


class FileNotificationListener(StreamingQueryListener):
    """Append query lifecycle events as JSONL to ``log_path``.

    Events mirror the reference's notification payload (execution id,
    timestamps, status) plus per-batch rows processed — the fields any
    real transport (SNS, webhook) would forward.
    """

    def __init__(self, log_path: str) -> None:
        self._path = log_path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)

    def _emit(self, record: dict) -> None:
        record["emitted_at"] = time.time()
        line = json.dumps(record, default=str)
        with self._lock, open(self._path, "a") as f:
            f.write(line + "\n")

    def onQueryStarted(self, event) -> None:
        self._emit(
            {"event": "started", "query_id": str(event.id), "name": event.name}
        )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._emit(
            {
                "event": "progress",
                "query_id": str(p.id),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
            }
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing-dependent
        pass

    def onQueryTerminated(self, event) -> None:
        self._emit(
            {
                "event": "terminated",
                "query_id": str(event.id),
                "exception": event.exception,
            }
        )


def notify_on_completion(spark, log_path: str) -> FileNotificationListener:
    """Register a completion-notification listener on this session.

    Returns the listener so callers can remove it
    (``spark.streams.removeListener``) when the pipeline finishes.
    """
    listener = FileNotificationListener(log_path)
    spark.streams.addListener(listener)
    return listener
