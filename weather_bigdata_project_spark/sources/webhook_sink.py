"""The reference's outbound side (Kafka producer publishing alert JSON,
ref:NiFi_Flow.json:1 PublishKafka_2_0; minio-connector.json raw S3
archival) generalized as a Spark 4 Python DataSource WRITER — the
custom-sink counterpart of `weather_api_source`'s custom readers:

    spark.dataSource.register(WebhookSinkDataSource)
    df.write.format("webhook_sink").option("path", dir).mode("append").save()

Each executor task serializes its partition to JSON-lines and "delivers"
it (here: a staged file per task standing in for an HTTP POST batch to a
webhook endpoint; swap `_deliver` for the requests call). Delivery uses
the two-phase commit contract every exactly-once sink needs:

- task side: write to a STAGED location, return a WriterCommitMessage
  naming it (nothing observable yet — a retried/speculated task just
  stages twice and only one message wins);
- driver side: `commit()` atomically publishes every staged batch
  (rename into the target + _SUCCESS marker), `abort()` removes them.

That protocol — stage per task, publish on driver commit — is exactly
what FileFormatWriter/Kafka-transactional sinks do internally; here it
is spelled out in ~40 lines of Python and testable without a broker.

Two delivery modes (option `delivery`), because the right two-phase
split depends on where the endpoint lives:

- `staged` (default): tasks stage, the DRIVER publishes on commit —
  exactly-once observable output, but staging store and driver must
  share a filesystem (true in local[*]; on a cluster point `path` at a
  shared DFS/object store or this mode silently publishes nothing —
  the round-1 advisor finding, kept loudly documented).
- `task`: each task DELIVERS its batch immediately (the HTTP-POST
  shape — a webhook endpoint is reachable from executors, not from a
  shared filesystem), keyed by an IDEMPOTENCY KEY derived from the
  partition id, so retried/speculated tasks REPLACE their own batch
  instead of duplicating it (the Idempotency-Key header pattern);
  `commit()` only records receipts (_SUCCESS manifest). Semantics are
  at-least-once delivery made effectively-once by the key — `abort()`
  cannot un-POST, which is the true contract of any external-endpoint
  sink and is documented rather than papered over. Cluster-safe: no
  cross-process filesystem assumption at all.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _Staged(WriterCommitMessage):
    staged_path: str
    n_rows: int


class _WebhookWriter(DataSourceWriter):
    def __init__(self, path: str, delivery: str = "staged"):
        if delivery not in ("staged", "task"):
            raise ValueError(f"unknown delivery mode: {delivery}")
        self._path = path
        self._delivery = delivery
        self._stage = os.path.join(path, "_staging")

    def _idempotency_key(self) -> str:
        """Stable per-partition delivery key: a retried or speculated
        task re-delivers UNDER THE SAME KEY, so the endpoint (here: the
        target directory; in production: the webhook's Idempotency-Key
        header) collapses duplicates instead of double-applying."""
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else uuid.uuid4().hex
        return f"part-{pid}"

    # --- executor side ----------------------------------------------------
    def write(self, iterator):
        if self._delivery == "task":
            # deliver NOW, from the task (the only place a webhook
            # endpoint is guaranteed reachable); atomic single-file
            # replace stands in for the idempotent POST
            key = self._idempotency_key()
            tmp = os.path.join(self._path, f".{key}.{uuid.uuid4().hex}.tmp")
            n = 0
            with open(tmp, "w", encoding="utf-8") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), default=str) + "\n")
                    n += 1
            final = os.path.join(self._path, f"{key}.jsonl")
            os.replace(tmp, final)  # idempotent: same key replaces
            return _Staged(staged_path=final, n_rows=n)
        os.makedirs(self._stage, exist_ok=True)
        staged = os.path.join(self._stage, f"batch-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _Staged(staged_path=staged, n_rows=n)

    # --- driver side ------------------------------------------------------
    def commit(self, messages):
        total = 0
        for m in messages:
            if m is None:
                continue
            if self._delivery == "staged":
                final = os.path.join(
                    self._path, os.path.basename(m.staged_path)
                )
                os.replace(m.staged_path, final)  # atomic publish
            total += m.n_rows
        with open(os.path.join(self._path, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(self, messages):
        for m in messages or []:
            if m is None:
                continue
            if self._delivery == "staged" and os.path.exists(m.staged_path):
                os.remove(m.staged_path)
            # task mode: deliveries cannot be un-POSTed — receipts are
            # simply not recorded (no _SUCCESS), and a rerun re-delivers
            # under the same idempotency keys


class WebhookSinkDataSource(DataSource):
    """format name: webhook_sink; required option: path."""

    @classmethod
    def name(cls):
        return "webhook_sink"

    def writer(self, schema, overwrite):
        path = self.options.get("path")
        if not path:
            raise ValueError("webhook_sink requires option 'path'")
        os.makedirs(path, exist_ok=True)
        if overwrite:
            for fn in os.listdir(path):
                if fn.endswith(".jsonl") or fn == "_SUCCESS":
                    os.remove(os.path.join(path, fn))
        return _WebhookWriter(path, self.options.get("delivery", "staged"))
