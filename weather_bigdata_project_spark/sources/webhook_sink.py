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

LOCAL-MODE-ONLY staging: tasks stage to executor-LOCAL disk while
`commit()` runs on the driver, so the `os.replace` publish only works
when driver and executors share a filesystem (local[*], as here). On a
real cluster the staging store must be shared — stage to the target
object store / DFS path, or make `_deliver` (the swap point) POST the
batch from the task and let commit() only record delivery receipts.
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
    def __init__(self, path: str):
        self._path = path
        self._stage = os.path.join(path, "_staging")

    # --- executor side ----------------------------------------------------
    def write(self, iterator):
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
            final = os.path.join(self._path, os.path.basename(m.staged_path))
            os.replace(m.staged_path, final)  # atomic publish
            total += m.n_rows
        with open(os.path.join(self._path, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(self, messages):
        for m in messages or []:
            if m is not None and os.path.exists(m.staged_path):
                os.remove(m.staged_path)


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
        return _WebhookWriter(path)
