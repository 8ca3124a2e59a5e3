"""Structured-Streaming surfaces of the engine.

The north rule is a BATCH pipeline with manifest-based resume (SURVEY §7),
and every correctness gate runs in batch — this package is the streaming
re-expression of the two operators with a natural incremental shape:

- `sessions.sessionize_stream`: gap sessionization via native
  `session_window` (batch-equivalent semantics, proven by gate + tests);
- `extract.run_extraction_stream`: file-source ingest → broadcast rule join
  → Arrow-batched extraction → parquet sink with checkpoint, the
  streaming-native analogue of the batch manifest/anti-join resume (S11);
- `dedup.first_seen_dedup_stream`: custom stateful operator
  (applyInPandasWithState) — first-seen exact dedup of an unbounded feed,
  one boolean GroupState per distinct key, restart-durable.
"""

from .dedup import first_seen_dedup_stream
from .extract import run_extraction_stream
from .sessions import run_sessionize_stream_once, sessionize_stream

__all__ = [
    "first_seen_dedup_stream",
    "run_extraction_stream",
    "run_sessionize_stream_once",
    "sessionize_stream",
]
