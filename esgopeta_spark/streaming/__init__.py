"""Structured-Streaming re-expression of the reference's live surface:

- the live ``Fetch`` subscription (gun/scoped_fetch.go:89-217) becomes a
  streaming query over an update-message source with a stateful HAM
  merge emitting only winning transitions (``outputMode("update")``)
- per-message dedup (gun/scoped_fetch.go:174-178) becomes watermarked
  ``dropDuplicates``
- the mandated windowed-analytics surface (tumbling/sliding/session,
  watermarks) wraps the stock Spark operators

Everything is verified by batch≡stream equivalence tests
(tests/test_streaming.py), the Spark analog of the reference's
local-replay test (gun/tests/gun_test.go:36-39).
"""

from esgopeta_spark.streaming.ham_stream import streaming_ham_merge
from esgopeta_spark.streaming.ingest import read_update_stream

__all__ = ["streaming_ham_merge", "read_update_stream"]
