"""Structured Streaming layer (SURVEY §2.8 #45-#51).

The reference implements micro-batch streaming by hand outside Spark:
S3 events → a trigger Lambda accumulating per-bag file counts in
DynamoDB (trigger.py:110-147), a completeness gate (trigger.py:150-165),
and Step Functions dedup of in-flight batches (trigger.py:55-68). This
package replaces that stack with Structured Streaming primitives:

- ``sources.file_stream``     : checkpointed file-source discovery
                                (replaces the S3-event Lambda filter,
                                lambda_function.py:24-39).
- ``ops.dedup_stream``        : watermark + drop-duplicates — the
                                late/duplicate handling the reference
                                lacks (SURVEY #50).
- ``ops.sessionize_stream``   : event-time session windows — streaming
                                gap sessionization (SURVEY #41).
- ``ops.windowed_agg``        : tumbling/sliding event-time aggregates
                                with watermarks (SURVEY #35).
- ``ops.interval_join_stream``: watermarked stream-stream interval
                                join with bounded state (the engine-
                                native generalization of the trigger's
                                key-correlation, trigger.py:110-147).
- ``gate.CompletenessGate``   : completeness-gated micro-batching in
                                ``foreachBatch`` (trigger.py:150-165).
- ``state.change_points_stateful`` : per-key change-point intervals as
                                an ``applyInPandasWithState`` operator —
                                the streaming form of
                                detect_scenes.py:192-222.
- ``ingest.incremental_dedup_stream`` : the production ingest loop —
                                every micro-batch is deduped within
                                itself and against the persisted corpus
                                index, then appended to it (idempotent
                                per batch id via dynamic partition
                                overwrite).
"""

from .gate import CompletenessGate  # noqa: F401
from .ingest import (continuous_cascade_batch,  # noqa: F401
                     continuous_cascade_stream,
                     embedding_dedup_batch, embedding_dedup_stream,
                     incremental_dedup_batch,
                     incremental_dedup_stream,
                     bm25_index_batch, bm25_index_stream,
                     bm25_delete_batch, bm25_delete_stream,
                     bm25_compact_deletes, read_bm25_tombstones,
                     bm25_sync_snapshot, ivf_sync_snapshot,
                     minhash_sync_snapshot, snapshot_follow,
                     registration_sync,
                     aggregate_sync_snapshot, snapshot_replicate,
                     join_sync_snapshot, sync_status,
                     ivf_append_batch, ivf_append_stream,
                     ivf_delete_batch, ivf_delete_stream,
                     ivf_compact_deletes,
                     index_delete_batch, index_delete_stream,
                     index_compact_deletes, read_index_tombstones,
                     read_bm25_index, read_ivf_index,
                     snapshot_enrich_stream,
                     snapshot_append_batch, snapshot_append_stream,
                     snapshot_upsert_batch, snapshot_upsert_stream,
                     delete_stream,
                     quarantine_batch, quarantine_stream,
                     upsert_batch, upsert_stream,
                     warc_ingest_batch, warc_ingest_stream,
                     mcap_ingest_batch, mcap_ingest_stream,
                     db3_ingest_batch, db3_ingest_stream)
from .ops import (dedup_stream, interval_join_stream,  # noqa: F401
                  sessionize_stream, windowed_agg)
from .sources import (file_stream,  # noqa: F401
                      discover_new_files, file_ingest_batch,
                      sealed_partitions)
from .state import anomalies_stateful, change_points_stateful  # noqa: F401
