from .tables import (
    TPCH_TABLES, compact_files, dataset_bytes, delete_keys, load_table,
    load_tables, merge_upsert, prune_versions, read_topics, write_bucketed,
    write_partitioned, write_time_sorted, write_zordered, zorder_key,
)

__all__ = ["TPCH_TABLES", "compact_files", "dataset_bytes",
           "delete_keys", "load_table", "load_tables", "merge_upsert",
           "prune_versions", "read_topics",
           "write_bucketed", "write_partitioned", "write_time_sorted",
           "write_zordered", "zorder_key"]
