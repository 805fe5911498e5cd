from .tables import (
    TPCH_TABLES, compact_files, dataset_bytes, load_table, load_tables,
    merge_upsert, read_topics, write_bucketed,
    write_partitioned, write_time_sorted, write_zordered, zorder_key,
)

__all__ = ["TPCH_TABLES", "compact_files", "dataset_bytes",
           "load_table", "load_tables", "merge_upsert", "read_topics",
           "write_bucketed", "write_partitioned", "write_time_sorted",
           "write_zordered", "zorder_key"]
