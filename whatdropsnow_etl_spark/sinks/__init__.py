from .bucketed import read_bucketed, write_bucketed
from .zorder import write_zordered, zorder_value
from .partitioned_parquet import (
    compact_parquet,
    fragmentation_report,
    read_partitioned_events,
    write_partitioned_events,
)
from .manifest import (
    commit_write,
    current_version,
    diff_versions,
    delete_keys,
    delete_where,
    merge_write,
    read_version,
    vacuum,
)
from .observed import qc_metric_exprs, write_observed
from .upsert_parquet import UpsertParquetSink
from .webdataset import read_webdataset_shards, write_webdataset_shards

__all__ = [
    "write_webdataset_shards",
    "read_webdataset_shards",
    "diff_versions",
    "qc_metric_exprs",
    "write_observed",
    "UpsertParquetSink",
    "commit_write",
    "current_version",
    "delete_keys",
    "delete_where",
    "merge_write",
    "read_version",
    "vacuum",
    "write_partitioned_events",
    "read_partitioned_events",
    "compact_parquet",
    "fragmentation_report",
    "write_zordered",
    "zorder_value",
    "write_bucketed",
    "read_bucketed",
]
