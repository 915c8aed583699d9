from .upsert_parquet import UpsertParquetSink

__all__ = ["UpsertParquetSink"]
