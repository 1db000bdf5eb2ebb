from covid_data_challenge_spark.sources.readers import (
    TESTDATA_TABLES,
    load_table,
    load_tables,
    read_history_csv,
    read_snapshot_json,
    flatten_snapshot,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
    "read_history_csv",
    "read_snapshot_json",
    "flatten_snapshot",
]
