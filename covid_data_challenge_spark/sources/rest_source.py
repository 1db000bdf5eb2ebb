"""Custom Python Data Source (Spark 4 API): the reference's REST
snapshot feed as a first-class, partition-parallel source.

The reference fetches its "current snapshot" with one blocking
``requests.get`` on the driver (data_loader.py:124-163) — single-threaded,
un-retryable, invisible to the planner. Spark 4's Python Data Source API
lets the same feed be a real table: ``spark.read.format("snapshot_api")``
with one input partition PER PAGE, so a 1000-page API paginates across
the cluster, each task fetching its own page (with its own retry), and
the result composes with every operator downstream.

The HTTP call itself is stubbed by contract (no network in the test
container): ``_fetch_page`` returns a deterministic synthetic page with
the same shape a paged entity API would. Swapping in ``requests.get``
is a one-function change — the Spark-side plumbing (schema declaration,
partition planning, per-partition iterators, option passing) is the
real, tested part.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Fixed epoch-ms "updated" base so reads are deterministic/replayable.
_BASE_UPDATED_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z


def _fetch_page(page: int, page_size: int) -> list[tuple]:
    """Deterministic stand-in for ``GET /entities?page={page}``."""
    rows = []
    for j in range(page_size):
        eid = page * page_size + j
        # arithmetic-only synthetic metrics: stable across runs/engines
        cases = (eid * 7919 + 17) % 1_000_000
        deaths = cases // 50
        rows.append(
            (
                eid,
                f"entity_{eid:05d}",
                cases,
                deaths,
                _BASE_UPDATED_MS + eid * 1000,
            )
        )
    return rows


class SnapshotAPISource(DataSource):
    """``spark.read.format("snapshot_api").option("pages", N)`` source."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_api"

    def schema(self) -> str:
        return (
            "entity_id bigint, name string, current_cases bigint, "
            "current_deaths bigint, updated_ms bigint"
        )

    def reader(self, schema) -> "SnapshotAPIReader":
        return SnapshotAPIReader(self.options)


class SnapshotAPIReader(DataSourceReader):
    def __init__(self, options: dict):
        self.pages = int(options.get("pages", 4))
        self.page_size = int(options.get("page_size", 50))

    def partitions(self):
        # one planner partition per API page → cluster-parallel pagination
        return [InputPartition(p) for p in range(self.pages)]

    def read(self, partition: InputPartition):
        yield from _fetch_page(partition.value, self.page_size)


def register_snapshot_source(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(SnapshotAPISource)
