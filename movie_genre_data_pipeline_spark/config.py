"""Pipeline configuration + injectable clock.

The reference hard-codes its layer paths in two `configuration.py` notebooks
(reference: Batch_notebook/config/configuration.py:9-14,
Autoloader_notebook/config/configuration.py:12-22) and stamps rows with
`current_timestamp()` (reference: Batch_notebook/operations/operations.py:29-31),
which makes outputs non-reproducible. We keep the same medallion layout but make the
paths a dataclass and the clock injectable so tests get deterministic audit columns
(SURVEY.md §5, §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Clock:
    """Source of the `ingesttime` audit column.

    `fixed_utc` = None → real `current_timestamp()` (production);
    an ISO string (e.g. "2024-01-01 00:00:00") → deterministic literal (tests).
    """

    fixed_utc: str | None = None

    def now(self) -> Column:
        if self.fixed_utc is None:
            return F.current_timestamp()
        return F.to_timestamp(F.lit(self.fixed_utc))


@dataclass(frozen=True)
class PipelineConfig:
    """Medallion layer layout (reference: Batch_notebook/config/configuration.py:9-14).

    One root directory with bronze/silver/checkpoint zones; every table is a
    partitioned-Parquet directory under a zone. `database` mirrors the reference's
    `CREATE DATABASE Movie` catalog scoping
    (Batch_notebook/config/configuration.py:23-24).
    """

    root: str
    database: str = "movie"
    datasource_name: str = "movie.json"
    budget_floor: float = 100_000.0  # code value; prose said 1M (SURVEY.md §8.4)
    clock: Clock = field(default_factory=Clock)

    @property
    def raw_path(self) -> str:
        return str(Path(self.root) / "raw")

    @property
    def bronze_path(self) -> str:
        return str(Path(self.root) / "bronze" / "movie_bronze")

    def silver_path(self, table: str) -> str:
        return str(Path(self.root) / "silver" / f"{table}_silver")

    def gold_path(self, table: str) -> str:
        return str(Path(self.root) / "gold" / f"{table}_gold")

    def checkpoint_path(self, name: str) -> str:
        return str(Path(self.root) / "checkpoints" / name)
