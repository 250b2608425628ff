"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) — a
deterministic synthetic event-log generator.

Why this exists: the reference's only sources are files and catalog tables
(SURVEY.md §2.1); real pipelines also read from systems Spark has no built-in
connector for, and Spark 4's Python DataSource API is the idiomatic way to
bring one up without JVM code. This module exercises the full surface a
production connector needs — registration (`spark.dataSource.register`),
options, a declared schema, PARTITIONED parallel reads (one
`InputPartition` per generator shard; each executor task generates its slice
independently, so the source scales out like any file scan instead of
funneling through the driver), and the VECTORIZED read path (`read()` yields
`pyarrow.RecordBatch`, not per-row tuples — the throughput shape a real
connector needs; batches are built with closed-form numpy int64 arithmetic).

The generated stream is a pure function of the row index via a classic LCG
(x -> (1103515245·x + 12345) mod 2^31 — constants from ISO C's rand()), chosen
over Python's `random` because every engine can replay exact 64-bit integer
arithmetic: the DuckDB oracle regenerates the IDENTICAL dataset from
generate_series, making a custom-source read fully correctness-gated — the
same portability discipline as the md5 idiom in functions/{cms,hll,kmv}.py.

Determinism contract: rows depend only on (row index), never on partition
count or task scheduling — repartition-invariant like everything else here.

Throughput (local[32], 1M rows x 5 cols, noop sink, warm workers): Arrow-batch
read ~0.7-0.9s vs ~0.5-0.7s for a parquet scan of the identical data — ~1.3-1.6x
a native columnar scan, vs ~6x+ for the per-row tuple path this replaced. The
first action pays one-time Python-worker forks; steady state is Arrow-bound.

Packaging note: the classes are built INSIDE `_build_datasource_class` with
no references to this module's globals, so cloudpickle serializes them BY
VALUE. Spark ships the pickled class to its Python workers, whose sys.path
does not necessarily contain this repo (the driver-contract session adds it
at runtime); a module-level class would be pickled by reference and die with
ModuleNotFoundError on the worker.
"""

from __future__ import annotations

LCG_A = 1103515245  # ISO C rand() multiplier
LCG_C = 12345
LCG_M = 1 << 31
EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
EPOCH_START = 1_700_000_000  # 2023-11-14T22:13:20Z

FORMAT_NAME = "synthetic_events"


def _build_datasource_class():
    """Self-contained class factory — see the packaging note above."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    lcg_a, lcg_c, lcg_m = LCG_A, LCG_C, LCG_M
    event_types = EVENT_TYPES
    epoch_start = EPOCH_START
    fmt = FORMAT_NAME

    class _RangePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class SyntheticEventsReader(DataSourceReader):
        def __init__(self, options):
            self.n_rows = int(options.get("n_rows", 10000))
            self.n_users = int(options.get("n_users", 500))
            self.n_partitions = int(options.get("partitions", 8))
            self.batch_rows = int(options.get("arrow_batch_rows", 65536))
            if (
                self.n_rows < 0
                or self.n_users < 1
                or self.n_partitions < 1
                or self.batch_rows < 1
            ):
                raise ValueError(
                    f"invalid options: n_rows={self.n_rows} "
                    f"n_users={self.n_users} partitions={self.n_partitions} "
                    f"arrow_batch_rows={self.batch_rows}"
                )

        def partitions(self):
            step = -(-self.n_rows // self.n_partitions) or 1  # ceil div
            return [
                _RangePartition(lo, min(lo + step, self.n_rows))
                for lo in range(0, self.n_rows, step)
            ] or [_RangePartition(0, 0)]

        def read(self, partition):
            # Arrow-batch path (Spark 4 readers may yield pyarrow.RecordBatch
            # instead of per-row tuples): the whole slice is generated with
            # vectorized int64 numpy arithmetic — the LCG chain is a closed
            # form of the row index, so no sequential scan is needed — and
            # handed to Spark as zero-copy Arrow batches. ~100x less
            # per-row Python overhead than the tuple generator this replaces.
            # int64 never overflows: lcg_a * x < 2^61 for x < 2^31 (the LCG
            # modulus caps every state at 2^31). `arrow_batch_rows` bounds
            # per-batch memory.
            import numpy as np
            import pyarrow as pa

            ev = np.asarray(event_types, dtype=object)
            for lo in range(partition.start, partition.end, self.batch_rows):
                hi = min(lo + self.batch_rows, partition.end)
                i = np.arange(lo, hi, dtype=np.int64)
                h1 = (lcg_a * i + lcg_c) % lcg_m
                h2 = (lcg_a * h1 + lcg_c) % lcg_m
                h3 = (lcg_a * h2 + lcg_c) % lcg_m
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(i, pa.int64()),
                        # naive micros = UTC wall time; session is pinned UTC
                        pa.array((epoch_start + i) * 1_000_000, pa.timestamp("us")),
                        pa.array(h1 % self.n_users, pa.int64()),
                        pa.array(ev[h2 % len(event_types)], pa.string()),
                        pa.array((h3 % 10000) / 100.0, pa.float64()),
                    ],
                    names=["event_id", "ts", "user_id", "event_type", "value"],
                )

    class SyntheticEventsDataSource(DataSource):
        """`spark.read.format("synthetic_events")` source.

        Options: n_rows (default 10000), n_users (500), partitions (8)."""

        @classmethod
        def name(cls) -> str:
            return fmt

        def schema(self) -> str:
            return (
                "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                "event_type STRING, value DOUBLE"
            )

        def reader(self, schema):
            return SyntheticEventsReader(self.options)

    return SyntheticEventsDataSource


def register(spark) -> None:
    """Register the synthetic_events format on this session (idempotent —
    re-registration simply replaces the entry)."""
    spark.dataSource.register(_build_datasource_class())


# -- writer side: jsonl_ledger sink (two-phase commit) ----------------------------------
LEDGER_FORMAT_NAME = "jsonl_ledger"


def _build_ledger_datasource_class():
    """Writer-side counterpart of the connector API (same by-value packaging
    contract as the reader factory): `df.write.format("jsonl_ledger")` lands
    each partition as a JSON-lines shard and makes the write ATOMIC with the
    two-phase protocol Spark drives — executors `write()` shards and return a
    WriterCommitMessage each; the driver's `commit()` publishes the manifest
    (`_MANIFEST.json`) listing exactly the committed shards; `abort()` removes
    orphans. Readers resolve the manifest, so a half-failed write is invisible
    — the same visibility rule Delta/Iceberg implement with their logs,
    demonstrated over plain files.

    Scale: shards stream row-by-row from the task iterator (bounded memory);
    the only driver-side work is the manifest (one name per task)."""
    import json
    import os
    import uuid
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        DataSourceWriter,
        WriterCommitMessage,
    )

    fmt = LEDGER_FORMAT_NAME

    @dataclass
    class LedgerCommitMessage(WriterCommitMessage):
        shard: str
        n_rows: int

    class LedgerWriter(DataSourceWriter):
        def __init__(self, options, overwrite: bool):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("jsonl_ledger requires option 'path'")
            self.overwrite = overwrite

        def write(self, iterator):
            os.makedirs(self.path, exist_ok=True)
            shard = f"part-{uuid.uuid4().hex}.jsonl"
            n = 0
            with open(os.path.join(self.path, shard), "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), default=str) + "\n")
                    n += 1
            return LedgerCommitMessage(shard=shard, n_rows=n)

        def commit(self, messages):
            shards = [
                {"shard": m.shard, "n_rows": m.n_rows}
                for m in messages
                if m is not None
            ]
            manifest = os.path.join(self.path, "_MANIFEST.json")
            # Append mode must MERGE into the existing manifest — publishing
            # only this write's shards would make every previously committed
            # row invisible to readers. Overwrite resets the shard list (the
            # old shard files become unreferenced, i.e. logically deleted —
            # the same visibility semantics as a Delta overwrite commit).
            if not self.overwrite and os.path.exists(manifest):
                with open(manifest) as f:
                    prior = json.load(f)
                shards = list(prior.get("shards", [])) + shards
            tmp = manifest + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"shards": shards}, f)
            os.replace(tmp, manifest)  # atomic publish

        def abort(self, messages):
            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, m.shard))
                    except FileNotFoundError:
                        pass

    class LedgerStreamWriter(DataSourceStreamWriter):
        """Streaming sink (4th connector surface): same shard + manifest
        protocol, but commit() is PER-EPOCH — each micro-batch's shards merge
        into the manifest under their batchId, so readers see exactly the
        committed prefix of the stream and a failed epoch's shards never
        appear (abort removes them). Epoch-keyed manifests are how exactly-
        once file sinks implement idempotent replay: re-committing a batchId
        replaces, not duplicates, its shard set."""

        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("jsonl_ledger requires option 'path'")

        def write(self, iterator):
            os.makedirs(self.path, exist_ok=True)
            shard = f"part-{uuid.uuid4().hex}.jsonl"
            n = 0
            with open(os.path.join(self.path, shard), "w") as f:
                for row in iterator:
                    f.write(json.dumps(row.asDict(), default=str) + "\n")
                    n += 1
            return LedgerCommitMessage(shard=shard, n_rows=n)

        def commit(self, messages, batchId: int) -> None:
            manifest = os.path.join(self.path, "_MANIFEST.json")
            state = {"epochs": {}}
            if os.path.exists(manifest):
                with open(manifest) as f:
                    state = json.load(f)
                if "epochs" not in state:
                    state = {"epochs": {}}
            state["epochs"][str(batchId)] = [
                {"shard": m.shard, "n_rows": m.n_rows}
                for m in messages
                if m is not None
            ]
            state["shards"] = [
                s for epoch in state["epochs"].values() for s in epoch
            ]
            tmp = manifest + ".tmp"
            with open(tmp, "w") as f:
                json.dump(state, f)
            os.replace(tmp, manifest)

        def abort(self, messages, batchId: int) -> None:
            for m in messages:
                if m is not None:
                    try:
                        os.remove(os.path.join(self.path, m.shard))
                    except FileNotFoundError:
                        pass

    class JsonlLedgerDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return fmt

        def writer(self, schema, overwrite: bool):
            return LedgerWriter(self.options, overwrite)

        def streamWriter(self, schema, overwrite: bool):
            return LedgerStreamWriter(self.options)

    return JsonlLedgerDataSource


def register_ledger(spark) -> None:
    """Register the jsonl_ledger sink format on this session (idempotent)."""
    spark.dataSource.register(_build_ledger_datasource_class())


def read_ledger(spark, path: str, schema: str):
    """Manifest-resolved read of a jsonl_ledger directory: ONLY shards the
    committed manifest lists are visible (uncommitted/aborted orphans are
    not). Declared schema — no inference scan."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    shards = [os.path.join(path, s["shard"]) for s in manifest["shards"]]
    if not shards:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(shards)


# -- streaming reader: the third connector surface --------------------------------------
STREAM_FORMAT_NAME = "synthetic_events_stream"


def _build_stream_datasource_class():
    """Streaming counterpart of the batch reader (same by-value packaging and
    the same LCG row function): a `SimpleDataSourceStreamReader` whose offset
    is the global row index — `initialOffset` starts at 0, each micro-batch
    `read(start)` advances by `rows_per_batch` until `max_rows`, and
    `readBetweenOffsets` replays any (start, end) range deterministically,
    which is exactly the replayability contract Structured Streaming's
    checkpoint recovery relies on. Offsets are data, not files — the shape of
    a queue/CDC connector rather than a directory listing."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    lcg_a, lcg_c, lcg_m = LCG_A, LCG_C, LCG_M
    event_types = EVENT_TYPES
    fmt = STREAM_FORMAT_NAME

    def _rows(start: int, end: int):
        # a LIST, not a generator: the stream runner's prefetch cache
        # copy.copy()s the returned iterator, and generators aren't copyable
        out = []
        for i in range(start, end):
            h1 = (lcg_a * i + lcg_c) % lcg_m
            h2 = (lcg_a * h1 + lcg_c) % lcg_m
            out.append(
                (i, h1 % 500, event_types[h1 % len(event_types)], float(h2 % 10000))
            )
        return out

    class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.max_rows = int(options.get("max_rows", 1000))
            self.rows_per_batch = int(options.get("rows_per_batch", 250))

        def initialOffset(self) -> dict:
            return {"idx": 0}

        def read(self, start: dict):
            lo = start["idx"]
            hi = min(lo + self.rows_per_batch, self.max_rows)
            return iter(_rows(lo, hi)), {"idx": hi}

        def readBetweenOffsets(self, start: dict, end: dict):
            return iter(_rows(start["idx"], end["idx"]))

        def commit(self, end: dict) -> None:
            pass  # nothing to clean up: the generator is pure

    class SyntheticEventsStreamDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return fmt

        def schema(self) -> str:
            return "event_id BIGINT, user_id BIGINT, event_type STRING, cents DOUBLE"

        def simpleStreamReader(self, schema):
            return SyntheticEventsStreamReader(self.options)

    return SyntheticEventsStreamDataSource


def register_stream(spark) -> None:
    """Register the synthetic_events_stream source (idempotent)."""
    spark.dataSource.register(_build_stream_datasource_class())
