"""TfL arrivals as a first-class Spark Python DataSource (SURVEY §2.1
S1, second mapping: "custom PySpark ``spark.dataSource.register``").

Round 1 shipped the driver-loop client (:mod:`.http`); this wraps the
same :class:`~tfl_realtime_lakehouse_spark.sources.http.TfLArrivalsClient`
in the Spark 4 Python DataSource API so ingestion is a real source:

    spark.dataSource.register(TfLArrivalsDataSource)
    spark.readStream.format("tfl_arrivals")
         .option("stops", "940GZZLUOXC,940GZZLUBND")
         .load()

Options (all strings, per the DataSource options contract):

- ``stops``     comma-separated stop ids (required; order-preserving
                dedup is applied, reference tfl_ingest_dag.py:16-23)
- ``fixture``   path to a JSON file ``{stop_id: [api_row, ...]}`` —
                hermetic offline fetcher for tests/replays (no network)
- ``base_url`` / ``app_id`` / ``app_key`` / ``retries`` / ``backoff`` /
  ``workers``  forwarded to the client (defaults as in :mod:`.http`)
- ``max_polls`` streaming only: stop advancing the offset after N
                snapshot polls (bounds hermetic tests; default unbounded)

Semantics:

- **Streaming**: each micro-batch is one snapshot poll of all stops
  (offset = poll counter). The reader is a
  :class:`~pyspark.sql.datasource.SimpleDataSourceStreamReader` —
  fetches run on the driver, which is the right placement: an HTTP poll
  of ~dozens of stops is I/O fan-out (the client's ThreadPool), not a
  distributed computation, and executor-side fetching would multiply
  load on the upstream API without adding parallelism. Replay after a
  failure (``readBetweenOffsets``) REFETCHES — a live API is not
  replayable, so delivery is at-least-once and the idempotent silver
  sink (:mod:`..streaming.sink`) absorbs duplicates; with the
  ``fixture`` fetcher the refetch is exact.
- **Batch**: ``spark.read.format("tfl_arrivals")`` performs one
  snapshot in a single input partition (same placement argument).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from tfl_realtime_lakehouse_spark.schemas import ARRIVALS_RAW_SCHEMA
from tfl_realtime_lakehouse_spark.sources.http import (
    TfLArrivalsClient,
    _requests_fetcher,
    dedup_stop_ids,
    project_arrival,
)

_FIELDS = [f.name for f in ARRIVALS_RAW_SCHEMA.fields]


def _fixture_fetcher(path: str):
    """Offline fetcher: serves canned per-stop payloads from a JSON file.

    The file is re-read per construction (cheap, hermetic); unknown
    stops get an empty list, exercising the zero-rows path.
    """
    with open(path) as fh:
        canned: dict[str, list] = json.load(fh)

    def fetch(url: str, params: dict) -> tuple[int, object]:
        if "/StopPoint/" in url:
            stop = url.split("/StopPoint/")[1].split("/")[0]
            return 200, canned.get(stop, [])
        return 200, []

    return fetch


def _client(options: dict) -> TfLArrivalsClient:
    fixture = options.get("fixture")
    kwargs: dict = {
        "retries": int(options.get("retries", 3)),
        "backoff": float(options.get("backoff", 0.5)),
        "workers": int(options.get("workers", 8)),
    }
    if options.get("base_url"):
        kwargs["base_url"] = options["base_url"]
    if options.get("app_id"):
        kwargs["app_id"] = options["app_id"]
    if options.get("app_key"):
        kwargs["app_key"] = options["app_key"]
    if fixture:
        kwargs["fetcher"] = _fixture_fetcher(fixture)
        kwargs["sleep"] = lambda s: None  # no real backoff against a file
    else:  # pragma: no cover — network path, exercised only in production
        kwargs["fetcher"] = _requests_fetcher()
    return TfLArrivalsClient(**kwargs)


def _stops(options: dict) -> list[str]:
    raw = options.get("stops", "")
    stops = dedup_stop_ids(raw.split(","))
    if not stops:
        raise ValueError("tfl_arrivals: the 'stops' option is required")
    return stops


def _snapshot_rows(options: dict) -> list[tuple]:
    """One full poll: fan out over stops, project to the bronze 6-tuple."""
    rows = _client(options).fetch_all(_stops(options))
    projected = (project_arrival(r) for r in rows)
    return [tuple(p[f] for f in _FIELDS) for p in projected]


class TfLArrivalsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.options = dict(options)

    def initialOffset(self) -> dict:
        return {"poll": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        n = int(start.get("poll", 0))
        max_polls = int(self.options.get("max_polls", 0) or 0)
        if max_polls and n >= max_polls:
            return iter([]), start  # bounded run: offset stops advancing
        return iter(_snapshot_rows(self.options)), {"poll": n + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Failure replay: refetch (at-least-once; exact under `fixture`).
        if int(end.get("poll", 0)) > int(start.get("poll", 0)):
            return iter(_snapshot_rows(self.options))
        return iter([])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: no source-side buffering past prefetch


class TfLArrivalsBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(0)]  # one snapshot == one partition

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        return iter(_snapshot_rows(self.options))


class TfLArrivalsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tfl_arrivals"

    def schema(self) -> StructType:
        return ARRIVALS_RAW_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return TfLArrivalsBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> TfLArrivalsStreamReader:
        return TfLArrivalsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent ``spark.dataSource.register`` for this source."""
    spark.dataSource.register(TfLArrivalsDataSource)
