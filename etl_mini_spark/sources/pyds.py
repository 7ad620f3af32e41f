"""Python DataSource (Spark 4 API): the reference's template-driven
HTTP-API extract (simple_api_service.py:19-61) as a REAL pluggable
source — ``spark.read.format("http_api")`` — instead of a driver-side
``createDataFrame`` landing.

Why this shape at scale: ``fetch_to_dataframe`` (sources/http_api.py)
lands one bounded payload on the driver — right for one-shot exports,
wrong for thousands of parameterized calls. Registering a DataSource
turns each param set into an ``InputPartition``: rendering+fetching runs
on EXECUTORS, partition-parallel, rows stream out through Arrow, and the
scan composes with the rest of the engine (filters project onto it,
downstream joins see an ordinary DataFrame).

Transport selection is by option string (executors can't receive a
callable): ``transport=stub_export`` is the deterministic offline stub
(same contract as the http_api_extract query's), ``transport=requests``
is the production HTTP client. All template validation happens driver-
side in ``partitions()`` — a bad param set fails the job before any
request is issued (reference parity: MissingParamsError).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from etl_mini_spark.sources.http_api import fetch, render_template


def stub_export_transport(request: dict) -> tuple[int, str, bytes]:
    """Deterministic offline transport: parses the RENDERED url (so
    template selection/validation/substitution stay on the exercised
    path) and synthesizes ``n`` JSON rows starting at id ``start``."""
    from urllib.parse import parse_qs, urlparse

    q = parse_qs(urlparse(request["url"]).query)
    n = int(q["n"][0])
    start = int(q.get("start", ["0"])[0])
    rows = [
        {"id": i, "name": f"row_{i}", "value": round(i * 1.5, 2)}
        for i in range(start, start + n)
    ]
    return 200, "application/json", json.dumps(rows).encode()


_TRANSPORTS = {
    "stub_export": stub_export_transport,
}


def _resolve_transport(name: str):
    if name == "requests":  # import-gated: not available in all envs
        from etl_mini_spark.sources.http_api import requests_transport

        return requests_transport
    try:
        return _TRANSPORTS[name]
    except KeyError:
        raise ValueError(
            f"unknown transport {name!r}; expected one of "
            f"{sorted(_TRANSPORTS) + ['requests']}"
        ) from None


class HttpApiReader(DataSourceReader):
    def __init__(self, schema, options: dict):
        self.ddl_schema = schema
        self.templates = json.loads(options["templates"])
        self.template_key = options["template_key"]
        self.param_sets = json.loads(options["param_sets"])
        self.transport_name = options.get("transport", "requests")
        self.field_names = [f.name for f in schema.fields]

    def partitions(self):
        # driver-side fail-fast: validate EVERY param set against the
        # template before any partition is scheduled
        _resolve_transport(self.transport_name)
        for p in self.param_sets:
            render_template(self.templates, self.template_key, p)
        return [InputPartition(json.dumps(p)) for p in self.param_sets]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        params = json.loads(partition.value)
        transport = _resolve_transport(self.transport_name)
        rows = fetch(self.templates, self.template_key, params, transport)
        if isinstance(rows, dict):
            rows = [rows]
        for r in rows:
            yield tuple(r.get(f) for f in self.field_names)


class HttpApiDataSource(DataSource):
    """``spark.read.format("http_api")`` after
    ``spark.dataSource.register(HttpApiDataSource)``.

    Required options: ``templates`` (JSON template dict), ``template_key``,
    ``param_sets`` (JSON list of param dicts — one InputPartition each),
    ``schema`` is passed via ``.schema(ddl)`` on the reader.
    Optional: ``transport`` (``stub_export`` | ``requests``)."""

    @classmethod
    def name(cls) -> str:
        return "http_api"

    def reader(self, schema) -> HttpApiReader:
        return HttpApiReader(schema, self.options)
