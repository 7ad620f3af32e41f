"""Engine exception/warning taxonomy — one import point, mapped to the
reference's hierarchy (app/errors/*, app/warnings/*).

The reference funnels every failure through a `CustomError` tree and
every soft condition through a `CustomWarning` tree. This engine keeps
each exception DEFINED next to the code that enforces it (so the raise
site and the contract live together) and re-exports them here under a
common base, with the reference counterpart noted per class.

| Engine class | Reference counterpart | Enforced at |
|---|---|---|
| SourceMissingError | io_errors (missing source) | sources/readers.py existence gate |
| UnexpectedOffsetError | TimezoneMismatchError (validation_errors) | functions/time_fns.check_expected_offset |
| TemplateNotFoundError | TemplateNotFoundError (io_errors) | sources/http_api.render_template |
| MissingParamsError | InvalidParameterValueError (validation_errors) | sources/http_api.render_template |
| HttpStatusError | external_errors (API failure) | sources/http_api.fetch |
| ValueError('missing required columns') | MissingFieldError (data_errors) | plans/pipeline require_all_columns |
| json_too_long flag column | JsonLengthWarning (data_warnings) | functions/sanitize.with_json_length_flag |

Deliberately NOT mirrored: connection-lifecycle warnings
(ScrollClearWarning, ConnectionCloseWarning) and process-pool warnings
(ExcessiveProcessesWarning) — Spark owns connection/executor lifecycle,
so those conditions cannot occur in this engine. Row-level soft
conditions become FLAG COLUMNS (e.g. ``json_too_long``, ``offset_ok``)
rather than Python warnings: at 100 TB a per-row ``warnings.warn`` is
both a serialization hazard and unreadable; a flag column is queryable
and routable.
"""

from __future__ import annotations

from etl_mini_spark.functions.time_fns import UnexpectedOffsetError
from etl_mini_spark.sources.http_api import (
    HttpStatusError,
    MissingParamsError,
    TemplateNotFoundError,
)
from etl_mini_spark.sources.readers import SourceMissingError

__all__ = [
    "SourceMissingError",
    "UnexpectedOffsetError",
    "TemplateNotFoundError",
    "MissingParamsError",
    "HttpStatusError",
]
