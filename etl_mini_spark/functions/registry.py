"""Closed UDF registry — the reference's ``additional_fields`` computed-
column system (models/helpers/additional_fields.py:5-27; function-name
gating against app.utils.__all__ in
services/pipelines/internal_raw_to_dwh/runs/standard/
elasticsearch_to_postgresql.py:100-111; application in
services/transformers/tsv_converter.py:105-152).

Spark-first restatement:
- constant mode  → ``withColumn(c, lit(v))``
- function mode  → struct-returning **pandas_udf** + star-expansion;
  when the registered function declares a ``native`` builder (a pure
  Column expression with the same semantics), the engine uses that
  instead — keeping the hot path inside Catalyst/codegen. UDFs are the
  slow path; natives are the default.

Only registered names are callable from config — arbitrary code can't
be injected through a pipeline spec, same guarantee as the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any, Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class RegisteredFunction:
    name: str
    fn: Callable[..., dict]  # scalar python impl: (*args, **static) -> dict
    output_schema: T.StructType
    native: Callable[..., dict[str, Column]] | None = None  # Column-expr twin
    # Arrow-batch impl: (*pd.Series, **static) -> pd.DataFrame. Used by the
    # UDF path when present, so a function without a Column-expression
    # twin still avoids the per-row Python loop.
    vectorized: Callable[..., pd.DataFrame] | None = None


@dataclass
class AdditionalField:
    """One computed-column spec (≡ reference AdditionalFields model)."""

    value: Any  # constant, or registered function name when input_mapping set
    input_mapping: dict[str, str] = field(default_factory=dict)  # arg -> column path
    static_args: dict[str, Any] = field(default_factory=dict)
    output_mapping: dict[str, str] = field(default_factory=dict)  # fn key -> out col
    output_fields: list[str] = field(default_factory=list)  # constant mode targets
    use_native: bool = True


class FunctionRegistry:
    def __init__(self) -> None:
        self._fns: dict[str, RegisteredFunction] = {}

    def register(
        self,
        name: str,
        fn: Callable[..., dict],
        output_schema: T.StructType,
        native: Callable[..., dict[str, Column]] | None = None,
        vectorized: Callable[..., pd.DataFrame] | None = None,
    ) -> None:
        self._fns[name] = RegisteredFunction(name, fn, output_schema, native, vectorized)

    def get(self, name: str) -> RegisteredFunction:
        if name not in self._fns:  # closed registry — same gate as the reference
            raise KeyError(f"function {name!r} is not registered (allowed: {sorted(self._fns)})")
        return self._fns[name]

    def names(self) -> list[str]:
        return sorted(self._fns)


def _pandas_wrap(reg: RegisteredFunction, static_args: dict[str, Any], arg_names: list[str]):
    schema = reg.output_schema
    fn, vec = reg.fn, reg.vectorized
    out_cols = [f.name for f in schema.fields]

    @F.pandas_udf(schema)
    def wrapped(*cols: pd.Series) -> pd.DataFrame:
        if vec is not None:  # whole-batch kernel: no per-row Python at all
            out = vec(*cols, **static_args)
            return out[out_cols]
        # scalar fallback: one list-conversion per column up front, then a
        # plain zip loop — ~10× faster than per-row .iloc indexing
        vals = [c.tolist() for c in cols]
        rows = [
            fn(**dict(zip(arg_names, tup)), **static_args) for tup in zip(*vals)
        ]
        return pd.DataFrame(rows, columns=out_cols)

    return wrapped


def apply_additional_fields(
    df: DataFrame, specs: list[AdditionalField], registry: FunctionRegistry
) -> DataFrame:
    """Apply computed-column specs in order (≡ tsv_converter.py:105-152)."""
    for spec in specs:
        if not spec.input_mapping:  # constant mode (tsv_converter.py:149-152)
            for out in spec.output_fields or list(spec.output_mapping.values()):
                df = df.withColumn(out, F.lit(spec.value))
            continue
        reg = registry.get(str(spec.value))
        arg_names = list(spec.input_mapping)
        in_cols = [F.col(p) for p in spec.input_mapping.values()]
        out_map = spec.output_mapping or {f.name: f.name for f in reg.output_schema.fields}
        if spec.use_native and reg.native is not None:
            parts = reg.native(*in_cols, **spec.static_args)
            for key, out in out_map.items():
                df = df.withColumn(out, parts[key])
        else:
            df = df.withColumn("__o", _pandas_wrap(reg, spec.static_args, arg_names)(*in_cols))
            for key, out in out_map.items():
                df = df.withColumn(out, F.col("__o").getField(key))
            df = df.drop("__o")
    return df


# ---- default registry: the reference's one vetted function ----------------

_ISO_PARTS_SCHEMA = T.StructType(
    [
        T.StructField("datetime", T.StringType()),
        T.StructField("microseconds", T.LongType()),
        T.StructField("month", T.StringType()),
    ]
)


def _iso_to_parts_py(iso: str | None) -> dict:
    """Scalar twin of functions/time_fns.iso_to_parts_cols (reference
    iso_to_dict, app/utils/time_converter.py:46-131)."""
    if iso is None:
        return {"datetime": None, "microseconds": None, "month": None}
    s = iso.replace("Z", "+00:00")
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return {
        "datetime": dt.strftime("%Y-%m-%d %H:%M:%S"),
        "microseconds": dt.microsecond,
        "month": dt.replace(day=1).strftime("%Y-%m-%d"),
    }


def _iso_to_parts_native(col: Column) -> dict[str, Column]:
    from etl_mini_spark.functions.time_fns import iso_to_parts_cols

    parts = iso_to_parts_cols(col)
    return {
        "datetime": parts["datetime_s"],
        "microseconds": parts["micros"],
        "month": parts["month_s"],
    }


def _iso_to_parts_vec(iso: pd.Series) -> pd.DataFrame:
    """Arrow-batch twin of ``_iso_to_parts_py``: one vectorized
    to_datetime per batch instead of a Python loop. Naive inputs are
    taken as UTC and offset-bearing ones converted — same contract as
    the scalar and native twins."""
    ts = pd.to_datetime(iso, format="ISO8601", utc=True).dt.tz_localize(None)
    out = pd.DataFrame(
        {
            "datetime": ts.dt.strftime("%Y-%m-%d %H:%M:%S"),
            "microseconds": ts.dt.microsecond.astype("Int64"),
            "month": ts.dt.strftime("%Y-%m-01"),
        }
    )
    out.loc[ts.isna(), :] = None
    return out


def default_registry() -> FunctionRegistry:
    reg = FunctionRegistry()
    reg.register(
        "iso_to_parts",
        _iso_to_parts_py,
        _ISO_PARTS_SCHEMA,
        native=_iso_to_parts_native,
        vectorized=_iso_to_parts_vec,
    )
    return reg
