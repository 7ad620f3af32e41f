"""CLI pipeline runner — shape parity with the reference's JSON-config
argv entry point (scripts/runs/internal_raw_to_dwh.py:45-49: pick a
registered runner, feed it a config dict, execute): here the config IS
the validated PipelineSpec and the runner is the one lazy-plan executor.

    python -m etl_mini_spark.run config.json

Config schema (JSON mirror of plans/pipeline.py dataclasses)::

    {
      "name": "events_raw_to_curated",
      "source": {"path": "...", "format": "parquet", ...},
      "sink":   {"path": "...", "format": "parquet", "mode": "overwrite", ...},
      "transforms": [{"op": "filter", "expr": "..."}, ...],
      "incremental_ts_col": "ts",          // optional
      "window_end": "2024-01-25T00:00:00", // optional, ISO-8601
      "checkpoint_path": "...",            // optional
      "spark": {"app_name": "...", "cpus": 8}   // optional session opts
    }

Exit code 0 on "ok"/"skipped", 1 on validation or execution failure;
the run report prints to stdout as one JSON line (machine-consumable,
like bench.py).
"""

from __future__ import annotations

import json
import sys
from datetime import datetime
from typing import Any

from etl_mini_spark.plans.pipeline import PipelineSpec, SinkSpec, SourceSpec, run_pipeline


def spec_from_dict(cfg: dict[str, Any]) -> PipelineSpec:
    """Validate a JSON config dict into a PipelineSpec. Unknown keys
    raise (a typo'd config must fail loudly, not run a subtly different
    pipeline — the closed-registry rule applied to config)."""
    if not isinstance(cfg, dict):
        raise ValueError("invalid pipeline config: JSON root must be an object")
    cfg = dict(cfg)
    cfg.pop("spark", None)  # session opts are consumed by main(), not the spec
    try:
        source = SourceSpec(**cfg.pop("source"))
        sink = SinkSpec(**cfg.pop("sink"))
        window_end = cfg.pop("window_end", None)
        if window_end is not None:
            window_end = datetime.fromisoformat(window_end)
        return PipelineSpec(source=source, sink=sink, window_end=window_end, **cfg)
    except KeyError as e:
        raise ValueError(f"invalid pipeline config: missing required key {e}") from e
    except TypeError as e:
        raise ValueError(f"invalid pipeline config: {e}") from e


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 1:
        print("usage: python -m etl_mini_spark.run <config.json>", file=sys.stderr)
        return 1
    try:
        cfg = json.loads(open(argv[0]).read())
        spark_opts = cfg.get("spark", {}) if isinstance(cfg, dict) else {}
        spec = spec_from_dict(cfg)
    except (OSError, ValueError) as e:
        print(json.dumps({"status": "error", "error": str(e)}))
        return 1

    from etl_mini_spark.session import get_spark

    spark = get_spark(spark_opts.get("app_name", f"etl-mini-spark-run-{spec.name}"))
    try:
        report = run_pipeline(spark, spec)
    except Exception as e:  # surface as a machine-readable failure
        print(json.dumps({"status": "error", "pipeline": spec.name, "error": str(e)}))
        return 1
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
