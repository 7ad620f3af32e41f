"""Machine-checked driver-window invariant (round-5 verdict item 8):
twice (r04 no-op, the 6 post-window round-5 additions) a new
oracle-backed query shipped without a driver CORRECTNESS slot. This
test makes "new query => window slot or a prior driver-green row"
fail pytest instead of waiting for a judge to notice."""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _driver_green() -> set[str]:
    green = set()
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(p.read_text()).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                green.add(name)
    return green


def test_every_oracle_backed_query_windowed_or_driver_green():
    from etl_mini_spark.queries import ORACLE
    from etl_mini_spark.queries._window import _DRIVER_WINDOW

    green = _driver_green()
    missing = sorted(n for n in ORACLE if n not in green and n not in _DRIVER_WINDOW)
    assert not missing, (
        "oracle-backed queries with no driver-green CORRECTNESS row and no "
        f"current window slot (rotate queries/_window.py): {missing}"
    )


def test_window_slots_not_wasted_on_rows_only():
    """Rows-only entries (no oracle SQL) cannot hash-match — a window
    slot spent on one is a wasted verification slot (r01's
    similarity_ivf lesson)."""
    from etl_mini_spark.queries import ORACLE
    from etl_mini_spark.queries._window import _DRIVER_WINDOW

    rows_only = [n for n in _DRIVER_WINDOW if n not in ORACLE]
    assert not rows_only, f"rows-only entries occupy window slots: {rows_only}"
