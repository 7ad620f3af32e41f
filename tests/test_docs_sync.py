"""Docs cannot drift from the registry: the canonical
"N queries (M oracle-backed)" claims in SURVEY.md / ARCHITECTURE.md are
greped and compared against the live registry (the round-3 verdict
caught SURVEY §9 three rounds stale)."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
COUNT_RE = re.compile(r"(\d+)\s+(?:registry\s+)?queries\s+\((\d+)\s+oracle-backed\)")


def _actual() -> tuple[int, int]:
    from etl_mini_spark.queries import ORACLE, QUERIES

    return len(QUERIES), len(ORACLE)


def _last_claim(doc: str) -> tuple[int, int]:
    text = (REPO / doc).read_text()
    claims = COUNT_RE.findall(text)
    assert claims, f"{doc}: no 'N queries (M oracle-backed)' claim found"
    n, m = claims[-1]  # the LAST claim is the current-round figure
    return int(n), int(m)


def test_survey_counts_match_registry():
    assert _last_claim("SURVEY.md") == _actual()


def test_architecture_counts_match_registry():
    assert _last_claim("ARCHITECTURE.md") == _actual()
