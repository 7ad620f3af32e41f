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


def test_precomputed_next_round_plan_is_executable():
    """The ROUND-N+1 rotation plan precomputed in _window.py must be
    mechanically executable next round: every named re-verification
    slot is a registered, oracle-backed entry currently in the tail
    (not already holding a slot), the slot arithmetic closes to 50
    with the staged tier, and no staged name collides with the
    registry. Catches a plan typo THIS round instead of mid-rotation
    next round."""
    import re

    from etl_mini_spark.queries import ORACLE, QUERIES
    from etl_mini_spark.queries._window import _DRIVER_WINDOW

    src = (REPO / "etl_mini_spark/queries/_window.py").read_text()
    m = re.search(
        r"ROUND-\d+ ROTATION PLAN.*?lexicographic within equal last-green rounds:\n"
        r"(.*?)\n# \(cohort sizes",
        src,
        re.S,
    )
    assert m, "precomputed next-round plan block not found in _window.py"
    plan = re.findall(r'"([a-z0-9_]+)"', m.group(1))
    assert plan and len(plan) == len(set(plan)), "plan empty or has duplicates"
    for name in plan:
        assert name in QUERIES, f"plan names unknown query: {name}"
        assert name in ORACLE, f"plan names rows-only query: {name}"
        assert name not in _DRIVER_WINDOW, (
            f"plan re-verifies {name}, which already holds a current slot"
        )
    tier = re.search(r"register the (\d+) round(\d+)_pending entries", src)
    assert tier, "plan does not state the staged-tier size"
    n_tier, rnd = int(tier.group(1)), int(tier.group(2))
    pending = (REPO / f"etl_mini_spark/queries/round{rnd}_pending.py").read_text()
    staged = set(re.findall(r'@pq\("([a-z0-9_]+)"', pending))
    assert len(staged) == n_tier, (
        f"plan says {n_tier} staged entries, round{rnd}_pending has {len(staged)}"
    )
    assert not staged & set(QUERIES), f"staged names collide: {staged & set(QUERIES)}"
    assert n_tier + len(plan) == 50, (
        f"slot arithmetic: {n_tier} staged + {len(plan)} re-verify != 50"
    )


def test_precomputed_plan_drains_stalest_first():
    """The drain discipline is the point of the plan: the named
    re-verification slots must be exactly the STALEST driver-green
    entries outside the current window, lexicographic within equal
    last-green rounds (r16 verdict trajectory). A plan that skips a
    staler entry for a fresher one — a typo'd cherry-pick the
    executable-plan lint can't see — fails here. Declared canary
    slots (lines matching '# canary: <name>' inside the plan block)
    are exempt from the staleness math, per the code-change-canary
    exception."""
    import re

    from etl_mini_spark.queries import ORACLE
    from etl_mini_spark.queries._window import _DRIVER_WINDOW

    src = (REPO / "etl_mini_spark/queries/_window.py").read_text()
    m = re.search(
        r"ROUND-\d+ ROTATION PLAN.*?lexicographic within equal last-green rounds:\n"
        r"(.*?)\n# \(cohort sizes",
        src,
        re.S,
    )
    assert m, "precomputed next-round plan block not found"
    canaries = set(re.findall(r"# canary: ([a-z0-9_]+)", m.group(1)))
    plan = [n for n in re.findall(r'"([a-z0-9_]+)"', m.group(1))
            if n not in canaries]

    last = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        for name, row in json.loads(p.read_text()).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                last[name] = max(last.get(name, 0), rnd)

    eligible = sorted(
        ((r, n) for n, r in last.items()
         if n in ORACLE and n not in _DRIVER_WINDOW and n not in canaries),
    )
    expected = [n for _, n in eligible[: len(plan)]]
    assert plan == expected, (
        "plan is not the stalest-first drain: "
        f"first divergence at {next((i, a, b) for i, (a, b) in enumerate(zip(plan, expected)) if a != b)}"
    )
