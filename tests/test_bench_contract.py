"""The bench output contract (round-6 fix for the truncated BENCH_r05):
the driver captures only the last ~2000 chars of stdout, so the final
summary line must ALWAYS fit, parse, and list the slowest queries first
no matter how large the registry grows."""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, build_summary_line


def _fake_times(n: int) -> dict[str, float]:
    return {
        f"some_rather_long_query_name_{i:04d}": round(0.05 + (i % 97) * 0.037, 3)
        for i in range(n)
    }


def test_summary_line_fits_and_parses_at_any_registry_size():
    for n in (1, 50, 99, 250, 1000):
        times = _fake_times(n)
        line = build_summary_line(times, round(sum(times.values()), 3), 0.1)
        assert len(line) <= 1900, (n, len(line))
        d = json.loads(line)
        assert d["n_queries"] == n
        assert len(d["queries"]) + d["queries_omitted"] == n
        if d["queries_omitted"]:
            # every omitted query is no slower than the smallest listed
            listed_min = min(d["queries"].values())
            omitted = [v for k, v in times.items() if k not in d["queries"]]
            assert max(omitted) <= listed_min
        assert d["metric"] == "sum_query_seconds_sf0.1"
        assert d["full"] == "BENCH_FULL.json"


def test_summary_line_orders_slowest_first():
    times = {"fast": 0.1, "slow": 9.9, "mid": 1.0}
    d = json.loads(build_summary_line(times, 11.0, 0.01))
    assert list(d["queries"]) == ["slow", "mid", "fast"]
    assert d["queries_omitted"] == 0


def test_summary_line_carries_normalized_total():
    """r16 contract (VERDICT r15 #3): the steal-normalized sweep total
    rides the summary line when provided, and the line still fits the
    driver's stdout tail at any registry size."""
    for n in (3, 250):
        times = _fake_times(n)
        total = round(sum(times.values()), 3)
        line = build_summary_line(times, total, 0.1, total_norm=round(total * 0.82, 3))
        assert len(line) <= 1900
        d = json.loads(line)
        assert d["value_norm"] == round(total * 0.82, 3)
        assert len(d["queries"]) + d["queries_omitted"] == n
    # omitting the arg keeps the pre-r16 line shape (no null field)
    d = json.loads(build_summary_line(_fake_times(3), 1.0, 0.1))
    assert "value_norm" not in d


def test_bench_covers_whole_registry():
    """Structural contract (round-4 lesson): the bench list derives from
    the registry, so every query added is benched the same round."""
    import __spark_entry__ as entrymod

    assert set(BENCH_QUERIES) == set(entrymod.queries())
