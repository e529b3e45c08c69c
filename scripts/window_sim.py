"""Driver-faithful full-registry simulation.

Runs EVERY ``queries()`` entry against its ``oracle_sql()`` through the
driver-faithful comparison harness (tests/oracle_harness.py) at the
given scale factor — the pre-flight the window rotation relies on: the
driver only checks the first 50 dict entries per round, so a silent
regression in the rotated-out half would otherwise surface a round
late. r11 ran this ad-hoc; from r12 it is a script.

Usage:  python scripts/window_sim.py [sf_dir]   (default sf0.01)
Exit code 0 iff every entry compares green; prints one line per entry
and a final summary.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import __spark_entry__ as entry  # noqa: E402
from oracle_harness import compare  # noqa: E402
from the_build_project_image_retrieval_with_vector_databases_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="window-sim", shuffle_partitions=32)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    # Corpus-sized oracles (lsh plane count, semantic-dedup k) embed
    # the sf0.01 derivation in their REGISTERED strings; at any other
    # corpus the comparison must re-derive them — the same structural
    # override the SF-sweep parity and fuzz panels use. At the
    # driver's sf0.01 the re-derivation IS the registered string
    # (pinned by test_sized_oracles_match_registered_at_driver_scale),
    # so this changes nothing for the driver-faithful run.
    from tests.test_oracle_parity import _sized_oracles

    oracles = {**oracles, **_sized_oracles(sf_dir)}
    t0 = time.time()
    failures = []
    for i, (name, fn) in enumerate(qs.items()):
        half = "WINDOW" if i < 50 else "rotated"
        t = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, msg = compare(df, oracles[name], sf_dir, name)
            else:
                n = df.count()
                ok, msg = n >= 0, f"{name}: rows-only ({n} rows)"
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            ok, msg = False, f"{name}: EXCEPTION {type(e).__name__}: {e}"
        dt = time.time() - t
        print(f"[{i + 1:3d}/100 {half:7s} {dt:6.2f}s] {msg}", flush=True)
        if not ok:
            failures.append(msg)
    total = time.time() - t0
    print(f"\n{len(qs) - len(failures)}/{len(qs)} green in {total:.0f}s at {sf_dir}")
    for f in failures:
        print(f"FAIL: {f}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
