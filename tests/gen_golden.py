"""Golden-snapshot (re)generator: writes tests/golden/<name>.csv in the
exact canonical form test_golden.py asserts (sorted column header, one
canon_value-stringified row per line, row-sorted).

Usage::

    python tests/gen_golden.py q_sample q_llm_ann_ivf ...   # named queries
    python tests/gen_golden.py --rows-only                  # the 17 ROWS queries

Run it ONLY when a query's output is intentionally changed; a diff in the
regenerated CSV that was not intended is exactly the silent drift the
golden lane exists to catch. Uses the same session shape as conftest's
fixture (cpus=4, shuffle_partitions=4) so snapshots match CI runs —
the ROWS queries' seeded/approx paths are rerun-stable only for a fixed
session shape and fixture file layout.
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
GOLDEN_SF = "/root/testdata/sf0.001"


def main() -> None:
    from twitter_event_stream_spark import registry
    from twitter_event_stream_spark.parity import canon_rows
    from twitter_event_stream_spark.session import get_spark

    import __spark_entry__ as entry

    names = sys.argv[1:]
    if names == ["--rows-only"]:
        # q_kll_quantiles is deliberately NOT golden-pinned (DataSketches
        # KLL compaction is randomized across JVM sessions — see
        # test_golden.py); q_llm_neardup_lsh is pinned by derived
        # invariants instead of a 63k-row snapshot (test_infra.py::
        # test_neardup_lsh_invariants). Writing either would break the
        # suites they feed.
        names = sorted(
            set(entry.queries())
            - set(entry.oracle_sql())
            - {"q_kll_quantiles", "q_llm_neardup_lsh"}
        )
    if not names:
        print(__doc__)
        sys.exit(2)
    spark = get_spark(app_name="tes-gen-golden", cpus=4, shuffle_partitions=4)
    for name in names:
        df = registry.get(name).fn(spark, GOLDEN_SF)
        rows = canon_rows(df.columns, [tuple(r) for r in df.collect()])
        path = os.path.join(GOLDEN_DIR, f"{name}.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(sorted(df.columns))
            w.writerows(rows)
        print(f"{name}: {len(rows)} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
