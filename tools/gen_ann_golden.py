"""Regenerate the pinned ANN golden oracles (KNN_*_GOLDEN_VALUES in
plans/driver_queries.py) from the deterministic sf0.01 corpus.

Run after any deliberate change to the LSH/IVF operators or their driver
params, then paste the printed VALUES strings over the constants:

    python tools/gen_ann_golden.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from event_driven_etl_msc_research_spark.plans.driver_queries import (  # noqa: E402
    knn_ivf,
    knn_lsh,
)
from event_driven_etl_msc_research_spark.session import get_spark  # noqa: E402


def values_sql(rows) -> str:
    return ", ".join(f"({q}, {n}, {c!r}, {r})" for q, n, c, r in sorted(rows))


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        "gen-ann-golden",
        master="local[8]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    for name, fn in (("KNN_LSH_GOLDEN_VALUES", knn_lsh), ("KNN_IVF_GOLDEN_VALUES", knn_ivf)):
        rows = [tuple(r) for r in fn(spark, sf).collect()]
        print(f'{name} = "{values_sql(rows)}"  # noqa: E501\n')
    spark.stop()
