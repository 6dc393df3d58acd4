#!/usr/bin/env python3
"""Time EVERY declared query (driver window + extras) with the noop
sink — the round-6 operator checklist sweep (guide §1.4). Two passes:
the first warms codegen/broadcast, the second is recorded.

Usage: SPARK_GRAFT_SF_DIR=... python bench_sweep_all.py [repeats]
Prints one JSON line per query: {"q": name, "walls": [...], "min": s}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bio_re_with_entity_embeddings_spark.deploy import ensure_shipped  # noqa: E402
from bio_re_with_entity_embeddings_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(app_name="kg-sweep", master=f"local[{CPUS}]")
    ensure_shipped(spark)
    import __spark_entry__ as entrymod

    qs = {**entrymod.queries(), **entrymod.extra_queries()}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    results = {}
    for name, fn in qs.items():
        walls = []
        try:
            for r in range(repeats + 1):
                spark.sparkContext.setJobDescription(name)
                t0 = time.perf_counter()
                noop(fn(spark, SF_DIR))
                w = time.perf_counter() - t0
                spark.sparkContext.setJobDescription(None)
                if r:  # first pass is warm-up
                    walls.append(round(w, 3))
                spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"q": name, "error": str(exc)[:200]}), flush=True)
            continue
        results[name] = min(walls)
        print(json.dumps({"q": name, "walls": walls, "min": min(walls)}), flush=True)
    print(json.dumps({"total_min_sum": round(sum(results.values()), 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
