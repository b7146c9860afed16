#!/usr/bin/env python3
"""Interleaved A/B timer for individual registry queries (guide §1.4):
same methodology as bench.py (clearCache per pass, noop sink, best-of-N)
but scoped to named queries so optimization work measures only what it
touched.  Usage:

    python scripts/ab_query.py <repeats> <query> [query ...]

Prints one line per query: best / all samples.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repeats = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pdfminer_six_spark.spark.session import build_session
    from pdfminer_six_spark.queries import QUERIES

    spark = build_session(app_name="ab_query")
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            fn, _sql = QUERIES[name]
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - t0, 3))
    for name in names:
        s = samples[name]
        print(f"{name}: best={min(s)} samples={s}")
    spark.stop()


if __name__ == "__main__":
    main()
