#!/usr/bin/env python3
"""Measure the --split-pages crossover (r03 VERDICT item 3's bench note).

Corpus shape: ``n_small`` ordinary turns plus ONE pathological multi-page
payload (``monster_pages``).  Unsplit, the monster owns a single task and
is the straggler that bounds job wall time; split, its page groups spread
across cores.  We run both paths interleaved (best-of-``rounds``) at a
given parallelism and report walls + the monster's share.

Usage:
    python3 scripts/bench_split_pages.py [monster_pages] [n_small] [cpus]
Prints ONE JSON line.  Quiet-box discipline applies (same as bench.py).
"""

from __future__ import annotations

import base64
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    monster_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rounds = int(os.environ.get("SPLIT_BENCH_ROUNDS", "3"))
    ppg = int(os.environ.get("SPLIT_BENCH_PPG", "8"))

    import pandas as pd

    from pdfminer_six_spark.datagen.transcripts import (
        synth_pdf,
        transcripts_pandas,
    )
    from pdfminer_six_spark.spark.pipeline import (
        extract_transcripts,
        extract_transcripts_split_pages,
    )
    from pdfminer_six_spark.spark.session import build_session

    spark = build_session(app_name="bench-split-pages", master=f"local[{cpus}]")

    small = transcripts_pandas(n_convs=n_small)
    monster = base64.b85encode(
        synth_pdf(
            [[f"page {i} body line {j}" for j in range(40)]
             for i in range(monster_pages)]
        )
    ).decode()
    extra = pd.DataFrame(
        {
            "conv_id": ["monster"], "turn_idx": [0], "role": ["tool"],
            "text": [monster], "tool": ["pdf"], "ts": [small["ts"].iloc[0]],
        }
    )
    df = spark.createDataFrame(
        pd.concat([small, extra], ignore_index=True)
    ).repartition(cpus).persist()
    n = df.count()  # materialize input once, outside the timers

    split_chars = len(monster) // 2
    best = {"unsplit": float("inf"), "split": float("inf")}
    for _ in range(rounds):  # interleaved best-of
        t0 = time.perf_counter()
        assert extract_transcripts(df).count() == n
        best["unsplit"] = min(best["unsplit"], time.perf_counter() - t0)
        t0 = time.perf_counter()
        assert (
            extract_transcripts_split_pages(
                df, split_chars=split_chars, pages_per_group=ppg
            ).count()
            == n
        )
        best["split"] = min(best["split"], time.perf_counter() - t0)

    print(json.dumps({
        "metric": "split-pages crossover (1 monster payload + small turns)",
        "monster_pages": monster_pages,
        "monster_b85_chars": len(monster),
        "n_small_turns": len(small),
        "pages_per_group": ppg,
        "cpus": cpus,
        "rounds": rounds,
        "unsplit_sec": round(best["unsplit"], 3),
        "split_sec": round(best["split"], 3),
        "speedup": round(best["unsplit"] / best["split"], 3),
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
