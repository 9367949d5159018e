"""Scale-ratio measurement harness (the NOTES_r05 §3 / NOTES_r07 §8+§11
protocol, made repeatable): time registered queries at two sf dirs and
print the wall-clock ratio, with the session cache cleared per run, a
compile pre-pass at sf0.001 (codegen cost excluded), and min-of-2 on
the smaller sf.

On fixed hardware, wall ∝ data is the LINEAR expectation: a ratio well
below data-factor means structure-bounded shuffles/aggregates (good),
well above exposes a hidden quadratic term (bad). Scaled inputs come
from scripts/make_scaled_fixture.py (shape-preserving, disjoint key
spaces — NOT naive copies, which would inject quadratic dup/pair
artifacts).

Usage:
  python scripts/measure_scale.py <small_sf_dir> <big_sf_dir> [query ...]
  # default queries: the scale-safe registered set measured in r7
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DEFAULT = [
    "exact_dedup", "incremental_dedup_bloom", "cms_frequencies",
    "zorder_profile", "token_counts", "gopher_rules",
    "simhash_pairs_wide", "kmeans_centroids_fixed", "knn_lsh_planes8",
    "knn_ivf_fixed", "coin_pagerank_capped", "exchange_influencers",
    "media_decode_bmp", "trading_sessions", "semantic_dedup_trained",
    "embedding_dup_wide",
]


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    names = sys.argv[3:] or DEFAULT

    from etl_visualization_of_cryptocurrency_trading_data_spark.plans.registry import QUERIES
    from etl_visualization_of_cryptocurrency_trading_data_spark.session import get_spark

    spark = get_spark(app_name="measure_scale")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(name: str, sf: str) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        QUERIES[name](spark, sf).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # Compile pre-pass dir: smallest fixture NEXT TO the small arg (so
    # the harness works on any machine/layout), falling back to the
    # small dir itself; skipped entirely when nothing exists.
    candidate = os.path.join(os.path.dirname(small.rstrip("/")), "sf0.001")
    prepass = candidate if os.path.isdir(candidate) else small
    if not os.path.isdir(prepass):
        prepass = None

    failures = 0
    for name in names:
        if name not in QUERIES:
            print(f"{name}: NOT REGISTERED")
            failures += 1
            continue
        try:
            if prepass is not None:
                timed(name, prepass)  # compile pre-pass
            a = min(timed(name, small) for _ in range(2))
            b = timed(name, big)
            print(
                f"{name}: {small.rstrip('/').rsplit('/', 1)[-1]} {a:.2f}s  "
                f"{big.rstrip('/').rsplit('/', 1)[-1]} {b:.1f}s  ratio {b/a:.1f}x",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"{name}: ERROR {type(e).__name__} {str(e)[:200]}", flush=True)
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
