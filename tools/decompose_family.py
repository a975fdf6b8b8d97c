"""Ad-hoc stage decomposition for the neardup/CC family (r14 measure
pass). Times each stage of the pipeline in isolation (min over N
passes, noop sink) so the optimization targets the true cost center.

Usage: python tools/decompose_family.py [sf_dir] [--repeat N]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.session import get_spark
from dnsflow_clickhouse_spark.sources.tables import load_table


def _t(label, make_df, repeat):
    """Clock includes DataFrame CONSTRUCTION: the CC-family loops run
    blocking collects while the plan is being built, so timing only the
    final write understates them (bench.py clocks fn() + write too)."""
    times = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        df = make_df() if callable(make_df) else make_df
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    print(
        f"{label}: " + " ".join(f"{t:.2f}" for t in times)
        + f"  min={min(times):.2f}s load={os.getloadavg()[0]:.1f}",
        flush=True,
    )


def main():
    args = sys.argv[1:]
    repeat = 3
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark(app_name="decompose-family")
    from dnsflow_clickhouse_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
        staged_grams,
    )
    from dnsflow_clickhouse_spark.operators.graph import (
        canonical_representatives,
        connected_components,
        dedup_clusters,
    )

    d = load_table(spark, sf_dir, "documents")
    d.count()  # warm

    def pairs():
        return prefix_filtered_jaccard_pairs(
            d, "doc_id", "text", ngram=3, threshold=0.5
        )

    from dnsflow_clickhouse_spark.operators.graph import (
        component_census,
        kcore_peel,
    )

    _t("grams_only", lambda: staged_grams(d, "doc_id", "text", 3), repeat)
    _t("pairs", pairs, repeat)
    _t("pairs_ordered", lambda: pairs().orderBy("id_a", "id_b"), repeat)
    _t(
        "pairs_cc",
        lambda: connected_components(pairs(), "id_a", "id_b", num_partitions=8),
        repeat,
    )
    _t(
        "pairs_clusters",
        lambda: dedup_clusters(pairs(), num_partitions=8).orderBy("comp"),
        repeat,
    )
    _t(
        "pairs_canonical",
        lambda: canonical_representatives(
            pairs(), d, id_col="doc_id", quality_col="n_chars",
            num_partitions=8,
        ).orderBy("comp"),
        repeat,
    )
    _t("pairs_census", lambda: component_census(pairs(), num_partitions=8).orderBy("comp"), repeat)
    _t(
        "pairs_kcore",
        lambda: kcore_peel(
            pairs().select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
            k=2, rounds=3, num_partitions=8,
        ).orderBy("id"),
        repeat,
    )


if __name__ == "__main__":
    main()
