"""spark-submit entry point for streaming KG maintenance.

Cluster usage (same deployment shape as jobs/run_kg.py):

    python tools/package.py                      # builds dist/palladian_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/palladian_spark.zip \\
        jobs/run_kg_maintain.py \\
        --input  <transcripts parquet dir> \\
        --output <store dir> \\
        [--entity-dict <parquet>] [--max-files-per-trigger N] [--compact]

Drains whatever is currently in ``--input`` (availableNow trigger) and
folds each micro-batch into the incremental KG stores under ``--output``
(streaming/kg_maintain.py: novel-edge store, evidence deltas, degree
profile — all idempotent ``batch=N`` layouts).  Rerunning with the same
``--output`` resumes from the streaming checkpoint and processes ONLY
new files.  ``--compact`` folds the accumulated per-batch delta
partitions into one after the drain (bounded file counts on a
long-running deployment; Iceberg rewrite_data_files equivalent).

All cluster config (AQE, Arrow, shuffle partitions) comes from
spark-submit conf; this entry point only sets what the job owns.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None, stop: bool = True) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="transcripts parquet dir (conv_id, turn_idx, role, "
                        "text, tool, ts)")
    p.add_argument("--output", required=True,
                   help="store dir for edges/ evidence_delta/ degrees/ "
                        "lineage/ _checkpoint/")
    p.add_argument("--entity-dict", default=None,
                   help="optional parquet with (entity_id, surface, concept)")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--compact", action="store_true",
                   help="compact per-batch delta partitions after the drain")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("palladian-kg-maintain").getOrCreate()

    from palladian_spark.pipeline import (default_model,
                                          model_from_entity_dictionary)
    from palladian_spark.streaming.kg_maintain import (
        compact_stores, current_degrees, run_streaming_kg_maintenance)

    if args.entity_dict:
        entity_dict = spark.read.parquet(args.entity_dict)
        entries = [(r["surface"], r["concept"])
                   for r in entity_dict.select("surface", "concept").collect()]
        model = model_from_entity_dictionary(entries)
    else:
        from palladian_spark.data.transcripts import entity_dictionary_pdf
        from pyspark.sql import functions as F
        pdf = entity_dictionary_pdf()
        pdf["entity_id"] = (pdf["concept"].str.lower() + ":" + pdf["surface"])
        entity_dict = spark.createDataFrame(pdf)
        model = default_model()

    run_streaming_kg_maintenance(
        spark, args.input, args.output, model, entity_dict,
        max_files_per_trigger=args.max_files_per_trigger)

    compacted = {}
    if args.compact:
        compacted = compact_stores(spark, args.output)

    degrees = current_degrees(spark, args.output)
    print(json.dumps({"nodes": degrees.count(),
                      "compacted": compacted}))
    if stop:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
