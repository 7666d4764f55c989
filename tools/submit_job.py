"""spark-submit entry point for the extraction pipeline.

The north-rule deployment shape: the engine ships as a zip via
``--py-files`` and this script is the job file —

    cd /root/repo && zip -qr /tmp/engine.zip readabilityimproved_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        tools/submit_job.py <input_parquet> <output_dir> [num_parts]

On a real cluster swap the master for YARN/K8s; nothing else changes
(the package is pure Python, no native deps). Prints one JSON line of
run stats; exit code 0 iff the job completed.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    input_path, output_dir = sys.argv[1], sys.argv[2]
    num_parts = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from pyspark.sql import SparkSession

    # spark-submit provides master/conf; only session-level SQL tuning here
    spark = (
        SparkSession.builder.appName("readability-extraction")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from readabilityimproved_spark.plans.pipeline import run_extraction

    stats = run_extraction(
        spark, input_path, output_dir, num_parts=num_parts, resume=True
    )
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
