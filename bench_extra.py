#!/usr/bin/env python
"""Supplementary measurement harness for the optimization rounds.

NOT the driver bench (bench.py is frozen for measurement): this file
isolates each declared bench query with the noop sink (guide §1.4 --
every column of every row is computed and discarded, so the timing is
the computation, not the sink or an optimizer-pruned count) and can dump
``.explain("formatted")`` for the plan-diff deliverables.

Usage:
    python bench_extra.py time  [--queries a,b] [--reps 3]
    python bench_extra.py plans [--queries a,b] [--outdir plans/r07] [--suffix _before]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default os.cpu_count()).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))

BENCH_QUERIES = [
    "extract_article_spans",
    "minhash_lsh",
    "similarity_topk",
    "quality_score",
    "date_from_url",
    "tpch_pricing_summary",
    "decontaminate",
    "layout_spans",
    "neardup_clusters",
]


def _entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(os.path.dirname(__file__), "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["spark_entry"] = mod
    spec.loader.exec_module(mod)
    return mod


def _session():
    from readabilityimproved_spark.plans.session import build_session

    return build_session(
        app_name="bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["time", "plans"])
    ap.add_argument("--queries", default=",".join(BENCH_QUERIES))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--outdir", default="plans/r07")
    ap.add_argument("--suffix", default="_before")
    args = ap.parse_args()
    names = [n for n in args.queries.split(",") if n]

    entry = _entry()
    queries = entry.queries()
    spark = _session()
    sc = spark.sparkContext

    if args.mode == "plans":
        os.makedirs(args.outdir, exist_ok=True)
        for name in names:
            df = queries[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.outdir, f"{name}{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({len(plan)} bytes)")
        spark.stop()
        return

    out: dict[str, dict] = {}
    for name in names:
        runs = []
        for i in range(1 + args.reps):  # first = cold (codegen/JIT)
            sc.setJobDescription(f"bench_extra:{name}:{i}")
            t0 = time.time()
            queries[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        out[name] = {"cold": runs[0], "warm_min": min(runs[1:]), "runs": runs}
        print(json.dumps({name: out[name]}))
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "noop": out}))
    spark.stop()


if __name__ == "__main__":
    main()
