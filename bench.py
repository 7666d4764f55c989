#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: documents/sec through the full extraction kernel over a
deterministic synth corpus sized to the scale factor (BASELINE.json).

Scaling evidence (north rule: >=0.8 efficiency from N to 4N executors):
a single box cannot emulate 4 separate machines at full width -- 32
local threads share one memory subsystem, and the pure-Python ceiling
measured on this host is itself ~0.80 from 8->32 procs. The faithful
executor proxy is therefore CPU-PINNED subprocesses at N=2 and 4N=8
cores (each pinned set gets a bandwidth share proportional to its size,
like real executors on separate hosts): efficiency =
(thr_8cpu / thr_2cpu) / 4. The unpinned full-width throughput is also
reported. Details: BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
N_DOCS = max(int(200_000 * SF), 1_000)
CORPUS = os.environ.get(
    "SPARK_GRAFT_BENCH_CORPUS", f"/tmp/bench_corpus_v2_{N_DOCS}"
)
SCALE_SMALL, SCALE_LARGE = 2, 8
_BENCH_FILES = 64  # round-robin files: giants spread evenly across splits

_EXTRACT_CONF = {
    # byte-based file splits ARE the skew handling for the shuffle-free
    # scan->map plan: extraction cost ~ bytes, so small splits spread
    # giant documents across tasks without any repartition
    "spark.sql.files.maxPartitionBytes": str(512 * 1024),
    "spark.sql.files.openCostInBytes": "16384",
}


def build(cores: int):
    from readabilityimproved_spark.plans.session import build_session

    return build_session(
        app_name=f"bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf=_EXTRACT_CONF,
    )


def ensure_corpus(spark) -> None:
    from readabilityimproved_spark.sources.synth import synth_corpus_df

    if not os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        df = synth_corpus_df(spark, N_DOCS, num_slices=_BENCH_FILES)
        df.repartition(_BENCH_FILES).write.mode("overwrite").parquet(CORPUS)


def timed_extraction(spark, runs: int = 3) -> tuple[float, int]:
    """Best-of-runs wall time for the scan->mapInPandas extraction."""
    from readabilityimproved_spark.operators.extract import extract_spans

    docs = spark.read.parquet(CORPUS)
    out = extract_spans(docs)
    n = out.count()  # warm python workers + page cache
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        out.count()
        best = min(best, time.time() - t0)
    return best, n


def scale_phase(cores: int) -> None:
    spark = build(cores)
    ensure_corpus(spark)
    sec, n = timed_extraction(spark)
    print(json.dumps({"cores": cores, "sec": sec, "docs": n}))
    spark.stop()


def run_pinned(cores: int) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--phase", "scale",
           "--cores", str(cores)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    env = {**os.environ, "PYTHONPATH": os.path.dirname(os.path.abspath(__file__))}
    out = subprocess.run(cmd, capture_output=True, text=True, env=env)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    if "--phase" in sys.argv:
        scale_phase(int(sys.argv[sys.argv.index("--cores") + 1]))
        return

    import importlib.util

    timings: dict[str, float] = {}

    # --- headline: full-width extraction + operator queries ---------------
    spark = build(CPUS)
    ensure_corpus(spark)
    sec_full, n_full = timed_extraction(spark)
    timings["q_extract_kernel"] = round(sec_full, 3)

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(os.path.dirname(__file__), "__spark_entry__.py")
    )
    entry_mod = importlib.util.module_from_spec(spec)
    sys.modules["spark_entry"] = entry_mod
    spec.loader.exec_module(entry_mod)
    queries = entry_mod.queries()
    for name in (
        "extract_article_spans",
        "minhash_lsh",
        "similarity_topk",
        "quality_score",
        "date_from_url",
    ):
        t0 = time.time()
        queries[name](spark, SF_DIR).count()
        timings[f"q_{name}"] = round(time.time() - t0, 3)
    spark.stop()

    # --- scaling: pinned N=2 vs 4N=8 subprocesses --------------------------
    small = run_pinned(SCALE_SMALL)
    large = run_pinned(SCALE_LARGE)
    thr_small = small["docs"] / small["sec"]
    thr_large = large["docs"] / large["sec"]
    efficiency = (thr_large / thr_small) / (SCALE_LARGE / SCALE_SMALL)

    result = {
        "metric": "extraction_bench_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        "bench_docs": N_DOCS,
        "docs_per_sec": round(n_full / sec_full, 1),
        "scaling": {
            "proxy": "cpu-pinned subprocesses (taskset), N=2 vs 4N=8 cores",
            "cores_small": SCALE_SMALL,
            "cores_large": SCALE_LARGE,
            "docs_per_sec_small": round(thr_small, 1),
            "docs_per_sec_large": round(thr_large, 1),
            "efficiency": round(efficiency, 3),
            "full_width_cores": CPUS,
            "docs_per_sec_full_width": round(n_full / sec_full, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
