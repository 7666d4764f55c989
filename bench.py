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


def _load1() -> float:
    """1-minute loadavg -- the bench's contamination telltale. BENCH_r05
    read 1.4-4.7x slower than r04 on code-untouched pure-SQL queries
    (external host load during the driver's run); recording load per
    phase makes such a run SELF-LABELING instead of masquerading as a
    regression."""
    try:
        return round(os.getloadavg()[0], 2)
    except (OSError, AttributeError):
        # non-POSIX fallback: report "unknown", never crash (Windows
        # has no os.getloadavg at all -- AttributeError, not OSError)
        return -1.0


def _cpu_ticks() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat. On a shared hypervisor
    the guest's loadavg CANNOT see a noisy sibling VM -- the only
    in-guest telltale is STEAL time (cycles the hypervisor gave to
    someone else while this vCPU was runnable). A phase whose steal
    share is high ran slow through no fault of the code."""
    try:
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:9]))
        return v[7], sum(v)
    except Exception:
        return -1, -1


def _steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    if before[0] < 0 or after[0] < 0 or after[1] <= before[1]:
        return -1.0
    return round(100.0 * (after[0] - before[0]) / (after[1] - before[1]), 2)

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


def timed_extraction(spark, runs: int = 3) -> tuple[list[float], int]:
    """All run wall-times (first = cold) and the row count. The cold
    number is what a fresh job pays (worker spawn + page cache); the
    driver's own measurement is cold, so the full spread is published
    to keep BENCH honest (cold jitters up to 2x run-to-run)."""
    from readabilityimproved_spark.operators.extract import extract_spans

    docs = spark.read.parquet(CORPUS)
    out = extract_spans(docs)
    times, n = [], 0
    for _ in range(1 + runs):
        t0 = time.time()
        n = out.count()
        times.append(round(time.time() - t0, 3))
    return times, n


def timed_pipeline(spark) -> tuple[float, int]:
    """Wall time for the FULL wave-checkpointed job (scan -> extract ->
    parquet write + lineage/metrics) -- evidences that the resumable
    pipeline machinery costs little over the raw operator."""
    import shutil
    import tempfile

    from readabilityimproved_spark.plans.pipeline import run_extraction, with_part

    # production layout: `part` is a stored parquet partition column, so
    # each wave's scan (and any resume) is partition-pruned; built once
    part_corpus = CORPUS + "_byparts"
    if not os.path.exists(os.path.join(part_corpus, "_SUCCESS")):
        docs = with_part(spark.read.parquet(CORPUS), 64)
        docs.repartition(64, "part").write.mode("overwrite").partitionBy(
            "part"
        ).parquet(part_corpus)

    out = tempfile.mkdtemp(prefix="bench_pipeline_")
    try:
        t0 = time.time()
        stats = run_extraction(
            spark, part_corpus, out, num_parts=64, waves=4, resume=False
        )
        return time.time() - t0, stats["docs"]
    finally:
        shutil.rmtree(out, ignore_errors=True)


def scale_phase(cores: int) -> None:
    # loadavg sampled at subprocess start: the main JVM is stopped
    # during the scaling phase, so this is the cleanest per-rep
    # external-load signal available
    load = _load1()
    spark = build(cores)
    ensure_corpus(spark)
    t0 = _cpu_ticks()
    times, n = timed_extraction(spark, runs=3)
    steal = _steal_pct(t0, _cpu_ticks())
    print(json.dumps(
        {"cores": cores, "sec": min(times), "docs": n, "load": load,
         "steal_pct": steal}
    ))
    spark.stop()


def run_pinned(cores: int) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "--phase", "scale",
           "--cores", str(cores)]
    try:
        # the cpuset/affinity ACTUALLY granted to this process, not
        # os.cpu_count(): under docker --cpuset-cpus or a CI cgroup the
        # host count over-reports, and pinning to a forbidden CPU makes
        # taskset fail -> empty stdout -> the bench dies on a parse
        allowed = sorted(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux: run unpinned
        allowed = []
    if shutil.which("taskset") and len(allowed) >= cores:
        # pin to the TOP of the allowed range: core 0 (and its
        # neighbors) service most IRQs and whatever background work the
        # host runs, which lands disproportionately on the 2-core
        # "small executor" when it is pinned to 0-1 and depresses
        # measured efficiency
        picked = allowed[-cores:]
        cmd = ["taskset", "-c", ",".join(map(str, picked))] + cmd
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
    # sampled BEFORE any JVM exists: at this instant the 1-min loadavg
    # is almost purely EXTERNAL work, the one clean contamination signal
    load_start = _load1()
    query_loads: dict[str, float] = {}

    # --- headline: full-width extraction + operator queries ---------------
    # every timing in `queries` is a COLD single run (what the driver's
    # own per-round measurement sees); warm best-of-3 goes in `warm`
    spark = build(CPUS)
    ensure_corpus(spark)
    query_steal: dict[str, float] = {}
    query_loads["q_extract_kernel"] = _load1()
    _t = _cpu_ticks()
    kernel_runs, n_full = timed_extraction(spark)
    query_steal["q_extract_kernel"] = _steal_pct(_t, _cpu_ticks())
    sec_cold, sec_full = kernel_runs[0], min(kernel_runs)
    timings["q_extract_kernel"] = round(sec_cold, 3)
    warm = {"q_extract_kernel": round(sec_full, 3)}

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
        "tpch_pricing_summary",
        "decontaminate",
        "layout_spans",
        "neardup_clusters",
    ):
        query_loads[f"q_{name}"] = _load1()
        _t = _cpu_ticks()
        t0 = time.time()
        queries[name](spark, SF_DIR).count()
        timings[f"q_{name}"] = round(time.time() - t0, 3)
        # warm = best of 2: single warm reps on this host swing 2-3x
        # inside one bench run (observed 3.6 s vs 12.9 s for the same
        # query minutes apart with <2% steal); one retry rejects the
        # transient window without hiding a real regression
        warm_reps = []
        for _ in range(2):
            t0 = time.time()
            queries[name](spark, SF_DIR).count()
            warm_reps.append(time.time() - t0)
        warm[f"q_{name}"] = round(min(warm_reps), 3)
        query_steal[f"q_{name}"] = _steal_pct(_t, _cpu_ticks())
    # pipeline phase LAST: its partitioned writes churn heap/page cache
    # and were inflating the cold first-run numbers of the queries above.
    # Repeated reps with the full spread published: the r3 driver run
    # measured this leg 28% below r2 while the in-round run was faster --
    # a single-shot number can't separate host jitter from regression.
    pipe_reps = max(1, int(os.environ.get("SPARK_GRAFT_PIPELINE_REPS", "3")))
    pipe_runs, pipe_loads, pipe_steal = [], [], []
    for i in range(pipe_reps):
        if i:
            time.sleep(2)
        pipe_loads.append(_load1())
        _t = _cpu_ticks()
        sec_i, pipe_docs = timed_pipeline(spark)
        pipe_steal.append(_steal_pct(_t, _cpu_ticks()))
        pipe_runs.append(round(sec_i, 3))
    import statistics as _st

    # same cold/warm discipline as the kernel phase: the FIRST pipeline
    # execution pays one-time codegen/JIT/page-cache costs (measured
    # ~1.5-2x); it is reported separately, the headline is the median
    # of the remaining (warm) reps
    pipe_cold = pipe_runs[0]
    pipe_sec = _st.median(pipe_runs[1:]) if len(pipe_runs) > 1 else pipe_runs[0]
    spark.stop()

    # --- scaling: pinned N=2 vs 4N=8 subprocesses, repeated for spread ----
    # (r2 measured a single-shot 0.869 after r1's 0.984 with no code
    # change; repetitions separate jitter from regression)
    import statistics

    reps = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "5")))
    eff_runs, thr_small, thr_large = [], 0.0, 0.0
    scale_loads = []
    # settle before the FIRST pinned pair: the full-width pipeline phase
    # just released ~CPUS worth of threads whose residue otherwise sits
    # on the pinned cores and depresses the 2-core run's throughput
    time.sleep(int(os.environ.get("SPARK_GRAFT_SCALE_SETTLE", "20")))
    for i in range(reps):
        if i:
            time.sleep(3)  # let the OS reclaim the previous JVM's pages
        small = run_pinned(SCALE_SMALL)
        large = run_pinned(SCALE_LARGE)
        scale_loads.append(
            {"small": small.get("load", -1.0), "large": large.get("load", -1.0),
             "steal_small": small.get("steal_pct", -1.0),
             "steal_large": large.get("steal_pct", -1.0)}
        )
        ts = small["docs"] / small["sec"]
        tl = large["docs"] / large["sec"]
        thr_small, thr_large = max(thr_small, ts), max(thr_large, tl)
        eff_runs.append(round((tl / ts) / (SCALE_LARGE / SCALE_SMALL), 3))
    eff_sorted = sorted(eff_runs)
    efficiency = round(statistics.median(eff_runs), 3)

    # --- load self-labeling (round-6 verdict item 1) -----------------------
    # thresholds: `start` is sampled before any JVM, so >0.3*cpus there is
    # unambiguous external work. Mid-bench samples include our OWN decaying
    # 1-min load, so their bars sit above what the bench itself can
    # generate: full-width phases can legitimately read ~cpus, the pinned
    # scaling pairs at most SCALE_LARGE (+ decay), hence +0.3*cpus headroom.
    flagged: list[str] = []
    if load_start / CPUS > 0.3:
        flagged.append(f"start loadavg {load_start} > 0.3x{CPUS} cores")
    for i, ld in enumerate(pipe_loads):
        if ld > CPUS * 1.25:
            flagged.append(f"pipeline rep {i} loadavg {ld} > 1.25x{CPUS}")
    for i, pair in enumerate(scale_loads):
        worst = max(pair["small"], pair["large"])
        # rep 0 still carries the bench's own decaying full-width load
        # in its 1-min sample (e^{-t/60} from ~CPUS), so its bar must
        # sit above that residue or a quiet host false-flags itself
        cap = max(SCALE_LARGE + 0.3 * CPUS, CPUS * 1.1) if i == 0 else (
            SCALE_LARGE + 0.3 * CPUS
        )
        if worst > cap:
            flagged.append(
                f"scaling rep {i} loadavg {worst} > {round(cap, 1)}"
            )
    # internal-consistency check, independent of loadavg: for unchanged
    # code a WARM run can never be much slower than its own cold run --
    # warm >> cold means something external ate the warm rep (a brief
    # contention window a 1-min loadavg sample can miss entirely)
    for name, cold_s in timings.items():
        if name in warm and cold_s > 0 and warm[name] > 1.5 * cold_s:
            flagged.append(
                f"{name} warm {warm[name]}s > 1.5x its cold {cold_s}s"
            )
    # hypervisor steal: invisible to loadavg, the usual culprit when the
    # whole bench reads uniformly slow on an "idle" guest
    _STEAL_BAR = 8.0
    for name, sp in query_steal.items():
        if sp > _STEAL_BAR:
            flagged.append(f"{name} ran at {sp}% CPU steal")
    for i, sp in enumerate(pipe_steal):
        if sp > _STEAL_BAR:
            flagged.append(f"pipeline rep {i} ran at {sp}% CPU steal")
    # the pinned phases use only `cores` of the host's CPUs, but
    # /proc/stat jiffies cover ALL of them -- steal concentrated on the
    # pinned cores is diluted by cores/ncpu (16x for the 2-core run),
    # so the full-width bar would essentially never trip for exactly
    # the phase the north-rule efficiency number depends on. Scale the
    # bar by the pinned fraction, floored at 1% (sub-percent global
    # steal is hypervisor housekeeping noise, observed ~0.02-0.05% on
    # a quiet host).
    host_cpus = os.cpu_count() or CPUS  # /proc/stat covers the HOST
    for i, pair in enumerate(scale_loads):
        for side, side_cores in (
            ("steal_small", SCALE_SMALL), ("steal_large", SCALE_LARGE)
        ):
            bar = max(1.0, _STEAL_BAR * side_cores / host_cpus)
            if pair[side] > bar:
                flagged.append(
                    f"scaling rep {i} ({side_cores}-core run) saw "
                    f"{pair[side]}% host-wide CPU steal > {round(bar, 1)}%"
                )
    if flagged:
        print(
            "[bench] WARNING: host load detected during this run -- "
            "timings are suspect: " + "; ".join(flagged),
            file=sys.stderr,
        )

    result = {
        "metric": "extraction_bench_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "warm": warm,
        "sf": SF,
        "bench_docs": N_DOCS,
        "docs_per_sec": round(n_full / sec_full, 1),
        "docs_per_sec_cold": round(n_full / sec_cold, 1),
        "kernel_runs_sec": kernel_runs,  # first = cold; spread is the jitter
        "pipeline": {
            "sec": round(pipe_sec, 3),
            "docs": pipe_docs,
            "docs_per_sec": round(pipe_docs / pipe_sec, 1),
            "cold_sec": pipe_cold,  # first run; headline = warm median
            "docs_per_sec_cold": round(pipe_docs / pipe_cold, 1),
            "runs_sec": pipe_runs,  # full spread published
            "docs_per_sec_best": round(pipe_docs / min(pipe_runs), 1),
            "includes": "wave checkpointing, parquet writes, lineage/metrics",
        },
        "scaling": {
            "proxy": "cpu-pinned subprocesses (taskset), N=2 vs 4N=8 cores",
            "cores_small": SCALE_SMALL,
            "cores_large": SCALE_LARGE,
            "docs_per_sec_small": round(thr_small, 1),
            "docs_per_sec_large": round(thr_large, 1),
            "efficiency": round(efficiency, 3),
            "efficiency_runs": eff_runs,
            "efficiency_min": eff_sorted[0],
            "efficiency_max": eff_sorted[-1],
            "full_width_cores": CPUS,
            "docs_per_sec_full_width": round(n_full / sec_full, 1),
        },
        "load": {
            "cpus": CPUS,
            "start": load_start,  # pre-JVM: purely external work
            "start_frac": round(load_start / CPUS, 3),
            "end": _load1(),
            "queries": query_loads,  # 1-min loadavg before each cold run
            "query_steal_pct": query_steal,  # hypervisor steal per query
            "pipeline_reps": pipe_loads,
            "pipeline_steal_pct": pipe_steal,
            "scaling_reps": scale_loads,  # sampled at subprocess start
            "flags": flagged,
            "contaminated": bool(flagged),
        },
    }
    print(json.dumps(result))
    if "--write-md" in sys.argv:
        write_md(result)


def write_md(result: dict) -> None:
    """Render BENCH/BASELINE.md FROM the measured JSON so the published
    table cannot drift from what the driver measures (VERDICT r1 #5)."""
    q, wm, sc = result["queries"], result["warm"], result["scaling"]
    rows = "\n".join(
        f"| {name} | {q[name]} | {wm.get(name, '--')} |" for name in sorted(q)
    )
    md = f"""# BENCH — measured baseline (generated by `python bench.py --write-md`)

Host: 32 physical cores (1 thread/core), 128 GiB, local[*] single-JVM.
Corpus: deterministic synth (sources/synth.py), {result['bench_docs']:,}
interleaved text+media documents at sf{result['sf']} (~1% giant docs), 64
round-robin parquet files so byte-based file splits spread giants
without a shuffle.

## Headline throughput (full extraction kernel, scan -> mapInPandas)

| config | docs/sec |
|---|---|
| local[{sc['full_width_cores']}] cold first run (what the driver measures) | **{result['docs_per_sec_cold']:,}** |
| local[{sc['full_width_cores']}] warm best-of-3 | {result['docs_per_sec']:,} |
| full wave-checkpointed pipeline, warm median of {max(len(result['pipeline'].get('runs_sec', [0])) - 1, 1)} reps (cold first run {result['pipeline'].get('cold_sec', '--')} s separate; full spread {result['pipeline'].get('runs_sec', '--')} s) | {result['pipeline']['docs_per_sec']:,} |

Kernel run spread this measurement (first = cold):
{result['kernel_runs_sec']} s. Host throughput jitters +/-15%
run-to-run (cold first runs up to 2x).

## Per-query timings (local[{sc['full_width_cores']}], sf{result['sf']})

| query | cold first run (s) | warm (s) |
|---|---|---|
{rows}

Total cold bench wall: **{result['value']} s**.

## Scaling efficiency (north rule: >=0.8 from N to 4N executors)

Sandbox proxy: identical job + identical input in **CPU-pinned
subprocesses** (`taskset`) — each pinned set gets a memory-bandwidth
share proportional to its size, which is what distinguishes "4N
executors on 4 hosts" from "4N threads on one host". (An un-pinned
8 -> 32 comparison on one box measures the host's RAM bandwidth: the
pure-Python multiprocessing ceiling here is itself ~0.80.)

| proxy | docs/sec |
|---|---|
| N = {sc['cores_small']} pinned cores (best of {len(sc['efficiency_runs'])} reps) | {sc['docs_per_sec_small']:,} |
| 4N = {sc['cores_large']} pinned cores (best of {len(sc['efficiency_runs'])} reps) | {sc['docs_per_sec_large']:,} |
| **efficiency (median of {len(sc['efficiency_runs'])} reps)** | **{sc['efficiency']}** (target >= 0.8; per-rep: {sc['efficiency_runs']}, min {sc['efficiency_min']}, max {sc['efficiency_max']}) |

## Host-load self-labeling

Every phase records the 1-min loadavg AND the hypervisor CPU-steal
share (`load` in the JSON; `start` loadavg is sampled before any JVM
exists, so it is purely external work — steal is the signal loadavg
cannot see: cycles a sibling VM took while this guest's vCPUs were
runnable). This run: start loadavg {result['load']['start']} /
{result['load']['cpus']} cores ({result['load']['start_frac']}), end
{result['load']['end']}, max query steal
{max(result['load']['query_steal_pct'].values())}%, max pipeline-rep
steal {max(result['load']['pipeline_steal_pct'])}%, contaminated =
**{result['load']['contaminated']}**{
    (' -- ' + '; '.join(result['load']['flags']))
    if result['load']['flags'] else ''
}. A contaminated run's timings are suspect and should be re-measured
on a quiet host rather than read as a regression (BENCH_r05 lesson).

## Plan-quality checks (`.explain("formatted")`, enforced by tests/test_plan_quality.py)

* flagship: parquet scan reads only `doc_id,text` (column pruning at the
  scan), page construction + explode in WholeStageCodegen, single
  MapInPandas, zero shuffles;
* extraction job: scan -> MapInPandas, no shuffle; skew handled by
  byte-based file splits (cost ~ bytes), hash/round-robin salting
  fallback for adversarial layouts;
* minhash LSH: signatures computed per-row (array_min over in-row gram
  hashes — no explode, no distinct, no shuffle before the fixed-width
  band-bucket table); hot buckets capped by a window count;
* similarity: query side broadcast, corpus side never shuffles before
  the final windowed top-k; near-dup candidates bounded by the
  per-bucket cap across 4 independent 16-bit hyperplane tables;
  k-means init is a distributed TakeOrderedAndProject (no global
  window over the sample);
* relational: star-join dims broadcast (2 BroadcastHashJoin, one
  aggregation exchange), Q1 ship-date predicate in PushedFilters with
  pruned ReadSchema, per-group top-k via the exact salted two-phase
  rank (no single-task group funnels);
* curation: decontamination broadcasts the benchmark gram table (the
  corpus never shuffles on gram keys); sequence packing windows per
  hash stream (no global sort); sampling/mixture/stratified/PII are
  pure narrow maps; inverted-index posting lists capped by a window
  count BEFORE collect_list; corpus stats partial-aggregate map-side
  behind one exchange (t-digest median by default);
* layout: reading order + furniture strip are built-in windows and
  per-doc aggregations sharing ONE doc_id exchange per query (pinned);
  no Python;
* clustering: Hash-Min + pointer jumping converges in O(log diameter)
  rounds, each round one edge join + one (node,label) groupBy with
  localCheckpointed lineage; convergence detected by the label-sum
  invariant (no compare join);
* incremental dedup: the persisted fingerprint index anti-joins on the
  fingerprint only -- document text never travels through the join
  (LeftAnti + LeftSemi pinned, never cartesian).

Reproduce: `python bench.py [--write-md]` (env: `SPARK_GRAFT_SF_DIR`,
`SPARK_GRAFT_CPUS`).
"""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
