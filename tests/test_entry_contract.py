"""Emulates the driver's correctness gate: every queries() entry runs on
Spark, and where an oracle_sql() entry exists its DuckDB result must
match value-for-value (order-insensitive, column-name-sorted)."""

import importlib.util
import math
import sys

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["spark_entry"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, stringify."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.9g}"
        return str(v)

    return sorted(tuple(cell(row[i]) for i in order) for row in rows)


def test_entry_smoke(spark, entry_mod):
    df = entry_mod.entry(spark)
    rows = df.limit(10).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "kind", "text", "media_ref", "span_offset"}


def test_all_queries_run_and_match_oracles(spark, entry_mod, duck):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(queries)
    failures = []
    for name, fn in queries.items():
        sdf = fn(spark, SF_DIR)
        spark_rows = [tuple(r) for r in sdf.collect()]
        assert spark_rows is not None, name
        if name not in oracles:
            # rows-only check: stable schema, no exceptions
            assert len(sdf.columns) > 0, name
            continue
        rel = duck.sql(oracles[name])
        duck_rows = rel.fetchall()
        duck_cols = [d[0] for d in rel.description]
        a = canon(spark_rows, sdf.columns)
        b = canon(duck_rows, duck_cols)
        if len(a) != len(b):
            failures.append(f"{name}: row count {len(a)} vs {len(b)}")
        elif a != b:
            diff = next(
                (i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y
            )
            failures.append(f"{name}: first diff at {diff}")
    assert not failures, "\n".join(failures)


def test_every_query_is_oracle_checked(entry_mod):
    """All contract queries currently have a DuckDB oracle — the strong
    (rows+schema+hash) driver check. A new operator that is genuinely
    non-SQL-expressible must be added to the allowlist here explicitly,
    so weaker rows-only coverage is always a recorded decision, never
    an oversight."""
    rows_only_allowlist = set()  # nothing exempted as of round 6
    missing = set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    assert missing <= rows_only_allowlist, (
        f"queries without an oracle_sql entry: {sorted(missing)}"
    )
