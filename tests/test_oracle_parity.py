"""Replicates the driver's correctness gate locally: run every queries()
entry on Spark AND its oracle_sql() on DuckDB over the same parquet,
compare row count, column names/types and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_normalize(x) for x in v)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_normalize(r[i]) for i in order) for r in rows
    )


ORACLE_NAMES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, ddb, sf_dir, name):
    q = entrymod.queries()[name]
    sdf = q(spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.sql(entrymod.oracle_sql()[name])
    dcols = [c.lower() for c in res.columns]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} vs {len(drows)}"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    mismatches = [
        (a, b) for a, b in zip(sset, dset) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "lang" in df.columns


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_minhash_modes_agree_on_guaranteed_recall(spark, sf_dir):
    """Production (xxh64) and oracle (md5) LSH must BOTH pair every doc
    with its exact copy — identical texts have identical signatures in any
    hash mode, so the copy-pair set is mode-invariant."""
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    both = docs.unionByName(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    from playwrightcrawler_spark.operators import dedup

    for mode in ("xxh64", "md5"):
        sig = dedup.minhash_signatures(both, hash_mode=mode)
        pairs = {
            (r.id_a, r.id_b)
            for r in dedup.lsh_candidate_pairs(sig, hash_mode=mode).collect()
        }
        missing = [i for i in ids if (i, i + 1_000_000) not in pairs]
        assert not missing, (mode, missing[:5])


def test_pages_extract_invariant(spark, sf_dir):
    """Every html fixture page must extract byte-identically."""
    row = entrymod.queries()["pages_extract"](spark, sf_dir).first()
    assert row.n_pages > 10
    assert row.mismatches == 0
