"""Count-min sketch (operators/sketches.py): overcount-only bound,
merge-by-addition, determinism, and the DuckDB grid parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from rhealpixdggs_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
    cms_sql_parts,
)


@pytest.fixture(scope="module")
def toks(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    )


def _exact(toks):
    return {
        r["token"]: r["n"]
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }


class TestCountMin:
    def test_estimates_never_undercount(self, spark, toks):
        sketch = cms_build(toks, "token", depth=4, width=256)
        probes = toks.select("token").distinct()
        est = {
            r["token"]: r["est"]
            for r in cms_estimate(sketch, probes, "token", 4, 256).collect()
        }
        exact = _exact(toks)
        assert set(est) == set(exact)
        assert all(est[t] >= exact[t] for t in exact)

    def test_wide_grid_is_exact(self, spark, toks):
        # few distinct tokens + wide grid -> collisions vanish and the
        # estimate equals the exact count for every token
        n_distinct = toks.select("token").distinct().count()
        width = 1 << 16
        sketch = cms_build(toks, "token", depth=4, width=width)
        probes = toks.select("token").distinct()
        est = {
            r["token"]: r["est"]
            for r in cms_estimate(sketch, probes, "token", 4, width).collect()
        }
        exact = _exact(toks)
        assert n_distinct < width // 8
        assert est == exact

    def test_merge_equals_whole(self, spark, toks):
        half_a = toks.where(F.col("doc_id") % 2 == 0)
        half_b = toks.where(F.col("doc_id") % 2 == 1)
        merged = cms_merge(
            cms_build(half_a, "token", 4, 512), cms_build(half_b, "token", 4, 512)
        )
        whole = cms_build(toks, "token", 4, 512)
        as_map = lambda df: {  # noqa: E731
            (r["row"], r["bucket"]): r["cnt"] for r in df.collect()
        }
        assert as_map(merged) == as_map(whole)

    def test_grid_matches_duckdb(self, spark, toks, sf_dir):
        sketch = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_build(toks, "token", 4, 128, hash_fn="md5").collect()
        }
        bucket = cms_sql_parts(4, 128)["bucket"]
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = {
            (int(r[0]), int(r[1])): int(r[2])
            for r in con.sql(
                f"""
                WITH toks AS (
                    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
                    FROM documents WHERE len(trim(text)) > 0),
                rws(r) AS (VALUES (0), (1), (2), (3))
                SELECT r, {bucket('token', 'r')} AS bucket, COUNT(*)
                FROM toks, rws GROUP BY 1, 2
                """
            ).fetchall()
        }
        assert sketch == want

    def test_deterministic_across_partitionings(self, spark, toks):
        a = sorted(cms_build(toks.repartition(1), "token", 4, 512).collect())
        b = sorted(cms_build(toks.repartition(13), "token", 4, 512).collect())
        assert a == b
