"""Link-graph PageRank (operators/graph.py) and the interval-overlap
join (operators/temporal.py): correctness vs DuckDB twins, the
graph-construction invariants the integer arithmetic relies on, and
the plan shapes the 100-TB story claims."""

import duckdb
import pytest
from pyspark.sql import functions as F

from rhealpixdggs_spark.operators.graph import (
    UNIT,
    pagerank,
    pagerank_sql,
    synthetic_link_graph,
)
from rhealpixdggs_spark.operators.temporal import interval_overlap_join


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


class TestSyntheticLinkGraph:
    def test_no_self_loops_no_dangling(self, spark, docs):
        n = docs.count()
        edges = synthetic_link_graph(docs, n, hash_fn="md5")
        assert edges.where(F.col("src") == F.col("dst")).count() == 0
        # every node keeps outdeg >= 1 (the no-dangling guarantee the
        # pagerank teleport accounting depends on)
        assert edges.select("src").distinct().count() == n
        deg = edges.groupBy("src").count()
        mx = deg.agg(F.max("count")).first()[0]
        assert 1 <= mx <= 4

    def test_hash_paths_same_shape(self, spark, docs):
        n = docs.count()
        e_md5 = synthetic_link_graph(docs, n, hash_fn="md5")
        e_xx = synthetic_link_graph(docs, n, hash_fn="xxhash64")
        # different hashes give different graphs, same structural bounds
        for e in (e_md5, e_xx):
            assert e.where((F.col("dst") < 0) | (F.col("dst") >= n)).count() == 0


class TestPagerank:
    def test_bit_exact_vs_duckdb(self, spark, docs, sf_dir):
        n = docs.count()
        edges = synthetic_link_graph(docs, n, hash_fn="md5")
        nodes = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
        got = {
            r["doc_id"]: r["rank_q"]
            for r in pagerank(nodes, edges, iters=4, id_col="doc_id").collect()
        }
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = {
            int(r[0]): int(r[1])
            for r in con.sql(
                pagerank_sql("SELECT doc_id FROM documents", None, iters=4)
            ).fetchall()
        }
        assert got == want  # bit-exact, every node

    def test_mass_conserved_to_integer_remainders(self, spark, docs):
        n = docs.count()
        edges = synthetic_link_graph(docs, n, hash_fn="xxhash64")
        nodes = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
        total = (
            pagerank(nodes, edges, iters=3, id_col="doc_id")
            .agg(F.sum("rank_q"))
            .first()[0]
        )
        # integer division discards < outdeg units per node per
        # iteration; with outdeg <= 4 and the 17/20 damping div the
        # loss is < ~25 units per node per iteration
        assert n * UNIT - 25 * 3 * n <= total <= n * UNIT

    def test_rank_q_deterministic_across_partitionings(self, spark, docs):
        n = docs.count()
        nodes = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
        e1 = synthetic_link_graph(docs, n, hash_fn="xxhash64")
        a = sorted(
            pagerank(nodes.repartition(1), e1.repartition(2), iters=3,
                     id_col="doc_id").collect()
        )
        b = sorted(
            pagerank(nodes.repartition(7), e1.repartition(13), iters=3,
                     id_col="doc_id").collect()
        )
        assert a == b

    def test_plan_no_cartesian(self, spark, docs):
        n = docs.count()
        edges = synthetic_link_graph(docs, n, hash_fn="xxhash64")
        nodes = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
        plan = (
            pagerank(nodes, edges, iters=2, id_col="doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestIntervalOverlapJoin:
    def _fixture(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        iv = ev.where(F.col("event_id") % 97 == 0).select(
            F.col("event_id").alias("interval_id"),
            F.col("ts").alias("start_ts"),
            (
                F.col("ts")
                + F.expr(
                    "make_interval(0,0,0,0,0,cast(1 + event_id % 7 as int),0)"
                )
            ).alias("end_ts"),
        )
        return ev, iv

    def _brute(self, ev, iv):
        return set(
            (r["interval_id"], r["event_id"])
            for r in ev.join(
                iv,
                F.col("ts").between(F.col("start_ts"), F.col("end_ts")),
            ).select("interval_id", "event_id").collect()
        )

    def test_matches_brute_force(self, spark, sf_dir):
        ev, iv = self._fixture(spark, sf_dir)
        got = set(
            (r["interval_id"], r["event_id"])
            for r in interval_overlap_join(ev, iv)
            .select("interval_id", "event_id")
            .collect()
        )
        assert got == self._brute(ev, iv)
        assert len(got) > 0

    def test_small_pinned_width_still_exact(self, spark, sf_dir):
        # a width far below max interval length only lengthens the
        # bucket sequences; pair set is unchanged and still unique
        ev, iv = self._fixture(spark, sf_dir)
        out = interval_overlap_join(ev, iv, bucket_width=30.0).select(
            "interval_id", "event_id"
        )
        rows = [(r["interval_id"], r["event_id"]) for r in out.collect()]
        assert len(rows) == len(set(rows))  # no duplicate pairs
        assert set(rows) == self._brute(ev, iv)

    def test_numeric_columns(self, spark):
        ev = spark.createDataFrame(
            [(i, float(i)) for i in range(100)], ["event_id", "ts"]
        )
        iv = spark.createDataFrame(
            [(0, 10.0, 20.0), (1, 15.0, 15.0), (2, 90.5, 99.5)],
            ["interval_id", "start_ts", "end_ts"],
        )
        got = sorted(
            (r["interval_id"], r["event_id"])
            for r in interval_overlap_join(ev, iv).collect()
        )
        want = sorted(
            [(0, i) for i in range(10, 21)]
            + [(1, 15)]
            + [(2, i) for i in range(91, 100)]
        )
        assert got == want

    def test_plan_is_equi_join(self, spark, sf_dir):
        ev, iv = self._fixture(spark, sf_dir)
        plan = (
            interval_overlap_join(ev, iv)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
