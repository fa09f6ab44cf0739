"""Pure-SQL oracle twins vs the NumPy kernels, bit-for-bit, no Spark.

The round-4 oracles re-derive the S2 and hex7 encoders in DuckDB SQL
(oracle_sql.s2_tokens_sql / hex7_tokens_sql). Everything in those
pipelines except libm trig is single-IEEE-op arithmetic, so bitwise
equality over a large lattice sweep is the designed behavior, not a
tolerance: these tests pin it at 60k/20k points (the sweeps the
docstrings cite). The PPM byte-math twin is pinned the same way.
"""

import duckdb
import numpy as np
import pytest

from rhealpixdggs_spark.kernel import hex7, s2
from rhealpixdggs_spark.oracle_sql import hex7_tokens_sql, s2_tokens_sql


def _lattice(n: int):
    k = np.arange(1, n + 1, dtype=np.int64)
    lon = ((k * 9973) % 360000) / 1000.0 - 180.0
    lat = ((k * 7919) % 178000) / 1000.0 - 89.0
    return k, lon, lat


def _src(n: int) -> str:
    return (
        "SELECT k AS pid, "
        "((k * 9973) % 360000) / 1000.0 - 180.0 AS lon, "
        "((k * 7919) % 178000) / 1000.0 - 89.0 AS lat "
        f"FROM range(1, {n + 1}) t(k)"
    )


class TestS2SqlTwin:
    def test_bit_exact_sweep_60k(self):
        n = 60_000
        k, lon, lat = _lattice(n)
        res = (
            duckdb.connect()
            .execute(f"SELECT * FROM ({s2_tokens_sql(_src(n))}) ORDER BY pid")
            .fetchnumpy()
        )
        leaf = s2.cell_id_from_lonlat(lon, lat)
        assert np.array_equal(res["s2_l12"], s2.token(s2.parent(leaf, 12)))
        assert np.array_equal(res["s2_l2"], s2.token(s2.parent(leaf, 2)))

    def test_face_edge_midpoints(self):
        # (1,0,0)-style axis points sit exactly on cube-face edges: the
        # SQL argmax tie-break must match np.where's branch order.
        lon = np.array([0.0, 90.0, 180.0, -90.0, 45.0, -45.0])
        lat = np.array([0.0, 0.0, 0.0, 0.0, 45.0, -45.0])
        n = len(lon)
        src = (
            "SELECT k AS pid, v[k+1][1] AS lon, v[k+1][2] AS lat FROM "
            f"(SELECT [{', '.join(f'[{a}::DOUBLE, {b}::DOUBLE]' for a, b in zip(lon, lat))}] AS v), "
            f"range({n}) t(k)"
        )
        res = (
            duckdb.connect()
            .execute(f"SELECT * FROM ({s2_tokens_sql(src)}) ORDER BY pid")
            .fetchnumpy()
        )
        leaf = s2.cell_id_from_lonlat(lon, lat)
        assert np.array_equal(res["s2_l12"], s2.token(s2.parent(leaf, 12)))


class TestHex7SqlTwin:
    @pytest.mark.parametrize("res", [2, 9])
    def test_bit_exact_sweep_20k(self, res):
        n = 20_000
        k, lon, lat = _lattice(n)
        out = (
            duckdb.connect()
            .execute(
                f"SELECT * FROM ({hex7_tokens_sql(_src(n), res)}) ORDER BY pid"
            )
            .fetchnumpy()
        )
        ids = hex7.encode(lon, lat, res)
        assert np.array_equal(out["hex7_tok"], hex7.token(ids))
        assert np.array_equal(out["hex7_l2"], hex7.token(hex7.parent(ids, 2)))


class TestPpmByteMathTwin:
    def test_mean_matches_decoder(self):
        from rhealpixdggs_spark.operators.multimodal import encode_ppm, parse_ppm

        ids = np.array([0, 1, 5, 123, 4999, 99999], dtype=np.int64)
        w, h = ids % 64 + 1, ids % 48 + 1
        rows = duckdb.connect().execute(
            """
            WITH d AS (SELECT unnest(?::BIGINT[]) AS doc_id),
            dd AS (SELECT doc_id, doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h
                   FROM d)
            SELECT doc_id,
              CAST(SUM((doc_id*31 + 7*k) % 256) AS BIGINT) AS s, w*h*3 AS n
            FROM dd, range(9216) t(k) WHERE k < w*h*3
            GROUP BY doc_id, w, h ORDER BY doc_id
            """,
            [ids.tolist()],
        ).fetchall()
        for (doc_id, s, n), buf in zip(rows, encode_ppm(ids, w, h)):
            pw, ph, px = parse_ppm(buf)
            assert pw * ph * 3 == n
            assert int(px.sum(dtype=np.int64)) == s
            assert int(px.sum(dtype=np.int64)) / px.size == s / n
