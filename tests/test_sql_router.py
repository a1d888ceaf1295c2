"""Plain-SQL entry into the pruned storage paths (sources/sql_router):
supported shapes route to compressed kernels with chunk pruning,
everything else falls back to the decoded view, and both paths agree
with spark.sql ground truth — including on stores with live deletes."""

import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from compressed_vec_spark.sources import encoded_table, sql_router
from compressed_vec_spark.spark import delete_job, encode_job
from compressed_vec_spark.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("cvx-test-sqlrouter", cores=4, chunk_rows=500)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def store(spark):
    rng = np.random.default_rng(3)
    n = 4000
    pdf = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64),
        "grp": (np.arange(n, dtype=np.int64) * 13) % 20,
        "lang": np.array(["en", "de", "fr", "zh", "pt"])[
            rng.integers(0, 5, n)],
        "score": rng.random(n)})
    out = tempfile.mkdtemp(prefix="cvx_sqlr_")
    df = (spark.createDataFrame(pdf)
          .repartitionByRange(4, "k").sortWithinPartitions("k"))
    encode_job.encode_table(spark, df, out, url_col=None, resume=False,
                            codec_overrides={"lang": "dict"})
    encoded_table.register_encoded_table(spark, out, "enc_t")
    return out, pdf


ROUTED = [
    "SELECT count(*) AS c FROM enc_t WHERE k = 1234",
    "SELECT count(*) AS c FROM enc_t WHERE k BETWEEN 100 AND 900",
    "SELECT count(*) AS c FROM enc_t WHERE k > 3500",
    "SELECT count(*) AS c FROM enc_t WHERE k >= 100 AND k < 250",
    "SELECT count(*) AS c FROM enc_t WHERE lang = 'de'",
    "SELECT count(*) AS c FROM enc_t WHERE lang IN ('en','fr')",
    "SELECT count(*) AS c FROM enc_t WHERE lang LIKE 'd%'",
    "SELECT count(*) AS c FROM enc_t WHERE grp IN (3, 7, 11)",
    "SELECT count(*) AS c FROM enc_t WHERE score BETWEEN 0.25 AND 0.5",
    "SELECT count(*) AS c FROM enc_t WHERE k BETWEEN 500 AND 600 AND grp = 4",
    "SELECT count(*) AS c FROM enc_t WHERE lang BETWEEN 'de' AND 'fr'",
    "select COUNT(*) as c from enc_t where 100 <= k and k <= 900",
]
FALLBACK = [
    "SELECT count(*) AS c FROM enc_t WHERE k % 2 = 0",
    "SELECT count(*) AS c FROM enc_t WHERE lang = 'de' OR lang = 'fr'",
    "SELECT count(*) AS c FROM enc_t WHERE lang > 'de'",      # str strict
    "SELECT count(*) AS c FROM enc_t WHERE score > 0.9",      # flt strict
    "SELECT count(*) AS c FROM enc_t WHERE lang LIKE '%de%'",  # not prefix
    "SELECT count(*) AS c FROM enc_t",                         # no WHERE...
]


@pytest.mark.parametrize("sql", ROUTED)
def test_routed_shapes_match_sparksql(spark, store, sql):
    out, _ = store
    got, st = sql_router.route_sql_count(spark, out, sql, view="enc_t")
    assert st["routed"] is True, st
    assert "pruned_chunks" in st or "scanned_chunks" in st
    assert got.collect()[0][0] == spark.sql(sql).collect()[0][0]
    assert got.columns == spark.sql(sql).columns  # alias preserved


@pytest.mark.parametrize("sql", FALLBACK[:-1])
def test_fallback_shapes_match_sparksql(spark, store, sql):
    out, _ = store
    got, st = sql_router.route_sql_count(spark, out, sql, view="enc_t")
    assert st["routed"] is False
    assert got.collect()[0][0] == spark.sql(sql).collect()[0][0]


def test_no_where_routes_or_falls_back_consistently(spark, store):
    out, _ = store
    sql = FALLBACK[-1]
    got, _ = sql_router.route_sql_count(spark, out, sql, view="enc_t")
    assert got.collect()[0][0] == 4000


def test_sorted_layout_actually_prunes(spark, store):
    out, _ = store
    _, st = sql_router.route_sql_count(
        spark, out, "SELECT count(*) AS c FROM enc_t WHERE k BETWEEN 100"
        " AND 900", view="enc_t")
    assert st["routed"] and st["pruned_chunks"] > 0, st


def test_view_mismatch_falls_back(spark, store):
    out, _ = store
    spark.sql("SELECT 1").collect()
    _, st = sql_router.route_sql_count(
        spark, out, "SELECT count(*) AS c FROM enc_t WHERE k = 5",
        view="some_other_view")
    assert st["routed"] is False


AGG_ROUTED = [
    "SELECT count(*) AS c FROM enc_t",
    "SELECT count(lang) AS c FROM enc_t",
    "SELECT count(*) AS c FROM enc_t WHERE lang IS NULL",
    "SELECT count(*) AS c FROM enc_t WHERE lang IS NOT NULL",
    "SELECT sum(grp) AS s FROM enc_t",
    "SELECT min(k) AS mn, max(k) AS mx, count(*) AS c FROM enc_t",
    "SELECT sum(grp) AS s FROM enc_t WHERE k BETWEEN 100 AND 900",
    "SELECT sum(grp) AS s FROM enc_t WHERE k < 700",
]
AGG_FALLBACK = [
    "SELECT avg(grp) AS a FROM enc_t",            # no avg kernel
    "SELECT min(lang) AS m FROM enc_t",           # string min/max
    "SELECT count(DISTINCT grp) AS c FROM enc_t",  # distinct
    "SELECT sum(grp) AS s FROM enc_t WHERE lang = 'de'",  # pred shape
]


@pytest.mark.parametrize("sql", AGG_ROUTED)
def test_aggregate_pushdown_matches_sparksql(spark, store, sql):
    out, _ = store
    got, st = sql_router.route_sql_count(spark, out, sql, view="enc_t")
    assert st["routed"] is True, (sql, st)
    g, w = list(got.collect()[0]), list(spark.sql(sql).collect()[0])
    assert [int(x) for x in g] == [int(x) for x in w], sql
    assert got.columns == spark.sql(sql).columns


@pytest.mark.parametrize("sql", AGG_FALLBACK)
def test_aggregate_fallback_matches_sparksql(spark, store, sql):
    out, _ = store
    got, st = sql_router.route_sql_count(spark, out, sql, view="enc_t")
    assert st["routed"] is False
    assert [str(x) for x in got.collect()[0]] \
        == [str(x) for x in spark.sql(sql).collect()[0]]


def test_routed_respects_deletes(spark, store):
    """The kernels apply committed position deletes, so the routed
    answer must track them exactly (the decoded view applies them
    too — both sides move together)."""
    out, pdf = store
    delete_job.delete_where_equals(spark, out, "lang", "zh", "sqld1")
    for sql in ("SELECT count(*) AS c FROM enc_t WHERE lang = 'zh'",
                "SELECT count(*) AS c FROM enc_t WHERE lang IN ('zh','pt')",
                "SELECT count(*) AS c FROM enc_t WHERE k BETWEEN 0 AND 3999",
                "SELECT count(*) AS c FROM enc_t",
                "SELECT count(lang) AS c FROM enc_t",
                "SELECT sum(grp) AS s FROM enc_t"):
        got, st = sql_router.route_sql_count(spark, out, sql, view="enc_t")
        assert st["routed"] is True
        # re-register: the old temp view captured the pre-delete scan
        encoded_table.register_encoded_table(spark, out, "enc_t_live")
        want = spark.sql(sql.replace("enc_t", "enc_t_live")).collect()[0][0]
        assert got.collect()[0][0] == want, sql
    # manifest min/max is only a BOUND under live deletes: refuse the
    # metadata answer and fall back to the (correct) decoded view
    got, st = sql_router.route_sql_count(
        spark, out, "SELECT min(k) AS mn FROM enc_t", view="enc_t")
    assert st["routed"] is False
    assert got.collect()[0][0] == 0
