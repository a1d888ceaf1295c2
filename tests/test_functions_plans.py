"""Column-function library + plan-hygiene tests: the scale behaviors we
rely on (pushdown, pruning, codegen, broadcast) must be visible in the
physical plan."""

import math

import pytest
from pyspark.sql import functions as F

from compressed_vec_spark import functions as cvf
from compressed_vec_spark import plans
from compressed_vec_spark.spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    s = get_spark("cvx-plans-tests", cores=4)
    yield s
    s.stop()


def test_url_host(spark):
    df = spark.createDataFrame([("https://a.example.com/x/y",)], ["url"])
    assert df.select(cvf.url_host("url").alias("h")).first()["h"] == "a.example.com"


def test_cosine_similarity_column(spark):
    df = spark.createDataFrame([([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
                               ["a", "b"])
    got = [r["c"] for r in df.select(cvf.cosine_similarity(F.col("a"), F.col("b"))
                                     .alias("c")).collect()]
    assert math.isclose(got[0], 1.0) and math.isclose(got[1], 0.0)


def test_char_shingles(spark):
    df = spark.createDataFrame([("abcdef",)], ["t"])
    got = df.select(cvf.char_shingles(F.col("t"), 5).alias("s")).first()["s"]
    assert got == ["abcde", "bcdef"]


def test_filter_pushdown_reaches_parquet(spark):
    df = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
          .where(F.col("l_linenumber") == 3).select("l_orderkey"))
    assert plans.has_pushed_filters(df, "l_linenumber")
    # column pruning: the scan must not read all 11 columns
    cols = plans.read_schema_columns(df)
    assert 0 < len(cols) <= 2, cols


def test_wholestage_codegen_on_function_library(spark):
    df = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
          .select(cvf.token_count(F.col("text")).alias("n"))
          .groupBy().sum("n"))
    df.collect()  # AQE: codegen spans appear only in the final plan
    assert plans.wholestage_codegen_spans(df) >= 1


def test_small_dim_join_broadcasts(spark):
    fact = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    dim = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    j = fact.join(F.broadcast(dim), fact.o_custkey == dim.c_custkey) \
        .groupBy("c_nationkey").count()
    assert plans.uses_broadcast_join(j)


def test_duplicate_span_gram_pass_is_pipelined_and_deterministic(spark):
    """The r6 optimization removed the gram-table localCheckpoint: both
    consumers (global df count + cov join) regenerate the grams inside
    one pipelined DAG.  Two contracts follow: the plan must carry the
    two MapInPandas gram subtrees with NO checkpoint RDD scan, and the
    recomputed passes must be deterministic (identical results across
    invocations — the same property that makes task retries safe)."""
    from compressed_vec_spark.spark import queries as q

    df = q.duplicate_span_removal(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan, "checkpoint crept back in"
    assert plan.count("MapInPandas") >= 2, plan[:500]

    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, q.duplicate_span_removal(spark, SF_DIR).collect()))
    assert a == b and len(a) > 0
