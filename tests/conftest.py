import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .appName("xapian_spark_tests")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def simpledata_index(spark):
    """apitest_simpledata indexed with the harness scheme (shared)."""
    from xapian_spark.index.build import build_index
    from xapian_spark.io.apitest import corpus_df

    docs = corpus_df(spark, "apitest_simpledata")
    idx = build_index(docs, text_col="data", analyzer="apitest")
    idx.postings = idx.postings.persist()
    return idx
