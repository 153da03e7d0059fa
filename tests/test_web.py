"""URL parse / canonicalize / domain-quota operators (operators/web.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kissmetrics_to_database_spark.operators import web


def _one(spark, url):
    df = spark.createDataFrame([(0, url)], ["doc_id", "url"])
    return web.canonicalize_urls(df).collect()[0]


def test_canonicalize_lowercases_and_strips_default_port(spark):
    r = _one(spark, "HTTPS://WWW.Example.COM:443/Path/X?b=2&a=1#frag")
    assert r["url_canonical"] == "https://www.example.com/Path/X?a=1&b=2"
    assert r["registered_domain"] == "example.com"


def test_canonicalize_keeps_explicit_port(spark):
    r = _one(spark, "http://example.com:8080")
    assert r["url_canonical"] == "http://example.com:8080/"


def test_tracking_params_removed_entirely(spark):
    r = _one(spark, "https://a.example.net/p?utm_source=x&gclid=1&fbclid=2&ref=z")
    assert r["url_canonical"] == "https://a.example.net/p"


def test_multi_part_public_suffix(spark):
    r = _one(spark, "https://news.bbc.co.uk/story")
    assert r["registered_domain"] == "bbc.co.uk"
    r = _one(spark, "https://sub.shop.example.com.au/x")
    assert r["registered_domain"] == "example.com.au"


def test_single_label_host(spark):
    r = _one(spark, "http://localhost/x")
    assert r["registered_domain"] == "localhost"
    assert r["url_canonical"] == "http://localhost/x"


def test_unparseable_url_quarantines_to_empty(spark):
    r = _one(spark, "not a url at all")
    assert r["scheme"] == "" and r["host"] == ""


def test_domain_quota_cap_deterministic(spark):
    rows = [(i, f"https://d{i % 3}.example.org/{i}") for i in range(30)]
    df = web.canonicalize_urls(
        spark.createDataFrame(rows, ["doc_id", "url"])
    )
    out = {
        r["registered_domain"]: (r["n_docs"], r["n_kept"])
        for r in web.domain_quota_cap(df, cap=5).collect()
    }
    assert out == {"example.org": (30, 5)}
    # determinism: same result on a different partitioning
    out2 = {
        r["registered_domain"]: (r["n_docs"], r["n_kept"])
        for r in web.domain_quota_cap(df.repartition(7), cap=5).collect()
    }
    assert out == out2
