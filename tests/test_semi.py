"""Referenced-id semi-join + skip-elevation propagation tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from ot_spark import semi
from ot_spark.synth import LINK_ACCEPTED_MODS, LINK_SKIP_ELE_MODS


def test_filter_referenced_matches_python_rederivation(spark, pages, links):
    out = semi.filter_referenced(pages, links)
    got = {r.url for r in out.select("url").collect()}
    link_rows = links.select("link_id", "refs").collect()
    want = set()
    for r in link_rows:
        if r.link_id % 8 in LINK_ACCEPTED_MODS:
            want.update(r.refs)
    page_urls = {r.url for r in pages.select("url").collect()}
    assert got == (want & page_urls)
    assert 0 < len(got) < pages.count()


def test_semi_join_no_duplicates(spark, pages, links):
    out = semi.filter_referenced(pages, links)
    assert out.count() == out.select("url").distinct().count()


def test_skip_elevation_condition(spark):
    df = spark.createDataFrame(
        [
            (0, {"bridge": "yes"}),
            (1, {"bridge": "no"}),       # value == "no" -> NOT skipped
            (2, {"tunnel": "culvert"}),
            (3, {"highway": "x"}),
            (4, {"indoor": "yes", "bridge": "no"}),
            (5, {}),
        ],
        "id int, attrs map<string,string>",
    )
    got = {
        r.id
        for r in df.where(semi.skip_elevation_condition(F.col("attrs"))).collect()
    }
    assert got == {0, 2, 4}


def test_no_elevation_flag_propagation(spark, pages, links):
    flagged = semi.with_no_elevation_flag(pages, links)
    got = {r.url for r in flagged.where("no_elevation").select("url").collect()}
    link_rows = links.select("link_id", "refs").collect()
    want = set()
    for r in link_rows:
        if r.link_id % 8 in LINK_SKIP_ELE_MODS:
            want.update(r.refs)
    page_urls = {r.url for r in pages.select("url").collect()}
    assert got == (want & page_urls)
    # flag never drops rows
    assert flagged.count() == pages.count()
