"""Domain-level curation (operators/textstats url_host / filter_domains
/ domain_stats): host extraction edge cases, both gate modes, broadcast
plan shape, hand-valued rollups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from torcharrow_spark.operators import domain_stats, filter_domains, url_host


def test_url_host_extraction(spark):
    cases = [
        ("https://WWW.Example.COM/path?q=1", "example.com"),
        ("http://sub.site.org/a#frag", "sub.site.org"),
        ("ftp://files.host.net/x", "files.host.net"),
        ("no-scheme.com/path", "no-scheme.com"),
        ("www.bare.io", "bare.io"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(url_host("url")).collect()]
    assert got == [h for _, h in cases]


def test_filter_domains_block_and_allow(spark):
    rows = [
        (0, "https://bad.com/a"),
        (1, "https://www.bad.com/b"),   # www-variant of a listed host
        (2, "https://good.org/c"),
        (3, None),                       # url-less rows survive a blocklist
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    blocked = filter_domains(df, ["bad.com"], mode="block")
    assert sorted(r.doc_id for r in blocked.collect()) == [2, 3]
    allowed = filter_domains(df, ["bad.com"], mode="allow")
    assert sorted(r.doc_id for r in allowed.collect()) == [0, 1]
    with pytest.raises(ValueError):
        filter_domains(df, ["x"], mode="drop")
    # the gate is a BROADCAST join: the corpus side must not shuffle
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_filter_domains_not_bypassed_by_port_or_userinfo(spark):
    rows = [
        (0, "https://spam.example.com:443/x"),
        (1, "https://user@spam.example.com/y"),
        (2, "https://user:pw@spam.example.com:8080/z"),
        (3, "https://ok.example.com:8080/fine"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(
        r.doc_id
        for r in filter_domains(df, ["spam.example.com"], mode="block").collect()
    )
    assert kept == [3]
    # blocklist entries written WITH a www. prefix still gate
    df2 = spark.createDataFrame([(0, "https://spam.com/a")], "doc_id long, url string")
    assert filter_domains(df2, ["WWW.Spam.com"], mode="block").count() == 0
    # ...and the report key matches the gate key
    assert (
        domain_stats(df).where(F.col("domain") == "spam.example.com").collect()[0]
        .n_docs == 3
    )


def test_domain_stats_hand_values(spark):
    rows = [
        (0, "https://a.com/1", "xxxx", "en"),
        (1, "https://www.a.com/2", "yyyyyy", "fr"),
        (2, "https://b.net/1", "zz", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string, lang string")
    out = {r.domain: r for r in
           domain_stats(df, text_col="text", lang_col="lang").collect()}
    assert out["a.com"].n_docs == 2 and out["a.com"].total_chars == 10
    assert out["a.com"].mean_chars == 5.0 and out["a.com"].n_langs == 2
    assert out["b.net"].n_docs == 1 and out["b.net"].n_langs == 1
    # minimal form: counts only
    slim = domain_stats(df).columns
    assert slim == ["domain", "n_docs"]


def test_url_host_userinfo_before_www(spark):
    # the r9 advisor's bypass: userinfo must be stripped BEFORE the
    # www. prefix, or 'user@www.spam.com' gates as 'www.spam.com' and
    # sails past a blocklist normalized to 'spam.com'
    cases = [
        ("https://user@www.spam.com/x", "spam.com"),
        ("https://user:pw@WWW.Spam.com:8080/y", "spam.com"),
        ("https://user@spam.com/z", "spam.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(url_host("url")).collect()]
    assert got == [h for _, h in cases]
    blocked = filter_domains(df, ["spam.com"], mode="block")
    assert blocked.count() == 0


def test_filter_domains_covers_subdomains(spark):
    # web-blocklist contract: an entry covers the domain AND its
    # subdomains; 'a.spam.com' must not bypass a 'spam.com' entry
    rows = [
        (0, "https://spam.com/a"),
        (1, "https://a.spam.com/b"),
        (2, "https://a.b.spam.com/c"),
        (3, "https://notspam.com/d"),      # suffix of the NAME, not a label
        (4, "https://spam.com.evil.org/e"),  # entry in the MIDDLE: no match
        (5, "https://deep.tracker.net/f"),
        (6, "https://com/g"),              # fewer labels than any entry
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    doms = ["spam.com", "tracker.net"]
    blocked = sorted(r.doc_id for r in filter_domains(df, doms, "url", "block").collect())
    assert blocked == [3, 4, 6]
    allowed = sorted(r.doc_id for r in filter_domains(df, doms, "url", "allow").collect())
    assert allowed == [0, 1, 2, 5]
    # column contract: gate passes the frame through unchanged
    assert filter_domains(df, doms, "url", "block").columns == df.columns
    # the gate stays broadcast-HASH joins (one per label-count) — a
    # nested-loop endswith condition would be the 10^6-entry scale killer
    plan = filter_domains(df, doms, "url", "block")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "NestedLoop" not in plan


def test_filter_domains_mixed_label_depths(spark):
    # entries at different label counts gate independently and exactly
    rows = [
        (0, "https://x.co.uk/1"),
        (1, "https://bad.x.co.uk/2"),
        (2, "https://co.uk/3"),
        (3, "https://fine.org/4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(
        r.doc_id
        for r in filter_domains(df, ["bad.x.co.uk", "fine.org"], mode="block").collect()
    )
    assert kept == [0, 2]
