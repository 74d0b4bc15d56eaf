"""HTML -> text extraction (operators/webextract): pure-parser exactness,
boilerplate gating, malformed-markup tolerance, and the Spark operator's
end-to-end schema + values."""

from __future__ import annotations

import pytest

from torcharrow_spark.operators.webextract import (
    extract_blocks,
    extract_text,
    html_extract,
)


def test_block_segmentation_and_entities():
    html = (
        "<html><head><title>T &amp; t</title><style>p{}</style></head>"
        "<body><h1>A &#8212; B</h1><p>hello &lt;world&gt;</p></body></html>"
    )
    title, blocks = extract_blocks(html)
    assert title == "T & t"
    assert [b.text for b in blocks] == ["A — B", "hello <world>"]
    assert all(b.link_chars == 0 for b in blocks)


def test_script_style_noscript_skipped():
    html = (
        "<body><script>var x = '<p>not text</p>';</script>"
        "<style>div{color:red}</style><noscript>nope</noscript>"
        "<p>real</p></body>"
    )
    _, blocks = extract_blocks(html)
    assert [b.text for b in blocks] == ["real"]


def test_link_chars_counted_only_inside_anchors():
    html = '<body><p>pre <a href="/x">link text</a> post</p></body>'
    _, blocks = extract_blocks(html)
    assert len(blocks) == 1
    assert blocks[0].text == "pre link text post"
    assert blocks[0].link_chars == len("link text")


def test_boilerplate_gate_drops_short_link_heavy_blocks():
    html = (
        '<body><nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        "<p>a substantial paragraph of content text here</p>"
        '<footer><a href="/tos">Terms</a></footer></body>'
    )
    r = extract_text(html)
    assert r["n_blocks"] == 3
    assert r["n_kept"] == 1
    assert r["text"] == "a substantial paragraph of content text here"
    # ratio = anchor chars / all chars over ALL blocks (pre-filter)
    total = len("Home About") + len(r["text"]) + len("Terms")
    links = len("Home") + len("About") + len("Terms")
    assert r["link_char_ratio"] == pytest.approx(links / total)


def test_long_link_heavy_block_survives():
    words = " ".join(f"ref{i}" for i in range(20))
    html = f'<body><p><a href="/r">{words}</a></p></body>'
    r = extract_text(html)
    assert r["n_kept"] == 1  # >10 words: a references section, not chrome


def test_malformed_markup_never_raises():
    # unclosed tags, stray end tags, bad nesting, unterminated entity
    html = "<body><p>one<p>two</div></span><b>three &amp broken"
    r = extract_text(html)
    assert "one" in r["text"] and "two" in r["text"]


def test_inline_tags_do_not_split_blocks():
    html = "<body><p>a <b>bold</b> and <em>em</em> run</p></body>"
    _, blocks = extract_blocks(html)
    assert [b.text for b in blocks] == ["a bold and em run"]


def test_br_and_startend_flush():
    html = "<body><p>first<br/>second</p></body>"
    _, blocks = extract_blocks(html)
    assert [b.text for b in blocks] == ["first", "second"]


def test_whitespace_only_blocks_dropped():
    html = "<body><div>   \n </div><p>x</p></body>"
    _, blocks = extract_blocks(html)
    assert [b.text for b in blocks] == ["x"]


ROBOTS = """# crawl policy
User-agent: megabot
Disallow: /

User-agent: *
Disallow: /private/
Disallow: /tmp*
Allow: /private/press/
Disallow: /exact$
Allow:
"""


def test_parse_robots_groups_and_agents():
    from torcharrow_spark.operators.webextract import parse_robots

    star = parse_robots(ROBOTS)
    assert (False, "/private/") in star and (True, "/private/press/") in star
    assert (False, "/") not in star  # megabot's group must not leak
    mega = parse_robots(ROBOTS, agent="MegaBot/1.0")
    assert mega == [(False, "/")]
    # unknown agent falls back to the * group
    assert parse_robots(ROBOTS, agent="otherbot") == star
    # duplicate user-agent tokens in one group: rules stored once
    dup = "User-agent: a\nUser-agent: a\nDisallow: /x\n"
    assert parse_robots(dup, agent="a") == [(False, "/x")]


def test_robots_allowed_precedence(spark):
    from torcharrow_spark.operators.webextract import parse_robots, robots_allowed

    rules = parse_robots(ROBOTS)
    cases = {
        "/index.html": True,        # no rule matches
        "/private/x": False,        # disallowed prefix
        "/private/press/a": True,   # longer allow overrides
        "/tmp/scratch": False,      # * wildcard
        "/tmpfile": False,
        "/exact": False,            # $ anchor binds
        "/exactly": True,           # ...and only exactly
    }
    df = spark.createDataFrame([(p,) for p in cases], "path string")
    got = {
        r.path: r.ok
        for r in df.select(
            "path", robots_allowed("path", rules).alias("ok")
        ).collect()
    }
    assert got == cases
    # the gate is pure Catalyst: no Python UDF in the plan
    plan = (
        df.where(robots_allowed("path", rules))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def test_extract_meta_and_html_meta(spark):
    from torcharrow_spark.operators.webextract import extract_meta, html_meta

    page = (
        '<head><meta name="Description" content="first &amp; real">'
        '<meta name="description" content="duplicate loses">'
        '<meta property="og:title" content="T"/>'
        '<meta name="nocontent">'
        "</head>"
    )
    m = extract_meta(page)
    assert m["description"] == "first & real"  # first wins, key lowered
    assert m["og:title"] == "T"                # property= + self-closing
    assert "nocontent" not in m
    df = spark.createDataFrame(
        [(0, page), (1, "<p>no meta</p>"), (2, None)],
        "doc_id long, html string",
    )
    out = {r.doc_id: r for r in
           html_meta(df, names=("description", "og:title")).collect()}
    assert out[0].description == "first & real" and out[0].og_title == "T"
    assert out[1].description is None and out[2].og_title is None


def test_html_extract_spark(spark):
    rows = [
        (0, "<body><h1>Hi</h1><p>text body here</p>"
            '<nav><a href="/">Home</a></nav></body>'),
        (1, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = html_extract(df).orderBy("doc_id").collect()
    assert [f.name for f in html_extract(df).schema.fields] == [
        "doc_id", "title", "text", "n_blocks", "n_kept",
        "extracted_chars", "link_char_ratio",
    ]
    r0 = out[0]
    assert r0.text == "Hi\ntext body here"
    assert r0.n_blocks == 3 and r0.n_kept == 2
    assert r0.extracted_chars == len("Hi\ntext body here")
    r1 = out[1]
    assert r1.text is None and r1.n_blocks is None


def test_robots_rules_table_distributed_parse(spark):
    from torcharrow_spark.operators import robots_rules

    rows = [
        ("a.com", "User-agent: *\nDisallow: /private/\nAllow: /private/press/\n"),
        ("b.com", "User-agent: googlebot\nDisallow: /\n"),   # wrong agent
        ("c.com", "# only comments\n"),                      # no rules
        ("d.com", None),                                      # null policy
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = robots_rules(df).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r.host, []).append((r.allow, r.pattern, r.pattern_len))
    assert set(by_host) == {"a.com"}  # b/c/d yield no rules for '*'
    assert sorted(by_host["a.com"]) == [
        (False, "/private/", 9),
        (True, "/private/press/", 15),
    ]
    # bytes payloads parse too (raw robots bodies straight from a crawl)
    dfb = spark.createDataFrame(
        [("e.com", b"User-agent: *\nDisallow: /x\n")], "host string, robots_txt binary"
    )
    assert robots_rules(dfb).count() == 1


def test_robots_gate_multihost_precedence(spark):
    from torcharrow_spark.operators import robots_gate, robots_rules

    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /private/\nAllow: /private/press/\n"),
            ("b.com", "User-agent: *\nDisallow: /tmp*\nDisallow: /exact$\n"),
            # equal-length allow + disallow: allow must win the tie
            ("t.com", "User-agent: *\nDisallow: /aaa/\nAllow: /bbb/\n"
                      "Disallow: /bbb/\n"),
        ],
        "host string, robots_txt string",
    )
    rules = robots_rules(robots)
    pages = spark.createDataFrame(
        [
            (0, "a.com", "/p/x"),           # no matching rule -> allowed
            (1, "a.com", "/private/x"),     # disallowed
            (2, "a.com", "/private/press/x"),  # longer allow wins
            (3, "b.com", "/tmp123"),        # wildcard disallow
            (4, "b.com", "/exact"),         # $-anchored
            (5, "b.com", "/exactly"),       # anchor must not leak
            (6, "nohost.org", "/anything"), # no policy at all -> allowed
            (7, "t.com", "/bbb/x"),         # equal-length tie -> allow
            (8, "t.com", "/aaa/x"),         # plain disallow
        ],
        "doc_id long, host string, path string",
    )
    out = {r.doc_id: r.allowed for r in robots_gate(pages, rules).collect()}
    assert out == {0: True, 1: False, 2: True, 3: False, 4: False,
                   5: True, 6: True, 7: True, 8: False}
    # plan shape: page side broadcast-joined, zero Python on pages
    gated = robots_gate(pages, rules)
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only Arrow/Python stage is the rules parse (input: 3 policy
    # rows), never the page side: pages flow Scan -> Join -> Project
    assert plan.count("MapInPandas") <= 1
    # non-broadcast fallback produces identical verdicts
    out2 = {
        r.doc_id: r.allowed
        for r in robots_gate(pages, rules, broadcast=False).collect()
    }
    assert out2 == out
