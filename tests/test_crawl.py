"""Crawl-frontier operators (operators/crawl.py): RFC 9309 robots
semantics and the HTML tag tokenizer, beyond what the planted query
formulas exercise."""

from __future__ import annotations

from mit_6_5840_mapreduce_with_go_spark.operators import crawl as C


def _g(text):
    return C.parse_robots(text)


def test_robots_group_formation_and_extensions():
    g = _g(
        "Disallow: /ignored-before-any-group/\n"
        "User-agent: a\nUser-agent: b\nDisallow: /x/\nCrawl-delay: 3\n"
        "\n"
        "User-agent: *\nAllow: /\n"
    )
    assert len(g) == 2
    assert g[0]["agents"] == ["a", "b"]
    assert g[0]["rules"] == [(False, "/x/")]
    assert g[0]["extensions"] == {"crawl-delay": "3"}
    # a NEW user-agent run after rules opens a new group; a blank line
    # alone does not close one
    g2 = _g("User-agent: a\nDisallow: /x/\n\nAllow: /x/y/\n")
    assert len(g2) == 1 and len(g2[0]["rules"]) == 2


def test_robots_most_specific_group_wins():
    g = _g(
        "User-agent: spark\nDisallow: /a/\n\n"
        "User-agent: sparkbot\nDisallow: /b/\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    # longest matching token: "sparkbot" beats "spark"
    assert C.robots_decision(g, "SparkBot/2.0", "/b/x") == (False, 3)
    assert C.robots_decision(g, "SparkBot/2.0", "/a/x") == (True, 0)
    # unknown agent falls to *
    assert C.robots_decision(g, "nobody", "/anything") == (False, 1)


def test_robots_longest_match_and_tie():
    g = _g("User-agent: x\nDisallow: /p/\nAllow: /p/ok/\n")
    assert C.robots_decision(g, "x", "/p/z") == (False, 3)
    assert C.robots_decision(g, "x", "/p/ok/z") == (True, 6)
    # equal length: Allow wins
    g2 = _g("User-agent: x\nDisallow: /same/\nAllow: /sama/\n")
    assert C.robots_decision(g2, "x", "/same/")[0] is False
    g3 = _g("User-agent: x\nDisallow: /tie/\nAllow: /tie/\n")
    assert C.robots_decision(g3, "x", "/tie/z") == (True, 5)
    # empty Disallow = allow-all
    g4 = _g("User-agent: x\nDisallow:\n")
    assert C.robots_decision(g4, "x", "/any") == (True, 0)


def test_robots_wildcards():
    g = _g("User-agent: x\nDisallow: /*.pdf$\nDisallow: /dl/*/raw\n")
    dec = lambda p: C.robots_decision(g, "x", p)  # noqa: E731
    assert dec("/a/b/c.pdf") == (False, 7)
    assert dec("/a/b/c.pdfx")[0] is True  # $ anchors the end
    assert dec("/dl/v1/raw")[0] is False
    assert dec("/dl/raw")[0] is True  # * must consume a path segment slot


def test_html_tokenizer_traps():
    html = C._html_payload(7)
    hrefs = C.extract_links(html)
    k = 2 + 7 % 4
    assert len(hrefs) == k + 2
    assert all("fake" not in h and "commented" not in h and "css" not in h
               for h in hrefs)
    assert hrefs[-2] == "/rel/7" and hrefs[-1] == "/u7"


def test_html_tokenizer_lenient_edges():
    # unclosed comment, unclosed tag, unclosed script: no exception
    assert C.extract_links("<!-- <a href=/x>") == []
    assert C.extract_links("<a href=/y") == []
    assert C.extract_links("<script><a href=/z></script") == []
    # duplicate attribute: first wins (browser behavior)
    assert C.extract_links('<a href="/one" href="/two">') == ["/one"]
    # case-insensitive tag/attr names
    assert C.extract_links('<A HREF="/up">') == ["/up"]
    # mixed quoting in one tag
    assert C.extract_links("<a id='q' href=bare>") == ["bare"]


def test_xml_entity_decode():
    assert C.decode_xml_text("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") == (
        "a & b <c> \"d\" 'e'"
    )
    # double-escaped survives one level
    assert C.decode_xml_text("&amp;lt;") == "&lt;"


def test_sitemap_walk():
    xml = C._sitemap_payload(4)
    es = C.sitemap_entries(xml)
    k = 3 + 4 % 5
    assert len(es) == k
    assert es[0]["loc"] == "http://ex.com/s4?a=1&p=0"  # entity decoded
    assert es[0]["lastmod"] == "2026-01-05"
    assert es[0]["priority"] == "0.4"
    # entries without <loc> are dropped; stray text outside fields ignored
    es2 = C.sitemap_entries(
        "<urlset> junk <url><lastmod>2026-01-01</lastmod></url>"
        "<url><loc>/x</loc>mid</url></urlset>"
    )
    assert [e["loc"] for e in es2] == ["/x"]


def test_url_normalization_jvm(spark):
    """normalize_urls is real RFC 3986: case folding, default-port
    strip, fragment removal, dot-segment resolution — and the plan is
    Python-free (no BatchEvalPython / ArrowEvalPython / mapInPandas)."""
    from mit_6_5840_mapreduce_with_go_spark.plans.explain import physical_plan

    rows = [
        ("HTTP://WWW.EX.COM:80/a/1/../b/./c?q=1#f", "http://www.ex.com/a/b/c?q=1"),
        ("https://Host.Org:443/x/./y/../z", "https://host.org/x/z"),
        ("https://host.org:8443/keep/port", "https://host.org:8443/keep/port"),
        ("http://h.io/a//b/../../top", "http://h.io/top"),
        ("http://h.io/../above-root", "http://h.io/above-root"),
        ("http://h.io/plain", "http://h.io/plain"),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], "url string")
    out = C.normalize_urls(df, "url").select("url", "norm_url").collect()
    got = {r["url"]: r["norm_url"] for r in out}
    for raw, want in rows:
        assert got[raw] == want, (raw, got[raw], want)
    plan = physical_plan(C.normalize_urls(df, "url"))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_robots_anchored_wildcard_greedy_end_match():
    """$-anchored patterns must match the FINAL literal at the END of
    the path (greedy), not at its first occurrence — the repeated-
    final-literal paths here flip under leftmost matching."""
    m = C._rule_matches
    # RFC-shaped cases with the final literal repeated mid-path
    assert m("/fish*.php$", "/fish.php?x=.php")
    assert m("/a*b$", "/axbxb")
    assert m("/*.tmp$", "/a.tmp.tmp")
    assert not m("/*.tmp$", "/a.tmp.gz")
    # bare '$' (empty anchored pattern) matches only the empty path
    assert m("$", "")
    assert not m("$", "/")
    assert not m("$", "/x")
    # no-star anchored pattern = exact equality
    assert m("/fish.php$", "/fish.php")
    assert not m("/fish.php$", "/fish.php?id=1")
    # trailing '*$' matches anything after the prefix
    assert m("/a*$", "/anything")
    assert not m("/a*$", "/b")
    # middle parts stay leftmost; the final end-match must not reuse
    # characters the middle parts consumed
    assert m("/a*bc*d$", "/axbcy_dd")
    assert not m("/a*bc*d$", "/adbc")
    # end-to-end through decision precedence
    g = C.parse_robots("User-agent: x\nDisallow: /dl*.zip$\n")
    assert C.robots_decision(g, "x", "/dl/a.zip?v=.zip") == (False, 9)
    assert C.robots_decision(g, "x", "/dl/a.zipx")[0] is True


def test_crawl_schedule_invariants_and_single_host_shuffle(spark):
    """Politeness schedule: per-host closed forms hold (makespan =
    (n-1)*delay, total wait = delay*n*(n-1)/2 for a dense slot rank),
    and the executed plan carries dedup + window + rollup on ONE
    host-keyed exchange (plus the deliberate small-table fan-out)."""
    from mit_6_5840_mapreduce_with_go_spark.operators.crawl import (
        crawl_schedule_stats,
    )
    from mit_6_5840_mapreduce_with_go_spark.plans.explain import physical_plan

    df = crawl_schedule_stats(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 10
    for r in rows:
        n, d = r["n_urls"], r["crawl_delay"]
        assert r["makespan"] == (n - 1) * d
        assert r["fetch_at_sum"] == d * n * (n - 1) // 2
        # every 10-second bucket in [0, makespan] with a fetch in it
        assert 1 <= r["n_buckets"] <= r["makespan"] // 10 + 1
        assert r["first3_len_sum"] > 0

    # executedPlan string (not formatted explain: AQE's formatted
    # output hides exchanges behind query-stage placeholders); after
    # materialization AQE appends "== Initial Plan ==" — count the
    # FINAL plan only
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    import re

    hash_ex = [
        l for l in plan.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(hash_ex) == 1, hash_ex
    assert "host" in hash_ex[0]
    assert not re.search(r"BatchEvalPython|ArrowEvalPython|PythonMapInArrow", plan)


def test_stream_frontier_equals_batch(spark, sf_dir):
    """The streaming frontier dedup (dropDuplicates state over arriving
    shards) emits exactly the batch-distinct URL set."""
    from mit_6_5840_mapreduce_with_go_spark.operators.crawl import (
        _planted_raw_urls,
        normalize_urls,
    )
    from mit_6_5840_mapreduce_with_go_spark.sources import load_table
    from mit_6_5840_mapreduce_with_go_spark.streaming.windows import (
        run_to_memory,
        stream_frontier_unique,
    )

    q = run_to_memory(
        stream_frontier_unique(spark, sf_dir), "t_frontier", "append"
    )
    try:
        q.processAllAvailable()
        got = {
            (r["host"], r["norm_url"])
            for r in spark.table("t_frontier").collect()
        }
    finally:
        q.stop()
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    want = {
        (r["host"], r["norm_url"])
        for r in normalize_urls(_planted_raw_urls(docs), "url")
        .select("host", "norm_url")
        .distinct()
        .collect()
    }
    assert got == want and len(got) > 0
