"""RFC 9309 robots.txt evaluator (functions/robots.py): match semantics,
group selection, precedence — pinned against the RFC's own §2.2.2/§5
style examples. The Spark integration is oracle-checked by q46."""

from __future__ import annotations

from sax_wasm_spark.functions.robots import _match, compile_robots, robots_allowed

BODY = """
# example file
User-agent: GoodBot
Disallow: /private/
Allow: /private/open*

User-agent: *
Disallow: /secret/
Crawl-delay: 3

User-agent: OtherBot
Disallow: /
"""


def test_match_wildcards_and_anchors():
    cases = {
        ("/", "/anything"): 1,
        ("/fish", "/fishheads"): 5,
        ("/fish*", "/fish/salmon.html"): 6,
        ("/fish*.php", "/fishheads/catfish.php?x"): 10,
        ("/*.php$", "/filename.php"): 7,
        ("/*.php$", "/filename.php?x"): -1,
        ("/*.php$", "/filename.phpX"): -1,
        ("/fish$", "/fish"): 6,
        ("/fish$", "/fishy"): -1,
        ("/p*q*r", "/pXXqYYr-more"): 6,
        ("/a*b$", "/aXXXb"): 5,
        ("/a*b$", "/aXXXbc"): -1,
        ("/x", "/y"): -1,
    }
    for (pat, path), want in cases.items():
        assert _match(pat, path) == want, (pat, path)


def test_group_selection_most_specific_wins():
    r = compile_robots(BODY, "GoodBot/2.1")
    assert robots_allowed(r, "/private/x") is False
    assert robots_allowed(r, "/private/open-page") is True  # longer Allow
    # a crawler obeys ONLY its most specific group: GoodBot ignores the
    # '*' group's /secret/ rule
    assert robots_allowed(r, "/secret/x") is True


def test_star_group_applies_to_unknown_agents():
    r = compile_robots(BODY, "RandomCrawler")
    assert robots_allowed(r, "/secret/x") is False
    assert robots_allowed(r, "/public") is True


def test_agent_match_is_exact_product_token():
    """§2.2.1: case-insensitive EXACT product-token match — a crawler
    identifies by its leading token, and short group tokens must not
    hijack unrelated agents via substring containment."""
    assert robots_allowed(compile_robots(BODY, "otherbot/2.0"), "/x") is False
    assert robots_allowed(compile_robots(BODY, "OTHERBOT"), "/x") is False
    # 'Mozilla-compatible ...' has token 'Mozilla-compatible', NOT otherbot
    r = compile_robots(BODY, "Mozilla-compatible otherbot v9")
    assert robots_allowed(r, "/anything") is True  # falls to '*' group
    # a one-letter group must not capture GoodBot
    trap = "User-agent: o\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
    assert robots_allowed(compile_robots(trap, "GoodBot/1.0"), "/x") is True


def test_matching_groups_are_combined():
    """§2.2.1 MUST: multiple groups for the same agent combine."""
    body = "User-agent: *\nDisallow: /a\n\nUser-agent: *\nDisallow: /b\n"
    r = compile_robots(body, "AnyBot")
    assert robots_allowed(r, "/a/x") is False
    assert robots_allowed(r, "/b/x") is False
    body2 = (
        "User-agent: GoodBot\nDisallow: /a\n\n"
        "User-agent: GoodBot\nDisallow: /b\n"
    )
    r2 = compile_robots(body2, "GoodBot")
    assert robots_allowed(r2, "/a/x") is False and robots_allowed(r2, "/b/x") is False


def test_percent_normalization():
    """§2.2.2: percent-encoded octets compare decoded; %2F stays
    encoded (an encoded slash is not a separator)."""
    r = compile_robots("User-agent: *\nDisallow: /a%20b\n", "x")
    assert robots_allowed(r, "/a b/c") is False
    assert robots_allowed(r, "/a%20b/c") is False  # both sides normalize
    r2 = compile_robots("User-agent: *\nDisallow: /a/b\n", "x")
    assert robots_allowed(r2, "/a%2Fb") is True  # encoded slash differs


def test_encoded_metacharacter_literals_match():
    """A rule's %2A/%24 is a LITERAL '*'/'$' (not a wildcard/anchor)
    and must match a path's star/dollar whether raw or encoded —
    round-4 left them as never-matching '%2A'/'%24' text (ADVICE)."""
    r = compile_robots("User-agent: *\nDisallow: /p/%2A\n", "x")
    assert robots_allowed(r, "/p/*") is False        # raw literal star
    assert robots_allowed(r, "/p/%2A") is False      # encoded star
    assert robots_allowed(r, "/p/x") is True         # NOT a wildcard
    r = compile_robots("User-agent: *\nDisallow: /q%24r\n", "x")
    assert robots_allowed(r, "/q$r") is False        # literal dollar
    assert robots_allowed(r, "/q%24r") is False
    assert robots_allowed(r, "/qr") is True          # NOT an anchor
    # a raw mid-pattern '$' is a literal character too
    r = compile_robots("User-agent: *\nDisallow: /a$b\n", "x")
    assert robots_allowed(r, "/a$b") is False
    assert robots_allowed(r, "/ab") is True
    # trailing %24 must NOT anchor: '/end%24' matches '/end$...' prefix
    r = compile_robots("User-agent: *\nDisallow: /end%24\n", "x")
    assert robots_allowed(r, "/end$/more") is False
    assert robots_allowed(r, "/end") is True
    # and a real trailing '$' still anchors
    r = compile_robots("User-agent: *\nDisallow: /exact$\n", "x")
    assert robots_allowed(r, "/exact") is False
    assert robots_allowed(r, "/exact/more") is True
    # wildcard still crosses literal stars in the path
    r = compile_robots("User-agent: *\nDisallow: /w/*/z\n", "x")
    assert robots_allowed(r, "/w/*/z") is False


def test_allow_wins_length_ties():
    r = compile_robots("User-agent: *\nDisallow: /page\nAllow: /page", "b")
    assert robots_allowed(r, "/page1") is True


def test_missing_or_empty_robots_allows_all():
    assert compile_robots(None, "x") == ()
    assert compile_robots("", "x") == ()
    assert robots_allowed((), "/x") is True
    # empty Disallow value = allow-all, not deny-all
    r = compile_robots("User-agent: *\nDisallow:", "x")
    assert robots_allowed(r, "/anything") is True


def test_consecutive_user_agent_lines_share_rules():
    body = "User-agent: A\nUser-agent: B\nDisallow: /x\n"
    assert robots_allowed(compile_robots(body, "A"), "/x/1") is False
    assert robots_allowed(compile_robots(body, "B"), "/x/1") is False
    assert robots_allowed(compile_robots(body, "C"), "/x/1") is True


def test_spark_operator_and_missing_host(spark):
    from pyspark.sql import functions as F

    from sax_wasm_spark.functions.robots import with_robots_allowed

    urls = spark.createDataFrame(
        [
            (0, "https://a.com/private/x"),
            (1, "https://a.com/ok"),
            (2, "https://norobots.com/anything"),
        ],
        "id int, url string",
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    got = {
        r.id: r.robots_allowed
        for r in with_robots_allowed(urls, robots).collect()
    }
    assert got == {0: False, 1: True, 2: True}
    # the robots dim must be broadcast in the plan
    plan = (
        with_robots_allowed(urls, robots)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_join_strategy_differential(spark):
    """VERDICT r5 item 4: the robots dim join is size-gated. All three
    strategies must return identical verdicts on the q46-style fixture;
    `shuffle` must NOT broadcast, `auto` with a tiny limit must fall
    back to the shuffled join."""
    from sax_wasm_spark.functions.robots import with_robots_allowed

    policy = (
        "User-agent: GoodBot\nDisallow: /private/\n"
        "Disallow: /*.php$\nAllow: /files/\n"
    )
    urls = spark.createDataFrame(
        [
            (i, f"https://h{i % 3}.example.com" + p)
            for i, p in enumerate(
                ["/private/p", "/cgi/c.php", "/files/f.html", "/open/o"] * 6
            )
        ],
        "doc_id int, url string",
    )
    robots = spark.createDataFrame(
        [("h0.example.com", policy), ("h1.example.com", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )

    def run(**kw):
        df = with_robots_allowed(urls, robots, user_agent="GoodBot/1.0", **kw)
        return {r.doc_id: r.robots_allowed for r in df.collect()}

    base = run(strategy="broadcast")
    assert run(strategy="shuffle") == base
    assert run(strategy="auto", broadcast_limit=1) == base
    assert run(strategy="auto") == base

    def plan(**kw):
        return (
            with_robots_allowed(urls, robots, user_agent="GoodBot/1.0", **kw)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    assert "BroadcastHashJoin" in plan(strategy="broadcast")
    assert "BroadcastHashJoin" not in plan(strategy="shuffle")
    # auto under a 1-host limit degrades to the shuffled join
    assert "BroadcastHashJoin" not in plan(strategy="auto", broadcast_limit=1)

    import pytest

    with pytest.raises(ValueError, match="unknown strategy"):
        with_robots_allowed(urls, robots, strategy="cartesian")


def test_crawl_delay_per_group():
    from sax_wasm_spark.functions.robots import crawl_delay

    body = (
        "User-agent: GoodBot\nCrawl-delay: 1.5\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 10\n\n"
        "User-agent: NoDelayBot\nDisallow: /y\n"
    )
    assert crawl_delay(body, "GoodBot/1.0") == 1.5
    assert crawl_delay(body, "SomeoneElse") == 10.0
    # a bot with its own group but no delay does NOT inherit '*'
    assert crawl_delay(body, "NoDelayBot") is None
    assert crawl_delay(None, "x") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: soon\n", "x") is None


def test_url_path_cases(spark):
    from pyspark.sql import functions as F

    from sax_wasm_spark.functions.robots import url_path

    cases = {
        "https://a.com/x/y?q=1": "/x/y?q=1",
        "https://a.com?x=1": "/?x=1",       # query-only url keeps its query
        "https://a.com/x#frag": "/x",        # fragment stripped
        "https://a.com": "/",
        "https://a.com/": "/",
        # scheme-relative and schemeless host-first crawl-frontier
        # forms drop the authority too (ADVICE r4: the host must not
        # leak into the robots match target)
        "//a.com/x?q=1": "/x?q=1",
        "//a.com": "/",
        "example.com/a/b": "/a/b",
        "example.com": "/",
        "example.com?q=1": "/?q=1",
        "/already/a/path": "/already/a/path",
        "?just=query": "/?just=query",
    }
    rows = (
        spark.createDataFrame([(k,) for k in cases], "v string")
        .select(F.col("v"), url_path(F.col("v")).alias("p"))
        .collect()
    )
    for r in rows:
        assert r.p == cases[r.v], r.v


def test_reserved_column_collision_raises(spark):
    import pytest as _pytest

    from sax_wasm_spark.functions.robots import with_robots_allowed

    urls = spark.createDataFrame(
        [(0, "https://a.com/x", "boom")], "id int, url string, __robots_host__ string"
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /\n")], "host string, robots_txt string"
    )
    with _pytest.raises(ValueError):
        with_robots_allowed(urls, robots)


def test_caller_robots_txt_column_is_safe(spark):
    """urls carrying their own 'robots_txt' column must not collide."""
    from sax_wasm_spark.functions.robots import with_robots_allowed

    urls = spark.createDataFrame(
        [(0, "https://a.com/private/x", "unrelated")],
        "id int, url string, robots_txt string",
    )
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    )
    rows = with_robots_allowed(urls, robots).collect()
    assert rows[0].robots_allowed is False
    assert rows[0].robots_txt == "unrelated"  # caller column untouched


def test_with_crawl_delay_dataframe(spark):
    """DataFrame crawl-delay extraction: declared delay surfaces, a
    bot-specific group shadows '*' (no inheritance), silent/missing
    robots fall back to the caller's default."""
    from sax_wasm_spark.functions.robots import with_crawl_delay

    urls = spark.createDataFrame(
        [
            (0, "https://a.com/x"),
            (1, "https://b.com/x"),
            (2, "https://c.com/x"),
            (3, "https://d.com/x"),
        ],
        "id int, url string",
    )
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nCrawl-delay: 2\n"),
            (
                "b.com",
                "User-agent: GoodBot\nDisallow:\n\nUser-agent: *\nCrawl-delay: 60\n",
            ),
            ("c.com", "User-agent: *\nDisallow: /tmp/\n"),
            # d.com absent
        ],
        "host string, robots_txt string",
    )
    got = {
        r.id: r.crawl_delay_sec
        for r in with_crawl_delay(
            urls, robots, user_agent="GoodBot/1.0", default_delay=7.5
        ).collect()
    }
    assert got[0] == 2.0  # '*' group applies to GoodBot (no own group)
    assert got[1] == 7.5  # own group, silent on delay — no '*' inheritance
    assert got[2] == 7.5  # robots present, no delay directive
    assert got[3] == 7.5  # no robots at all


# ---------------------------------------------------------------------------
# property-based robustness (hypothesis)

import re as _re2  # noqa: E402

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# '%' excluded: percent-decoding happens ABOVE _match
# (compile/robots_allowed). '$' IS included — the end-anchor lives in
# _compile_pattern/_match_compiled, exactly the branch this property
# must exercise; the regex reference implements the same semantics.
_PAT_ALPHA = "ab/c.*$"
_PATH_ALPHA = "ab/c.x-"


def _regex_reference_match(pattern: str, path: str) -> int:
    """Independent oracle for RFC 9309 '*'/'$' matching: translate the
    pattern to an anchored regex. Returns the same specificity value
    (pattern length) or -1."""
    anchored = pattern.endswith("$")
    pat = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(_re2.escape(p) for p in pat.split("*")) + (
        "$" if anchored else ""
    )
    return len(pattern) if _re2.search(rx, path) else -1


@settings(max_examples=400, deadline=None)
@given(
    pattern=st.text(alphabet=_PAT_ALPHA, min_size=0, max_size=12),
    path=st.text(alphabet=_PATH_ALPHA, min_size=0, max_size=16),
)
def test_match_agrees_with_regex_reference(pattern, path):
    assert _match(pattern, path) == _regex_reference_match(pattern, path), (
        pattern,
        path,
    )


@settings(max_examples=200, deadline=None)
@given(body=st.text(max_size=300), ua=st.text(max_size=20), path=st.text(max_size=40))
def test_compile_and_evaluate_never_raise(body, ua, path):
    """ANY text fed as a robots body / user-agent / path must produce a
    boolean — a crawl cannot crash on a hostile robots.txt."""
    rules = compile_robots(body, ua)
    assert robots_allowed(rules, path) in (True, False)


def test_sitemap_directive_extraction():
    """Sitemap: lines are GLOBAL (collected regardless of group
    position), case-insensitive, whitespace-sloppy, comment-stripped;
    non-strings and directive-free bodies yield []."""
    from sax_wasm_spark.functions.robots import sitemap_urls

    body = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Sitemap: https://h1.example.com/sitemap.xml\n"
        "User-agent: GoodBot\n"
        "Allow: /\n"
        "sitemap:   https://h1.example.com/s2.xml#frag\n"
        "SITEMAP: https://h1.example.com/s3.xml  # mirror\n"
    )
    assert sitemap_urls(body) == [
        "https://h1.example.com/sitemap.xml",
        "https://h1.example.com/s2.xml",
        "https://h1.example.com/s3.xml",
    ]
    assert sitemap_urls(None) == []
    assert sitemap_urls("User-agent: *\nDisallow:") == []
    assert sitemap_urls("Sitemap:") == []  # empty value dropped
