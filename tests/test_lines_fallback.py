"""Differential tests for the anti-join fallback paths of
remove_boilerplate_lines and decontaminate (VERDICT r3 item 2).

The broadcast paths collect the hot-line / eval-gram set to the driver;
the anti_join paths never materialize anything driver-side. Both must
produce IDENTICAL output — including the adversarial case where every
line is hot (hot set ≈ corpus), which is exactly the case the fallback
exists for (driver OOM on collect_set at scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sax_wasm_spark.operators.decontaminate import decontaminate
from sax_wasm_spark.operators.lines import remove_boilerplate_lines


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string, extra string")


def _collect_clean(df):
    return {
        (r.doc_id, r.extra): r.clean_text
        for r in df.select("doc_id", "extra", "clean_text").collect()
    }


def _both_paths(spark, rows, min_df):
    d = _docs(spark, rows)
    a = remove_boilerplate_lines(
        d, text_col="text", id_col="doc_id", min_df=min_df, strategy="broadcast"
    )
    b = remove_boilerplate_lines(
        d, text_col="text", id_col="doc_id", min_df=min_df, strategy="anti_join"
    )
    assert a.columns == b.columns
    return _collect_clean(a), _collect_clean(b)


def test_lines_paths_identical_mixed(spark):
    rows = [
        (0, "keep zero\ncookie banner\nunique line 0", "x0"),
        (1, "cookie banner\nkeep one\nfooter text", "x1"),
        (2, "footer text\ncookie banner\nkeep two", "x2"),
        (3, "all original content\nnothing shared here", "x3"),
    ]
    a, b = _both_paths(spark, rows, min_df=2)
    assert a == b
    assert a[(0, "x0")] == "keep zero\nunique line 0"
    assert a[(3, "x3")] == "all original content\nnothing shared here"


def test_lines_paths_identical_every_line_hot(spark):
    """Adversarial: EVERY line reaches min_df, so the hot set is the
    whole distinct-line population — the broadcast path's worst case.
    Both paths must still agree, and every doc must come back (with an
    empty clean_text), including via the anti-join's rebuild join."""
    shared = "banner\nfooter\nnav"
    rows = [(i, shared, f"x{i}") for i in range(50)]
    a, b = _both_paths(spark, rows, min_df=2)
    assert a == b
    assert len(a) == 50
    assert set(a.values()) == {""}


def test_lines_paths_preserve_duplicate_lines_and_order(spark):
    # a surviving line repeated WITHIN one doc must survive twice, in order
    rows = [
        (0, "solo\nhot\nsolo\ntail", "x0"),
        (1, "hot\nother", "x1"),
    ]
    a, b = _both_paths(spark, rows, min_df=2)
    assert a == b
    assert a[(0, "x0")] == "solo\nsolo\ntail"


def test_lines_auto_switches(spark):
    rows = [
        (0, "hot\nkeep a", "x0"),
        (1, "hot\nkeep b", "x1"),
    ]
    d = _docs(spark, rows)
    # limit 0 forces the anti-join branch; huge limit keeps broadcast
    lo = remove_boilerplate_lines(
        d, id_col="doc_id", min_df=2, strategy="auto", broadcast_limit=0
    )
    hi = remove_boilerplate_lines(
        d, id_col="doc_id", min_df=2, strategy="auto", broadcast_limit=10**9
    )
    assert _collect_clean(lo) == _collect_clean(hi)
    # the forced-anti plan must NOT contain the 1-row broadcast fold
    assert "BroadcastNestedLoopJoin" not in (
        lo._jdf.queryExecution().executedPlan().toString()
    )


# ---------------------------------------------------------------------------
# decontaminate


DECON_ROWS = [
    (0, "the quick brown fox jumps over the lazy dog", "a"),
    (1, "completely unrelated training text about spark", "b"),
    (2, "shares the quick brown fox jumps prefix only", "c"),
    (3, "quick brown fox jumps over something else entirely", "d"),
]


def _decon_both(spark, n):
    corpus = _docs(spark, DECON_ROWS)
    ev = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog and more",)], "text string"
    )
    a = decontaminate(corpus, ev, n=n, strategy="broadcast")
    b = decontaminate(corpus, ev, n=n, strategy="anti_join", id_col="doc_id")
    assert a.columns == b.columns
    key = lambda df: {(r.doc_id, r.text, r.extra) for r in df.collect()}
    return key(a), key(b)


def test_decontaminate_paths_identical(spark):
    for n in (5, 9):
        a, b = _decon_both(spark, n)
        assert a == b, n


def test_decontaminate_paths_identical_all_contaminated(spark):
    """Adversarial: every corpus doc shares a gram with the eval set
    (n=1 makes single words grams) — both paths must drop everything."""
    corpus = _docs(spark, DECON_ROWS)
    ev = spark.createDataFrame([("the unrelated fox quick",)], "text string")
    a = decontaminate(corpus, ev, n=1, strategy="broadcast")
    b = decontaminate(corpus, ev, n=1, strategy="anti_join", id_col="doc_id")
    assert a.count() == 0 and b.count() == 0


def test_decontaminate_auto_switches(spark):
    corpus = _docs(spark, DECON_ROWS)
    ev = spark.createDataFrame([("quick brown fox jumps over",)], "text string")
    lo = decontaminate(
        corpus, ev, n=5, strategy="auto", broadcast_limit=0, id_col="doc_id"
    )
    hi = decontaminate(corpus, ev, n=5, strategy="auto", broadcast_limit=10**9)
    key = lambda df: {r.doc_id for r in df.collect()}
    assert key(lo) == key(hi) == {1, 2}


def test_lines_paths_agree_on_null_text(spark):
    """NULL text must yield NULL clean_text on BOTH strategies (round-4
    self-review: the anti-join path used to coalesce NULL-text docs to
    '' while the broadcast path kept NULL)."""
    d = spark.createDataFrame(
        [(0, "hot\nkeep", "x"), (1, None, "y"), (2, "hot\nother", "z")],
        "doc_id int, text string, extra string",
    )
    a = remove_boilerplate_lines(d, id_col="doc_id", min_df=2, strategy="broadcast")
    b = remove_boilerplate_lines(d, id_col="doc_id", min_df=2, strategy="anti_join")
    ca, cb = _collect_clean(a), _collect_clean(b)
    assert ca == cb
    assert ca[(1, "y")] is None
