"""HTML → text extraction (round 5): the JVM chain vs a clean-room
python extractor on adversarial snippets, plus the Spark↔DuckDB mirror
on the same strings."""

import re

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_read_enhanced_spark.functions.html import (
    anchor_text_col,
    anchor_text_sql,
    html_stats_cols,
    html_to_text_col,
    html_to_text_sql,
)

CASES = [
    "<p>hello <b>world</b></p>",
    "<SCRIPT>var a = 1 < 2 && b > 0;</SCRIPT>after",
    "<style media='x'>p > a {color:red}</style>text",
    "<!-- a <b> comment -->kept",
    "a &amp;lt; b",                      # must yield the LITERAL '&lt;'
    "x &lt;tag&gt; &quot;q&quot; &#39;s &nbsp; y",
    "<a href='/x'>one</a> mid <A HREF='/y'>two &amp; three</A>",
    "no markup at all",
    "",
    "<div\nclass='m'>multi\nline</div>",
    "<script src='x'/>selfclose</script>tail",
    "unterminated <b",
]


def _python_reference(html: str) -> str:
    """Clean-room second implementation (stdlib re, same contract)."""
    out = re.sub(r"(?s)<!--.*?-->", " ", html)
    out = re.sub(r"(?is)<script\b[^>]*>.*?</script>", " ", out)
    out = re.sub(r"(?is)<style\b[^>]*>.*?</style>", " ", out)
    out = re.sub(r"(?s)<[^>]*>", " ", out)
    for ent, rep in [
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ]:
        out = out.replace(ent, rep)
    return re.sub(r"\s+", " ", out).strip()


def test_extraction_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(CASES)], "i long, html string"
    )
    got = {
        r.i: r.t
        for r in df.select("i", html_to_text_col(F.col("html")).alias("t")).collect()
    }
    for i, h in enumerate(CASES):
        assert got[i] == _python_reference(h), (i, h, got[i])


def test_duckdb_mirror_identical(spark):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(CASES)], "i long, html string"
    )
    got = [
        (r.i, r.t, r.at)
        for r in df.select(
            "i",
            html_to_text_col(F.col("html")).alias("t"),
            anchor_text_col(F.col("html")).alias("at"),
        ).orderBy("i").collect()
    ]
    con = duckdb.connect()
    con.register("h", pd.DataFrame({"i": range(len(CASES)), "html": CASES}))
    ora = con.execute(
        f"SELECT i, {html_to_text_sql('html')} AS t, "
        f"{anchor_text_sql('html')} AS at FROM h ORDER BY i"
    ).fetchall()
    assert got == [tuple(r) for r in ora]


def test_boilerplate_flags(spark):
    rows = [
        (1, "<nav>" + "<a href='/'>Home</a>" * 8 + "</nav><p>hi</p>"),
        (2, "<p>" + "substantial real content here " * 10 + "</p><a href='x'>l</a>"),
        (3, "<p>tiny</p>"),
    ]
    df = spark.createDataFrame(rows, "i long, html string")
    s = html_stats_cols(F.col("html"))
    out = {
        r.i: (r.bp, r.n)
        for r in df.select(
            "i", s["is_boilerplate"].alias("bp"), s["n_links"].alias("n")
        ).collect()
    }
    assert out[1] == (True, 8)     # link-dominated
    assert out[2] == (False, 1)    # real content
    assert out[3][0] is True       # too short
