"""Unit tests for the scalar function library (SURVEY §5.1): ip<->long,
authority-domain extraction (incl. last-match and fallback), token and
text stats. Semantics pinned against the reference implementations
(Utils.scala:62-99, Constant.scala:10-18, DNSUtils.scala:39)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dnsflow_clickhouse_spark.functions.domains import (
    authority_domain,
    is_junk_domain,
    strip_scheme,
)
from dnsflow_clickhouse_spark.functions.net import first_octet, ip_to_long, long_to_ip
from dnsflow_clickhouse_spark.functions.textfn import (
    non_alnum_ratio,
    poly_hash,
    stopword_ratio,
    token_count,
)


def _eval(spark, col, values, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r[0] for r in df.select(col).collect()]


# --- reference parity: ipToLong (Utils.scala:82-99) ---


def test_ip_to_long(spark):
    vals = ["1.2.3.4", "0.0.0.0", "255.255.255.255", "10.0.0.1", "bogus", "1.2.3", "", "1.2.3.x"]
    out = _eval(spark, ip_to_long(F.col("v")), vals)
    assert out == [
        (1 << 24) + (2 << 16) + (3 << 8) + 4,
        0,
        (1 << 32) - 1,
        (10 << 24) + 1,
        0,
        0,
        0,
        0,
    ]


def test_long_to_ip_roundtrip(spark):
    vals = ["1.2.3.4", "255.0.255.1", "0.0.0.0", "192.168.1.254"]
    out = _eval(spark, long_to_ip(ip_to_long(F.col("v"))), vals)
    assert out == vals


def test_first_octet(spark):
    assert _eval(spark, first_octet(F.col("v")), ["223.5.5.5", "8.8.8.8"]) == [223, 8]


# --- reference parity: domian2Authority (Utils.scala:62-77) ---


def test_authority_domain_basic(spark):
    cases = {
        "www.baidu.com": "baidu.com",
        "a.b.qq.com": "qq.com",
        "foo.example.org.cn": "example.org.cn",
        "x.co": "x.co",
        "service.gov.cn": "service.gov.cn",
        "nomatch.zzz": "nomatch.zzz",  # fallback: whole domain
        "plain": "plain",
    }
    out = _eval(spark, authority_domain(F.col("v")), list(cases))
    assert out == list(cases.values())


def test_authority_domain_last_match(spark):
    # the reference keeps the LAST regex match (while find() loop,
    # Utils.scala:67-71): for a domain embedding two candidate matches the
    # later one must win.
    out = _eval(spark, authority_domain(F.col("v")), ["a.com.cn.b.com.cn"])
    # token chars include '.'-separated labels only; last match is "b.com.cn"
    assert out == ["b.com.cn"]


def test_strip_scheme(spark):
    out = _eval(
        spark, strip_scheme(F.col("v")), ["http://a.com", "https://b.net", "c.org"]
    )
    assert out == ["a.com", "b.net", "c.org"]


def test_junk_domain_filter(spark):
    junk = ["", "master01.local", "host.localdomain", "a b.com", "xDHCP", "myHOST", "Relteak1", "getCached2", "BlinkAP3"]
    ok = ["www.baidu.com", "qq.com"]
    out = _eval(spark, is_junk_domain(F.col("v")), junk + ok)
    assert out == [True] * len(junk) + [False] * len(ok)


# --- text stats ---


def test_token_count(spark):
    out = _eval(spark, token_count(F.col("v")), ["a b  c", "", "   ", "one"])
    assert out == [3, 0, 0, 1]


def test_stopword_ratio(spark):
    out = _eval(spark, stopword_ratio(F.col("v")), ["the cat sat", "dog", ""])
    assert out[0] == 1 / 3 and out[1] == 0.0 and out[2] == 0.0


def test_non_alnum_ratio(spark):
    out = _eval(spark, non_alnum_ratio(F.col("v")), ["ab!!", "", "abcd"])
    assert out == [0.5, 0.0, 0.0]


def test_poly_hash_deterministic_and_portable(spark):
    # matches a pure-python replay of the same fold
    def py_poly(s, seed=0, mult=31, mod=1_000_000_007):
        h = seed
        for ch in s:
            h = (h * mult + ord(ch)) % mod
        return h

    vals = ["", "a", "hello world", "Zürich"[:4]]
    out = _eval(spark, poly_hash(F.col("v")), vals)
    assert out == [py_poly(v) for v in vals]


# --- reference parity: isInRange / netmask helpers (IpUtil.java:13-60) ---


def test_is_in_range_cidr(spark):
    from dnsflow_clickhouse_spark.functions.net import is_in_range

    # vectors checked against the Java mask arithmetic in IpUtil.java:13-25
    cases = [
        ("192.168.8.3", "192.168.9.10/22", True),   # the doc example
        ("192.168.12.0", "192.168.9.10/22", False),
        ("10.0.0.1", "10.0.0.0/8", True),
        ("11.0.0.1", "10.0.0.0/8", False),
        ("218.108.248.200", "218.108.248.192/26", True),   # DnsRptCH.scala:889
        ("218.108.249.0", "218.108.248.192/26", False),
        ("1.2.3.4", "1.2.3.4/32", True),
        ("1.2.3.5", "1.2.3.4/32", False),
        # Java quirk: /0 masks with 0xFFFFFFFF << 32 == identity mask
        ("9.9.9.9", "8.8.8.8/0", False),
        ("8.8.8.8", "8.8.8.8/0", True),
    ]
    df = spark.createDataFrame(cases, "ip string, cidr string, want boolean")
    got = df.select(is_in_range("ip", "cidr").alias("got"), "want").collect()
    for r in got:
        assert r["got"] == r["want"]


def test_cidr_bounds_and_count(spark):
    from pyspark.sql import functions as F

    from dnsflow_clickhouse_spark.functions.net import (
        cidr_bounds,
        cidr_ip_count,
        long_to_ip,
    )

    df = spark.createDataFrame(
        [("192.168.9.10/22",), ("10.1.2.3/8",), ("1.2.3.4/32",)], "cidr string"
    )
    out = df.select(
        long_to_ip(cidr_bounds("cidr")["lo"]).alias("lo"),
        long_to_ip(cidr_bounds("cidr")["hi"]).alias("hi"),
        cidr_ip_count("cidr").alias("n"),
    ).collect()
    assert [tuple(r) for r in out] == [
        ("192.168.8.0", "192.168.11.255", 1 << 10),
        ("10.0.0.0", "10.255.255.255", 1 << 24),
        ("1.2.3.4", "1.2.3.4", 1),
    ]


def test_normalize_text(spark):
    from dnsflow_clickhouse_spark.functions.textfn import normalize_text

    df = spark.createDataFrame(
        [
            ("  Hello,   WORLD!!  ",),
            ("hello world",),
            ("Hello... world?",),
            ("",),
        ],
        ["t"],
    )
    got = [r[0] for r in df.select(normalize_text("t")).collect()]
    assert got == ["hello world", "hello world", "hello world", ""]


def test_normalize_text_fused_regex_equals_textbook_form(spark):
    """Permanent pin for the r9 hot-path rewrite: the fused single
    regex ``[^a-z0-9]+ -> " "`` must equal the textbook two-pass form
    (``[^a-z0-9\\s]`` -> " " per char, then ``\\s+`` collapse, then
    trim) on an adversarial battery — the forms are equivalent because
    any maximal run of non-[a-z0-9] characters (punctuation and
    whitespace interleaved) becomes exactly one space either way, and
    leading/trailing runs trim identically. The fused form measured 51x
    faster over 1.28M docs (SCALE_SMOKE.md r9); this test keeps any
    future edit honest against the reference semantics."""
    import pyspark.sql.functions as F

    from dnsflow_clickhouse_spark.functions.textfn import normalize_text

    battery = [
        "  Hello,   WORLD!!  ",
        "a.b", "a. b", "a .b", "a\t.\nb", "a..b", ". .",
        "...", "", " ", "\t\n\x0b\f\r", "_",
        "tabs\tand\nnewlines\x0band\fforms\rand spaces",
        "Héllo café naïve",          # accented letters -> space
        "nbsp\u00a0here", "em\u2014dash", "emoji\U0001f600x",
        "combining e\u0301 accent",  # combining mark -> space
        "zero\u200bwidth", "cjk\u6f22\u5b57mix",
        "CTRL\x01\x02chars", "del\x7fchar",
        "digits123MIXED456case",
        "trailing punct!!!", "!!!leading punct",
        "x" * 500 + "," + "y" * 500,
        ",".join(["w"] * 200),
        "a" + " " * 300 + "b", "a" + "." * 300 + "b",
    ]
    df = spark.createDataFrame([(s,) for s in battery], ["t"])
    c = F.lower(F.col("t"))
    textbook = F.trim(
        F.regexp_replace(F.regexp_replace(c, r"[^a-z0-9\s]", " "), r"\s+", " ")
    )
    out = df.select(
        normalize_text("t").alias("fused"), textbook.alias("textbook")
    ).collect()
    for row, s in zip(out, battery):
        assert row.fused == row.textbook, (s, row.fused, row.textbook)


def test_round6_is_engine_portable_on_half_boundaries(spark):
    """Spark's round() HALF_UPs the shortest decimal STRING of a double
    ("0.5006875" -> 0.500688) while DuckDB and python round the actual
    double (0.50068749999... -> 0.500687) — caught live at sf0.1 on 3
    quality scores. _round6 must agree with the numeric-value rounding
    in all three engines on exactly these boundary doubles."""
    import math

    import duckdb

    from dnsflow_clickhouse_spark.operators.text_analysis import _round6

    vals = [0.5006875, 0.1234565, 0.9999995, 0.2500005, 0.0, 1.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r["y"] for r in df.select(_round6(F.col("x")).alias("y")).collect()
    ]
    want_py = [math.floor(v * 1e6 + 0.5) / 1e6 for v in vals]
    want_duck = [
        duckdb.sql(
            f"SELECT floor(CAST({v!r} AS DOUBLE) * 1000000 + 0.5) / 1000000"
        ).fetchone()[0]
        for v in vals
    ]
    assert got == want_py == want_duck
    # and the old F.round really does diverge on the first value — the
    # reason _round6 exists (if Spark ever fixes this, revisit)
    diverges = (
        df.limit(1).select(F.round(F.lit(0.5006875), 6).alias("r")).collect()
    )
    assert diverges[0]["r"] == 0.500688 != want_py[0]
