"""Full Public Suffix List loading (web.PublicSuffixList) — parse,
wildcard / exception / multi-label matching, the Python-model fuzz, and
default-mode equivalence with the embedded subset."""

import pytest
from pyspark.sql import functions as F

from apache_cassandra_spark.analytics import web

# a REAL excerpt of the Mozilla PSL (publicsuffix.org), covering every
# rule form: 1-label, 2-label, 3+-label, wildcard, exception, comments,
# and the private-domains marker
PSL_TEXT = """\
// This Source Code Form is subject to the terms of the MPL 2.0.
// ===BEGIN ICANN DOMAINS===
com
uk
co.uk
org.uk
jp
// jp geographic
*.kawasaki.jp
!city.kawasaki.jp
us
k12.ma.us
pvt.k12.ma.us
ck
*.ck
!www.ck
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
amazonaws.com
// ===END PRIVATE DOMAINS===
"""


def _dom(spark, psl, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return [
        r["d"]
        for r in df.select(web.registrable_domain(F.col("host"), psl=psl).alias("d")).collect()
    ]


def test_parse_rule_forms():
    psl = web.PublicSuffixList.parse(PSL_TEXT)
    assert "co.uk" in psl.exact and "pvt.k12.ma.us" in psl.exact
    assert "kawasaki.jp" in psl.wild and "ck" in psl.wild
    assert "city.kawasaki.jp" in psl.exc and "www.ck" in psl.exc
    assert "amazonaws.com" in psl.exact  # private section loads by default
    assert psl.max_labels == 4  # pvt.k12.ma.us


def test_parse_icann_only_stops_at_private_marker():
    psl = web.PublicSuffixList.parse(PSL_TEXT, icann_only=True)
    assert "amazonaws.com" not in psl.exact and "co.uk" in psl.exact


def test_multi_label_plain_rules(spark):
    psl = web.PublicSuffixList.parse(PSL_TEXT)
    assert _dom(spark, psl, ["a.b.example.co.uk"]) == ["example.co.uk"]
    # 3-label suffix under a 4-label one: k12.ma.us vs pvt.k12.ma.us
    assert _dom(spark, psl, ["school.k12.ma.us"]) == ["school.k12.ma.us"]
    assert _dom(spark, psl, ["x.school.k12.ma.us"]) == ["school.k12.ma.us"]
    assert _dom(spark, psl, ["x.school.pvt.k12.ma.us"]) == ["school.pvt.k12.ma.us"]
    # longest match must win: pvt.k12.ma.us (4) over k12.ma.us (3)
    assert _dom(spark, psl, ["deep.x.school.pvt.k12.ma.us"]) == ["school.pvt.k12.ma.us"]


def test_wildcard_rules(spark):
    psl = web.PublicSuffixList.parse(PSL_TEXT)
    # *.kawasaki.jp: the suffix is <label>.kawasaki.jp
    assert _dom(spark, psl, ["sub.ward.kawasaki.jp"]) == ["sub.ward.kawasaki.jp"]
    assert _dom(spark, psl, ["x.sub.ward.kawasaki.jp"]) == ["sub.ward.kawasaki.jp"]
    # bare kawasaki.jp: wildcard needs a label to consume; jp rule applies
    assert _dom(spark, psl, ["kawasaki.jp"]) == ["kawasaki.jp"]


def test_exception_rules(spark):
    psl = web.PublicSuffixList.parse(PSL_TEXT)
    # !city.kawasaki.jp carves the city site back out of the wildcard
    assert _dom(spark, psl, ["city.kawasaki.jp"]) == ["city.kawasaki.jp"]
    assert _dom(spark, psl, ["sub.city.kawasaki.jp"]) == ["city.kawasaki.jp"]
    assert _dom(spark, psl, ["a.b.city.kawasaki.jp"]) == ["city.kawasaki.jp"]
    assert _dom(spark, psl, ["www.ck"]) == ["www.ck"]
    assert _dom(spark, psl, ["x.www.ck"]) == ["www.ck"]
    # non-exception under *.ck stays wildcarded
    assert _dom(spark, psl, ["shop.example.ck"]) == ["shop.example.ck"]


def test_bare_suffix_and_short_hosts(spark):
    psl = web.PublicSuffixList.parse(PSL_TEXT)
    # a bare suffix / single label comes back whole (embedded convention)
    assert _dom(spark, psl, ["co.uk", "com", "localhost"]) == ["co.uk", "com", "localhost"]
    # unknown TLD: implicit-* fallback = last two labels
    assert _dom(spark, psl, ["a.b.example.zz"]) == ["example.zz"]


def test_load_from_file(tmp_path, spark):
    p = tmp_path / "public_suffix_list.dat"
    p.write_text(PSL_TEXT, encoding="utf-8")
    psl = web.PublicSuffixList.load(str(p))
    assert _dom(spark, psl, ["a.example.co.uk"]) == ["example.co.uk"]


def test_default_mode_unchanged_on_two_label_hosts(spark):
    """corpus_domain_stats' contract: with psl=None the expression is the
    embedded-subset chain; on hosts whose suffixes are in the embedded
    set a full PSL containing those rules agrees exactly."""
    psl = web.PublicSuffixList.parse("com\nuk\nco.uk\norg.uk\nnet\n")
    hosts = ["news.example.com", "a.b.site.co.uk", "example.org.uk", "x.net", "plain"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    default = [r["d"] for r in df.select(web.registrable_domain(F.col("host")).alias("d")).collect()]
    full = _dom(spark, psl, hosts)
    assert default == full


def _py_psl_model(psl, host):
    """Independent Python model of the PSL algorithm (the spec's
    wording, not the Spark expression's)."""
    labels = host.split(".")
    n = len(labels)
    for k in range(n, 0, -1):  # exceptions: longest wins
        cand = ".".join(labels[n - k:])
        if cand in psl.exc:
            return cand
    best = 1  # implicit *
    for k in range(1, n + 1):
        cand = ".".join(labels[n - k:])
        if cand in psl.exact:
            best = max(best, k)
        if k >= 2 and ".".join(labels[n - (k - 1):]) in psl.wild:
            best = max(best, k)
    take = min(best + 1, n)
    return ".".join(labels[n - take:])


def test_psl_fuzz_vs_python_model(spark):
    import itertools
    import random

    rnd = random.Random(11)
    psl = web.PublicSuffixList.parse(PSL_TEXT)
    atoms = ["a", "b", "city", "www", "ward", "kawasaki", "jp", "co", "uk",
             "pvt", "k12", "ma", "us", "ck", "com", "example", "zz"]
    hosts = [".".join(rnd.choices(atoms, k=rnd.randint(1, 6))) for _ in range(300)]
    hosts += ["city.kawasaki.jp", "x.city.kawasaki.jp", "www.ck", "a.www.ck"]
    got = _dom(spark, psl, hosts)
    want = [_py_psl_model(psl, h) for h in hosts]
    assert got == want
