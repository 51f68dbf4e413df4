"""Bitext candidate mining (operators/bitext.py).

Layer 1: marker/key extraction cases (segments, params, no marker,
         non-language lookalikes).
Layer 2: pairing semantics (triples -> 3 pairs, ordering, ratio filter)
         + a sequential reference differential.
Layer 3: plan guards (scan-stage keying, bounded self-join, no python).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from anycrawl_spark.operators.bitext import (
    bitext_candidates,
    lang_marker,
    pair_key,
)

MARKER_CASES = {
    "http://a.ex/en/p/1": ("en", "http://a.ex/*/p/1"),
    "http://a.ex/de/p/1": ("de", "http://a.ex/*/p/1"),
    # marker must be a FULL segment
    "http://a.ex/end/p/1": ("", "http://a.ex/end/p/1"),
    "http://a.ex/p/en": ("", "http://a.ex/p/en"),  # no trailing slash
    # query param form
    "http://a.ex/p?lang=fr": ("fr", "http://a.ex/p?lang=*"),
    "http://a.ex/p?x=1&lang=ja": ("ja", "http://a.ex/p?x=1?lang=*"),
    # no marker at all
    "http://a.ex/p/1": ("", "http://a.ex/p/1"),
    # unknown code is not a marker
    "http://a.ex/xx/p/1": ("", "http://a.ex/xx/p/1"),
}


def test_marker_and_key(spark):
    df = spark.createDataFrame([(u,) for u in MARKER_CASES], ["url"])
    got = {
        r["url"]: (r["lang"], r["key"])
        for r in df.select(
            "url",
            lang_marker(F.col("url")).alias("lang"),
            pair_key(F.col("url")).alias("key"),
        ).collect()
    }
    for u, want in MARKER_CASES.items():
        assert got[u] == want, u


def test_pairing_and_ratio(spark):
    rows = [
        ("http://s.ex/en/p/1", "one two three four"),
        ("http://s.ex/de/p/1", "eins zwei drei"),
        ("http://s.ex/fr/p/1", "un"),
        ("http://s.ex/en/p/2", "lonely"),          # no partner
        ("http://s.ex/nolang/p/3", "dropped out"),  # no marker
    ]
    df = spark.createDataFrame(rows, ["url", "text"])
    got = {
        (r["lang_a"], r["lang_b"]): r
        for r in bitext_candidates(df, min_ratio_x100=50).collect()
        if r["key"] == "http://s.ex/*/p/1"
    }
    # three editions -> three pairs, lang_a < lang_b
    assert set(got) == {("de", "en"), ("de", "fr"), ("en", "fr")}
    de_en = got[("de", "en")]
    assert (de_en["len_a"], de_en["len_b"]) == (3, 4)
    assert de_en["ratio_x100"] == 75 and de_en["accepted"] == 1
    assert got[("de", "fr")]["ratio_x100"] == 33
    assert got[("de", "fr")]["accepted"] == 0
    # the lonely and the unmarked URL produce no pairs
    all_keys = {r["key"] for r in bitext_candidates(df).collect()}
    assert all_keys == {"http://s.ex/*/p/1"}


def test_reference_differential(spark):
    rows = []
    for g in range(30):
        for i, lang in enumerate(["en", "de", "fr", "es"][: (g % 4) + 1]):
            rows.append(
                (f"http://m.ex/{lang}/g/{g}", " ".join("w" for _ in range((g + i * 3) % 9 + 1)))
            )
    df = spark.createDataFrame(rows, ["url", "text"])
    got = {
        (r["key"], r["lang_a"], r["lang_b"]): (r["ratio_x100"], r["accepted"])
        for r in bitext_candidates(df, min_ratio_x100=60).collect()
    }
    by_group = {}
    for u, t in rows:
        lang = u.split("/")[3]
        g = u.rsplit("/", 1)[1]
        by_group.setdefault(g, []).append((lang, len(t.split())))
    want = {}
    for g, items in by_group.items():
        for (la, na), (lb, nb) in combinations(sorted(items), 2):
            ratio = (min(na, nb) * 100) // max(na, nb) if max(na, nb) else 0
            want[(f"http://m.ex/*/g/{g}", la, lb)] = (ratio, 1 if ratio >= 60 else 0)
    assert got == want


def test_plan_shape(spark):
    from anycrawl_spark.queries import q_bitext_pairs

    p = q_bitext_pairs(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in p and "InPandas" not in p
    assert "CartesianProduct" not in p and "NestedLoop" not in p
