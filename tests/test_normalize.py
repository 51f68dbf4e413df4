"""Dedup-key text normalization (functions/normalize.py).

Verification layers:
1. Hand-derived goldens (NORMALIZE_FIXTURES) — each expectation justified
   against the Unicode rules, also consumed by the q_normalize_text oracle.
2. NFKC DIFFERENTIAL vs the JVM's independent implementation
   (java.text.Normalizer via the running SparkSession's py4j gateway):
   Python's unicodedata and ICU/OpenJDK must agree on every fixture and on
   a generated population of compat-form-heavy strings. (Both track the
   Unicode standard; the population sticks to long-stable blocks so a
   Unicode-version skew between Python 3.11 and Java 17 cannot flake.)
3. Step toggles, idempotence, and the dedup-key composition: exact dedup
   over the normalized key collapses case/accent/digit variants that
   distinct raw texts would miss.
4. Plan shape: one Arrow pass, no exchange.
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from anycrawl_spark.functions.normalize import (
    NORMALIZE_FIXTURES,
    normalize_text,
    normalized_dedup_key,
    strip_accents,
    with_normalized,
)


# ---------------------------------------------------------------- layer 1


@pytest.mark.parametrize("raw,expected", NORMALIZE_FIXTURES)
def test_fixture_goldens(raw, expected):
    assert normalize_text(raw) == expected


def test_none_and_empty():
    assert normalize_text(None) == ""
    assert normalize_text("") == ""
    assert normalize_text("   \t\n ") == ""


def test_idempotent():
    for raw, _ in NORMALIZE_FIXTURES:
        once = normalize_text(raw)
        assert normalize_text(once) == once


# ---------------------------------------------------------------- layer 2


_COMPAT_HEAVY = (
    # long-stable blocks: fullwidth forms, latin-1 accents, ligatures,
    # digraphs, circled/parenthesized alnum, vulgar fractions, squared
    # units, roman numerals, superscripts
    "ＡＢＣａｂｃ０１２３４５６７８９！？（）：；"
    "ÀÁÂÃÄÅàáâãäåÈÉÊËèéêëÌÍÎÏìíîïÒÓÔÕÖòóôõöÙÚÛÜùúûüÝýÿÑñÇç"
    "ﬀﬁﬂﬃﬄﬅﬆǄǅǆǇǈǉǊǋǌ"
    "①②③⑴⑵⑶⒜⒝⒞㎏㎞㎡№™"
    "½⅓¼⅕⅙⅛ⅠⅡⅢⅳ⁰¹²³⁴ₐₑₒ"
    " \xa0  　abc XYZ mix"
)


def _java_nfkc(spark, s: str) -> str:
    jvm = spark.sparkContext._jvm
    form = jvm.java.text.Normalizer.Form.valueOf("NFKC")
    return jvm.java.text.Normalizer.normalize(s, form)


def test_nfkc_differential_vs_jvm(spark):
    import unicodedata

    pool = _COMPAT_HEAVY
    rng = np.random.default_rng(5)
    samples = ["".join(pool[int(i)] for i in rng.integers(0, len(pool), 24))
               for _ in range(120)]
    samples += [raw for raw, _ in NORMALIZE_FIXTURES] + [pool]
    for s in samples:
        assert unicodedata.normalize("NFKC", s) == _java_nfkc(spark, s), repr(s)


# ---------------------------------------------------------------- layer 3


def test_step_toggles():
    s = "Café 42 — OK"
    assert normalize_text(s, lowercase=False) == 'Cafe 00 - OK'
    assert normalize_text(s, digits=False) == "cafe 42 - ok"
    assert normalize_text(s, accents=False) == "café 00 - ok"
    assert normalize_text(s, punct=False) == "cafe 00 — ok"
    assert normalize_text(s, whitespace=False) == "cafe 00 - ok"
    assert normalize_text("a  b", whitespace=False) == "a  b"


def test_strip_accents_keeps_base_letters():
    assert strip_accents("ĝŭñëç") == "gunec"
    assert strip_accents("plain") == "plain"


def test_dedup_key_collapses_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello World 2024"),
            (2, "hello   world 9999"),   # case/ws/digit variant -> same key
            (3, "héllo wörld 1111"),     # accents too
            (4, "goodbye world 2024"),   # different content -> different key
        ],
        ["doc_id", "text"],
    )
    keys = {r["doc_id"]: r["dedup_key"]
            for r in normalized_dedup_key(df).collect()}
    assert keys[1] == keys[2] == keys[3]
    assert keys[4] != keys[1]


# ---------------------------------------------------------------- layer 4


def test_plan_one_arrow_pass_no_exchange(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = with_normalized(df)._jdf.queryExecution().executedPlan().toString()
    assert p.count("ArrowEvalPython") == 1
    assert "Exchange" not in p
