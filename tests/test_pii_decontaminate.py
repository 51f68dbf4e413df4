"""PII redaction (functions/pii.py) + benchmark decontamination
(operators/decontaminate.py).

Verification layers:
1. Category semantics on crafted strings — each pattern hits its shape,
   the redaction ORDER prevents cross-category double-counting (cards are
   not phones, IPs are not phones, email local-parts are not digit runs),
   and redaction is idempotent (placeholders contain no redactable spans).
2. DIALECT DIFFERENTIAL: the same patterns run under Java regex (Spark)
   and RE2 (DuckDB) over a generated hostile population — counts and the
   redacted bytes must agree exactly, because the DuckDB oracle for
   q_pii_redact assumes dialect agreement.
3. Decontamination semantics on planted frames: a doc containing the
   benchmark snippet verbatim (anywhere) is flagged with the right gram
   count; shorter-than-n texts never match; remove_contaminated drops
   exactly the flagged docs.
4. Plan shape: the PII query is pure JVM (no Python, no exchange); the
   decontamination join broadcasts the benchmark side.
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from anycrawl_spark.functions.pii import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
    sql_pii_counts,
    sql_redact_pii,
)
from anycrawl_spark.operators.decontaminate import (
    contaminated_docs,
    ngrams,
    remove_contaminated,
)


def _run(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    out = df.select(
        F.col("t"),
        *[c.cast("long") for c in pii_counts(F.col("t"))],
        redact_pii(F.col("t")).alias("redacted"),
    )
    return {r["t"]: r for r in out.collect()}


# ---------------------------------------------------------------- layer 1


def test_each_category_and_order(spark):
    rows = _run(spark, [
        "mail me at a.b+c_1%d@sub.example.co right away",
        "card 4111 1111 1111 1234 on file",
        "card 4111-1111-1111-1234 on file",
        "origin 192.168.001.1 logged",
        "call +1-415-555-0123 now",
        "call (415) 555-0123 now",
        "plain text with no pii at all",
        "v1.2.3 released in 2024",  # version strings / years stay
    ])
    r = rows["mail me at a.b+c_1%d@sub.example.co right away"]
    assert (r["n_email"], r["n_card"], r["n_ip"], r["n_phone"]) == (1, 0, 0, 0)
    assert r["redacted"] == "mail me at <EMAIL> right away"
    for t in ("card 4111 1111 1111 1234 on file", "card 4111-1111-1111-1234 on file"):
        r = rows[t]
        # a 16-digit card is ALSO a long digit run: order must stop the
        # phone pattern from seeing it
        assert (r["n_card"], r["n_phone"]) == (1, 0)
        assert r["redacted"] == "card <CARD> on file"
    r = rows["origin 192.168.001.1 logged"]
    assert (r["n_ip"], r["n_phone"]) == (1, 0)
    assert r["redacted"] == "origin <IP> logged"
    for t in ("call +1-415-555-0123 now", "call (415) 555-0123 now"):
        assert rows[t]["n_phone"] == 1
        assert "<PHONE>" in rows[t]["redacted"]
    r = rows["plain text with no pii at all"]
    assert (r["n_email"], r["n_card"], r["n_ip"], r["n_phone"]) == (0, 0, 0, 0)
    assert r["redacted"] == "plain text with no pii at all"
    r = rows["v1.2.3 released in 2024"]
    assert (r["n_card"], r["n_ip"], r["n_phone"]) == (0, 0, 0)


def test_redaction_idempotent(spark):
    once = _run(spark, ["x u@v.io 10.0.0.1 4111 1111 1111 1111 +12345678901 y"])
    red = next(iter(once.values()))["redacted"]
    twice = _run(spark, [red])
    assert next(iter(twice.values()))["redacted"] == red


# ---------------------------------------------------------------- layer 2


def _hostile_population(n=300, seed=11):
    """Strings biased toward pattern boundaries: digit runs of every
    length, dotted quads with out-of-range octets, emails with odd local
    parts, separators in wrong places."""
    rng = np.random.default_rng(seed)
    frags = [
        "a@b.co", "a@b.c", "@no.local", "x@y", "a.b@c.d.ee", "u%p@d.org",
        "1.2.3.4", "999.999.999.999", "1.2.3", "1.2.3.4.5", "10.0.0.1:8080",
        "4111111111111111", "4111 1111 1111 1111", "4111-1111-1111-111",
        "12345678", "123456789012345678", "+1234567", "+12 (34) 56-78-90",
        "(12)34.56.78", "1-2", "...", "+-+", "a1b2c3", "2024-01-01",
        "127.0.0.1", "+861234567890123", "tel:555-0100", " .5.5.5.5. ",
    ]
    out = []
    for _ in range(n):
        k = int(rng.integers(1, 6))
        picks = [frags[int(rng.integers(0, len(frags)))] for _ in range(k)]
        sep = [" ", "", ",", " x "][int(rng.integers(0, 4))]
        out.append(sep.join(picks))
    return out


def test_dialect_differential_java_vs_re2(spark):
    texts = _hostile_population()
    got = _run(spark, texts)
    con = duckdb.connect()
    counts = ", ".join(sql_pii_counts("t"))
    red = sql_redact_pii("t")
    for t in texts:
        lit = t.replace("'", "''")
        em, cc, ip, ph, redacted = con.execute(
            f"SELECT {counts}, {red} FROM (SELECT '{lit}' AS t)"
        ).fetchone()
        r = got[t]
        assert (r["n_email"], r["n_card"], r["n_ip"], r["n_phone"]) == \
            (em, cc, ip, ph), t
        assert r["redacted"] == redacted, t


# ---------------------------------------------------------------- layer 3


def test_ngrams_short_text_and_boundaries(spark):
    df = spark.createDataFrame(
        [("a b c d e f g h",), ("a b c",), ("  a  b c d e f g h i  ",)], ["t"]
    )
    rows = df.select(F.size(ngrams(F.col("t"), 8)).alias("n")).collect()
    assert [r["n"] for r in rows] == [1, 0, 2]


def test_decontaminate_planted(spark):
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog today",)], ["snippet"]
    )  # 10 tokens -> 3 8-grams
    docs = spark.createDataFrame(
        [
            # contains the full snippet mid-text -> all 3 grams hit
            (1, "intro words the quick brown fox jumps over the lazy dog today and more"),
            # contains only the first 8 tokens -> 1 gram
            (2, "x the quick brown fox jumps over the lazy y"),
            # same words, different order -> no grams
            (3, "dog lazy the over jumps fox brown quick the today"),
            # too short
            (4, "quick brown fox"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["n_contaminated_grams"]
           for r in contaminated_docs(docs, bench, n=8).collect()}
    assert out == {1: 3, 2: 1}
    kept = sorted(r["doc_id"] for r in remove_contaminated(docs, bench, n=8).collect())
    assert kept == [3, 4]


def test_decontaminate_case_and_whitespace_insensitive(spark):
    bench = spark.createDataFrame([("A B C D E F G H",)], ["snippet"])
    docs = spark.createDataFrame([(7, "z  a b C d E f g h  z")], ["doc_id", "text"])
    out = contaminated_docs(docs, bench, n=8).collect()
    assert len(out) == 1 and out[0]["n_contaminated_grams"] == 1


# ---------------------------------------------------------------- layer 4


def test_plan_shapes(spark):
    from anycrawl_spark.queries import q_decontaminate, q_pii_redact

    p = q_pii_redact(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in p, "PII redaction must be a pure scan-stage map"
    assert "Python" not in p and "InPandas" not in p, "PII must stay JVM-side"

    p = q_decontaminate(spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in p, "benchmark gram set must broadcast"
    assert "SortMergeJoin" not in p
