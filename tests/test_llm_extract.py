"""X13 LLM structured extraction — schema normalization, prompt building,
JS-semantics merge, cost tracking, and the Spark chunk->generate->merge
dataflow. Mirrors the reference's test coverage at
packages/ai/src/__tests__/llmExtract.test.ts (chunking analysis, simple /
complex / array-input extraction, cost tracking + limits) with the mocked
generator standing in for the model call."""

import json
import math

import pytest

from anycrawl_spark.operators.llm_extract import (
    CostLimitExceeded,
    CostTracking,
    EXTRACT_SYSTEM_PROMPT,
    build_extraction_prompt,
    calculate_cost,
    count_tokens_est,
    create_field_prompt,
    deduplicate_array,
    llm_extract,
    merge_results,
    mock_generate,
    normalize_schema,
    remove_default_property,
)

# the reference test's simpleSchema / companySchema shapes
SIMPLE_SCHEMA = {
    "type": "object",
    "properties": {
        "companyName": {"type": "string", "description": "Name of the company"},
        "industry": {"type": "string"},
        "founded": {"type": "integer", "default": 2000},
    },
}

COMPANY_SCHEMA = {
    "type": "object",
    "properties": {
        "company": {"type": "string"},
        "contact": {
            "type": "object",
            "properties": {"email": {"type": "string"}, "phone": {"type": "string"}},
        },
        "services": {"type": "array", "items": {"type": "string"}},
        "funding": {
            "type": "object",
            "properties": {
                "amount": {"type": "string"},
                "round": {"type": "string"},
                "year": {"type": "string"},
            },
        },
        "employees": {"type": "number"},
    },
}


# ----------------------------------------------- schema normalization (ts:9-71)

def test_remove_default_recursive():
    s = {"default": 1, "a": {"default": [2], "b": 3}, "c": [{"default": 4, "d": 5}]}
    assert remove_default_property(s) == {"a": {"b": 3}, "c": [{"d": 5}]}


def test_normalize_strips_defaults_and_forces_additional_false():
    norm = normalize_schema(SIMPLE_SCHEMA)
    assert norm["additionalProperties"] is False
    assert "default" not in norm["properties"]["founded"]


def test_normalize_wraps_bare_array_schema():
    arr = {"type": "array", "items": {"type": "string"}}
    norm = normalize_schema(arr)
    assert norm["type"] == "object"
    assert norm["required"] == ["items"]
    assert norm["additionalProperties"] is False
    assert norm["properties"]["items"]["type"] == "array"


def test_normalize_expands_typeless_shorthand():
    # {field: subschema} with no top-level type -> all-required object
    short = {"name": {"type": "string"}, "tags": {"type": "array", "items": {"type": "string"}}}
    norm = normalize_schema(short)
    assert norm["type"] == "object"
    assert norm["required"] == ["name", "tags"]
    assert norm["properties"]["name"]["type"] == "string"


def test_normalize_nested_objects_all_get_additional_false():
    norm = normalize_schema(COMPANY_SCHEMA)
    assert norm["additionalProperties"] is False
    assert norm["properties"]["contact"]["additionalProperties"] is False
    assert norm["properties"]["funding"]["additionalProperties"] is False


def test_normalize_respects_explicit_additional_true():
    # enforceAdditionalFalse only fills in undefined, never overwrites
    s = {"type": "object", "properties": {}, "additionalProperties": True}
    assert normalize_schema(s)["additionalProperties"] is True


# ------------------------------------------------- field prompt (ts:177-206)

def test_field_prompt_flat_and_nested():
    norm = normalize_schema(COMPANY_SCHEMA)
    fp = create_field_prompt(norm)
    assert "- company (string):" in fp
    assert "- contact (object):" in fp
    assert "    - email (string):" in fp  # nested indent
    assert "- services (array of strings):" in fp
    assert "- employees (number):" in fp


def test_field_prompt_array_of_objects_recurses():
    s = {
        "type": "object",
        "properties": {
            "people": {
                "type": "array",
                "items": {"type": "object", "properties": {"name": {"type": "string"}}},
            }
        },
    }
    fp = create_field_prompt(normalize_schema(s))
    assert "- people (array of objects):" in fp
    assert "    - name (string):" in fp


def test_prompt_assembly_with_and_without_user_prompt():
    p = build_extraction_prompt("CONTENT", " fields", None)
    assert p.endswith("\n\nContent:\nCONTENT")
    q = build_extraction_prompt("C", "", "get the title")
    assert "User request: get the title." in q


# ----------------------------------------------------- merge (ts:214-262)

def test_merge_single_result_passthrough():
    assert merge_results([{"a": 1}]) == {"a": 1}
    assert merge_results([]) is None
    # length checks run BEFORE null filtering (LLMExtract.ts:212-213,
    # node-fuzz-verified): a single null passes through as null, but TWO
    # nulls reach the merge loop and produce the empty merged object
    assert merge_results([None]) is None
    assert merge_results([None, None]) == {}


def test_merge_first_truthy_primitive_wins():
    out = merge_results([{"a": "", "b": 0}, {"a": "x", "b": 7}, {"a": "y", "b": 8}])
    assert out == {"a": "x", "b": 7}


def test_merge_js_falsy_overwritten_but_truthy_kept():
    # false/0/''/NaN are overwritten; a later falsy never displaces a truthy
    out = merge_results([{"f": False}, {"f": True}, {"f": False}])
    assert out == {"f": True}
    out = merge_results([{"n": float("nan")}, {"n": 3.5}])
    assert out == {"n": 3.5}


def test_merge_none_values_skipped():
    # null results never overwrite (ts: `if (value === null) continue`-shape)
    out = merge_results([{"a": "x"}, {"a": None}])
    assert out == {"a": "x"}


def test_merge_arrays_dedup_concat_in_order():
    out = merge_results([{"t": ["a", "b"]}, {"t": ["b", "c"]}, {"t": ["a", "d"]}])
    assert out == {"t": ["a", "b", "c", "d"]}


def test_merge_empty_array_is_truthy_not_overwritten():
    # JS [] is truthy: a later scalar must NOT replace it, later array concats
    out = merge_results([{"t": []}, {"t": ["x"]}])
    assert out == {"t": ["x"]}


def test_merge_objects_shallow_merge_last_wins():
    out = merge_results([{"o": {"a": 1, "b": 2}}, {"o": {"b": 9, "c": 3}}])
    assert out == {"o": {"a": 1, "b": 9, "c": 3}}


def test_merge_mixed_array_object_takes_js_spread_path():
    # JS typeof [] === 'object', so LLMExtract.ts:229 spreads the array into
    # the object with index-string keys: {...['a','b'], ...{x: 1}}
    out = merge_results([{"k": ["a", "b"]}, {"k": {"x": 1}}])
    assert out == {"k": {"0": "a", "1": "b", "x": 1}}
    # reversed: object first, array spread last — index keys win on collision
    out = merge_results([{"k": {"0": "z", "x": 1}}, {"k": ["a"]}])
    assert out == {"k": {"0": "a", "x": 1}}


def test_dedup_array_json_keyed_for_dicts():
    arr = [{"a": 1}, {"a": 1}, {"a": 2}, "x", "x"]
    assert deduplicate_array(arr) == [{"a": 1}, {"a": 2}, "x"]


# ------------------------------------------------- cost tracking / tokens

def test_token_estimate_is_ceil_len_over_4():
    assert count_tokens_est("") == 0
    assert count_tokens_est("abcd") == 1
    assert count_tokens_est("abcde") == 2


def test_cost_tracking_accumulates_and_limits():
    ct = CostTracking(limit=0.001)
    ct.add_call(0.0004, 100, 50)
    assert ct.total_cost() == pytest.approx(0.0004)
    assert ct.total_tokens() == (100, 50, 150)
    with pytest.raises(CostLimitExceeded, match="Cost limit exceeded"):
        ct.add_call(0.0008, 200, 100)


def test_calculate_cost_unknown_model_is_zero():
    assert calculate_cost(100, 50, "invalid-model-id") == 0.0
    assert calculate_cost(100, 50) == pytest.approx(1e-4 + 1e-4)


# ------------------------------------------------------- mock generator

def test_mock_generate_deterministic_and_schema_shaped():
    norm = normalize_schema(COMPANY_SCHEMA)
    a = mock_generate(norm, "some content")
    b = mock_generate(norm, "some content")
    assert a == b
    assert set(a) == {"company", "contact", "services", "funding", "employees"}
    assert isinstance(a["services"], list) and 1 <= len(a["services"]) <= 2
    assert isinstance(a["contact"], dict) and set(a["contact"]) == {"email", "phone"}
    assert isinstance(a["employees"], float)
    c = mock_generate(norm, "other content")
    assert c != a  # content-sensitive


# ------------------------------------------------- Spark dataflow (e2e)

CONTRACT_LIKE_SCHEMA = {
    "type": "object",
    "properties": {
        "title": {"type": "string"},
        "count": {"type": "integer"},
        "flag": {"type": "boolean"},
        "tags": {"type": "array", "items": {"type": "string"}},
        "author": {"type": "object", "properties": {"name": {"type": "string"}}},
    },
}


def _sequential_extract(doc_id, text, schema, max_tokens_input, chunk_overlap):
    """Independent sequential mirror of llm_extract for one document: chunk
    by whitespace-token windows, mock-generate per chunk, merge, account."""
    norm = normalize_schema(schema)
    toks = text.split()
    if len(toks) <= max_tokens_input:
        chunks = [text]
    else:
        stride = max_tokens_input - chunk_overlap
        n = math.ceil(max(len(toks) - chunk_overlap, 1) / stride)
        chunks = [
            " ".join(toks[i * stride : i * stride + max_tokens_input]) for i in range(n)
        ]
    field_prompt = create_field_prompt(norm)
    const_len = len(build_extraction_prompt("", field_prompt, None)) + len(
        EXTRACT_SYSTEM_PROMPT
    )
    results, tin, tout = [], 0, 0
    for c in chunks:
        r = mock_generate(norm, c)
        results.append(r)
        tin += math.ceil((len(c) + const_len) / 4)
        tout += math.ceil(len(json.dumps(r, separators=(",", ":"))) / 4)
    merged = merge_results(results)
    cost = 1e-6 * tin + 2e-6 * tout
    return {
        "doc_id": doc_id,
        "data": merged,
        "chunks": len(chunks),
        "tokens_input": tin,
        "tokens_output": tout,
        "tokens_total": tin + tout,
        "cost": cost,
    }


@pytest.fixture(scope="module")
def docs_df(spark):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    rows = []
    for i in range(12):
        n_words = 5 + i * 9  # spans the direct path and 1..6-chunk docs
        text = " ".join(words[(i + j) % len(words)] for j in range(n_words))
        rows.append((i, text))
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_llm_extract_matches_sequential_mirror(spark, docs_df):
    rows, df = docs_df
    out = {
        r["doc_id"]: r.asDict()
        for r in llm_extract(
            df, CONTRACT_LIKE_SCHEMA, max_tokens_input=32, chunk_overlap=8
        ).collect()
    }
    assert len(out) == len(rows)
    for doc_id, text in rows:
        exp = _sequential_extract(doc_id, text, CONTRACT_LIKE_SCHEMA, 32, 8)
        got = out[doc_id]
        assert json.loads(got["data_json"]) == exp["data"], doc_id
        for k in ("chunks", "tokens_input", "tokens_output", "tokens_total"):
            assert got[k] == exp[k], (doc_id, k)
        assert got["cost"] == pytest.approx(exp["cost"], rel=0, abs=0)


def test_llm_extract_long_doc_chunk_count(spark):
    # reference: a doc over the input budget splits into the expected chunks
    text = " ".join(f"w{i}" for i in range(56))  # 56 toks, 32-window/8-overlap
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = llm_extract(df, SIMPLE_SCHEMA, max_tokens_input=32, chunk_overlap=8).collect()[0]
    assert row["chunks"] == 2
    assert row["tokens_input"] > 0 and row["tokens_output"] > 0
    assert row["cost"] > 0


def test_llm_extract_short_doc_direct_path_uses_raw_text(spark):
    # <= budget: the document goes through whole, preserving raw whitespace
    text = "one  two\tthree"  # irregular whitespace survives the direct path
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    row = llm_extract(df, SIMPLE_SCHEMA, max_tokens_input=32, chunk_overlap=8).collect()[0]
    assert row["chunks"] == 1
    exp = mock_generate(normalize_schema(SIMPLE_SCHEMA), text)
    assert json.loads(row["data_json"]) == exp
