"""X13 LLM structured extraction — the deterministic half of the reference's
``json_options`` scrape feature (reference: packages/ai/src/agents/
LLMExtract.ts:9-71 schema normalization, :177-206 field prompt, :214-262
chunk-merge, :263-447 perform; prompts from packages/ai/src/prompts/
extract.prompts.ts).

What is real here and what is mocked:

- REAL: JSON-schema normalization (strip ``default`` recursively, wrap bare
  array schemas in ``{items}``, expand the typeless-properties shorthand,
  force ``additionalProperties: false`` on every object node), the recursive
  field-prompt builder, prompt assembly, the chunk->generate->merge dataflow
  (chunk-wise generation is the unit of parallelism — at 100 TB each chunk is
  one "LLM call" task), the JS-semantics result merge, token/cost accounting.
- MOCKED: the ``generateObject`` model call. The sandbox has no model
  endpoint, so a deterministic generator fills each schema field from
  md5-digit arithmetic over (field path, chunk text) — chosen over a seeded
  RNG so the ENTIRE pipeline value-checks against a DuckDB oracle (the same
  trick as simhash_md5). Production swaps ``mock_generate`` for a real
  client inside the same pandas UDF; nothing else changes.

Token counting uses the reference's no-tiktoken fallback (ceil(len/4),
BaseAgent.ts:116-123 — the branch this sandbox would take) for usage/cost,
and the repo's whitespace-token unit (X14 ``chunk_tokens``) for chunk
boundaries.
"""

from __future__ import annotations

import hashlib
import json
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anycrawl_spark.functions.js import js_json_stringify as _js_stringify
from anycrawl_spark.functions.text import chunk_tokens, tokens

# Prompt texts kept verbatim for behavioral parity (extract.prompts.ts:1-21
# — the token/cost accounting depends on their exact lengths).
EXTRACT_SYSTEM_PROMPT = """You are a data extraction assistant. You MUST strictly follow the provided JSON schema structure.

CRITICAL RULES:
1. Only extract and return the exact fields defined in the schema
2. Do not add any extra fields, properties, or nested structures not specified in the schema
3. If a field is not found in the content, set it to null rather than creating new structures
4. Follow the exact property names, types, and structure as defined in the schema
5. Do not nest data under additional wrapper objects unless explicitly defined in the schema

Return only the JSON object that matches the schema exactly."""

BASE_EXTRACTION_PROMPT = (
    "Extract data from the following content and return it in the exact JSON "
    "structure defined by the schema. IMPORTANT: Only include fields that are "
    "defined in the schema. Do not create additional fields or nested structures."
)

# mock model registry (BaseAgent.ts:128-158 modelConfig shape)
MODEL_CONFIGS = {
    "mock-extract": {
        "input_cost_per_token": 1e-6,
        "output_cost_per_token": 2e-6,
        "max_input_tokens": 4000,
        "max_output_tokens": 2000,
    },
}


# ------------------------------------------------------ schema normalization

def remove_default_property(obj):
    """Strip ``default`` keys recursively (LLMExtract.ts:9-19)."""
    if isinstance(obj, list):
        return [remove_default_property(x) for x in obj]
    if isinstance(obj, dict):
        return {
            k: remove_default_property(v) for k, v in obj.items() if k != "default"
        }
    return obj


def _enforce_additional_false(node):
    if isinstance(node, list):
        return [_enforce_additional_false(x) for x in node]
    if not isinstance(node, dict):
        return node
    out = dict(node)
    if out.get("type") == "object":
        out.setdefault("additionalProperties", False)
        if isinstance(out.get("properties"), dict):
            out["properties"] = {
                k: _enforce_additional_false(v) for k, v in out["properties"].items()
            }
    elif out.get("type") == "array" and out.get("items"):
        out["items"] = _enforce_additional_false(out["items"])
    return out


def normalize_schema(schema):
    """LLMExtract.ts:21-71: strip defaults; wrap a bare array schema as
    ``{items: <array>}`` (required); expand the typeless shorthand
    ``{field: subschema, ...}`` into an all-required object; then force
    ``additionalProperties: false`` on every object node."""
    stripped = remove_default_property(schema)
    if isinstance(stripped, dict) and stripped.get("type") == "array":
        base = {
            "type": "object",
            "properties": {"items": stripped},
            "required": ["items"],
            "additionalProperties": False,
        }
    elif isinstance(stripped, dict) and not stripped.get("type"):
        base = {
            "type": "object",
            "properties": {k: normalize_schema(v) for k, v in stripped.items()},
            "required": list(stripped.keys()),
            "additionalProperties": False,
        }
    else:
        base = stripped
    return _enforce_additional_false(base)


def create_field_prompt(schema, indent: str = "") -> str:
    """Recursive field list for the user prompt (LLMExtract.ts:177-206)."""
    if not isinstance(schema, dict) or not isinstance(schema.get("properties"), dict):
        return ""
    props = schema["properties"]
    if not props:
        return ""
    lines = []
    for field, prop in props.items():
        prop = prop if isinstance(prop, dict) else {}
        ftype = prop.get("type") or "any"
        desc = prop.get("description") or ""
        if ftype == "array":
            items = prop.get("items")
            item_type = items.get("type", "any") if isinstance(items, dict) else "any"
            if isinstance(items, dict) and items.get("type") == "object":
                lines.append(
                    f"{indent}- {field} (array of {item_type}s): {desc}\n"
                    + create_field_prompt(items, indent + "    ")
                )
                continue
            type_desc = f"(array of {item_type}s)"
        elif ftype == "object":
            lines.append(
                f"{indent}- {field} (object): {desc}\n"
                + create_field_prompt(prop, indent + "    ")
            )
            continue
        else:
            type_desc = f"({ftype})"
        lines.append(f"{indent}- {field} {type_desc}: {desc}")
    return "\n".join(lines)


def build_extraction_prompt(content: str, field_prompt: str = "", prompt: str | None = None) -> str:
    """extract.prompts.ts:16-21."""
    if prompt:
        return f"{BASE_EXTRACTION_PROMPT} User request: {prompt}.{field_prompt}\n\nContent:\n{content}"
    return f"{BASE_EXTRACTION_PROMPT}{field_prompt}\n\nContent:\n{content}"


# --------------------------------------------------------------- accounting

def count_tokens_est(text: str) -> int:
    """ceil(len/4) — the reference's estimation fallback (BaseAgent.ts:121),
    the branch taken when tiktoken is unavailable (this sandbox)."""
    return math.ceil(len(text) / 4)


def calculate_cost(input_tokens: int, output_tokens: int, model_id: str = "mock-extract") -> float:
    cfg = MODEL_CONFIGS.get(model_id)
    if not cfg:
        return 0.0
    return (
        cfg["input_cost_per_token"] * input_tokens
        + cfg["output_cost_per_token"] * output_tokens
    )


class CostLimitExceeded(RuntimeError):
    """CostTracking.ts:38-40."""


class CostTracking:
    """Minimal mirror of CostTracking.ts: accumulate per-call cost/tokens,
    throw past the limit."""

    def __init__(self, limit: float | None = None):
        self.limit = limit
        self.calls: list[dict] = []

    def add_call(self, cost: float, input_tokens: int = 0, output_tokens: int = 0,
                 type: str = "extract", **metadata) -> None:
        self.calls.append(
            {"type": type, "cost": cost, "tokens": (input_tokens, output_tokens),
             "metadata": metadata}
        )
        if self.limit is not None and self.total_cost() > self.limit:
            raise CostLimitExceeded("Cost limit exceeded")

    def total_cost(self) -> float:
        return sum(c["cost"] for c in self.calls)

    def total_tokens(self) -> tuple[int, int, int]:
        i = sum(c["tokens"][0] for c in self.calls)
        o = sum(c["tokens"][1] for c in self.calls)
        return i, o, i + o


# ------------------------------------------------------------ mock generate

def _digest48(path: str, text: str) -> int:
    """First 12 md5 hex digits of 'path|text' as an int — 48 bits, exactly
    reproducible digit-for-digit in DuckDB (the simhash_md5 technique)."""
    return int(hashlib.md5(f"{path}|{text}".encode()).hexdigest()[:12], 16)


def mock_generate(schema: dict, text: str, path: str = "$") -> object:
    """Deterministic stand-in for ``generateObject``: fill every schema field
    from md5 arithmetic over (field path, content). Strings are empty 1 time
    in 5 so the merge's prefer-non-empty rule is exercised; arrays emit 1-2
    items so the dedup-concat rule is exercised."""
    stype = schema.get("type") if isinstance(schema, dict) else None
    if stype == "object":
        props = schema.get("properties") or {}
        return {k: mock_generate(v, text, f"{path}.{k}") for k, v in props.items()}
    d = _digest48(path, text)
    if stype == "string":
        return "" if d % 5 == 0 else f"v{d % 9973}"
    if stype == "integer":
        return d % 1000
    if stype == "number":
        return (d % 10000) / 100.0
    if stype == "boolean":
        return d % 2 == 0
    if stype == "array":
        items = schema.get("items") or {}
        n = 1 + d % 2
        return [mock_generate(items, text, f"{path}[{i}]") for i in range(n)]
    return None


# ------------------------------------------------------------------- merge

def _js_falsy(v) -> bool:
    """JS truthiness, faithfully — ``!merged[key]`` overwrites falsy values:
    undefined/null/false/0/NaN/''. Empty arrays and objects are TRUTHY in
    JS, so they are NOT overwritten (LLMExtract.ts:226)."""
    if v is None or v is False:
        return True
    if isinstance(v, bool):
        return not v
    if isinstance(v, (int, float)):
        return v == 0 or (isinstance(v, float) and math.isnan(v))
    if isinstance(v, str):
        return v == ""
    return False


def _dedup_key(item):
    """The Set key LLMExtract.ts:253 computes: JSON.stringify for objects
    (ECMAScript number formatting — 2.0 prints '2'), the raw primitive
    otherwise. Python's set would fold 1/True and 1/1.0 differently from
    JS SameValueZero (1 !== true, 1 === 1.0), so primitives carry a type
    tag with bools distinct and ints/floats unified (node fuzz)."""
    if isinstance(item, (dict, list)):
        return _js_stringify(item)
    if isinstance(item, bool):
        return ("bool", item)
    if isinstance(item, (int, float)):
        try:
            return ("num", float(item))
        except OverflowError:
            # a >308-digit JSON literal is Infinity in JS (code review)
            return ("num", float("inf") if item > 0 else float("-inf"))
    return ("s", item)


def deduplicate_array(arr: list) -> list:
    """LLMExtract.ts:251-262: JSON-keyed first-occurrence dedup."""
    seen, out = set(), []
    for item in arr:
        key = _dedup_key(item)
        if key in seen:
            continue
        seen.add(key)
        out.append(item)
    return out


def _js_spread_pair(cur, new):
    """JS ``{...cur, ...new}`` where either side may be an array: JS typeof
    treats arrays as objects, so LLMExtract.ts:229-231 reaches the object
    branch for mixed list/dict pairs and array spread yields index-keyed
    string entries ({...['a'], ...{x: 1}} === {'0': 'a', x: 1})."""
    out: dict = {}
    for side in (cur, new):
        if isinstance(side, list):
            out.update({str(i): item for i, item in enumerate(side)})
        else:
            out.update(side)
    return out


def _js_entries(v):
    """``Object.entries(v)`` over JSON values: dicts give their pairs,
    arrays/strings index-keyed elements, primitives nothing."""
    if isinstance(v, dict):
        return list(v.items())
    if isinstance(v, (list, str)):
        return [(str(i), x) for i, x in enumerate(v)]
    return []


def merge_results(results: list) -> object:
    """Chunk-result merge (LLMExtract.ts:211-241): arrays dedup-concat,
    objects shallow-merge, primitives keep the first JS-truthy value.
    Mixed array/object pairs take the JS spread path (see _js_spread_pair);
    unreachable with the deterministic mock generator (types are
    schema-consistent per path) but a real generateObject can mix types.

    Control flow mirrors the source exactly: the length checks run BEFORE
    any null filtering (ts:212-213), so [null] returns null while
    [null, null] merges to {}; falsy results are skipped inside the loop
    and non-dict results contribute Object.entries pairs (arrays/strings
    index-keyed)."""
    if len(results) == 0:
        return None
    if len(results) == 1:
        return results[0]
    merged: dict = {}
    for result in results:
        if _js_falsy(result):
            continue
        for k, v in _js_entries(result):
            if v is None:
                continue
            cur = merged.get(k)  # missing -> None, matching JS undefined
            if _js_falsy(cur):
                merged[k] = v
            elif isinstance(cur, list) and isinstance(v, list):
                merged[k] = deduplicate_array(cur + v)
            elif isinstance(cur, (dict, list)) and isinstance(v, (dict, list)):
                merged[k] = _js_spread_pair(cur, v)
            # JS's final branch (replace when null/undefined/'') is subsumed
            # by the falsy branch above — a truthy primitive always wins
    return merged


# ---------------------------------------------------------- Spark operator

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("data_json", T.StringType()),
        T.StructField("chunks", T.IntegerType()),
        T.StructField("tokens_input", T.LongType()),
        T.StructField("tokens_output", T.LongType()),
        T.StructField("tokens_total", T.LongType()),
        T.StructField("cost", T.DoubleType()),
    ]
)


def llm_extract(
    documents: DataFrame,
    schema: dict,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    model_id: str = "mock-extract",
    prompt: str | None = None,
    max_tokens_input: int = 64,
    chunk_overlap: int = 8,
) -> DataFrame:
    """documents -> one (data_json, chunks, tokens, cost) row per document.

    Dataflow (LLMExtract.perform re-expressed Spark-first):
    1. Normalize the schema ONCE on the driver (pure Python).
    2. Chunk JVM-side: docs at or under ``max_tokens_input`` whitespace
       tokens go through whole (the reference's direct path, raw text);
       longer docs explode into X14 overlapping token windows. The chunk is
       the "LLM call" — the unit of parallelism at 100 TB.
    3. Per-chunk generation in ONE Arrow-batched pandas UDF; per-chunk
       usage tokens are pure column math (prompt length is an affine
       function of chunk length, output tokens from the result length).
    4. Per-doc merge: shuffle only (doc_id, small json strings), sort by
       chunk_id, JS-semantics merge, cost from summed totals.
    """
    norm = normalize_schema(schema)
    field_prompt = create_field_prompt(norm)
    # input tokens per call = ceil((len(fullPrompt) + len(system)) / 4); the
    # prompt is BASE + fieldPrompt + "\n\nContent:\n" + chunk, so the length
    # is const + len(chunk) (LLMExtract.ts extractUsageTokens fallback)
    const_len = len(build_extraction_prompt("", field_prompt, prompt)) + len(
        EXTRACT_SYSTEM_PROMPT
    )
    cfg = MODEL_CONFIGS[model_id]
    in_cost, out_cost = cfg["input_cost_per_token"], cfg["output_cost_per_token"]

    d = documents.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    n_tok = F.size(tokens(F.col("text")))
    chunk_arr = F.when(
        n_tok <= max_tokens_input,
        F.array(
            F.struct(
                F.lit(0).alias("chunk_id"),
                F.col("text").alias("text"),
                n_tok.alias("n_tokens"),
            )
        ),
    ).otherwise(chunk_tokens(F.col("text"), max_tokens_input, chunk_overlap))
    chunks = d.select("doc_id", F.explode(chunk_arr).alias("c")).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.text").alias("chunk_text"),
    )

    @F.pandas_udf(T.StringType())
    def gen(chunk_text: pd.Series) -> pd.Series:
        return chunk_text.map(
            lambda t: json.dumps(mock_generate(norm, t), separators=(",", ":"))
        )

    gen_rows = (
        chunks.withColumn("data_json", gen(F.col("chunk_text")))
        .withColumn(
            "tokens_input",
            F.ceil((F.length("chunk_text") + F.lit(const_len)) / 4).cast("long"),
        )
        .withColumn("tokens_output", F.ceil(F.length("data_json") / 4).cast("long"))
        .drop("chunk_text")
    )

    def merge_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("chunk_id")
        parsed = [json.loads(s) for s in pdf["data_json"]]
        merged = merge_results(parsed)
        tin = int(pdf["tokens_input"].sum())
        tout = int(pdf["tokens_output"].sum())
        # cost from TOTALS (one multiply-add) so Spark and the SQL oracle
        # agree bit-for-bit regardless of chunk summation order
        cost = in_cost * tin + out_cost * tout
        return pd.DataFrame(
            {
                "doc_id": [int(pdf["doc_id"].iloc[0])],
                "data_json": [json.dumps(merged, separators=(",", ":"))],
                "chunks": [len(pdf)],
                "tokens_input": [tin],
                "tokens_output": [tout],
                "tokens_total": [tin + tout],
                "cost": [cost],
            }
        )

    return gen_rows.groupBy("doc_id").applyInPandas(merge_kernel, schema=EXTRACT_SCHEMA)
