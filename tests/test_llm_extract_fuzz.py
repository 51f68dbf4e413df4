"""Differential fuzz of the LLM-extract pure kernels vs the reference
source under node (packages/ai/src/agents/LLMExtract.ts, type-stripped at
test time): removeDefaultProperty, normalizeSchema, createFieldPrompt,
mergeResults, deduplicateArray. The ai-SDK-touching methods (generate,
token extraction from provider responses) stay mocked by design."""

import random
import shutil

import pytest

from node_oracle import (
    fuzz_seed,
    REFERENCE_ROOT,
    extract_ts_blocks,
    have_node_oracle,
    run_ts_oracle,
    strip_ts,
)

_LLM_TS = "packages/ai/src/agents/LLMExtract.ts"


def _oracle_source() -> str:
    src = (REFERENCE_ROOT / _LLM_TS).read_text()
    funcs = extract_ts_blocks(src, [
        r"^function removeDefaultProperty\(",
        r"^function normalizeSchema\(",
    ])
    methods = extract_ts_blocks(src, [
        r"^\s*private getSchemaFields\(",
        r"^\s*private createFieldPrompt\(",
        r"^\s*private mergeResults\(",
        r"^\s*private deduplicateArray\(",
    ])
    for name in ("getSchemaFields", "createFieldPrompt", "mergeResults",
                 "deduplicateArray"):
        methods = methods.replace(f"private {name}(", f"private static {name}(", 1)
    return (
        "const log = {info(){},warn(){},error(){},debug(){}};\n"
        + strip_ts(funcs)
        + "\nclass LLM {\n"
        + strip_ts(methods)
        + "\n}\n"
    )


_DRIVER_JS = """
const cases = JSON.parse(require('fs').readFileSync(0, 'utf8'));
console.log(JSON.stringify(cases.map(c => {
    try {
        switch (c.kind) {
            case 'removeDefaults': return removeDefaultProperty(c.value);
            case 'normalize': return normalizeSchema(c.value);
            case 'fieldPrompt': return LLM.createFieldPrompt(c.value, c.indent || '');
            case 'merge': {
                const r = LLM.mergeResults(c.results, c.schema || {});
                return r === undefined ? '__undefined__' : r;
            }
            case 'dedup': return LLM.deduplicateArray(c.value);
        }
    } catch (e) { return "ERR"; }
})));
"""


def _rand_schema(rnd, depth=0):
    t = rnd.choice(["string", "number", "boolean", "object", "array", None])
    node = {}
    if t:
        node["type"] = t
    if rnd.random() < 0.4:
        node["default"] = rnd.choice([1, "d", None, [1], {"default": 2}])
    if rnd.random() < 0.4:
        node["description"] = rnd.choice(["a field", "", "with: colon"])
    if t == "object" and depth < 3:
        node["properties"] = {
            rnd.choice(["a", "b", "items", "default", "title-x"]): _rand_schema(rnd, depth + 1)
            for _ in range(rnd.randint(0, 3))
        }
        if rnd.random() < 0.3:
            node["required"] = ["a"]
        if rnd.random() < 0.3:
            node["additionalProperties"] = rnd.choice([True, False])
    if t == "array" and depth < 3:
        node["items"] = _rand_schema(rnd, depth + 1)
    return node


def _rand_value(rnd, depth=0):
    if depth > 2:
        return rnd.choice([None, 0, 1, "", "x", True, False, 2.5, 2.0])
    r = rnd.random()
    if r < 0.35:
        return rnd.choice([None, 0, 1, "", "x", "1", True, False, 2.5, 2.0, -1])
    if r < 0.7:
        return [_rand_value(rnd, depth + 1) for _ in range(rnd.randint(0, 4))]
    return {
        rnd.choice(["a", "b", "c", "t"]): _rand_value(rnd, depth + 1)
        for _ in range(rnd.randint(0, 4))
    }


@pytest.mark.skipif(
    not (shutil.which("node") and have_node_oracle(_LLM_TS)),
    reason="node + reference checkout not available",
)
def test_llm_extract_kernels_differential_fuzz_vs_reference():
    from anycrawl_spark.operators.llm_extract import (
        create_field_prompt,
        deduplicate_array,
        merge_results,
        normalize_schema,
        remove_default_property,
    )

    rnd = random.Random(fuzz_seed(20260825))
    cases = []
    for _ in range(2500):
        kind = rnd.choice(["removeDefaults", "normalize", "fieldPrompt",
                           "merge", "dedup"])
        if kind in ("removeDefaults", "normalize", "fieldPrompt"):
            cases.append({"kind": kind, "value": _rand_schema(rnd),
                          "indent": rnd.choice(["", "  "])})
        elif kind == "merge":
            cases.append({
                "kind": kind,
                "results": [
                    rnd.choice([None, {}, 0, "", "ab", [1, 2],
                                _rand_value(rnd)])
                    for _ in range(rnd.randint(0, 4))
                ],
            })
        else:
            cases.append({"kind": kind,
                          "value": [_rand_value(rnd) for _ in range(rnd.randint(0, 8))]})

    ref = run_ts_oracle(_oracle_source(), _DRIVER_JS, cases)

    diverging = []
    for c, exp in zip(cases, ref):
        if c["kind"] == "removeDefaults":
            got = remove_default_property(c["value"])
        elif c["kind"] == "normalize":
            got = normalize_schema(c["value"])
        elif c["kind"] == "fieldPrompt":
            got = create_field_prompt(c["value"], c["indent"])
        elif c["kind"] == "merge":
            got = merge_results(list(c["results"]))
            got = "__undefined__" if got is None and exp == "__undefined__" else got
        else:
            got = deduplicate_array(c["value"])
        if got != exp:
            diverging.append((c, exp, got))
    assert diverging == [], (len(diverging), diverging[:8])
