"""Differential fuzz of the template kernels vs the reference's own source
under node (templateHandler.ts pure kernels + optionMerger.ts, extracted and
type-stripped by tests/node_oracle at test time — no reference code in-repo).

Covers: applyTransform (regexExtract group/trim/flags quirks, template-mode
$-pattern replacement, append mode), reslovePrice, validateVariables (exact
error-message strings incl. JSON.stringify formatting and strict-equality
enum membership), applyVariableDefaults (hasOwnProperty defaults, return
identity rules), TemplateVariableMapper.mapVariablesToRequestData (JS
property access through arrays/strings, setNestedValue array semantics), and
both option mergers."""

import copy
import json
import random

import pytest

from anycrawl_spark.functions.templates import (
    apply_transform,
    apply_variable_defaults,
    deep_merge_options_with_template,
    map_variables_to_request_data,
    merge_options_with_template,
    resolve_price,
    validate_variables,
)
from node_oracle import (
    fuzz_seed,
    REFERENCE_ROOT,
    extract_ts_blocks,
    have_node_oracle,
    run_ts_oracle,
    strip_ts,
)

_TEMPLATE_TS = "apps/api/src/utils/templateHandler.ts"
_MERGER_TS = "apps/api/src/utils/optionMerger.ts"


def _oracle_source() -> str:
    th = (REFERENCE_ROOT / _TEMPLATE_TS).read_text()
    om = (REFERENCE_ROOT / _MERGER_TS).read_text()
    return (
        "const log = {info(){},warn(){},error(){},debug(){}};\n"
        "class TemplateHandler {\n"
        + strip_ts(extract_ts_blocks(th, [
            r"^\s*private static applyTransform\(",
            r"^\s*public static reslovePrice\(",
        ]))
        + "\n}\n"
        + strip_ts(extract_ts_blocks(th, [
            r"^export class TemplateVariableMapper\b",
            r"^export function validateVariables\(",
            r"^export function applyVariableDefaults\(",
        ]))
        + "\n"
        + strip_ts(om)
    )


_DRIVER_JS = """
const data = JSON.parse(require('fs').readFileSync(0, 'utf8'));
console.log(JSON.stringify(data.map(c => {
    try {
        switch (c.kind) {
            case 'transform':
                return TemplateHandler.applyTransform(c.value, c.transform, c.placeholder);
            case 'price':
                return TemplateHandler.reslovePrice(c.template);
            case 'validate':
                try { validateVariables(c.defs, c.provided, c.requestData); return null; }
                catch (e) { return e.message; }
            case 'defaults': {
                const r = applyVariableDefaults(c.defs, c.provided);
                return r === undefined ? '__undefined__' : r;
            }
            case 'map':
                return TemplateVariableMapper.mapVariablesToRequestData(c.variables, c.template, c.requestData);
            case 'merge':
                return mergeOptionsWithTemplate(c.templateOptions, c.requestOptions);
            case 'deepmerge':
                return deepMergeOptionsWithTemplate(c.requestOptions, c.templateOptions);
        }
    } catch (e) { return '__throw__'; }
})));
"""

# ---------------------------------------------------------------- pools

_SUBJECTS = [
    "hello x1", "a $& b", "$$ $' $` $1", "", "  padded  ", "\xa0nbsp\xa0",
    "\x1cfs\x1c", "multi word text 42", "{{url}}", "https://e.com/p?q=1",
    "UPPER lower 7", "dollar$", "a.b.c",
]
# patterns valid in BOTH regex dialects (the operator documents the shared
# subset); \s/\b and named groups are dialect-divergent and out of scope
_PATTERNS = [
    "(h.+?) (x[0-9])", "[a-z]+", "([0-9]+)", "x([0-9])?", "^.{3}",
    "WORD", "(", "", "a{2,}", "([a-z]+) ([a-z]+)", "\\$&", "(?:ab)+",
    ".*", "([A-Z]+)", "q=([0-9])",
]
_FLAGS = [None, "", "i", "m", "s", "g", "gi", "x", "gg", "q", "ms"]
_GROUPS = [None, 0, 1, 2, 5, -1, 2.0, 1.5, True, "1"]
_TRIMS = [None, True, False, 0, "", 1]
_MODES = ["template", "append", "other", "", None, 0]
_TEMPLATES = [None, "", "pre {{url}} post", "{{query}}", "$& $$ $' $` $1",
              "{{url}}{{url}}", "x $<g> y", "no placeholder"]
_AFFIXES = [None, "", "pre-", "-suf", "0", "$&"]
_ENABLED = [True, False, None, 1, 0, "yes", ""]

_SCALARS = ["s", "", 0, 1, 2.5, 2.0, -1, True, False, None, "5", "true"]
_TYPES = ["string", "number", "boolean", "url", "enum", "weird", "", None, 0]
_URLS = [
    "https://example.com/p", "http://exa mple.com", "example.com", "",
    "mailto:a@b.c", "javascript:alert(1)", "a:b", "//x", "http://",
    "http://a:99999", "http://[::1]/", "http://[::1", "ftp://x",
    "http://%zz/", "https://xn--caf-dma.fr", "http://a_b.com",
]
_PATHS = ["a", "a.b", "a.b.c", "", "a..b", "0", "a.0", "a.length", "a.0.b",
          "x.y"]
_NESTED_VALS = [None, 0, 1, "s", True, {"b": 1}, {"b": {"c": 2}}, [1, 2],
                ["x"], [], {"0": "zero"}, "xy"]


def _rand_transform(rnd):
    t = {}
    if rnd.random() < 0.9:
        t["enabled"] = rnd.choice(_ENABLED)
    if rnd.random() < 0.9:
        t["mode"] = rnd.choice(_MODES)
    if rnd.random() < 0.7:
        t["template"] = rnd.choice(_TEMPLATES)
    if rnd.random() < 0.5:
        t["prefix"] = rnd.choice(_AFFIXES)
    if rnd.random() < 0.5:
        t["suffix"] = rnd.choice(_AFFIXES)
    if rnd.random() < 0.6:
        re_cfg = {}
        if rnd.random() < 0.9:
            re_cfg["pattern"] = rnd.choice(_PATTERNS)
        if rnd.random() < 0.7:
            re_cfg["flags"] = rnd.choice(_FLAGS)
        if rnd.random() < 0.7:
            re_cfg["group"] = rnd.choice(_GROUPS)
        if rnd.random() < 0.7:
            re_cfg["trim"] = rnd.choice(_TRIMS)
        t["regexExtract"] = {k: v for k, v in re_cfg.items() if v is not None}
    return {k: v for k, v in t.items() if v is not None or rnd.random() < 0.3}


def _rand_defs(rnd):
    defs = {}
    for name in rnd.sample(["a", "b", "vv", "x1"], rnd.randint(0, 3)):
        d = {}
        if rnd.random() < 0.85:
            d["type"] = rnd.choice(_TYPES)
        if rnd.random() < 0.5:
            d["required"] = rnd.choice([True, False, 1, 0, "y"])
        if rnd.random() < 0.4:
            d["defaultValue"] = rnd.choice(_SCALARS)
        if rnd.random() < 0.4:
            d["mapping"] = rnd.choice(
                [{"target": rnd.choice(_PATHS)}, {}, {"target": ""}, None])
        if d.get("type") == "enum":
            if rnd.random() < 0.7:
                d["values"] = rnd.sample(_SCALARS, rnd.randint(0, 4))
            if rnd.random() < 0.5:
                d["options"] = [
                    rnd.choice([{"value": rnd.choice(_SCALARS)}, {}, None, "x"])
                    for _ in range(rnd.randint(0, 3))
                ]
        defs[name] = {k: v for k, v in d.items()
                      if v is not None or rnd.random() < 0.3}
    return defs or None


def _rand_provided(rnd):
    if rnd.random() < 0.15:
        return None
    out = {}
    for name in rnd.sample(["a", "b", "vv", "zz"], rnd.randint(0, 3)):
        v = rnd.choice(_SCALARS + [{"k": 1}, [1], rnd.choice(_URLS)])
        out[name] = v
    return out


def _rand_request_data(rnd, depth=0):
    out = {}
    for name in rnd.sample(["a", "b", "x", "y", "0"], rnd.randint(0, 3)):
        if depth < 2 and rnd.random() < 0.4:
            out[name] = rnd.choice(
                [_rand_request_data(rnd, depth + 1), [1, {"b": 2}], "xy", [0]])
        else:
            out[name] = rnd.choice(_NESTED_VALS)
    return out


def _rand_options(rnd, depth=0):
    out = {}
    for name in rnd.sample(["p", "q", "r", "s"], rnd.randint(0, 4)):
        if depth < 2 and rnd.random() < 0.35:
            out[name] = _rand_options(rnd, depth + 1)
        else:
            out[name] = rnd.choice([None, 0, 1, "v", True, False, [1, 2], [],
                                    {"z": 9}, 2.5])
    return out


def _errors_to_message(errors):
    if not errors:
        return None
    return "Template variable validation failed:\n- " + "\n- ".join(errors)


def _norm(x):
    """Normalize for comparison across the JSON boundary: 2.0 == 2."""
    return json.loads(json.dumps(x))


@pytest.mark.skipif(
    not (have_node_oracle(_TEMPLATE_TS) and have_node_oracle(_MERGER_TS)),
    reason="node or the reference checkout not available",
)
def test_templates_differential_fuzz_vs_reference_logic():
    rnd = random.Random(fuzz_seed(20260820))
    cases = []
    for _ in range(6000):
        kind = rnd.choice(
            ["transform", "price", "validate", "defaults", "map",
             "merge", "deepmerge"])
        c = {"kind": kind}
        if kind == "transform":
            c["value"] = rnd.choice(_SUBJECTS)
            c["transform"] = rnd.choice([_rand_transform(rnd), None, {}])
            c["placeholder"] = rnd.choice(["url", "query"])
        elif kind == "price":
            c["template"] = {"pricing": rnd.choice([
                {"perCall": rnd.choice(_SCALARS),
                 "currency": rnd.choice(["credits", "usd", None, ""])},
                {}, None, 5, "x",
            ])}
        elif kind == "validate":
            c["defs"] = _rand_defs(rnd)
            c["provided"] = _rand_provided(rnd)
            c["requestData"] = rnd.choice([_rand_request_data(rnd), None])
        elif kind == "defaults":
            c["defs"] = _rand_defs(rnd)
            c["provided"] = _rand_provided(rnd)
        elif kind == "map":
            c["variables"] = _rand_provided(rnd)
            c["template"] = rnd.choice(
                [{"variables": _rand_defs(rnd)}, {}, {"variables": None}])
            c["requestData"] = _rand_request_data(rnd)
        else:
            c["templateOptions"] = _rand_options(rnd)
            c["requestOptions"] = _rand_options(rnd)
        # pools hand out SHARED nested objects and both engines mutate their
        # input in place (setNestedValue descends a shallow copy) — each
        # case must own its data or one case's mutation leaks into another
        cases.append(copy.deepcopy(c))

    ref = run_ts_oracle(_oracle_source(), _DRIVER_JS, cases)

    diverging = []
    for c, exp in zip(cases, ref):
        c = copy.deepcopy(c)  # the node side saw the pristine serialization
        kind = c["kind"]
        try:
            if kind == "transform":
                got = apply_transform(c["value"], c["transform"], c["placeholder"])
            elif kind == "price":
                got = resolve_price((c["template"] or {}).get("pricing"))
            elif kind == "validate":
                got = _errors_to_message(
                    validate_variables(c["defs"], c["provided"], c["requestData"]))
            elif kind == "defaults":
                # JSON delivers provided=None as JS null (never undefined), so
                # the reference returns null back — no sentinel remap needed
                got = apply_variable_defaults(c["defs"], c["provided"])
            elif kind == "map":
                got = map_variables_to_request_data(
                    c["variables"], (c["template"] or {}).get("variables"),
                    c["requestData"])
            elif kind == "merge":
                got = merge_options_with_template(
                    c["templateOptions"], c["requestOptions"])
            else:
                got = deep_merge_options_with_template(
                    c["requestOptions"], c["templateOptions"])
        except ValueError:
            got = "__throw__"  # mirrors the JS RangeError on array length
        if _norm(got) != exp:
            diverging.append((c, exp, got))
    assert diverging == [], (len(diverging), diverging[:8])


# --- render fuzz vs urlTemplate.ts (the template-render kernel) ---

_URLTEMPLATE_TS = "apps/api/src/utils/urlTemplate.ts"

_RENDER_DRIVER_JS = """
const data = JSON.parse(require('fs').readFileSync(0, 'utf8'));
console.log(JSON.stringify(data.map(c =>
    c.kind === 'url' ? renderUrlTemplate(c.template, c.variables)
                     : renderTextTemplate(c.template, c.variables))));
"""

_RENDER_TEMPLATES = [
    "https://e.com/{{q}}", "{{a.b}}", "{{ a | query }}", "{{a|path}}",
    "{{a|host}}", "{{a|raw}}", "{{a|bogus}}", "\\{{a}}", "{{missing}}",
    "x {{a}} y {{b}} z", "{{a}}{{a}}", "{{ a.b.c }}", "{{a.0}}",
    "{{a.length}}", "", "no placeholders", "{{}}", "{{a }}", "{{ a}}",
    "{{a|query}}/{{b|path}}?h={{c|host}}", "{{__AC_ESCAPED_LEFT__}}",
    "pre \\{{a}} mid {{a}} post", "{{a.b|query}}", "{{0}}", "{{a..b}}",
]
_RENDER_VALUES = [
    "plain", "", "a b&c=d", "é ü", "UPPER.Host-9", "x/y/z", "100%", "$&$'",
    "a\nb", "__AC_ESCAPED_LEFT__", "{{b}}", "\\{{b}}", 0, 1, 2.0, 2.5,
    -42.75, 1e21, 1e-7, 0.00001, True, False, None, {"b": "nest"},
    {"b": {"c": 5}}, [1, "two"], ["x/y"], {"b": 2.0}, {"é": "ü"},
    "tilde~star*quote'paren()", "<>#?{}|^`",
]


def _rand_render_vars(rnd):
    if rnd.random() < 0.1:
        return None
    out = {}
    for name in rnd.sample(["a", "b", "c", "q", "0"], rnd.randint(0, 4)):
        out[name] = rnd.choice(_RENDER_VALUES)
    return out


@pytest.mark.skipif(
    not have_node_oracle(_URLTEMPLATE_TS),
    reason="node or the reference checkout not available",
)
def test_render_differential_fuzz_vs_reference_logic():
    """renderUrlTemplate/renderTextTemplate vs the reference source: dotted
    paths through dicts/arrays/strings, all four filters, escaped
    placeholders, missing-vs-null semantics, and ECMAScript number/JSON
    stringification of substituted values."""
    from anycrawl_spark.functions.templates import (
        render_text_template,
        render_url_template,
    )

    rnd = random.Random(fuzz_seed(20260821))
    cases = []
    for _ in range(6000):
        cases.append({
            "kind": rnd.choice(["url", "text"]),
            "template": rnd.choice(_RENDER_TEMPLATES),
            "variables": _rand_render_vars(rnd),
        })
    src = ("const log = {info(){},warn(){},error(){},debug(){}};\n"
           + strip_ts((REFERENCE_ROOT / _URLTEMPLATE_TS).read_text()))
    import subprocess
    out = subprocess.run(
        ["node", "-e", src + _RENDER_DRIVER_JS],
        input=json.dumps(cases), capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[:500]
    ref = json.loads(out.stdout)
    diverging = []
    for c, exp in zip(cases, ref):
        fn = render_url_template if c["kind"] == "url" else render_text_template
        got = fn(c["template"], c["variables"])
        if got != exp:
            diverging.append((c, exp, got))
    assert diverging == [], (len(diverging), diverging[:8])


# --- domain/keyword restriction fuzz vs domainValidator.ts ---
#
# The oracle runs the reference class verbatim with the REAL minimatch
# (npm's vendored copy via NODE_PATH — the same public package the
# reference depends on). URL pools stay within the urlsplit==WHATWG clean
# subset; exotic URL serialization parity is covered separately by
# tests/test_urls.py's node fuzz.

_DOMAIN_TS = "packages/template-client/src/validator/domainValidator.ts"

_DOMAIN_DRIVER_JS = """
const { minimatch } = require('minimatch');
const data = JSON.parse(require('fs').readFileSync(0, 'utf8'));
console.log(JSON.stringify(data.map(c => {
    if (c.kind === 'pattern')
        return DomainValidator.validatePattern(c.value, c.restriction, c.fieldName === null ? undefined : c.fieldName);
    if (c.kind === 'domain')
        return DomainValidator.validateDomain(c.url, c.restriction);
    const r = DomainValidator.parseDomainRestriction(c.input);
    return r === undefined ? '__undefined__' : r;
})));
"""

_DOMAIN_URLS = [
    "https://api.example.com/v1/data?q=test", "http://example.com",
    "http://example.com/", "https://sub.api.example.com/v1/",
    "https://example.com:8443/p", "http://example.com:80/p",
    "HTTPS://API.Example.COM/V1/Data", "https://example.com/a//",
    "https://example.com/a///?x=1#h", "ws://h.io/x", "wss://h.io/",
    "ftp://files.example.com/pub", "https://example.com#frag",
    "https://example.com?only=query", "not a url", "", "example.com",
    "https://example.com/v1/data/", "http://other.org/v1/data",
]
_DOMAIN_PATTERNS = [
    "example.com", "*.example.com", "api.*", "https://example.com",
    "https://*.example.com", "*.example.com/*", "https://example.com/v1/*",
    "example.com/v1/*", "*/v1/*", "**", "*", "?pi.example.com",
    "https://example.com/", "EXAMPLE.com", "https://example.com/v1/data",
    "example.com/v1/data", "other.org", "", "h.io", "ws://h.io/x",
    "*.io", "a.com,b.com", " example.com ", "*.example.com/**",
]
_PARSE_INPUTS = [
    "a.com", "a.com, b.com", "", " , ", ["a.com", "b.com"],
    ["a.com,b.com", 5, None, "c.com"], [], [5, None], {"patterns": ["x.com"]},
    {"patterns": ["x.com", "y.com"], "type": "glob"},
    {"patterns": "x.com"}, {"patterns": []}, {"type": "glob"}, {}, 5, None,
    True, [","], {"patterns": [","]}, {"patterns": ["a.com"], "type": "exact"},
    {"patterns": [" a.com , b.com "], "type": "weird"},
]


def _result_to_dict(ok, err, *, domain, url_invalid=False):
    if ok:
        return {"isValid": True}
    if domain:
        code = "INVALID_URL" if url_invalid else "DOMAIN_NOT_ALLOWED"
    else:
        code = "PATTERN_NOT_ALLOWED"
    return {"isValid": False, "error": err, "code": code}


@pytest.mark.skipif(
    not have_node_oracle(_DOMAIN_TS),
    reason="node or the reference checkout not available",
)
def test_domain_validator_differential_fuzz_vs_reference_logic():
    from node_oracle import NPM_VENDORED_MODULES
    from anycrawl_spark.functions.templates import (
        parse_domain_restriction,
        validate_domain,
        validate_pattern,
    )

    rnd = random.Random(fuzz_seed(20260822))
    cases = []
    for _ in range(5000):
        kind = rnd.choice(["pattern", "domain", "parse"])
        if kind == "pattern":
            cases.append({
                "kind": kind,
                "value": rnd.choice(["news", "News ", " SPORTS", "a b", "",
                                     "spörts", "v*lue", "a.b", "\xa0x"]),
                "restriction": rnd.choice([
                    None, {},
                    {"type": rnd.choice(["exact", "glob", "weird"]),
                     "patterns": [rnd.choice(["news", "n*", "", " news",
                                              "A B", "a?b", "[ns]ews", "!x"])
                                  for _ in range(rnd.randint(0, 3))]},
                ]),
                "fieldName": rnd.choice([None, "Search query", "value", ""]),
            })
        elif kind == "domain":
            cases.append({
                "kind": kind,
                "url": rnd.choice(_DOMAIN_URLS),
                "restriction": rnd.choice([
                    None, {},
                    {"type": rnd.choice(["exact", "glob", "weird"]),
                     "patterns": [rnd.choice(_DOMAIN_PATTERNS)
                                  for _ in range(rnd.randint(0, 3))]},
                ]),
            })
        else:
            cases.append({"kind": kind, "input": rnd.choice(_PARSE_INPUTS)})

    src = extract_ts_blocks(
        (REFERENCE_ROOT / _DOMAIN_TS).read_text(),
        [r"^export class DomainValidator\b"])
    ref = run_ts_oracle(src, _DOMAIN_DRIVER_JS, cases,
                        node_path=NPM_VENDORED_MODULES)

    diverging = []
    for c, exp in zip(cases, ref):
        if c["kind"] == "pattern":
            ok, err = validate_pattern(
                c["value"], c["restriction"],
                "value" if c["fieldName"] is None else c["fieldName"])
            got = _result_to_dict(ok, err, domain=False)
        elif c["kind"] == "domain":
            ok, err = validate_domain(c["url"], c["restriction"])
            got = _result_to_dict(
                ok, err, domain=True,
                url_invalid=bool(err) and err.startswith("Invalid URL format"))
        else:
            r = parse_domain_restriction(c["input"])
            got = "__undefined__" if r is None else r
        if _norm(got) != exp:
            diverging.append((c, exp, got))
    assert diverging == [], (len(diverging), diverging[:8])
