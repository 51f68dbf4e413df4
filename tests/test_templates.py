"""Template kernels: URL/text rendering, variable defaults/validation/
mapping, option merging, transforms (reference: apps/api/src/utils/
urlTemplate.ts, templateHandler.ts, optionMerger.ts, templateValidator.ts).

The golden vectors restate the JS semantics by hand (String() coercion,
encodeURIComponent's unreserved set, keep-on-missing, null-renders-empty).
"""

from __future__ import annotations

import pytest

from anycrawl_spark.functions.templates import (
    apply_transform,
    apply_variable_defaults,
    deep_merge_options_with_template,
    filter_host,
    filter_path,
    filter_query,
    get_by_path,
    map_variables_to_request_data,
    merge_options_with_template,
    MISSING,
    render_text_template,
    render_url_template,
    resolve_price,
    to_string_value,
    validate_template_only_fields,
    validate_variables,
)


# ------------------------------------------------------------ URL rendering

RENDER_URL_CASES = [
    # basic substitution, raw default
    ("https://x.com/{{id}}", {"id": "42"}, "https://x.com/42"),
    # JS String() coercion: integral float drops .0, bool lowercase
    ("v={{n}}", {"n": 2.0}, "v=2"),
    ("v={{n}}", {"n": 2.5}, "v=2.5"),
    ("v={{b}}", {"b": True}, "v=true"),
    # object/array -> compact JSON.stringify
    ("v={{o}}", {"o": {"a": 1}}, 'v={"a":1}'),
    ("v={{a}}", {"a": [1, "x"]}, 'v=[1,"x"]'),
    # dot-path lookup
    ("u={{user.name}}", {"user": {"name": "bo"}}, "u=bo"),
    # query filter = encodeURIComponent (space, &, =, unicode; !*'() kept)
    ("q={{q|query}}", {"q": "a b&c=d"}, "q=a%20b%26c%3Dd"),
    ("q={{q|query}}", {"q": "it's (ok)!*"}, "q=it's%20(ok)!*"),
    ("q={{q|query}}", {"q": "café"}, "q=caf%C3%A9"),
    # path filter keeps '/'
    ("https://x.com/{{p|path}}", {"p": "a b/c"}, "https://x.com/a%20b/c"),
    # host filter: lowercase, strip non-hostname chars
    ("https://{{h|host}}/", {"h": "EX_ample!.Com"}, "https://example.com/"),
    # whitespace inside placeholder tolerated
    ("x={{ name | query }}", {"name": "a b"}, "x=a%20b"),
    # missing variable keeps the original placeholder verbatim
    ("x={{nope}}/y", {"other": 1}, "x={{nope}}/y"),
    ("x={{a.b.c}}", {"a": {"b": 2}}, "x={{a.b.c}}"),
    # explicit null renders as empty string (JS: only undefined is kept)
    ("x={{v}}!", {"v": None}, "x=!"),
    # escaped \{{ stays literal and is NOT substituted
    ("x=\\{{id}}", {"id": "42"}, "x={{id}}"),
    # multiple placeholders
    ("{{a}}-{{b|query}}", {"a": "1", "b": "&"}, "1-%26"),
    # empty / non-string templates pass through
    ("", {"a": 1}, ""),
]


@pytest.mark.parametrize("template,variables,expected", RENDER_URL_CASES)
def test_render_url_template(template, variables, expected):
    assert render_url_template(template, variables) == expected


def test_render_text_template_filters_forced_raw():
    # search.query path: the |query filter parses but applies raw
    assert render_text_template("q={{q|query}}", {"q": "a b&c"}) == "q=a b&c"
    assert render_text_template("q={{q}}", {"q": "a b"}) == "q=a b"
    # missing still keeps placeholder
    assert render_text_template("q={{x|host}}", {}) == "q={{x|host}}"


def test_get_by_path_missing_vs_null():
    assert get_by_path({"a": None}, "a") is None
    assert get_by_path({"a": {}}, "a.b") is MISSING
    assert get_by_path({}, "a") is MISSING
    assert get_by_path(None, "a") is MISSING
    # traversal through a non-dict is undefined
    assert get_by_path({"a": "s"}, "a.b") is MISSING


def test_to_string_value_js_coercions():
    assert to_string_value(None) == ""
    assert to_string_value(float("nan")) == "NaN"
    assert to_string_value(float("inf")) == "Infinity"
    assert to_string_value(-3.0) == "-3"
    assert to_string_value(False) == "false"


def test_filters_unreserved_set():
    # encodeURIComponent leaves -_.!~*'() alone, uppercase hex otherwise
    assert filter_query("-_.!~*'()") == "-_.!~*'()"
    assert filter_query("/?#[]@") == "%2F%3F%23%5B%5D%40"
    assert filter_path("/a?b") == "/a%3Fb"
    assert filter_host("Foo-1.COM:8080") == "foo-1.com8080"


# --------------------------------------------------- defaults / validation

DEFS = {
    "q": {"type": "string", "required": True},
    "n": {"type": "number", "defaultValue": 5},
    "flag": {"type": "boolean"},
    "link": {"type": "url"},
    "mode": {"type": "enum", "values": ["fast", "slow"]},
    "mapped": {"type": "string", "mapping": {"target": "opts.engine"}},
}


def test_apply_variable_defaults():
    assert apply_variable_defaults(DEFS, {"q": "x"}) == {"q": "x", "n": 5}
    # nothing provided but a default applies -> dict with just the default
    assert apply_variable_defaults(DEFS, None) == {"n": 5}
    assert apply_variable_defaults(DEFS, {"q": "x", "n": 7}) == {"q": "x", "n": 7}
    # None is filled like missing (JS == null check)
    assert apply_variable_defaults(DEFS, {"q": "x", "n": None}) == {"q": "x", "n": 5}
    # no definitions -> passthrough
    assert apply_variable_defaults(None, {"a": 1}) == {"a": 1}


def test_validate_variables_happy_and_errors():
    assert validate_variables(DEFS, {"q": "ok", "n": 1.5, "flag": True,
                                     "link": "https://x.com", "mode": "fast"}) == []
    errs = validate_variables(DEFS, {"n": "not-a-number", "mode": "nope",
                                     "link": "no-scheme", "bogus": 1})
    assert "Required variable 'q' is missing" in errs
    # templateHandler.ts:689 — "finite number", not "number" (ADVICE r3)
    assert "Variable 'n' must be a finite number, got string" in errs
    assert "Unknown variable 'bogus' not defined in template" in errs
    assert any("must be one of" in e for e in errs)
    assert "Variable 'link' must be a valid URL" in errs
    # booleans are not numbers in JS typeof terms
    assert validate_variables({"n": {"type": "number"}}, {"n": True}) != []


def test_validate_required_satisfied_by_default_or_mapping_target():
    # default satisfies required
    assert validate_variables(
        {"n": {"type": "number", "required": True, "defaultValue": 1}}, {}) == []
    # mapping target already present in request data satisfies required
    defs = {"e": {"type": "string", "required": True,
                  "mapping": {"target": "opts.engine"}}}
    assert validate_variables(defs, {}, {"opts": {"engine": "cheerio"}}) == []
    assert validate_variables(defs, {}, {"opts": {}}) != []


def test_map_variables_to_request_data():
    defs = {"e": {"type": "string", "mapping": {"target": "opts.engine"}},
            "x": {"type": "string"}}
    # creates nested dicts; explicit request values win
    out = map_variables_to_request_data({"e": "playwright", "x": "ignored"},
                                        defs, {"url": "u"})
    assert out == {"url": "u", "opts": {"engine": "playwright"}}
    out2 = map_variables_to_request_data({"e": "playwright"}, defs,
                                         {"opts": {"engine": "cheerio"}})
    assert out2["opts"]["engine"] == "cheerio"


# ------------------------------------------------------------ option merge

def test_merge_options_shallow_and_deep():
    assert merge_options_with_template({"a": 1, "b": 2}, {"b": 3, "c": None}) == \
        {"a": 1, "b": 3}
    merged = deep_merge_options_with_template(
        {"o": {"x": 1}, "list": [1]}, {"o": {"x": 0, "y": 2}, "list": [9, 9]})
    assert merged == {"o": {"x": 1, "y": 2}, "list": [1]}  # dicts merge, lists replace


# -------------------------------------------------------------- transforms

def test_apply_transform_modes():
    assert apply_transform("v", None, "url") == "v"
    assert apply_transform("v", {"enabled": False, "mode": "append"}, "url") == "v"
    assert apply_transform(
        "q", {"enabled": True, "mode": "append", "prefix": "site:x.com "},
        "query") == "site:x.com q"
    assert apply_transform(
        "https://x.com/p", {"enabled": True, "mode": "template",
                            "template": "https://cache.io/{{url}}?raw=1"},
        "url") == "https://cache.io/https://x.com/p?raw=1"
    # regexExtract then template; group + default trim
    t = {"enabled": True, "mode": "template", "template": "id={{url}}",
         "regexExtract": {"pattern": r"/p/(\d+)", "group": 1}}
    assert apply_transform("https://x.com/p/42 ", t, "url") == "id=42"
    # invalid regex falls back to the original subject
    t_bad = {"enabled": True, "mode": "append", "suffix": "!",
             "regexExtract": {"pattern": "("}}
    assert apply_transform("v", t_bad, "url") == "v!"
    # no match leaves subject untouched
    t_nomatch = {"enabled": True, "mode": "append", "suffix": "!",
                 "regexExtract": {"pattern": r"\d+"}}
    assert apply_transform("abc", t_nomatch, "url") == "abc!"


def test_template_only_fields_and_price():
    assert validate_template_only_fields(["template_id", "url", "variables"],
                                         "scrape") == []
    assert validate_template_only_fields(["template_id", "query", "engine"],
                                         "search") == ["engine"]
    assert resolve_price({"perCall": 3, "currency": "credits"}) == 3.0
    assert resolve_price({"perCall": 3, "currency": "usd"}) == 0.0
    assert resolve_price({"perCall": -1, "currency": "credits"}) == 0.0
    assert resolve_price(None) == 0.0


# ------------------------------------------------------------ Spark operator

def test_process_template_requests_spark(spark):
    from anycrawl_spark.operators.templates import process_template_requests
    import json as _json

    templates = spark.createDataFrame(
        [
            ("tpl-s", "scrape", "published", "approved", "u1", _json.dumps({
                "reqOptions": {"engine": "cheerio", "formats": ["markdown"]},
                "variables": {
                    "id": {"type": "string", "required": True},
                    "lang": {"type": "string", "defaultValue": "en",
                             "mapping": {"target": "options.locale"}},
                },
                "pricing": {"perCall": 2, "currency": "credits"},
            })),
            ("tpl-q", "search", "published", "approved", "u1", _json.dumps({
                "reqOptions": {"engine": "google", "limit": 10},
                "variables": {"q": {"type": "string", "required": True}},
                "queryTransform": {"enabled": True, "mode": "append",
                                   "prefix": "site:docs.example.com "},
            })),
            ("tpl-priv", "scrape", "draft", "pending", "u9", _json.dumps({})),
        ],
        "template_id string, template_type string, status string, "
        "review_status string, created_by string, config_json string",
    )
    requests = spark.createDataFrame(
        [
            ("r1", "tpl-s", "scrape", "https://ex.com/p/{{id}}?l={{lang|query}}",
             None, _json.dumps({"id": "42"}), [], "u1"),
            ("r2", "tpl-nope", "scrape", "https://x.com", None, None, [], "u1"),
            ("r3", "tpl-s", "scrape", "https://x.com", None, None, ["engine"], "u1"),
            ("r4", "tpl-priv", "scrape", "https://x.com", None, None, [], "u1"),
            ("r5", "tpl-s", "crawl", "https://x.com", None, None, [], "u1"),
            ("r6", "tpl-s", "scrape", "https://x.com", None,
             _json.dumps({}), [], "u1"),
            ("r7", "tpl-q", "search", None, "{{q}} news",
             _json.dumps({"q": "spark"}), [], "u1"),
        ],
        "request_id string, template_id string, template_type string, "
        "url string, query string, variables_json string, "
        "extra_fields array<string>, user_id string",
    )
    rows = {r.request_id: r for r in
            process_template_requests(requests, templates).collect()}

    r1 = rows["r1"]
    assert r1.ok and r1.url == "https://ex.com/p/42?l=en"
    assert r1.engine == "cheerio" and r1.credits == 2.0
    assert _json.loads(r1.variables_json) == {"id": "42", "lang": "en"}
    opts = _json.loads(r1.options_json)
    assert opts["options"] == {"locale": "en"}          # mapping target
    assert opts["formats"] == ["markdown"]              # template reqOptions
    assert not rows["r2"].ok and "not found" in rows["r2"].error
    assert not rows["r3"].ok and "engine" in rows["r3"].error
    assert not rows["r4"].ok and "Access denied" in rows["r4"].error
    assert not rows["r5"].ok and "mismatch" in rows["r5"].error
    assert not rows["r6"].ok and "Required variable 'id'" in rows["r6"].error
    r7 = rows["r7"]
    # transform applies to the UN-rendered query at merge time; the
    # controller renders afterwards (reference order)
    assert r7.ok and r7.query == "site:docs.example.com spark news"
    assert r7.url is None and r7.engine == "google"


# ------------------------------------------- domain / keyword restrictions

def test_parse_domain_restriction_shapes():
    from anycrawl_spark.functions.templates import parse_domain_restriction as p
    assert p("example.com") == {"type": "exact", "patterns": ["example.com"]}
    assert p(["a.com", "b.com, c.com"]) == \
        {"type": "exact", "patterns": ["a.com", "b.com", "c.com"]}
    assert p({"type": "glob", "patterns": ["*.x.com"]}) == \
        {"type": "glob", "patterns": ["*.x.com"]}
    assert p({"patterns": "not-a-list"}) is None
    assert p(None) is None
    assert p(42) is None
    assert p([1, 2]) is None  # non-strings dropped -> empty -> None


def test_validate_domain_exact_and_glob():
    from anycrawl_spark.functions.templates import (
        parse_domain_restriction as p, validate_domain as vd)
    # exact: full-URL pattern normalizes (default port dropped) or bare host
    ok, _ = vd("https://example.com:443/", p("https://example.com/"))
    assert ok
    ok, _ = vd("https://sub.example.com/x", p("sub.example.com"))
    assert ok
    ok, err = vd("https://other.com/", p("example.com"))
    assert not ok and "not allowed" in err
    # glob: hostname / origin / path representations all match
    g = p({"type": "glob", "patterns": ["*.example.com", "docs.example.com/v1/*"]})
    assert vd("https://api.example.com/anything?q=1", g)[0]
    assert vd("http://docs.example.com/v1/data", g)[0]
    assert not vd("https://example.com.evil.io/", g)[0]
    # malformed URL
    ok, err = vd("no-scheme", g)
    assert not ok and "Invalid URL" in err


def test_validate_pattern_keywords():
    from anycrawl_spark.functions.templates import (
        parse_domain_restriction as p, validate_pattern as vp)
    g = p({"type": "glob", "patterns": ["spark*"]})
    assert vp("Spark SQL", g, "Search query")[0]   # lowercased before match
    ok, err = vp("hadoop", g, "Search query")
    assert not ok and err.startswith("Search query 'hadoop'")
    assert vp("anything", None)[0]                  # no restriction -> allow


def test_operator_restrictions_spark(spark):
    import json as _json

    from anycrawl_spark.operators.templates import (
        contract_fixture, process_template_requests)
    tpls, reqs = contract_fixture()
    templates = spark.createDataFrame(
        tpls, "template_id string, template_type string, status string, "
              "review_status string, created_by string, config_json string")
    requests = spark.createDataFrame(
        reqs, "request_id string, template_id string, template_type string, "
              "url string, query string, variables_json string, "
              "extra_fields array<string>, user_id string, "
              "responses_json string")
    rows = {r.request_id: r for r in
            process_template_requests(requests, templates).collect()}
    assert rows["r13"].ok
    assert not rows["r14"].ok and "not allowed" in rows["r14"].error
    assert rows["r15"].ok and rows["r15"].query == "sparkling water"
    assert not rows["r16"].ok and "spark*" in rows["r16"].error
    # preNav captures: r17 captured api (seq1) + auth (seq2, after the
    # empty-body login was skipped); r18 has responses but no rules
    caps = _json.loads(rows["r17"].captures_json)
    assert [(c["key"], c["matched_seq"]) for c in caps] == [("api", 1), ("auth", 2)]
    assert caps[0]["setCookieRaw"] == ["sid=1; Path=/", "t=2"]
    assert caps[0]["headers"]["set-cookie"] == "sid=1; Path=/"
    assert caps[1]["method"] is None and caps[1]["status"] == 201
    assert rows["r18"].ok and rows["r18"].captures_json == "[]"
    assert not rows["r03"].ok and rows["r03"].captures_json is None


def test_url_type_file_scheme_vectors():
    """type:'url' validation for file URLs — vectors verified against
    node's new URL() (code review: 'file' is a WHATWG special scheme)."""
    from anycrawl_spark.functions.templates import _is_js_url

    assert _is_js_url("file:///c/x")
    assert _is_js_url("file://h/x")
    assert _is_js_url("file://")
    assert _is_js_url("file:x")
    assert _is_js_url("file://[::1]/x")
    assert not _is_js_url("file://a b/c")
    assert not _is_js_url("file://h:80/x")   # file URLs take no port
    assert not _is_js_url("file://u@h/x")    # ...and no credentials


def test_array_length_assignment_coercion():
    """ArraySetLength ToUint32 semantics + the documented materialization
    cap (code review: ' 5'/'5.0'/'1e2'/true coerce, 2**32/'abc' throw,
    huge-but-valid lengths are refused instead of eagerly allocated)."""
    import pytest

    from anycrawl_spark.functions.templates import _js_set_prop

    for v, want in ((" 5", 5), ("5.0", 5), ("1e2", 100), (True, 1), (3, 3)):
        arr = [1, 2]
        _js_set_prop(arr, "length", v)
        assert len(arr) == want, (v, arr)
    for bad in (2**32, -1, 1.5, "abc", float("nan"), {}, 10**9):
        with pytest.raises(ValueError):
            _js_set_prop([1], "length", bad)
    # [5] coerces via ToPrimitive -> '5' -> 5
    arr = []
    _js_set_prop(arr, "length", [5])
    assert len(arr) == 5


def test_unicode_digit_path_segments_are_undefined():
    """'²'.isdigit() is True in Python but node reads o['²'] as undefined —
    must not crash (code review)."""
    from anycrawl_spark.functions.templates import MISSING, get_by_path

    assert get_by_path({"a": [1, 2]}, "a.²") is MISSING
    assert get_by_path({"a": "xy"}, "a.²") is MISSING
