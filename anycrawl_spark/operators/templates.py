"""Template-request processing — the reference's `template_id` front door
for scrape/crawl/search requests, re-expressed as one broadcast dim join +
one Arrow-batched kernel over the request table.

Reference pipeline (apps/api/src/utils/templateHandler.ts
mergeRequestWithTemplate :314-447, hasTemplateAccess :29-52,
templateValidator.ts:11-55, plus the controllers' post-merge render step
ScrapeController.ts:38-42 / SearchController.ts:52-56):

1. template-only field validation (only template_id|url|query|variables
   allowed alongside a template_id),
2. template access (creator match, or published+approved, or self-hosted
   no-user), and template-type match,
3. ``validateVariables`` -> ``applyVariableDefaults`` ->
   ``mapVariablesToRequestData`` (precedence: explicit request field >
   variable mapping > default),
4. ``mergeOptionsWithTemplate(template.reqOptions, requestData)``,
5. query/url transforms (regexExtract -> template|append mode), preserving
   ``original_url``,
6. ``filterBySchemaType`` (search templates drop ``url``),
7. the controller then renders ``{{var|filter}}`` placeholders in url/query
   with the (default-applied) variables,
8. per-call credit pricing.

Deliberately out of scope: the template-client JS sandbox (SURVEY §2
documents the exclusion). The DomainValidator restriction grammar
(allowedDomains/allowedKeywords, template-client
validator/domainValidator.ts) IS implemented — see
functions/templates.py:parse_domain_restriction/validate_domain/
validate_pattern, applied between option merge and transforms (:366-389).

Scale shape: templates are a dim (thousands of rows) — broadcast join; the
kernel is pure per-row string/dict work batched through Arrow; request rows
shuffle nowhere. At 100 TB of request logs this stays a narrow map stage.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anycrawl_spark.functions.capture import capture_responses, captures_to_json
from anycrawl_spark.functions.templates import (
    apply_transform,
    apply_variable_defaults,
    map_variables_to_request_data,
    merge_options_with_template,
    parse_domain_restriction,
    render_text_template,
    render_url_template,
    resolve_price,
    validate_domain,
    validate_pattern,
    validate_template_only_fields,
    validate_variables,
)

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
        T.StructField("engine", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("original_url", T.StringType()),
        T.StructField("query", T.StringType()),
        T.StructField("variables_json", T.StringType()),
        T.StructField("options_json", T.StringType()),
        T.StructField("credits", T.DoubleType()),
        T.StructField("captures_json", T.StringType()),
    ]
)


def process_request(request: dict, template: dict | None, responses=None) -> dict:
    """One request through the template pipeline (sequential kernel — the
    pandas UDF maps this over Arrow batches; also the unit tests' surface).

    ``request``: {request_id, template_type, url?, query?, variables?,
    extra_fields?: [str], user_id?} — extra_fields are the OTHER request-body
    keys, for template-only validation. ``template``: the joined dim row as a
    dict (None = unknown template_id) with {template_id, template_type,
    status, review_status, created_by, req_options, variables (defs),
    url_transform, query_transform, pricing, custom_handlers}.
    ``responses``: the request's ordered network-response log — when the
    template declares ``customHandlers.preNav`` capture rules, the preNav
    matcher (functions/capture.py, EngineConfigurator.ts:277-473) runs over
    it and the payloads land in ``captures_json``. Failed requests never
    reach navigation, so their captures stay NULL.
    """
    ttype = request["template_type"]

    def fail(msg: str) -> dict:
        return {"ok": False, "error": msg, "engine": None, "url": None,
                "original_url": None, "query": None, "variables_json": None,
                "options_json": None, "credits": 0.0, "captures_json": None}

    # 1. template-only fields (templateValidator.ts:11-55)
    base_keys = ["template_id"] + (["query"] if ttype == "search" else ["url"])
    keys = base_keys + (["variables"] if request.get("variables") is not None else [])
    invalid = validate_template_only_fields(
        keys + list(request.get("extra_fields") or []), ttype
    )
    if invalid:
        return fail(
            "When using template_id, only template-allowed fields are permitted."
            f" Invalid fields: {', '.join(invalid)}"
        )

    # 2. template existence / access / type (templateHandler.ts:29-52,95-117)
    if template is None:
        return fail("Template not found")
    user = request.get("user_id")
    created_by = template.get("created_by")
    if user and created_by != user and not (
        template.get("status") == "published"
        and template.get("review_status") == "approved"
    ):
        return fail("Access denied to this template")
    if template.get("template_type") != ttype:
        return fail(
            f"Template type mismatch: expected {ttype}, "
            f"got {template.get('template_type')}"
        )

    defs = template.get("variables") or None
    variables = request.get("variables")
    merged_data = {k: request[k] for k in ("url", "query") if request.get(k) is not None}

    # 3. validate -> defaults -> mapping (mergeRequestWithTemplate :332-353)
    errors = validate_variables(defs, variables, merged_data)
    if errors:
        return fail("Template variable validation failed: " + "; ".join(errors))
    variables = apply_variable_defaults(defs, variables)
    if variables is not None:
        merged_data["variables"] = variables
        merged_data = map_variables_to_request_data(variables, defs, merged_data)

    # 4. template reqOptions under, request over (:355-364)
    merged = merge_options_with_template(template.get("req_options") or {}, merged_data)

    # 4b. domain / keyword restrictions (:366-389, domainValidator.ts)
    meta = template.get("metadata") or {}
    if merged.get("url") and meta.get("allowedDomains"):
        restriction = parse_domain_restriction(meta["allowedDomains"])
        if restriction:
            ok, err = validate_domain(merged["url"], restriction)
            if not ok:
                return fail(err)
    if ttype == "search" and merged.get("query") and meta.get("allowedKeywords"):
        restriction = parse_domain_restriction(meta["allowedKeywords"])
        if restriction:
            ok, err = validate_pattern(merged["query"], restriction, "Search query")
            if not ok:
                return fail(err)

    # 5. transforms (:392-415); original_url preserved before urlTransform
    original_url = None
    if ttype == "search" and merged.get("query") and template.get("query_transform"):
        merged["query"] = apply_transform(
            merged["query"], template["query_transform"], "query"
        )
    if merged.get("url") and template.get("url_transform"):
        original_url = merged["url"]
        merged["url"] = apply_transform(merged["url"], template["url_transform"], "url")

    # 6. schema-type filter (:422-447): search drops url
    if ttype == "search":
        merged.pop("url", None)

    # 7. controller render step (ScrapeController.ts:38-42 etc.)
    variables = merged.get("variables")
    if isinstance(merged.get("url"), str):
        merged["url"] = render_url_template(merged["url"], variables)
    if ttype == "search" and isinstance(merged.get("query"), str):
        merged["query"] = render_text_template(merged["query"], variables)

    # 8. per-call pricing (templateHandler.ts:446-455)
    credits = resolve_price(template.get("pricing"))

    # 9. preNav response captures (EngineConfigurator.ts:277-473) — the hook
    # attaches only once the merged request navigates, i.e. on success
    prenav = (template.get("custom_handlers") or {}).get("preNav")
    captures = capture_responses(prenav, responses) if prenav else []

    options = {
        k: v
        for k, v in merged.items()
        if k not in ("url", "query", "variables", "template_id")
    }
    return {
        "ok": True,
        "error": None,
        "engine": merged.get("engine"),
        "url": merged.get("url"),
        "original_url": original_url,
        "query": merged.get("query"),
        "variables_json": json.dumps(variables, sort_keys=True, separators=(",", ":"))
        if variables is not None
        else None,
        "options_json": json.dumps(options, sort_keys=True, separators=(",", ":")),
        "credits": credits,
        "captures_json": captures_to_json(captures),
    }


def process_template_requests(requests: DataFrame, templates: DataFrame) -> DataFrame:
    """requests x broadcast(templates) -> one result row per request.

    ``requests``: request_id, template_id, template_type, url, query,
    variables_json, extra_fields (array<string>), user_id, and optionally
    responses_json (the request's ordered response log, for preNav capture
    rules — see ``process_request``).
    ``templates``: template_id, template_type, status, review_status,
    created_by, config_json (reqOptions/variables/transforms/pricing as one
    JSON document — the dim row mirrors the reference's JSONB template
    config column).
    """
    t = templates.select(
        F.col("template_id").alias("tid"),
        F.col("template_type").alias("ttype"),
        "status", "review_status", "created_by", "config_json",
    )
    if "responses_json" not in requests.columns:
        requests = requests.withColumn("responses_json", F.lit(None).cast("string"))
    joined = requests.join(
        F.broadcast(t), requests["template_id"] == t["tid"], "left"
    )

    cols = [
        "request_id", "template_type", "url", "query", "variables_json",
        "extra_fields", "user_id", "responses_json", "tid", "ttype", "status",
        "review_status", "created_by", "config_json",
    ]

    out_schema = T.StructType(
        [T.StructField("request_id", T.StringType())] + list(RESULT_SCHEMA.fields)
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in pdf.itertuples(index=False):
            request = {
                "request_id": r.request_id,
                "template_type": r.template_type,
                "url": r.url,
                "query": r.query,
                "variables": json.loads(r.variables_json) if r.variables_json else None,
                "extra_fields": list(r.extra_fields) if r.extra_fields is not None else [],
                "user_id": r.user_id,
            }
            template = None
            if r.tid is not None:
                cfg = json.loads(r.config_json) if r.config_json else {}
                template = {
                    "template_id": r.tid,
                    "template_type": r.ttype,
                    "status": r.status,
                    "review_status": r.review_status,
                    "created_by": r.created_by,
                    "req_options": cfg.get("reqOptions"),
                    "variables": cfg.get("variables"),
                    "url_transform": cfg.get("urlTransform"),
                    "query_transform": cfg.get("queryTransform"),
                    "pricing": cfg.get("pricing"),
                    "metadata": cfg.get("metadata"),
                    "custom_handlers": cfg.get("customHandlers"),
                }
            responses = json.loads(r.responses_json) if r.responses_json else None
            res = process_request(request, template, responses)
            rows.append({"request_id": r.request_id, **res})
        return pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return joined.select(*cols).mapInPandas(
        lambda it: (kernel(pdf) for pdf in it), schema=out_schema
    )


# ----------------------------------------------------------- contract fixture

def contract_fixture() -> tuple[list[tuple], list[tuple]]:
    """Deterministic (templates, requests) literal fixture for the
    q_template_render contract query. Covers: raw/query/path filter
    rendering, defaults, variable->request mapping, option merge, query
    append-transform, url regex+template transform with original_url,
    access/type/field/required/enum failures, and the self-hosted
    (no user) access rule. The oracle side is HAND-enumerated
    (oracle_mirrors.sql_template_render) — expected outputs were derived
    from the reference semantics, not from this code. r4 adds preNav
    capture-rule coverage (tpl-c / r17 / r18): glob + regex + exact rules,
    first-match-per-key ordering, the empty-body pending rule, header
    lowercasing and the set-cookie list/fallback quirk."""
    templates = [
        ("tpl-s", "scrape", "published", "approved", "u1", json.dumps({
            "reqOptions": {"engine": "cheerio", "formats": ["markdown"]},
            "variables": {
                "id": {"type": "string", "required": True},
                "lang": {"type": "string", "defaultValue": "en",
                         "mapping": {"target": "options.locale"}},
            },
            "pricing": {"perCall": 2, "currency": "credits"},
        })),
        ("tpl-q", "search", "published", "approved", "u1", json.dumps({
            "reqOptions": {"engine": "google", "limit": 10},
            "variables": {"q": {"type": "string", "required": True}},
            "queryTransform": {"enabled": True, "mode": "append",
                               "prefix": "site:docs.example.com "},
        })),
        ("tpl-t", "scrape", "published", "approved", "u2", json.dumps({
            "urlTransform": {"enabled": True, "mode": "template",
                             "template": "https://render.svc/{{url}}",
                             "regexExtract": {"pattern": "//(.+)$", "group": 1}},
        })),
        ("tpl-priv", "scrape", "draft", "pending", "u9", "{}"),
        ("tpl-e", "scrape", "published", "approved", "u1", json.dumps({
            "reqOptions": {"engine": "playwright"},
            "variables": {"mode": {"type": "enum", "values": ["fast", "slow"]},
                          "n": {"type": "number", "defaultValue": 5}},
        })),
        ("tpl-d", "scrape", "published", "approved", "u1", json.dumps({
            "metadata": {"allowedDomains": {
                "type": "glob", "patterns": ["*.example.com", "example.com"]}},
        })),
        ("tpl-k", "search", "published", "approved", "u1", json.dumps({
            "reqOptions": {"engine": "google"},
            "metadata": {"allowedKeywords": {"type": "glob",
                                             "patterns": ["spark*"]}},
        })),
        ("tpl-c", "scrape", "published", "approved", "u1", json.dumps({
            "reqOptions": {"engine": "playwright"},
            "customHandlers": {"preNav": [
                {"key": "api", "rules": [
                    {"type": "glob", "pattern": "https://api.ex.com/**/*.json"}]},
                {"key": "auth", "rules": [
                    {"type": "regex", "pattern": r"https://ex\.com/auth/\d+"},
                    {"type": "exact", "pattern": "https://ex.com/login"}]},
            ]},
        })),
    ]
    requests = [
        ("r01", "tpl-s", "scrape", "https://ex.com/p/{{id}}?l={{lang|query}}",
         None, json.dumps({"id": "42"}), [], "u1"),
        ("r02", "tpl-s", "scrape", "https://ex.com/{{id|path}}",
         None, json.dumps({"id": "a b/c"}), [], "u1"),
        ("r03", "tpl-nope", "scrape", "https://x.com", None, None, [], "u1"),
        ("r04", "tpl-s", "scrape", "https://x.com", None, None, ["engine"], "u1"),
        ("r05", "tpl-priv", "scrape", "https://x.com", None, None, [], "u1"),
        ("r06", "tpl-s", "crawl", "https://x.com", None, None, [], "u1"),
        ("r07", "tpl-s", "scrape", "https://x.com", None, "{}", [], "u1"),
        ("r08", "tpl-q", "search", None, "{{q}} news",
         json.dumps({"q": "spark"}), [], "u1"),
        ("r09", "tpl-t", "scrape", "http://X.com/a b", None, None, [], "u2"),
        ("r10", "tpl-e", "scrape", "https://e.com/?m={{mode}}&n={{n}}",
         None, json.dumps({"mode": "turbo"}), [], "u1"),
        ("r11", "tpl-e", "scrape", "https://e.com/?m={{mode}}&n={{n}}",
         None, json.dumps({"mode": "fast"}), [], "u1"),
        ("r12", "tpl-priv", "scrape", "https://ex.com/x", None, None, [], None),
        ("r13", "tpl-d", "scrape", "https://api.example.com/x", None, None, [], "u1"),
        ("r14", "tpl-d", "scrape", "https://evil.com/x", None, None, [], "u1"),
        ("r15", "tpl-k", "search", None, "sparkling water", None, [], "u1"),
        ("r16", "tpl-k", "search", None, "hadoop tips", None, [], "u1"),
    ]
    # 9th column: responses_json (preNav capture input; None elsewhere)
    requests = [r + (None,) for r in requests]
    responses_r17 = json.dumps([
        # matches the 'auth' exact rule but has no body -> key stays pending
        {"url": "https://ex.com/login", "body": "", "headers": {}},
        # 'api' glob match; multi-value set-cookie list kept raw
        {"url": "https://api.ex.com/v1/data.json", "body": "{\"d\":1}",
         "status": 200, "method": "GET",
         "headers": {"Content-Type": "application/json",
                     "set-cookie": ["sid=1; Path=/", "t=2"]}},
        # 'auth' regex match on the retry; only the FIRST X-Token survives
        {"url": "https://ex.com/auth/42", "body": "tok", "status": 201,
         "headers": {"X-Token": ["abc", "def"]}},
        # both keys done by now -> never reached (listener detached)
        {"url": "https://api.ex.com/v2/other.json", "body": "x"},
    ])
    requests += [
        ("r17", "tpl-c", "scrape", "https://ex.com/page", None, None, [],
         "u1", responses_r17),
        # template without preNav rules: responses present, captures stay []
        ("r18", "tpl-s", "scrape", "https://ex.com/p/{{id}}", None,
         json.dumps({"id": "9"}), [], "u1",
         json.dumps([{"url": "https://ex.com/x", "body": "y"}])),
    ]
    return templates, requests
