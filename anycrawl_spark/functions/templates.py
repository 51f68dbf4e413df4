"""Request-template kernels — the deterministic template pipeline the
reference runs in front of every scrape/crawl/search request when
``template_id`` is set.

Reference surface re-expressed here (all pure string/dict work — the Spark
side applies these once per request row inside one Arrow-batched stage):

- ``{{var.path|filter}}`` URL/text rendering with the raw/query/path/host
  filters, ``\\{{`` escapes, and keep-on-missing semantics
  (apps/api/src/utils/urlTemplate.ts:5-103; used by ScrapeController.ts:40,
  CrawlController, SearchController.ts:54).
- variable validation + defaults + request-data mapping
  (apps/api/src/utils/templateHandler.ts:548-621 TemplateVariableMapper,
  :631-736 validateVariables, :739-768 applyVariableDefaults).
- template/request option merging, shallow and deep
  (apps/api/src/utils/optionMerger.ts:13-67).
- url/query transforms: optional regex extraction then template or append
  mode (apps/api/src/utils/templateHandler.ts:459-523).
- template-only field validation (apps/api/src/utils/templateValidator.ts:
  11-55) and per-call credit pricing (templateHandler.ts:446-455).

JS-semantics notes (ported faithfully, asserted by tests/test_templates.py):
``String(number)`` drops the ``.0`` of integral floats; ``encodeURIComponent``
leaves ``-_.!~*'()`` unescaped and uses uppercase hex; object/array variable
values render as compact ``JSON.stringify``; a missing variable keeps the
original ``{{...}}`` placeholder verbatim.
"""

from __future__ import annotations

import json
import math
import re
from urllib.parse import quote

# encodeURIComponent's unreserved set (ECMA-262 18.2.6.4)
_ENCODE_URI_COMPONENT_SAFE = "-_.!~*'()"

_PLACEHOLDER_RE = re.compile(
    r"\{\{\s*([A-Za-z0-9_.]+)(?:\s*\|\s*(raw|query|path|host))?\s*\}\}"
)
_ESCAPED_LEFT = "__AC_ESCAPED_LEFT__"


class _Missing:
    """JS ``undefined`` — distinct from an explicit null: a missing variable
    keeps its ``{{...}}`` placeholder, an explicit null renders as ''."""

    def __repr__(self) -> str:  # pragma: no cover
        return "MISSING"


MISSING = _Missing()


def get_by_path(obj, path: str):
    """Dot-path lookup (urlTemplate.ts:5-14); absent key -> ``MISSING``,
    explicit null stays ``None``."""
    if not obj or not path:
        return MISSING
    cur = obj
    for part in path.split("."):
        if cur is None or not isinstance(cur, dict):
            return MISSING
        cur = cur.get(part, MISSING)
        if cur is MISSING:
            return MISSING
    return cur


def to_string_value(v) -> str:
    """JS ``String()`` / ``JSON.stringify`` coercion (urlTemplate.ts:16-25)."""
    if v is None:
        return ""
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            if math.isinf(v):
                return "Infinity" if v > 0 else "-Infinity"
            if v.is_integer():
                return str(int(v))  # String(2.0) === "2"
        return str(v)
    try:
        return json.dumps(v, separators=(",", ":"))
    except (TypeError, ValueError):
        return str(v)


def filter_query(v: str) -> str:
    """encodeURIComponent (urlTemplate.ts:31-33)."""
    return quote(v, safe=_ENCODE_URI_COMPONENT_SAFE)


def filter_path(v: str) -> str:
    """encodeURIComponent with '/' restored (urlTemplate.ts:35-42)."""
    return quote(v, safe=_ENCODE_URI_COMPONENT_SAFE + "/")


def filter_host(v: str) -> str:
    """Lower-case, keep only hostname chars (urlTemplate.ts:44-46)."""
    return re.sub(r"[^a-z0-9.-]", "", to_string_value(v).lower())


_FILTERS = {"raw": lambda v: v, "query": filter_query, "path": filter_path,
            "host": filter_host}


def _render(template: str, variables, allow_filters: bool) -> str:
    if not isinstance(template, str) or not template:
        return template
    inp = template.replace("\\{{", _ESCAPED_LEFT)

    def sub(m: re.Match) -> str:
        val = get_by_path(variables, m.group(1))
        if val is MISSING:
            return m.group(0)  # keep original when missing (JS undefined)
        name = (m.group(2) or "raw") if allow_filters else "raw"
        return _FILTERS[name](to_string_value(val))  # explicit null -> ''

    return _PLACEHOLDER_RE.sub(sub, inp).replace(_ESCAPED_LEFT, "{{")


def render_url_template(template: str, variables=None) -> str:
    """URL fields (scrape/crawl): filters active (urlTemplate.ts:83-91)."""
    return _render(template, variables, True)


def render_text_template(template: str, variables=None) -> str:
    """Text fields (search.query): filters forced raw (urlTemplate.ts:94-102)."""
    return _render(template, variables, False)


# ------------------------------------------------- variables: validate/apply

def _js_typeof_ok(value, expected: str) -> bool:
    if expected == "string":
        return isinstance(value, str)
    if expected == "number":
        return (
            isinstance(value, (int, float))
            and not isinstance(value, bool)
            and math.isfinite(value)
        )
    if expected == "boolean":
        return isinstance(value, bool)
    return False


_URL_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def _is_js_url(v: str) -> bool:
    """``new URL(v)`` succeeds iff the string carries an explicit scheme."""
    return bool(_URL_SCHEME_RE.match(v))


def validate_variables(definitions, provided, request_data=None) -> list[str]:
    """templateHandler.ts:631-736, returning the error list instead of
    throwing (the Spark operator surfaces it as an ``errors`` column)."""
    if not definitions:
        return []
    errors: list[str] = []
    for name, definition in definitions.items():
        if definition.get("required"):
            has_value = (provided or {}).get(name) is not None
            has_default = "defaultValue" in definition
            mapped_target = (definition.get("mapping") or {}).get("target")
            has_mapped = False
            if mapped_target and request_data is not None:
                has_mapped = get_nested_value(request_data, mapped_target) is not None
            if not has_value and not has_default and not has_mapped:
                errors.append(f"Required variable '{name}' is missing")
    for name, value in (provided or {}).items():
        definition = definitions.get(name)
        if definition is None:
            errors.append(f"Unknown variable '{name}' not defined in template")
            continue
        if value is None:
            continue
        expected = definition.get("type")
        if expected in ("string", "number", "boolean"):
            if not _js_typeof_ok(value, expected):
                actual = _js_typeof(value)
                # templateHandler.ts:689 says "finite number", not "number"
                label = "finite number" if expected == "number" else expected
                errors.append(f"Variable '{name}' must be a {label}, got {actual}")
        elif expected == "url":
            if not isinstance(value, str):
                errors.append(
                    f"Variable '{name}' must be a string (URL), got {_js_typeof(value)}"
                )
            elif not _is_js_url(value):
                errors.append(f"Variable '{name}' must be a valid URL")
        elif expected == "enum":
            allowed = definition.get("values")
            if not allowed:
                allowed = [
                    o.get("value")
                    for o in definition.get("options") or []
                    if isinstance(o, dict) and o.get("value") is not None
                ]
            if not allowed:
                errors.append(f"Variable '{name}' enum has no values defined")
            elif value not in allowed:
                vals = ", ".join(json.dumps(v) for v in allowed)
                errors.append(
                    f"Variable '{name}' must be one of [{vals}], got {json.dumps(value)}"
                )
        else:
            errors.append(f"Variable '{name}' has unknown type '{expected}'")
    return errors


def _js_typeof(v) -> str:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    return "object"


def apply_variable_defaults(definitions, provided):
    """templateHandler.ts:739-768 — defaults fill missing/None variables;
    returns ``provided`` unchanged when nothing applied and nothing given."""
    if not definitions:
        return provided
    merged = dict(provided) if provided else {}
    default_applied = False
    for name, definition in definitions.items():
        if merged.get(name) is None and "defaultValue" in definition:
            merged[name] = definition["defaultValue"]
            default_applied = True
    if provided:
        return merged
    if default_applied:
        return merged
    return provided


def get_nested_value(obj, path: str):
    """templateHandler.ts:578-596 — callers only ever test
    ``!== undefined && !== null``, so missing collapses to None here."""
    if not path:
        return None
    v = get_by_path(obj, path)
    return None if v is MISSING else v


def set_nested_value(target: dict, path: str, value) -> None:
    """templateHandler.ts:599-621 — create intermediate dicts, overwrite
    non-dict intermediates."""
    if not path:
        return
    segments = [s for s in path.split(".")]
    cur = target
    while len(segments) > 1:
        seg = segments.pop(0)
        if not seg:
            continue
        if not isinstance(cur.get(seg), dict):
            cur[seg] = {}
        cur = cur[seg]
    final = segments.pop() if segments else None
    if final:
        cur[final] = value


def map_variables_to_request_data(variables, definitions, request_data) -> dict:
    """templateHandler.ts:548-576 — precedence: explicit request field >
    variable mapping (never overrides a present value)."""
    updated = dict(request_data or {})
    if not variables or not definitions:
        return updated
    for name, value in variables.items():
        target = ((definitions.get(name) or {}).get("mapping") or {}).get("target")
        if not target:
            continue
        if get_nested_value(updated, target) is not None:
            continue
        set_nested_value(updated, target, value)
    return updated


# ----------------------------------------------------------- option merging

def merge_options_with_template(template_options: dict, request_options: dict) -> dict:
    """Shallow merge, request wins when not None (optionMerger.ts:13-27)."""
    merged = dict(template_options or {})
    for k, v in (request_options or {}).items():
        if v is not None:
            merged[k] = v
    return merged


def deep_merge_options_with_template(request_options: dict, template_options: dict) -> dict:
    """Recursive merge, request wins; dicts merge, lists replace
    (optionMerger.ts:38-67 — note the argument order matches the TS)."""
    merged = dict(template_options or {})
    for k, v in (request_options or {}).items():
        if v is None:
            continue
        tv = merged.get(k)
        if isinstance(v, dict) and isinstance(tv, dict):
            merged[k] = deep_merge_options_with_template(v, tv)
        else:
            merged[k] = v
    return merged


# -------------------------------------------------------------- transforms

_JS_FLAGS = {"i": re.I, "m": re.M, "s": re.S, "g": 0, "u": 0}


def _js_global_replace(tpl: str, needle: str, replacement: str) -> str:
    """JS ``tpl.replace(new RegExp(escaped_needle, "g"), replacement)`` with
    GetSubstitution $-pattern semantics (templateHandler.ts:506 — ADVICE r3):
    inside ``replacement``, ``$$`` -> ``$``, ``$&`` -> the matched needle,
    ``$`` + backtick -> the part of ``tpl`` BEFORE this occurrence, ``$'`` ->
    the part AFTER it. The pattern here has zero capture groups and no named
    groups, so ``$n`` / ``$<name>`` stay literal (ES GetSubstitution leaves
    out-of-range group refs untouched, and ``$<`` is only active when the
    regex declares named groups). Python re.sub treats \\ escapes instead, so
    a plain re.sub diverges for subjects containing $ — legal in URLs."""
    out: list[str] = []
    pos = 0
    while True:
        i = tpl.find(needle, pos)
        if i < 0:
            out.append(tpl[pos:])
            return "".join(out)
        out.append(tpl[pos:i])
        before, after = tpl[:i], tpl[i + len(needle):]
        j = 0
        while j < len(replacement):
            ch = replacement[j]
            nxt = replacement[j + 1] if j + 1 < len(replacement) else ""
            if ch == "$" and nxt == "$":
                out.append("$"); j += 2
            elif ch == "$" and nxt == "&":
                out.append(needle); j += 2
            elif ch == "$" and nxt == "`":
                out.append(before); j += 2
            elif ch == "$" and nxt == "'":
                out.append(after); j += 2
            else:
                out.append(ch); j += 1
        pos = i + len(needle)


def apply_transform(value: str, transform, placeholder: str) -> str:
    """templateHandler.ts:459-523: optional regexExtract, then 'template'
    mode (replace ``{{url}}``/``{{query}}``) or 'append' mode
    (prefix+value+suffix). Disabled/unknown configs pass through."""
    if not transform or not transform.get("enabled"):
        return value
    subject = value
    re_cfg = transform.get("regexExtract")
    if re_cfg and re_cfg.get("pattern"):
        try:
            flags = 0
            for ch in re_cfg.get("flags") or "":
                flags |= _JS_FLAGS.get(ch, 0)
            m = re.search(re_cfg["pattern"], subject, flags)
            if m:
                group = re_cfg.get("group")
                n_groups = m.re.groups + 1
                if isinstance(group, int) and not isinstance(group, bool) \
                        and 0 <= group < n_groups:
                    subject = m.group(group)
                    if subject is None:
                        subject = m.group(0)
                else:
                    subject = m.group(0)
                if re_cfg.get("trim") is not False:
                    subject = subject.strip()
        except re.error:
            pass  # invalid regex config — fall back to the original subject
    mode = transform.get("mode")
    if mode == "template":
        tpl = transform.get("template")
        if not tpl:
            return subject
        return _js_global_replace(tpl, "{{%s}}" % placeholder, subject)
    if mode == "append":
        prefix = transform.get("prefix") or ""
        suffix = transform.get("suffix") or ""
        if not prefix and not suffix:
            return subject
        return f"{prefix}{subject}{suffix}"
    return subject


# ------------------------------------------------------- request validation

_TEMPLATE_ALLOWED_FIELDS = {
    "scrape": frozenset({"template_id", "url", "variables"}),
    "crawl": frozenset({"template_id", "url", "variables"}),
    "search": frozenset({"template_id", "query", "variables"}),
}


def validate_template_only_fields(request_keys, template_type: str) -> list[str]:
    """templateValidator.ts:11-55 — returns the invalid keys (empty = ok).
    An unknown template_type marks EVERY key invalid instead of raising
    (ADVICE r3: a KeyError here crashed the whole mapInPandas stage for one
    malformed row; the reference's runtime equivalent is a thrown TypeError
    → per-request 500, i.e. row-scoped failure, never batch-scoped)."""
    allowed = _TEMPLATE_ALLOWED_FIELDS.get(template_type)
    if allowed is None:
        return list(request_keys)
    return [k for k in request_keys if k not in allowed]


def resolve_price(pricing, currency: str = "credits") -> float:
    """templateHandler.ts:446-455 — perCall credits when configured."""
    per_call = (pricing or {}).get("perCall")
    if (
        isinstance(per_call, (int, float))
        and not isinstance(per_call, bool)
        and math.isfinite(per_call)
        and per_call > 0
        and (pricing or {}).get("currency") == currency
    ):
        return float(per_call)
    return 0.0


# ----------------------------------------- domain / keyword restrictions
# (packages/template-client/src/validator/domainValidator.ts — the
# deterministic restriction grammar; glob matching shares the repo's
# minimatch-ish kernel from functions/patterns.py, the X8 parity surface)

def parse_domain_restriction(allowed):
    """domainValidator.ts:115-137 parseDomainRestriction + normalizePatterns:
    string -> exact [s]; list -> exact; {patterns, type} -> as configured;
    comma-delimited entries split and trimmed; non-strings dropped."""
    if isinstance(allowed, str):
        rtype, patterns = "exact", [allowed]
    elif isinstance(allowed, list):
        rtype, patterns = "exact", allowed
    elif isinstance(allowed, dict) and "patterns" in allowed:
        if not isinstance(allowed["patterns"], list):
            return None
        rtype, patterns = allowed.get("type") or "exact", allowed["patterns"]
    else:
        return None
    normalized = [
        seg.strip()
        for p in patterns
        if isinstance(p, str)
        for seg in p.split(",")
        if seg.strip()
    ]
    if not normalized:
        return None
    return {"type": rtype, "patterns": normalized}


def _glob_match(value: str, pattern: str) -> bool:
    from anycrawl_spark.functions.patterns import glob_to_regex

    return re.fullmatch(glob_to_regex(pattern), value) is not None


def validate_pattern(value: str, restriction, field_name: str = "value"):
    """domainValidator.ts:31-63 — (ok, error). Used for search
    allowedKeywords; value and patterns compare lowercased/trimmed."""
    if not restriction or not restriction.get("patterns"):
        return True, None
    v = value.lower().strip()
    for pattern in restriction["patterns"]:
        if not pattern:
            continue
        p = pattern.lower().strip()
        if restriction["type"] == "exact":
            if v == p:
                return True, None
        elif restriction["type"] == "glob" and _glob_match(v, p):
            return True, None
    return False, (
        f"{field_name} '{value}' is not allowed for this template. "
        f"Allowed patterns: {', '.join(restriction['patterns'])}"
    )


_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443"}


def _normalize_url_for_comparison(url: str) -> tuple[str, str, str, str, str]:
    """(normalized, origin, hostname, pathname, query+hash) per JS URL
    semantics: origin lowercased with default ports dropped, empty path ->
    '/' (domainValidator.ts:139-145)."""
    from urllib.parse import urlsplit

    s = urlsplit(url)
    if not s.scheme or s.hostname is None:
        raise ValueError(f"Invalid URL: {url}")
    scheme = s.scheme.lower()
    host = s.hostname.lower()
    port = s.port
    origin = f"{scheme}://{host}"
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        origin += f":{port}"
    pathname = s.path or "/"
    tail = (f"?{s.query}" if s.query else "") + (f"#{s.fragment}" if s.fragment else "")
    return f"{origin}{pathname}{tail}", origin, host, pathname, tail


def validate_domain(url: str, restriction):
    """domainValidator.ts:70-110 validateDomain — (ok, error). Exact compares
    the normalized URL (when the pattern parses as one) or the bare hostname;
    glob matches the candidate-representation set (:207-246)."""
    if not restriction or not restriction.get("patterns"):
        return True, None
    try:
        target, origin, hostname, pathname, tail = _normalize_url_for_comparison(url)
    except ValueError as e:
        return False, f"Invalid URL format: {e}"
    for pattern in restriction["patterns"]:
        if not pattern:
            continue
        if restriction["type"] == "exact":
            try:
                if _normalize_url_for_comparison(pattern)[0] == target:
                    return True, None
            except ValueError:
                pass
            if hostname == pattern.lower():
                return True, None
        elif restriction["type"] == "glob":
            p = pattern.lower()
            with_slash = "/" if pathname == "/" else re.sub(r"/+$", "/", pathname)
            no_slash = "/" if pathname == "/" else re.sub(r"/+$", "", pathname)
            candidates = {
                target, origin,
                f"{origin}{with_slash}", f"{origin}{no_slash}",
                f"{origin}{with_slash}{tail}", f"{origin}{no_slash}{tail}",
                hostname,
                f"{hostname}{with_slash}", f"{hostname}{no_slash}",
                f"{hostname}{with_slash}{tail}", f"{hostname}{no_slash}{tail}",
            }
            if no_slash.startswith("/") and no_slash != "/":
                candidates.add(f"{hostname}/{no_slash[1:]}")
                candidates.add(f"{hostname}/{no_slash[1:]}{tail}")
            if any(_glob_match(c, p) for c in candidates):
                return True, None
    return False, (
        f"URL '{target}' is not allowed for this template. "
        f"Allowed patterns: {', '.join(restriction['patterns'])}"
    )
