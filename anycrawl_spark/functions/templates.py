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

from anycrawl_spark.functions.js import (
    js_json_stringify,
    js_number_to_string,
    js_trim,
)

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


def _js_prop(obj, key: str):
    """JS property access ``obj[key]`` for JSON values: dicts read the key;
    arrays and strings expose canonical digit indices and ``length``;
    everything else (numbers, booleans) has no own properties. Returns
    ``MISSING`` for JS ``undefined``. (node fuzz: the variable mapper's
    existing-value check reads THROUGH arrays/strings — 'a.length' on
    ``{"a": [1, 2]}`` is 2, not undefined.)"""
    if isinstance(obj, dict):
        return obj.get(key, MISSING)
    if isinstance(obj, (list, str)):
        if key == "length":
            return len(obj)
        if (key.isascii() and key.isdigit() and key == str(int(key))
                and int(key) < len(obj)):
            return obj[int(key)]
    return MISSING


def get_by_path(obj, path: str):
    """Dot-path lookup (urlTemplate.ts:5-14) with JS property-access
    semantics per segment; absent key -> ``MISSING``, explicit null stays
    ``None``."""
    if not obj or not path:
        return MISSING
    cur = obj
    for part in path.split("."):
        if cur is None or cur is MISSING:
            return MISSING
        cur = _js_prop(cur, part)
    return cur if cur is not MISSING else MISSING


def to_string_value(v) -> str:
    """JS ``String()`` / ``JSON.stringify`` coercion (urlTemplate.ts:16-25).
    Numbers use the full ECMAScript Number::toString algorithm (exponent
    thresholds at 1e21/1e-7, no zero-padded exponents — node fuzz);
    containers stringify compactly with JS number formatting inside."""
    if v is None:
        return ""
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return js_number_to_string(v)
    if isinstance(v, int):
        return str(v)
    try:
        return _js_json(v)
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

# WHATWG "special" schemes require a parseable authority; any other scheme
# takes an opaque path and new URL() virtually never fails past the scheme.
# 'file' is special too but with its own rules (empty host fine, no port).
_SPECIAL_SCHEMES = frozenset({"http", "https", "ws", "wss", "ftp"})


def _is_js_url(v: str) -> bool:
    """``new URL(v)`` success: an explicit scheme is required; for special
    schemes (http/https/ws/wss/ftp) the authority must also parse per WHATWG
    (reusing the C1 canonicalizer's host/port validation — a space in the
    host or an out-of-range port throws in JS). One canonicalizer deviation
    is compensated: dot-only hosts ('http://..') are VALID in node but the
    dedup canonicalizer folds trailing dots and so rejects them. 'file'
    URLs (also WHATWG-special — code review) allow an EMPTY host but no
    port and no credentials; a non-empty file host validates like any
    special host."""
    m = _URL_SCHEME_RE.match(v)
    if not m:
        return False
    scheme = v[: m.end() - 1].lower()
    if scheme == "file":
        from urllib.parse import urlsplit

        from anycrawl_spark.functions.urls import canonicalize_url

        try:
            netloc = urlsplit("http:" + v[m.end():].replace("\\", "/")).netloc
        except ValueError:
            return False
        if netloc == "":
            return True  # file:///path — hostless is the common valid form
        # WHATWG: file URLs take no credentials and no port (':' AFTER a
        # bracket IPv6 host is a port; inside brackets it is the address)
        tail = netloc.rpartition("]")[2] if netloc.startswith("[") else netloc
        if "@" in netloc or ":" in tail:
            return False
        return canonicalize_url("http://" + netloc + "/") is not None
    if scheme in _SPECIAL_SCHEMES:
        from urllib.parse import urlsplit

        from anycrawl_spark.functions.urls import canonicalize_url

        if canonicalize_url("http:" + v[m.end():]) is not None:
            return True
        try:
            netloc = urlsplit("http:" + v[m.end():].replace("\\", "/")).netloc
        except ValueError:
            return False
        hostpart = netloc.rpartition("@")[2]
        host, _, port = hostpart.partition(":")
        return (
            bool(host)
            and set(host) == {"."}
            and (not port or (port.isdigit() and int(port) <= 65535))
        )
    return True


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
            # templateHandler.ts:705-718: `values` must be a non-empty ARRAY;
            # else fall back to options[].value keeping explicit nulls
            # (opt?.value === undefined is filtered, null survives into the
            # allowed list and the message) — node fuzz divergences
            allowed = definition.get("values")
            if not isinstance(allowed, list) or not allowed:
                options = definition.get("options")
                if isinstance(options, list):
                    allowed = [
                        o["value"]
                        for o in options
                        if isinstance(o, dict) and "value" in o
                    ]
            if not isinstance(allowed, list) or not allowed:
                errors.append(f"Variable '{name}' enum has no values defined")
            elif not _js_strict_includes(allowed, value):
                vals = ", ".join(_js_json(v) for v in allowed)
                errors.append(
                    f"Variable '{name}' must be one of [{vals}], got {_js_json(value)}"
                )
        else:
            # JS string interpolation: a MISSING type prints as 'undefined',
            # an explicit null as 'null', other non-strings via String()
            # (node fuzz: python 'None' diverged on both)
            if "type" not in definition:
                label = "undefined"
            elif expected is None:
                label = "null"
            else:
                label = to_string_value(expected)
            errors.append(f"Variable '{name}' has unknown type '{label}'")
    return errors


def _js_strict_includes(allowed: list, value) -> bool:
    """``Array.prototype.includes`` (SameValueZero): booleans never equal
    numbers (1 !== true), and objects/arrays compare by IDENTITY — a
    JSON-distinct dict never matches (python ``in`` would use ==)."""
    for a in allowed:
        if isinstance(value, (dict, list)) or isinstance(a, (dict, list)):
            if a is value:
                return True
            continue
        if isinstance(value, bool) != isinstance(a, bool):
            continue
        if (value is None) != (a is None):
            continue
        if value == a:
            return True
    return False


_js_json = js_json_stringify  # canonical home: functions/js.py


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


def _js_is_index(seg: str) -> bool:
    # ASCII-only: '²'.isdigit() is True but int('²') raises (code review)
    return seg.isascii() and seg.isdigit() and seg == str(int(seg))


def _js_set_prop(cur, seg: str, value):
    """JS assignment ``cur[seg] = value`` for JSON containers, returning the
    value now reachable at ``cur[seg]`` (for descent). On ARRAYS: canonical
    digit indices set/extend elements (holes serialize as null, so they are
    filled with None); ``length`` assignment resizes or throws RangeError
    exactly like JS; any other key becomes a non-index property that
    JSON.stringify drops — modelled as a DETACHED dict so deeper writes
    vanish from the output the same way. (node fuzz: a mapping target of
    'a.b' with ``{"a": [0]}`` must leave the array untouched, not replace
    it.)"""
    if isinstance(cur, dict):
        cur[seg] = value
        return value
    if isinstance(cur, list):
        if seg == "length":
            # ECMAScript ArraySetLength: numberLen = ToNumber(v), newLen =
            # ToUint32(v); RangeError when they differ (negative, fractional,
            # NaN, >= 2^32) — so ' 5', '5.0', '1e2', true all coerce while
            # 2**32 and 'abc' throw, exactly as node does (code review).
            from anycrawl_spark.functions.js import js_to_number

            num = js_to_number(value)
            if num != num or num < 0 or num >= 2**32 or num != int(num):
                raise ValueError("Invalid array length")  # JS RangeError
            n = int(num)
            # deliberate deviation: JS stores the length SPARSELY, but this
            # JSON model must materialize holes as null — cap the eager
            # allocation a template could otherwise OOM the executor with
            if n > (1 << 20):
                raise ValueError(
                    "Invalid array length (materialization cap: JSON arrays "
                    "past 2^20 elements are refused, where JS would go sparse)"
                )
            del cur[n:]
            cur.extend([None] * (n - len(cur)))
            return value
        if _js_is_index(seg):
            idx = int(seg)
            if idx < len(cur):
                cur[idx] = value
            else:
                cur.extend([None] * (idx - len(cur)))
                cur.append(value)
            return value
        return value  # non-index array property: invisible to JSON
    return value  # primitives silently ignore property writes


def set_nested_value(target: dict, path: str, value) -> None:
    """templateHandler.ts:599-621 — create intermediate dicts, overwrite
    non-OBJECT intermediates (JS ``typeof``: arrays are objects, so the walk
    descends INTO arrays instead of clobbering them — node fuzz)."""
    if not path:
        return
    segments = [s for s in path.split(".")]
    cur = target
    while len(segments) > 1:
        seg = segments.pop(0)
        if not seg:
            continue
        nxt = _js_prop(cur, seg)
        if not isinstance(nxt, (dict, list)):
            fresh: dict = {}
            # on arrays with a non-index key this attaches nothing — deeper
            # writes land in the detached dict and drop out of the JSON,
            # exactly like JS non-index array properties under stringify
            _js_set_prop(cur, seg, fresh)
            cur = fresh
        else:
            cur = nxt
    final = segments.pop() if segments else None
    if final:
        _js_set_prop(cur, final, value)


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

# JS RegExp flag characters: unknown or DUPLICATE flags make `new RegExp`
# throw (caught by applyTransform -> extraction skipped entirely), so the
# validity gate must run before any matching (node fuzz: 'x'/'gg' diverged).
# 'd'/'u'/'v' don't change match results for the shared pattern dialect;
# 'y' (sticky) anchors matching at position 0.
_JS_FLAG_CHARS = frozenset("dgimsuvy")
_JS_FLAG_MAP = {"i": re.I, "m": re.M, "s": re.S}


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
            flag_str = re_cfg.get("flags") or ""
            if (
                any(ch not in _JS_FLAG_CHARS for ch in flag_str)
                or len(set(flag_str)) != len(flag_str)
            ):
                raise re.error("invalid RegExp flags")  # new RegExp throws
            flags = 0
            for ch in flag_str:
                flags |= _JS_FLAG_MAP.get(ch, 0)
            rex = re.compile(re_cfg["pattern"], flags)
            sticky, global_ = "y" in flag_str, "g" in flag_str
            if global_:
                # JS String.match with /g returns the array of FULL matches
                # (no groups), so `group` indexes MATCHES there (node fuzz)
                if sticky:
                    matches, pos = [], 0
                    while (mm := rex.match(subject, pos)) is not None:
                        matches.append(mm.group(0))
                        pos = mm.end() + (mm.end() == pos)  # empty-match step
                        if pos > len(subject):
                            break
                else:
                    matches = [mm.group(0) for mm in rex.finditer(subject)]
                m = bool(matches)
            else:
                m = rex.match(subject) if sticky else rex.search(subject)
            if m:
                group = re_cfg.get("group")
                # Number.isInteger accepts integral FLOATS (2.0) — JSON
                # numbers arrive as either (node fuzz: group=2.0 diverged)
                is_int = (
                    isinstance(group, (int, float))
                    and not isinstance(group, bool)
                    and float(group).is_integer()
                )
                idx = int(group) if is_int else 0
                if global_:
                    subject = matches[idx] if 0 <= idx < len(matches) else matches[0]
                else:
                    n_groups = m.re.groups + 1
                    if 0 <= idx < n_groups:
                        subject = m.group(idx)
                        if subject is None:
                            subject = m.group(0)
                    else:
                        subject = m.group(0)
                if re_cfg.get("trim") is not False:
                    # JS String.prototype.trim, not python strip (node fuzz:
                    # \x1c survives a JS trim)
                    subject = js_trim(subject)
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
    """templateHandler.ts:446-455 — perCall credits when configured.
    A non-dict pricing reads as undefined fields in JS (never a crash)."""
    per_call = pricing.get("perCall") if isinstance(pricing, dict) else None
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
    """Plain ``minimatch(value, pattern)`` — domainValidator.ts calls the
    library with DEFAULT options (dot:false), unlike the capture rules'
    {dot: true}; negation ('!x'), classes and extglobs all apply."""
    from anycrawl_spark.functions.capture import glob_match

    return glob_match(value, pattern, dot=False)


def validate_pattern(value: str, restriction, field_name: str = "value"):
    """domainValidator.ts:31-63 — (ok, error). Used for search
    allowedKeywords; value and patterns compare lowercased/trimmed."""
    if not restriction or not restriction.get("patterns"):
        return True, None
    v = js_trim(value.lower())
    for pattern in restriction["patterns"]:
        if not pattern:
            continue
        p = js_trim(pattern.lower())
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
    except ValueError:
        # node's TypeError carries exactly 'Invalid URL' as its message
        return False, "Invalid URL format: Invalid URL"
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
