"""ECMAScript numeric/string primitives shared by the parity kernels.

The reference is TypeScript: request payloads and env knobs flow through JS
``parseInt`` and ``String.prototype.trim``, whose whitespace and digit sets
differ from Python's ``str.strip()``/``\\s``/``\\d`` in both directions —
Python's ``\\s`` adds ``\\x1c``-``\\x1f`` and ``\\x85`` (not JS whitespace)
and ``\\d`` matches Unicode digits like U+0665 (parseInt takes ASCII only),
while JS trims NBSP / the Zs category / ZWNBSP which ``\\s`` in Java regexes
misses.  Each divergence here was found live by differential fuzz against
node oracles executing the reference's own sources (tests/node_oracle.py).

Two parseInt forms:

- :func:`js_parse_int` — the exact mathematical integer (arbitrary
  precision), for range-guard call sites (IP octets, CIDR prefix lengths)
  where only comparisons against small bounds matter.
- :func:`js_parse_int_number` — IEEE-754 double semantics: JS ``parseInt``
  returns a Number, so 20-digit strings round to the nearest double and
  ~310+-digit strings overflow to Infinity; NaN maps to ``float('nan')``.
  For call sites whose result feeds arithmetic (credit formulas).
"""

from __future__ import annotations

import re

# ECMAScript WhiteSpace + LineTerminator: TAB LF VT FF CR SP NBSP OGHAM
# EN-QUAD..HAIR-SPACE LS PS NNBSP MMSP IDEOGRAPHIC-SPACE ZWNBSP.
_WS_CODEPOINTS = (
    0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0xA0, 0x1680,
    *range(0x2000, 0x200B), 0x2028, 0x2029, 0x202F, 0x205F, 0x3000, 0xFEFF,
)
JS_WS_CHARS = "".join(map(chr, _WS_CODEPOINTS))

# the same set as a regex character-class body: none of these codepoints is a
# class metacharacter, so the literal chars are valid in both Python re and
# Java regex (Spark regexp_extract stays in parity with the python kernels)
JS_WS_CLASS = JS_WS_CHARS

_INT_PREFIX = re.compile(rf"^[{JS_WS_CLASS}]*([+-]?[0-9]+)")


def js_trim(s: str) -> str:
    """``String.prototype.trim``: strips exactly the JS whitespace set."""
    return s.strip(JS_WS_CHARS)


def js_parse_int(s: str) -> int | None:
    """``parseInt(s, 10)`` as an exact integer; NaN -> ``None``.

    Signed zero note: parseInt('-0') is JS ``-0``, which compares equal to 0
    everywhere the kernels use it, so plain ``0`` is returned.
    """
    m = _INT_PREFIX.match(s)
    return int(m.group(1)) if m else None


_MAX_SAFE = 2**53


def js_parse_int_number(s: str) -> int | float:
    """``parseInt(s, 10)`` with JS Number (double) semantics.

    Returns an exact ``int`` while representable (<= 2^53), else the nearest
    double (rounding exactly as JS does for long digit strings, Infinity past
    ~1.8e308); ``float('nan')`` when no digits parse.
    """
    n = js_parse_int(s)
    if n is None:
        return float("nan")
    if abs(n) <= _MAX_SAFE:
        return n
    try:
        return float(n)
    except OverflowError:
        return float("inf") if n > 0 else float("-inf")


def js_number_to_string(v: float) -> str:
    """ECMAScript ``String(Number)`` (Number::toString, radix 10): shortest
    round-trip digits, decimal notation for exponents in (-7, 21], exponent
    notation outside — 1e21 prints as '1e+21' but 1e20 spells out, 1e-7
    prints as '1e-7' (no zero-padded exponent) while 1e-6 spells '0.000001'.
    ``String(-0)`` is '0'."""
    if v != v:
        return "NaN"
    if v == float("inf"):
        return "Infinity"
    if v == float("-inf"):
        return "-Infinity"
    if v == 0:
        return "0"  # covers -0.0
    sign = "-" if v < 0 else ""
    r = repr(abs(v))  # shortest round-trip, same digits JS picks
    if "e" in r:
        mant, exp = r.split("e")
        e = int(exp)
    else:
        mant, e = r, 0
    point = mant.index(".") if "." in mant else len(mant)
    n = point + e  # value = 0.<digits> * 10^n
    # normalize: strip leading zeros (adjusting n) and trailing zeros
    raw = mant.replace(".", "")
    lead = len(raw) - len(raw.lstrip("0"))
    digits = raw.lstrip("0").rstrip("0")
    n -= lead
    k = len(digits)
    if k <= n <= 21:
        return sign + digits + "0" * (n - k)
    if 0 < n <= 21:
        return sign + digits[:n] + "." + digits[n:]
    if -6 < n <= 0:
        return sign + "0." + "0" * (-n) + digits
    exp_part = n - 1
    head = digits[0] + ("." + digits[1:] if k > 1 else "")
    return f"{sign}{head}e{'+' if exp_part >= 0 else '-'}{abs(exp_part)}"


def js_string(v) -> str:
    """ECMAScript ``String(v)`` for JSON values (template-literal
    interpolation): booleans lowercase, numbers via Number::toString,
    arrays join(',') with null/undefined as '', objects '[object
    Object]', null -> 'null'."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    if isinstance(v, float):
        return js_number_to_string(v)
    if isinstance(v, int):
        if abs(v) <= _MAX_SAFE:
            return str(v)
        try:  # a JS Number is a double: 1e23-ish ints print in e-notation
            return js_number_to_string(float(v))
        except OverflowError:
            return "Infinity" if v > 0 else "-Infinity"
    if isinstance(v, list):
        return ",".join("" if x is None else js_string(x) for x in v)
    if isinstance(v, dict):
        return "[object Object]"
    return str(v)


def _js_own_keys(d: dict) -> list:
    """ECMAScript OrdinaryOwnPropertyKeys order: array-index keys (canonical
    numeric strings in [0, 2^32-2]) ascending FIRST, then the remaining
    string keys in insertion order — `{"b":1,"0":2}` stringifies as
    `{"0":2,"b":1}` (found by the node primitives fuzz)."""
    idx, rest = [], []
    for k in d:
        s = str(k)
        # ASCII-only: '²'.isdigit() is True but int('²') raises, and JS
        # treats non-ASCII digits as plain string keys anyway
        if s.isascii() and s.isdigit() and str(int(s)) == s and int(s) < 2**32 - 1:
            idx.append((int(s), k))
        else:
            rest.append(k)
    return [k for _, k in sorted(idx, key=lambda t: t[0])] + rest


def js_json_stringify(v) -> str:
    """``JSON.stringify`` with ECMAScript number formatting throughout:
    integral doubles print without '.0', exponent thresholds/format follow
    Number::toString (JSON.stringify(1e-7) === '1e-7'), separators are
    compact, non-finite numbers become null, strings stay unicode, and
    object keys follow JS own-property order (integer-like keys first,
    ascending)."""
    import json
    import math

    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return js_number_to_string(v) if math.isfinite(v) else "null"
    if isinstance(v, int):
        # JSON.parse already made this a DOUBLE in JS: ints past 2^53
        # print with double precision ('1e+23', 9007199254740992), and
        # past DBL_MAX they are Infinity -> null in JSON
        if abs(v) <= _MAX_SAFE:
            return str(v)
        try:
            return js_number_to_string(float(v))
        except OverflowError:
            return "null"
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, list):
        return "[" + ",".join(js_json_stringify(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{json.dumps(str(k), ensure_ascii=False)}:{js_json_stringify(v[k])}"
            for k in _js_own_keys(v)
        ) + "}"
    raise TypeError(f"not JSON-serializable: {type(v)}")


_HEX_RE = re.compile(r"^[+-]?0[xX][0-9a-fA-F]+$")
_OCT_RE = re.compile(r"^[+-]?0[oO][0-7]+$")
_BIN_RE = re.compile(r"^[+-]?0[bB][01]+$")
_DEC_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def js_to_number(v) -> float:
    """ECMAScript ``ToNumber`` over JSON values: null -> 0, booleans 0/1,
    strings via StringToNumber (JS-whitespace-trimmed; '' -> 0; decimal
    with exponent; 0x/0o/0b radix prefixes, sign only on decimals;
    'Infinity'), arrays via ToPrimitive (join(',') then StringToNumber, so
    [5] -> 5 and [] -> 0), objects -> NaN."""
    nan = float("nan")
    if v is None:
        return 0.0
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, list):
        return js_to_number(js_string(v))
    if isinstance(v, dict):
        return nan
    if not isinstance(v, str):
        return nan
    s = js_trim(v)
    if s == "":
        return 0.0
    if s in ("Infinity", "+Infinity"):
        return float("inf")
    if s == "-Infinity":
        return float("-inf")
    try:
        # radix literals take NO sign in StringToNumber
        if _HEX_RE.match(s) and s[0] not in "+-":
            return float(int(s, 16))
        if _OCT_RE.match(s) and s[0] not in "+-":
            return float(int(s, 8))
        if _BIN_RE.match(s) and s[0] not in "+-":
            return float(int(s, 2))
        if _DEC_RE.match(s):
            return float(s)
    except (ValueError, OverflowError):
        return float("inf") if not s.startswith("-") else float("-inf")
    return nan
