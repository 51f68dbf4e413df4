"""Direct differential fuzz of the shared ECMAScript-semantics primitives
(functions/js.py) against node's own builtins: Number::toString via
String(), String() coercion of JSON values, JSON.stringify, trim, and
parseInt. These back every byte-parity kernel (templates, SERP parse,
LLM-extract dedup keys), so they get pinned at the source."""

import json
import math
import random
import shutil
import struct
import subprocess

import pytest

from node_oracle import fuzz_seed

from anycrawl_spark.functions.js import (
    js_json_stringify,
    js_number_to_string,
    js_parse_int_number,
    js_string,
    js_trim,
)

pytestmark = pytest.mark.skipif(
    not shutil.which("node"), reason="node not available"
)


def _node(script: str, payload) -> object:
    out = subprocess.run(
        ["node", "-e", script], input=json.dumps(payload),
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr[:500]
    return json.loads(out.stdout)


def _rand_floats(rnd, n):
    vals = [0.0, -0.0, 1.0, 2.0, 0.5, 1e20, 1e21, 1.0000001e21, 9.999e20,
            1e-6, 1e-7, 5e-7, 1.5e-7, 123456789.123456, 2 ** 53 - 1.0,
            2 ** 53 + 2.0, 5e-324, 2.225073858507e-308, 1.7976931348623157e308,
            0.1, 0.30000000000000004, 1234.5678e8, 3.14159e-5]
    out = list(vals)
    for _ in range(n):
        b = rnd.getrandbits(64)
        f = struct.unpack("<d", struct.pack("<Q", b))[0]
        if math.isfinite(f):
            out.append(f)
    return out


def test_number_to_string_vs_node():
    rnd = random.Random(fuzz_seed(20260826))
    floats = _rand_floats(rnd, 3000)
    payload = [struct.pack("<d", f).hex() for f in floats]
    script = (
        "const hex = JSON.parse(require('fs').readFileSync(0,'utf8'));"
        "console.log(JSON.stringify(hex.map(h => {"
        "  const b = Buffer.from(h, 'hex'); return String(b.readDoubleLE(0));"
        "})));"
    )
    ref = _node(script, payload)
    diverging = [
        (f, e, js_number_to_string(f))
        for f, e in zip(floats, ref)
        if js_number_to_string(f) != e
    ]
    assert diverging == [], (len(diverging), diverging[:10])


def _rand_json(rnd, depth=0):
    if depth > 2:
        return rnd.choice([None, True, False, 0, 1, -7, 2.5, 2.0, "", "x",
                           "uni ß", 1e21, 1e-7, 10**23, 2**53 + 1,
                           -(10**25)])
    r = rnd.random()
    if r < 0.4:
        return _rand_json(rnd, 3)
    if r < 0.7:
        return [_rand_json(rnd, depth + 1) for _ in range(rnd.randint(0, 3))]
    return {
        rnd.choice(["a", "b", "0", "10", "2", "k x", "ß", "²"]):
            _rand_json(rnd, depth + 1)
        for _ in range(rnd.randint(0, 3))
    }


def test_string_and_stringify_vs_node():
    rnd = random.Random(fuzz_seed(20260827))
    vals = [_rand_json(rnd) for _ in range(2000)]
    script = (
        "const vs = JSON.parse(require('fs').readFileSync(0,'utf8'));"
        "console.log(JSON.stringify(vs.map(v => [String(v), JSON.stringify(v)])));"
    )
    ref = _node(script, vals)
    diverging = []
    for v, (s_exp, j_exp) in zip(vals, ref):
        s_got, j_got = js_string(v), js_json_stringify(v)
        if s_got != s_exp or j_got != j_exp:
            diverging.append((v, (s_exp, j_exp), (s_got, j_got)))
    assert diverging == [], (len(diverging), diverging[:10])


def test_trim_and_parse_int_vs_node():
    rnd = random.Random(fuzz_seed(20260828))
    ws = ["", " ", "\t", "\n", " ", " ", " ", "﻿",
          "​", "\v", "\f", "　", ""]
    bodies = ["", "0", "42", "-7", "+9", "0x1f", "12ab", "ab", "9" * 25,
              "1.5", "-", "+", "0X10", "١٢"]
    cases = [
        rnd.choice(ws) + rnd.choice(bodies) + rnd.choice(ws)
        for _ in range(2000)
    ]
    script = (
        "const vs = JSON.parse(require('fs').readFileSync(0,'utf8'));"
        "console.log(JSON.stringify(vs.map(v => {"
        "  const p = parseInt(v, 10);"
        "  return [v.trim(), Number.isNaN(p) ? '__nan__' : String(p)];"
        "})));"
    )
    ref = _node(script, cases)
    diverging = []
    for v, (t_exp, p_exp) in zip(cases, ref):
        t_got = js_trim(v)
        p = js_parse_int_number(v)
        p_got = "__nan__" if isinstance(p, float) and math.isnan(p) \
            else js_number_to_string(float(p))
        if t_got != t_exp or p_got != p_exp:
            diverging.append((v, (t_exp, p_exp), (t_got, p_got)))
    assert diverging == [], (len(diverging), diverging[:10])
