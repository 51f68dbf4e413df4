"""Google locale tables — loaded from the CSV data files in this package.

Data-constant parity with the reference (packages/libs/src/data/Google.ts:
1-590 and Locale.ts:1-154 — values extracted verbatim as CSV dims, per the
broadcast-data-file design). ROW ORDER IS LOAD-BEARING: the reference's
language->region fallback takes the FIRST matching regions entry
(Google.ts engine :88-97), and python dicts preserve insertion order.
"""

from __future__ import annotations

import csv
from importlib import resources


def _open(name: str):
    # importlib.resources works both on-disk AND inside the addPyFile zip
    # that ships this package to python workers (zipimport-safe)
    return resources.files("anycrawl_spark.data").joinpath(name).open("r", newline="")


def _load_pairs(name: str) -> dict[str, str]:
    with _open(name) as f:
        r = csv.reader(f)
        next(r)  # header
        return {k: v for k, v in r}


ALL_LOCALE = "ZZ"  # Google.ts:2

# country code -> google domain (Google.ts custom.supported_domains)
SUPPORTED_DOMAINS = _load_pairs("google_domains.csv")

# language code -> lr restrict value (Google.ts languages)
LANGUAGES = _load_pairs("google_languages.csv")

# "lang-COUNTRY" locale -> country code (Google.ts regions; ORDER MATTERS)
REGIONS = _load_pairs("google_regions.csv")

# supported locale codes (Locale.ts locales[].code)
with _open("locale_codes.csv") as _f:
    _r = csv.reader(_f)
    next(_r)
    LOCALE_CODES = [row[0] for row in _r]
