"""Public-suffix rules + the PSL matching algorithm.

The reference resolves the ``same-domain`` crawl scope through Crawlee/tldts,
which embeds the Mozilla Public Suffix List (publicsuffix.org — public data).
This module ships the ICANN core of that list (every multi-label ccTLD family
in wide use, wildcard and exception rules included) plus the common private
platform suffixes (github.io, blogspot.com, ...), and implements the standard
PSL match semantics:

- a rule matches when the domain ends with the rule's labels ('*' matches
  exactly one label);
- exception rules ('!') beat wildcard rules and yield the suffix minus their
  leading label;
- the longest (most labels) matching rule wins;
- if nothing matches, the implicit default rule '*' applies (the bare TLD is
  the suffix).

The registrable domain (eTLD+1) is the public suffix plus one more label.
The rule set is a curated subset of the live list — swapping in the full
downloaded ``public_suffix_list.dat`` is a drop-in (parse lines into RULES).
"""

RULES = [
    # --- generic: every bare TLD is covered by the implicit '*' default ---
    # --- United Kingdom ---
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # --- Japan ---
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # --- Australia ---
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # --- New Zealand ---
    "ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz", "govt.nz",
    "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz",
    "org.nz", "parliament.nz", "school.nz",
    # --- Brazil ---
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
    "adv.br", "blog.br", "eco.br", "emp.br", "eng.br", "esp.br", "far.br",
    "imb.br", "ind.br", "inf.br", "jus.br", "leg.br", "med.br", "mp.br",
    "odo.br", "psi.br", "rec.br", "srv.br", "tur.br", "tv.br", "vet.br",
    "wiki.br",
    # --- China / Hong Kong / Taiwan ---
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    # --- India ---
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    # --- South Korea ---
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr", "seoul.kr",
    # --- Singapore ---
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    # --- South Africa ---
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    # --- Argentina ---
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
    "net.ar", "org.ar", "tur.ar",
    # --- Mexico ---
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    # --- Turkey ---
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr", "edu.tr",
    "gen.tr", "gov.tr", "info.tr", "k12.tr", "kep.tr", "mil.tr",
    "name.tr", "net.tr", "org.tr", "pol.tr", "tel.tr", "tsk.tr",
    "tv.tr", "web.tr",
    # --- Israel ---
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    # --- Ukraine / Russia-adjacent ---
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "com.ru", "msk.ru", "spb.ru",
    # --- Poland ---
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "wroc.pl", "krakow.pl", "poznan.pl",
    # --- Thailand ---
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    # --- Indonesia ---
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "ponpes.id", "sch.id", "web.id",
    # --- Malaysia ---
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my", "org.my",
    # --- Philippines ---
    "com.ph", "edu.ph", "gov.ph", "i.ph", "mil.ph", "net.ph", "ngo.ph",
    "org.ph",
    # --- Vietnam ---
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    # --- Saudi Arabia / Egypt / Nigeria / Kenya ---
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa", "pub.sa",
    "sch.sa",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng",
    "name.ng", "net.ng", "org.ng", "sch.ng",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    # --- misc Europe ---
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "co.it", "edu.it", "gov.it",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    "co.hu", "org.hu", "priv.hu", "info.hu",
    "com.ro", "nom.ro", "nt.ro", "org.ro", "rec.ro", "store.ro",
    "tm.ro", "www.ro",
    # --- wildcard families (PSL '*' rules) ---
    "*.ck", "*.jm", "*.fk", "*.kawasaki.jp", "*.kitakyushu.jp",
    "*.kobe.jp", "*.nagoya.jp", "*.sapporo.jp", "*.sendai.jp",
    "*.yokohama.jp", "*.bd", "*.er", "*.kh", "*.mm", "*.np", "*.pg",
    # --- exception rules (PSL '!' rules) ---
    "!www.ck", "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    # --- private platform suffixes (PSL private section) ---
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "herokuapp.com", "netlify.app", "vercel.app", "web.app",
    "firebaseapp.com", "pages.dev", "workers.dev", "wordpress.com",
    "azurewebsites.net", "appspot.com", "s3.amazonaws.com",
    "cloudfront.net", "fastly.net", "fly.dev", "onrender.com",
    "repl.co", "surge.sh", "readthedocs.io", "hubspotpagebuilder.com",
    "myshopify.com", "neocities.org", "glitch.me", "deno.dev",
]

# index: rules by label count, pre-split, for the matcher
_EXCEPTIONS: set[tuple[str, ...]] = set()
_WILDCARDS: set[tuple[str, ...]] = set()
_EXACT: set[tuple[str, ...]] = set()
for _r in RULES:
    if _r.startswith("!"):
        _EXCEPTIONS.add(tuple(_r[1:].split(".")))
    elif _r.startswith("*."):
        _WILDCARDS.add(tuple(_r.split(".")))
    else:
        _EXACT.add(tuple(_r.split(".")))


def public_suffix(host: str) -> str | None:
    """The public suffix of ``host`` per the PSL algorithm (longest match,
    exceptions beat wildcards, implicit '*' default)."""
    if not host:
        return None
    labels = host.lower().rstrip(".").split(".")
    if "" in labels:
        return None
    best = 1  # implicit default rule '*': the bare TLD
    n = len(labels)
    # exception rules: suffix = exception minus its leading label
    for k in range(1, n + 1):
        tail = tuple(labels[n - k:])
        if tail in _EXCEPTIONS:
            return ".".join(tail[1:])
    for k in range(1, n + 1):
        tail = tuple(labels[n - k:])
        if tail in _EXACT and k > best:
            best = k
        if k >= 2 and (("*",) + tail[1:]) in _WILDCARDS and k > best:
            best = k
    return ".".join(labels[n - best:])


def registrable_domain_psl(host: str | None) -> str | None:
    """eTLD+1: the public suffix plus one label; the host itself when it IS
    a public suffix or a bare TLD."""
    if not host:
        return None
    host = host.lower().rstrip(".")
    # hosts with ports or IPs: no PSL semantics, return as-is
    if ":" in host or host.replace(".", "").isdigit():
        return host
    suffix = public_suffix(host)
    if suffix is None:
        return host
    labels = host.split(".")
    s_len = len(suffix.split(".")) if suffix else 0
    if len(labels) <= s_len:
        return host
    return ".".join(labels[len(labels) - s_len - 1:])
