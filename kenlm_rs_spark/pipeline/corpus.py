"""Deterministic synthetic web-page corpus generator (FIXTURES.md §1).

Schema is exactly BASELINE.json input_hint:
  url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Every field is a pure function of (seed, row_id), so generation is
embarrassingly parallel and identical regardless of partitioning — generated
via mapInPandas over spark.range(n) (no driver-side data, scales to any n).

Quality strata are injected by row_id % 10:
  0-4 clean prose        5 keyboard-mash gibberish (tail perplexity)
  6   symbol spam        7 duplicated-line boilerplate
  8   short stub         9 clean prose with PII + toxicity terms
"""

from __future__ import annotations

import datetime as dt
import hashlib

import numpy as np

LANGS = ["en", "de", "fr", "xx"]

# per-language syllable inventories (disjoint-ish phonotactics so a char
# n-gram classifier has real signal)
_SYLLABLES = {
    "en": ["the", "ing", "tion", "er", "an", "re", "on", "at", "en", "nd",
           "st", "es", "of", "te", "ed", "is", "it", "al", "ar", "wh"],
    "de": ["sch", "ein", "ung", "der", "die", "das", "ge", "be", "zu", "en",
           "cht", "ver", "aus", "mit", "für", "über", "ß", "ei", "au", "ich"],
    "fr": ["le", "la", "les", "de", "et", "eau", "oux", "ille", "tion", "que",
           "est", "une", "dans", "pour", "ç", "é", "è", "ai", "ou", "eur"],
    "xx": ["zq", "xw", "kj", "vv", "qq", "zx", "wq", "jx", "qz", "xx",
           "kk", "jj", "ww", "zz", "vx", "qk", "xj", "wz", "kq", "jv"],
}

_BASE_TS = dt.datetime(2025, 1, 1, 0, 0, 0)
N_DOMAINS = 1000
SEED = 42

PII_SNIPPETS = [
    "contact john.doe@example.com for info",
    "call +1-555-123-4567 today",
    "server at 192.168.10.25 responded",
    "ssn 123-45-6789 leaked",
]
TOXIC_SNIPPETS = ["this is badword1 content", "he said slurword loudly"]


def _rng(row_id: int, stream: int) -> np.random.Generator:
    # counter-based: Philox keyed by (SEED, stream), counter = row_id
    return np.random.Generator(
        np.random.Philox(key=[SEED, stream], counter=[0, 0, 0, int(row_id)])
    )


def make_vocab(lang: str, size: int = 2000) -> list[str]:
    """Deterministic per-language word list."""
    rng = np.random.Generator(np.random.Philox(key=[SEED, 999]))
    syl = _SYLLABLES[lang]
    words = []
    for _ in range(size):
        n = int(rng.integers(1, 4))
        words.append("".join(syl[int(i)] for i in rng.integers(0, len(syl), n)))
    return words


_VOCABS = {lang: make_vocab(lang) for lang in LANGS}


def make_sentences(lang: str, n_sentences: int, rng: np.random.Generator) -> list[str]:
    vocab = _VOCABS[lang]
    # zipf-ish word choice so n-gram models have structure
    ranks = rng.zipf(1.3, size=n_sentences * 12) % len(vocab)
    out = []
    pos = 0
    for _ in range(n_sentences):
        ln = int(rng.integers(5, 13))
        words = [vocab[int(r)] for r in ranks[pos : pos + ln]]
        pos += ln
        if pos + 13 > len(ranks):
            ranks = rng.zipf(1.3, size=n_sentences * 12) % len(vocab)
            pos = 0
        out.append(" ".join(words))
    return out


def _zipf_domain(rng: np.random.Generator) -> str:
    d = int(rng.zipf(1.2)) % N_DOMAINS
    return f"site{d:04d}.example.org"


def generate_row(row_id: int) -> dict:
    rng = _rng(row_id, 1)
    stratum = row_id % 10
    lang = LANGS[int(_rng(row_id, 2).integers(0, 3))]  # xx reserved for gibberish

    if stratum == 5:
        lang = "xx"
        sents = make_sentences("xx", int(rng.integers(3, 20)), rng)
    elif stratum == 6:
        base = make_sentences(lang, int(rng.integers(2, 8)), rng)
        sents = [s + " $$%#@!*&^ ==++ ~~||{}[] " + s[:10] for s in base]
    elif stratum == 7:
        line = make_sentences(lang, 1, rng)[0]
        sents = [line] * int(rng.integers(5, 30))
    elif stratum == 8:
        sents = [" ".join(make_sentences(lang, 1, rng)[0].split()[:4])]
    elif stratum == 9:
        sents = make_sentences(lang, int(rng.integers(3, 15)), rng)
        sents.insert(1, PII_SNIPPETS[row_id % len(PII_SNIPPETS)])
        sents.insert(2, TOXIC_SNIPPETS[row_id % len(TOXIC_SNIPPETS)])
    else:
        sents = make_sentences(lang, int(rng.integers(2, 40)), rng)

    text = "\n".join(sents)
    path = hashlib.md5(f"{SEED}:{row_id}".encode()).hexdigest()[:12]
    url = f"https://{_zipf_domain(rng)}/{path}"
    body = "".join(f"<p>{s}</p>" for s in sents)
    html = (
        "<html><head><title>doc</title><style>p{color:red}</style></head>"
        f"<body><nav>home | about</nav>{body}<footer>(c) 2025</footer></body></html>"
    ).encode("utf-8")
    # a deterministic 1/8 of rows carry only html (text NULL -> extraction path)
    text_out = None if row_id % 8 == 3 else text
    return {
        "url": url,
        "warc_ts": _BASE_TS + dt.timedelta(seconds=int(row_id)),
        "html": html,
        "text": text_out,
        "lang": lang,
        "row_id": row_id,
    }


PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, row_id long"
)


def generate_pages_df(spark, n_rows: int, partitions: int | None = None):
    """Distributed deterministic generation: spark.range -> mapInPandas."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [generate_row(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    rng_df = spark.range(0, n_rows, numPartitions=partitions or max(8, n_rows // 50_000))
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def generate_pages_local(n_rows: int) -> "pd.DataFrame":
    import pandas as pd

    return pd.DataFrame([generate_row(i) for i in range(n_rows)])


def training_corpus(lang: str, n_sentences: int = 5000) -> list[str]:
    """Deterministic seed corpus for per-language LM estimation and langid
    training (FIXTURES.md §3)."""
    rng = np.random.Generator(np.random.Philox(key=[SEED, 7]))
    return make_sentences(lang, n_sentences, rng)
