"""Language identification: fastText-style linear bag-of-char-ngram model,
implemented from scratch in NumPy (no fasttext dependency, SURVEY.md §7).

Model = L x B float32 matrix of per-language log relative frequencies over B
hashed char-trigram buckets. Training is deterministic (seeded synthetic
corpora). Inference is fully vectorized per Arrow batch: hash all trigrams of
all docs once, gather per-language rows, segment-sum per doc, argmax.

Runs inside a pandas UDF over a broadcast model — same executor pattern as
the KenLM scorer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

N_BUCKETS = 1 << 16
NGRAM = 3


def _trigram_buckets(text: str) -> np.ndarray:
    """Hash char trigrams to buckets (vectorized FNV-1a over uint32)."""
    b = np.frombuffer(("  " + text.lower() + " ").encode("utf-8"), dtype=np.uint8)
    if len(b) < NGRAM:
        return np.zeros(0, dtype=np.int64)
    # rolling windows
    w = np.lib.stride_tricks.sliding_window_view(b, NGRAM).astype(np.uint32)
    h = np.full(len(w), 2166136261, dtype=np.uint32)
    for i in range(NGRAM):
        h = (h ^ w[:, i]) * np.uint32(16777619)
    return (h % np.uint32(N_BUCKETS)).astype(np.int64)


class CharNgramLangID:
    def __init__(self, langs: list[str], weights: np.ndarray):
        self.langs = langs
        self.weights = weights  # L x B float32 log-probs

    @classmethod
    def train(cls, corpora: dict[str, list[str]]) -> "CharNgramLangID":
        langs = sorted(corpora)
        W = np.zeros((len(langs), N_BUCKETS), dtype=np.float64)
        for li, lang in enumerate(langs):
            counts = np.ones(N_BUCKETS, dtype=np.float64)  # add-one smoothing
            for sent in corpora[lang]:
                bk = _trigram_buckets(sent)
                np.add.at(counts, bk, 1.0)
            W[li] = np.log(counts / counts.sum())
        return cls(langs, W.astype(np.float32))

    def predict_batch(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """Returns (lang_codes: object array, confidence: float32 array).

        Confidence = softmax margin of the mean per-trigram log-prob."""
        n = len(texts)
        langs = np.empty(n, dtype=object)
        conf = np.zeros(n, dtype=np.float32)
        # flatten all trigrams with doc offsets, one gather per language
        bks = [_trigram_buckets(t or "") for t in texts]
        lens = np.array([len(b) for b in bks], dtype=np.int64)
        flat = np.concatenate(bks) if n else np.zeros(0, dtype=np.int64)
        doc_idx = np.repeat(np.arange(n), lens)
        scores = np.zeros((len(self.langs), n), dtype=np.float64)
        for li in range(len(self.langs)):
            per_tri = self.weights[li, flat].astype(np.float64)
            sums = np.bincount(doc_idx, weights=per_tri, minlength=n)
            scores[li] = sums / np.maximum(lens, 1)
        scores[:, lens == 0] = 0.0
        best = scores.argmax(axis=0)
        # softmax over mean log-probs (scaled) for a confidence signal
        z = np.exp((scores - scores.max(axis=0, keepdims=True)) * 5.0)
        conf = (z[best, np.arange(n)] / z.sum(axis=0)).astype(np.float32)
        for i in range(n):
            langs[i] = self.langs[best[i]] if lens[i] else "und"
        return langs, conf


_DEFAULT: CharNgramLangID | None = None


def default_langid() -> CharNgramLangID:
    """The frozen model trained on the deterministic synthetic corpora."""
    global _DEFAULT
    if _DEFAULT is None:
        from .corpus import LANGS, training_corpus

        _DEFAULT = CharNgramLangID.train(
            {lang: training_corpus(lang, 2000) for lang in LANGS}
        )
    return _DEFAULT


def make_langid_udf(bc_model):
    """pandas UDF: text -> struct(lang string, lang_conf float)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import FloatType, StringType, StructField, StructType

    schema = StructType(
        [StructField("lang", StringType()), StructField("lang_conf", FloatType())]
    )

    @F.pandas_udf(schema)
    def langid_udf(texts: pd.Series) -> pd.DataFrame:
        model = bc_model.value
        langs, conf = model.predict_batch(texts.fillna("").tolist())
        return pd.DataFrame({"lang": langs, "lang_conf": conf})

    return langid_udf
