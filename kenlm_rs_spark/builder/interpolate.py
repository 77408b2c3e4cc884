"""Static linear interpolation of backoff n-gram models (reference J2/J3,
/root/reference/src/cxx/lm/interpolate/merge_probabilities.cc and
merge_vocab.cc).

Semantics: given component models M_i with weights lambda_i,

    p*(w | ctx) = sum_i lambda_i * p_i(w | ctx)

evaluated over the UNION of the components' n-grams (the k-way full-outer
merge of the reference, J2), with each p_i using model i's own backoff chain
for grams it lacks. Backoff weights of the merged model are then re-solved
bottom-up so every context normalizes:

    bo(c) = (1 - sum_{w explicit} p*(w|c)) / (1 - sum_{w explicit} p_new(w|c[1:]))

Models are model-sized (not corpus-sized), so the merge itself runs
driver-side in dict/NumPy space after the DataFrame-expressible union
(merge_vocab below shows the J3 shape as a DataFrame op); conditional
evaluation uses the vectorized batch scorer once per component model.
"""

from __future__ import annotations

import math

import numpy as np

from ..lm.arpa import ArpaSections, ProbBackoffNgram, ProbNgram
from ..lm.model import NGramModel
from ..lm.score import score_batch


def merge_vocab(spark, models: list[NGramModel]):
    """J3: k-way vocabulary union as a DataFrame (word, first_model, n_models)."""
    import pyspark.sql.functions as F

    dfs = []
    for i, m in enumerate(models):
        dfs.append(
            spark.createDataFrame([(w, i) for w in (m.words or [])], "word string, model int")
        )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.groupBy("word").agg(
        F.min("model").alias("first_model"), F.count("*").alias("n_models")
    )


def _conditional_probs(model: NGramModel, grams: list[tuple[str, ...]]) -> np.ndarray:
    """p(last word | preceding words) for each gram, log10, via one
    vectorized score_batch call (last-position token scores)."""
    docs_bos = []
    docs_norm = []
    idx_bos, idx_norm = [], []
    for i, g in enumerate(grams):
        if g[0] == "<s>" and len(g) > 1:
            docs_bos.append(list(g[1:]))
            idx_bos.append(i)
        else:
            docs_norm.append(list(g))
            idx_norm.append(i)
    out = np.zeros(len(grams), dtype=np.float64)

    def last_scores(docs, bos):
        if not docs:
            return np.zeros(0, dtype=np.float32)
        offsets = np.zeros(len(docs) + 1, dtype=np.int64)
        np.cumsum([len(d) for d in docs], out=offsets[1:])
        flat = np.array([w for d in docs for w in d], dtype=object)
        from ..lm.score import tokens_to_ids

        ids = tokens_to_ids(model, flat)
        res = score_batch(model, ids, offsets, bos=bos, eos=False)
        ends = offsets[1:] - 1
        return res["tok_score"][ends]

    out[idx_bos] = last_scores(docs_bos, True)
    out[idx_norm] = last_scores(docs_norm, False)
    return out


class _PartialModel:
    """Backoff evaluator over the partially-built merged model."""

    def __init__(self):
        self.prob: dict[tuple, float] = {}   # gram -> linear prob
        self.bo: dict[tuple, float] = {}     # gram -> linear backoff weight

    def p(self, gram: tuple) -> float:
        """Backoff-chain probability p(w | gram[:-1]) in linear space."""
        if gram in self.prob:
            return self.prob[gram]
        if len(gram) == 1:
            return self.prob.get(gram, 1e-99)
        return self.bo.get(gram[:-1], 1.0) * self.p(gram[1:])


def interpolate_models(
    models: list[NGramModel], weights: list[float]
) -> ArpaSections:
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError("weights must sum to 1")
    order = max(m.order for m in models)

    # union of grams per order (J2 merge), as word tuples
    union: list[set[tuple]] = [set() for _ in range(order)]
    for m in models:
        words = m.words
        if words is None:
            raise ValueError("interpolation requires vocab strings")
        for w in words:
            union[0].add((w,))
        # reconstruct gram tuples via each model's tables: walk ARPA-shaped
        # enumeration by scoring keys is not possible generically, so models
        # must carry their gram inventory; rebuild from arpa-capable sources.
        inv = getattr(m, "gram_inventory", None)
        if inv is None:
            raise ValueError(
                "model lacks gram_inventory; load via NGramModel.from_arpa "
                "(set by the loader) or pass ArpaSections-backed models"
            )
        for n in range(2, m.order + 1):
            union[n - 1].update(inv[n - 1])

    # interpolated probabilities over the union
    pstar: list[dict[tuple, float]] = [dict() for _ in range(order)]
    for n in range(1, order + 1):
        grams = sorted(union[n - 1])
        if not grams:
            continue
        acc = np.zeros(len(grams), dtype=np.float64)
        for m, lam in zip(models, weights):
            logp = _conditional_probs(m, grams)
            lin = np.power(10.0, logp.astype(np.float64))
            # a component contributes 0 for words outside its own vocabulary
            # (its probability mass already sums to 1 over its support; mapping
            # foreign words to its <unk> would multiply-count that mass and
            # break normalization of the merged model)
            in_vocab = np.array(
                [g[-1] in m.word_to_id or g[-1] == "<unk>" for g in grams],
                dtype=bool,
            )
            lin[~in_vocab] = 0.0
            acc += lam * lin
        for g, p in zip(grams, acc):
            pstar[n - 1][g] = float(p)

    # re-solve backoffs bottom-up
    clamped: list[tuple] = []
    new = _PartialModel()
    for n in range(1, order + 1):
        for g, p in pstar[n - 1].items():
            new.prob[g] = p
    for n in range(1, order):
        # contexts = n-grams that prefix some (n+1)-gram in the union
        ctx_children: dict[tuple, list[tuple]] = {}
        for g in union[n]:
            ctx_children.setdefault(g[:-1], []).append(g)
        for c, children in ctx_children.items():
            num = 1.0 - sum(pstar[n][g] for g in children)
            den = 1.0 - sum(new.p(g[1:]) for g in children)
            if num <= 0 or den <= 0:
                # merged explicit mass under this context is >= 1: the model
                # denormalizes here. Keep a tiny positive backoff so scoring
                # stays finite, but surface the event instead of hiding it.
                import logging

                logging.getLogger(__name__).warning(
                    "interpolate: context %s denormalized (num=%g den=%g); "
                    "clamping backoff to 1e-12", c, num, den,
                )
                clamped.append(c)
                bo = 1e-12
            else:
                bo = num / den
            new.bo[c] = bo

    # emit sections (clamped_contexts carried for caller inspection)
    sections = ArpaSections(counts=[len(u) for u in union])
    sections.clamped_contexts = clamped
    sections.backoffs = []
    for n in range(1, order):
        recs = []
        for g in sorted(union[n - 1]):
            p = pstar[n - 1][g]
            lp = -99.0 if g == ("<s>",) or p <= 0 else math.log10(p)
            bo = new.bo.get(g)
            log_bo = math.log10(bo) if bo is not None and bo > 0 else -0.0
            recs.append(ProbBackoffNgram(lp, g, log_bo))
        sections.backoffs.append(recs)
    sections.no_backoff = [
        ProbNgram(
            -99.0 if pstar[order - 1][g] <= 0 else math.log10(pstar[order - 1][g]), g
        )
        for g in sorted(union[order - 1])
    ]
    return sections
