"""Model snapshot sink/source — the Spark-world replacement for the binary
mmap writer (reference S7, /root/reference/src/cxx/lm/binary_format.cc:206-335).

Instead of a bespoke mmap format, the canonical model arrays are stored as an
``np.savez_compressed`` archive. Loading is a single deserialization on the
driver (then ``broadcast()`` distributes it — the cluster analogue of the
reference's mmap page sharing), or lazily per executor via ``np.load``.
"""

from __future__ import annotations

import json

import numpy as np

from .model import NGramModel, _OrderTable

FORMAT_VERSION = 1


def save_model(model: NGramModel, path: str) -> None:
    arrays = {
        "uni_prob": model.uni_prob,
        "uni_backoff": model.uni_backoff,
        "uni_indep": model.uni_indep,
        "long_keys": model.longest.keys,
        "long_prob": model.longest.prob,
    }
    for i, t in enumerate(model.middles):
        arrays[f"mid{i}_keys"] = t.keys
        arrays[f"mid{i}_prob"] = t.prob
        arrays[f"mid{i}_backoff"] = t.backoff
        arrays[f"mid{i}_indep"] = t.indep
    if model.vocab_hashes is not None:
        arrays["vocab_hashes"] = model.vocab_hashes
        arrays["vocab_hash_ids"] = model.vocab_hash_ids
    meta = {
        "format_version": FORMAT_VERSION,
        "order": model.order,
        "counts": model.counts,
        "words": model.words,
    }
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_model(path: str) -> NGramModel:
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = json.loads(bytes(z["meta_json"]).decode("utf-8"))
    if meta["format_version"] != FORMAT_VERSION:
        raise ValueError(f"snapshot format {meta['format_version']} != {FORMAT_VERSION}")
    order = meta["order"]
    middles = []
    for i in range(order - 2):
        t = _OrderTable.__new__(_OrderTable)
        t.keys = z[f"mid{i}_keys"]
        t.prob = z[f"mid{i}_prob"]
        t.backoff = z[f"mid{i}_backoff"]
        t.indep = z[f"mid{i}_indep"]
        middles.append(t)
    longest = _OrderTable.__new__(_OrderTable)
    longest.keys = z["long_keys"]
    longest.prob = z["long_prob"]
    longest.backoff = None
    longest.indep = None
    return NGramModel(
        order=order,
        counts=meta["counts"],
        uni_prob=z["uni_prob"],
        uni_backoff=z["uni_backoff"],
        uni_indep=z["uni_indep"],
        middles=middles,
        longest=longest,
        words=meta["words"],
        vocab_hashes=z["vocab_hashes"] if "vocab_hashes" in z else None,
        vocab_hash_ids=z["vocab_hash_ids"] if "vocab_hash_ids" in z else None,
    )
