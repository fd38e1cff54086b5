"""Offline trainer for the CCNet-style perplexity quality filter: a
word-bigram interpolated language model over the SAME public-domain
en/es/pt prose the langid NB trains on (one committed training corpus,
two models), producing the integer weight table
``data_ingestion_bra_spark/config/ngram_lm_weights.json``.

CCNet (Wenzek et al. 2020, arXiv:1911.00359) filters a web corpus by the
perplexity of a KenLM n-gram model trained on clean reference text: low
perplexity ≈ looks like well-formed prose. This is the same architecture at
committed-table scale — a production deployment re-runs this script over a
Wikipedia dump and commits the regenerated (much larger) table; nothing in
the runtime operator changes but the table size.

Model: interpolated bigram with unigram backoff, all probabilities frozen
into integer milli-log weights so Spark and the DuckDB oracle compute
bit-identical scores:

- seen bigram (w1, w2):   lp = round(1000 * ln(0.75 * c12/c1 + 0.25 * p_uni(w2)))
- unseen bigram, known w2: blp = round(1000 * ln(0.25 * p_uni(w2)))
- unknown w2:              oov_lp = round(1000 * ln(0.25 * p_unk))

with p_uni Laplace-smoothed over the vocabulary + one unseen bucket.
The per-document score is the milli-nat sum over word bigrams; the filter
keeps documents whose average negative log-likelihood stays under a
configured ceiling.

Determinism contract: tokenization here MUST match the runtime scoring
expression (``operators/langid_nb.normalize_expr`` → split on single
space), weights are integers, and interpolation happens at TRAIN time so
the runtime is a pure lookup-sum.

Run: ``python tools/train_ngram_lm.py`` (rewrites the JSON in place).
"""

from __future__ import annotations

import json
import math
from collections import Counter
from pathlib import Path

from train_langid_nb import CORPUS, normalize

SCALE = 1000
LAMBDA = 0.75  # bigram weight; (1 - LAMBDA) backs off to the unigram


def main() -> None:
    # Count bigrams PER corpus and sum the Counters: zipping across the
    # concatenation boundary would bake one spurious cross-language bigram
    # per corpus seam (last word of one corpus + first word of the next)
    # into the committed table.
    uni: Counter[str] = Counter()
    bi: Counter[tuple[str, str]] = Counter()
    for lang in sorted(CORPUS):
        toks = normalize(CORPUS[lang]).split(" ")
        uni.update(toks)
        bi.update(zip(toks[:-1], toks[1:]))
    v = len(uni)
    n_total = sum(uni.values())

    def p_uni(w: str) -> float:
        return (uni[w] + 1) / (n_total + v + 1)

    p_unk = 1 / (n_total + v + 1)

    uni_rows = [
        {"w": w, "blp": round(SCALE * math.log((1 - LAMBDA) * p_uni(w)))}
        for w in sorted(uni)
    ]
    bi_rows = [
        {
            "g": f"{w1} {w2}",
            "lp": round(SCALE * math.log(LAMBDA * c12 / uni[w1] + (1 - LAMBDA) * p_uni(w2))),
        }
        for (w1, w2), c12 in sorted(bi.items())
    ]
    out = {
        "model": "word-bigram interpolated LM (CCNet-style perplexity filter)",
        "scale": SCALE,
        "lambda_e2": round(LAMBDA * 100),
        "oov_lp": round(SCALE * math.log((1 - LAMBDA) * p_unk)),
        "uni": uni_rows,
        "bi": bi_rows,
    }
    path = (
        Path(__file__).resolve().parent.parent
        / "data_ingestion_bra_spark"
        / "config"
        / "ngram_lm_weights.json"
    )
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}: {len(uni_rows)} unigrams, {len(bi_rows)} bigrams")


if __name__ == "__main__":
    main()
