"""Offline trainer for the MODEL-BASED quality tier: an integer logistic
regression over the engine's existing per-document quality metrics
(token count, mean token length, alphabetic-token ratio, stopword
evidence, duplicate-3-gram ratio), producing the committed weight table
``data_ingestion_bra_spark/config/quality_model_weights.json``.

This is the CCNet/fastText-style "model scores quality, rules stay as
the cheap tier" component: the GATES (operators/text.py) are declarative
thresholds; THIS model was FIT to data — positives are real multilingual
prose (the committed langid corpora), negatives are generated degenerate
text (token spam, digit noise, punctuation soup, fragments). A
production deployment refits on a larger labeled set with the same
script; the scoring contract (integer dot product, sign threshold) is
unchanged.

Determinism contract: the feature definitions here MUST mirror the
Column expressions in ``operators/quality_model.py`` (which reuse the
``gopher_metric_cols`` / ``dup_ngram_ratio_e4_expr`` definitions), and
the committed weights are integers, so Spark and the DuckDB oracle
compute bit-identical scores.

Run: ``python tools/train_quality_model.py`` (rewrites the JSON).
"""

from __future__ import annotations

import json
import math
import random
import re
from pathlib import Path

from train_langid_nb import CORPUS  # the committed public-domain prose

STOPWORDS = ("the", "a", "of", "and")
FEATURES = (
    "n_tokens",
    "mean_token_len_e4",
    "alpha_token_ratio_e4",
    "stopword_hits",
    "dup_3gram_ratio_e4",
)


def features(text: str) -> list[int]:
    """Python mirror of the Spark/SQL feature expressions — integer-exact."""
    toks = re.split(r"\s+", text.strip())
    n = len(toks)
    sum_len = sum(len(t) for t in toks)
    mean_len_e4 = math.floor(sum_len / n * 10000.0 + 0.5)
    alpha_e4 = math.floor(
        sum(1 for t in toks if re.search("[A-Za-z]", t)) / n * 10000.0 + 0.5
    )
    stop_hits = sum(1 for t in re.split(r"\s+", text.strip().lower()) if t in STOPWORDS)
    g3 = [tuple(toks[i : i + 3]) for i in range(n - 2)] if n >= 3 else []
    dup3_e4 = (
        math.floor((len(g3) - len(set(g3))) / len(g3) * 10000.0 + 0.5) if g3 else 0
    )
    return [n, mean_len_e4, alpha_e4, stop_hits, dup3_e4]


def _good_docs(rng: random.Random) -> list[str]:
    sents = []
    for txt in CORPUS.values():
        sents += [s.strip() + "." for s in txt.split(".") if len(s.split()) >= 6]
    docs = []
    for _ in range(120):
        k = rng.randint(2, 6)
        docs.append(" ".join(rng.choice(sents) for _ in range(k)))
    return docs


def _bad_docs(rng: random.Random) -> list[str]:
    docs = []
    words = ["data", "spark", "row", "key", "x1", "zz"]
    for _ in range(30):  # token spam: one token repeated
        w = rng.choice(words)
        docs.append(" ".join([w] * rng.randint(30, 120)))
    for _ in range(30):  # digit noise
        docs.append(" ".join(str(rng.randrange(10**6)) for _ in range(rng.randint(20, 80))))
    for _ in range(30):  # punctuation soup
        docs.append(" ".join("".join(rng.choice("!@#$%^&*()_+-=") for _ in range(5)) for _ in range(rng.randint(15, 60))))
    for _ in range(30):  # fragments: too short to be a document
        docs.append(" ".join(rng.choice(words) for _ in range(rng.randint(1, 5))))
    for _ in range(30):  # fragments WITH stopwords (titles, menu crumbs)
        frag = ["the", "a", "of", "and"] + words
        docs.append(" ".join(rng.choice(frag) for _ in range(rng.randint(2, 6))))
    return docs


def main() -> None:
    rng = random.Random(42)
    x_raw, y = [], []
    for d in _good_docs(rng):
        x_raw.append(features(d))
        y.append(1.0)
    for d in _bad_docs(rng):
        x_raw.append(features(d))
        y.append(0.0)

    # standardize for stable fitting; fold scaling back into the weights
    import statistics

    n_feat = len(FEATURES)
    mu = [statistics.mean(col) for col in zip(*x_raw)]
    sd = [statistics.pstdev(col) or 1.0 for col in zip(*x_raw)]
    xs = [[(r[j] - mu[j]) / sd[j] for j in range(n_feat)] for r in x_raw]

    w = [0.0] * n_feat
    b = 0.0
    lr = 0.5
    for _ in range(400):
        gw = [0.0] * n_feat
        gb = 0.0
        for xi, yi in zip(xs, y):
            z = b + sum(w[j] * xi[j] for j in range(n_feat))
            p = 1.0 / (1.0 + math.exp(-max(-30.0, min(30.0, z))))
            err = p - yi
            for j in range(n_feat):
                gw[j] += err * xi[j]
            gb += err
        m = len(xs)
        for j in range(n_feat):
            w[j] -= lr * gw[j] / m
        b -= lr * gb / m

    # unfold standardization: z = b' + sum(w'_j * raw_j) with
    # w'_j = w_j / sd_j ; b' = b - sum(w_j * mu_j / sd_j). Scale to 1e6
    # integers (the committed model IS the integer one).
    SCALE = 1_000_000
    wi = [round(w[j] / sd[j] * SCALE) for j in range(n_feat)]
    bi = round((b - sum(w[j] * mu[j] / sd[j] for j in range(n_feat))) * SCALE)

    # training-set accuracy of the INTEGER model (what ships)
    correct = sum(
        1
        for r, yi in zip(x_raw, y)
        if (bi + sum(wi[j] * r[j] for j in range(n_feat)) >= 0) == (yi == 1.0)
    )
    acc = correct / len(y)

    out = {
        "model": "integer logistic regression over quality metrics",
        "scale": SCALE,
        "features": list(FEATURES),
        "weights": dict(zip(FEATURES, wi)),
        "bias": bi,
        "train_accuracy": round(acc, 4),
        "n_train": len(y),
    }
    path = (
        Path(__file__).resolve().parent.parent
        / "data_ingestion_bra_spark"
        / "config"
        / "quality_model_weights.json"
    )
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}: acc={acc:.3f} weights={dict(zip(FEATURES, wi))} bias={bi}")


if __name__ == "__main__":
    main()
