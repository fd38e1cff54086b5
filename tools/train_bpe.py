"""Offline BPE trainer: learns a byte-pair-encoding merges table from the
SAME committed public-domain en/es/pt prose the langid / perplexity-LM
trainers use (one corpus, three models), producing
``data_ingestion_bra_spark/config/bpe_merges.json``.

Why: the packing / mixture tier previously budgeted by CHARS and counted
whitespace tokens; a trainer consumes SUBWORD tokens (Sennrich et al. 2016,
arXiv:1508.07909 — the standard BPE subword algorithm). This commits a tiny
but REAL merges table; a production deployment re-runs this script over a
web-scale corpus (or swaps in a released tokenizer's merges file — the
format is the same ranked pair list) and nothing in the runtime changes but
the table size.

Algorithm (classic BPE, deterministic):

- vocabulary = word → frequency over the normalized corpora (per-corpus
  tokenization, same normalize as the langid/LM trainers so the three
  committed models share one text contract);
- each word starts as its character sequence; repeatedly (a) count adjacent
  symbol pairs weighted by word frequency, (b) merge the most frequent pair
  everywhere (ties break to the lexicographically smallest pair, so retrain
  is bit-reproducible), recording the pair in rank order;
- stop at ``N_MERGES`` or when no pair occurs twice.

Apply-time contract (MUST match ``operators/bpe.py``): merges are applied
in rank order, each merging all non-overlapping occurrences LEFT TO RIGHT —
exactly what ``apply_merge`` below does, and exactly what the runtime's
string-``replace`` formulation does (each symbol is wrapped in its own
separator pair, so a literal ``replace`` of ``␁x␁␁y␁`` → ``␁xy␁`` is
boundary-safe and greedy left-to-right). ``operators/bpe.encode_word`` is
the shared reference implementation; the guard test retrains this table and
re-derives the runtime expressions from it.

Run: ``python tools/train_bpe.py`` (rewrites the JSON in place).
"""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path

from train_langid_nb import CORPUS, normalize

# 96 ranked merges: DuckDB's expression binder recursion-depth limit is 128,
# and the oracle twin nests one replace() per merge (plus ~5 wrapper calls) —
# 96 keeps the single-expression oracle well inside that limit while still
# giving real multi-char subwords over the committed prose. (A production
# merges table outgrows the nested-replace formulation anyway — see the
# scale note in operators/bpe.py.)
N_MERGES = 96


def apply_merge(word: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Merge all occurrences of ``pair`` in ``word``, greedy left-to-right
    (non-overlapping) — the canonical BPE apply step."""
    merged = pair[0] + pair[1]
    out: list[str] = []
    i = 0
    while i < len(word):
        if i < len(word) - 1 and (word[i], word[i + 1]) == pair:
            out.append(merged)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def train(vocab: Counter, n_merges: int = N_MERGES) -> list[tuple[str, str]]:
    words: dict[tuple[str, ...], int] = {tuple(w): f for w, f in vocab.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, f in words.items():
            for a, b in zip(w[:-1], w[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # deterministic argmax: highest count, then smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        words = {apply_merge(w, best): f for w, f in words.items()}
    return merges


def main() -> None:
    vocab: Counter[str] = Counter()
    for lang in sorted(CORPUS):
        vocab.update(normalize(CORPUS[lang]).split(" "))
    merges = train(vocab)
    out = {
        "model": "BPE subword merges (Sennrich et al. 2016), greedy left-to-right apply",
        "n_merges": len(merges),
        "merges": [[a, b] for a, b in merges],
    }
    path = (
        Path(__file__).resolve().parent.parent
        / "data_ingestion_bra_spark"
        / "config"
        / "bpe_merges.json"
    )
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {path}: {len(merges)} merges over {len(vocab)} vocab words")


if __name__ == "__main__":
    main()
