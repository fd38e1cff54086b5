"""BPE subword tokenization as pure string expressions — zero UDFs, and a
DuckDB twin generated from the same committed merges table.

The merges come from ``config/bpe_merges.json`` (trained offline by
``tools/train_bpe.py`` on the committed en/es/pt prose — the same
train-offline / commit-integer-artifact / replay-in-both-engines playbook
as the langid NB, the perplexity LM, and the quality model). The runtime
never loops: applying ``n`` ranked merges compiles to ``n`` nested literal
``replace`` calls, which whole-stage codegen evaluates JVM-side per word.

Encoding trick that makes literal ``replace`` a CORRECT BPE apply step:
each symbol is wrapped in its own separator pair (``the`` →
``␁t␁␁h␁␁e␁``), so the pattern for merge ``(x, y)`` is ``␁x␁␁y␁`` →
``␁xy␁``. The wrapping separators make matches boundary-safe in both
directions (``x`` can never match the suffix of a longer symbol, ``y``
never a prefix) AND self-contained (adjacent matches share no characters,
so ``replace``'s left-to-right non-overlapping semantics are exactly
BPE's greedy left-to-right merge — a run ``aaaa`` under merge ``(a,a)``
becomes ``aa aa`` in one pass). ``encode_word`` below is the pure-Python
reference twin; equality is property-tested over the fixture vocabulary.

Token count never splits anything: ``#tokens = #separators / 2`` by
construction, so counting is two ``length`` calls. At 100 TB this is a
scan-resident projection — no shuffle, no explode, no Python.

Scale note: a production merges table (30-50k merges) would make the
nested-replace chain too deep; the same contract then compiles to a
broadcast vocabulary join (word → token count) for the frequent-word tier
with the replace chain as the OOV fallback — the committed 128-merge table
keeps the single-expression formulation, which is the honest shape at this
table size.
"""

from __future__ import annotations

import json
from functools import reduce
from pathlib import Path

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Separator byte: never occurs in corpus text (asserted defensively by
#: stripping it from input words before symbolization, both engines).
SEP = "\x01"

DEFAULT_MERGES_PATH = Path(__file__).resolve().parent.parent / "config" / "bpe_merges.json"


def load_merges(path: str | Path | None = None) -> list[tuple[str, str]]:
    with open(path or DEFAULT_MERGES_PATH) as f:
        return [tuple(m) for m in json.load(f)["merges"]]


# ---------------------------------------------------------------- reference
def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python reference encoder (the trainer's apply semantics):
    merges in rank order, each greedy left-to-right. Used by tests to pin
    the Spark/DuckDB expression output, never in the data plane."""
    syms = list(word.replace(SEP, ""))
    for x, y in merges:
        merged, out, i = x + y, [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == x and syms[i + 1] == y:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# ---------------------------------------------------------------- Spark side
def encode_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Word → separator-wrapped BPE symbol string (``␁th␁␁e␁``)."""
    sym = F.regexp_replace(F.replace(word, F.lit(SEP), F.lit("")), "(.)", f"{SEP}$1{SEP}")
    return reduce(
        lambda acc, m: F.replace(
            acc, F.lit(f"{SEP}{m[0]}{SEP}{SEP}{m[1]}{SEP}"), F.lit(f"{SEP}{m[0]}{m[1]}{SEP}")
        ),
        merges,
        sym,
    )


def word_token_count_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """#BPE tokens of one word. Every token is ``␁sym␁``, so splitting on
    the double separator between tokens yields exactly one piece per token —
    referencing the (merge-depth-deep) encoding expression ONCE, where a
    separator-counting formulation would inline it twice."""
    enc = encode_expr(word, merges)
    return (
        F.when(F.length(F.replace(word, F.lit(SEP), F.lit(""))) == 0, F.lit(0))
        .otherwise(F.size(F.split(enc, SEP + SEP)))
        .cast("bigint")
    )


def word_tokens_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """The actual token array for one word (``array<string>``)."""
    return F.filter(F.split(encode_expr(word, merges), SEP), lambda t: t != F.lit(""))


def doc_token_count_expr(text: Column, merges: list[tuple[str, str]]) -> Column:
    """#BPE tokens of a whitespace-tokenized document — one row-local
    aggregate over the word array; empty/blank text counts 0."""
    per_word = F.transform(
        F.split(F.trim(text), r"\s+"), lambda w: word_token_count_expr(w, merges)
    )
    return F.aggregate(per_word, F.lit(0).cast("bigint"), lambda acc, x: acc + x)


# ---------------------------------------------------------------- oracle side
def _encode_sql(word_sql: str, merges: list[tuple[str, str]]) -> str:
    # DuckDB twin of encode_expr; SEP is embedded as the literal control
    # byte (valid UTF-8) and '\\1' is RE2's backreference.
    enc = f"regexp_replace(replace({word_sql}, '{SEP}', ''), '(.)', '{SEP}\\1{SEP}', 'g')"
    for x, y in merges:
        enc = f"replace({enc}, '{SEP}{x}{SEP}{SEP}{y}{SEP}', '{SEP}{x}{y}{SEP}')"
    return enc


def word_token_count_sql(word_sql: str, merges: list[tuple[str, str]]) -> str:
    enc = _encode_sql(word_sql, merges)
    return (
        f"CAST(CASE WHEN length(replace({word_sql}, '{SEP}', '')) = 0 THEN 0 "
        f"ELSE len(string_split({enc}, '{SEP}{SEP}')) END AS BIGINT)"
    )


def doc_token_count_sql(text_sql: str, merges: list[tuple[str, str]]) -> str:
    return (
        "CAST(COALESCE(list_sum(list_transform("
        f"regexp_split_to_array(trim({text_sql}), '\\s+'), "
        f"w -> {word_token_count_sql('w', merges)})), 0) AS BIGINT)"
    )
