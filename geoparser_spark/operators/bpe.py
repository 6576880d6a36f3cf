"""Byte-pair-encoding tokenizer: bounded-sample learning + Arrow-batched
distributed encode.

The reference never tokenizes beyond whitespace (its "tokens" are
Solr's analyzer, `examples/covid19/add-fields.sh:3` text_ws); a
training-data pipeline needs REAL subword token counts — sequence
packing, context budgeting and price estimation are all denominated in
BPE tokens, not words.

Determinism contract (same pattern as IVF centroids,
similarity.ivf_fit_centroids): merges are learned driver-side on a
bounded, deterministically-keyed sample, then broadcast as plain
literals into an Arrow-batched kernel.  Tie-breaks are total: the next
merge is the (max frequency, then lexicographically smallest) pair;
encoding applies the LEFTMOST occurrence of the LOWEST-rank adjacent
pair, one merge at a time.  Every step is independently replayable —
the driver oracle re-learns the merges from the same sample spec and
must land on identical token counts.

Shape at scale: learning reads `sample` rows once (bounded driver
memory, like any sketch/fit stage); encoding is map-only — tokens are
split JVM-side by the shared normalize_text expression, the kernel
sees Arrow batches of token arrays and memoizes per distinct word, so
per-batch cost is ~O(distinct words), not O(tokens).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoparser_spark.operators.geotag import normalize_text

END = "</w>"


def _merge_word(sym: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
            out.append(sym[i] + sym[i + 1])
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def learn_bpe(docs: DataFrame, n_merges: int = 60, sample: int = 200,
              modulus: int = 10, id_col: str = "doc_id",
              text_col: str = "text") -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from a deterministic bounded sample
    (every `modulus`-th doc by id, first `sample` in id order)."""
    rows = (
        docs.where(F.col(id_col) % modulus == 0)
        .orderBy(id_col)
        .limit(sample)
        .select(F.split(normalize_text(F.col(text_col)), " ").alias("toks"))
        .collect()
    )
    vocab: Counter = Counter()
    for r in rows:
        for w in r.toks:
            if w:
                vocab[w] += 1
    words = {w: tuple(w) + (END,) for w in vocab}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, freq in vocab.items():
            sym = words[w]
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = {w: _merge_word(s, best) for w, s in words.items()}
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE apply: repeatedly merge the leftmost occurrence of the
    lowest-rank adjacent pair until none applies."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_words", T.IntegerType()),
    T.StructField("n_bpe_tokens", T.IntegerType()),
    T.StructField("first_pieces", T.StringType()),
])


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Encode every document with the given merge table; returns
    (doc_id, n_words, n_bpe_tokens, first_pieces) where first_pieces is
    the '|'-joined subword split of the first word (value-checkable
    proof the split itself matches, not just the counts)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    toks_df = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.filter(
            F.split(normalize_text(F.col(text_col)), " "),
            lambda t: t != "",
        ).alias("toks"),
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = encode_word(w, ranks)
            return got

        for pdf in batches:
            n_words, n_tok, first = [], [], []
            for toks in pdf["toks"]:
                ws = [w for w in toks]
                total = 0
                for w in ws:
                    total += len(enc(w))
                n_words.append(len(ws))
                n_tok.append(total)
                first.append("|".join(enc(ws[0])) if ws else "")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_words": pd.array(n_words, dtype="int32"),
                "n_bpe_tokens": pd.array(n_tok, dtype="int32"),
                "first_pieces": first,
            })

    return toks_df.mapInPandas(kernel, _SCHEMA)
