"""Real byte-pair-encoding tokenization with a broadcast vocabulary.

The reference counts "tokens" with a whitespace split (`common/` text
helpers) and this repo's `functions/text.py` adds a GPT-2-style regex
pre-tokenizer; both are *estimates*. Training-data pipelines budget in
REAL tokenizer tokens — chunk boundaries and pack sizes shift when the
count is wrong. This module closes that gap with a from-scratch,
dependency-free byte-level BPE (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"; byte-level base alphabet
as in GPT-2):

- ``train_bpe(corpus, num_merges)`` — classic greedy pair-merge training
  with a deterministic tie-break, so the shipped merge table is
  reproducible from the embedded seed corpus at import time.
- ``encode(text, ranks)`` / ``decode(ids, vocab)`` — lossless: the
  pre-tokenizer's alternatives cover every character (letter runs, digit
  runs, whitespace runs, single other chars), pre-tokens are merged over
  their UTF-8 bytes, and ids map 0-255 to raw bytes / 256+r to merge r.
- ``token_ids_udf(spark)`` / ``token_count_udf(spark)`` — Arrow-batched
  ``pandas_udf``s whose merge table rides a real ``SparkContext.
  broadcast`` (one copy per executor, not per task — at 100 TB the UDF
  is shipped to ~10^5 tasks and a closure-pickled vocab would be
  re-serialized into every one).

Scale shape: encoding is embarrassingly parallel (narrow, per-row); the
only shared state is the read-only ranks dict. Python-side BPE is the
slow path by design — the module exists for token-count FIDELITY where
budget boundaries matter; the regex estimate (`functions/text.py`)
remains the JVM-side fast path for filtering-grade stats.
"""

from __future__ import annotations

from collections import Counter
from functools import lru_cache

import pandas as pd
import re

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# Pre-tokenizer: the portable core of the GPT-2 split, extended so the
# alternatives PARTITION the string (whitespace runs are kept as
# pre-tokens) — concatenating pre-tokens reproduces the input exactly,
# which is what makes decode(encode(x)) == x provable.
PRETOK_RE = re.compile(r"[A-Za-z]+|[0-9]+|[ \t\n\r\f\x0b]+|[^A-Za-z0-9 \t\n\r\f\x0b]")

Pair = tuple[bytes, bytes]


def _pretoken_byte_words(corpus: list[str]) -> Counter:
    """Pre-token frequency table, each word as a tuple of 1-byte tokens."""
    words: Counter = Counter()
    for text in corpus:
        for tok in PRETOK_RE.findall(text):
            b = tok.encode("utf-8")
            words[tuple(bytes([c]) for c in b)] += 1
    return words


def train_bpe(corpus: list[str], num_merges: int) -> list[Pair]:
    """Greedy BPE training: repeatedly merge the most frequent adjacent
    token pair across the (pre-tokenized, byte-level) corpus. Ties break
    on the lexicographically largest pair — arbitrary but DETERMINISTIC,
    so the same corpus always yields the same merge list."""
    words = _pretoken_byte_words(corpus)
    merges: list[Pair] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for w, f in words.items():
            for p in zip(w, w[1:]):
                pairs[p] += f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_words: Counter = Counter()
        for w, f in words.items():
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == best[0] and w[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words[tuple(out)] += f
        words = new_words
    return merges


def build_ranks(merges: list[Pair]) -> dict[Pair, int]:
    return {p: r for r, p in enumerate(merges)}


def build_vocab(merges: list[Pair]) -> dict[bytes, int]:
    """Token bytes → id. Ids 0-255 are the byte alphabet; merge r mints
    id 256+r. A merged byte-string minted twice keeps its FIRST id
    (later duplicate merges can occur when contexts differ)."""
    vocab: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    for r, (a, b) in enumerate(merges):
        vocab.setdefault(a + b, 256 + r)
    return vocab


def _merge_word(word: list[bytes], ranks: dict[Pair, int]) -> list[bytes]:
    """Apply merges to one pre-token: always the LOWEST-rank applicable
    pair next (training order), exactly the GPT-2 inference rule."""
    while len(word) > 1:
        best_rank, best_i = None, -1
        for i in range(len(word) - 1):
            r = ranks.get((word[i], word[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        word[best_i : best_i + 2] = [word[best_i] + word[best_i + 1]]
    return word


def encode(text: str, ranks: dict[Pair, int], vocab: dict[bytes, int]) -> list[int]:
    ids: list[int] = []
    for tok in PRETOK_RE.findall(text):
        b = tok.encode("utf-8")
        word = _merge_word([bytes([c]) for c in b], ranks)
        ids.extend(vocab[t] for t in word)
    return ids


def decode(ids: list[int], vocab: dict[bytes, int]) -> str:
    rev = {i: t for t, i in vocab.items()}
    return b"".join(rev[i] for i in ids).decode("utf-8")


def _trim_to_char_boundary(b: bytes) -> bytes:
    """Clamp a byte string to UTF-8 character-complete edges.

    Byte-level BPE ids map 1:1 to byte strings, so an id-array SLICE
    (a chunk boundary) can start or end mid-character when the text is
    non-ASCII: multi-byte chars whose bytes never merged are split
    across single-byte tokens. Drop leading continuation bytes and any
    incomplete trailing sequence — those partial chars belong to the
    neighboring chunk — so the remainder strict-decodes. For a slice of
    a valid encode() output the result is always an exact substring of
    the original text."""
    i = 0
    while i < len(b) and (b[i] & 0xC0) == 0x80:
        i += 1
    b = b[i:]
    k = len(b) - 1
    while k >= 0 and (b[k] & 0xC0) == 0x80:
        k -= 1
    if k >= 0:
        lead = b[k]
        need = 4 if lead >= 0xF0 else 3 if lead >= 0xE0 else 2 if lead >= 0xC0 else 1
        if len(b) - k < need:
            b = b[:k]
    return b


def decode_slice(ids: list[int], vocab: dict[bytes, int]) -> str:
    """Decode a SLICE of token ids (e.g. one chunk): like :func:`decode`
    but tolerant of boundaries that land mid-character — partial edge
    characters are trimmed (they are re-materialized by the adjacent
    chunk), the interior decodes exactly."""
    rev = {i: t for t, i in vocab.items()}
    return _trim_to_char_boundary(b"".join(rev[i] for i in ids)).decode("utf-8")


# Seed corpus for the shipped default merge table: fixed English text
# with digits, punctuation, and code-ish fragments so the learned merges
# cover the documents table's register. Embedded (not read from disk) so
# `DEFAULT_MERGES` is a pure function of this file's bytes.
_SEED_CORPUS = [
    "the quick brown fox jumps over the lazy dog. "
    "the five boxing wizards jump quickly. pack my box with five dozen "
    "liquor jugs. how vexingly quick daft zebras jump!",
    "data processing pipelines read records from streams and write "
    "aggregated results to tables. the stream processing platform "
    "supports windows, joins, and stateful operators over event time.",
    "training data preparation: deduplication, quality filtering, "
    "language identification, tokenization, chunking, and packing of "
    "documents into fixed size sequences for the model.",
    "in 2024 the system processed 1234567 records per second across 32 "
    "partitions; p99 latency was 45 ms, checkpoint interval 10 s.",
    "select count(*) from documents where length(text) > 100 group by "
    "source order by count(*) desc limit 10;",
    "a an and are as at be by for from has he in is it its of on that "
    "the to was were will with this these those they them then than "
    "there their what which who whom whose when where why how all any "
    "both each few more most other some such not only own same so too "
    "very can just should now",
]

_NUM_MERGES = 384


@lru_cache(maxsize=1)
def default_merges() -> tuple[Pair, ...]:
    """The shipped merge table, trained once per process on the embedded
    seed corpus — deterministic across runs and machines."""
    return tuple(train_bpe(_SEED_CORPUS, _NUM_MERGES))


def _encode_series(s: pd.Series, ranks, vocab) -> pd.Series:
    return s.map(lambda t: encode(t if t is not None else "", ranks, vocab))


def token_ids_udf(spark: SparkSession):
    """Arrow pandas_udf: text → array<int> of real BPE token ids, merge
    table shipped via SparkContext.broadcast (executor-wide, read-only)."""
    bc = spark.sparkContext.broadcast(default_merges())

    @F.pandas_udf("array<int>")
    def _ids(s: pd.Series) -> pd.Series:
        merges = list(bc.value)
        return _encode_series(s, build_ranks(merges), build_vocab(merges))

    return _ids


def token_count_udf(spark: SparkSession):
    """Arrow pandas_udf: text → int real-BPE token count (the budgeting
    primitive: chunking/packing variants consume this)."""
    bc = spark.sparkContext.broadcast(default_merges())

    @F.pandas_udf("int")
    def _count(s: pd.Series) -> pd.Series:
        merges = list(bc.value)
        ranks, vocab = build_ranks(merges), build_vocab(merges)
        return s.map(lambda t: len(encode(t if t is not None else "", ranks, vocab)))

    return _count


def decode_udf(spark: SparkSession):
    """Arrow pandas_udf: array<int> token ids → text. Inverse of
    token_ids_udf — chunkers use it to re-materialize chunk TEXT from a
    slice of real token ids. Slices of byte-level ids can start/end
    mid-character on non-ASCII text, so edges are clamped to UTF-8
    character boundaries (:func:`decode_slice`): full-sequence decode
    stays lossless, chunk-edge partial chars are carried by the
    neighboring chunk instead of raising UnicodeDecodeError."""
    bc = spark.sparkContext.broadcast(default_merges())

    @F.pandas_udf("string")
    def _dec(s: pd.Series) -> pd.Series:
        vocab = build_vocab(list(bc.value))
        rev = {i: t for t, i in vocab.items()}
        return s.map(
            lambda ids: _trim_to_char_boundary(b"".join(rev[i] for i in ids)).decode("utf-8")
        )

    return _dec
