"""Real byte-pair-encoding token counts — the production-faithful rung
behind `text.py::bpe_ish_token_count`'s approximation.

Reference surface: none — this is the LLM-training-data extension
(SURVEY.md §2 "beyond the reference"). Fixed-token training sequences
(`text.py::pack_chunks`) and token-budgeted mixtures
(`sampling.py::sample_to_mixture(weight_col=)`) drift from real
tokenizer budgets when fed the regex approximation; this module
applies a FROZEN MERGES TABLE with the actual BPE merge loop
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
Words with Subword Units") so the counted budget is the budget a real
BPE tokenizer would charge under the same merges.

Format compatibility: `parse_merges` / `format_merges` speak the
standard public `merges.txt` layout (optional `#version` header, one
`A B` pair per line, rank = line order) — point `BpeTokenizer` at any
published merges file (GPT-2's vocab ships in exactly this format) to
count under a production tokenizer. The built-in `FROZEN_BPE` is a
small table trained deterministically at import from embedded seed
text, so the repo is self-contained and the tests pin exact counts.

Conventions (must match between training and encoding):
- pre-tokenizer: `text.py::BPE_TOKEN_RE` (letter/digit runs + single
  symbols) — BPE then refines WITHIN each pre-token;
- each word starts as its character sequence plus a separate
  trailing end-of-word symbol `</w>`, so merges can learn suffixes
  ("ing</w>") without crossing word boundaries;
- training tie-break: highest count, then lexicographically smallest
  pair — fully deterministic.

Scale shape: counting is genuinely Python-bound (a JVM expression
cannot run a data-dependent merge loop), so this is one of the
repo's documented Arrow escape hatches (the multimodal codec
precedent): a scalar pandas_udf — Arrow-batched, never row-at-a-time
Python in the executor loop — with a per-executor word→length memo
(token counts follow Zipf: the memo hit rate on natural text is
>90%, so the merge loop runs roughly once per DISTINCT word, not per
occurrence). Map-only: no shuffle, no driver collect. Everything
else in the repo stays JVM-side; use `bpe_ish_token_count` where an
approximate count inside whole-stage codegen is the better trade.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Iterable, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import BPE_TOKEN_RE

__all__ = [
    "train_bpe_merges",
    "train_bpe_merges_spark",
    "parse_merges",
    "format_merges",
    "BpeTokenizer",
    "bpe_token_count",
    "bpe_encode",
    "FROZEN_BPE",
    "FROZEN_BPE_BYTES",
]

END_OF_WORD = "</w>"
#: byte-level end-of-word marker: chr(256) sits OUTSIDE the byte
#: symbol range 0..255, so no merged byte sequence can ever collide
#: with it (the char-level "</w>" marker is kept for char mode).
BYTE_EOW = "Ā"
_PRETOKEN_RE = re.compile(BPE_TOKEN_RE)


def _pretokens(text: str) -> list[str]:
    return _PRETOKEN_RE.findall(text)


def _base_syms(word: str, byte_level: bool) -> list[str]:
    """Initial symbol sequence of a word: characters, or UTF-8 bytes
    represented as chr(0..255) (byte-level — the GPT-2 shape: the
    base alphabet is CLOSED, so every string encodes with no UNK)."""
    if byte_level:
        return [chr(b) for b in word.encode("utf-8")]
    return list(word)


def train_bpe_merges(
    texts: Iterable[str], num_merges: int = 200, byte_level: bool = False
) -> list[tuple[str, str]]:
    """Classic BPE training: start from characters (+ `</w>`), merge
    the most frequent adjacent symbol pair `num_merges` times (ties:
    lexicographically smallest pair). Driver-side by design — the
    seed corpus is small by construction; training a production vocab
    is the tokenizer project's job, this produces a frozen table in
    its exact format. byte_level=True starts from UTF-8 bytes instead
    of characters (closed base alphabet -> id-mappable vocab; pair a
    byte-level merges table with BpeTokenizer(byte_level=True))."""
    eow = BYTE_EOW if byte_level else END_OF_WORD
    words: Counter[tuple[str, ...]] = Counter()
    for t in texts:
        for w in _pretokens(t):
            words[tuple(_base_syms(w, byte_level)) + (eow,)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for sym, cnt in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        # tie-break: highest count, then lexicographically smallest pair
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        merges.append(best_pair)
        merged = "".join(best_pair)
        new_words: Counter[tuple[str, ...]] = Counter()
        for sym, cnt in words.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best_pair[0]
                    and sym[i + 1] == best_pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] += cnt
        words = new_words
    return merges


def train_bpe_merges_spark(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    byte_level: bool = False,
    sample_frac: float | None = None,
    seed: int = 42,
) -> list[tuple[str, str]]:
    """Corpus-scale BPE vocab training (round 12, VERDICT r11 item 3):
    the state that outgrows driver memory — the distinct-word-shape
    table — stays DISTRIBUTED for the whole run; the driver holds only
    the merges list and, per iteration, ONE collected row (the argmax
    pair — a bounded collect by construction).

    Per iteration (the published Sennrich loop, re-expressed):
    1. explode adjacent symbol pairs of every word shape, two-phase
       count weighted by word frequency (map-side partial aggregation
       keeps the exchange at |distinct pairs| rows per task),
    2. driver picks the max — orderBy(count DESC, pair ASC) LIMIT 1,
       the exact (highest count, lexicographically smallest) tie-break
       of the driver trainer; both engines order strings by UTF-8
       code point, so the choice is identical,
    3. apply the merge to every word shape with ONE in-plan fold
       (F.aggregate): left-to-right non-overlapping replacement,
       provably equal to the reference while-loop because the only
       same-pass merged symbol is the string a+b, which can never
       equal `a` (b is non-empty) — so the fold's look-back at its
       own output never spuriously re-matches,
    4. localCheckpoint the new shapes — per-round state
       materialization keeps the plan FLAT (200 nested folds would
       otherwise blow up analysis time), the label-propagation
       convention.

    `sample_frac` subsamples documents first (vocab training runs on
    a corpus sample in production pipelines). Word counting is one
    explode + hash aggregate; initial symbol splitting is pure
    expressions — byte-level uses decode(encode(w,'UTF-8'),
    'ISO-8859-1'), which maps byte b to chr(b) EXACTLY like the
    driver trainer's _base_syms (latin-1 is the identity byte→
    codepoint table). Parity with `train_bpe_merges` on identical
    input is pinned in tests/test_bpe.py, char and byte level.

    Returns the same ranked pair list as `train_bpe_merges` — the
    frozen-merges serving contract (BpeTokenizer, merges.txt
    round-trip) is unchanged."""
    if sample_frac is not None:
        docs = docs.sample(fraction=float(sample_frac), seed=seed)
    eow = BYTE_EOW if byte_level else END_OF_WORD

    w = F.col("word")
    if byte_level:
        w = F.decode(F.encode(w, "UTF-8"), "ISO-8859-1")
    chars = F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, 1)
    )
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(BPE_TOKEN_RE), 0
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(chars, F.array(F.lit(eow))).alias("syms"), "cnt"
        )
        .localCheckpoint()
    )

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = (
            # fully-merged 1-symbol shapes have no adjacent pairs (and
            # a zero-length slice would error under ANSI)
            words.filter(F.size("syms") > 1)
            .select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(
                            a.alias("a"), b.alias("b")
                        ),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(
            F.desc("n"), F.asc("a"), F.asc("b")
        ).limit(1).collect()
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        merged = a + b

        la, lb, lm = F.lit(a), F.lit(b), F.lit(merged)

        def step(acc: Column, s: Column) -> Column:
            return F.when(
                F.size(acc) == 0, F.array(s)
            ).otherwise(
                F.when(
                    (F.element_at(acc, -1) == la) & (s == lb),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(lm)
                    ),
                ).otherwise(F.concat(acc, F.array(s)))
            )

        new_words = words.select(
            F.aggregate(
                "syms", F.array().cast("array<string>"), step
            ).alias("syms"),
            "cnt",
        ).localCheckpoint()
        words = new_words
    return merges


def parse_merges(text: str) -> list[tuple[str, str]]:
    """merges.txt -> ranked pair list (skips `#...` header/comment
    lines and blanks; rank = order of appearance)."""
    merges = []
    for line in text.splitlines():
        line = line.rstrip("\n")
        if not line.strip() or line.startswith("#"):
            continue
        a, sep, b = line.partition(" ")
        if not sep:
            raise ValueError(f"merges line is not 'A B': {line!r}")
        merges.append((a, b))
    return merges


def format_merges(merges: Sequence[tuple[str, str]]) -> str:
    return "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"


class BpeTokenizer:
    """Frozen merges table + the standard greedy lowest-rank merge
    loop. `encode_word` memoizes per word (Zipf makes this the whole
    cost model on natural text).

    byte_level=True (pair with a byte-level merges table) closes the
    base alphabet at 256 UTF-8 byte symbols, which makes the vocab
    id-mappable: `vocab()` assigns ids 0..255 to the bytes, 256 to
    the end-of-word marker and 257+ to merged tokens in rank order,
    and `encode_ids`/`decode_ids` round-trip any string through ids
    with no UNK (decode returns the canonical form: pre-tokens joined
    by single spaces — the pre-tokenizer drops original whitespace,
    so encode(decode(ids)) == ids, not byte-exact text)."""

    def __init__(
        self, merges: Sequence[tuple[str, str]], byte_level: bool = False
    ):
        self.merges = list(merges)
        self.byte_level = byte_level
        self.eow = BYTE_EOW if byte_level else END_OF_WORD
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}
        self._cache: dict[str, tuple[str, ...]] = {}
        # lazily built by vocab(): rebuilding the token->id dict per
        # encode_ids call is O(|vocab|) per row — negligible at 220
        # merges but severe for a production 50k-merge table, and it
        # would contradict the memo-based cost model above (ADVICE r10)
        self._vocab: dict[str, int] | None = None
        self._inv_vocab: dict[int, str] | None = None

    def encode_word(self, word: str) -> list[str]:
        syms = _base_syms(word, self.byte_level) + [self.eow]
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i, pair in enumerate(zip(syms, syms[1:])):
                r = self.ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    def _encode_cached(self, word: str) -> tuple[str, ...]:
        toks = self._cache.get(word)
        if toks is None:
            toks = tuple(self.encode_word(word))
            self._cache[word] = toks
        return toks

    def count_word(self, word: str) -> int:
        return len(self._encode_cached(word))

    def count_tokens(self, text: str) -> int:
        if text is None:
            return 0
        return sum(self.count_word(w) for w in _pretokens(text))

    def vocab(self) -> dict[str, int]:
        """token-string -> id (byte-level only; the char-level base
        alphabet is open, so ids could not cover unseen characters).
        Two merge pairs can concat to the same string ("ab"+"c" and
        "a"+"bc"); the first rank wins the id and both encode/decode
        consistently through it. Returns a read-only view of the
        per-instance cache (round 11): the dict is shared with
        encode_ids/decode_ids, so handing out the raw object would
        let external mutation silently corrupt round-trips — copy it
        (`dict(tok.vocab())`) to extend."""
        if not self.byte_level:
            raise ValueError(
                "vocab()/encode_ids need a byte-level tokenizer "
                "(BpeTokenizer(merges, byte_level=True))"
            )
        if self._vocab is None:
            v = {chr(b): b for b in range(256)}
            v[self.eow] = 256
            next_id = 257
            for a, b in self.merges:
                if a + b not in v:
                    v[a + b] = next_id
                next_id += 1
            self._vocab = v
        from types import MappingProxyType

        return MappingProxyType(self._vocab)

    def _inverse_vocab(self) -> dict[int, str]:
        if self._inv_vocab is None:
            inv: dict[int, str] = {}
            for tok, i in self.vocab().items():
                inv.setdefault(i, tok)
            self._inv_vocab = inv
        return self._inv_vocab

    def encode_ids(self, text: str) -> list[int]:
        v = self.vocab()
        if text is None:
            return []
        return [
            v[t] for w in _pretokens(text) for t in self._encode_cached(w)
        ]

    def decode_ids(self, ids: Sequence[int]) -> str:
        """ids -> canonical text (words joined by single spaces)."""
        inv = self._inverse_vocab()
        s = "".join(inv[i] for i in ids)
        words = []
        for chunk in s.split(self.eow):
            if chunk:
                words.append(bytes(ord(c) for c in chunk).decode("utf-8"))
        return " ".join(words)


def bpe_token_count(
    df: DataFrame,
    tokenizer: BpeTokenizer | None = None,
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Adds `out_col` = real BPE token count of `text_col` under the
    (frozen) merges table — Arrow-batched scalar pandas_udf, map-only
    (see module docstring for why this is a documented Python escape
    hatch). The result column is what `pack_chunks(token_col=)` and
    `sample_to_mixture(weight_col=)` should budget on when real
    tokenizer budgets matter."""
    from pyspark.sql.functions import pandas_udf

    tok = tokenizer or FROZEN_BPE
    merges = tok.merges  # ship the table, not the object (clean pickle)
    byte_level = tok.byte_level

    @pandas_udf("long")
    def _count(s: pd.Series) -> pd.Series:
        t = BpeTokenizer(merges, byte_level)  # per-executor memo
        return s.map(lambda x: t.count_tokens(x) if x is not None else 0)

    return df.withColumn(out_col, _count(F.col(text_col)))


def bpe_encode(
    df: DataFrame,
    tokenizer: BpeTokenizer | None = None,
    text_col: str = "text",
    out_col: str = "input_ids",
) -> DataFrame:
    """Adds `out_col` = array<int> token ids of `text_col` under a
    BYTE-LEVEL tokenizer (closed vocab, no UNK) — what a training
    shard actually feeds a trainer. Arrow-batched pandas_udf, map-only
    (same escape-hatch contract as bpe_token_count). NULL text
    encodes to an empty array."""
    from pyspark.sql.functions import pandas_udf

    tok = tokenizer or FROZEN_BPE_BYTES
    if not tok.byte_level:
        raise ValueError("bpe_encode needs a byte-level tokenizer")
    merges = tok.merges

    @pandas_udf("array<int>")
    def _encode(s: pd.Series) -> pd.Series:
        t = BpeTokenizer(merges, byte_level=True)
        return s.map(lambda x: t.encode_ids(x) if x is not None else [])

    return df.withColumn(out_col, _encode(F.col(text_col)))


# --------------------------------------------------------------------------
# Frozen default: ~220 merges trained at import over embedded English
# seed prose (deterministic: pure counting with a total tie-break).
# Small on purpose — the tests pin exact counts against it; swap in a
# published merges.txt via parse_merges for production budgets.
# --------------------------------------------------------------------------

_SEED_TEXT = (
    "The training corpus is assembled from many sources and the "
    "tokens are counted before the sequences are packed. The model "
    "learns from the data and the data is cleaned before training. "
    "Counting tokens with the same merges the tokenizer uses keeps "
    "the budgets honest, and packing the chunks into fixed sequences "
    "wastes fewer tokens than padding every document. The pipeline "
    "reads the documents, counts the tokens, packs the sequences and "
    "writes the shards. When the counts and the merges disagree the "
    "budget drifts, and the training runs longer than the plan said "
    "it would. The counting and the packing and the sampling share "
    "one table so the numbers agree everywhere in the pipeline."
)

FROZEN_BPE = BpeTokenizer(train_bpe_merges([_SEED_TEXT], num_merges=220))

#: byte-level twin (closed 256+1+220-id vocab): the default for
#: bpe_encode / training-shard input_ids emission
FROZEN_BPE_BYTES = BpeTokenizer(
    train_bpe_merges([_SEED_TEXT], num_merges=220, byte_level=True),
    byte_level=True,
)
