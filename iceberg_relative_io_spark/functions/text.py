"""Deterministic text primitives shared by the dedup/text-analysis
operators — each has a Spark Column builder AND a DuckDB SQL builder that
compute bit-identical results, so every pipeline built on them can carry
an exact SQL oracle (no "trust me" fuzzy checks).

The hash family is integer-only (polynomial char hash, affine minhash
permutations, band compaction) so both engines do exact BIGINT
arithmetic; nothing depends on engine-specific hash functions.

All of this is JVM-side Catalyst expression work in Spark — array
transforms and aggregates inside whole-stage codegen, no Python UDFs —
so the hot path scales like any built-in expression.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas-UDF type hints resolve
from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 2_147_483_647  # 2^31-1 — keeps a*x+b inside BIGINT
SEED = 7
NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = 4
_LCG = 2_654_435_761  # Knuth multiplicative constant


def hash_params(j: int) -> tuple[int, int]:
    """Affine minhash permutation j: h_j(x) = (a_j x + b_j) mod MOD."""
    return 2 * j + 1, (j * _LCG) % MOD


# ---------------------------------------------------------------------------
# token code: polynomial hash over characters
# ---------------------------------------------------------------------------

def token_code(tok: Column) -> Column:
    return F.aggregate(
        F.split(tok, ""),
        F.lit(SEED).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % MOD,
    )


def token_code_sql(tok: str) -> str:
    # NULL guard: DuckDB's list_prepend(seed, NULL) yields [seed] (the
    # reduce then returns the bare seed), while Spark's aggregate over a
    # NULL array is NULL — pin Spark's SQL-standard NULL-in/NULL-out
    return (
        f"CASE WHEN ({tok}) IS NULL THEN NULL ELSE "
        f"list_reduce(list_prepend(CAST({SEED} AS BIGINT), "
        f"list_transform(string_split({tok}, ''), ch -> CAST(ascii(ch) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {MOD}) END"
    )


def token_codes(text: Column) -> Column:
    """Array of per-token codes for a space-tokenized text column."""
    return F.transform(F.split(text, " "), token_code)


def token_codes_sql(text: str) -> str:
    return f"list_transform(string_split({text}, ' '), tok -> {token_code_sql('tok')})"


# ---------------------------------------------------------------------------
# shingles: 3-gram-of-tokens codes
# ---------------------------------------------------------------------------

SHINGLE = 3


def shingle_codes(codes: Column) -> Column:
    """Combine each run of 3 token codes into one shingle code."""
    expr = F.transform(
        F.sequence(F.lit(1), F.size(codes) - (SHINGLE - 1)),
        lambda i: (
            (F.element_at(codes, i) * 31 + F.element_at(codes, i + 1)) * 31
            + F.element_at(codes, i + 2)
        )
        % MOD,
    )
    # guard: Spark sequence(1, n) runs DESCENDING for n<1; emit [] instead
    return F.when(F.size(codes) >= SHINGLE, expr).otherwise(
        F.array().cast("array<bigint>")
    )


def shingle_codes_sql(codes: str) -> str:
    return (
        f"[((({codes})[i] * 31 + ({codes})[i+1]) * 31 + ({codes})[i+2]) % {MOD} "
        f"FOR i IN range(1, len({codes}) - 1)]"
    )


# ---------------------------------------------------------------------------
# generalized k-gram codes (polynomial combine of k consecutive token codes)
# ---------------------------------------------------------------------------

def gram_codes(codes: Column, k: int) -> Column:
    """Array of k-gram codes: each run of k token codes combined with the
    per-step-mod polynomial (acc*31 + c) % MOD. Empty array when fewer
    than k tokens (guarding Spark's descending sequence())."""

    def one(i: Column) -> Column:
        acc = F.element_at(codes, i)
        for j in range(1, k):
            acc = (acc * 31 + F.element_at(codes, i + j)) % MOD
        return acc

    expr = F.transform(F.sequence(F.lit(1), F.size(codes) - (k - 1)), one)
    return F.when(F.size(codes) >= k, expr).otherwise(
        F.array().cast("array<bigint>")
    )


def gram_codes_sql(codes: str, k: int) -> str:
    acc = f"({codes})[i]"
    for j in range(1, k):
        acc = f"((({acc}) * 31 + ({codes})[i+{j}]) % {MOD})"
    return f"[{acc} FOR i IN range(1, len({codes}) - {k - 2})]"


# ---------------------------------------------------------------------------
# minhash signature + LSH bands
# ---------------------------------------------------------------------------

def minhash(shingles: Column, j: int) -> Column:
    a, b = hash_params(j)
    return F.array_min(F.transform(shingles, lambda c: (c * a + b) % MOD))


def minhash_sql(shingles: str, j: int) -> str:
    a, b = hash_params(j)
    return f"list_min([ (c * {a} + {b}) % {MOD} FOR c IN ({shingles}) ])"


def band_signature(minhashes: list[Column], band: int) -> Column:
    """Compact ROWS_PER_BAND minhash values into one band signature."""
    vals = minhashes[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
    acc = vals[0]
    for v in vals[1:]:
        acc = acc * 31 + v
    return acc % MOD


def band_signature_sql(minhash_sqls: list[str], band: int) -> str:
    vals = minhash_sqls[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
    acc = f"({vals[0]})"
    for v in vals[1:]:
        acc = f"({acc} * 31 + ({v}))"
    return f"{acc} % {MOD}"


# ---------------------------------------------------------------------------
# simhash (16-bit) over token codes with multiplicity
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def _bit_contrib(b: int):
    # factory closure: pyspark introspects lambda arity, so the bit index
    # must be captured in an enclosing scope, not as a default parameter
    return lambda acc, x: acc + (F.shiftright(x, b).bitwiseAND(F.lit(1)) * 2 - 1)


def simhash(codes: Column) -> Column:
    total = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        contrib = F.aggregate(codes, F.lit(0).cast("long"), _bit_contrib(b))
        total = total + F.when(contrib > 0, F.lit(1 << b)).otherwise(F.lit(0))
    # NULL-in/NULL-out: per-bit 0/1 defaults would otherwise render a
    # NULL code array as simhash 0 (a real-looking signature), while
    # the pandas-UDF mirror emits None — pin NULL on both paths
    return F.when(codes.isNull(), F.lit(None).cast("long")).otherwise(total)


def simhash_sql(codes: str) -> str:
    parts = []
    for b in range(SIMHASH_BITS):
        parts.append(
            f"CASE WHEN list_sum([ ((c >> {b}) & 1) * 2 - 1 FOR c IN ({codes}) ]) > 0 "
            f"THEN {1 << b} ELSE 0 END"
        )
    total = "(" + " + ".join(parts) + ")"
    return f"CASE WHEN ({codes}) IS NULL THEN NULL ELSE {total} END"


# ---------------------------------------------------------------------------
# whole-document fingerprint: polynomial rolling hash over all characters
# ---------------------------------------------------------------------------

def fingerprint(text: Column) -> Column:
    return token_code(text)  # same polynomial, applied to the full string


def fingerprint_sql(text: str) -> str:
    return token_code_sql(text)


# ---------------------------------------------------------------------------
# Arrow-batched fast path for the full signature pipeline
# ---------------------------------------------------------------------------
# Spark evaluates nested higher-order array functions (aggregate inside
# transform) in interpreted mode — they fall out of whole-stage codegen —
# so hashing every token of every document through Column expressions is
# ~20× slower than it should be. The batch UDFs below compute the *same
# integers* (Python int arithmetic is exact; ord == ascii for these
# single-byte tokens) in Arrow-vectorized batches; the Column builders
# above remain the reference semantics and the oracle SQL mirrors both.

def _py_token_code(tok: str, _memo: dict) -> int:
    c = _memo.get(tok)
    if c is None:
        if tok == "":
            # both engines split '' into [''] and hash ascii('') = 0, so an
            # empty token folds ONE zero char: (SEED*31 + 0) % MOD — not the
            # bare seed a no-op loop would leave (property-tested vs the
            # Column builder in tests/test_northstar.py)
            c = (SEED * 31) % MOD
        else:
            c = SEED
            for ch in tok:
                c = (c * 31 + ord(ch)) % MOD
        _memo[tok] = c
    return c


def _py_shingles(text: str, memo: dict) -> list[int]:
    codes = [_py_token_code(t, memo) for t in text.split(" ")]
    return [
        ((codes[i] * 31 + codes[i + 1]) * 31 + codes[i + 2]) % MOD
        for i in range(len(codes) - (SHINGLE - 1))
    ]


def _py_gram_codes(text: str, k: int, memo: dict) -> list[int]:
    """Python mirror of gram_codes(): per-step-mod polynomial combine."""
    codes = [_py_token_code(t, memo) for t in text.split(" ")]
    out = []
    for i in range(len(codes) - k + 1):
        acc = codes[i]
        for j in range(1, k):
            acc = (acc * 31 + codes[i + j]) % MOD
        out.append(acc)
    return out


def make_gram_stats_udf(k: int):
    """pandas UDF: text -> struct(n_grams, n_repeats) over k-gram codes —
    the Arrow-batched mirror of size/array_distinct over gram_codes()."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType(
        [
            StructField("n_grams", IntegerType()),
            StructField("n_repeats", IntegerType()),
        ]
    )

    @F.pandas_udf(schema)
    def gram_stats(text: pd.Series) -> pd.DataFrame:
        memo: dict = {}
        totals, repeats = [], []
        for t in text:
            if t is None:  # SQL NULL propagation: stats of NULL are NULL
                totals.append(None)
                repeats.append(None)
                continue
            g = _py_gram_codes(t, k, memo)
            totals.append(len(g))
            repeats.append(len(g) - len(set(g)))
        return pd.DataFrame({"n_grams": totals, "n_repeats": repeats})

    return gram_stats


def make_gram_codes_udf(k: int):
    """pandas UDF: text -> ORDERED k-gram codes (index i covers tokens
    i..i+k-1) — the Arrow-batched mirror of gram_codes() for consumers
    that need gram positions (e.g. span removal). The Column-expression
    twin evaluates interpreted (nested higher-order exprs fall out of
    codegen) at ~50x this cost on corpus-sized inputs."""
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def ordered_grams(text: pd.Series) -> pd.Series:
        memo: dict = {}
        return pd.Series(
            [None if t is None else _py_gram_codes(t, k, memo) for t in text]
        )

    return ordered_grams


def make_distinct_gram_codes_udf(k: int):
    """pandas UDF: text -> sorted distinct k-gram codes (Arrow-batched
    mirror of array_distinct(gram_codes()) — order irrelevant because the
    consumer explodes)."""
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def distinct_grams(text: pd.Series) -> pd.Series:
        memo: dict = {}
        return pd.Series(
            [
                None if t is None else sorted(set(_py_gram_codes(t, k, memo)))
                for t in text
            ]
        )

    return distinct_grams


def make_char_gram_codes_udf(k: int):
    """pandas UDF: text -> array of char k-gram rolling-hash codes.

    h(i) = (sum_j c[i+j] * 31^(k-1-j)) mod MOD, computed O(n) per doc by
    rolling removal of the leading char. The SQL twin
    (char_gram_codes_sql) folds each k-slice — O(n*k), fine at oracle
    scale — and lands on the identical integers because per-step-mod
    folding and the rolling form both reduce the same polynomial mod MOD.
    """
    from pyspark.sql.types import ArrayType, LongType

    lead = pow(31, k - 1, MOD)

    @F.pandas_udf(ArrayType(LongType()))
    def char_gram_codes(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if t is None:
                out.append(None)
                continue
            n = len(t)
            if n < k:
                out.append([])
                continue
            cs = [ord(ch) for ch in t]
            h = 0
            for j in range(k):
                h = (h * 31 + cs[j]) % MOD
            hs = [h]
            for i in range(1, n - k + 1):
                h = ((h - cs[i - 1] * lead) * 31 + cs[i + k - 1]) % MOD
                hs.append(h)
            out.append(hs)
        return pd.Series(out)

    return char_gram_codes


def char_gram_codes_sql(text: str, k: int) -> str:
    codes = f"list_transform(string_split({text}, ''), ch -> CAST(ascii(ch) AS BIGINT))"
    fold = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), ({codes})[i : i + {k - 1}]), "
        f"(acc, x) -> (acc * 31 + x) % {MOD})"
    )
    # NULL guard: Spark's transform over a NULL array is NULL; without
    # it DuckDB's greatest/range machinery can turn NULL text into []
    return (
        f"CASE WHEN ({text}) IS NULL THEN NULL ELSE "
        f"[{fold} FOR i IN range(1, greatest(len({codes}) - {k - 1}, 0) + 1)] END"
    )


def make_minhash_udf():
    """pandas UDF: text -> array of NUM_HASHES minhash values."""
    from pyspark.sql.types import ArrayType, LongType

    params = [hash_params(j) for j in range(NUM_HASHES)]

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_sig(text: pd.Series) -> pd.Series:
        memo: dict = {}
        out = []
        for t in text:
            if t is None:  # NULL text -> NULL signature (SQL propagation)
                out.append(None)
                continue
            sh = _py_shingles(t, memo)
            if not sh:
                out.append([None] * NUM_HASHES)
            else:
                out.append([min((a * c + b) % MOD for c in sh) for a, b in params])
        return pd.Series(out)

    return minhash_sig


def make_simhash_udf():
    """pandas UDF mirror of simhash(): same integer arithmetic, Arrow-
    batched (the Column version is 16 interpreted array aggregates)."""
    from pyspark.sql.types import LongType

    import numpy as np

    bit_range = np.arange(SIMHASH_BITS, dtype=np.int64)
    pow2 = (1 << bit_range).astype(np.int64)

    @F.pandas_udf(LongType())
    def simhash16(text: pd.Series) -> pd.Series:
        memo: dict = {}
        out = []
        for t in text:
            if t is None:
                out.append(None)
                continue
            codes = np.array(
                [_py_token_code(tok, memo) for tok in t.split(" ")], dtype=np.int64
            )
            # (n_tokens, bits) sign matrix; integer sums are exact in any
            # order so vectorizing cannot diverge from the SQL oracle
            contrib = (((codes[:, None] >> bit_range) & 1) * 2 - 1).sum(axis=0)
            out.append(int(((contrib > 0) * pow2).sum()))
        return pd.Series(out)

    return simhash16


def make_shingle_set_udf():
    """pandas UDF: text -> sorted distinct shingle codes (for exact
    Jaccard verification and inverted-index similarity joins)."""
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def shingle_set(text: pd.Series) -> pd.Series:
        memo: dict = {}
        return pd.Series(
            [None if t is None else sorted(set(_py_shingles(t, memo))) for t in text]
        )

    return shingle_set


def band_signature_from_sig(sig: Column, band: int) -> Column:
    """Band compaction over a minhash signature array column."""
    vals = [
        F.element_at(sig, band * ROWS_PER_BAND + r + 1) for r in range(ROWS_PER_BAND)
    ]
    acc = vals[0]
    for v in vals[1:]:
        acc = acc * 31 + v
    return acc % MOD
