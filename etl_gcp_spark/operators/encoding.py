"""ML feature-preparation encoders: smoothed target encoding and the
hashing trick — the two classic categorical→numeric transforms a
training-data pipeline applies before a downstream model, and the
encoding counterpart to the trainable scorer in
``operators/classifier.py``.

The reference engine has no feature engineering at all (its
transforms stop at cleaning, data_loader.py:301-340); this module
supplies the standard public techniques (micci-barreca 2001 target
statistics; Weinberger et al. 2009 feature hashing) under the
engine's exact-replay discipline:

- **Exact integer/decimal aggregates, one rounding point.** Target
  sums accumulate as DECIMAL(28,8) (order-free, partition-
  independent); the smoothed estimate is a FIXED tree of
  correctly-rounded double ops on those exact aggregates, rounded
  once at the end — bit-identical across engines.
- **Engine-portable string hash.** The hashing trick uses an
  unrolled 8-character polynomial over ``ascii()`` code points mod
  2^31−1 — pure +,×,mod on int64-exact intermediates, expressible
  identically in Spark and any ANSI SQL oracle. No xxhash side
  table needed.
- **Scale shape.** Both encoders are single-pass map-side-combined
  aggregations; the encoding tables are category- or dim-bounded
  (broadcastable), never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_PRIME = 2147483647  # 2^31 - 1, matches functions/sketches.py


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    *,
    smoothing: float = 100.0,
) -> DataFrame:
    """Smoothed mean target encoding: enc(c) = (Σ_c y + m·prior) /
    (n_c + m), prior = global mean — the standard shrinkage that
    keeps rare categories from memorizing their few targets
    (micci-barreca 2001 eq. 4 with constant weight m).

    Output: (category, n_rows, cat_mean, enc), rounded to 4 dp
    (money convention). NULL categories form their own encoding row
    (a real category at serving time); NULL targets are excluded
    from both n and the sum so they cannot drag means toward zero.

    Scale: one groupBy over the fact table (map-side combine), one
    broadcast of the 1-row global aggregate. The encoding table is
    |categories| rows — always broadcastable back onto the facts.
    """
    y = F.col(target_col).cast("decimal(28,8)")
    counts = df.filter(F.col(target_col).isNotNull()).groupBy(
        F.col(cat_col).alias("category")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(y).alias("__sum"),
    )
    glob = counts.agg(
        F.sum("n_rows").alias("__gn"),
        F.sum("__sum").alias("__gsum"),
    )
    m = F.lit(float(smoothing))
    prior = F.col("__gsum").cast("double") / F.col("__gn").cast("double")
    enc = (F.col("__sum").cast("double") + m * prior) / (
        F.col("n_rows").cast("double") + m
    )
    return (
        counts.crossJoin(F.broadcast(glob))
        .select(
            "category",
            "n_rows",
            F.round(
                F.col("__sum").cast("double")
                / F.col("n_rows").cast("double"),
                4,
            ).alias("cat_mean"),
            F.round(enc, 4).alias("enc"),
        )
    )


def _poly_hash(tok: Column) -> Column:
    """Unrolled 8-char polynomial hash mod 2^31−1.

    h = Σ_{i=1..8} ascii(char_i)·31^(i−1), chars past the token end
    contribute 0. Max term 127·31^7 ≈ 3.5e12, max sum < 2^45 —
    int64-exact everywhere, so the mod is deterministic and any SQL
    engine replays it with CASE/ascii/substr. Collisions are the
    POINT of the hashing trick (dim-bounded features); only
    determinism matters.
    """
    h = F.lit(0).cast("long")
    for i in range(1, 9):
        term = F.when(
            F.length(tok) >= i,
            F.ascii(F.substring(tok, i, 1)).cast("long"),
        ).otherwise(F.lit(0))
        h = h + term * F.lit(31 ** (i - 1))
    return h % F.lit(HASH_PRIME)


def hashed_features(
    documents: DataFrame,
    *,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick bag-of-words: every token maps to
    feat_idx = h(token) mod dim with sign from the next hash bit
    (Weinberger et al. 2009 — the signed variant keeps collision
    noise zero-mean), weight = Σ sign over occurrences.

    Output: (doc_id, feat_idx, weight) — the sparse feature vector
    in long form. A (doc, idx) pair whose signs cancel appears with
    weight 0 rather than being dropped: downstream models see the
    same dense vector either way, and keeping it makes the output a
    pure groupBy with no post-filter.

    Scale: tokenize → explode → groupBy(doc, idx): one shuffle on
    (doc, idx) with map-side partial sums; no vocabulary is ever
    collected (that is the trick's purpose — memory is O(dim), not
    O(vocab), at any corpus size).
    """
    tok = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
        "__tok"
    )
    toks = documents.select(F.col(id_col).alias("doc_id"), tok).filter(
        F.length("__tok") > 0
    )
    h = _poly_hash(F.col("__tok"))
    signed = toks.select(
        "doc_id",
        (h % F.lit(dim)).alias("feat_idx"),
        F.when(
            F.floor(h / F.lit(dim)).cast("long") % 2 == 0, F.lit(1)
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("__sign"),
    )
    return signed.groupBy("doc_id", "feat_idx").agg(
        F.sum("__sign").alias("weight")
    )


def hashed_feature_stats(
    documents: DataFrame,
    *,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-index audit of the hashed feature space: how evenly the
    trick spreads corpus mass across the dim buckets (the check run
    before committing to a dim). Output per feat_idx:
    (feat_idx, n_docs, n_tokens, net_weight) — distinct documents
    touching the index, total token occurrences landing on it, and
    the signed sum (≈0 when the sign bit is balanced).

    One extra aggregation over :func:`hashed_features`' input —
    dim-bounded output, trivially collectable at any corpus size.
    """
    tok = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
        "__tok"
    )
    toks = documents.select(F.col(id_col).alias("doc_id"), tok).filter(
        F.length("__tok") > 0
    )
    h = _poly_hash(F.col("__tok"))
    signed = toks.select(
        "doc_id",
        (h % F.lit(dim)).alias("feat_idx"),
        F.when(
            F.floor(h / F.lit(dim)).cast("long") % 2 == 0, F.lit(1)
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("__sign"),
    )
    return signed.groupBy("feat_idx").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("__sign").alias("net_weight"),
    )


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    key_col: str,
    *,
    k: int = 5,
    smoothing: float = 100.0,
) -> DataFrame:
    """Out-of-fold target encoding — the leakage-safe form of
    :func:`target_encode` actually used in training pipelines: the
    encoding a row sees is computed from the OTHER k−1 folds, so no
    row's own target leaks into its feature (micci-barreca 2001 §4 /
    the standard CV-encoding recipe). Folds come from the repo's
    deterministic Lehmer key hash (operators/sampling.py) keyed by
    ``key_col``, so all rows of one entity share a fold — grouped CV,
    the same guard kfold_assign documents.

    All inputs to the shrinkage formula are EXACT differences of
    DECIMAL(28,8) / integer aggregates of the (category × fold) frame
    (≤ |cats|·k rows — one groupBy over the facts, everything after
    is frame-sized); the formula itself is the same fixed
    correctly-rounded double tree as the in-sample encoder, with the
    prior also out-of-fold. NULL targets and NULL keys are excluded
    (a NULL key has no fold); NULL categories encode normally.

    Output: (category, fold, n_rows_in_fold, enc_oof), 4 dp.
    """
    from etl_gcp_spark.operators.sampling import hash_bucket

    y = F.col(target_col).cast("decimal(28,8)")
    cf = (
        df.filter(
            F.col(target_col).isNotNull() & F.col(key_col).isNotNull()
        )
        .groupBy(
            F.col(cat_col).alias("category"),
            (hash_bucket(F.col(key_col), 10_000) % F.lit(k)).alias(
                "fold"
            ),
        )
        .agg(
            F.count(F.lit(1)).alias("n_cf"),
            F.sum(y).alias("s_cf"),
        )
    )
    per_cat = cf.groupBy("category").agg(
        F.sum("n_cf").alias("n_c"), F.sum("s_cf").alias("s_c")
    )
    per_fold = cf.groupBy("fold").agg(
        F.sum("n_cf").alias("n_f"), F.sum("s_cf").alias("s_f")
    )
    glob = cf.agg(
        F.sum("n_cf").alias("n_g"), F.sum("s_cf").alias("s_g")
    )
    m = F.lit(float(smoothing))
    prior = (F.col("s_g") - F.col("s_f")).cast("double") / (
        F.col("n_g") - F.col("n_f")
    ).cast("double")
    enc = (
        (F.col("s_c") - F.col("s_cf")).cast("double") + m * prior
    ) / ((F.col("n_c") - F.col("n_cf")).cast("double") + m)
    return (
        cf.join(F.broadcast(per_cat), "category")
        .join(F.broadcast(per_fold), "fold")
        .crossJoin(F.broadcast(glob))
        .select(
            "category",
            "fold",
            F.col("n_cf").alias("n_rows_in_fold"),
            F.round(enc, 4).alias("enc_oof"),
        )
    )
