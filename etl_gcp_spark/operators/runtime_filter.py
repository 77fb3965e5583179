"""Runtime-filter (dynamic-filter) joins: prune the fact side with a
bloom bitset of the dim side's join keys BEFORE the join.

The 100-TB problem this solves: a selective dimension filter
(``WHERE s_nationkey = 7``) keeps a few thousand dim rows, but the
fact table still ships EVERY row into the join — a full scan's worth
of shuffle or broadcast-probe work for a join that will drop >95% of
it. Engines with runtime filtering (Trino dynamic filtering, Photon,
Spark's own ``spark.sql.optimizer.runtime.bloomFilter.enabled`` when
statistics trigger it) push a bloom of the dim keys into the fact
scan. This module is the explicit, always-on version built from
public DataFrame aggregates only — no driver collect, no private
APIs — so the pruning is guaranteed rather than statistics-dependent,
and the probe runs inside whole-stage codegen.

Exactness: a bloom has NO false negatives, so no matching fact row is
ever pruned; false positives pass the probe but are removed by the
join itself (the join IS the exact verify). The output is therefore
bit-identical to the plain ``fact.join(dim, key, how)`` for inner and
semi joins — which is exactly what the DuckDB oracle runs.

Bitset layout (shared with
:func:`etl_gcp_spark.operators.corpus.contamination_bloom`, the
decontamination-specific instance of the same posture):

  bit positions = pmod(xxhash64(key, j), m_bits)   for j < n_hashes
  64-bit words  = explode → groupBy(word) → bit_or(mask)
  bitset        = map_from_entries(sorted (word, bits) pairs)

The sparse word-map (≤ m_bits/64 entries; 16 KB at m=2^17) broadcasts
to every task; each fact row probes it with ``element_at`` +
bitwiseAND expressions — pure codegen, no Python.

Reference parity: the reference joins staged tables inside the
warehouse after loading everything (`data_loader.py` load-then-query
posture); pre-join pruning has no analog there — this is the
scale-first replacement for shipping unfiltered facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_bitset(
    keys: DataFrame, key: str, *, m_bits: int = 1 << 17, n_hashes: int = 2
) -> DataFrame:
    """Fold the distinct values of ``keys[key]`` into a one-row bloom
    bitset frame (column ``__bf``: map<word_index, word_bits>), built
    entirely with DataFrame aggregates (map-side combined; the shuffle
    carries ≤ m_bits/64 word rows)."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    hashed = keys.select(F.xxhash64(F.col(key)).alias("__h")).dropDuplicates()

    def _bitpos(j: int) -> F.Column:
        return F.pmod(F.xxhash64(F.col("__h"), F.lit(j)), F.lit(m_bits))

    words = (
        hashed.select(
            F.explode(
                F.array(*[_bitpos(j) for j in range(n_hashes)])
            ).alias("__p")
        )
        .select(
            (F.col("__p") / 64).cast("long").alias("__w"),
            F.expr("shiftleft(1L, cast(__p % 64 AS int))").alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__bits"))
    )
    return words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("__w", "__bits")))
        ).alias("__bf")
    )


def bloom_probe(
    fact: DataFrame,
    bitset: DataFrame,
    key: str,
    *,
    m_bits: int = 1 << 17,
    n_hashes: int = 2,
) -> DataFrame:
    """Keep only fact rows whose ``key`` MIGHT be in the bitset
    (never drops a true match). NULL keys never probe true — they
    cannot match an equi-join anyway."""
    probe = fact.crossJoin(F.broadcast(bitset))
    hit = None
    for j in range(n_hashes):
        p = f"pmod(xxhash64(xxhash64(`{key}`), {j}), {m_bits}L)"
        bit = F.expr(
            f"coalesce(element_at(__bf, cast(({p}) / 64 AS long)), 0L)"
            f" & shiftleft(1L, cast(({p}) % 64 AS int)) != 0"
        )
        hit = bit if hit is None else (hit & bit)
    return probe.filter(hit).drop("__bf")


def runtime_filter_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    m_bits: int = 1 << 17,
    n_hashes: int = 2,
    how: str = "inner",
) -> DataFrame:
    """``fact ⋈ dim`` with the fact side bloom-pruned by the dim's
    key set first. Output is exactly ``fact.join(dim, key, how)``.

    Only join types where pruning unmatched fact rows is sound are
    accepted (inner / left_semi — an outer join must KEEP unmatched
    rows). The dim side is broadcast-hinted: if it is small enough to
    bloom it is small enough to broadcast, and the bloom's job is
    cutting the fact rows that would otherwise probe the hash table
    (or, on a real cluster, ride a shuffle when the dim outgrows the
    broadcast threshold and AQE picks sort-merge).
    """
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(
            "runtime_filter_join prunes unmatched fact rows; only "
            f"inner/semi joins are sound, got {how!r}"
        )
    bitset = bloom_bitset(
        dim.select(key), key, m_bits=m_bits, n_hashes=n_hashes
    )
    pruned = bloom_probe(
        fact, bitset, key, m_bits=m_bits, n_hashes=n_hashes
    )
    return pruned.join(F.broadcast(dim), key, how)
