"""Deterministic corpus sampling and splitting keyed on stable ids.

Training-data pipelines carve corpora into samples and train/val/test
splits constantly; at 100 TB the only acceptable shape is a map-only
column expression — no shuffle, no state, no driver round-trip.  Keyed
hashing (``xxhash64`` on the document id, Spark's fixed seed 42) gives
three properties ``rand()`` cannot:

* **stable** — the same doc lands in the same sample/split on every
  run, every cluster size, every partitioning (rand() is per-task and
  re-rolls under retries/AQE re-plans, silently leaking val docs into
  train between runs);
* **joinable** — two tables sampled on the same key stay aligned
  (documents and their embeddings survive or drop together);
* **pushdown-friendly** — the predicate is a pure column expression
  that rides into codegen next to the scan; nothing materializes.

Reference parity: GeoParser has no sampling operator (it processes
whole uploads); this family belongs to the "operations a large-scale
training-data pipeline would need" mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: str, den: int) -> Column:
    """The shared bucket expression: ``pmod(xxhash64(id), den)`` (pmod,
    not %: xxhash64 is signed and % keeps the sign in Spark).  Public
    because callers that need the bucket surfaced (stratified audits,
    oracle checks) must use the exact same expression the filter
    pushes down."""
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(den))


_bucket = hash_bucket


def hash_sample(df: DataFrame, id_col: str = "doc_id",
                num: int = 1, den: int = 10) -> DataFrame:
    """Keep a deterministic ~num/den fraction of rows keyed on
    ``id_col``.  Map-only; the filter is a codegen'd column expression
    evaluated at the scan."""
    if not 0 <= num <= den:
        raise ValueError(f"need 0 <= num <= den, got {num}/{den}")
    return df.where(_bucket(id_col, den) < num)


def hash_split(df: DataFrame, id_col: str = "doc_id",
               weights: tuple[int, ...] = (8, 1, 1),
               labels: tuple[str, ...] = ("train", "val", "test"),
               split_col: str = "split") -> DataFrame:
    """Assign every row a deterministic split label with relative
    integer ``weights``.  One hash, one CASE chain — map-only, and the
    assignment is exhaustive (buckets partition [0, sum(weights)))."""
    if len(weights) != len(labels) or not weights:
        raise ValueError("weights and labels must be same non-zero length")
    if any(w <= 0 for w in weights):
        raise ValueError(f"weights must be positive, got {weights}")
    den = sum(weights)
    b = _bucket(id_col, den)
    # build: b < w0 -> l0, elif b < w0+w1 -> l1, ..., else last label
    bounds = []
    acc = 0
    for w, lab in zip(weights[:-1], labels[:-1]):
        acc += w
        bounds.append((acc, lab))
    expr = F.lit(labels[-1])
    for bnd, lab in reversed(bounds):
        expr = F.when(b < bnd, F.lit(lab)).otherwise(expr)
    return df.withColumn(split_col, expr)


def cap_per_group(df: DataFrame, group_cols: list[str], k: int,
                  id_col: str = "doc_id") -> DataFrame:
    """Keep at most ``k`` rows per group, chosen DETERMINISTICALLY at
    random: rank within the group by ``(xxhash64(id), id)`` and keep
    rank <= k.  PRECONDITION: ``id_col`` values are unique (the corpus
    invariant) — rows sharing an id have identical sort keys, so WHICH
    physical row wins among them is partitioning-dependent; dedup ids
    first if that matters.

    This is the per-domain cap every web-curation recipe applies (a
    single boilerplate-heavy domain must not dominate the corpus), with
    the sampling family's determinism guarantees: the same rows survive
    on every rerun, every partitioning, every cluster size — a
    rand()-ordered window re-rolls under retries.

    Scale shape: one shuffle at group grain; the rank-limit window
    compiles to WindowGroupLimit, which Spark pushes BEFORE the
    exchange as a partial limit — each map task forwards at most k rows
    per group it sees, so a 10^7-doc domain ships ~k x map-tasks rows,
    not 10^7."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample(df: DataFrame, rates_bp: dict[str, int],
                    id_col: str = "doc_id", group_col: str = "source",
                    default_bp: int = 10_000,
                    den: int = 10_000) -> DataFrame:
    """Per-group deterministic downsampling — the domain-mixing
    operator: keep a row iff pmod(xxhash64(id), den) < rate_bp[group],
    with rates in basis points of ``den`` (10000 bp = keep all).
    Groups absent from ``rates_bp`` keep ``default_bp``.

    Training mixes are specified exactly this way ("keep 30% of
    crawl-X, all of wiki"); keyed hashing makes the mix stable under
    retries and re-partitioning, and joinable across tables sampled on
    the same key.  Map-only: the rate lookup is a CASE chain over
    group literals folded into the same codegen'd filter as the hash —
    no join, no shuffle, no state.
    """
    if any(not 0 <= v <= den for v in rates_bp.values()):
        raise ValueError(f"rates must be within [0, {den}]: {rates_bp}")
    if not 0 <= default_bp <= den:
        raise ValueError(f"default_bp must be within [0, {den}]: {default_bp}")
    rate = F.lit(default_bp)
    for g in sorted(rates_bp, reverse=True):
        rate = F.when(F.col(group_col) == g, F.lit(rates_bp[g])).otherwise(rate)
    return df.where(_bucket(id_col, den) < rate)


def temperature_rates_bp(counts: dict[str, int], temperature: float,
                         target_frac: float = 1.0,
                         den: int = 10_000) -> dict[str, int]:
    """Temperature-mix rates from per-source counts: weights
    w_s = c_s^(1/T) (T=1 keeps natural proportions, T→∞ uniform),
    sampled counts n_s = target_frac·N·w_s/Σw capped at c_s, returned
    as basis-point keep rates for :func:`weighted_sample`.

    Pure driver-side arithmetic over the (bounded) source histogram —
    the standard LLM data-recipe knob ("upsample small high-quality
    sources, downsample the crawl"), computed FROM the data instead of
    hand-specified.  Deterministic: the same counts and T produce the
    same integer rates on any machine (floor rounding, no RNG)."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    if not counts:
        return {}
    alpha = 1.0 / temperature
    w = {s: float(c) ** alpha for s, c in counts.items() if c > 0}
    # float sums are order-dependent and ``counts`` arrives in collect()
    # row order: sum in SORTED source order so the derived integer
    # rates are identical on every run and in the oracle replica
    total_w = 0.0
    for s in sorted(w):
        total_w = total_w + w[s]
    n_total = sum(counts.values()) * target_frac
    out = {}
    for s, c in counts.items():
        if c <= 0:
            out[s] = 0
            continue
        n_s = min(float(c), n_total * w[s] / total_w)
        out[s] = min(den, int(n_s / c * den))
    return out


def temperature_mix(df: DataFrame, temperature: float,
                    target_frac: float = 1.0,
                    id_col: str = "doc_id", group_col: str = "source",
                    den: int = 10_000) -> DataFrame:
    """Temperature-based source mixing end-to-end: one source-grain
    count aggregate (collected — source histograms are bounded), rate
    derivation on the driver, then the map-only keyed-hash filter of
    :func:`weighted_sample`.  Two scans total; at a real deployment
    the histogram comes from table statistics instead."""
    counts = {
        r[group_col]: r["n"]
        for r in df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
        .collect() if r[group_col] is not None
    }
    rates = temperature_rates_bp(counts, temperature, target_frac, den)
    return weighted_sample(df, rates, id_col=id_col, group_col=group_col,
                           default_bp=den, den=den)


#: finest range-bucket grain: top 16 bits of the sort hash.  The
#: per-bucket count collect is bounded by 2^16 rows (~1 MB) no matter
#: the corpus size, and every coarser grain is a prefix of this one
#: (bucket_b = bucket_16 >> (16 - b)), so ONE counting job serves any
#: derived bucket width.
_SHUFFLE_MAX_BITS = 16
_SHUFFLE_MIN_BITS = 8


def _shuffle_bucket_bits(n_rows: int,
                         target_rows_per_bucket: int = 4_000_000) -> int:
    """Bucket width (in hash bits) for an ``n_rows`` corpus: enough
    buckets that each sort task holds ~``target_rows_per_bucket`` rows,
    clamped to [8, 16].  10^12 rows -> 16 bits -> 65,536 sort tasks of
    ~15M rows each; small test corpora stay at 256 buckets.  Pure
    driver arithmetic, unit-tested directly."""
    needed = max(1, -(-n_rows // max(1, target_rows_per_bucket)))
    bits = (needed - 1).bit_length()  # ceil(log2(needed)), 0 for 1
    return min(_SHUFFLE_MAX_BITS, max(_SHUFFLE_MIN_BITS, bits))


def shuffle_rank(df: DataFrame, id_col: str = "doc_id",
                 seed: int = 0, bucket_bits: int | None = None,
                 target_rows_per_bucket: int = 4_000_000) -> DataFrame:
    """Deterministic GLOBAL shuffle order for training-data export: the
    final step of every LLM pipeline is a corpus-wide permutation so
    adjacent training batches decorrelate, and a seeded hash sort is
    the distributed-stable way to get one — xxhash64(id, seed) is the
    sort key, so the permutation is a pure function of (ids, seed):
    re-runs, retries and different partitionings all produce the SAME
    order, and changing the seed reshuffles.

    Returns the input plus a dense 1-based ``shuffle_rank``.  The rank
    needs a total order, which costs one RANGE exchange (sort on the
    hash) — unavoidable for a materialized global permutation, and
    exactly the exchange the subsequent ordered write would pay
    anyway.  Hash ties (two ids hashing equal) break on the id itself,
    keeping the order total and reproducible.

    At export time most callers skip the rank and just
    ``df.repartitionByRange/sortWithinPartitions`` on the same key —
    this operator exists so the ORDER ITSELF is a value-checkable
    artifact (the driver hashes (id, rank) pairs against a replica).

    Shape: a bare ``row_number() OVER (ORDER BY hash)`` would move the
    whole corpus into ONE window partition (the classic single-task
    sort).  Instead the hash's top ``bucket_bits`` bits become a RANGE
    bucket (arithmetic shiftright is monotone over the signed key, so
    bucket asc + within-bucket key asc IS the global order), ranks are
    computed per bucket, and an exclusive-cumsum offset table — one
    tiny collected aggregate, broadcast back — lifts them to global
    ranks.  One corpus exchange on the bucket, 2^bucket_bits balanced
    sort tasks.

    ``bucket_bits`` SCALES WITH THE DATA: by default the counting job
    (always at 16-bit grain, a <=65,536-row collect regardless of
    corpus size) also yields the row count, and the bucket width is
    derived so each sort task holds ~``target_rows_per_bucket`` rows —
    a 10^12-row corpus sorts across 65,536 tasks, not a fixed 256.
    Coarser grains are bit-prefixes of the 16-bit grain, so the merge
    is driver-side arithmetic on the already-collected counts.

    The counts and the ranking are two Spark jobs over the same input
    plan; if a nondeterministic source shifts between them, a bucket
    absent from the offset table fails LOUDLY (raise_error) instead of
    silently emitting NULL ranks.  Callers with nondeterministic inputs
    should persist upstream first.
    """
    from pyspark.sql import Window

    if bucket_bits is not None and not (
            _SHUFFLE_MIN_BITS <= bucket_bits <= _SHUFFLE_MAX_BITS):
        raise ValueError(
            f"bucket_bits must be in [{_SHUFFLE_MIN_BITS}, "
            f"{_SHUFFLE_MAX_BITS}], got {bucket_bits}")
    # seed rides as LONG: xxhash64's int32 path hashes differently
    # than int64 (the pack_sequences lesson), and the pure-Python
    # replica folds 64-bit values
    key = F.xxhash64(F.col(id_col), F.lit(seed).cast("long"))
    fine = F.shiftright(key, 64 - _SHUFFLE_MAX_BITS).cast("int")
    fine_counts = {
        r["b"]: r["n"]
        for r in df.select(fine.alias("b"))
        .groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    bits = (bucket_bits if bucket_bits is not None
            else _shuffle_bucket_bits(sum(fine_counts.values()),
                                      target_rows_per_bucket))
    counts: dict[int, int] = {}
    for b16, n in fine_counts.items():
        counts[b16 >> (_SHUFFLE_MAX_BITS - bits)] = counts.get(
            b16 >> (_SHUFFLE_MAX_BITS - bits), 0) + n
    # offsets and the within-bucket rank add in LONG: a corpus past
    # 2^31 rows (the operator's stated scale) would overflow an int32
    # sum before any after-the-fact cast could save it
    offsets: list[tuple[int, int]] = []
    acc = 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        offsets, schema="_sbucket int, _soff long")
    bucket = F.shiftright(key, 64 - bits).cast("int")
    w = (
        Window.partitionBy("_sbucket")
        .orderBy(F.col("_skey").asc(), F.col(id_col).asc())
    )
    lifted = F.when(
        F.col("_soff").isNull(),
        F.raise_error(F.concat(
            F.lit("shuffle_rank: bucket "), F.col("_sbucket").cast("string"),
            F.lit(" missing from offset table — input changed between "
                  "the counting and ranking jobs; persist the input"))),
    ).otherwise(F.row_number().over(w).cast("long") + F.col("_soff"))
    return (
        df.withColumn("_skey", key)
        .withColumn("_sbucket", bucket)
        .join(F.broadcast(off_df), "_sbucket", "left")
        .withColumn("shuffle_rank", lifted)
        .drop("_skey", "_sbucket", "_soff")
    )
