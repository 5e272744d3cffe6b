"""Deduplication operators for large-scale training-data pipelines.

All hashing is the cross-engine-deterministic md5-based ``hash64``
(functions/hashing.py) so every operator here has an exact DuckDB oracle.

Design rule: **shingle sets live as per-document arrays** and all
per-document computation (signatures, simhash bits, set sizes) happens with
higher-order functions inside whole-stage codegen — zero shuffle until data
must actually meet across documents. Exploded (doc, shingle) rows exist only
where a cross-document join genuinely needs them (the exact inverted-index
path). This cut the minhash pipeline from ~8 shuffles to 3.

Scale notes (the 100 TB story, per operator):
- ``exact_dedup``: one hash-agg keyed by the fingerprint — single shuffle,
  duplicates collapse map-side.
- ``minhash_signatures``: narrow map (array ops only) — embarrassingly
  parallel, NO shuffle at all.
- ``minhash_lsh_pairs``: shuffles are (1) the band-key self-join (B rows
  per doc), (2) candidate distinct, (3) attaching the two shingle arrays to
  verify Jaccard. Hot band-buckets (boilerplate docs) are the skew risk —
  AQE skew-join splits them; production would also cap bucket size.
- ``ngram_jaccard_pairs``: exact all-pairs via inverted index — quadratic
  per shared shingle; verification path, not the scale path.
- ``simhash``: narrow map like minhash_signatures (fold per bit over the
  hashed-shingle array), then one shuffle only to size signature groups.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_etl_consumer_spark.functions.hashing import (
    MINHASH_PRIME,
    hash64,
    minhash_coeffs,
)
from kafka_etl_consumer_spark.functions.text import tokens, word_shingles

# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group rows by content fingerprint; keep min(id) as the canonical doc.

    Returns (fingerprint, keeper_id, n_copies) — the collapse the caller
    joins back to drop duplicates while keeping lineage countable."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(f"keeper_{id_col}"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# shingle arrays (shared base of minhash / jaccard / simhash)
# ---------------------------------------------------------------------------


def shingle_arrays(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, sh: array<string>) — the DISTINCT k-word shingles per doc as an
    array. ``array_distinct`` replaces a global distinct-shuffle with a
    per-row op; docs with no shingles (< k tokens) are dropped, matching
    the SQL oracles where unnest of an empty list yields no rows."""
    from kafka_etl_consumer_spark.session import ensure_min_parallelism

    # Materialize the token array through a Generate barrier BEFORE the
    # shingle transform references it: word_shingles refers to its input
    # several times (and inside a lambda), and Catalyst would otherwise
    # inline the regex-split per reference — O(tokens²) splits per doc
    # (measured ~15x wall-clock on this exact pipeline).
    toks = ensure_min_parallelism(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(F.array(tokens(text_col))).alias("__toks")
    )
    return toks.select(
        F.col(id_col),
        F.array_distinct(word_shingles(F.col("__toks"), k)).alias("sh"),
    ).filter(F.size("sh") > 0)


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Exploded distinct (id, shingle) rows — only for inverted-index paths."""
    return shingle_arrays(df, text_col, id_col, k).select(
        id_col, F.explode("sh").alias("shingle")
    )


def _with_hashed_shingles(arrays: DataFrame, mod_prime: bool) -> DataFrame:
    """Append ``__hs``: array<bigint> of hash64(shingle) (optionally mod
    MINHASH_PRIME) — wrapped in ``explode(array(...))`` so the Generate node
    MATERIALIZES the hashed array once. A plain withColumn/select would be
    CollapseProject-ed into every downstream signature expression and the
    md5 transform recomputed once per hash function (measured 2-8x blowup)."""
    hs = F.transform(
        F.col("sh"),
        (lambda s: hash64(s) % MINHASH_PRIME) if mod_prime else (lambda s: hash64(s)),
    )
    return arrays.select(
        "*", F.explode(F.array(hs)).alias("__hs")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 24,
    use_arrow: bool = False,
    arrays: DataFrame | None = None,
) -> DataFrame:
    """Per-doc MinHash signature: sig_h = min over shingles of
    ((hash64(shingle) % P) * a_h + b_h) % P.

    ONE md5 per shingle (JVM-side), then H affine rehashes — entirely
    codegen by default (array_min over transform vectorizes well; measured
    NO win from the numpy fold inside the full LSH pipeline, where the
    Arrow hop breaks codegen pipelining into the band stage, so JVM stays
    the default per the UDFs-are-fallback rule). ``use_arrow=True`` runs
    the rehash as one (n_shingles × H) numpy broadcast per batch — for
    standalone signature jobs. No overflow either way: operands < P=2³¹-1
    keep products < 2⁶². Narrow map — no explode, no shuffle.

    ``arrays``: precomputed :func:`shingle_arrays` output to derive from —
    pass a CACHED one when the caller also needs the arrays (LSH verify
    stage), so the tokenize/shingle pipeline runs once, not per consumer.
    """
    base = _with_hashed_shingles(
        arrays if arrays is not None else shingle_arrays(df, text_col, id_col, k),
        mod_prime=True,
    )
    coeffs = minhash_coeffs(num_hashes)
    if not use_arrow:
        sigs = [
            F.array_min(
                F.transform("__hs", lambda x: (x * F.lit(a) + F.lit(b)) % MINHASH_PRIME)
            ).alias(f"sig_{h}")
            for h, (a, b) in enumerate(coeffs)
        ]
        return base.select(F.col(id_col), *sigs)

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    a_vec = np.array([a for a, _ in coeffs], dtype=np.int64)
    b_vec = np.array([b for _, b in coeffs], dtype=np.int64)
    schema = T.StructType(
        [T.StructField(id_col, T.LongType())]
        + [T.StructField(f"sig_{h}", T.LongType()) for h in range(num_hashes)]
    )

    def fold(batches):
        for pdf in batches:
            sigs = np.empty((len(pdf), num_hashes), dtype=np.int64)
            for i, hs in enumerate(pdf["__hs"]):
                h = np.asarray(hs, dtype=np.int64)
                sigs[i] = ((h[:, None] * a_vec + b_vec) % MINHASH_PRIME).min(axis=0)
            out = pd.DataFrame(sigs, columns=[f"sig_{h}" for h in range(num_hashes)])
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return base.select(id_col, "__hs").mapInPandas(fold, schema)


def band_keys(
    signatures: DataFrame, id_col: str = "doc_id", bands: int = 8, rows_per_band: int = 3
) -> DataFrame:
    """Signature → (id, band, band_key) where band_key = md5 of the
    comma-joined band slice (cross-engine reproducible). One posexplode,
    not a B-way union (which would recompute the signatures B times)."""
    keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"sig_{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                    F.lit(str(b)),
                )
            )
            for b in range(bands)
        ]
    )
    return signatures.select(
        F.col(id_col), F.posexplode(keys).alias("band", "band_key")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 24,
    bands: int = 8,
    rows_per_band: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    share_shingles: bool = True,
) -> DataFrame:
    """Candidate pairs via LSH banding, verified with exact Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    With (24, 8, 3): P(candidate) ≈ 1-(1-j³)⁸ — ~0.997 at j=0.8, ~0.66 at
    j=0.5, while random pairs (j≈0.01) collide with P≈8e-6.

    Candidates come from ONE groupBy on band_key with in-bucket pair
    expansion in codegen (upper triangle of the sorted id array) — one
    shuffle instead of the band self-join's two, and ``max_bucket`` hard-caps
    pathological buckets (boilerplate text hashing thousands of docs into
    one band would otherwise go quadratic; capping keeps the smallest
    ``max_bucket`` ids — deterministic — and is the standard recall/cost
    trade at 100 TB).

    Verification attaches the two shingle ARRAYS to each candidate pair and
    intersects them in codegen (array_intersect) — no exploded join.

    The shingle pipeline appears three times in the plan (signatures +
    both verify sides). ``share_shingles=True`` (default since
    optimization r11) materializes it ONCE with an eager localCheckpoint
    and lets all three branches read the flat arrays: the r8 A/B used
    ``.cache()`` (7s materialization into the LRU storage region, zero
    win), but the checkpoint form re-measured FASTER at 32 cores
    (alternating min-of-5 at sf0.1: 2.37 s recompute vs 2.01 s shared,
    and 2.03 vs 1.77 in a second window — the 3x recompute stops being
    free once the cores are busy). ``share_shingles=False`` restores the
    pure-lazy plan for single-pass callers. Callers with a PERSISTED
    corpus index pass ``arrays=`` to :func:`minhash_signatures`
    instead."""
    assert num_hashes == bands * rows_per_band
    sh = shingle_arrays(df, text_col, id_col, k)
    if share_shingles:
        sh = sh.localCheckpoint(eager=True)
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes, arrays=sh)
    bk = band_keys(sig, id_col, bands, rows_per_band)

    grp = (
        bk.groupBy("band_key")
        .agg(F.slice(F.array_sort(F.collect_list(id_col)), 1, max_bucket).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        grp.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), "
                    "y -> struct(x AS id_a, y AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )

    sa = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("__sa"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size("__sa") + F.size("__sb") - inter
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", (inter.cast("double") / union).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard via the inverted index (join on
    shingle). Ground truth for LSH recall; not the 100 TB path."""
    arrays = shingle_arrays(df, text_col, id_col, k)
    sh = arrays.select(id_col, F.explode("sh").alias("shingle"))
    sizes = arrays.select(F.col(id_col), F.size("sh").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    bits: int = 32,
    use_arrow: bool = True,
) -> DataFrame:
    """Per-doc SimHash over k-word shingles: bit b is 1 iff
    sum over shingles of (±1 by hash bit b) > 0.

    Hash each shingle once into an array (JVM-side md5), then fold the
    bits. Default fold is one numpy broadcast per Arrow batch
    ((n_shingles × bits) sign matrix, measured 2.3× the per-bit
    expression-eval fold); use_arrow=False keeps the pure-JVM variant.
    Either way a narrow map — no explode, no shuffle."""
    base = _with_hashed_shingles(shingle_arrays(df, text_col, id_col, k), mod_prime=False)
    if use_arrow:
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        schema = T.StructType(
            [T.StructField(id_col, T.LongType()), T.StructField("simhash", T.LongType())]
        )
        weights = np.arange(bits)

        def fold(batches):
            for pdf in batches:
                out = []
                for hs in pdf["__hs"]:
                    h = np.asarray(hs, dtype=np.int64)
                    signs = ((h[:, None] >> weights) & 1) * 2 - 1
                    s = signs.sum(axis=0)
                    out.append(int(((s > 0).astype(np.int64) << weights).sum()))
                yield pd.DataFrame({id_col: pdf[id_col].values, "simhash": out})

        return base.select(id_col, "__hs").mapInPandas(fold, schema)

    bit_sums = [
        F.aggregate(
            "__hs",
            F.lit(0),
            lambda acc, x: acc
            + F.when(F.shiftright(x, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        ).alias(f"__s{b}")
        for b in range(bits)
    ]
    per_bit = base.select(F.col(id_col), *bit_sums)
    sig = reduce(
        add,
        [
            F.when(F.col(f"__s{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
            for b in range(bits)
        ],
    )
    return per_bit.select(F.col(id_col), sig.alias("simhash"))


def canonical_pick(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 12,
    loop_partitions: int | None = None,
) -> DataFrame:
    """(id, component_id, n_members, is_canonical) — turn near-duplicate
    PAIRS into dedup DECISIONS: cluster the pair graph into components
    (large-star/small-star contraction, operators/graph.py) and mark
    exactly one keeper per component — the member with the highest
    ``quality_col`` (ties broken by the smallest id, so the pick is
    deterministic and SQL-reproducible).

    This is the step that actually shrinks a corpus: `dedup_minhash` et al.
    emit evidence (pairs); this emits the verdict (keep/drop per document).
    Filter ``is_canonical`` to get the deduplicated corpus.

    Scale shape: components state is the pair-graph edge set (linear);
    the final pick is ONE window over component_id — rank<=1 plans as
    WindowGroupLimit, so each map task pre-prunes to one candidate per
    component before the shuffle. connected_components converges in
    O(log²) star-contraction rounds with an exact per-round fixpoint
    probe, so ``max_iter`` is a safety cap, not the executed count (the
    sf0.1 doc pair graph stops at round 2 of 12); ``loop_partitions=None``
    sizes the contraction loop's shuffle width from the edge count.
    """
    from kafka_etl_consumer_spark.operators.graph import connected_components

    comp = connected_components(
        pairs,
        docs.select(id_col),
        id_col=id_col,
        src=src,
        dst=dst,
        max_iter=max_iter,
        loop_partitions=loop_partitions,
    )
    joined = docs.select(id_col, quality_col).join(comp, id_col)
    w_pick = Window.partitionBy("component_id").orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    w_size = Window.partitionBy("component_id")
    return (
        joined.withColumn("__rn", F.row_number().over(w_pick))
        .select(
            F.col(id_col),
            F.col("component_id"),
            F.count("*").over(w_size).alias("n_members"),
            (F.col("__rn") == 1).alias("is_canonical"),
        )
    )


def minhash_lsh_matches_against(
    new: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 24,
    bands: int = 8,
    rows_per_band: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    share_shingles: bool = True,
) -> DataFrame:
    """(new_id, old_id, jaccard) — near-dup matches of a NEW batch against
    an EXISTING corpus (the incremental form of ``minhash_lsh_pairs``: no
    new×new or old×old pairs, only cross-set).

    ``max_bucket`` caps the CORPUS side of each band bucket (smallest ids
    kept — deterministic), the same hot-bucket guard as
    ``minhash_lsh_pairs``: boilerplate text hashing thousands of corpus
    docs into one band would otherwise make that band's join quadratic.
    A capped bucket can only miss EXTRA duplicate evidence — a batch doc
    landing there still matches the capped members.

    This is how dedup actually runs in a live pipeline: the corpus was
    deduplicated once; each arriving batch only needs checking against the
    corpus index plus itself — never a full recompute.

    Scale shape: at 100 TB the corpus's (id, band_key) index and shingle
    arrays are computed ONCE and persisted (bucketed by band_key); each
    batch then recomputes only its own signatures — corpus-side cost is a
    bucket-pruned join, and the batch side (small) broadcasts. Here both
    sides derive in-plan; the join/verify stages are identical either way.
    """
    assert num_hashes == bands * rows_per_band
    # one shingle pipeline per side, shared by its signature and verify
    # stages — materialized once each by default (share_shingles), the
    # same r11 A/B outcome as minhash_lsh_pairs: the 2x recompute only
    # looked free while cores were idle
    sh_new = shingle_arrays(new, text_col, id_col, k)
    sh_old = shingle_arrays(corpus, text_col, id_col, k)
    if share_shingles:
        sh_new = sh_new.localCheckpoint(eager=True)
        sh_old = sh_old.localCheckpoint(eager=True)
    bk_new = band_keys(
        minhash_signatures(new, text_col, id_col, k, num_hashes, arrays=sh_new),
        id_col, bands, rows_per_band,
    ).select(F.col(id_col).alias("new_id"), "band_key")
    bk_old = (
        band_keys(
            minhash_signatures(corpus, text_col, id_col, k, num_hashes, arrays=sh_old),
            id_col, bands, rows_per_band,
        )
        .groupBy("band_key")
        .agg(F.slice(F.array_sort(F.collect_list(id_col)), 1, max_bucket).alias("ids"))
        .select("band_key", F.explode("ids").alias("old_id"))
    )
    cand = bk_new.join(bk_old, "band_key").select("new_id", "old_id").distinct()

    sa = sh_new.select(F.col(id_col).alias("new_id"), F.col("sh").alias("__sa"))
    sb = sh_old.select(F.col(id_col).alias("old_id"), F.col("sh").alias("__sb"))
    inter = F.size(F.array_intersect("__sa", "__sb"))
    union = F.size("__sa") + F.size("__sb") - inter
    return (
        cand.join(sa, "new_id")
        .join(sb, "old_id")
        .select("new_id", "old_id", (inter.cast("double") / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def remove_duplicate_spans(
    df: DataFrame,
    k: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level exact dedup: cut every word k-gram that occurs >= ``min_count``
    times corpus-wide OUT of every document (the n-gram form of exact-substring
    dedup a la Lee et al. 2022, which uses a suffix array over characters; the
    word-k-gram approximation keeps the whole pass in Spark built-ins).

    A duplicated k-gram starting at token position s covers positions
    s..s+k-1; a token survives iff no duplicated gram covers it. Unlike
    document-level dedup (``exact_dedup``/``minhash_lsh_pairs``), this removes
    boilerplate *inside* otherwise-unique documents — headers, license
    blocks, navigation chrome — the single largest source of verbatim
    repetition in web-scraped training data.

    Returns (id, n_tokens, n_removed, clean_fp) where clean_fp = md5 of the
    cleaned (space-rejoined) text — the fingerprint keeps the driver-hashed
    output small while still pinning the exact surviving-token sequence.

    Scale shape (100 TB): tokenize+gram is a narrow map. Three shuffles:
    (1) gram-frequency hash-agg — partial counts collapse map-side, carries
    one (hash64, count) row per DISTINCT gram; (2) occurrence->dup-gram join
    keyed on the 8-byte gram hash (AQE broadcasts the dup set when small —
    typical: boilerplate is a tiny fraction of distinct grams); (3) the
    per-doc dup-start collect + join back to the token arrays, both keyed by
    id and co-partitioned with the initial repartition, which Catalyst
    reuses. The reference has no text surface at all (pass-through ETL,
    ETLTask.java:261-283).
    """
    if k < 2:
        raise ValueError("need k >= 2")
    from kafka_etl_consumer_spark.session import ensure_min_parallelism

    width = df.sparkSession.sparkContext.defaultParallelism
    docs = (
        ensure_min_parallelism(df)
        .repartition(width, id_col)
        .select(id_col, tokens(text_col).alias("__toks"))
    )
    # occurrences: (id, 1-based gram start, 60-bit gram hash)
    occ = docs.select(
        F.col(id_col),
        F.posexplode(word_shingles("__toks", k)).alias("__p0", "__g"),
    ).select(
        F.col(id_col),
        (F.col("__p0") + 1).alias("__start"),
        hash64(F.col("__g")).alias("__gh"),
    )
    dup = occ.groupBy("__gh").count().filter(F.col("count") >= min_count).select("__gh")
    dup_starts = (
        occ.join(dup, "__gh")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("__start")).alias("__dups"))
    )
    joined = docs.join(dup_starts, id_col, "left")
    dups = F.coalesce(F.col("__dups"), F.array().cast("array<int>"))
    # token at 0-based index i survives iff no dup start s covers it
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(dups, lambda s: (s <= i + 1) & (i + 1 <= s + (k - 1))),
    )
    return joined.select(
        F.col(id_col),
        F.size("__toks").cast("bigint").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).cast("bigint").alias("n_removed"),
        F.md5(F.concat_ws(" ", kept)).alias("clean_fp"),
    )


def set_similarity_join_prefix(
    df: DataFrame,
    threshold_num: int,
    threshold_den: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT Jaccard self-join over distinct-token sets via PREFIX
    FILTERING (the PPJoin family, Xiao et al. 2008) — the scale path for
    exact set-similarity joins, complementing the probabilistic MinHash
    pipeline (:func:`minhash_lsh_pairs`) and the all-pairs verifier
    (:func:`ngram_jaccard_pairs`).

    Returns (id_a, id_b, jac) with jac rounded to 6, id_a < id_b,
    jac >= threshold. The threshold is a RATIONAL (num/den) so the
    prefix-length bound ``min_overlap = ceil(t*n)`` is computed in exact
    integer arithmetic — ``ceil(0.5 * n)`` in doubles rounds 3.0000…04 up
    and silently SHRINKS the prefix, which breaks the completeness
    guarantee; ``(num*n + den - 1) div den`` cannot.

    Why this scales where all-pairs doesn't: tokens are globally ordered
    rarest-first (df asc, token asc); a document only emits postings for
    its first ``n - ceil(t*n) + 1`` tokens, and the prefix-filtering lemma
    guarantees every pair with jac >= t shares at least one PREFIX token
    — so the candidate join touches the rare end of the vocabulary, and a
    stopword shared by half the corpus generates no candidates at all
    (it is never in anyone's prefix). Candidates then verify with ONE
    codegen ``array_intersect`` against the full sorted token arrays.
    Shuffles: token-df agg, per-doc rank window, prefix equi-join,
    pair distinct — all key-bounded; nothing is |docs|² unless the data
    genuinely is one near-dup class.
    """
    post = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
        .distinct()
        .cache()
    )
    sizes = post.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"))
    dfreq = post.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    ranked = (
        post.join(dfreq, "__t")
        .join(sizes, id_col)
        .withColumn(
            "__pos",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("__df", "__t")
            ),
        )
    )
    # min_overlap = ceil(num*n/den), exact; prefix keeps pos <= n - min_ov + 1
    min_ov = F.floor(
        (F.lit(threshold_num) * F.col("__n") + (threshold_den - 1))
        / threshold_den
    )
    prefix = ranked.filter(F.col("__pos") <= F.col("__n") - min_ov + 1).select(
        F.col(id_col), F.col("__t")
    )
    cand = (
        prefix.select(F.col(id_col).alias("id_a"), "__t")
        .join(prefix.select(F.col(id_col).alias("id_b"), "__t"), "__t")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    arrays = post.groupBy(id_col).agg(
        F.array_sort(F.collect_list("__t")).alias("__ts")
    )
    verified = (
        cand.join(
            arrays.select(F.col(id_col).alias("id_a"), F.col("__ts").alias("__ta")),
            "id_a",
        )
        .join(
            arrays.select(F.col(id_col).alias("id_b"), F.col("__ts").alias("__tb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__ta", "__tb")).alias("__o"),
            F.size("__ta").alias("__na"),
            F.size("__tb").alias("__nb"),
        )
        # Threshold test in exact integers so thresholds not representable on
        # the rounded-decimal grid (e.g. 1/3) never drop boundary pairs:
        # o/(na+nb-o) >= num/den  <=>  o*(num+den) >= num*(na+nb).
        .filter(
            F.col("__o") * (threshold_num + threshold_den)
            >= F.lit(threshold_num) * (F.col("__na") + F.col("__nb"))
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__o").cast("double")
                / (F.col("__na") + F.col("__nb") - F.col("__o")),
                6,
            ).alias("jac"),
        )
    )
    return verified
