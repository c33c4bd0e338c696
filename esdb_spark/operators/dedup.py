"""Deduplication operators for large-scale training-data pipelines.

Five flavors, each a DataFrame→DataFrame function designed for the
100 TB regime:

- :func:`dedup_exact` — content-hash groupBy. The shuffle key is a
  128-bit hash, never the document body, so shuffle volume is O(rows),
  not O(bytes).
- :func:`minhash_signatures` / :func:`dedup_minhash_lsh` — shingle →
  minhash → banded LSH → bucket self-join. All JVM expressions
  (xxhash64 with per-permutation salt); candidate generation touches
  only (id, band_hash) pairs so the self-join shuffles tiny rows.
- :func:`dedup_simhash` — 64-bit simhash via per-bit vote aggregation,
  hamming candidates by chunk-equality blocking + ``bit_count(xor)``.
- :func:`ngram_jaccard_pairs` — exact n-gram Jaccard via an inverted
  shingle index self-join (the verifiable oracle for the approximate
  methods).
- :func:`dedup_embedding_cosine` — near-dup by embedding cosine,
  brute-force for moderate corpora, hyperplane-LSH blocked at scale
  (see operators/similarity.py for the shared primitives).
- :func:`dup_clusters` / :func:`dedup_by_cluster` — connected
  components over any pair list (min-label propagation) and the
  keep-one-representative-per-component dedup built on it.

No reference-parity citation: the reference (customerio/esdb) has no
dedup surface; these follow the standard MinHash/SimHash literature
(Broder 1997; Charikar 2002) as directed by the project north star.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window, functions as F

from esdb_spark.functions import tokens, word_shingles


def _spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition compute-heavy inputs that arrive under-parallelized
    (e.g. one small parquet file → 1 partition → 1 core does all the
    hashing). Only widens: at scale the input already has ≥ cores
    partitions and this is a no-op, so no gratuitous shuffle of text."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(
    df: DataFrame, subset: list[str], order_col=None
) -> DataFrame:
    """Keep one row per distinct value of ``subset`` columns.

    Deterministic keeper: the row smallest under ``order_col`` (a
    column name or list of names — required for reproducible pipelines;
    plain ``dropDuplicates`` keeps an arbitrary row). Rows are compared
    by md5 of the JSON-encoded subset struct — 128 bits, so collisions
    are ignorable at any corpus size — and the shuffle carries the
    hash, not the (possibly huge) text. JSON encoding (not plain
    concatenation) keeps NULL vs non-NULL and column boundaries
    unambiguous: ("x", NULL) ≠ (NULL, "x") and ("a|b","c") ≠ ("a","b|c").
    """
    fp = F.md5(F.to_json(F.struct(*[F.col(c) for c in subset])))
    if order_col is None:
        return df.dropDuplicates(subset)
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(fp).orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 128,
    shingle_size: int = 3,
    portable: bool = False,
) -> DataFrame:
    """(id, sig array<bigint>) — one minhash per permutation.

    Permutation k is simulated by ``xxhash64(shingle, k)``; the min is
    taken per document with ``array_min(transform(...))`` over the
    distinct shingle array — no explode, no shuffle: signatures are
    computed in a single projection over the scan.

    ``portable=True`` swaps the xxhash64 mix family for md5-derived
    60-bit hashes (``conv(substring(md5('k:' || shingle), 1, 15), 16,
    10)``) that DuckDB reproduces bit-identically via
    ``CAST(concat('0x', substring(md5(...), 1, 15)) AS BIGINT)`` — the
    same engine-portability recipe as ``functions.weighted_sample_k``.
    md5 is ~4× the cost of the xor-rotate family, so the portable path
    exists for oracle-checkable correctness gating; production dedup
    uses the default family.
    """
    # Shape chosen for codegen: explode shingles → hash each string once
    # → 128 plain `min(xxhash64(base, k))` aggregates. Spark's
    # higher-order functions (aggregate/zip_with) are interpreted, so a
    # fold carrying a 128-array re-allocates per element (measured ~2 ms
    # per doc); flat aggregates stay in whole-stage codegen with
    # map-side partial aggregation, so the shuffle carries one partial
    # signature per (id, partition), not the shingles.
    #
    # Duplicates need no dedup: min over a multiset equals min over the
    # set, so array_distinct is skipped. Documents with no shingles
    # (empty text) produce no signature row and thus no pairs — they
    # are never flagged as duplicates.
    sh = word_shingles(tokens(text_col), shingle_size)
    df = _spread_small_input(df)
    shingled = (
        # empty/whitespace-only docs carry no content signal; exclude
        # them so they never pair with each other (word_shingles would
        # otherwise give them all the identical "" shingle). Exact
        # dedup is the right tool for empty docs.
        df.filter(F.size(tokens(text_col)) > 0)
        .select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
    )
    if portable:
        # one md5 per (shingle, permutation): 60-bit non-negative
        # bigints, reproducible in any engine with md5 + hex→int
        def pmix(k: int) -> str:
            return (
                "min(cast(conv(substring("
                f"md5(concat('{k}:', shingle)), 1, 15), 16, 10) as bigint))"
            )

        arr = ", ".join(pmix(k) for k in range(num_hashes))
        return shingled.groupBy("id").agg(F.expr(f"array({arr})").alias("sig"))
    base = (
        shingled
        # two independent 64-bit hashes per shingle; permutation k is
        # their xor-rotate mix (below), not a fresh xxhash64 — hashing
        # the shingle 128 times was the hot loop (measured 82 s of a
        # 100 s run on 100k ~300-word docs; the mix family brings the
        # whole signature pass to ~8 s). Bitwise ops are also ANSI-safe,
        # unlike the classic (h1 + k*h2) mod family, whose multiply
        # overflows raise under spark.sql.ansi.enabled.
        .select(
            "id",
            F.xxhash64("shingle").alias("h1"),
            F.xxhash64("shingle", F.lit(1)).alias("h2"),
        )
    )

    # One expr string, one parse: building 128 aggregate Columns
    # call-by-call from Python costs ~1s of py4j/plan-construction
    # latency per query (measured) — a single array(...) aggregate
    # expression is parsed JVM-side in one hop and produces the same
    # codegen'd plan.
    if num_hashes > 4096:
        # the xor-rotate family below yields 64 x 64 distinct rotation
        # pairs; beyond that mix(k) repeats and duplicated positions
        # would silently bias Jaccard estimates upward
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the 4096 distinct "
            "permutations of the two-hash rotation family"
        )

    def rot(h: str, r: int) -> str:
        return (
            h
            if r == 0
            else f"(shiftleft({h}, {r}) | shiftrightunsigned({h}, {64 - r}))"
        )

    def mix(k: int) -> str:
        # permutation k = rotl(h1, r1) ^ rotl(h2, r2): within a 64-block
        # stride 13 (coprime to 64) bijects k -> r2; across blocks
        # stride 11 bijects block -> r1 — all (r1, r2) pairs distinct up
        # to 64*64 = 4096 permutations
        r2 = (13 * k + 7) % 64
        r1 = (11 * (k // 64)) % 64
        return f"min({rot('h1', r1)} ^ {rot('h2', r2)})"

    arr = ", ".join(mix(k) for k in range(num_hashes))
    return base.groupBy("id").agg(F.expr(f"array({arr})").alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 32,
    num_hashes: int | None = None,
    portable: bool = False,
    broadcast: bool = False,
) -> DataFrame:
    """Banded LSH: documents agreeing on any full band become a
    candidate pair (id_a < id_b). Only (id, band, hash) triples shuffle.

    ``num_hashes`` (the signature length) keeps the plan data-independent;
    when omitted it is probed from the first row (requires non-empty input).

    ``broadcast=True`` broadcasts one side of the band self-join — for
    callers that KNOW the corpus is small (checkpointed signatures have
    no size stats, so Catalyst would sort-merge even a few thousand
    docs). At scale leave False: the banded triples are bands× the
    corpus row count.
    """
    if num_hashes is None:
        first = signatures.select(F.size("sig")).first()
        if first is None:  # empty corpus → no pairs, same id type as input
            return signatures.select(
                F.col("id").alias("id_a"), F.col("id").alias("id_b")
            ).limit(0)
        num_hashes = first[0]
    banded = _banded(signatures, bands, num_hashes, portable=portable)
    left = banded.alias("l")
    right = banded.alias("r")
    if broadcast:
        right = F.broadcast(right)
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )


def _banded(
    signatures: DataFrame, bands: int, num_hashes: int, portable: bool = False
) -> DataFrame:
    """(id, sig, band, bhash): one row per (document, band), bhash =
    xxhash64 over the band's signature slice. Built as a single expr
    string (one parser hop) — the per-band Column-object version spent
    ~0.5 s per query in py4j plan construction.

    ``portable=True`` makes bhash the 15-hex-char md5 prefix (string)
    of the comma-joined slice — matched in DuckDB by
    ``substring(md5(string_agg(h, ',' ORDER BY k)), 1, 15)``."""
    if not 1 <= bands <= num_hashes:
        raise ValueError(
            f"_banded: bands={bands} must be in [1, num_hashes={num_hashes}]"
            " — bands > num_hashes makes every band hash a CONSTANT and"
            " the self-join quadratic"
        )
    if num_hashes % bands != 0:
        raise ValueError(
            f"_banded: bands={bands} must divide num_hashes={num_hashes}"
            " — truncation would silently ignore signature positions"
        )
    rows_per_band = num_hashes // bands

    def bhash(vals: str) -> str:
        if portable:
            return f"substring(md5(concat_ws(',', {vals})), 1, 15)"
        return f"xxhash64(concat_ws(',', {vals}))"

    items = ", ".join(
        "named_struct('band', {b}, 'bhash', {bh})".format(
            b=b,
            bh=bhash(
                ", ".join(
                    f"cast(sig[{i}] as string)"
                    for i in range(
                        b * rows_per_band, (b + 1) * rows_per_band
                    )
                )
            ),
        )
        for b in range(bands)
    )
    return signatures.select(
        "id", "sig", F.explode(F.expr(f"array({items})")).alias("bb")
    ).select("id", "sig", "bb.band", "bb.bhash")


def minhash_jaccard_estimate(
    signatures: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of agreeing
    minhash positions."""
    sig_a = signatures.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = signatures.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    agree = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        pairs.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (agree / F.size("sig_a")).alias("est_jaccard"),
        )
    )


def dedup_minhash_lsh(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_size: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Drop near-duplicates: for every candidate pair above
    ``threshold`` (estimated Jaccard), the larger id is dropped.

    Single-pass keeper rule (smallest id survives), not full transitive
    closure — the standard large-corpus compromise: connected-component
    closure needs iterative joins; one LSH pass already removes the
    overwhelming share of near-dups and is deterministic.

    ``portable=True`` uses the md5 hash family throughout (see
    ``minhash_signatures``), making the whole keep/drop decision
    replayable in DuckDB — the oracle path for the driver gate.
    """
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_size, portable=portable
    )
    # The signature stage feeds both sides of the band self-join AND the
    # estimate joins; materialize it so text is tokenized+hashed once.
    # Signatures are the compressed representation (128 longs per doc
    # ≈ 1 KB), orders of magnitude smaller than the corpus at scale.
    # EAGER (same posture as the jaccard vocabulary probe): lazy, the
    # four downstream branches launch as concurrent stages that each
    # find the cache cold and re-run the whole tokenize+hash+aggregate
    # pass (measured 6× wall-clock at 5k docs). localCheckpoint
    # (MEMORY_AND_DISK — spills, never OOMs), not persist(): blocks
    # release when the result is garbage-collected instead of
    # accumulating in the cache manager across composed invocations
    # (the round-3 leak class). Trade-off: severed lineage means an
    # executor lost mid-query fails the job instead of recomputing —
    # recompute here would be CORRECT (minhash is deterministic), just
    # slow; accepted for cache hygiene, as with jaccard below.
    sigs = sigs.localCheckpoint(eager=True)
    # Candidates FIRST, estimate second. An earlier revision fused the
    # estimate into the band self-join (zip_with over l.sig/r.sig in
    # the join output) — that forces the banded shuffle to carry the
    # 1 KB sig array on every (doc, band) row: bands× the signature
    # volume per side (measured 6.4 GB shuffled for 100k docs / 32
    # bands vs ~0.3 GB this way, 13.4 s → 3 s for the join stages).
    # Here the self-join shuffles only (id, band, bhash) triples
    # (Catalyst prunes sig — it is unreferenced until after distinct),
    # and the signatures join the deduplicated candidate pairs once
    # per side. The zip_with fold is interpreted, but it only runs on
    # candidate pairs (rare by construction), never the corpus.
    # The checkpointed sigs carry no size stats (LogicalRDD), so the
    # band self-join and the estimate joins would all fall back to
    # sort-merge even at a few thousand docs. The broadcast payload
    # scales with ROW COUNT (~1 KB of signature per doc), not input
    # bytes — a 64 MB parquet of short docs holds millions of rows —
    # so the gate is an exact row count: cheap here because sigs was
    # just eagerly materialized (counting reads the stored blocks).
    # 50k docs ≈ 50 MB sig broadcast / ~38 MB banded triples; above
    # that the shuffling plans ARE the right ones.
    small = sigs.count() <= 50_000
    cand = lsh_candidate_pairs(
        sigs,
        bands=bands,
        num_hashes=num_hashes,
        portable=portable,
        broadcast=small,
    )
    sig_a = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    if small:
        sig_a, sig_b = F.broadcast(sig_a), F.broadcast(sig_b)
    est = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
        f" / {num_hashes}"
    )
    drop_ids = (
        cand.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .filter(est >= threshold)
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    if small:  # drop set ⊆ corpus — same bound as the sig broadcast
        drop_ids = F.broadcast(drop_ids)
    return df.join(
        drop_ids, df[id_col] == drop_ids["id"], "left_anti"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _estimated_input_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for ``df`` (parquet sources: real file
    bytes). Used to gate explicit broadcasts WITHOUT running a count
    job — a checkpointed intermediate loses stats, so the guard reads
    the INPUT's stats instead. Unknown → effectively infinite, which
    degrades to the shuffle plans (safe at any scale)."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return 1 << 62


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash bigint): 64-bit Charikar simhash.

    Per-bit votes: each token hashes to 64 bits; bit b of the simhash is
    1 iff the sum over tokens of (bit set ? +1 : -1) is positive. Bit 63
    is excluded to stay in positive bigint range (sign bit).

    Computed as explode + 63 flat conditional-sum aggregates (codegen'd,
    map-side combined — each mapper emits one 63-long partial per doc).
    The earlier array-fold formulation (``aggregate``/``zip_with`` per
    token) was interpreted per element — bit-identical output, and the
    end-to-end simhash dedup query halved (5.2s → 2.5s at sf0.1); same
    lesson as minhash_signatures and winnow_fingerprints. Tokenless
    docs hash to 0 (empty fold), restored by the left join.
    """
    tok = tokens(text_col)
    ids = df.select(F.col(id_col).alias("id"), tok.alias("_toks"))
    hashed_toks = ids.select(
        "id", F.explode("_toks").alias("_t")
    ).select("id", F.xxhash64("_t").alias("_h"))
    # single expr strings (one parser hop each) — same py4j-latency
    # lesson as minhash_signatures: 63 Column-by-Column aggregates cost
    # ~1 s of plan construction per query
    sums = ", ".join(
        f"sum(if((_h & {1 << b}L) != 0, 1, -1))" for b in range(63)
    )
    votes = hashed_toks.groupBy("id").agg(F.expr(f"array({sums})").alias("_v"))
    sim = F.expr(
        " + ".join(f"if(_v[{b}] > 0, {1 << b}L, 0L)" for b in range(63))
    )
    hashes = votes.select("id", sim.alias("simhash"))
    return ids.select("id").join(hashes, "id", "left").select(
        "id", F.coalesce("simhash", F.lit(0).cast("bigint")).alias("simhash")
    )


def simhash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    chunks: int | None = None,
    broadcast: bool = False,
) -> DataFrame:
    """Pairs within ``max_hamming`` bits. Pigeonhole blocking: split the
    64-bit hash into ``chunks`` pieces; any pair within distance
    ``chunks-1`` agrees on ≥1 full chunk, so the self-join runs per
    chunk on chunk equality, then the exact distance filter
    (``bit_count(a XOR b)``) verifies.

    The pigeonhole guarantee requires ``max_hamming <= chunks - 1``
    (a pair can differ in one bit of EVERY chunk otherwise and never
    co-block). ``chunks=None`` (default) picks the smallest
    power-of-two count that guarantees full recall for the requested
    distance; explicit values that break the guarantee raise instead
    of silently missing pairs. More chunks = fewer bits per block key
    = more candidates to verify, so wide distances cost more.

    ``broadcast=True`` broadcasts one side of the chunk self-join —
    pass it when the caller KNOWS the hash table is small (the
    checkpointed (id, simhash) relation carries no size stats, so
    Catalyst defaults the self-join to sort-merge even for a few
    thousand rows — measured 2.3× on the sf0.1 query). Callers at
    scale leave it False: pieces are chunks× the corpus row count.
    """
    if chunks is None:
        # smallest power-of-two chunk count with guaranteed recall
        chunks = next(
            c for c in (2, 4, 8, 16, 32, 64) if c >= max_hamming + 1
        ) if max_hamming < 64 else 64
    if max_hamming > chunks - 1:
        raise ValueError(
            f"simhash_near_pairs: max_hamming={max_hamming} needs at least "
            f"{max_hamming + 1} chunks (got {chunks}) for full recall — "
            "the pigeonhole blocking only covers distance <= chunks-1"
        )
    width = 64 // chunks
    pieces = hashes.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("piece"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("p"),
    ).select("id", "simhash", "p.chunk", "p.piece")
    l, r = pieces.alias("l"), pieces.alias("r")
    if broadcast:
        r = F.broadcast(r)
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.piece") == F.col("r.piece"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_simhash(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Drop rows whose simhash is within ``max_hamming`` of a
    smaller-id row.

    The (id, simhash) relation is materialized before the chunk
    self-join: without it the 63-aggregate vote pass (a wide codegen'd
    plan over the exploded token stream) executes once per join side.
    It costs 16 bytes/doc — the same signatures-materialized posture
    as minhash — and cut the sf0.1 end-to-end time roughly in half.
    ``localCheckpoint`` rather than ``persist`` so the blocks release
    with the result instead of leaking cache-manager entries (severed
    lineage = executor loss fails the query; recompute would be
    correct, just slow — accepted, as with minhash/jaccard). A
    checkpointed frame carries NO size stats, so the chunk self-join
    downstream would default to sort-merge even for tiny corpora
    (round-4 lesson: LogicalRDD → SMJ against a tiny side); explicit
    broadcasts are gated on the INPUT's free Catalyst size estimate.
    The checkpoint is LAZY (eager would run a separate
    materialization job; lazy fuses it into the consumer's first
    action — the broadcast build computes all partitions, and the
    probe side then reads the stored blocks, exactly the single-pass
    shape the round-4 lazy persist had)."""
    hashes = simhash(df, text_col, id_col).localCheckpoint(eager=False)
    # The broadcast side (exploded pieces) is rows × chunks × ~24 B —
    # row-count-driven, and counting here would force an eager
    # materialization job (defeating the lazy checkpoint). The byte
    # gate is therefore CONSERVATIVE: 16 MB of input parquet is at
    # most ~500k hundred-byte rows even at 3× compression → ≤ ~50 MB
    # of pieces. Bigger inputs take the shuffle plans.
    small = _estimated_input_bytes(df) <= 16 << 20
    pairs = simhash_near_pairs(hashes, max_hamming, broadcast=small)
    drop_ids = pairs.select(F.col("id_b").alias("id")).distinct()
    if small:  # drop set ⊆ corpus — same bound as the chunk broadcast
        drop_ids = F.broadcast(drop_ids)
    return df.join(drop_ids, df[id_col] == drop_ids["id"], "left_anti")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (the verifiable oracle)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_size: int = 3,
    threshold: float = 0.5,
    strategy: str = "auto",
) -> DataFrame:
    """Exact Jaccard over word n-gram sets — adaptive physical plan.

    Two exact strategies, picked by corpus shingle vocabulary:

    - **Bitset join** (vocabulary ≤ 192 shingles corpus-wide): each
      document's set becomes three packed longs; every pair is scored
      with ``bit_count(a & b) / bit_count(a | b)`` inside a broadcast
      nested-loop — pure codegen'd long arithmetic, no candidate
      explosion. A dense low-vocabulary corpus (where every shingle's
      posting list is ~the whole corpus, so no filter can prune) went
      155 s → 14 s on 5k docs with identical output (most of the 14 s
      is materializing the ~7M qualifying pairs this corpus produces).
    - **Inverted-index join** (general case): explode (id, shingle),
      join on shingle to count intersections, union from set sizes —
      O(sum of postings²), the standard exact formulation.

    ``strategy='auto'`` (default) is EAGER at call time: it runs a
    small vocabulary-probe job (≤193 distinct shingles collected to the
    driver — bounded) and materializes the tokenized corpus via
    ``localCheckpoint`` (MEMORY_AND_DISK — spills, never OOMs) because
    both the probe and the returned plan read it. Unlike ``persist()``,
    the checkpoint blocks are released by the ContextCleaner when the
    result is garbage-collected — composing many invocations in one
    session no longer accumulates cache-manager entries (a measured
    leak in round 3). Trade-off: localCheckpoint severs lineage, so an
    executor lost AFTER materialization fails the query instead of
    recomputing — acceptable here because this exact-pairs path is the
    small-corpus verifier (minutes of work to re-run), not the 100 TB
    path. ``strategy='inverted'`` stays fully lazy — no probe job, no
    materialization, no driver work at construction time, full lineage.
    ``strategy='bitset'`` forces the packed-long path (still probes for
    the vocabulary, raises if it exceeds 192 shingles).

    Exact all-pairs is inherently super-linear; at 100 TB use
    MinHash-LSH for candidates and this as the verifier.
    """
    if strategy not in ("auto", "bitset", "inverted"):
        raise ValueError(f"unknown strategy {strategy!r}")
    base = df.select(
        F.col(id_col).alias("id"),
        word_shingles(tokens(text_col), shingle_size).alias("sh"),
    )
    if strategy == "inverted":
        return _jaccard_pairs_inverted(base, threshold)
    base = base.localCheckpoint(eager=True)
    nbits = 192
    vocab = [
        r.s
        for r in base.select(F.explode("sh").alias("s"))
        .distinct()
        .limit(nbits + 1)
        .collect()
    ]
    if strategy == "bitset":
        if not 0 < len(vocab) <= nbits:
            raise ValueError(
                f"bitset strategy needs a 1..{nbits}-shingle vocabulary, "
                f"got {'>192' if vocab else '0'}"
            )
        return _jaccard_pairs_bitset(base, sorted(vocab), threshold)
    # empty corpus → inverted path (it yields an empty result lazily;
    # the bitset path can't build a vocabulary DataFrame from nothing)
    if 0 < len(vocab) <= nbits:
        return _jaccard_pairs_bitset(base, sorted(vocab), threshold)
    return _jaccard_pairs_inverted(base, threshold)


def _jaccard_pairs_bitset(
    base: DataFrame, vocab: list[str], threshold: float
) -> DataFrame:
    """All-pairs exact Jaccard with sets packed into 3 longs (≤192-bit
    vocabulary). The pair space is enumerated by a broadcast
    nested-loop on ``id_a < id_b`` — 12.5M pairs of long-triples score
    in seconds; nothing shuffles."""
    spark = base.sparkSession
    vdf = F.broadcast(
        spark.createDataFrame(
            [(s, i) for i, s in enumerate(vocab)], ["s", "idx"]
        )
    )
    words = 3
    pos = base.select("id", F.explode("sh").alias("s")).join(vdf, "s")
    masks = pos.groupBy("id").agg(
        *[
            F.bit_or(
                F.expr(
                    f"CASE WHEN idx >= {64 * i} AND idx < {64 * (i + 1)} "
                    f"THEN shiftleft(CAST(1 AS BIGINT), "
                    f"CAST(idx - {64 * i} AS INT)) "
                    f"ELSE CAST(0 AS BIGINT) END"
                )
            ).alias(f"m{i}")
            for i in range(words)
        ]
    )
    a = masks.select(
        F.col("id").alias("id_a"), *[F.col(f"m{i}").alias(f"a{i}") for i in range(words)]
    )
    b = masks.select(
        F.col("id").alias("id_b"), *[F.col(f"m{i}").alias(f"b{i}") for i in range(words)]
    )
    inter = sum(
        (F.bit_count(F.col(f"a{i}").bitwiseAND(F.col(f"b{i}"))) for i in range(words)),
        F.lit(0),
    )
    union = sum(
        (F.bit_count(F.col(f"a{i}").bitwiseOR(F.col(f"b{i}"))) for i in range(words)),
        F.lit(0),
    )
    # inter > 0 keeps parity with the inverted path (an inner join on
    # shared shingles can never emit a disjoint pair), which matters
    # only for degenerate thresholds ≤ 0
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            inter.alias("_inter"),
            (inter / union).alias("jaccard"),
        )
        .filter((F.col("jaccard") >= threshold) & (F.col("_inter") > 0))
        .drop("_inter")
    )


def _jaccard_pairs_inverted(base: DataFrame, threshold: float) -> DataFrame:
    sh = base.select("id", F.explode("sh").alias("shingle"))
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (
        l.join(
            r,
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def dedup_embedding_cosine(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    brute_force_limit: int = 100_000,
) -> DataFrame:
    """Drop rows whose embedding cosine to a smaller-id row exceeds
    ``threshold``.

    The pairwise cosine is computed in numpy (Arrow-batched GEMM), not
    as a per-pair expression: Spark's array higher-order functions are
    interpreted, so a 2M-pair fold costs ~40 s where one BLAS matmul
    costs milliseconds. Candidate generation: below
    ``brute_force_limit`` rows, the normalized matrix is broadcast and
    every partition GEMMs its block against it (corpus never shuffles);
    above it, hyperplane-LSH buckets (operators/similarity.py) bound
    each ``applyInPandas`` group to one bucket's pairs. (The near-dup
    regime, cos ≥ ~0.9, is exactly where sign-LSH recall is high.)
    """
    n = df.count()
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    id_field = vecs.schema["id"]

    if n <= brute_force_limit:
        drop_ids = _gemm_drop_ids_broadcast(vecs, threshold, id_field)
    else:
        drop_ids = _gemm_drop_ids_bucketed(vecs, threshold, id_field)
    return df.join(drop_ids, df[id_col] == drop_ids["id"], "left_anti")


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components over a duplicate-pair edge list →
    ``(id, cluster_id)`` where cluster_id = min id in the component.

    Pairwise dedup (drop the larger id of each close pair) is not
    transitive — A≈B and B≈C doesn't mark C when A≉C. Clustering the
    pair graph and keeping one representative per component is; this
    is the standard second stage after MinHash/embedding candidate
    generation.

    Algorithm: iterative min-label propagation — each round every node
    takes the min of its own and its neighbors' labels (one shuffle
    join + one groupBy per round), converging in O(graph diameter)
    rounds, which for near-dup graphs (dense clique-ish clusters) is
    2-3. ``localCheckpoint`` truncates the growing lineage each round
    so the plan stays O(1); the driver only ever sees one scalar
    (the changed-row count) per round. Only ids appearing in some pair
    come back — isolated rows are their own cluster by definition and
    never enter the shuffle.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # Materialize the symmetric edge list ONCE. `sym` is re-joined every
    # round; without this, each round re-executes the (potentially very
    # expensive) upstream pair generation — a dense 1M-edge jaccard
    # graph went from timeout to ~1 min with the checkpoint.
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    labels = sym.select("src").distinct().select(
        F.col("src").alias("id"), F.col("src").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(max_iterations):
        neigh_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new = (
            labels.join(neigh_min, labels.id == neigh_min.src, "left")
            .select(
                labels.id.alias("id"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        # silent partially-propagated labels would report one component
        # as several clusters (and dedup_by_cluster would keep extra
        # duplicates) — fail loudly; the caller raises max_iterations
        # (rounds needed = graph diameter, 2-3 for clique-ish dup
        # graphs, O(n) only for pathological chains)
        raise RuntimeError(
            f"dup_clusters: labels still changing after {max_iterations} "
            "rounds — raise max_iterations (rounds needed = component "
            "diameter)"
        )
    return labels.select("id", F.col("label").alias("cluster_id"))


def _normalized_matrix(pdf):
    """float64 row-normalized matrix from a pandas 'vec' column."""
    import numpy as np

    m = np.array(pdf["vec"].tolist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0.0] = 1.0
    return m / norms[:, None]


def _gemm_drop_ids_broadcast(vecs, threshold, id_field):
    """ids with some smaller-id neighbor at cosine ≥ threshold, via
    block-vs-broadcast matmul. Broadcast size is bounded by
    brute_force_limit rows (100k × 64 float64 ≈ 50 MB)."""
    from pyspark.sql.types import StructField, StructType

    spark = vecs.sparkSession
    ref = vecs.toPandas()  # bounded by brute_force_limit
    ref_ids = ref["id"].to_numpy()
    bc = spark.sparkContext.broadcast(
        (ref_ids, _normalized_matrix(ref))
    )

    out_schema = StructType([StructField("id", id_field.dataType)])

    def find_drops(batches):
        import pandas as pd

        ref_ids, ref_m = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block_ids = pdf["id"].to_numpy()
            sims = _normalized_matrix(pdf) @ ref_m.T
            # neighbor must have a strictly smaller id than the row
            smaller = ref_ids[None, :] < block_ids[:, None]
            hit = ((sims >= threshold) & smaller).any(axis=1)
            yield pd.DataFrame({"id": block_ids[hit]})

    return _spread_small_input(vecs).mapInPandas(
        find_drops, out_schema
    ).distinct()


def _gemm_drop_ids_bucketed(vecs, threshold, id_field, bits=12, tables=8):
    """Scale path: multi-table hyperplane-LSH, then per-bucket pairwise
    GEMM in applyInPandas — work and memory bounded by the largest
    bucket, never by the corpus.

    A single b-bit sign-LSH table collides a cos-0.95 pair with
    probability only (1 - θ/π)^b ≈ 0.28 at b=12; ``tables``
    independent tables amplify recall to 1-(1-0.28)^8 ≈ 0.93 (any-table
    collision). Points explode ×tables, but each row carries only
    (id, vec, table, bucket) and the per-group GEMM cost is set by
    bucket size, so the fan-out is a constant factor, not a blow-up."""
    import numpy as np
    from pyspark.sql.types import StructField, StructType

    from esdb_spark.operators.similarity import hyperplane_buckets

    per_table = [
        hyperplane_buckets(vecs, "vec", "id", bits=bits, seed=42 + 1000 * t)
        .withColumn("table", F.lit(t))
        for t in range(tables)
    ]
    bucketed = per_table[0]
    for t in per_table[1:]:
        bucketed = bucketed.unionByName(t)
    out_schema = StructType([StructField("id", id_field.dataType)])

    def bucket_drops(pdf):
        import pandas as pd

        if len(pdf) < 2:
            return pd.DataFrame({"id": pdf["id"][:0]})
        pdf = pdf.sort_values("id").reset_index(drop=True)
        m = _normalized_matrix(pdf)
        upper = np.triu(m @ m.T >= threshold, k=1)  # smaller id = lower row
        hit = upper.any(axis=0)
        return pd.DataFrame({"id": pdf["id"].to_numpy()[hit]})

    return (
        bucketed.select("id", "vec", "table", "bucket")
        .groupBy("table", "bucket")
        .applyInPandas(bucket_drops, out_schema)
        .distinct()
    )


def dedup_by_cluster(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score_col: str | None = None,
) -> DataFrame:
    """Transitive-closure dedup: cluster the near-dup pair graph
    (:func:`dup_clusters`) and keep one representative per connected
    component — the min id by default, or the highest-``score_col``
    row (ties → smaller id, so the choice stays deterministic) when a
    quality signal is available: a real pipeline keeps the BEST copy
    of a duplicated document, not the accidentally-smallest-keyed one.

    This is the correct second stage after any pairwise candidate
    generator (MinHash, SimHash, embedding cosine): dropping the larger
    id of each pair in isolation can over-delete chains (A≈B, B≈C
    drops B and C even when keeping C would be fine under a
    representative-per-cluster policy) and under-delete when pair lists
    are incomplete. Cost: the propagation rounds of dup_clusters plus
    one anti-join; rows never in a pair pass through untouched. The
    score path adds one cluster-keyed ``max_by`` aggregate (map-side
    combined — shuffle bounded by the cluster count) and joins scores
    for clustered ids only, never the whole corpus.
    """
    clusters = dup_clusters(pairs, id_a, id_b)
    if score_col is None:
        drop = clusters.filter(F.col("id") != F.col("cluster_id")).select("id")
        return df.join(drop, df[id_col] == drop["id"], "left_anti")
    scores = df.select(
        F.col(id_col).alias("id"), F.col(score_col).alias("_dq_score")
    )
    scored = clusters.join(scores, "id")
    # keeper = argmax(score, tie → min id): one flat aggregate per
    # cluster; (score, -id) ordering makes NULL scores lose to any
    # real score (NULL-safe struct ordering would keep NULL-max rows
    # — coalesce to -inf instead)
    keeper = scored.groupBy("cluster_id").agg(
        F.max_by(
            "id",
            F.struct(
                F.coalesce(F.col("_dq_score"), F.lit(float("-inf"))).alias("s"),
                (-F.col("id")).alias("nid"),
            ),
        ).alias("keep_id")
    )
    drop = (
        scored.join(keeper, "cluster_id")
        .filter(F.col("id") != F.col("keep_id"))
        .select("id")
    )
    return df.join(drop, df[id_col] == drop["id"], "left_anti")


def dedup_audit(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score_col: str | None = None,
) -> DataFrame:
    """The dedup DECISION LINEAGE: one row per dropped document —
    (dropped_id, kept_id, cluster_id) — under the same
    transitive-closure + keeper policy as :func:`dedup_by_cluster`
    (min id, or argmax ``score_col``). A production pipeline keeps
    this next to the deduped corpus: it answers "why is doc X gone
    and which copy survived?" without re-running the dedup, and it
    lets an incremental run re-attach new near-dups to their existing
    keeper. Cost: the same cluster propagation, plus one keeper
    aggregate (cluster-count-sized) — the audit rows are exactly the
    dropped set, never the corpus."""
    clusters = dup_clusters(pairs, id_a, id_b)
    if score_col is None:
        return (
            clusters.filter(F.col("id") != F.col("cluster_id"))
            .select(
                F.col("id").alias("dropped_id"),
                F.col("cluster_id").alias("kept_id"),
                "cluster_id",
            )
        )
    scores = df.select(
        F.col(id_col).alias("id"), F.col(score_col).alias("_dq_score")
    )
    scored = clusters.join(scores, "id")
    keeper = scored.groupBy("cluster_id").agg(
        F.max_by(
            "id",
            F.struct(
                F.coalesce(F.col("_dq_score"), F.lit(float("-inf"))).alias("s"),
                (-F.col("id")).alias("nid"),
            ),
        ).alias("kept_id")
    )
    return (
        scored.join(keeper, "cluster_id")
        .filter(F.col("id") != F.col("kept_id"))
        .select(F.col("id").alias("dropped_id"), "kept_id", "cluster_id")
    )
