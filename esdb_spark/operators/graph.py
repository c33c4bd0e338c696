"""Iterative graph algorithms over edge-list DataFrames.

The reference engine has no graph layer (SURVEY.md §2.6); this
extends the §2.7 training-pipeline capability set. Connected
components (the dedup clustering stage) lives in
``dedup.dup_clusters``; here is PageRank — the canonical
importance-propagation loop, used in corpus curation to rank
documents/domains inside a similarity or link graph (e.g. pick the
canonical page of a near-dup cluster, weight crawl frontiers).

Scale design — the same iterative-DataFrame posture as
``dup_clusters``:

- One shuffle join + one aggregation per iteration: ranks join the
  (checkpointed, symmetric-free) edge list on src, contributions
  aggregate on dst. Partial aggregation combines map-side, so the
  shuffle per round carries one row per (dst, partition).
- The edge list and out-degrees materialize ONCE (`localCheckpoint`)
  — without it every round would re-execute the upstream pair
  generation (the dup-graph is itself an LSH join).
- `localCheckpoint` on the rank vector bounds the plan: dangling-free
  graphs fuse `checkpoint_every` rounds per job (the plan grows
  linearly within a span), graphs with dangling nodes checkpoint
  every round because their round subtree references ranks twice and
  would otherwise double per fused round.
- The dangling-node SET is structural and computed once before the
  loop; the per-round mass scalar rides as a broadcast one-row frame,
  so the driver never collects data inside the loop either way.
- Otherwise the driver never sees data: a fixed iteration count
  (PageRank converges geometrically at rate = damping; 10-20 rounds
  ≈ 1e-4) avoids a per-round convergence collect entirely.
- Rank sums are float reductions whose order is partition-dependent,
  so results are deterministic only to ~1e-9 relative — gate queries
  exposing ranks are rows-only; the operator is cross-validated
  against a numpy power-iteration in test_graph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _ckpt_pooled(dfs: list):
    """localCheckpoint independent frames CONCURRENTLY (a small thread
    pool; Spark schedules the jobs side by side and each job's tail
    back-fills the other's executors) — two structural frames that
    derive from the same checkpointed parent but not from each other
    need not serialize their materialization. Returns the
    checkpointed frames in input order; exceptions propagate."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(4, max(2, len(dfs)))) as pool:
        return [
            f.result()
            for f in [pool.submit(d.localCheckpoint) for d in dfs]
        ]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 15,
    checkpoint_every: int = 5,
) -> DataFrame:
    """PageRank over a directed edge list → ``(id, rank)``.

    Standard power iteration with uniform teleport:
    ``r' = (1-d)/N + d·(Σ_in r/outdeg + dangling_mass/N)`` — dangling
    nodes (no out-edges) redistribute their rank uniformly, so ranks
    sum to 1 every round (asserted in tests). Nodes are every id
    appearing as src or dst. Fixed ``iters`` rounds (geometric
    convergence at rate ``damping``); the driver never touches data —
    the dangling mass rides as a broadcast one-row frame, not a
    per-round collect.

    ``checkpoint_every``: rounds are chained LAZILY and the rank
    vector materializes every k-th round (plus once at the end), so
    ``iters=10, k=5`` runs TWO Spark jobs of five fused rounds instead
    of ten one-round jobs. Measured (round-6 interleaved A/B, sf0.1
    doc_pagerank, same session): k=5 ≈ 4.6 s vs k=1 ≈ 5.1 s median —
    a real but modest ~10% at this scale, because the total operator
    count Catalyst analyzes is unchanged; what k>1 removes is the
    per-job scheduling + checkpoint write of the node-sized vector,
    which matters more as iteration count grows. Within a fused span
    the plan depth grows ~7 operators/round — k ≤ ~8 keeps analysis
    time negligible; k=1 restores the old one-job-per-round shape.
    Graphs WITH dangling nodes force k=1 internally: their round
    subtree references the rank vector twice, so fusing would double
    the plan per round (2^k growth), and per-round materialization is
    the cheaper side of that trade.
    """
    if not 0 < damping < 1:
        raise ValueError("pagerank: damping must be in (0, 1)")
    if checkpoint_every < 1:
        # validate BEFORE the edge/node/degree materialization jobs
        raise ValueError("pagerank: checkpoint_every must be >= 1")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        # NULL endpoints would silently leak rank mass: a NULL dst's
        # contribution row never re-joins nodes (NULL != NULL) and a
        # NULL src node would misclassify as dangling — drop such
        # edges up front so the mass-conservation invariant holds
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    # nodes and outdeg both derive from the checkpointed edge list and
    # are independent of each other — their checkpoints run POOLED
    # (r12, guide §2.6): two concurrent jobs instead of two sequential
    # driver actions. renamed projections: nodes/outdeg/contribs all
    # derive from `e`, and Spark rejects the resulting self-join
    # column references as ambiguous unless the lineages carry
    # distinct names. outdeg is LOOP-INVARIANT but aggregates the full
    # edge list — checkpoint it once (node-sized) so no round re-scans
    # the edges to recount degrees (round 4: on a 17.8M-edge
    # similarity graph this aggregation dominated every round).
    nodes, outdeg = _ckpt_pooled(
        [
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct(),
            e.groupBy("src")
            .agg(F.count("*").alias("outdeg"))
            .select(F.col("src").alias("_d_src"), "outdeg"),
        ]
    )
    e2 = e.select(F.col("src").alias("_e_src"), F.col("dst").alias("_e_dst"))
    # WHICH nodes are dangling is a structural fact — compute the set
    # ONCE before the loop, not per round (round 4: the old shape paid
    # a rank+outdeg left-join checkpoint AND a dangling-mass collect
    # every round; 15 iterations at sf0.1 spent most of their 29.6 s
    # on those per-round driver actions). Per-round cost is now:
    #   - no dangling nodes (every symmetric/similarity graph): ONE
    #     action (the rank checkpoint) — no collect at all;
    #   - dangling nodes present: the mass scalar still needs one
    #     per-round aggregate over the (small, checkpointed) dangling
    #     id set joined to ranks — mass changes per round even though
    #     the set does not.
    # r12: ONE aggregate answers both structural questions — the node
    # count (for 1/n) and whether any node lacks out-edges — replacing
    # three sequential driver actions (nodes.count, dangling
    # checkpoint, limit(1).count); the dangling id SET only
    # materializes when it is non-empty (the per-round mass aggregate
    # is the only consumer). Dangling-free graphs — every symmetric
    # similarity graph — now pay two pre-loop actions total.
    stats = (
        nodes.join(outdeg, F.col("id") == F.col("_d_src"), "left")
        .agg(
            F.count("*").alias("_pr_n"),
            F.coalesce(
                F.sum(F.when(F.col("outdeg").isNull(), 1).otherwise(0)),
                F.lit(0),
            ).alias("_pr_nd"),
        )
        .first()
    )
    n = stats["_pr_n"]
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    has_dangling = stats["_pr_nd"] > 0
    dangling_ids = (
        nodes.join(outdeg, F.col("id") == F.col("_d_src"), "left_anti")
        .localCheckpoint()
        if has_dangling
        else None
    )
    # The contribution join's cheap side is NODE-sized (rank ⋈ outdeg,
    # ~24 B/row) while the edge side can be arbitrarily large — and a
    # checkpointed edge list has no partitioning stats, so Catalyst
    # sort-merge-joins it, re-shuffling EVERY edge EVERY round
    # (measured: 3-4.6 s/round on a 17.8M-edge graph, the whole loop's
    # cost). We know n exactly; under ~5M nodes (≈120 MB) broadcast
    # the rank side so edges never shuffle — the per-round shuffle is
    # then just the map-side-combined contribution aggregate. Above
    # that, SMJ is the right plan and AQE handles skew.
    broadcast_ranks = n <= 5_000_000
    # With dangling nodes each round references `ranks` TWICE (the
    # mass aggregate and the contribution join), so fusing k rounds
    # would embed 2^k copies of the round subtree in one plan —
    # Catalyst analysis, not execution, becomes the bottleneck.
    # Dangling graphs therefore checkpoint every round (plan stays
    # O(1)); dangling-free graphs (every undirected similarity graph)
    # reference ranks once per round and fuse linearly.
    effective_ck = 1 if has_dangling else checkpoint_every
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iters):
        if has_dangling:
            # one-row broadcast frame instead of a collect: the mass
            # scalar stays inside the fused plan, so rounds chain
            # without a per-round driver action even on graphs WITH
            # dangling nodes (the crossJoin is the repo's standard
            # broadcast one-row shape)
            dng = F.broadcast(dangling_ids) if broadcast_ranks else dangling_ids
            mass = (
                ranks.join(dng, "id", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_pr_mass"))
            )
            base_col = F.lit((1.0 - damping) / n) + F.lit(damping / n) * F.col("_pr_mass")
        # contribution pass: INNER join ranks→outdeg→edges (dangling
        # nodes have no out-edges, so the inner join drops them — the
        # old left-join + isNotNull filter in one). Under the ≤5M-node
        # guard every node-sized frame in the round is broadcastable,
        # so ALL three per-round node-frame joins take broadcast hints
        # (r13: the lineage-less checkpoints have no stats, so Catalyst
        # sort-merge-joined ranks⋈outdeg and nodes⋈contribs — three
        # node-sized shuffle exchanges + sorts per round; the
        # loop-invariant outdeg broadcast is built once per fused job
        # via exchange reuse). Above the guard SMJ stays — nothing here
        # is local-core-count tuned.
        od = F.broadcast(outdeg) if broadcast_ranks else outdeg
        rank_deg = ranks.join(od, F.col("id") == F.col("_d_src"))
        if broadcast_ranks:
            rank_deg = F.broadcast(rank_deg)
        contribs = (
            e2.join(rank_deg, F.col("id") == F.col("_e_src"))
            .select(
                F.col("_e_dst").alias("id"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("in_mass"))
        )
        nxt = nodes.join(
            F.broadcast(contribs) if broadcast_ranks else contribs,
            "id",
            "left",
        )
        if has_dangling:
            nxt = nxt.crossJoin(F.broadcast(mass))
            base = base_col
        else:
            base = F.lit((1.0 - damping) / n)
        ranks = nxt.select(
            "id",
            (
                base + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
            ).alias("rank"),
        )
        if (it + 1) % effective_ck == 0 or it == iters - 1:
            ranks = ranks.localCheckpoint()
    return ranks


def pagerank_exact(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping_num: int = 17,
    damping_den: int = 20,
    iters: int = 10,
    scale: int = 10**12,
) -> DataFrame:
    """Integer fixed-point PageRank → ``(id, rank_scaled: bigint)`` —
    the ENGINE-PORTABLE face of :func:`pagerank`. Float PageRank is
    deterministic only to ~1e-9 (partition-order float sums), so its
    gate row is rows-only; this variant does the whole power iteration
    in scaled BIGINT arithmetic (total mass = ``scale``, damping =
    ``damping_num/damping_den``, every division a floor-div), where
    sums are associative and floor-div is bit-identical across
    engines — DuckDB replays it exactly with a recursive CTE. A little
    mass floors away each round (bounded by n + |edges| units of
    1/scale); ranks are comparable, not normalized — the canonical-
    document-selection ORDER is what pipelines consume.

    Update rule (all integer ops, applied identically in the oracle):
    ``r' = ((den-num)*(scale div n) + num*(Σ_in (r div outdeg))) div den``

    REQUIRES a graph with no dangling nodes (raises otherwise): the
    per-round dangling-mass scalar would need a second reference to
    the previous iteration in the oracle's recursive CTE, which SQL
    recursion forbids — symmetrize the graph first (undirected graphs
    never have dangling nodes), or use :func:`pagerank`.

    Scale shape: identical to :func:`pagerank` — edge list and
    out-degrees checkpointed once, one broadcast-or-SMJ join + one
    map-side-combined aggregation per round, rank vector
    localCheckpointed so the plan stays O(1) in rounds. No per-round
    driver action at all (the dangling collect is structurally zero).
    """
    if damping_den <= damping_num or damping_num <= 0:
        raise ValueError("pagerank_exact: need 0 < num < den")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    # r12: nodes/outdeg checkpoints pooled, and ONE aggregate answers
    # the node count + dangling check (same restructure as pagerank —
    # three sequential pre-loop driver actions became one).
    nodes, outdeg = _ckpt_pooled(
        [
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct(),
            e.groupBy("src")
            .agg(F.count("*").alias("outdeg"))
            .select(F.col("src").alias("_d_src"), "outdeg"),
        ]
    )
    stats = (
        nodes.join(outdeg, F.col("id") == F.col("_d_src"), "left")
        .agg(
            F.count("*").alias("_pr_n"),
            F.coalesce(
                F.sum(F.when(F.col("outdeg").isNull(), 1).otherwise(0)),
                F.lit(0),
            ).alias("_pr_nd"),
        )
        .first()
    )
    n = stats["_pr_n"]
    if n == 0:
        return nodes.withColumn("rank_scaled", F.lit(0).cast("long"))
    if stats["_pr_nd"] > 0:
        raise ValueError(
            "pagerank_exact: graph has dangling nodes (no out-edges) — "
            "symmetrize it or use pagerank()"
        )
    e2 = e.select(F.col("src").alias("_e_src"), F.col("dst").alias("_e_dst"))
    broadcast_ranks = n <= 5_000_000
    base = (damping_den - damping_num) * (scale // n)
    ranks = nodes.withColumn(
        "rank_scaled", F.lit(scale // n).cast("long")
    )
    for _ in range(iters):
        # same r13 broadcast posture as pagerank(): under the ≤5M-node
        # guard the stats-less checkpointed node frames would SMJ —
        # hint outdeg (loop-invariant, broadcast reused per fused job)
        # and contribs below so each round keeps ONE shuffle (the
        # map-side-combined contribution aggregate)
        od = F.broadcast(outdeg) if broadcast_ranks else outdeg
        rank_deg = ranks.join(od, F.col("id") == F.col("_d_src"))
        if broadcast_ranks:
            rank_deg = F.broadcast(rank_deg)
        # `div`, NOT floor(a / b): long / long is a DOUBLE division in
        # Spark, and floor(correctly-rounded double quotient) can land
        # one above the true integer quotient when it rounds up to an
        # integer — `div` is exact integer semantics, same as the
        # oracle's `//`
        contribs = (
            e2.join(rank_deg, F.col("id") == F.col("_e_src"))
            .select(
                F.col("_e_dst").alias("id"),
                F.expr("rank_scaled div outdeg").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = (
            nodes.join(
                F.broadcast(contribs) if broadcast_ranks else contribs,
                "id",
                "left",
            )
            .select(
                "id",
                F.expr(
                    f"({base}L + {damping_num}L * coalesce(in_mass, 0L))"
                    f" div {damping_den}L"
                ).alias("rank_scaled"),
            )
            .localCheckpoint()
        )
    return ranks


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED graph given as an
    edge list (direction and duplicates ignored; self-loops dropped).
    Returns (id, triangles).

    Scale shape — degree-ordered orientation, the standard trick that
    makes distributed triangle enumeration O(m^1.5) instead of
    exploding on hubs: orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one. Every triangle then
    has exactly ONE wedge at its minimum vertex, so the wedge
    self-join (oriented ⋈ oriented on the shared low vertex) produces
    each candidate exactly once, and a hub of degree d contributes
    wedges only through its LOW-degree neighbors — the d² blowup a
    naive adjacency join suffers never materializes. Three hash
    shuffles total (degree agg, wedge join, closure join); edges carry
    (long, long) pairs only.

    Engine-portable (exact oracle): ordering by (degree, id) is a pure
    function of the data, and counting is exact integer arithmetic —
    DuckDB replays the same three joins.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("a"),
            F.col(dst).cast("long").alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    # orient u->v iff (deg(u), u) < (deg(v), v)
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("lo"), F.col("v").alias("hi")),
            )
            .otherwise(
                F.struct(F.col("v").alias("lo"), F.col("u").alias("hi"))
            )
            .alias("o")
        )
        .select("o.lo", "o.hi")
    )
    w1 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("x"))
    w2 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("y"))
    wedges = w1.join(w2, "p").filter(F.col("x") < F.col("y"))
    # closure: the wedge (x, y) pair is id-ordered; e is already the
    # canonical undirected edge set with u < v, so match it directly
    closing = e.select(F.col("u").alias("x2"), F.col("v").alias("y2"))
    tris = wedges.join(
        closing,
        (F.col("x") == F.col("x2")) & (F.col("y") == F.col("y2")),
    ).select("p", "x", "y")
    per_node = (
        tris.select(F.col("p").alias("id"))
        .unionAll(tris.select(F.col("x").alias("id")))
        .unionAll(tris.select(F.col("y").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    # nodes with zero triangles still appear (left join over degrees)
    return deg.join(per_node, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0).cast("long")).alias("triangles")
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Synchronous label-propagation community detection → ``(id,
    label)``: every node starts as its own label; each round a node
    adopts the most frequent label among its in-neighbors (ties to the
    SMALLEST label — fully deterministic, integer-only, which is what
    lets a catalog row carry an exact unrolled-SQL oracle). Pass a
    symmetrized edge list for undirected semantics, as with
    :func:`triangle_count`.

    Fixed ``iters`` synchronous rounds, NOT a fixpoint: synchronous
    LPA can oscillate (bipartite graphs 2-color under it — the classic
    caveat), so the result is "the labeling after k rounds", a
    deterministic quantity. Raumer-style semi-synchronous variants
    trade that determinism away; this engine keeps the oracle.

    Scale: per round, ONE labels⋈edges join (labels broadcast under
    the same ≤5M-node guard as :func:`pagerank`) and two hash
    aggregations — (dst, label) counts, then a max_by struct argmax
    per dst. The isolated-node set (no in-edges; their label can never
    change) is structural and computed ONCE, so the per-round plan
    references the carried label frame exactly once and rounds fuse
    linearly between checkpoints (the 2^k dangling lesson from
    :func:`pagerank` does not bite here).
    """
    if checkpoint_every < 1:
        raise ValueError("label_propagation: checkpoint_every must be >= 1")
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("label", F.lit(None).cast("long"))
    e2 = e.select(F.col("src").alias("_lp_src"), F.col("dst").alias("_lp_dst"))
    receivers = e.select(F.col("dst").alias("id")).distinct()
    isolated = (
        nodes.join(receivers, "id", "left_anti")
        .select("id", F.col("id").alias("label"))
        .localCheckpoint()
    )
    broadcast_labels = n <= 5_000_000
    labels = nodes.select("id", F.col("id").alias("label"))
    for it in range(iters):
        lbl = F.broadcast(labels) if broadcast_labels else labels
        counts = (
            e2.join(lbl, F.col("id") == F.col("_lp_src"))
            .groupBy("_lp_dst", "label")
            .agg(F.count("*").alias("_lp_c"))
        )
        # type-generic argmax: row_number over (count desc, label asc)
        # — a struct-max with a negated label would crash on string ids
        # under ANSI and order numeric strings numerically (review
        # finding); the window partition is bounded by the distinct
        # labels heard per node
        wr = Window.partitionBy("_lp_dst").orderBy(
            F.desc("_lp_c"), F.asc("label")
        )
        updated = (
            counts.withColumn("_lp_rn", F.row_number().over(wr))
            .filter(F.col("_lp_rn") == 1)
            .select(F.col("_lp_dst").alias("id"), "label")
        )
        labels = updated.unionByName(isolated)
        if (it + 1) % checkpoint_every == 0 or it == iters - 1:
            labels = labels.localCheckpoint()
    return labels


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 10,
    checkpoint_every: int = 5,
    early_exit: bool = False,
) -> DataFrame:
    """Multi-source BFS hop distances → ``(id, dist)``: the minimum
    number of directed edges from ANY source node, up to ``max_hops``
    (unreached nodes are absent — at graph scale "the rest of the
    graph" is almost everything, and emitting it would be a node-table
    cross join). Integer-only and deterministic, so catalog rows carry
    an exact recursive-CTE oracle. Pass a symmetrized edge list for
    undirected semantics, as with :func:`triangle_count`.

    ``sources`` is a one-column frame of starting node ids (distance
    0). Frontier expansion is the textbook level-synchronous BFS:
    round k joins the CURRENT FRONTIER (not the full visited set)
    against the edge list, then anti-joins out already-visited nodes —
    per-round shuffles carry the frontier's out-edges only, which is
    the output-sensitive cost BFS fundamentally has. Visited and
    frontier frames are localCheckpointed on the
    ``checkpoint_every`` cadence: the round subtree references the
    carried frontier TWICE (join + anti-join), which is exactly the
    2^k fused-plan regime :func:`pagerank`'s dangling branch hit —
    checkpoints bound the lineage (the round-6 lesson).

    ``early_exit``: stop expanding once the frontier empties, checked
    at each checkpoint boundary. Saves dead rounds when ``max_hops``
    exceeds the graph's eccentricity, at the cost of eager actions at
    plan-BUILD time — the catalog/gate contract composes lazily, so
    lazy is the default; flip it on for interactive traversals with a
    generous hop budget.

    Reference anchor: the reference engine walks index chains hop by
    hop (stream/open_stream.go tail-pointer follows); this is the
    graph-global face of the same traversal.
    """
    if max_hops < 0:
        raise ValueError("bfs_distances: max_hops must be >= 0")
    if checkpoint_every < 1:
        raise ValueError("bfs_distances: checkpoint_every must be >= 1")
    e = (
        edges.select(F.col(src).alias("_bf_s"), F.col(dst).alias("_bf_d"))
        .filter(F.col("_bf_s").isNotNull() & F.col("_bf_d").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    frontier = (
        sources.select(F.col(sources.columns[0]).alias("id"))
        .filter(F.col("id").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    visited = frontier.select("id", F.lit(0).cast("long").alias("dist"))
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier, F.col("id") == F.col("_bf_s"))
            .select(F.col("_bf_d").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
        )
        frontier = nxt
        new_rows = frontier.select(
            "id", F.lit(hop).cast("long").alias("dist")
        )
        visited = visited.unionByName(new_rows)
        if hop % checkpoint_every == 0 or hop == max_hops:
            # the NEXT round references frontier twice (expand +
            # anti-join) and visited twice (anti-join + union) — bound
            # the fused lineage before it exponentiates
            frontier = frontier.localCheckpoint(eager=False)
            visited = visited.localCheckpoint(eager=False)
            if early_exit and hop < max_hops and frontier.isEmpty():
                break
    return visited
