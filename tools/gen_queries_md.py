"""Regenerate QUERIES.md — the one-row-per-catalog-query index.

Run from the repo root: ``python tools/gen_queries_md.py``. Descriptions
come from each query function's first docstring paragraph; TPC-H-shaped
names fall back to the standard query titles.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esdb_spark.queries import _GATE_WINDOW, catalog  # noqa: E402

TPCH_TITLES = {
    "q1": "pricing summary report (aggregates by returnflag/linestatus)",
    "q2": "minimum-cost supplier (correlated min decorrelated to a window)",
    "q3": "top-10 unshipped-order revenue (filter-early 3-way join)",
    "q4": "order priority checking (EXISTS semi-join)",
    "q5": "local supplier volume (5-way join, broadcast dims)",
    "q6": "forecasting revenue change (scan + predicate brackets)",
    "q7": "volume shipping between two nations (self-join on nation)",
    "q8": "national market share (year pivot over 7 joins)",
    "q9": "product type profit (profit expression over part/supplier joins)",
    "q10": "returned-item reporting (top-20 revenue customers)",
    "q11": "important stock (global-fraction scalar subquery)",
    "q12": "shipping modes vs priority (conditional aggregation)",
    "q13": "customer order-count distribution (left outer + re-aggregate)",
    "q14": "promotion effect (conditional revenue share)",
    "q15": "top supplier (scalar max subquery)",
    "q16": "part/supplier relationship variety (countDistinct)",
    "q17": "small-quantity-order revenue (per-part avg scalar)",
    "q18": "large-volume customers (HAVING over grouped sums)",
    "q19": "discounted revenue (OR-of-AND predicate brackets)",
    "q20": "potential part promotion (nested semi-join chain)",
    "q21": "suppliers who kept orders waiting (EXISTS + NOT EXISTS)",
    "q22": "global sales opportunity (scalar avg + anti-join)",
}

HEADER = """# QUERIES — the full catalog behind `__spark_entry__.queries()`

One row per catalog query (regenerate with
`python tools/gen_queries_md.py`). **Gate** = inside the driver's
50-row CORRECTNESS window (`queries._GATE_WINDOW`); every oracle-backed
query is also locally verified against DuckDB by
`tests/test_oracle_parity.py` at sf0.01 with exact float equality.
Every rows-only query (engine-specific hashes / floats / numpy fits)
names its exactness anchor inline: the oracle-backed EXACT TWIN that
certifies the same decision/mechanism, and/or the cross-validation
test that pins it to an exact recompute — no rows-only row stands
alone.

| # | Query | Check | Gate | What it exercises |
|---|---|---|---|---|"""

# Exactness anchor per rows-only row (verdict r7 ask #7): the
# oracle-backed twin certifying the same decision, or the test that
# cross-validates against an exact recompute.
ROWS_ONLY_ANCHORS = {
    "dedup_minhash_docs": "exact twin `dedup_minhash_portable_docs` "
    "(gate; same banded-LSH keep/drop with md5-portable hashes)",
    "dedup_simhash_docs": "exact twin `doc_unigram_jaccard_pairs` "
    "(oracle exact Jaccard); cross-validated in test_dedup.py",
    "ann_topk_docs": "exact twin `similarity_topk` (oracle); recall "
    "asserted vs exact cosine in test_similarity.py",
    "ann_topk_ivf_docs": "exact twin `similarity_topk` (oracle); "
    "full-probe == brute + recall asserted in test_similarity.py",
    "docs_ann_int8": "exact twin `mips_topk_int8` — the gate-certified "
    "`docs_hybrid_rrf` vector leg; full-probe == it value-for-value "
    "(test_similarity.py)",
    "linear_fit_per_type": "exact twin `linear_fit_exact_per_type` "
    "(oracle; integer-moment fixed-point fit)",
    "event_type_freq_cms": "exact twin `event_type_freq_cms_portable` "
    "(gate; md5-portable cells) + estimate ≥ exact invariant in "
    "test_sketches.py",
    "approx_distinct_users": "cross-validated vs exact countDistinct "
    "in test_sketches.py (sparse-mode sketches exact at gate scale)",
    "ann_topk_pq_docs": "exact twin `similarity_topk` (oracle); recall "
    "asserted vs exact cosine in test_similarity.py",
    "bpe_token_stats_docs": "exact twin `doc_token_counts_fixed` "
    "(oracle; fixed-merge portable variant) + property-tested trainer",
    "event_value_quantiles": "exact twin `event_value_quantiles_exact` "
    "(oracle; percentile_disc semantics)",
    "doc_quality_model_scores": "exact twin `doc_quality` (oracle "
    "feature layer); the logistic fit is numpy-cross-validated in "
    "test_model.py",
    "doc_pagerank": "exact twin `events_user_graph_pagerank` (gate; "
    "integer fixed-point PageRank) + float-vs-exact agreement in "
    "test_graph.py",
    "knn_join_embeddings": "exact twin `similarity_topk` (oracle; same "
    "scoring) — the join IS brute-force-exact per pair, rows-only for "
    "float rank hashes; pinned in test_similarity.py",
    "embedding_kmeans_docs": "assignment optimality + cohesion "
    "cross-validated vs numpy in test_cluster.py (no SQL-expressible "
    "twin: seeded-RNG centroid fit)",
    "docs_bm25_topk": "exact twin `docs_keyword_search` (gate) + "
    "bitwise Python-model pin in test_search.py",
    "docs_search_page_bm25": "exact twin `docs_search_page` (gate; "
    "rank mechanics + snippet slice value-hashed under integer "
    "relevance); scores pinned to bm25_search_indexed and snippets to "
    "the stored text in test_search.py",
    "docs_bm25_maintained": "exact twins `docs_doc_lengths_maintained` "
    "(the maintained state) and `docs_keyword_search_segments` "
    "(integer-scored serving); bit-exact vs the from-corpus path in "
    "test_search.py",
    "docs_hybrid_rrf_cosine": "exact twin `docs_hybrid_rrf` (gate; "
    "int8-MIPS vector leg)",
    "lineitem_incremental_distinct": "cross-validated vs exact "
    "countDistinct recompute at gate scale in test_incremental.py "
    "(sparse-mode sketches exact there)",
    "embedding_pca_docs": "numpy eigendecomposition cross-validation "
    "in test_reduce.py (exact-covariance moments ARE oracle-shaped; "
    "the eigenbasis is not SQL-expressible)",
}


def describe(name: str, fn) -> str:
    doc = (fn.__doc__ or "").strip().split("\n\n")[0]
    doc = " ".join(doc.split())
    if not doc:
        stem = name.split("_")[0]
        if stem in TPCH_TITLES:
            doc = f"TPC-H {stem.upper()}: {TPCH_TITLES[stem]}"
        else:
            doc = "—"
    if len(doc) > 160:
        doc = doc[:157] + "..."
    return doc.replace("|", "\\|")


def main() -> None:
    lines = [HEADER]
    cat = catalog()
    missing = [
        n for n, q in cat.items() if not q.oracle and n not in ROWS_ONLY_ANCHORS
    ]
    if missing:
        raise SystemExit(
            f"rows-only rows without an exactness anchor: {missing} — "
            "add them to ROWS_ONLY_ANCHORS (no orphan rows-only entries)"
        )
    for i, (name, q) in enumerate(cat.items(), 1):
        if q.oracle:
            check = "oracle"
        else:
            check = "rows-only — " + ROWS_ONLY_ANCHORS[name].replace(
                "|", "\\|"
            )
        gate = "✓" if name in _GATE_WINDOW else ""
        lines.append(
            f"| {i} | `{name}` | {check} | {gate} | {describe(name, q.fn)} |"
        )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "QUERIES.md",
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
