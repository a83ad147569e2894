"""Relevance ranking: TF-IDF / BM25 scoring over a token corpus.

The retrieval primitive an LLM-data pipeline uses for query-targeted
corpus selection (pull documents relevant to a seed query set before
expensive filtering) and for building weak-supervision relevance
labels. Okapi BM25 (Robertson et al., TREC-3) over the shared
whitespace tokenizer (``functions/text.py::tokens``):

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl))

Scale shape: per-doc length is size(tokens(text)) in the scan task and
corpus totals are a narrow map-side aggregate — no token ever crosses
the wire for a length; the query terms filter INSIDE the token array
before the explode, so the only shuffle is the (doc, term) tf
aggregate over matching-term rows (map-side partials); df and totals
fold back in as broadcasts — no all-pairs, no driver state. Numerics follow the repo's ln doctrine (CLAUDE.md /
q_unigram_logprob): ln on bit-identical inputs diverges ≤1 ulp across
libms, five orders of magnitude under the 4dp ``floor(x+0.5)`` round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_processing_platform_spark.functions.text import tokens


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 4,
) -> DataFrame:
    """BM25 score of every document against a fixed query-term list.
    Only documents matching ≥1 term are returned (inner joins — no
    nullable score column). Output: id_col, n_terms (distinct matched
    query terms, INT), bm25 (rounded)."""
    # Per-doc length is just size(tokens(text)) — computing it by
    # exploding every token through a doc-keyed shuffle (the naive
    # shape) moves |corpus| token rows for a count the scan task
    # already knows. Likewise the query terms filter BEFORE the
    # explode, so only matching-term rows are ever generated: the one
    # shuffle left is the (doc, term) tf aggregate over that tiny set.
    toked = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        # size(NULL) is -1 (legacy sizeOfNull): left uncorrected, each
        # null-text doc would SUBTRACT 1 from total_tokens and skew
        # avgdl. greatest(,0) keeps the old explode-shape contract
        # (null/empty docs contribute 0 and never match a term).
        F.greatest(F.size("_toks"), F.lit(0)).alias("dl"),
        F.col("_toks").alias("_toks"),
    )
    # Corpus totals: narrow map-side aggregate, no explode, no join.
    # n_docs counts docs with >=1 token (the doc-keyed-explode shape
    # this replaces never saw empty docs — keep that contract).
    totals = toked.agg(
        F.sum("dl").alias("total_tokens"),
        F.count(F.when(F.col("dl") > 0, 1)).alias("n_docs"),
    )
    term_set = list(dict.fromkeys(terms))
    tf = (
        toked.select(
            F.col(id_col),
            F.col("dl"),
            F.explode(
                F.filter(F.col("_toks"), lambda t: t.isin(term_set))
            ).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    dfreq = F.broadcast(
        tf.groupBy("term").agg(F.count("*").alias("df"))
    )
    avgdl = F.col("total_tokens") / F.col("n_docs")
    idf = F.ln(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    weight = (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * ((1.0 - b) + b * F.col("dl") / avgdl))
    )
    scale = float(10**round_dp)
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_terms"),
            (F.floor(F.sum(weight) * scale + 0.5) / scale).alias("bm25"),
        )
    )


def bm25_oracle_sql(
    terms: list[str], k1: float = 1.2, b: float = 0.75, round_dp: int = 4
) -> str:
    """DuckDB twin generated from the SAME parameters the Spark side
    runs (generated-oracle rule, CLAUDE.md): literal constants are
    emitted via repr of the identical Python floats, and every
    arithmetic composition matches ``bm25_scores`` operation for
    operation."""
    # same dedup as bm25_scores' term_set — duplicate terms must not
    # double tf on the oracle side only (generated-oracle contract)
    values = ", ".join(f"('{t}')" for t in dict.fromkeys(terms))
    scale = float(10**round_dp)
    return f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                t -> t <> '')) AS tok
      FROM documents),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    totals AS (SELECT CAST(sum(dl) AS BIGINT) AS total_tokens,
                      CAST(count(*) AS BIGINT) AS n_docs FROM dl),
    qt AS (SELECT * FROM (VALUES {values}) AS q(term)),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tok JOIN qt ON tok.tok = qt.term
           GROUP BY doc_id, term),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
    SELECT tf.doc_id,
           CAST(count(*) AS INTEGER) AS n_terms,
           floor(sum(
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             * (tf * {k1 + 1.0!r})
             / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl / (total_tokens / n_docs)))
           ) * {scale!r} + 0.5) / {scale!r} AS bm25
    FROM tf
    JOIN dfreq USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN totals
    GROUP BY tf.doc_id
    """


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "id",
    rank_col: str = "r",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) of
    two ranked lists: ``rrf(d) = Σ_list 1/(k + rank_list(d))``, items
    missing from a list contribute 0. The standard hybrid-retrieval
    combiner (lexical BM25 + embedding similarity) — rank-based, so no
    score calibration between the two systems is needed.

    Inputs are (id_col, rank_col) lists — in practice the TOP-K of each
    retriever (take the top-k with TakeOrderedAndProject first; fusing
    full corpora is never the shape). The fusion join is then bounded
    by 2k rows. Output: id_col, rrf (double), in_a, in_b (non-null
    booleans). rrf is built purely from integer ranks via IEEE divide/
    add — bit-identical cross-engine, no rounding step needed."""
    aa = ranked_a.select(F.col(id_col).alias("_id"), F.col(rank_col).alias("_ra"))
    bb = ranked_b.select(F.col(id_col).alias("_id"), F.col(rank_col).alias("_rb"))
    j = aa.join(bb, "_id", "full_outer")

    def contrib(c: str):
        return F.coalesce(F.lit(1.0) / (F.col(c) + F.lit(k)), F.lit(0.0))

    return j.select(
        F.col("_id").alias(id_col),
        (contrib("_ra") + contrib("_rb")).alias("rrf"),
        F.col("_ra").isNotNull().alias("in_a"),
        F.col("_rb").isNotNull().alias("in_b"),
    )


def mmr_rerank(
    candidates: DataFrame,
    sims: DataFrame,
    k: int,
    lam: float = 0.7,
    id_col: str = "id",
    rel_col: str = "rel",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): greedily pick ``k`` items maximizing
    ``lam * rel(i) - (1 - lam) * max_{j in selected} sim(i, j)`` —
    the standard diversification pass over a retriever's candidate
    list (ties break to the lowest id; the first pick is max rel).

    Scale shape: MMR is inherently sequential in k, so it belongs on
    the driver — but only AFTER the distributed part has bounded the
    problem: ``candidates`` is a top-n list (TakeOrderedAndProject)
    and ``sims`` its n x n pairwise similarities, so the collect is
    n*(n+1) bounded rows, corpus-independent — the same
    bounded-driver-state design as k-means centroids and the ANN
    re-rank candidate sets. All selection arithmetic is IEEE double
    on pre-rounded inputs (Python floats ARE doubles), so a generated
    SQL oracle replays it exactly.

    ``candidates``: (id_col, rel_col); ``sims``: (ia, ib, s) for every
    ordered candidate pair. Output: (id_col, mmr_rank int), k rows.
    """
    spark = candidates.sparkSession
    cand_rows = candidates.select(id_col, rel_col).collect()  # bounded: top-n list
    rel = {r[id_col]: float(r[rel_col]) for r in cand_rows}
    sim: dict[tuple, float] = {}
    for r in sims.select("ia", "ib", "s").collect():  # bounded: n x n
        sim[(r["ia"], r["ib"])] = float(r["s"])
    one_m = 1.0 - lam
    selected: list = []
    remaining = set(rel)
    while remaining and len(selected) < k:
        if not selected:
            best = max(remaining, key=lambda i: (rel[i], ), default=None)
            # deterministic low-id tie-break on equal rel
            best = min((i for i in remaining if rel[i] == rel[best]))
        else:
            def score(i):
                # a candidate with NO sim row against any selected item
                # scores None — matching the SQL oracle, where the
                # correlated max is NULL and ORDER BY m DESC sorts it
                # after every non-null score (NULLS LAST), ties by id
                known = [sim[(i, j)] for j in selected if (i, j) in sim]
                if not known:
                    return None
                return lam * rel[i] - one_m * max(known)
            scored = {i: score(i) for i in remaining}
            non_null = [v for v in scored.values() if v is not None]
            if non_null:
                top = max(non_null)
                best = min(i for i in remaining if scored[i] == top)
            else:
                best = min(remaining)
        selected.append(best)
        remaining.discard(best)
    out = [(i, n + 1) for n, i in enumerate(selected)]
    id_type = dict(candidates.dtypes)[id_col]
    return spark.createDataFrame(out, f"{id_col} {id_type}, mmr_rank int")


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional-index phrase search: find every document containing
    the exact token sequence ``phrase``, with occurrence count and
    first position.

    The scale shape is the inverted-index algorithm in ONE corpus
    pass: tokenize + posexplode to postings (token, doc, pos), keep
    only the phrase's terms (the per-term posting lists ARE the
    index), group them per document in a single shuffle, then
    intersect the adjacent posting lists with array HOFs — a start
    position survives iff every term's list contains pos + offset.
    Cost after the one scan is bounded by the phrase terms' posting
    sizes, never the corpus; each per-term list is bound to a column
    ONCE before the intersection lambda (Column exprs are trees — an
    inline reference would re-filter the postings per element).
    Tokens are the shared whitespace tokenizer (functions/text.tokens),
    positions 1-based.

    Output: id_col, n_occurrences (BIGINT), first_pos (INT).
    """
    if len(phrase) < 2:
        raise ValueError("phrase_search needs at least two tokens")
    from functools import reduce

    from stream_processing_platform_spark.functions.text import tokens

    postings = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("_pos0", "_tok"),
    ).select(id_col, (F.col("_pos0") + 1).alias("pos"), "_tok")
    grouped = (
        postings.filter(F.col("_tok").isin(*sorted(set(phrase))))
        .groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(F.col("_tok").alias("t"), F.col("pos").alias("p"))
            ).alias("_tp")
        )
    )
    def _is(term: str):
        # factory, not a default-arg lambda: PySpark counts lambda
        # params to pick the (x) vs (x, i) HOF form (CLAUDE.md)
        return lambda x: x["t"] == F.lit(term)

    for i, term in enumerate(phrase):
        grouped = grouped.withColumn(
            f"_p{i}",
            F.transform(F.filter(F.col("_tp"), _is(term)), lambda x: x["p"]),
        )
    starts = F.filter(
        F.col("_p0"),
        lambda s: reduce(
            lambda a, b: a & b,
            [
                F.array_contains(F.col(f"_p{i}"), s + i)
                for i in range(1, len(phrase))
            ],
        ),
    )
    return (
        grouped.select(
            id_col,
            F.size(starts).cast("long").alias("n_occurrences"),
            F.array_min(starts).cast("int").alias("first_pos"),
        )
        .filter(F.col("n_occurrences") > 0)
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_co: int = 2,
    max_basket_items: int = 100,
) -> DataFrame:
    """Market-basket 2-itemset mining: co-occurrence counts plus the
    classic support / confidence / lift metrics — the Apriori pair
    level, the recommender/affinity primitive.

    Scale shape: items are distinct-ed per basket first (map-side
    partial), oversized baskets (> ``max_basket_items``) are DROPPED
    before the pair expansion — the same skew cap as the winnowing
    bucket expansion: one pathological 1M-item basket would otherwise
    contribute 10¹² pairs. The expansion itself is a basket-keyed
    self-join (co-partitioned, no product across baskets), bounded by
    cap² per basket; item supports are one aggregate; the metrics join
    attaches two per-item counts (row-per-item tables — broadcast at
    scale). All metrics are exact integer ppm (floor division), so the
    oracle matches bit-for-bit.

    Output: item_a, item_b (item_a < item_b), co_count, supp_ppm,
    conf_a_to_b_ppm (co/support(a)), lift_ppm.
    """
    from stream_processing_platform_spark.partitioning import checkpointer

    b = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    sized = b.groupBy("_b").agg(F.count("*").alias("_bs"))
    ok = sized.filter(F.col("_bs") <= max_basket_items).select("_b")
    # four consumers (count, supports, both self-join sides) — left
    # un-materialized each would re-run the distinct + cap chain
    b = checkpointer(b)(b.join(ok, "_b", "semi"))
    # basket total as a LAZY one-row frame (the oracle's CROSS JOIN nb
    # shape) — an eager count() would run jobs at construction time and
    # bake a stale literal into the plan
    nb = b.agg(F.count_distinct("_b").alias("_n"))
    support = b.groupBy("_i").agg(F.count("*").alias("cnt"))
    l, r = b.alias("l"), b.alias("r")
    pairs = (
        l.join(r, (F.col("l._b") == F.col("r._b")) & (F.col("l._i") < F.col("r._i")))
        .groupBy(F.col("l._i").alias("item_a"), F.col("r._i").alias("item_b"))
        .agg(F.count("*").alias("co_count"))
        .filter(F.col("co_count") >= min_co)
    )
    sa = support.select(F.col("_i").alias("item_a"), F.col("cnt").alias("_ca"))
    sb = support.select(F.col("_i").alias("item_b"), F.col("cnt").alias("_cb"))
    out = (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(nb))
    )
    co = F.col("co_count")
    return out.select(
        "item_a",
        "item_b",
        co,
        (co * 1_000_000).cast("long").alias("_s"),
        F.col("_ca"),
        F.col("_cb"),
        F.col("_n"),
    ).select(
        "item_a",
        "item_b",
        "co_count",
        F.expr("_s div _n").alias("supp_ppm"),
        F.expr("_s div _ca").alias("conf_a_to_b_ppm"),
        # lift's numerator co·n·1e6 exceeds int64 once co·n > 9.2e12
        # (any popular pair at lake scale): run the one wide product in
        # DECIMAL(38,0) — exact integer floor, same value duckdb's
        # HUGEINT `//` computes
        F.expr(
            "CAST(floor(CAST(co_count AS DECIMAL(38,0)) * _n * 1000000"
            " / (CAST(_ca AS DECIMAL(38,0)) * _cb)) AS BIGINT)"
        ).alias("lift_ppm"),
    )
