"""fastText-style linear quality classifier, trained reproducibly.

The canonical LLM-data-pipeline quality filter (CCNet / GPT-3 style):
label a corpus with a cheap heuristic rule, train a linear classifier
over hashed bag-of-token features on those weak labels, then use the
learned model as the production gate.  The reference engine has no
trained-model surface at all (its quality gates are rule-only — cf.
reference ``taskmanager/operators/transformations.py`` map/filter ops);
this is new capability in the LLM-pipeline family, same tier as the
Gopher rules / DSIR weights.

Reproducible-training doctrine (the r9 k-means recipe applied to
logistic regression — ``operators/clustering.py:kmeans_fit_reproducible``):

- **Features**: hashed token buckets, ``md5(token)[:15] % dim`` — the
  SimHash md5-derived token hash that both engines compute identically
  (``operators/dedup.py:379``).  Per-doc feature = RAW integer bucket
  counts (bag of words) plus a BIAS pseudo-feature (bucket ``dim``,
  cnt 1).  Raw counts, not counts/total: token activations (~1-5) then
  sit on the same scale as the bias activation (1), so full-batch GD is
  well-conditioned — the normalized form put the bias on a 30x larger
  scale and oscillated at any learning rate that moved the token
  weights at all (measured: stuck at the majority baseline).
- **Weights on the 1e-6 integer grid** (micro-units).  The per-doc
  logit numerator ``z_num = sum(cnt_j * w_j)`` is an EXACT BIGINT
  (order-free); the only float ops per doc are ``z = z_num / 1e6`` and
  one ``exp`` inside the sigmoid, immediately floor-rounded back to the
  grid (``p_micro = floor(1e6/(1+exp(-z)) + 0.5)``).
- **Gradient** per (doc, bucket) is ``(p_micro - y*1e6) * cnt`` — an
  exact integer with NO rounding step at all; the per-bucket sum is an
  exact BIGINT, invariant to shuffle order and engine.  |contribution|
  <= 1e6 * cnt, so int64 holds to ~1e11 training docs at 100-token
  docs (beyond that you subsample the training set anyway — nobody
  full-batches 10^12 docs).
- **Update** ``w -= floor(lr_num * G / (lr_den * n) + 0.5)`` — exact
  integers into one IEEE double division, identical across engines
  while ``|lr_num * G| < 2^53`` (the kmeans_fit_reproducible
  precondition; holds at every oracle SF by orders of magnitude).

Because every step is exact (or floor-rounded to a shared grid), the
duckdb oracle replays the ENTIRE training trajectory as a generated CTE
chain (``training_ctes_sql``) and the final predictions hash-MATCH —
the q_kmeans_embeddings doctrine applied to gradient descent.

Scale shape: the feature frame is built once (one token explode + one
(doc, bucket)-keyed partial-aggregated shuffle, then a doc-keyed
combine) and persisted; each GD iteration is then ONE scan of it — a
per-doc map (logit + sigmoid, no join: the dim+1 weight vector rides
along as a literal array) plus a (dim+1)-key map-side-combined
aggregate.  Driver state is the (dim+1)-int weight vector (the MLlib
pattern).  No all-pairs product, no per-row Python.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Micro-unit grid shared by weights, probabilities and gradients.
CLF_SCALE = 1_000_000


def bucket_col(tok: Column, dim: int) -> Column:
    """Hash bucket of a token: first 15 md5 hex digits mod dim (the
    SimHash token-hash recipe — cross-engine exact, dedup.py:379)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long") % dim


def bucket_sql(tok_expr: str, dim: int) -> str:
    """duckdb twin of :func:`bucket_col` (same md5 prefix, same mod)."""
    return f"CAST(('0x' || substr(md5({tok_expr}), 1, 15)) AS BIGINT) % {dim}"


@dataclass(frozen=True)
class LogRegModel:
    """Trained weights in micro-units; index ``dim`` is the bias."""

    dim: int
    weights: tuple[int, ...]  # len == dim + 1, 1e-6 grid integers


def doc_features(docs: DataFrame, tokens_col: Column, dim: int) -> DataFrame:
    """(doc_id, pairs) — sparse hashed bucket counts per document, with
    the bias pseudo-feature (bucket=dim, cnt=1) appended.  Documents
    with zero tokens produce no row (inner explode), matching the SQL
    feature CTE.

    One explode + one (doc_id, bucket) partial-aggregated shuffle, then
    a doc-keyed combine; at 100 TB both aggregates are map-side
    combined and the result is ~vocab-per-doc ints per doc.
    """
    tok = docs.select(F.col("doc_id"), F.explode(tokens_col).alias("tok"))
    feat = (
        tok.select("doc_id", bucket_col(F.col("tok"), dim).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    return feat.groupBy("doc_id").agg(
        F.concat(
            F.collect_list(F.struct("bucket", "cnt")),
            F.array(
                F.struct(
                    F.lit(dim).cast("long").alias("bucket"),
                    F.lit(1).cast("long").alias("cnt"),
                )
            ),
        ).alias("pairs")
    )


def _z_num(pairs: Column, w: list[int]) -> Column:
    """Exact BIGINT logit numerator: sum(cnt * w[bucket]) over the
    sparse pairs.  The weight vector is a single literal array node —
    bounded HOF (pairs ~ vocab-per-doc, not corpus-sized)."""
    w_arr = F.lit(w)
    return F.aggregate(
        pairs,
        F.lit(0).cast("long"),
        lambda acc, s: acc + s["cnt"] * F.element_at(w_arr, s["bucket"].cast("int") + 1),
    )


def _p_micro(z_num: Column) -> Column:
    """floor(1e6 * sigmoid(z_num / 1e6) + 0.5) as BIGINT — one division
    + one exp, immediately floor-rounded to the grid."""
    zd = z_num.cast("double") / F.lit(float(CLF_SCALE))
    return F.floor(F.lit(float(CLF_SCALE)) / (F.lit(1.0) + F.exp(-zd)) + F.lit(0.5)).cast(
        "long"
    )


def logreg_fit_reproducible(
    feats: DataFrame,
    label_col: str,
    dim: int,
    iters: int = 15,
    lr_num: int = 1,
    lr_den: int = 20,
) -> LogRegModel:
    """Full-batch gradient descent on the 1e-6 integer grid.

    ``feats`` must carry (pairs, <label_col> in {0,1}) — build it with
    :func:`doc_features` joined to the label rule.  Weights start at 0
    (p = 0.5 exactly — deterministic without any RNG).  Per iteration:
    one scan, one (dim+1)-key aggregate, one (dim+1)-int collect.
    """
    n = feats.count()
    if n == 0:
        raise ValueError("empty training set")
    w = [0] * (dim + 1)
    for _ in range(iters):
        scored = feats.withColumn("_p", _p_micro(_z_num(F.col("pairs"), w))).withColumn(
            "_e", F.col("_p") - F.col(label_col).cast("long") * CLF_SCALE
        )
        grad = (
            scored.select(F.explode("pairs").alias("s"), F.col("_e"))
            .select(
                F.col("s.bucket").alias("bucket"),
                (F.col("_e") * F.col("s.cnt")).alias("gc"),
            )
            .groupBy("bucket")
            .agg(F.sum("gc").alias("g"))
            .collect()
        )
        g = {int(r["bucket"]): int(r["g"]) for r in grad}
        # Python float division == CAST(.. AS DOUBLE)/CAST(.. AS DOUBLE)
        # while |lr_num * G| < 2^53 (kmeans_fit_reproducible precondition).
        w = [
            w[j] - math.floor(lr_num * g.get(j, 0) / (lr_den * n) + 0.5)
            for j in range(dim + 1)
        ]
    return LogRegModel(dim=dim, weights=tuple(w))


def logreg_fit_ovr_reproducible(
    feats: DataFrame,
    class_col: str,
    classes: tuple[str, ...],
    dim: int,
    iters: int = 15,
    lr_num: int = 1,
    lr_den: int = 20,
) -> dict[str, LogRegModel]:
    """One-vs-rest multiclass: one binary model per class over ONE
    shared feature frame, all classes advanced in a SINGLE Spark job
    per iteration (the per-class errors ride as extra columns into one
    (dim+1)-key aggregate with one sum per class). The per-class
    arithmetic is bit-identical to :func:`logreg_fit_reproducible` —
    exact-integer gradients on the 1e-6 grid — so a per-class
    ``training_ctes_sql(suffix=...)`` chain replays each model
    unchanged; the fusion only removes Spark job overhead (4 classes x
    k iterations was 4k jobs; now k — measured 80 s -> ~25 s on the
    r13 language-ID query at sf0.01)."""
    n = feats.count()
    if n == 0:
        raise ValueError("empty training set")
    ws = {c: [0] * (dim + 1) for c in classes}
    for _ in range(iters):
        # ONE select for all k error columns: chained withColumn calls
        # each re-analyze the growing plan eagerly (k analyses of the
        # HOF-heavy logit trees per iteration, pure driver time).
        scored = feats.select(
            "*",
            *[
                (
                    _p_micro(_z_num(F.col("pairs"), ws[c]))
                    - (F.col(class_col) == c).cast("long") * CLF_SCALE
                ).alias(f"_e_{c}")
                for c in classes
            ],
        )
        grad = (
            scored.select(
                F.explode("pairs").alias("s"),
                *[F.col(f"_e_{c}") for c in classes],
            )
            .groupBy(F.col("s.bucket").alias("bucket"))
            .agg(
                *[
                    F.sum(F.col(f"_e_{c}") * F.col("s.cnt")).alias(f"g_{c}")
                    for c in classes
                ]
            )
            .collect()
        )
        for c in classes:
            g = {int(r["bucket"]): int(r[f"g_{c}"]) for r in grad}
            ws[c] = [
                ws[c][j] - math.floor(lr_num * g.get(j, 0) / (lr_den * n) + 0.5)
                for j in range(dim + 1)
            ]
    return {c: LogRegModel(dim=dim, weights=tuple(ws[c])) for c in classes}


def logreg_score(feats: DataFrame, model: LogRegModel) -> DataFrame:
    """(doc_id, p_micro, pred) for every doc in ``feats`` — pred from
    the EXACT integer logit sign (z_num >= 0 <=> p >= 0.5), so the
    decision never touches a float."""
    w = list(model.weights)
    z = _z_num(F.col("pairs"), w)
    return feats.select(
        "doc_id",
        _p_micro(z).alias("p_micro"),
        F.when(z >= 0, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("pred"),
    )


# ---------------------------------------------------------------------------
# Generated-oracle side: the same trajectory as ANSI SQL CTEs.
# ---------------------------------------------------------------------------


def training_ctes_sql(
    feat_cte: str | None,
    label_cte: str,
    dim: int,
    iters: int,
    lr_num: int,
    lr_den: int,
    suffix: str = "",
) -> list[str]:
    """CTE chain replaying :func:`logreg_fit_reproducible` in duckdb.

    ``feat_cte`` must define ``feat(doc_id, bucket, cnt)`` INCLUDING
    the bias row (bucket=dim, cnt=1) — or be ``None`` when a shared
    ``feat`` CTE was already emitted by an earlier chain (the r13
    one-vs-rest language-ID oracle trains four chains over ONE feature
    CTE); ``label_cte`` must define ``lbl{suffix}(doc_id, y)`` over the
    TRAINING docs only (restricted to docs present in ``feat``).  Ends
    at ``w{suffix}{iters}(bucket, w)``; ``suffix`` namespaces every
    chain CTE (lbl/ntrain/w/z/p/g) so multiple trainings compose in one
    WITH — the default '' reproduces the original names.  Shared by
    every classifier query's oracle (one generator, every consumer —
    the generated-oracle doctrine).  Every chain CTE is MATERIALIZED:
    duckdb inlines multiply-referenced CTEs by default, and a 15-level
    w{t}->g{t}->p{t}->z{t}->w{t-1} chain re-expands EXPONENTIALLY
    without it (measured: file-handle exhaustion at 15 iterations;
    the 5-iteration k-means chain only survived by being shallow).
    """
    s = float(CLF_SCALE)
    x = suffix
    ctes = [] if feat_cte is None else [feat_cte]
    ctes += [
        label_cte,
        f"ntrain{x} AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM lbl{x})",
        f"w{x}0 AS MATERIALIZED (SELECT CAST(range AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS w"
        f" FROM range({dim + 1}))",
    ]
    for t in range(iters):
        # exact BIGINT logit numerator, then sigmoid floor-rounded to
        # the grid; the error e and gradient e*cnt are exact integers.
        ctes.append(
            f"z{x}{t} AS MATERIALIZED (SELECT f.doc_id, l.y, sum(f.cnt * w.w) AS z_num"
            f" FROM feat f JOIN w{x}{t} w USING (bucket) JOIN lbl{x} l USING (doc_id)"
            f" GROUP BY f.doc_id, l.y)"
        )
        ctes.append(
            f"p{x}{t} AS MATERIALIZED (SELECT doc_id, y,"
            f" CAST(floor({s} / (1.0 + exp(-(CAST(z_num AS DOUBLE) / {s})))"
            f" + 0.5) AS BIGINT) AS p"
            f" FROM z{x}{t})"
        )
        ctes.append(
            f"g{x}{t} AS MATERIALIZED (SELECT f.bucket,"
            f" sum((p.p - p.y * {CLF_SCALE}) * f.cnt) AS g"
            f" FROM feat f JOIN p{x}{t} p USING (doc_id) GROUP BY f.bucket)"
        )
        ctes.append(
            f"w{x}{t + 1} AS MATERIALIZED (SELECT w.bucket, w.w - CAST(floor({lr_num}.0"
            f" * CAST(COALESCE(g.g, 0) AS DOUBLE) / ({lr_den}.0 * n.n) + 0.5)"
            f" AS BIGINT) AS w"
            f" FROM w{x}{t} w LEFT JOIN g{x}{t} g USING (bucket) CROSS JOIN ntrain{x} n)"
        )
    return ctes
