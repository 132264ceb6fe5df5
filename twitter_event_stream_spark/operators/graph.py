"""Graph operators for dedup clustering (SURVEY §2.2 K-family extension).

A training-data pipeline doesn't stop at near-dup *pairs*: it needs the
*clusters* (connected components of the pair graph) so each group of
near-copies keeps exactly one canonical document. Spark has no built-in
connected components, so this module implements Pregel-style min-label
propagation as an iterative DataFrame loop — every iteration is one
distributed join + aggregate (no driver-side graph state; the driver only
holds the converged/changed counter), which is the standard large-scale CC
formulation ("hash-min"; cf. Kiveris et al., *Connected Components in
MapReduce and Beyond*, SoCC'14 — the two-phase variants there are the
upgrade path if components span many hops at 100 TB; near-dup components
are dense and shallow, so plain hash-min converges in a handful of rounds).
"""

from __future__ import annotations

import logging

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_event_stream_spark import registry
from twitter_event_stream_spark.registry import query
from twitter_event_stream_spark.tables import table

_LOG = logging.getLogger(__name__)

#: Convergence telemetry of the most recent :func:`connected_components`
#: call in this process (r16, r15 verdict #4 — BENCH_NOTES records the
#: measured CC round counts per scale so a future super-linear drift in
#: `q_corpus_curation_full`'s 10× ratio is distinguishable from the graph
#: simply needing an extra fixpoint round). Driver-side counters only —
#: nothing here touches the plan or adds a job; the distributed loop's
#: round count is read off the SAME per-round convergence action the loop
#: already runs. Keys: phase ("local"|"distributed"), rounds (sweeps of
#: the hash-min + pointer-jump fixpoint), edges (local phase: collected
#: edge rows; distributed: None — counting them would add a job),
#: converged (False only when the distributed loop exhausted max_iter
#: with labels still moving — a truncated run must never masquerade as
#: a measured convergence in the drift bookkeeping).
CC_LAST_RUN: dict = {
    "phase": None, "rounds": 0, "edges": None, "converged": None,
}


#: integer widths for the CC output schema: when src/dst disagree (e.g. an
#: int id column joined against a bigint one), labels from the wider column
#: must not be written into the narrower type (overflow / createDataFrame
#: error) — take the wider of the two.
_INT_WIDTH = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}


def _node_type(edges: DataFrame, src: str, dst: str) -> str:
    st = edges.schema[src].dataType.simpleString()
    dt = edges.schema[dst].dataType.simpleString()
    if st == dt:
        return st
    if st in _INT_WIDTH and dt in _INT_WIDTH:
        return st if _INT_WIDTH[st] >= _INT_WIDTH[dt] else dt
    raise ValueError(
        f"connected_components endpoint types must match or both be "
        f"integers: {src}:{st} vs {dst}:{dt}"
    )


def _cc_local(spark: SparkSession, pdf: pd.DataFrame, schema: str) -> DataFrame:
    """Driver-side finish for a contracted (bounded) CC graph: the SAME
    hash-min + pointer-doubling fixpoint as the distributed loop, run
    vectorized in numpy — O(E) per sweep, ~log(diameter) sweeps, so a
    2M-edge list resolves in milliseconds after ONE bounded collect.
    Nodes are mapped to their sorted-order index, so "min label" is
    min-by-value for any orderable id type, identical to the distributed
    semantics. ``pdf`` is the already-collected (a, b) edge list — the
    caller collects exactly once, so phase pick and local finish see the
    same rows even for a nondeterministic input."""
    import numpy as np

    pdf = pdf.dropna()
    if len(pdf) == 0:
        # still the most recent call: stale telemetry from an earlier
        # graph must not be attributed to this (empty) one
        CC_LAST_RUN.update(phase="local", rounds=0, edges=0, converged=True)
        return spark.createDataFrame([], schema)
    nodes = np.unique(np.concatenate([pdf["a"].to_numpy(), pdf["b"].to_numpy()]))
    order = {v: i for i, v in enumerate(nodes)}  # sorted → index order = id order
    ea = pdf["a"].map(order).to_numpy()
    eb = pdf["b"].map(order).to_numpy()
    lab = np.arange(len(nodes))
    sweeps = 0
    while True:
        sweeps += 1
        old = lab.copy()
        np.minimum.at(lab, ea, lab[eb])
        np.minimum.at(lab, eb, lab[ea])
        while True:  # pointer doubling to the per-sweep fixpoint
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, old):
            break
    CC_LAST_RUN.update(
        phase="local", rounds=sweeps, edges=len(pdf), converged=True
    )
    _LOG.info(
        "connected_components: local fixpoint over %d edges converged in "
        "%d sweeps", len(pdf), sweeps,
    )
    out = pd.DataFrame({"node": nodes, "label": nodes[lab]})
    return spark.createDataFrame(out, schema=schema)


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Min-label propagation over an undirected edge list.

    Returns (node, label) where label = min node id reachable from node.
    Two-phase (r7, the Kiveris et al. SoCC'14 posture): the candidate-pair
    graphs this engine clusters are already CONTRACTED by upstream banding
    (MinHash/SimHash buckets, IVF cells) — edges ≈ dup-rate × corpus, tiny
    relative to the documents. When the edge count is under
    ``local_threshold`` (default 2M edges ≈ 32 MB, the same order as a
    broadcast dim table), one bounded collect + a vectorized numpy
    hash-min (:func:`_cc_local`, the identical fixpoint) replaces 4-6
    scheduler rounds — milliseconds instead of seconds, exactly the
    "finish small graphs locally" phase of the two-phase algorithm. The
    count that picks the phase is one job over the caller's (cached) pair
    list; pass ``local_threshold=0`` to force the distributed loop.

    Distributed phase — each round: every node takes min(own label,
    neighbors' labels) — one shuffle join + one shuffle agg — then
    **path-shortens** with a pointer jump ``label ← label(label)`` (one
    more equi-join; every label value is itself a node id, so the join is
    total). Hash-min alone converges in graph-diameter rounds; with the
    jump, label chains halve each round, so convergence is O(log diameter)
    — at 100 TB the round count, not the per-round shuffle, is the
    dominant cost, and near-dup chains of length d resolve in ~log2(d)
    sweeps over the label set. Deterministic (pure min semilattice; the
    jump only accelerates the same fixpoint). Nodes with no edges are not
    returned (caller treats them as singletons). Both phases return the
    same labels (pinned by test), so the threshold is a latency knob,
    never a semantics switch.

    Exactly ONE Spark action per distributed round: the previous label
    rides through the aggregate as ``max(old)`` (each node contributes it
    exactly once), so convergence is read with a narrow ``isEmpty`` over
    the checkpointed round result instead of a second join+count job.

    Null edge endpoints are dropped in BOTH phases (a null is not a node),
    so the threshold stays a pure latency knob for edge lists with nulls
    too, not just for the inner-join outputs the registered callers pass.
    """
    node_type = _node_type(edges, src, dst)
    schema = f"node {node_type}, label {node_type}"
    nn = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    if local_threshold > 0:
        # ONE bounded collect decides the phase AND, when the local phase
        # wins, IS its input: limit(threshold+1) short-circuits instead of
        # counting an arbitrarily large pair list end-to-end, and because
        # phase pick and local finish read the same collected rows, a
        # nondeterministic/uncached edge lineage cannot disagree between a
        # count job and a later collect (r7 advice).
        pdf = nn.limit(local_threshold + 1).toPandas()
        if len(pdf) <= local_threshold:
            return _cc_local(edges.sparkSession, pdf, schema)
    # localCheckpoint (eager) truncates lineage every round — without it the
    # logical plan doubles per iteration and the driver OOMs building plan
    # strings long before the data is large.
    e = (
        nn.union(nn.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    label_type = labels.schema["label"].dataType.simpleString()
    rounds = 0
    converged = False
    for _ in range(max_iter):
        rounds += 1
        nbr = (
            e.join(labels.select(F.col("node").alias("b"), "label"), "b")
            .select(
                F.col("a").alias("node"),
                F.col("label").alias("cand"),
                F.lit(None).cast(label_type).alias("old"),
            )
        )
        hashmin = (
            labels.select(
                "node",
                F.col("label").alias("cand"),
                F.col("label").alias("old"),
            )
            .unionByName(nbr)
            .groupBy("node")
            .agg(F.min("cand").alias("label"), F.max("old").alias("old"))
        )
        # Pointer jump: label(label) ≤ label always (labels only shrink and
        # every label is a node id present in `hashmin`), so the jumped
        # label is just the parent's label.
        parent = hashmin.select(
            F.col("node").alias("label"), F.col("label").alias("jumped")
        )
        merged = (
            hashmin.join(parent, "label")
            .select("node", F.col("jumped").alias("label"), "old")
            .localCheckpoint()
        )
        labels = merged.select("node", "label")
        # label = min(old, neighbor labels) ≤ old, so "<" means it moved.
        if merged.filter(F.col("label") < F.col("old")).isEmpty():
            converged = True
            break
    CC_LAST_RUN.update(
        phase="distributed", rounds=rounds, edges=None, converged=converged
    )
    if converged:
        _LOG.info(
            "connected_components: distributed fixpoint converged in %d "
            "rounds (max_iter %d)", rounds, max_iter,
        )
    else:
        # a truncated run must never masquerade as a measured
        # convergence (r16 review) — the drift bookkeeping keys on this
        _LOG.warning(
            "connected_components: max_iter %d exhausted with labels "
            "still moving — returned labels are NOT converged", max_iter,
        )
    return labels


# Shared-per-session cache for the near-dup graph. The three graph queries
# (CC clustering, corpus curation, PageRank) all consume the same MinHash
# candidate-pair edge list, and two of them the same CC labels; recomputing
# the shingle→signature→band pipeline per query tripled the cost of the
# correctness sweep. Keyed by (Spark application, sf_dir) so a new session
# or a different scale factor rebuilds; values are localCheckpoint'ed, so
# the cached plan is a scan of materialized blocks, not a live lineage.
# Bounded: LRU-evicted past _GRAPH_CACHE_MAX entries (a session normally
# holds 2 kinds × 1-3 sf_dirs; the cap only matters for long-lived sessions
# sweeping many fixture dirs, where unbounded growth would pin dead
# checkpoint blocks).
_GRAPH_CACHE: dict[tuple[str, str, str], DataFrame] = {}
_GRAPH_CACHE_MAX = 8


def _cached(spark: SparkSession, sf_dir: str, kind: str, build) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, kind)
    df = _GRAPH_CACHE.pop(key, None)  # pop+reinsert = move to MRU position
    if df is None:
        df = build().localCheckpoint()
    _GRAPH_CACHE[key] = df
    while len(_GRAPH_CACHE) > _GRAPH_CACHE_MAX:
        _GRAPH_CACHE.pop(next(iter(_GRAPH_CACHE)))
    return df


def neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-MinHash candidate pairs (a_id, b_id), computed once per
    (session, sf_dir) and reused by every graph query."""
    return _cached(
        spark,
        sf_dir,
        "pairs",
        lambda: registry.get("q_llm_minhash_det").fn(spark, sf_dir).select("a_id", "b_id"),
    )


def neardup_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component labels over :func:`neardup_pairs`, cached like
    the pairs (CC is iterative — by far the most expensive shared piece)."""
    return _cached(
        spark,
        sf_dir,
        "labels",
        lambda: connected_components(neardup_pairs(spark, sf_dir), "a_id", "b_id"),
    )


@query(
    "q_llm_dedup_cluster",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, length(text) - 1),
                                                 i -> substr(text, i, 3)))) AS shingle
      FROM documents WHERE doc_id < 200
    ), sig AS (
      SELECT doc_id, band,
             min(substr(md5(shingle || '#' || CAST(band AS VARCHAR)), 1, 16)) AS sig
      FROM sh CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS band) b
      GROUP BY doc_id, band
    ), pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
                           AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= 7
    ), e AS (
      SELECT a_id AS a, b_id AS b FROM pairs
      UNION SELECT b_id, a_id FROM pairs
    ), reach(src, dst) AS (
      SELECT a, b FROM e
      UNION
      SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
    ), labels AS (
      SELECT src AS node, least(src, min(dst)) AS label FROM reach GROUP BY src
    )
    SELECT d.doc_id,
           coalesce(l.label, d.doc_id) AS cluster_id,
           (coalesce(l.label, d.doc_id) = d.doc_id) AS is_canonical
    FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
    WHERE d.doc_id < 200
    """,
)
def q_llm_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-extra — dedup clustering: connected components over the
    deterministic-MinHash near-dup pair graph (q_llm_minhash_det), each doc
    labeled with its cluster id (min doc_id in the component) and whether it
    is the canonical representative a pipeline would keep. Docs with no
    near-dup are their own singleton cluster. The oracle states the same
    fixpoint as a recursive transitive closure — feasible at oracle scale,
    while the engine's label propagation runs one distributed round per
    graph-diameter hop at any scale."""
    labels = neardup_labels(spark, sf_dir)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    cluster = F.coalesce(F.col("label"), F.col("doc_id"))
    return (
        d.join(
            F.broadcast(labels.select(F.col("node").alias("doc_id"), "label")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            cluster.alias("cluster_id"),
            (cluster == F.col("doc_id")).alias("is_canonical"),
        )
    )


@query(
    "q_corpus_curation",
    oracle=f"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, length(text) - 1),
                                                 i -> substr(text, i, 3)))) AS shingle
      FROM documents WHERE doc_id < 200
    ), sig AS (
      SELECT doc_id, band,
             min(substr(md5(shingle || '#' || CAST(band AS VARCHAR)), 1, 16)) AS sig
      FROM sh CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS band) b
      GROUP BY doc_id, band
    ), pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
                           AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= 7
    ), e AS (
      SELECT a_id AS a, b_id AS b FROM pairs
      UNION SELECT b_id, a_id FROM pairs
    ), reach(src, dst) AS (
      SELECT a, b FROM e
      UNION
      SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
    ), labels AS (
      SELECT src AS node, least(src, min(dst)) AS label FROM reach GROUP BY src
    ), curated AS (
      SELECT d.doc_id, d.lang,
             len(string_split(d.text, ' ')) AS n_tokens,
             len(list_distinct(string_split(d.text, ' ')))
               / CAST(len(string_split(d.text, ' ')) AS DOUBLE) AS uniq_ratio
      FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
      WHERE d.doc_id < 200
        AND coalesce(l.label, d.doc_id) = d.doc_id  -- canonical per near-dup cluster
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           {{R}} AS avg_uniq_ratio
    FROM curated
    WHERE uniq_ratio >= 0.3
    GROUP BY lang
    """.replace("{R}", "floor((avg(uniq_ratio)) * 1000000 + 0.505) / 1000000"),
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-flagship — the end-to-end corpus-curation step a training pipeline
    runs: near-dup clustering keeps one canonical doc per cluster
    (q_llm_dedup_cluster's components), a lexical-diversity quality gate
    drops degenerate texts, and the survivors roll up to per-language corpus
    stats. Every stage is an already-hash-verified primitive; the
    composition is the point — at 100 TB this is one pass over text for
    signatures, diameter-bounded label-propagation rounds on the (tiny)
    signature graph, then a pure-canonical scan for stats."""
    labels = neardup_labels(spark, sf_dir)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)) / n_tokens.cast("double")
    curated = (
        d.join(
            F.broadcast(labels.select(F.col("node").alias("doc_id"), "label")),
            "doc_id",
            "left",
        )
        .filter(F.coalesce(F.col("label"), F.col("doc_id")) == F.col("doc_id"))
        .select("lang", n_tokens.alias("n_tokens"), uniq_ratio.alias("uniq_ratio"))
        .filter(F.col("uniq_ratio") >= 0.3)
    )
    from twitter_event_stream_spark.exprs import rnd

    return curated.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        rnd(F.avg("uniq_ratio"), 6).alias("avg_uniq_ratio"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    iterations: int = 15,
    damping: float = 0.85,
    tol: float | None = None,
    # 3 → 5 (r16): the fixed-iteration lane is scheduler-action bound (the
    # r7 finding), and 15 rounds at 5-per-checkpoint = 3 materializations
    # vs 5 — measured 2.46 → 2.29 s median (interleaved A/B at sf0.1) with
    # the identical math graph; deeper chaining (8) measured no further
    # gain, so 5 stays inside the plan-size comfort zone.
    rounds_per_checkpoint: int = 5,
) -> DataFrame:
    """Power-iteration PageRank over an undirected edge list.

    Each round is one join (rank/degree contributions along edges) + one
    aggregate — the same two-shuffle-per-round shape as
    :func:`connected_components`, with ``localCheckpoint`` truncating
    lineage so the plan stays constant-size across rounds. In the
    fixed-iteration form, ``rounds_per_checkpoint`` power steps chain
    LAZILY between materializations (r7): the plan between truncations is
    a bounded k-deep join+agg chain, so the Spark ACTION count — the
    dominant per-round cost on a dense-small graph, and pure scheduler
    latency at any scale — drops k-fold while the math is unchanged
    (measured 3.4 s → 1.5 s for the 15-round q_pagerank_neardup at
    sf0.01). Undirected symmetrization means every node has out-degree
    ≥ 1, so no dangling-mass redistribution term is needed. Returns
    (node, rank) for nodes with ≥ 1 edge; ranks over those nodes sum
    to ~1.

    With ``tol`` set, iteration stops early once every node's rank moved
    less than ``tol`` — the previous rank rides through the contribution
    aggregate as ``max(old)`` (each node contributes it exactly once), so
    the convergence read is a narrow ``isEmpty`` over the checkpointed
    round result: ONE Spark action per round, same discipline as
    :func:`connected_components`. With ``tol=None`` the exact fixed
    iteration count runs on a leaner per-round plan (no old-rank union) —
    the form the NumPy parity test pins, and what `q_pagerank_neardup`
    uses: at damping 0.85 a 1e-6 L∞ tolerance needs ~50+ rounds (delta
    shrinks as 0.85^t), so on this graph the fixed 15 is strictly cheaper
    than converging — measured 18.5 s vs 3.9 s at sf0.01. ``tol`` exists
    for graphs where ranking stability matters more than round count.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    adj = e.join(deg, "a").localCheckpoint()
    n = deg.count()
    if n == 0:  # empty edge list -> empty ranks, same schema, no 1/0
        return deg.select(F.col("a").alias("node"), F.lit(0.0).alias("rank"))
    ranks = deg.select(F.col("a").alias("node"), F.lit(1.0 / n).alias("rank"))
    base = F.lit((1.0 - damping) / n)
    if tol is None:
        done = 0
        while done < iterations:
            steps = min(rounds_per_checkpoint, iterations - done)
            for _ in range(steps):
                contrib = adj.join(
                    ranks.withColumnRenamed("node", "a"), "a"
                ).select(
                    F.col("b").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"),
                )
                ranks = contrib.groupBy("node").agg(
                    (base + F.lit(damping) * F.sum("c")).alias("rank")
                )
            ranks = ranks.localCheckpoint()
            done += steps
        return ranks
    for _ in range(iterations):
        contrib = adj.join(
            ranks.withColumnRenamed("node", "a"), "a"
        ).select(F.col("b").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
        merged = (
            contrib.withColumn("old", F.lit(None).cast("double"))
            .unionByName(
                ranks.select("node", F.lit(0.0).alias("c"), F.col("rank").alias("old"))
            )
            .groupBy("node")
            .agg(
                (base + F.lit(damping) * F.sum("c")).alias("rank"),
                F.max("old").alias("old"),
            )
            .localCheckpoint()
        )
        ranks = merged.select("node", "rank")
        if merged.filter(F.abs(F.col("rank") - F.col("old")) >= tol).isEmpty():
            break
    return ranks


@query("q_pagerank_neardup")  # ROWS — iterative float sums are partition-order
def q_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centrality over the near-dup graph: PageRank on the deterministic
    MinHash candidate pairs — the canonical-document picker that prefers
    the most-connected member of each duplicate cluster (vs CC's arbitrary
    min-id). Iterative, so no SQL oracle; the test checks the distributed
    ranks against an exact NumPy power iteration on the same edges."""
    edges = neardup_pairs(spark, sf_dir)
    pr = pagerank(edges.select(F.col("a_id").alias("a"), F.col("b_id").alias("b")))
    return pr.select("node", F.round("rank", 6).alias("rank"))


@query(
    "q_dedup_cluster_stats",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, length(text) - 1),
                                                 i -> substr(text, i, 3)))) AS shingle
      FROM documents WHERE doc_id < 200
    ), sig AS (
      SELECT doc_id, band,
             min(substr(md5(shingle || '#' || CAST(band AS VARCHAR)), 1, 16)) AS sig
      FROM sh CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS band) b
      GROUP BY doc_id, band
    ), pairs AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id
      FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
                           AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) >= 7
    ), e AS (
      SELECT a_id AS a, b_id AS b FROM pairs
      UNION SELECT b_id, a_id FROM pairs
    ), reach(src, dst) AS (
      SELECT a, b FROM e
      UNION
      SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
    ), labels AS (
      SELECT src AS node, least(src, min(dst)) AS label FROM reach GROUP BY src
    ), clustered AS (
      SELECT d.doc_id, coalesce(l.label, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
      WHERE d.doc_id < 200
    ), sizes AS (
      SELECT cluster_id, count(*) AS cluster_size
      FROM clustered GROUP BY cluster_id
    )
    SELECT cluster_size,
           count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
           CAST(cluster_size * count(*) - count(*) AS BIGINT) AS n_removable
    FROM sizes GROUP BY cluster_size
    """,
)
def q_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X101 — dedup cluster-size distribution: for each near-dup cluster
    size, how many clusters, how many documents they hold, and how many a
    keep-one-canonical policy removes — the report a pipeline reads before
    committing a dedup pass (a fat head of large clusters usually means
    boilerplate, not true duplicates). Reuses the per-session cached CC
    labels (`neardup_labels`), so the marginal cost over the clustering
    itself is two aggregations of a doc-count-sized table."""
    labels = neardup_labels(spark, sf_dir)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    clustered = d.join(
        F.broadcast(labels.select(F.col("node").alias("doc_id"), "label")),
        "doc_id",
        "left",
    ).select(F.coalesce("label", "doc_id").alias("cluster_id"))
    sizes = clustered.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).cast("long").alias("n_docs"),
        (F.col("cluster_size") * F.count(F.lit(1)) - F.count(F.lit(1)))
        .cast("long")
        .alias("n_removable"),
    )
