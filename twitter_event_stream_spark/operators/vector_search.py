"""Vectorized similarity-search operators (the performance path for K4/K5).

``knn_topk`` is the engine's high-throughput brute-force cosine top-k:
the candidate corpus is collected once into a dense float64 matrix and
broadcast; probes stream through ``mapInPandas`` where each Arrow batch is a
single BLAS matrix-multiply. ~100× faster than per-pair JVM higher-order
functions at fixture scale (BASELINE.md knn row).

Scale posture (100 TB): a broadcastable candidate matrix is the *block*
primitive, not the whole corpus. At cluster scale the corpus is bucketed
first (IVF coarse quantizer or the random-projection LSH of
``q_llm_ann_lsh``) and this operator runs per bucket — probes join only
their bucket's block. The driver-side ``collect`` below is therefore bounded
by design (one bucket), and the exact-contract HASH variant
(``q_llm_knn_cosine``) stays JVM-side for oracle bit-parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def knn_topk(
    spark: SparkSession,
    candidates: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine top-k of each probe row against the candidate block.

    Returns (probe_id, cand_id, sim, rn); excludes self-matches.
    """
    cand_pd = candidates.select(id_col, vec_col).toPandas()
    ids = cand_pd[id_col].to_numpy()
    mat = np.asarray(cand_pd[vec_col].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def topk_batches(batches):
        c_ids, c_mat, c_norms = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            p_ids = pdf[id_col].to_numpy()
            p_mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            p_norms = np.linalg.norm(p_mat, axis=1)
            sims = (p_mat @ c_mat.T) / (p_norms[:, None] * c_norms[None, :])
            # exclude self-matches by id
            self_mask = p_ids[:, None] == c_ids[None, :]
            sims[self_mask] = -np.inf
            kk = min(k, sims.shape[1] - 1)
            top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = []
            for i in range(len(p_ids)):
                order = top[i][np.lexsort((c_ids[top[i]], -sims[i, top[i]]))]
                for rank, j in enumerate(order, start=1):
                    rows.append((int(p_ids[i]), int(c_ids[j]), float(sims[i, j]), rank))
            yield pd.DataFrame(rows, columns=["probe_id", "cand_id", "sim", "rn"])

    return probes.select(id_col, vec_col).mapInPandas(
        topk_batches, "probe_id long, cand_id long, sim double, rn int"
    )


def knn_bench_query(spark: SparkSession, sf_dir: str, n_probes: int = 100) -> DataFrame:
    """The BASELINE.md knn shape: n-probe cosine top-5 over the whole
    embeddings table, on the vectorized path."""
    from twitter_event_stream_spark.tables import table

    e = table(spark, sf_dir, "embeddings")
    return knn_topk(
        spark, e, e.filter(F.col("vec_id") < n_probes), k=5
    )
