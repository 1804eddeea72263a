"""Similarity search over the ``embeddings`` table.

- ``knn_brute_force``: exact cosine top-k for a fixed query set — the
  correctness baseline.
- ``ann_lsh_bucketed``: the scale path — random-hyperplane LSH with
  Hamming<=1 multi-probe. Sign bits of hyperplane dot products form a
  bucket key; candidates are scored when their bucket is the query's
  or differs in ONE bit (multi-probe buys most of a second hash
  table's recall for zero extra index space — the probe set is just
  N_PLANES power-of-two XORs). Hyperplanes are derived from md5 so
  Spark and the oracle share them exactly (embedded as literals on the
  SQL side). Plane count trades candidate volume vs recall: 2^8
  buckets here; at 100-TB corpus sizes planes grow ~log2(N) to hold
  the per-bucket candidate count constant.

Execution shape (measured, not guessed): both operators score with one
numpy GEMM per Arrow batch against a broadcast of the (small) query
matrix — the canonical 100-TB layout: block the big side, broadcast the
small side. A Catalyst higher-order fold (zip_with + aggregate) for the
dot products is interpreted per element (lambda bodies don't codegen)
and its 12-plane x 64-literal expression tree costs seconds of analysis
+ codegen on first run; the GEMM path replaces ~20M interpreted lambda
steps with vectorized BLAS and a three-node plan.

Each batch emits only its local top-k per query (global top-k is a
subset of the union of per-batch top-k), so the final window ranks
|queries| x k x n_batches rows, not Q x N — at scale the shuffle into
the window is constant-size per partition.

Determinism vs the DuckDB oracle: similarities are rounded to 6
decimals *before* ranking on both sides, which absorbs BLAS-vs-
sequential summation-order noise (~1e-15, vs the 5e-7 rounding
quantum); remaining ties break on the unique neighbor id. Bucket sign
bits are exact: the smallest |dot| across every SF's data is 5.5e-6 —
nine orders of magnitude above reordering noise — so numpy and DuckDB
agree on every sign.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DIM = 64
N_PLANES = 8
N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 10
SCORE_SCHEMA = "query_id bigint, neighbor_id bigint, cos_sim double"


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1]: component
    (p, d) = md5("p:d") first 8 hex as u32, scaled. Reproducible in any
    engine with md5."""
    planes = []
    for p in range(N_PLANES):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8]
            row.append(int(h, 16) / 0xFFFFFFFF * 2.0 - 1.0)
        planes.append(row)
    return planes


def _load_queries(sf_dir: str):
    """Driver-side read of the (tiny) query rows — the same direct
    pyarrow read any broadcast-variable build uses; no Spark job."""
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = tbl["vec_id"].to_numpy()
    mat = (
        tbl["embedding"]
        .combine_chunks()
        .values.to_numpy(zero_copy_only=False)
        .astype(np.float64)
        .reshape(len(ids), -1)
    )
    qmask = ids < N_QUERIES
    q_ids = ids[qmask]
    qm = mat[qmask]
    qnorm = np.sqrt((qm * qm).sum(axis=1))
    return q_ids, qm, qnorm


def _make_score(b_q, top_k: int, bucketed: bool):
    """Build the worker-side scoring generator. Everything the closure
    touches is defined inside this function so cloudpickle ships it by
    value — workers never need this package on their import path.

    Per-batch top-k per query: -inf marks masked (self / off-bucket)
    pairs; the sort key (-sim, neighbor_id) matches the final window's
    total order, so taking k per batch is exact, not approximate."""

    def score(batches):
        import numpy as np
        import pandas as pd

        if bucketed:
            q_ids, qm, qnorm, qbucket, planes, weights = b_q.value
        else:
            q_ids, qm, qnorm = b_q.value
        for pdf in batches:
            c_ids = pdf["vec_id"].to_numpy()
            c = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            cnorm = np.sqrt((c * c).sum(axis=1))
            sims = np.round(qm @ c.T / (qnorm[:, None] * cnorm[None, :]), 6)
            mask = q_ids[:, None] == c_ids[None, :]
            if bucketed:
                cbucket = (
                    (c @ planes.T >= 0).astype(np.int64) * weights
                ).sum(axis=1)
                # multi-probe: candidate iff bucket XOR is 0 or a power
                # of two (Hamming distance <= 1)
                xor = qbucket[:, None] ^ cbucket[None, :]
                mask |= (xor & (xor - 1)) != 0
            sims[mask] = -np.inf
            out_q, out_n, out_s = [], [], []
            for i in range(len(q_ids)):
                row = sims[i]
                valid = np.nonzero(row != -np.inf)[0]
                if len(valid) == 0:
                    continue
                order = valid[np.lexsort((c_ids[valid], -row[valid]))][:top_k]
                out_q.extend([q_ids[i]] * len(order))
                out_n.extend(c_ids[order])
                out_s.extend(row[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    return score


def _rank_topk(scored: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _emb_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 8 partitions: each mapInPandas partition spawns a Python worker,
    # and the GEMM itself is microseconds at this block size, so worker
    # startup dominates and fewer/fatter blocks win. At real scale the
    # block count ~= input splits and this repartition disappears.
    return (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .repartition(8)
    )


# --------------------------------------------------------------------------
# exact brute-force top-k
# --------------------------------------------------------------------------
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    q_ids, qm, qnorm = _load_queries(sf_dir)
    b_q = spark.sparkContext.broadcast((q_ids, qm, qnorm))
    score = _make_score(b_q, TOP_K, bucketed=False)
    return _rank_topk(_emb_blocks(spark, sf_dir).mapInPandas(score, SCORE_SCHEMA))


_DOT_SQL = "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"

KNN_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt({_DOT_SQL.format(a='embedding::DOUBLE[]', b='embedding::DOUBLE[]')}) AS norm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_DOT_SQL.format(a='q.v', b='c.v')} / (q.norm * c.norm), 6) AS cos_sim
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# LSH-bucketed ANN
# --------------------------------------------------------------------------
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    planes = np.array(_hyperplanes())
    weights = (1 << np.arange(N_PLANES)).astype(np.int64)

    q_ids, qm, qnorm = _load_queries(sf_dir)
    qbucket = ((qm @ planes.T >= 0).astype(np.int64) * weights).sum(axis=1)
    b_q = spark.sparkContext.broadcast(
        (q_ids, qm, qnorm, qbucket, planes, weights)
    )
    score = _make_score(b_q, TOP_K, bucketed=True)
    return _rank_topk(_emb_blocks(spark, sf_dir).mapInPandas(score, SCORE_SCHEMA))


def _ann_oracle_sql() -> str:
    planes = _hyperplanes()
    bits = " + ".join(
        f"(CASE WHEN {_DOT_SQL.format(a='[' + ', '.join(repr(x) for x in plane) + ']', b='v')} >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p, plane in enumerate(planes)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt({_DOT_SQL.format(a='embedding::DOUBLE[]', b='embedding::DOUBLE[]')}) AS norm
  FROM embeddings
),
bucketed AS (
  SELECT vec_id, v, norm, CAST({bits} AS BIGINT) AS bucket FROM e
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_DOT_SQL.format(a='q.v', b='c.v')} / (q.norm * c.norm), 6) AS cos_sim
  FROM bucketed q
  JOIN bucketed c
    ON q.vec_id < {N_QUERIES}
   AND (q.bucket = c.bucket
        OR xor(q.bucket, c.bucket) IN ({", ".join(str(1 << p) for p in range(N_PLANES))}))
   AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# IVF ANN: coarse quantizer + n-probe search
# --------------------------------------------------------------------------
# Deterministic coarse centroids: the embeddings of a fixed vec_id
# range (present at every SF). A trained k-means would replace these at
# production; everything downstream (assignment, probing, pruning) is
# identical, and fixed seeds keep the DuckDB oracle exact.
CENTROID_LO = N_QUERIES  # centroids are vec_ids [8, 24)
N_CENTROIDS = 16
N_PROBE = 4


def _load_centroids(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = tbl["vec_id"].to_numpy()
    mat = (
        tbl["embedding"]
        .combine_chunks()
        .values.to_numpy(zero_copy_only=False)
        .astype(np.float64)
        .reshape(len(ids), -1)
    )
    cmask = (ids >= CENTROID_LO) & (ids < CENTROID_LO + N_CENTROIDS)
    c_ids = ids[cmask]
    order = np.argsort(c_ids)
    c_ids = c_ids[order]
    cm = mat[cmask][order]
    cnorm = np.sqrt((cm * cm).sum(axis=1))
    return c_ids, cm, cnorm


def _cell_assigner():
    """Nearest-centroid helper built as a LOCAL function: worker-side
    closures must capture it from an enclosing scope so cloudpickle
    ships it BY VALUE. A module-level function would be pickled by
    reference (module.qualname) and the driver's Python workers would
    need this package importable — not true when the driver runs from
    an arbitrary cwd (the same reason _make_score keeps everything
    inside the closure)."""

    def assign_cells(vecs, vnorm, c_ids, cm, cnorm):
        """Nearest centroid by rounded cosine, ties to the lowest
        centroid id — the same total order the SQL oracle's
        row_number uses."""
        import numpy as np

        sims = np.round(vecs @ cm.T / (vnorm[:, None] * cnorm[None, :]), 6)
        # argmax returns the FIRST max index and c_ids are ascending,
        # so the lowest centroid id wins ties — matching the oracle's
        # ORDER BY sim DESC, cid ASC
        best = np.argmax(sims, axis=1)
        return c_ids[best], sims

    return assign_cells


def ivf_cell_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, ivf_cell): every vector's coarse cell. At 100 TB this
    column is the *layout key* — writing the corpus partitioned by
    ivf_cell turns n-probe search into partition pruning (only nprobe
    of n_centroids partitions are scanned); this operator is the
    assignment pass of that write. One GEMM per Arrow batch against the
    broadcast centroid matrix, no shuffle."""
    c_ids, cm, cnorm = _load_centroids(sf_dir)
    b_c = spark.sparkContext.broadcast((c_ids, cm, cnorm))
    assign_cells = _cell_assigner()  # local => shipped by value

    def assign(batches):
        import numpy as np
        import pandas as pd

        c_ids_, cm_, cnorm_ = b_c.value
        for pdf in batches:
            v_ids = pdf["vec_id"].to_numpy()
            v = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["embedding"]]
            )
            vnorm = np.sqrt((v * v).sum(axis=1))
            cells, _ = assign_cells(v, vnorm, c_ids_, cm_, cnorm_)
            yield pd.DataFrame({"vec_id": v_ids, "ivf_cell": cells})

    return _emb_blocks(spark, sf_dir).mapInPandas(
        assign, "vec_id bigint, ivf_cell bigint"
    )


def _centroid_cte() -> str:
    return f"""
e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         sqrt({_DOT_SQL.format(a='embedding::DOUBLE[]', b='embedding::DOUBLE[]')}) AS norm
  FROM embeddings
),
cent AS (
  SELECT vec_id AS cid, v AS cv, norm AS cn FROM e
  WHERE vec_id >= {CENTROID_LO} AND vec_id < {CENTROID_LO + N_CENTROIDS}
),
assigned AS (
  SELECT vec_id, ivf_cell FROM (
    SELECT e.vec_id, cent.cid AS ivf_cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round({_DOT_SQL.format(a='e.v', b='cent.cv')} / (e.norm * cent.cn), 6) DESC,
                      cent.cid ASC
           ) AS rn
    FROM e CROSS JOIN cent
  ) t WHERE rn = 1
)"""


IVF_ASSIGN_SQL = f"""
WITH {_centroid_cte()}
SELECT vec_id, ivf_cell FROM assigned
"""


def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF n-probe top-k: each query scores only candidates whose cell
    is among its {N_PROBE} nearest centroids. Same blocked-GEMM shape
    as the other ANN paths — broadcast (queries + centroids), one GEMM
    per batch for assignment and one for scoring, per-batch exact
    top-k, final window over |queries| x k x n_batches rows. With the
    ivf_cell-partitioned layout (see ivf_cell_assignment) the mask
    becomes partition pruning and non-probed cells are never read."""
    import numpy as np

    q_ids, qm, qnorm = _load_queries(sf_dir)
    c_ids, cm, cnorm = _load_centroids(sf_dir)
    qsims = np.round(qm @ cm.T / (qnorm[:, None] * cnorm[None, :]), 6)
    # top-nprobe centroids per query (desc sim, asc centroid id)
    probes = np.stack(
        [
            c_ids[np.lexsort((c_ids, -qsims[i]))[:N_PROBE]]
            for i in range(len(q_ids))
        ]
    )
    b_q = spark.sparkContext.broadcast(
        (q_ids, qm, qnorm, probes, c_ids, cm, cnorm)
    )
    top_k = TOP_K
    assign_cells = _cell_assigner()  # local => shipped by value

    def score(batches):
        import numpy as np
        import pandas as pd

        q_ids_, qm_, qnorm_, probes_, c_ids_, cm_, cnorm_ = b_q.value
        for pdf in batches:
            n_ids = pdf["vec_id"].to_numpy()
            c = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["embedding"]]
            )
            cnorm_v = np.sqrt((c * c).sum(axis=1))
            cells, _ = assign_cells(c, cnorm_v, c_ids_, cm_, cnorm_)
            sims = np.round(
                qm_ @ c.T / (qnorm_[:, None] * cnorm_v[None, :]), 6
            )
            # (Q, N) mask: candidate's cell not probed by the query
            in_probe = (cells[None, :, None] == probes_[:, None, :]).any(
                axis=2
            )
            mask = (q_ids_[:, None] == n_ids[None, :]) | ~in_probe
            sims[mask] = -np.inf
            out_q, out_n, out_s = [], [], []
            for i in range(len(q_ids_)):
                row = sims[i]
                valid = np.nonzero(row != -np.inf)[0]
                if len(valid) == 0:
                    continue
                order = valid[np.lexsort((n_ids[valid], -row[valid]))][:top_k]
                out_q.extend([q_ids_[i]] * len(order))
                out_n.extend(n_ids[order])
                out_s.extend(row[order])
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
            )

    return _rank_topk(
        _emb_blocks(spark, sf_dir).mapInPandas(score, SCORE_SCHEMA)
    )


IVF_PROBE_SQL = f"""
WITH {_centroid_cte()},
qprobe AS (
  SELECT query_id, ivf_cell FROM (
    SELECT e.vec_id AS query_id, cent.cid AS ivf_cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round({_DOT_SQL.format(a='e.v', b='cent.cv')} / (e.norm * cent.cn), 6) DESC,
                      cent.cid ASC
           ) AS rn
    FROM e CROSS JOIN cent
    WHERE e.vec_id < {N_QUERIES}
  ) t WHERE rn <= {N_PROBE}
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_DOT_SQL.format(a='q.v', b='c.v')} / (q.norm * c.norm), 6) AS cos_sim
  FROM e q
  JOIN assigned a_c ON TRUE
  JOIN e c ON c.vec_id = a_c.vec_id
  JOIN qprobe p ON p.query_id = q.vec_id AND p.ivf_cell = a_c.ivf_cell
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {TOP_K}
"""


# --------------------------------------------------------------------------
# k-means (fixed Lloyd rounds) — the canonical iterative-refinement
# pattern on Spark: centroids live on the driver and reach every row as
# literals (a broadcast of K x DIM values), assignment + the per-cluster
# mean are ONE hash aggregate with map-side partial sums (64 avg columns
# — no explode, no shuffle of vectors beyond the K-key agg). Distances
# and recomputed centroid components are rounded to 6 decimals at each
# synchronization point so both engines iterate from bit-identical
# state: parallel-vs-sequential mean summation differs ~1e-13, nine
# orders below the 5e-7 rounding quantum (same margin argument as the
# cosine ops above). Fixed iteration count keeps the op expressible as
# a chained-CTE SQL oracle.
# --------------------------------------------------------------------------
KMEANS_K = 4
KMEANS_ROUNDS = 2  # assign -> recompute, twice; final assignment output


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )

    def assign(cents: list[tuple[int, list[float]]]) -> DataFrame:
        arr = F.array(
            *[
                F.struct(
                    F.round(
                        F.aggregate(
                            F.zip_with(
                                F.col("v"),
                                F.lit(c),
                                lambda x, y: (x - y) * (x - y),
                            ),
                            F.lit(0.0),
                            lambda a, x: a + x,
                        ),
                        6,
                    ).alias("d"),
                    F.lit(cid).alias("cid"),
                )
                for cid, c in cents
            ]
        )
        best = F.array_min(arr)
        return emb.select(
            "vec_id",
            "v",
            best["cid"].alias("cluster"),
            best["d"].alias("dist"),
        )

    # deterministic seeds: the K lowest vec_ids' vectors
    seeds = (
        emb.filter(F.col("vec_id") < KMEANS_K).orderBy("vec_id").collect()
    )
    cents = [(int(r["vec_id"]), list(r["v"])) for r in seeds]
    for _ in range(KMEANS_ROUNDS - 1):
        asg = assign(cents)
        means = asg.groupBy("cluster").agg(
            *[
                F.round(F.avg(F.col("v")[i]), 6).alias(f"m{i}")
                for i in range(DIM)
            ]
        )
        cents = [
            (int(r["cluster"]), [r[f"m{i}"] for i in range(DIM)])
            for r in means.collect()
        ]
        cents.sort()
    return assign(cents).select("vec_id", "cluster", "dist")


def _kmeans_oracle_sql() -> str:
    def assign_cte(src: str, cent: str, out: str) -> str:
        return f"""{out} AS (
  SELECT vec_id, v, cid AS cluster, d AS dist
  FROM (
    SELECT e.vec_id, e.v, c.cid,
           round(list_sum(list_transform(list_zip(e.v, c.c),
                 p -> (p[1] - p[2]) * (p[1] - p[2]))), 6) AS d,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round(list_sum(list_transform(
                                list_zip(e.v, c.c),
                                p -> (p[1] - p[2]) * (p[1] - p[2]))), 6),
                                c.cid) AS rk
    FROM {src} e CROSS JOIN {cent} c
  ) t WHERE rk = 1
)"""

    def means_cte(src: str, out: str) -> str:
        return f"""{out} AS (
  SELECT cluster AS cid, list(m ORDER BY i) AS c
  FROM (
    SELECT cluster, i, round(avg(v[i + 1]), 6) AS m
    FROM {src} CROSS JOIN (SELECT unnest(range({DIM})) AS i) idx
    GROUP BY cluster, i
  ) g GROUP BY cluster
)"""

    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {KMEANS_K}),
{assign_cte("e", "c0", "a1")},
{means_cte("a1", "c1")},
{assign_cte("e", "c1", "a2")}
SELECT vec_id, cluster, dist FROM a2
"""


QUERIES = {
    "knn_brute_force": knn_brute_force,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "ivf_cell_assignment": ivf_cell_assignment,
    "ann_ivf_probe": ann_ivf_probe,
    "kmeans_embeddings": kmeans_embeddings,
}

ORACLE = {
    "knn_brute_force": KNN_SQL,
    "ann_lsh_bucketed": _ann_oracle_sql(),
    "ivf_cell_assignment": IVF_ASSIGN_SQL,
    "ann_ivf_probe": IVF_PROBE_SQL,
    "kmeans_embeddings": _kmeans_oracle_sql(),
}
