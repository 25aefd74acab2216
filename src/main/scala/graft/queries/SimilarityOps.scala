package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables
import graft.ops.Similarity

/** Similarity search over `embeddings` (SURVEY.md §2.9 X2 + the ANN /
  * embedding near-dup extensions).
  */
object SimilarityOps {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.load(s, dir, n)

  /** Shared oracle body: exact per-vector cosine vs the vec_id=0 probe,
    * computed in double via 1-based list indexing (dim = 64). */
  private def cosineSql(candFilter: String): String =
    s"""WITH b AS (SELECT vec_id, embedding,
                     ${signBucketSql("embedding")} AS bkt
              FROM embeddings),
        probe AS (SELECT embedding AS p, bkt AS pbkt FROM b WHERE vec_id = 0),
        cand AS (SELECT vec_id, embedding FROM b CROSS JOIN probe
                 WHERE $candFilter),
        d AS (SELECT c.vec_id,
                     sum(CAST(c.embedding[i] AS DOUBLE) * CAST(p.p[i] AS DOUBLE)) AS dp,
                     sqrt(sum(CAST(c.embedding[i] AS DOUBLE)
                            * CAST(c.embedding[i] AS DOUBLE))) AS na,
                     sqrt(sum(CAST(p.p[i] AS DOUBLE)
                            * CAST(p.p[i] AS DOUBLE))) AS nb
              FROM cand c CROSS JOIN probe p, range(1, 65) t(i)
              GROUP BY c.vec_id)
        SELECT vec_id, round(dp / (na * nb), 4) AS cos_sim FROM d
        ORDER BY cos_sim DESC, vec_id LIMIT 10"""

  /** DuckDB replay of Similarity.cosineTopKIvfSeeded(8 cells, 6 probed,
    * k=10) + the recall-vs-exact gate: assignment ranks rounded cosine
    * with centroid-id tie-break, exactly as the Spark window does. */
  private def ivfSeededSql: String = {
    // rounded cosine between a vector column pair, summed over 64 dims
    def cos(a: String, b: String) =
      s"""round(sum(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))
           / (sqrt(sum(CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)))
              * sqrt(sum(CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))), 4)"""
    s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv
                       FROM embeddings WHERE vec_id < 8),
        probe AS (SELECT embedding AS p FROM embeddings WHERE vec_id = 0),
        ac AS (SELECT e.vec_id, c.cid, ${cos("e.embedding", "c.cv")} AS cs
               FROM embeddings e CROSS JOIN cents c, range(1, 65) t(i)
               GROUP BY e.vec_id, c.cid),
        asgn AS (SELECT vec_id, cid AS cell FROM (
                   SELECT vec_id, cid, row_number() OVER (
                     PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
                   FROM ac) WHERE rn = 1),
        pcell AS (SELECT cid AS pcell FROM (
                    SELECT c.cid, ${cos("c.cv", "p.p")} AS pcs
                    FROM cents c CROSS JOIN probe p, range(1, 65) t(i)
                    GROUP BY c.cid)
                  ORDER BY pcs DESC, cid ASC LIMIT 6),
        scored AS (SELECT e.vec_id, ${cos("e.embedding", "p.p")} AS cos_sim
                   FROM embeddings e
                   JOIN asgn a ON a.vec_id = e.vec_id
                   JOIN pcell ON a.cell = pcell
                   CROSS JOIN probe p, range(1, 65) t(i)
                   GROUP BY e.vec_id),
        ivf AS (SELECT vec_id, cos_sim FROM scored
                ORDER BY cos_sim DESC, vec_id ASC LIMIT 10),
        ext AS (SELECT e.vec_id, ${cos("e.embedding", "p.p")} AS cs
                FROM embeddings e CROSS JOIN probe p, range(1, 65) t(i)
                GROUP BY e.vec_id
                ORDER BY cs DESC, vec_id ASC LIMIT 10),
        rec AS (SELECT count(*) AS recall10
                FROM ivf JOIN ext USING (vec_id))
        SELECT ivf.vec_id, ivf.cos_sim, rec.recall10
        FROM ivf CROSS JOIN rec WHERE recall10 >= 8
        ORDER BY cos_sim DESC, vec_id ASC"""
  }

  private def signBucketSql(v: String, nBits: Int = 8): String =
    (0 until nBits)
      .map(j => s"(CASE WHEN $v[${j + 1}] > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("(", " + ", ")")

  val entries: Seq[Entry] = Seq(

    // X2 — exact brute-force cosine top-10 vs the vec_id=0 probe.
    Entry("x2_cosine_topk",
      (s, dir) => Similarity.cosineTopK(
        t(s, dir, "embeddings"), "embedding", "vec_id", 0L, 10),
      Some(cosineSql("TRUE"))),

    // X2b — sign-LSH bucketed ANN top-10 (multi-probe hamming <= 1):
    // the scale path — candidates shrink ~2^-8 * 9 of the data.
    Entry("x2_cosine_topk_ann",
      (s, dir) => Similarity.cosineTopKApprox(
        t(s, dir, "embeddings"), "embedding", "vec_id", 0L, 10, 8),
      Some(cosineSql("bit_count(xor(bkt, pbkt)) <= 1"))),

    // X2c — IVF ANN top-10 on DETERMINISTIC SEED CENTROIDS (the 8
    // lowest-id vectors; argmax rounded-cosine assignment, 6 of 8 cells
    // probed): relational index + query that DuckDB replays end-to-end
    // → full hash oracle. The k-means variant
    // (Similarity.cosineTopKIvf, seeded MLlib fit) remains the
    // data-adaptive engine path, recall-asserted in SimilaritySpec.
    // 8 cells / 6 probed (75% scan fraction): these synthetic
    // embeddings are nearly unclustered; on real (clustered)
    // embeddings the same operator runs at 2-4% scan fraction — the
    // dial is explicit. The `recall10` column counts overlap with the
    // EXACT top-10 computed in the same query and the output is gated
    // on recall10 >= 8 (replayed in the oracle's WHERE), so a recall
    // collapse empties the result on either engine.
    // persist: the 10-row IVF result feeds BOTH the overlap agg and
    // the final join; released by the harness's clearCache-after-query.
    Entry("x2_cosine_topk_ivf",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val ivf = Similarity.cosineTopKIvfSeeded(
          emb, "embedding", "vec_id", 0L, 10, 8, 6).persist()
        val exact = Similarity.cosineTopK(emb, "embedding", "vec_id", 0L, 10)
          .select(col("vec_id").as("e_id"))
        val overlap = ivf.join(exact, col("vec_id") === col("e_id"),
            "left_semi")
          .agg(count(lit(1)).as("recall10"))
        ivf.crossJoin(broadcast(overlap))
          .filter(col("recall10") >= 8)
          .orderBy(desc("cos_sim"), asc("vec_id"))
      },
      Some(ivfSeededSql)),

    // Embedding-cosine near-duplicate pairs, sign-bucket blocked
    // (8 bits = 256 buckets: ~16x fewer within-bucket pairs than 4).
    Entry("x2_embedding_neardup",
      (s, dir) => Similarity.embeddingNearDupPairs(
        t(s, dir, "embeddings"), "embedding", "vec_id", 0.95, 8)
        .orderBy("d1", "d2"),
      Some(s"""WITH b AS (SELECT vec_id, embedding,
                     ${signBucketSql("embedding", 8)} AS bkt
                FROM embeddings),
              pairs AS (
                SELECT b1.vec_id AS d1, b2.vec_id AS d2,
                       b1.embedding AS v1, b2.embedding AS v2
                FROM b b1 JOIN b b2
                  ON b1.bkt = b2.bkt AND b1.vec_id < b2.vec_id),
              d AS (SELECT d1, d2,
                     sum(CAST(v1[i] AS DOUBLE) * CAST(v2[i] AS DOUBLE)) AS dp,
                     sqrt(sum(CAST(v1[i] AS DOUBLE) * CAST(v1[i] AS DOUBLE))) AS na,
                     sqrt(sum(CAST(v2[i] AS DOUBLE) * CAST(v2[i] AS DOUBLE))) AS nb
                    FROM pairs, range(1, 65) t(i) GROUP BY d1, d2)
              SELECT d1, d2, round(dp / (na * nb), 4) AS cos_sim FROM d
              WHERE dp / (na * nb) >= 0.95
              ORDER BY d1, d2""")),

    // X2e — per-label embedding stats over fixed dimensions (the
    // column-statistics pass an embedding store runs for drift checks):
    // count + per-dimension sums, no explode — element_at is 1-based in
    // both engines, floats widened to double before summing.
    Entry("x2e_dim_stats",
      (s, dir) => t(s, dir, "embeddings")
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n"),
          round(sum(element_at(col("embedding"), 1).cast("double")), 4)
            .as("sum_d1"),
          round(sum(element_at(col("embedding"), 2).cast("double")), 4)
            .as("sum_d2"),
          round(sum(element_at(col("embedding"), 64).cast("double")), 4)
            .as("sum_d64"))
        .orderBy("label"),
      Some("""SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
                     round(sum(CAST(embedding[1] AS DOUBLE)), 4) AS sum_d1,
                     round(sum(CAST(embedding[2] AS DOUBLE)), 4) AS sum_d2,
                     round(sum(CAST(embedding[64] AS DOUBLE)), 4) AS sum_d64
              FROM embeddings GROUP BY label ORDER BY label""")),

    // X36 — SEMANTIC decontamination: flag corpus vectors whose cosine
    // against ANY benchmark/eval vector reaches 0.30 — the
    // embedding-space sibling of t_decontaminate (n-gram overlap
    // catches verbatim leaks; this catches paraphrased ones). Eval set
    // = the fixed vec_id < 25 slice, the real-world shape: the eval
    // set is CONSTANT-sized while the corpus grows, so it ships to
    // every executor as one broadcast row of quantized state and the
    // corpus is scored ROW-LOCALLY — zero corpus-keyed exchange at any
    // scale (the t_decontam_bloom contract in embedding space; the
    // only exchange in the plan is the presentation sort).
    // Exactness: embeddings quantize to e3 BIGINT (round() ties away
    // from zero on BOTH engines, and a float->double->*1000 chain is
    // bit-identical IEEE either side), so dot products and norms are
    // ORDER-INDEPENDENT integer sums — no float-accumulation drift for
    // the hash gate to trip on. The single cos^2 division and sqrt
    // that follow are one correctly-rounded IEEE op each on identical
    // integer inputs, so the 0.09 (=0.30^2) threshold compare and the
    // reported max_cos_e4 are deterministic cross-engine. The gate
    // condition dp>0 AND dp^2 >= 0.09*na2*nb2 avoids materializing any
    // cosine for the (vast) unflagged majority. Ties on best cosine
    // break to the smallest eval id via the (cos^2, -eid) struct max.
    Entry("x36_semantic_decontam",
      (s, dir) => Similarity.semanticDecontam(
        t(s, dir, "embeddings"), "embedding", "vec_id",
        evalMaxId = 25, cos2Threshold = 9e-2)
        .orderBy("vec_id"),
      Some("""WITH q AS (SELECT vec_id, list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
                       AS qv
                     FROM embeddings),
              nrm AS (SELECT q.vec_id,
                             CAST(sum(q.qv[i] * q.qv[i]) AS BIGINT) AS n2
                      FROM q, range(1, 65) t(i) GROUP BY 1),
              ev AS (SELECT q.vec_id AS eid, q.qv AS qe, n2 AS nb2
                     FROM q JOIN nrm USING (vec_id) WHERE vec_id < 25),
              corp AS (SELECT q.vec_id, q.qv, n2 AS na2
                       FROM q JOIN nrm USING (vec_id) WHERE vec_id >= 25),
              d AS (SELECT c.vec_id, e.eid, c.na2, e.nb2,
                           CAST(sum(c.qv[i] * e.qe[i]) AS BIGINT) AS dp
                    FROM corp c CROSS JOIN ev e, range(1, 65) t(i)
                    GROUP BY 1, 2, 3, 4),
              h AS (SELECT *,
                           CAST(dp AS DOUBLE) * CAST(dp AS DOUBLE)
                             / (CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE))
                             AS c
                    FROM d
                    WHERE dp > 0
                      AND CAST(dp AS DOUBLE) * CAST(dp AS DOUBLE)
                            >= 9e-2 * (CAST(na2 AS DOUBLE)
                                       * CAST(nb2 AS DOUBLE))),
              r AS (SELECT *,
                           row_number() OVER (PARTITION BY vec_id
                             ORDER BY c DESC, eid ASC) AS rk,
                           count(*) OVER (PARTITION BY vec_id) AS n_hits
                    FROM h)
              SELECT vec_id, CAST(n_hits AS BIGINT) AS n_hits,
                     CAST(round(sqrt(c) * 10000) AS BIGINT) AS max_cos_e4,
                     eid AS eval_id
              FROM r WHERE rk = 1 ORDER BY vec_id""")),

    // X15 — exact k-NN classification: majority label of the 5 nearest
    // neighbors (rounded cosine, self excluded) for the first 10
    // vectors — the labeling-QA / label-propagation primitive. Rank
    // ties break on neighbor id, vote ties on smallest label: fully
    // deterministic, strict hash gate. The probe side is a 10-row
    // broadcast; at scale candidate generation swaps to the LSH/IVF
    // forms (x2b/x2c).
    Entry("x15_knn_classify",
      (s, dir) => Similarity.knnClassify(
        t(s, dir, "embeddings"), "embedding", "vec_id", "label", 10, 5)
        .orderBy("probe_id"),
      Some("""WITH p AS (SELECT vec_id AS probe_id, embedding AS pv,
                       CAST(label AS BIGINT) AS true_label
                FROM embeddings WHERE vec_id < 10),
              c AS (SELECT p.probe_id, p.true_label, e.vec_id,
                           CAST(e.label AS BIGINT) AS nbr_label,
                           round(sum(CAST(e.embedding[i] AS DOUBLE)
                                   * CAST(p.pv[i] AS DOUBLE))
                             / (sqrt(sum(CAST(e.embedding[i] AS DOUBLE)
                                       * CAST(e.embedding[i] AS DOUBLE)))
                              * sqrt(sum(CAST(p.pv[i] AS DOUBLE)
                                       * CAST(p.pv[i] AS DOUBLE)))), 4)
                             AS cs
                    FROM embeddings e CROSS JOIN p, range(1, 65) t(i)
                    WHERE e.vec_id <> p.probe_id
                    GROUP BY 1, 2, 3, 4),
              r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
                      ORDER BY cs DESC, vec_id ASC) AS rk FROM c),
              v AS (SELECT probe_id, true_label, nbr_label,
                           count(*) AS votes
                    FROM r WHERE rk <= 5 GROUP BY 1, 2, 3),
              w AS (SELECT *, row_number() OVER (PARTITION BY probe_id
                      ORDER BY votes DESC, nbr_label ASC) AS wr FROM v)
              SELECT probe_id, true_label, nbr_label AS pred_label, votes
              FROM w WHERE wr = 1 ORDER BY probe_id""")),

    // X13 — per-label centroid outliers: the 3 vectors farthest (squared
    // euclidean) from their label's mean embedding — the mislabeled /
    // contaminated-cluster detector an embedding-QA pass runs. Rank is
    // taken on the ROUNDED distance with vec_id as the final tie-break
    // (the t_tfidf move: sub-ulp cross-engine sum drift cannot reorder
    // a rank computed on the already-rounded score). Plan: one explode
    // (64 x rows), centroid agg over O(labels x dims), broadcast-sized
    // join back, one distance agg, one O(rows)-partitioned rank window —
    // every shuffle keyed, nothing driver-side.
    Entry("x13_centroid_outliers",
      (s, dir) => {
        val ex = t(s, dir, "embeddings")
          .select(col("label").cast("long").as("label"), col("vec_id"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
          .withColumn("v", col("v").cast("double"))
        val cent = ex.groupBy("label", "pos").agg(avg("v").as("c"))
        val d2 = ex.join(broadcast(cent), Seq("label", "pos"))
          .groupBy("label", "vec_id")
          .agg(sum((col("v") - col("c")) * (col("v") - col("c"))).as("d2"))
          .withColumn("d2r", round(col("d2"), 4))
        val w = Window.partitionBy("label")
          .orderBy(col("d2r").desc, col("vec_id").asc)
        d2.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("label"), col("rk").cast("long").as("rk"),
            col("vec_id"), col("d2r"))
          .orderBy("label", "rk")
      },
      Some("""WITH ex AS (
                SELECT CAST(label AS BIGINT) AS label, vec_id, i AS pos,
                       CAST(embedding[i] AS DOUBLE) AS v
                FROM embeddings, range(1, 65) t(i)),
              cent AS (SELECT label, pos, avg(v) AS c
                       FROM ex GROUP BY 1, 2),
              d AS (SELECT e.label, e.vec_id,
                           round(sum((e.v - c.c) * (e.v - c.c)), 4) AS d2r
                    FROM ex e JOIN cent c
                      ON e.label = c.label AND e.pos = c.pos
                    GROUP BY 1, 2),
              r AS (SELECT label, vec_id, d2r,
                           row_number() OVER (PARTITION BY label
                             ORDER BY d2r DESC, vec_id ASC) AS rk
                    FROM d)
              SELECT label, CAST(rk AS BIGINT) AS rk, vec_id, d2r
              FROM r WHERE rk <= 3 ORDER BY label, rk""")),

    // X17 — exact-integer k-means over the embedding space
    // (ops/KMeans): the clustering primitive behind SemDeDup-style
    // semantic dedup (cluster first, then near-dup ONLY within a
    // cluster — the blocking that keeps embedding dedup linear at
    // corpus scale) and cluster-balanced sampling. Lloyd's with
    // quantized-BIGINT vectors, (distance, centroid-id) tie-break, and
    // floor(sum/count) updates — every step exact, so the full 3-pass
    // ITERATIVE fit is hash-oracle-gated (the q45 unrolled-CTE
    // pattern), not rows-only. Centroids are driver fit state (k x 64
    // BIGINTs); assignment is a narrow codegen'd map against literal
    // centroids — zero joins, zero shuffles; each update is one
    // k*dims-cell aggregation.
    Entry("x17_kmeans_clusters",
      (s, dir) => {
        val (_, assign) = graft.ops.KMeans.fit(
          t(s, dir, "embeddings"), "embedding", "vec_id", k = 8,
          iters = 3)
        assign.orderBy("vec_id")
      },
      Some(graft.ops.KMeans.fitSql("embeddings", "embedding", "vec_id",
        k = 8, iters = 3, dims = 64) + "\n        ORDER BY vec_id"),
      sharedInput = Some("embeddings_kmeans_quantized")),

    // X18 — per-cluster diversity representatives: the 5 vectors
    // CLOSEST to their k-means centroid per cluster — the "pick
    // representative exemplars per semantic bucket" selection a
    // curriculum/dedup pipeline runs after X17 (near-centroid docs
    // represent the cluster; far ones are X13-style outliers). One
    // window over the X17 assignment, (dist, vec_id) tie-break.
    Entry("x18_cluster_diversity",
      (s, dir) => {
        val (_, assign) = graft.ops.KMeans.fit(
          t(s, dir, "embeddings"), "embedding", "vec_id", k = 8,
          iters = 3)
        val w = Window.partitionBy("cluster")
          .orderBy(col("dist").asc, col("vec_id").asc)
        assign.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("cluster"), col("rk").cast("long").as("rk"),
            col("vec_id"), col("dist"))
          .orderBy("cluster", "rk")
      },
      Some("""WITH base AS (""" +
        graft.ops.KMeans.fitSql("embeddings", "embedding", "vec_id",
          k = 8, iters = 3, dims = 64) +
        """),
              rr AS (SELECT cluster, vec_id, dist,
                            row_number() OVER (PARTITION BY cluster
                              ORDER BY dist ASC, vec_id ASC) AS rk
                     FROM base)
              SELECT cluster, CAST(rk AS BIGINT) AS rk, vec_id, dist
              FROM rr WHERE rk <= 5 ORDER BY cluster, rk"""),
      sharedInput = Some("embeddings_kmeans_quantized")),

    // X26 — cluster annotation (c-TF-IDF-style top terms): for each
    // k-means cluster over the embedding space, the 5 tokens most
    // over-represented vs the corpus — the "what is this cluster
    // about" labeling step a curation pipeline runs right after X17
    // clustering (NeMo-Curator-style topic inspection; which clusters
    // to drop/upsample is a human decision made from exactly this
    // table). Lift is kept EXACT: lift_e4 = 1e4 * ctf * n DIV
    // (csz * df) over per-doc-distinct token counts — ctf (docs in
    // cluster containing tok), csz (cluster size), df (corpus docs
    // containing tok), n (corpus size) are all integers, so the full
    // iterative fit + scoring replays in DuckDB. df rides the SAME
    // (cluster, tok) aggregate as ctf (summed across clusters per tok
    // — each doc sits in exactly one cluster), so the plan is ONE
    // corpus-token aggregation, one tok-keyed window, two broadcast
    // joins (k-row sizes, 1-row total), one per-cluster top-5 window.
    // df >= 5 drops one-off noise tokens before ranking. 64-bit note:
    // 1e4 * ctf * n overflows past n ~ 9.6e6 docs per cluster-term;
    // beyond that scale drop to double lift (ranking needs ~1e-6
    // relative accuracy) — the exact form is the ORACLE contract at
    // verification scale (the q50/q51 pattern).
    // Bench floor note (r15 verdict task #5): 8 jobs — the k-means
    // fit's init collect + 2 cell-agg collects replayed before this
    // entry's own aggregation/window/top-k jobs (iterative-fit floor,
    // the q45 class). The sharedInput group below keeps the fit's
    // quantized-frame cache warm across the six k-means consumers
    // (cluster once, consume many ways — the pipeline shape), so the
    // replayed passes scan a warm cache; the DRIVER-LOOP job
    // dispatches themselves are the irreducible term at fixture scale.
    Entry("x26_cluster_terms",
      (s, dir) => {
        val (_, assign) = graft.ops.KMeans.fit(
          t(s, dir, "embeddings"), "embedding", "vec_id", k = 8,
          iters = 3)
        // no spread: the round-10 quiet bench measured the pre-explode
        // repartition a NET LOSS on this shape (t_tfidf +0.33s, q13b
        // +0.27s) — the exchange still serializes through the one scan
        // task and then pays shuffle write/read on top
        val toks = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(array_distinct(split(col("text"), " "))).as("tok"))
        val j = toks.join(assign.select(col("vec_id").as("doc_id"),
          col("cluster")), "doc_id")
        val ct = j.groupBy("cluster", "tok").agg(count(lit(1)).as("ctf"))
        val csz = assign.groupBy("cluster").agg(count(lit(1)).as("csz"))
        val nTot = assign.agg(count(lit(1)).as("n"))
        val p = s.conf.get("spark.sql.shuffle.partitions").toInt
        val scored = ct
          .repartition(p, col("tok"))
          .withColumn("df", sum("ctf").over(Window.partitionBy("tok")))
          .filter(col("df") >= 5)
          .join(broadcast(csz), "cluster")
          .crossJoin(broadcast(nTot))
          .withColumn("lift_e4",
            expr("10000 * ctf * n DIV (csz * df)"))
        scored.withColumn("rk", row_number().over(
            Window.partitionBy("cluster")
              .orderBy(col("lift_e4").desc, col("tok").asc)))
          .filter(col("rk") <= 5)
          .select(col("cluster"), col("rk").cast("long").as("rk"),
            col("tok"), col("lift_e4"))
          .orderBy("cluster", "rk")
      },
      Some("""WITH base AS (""" +
        graft.ops.KMeans.fitSql("embeddings", "embedding", "vec_id",
          k = 8, iters = 3, dims = 64) +
        """),
              toks AS (SELECT DISTINCT doc_id,
                              unnest(string_split(text, ' ')) AS tok
                       FROM documents),
              j AS (SELECT b.cluster, t.tok
                    FROM toks t JOIN base b ON t.doc_id = b.vec_id),
              ct AS (SELECT cluster, tok, count(*) AS ctf
                     FROM j GROUP BY 1, 2),
              w AS (SELECT *, sum(ctf) OVER (PARTITION BY tok) AS df
                    FROM ct),
              csz AS (SELECT cluster, count(*) AS csz
                      FROM base GROUP BY 1),
              n AS (SELECT count(*) AS n FROM base),
              scored AS (SELECT w.cluster, w.tok,
                                CAST(10000 * ctf * n // (csz * df)
                                  AS BIGINT) AS lift_e4
                         FROM w JOIN csz USING (cluster) CROSS JOIN n
                         WHERE df >= 5),
              r AS (SELECT *, row_number() OVER (PARTITION BY cluster
                      ORDER BY lift_e4 DESC, tok ASC) AS rk
                    FROM scored)
              SELECT cluster, CAST(rk AS BIGINT) AS rk, tok, lift_e4
              FROM r WHERE rk <= 5 ORDER BY cluster, rk"""),
      sharedInput = Some("embeddings_kmeans_quantized")),

    // X19 — within-cluster nearest neighbor: each vector's closest
    // same-cluster peer (exact integer distance, (dist, id) tie-break)
    // — the SemDeDup SCORING step that X17's clustering exists to make
    // tractable: candidate pairs are quadratic only inside a cluster
    // (n/k per bucket), never across the corpus, which is the blocking
    // that keeps semantic dedup linear at 100 TB (at real scale the
    // within-cluster pair set itself swaps to an X2b/X2c-style
    // candidate generation; the cluster-blocked exact form is the
    // verifiable baseline, the x15 pattern). Self-join keyed on the
    // cluster id — one exchange each side, AQE splits skewed shuffle
    // partitions, and the op logs a warning when any single cluster
    // blows its pair budget (Similarity.withinClusterNN's skew guard).
    Entry("x19_cluster_nn",
      (s, dir) => {
        val q = t(s, dir, "embeddings").select(col("vec_id"),
          graft.ops.KMeans.quantize(col("embedding"), 10000).as("v"))
        val (_, assign) = graft.ops.KMeans.fit(
          t(s, dir, "embeddings"), "embedding", "vec_id", k = 8,
          iters = 3)
        graft.ops.Similarity.withinClusterNN(assign, q, "vec_id")
          .orderBy("vec_id")
      },
      Some("""WITH base AS (""" +
        graft.ops.KMeans.fitSql("embeddings", "embedding", "vec_id",
          k = 8, iters = 3, dims = 64) +
        """),
              q2 AS (SELECT vec_id, list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE)*10000) AS BIGINT))
                       AS v FROM embeddings),
              av AS (SELECT b.vec_id, b.cluster, q2.v
                     FROM base b JOIN q2 USING (vec_id)),
              pr AS (SELECT l.vec_id, l.cluster, r.vec_id AS nn_id,
                            CAST(list_sum(list_transform(
                              generate_series(1, 64),
                              i -> (l.v[i]-r.v[i])*(l.v[i]-r.v[i])))
                              AS BIGINT) AS nn_dist
                     FROM av l JOIN av r ON l.cluster = r.cluster
                       AND l.vec_id != r.vec_id),
              nn AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY nn_dist, nn_id) AS rn FROM pr)
              SELECT vec_id, cluster, nn_id, nn_dist
              FROM nn WHERE rn = 1 ORDER BY vec_id"""),
      sharedInput = Some("embeddings_kmeans_quantized")),

    // P5 — SemDeDup end-to-end: X17's k-means clustering -> X19's
    // within-cluster NN -> a keep/drop decision per vector. A vector is
    // dropped when its nearest same-cluster neighbor is within the
    // distance threshold AND has a smaller id — the min-id keeper
    // contract every dedup operator here shares (x1/x4), decided in ONE
    // hop like the MinHash keeper assignment (full transitive pruning
    // would iterate to a fixpoint, Q36's pointer-jumping). Emits the
    // full audit frame (vec_id, cluster, nn_id, nn_dist, kept 1/0)
    // rather than just survivors, so the drop decisions themselves are
    // oracle-checked. Threshold 1.2e8 on the scale=10000 quantized
    // squared L2 ~= the 10th percentile of fixture NN distances — close
    // near-dups, not whole-cluster wipes. Every stage is the already
    // hash-gated x17/x19 machinery; the oracle replays the composition
    // with the same unrolled CTEs plus the decision CASE.
    Entry("p5_semantic_dedup",
      (s, dir) => {
        val q = t(s, dir, "embeddings").select(col("vec_id"),
          graft.ops.KMeans.quantize(col("embedding"), 10000).as("v"))
        val (_, assign) = graft.ops.KMeans.fit(
          t(s, dir, "embeddings"), "embedding", "vec_id", k = 8,
          iters = 3)
        graft.ops.Similarity.withinClusterNN(assign, q, "vec_id")
          .withColumn("kept",
            when(col("nn_dist") <= lit(120000000L) &&
              col("nn_id") < col("vec_id"), lit(0L)).otherwise(lit(1L)))
          .orderBy("vec_id")
      },
      Some("""WITH base AS (""" +
        graft.ops.KMeans.fitSql("embeddings", "embedding", "vec_id",
          k = 8, iters = 3, dims = 64) +
        """),
              q2 AS (SELECT vec_id, list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE)*10000) AS BIGINT))
                       AS v FROM embeddings),
              av AS (SELECT b.vec_id, b.cluster, q2.v
                     FROM base b JOIN q2 USING (vec_id)),
              pr AS (SELECT l.vec_id, l.cluster, r.vec_id AS nn_id,
                            CAST(list_sum(list_transform(
                              generate_series(1, 64),
                              i -> (l.v[i]-r.v[i])*(l.v[i]-r.v[i])))
                              AS BIGINT) AS nn_dist
                     FROM av l JOIN av r ON l.cluster = r.cluster
                       AND l.vec_id != r.vec_id),
              nn AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                       ORDER BY nn_dist, nn_id) AS rn FROM pr)
              SELECT vec_id, cluster, nn_id, nn_dist,
                     CASE WHEN nn_dist <= 120000000 AND nn_id < vec_id
                          THEN CAST(0 AS BIGINT)
                          ELSE CAST(1 AS BIGINT) END AS kept
              FROM nn WHERE rn = 1 ORDER BY vec_id"""),
      sharedInput = Some("embeddings_kmeans_quantized")),

    // X22 — greedy MMR diverse selection (Similarity.mmrSelect): 5
    // vectors maximizing 2*rel - max-dot-to-selected vs the vec_id=0
    // probe — the diverse-retrieval / curation primitive (on-topic but
    // mutually distant), exact-integer quantized so the full greedy
    // iteration is hash-oracle-gated via unrolled CTEs (the q45/x17
    // pattern). Each round is one narrow map over the persisted
    // relevance frame + TakeOrdered(1); selected vectors are k x dims
    // driver fit state shipped back as literals — zero shuffles.
    Entry("x22_mmr_select",
      (s, dir) => graft.ops.Similarity.mmrSelect(
        t(s, dir, "embeddings"), "embedding", "vec_id", 0L, 5),
      Some(graft.ops.Similarity.mmrSql(
        "embeddings", "embedding", "vec_id", 0L, k = 5, dims = 64))),

    // X23 — cluster-balanced sampling: 3 docs per X17 k-means cluster,
    // priority md5(vec_id) (deterministic "random", rerun/append-stable
    // — the x6/x20 portable-hash selection), vec_id tie-break. The
    // semantic-mixture rebalancer: where X18 picks the REPRESENTATIVE
    // exemplars (closest to centroid) this draws an UNBIASED fixed-size
    // sample per semantic bucket — the "equal tokens per topic"
    // curation move. One window over the assignment frame; the
    // clustering fit is the already-hash-gated x17 machinery, replayed
    // by the oracle via the same unrolled CTEs.
    Entry("x23_cluster_sample",
      (s, dir) => {
        val (_, assign) = graft.ops.KMeans.fit(
          t(s, dir, "embeddings"), "embedding", "vec_id", k = 8,
          iters = 3)
        assign
          .withColumn("pri", md5(col("vec_id").cast("string")))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("cluster")
              .orderBy(col("pri"), col("vec_id"))))
          .filter(col("rk") <= 3)
          .select(col("cluster"), col("rk").cast("long").as("rk"),
            col("vec_id"))
      },
      Some("""WITH base AS (""" +
        graft.ops.KMeans.fitSql("embeddings", "embedding", "vec_id",
          k = 8, iters = 3, dims = 64) +
        """),
              rr AS (SELECT cluster, vec_id,
                            row_number() OVER (PARTITION BY cluster
                              ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                       vec_id) AS rk
                     FROM base)
              SELECT cluster, CAST(rk AS BIGINT) AS rk, vec_id
              FROM rr WHERE rk <= 3 ORDER BY cluster, rk"""),
      sharedInput = Some("embeddings_kmeans_quantized"))
  )
}
