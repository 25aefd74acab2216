package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector-similarity operators over an `array<float>` embedding column:
  * brute-force cosine top-k (the exact baseline) and a sign-LSH-bucketed
  * approximate variant (the scale path).
  *
  * Dot products / norms are `zip_with` + `aggregate` higher-order
  * expressions — codegen'd, no UDF, computed in double.
  *
  * Scale: brute-force top-k against ONE probe is a narrow map + a
  * TakeOrdered (no shuffle of the vectors). For many-probe / all-pairs
  * workloads, `signBuckets` gives an LSH partition key so candidate
  * generation is a bucket-equijoin instead of a cross join.
  */
object Similarity {

  private def toD(c: Column): Column = c.cast("array<double>")

  /** Generic higher-order-function dot product (any numeric arrays).
    * The DataFrame-level operators below use the fused codegen
    * [[graft.functions.VecDot]] instead — identical values (same
    * left-to-right sum order), no per-pair intermediate array. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toD(a), toD(b), (x, y) => x * y), lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(toD(a), x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused codegen dot/norm/cosine (registers vec_dot in the session). */
  private def fdot(df: DataFrame)(a: Column, b: Column): Column =
    graft.functions.VecDot.vecDot(df.sparkSession, a, b)
  private def fnorm(df: DataFrame)(a: Column): Column =
    sqrt(fdot(df)(a, a))
  private def fcosine(df: DataFrame)(a: Column, b: Column): Column =
    fdot(df)(a, b) / (fnorm(df)(a) * fnorm(df)(b))

  /** Exact cosine top-k of `df.vecCol` against the single probe vector
    * taken from row `probeId`. The probe side is one row — broadcast —
    * so the plan is scan → map → TakeOrderedAndProject.
    */
  def cosineTopK(df: DataFrame, vecCol: String, idCol: String,
      probeId: Long, k: Int): DataFrame = {
    val probe = df.filter(col(idCol) === probeId)
      .select(col(vecCol).as("__probe"))
    df.crossJoin(broadcast(probe))
      .select(col(idCol),
        round(fcosine(df)(col(vecCol), col("__probe")), 4).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc(idCol))
      .limit(k)
  }

  /** Sign-LSH bucket id: one bit per hyperplane; hyperplane j is the
    * axis of dimension j (deterministic, data-independent). Vectors in
    * the same orthant share a bucket. `nBits` <= 16 keeps bucket count
    * manageable (2^nBits).
    */
  def signBucket(vec: Column, nBits: Int): Column =
    (0 until nBits).map { j =>
      when(element_at(vec, j + 1) > 0f, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate cosine top-k: only vectors sharing the probe's sign
    * bucket (or differing in one bit — multi-probe) are scored. Trades
    * recall for a candidate set ~2^-nBits * (nBits+1) of the data.
    */
  def cosineTopKApprox(df: DataFrame, vecCol: String, idCol: String,
      probeId: Long, k: Int, nBits: Int = 8): DataFrame = {
    val bucketed = df.withColumn("__bkt", signBucket(col(vecCol), nBits))
    val probe = bucketed.filter(col(idCol) === probeId)
      .select(col(vecCol).as("__probe"), col("__bkt").as("__pbkt"))
    // multi-probe: probe bucket plus its nBits hamming-1 neighbors
    val cands = bucketed.crossJoin(broadcast(probe))
      .filter(hammingLong(col("__bkt"), col("__pbkt")) <= 1)
    cands.select(col(idCol),
        round(fcosine(df)(col(vecCol), col("__probe")), 4).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc(idCol))
      .limit(k)
  }

  private def hammingLong(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** IVF (inverted-file) approximate top-k: vectors are bucketed by
    * their nearest of `nCentroids` k-means centroids at INDEX time (one
    * MLlib KMeans fit, seeded — deterministic); at QUERY time only the
    * `nProbe` centroid cells nearest the probe are scanned. The
    * complementary ANN to [[cosineTopKApprox]]'s sign-LSH: data-adapted
    * cells (better recall on clustered embeddings) at the cost of a
    * training pass. Index time is one fit + one narrow map; query cost
    * is |data| * nProbe / nCentroids scans.
    */
  def cosineTopKIvf(df: DataFrame, vecCol: String, idCol: String,
      probeId: Long, k: Int, nCentroids: Int = 16,
      nProbe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val assembled = df.withColumn("__fv", array_to_vector(toD(col(vecCol))))
    // few iterations suffice: cells only need to be roughly Voronoi —
    // ANN recall is set by nProbe, not centroid convergence
    val model = new KMeans().setK(nCentroids).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("__fv").setPredictionCol("__cell")
    val fitted = model.fit(assembled)
    val indexed = fitted.transform(assembled)
    // query: rank cells by distance from the probe vector, probe the
    // nearest nProbe cells
    val probeVec = df.filter(col(idCol) === probeId)
      .select(col(vecCol)).head().getSeq[Float](0).map(_.toDouble).toArray
    val cells = fitted.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val d = c.toArray.zip(probeVec)
          .map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    val probe = df.filter(col(idCol) === probeId)
      .select(col(vecCol).as("__probe"))
    indexed.filter(col("__cell").isInCollection(cells.toSeq))
      .crossJoin(broadcast(probe))
      .select(col(idCol),
        round(fcosine(df)(col(vecCol), col("__probe")), 4).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc(idCol))
      .limit(k)
  }

  /** IVF on DETERMINISTIC SEED CENTROIDS: the coarse quantizer is the
    * `nCentroids` lowest-id vectors themselves (no iterative fit), cell
    * assignment is argmax rounded-cosine with centroid-id tie-break.
    * Same index/query split as [[cosineTopKIvf]] — nearest `nProbe`
    * cells of the probe are scanned — but every step is plain relational
    * algebra over IEEE-deterministic arithmetic, so an external oracle
    * can replay the index, the probe ranking, and the final top-k
    * (which is what upgrades x2_cosine_topk_ivf to a full hash check;
    * the k-means variant stays the data-adaptive engine path, recall-
    * asserted in SimilaritySpec). Centroids and probe are 1-to-
    * `nCentroids`-row broadcasts; assignment is one windowed rank over
    * the (vectors x centroids) frame — shuffle key = vector id. */
  def cosineTopKIvfSeeded(df: DataFrame, vecCol: String, idCol: String,
      probeId: Long, k: Int, nCentroids: Int = 8,
      nProbe: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = df.filter(col(idCol) < nCentroids)
      .select(col(idCol).as("__cid"), col(vecCol).as("__cvec"))
    val probe = df.filter(col(idCol) === probeId)
      .select(col(vecCol).as("__probe"))
    val assigned = df.crossJoin(broadcast(cents))
      .withColumn("__cs",
        round(fcosine(df)(col(vecCol), col("__cvec")), 4))
      .withColumn("__rn", row_number().over(Window
        .partitionBy(col(idCol)).orderBy(desc("__cs"), asc("__cid"))))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(vecCol), col("__cid").as("__cell"))
    val probeCells = cents.crossJoin(broadcast(probe))
      .withColumn("__pcs",
        round(fcosine(df)(col("__cvec"), col("__probe")), 4))
      .orderBy(desc("__pcs"), asc("__cid")).limit(nProbe)
      .select(col("__cid").as("__pcell"))
    assigned.join(broadcast(probeCells), col("__cell") === col("__pcell"))
      .crossJoin(broadcast(probe))
      .select(col(idCol),
        round(fcosine(df)(col(vecCol), col("__probe")), 4).as("cos_sim"))
      .orderBy(desc("cos_sim"), asc(idCol))
      .limit(k)
  }

  /** Exact k-NN classification: for the first `nProbes` vectors,
    * majority-vote the label of their k nearest neighbors (rounded
    * cosine, excluding self) — the label-propagation / labeling-QA
    * primitive over an embedding store. Rank ties break on neighbor id,
    * vote ties on smallest label, so the prediction is deterministic on
    * any engine. Plan: the probe set is a constant-bounded broadcast
    * (nProbes rows) onto the vector scan, then two keyed windows over
    * O(nProbes x candidates) and O(nProbes x labels) frames — the
    * brute-force exact baseline; at scale the candidate generation
    * swaps to the sign-LSH / IVF forms above.
    * Output: (probe_id, true_label, pred_label, votes). */
  def knnClassify(df: DataFrame, vecCol: String, idCol: String,
      labelCol: String, nProbes: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms precomputed ONCE per side before the pair join (the
    // embeddingNearDupPairs move): per scored pair only the dot product
    // remains — 1 fold instead of 3 on the O(n x probes) hot path
    val cand = df.withColumn("__nrm", fnorm(df)(col(vecCol)))
    val probes = cand.filter(col(idCol) < nProbes)
      .select(col(idCol).as("probe_id"), col(vecCol).as("__pv"),
        col("__nrm").as("__pnrm"),
        col(labelCol).cast("long").as("true_label"))
    val scored = cand.crossJoin(broadcast(probes))
      .filter(col(idCol) =!= col("probe_id"))
      .select(col("probe_id"), col("true_label"),
        col(labelCol).cast("long").as("nbr_label"), col(idCol).as("nbr"),
        round(fdot(df)(col(vecCol), col("__pv"))
          / (col("__nrm") * col("__pnrm")), 4).as("cs"))
    val wNbr = Window.partitionBy("probe_id")
      .orderBy(col("cs").desc, col("nbr").asc)
    val votes = scored.withColumn("rk", row_number().over(wNbr))
      .filter(col("rk") <= k)
      .groupBy("probe_id", "true_label", "nbr_label")
      .agg(count(lit(1)).as("votes"))
    val wVote = Window.partitionBy("probe_id")
      .orderBy(col("votes").desc, col("nbr_label").asc)
    votes.withColumn("wr", row_number().over(wVote))
      .filter(col("wr") === 1)
      .select(col("probe_id"), col("true_label"),
        col("nbr_label").as("pred_label"), col("votes"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, blocked by
    * sign bucket so the self-join is bucket-local. Exact within-bucket;
    * cross-bucket near-dups at the orthant boundary are the accepted
    * approximation (raise recall by lowering nBits).
    */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double, nBits: Int = 8): DataFrame = {
    // Norms are computed ONCE per vector before the pair join (the naive
    // form recomputes both norms inside every pair — 3x the per-pair
    // array traversals). Per candidate pair only the dot product remains.
    val b1 = df.select(col(idCol).as("d1"), col(vecCol).as("v1"),
      fnorm(df)(col(vecCol)).as("nrm1"),
      signBucket(col(vecCol), nBits).as("bkt"))
    val b2 = df.select(col(idCol).as("d2"), col(vecCol).as("v2"),
      fnorm(df)(col(vecCol)).as("nrm2"),
      signBucket(col(vecCol), nBits).as("bkt2"))
    b1.join(b2, col("bkt") === col("bkt2") && col("d1") < col("d2"))
      .withColumn("cos_sim",
        fdot(df)(col("v1"), col("v2")) / (col("nrm1") * col("nrm2")))
      .filter(col("cos_sim") >= threshold)
      .select(col("d1"), col("d2"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** Within-cluster nearest neighbor over a k-means assignment — the
    * SemDeDup scoring step (X19, and the p5 semantic-dedup pipeline):
    * each vector's closest same-cluster peer by exact integer squared
    * L2, (dist, id) tie-break. `assign` is (idCol, cluster) from
    * [[graft.ops.KMeans.fit]]; `quantized` is (idCol, v) with v the
    * quantized BIGINT vector. Candidate pairs are quadratic only INSIDE
    * a cluster (n/k per bucket), never across the corpus — the blocking
    * that keeps semantic dedup linear at 100 TB. Each unordered pair's
    * distance is computed once (the 64-dim fold dominates and is
    * symmetric), then mirrored before the per-vector argmin window.
    *
    * Skew guard: k-means can collapse a skewed corpus into one hot
    * cluster (the smallest-id init makes this plausible), turning the
    * blocked-quadratic baseline quadratic in practice — AQE splits a
    * skewed shuffle partition but cannot shrink the pair count itself.
    * When a cluster's implied pair count exceeds `pairBudget`, THAT
    * cluster's candidate generation SWAPS to sign-LSH buckets within
    * the cluster (hamming <= 1 multi-probe over `annBits` sign bits —
    * the X2b path): candidates shrink from n^2/2 to ~n^2 (annBits+1) /
    * 2^annBits per hot cluster, at ANN semantics for those clusters
    * only — each hot-cluster row's reported nn is its nearest
    * CANDIDATE (exact distance, the true NN when they share a probed
    * bucket), and a row with no bucket peer keeps its output row with
    * NULL nn_id/nn_dist — a visible coverage marker, not a silent drop
    * — rather than paying the quadratic scan. Clusters within budget
    * keep the exact form, so a run with no hot clusters (the fixture
    * corpora; any well-conditioned k scaling) is bit-identical to the
    * exact operator (whose rows are never null). The k-rows size check
    * is one tiny aggregation over the (persisted) assignment; the swap
    * is logged with the offending cluster ids. Callers that need the
    * always-exact contract regardless of skew pass
    * `pairBudget = Long.MaxValue` (explicit opt-out of the fallback). */
  def withinClusterNN(assign: DataFrame, quantized: DataFrame,
      idCol: String, pairBudget: Long = 100000000L,
      annBits: Int = 8): DataFrame = {
    val hot = assign.groupBy("cluster").count().collect()
      .filter(r => { val n = r.getLong(1); n * (n - 1) / 2 > pairBudget })
      .map(_.get(0).asInstanceOf[Number].longValue)
    val withV = assign.join(quantized, idCol)
    if (hot.isEmpty) exactNN(withV, idCol)
    else {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"withinClusterNN: cluster(s) ${hot.mkString(",")} exceed the " +
          s"$pairBudget-pair budget; swapping their candidate " +
          s"generation to sign-LSH buckets ($annBits bits, hamming <= 1 " +
          "multi-probe) — ANN semantics for those clusters only")
      val isHot = col("cluster").isin(hot.toSeq: _*)
      exactNN(withV.filter(!isHot), idCol)
        .unionByName(annNN(withV.filter(isHot), idCol, annBits))
    }
  }

  /** Exact within-cluster argmin over all same-cluster pairs. */
  private def exactNN(withV: DataFrame, idCol: String): DataFrame = {
    val spark = withV.sparkSession
    val l = withV.select(col(idCol).as("d1"),
      col("cluster"), col("v").as("v1"))
    val r = withV.select(col(idCol).as("d2"),
      col("cluster"), col("v").as("v2"))
    val half = l.join(r, Seq("cluster"))
      .filter(col("d1") < col("d2"))
      .withColumn("pdist", graft.functions.VecDist2.vecDist2(
        spark, col("v1"), col("v2")))
      .select(col("cluster"), col("d1"), col("d2"), col("pdist"))
    val pairs = half.unionByName(half.select(col("cluster"),
      col("d2").as("d1"), col("d1").as("d2"), col("pdist")))
    nnArgmin(pairs, idCol)
  }

  /** ANN candidates within hot clusters: sign-LSH over the quantized
    * vector's leading `nBits` dims; the left side enumerates its own
    * bucket plus each one-bit flip (multi-probe), the right side keys
    * on its own bucket, so every hamming <= 1 pair surfaces exactly
    * once per direction — a (cluster, bucket)-keyed equijoin, never a
    * per-cluster cross product. Every input row appears in the output:
    * a vector with no hamming <= 1 bucket peer gets (null, null) for
    * (nn_id, nn_dist) via the left join back onto the hot row set, so
    * downstream one-row-per-vector consumers see reduced coverage
    * explicitly instead of a missing row. */
  private def annNN(withV: DataFrame, idCol: String,
      nBits: Int): DataFrame = {
    val spark = withV.sparkSession
    val bucket = (0 until nBits).map { j =>
      when(element_at(col("v"), j + 1) > 0L, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val b = withV.withColumn("bkt", bucket)
    val probes = array((Seq(col("bkt")) ++
      (0 until nBits).map(j => col("bkt").bitwiseXOR(lit(1L << j)))): _*)
    val l = b.select(col(idCol).as("d1"), col("cluster"),
      col("v").as("v1"), explode(probes).as("pbkt"))
    val r = b.select(col(idCol).as("d2"), col("cluster"),
      col("v").as("v2"), col("bkt").as("pbkt"))
    val pairs = l.join(r, Seq("cluster", "pbkt"))
      .filter(col("d1") =!= col("d2"))
      .withColumn("pdist", graft.functions.VecDist2.vecDist2(
        spark, col("v1"), col("v2")))
      .select(col("cluster"), col("d1"), col("d2"), col("pdist"))
    // Marker rows for omitted vectors: left-join the argmin back onto
    // the full hot row set (node-sized exchange on the id, tiny next
    // to the candidate join) — coverage gaps surface as nulls.
    withV.select(col(idCol), col("cluster"))
      .join(nnArgmin(pairs, idCol).drop("cluster"), Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("nn_id"), col("nn_dist"))
  }

  private def nnArgmin(pairs: DataFrame, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("d1")
      .orderBy(col("pdist").asc, col("d2").asc)
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("d1").as(idCol), col("cluster"),
        col("d2").as("nn_id"), col("pdist").as("nn_dist"))
  }

  /** Greedy Maximal-Marginal-Relevance selection (Carbonell & Goldstein
    * 1998): pick `k` vectors maximizing `2*rel(v) - max_{s in S}
    * dot(v, s)` — relevance to the probe traded against redundancy with
    * what is already selected. The diverse-retrieval primitive behind
    * "give me k RAG passages that are on-topic but not five copies of
    * the same paragraph", and the curation-side complement to X18's
    * closest-to-centroid exemplars (X18 picks representative, MMR picks
    * representative AND mutually distant).
    *
    * Exactness contract (the X17 pattern): vectors quantize to
    * `floor(x * scale)` BIGINTs, every dot product is an exact-integer
    * sum (|cell| <= scale, so a 64-dim dot is < 2^53 and bit-identical
    * on any engine), ties break on (score desc, id asc) — the full
    * greedy ITERATION is hash-oracle-replayable as unrolled CTEs
    * ([[mmrSql]]).
    *
    * Execution shape: the quantized+relevance frame is computed once
    * and persisted; each of the k rounds is ONE narrow map (dot
    * against <= k literal selected vectors, a k x dims driver fit
    * state) + TakeOrdered(1) — no shuffle anywhere, no pair
    * materialization. At 100 TB: k linear scans of the cached
    * projection, the same contract as k-means assignment.
    * Output: (rk, idCol, mmr_score), rk = 1..k in selection order. */
  def mmrSelect(df: DataFrame, vecCol: String, idCol: String,
      probeId: Long, k: Int, scale: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = df.select(col(idCol), KMeans.quantize(col(vecCol), scale).as("v"))
    // fused exact-integer dot: |cell| <= scale, so a dims-dot is
    // <= dims * scale^2 — far under 2^63 for any sane (dims, scale);
    // wrap-vs-ANSI divergence is unreachable, the kernel is safe to
    // call directly (the LEGACY-only rewrite guard doesn't fire under
    // the session's ANSI default)
    graft.functions.VecDotL.register(spark)
    def dotLit(c: Seq[Long]): Column =
      graft.functions.VecDotL.vecDotL(spark, col("v"), typedLit(c))
    val probeRows = q.filter(col(idCol) === probeId).select("v").take(1)
    require(probeRows.nonEmpty,
      s"mmrSelect: probe id $probeId not found in $idCol")
    val probe = probeRows.head.getSeq[Long](0).toIndexedSeq
    // relevance never changes across rounds — compute once, persist
    val rel = q.withColumn("rel", dotLit(probe)).persist()
    try {
      val nCand = rel.count()
      require(k <= nCand,
        s"mmrSelect: k=$k exceeds the $nCand available candidates")
      val picks = scala.collection.mutable.Buffer[(Long, Long, IndexedSeq[Long])]()
      for (_ <- 1 to k) {
        val maxsim =
          if (picks.isEmpty) lit(0L)
          else picks.map(p => dotLit(p._3)).reduce((a, b) => greatest(a, b))
        val cand =
          if (picks.isEmpty) rel
          else rel.filter(!col(idCol).isin(picks.map(_._1).toSeq: _*))
        val top = cand
          .select(col(idCol), col("v"),
            (col("rel") * 2 - maxsim).as("score"))
          .orderBy(col("score").desc, col(idCol))
          .limit(1).head()
        picks += ((top.getLong(0), top.getLong(2),
          top.getSeq[Long](1).toIndexedSeq))
      }
      picks.toSeq.zipWithIndex
        .map { case ((id, sc, _), i) => ((i + 1).toLong, id, sc) }
        .toDF("rk", idCol, "mmr_score")
    } finally rel.unpersist()
  }

  /** DuckDB replay of [[mmrSelect]]: quantize, probe relevance, then k
    * unrolled select-round CTEs (round i scores candidates against the
    * i-1 already-selected rows via cross joins — the q45/x17 unrolled-
    * iteration pattern). Output: (rk, idCol, mmr_score). */
  def mmrSql(table: String, vecCol: String, idCol: String, probeId: Long,
      k: Int, dims: Int, scale: Int = 10000): String = {
    def dot(a: String, b: String) =
      s"CAST(list_sum(list_transform(generate_series(1, $dims), " +
        s"i -> $a[i]*$b[i])) AS BIGINT)"
    val rounds = (1 to k).map { i =>
      if (i == 1)
        s"""s1 AS (SELECT $idCol, v, 2*rel AS score FROM rel
              ORDER BY score DESC, $idCol LIMIT 1)"""
      else {
        val prev = (1 until i).map(j => s"s$j")
        val joins = prev.map(p => s"CROSS JOIN $p a_$p").mkString(" ")
        val dots = prev.map(p => dot("r.v", s"a_$p.v"))
        val maxsim =
          if (dots.size == 1) dots.head else s"greatest(${dots.mkString(", ")})"
        val notIn = prev.map(p => s"SELECT $idCol FROM $p")
          .mkString(" UNION ALL ")
        s"""c$i AS (SELECT r.$idCol, r.v, 2*r.rel - $maxsim AS score
              FROM rel r $joins
              WHERE r.$idCol NOT IN ($notIn)),
            s$i AS (SELECT $idCol, v, score FROM c$i
              ORDER BY score DESC, $idCol LIMIT 1)"""
      }
    }
    val out = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rk, $idCol, score AS mmr_score FROM s$i")
      .mkString(" UNION ALL ")
    s"""WITH q AS (SELECT $idCol, list_transform($vecCol,
              x -> CAST(floor(CAST(x AS DOUBLE)*$scale) AS BIGINT)) AS v
            FROM $table),
        p AS (SELECT v FROM q WHERE $idCol = $probeId),
        rel AS (SELECT q.$idCol, q.v, ${dot("q.v", "p.v")} AS rel
                FROM q CROSS JOIN p),
        ${rounds.mkString(",\n        ")}
        $out ORDER BY rk"""
  }

  /** Semantic decontamination (x36): flag every corpus vector whose
    * cosine against ANY eval-set vector (`idCol < evalMaxId`) reaches
    * sqrt(cos2Threshold). The eval set is the constant-sized side, so
    * it collapses to ONE broadcast row of e3-quantized integer state
    * ({eid, quantized vec, integer norm²} structs) and the corpus is
    * scored ROW-LOCALLY — no corpus-keyed exchange at any scale (the
    * broadcast-decontam contract of `CorpusClean` in embedding space).
    *
    * Exactness contract (the x36 oracle hash-gates this): e3
    * quantization (round ties away from zero — identical on any IEEE
    * engine), order-independent integer dot/norm sums, then exactly
    * one double multiply-compare per (row, eval) and one divide +
    * sqrt + round for the flagged winners — every float op is a
    * single correctly-rounded IEEE op on identical integer inputs.
    * `cos2Threshold` must be passed as the exact double the replaying
    * oracle uses (the default 9e-2 is cosine 0.30); it enters the
    * plan via `lit(...)`, never string formatting.
    *
    * Output: (idCol, n_hits, max_cos_e4, eval_id) for flagged rows
    * only; best-cosine ties break to the smallest eval id.
    */
  def semanticDecontam(df: DataFrame, vecCol: String, idCol: String,
      evalMaxId: Long, cos2Threshold: Double = 9e-2): DataFrame = {
    // integer dot/norms via the fused vec_dot_l kernel — bit-identical
    // to the aggregate(zip_with(...)) fold (exact integers), one tight
    // loop per call even inside the per-eval lambda below
    graft.functions.VecDotL.register(df.sparkSession)
    val quant = expr(
      s"transform($vecCol, x -> " +
        "CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
    val evals = df.filter(col(idCol) < evalMaxId)
      .select(col(idCol).as("eid"), quant.as("qe"))
      .withColumn("nb2", expr("vec_dot_l(qe, qe)"))
      .agg(collect_list(struct(col("eid"), col("qe"), col("nb2")))
        .as("evals"))
    df.filter(col(idCol) >= evalMaxId)
      .select(col(idCol), quant.as("qv"))
      .withColumn("na2", expr("vec_dot_l(qv, qv)"))
      .crossJoin(broadcast(evals))
      .withColumn("__t", lit(cos2Threshold))
      .withColumn("hits", expr(
        """filter(
             transform(evals, e -> named_struct(
               'eid', e.eid,
               'dp', vec_dot_l(qv, e.qe),
               'nb2', e.nb2)),
             h -> h.dp > 0 AND
                  CAST(h.dp AS DOUBLE) * CAST(h.dp AS DOUBLE)
                    >= __t * (CAST(na2 AS DOUBLE)
                              * CAST(h.nb2 AS DOUBLE)))"""))
      .filter(size(col("hits")) >= 1)
      .withColumn("best", expr(
        """array_max(transform(hits, h -> named_struct(
             'c', CAST(h.dp AS DOUBLE) * CAST(h.dp AS DOUBLE)
                  / (CAST(na2 AS DOUBLE) * CAST(h.nb2 AS DOUBLE)),
             'neid', -h.eid)))"""))
      .select(col(idCol),
        size(col("hits")).cast("long").as("n_hits"),
        expr("CAST(round(sqrt(best.c) * 10000) AS BIGINT)")
          .as("max_cos_e4"),
        expr("-best.neid").as("eval_id"))
  }
}
