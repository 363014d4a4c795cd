package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Product-quantization ANN (Jégou/Douze/Schmid, TPAMI 2011): the
  * third leg of the similarity-search family next to SRP-LSH
  * ([[Similarity.annLsh]]) and IVF ([[Similarity.annIvf]]), and the
  * one that changes the SCAN ECONOMICS rather than the candidate set:
  * each 64-float embedding compresses to m=8 one-byte centroid codes,
  * so the ANN scan reads ~16x fewer bytes and scores a candidate with
  * 8 table lookups instead of 64 multiply-adds. At 100 TB of raw
  * embeddings the code table is ~6 TB — the difference between an
  * index that fits hot storage and one that doesn't.
  *
  * Scale shape: codebooks are TRAINED on a deterministic md5-ordered
  * sample (bounded collect — codebooks are index metadata exactly like
  * IVF centroids), the corpus is ENCODED in one codegen'd projection
  * (no shuffle), and a query probe is: broadcast a 128-double lookup
  * table, scan codes, TakeOrderedAndProject the top k*refine, then
  * re-rank that bounded candidate set with exact cosine against the
  * full vectors (fetched by id — the only rows whose floats ever move).
  * Everything is seeded/deterministic: re-runs, retried tasks, and the
  * DuckDB-anchored exact twin (q96) see identical results.
  */
object Pq {

  /** Trained codebooks: flat row-major [m][ksub][dsub] centroid
    * matrix — ~`m * ksub * dsub` doubles of driver-side metadata
    * (8 KiB at the defaults), broadcast into codegen as a literal. */
  final case class PqModel(m: Int, ksub: Int, dim: Int,
      flat: Array[Double])

  /** A built PQ index: the persisted (vec_id, code, norm) table plus
    * its model. `norm` keeps the exact vector norm next to the code so
    * the ADC score can approximate COSINE (quantized dot / exact
    * norms), not just inner product. */
  final case class PqIndex(codes: DataFrame, model: PqModel)

  /** Deterministic Lloyd k-means per subspace, seeded by the first
    * `ksub` DISTINCT subvectors in sample order — no RNG state, so
    * training is reproducible bit-for-bit on any cluster layout.
    * Empty clusters keep their previous centroid; ties in assignment
    * pick the lowest centroid index (same rule as
    * [[graft.expr.PqEncode]], so encoding the training set with the
    * trained model is self-consistent). */
  private[graft] def trainCodebooks(vecs: Array[Array[Double]], m: Int,
      ksub: Int, iters: Int = 12): PqModel = {
    require(vecs.nonEmpty, "PQ training needs at least one vector")
    val dim = vecs.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val flat = new Array[Double](m * ksub * dsub)
    var mm = 0
    while (mm < m) {
      val pts: Array[Array[Double]] =
        vecs.map(v => java.util.Arrays.copyOfRange(v, mm * dsub,
          (mm + 1) * dsub))
      val init = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
      var i = 0
      while (init.length < ksub && i < pts.length) {
        val key = pts(i).toSeq
        if (!seen(key)) { seen += key; init += pts(i) }
        i += 1
      }
      // fewer distinct subvectors than centroids: duplicate — the
      // lowest-index tie rule means duplicates are simply never chosen
      while (init.length < ksub) init += init(0)
      var centroids = init.toArray
      var it = 0
      while (it < iters) {
        val sums = Array.fill(ksub)(new Array[Double](dsub))
        val counts = new Array[Int](ksub)
        var p = 0
        while (p < pts.length) {
          val pt = pts(p)
          var best = 0
          var bestD = Double.MaxValue
          var kk = 0
          while (kk < ksub) {
            var acc = 0.0
            var j = 0
            while (j < dsub) {
              val e = pt(j) - centroids(kk)(j); acc += e * e; j += 1
            }
            if (acc < bestD) { bestD = acc; best = kk }
            kk += 1
          }
          counts(best) += 1
          var j = 0
          while (j < dsub) { sums(best)(j) += pt(j); j += 1 }
          p += 1
        }
        centroids = Array.tabulate(ksub) { kk =>
          if (counts(kk) == 0) centroids(kk)
          else sums(kk).map(_ / counts(kk))
        }
        it += 1
      }
      var kk = 0
      while (kk < ksub) {
        System.arraycopy(centroids(kk), 0, flat,
          (mm * ksub + kk) * dsub, dsub)
        kk += 1
      }
      mm += 1
    }
    PqModel(m, ksub, dim, flat)
  }

  /** Deterministic bounded training sample: the `maxTrain` vectors
    * whose md5("pq|" || id) sorts first — a seeded uniform draw that
    * is identical at any partitioning and any scale factor, fetched
    * with TakeOrderedAndProject (never a full collect). */
  private def trainingSample(emb: DataFrame,
      maxTrain: Int): Array[Array[Double]] =
    emb.select(col("embedding"),
      md5(concat(lit("pq|"), col("vec_id").cast("string"))).as("h"))
      .orderBy(col("h"))
      .limit(maxTrain)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** One-time PQ index build, memoized per (context, corpus plan,
    * params) like the LSH/IVF indexes: train codebooks on the bounded
    * sample, then encode the corpus in ONE codegen'd projection —
    * (vec_id, m-byte code, exact norm) — and persist it. Build once,
    * probe many. */
  def buildPqIndex(s: SparkSession, d: String, m: Int = 8,
      ksub: Int = 16, maxTrain: Int = 2048): PqIndex = {
    val emb = Tables.embeddings(s, d)
    IndexMemo.getOrBuild[PqIndex]("pqIdx", s"$m,$ksub,$maxTrain",
      Seq(emb)) {
      graft.parse.GraftFunctions.register(s)
      val model = trainCodebooks(trainingSample(emb, maxTrain), m, ksub)
      val codes = emb.select(col("vec_id"),
        call_function("pq_encode", col("embedding"), lit(model.flat),
          lit(m), lit(ksub)).as("code"),
        sqrt(call_function("dot_product", col("embedding"),
          col("embedding"))).as("norm"))
        .persist()
      codes.count() // materialize the index
      (PqIndex(codes, model), Seq(codes))
    }
  }

  /** PQ ANN probe: build the query's [m][ksub] lookup table of
    * subspace dot products (driver-side math on index metadata, like
    * the IVF probe-list ranking), scan the CODE table scoring each
    * candidate with [[graft.expr.PqAdc]] — quantized dot over exact
    * norms approximates cosine — take the ADC top `k * refineFactor`
    * (TakeOrderedAndProject, bounded), and re-rank those candidates
    * with exact cosine on the real vectors, joined back by id. With a
    * refineFactor whose candidate budget covers the corpus the result
    * EQUALS brute force (the q96 anchor, same role as q87/q89); at the
    * production operating point (refineFactor=16, a 160-candidate
    * budget independent of corpus size) recall is pinned by the q97
    * golden — measured 0.9 at BOTH gate scale factors. */
  def annPq(s: SparkSession, d: String, queryId: Long = 0L, k: Int = 10,
      m: Int = 8, ksub: Int = 16, refineFactor: Int = 16): DataFrame = {
    val index = buildPqIndex(s, d, m, ksub)
    val emb = Tables.embeddings(s, d)
    val qVec: Array[Double] = emb.filter(col("vec_id") === queryId)
      .select(col("embedding")).head()
      .getSeq[Float](0).map(_.toDouble).toArray
    val dsub = qVec.length / m
    val lut = new Array[Double](m * ksub)
    var mm = 0
    while (mm < m) {
      var kk = 0
      while (kk < ksub) {
        var acc = 0.0
        var j = 0
        while (j < dsub) {
          acc += qVec(mm * dsub + j) *
            index.model.flat((mm * ksub + kk) * dsub + j)
          j += 1
        }
        lut(mm * ksub + kk) = acc
        kk += 1
      }
      mm += 1
    }
    val qNorm = math.sqrt(qVec.map(x => x * x).sum)
    val cands = index.codes.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
        (call_function("pq_adc", col("code"), lit(lut), lit(ksub)) /
          (col("norm") * lit(qNorm))).as("adc_cos"))
      .orderBy(col("adc_cos").desc, col("vec_id"))
      .limit(k * refineFactor)
      .select(col("vec_id"))
    val q = emb.filter(col("vec_id") === queryId).limit(1)
      .select(col("embedding").as("q_embedding"))
    emb.join(cands, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(Similarity.nativeCosine(s, col("embedding"),
          col("q_embedding")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Recall@k of the production-geometry PQ probe against the exact
    * brute-force top-k as ONE scalar row — the q90 pattern: a
    * deterministic quality constant the driver hash-checks. */
  def annPqRecallQuery(s: SparkSession, d: String, queryId: Long = 0L,
      k: Int = 10): DataFrame = {
    val ann = annPq(s, d, queryId, k).select(col("vec_id"))
    Similarity.knnBruteForce(s, d, queryId, k)
      .join(ann, Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("hits"),
        (count(lit(1)) / lit(k.toDouble)).as("recall_at_10"))
  }

  /** SQ8 scalar quantization — the STORAGE-side companion of PQ:
    * min-max-normalize each dimension over the corpus and round to an
    * 8-bit level, the int8 embedding compression vector stores serve
    * from (4x smaller than float32, decode is two flops). Unlike PQ
    * (whose codebooks come from iterative training), the SQ8 encode is
    * PURE ARITHMETIC — per-dim min/max then
    * floor((v - mn) / (mx - mn) * 255 + 0.5) — every step of which
    * DuckDB reproduces bit-for-bit, so the code table is hash-checked
    * cell-for-cell (q98), giving the quantization family an exactly
    * oracled anchor next to PQ's twin (q96) and golden (q97).
    *
    * Scale shape: the stats pass is a map-side-combined min/max over
    * at most `dim` groups (64 rows of metadata), broadcast back; the
    * encode is then a map-only projection. Output is one
    * (vec_id, dim, code) row per cell — integer-typed end to end so
    * the driver's stringified hash compare is format-proof. */
  def sq8Codes(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("dim", "v0")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("v0").cast("double").as("v"))
    val stats = e.groupBy(col("dim"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    e.join(broadcast(stats), "dim")
      .select(col("vec_id"), col("dim"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(lit(255L), greatest(lit(0L),
            floor((col("v") - col("mn")) / (col("mx") - col("mn"))
              * 255 + 0.5))))
          .cast("long").as("code"))
      .orderBy(col("vec_id"), col("dim"))
  }

  /** SQ8 reconstruction fidelity: per-vector cosine between the
    * original embedding and its dequantized (q98) reconstruction,
    * rolled up to (n, min, mean) — the compression-quality report a
    * vector store publishes next to its codes. Determinism device:
    * every per-vector sum (v·deq, v², deq²) quantizes each TERM to
    * nano-units and sums BIGINTs — float sums are order-dependent
    * across partitions, integer sums are not — and the corpus mean
    * folds micro-unit cosines the same way. Same stats broadcast +
    * map-only shape as the encoder. */
  def sq8Fidelity(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("dim", "v0")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("v0").cast("double").as("v"))
    val stats = e.groupBy(col("dim"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val deq = e.join(broadcast(stats), "dim")
      .withColumn("code", when(col("mx") === col("mn"), lit(0L))
        .otherwise(least(lit(255L), greatest(lit(0L),
          floor((col("v") - col("mn")) / (col("mx") - col("mn"))
            * 255 + 0.5)))).cast("long"))
      .withColumn("dq", when(col("mx") === col("mn"), col("mn"))
        .otherwise(col("mn") + col("code").cast("double") / 255.0
          * (col("mx") - col("mn"))))
    val perVec = deq.groupBy(col("vec_id"))
      .agg(
        sum(expr("CAST(round(v * dq * 1e9) AS LONG)")).as("vd"),
        sum(expr("CAST(round(v * v * 1e9) AS LONG)")).as("vv"),
        sum(expr("CAST(round(dq * dq * 1e9) AS LONG)")).as("dd"))
      .select(col("vec_id"),
        expr("CAST(round(CAST(vd AS DOUBLE)" +
          " / (sqrt(CAST(vv AS DOUBLE)) * sqrt(CAST(dd AS DOUBLE)))" +
          " * 1e6) AS LONG)").as("cos_micro"))
    perVec.agg(count(lit(1)).as("n_vectors"),
      round(min(col("cos_micro")).cast("double") / 1e6, 6)
        .as("min_cos"),
      round(sum(col("cos_micro")).cast("double")
        / (count(lit(1)).cast("double") * 1e6), 6).as("mean_cos"))
  }

  /** Label-cluster cohesion: per label, the mean and minimum cosine
    * of members to their label CENTROID — the embedding-space class-
    * separability health check (a label whose members barely point at
    * their own centroid will not train a classifier). Determinism
    * discipline: vectors quantize to exact micro-unit BIGINTs, the
    * centroid is the rounded integer mean per dimension, and every
    * dot/norm is an exact BIGINT sum — no float accumulates across
    * rows, so the report hash-matches under any partitioning. Scale
    * shape: one labels x dims centroid table (broadcast), one
    * member-row pass. */
  def labelCohesion(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v0")))
      .select(col("vec_id"), col("label"),
        col("dim").cast("long").as("dim"),
        expr("CAST(round(CAST(v0 AS DOUBLE) * 1e6) AS LONG)").as("vq"))
    val cent = e.groupBy(col("label"), col("dim"))
      .agg(expr("CAST(round(CAST(SUM(vq) AS DOUBLE) / COUNT(*))" +
        " AS LONG)").as("cq"))
    val perVec = e.join(broadcast(cent), Seq("label", "dim"))
      .groupBy(col("label"), col("vec_id"))
      .agg(sum(col("vq") * col("cq")).as("dot"),
        sum(col("vq") * col("vq")).as("nv"),
        sum(col("cq") * col("cq")).as("nc"))
      .select(col("label"),
        expr("CAST(round(CAST(dot AS DOUBLE)" +
          " / (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE)))" +
          " * 1e6) AS LONG)").as("cos_micro"))
    perVec.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("cos_micro")).cast("double")
          / (count(lit(1)).cast("double") * 1e6), 6).as("mean_cos"),
        round(min(col("cos_micro")).cast("double") / 1e6, 6)
          .as("min_cos"))
      .orderBy(col("label"))
  }

  /** DuckDB oracle for [[labelCohesion]]. */
  def labelCohesionSql: String =
    """WITH ix AS (SELECT vec_id, label, embedding,
      |        unnest(range(1, len(embedding) + 1)) AS i
      |      FROM embeddings),
      |e AS (SELECT vec_id, label, i,
      |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)
      |      AS vq
      |  FROM ix),
      |cent AS (SELECT label, i,
      |    CAST(round(CAST(SUM(vq) AS DOUBLE) / COUNT(*)) AS BIGINT)
      |      AS cq
      |  FROM e GROUP BY 1, 2),
      |pv AS (SELECT e.label, vec_id,
      |    CAST(SUM(vq * cq) AS BIGINT) AS dot,
      |    CAST(SUM(vq * vq) AS BIGINT) AS nv,
      |    CAST(SUM(cq * cq) AS BIGINT) AS nc
      |  FROM e JOIN cent ON cent.label = e.label AND cent.i = e.i
      |  GROUP BY 1, 2),
      |pc AS (SELECT label,
      |    CAST(round(CAST(dot AS DOUBLE)
      |      / (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE)))
      |      * 1e6) AS BIGINT) AS cos_micro
      |  FROM pv)
      |SELECT label, COUNT(*) AS n_vectors,
      |  round(CAST(SUM(cos_micro) AS DOUBLE)
      |    / (CAST(COUNT(*) AS DOUBLE) * 1e6), 6) AS mean_cos,
      |  round(CAST(MIN(cos_micro) AS DOUBLE) / 1e6, 6) AS min_cos
      |FROM pc GROUP BY label ORDER BY label""".stripMargin

  /** DuckDB oracle for [[sq8Fidelity]]. */
  def sq8FidelitySql: String =
    """WITH ix AS (SELECT vec_id, embedding,
      |        unnest(range(1, len(embedding) + 1)) AS i
      |      FROM embeddings),
      |e AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
      |      FROM ix),
      |s AS (SELECT i, min(v) AS mn, max(v) AS mx FROM e GROUP BY i),
      |d AS (SELECT vec_id, v,
      |    CASE WHEN mx = mn THEN mn
      |         ELSE mn + least(255, greatest(0,
      |             floor((v - mn) / (mx - mn) * 255 + 0.5))) / 255.0
      |           * (mx - mn) END AS dq
      |  FROM e JOIN s USING (i)),
      |pv AS (SELECT vec_id,
      |    CAST(SUM(CAST(round(v * dq * 1e9) AS BIGINT)) AS BIGINT)
      |      AS vd,
      |    CAST(SUM(CAST(round(v * v * 1e9) AS BIGINT)) AS BIGINT)
      |      AS vv,
      |    CAST(SUM(CAST(round(dq * dq * 1e9) AS BIGINT)) AS BIGINT)
      |      AS dd
      |  FROM d GROUP BY 1),
      |pc AS (SELECT vec_id,
      |    CAST(round(CAST(vd AS DOUBLE)
      |      / (sqrt(CAST(vv AS DOUBLE)) * sqrt(CAST(dd AS DOUBLE)))
      |      * 1e6) AS BIGINT) AS cos_micro
      |  FROM pv)
      |SELECT COUNT(*) AS n_vectors,
      |  round(CAST(MIN(cos_micro) AS DOUBLE) / 1e6, 6) AS min_cos,
      |  round(CAST(SUM(cos_micro) AS DOUBLE)
      |    / (CAST(COUNT(*) AS DOUBLE) * 1e6), 6) AS mean_cos
      |FROM pc""".stripMargin

  /** Within-label scatter: per label, the mean squared distance of
    * member embeddings to their centroid (the covariance trace — the
    * "how tight is this label" number that pairs with
    * [[labelCohesion]]'s angular view and [[centroidDistances]]'
    * between-label view to complete the scatter decomposition). Same
    * micro-quantized device: (vq − cq)² sums are exact integers,
    * accumulated in DECIMAL(38,0) (a squared micro-unit times dims
    * times members passes 2^63 well before a web-scale corpus does —
    * the gini discipline); one corpus pass + the broadcast centroid
    * table. Scatter is reported in (1e-6)² units /1e12 → double,
    * round-6. */
  def withinLabelScatter(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("label"),
        col("vec_id"),
        posexplode(col("embedding")).as(Seq("dim", "v0")))
      .select(col("label"), col("vec_id"),
        col("dim").cast("long").as("dim"),
        expr("CAST(round(CAST(v0 AS DOUBLE) * 1e6) AS LONG)").as("vq"))
    val cent = e.groupBy(col("label"), col("dim"))
      .agg(expr("CAST(round(CAST(SUM(vq) AS DOUBLE) / COUNT(*))" +
        " AS LONG)").as("cq"))
    e.join(broadcast(cent), Seq("label", "dim"))
      .groupBy(col("label"))
      .agg((count(lit(1)) / lit(64)).cast("long").as("n_vectors"),
        sum(((col("vq") - col("cq")) * (col("vq") - col("cq")))
          .cast("decimal(38,0)")).as("ss"))
      .select(col("label").cast("long").as("label"), col("n_vectors"),
        round(col("ss").cast("double")
          / (col("n_vectors").cast("double") * 1e12), 6)
          .as("mean_sq_dist"))
      .orderBy(col("label"))
  }

  /** DuckDB oracle for [[withinLabelScatter]]. */
  def withinLabelScatterSql: String =
    """WITH ix AS (SELECT vec_id, label, embedding,
      |        unnest(range(1, len(embedding) + 1)) AS i
      |      FROM embeddings),
      |e AS (SELECT vec_id, label, i,
      |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)
      |      AS vq
      |  FROM ix),
      |cent AS (SELECT label, i,
      |    CAST(round(CAST(SUM(vq) AS DOUBLE) / COUNT(*)) AS BIGINT)
      |      AS cq
      |  FROM e GROUP BY 1, 2),
      |g AS (SELECT e.label, COUNT(*) // 64 AS n_vectors,
      |    SUM(CAST((vq - cq) * (vq - cq) AS HUGEINT)) AS ss
      |  FROM e JOIN cent ON cent.label = e.label AND cent.i = e.i
      |  GROUP BY e.label)
      |SELECT CAST(label AS BIGINT) AS label,
      |  CAST(n_vectors AS BIGINT) AS n_vectors,
      |  round(CAST(ss AS DOUBLE)
      |    / (CAST(n_vectors AS DOUBLE) * 1e12), 6) AS mean_sq_dist
      |FROM g ORDER BY label""".stripMargin

  /** Inter-centroid cosine matrix: pairwise cosine between the
    * per-label embedding centroids — [[labelCohesion]]'s companion
    * (cohesion says members hug their OWN centroid; this says whether
    * DIFFERENT labels' centroids are actually separated — high
    * inter-centroid cosine + high cohesion = two labels the embedding
    * cannot tell apart, the classic label-taxonomy smell). Centroids
    * use the same micro-quantized exact-BIGINT device as cohesion;
    * the pair stage runs on the labels × dims table (broadcast-tiny —
    * label count is a taxonomy, never data-scale), so the corpus is
    * read exactly once. */
  def centroidDistances(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v0")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        expr("CAST(round(CAST(v0 AS DOUBLE) * 1e6) AS LONG)").as("vq"))
    val cent = e.groupBy(col("label"), col("dim"))
      .agg(expr("CAST(round(CAST(SUM(vq) AS DOUBLE) / COUNT(*))" +
        " AS LONG)").as("cq"))
    val a = cent.select(col("label").as("label_a"), col("dim"),
      col("cq").as("ca"))
    val b = cent.select(col("label").as("label_b"), col("dim"),
      col("cq").as("cb"))
    a.join(b, Seq("dim"))
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("ca") * col("cb")).as("dot"),
        sum(col("ca") * col("ca")).as("na"),
        sum(col("cb") * col("cb")).as("nb"))
      .select(col("label_a").cast("long").as("label_a"),
        col("label_b").cast("long").as("label_b"),
        round(col("dot").cast("double")
          / (sqrt(col("na").cast("double"))
            * sqrt(col("nb").cast("double"))), 6).as("centroid_cos"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** DuckDB oracle for [[centroidDistances]]. */
  def centroidDistancesSql: String =
    """WITH ix AS (SELECT label, embedding,
      |        unnest(range(1, len(embedding) + 1)) AS i
      |      FROM embeddings),
      |e AS (SELECT label, i,
      |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)
      |      AS vq
      |  FROM ix),
      |cent AS (SELECT label, i,
      |    CAST(round(CAST(SUM(vq) AS DOUBLE) / COUNT(*)) AS BIGINT)
      |      AS cq
      |  FROM e GROUP BY 1, 2)
      |SELECT CAST(a.label AS BIGINT) AS label_a,
      |  CAST(b.label AS BIGINT) AS label_b,
      |  round(CAST(SUM(a.cq * b.cq) AS DOUBLE)
      |    / (sqrt(CAST(SUM(a.cq * a.cq) AS DOUBLE))
      |      * sqrt(CAST(SUM(b.cq * b.cq) AS DOUBLE))), 6)
      |    AS centroid_cos
      |FROM cent a JOIN cent b ON a.i = b.i AND a.label < b.label
      |GROUP BY a.label, b.label
      |ORDER BY label_a, label_b""".stripMargin
}
