package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Retrieval operators for a training-data pipeline: BM25 ranking (the
  * workhorse of quality-retrieval and decontamination-by-search) and an
  * inverted-index build. Both are exactly oracle-able: the BM25 score
  * is a FIXED-ORDER arithmetic expression over a literal query (no
  * data-dependent summation order, so Spark and DuckDB produce the same
  * doubles), and the index's postings are emitted as an ordered
  * comma-joined string (the q16 device — no array-format skew between
  * engines).
  */
object Retrieval {

  /** Okapi BM25 parameters — the standard defaults. */
  private val K1 = 1.2
  private val B = 0.75

  /** BM25 top-k for a literal query. The per-term contribution
    *   idf_t * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    * with idf_t = ln((N - df + 0.5) / (df + 0.5) + 1) is built as ONE
    * projection expression per term and summed left-to-right in query
    * order — a fixed shape both engines evaluate identically (ln's
    * last-ulp wobble is absorbed by the round-6, the q61 precedent).
    *
    * Scale shape: corpus statistics (N, Σdl — both integers, so avgdl
    * is exactly reproducible — and one df counter per query term) come
    * from ONE aggregate over a scan projection and return a single row,
    * broadcast back via crossJoin; tf_t is an in-row array filter, so
    * scoring is map-only; selection is a bounded top-k
    * (TakeOrderedAndProject), never a global sort. The ranking order is
    * (rounded score DESC, doc_id) so the selected set cannot depend on
    * sub-round float noise. */
  def bm25TopK(s: SparkSession, d: String,
      terms: Seq[String] = Seq("spark", "hash", "window"),
      topK: Int = 20): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val statAggs =
      sum(col("dl")).as("sum_dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("toks"), t), 1L).otherwise(0L))
            .as(s"df$i")
        }
    val stats = docs.agg(count(lit(1)).as("n_docs"), statAggs: _*)
    val avgdl =
      col("sum_dl").cast("double") / col("n_docs").cast("double")
    def contrib(t: String, i: Int): Column = {
      val tf = size(filter(col("toks"), x => x === lit(t))).cast("double")
      val df = col(s"df$i").cast("double")
      val n = col("n_docs").cast("double")
      val idf = log((n - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
      idf * (tf * lit(K1 + 1.0)) /
        (tf + lit(K1) * (lit(1.0 - B) + lit(B) *
          (col("dl").cast("double") / avgdl)))
    }
    val score = terms.zipWithIndex.map { case (t, i) => contrib(t, i) }
      .reduceLeft(_ + _)
    docs.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 6).as("bm25"))
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /** Reciprocal-rank fusion of the lexical and semantic rankings
    * (q268) — the standard hybrid-search combiner (Cormack et al.'s
    * RRF): each retrieval list contributes 1/(rrfK + rank) for the
    * documents it ranked, and documents found by both channels float
    * to the top without any score normalization across channels
    * (ranks, not raw scores, are fused — BM25 logits and cosines are
    * not commensurable). Channel ranks come from the two existing
    * ranked retrievers — [[bm25TopK]] and
    * [[Similarity.knnBruteForce]] (doc_id and vec_id share the id
    * space) — each already a bounded top-`k`
    * (TakeOrderedAndProject), so the rank windows and the fusion
    * full-outer join run over two k-row sets: the whole fusion stage
    * is constant-size no matter the corpus, and the corpus-sized work
    * is exactly the two retrievals' own (already-audited) plans. A
    * missing rank is 0 ("not retrieved by this channel"), keeping the
    * output BIGINT-dense. The 1/(rrfK + r) terms are float but both
    * engines build the identical two-term tree from identical integer
    * ranks, the q103 discipline. */
  def rrfFusion(s: SparkSession, d: String,
      terms: Seq[String] = Seq("spark", "hash", "window"),
      queryId: Long = 0L, k: Int = 50, rrfK: Int = 60,
      topK: Int = 20): DataFrame = {
    val lex = bm25TopK(s, d, terms, k)
      .select(col("doc_id").as("id"), col("bm25"))
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("bm25").desc, col("id"))).cast("long"))
    val sem = Similarity.knnBruteForce(s, d, queryId, k)
      .select(col("vec_id").as("id"), col("cosine"))
      .withColumn("r_sem", row_number().over(
        Window.orderBy(col("cosine").desc, col("id"))).cast("long"))
    val term: Column => Column = r =>
      when(r > 0, lit(1.0) / (lit(rrfK.toDouble) + r.cast("double")))
        .otherwise(lit(0.0))
    lex.join(sem, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("r_lex"), lit(0L)).as("r_lex"),
        coalesce(col("r_sem"), lit(0L)).as("r_sem"))
      .select(col("id"), col("r_lex"), col("r_sem"),
        round(term(col("r_lex")) + term(col("r_sem")), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(topK)
  }

  /** Inverted index: one row per term with its document frequency and
    * a postings list CAPPED at `maxPostings` lowest doc_ids (df stays
    * the FULL count). The cap is the same discipline as the banded-join
    * bucket caps: a stopword's postings at 100 TB is the corpus itself,
    * and no consumer of a ranked index wants it materialized — the df
    * column preserves the true frequency for scoring. One explode +
    * distinct (shuffle on (term, doc_id)), one window rank, one
    * aggregation; postings serialize as an ordered comma string so the
    * oracle compare is engine-format-proof. */
  def invertedIndex(s: SparkSession, d: String,
      maxPostings: Int = 25): DataFrame = {
    val pairs = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .distinct()
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    pairs.withColumn("rn", row_number().over(w))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        concat_ws(",", sort_array(collect_list(
          when(col("rn") <= maxPostings, col("doc_id")))))
          .as("postings"))
      .orderBy(col("term"))
  }
}
