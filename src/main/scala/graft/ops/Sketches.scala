package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for corpus statistics at scales where
  * an exact `groupBy(term)` is its own shuffle of the vocabulary —
  * billions of distinct raw-web tokens. The exact operators in
  * [[TextOps]] stay the small-scale reference; these are the
  * documented swap, implemented.
  */
object Sketches {

  /** Misra-Gries heavy-hitters summary: at most `k` counters with the
    * classic guarantees — every item with true frequency > N/k is
    * retained, and each kept counter underestimates its true count by
    * at most N/k (N = stream length). Crucially the summary is
    * MERGEABLE with the same bound (Agarwal et al., "Mergeable
    * Summaries", PODS'12): merging sums counters and subtracts the
    * (k+1)-largest value, so it runs as a standard two-phase Spark
    * aggregation — map-side partial summaries, one tiny shuffle of
    * k-entry maps, never a vocabulary-wide exchange.
    */
  class MisraGriesOf[I](k: Int, term: I => String)
      extends Aggregator[I, Map[String, Long], Seq[(String, Long)]] {
    require(k > 0, "MisraGries needs k > 0")

    def zero: Map[String, Long] = Map.empty

    def reduce(m: Map[String, Long], in: I): Map[String, Long] = {
      val x = term(in)
      m.get(x) match {
        case Some(c) => m.updated(x, c + 1L)
        case None if m.size < k => m.updated(x, 1L)
        case None =>
          // decrement-all; drop zeros (amortized O(1) decrements per
          // insertion — each decrement pays back an earlier increment)
          m.flatMap { case (t, c) =>
            if (c > 1L) Some(t -> (c - 1L)) else None
          }
      }
    }

    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-largest counter from everything; at most
        // k survive, preserving the N/k error bound
        val cut = sum.values.toSeq.sortBy(-_).apply(k)
        sum.flatMap { case (t, c) =>
          if (c > cut) Some(t -> (c - cut)) else None
        }
      }
    }

    def finish(m: Map[String, Long]): Seq[(String, Long)] =
      m.toSeq.sortBy { case (t, c) => (-c, t) }

    def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      Encoders.kryo[Seq[(String, Long)]]
  }

  /** String-column form of [[MisraGriesOf]]. */
  final class MisraGries(k: Int) extends MisraGriesOf[String](k, identity)

  /** Approximate heavy hitters over a string column: one pass, one
    * k-bounded shuffle. Output: (term, est_count) with est_count in
    * [true - N/k, true]; every term with true count > N/k present. */
  def approxHeavyHitters(df: DataFrame, column: Column,
      k: Int): Seq[(String, Long)] = {
    import df.sparkSession.implicits._
    df.select(column.cast("string").as("t"))
      .na.drop().as[String]
      .select(new MisraGries(k).toColumn)
      .head()
  }

  /** Per-group heavy hitters: one MG summary per key — per-language /
    * per-source frequent terms with per-stratum N_g/k bounds. Shuffle
    * volume is k counters per GROUP, never the vocabulary. */
  def approxHeavyHittersByKey(df: DataFrame, keyCol: Column,
      termCol: Column, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select(keyCol.cast("string").as("k"),
        termCol.cast("string").as("t"))
      .na.drop().as[(String, String)]
      .groupByKey(_._1)
      .agg(new MisraGriesOf[(String, String)](k, _._2).toColumn)
      .flatMap { case (key, hh) =>
        hh.map { case (t, c) => (key, t, c) }
      }
      .toDF("key", "term", "est_count")
  }
}
