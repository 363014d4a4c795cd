package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The E1 orchestrator (reference run_scrapers.py): a job registry,
  * municipality-filter pruning (including the semi-join probe into the
  * generic scraper's configs), sequential execution with failure
  * isolation, and the A1 success/fail/duration aggregate.
  *
  * The reference isolates scrapers in subprocesses
  * (run_scrapers.py:68-75); here a job is a function over the shared
  * SparkSession and isolation is Spark's task/job failure containment —
  * one job failing never stops the run.
  */
object Orchestrator {

  /** A named pipeline job. `municipalities` declares which
    * municipalities the job covers (for filter pruning); None = the
    * generic scraper whose coverage comes from its config CSV. */
  final case class Job(
      name: String,
      municipalities: Option[Seq[String]],
      body: SparkSession => Long)

  final case class JobResult(name: String, ok: Boolean, ingested: Long,
      seconds: Double, error: String)

  /** Prune the registry by a municipality filter (case-insensitive
    * substring, reference run_scrapers.py:24-51): site-specific jobs
    * match on their declared names; the generic job runs iff ANY
    * config row matches (the semi-join probe, run_scrapers.py:29-51). */
  def prune(jobs: Seq[Job], filter: Option[String],
      genericConfigMunis: => Seq[String]): Seq[Job] =
    filter match {
      case None => jobs
      case Some(f) =>
        val fu = f.toUpperCase
        jobs.filter { j =>
          j.municipalities match {
            case Some(ms) => ms.exists(_.toUpperCase.contains(fu))
            case None => genericConfigMunis.exists(_.toUpperCase.contains(fu))
          }
        }
    }

  /** Run jobs sequentially (reference design choice,
    * run_scrapers.py:63-75 — parallelism lives INSIDE each Spark job),
    * isolating failures. */
  def runAll(spark: SparkSession, jobs: Seq[Job]): Seq[JobResult] =
    jobs.sortBy(_.name).map { j => // L4 deterministic run order
      val t0 = System.nanoTime()
      try {
        val n = j.body(spark)
        JobResult(j.name, ok = true, n, (System.nanoTime() - t0) / 1e9, null)
      } catch {
        case scala.util.control.NonFatal(e) =>
          JobResult(j.name, ok = false, 0L,
            (System.nanoTime() - t0) / 1e9, String.valueOf(e.getMessage))
      }
    }

  /** A1: the run report — success/fail counters + total duration
    * (run_scrapers.py:77-97) as an aggregation. */
  def report(spark: SparkSession, results: Seq[JobResult]): DataFrame = {
    import spark.implicits._
    results.toDF()
      .agg(
        count(when(col("ok"), 1)).as("n_ok"),
        count(when(!col("ok"), 1)).as("n_fail"),
        sum(col("ingested")).as("total_ingested"),
        round(sum(col("seconds")), 3).as("total_seconds"))
  }
}
