package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.parse.HtmlParser

/** Portal/committee discovery dataflows (reference get_base_url.py and
  * get_start_url.py):
  *
  *  - S2: text-lines scan of portal URLs (skip blanks/comments/non-http)
  *  - S9: generative candidate scan — stems x prefixes x suffixes cross
  *    product, probed concurrently; F9 keeps status < 400; D2 distinct
  *  - S10: keyword DOM discovery of the committee page with the
  *    reference's 3-strategy fallback (data-value -> parent -> href)
  *  - K3/K4: CSV config sink and text-lines sink
  *
  * The HTTP probe is pluggable ([[Prober]]) so the dataflow is hermetic
  * under test and maps to a per-partition pooled client in production
  * (get_base_url.py:90's 15-thread pool becomes task parallelism).
  */
object Discovery {

  /** S2: one URL per line; skip blank lines, `#` comments, non-http
    * (get_start_url.py:24-34,154). */
  def readPortalList(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(trim(col("value")).as("url"))
      .filter(col("url").startsWith("http"))

  /** S9 cross product: stems x prefixes x suffixes
    * (get_base_url.py:15-33,62-81). Small dims — the cross join is the
    * candidate generator, sized stems*6, not data-scale. */
  def candidateUrls(spark: SparkSession, stems: Seq[String],
      prefixes: Seq[String] = Seq("dagsordener.", "dagsorden.", "www.dagsordener."),
      suffixes: Seq[String] = Seq(".dk", "kommune.dk")): DataFrame = {
    import spark.implicits._
    val s = stems.toDF("stem")
    val p = prefixes.toDF("prefix")
    val x = suffixes.toDF("suffix")
    s.crossJoin(p).crossJoin(x)
      .select(col("stem"),
        concat(lit("https://"), col("prefix"), col("stem"), col("suffix"))
          .as("url"))
  }

  /** Pluggable status probe (HEAD-with-GET-fallback in production,
    * get_base_url.py:36-59; static map in tests). */
  trait Prober extends Serializable { def status(url: String): Int }
  final case class StaticProber(statuses: Map[String, Int],
      default: Int = 404) extends Prober {
    def status(url: String): Int = statuses.getOrElse(url, default)
  }

  /** S9 probe + F9 filter + D2 distinct: live portals. Probing runs in
    * mapPartitions (one client per partition, task-parallel across the
    * cluster — the Spark analog of the reference's thread pool). */
  def probePortals(candidates: DataFrame, prober: Prober): DataFrame = {
    import candidates.sparkSession.implicits._
    candidates.select("stem", "url").as[(String, String)]
      .mapPartitions { it =>
        it.map { case (stem, url) => (stem, url, prober.status(url)) }
      }
      .toDF("stem", "url", "status")
      .filter(col("status") < 400)
      .select("stem", "url").distinct()
  }

  /** Committee keywords, checked in order (get_start_url.py:77). */
  val committeeKeywords: Seq[String] =
    Seq("økonomiudvalget", "økonomiudvalg", "økonomi-udvalget")

  /** S10: find the committee id on a portal page with the reference's
    * fallback cascade (get_start_url.py:80-128):
    * element data-value -> ancestor data-value -> href udvalgId param.
    * Pure driver-free logic: runs per page row via mapPartitions. */
  def findCommitteeId(html: String): Option[String] = {
    val root = HtmlParser.parse(html)
    val hits = root.descendants.filter { n =>
      val t = n.text.toLowerCase
      committeeKeywords.exists(t.contains) && n.children.isEmpty
    }.toSeq
    val idRe = "udvalgId=([a-f0-9\\-]+)".r
    hits.iterator.flatMap { n =>
      n.attr("data-value")
        .orElse(n.ancestors.flatMap(_.attr("data-value")).toSeq.headOption)
        .orElse(n.attr("href")
          .orElse(n.ancestors.flatMap(_.attr("href")).toSeq.headOption)
          .flatMap(h => idRe.findFirstMatchIn(h).map(_.group(1))))
    }.toSeq.headOption
  }

  /** S10 over a portals DataFrame (base_url, html) -> configs
    * (base_url, start_url), the shape K3 persists
    * (get_start_url.py:137-160). */
  def discoverCommittees(portals: DataFrame): DataFrame = {
    import portals.sparkSession.implicits._
    portals.select("base_url", "html").as[(String, String)]
      .mapPartitions(_.map { case (base, html) =>
        (base, findCommitteeId(html).orNull)
      })
      .toDF("base_url", "committee_id")
      .filter(col("committee_id").isNotNull)
      .select(col("base_url"),
        concat(regexp_replace(col("base_url"), "/+$", ""),
          lit("/?request.kriterie.udvalgId="), col("committee_id"))
          .as("start_url"))
  }

  /** K3: CSV config sink with the reference's header names
    * (get_start_url.py:147-160). */
  def writeConfigCsv(configs: DataFrame, path: String): Unit =
    configs
      .select(col("base_url").as("Base URL"), col("start_url").as("Start URL"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** K4: text-lines sink (get_base_url.py:120-122). */
  def writeTextLines(urls: DataFrame, path: String): Unit =
    urls.select(col("url")).coalesce(1)
      .write.mode("overwrite").text(path)
}
