package graft

import org.apache.spark.sql.functions._

import graft.model.Model
import graft.model.Model._

/** Canonical schema sanity: typed Datasets round-trip and the
  * committee dimension drives J2-style lookups. */
class ModelSpec extends SparkTestBase {
  import spark.implicits._

  test("Meeting Dataset has the canonical schema and round-trips") {
    val ds = Seq(
      Meeting("https://x.dk/vis?1", "aarhus", "Oekonomi",
        Some(java.sql.Date.valueOf("2024-04-08")), "referat", 0L),
      Meeting("https://x.dk/vis?2", "aarhus", "Oekonomi", None,
        "dagsorden", 1L)).toDS()
    assert(ds.schema.fieldNames.toSeq == Seq("url", "municipality",
      "committee", "meetingDate", "docType", "discoveryIdx"))
    val back = ds.collect()
    assert(back(1).meetingDate.isEmpty)
    assert(back(0).meetingDate.get.toString == "2024-04-08")
  }

  test("committee dimension broadcast-joins to bucket suffixes (J2)") {
    val dim = Model.committeeSources.toDS()
    assert(dim.count() == 4)
    val docs = Seq(("aarhus", "Teknik"), ("vejle", "Oekonomi"))
      .toDF("municipality", "committee")
    val out = docs.join(broadcast(dim.toDF()), Seq("committee"))
      .withColumn("bucket", concat(lit("raw-files-"), col("municipality"),
        col("bucket_suffix")))
      .select("bucket").as[String].collect().sorted
    assert(out.sameElements(Array(
      "raw-files-aarhus-teknikmiljoe", "raw-files-vejle")))
  }

  test("DocumentRef/IngestInventory schemas match the sink contract") {
    val d = Seq(DocumentRef("f.pdf", "raw-files-aarhus", "f&&url.pdf",
      "https://x.dk", Array[Byte](1, 2))).toDS()
    assert(d.schema.fieldNames.toSeq == Seq("filename", "bucket",
      "remoteKey", "sourceUrl", "content"))
    val inv = Seq(IngestInventory("raw-files-aarhus", "f.pdf")).toDS()
    assert(inv.schema.fieldNames.toSeq == Seq("bucket", "key"))
  }
}
