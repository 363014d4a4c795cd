package graft

import graft.ops.Dedup
import graft.pipeline.CorpusCuration

/** The full curation composition: monotone stage counts, no surviving
  * near-dup pairs, deterministic output. */
class CorpusCurationSpec extends SparkTestBase {

  test("curation stages shrink monotonically and account tokens") {
    val (curated, m) = CorpusCuration.curate(spark, sf("documents"))
    assert(m.input >= m.afterExact)
    assert(m.afterExact >= m.afterQuality)
    assert(m.afterQuality >= m.afterNearDup)
    assert(m.afterNearDup == curated.count())
    assert(m.afterNearDup > 0)
    assert(m.totalTokens > 0)
  }

  test("no near-dup pair above the threshold survives curation") {
    val (curated, _) = CorpusCuration.curate(spark, sf("documents"),
      nearDupThreshold = 0.5)
    val texts = curated.select("doc_id")
      .join(Tables.documents(spark, sf("documents")), "doc_id")
      .select("doc_id", "text")
    val survivors = Dedup.minHashNearDupPairs(texts, "text", "doc_id",
      threshold = 0.5)
    assert(survivors.count() == 0)
  }

  test("curateToChunks packs only surviving docs into bounded windows") {
    val (chunks, m) = CorpusCuration.curateToChunks(spark, sf("documents"),
      size = 32, stride = 24)
    val rows = chunks.collect()
    // every chunk obeys the window bound and belongs to a survivor
    assert(rows.forall(_.getAs[Long]("n_tok") <= 32))
    val (curated, _) = CorpusCuration.curate(spark, sf("documents"))
    val survivors = curated.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == survivors)
    // token accounting lines up: chunk tokens cover each survivor's
    // text at least once (overlap means >=, never <)
    assert(rows.map(_.getAs[Long]("n_tok")).sum >= m.totalTokens)
  }

  test("curation is deterministic across runs") {
    val a = CorpusCuration.curate(spark, sf("documents"))._1
      .collect().map(_.getLong(0)).sorted
    val b = CorpusCuration.curate(spark, sf("documents"))._1
      .collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }
}
