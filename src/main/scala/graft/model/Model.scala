package graft.model

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.Encoders

/** Canonical record schemas (SURVEY.md §1, FIXTURES.md §3): the
  * reference's duck-typed per-scraper dicts normalized to ONE fixed
  * shape each, as case classes with implicit-friendly Encoders. The
  * ingestion edges produce these; every downstream operator can rely
  * on the schema.
  */
object Model {

  /** Municipality config row (found_start_urls*.csv,
    * scraper.py:278-298). */
  final case class MunicipalityConfig(
      base_url: String,
      start_url: String,
      municipality: String)

  /** Committee source dimension (scraper.py:35-40,188-196,353-361). */
  final case class CommitteeSource(
      committee: String, // Oekonomi | Teknik | Byraad | Plan
      config_file: String,
      bucket_suffix: String, // "" | -teknikmiljoe | -byraad | -plan
      dir_suffix: String) // "" | _teknikmiljoe | _byraad | _plan

  val committeeSources: Seq[CommitteeSource] = Seq(
    CommitteeSource("Oekonomi", "found_start_urls.csv", "", ""),
    CommitteeSource("Teknik", "found_start_urls_teknikmiljoe.csv",
      "-teknikmiljoe", "_teknikmiljoe"),
    CommitteeSource("Byraad", "found_start_urls_byraad.csv",
      "-byraad", "_byraad"),
    CommitteeSource("Plan", "found_start_urls_plan.csv", "-plan", "_plan"))

  /** One discovered meeting (shape drift in the reference —
    * scraper_copenhagen.py:86-91 vs scraper_roedovre.py:135 —
    * normalized here). */
  final case class Meeting(
      url: String,
      municipality: String,
      committee: String,
      meetingDate: Option[java.sql.Date], // null when unparseable (F6)
      docType: String, // referat | dagsorden
      discoveryIdx: Long) // first-seen order for dedup/limit

  /** Agenda item, 1:N per meeting (scraper_copenhagen.py:147-151). */
  final case class AgendaItem(
      meetingUrl: String,
      number: Int,
      title: String,
      itemUrl: String)

  /** A document ready for (or landed in) the sink
    * (scraper.py:172-207). */
  final case class DocumentRef(
      filename: String,
      bucket: String,
      remoteKey: String,
      sourceUrl: String,
      content: Array[Byte])

  /** Sink inventory row — the anti-join right side (J1/K5). */
  final case class IngestInventory(bucket: String, key: String)

  implicit def configEncoder: Encoder[MunicipalityConfig] =
    Encoders.product[MunicipalityConfig]
  implicit def committeeEncoder: Encoder[CommitteeSource] =
    Encoders.product[CommitteeSource]
  implicit def meetingEncoder: Encoder[Meeting] = Encoders.product[Meeting]
  implicit def itemEncoder: Encoder[AgendaItem] = Encoders.product[AgendaItem]
  implicit def docEncoder: Encoder[DocumentRef] = Encoders.product[DocumentRef]
  implicit def invEncoder: Encoder[IngestInventory] =
    Encoders.product[IngestInventory]
}
