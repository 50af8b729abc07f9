package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.parsers

/** The full BAG table registry (SURVEY.md §1.2/§1.4): all 15 target
  * tables of the reference, declared as [[TableSpec]]s for the generic
  * `ImportPipeline.importTable`, exactly mirroring the per-task kwargs
  * of `ImportBagHJob.tasks()` (bagh/batch.py:459-592), the
  * presence-driven common fields of `process_row_common`
  * (bagh/batch.py:154-240), and the DDL (bagh/bagh_create.sql).
  *
  * Faithfulness notes:
  *  - FK reference ids are versioned: `create_id(identificatie,
  *    int(volgnummer or "1"))` against the parent's `id`
  *    (bagh/batch.py:226-238); a null identificatie yields a null id,
  *    which passes the check (:231).
  *  - `pand` declares NO fk (its task has no `references` kwarg —
  *    bouwblok_id simply stays null), and no extra fields: DDL columns
  *    like bouwjaar/ligging are never populated by the loader.
  *  - verblijfsobject preserves the reference's redenafvoer bug
  *    (sourced from redenopvoer, bagh/batch.py:559-560) and the
  *    asymmetric empty-pipe-list semantics (gebruiksdoel `""` →
  *    `[""]`, toegang `""` → `[]`, :547,556-558).
  *  - `gemeente` is the hardcoded literal seed (:290-317), not a CSV.
  *  - The M:N bridge (verblijfsobjectpandrelatie) is derived from the
  *    vbo frame (explode + semi-join, §2.3 J6), not scanned.
  */
object BagTables {

  /** Mandatory temporal key block, every entity table (§1.1). */
  private val temporal: Seq[(String, String)] = Seq(
    "identificatie" -> "identificatie",
    "volgnummer" -> "volgnummer",
    "registratiedatum" -> "registratiedatum",
    "beginGeldigheid" -> "begin_geldigheid",
    "eindGeldigheid" -> "eind_geldigheid")

  /** GOB relation-field prefixes (model_field_map, bagh/batch.py:214-225). */
  private val fieldMap: Map[String, String] = Map(
    "gemeente" -> "ligtIn:BRK.GME",
    "stadsdeel" -> "ligtIn:GBD.SDL",
    "ggw_gebied" -> "ligtIn:GBD.GGW",
    "wijk" -> "ligtIn:GBD.WIJK",
    "buurt" -> "ligtIn:GBD.BRT",
    "woonplaats" -> "ligtIn:BAG.WPS",
    "openbare_ruimte" -> "ligtAan:BAG.ORE",
    "ligplaats" -> "adresseert:BAG.LPS",
    "standplaats" -> "adresseert:BAG.SPS",
    "verblijfsobject" -> "adresseert:BAG.VOT")

  /** Reference-id volgnummer parse: `int(volgnummer or "1")`
    * (bagh/batch.py:226-238). Empty/absent defaults to 1, but a
    * NON-NUMERIC value raises ValueError in the reference and aborts
    * the whole task — mirrored here with `raise_error` (a silent
    * version-001 fallback would commit ids the reference never
    * produces). The error fires lazily, per offending row, at the
    * first action over the frame — same fail-fast point as the
    * reference's row loop. */
  private def volgOrAbort(what: String, volgRaw: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(parsers.emptyToNull(volgRaw).isNull, lit(1))
      .otherwise(coalesce(parsers.intOrNone(volgRaw),
        raise_error(concat(lit(s"non-numeric volgnummer for $what: '"),
          volgRaw, lit("'"))).cast("int")))

  /** One versioned FK reference: the raw (identificatie, volgnummer)
    * pair, the derived `<model>_id` column, and its existence check. */
  private def ref(model: String): (Seq[(String, String)],
      Seq[(String, org.apache.spark.sql.Column)], FkSpec) = {
    val f = fieldMap(model)
    val src = Seq(
      s"$f.identificatie" -> s"__${model}_ident",
      s"$f.volgnummer" -> s"__${model}_volg")
    val idCol = Seq(s"${model}_id" -> parsers.createId(
      parsers.emptyToNull(col(s"__${model}_ident")),
      volgOrAbort(s"$model ref", col(s"__${model}_volg"))))
    (src, idCol, FkSpec(s"${model}_id", model, "id"))
  }

  private def refs(models: String*): (Seq[(String, String)],
      Seq[(String, org.apache.spark.sql.Column)], Seq[FkSpec]) = {
    val parts = models.map(ref)
    (parts.flatMap(_._1), parts.flatMap(_._2), parts.map(_._3))
  }

  /** documentdatum+documentnummer presence pair (bagh/batch.py:196-198). */
  private val document: (Seq[(String, String)], Seq[(String, org.apache.spark.sql.Column)]) = (
    Seq("documentdatum" -> "__documentdatum_raw", "documentnummer" -> "documentnummer"),
    Seq("documentdatum" -> parsers.parseDate(col("__documentdatum_raw"))))

  /** aanduidingInOnderzoek + geconstateerd tri-state booleans (:199-204). */
  private val onderzoek: (Seq[(String, String)], Seq[(String, org.apache.spark.sql.Column)]) = (
    Seq("aanduidingInOnderzoek" -> "__aio_raw", "geconstateerd" -> "__gec_raw"),
    Seq("aanduiding_in_onderzoek" -> parsers.parseYesNo(col("__aio_raw")),
      "geconstateerd" -> parsers.parseYesNo(col("__gec_raw"))))

  private def spec(name: String,
      fields: Seq[(String, String)],
      extra: Seq[(String, org.apache.spark.sql.Column)] = Nil,
      refModels: Seq[String] = Nil,
      geo: Option[String] = None): TableSpec = {
    val (refSrc, refExtra, fkSpecs) = refs(refModels: _*)
    val geoSrc = geo.map(_ => "geometrie" -> "geometrie").toSeq
    TableSpec(
      name = name,
      sourceCols = temporal ++ fields ++ geoSrc ++ refSrc,
      extraCols = extra ++ refExtra,
      fks = fkSpecs,
      geometry = geo.map(t => GeoSpec("geometrie", t)))
  }

  /** The gemeente seed row (bagh/batch.py:290-317) — S6 literal source. */
  def gemeenteSeed(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("0363", 1, "1900-01-01 00:00:00", "1900-01-01", "", "Amsterdam", "J"))
      .toDF("identificatie", "volgnummer", "registratiedatum",
        "beginGeldigheid", "eindGeldigheid", "naam", "verzorgingsgebied")
      .select(
        parsers.createId(col("identificatie"), col("volgnummer")).as("id"),
        col("identificatie"), col("volgnummer"),
        parsers.parseDateTime(col("registratiedatum")).as("registratiedatum"),
        parsers.parseDate(col("beginGeldigheid")).as("begin_geldigheid"),
        parsers.parseDate(col("eindGeldigheid")).as("eind_geldigheid"),
        col("naam"),
        parsers.parseYesNo(col("verzorgingsgebied")).as("verzorgingsgebied"))
  }

  val stadsdeel: TableSpec = spec("stadsdeel",
    fields = Seq("code" -> "code", "naam" -> "naam") ++ document._1,
    extra = document._2,
    refModels = Seq("gemeente"),
    geo = Some("MULTIPOLYGON"))

  val ggwGebied: TableSpec = spec("ggw_gebied",
    fields = Seq("code" -> "code", "naam" -> "naam") ++ document._1,
    extra = document._2,
    refModels = Seq("stadsdeel"),
    geo = Some("MULTIPOLYGON"))

  val ggwPraktijkgebied: TableSpec = spec("ggw_praktijkgebied",
    fields = Seq("naam" -> "naam") ++ document._1,
    extra = document._2,
    refModels = Seq("stadsdeel"),
    geo = Some("MULTIPOLYGON"))

  val wijk: TableSpec = spec("wijk",
    fields = Seq("code" -> "code", "naam" -> "naam",
      "cbsCode" -> "cbs_code") ++ document._1,
    extra = document._2,
    refModels = Seq("stadsdeel", "ggw_gebied"),
    geo = Some("MULTIPOLYGON"))

  val buurt: TableSpec = spec("buurt",
    fields = Seq("code" -> "code", "naam" -> "naam",
      "cbsCode" -> "cbs_code") ++ document._1,
    extra = document._2,
    refModels = Seq("wijk", "ggw_gebied", "stadsdeel"),
    geo = Some("MULTIPOLYGON"))

  val bouwblok: TableSpec = spec("bouwblok",
    fields = Seq("code" -> "code"),
    refModels = Seq("buurt"),
    geo = Some("MULTIPOLYGON"))

  /** NO gemeente FK: the task passes `use=["gemeente"]`, but the base
    * class only reads the `references` kwarg (bagh/batch.py:56-58,465)
    * — the `use` list is silently ignored, so woonplaats rows are
    * never checked and gemeente_id stays null. Reference quirk
    * preserved as-is. */
  val woonplaats: TableSpec = spec("woonplaats",
    fields = Seq("naam" -> "naam", "status" -> "status") ++
      document._1 ++ onderzoek._1,
    extra = document._2 ++ onderzoek._2,
    geo = Some("MULTIPOLYGON"))

  val openbareRuimte: TableSpec = spec("openbare_ruimte",
    fields = Seq("naam" -> "naam", "type" -> "type", "status" -> "status",
      "naamNEN" -> "naam_nen") ++ document._1 ++ onderzoek._1,
    extra = document._2 ++ onderzoek._2,
    refModels = Seq("woonplaats"),
    geo = Some("MULTIPOLYGON"))

  val ligplaats: TableSpec = spec("ligplaats",
    fields = Seq("status" -> "status") ++ document._1 ++ onderzoek._1,
    extra = document._2 ++ onderzoek._2,
    refModels = Seq("buurt"),
    geo = Some("POLYGON"))

  val standplaats: TableSpec = spec("standplaats",
    fields = Seq("status" -> "status") ++ document._1 ++ onderzoek._1,
    extra = document._2 ++ onderzoek._2,
    refModels = Seq("buurt"),
    geo = Some("POLYGON"))

  /** No `references` kwarg in the task and no extra fields: bouwblok_id
    * and the bouwjaar/ligging/... DDL columns stay null. */
  val pand: TableSpec = spec("pand",
    fields = Seq("status" -> "status") ++ document._1 ++ onderzoek._1,
    extra = document._2 ++ onderzoek._2,
    geo = Some("POLYGON"))

  val verblijfsobject: TableSpec = spec("verblijfsobject",
    fields = Seq("status" -> "status",
      "oppervlakte" -> "__oppervlakte_raw",
      "verdiepingToegang" -> "__verdieping_raw",
      "hoogsteBouwlaag" -> "__hoogste_raw",
      "laagsteBouwlaag" -> "__laagste_raw",
      "aantalKamers" -> "__kamers_raw",
      "eigendomsverhouding" -> "eigendomsverhouding",
      "gebruiksdoel" -> "__gebruiksdoel_raw",
      "gebruiksdoelWoonfunctie" -> "__gd_woon_raw",
      "gebruiksdoelGezondheidszorgfunctie" -> "__gd_gezond_raw",
      "toegang" -> "__toegang_raw",
      "redenopvoer" -> "__redenopvoer_raw",
      "heeftIn:BAG.NAG.identificatieHoofdadres" -> "__hoofd_ident",
      "heeftIn:BAG.NAG.volgnummerHoofdadres" -> "__hoofd_volg",
      "heeftIn:BAG.NAG.identificatieNevenadres" -> "__neven_idents",
      "heeftIn:BAG.NAG.volgnummerNevenadres" -> "__neven_volgs") ++
      document._1 ++ onderzoek._1,
    extra = Seq(
      "oppervlakte" -> parsers.intOrNone(col("__oppervlakte_raw")),
      "verdieping_toegang" -> parsers.intOrNone(col("__verdieping_raw")),
      "hoogste_bouwlaag" -> parsers.intOrNone(col("__hoogste_raw")),
      "laagste_bouwlaag" -> parsers.intOrNone(col("__laagste_raw")),
      "aantal_kamers" -> parsers.intOrNone(col("__kamers_raw")),
      "gebruiksdoel" -> parsers.pipeSplit(col("__gebruiksdoel_raw"), emptyAsNil = false),
      "gebruiksdoel_woonfunctie" -> parsers.emptyToNull(col("__gd_woon_raw")),
      "gebruiksdoel_gezondheidszorgfunctie" -> parsers.emptyToNull(col("__gd_gezond_raw")),
      "toegang" -> parsers.pipeSplit(col("__toegang_raw"), emptyAsNil = true),
      "redenopvoer" -> parsers.emptyToNull(col("__redenopvoer_raw")),
      // reference bug preserved on purpose (bagh/batch.py:559-560)
      "redenafvoer" -> parsers.emptyToNull(col("__redenopvoer_raw")),
      "heeftin_hoofdadres_id" -> parsers.createId(
        parsers.emptyToNull(col("__hoofd_ident")),
        volgOrAbort("hoofdadres ref", col("__hoofd_volg"))),
      "heeftin_nevenadres_id" -> parsers.createIds(
        col("__neven_idents"), col("__neven_volgs"))) ++
      document._2 ++ onderzoek._2,
    refModels = Seq("buurt"),
    geo = Some("POINT"))

  val nummeraanduiding: TableSpec = spec("nummeraanduiding",
    fields = Seq("status" -> "status",
      "huisnummer" -> "__huisnummer_raw",
      "huisletter" -> "__huisletter_raw",
      "huisnummertoevoeging" -> "__toevoeging_raw",
      "postcode" -> "postcode",
      "typeAdres" -> "type_adres") ++ document._1 ++ onderzoek._1,
    extra = Seq(
      "huisnummer" -> parsers.intOrNone(col("__huisnummer_raw")),
      "huisletter" -> parsers.emptyToNull(col("__huisletter_raw")),
      "huisnummer_toevoeging" -> parsers.emptyToNull(col("__toevoeging_raw"))) ++
      document._2 ++ onderzoek._2,
    refModels = Seq("ligplaats", "standplaats", "verblijfsobject", "openbare_ruimte"))

  /** All CSV-loaded specs in the reference's task order
    * (bagh/batch.py:459-592) — a topological sort of the FK DAG;
    * gemeente (seed) precedes them all. */
  val loadOrder: Seq[TableSpec] = Seq(
    woonplaats, stadsdeel, ggwGebied, ggwPraktijkgebied, wijk, buurt,
    bouwblok, openbareRuimte, ligplaats, standplaats, pand,
    verblijfsobject, nummeraanduiding)

  /** GOB source path prefix per spec (gob_path kwargs). */
  val gobPath: Map[String, String] = Map(
    "stadsdeel" -> "gebieden", "ggw_gebied" -> "gebieden",
    "ggw_praktijkgebied" -> "gebieden", "wijk" -> "gebieden",
    "buurt" -> "gebieden", "bouwblok" -> "gebieden",
    "woonplaats" -> "bag", "openbare_ruimte" -> "bag",
    "ligplaats" -> "bag", "standplaats" -> "bag", "pand" -> "bag",
    "verblijfsobject" -> "bag", "nummeraanduiding" -> "bag")
}
