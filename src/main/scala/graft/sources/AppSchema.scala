package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** App-schema config bootstrap — the SchemaConfig analogue of the
  * reference's load_and_validate_schema
  * (/root/reference/utils/load_and_validate_schema.py:40-306) over the
  * `resource/app_schema_{version}.json` shape. Driver-side, jackson
  * (ships with Spark). Validation mirrors the reference: required keys
  * present, mandatory-field lists non-empty, version strings sane. */
object AppSchema {

  final case class Config(
      appVersion: String,
      cdeVersion: String,
      oldCdeVersion: String,
      allowOldCde: Boolean,
      cdeMandatoryFields: Seq[String],
      validCategMandatoryFields: Seq[String],
      defaultInputDelimiter: String,
      requiredTables: Seq[String],
      humanSpecificTables: Seq[String],
      previewMaxRows: Int) {
    /** table_list = required + species-specific (app.py:221-241). */
    def tablesFor(species: String): Seq[String] =
      if (species.equalsIgnoreCase("Human")) requiredTables ++ humanSpecificTables
      else requiredTables
  }

  def load(path: String): Config =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  def parse(json: String): Config = {
    val root = new ObjectMapper().readTree(json)
    def req(node: JsonNode, key: String): JsonNode = {
      val n = node.get(key)
      require(n != null, s"app schema missing required key: $key")
      n
    }
    def strList(n: JsonNode): Seq[String] = n.elements().asScala.map(_.asText()).toSeq

    val cde = req(root, "cde_definition")
    val tables = req(root, "table_names")
    val cfg = Config(
      appVersion = req(root, "app_version").asText(),
      cdeVersion = req(cde, "cde_version").asText(),
      oldCdeVersion = Option(cde.get("old_cde_version")).map(_.asText()).getOrElse(""),
      allowOldCde = Option(cde.get("allow_old_cde")).exists(_.asBoolean()),
      cdeMandatoryFields = strList(req(cde, "cde_mandatory_fields")),
      validCategMandatoryFields = strList(req(cde, "valid_categ_mandatory_fields")),
      defaultInputDelimiter =
        Option(root.get("default_input_delimiter")).map(_.asText()).getOrElse(","),
      requiredTables = strList(req(tables, "required")),
      humanSpecificTables =
        Option(tables.get("human_specific")).map(strList).getOrElse(Nil),
      previewMaxRows =
        Option(root.get("preview_max_rows")).map(_.asInt()).getOrElse(5))
    require(cfg.cdeMandatoryFields.nonEmpty, "cde_mandatory_fields must be non-empty")
    require(cfg.requiredTables.nonEmpty, "table_names.required must be non-empty")
    require(cfg.appVersion.startsWith("v"), s"unexpected app_version: ${cfg.appVersion}")
    cfg
  }

  /** Step-1 selection options with the guaranteed "Other" entry
    * (ensure_step1_other_options, /root/reference/utils/help_menus.py:106-134):
    * each drop-down list gains "Other" if absent, and the assay
    * label→key map gains "Other"→"other". Pure config bootstrap. */
  final case class SelectionOptions(
      species: Seq[String],
      sampleSources: Seq[String],
      assayTypes: Seq[String],
      assayLabelToKey: Map[String, String]) {
    def assayKeys: Set[String] = assayLabelToKey.values.toSet
  }

  def ensureOtherOptions(opts: SelectionOptions): SelectionOptions = {
    def withOther(xs: Seq[String]): Seq[String] =
      if (xs.contains("Other")) xs else xs :+ "Other"
    opts.copy(
      species = withOther(opts.species),
      sampleSources = withOther(opts.sampleSources),
      assayTypes = withOther(opts.assayTypes),
      assayLabelToKey =
        if (opts.assayLabelToKey.contains("Other")) opts.assayLabelToKey
        else opts.assayLabelToKey + ("Other" -> "other"))
  }

  /** CDE-vs-app-schema vocabulary diff (J4,
    * /root/reference/utils/validate_ui.py:244-295): set difference in
    * both directions between a rule's Validation vocabulary and an
    * external key set. */
  def vocabDiff(validation: Seq[String], externalKeys: Seq[String]): (Seq[String], Seq[String]) = {
    val v = validation.toSet
    val e = externalKeys.toSet
    ((v -- e).toSeq.sorted, (e -- v).toSeq.sorted)
  }
}
