package graft.ext

import org.apache.spark.sql.functions._

/** File-first curation recipes: a [[Curation.Config]] authored as JSON
  * or YAML — the same discipline as the declarative check suites
  * ([[graft.suite.SuiteLoader]]) and the file-loaded scorer
  * ([[QualityScore.loadConfig]]): the recipe a training run used is a
  * reviewed, diffable ARTIFACT, not code.
  *
  * Loadable surface (snake_case keys; absent keys keep the Config
  * default; unknown keys are REJECTED loudly — a typo like
  * `min_token` must not silently run the default recipe):
  *
  * {{{
  * { "min_tokens": 25, "max_tokens": 90,
  *   "rates": { "en": 0.4 }, "default_rate": 1.0,
  *   "seq_len": 512, "seed": 42,
  *   "min_containment": 0.8, "contamination_ngram": 4,
  *   "clean_first": true, "dedup_lines_first": true,
  *   "xdoc_min_df": 3, "soft_dedup": false,
  *   "c4_gate": false, "c4_block_phrases": ["lorem ipsum"],
  *   "keeper_quality": "text_length",
  *   "gopher_preset": "en",
  *   "quality_min_band": "medium",
  *   "text_col": "text", "key_col": "doc_id", "strata_col": "lang" }
  * }}}
  *
  * Deliberately NOT loadable: runtime artifacts. A perplexity model or
  * a DSIR model is a PERSISTED dataset loaded with `NgramLm.load` /
  * `Dsir.load` at the call site — a recipe references those by path in
  * the pipeline that applies it, because loading them needs a live
  * SparkSession and their content is data, not configuration.
  * `keeper_quality` supports the one builtin every published keep-best
  * recipe uses (`"text_length"` — raw length of the text column);
  * arbitrary quality expressions stay code. `gopher_preset` /
  * `gopher_presets` name entries of the SHIPPED preset catalog
  * ([[TextAnalysis.gopherPresets]]).
  *
  * All of [[Curation.Config]]'s own `require` guards fire on the
  * constructed value, so a file cannot smuggle in a state code
  * couldn't. */
object CurationRecipe {

  private val KnownKeys = Set(
    "min_containment", "contamination_ngram", "min_tokens", "max_tokens",
    "rates", "default_rate", "seed", "seq_len", "quality_min_band",
    "clean_first", "dedup_lines_first", "xdoc_min_df", "soft_dedup",
    "c4_gate", "c4_block_phrases", "keeper_quality",
    "gopher_preset", "gopher_presets",
    "url_col", "blocked_domains",
    "text_col", "key_col", "strata_col")

  /** Parse recipe text into a Config. `yaml = true` for YAML. */
  def parse(text: String, yaml: Boolean = false): Curation.Config = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
    import scala.jdk.CollectionConverters._
    val mapper =
      if (yaml) new ObjectMapper(new YAMLFactory()) else new ObjectMapper()
    val root = mapper.readTree(text)
    val unknown = root.fieldNames().asScala.toSeq.filterNot(KnownKeys)
    require(unknown.isEmpty,
      s"curation recipe: unknown keys ${unknown.mkString(", ")} — " +
        "a typo must not silently run the default recipe")

    def longAt(key: String, default: Long): Long = {
      val n = root.path(key)
      if (n.isMissingNode) default
      else {
        require(n.isIntegralNumber && n.canConvertToLong,
          s"curation recipe: $key must be an integer, got '$n'")
        n.asLong()
      }
    }
    def intAt(key: String, default: Int): Int = {
      val v = longAt(key, default.toLong)
      require(v >= Int.MinValue && v <= Int.MaxValue,
        s"curation recipe: $key ($v) out of int range")
      v.toInt
    }
    def doubleAt(key: String, default: Double): Double = {
      val n = root.path(key)
      if (n.isMissingNode) default
      else { require(n.isNumber, s"curation recipe: $key must be numeric"); n.asDouble() }
    }
    def boolAt(key: String, default: Boolean): Boolean = {
      val n = root.path(key)
      if (n.isMissingNode) default
      else { require(n.isBoolean, s"curation recipe: $key must be a boolean"); n.asBoolean() }
    }
    def strAt(key: String, default: String): String = {
      val n = root.path(key)
      if (n.isMissingNode) default
      else { require(n.isTextual, s"curation recipe: $key must be a string"); n.asText() }
    }
    def strSeqAt(key: String, default: Seq[String]): Seq[String] = {
      val n = root.path(key)
      if (n.isMissingNode) default
      else {
        require(n.isArray, s"curation recipe: $key must be an array of strings")
        val s = n.elements().asScala.map { e =>
          require(e.isTextual, s"curation recipe: $key entries must be strings")
          e.asText()
        }.toSeq
        require(s.forall(_.nonEmpty), s"curation recipe: $key entries must be non-empty")
        s
      }
    }

    val base = Curation.Config()
    val rates = {
      val n = root.path("rates")
      if (n.isMissingNode) base.rates
      else {
        require(n.isObject, "curation recipe: rates must be an object of stratum -> rate")
        n.fields().asScala.map { e =>
          require(e.getValue.isNumber,
            s"curation recipe: rates.${e.getKey} must be numeric")
          e.getKey -> e.getValue.asDouble()
        }.toMap
      }
    }
    val textCol = strAt("text_col", base.textCol)
    val keeper = {
      val n = root.path("keeper_quality")
      if (n.isMissingNode) None
      else {
        require(n.isTextual && n.asText() == "text_length",
          "curation recipe: keeper_quality supports the builtin " +
            s"'text_length' only (got '$n') — arbitrary quality " +
            "expressions stay code")
        Some(length(col(textCol)))
      }
    }
    def presetOf(name: String): TextAnalysis.GopherPreset = {
      require(TextAnalysis.gopherPresets.contains(name),
        s"curation recipe: gopher preset '$name' is not in the shipped " +
          s"catalog (${TextAnalysis.gopherPresets.keys.toSeq.sorted.mkString(", ")})")
      TextAnalysis.gopherPresets(name)
    }
    val gopherPreset = {
      val n = root.path("gopher_preset")
      if (n.isMissingNode) None
      else {
        require(n.isTextual, "curation recipe: gopher_preset must be a string")
        Some(presetOf(n.asText()))
      }
    }
    val gopherPresets = {
      val n = root.path("gopher_presets")
      if (n.isMissingNode) None
      else Some(strSeqAt("gopher_presets", Nil).map(k => k -> presetOf(k)).toMap)
    }
    val xdocMinDf = {
      val n = root.path("xdoc_min_df")
      if (n.isMissingNode) None else Some(longAt("xdoc_min_df", 0L))
    }
    val urlCol = {
      val n = root.path("url_col")
      if (n.isMissingNode) None else Some(strAt("url_col", ""))
    }

    base.copy(
      minContainment = doubleAt("min_containment", base.minContainment),
      contaminationNGram = intAt("contamination_ngram", base.contaminationNGram),
      minTokens = longAt("min_tokens", base.minTokens),
      maxTokens = longAt("max_tokens", base.maxTokens),
      rates = rates,
      defaultRate = doubleAt("default_rate", base.defaultRate),
      seed = longAt("seed", base.seed),
      seqLen = longAt("seq_len", base.seqLen),
      qualityMinBand = strAt("quality_min_band", base.qualityMinBand),
      cleanFirst = boolAt("clean_first", base.cleanFirst),
      dedupLinesFirst = boolAt("dedup_lines_first", base.dedupLinesFirst),
      xdocMinDf = xdocMinDf,
      softDedup = boolAt("soft_dedup", base.softDedup),
      c4Gate = boolAt("c4_gate", base.c4Gate),
      c4BlockPhrases = strSeqAt("c4_block_phrases", base.c4BlockPhrases),
      keeperQuality = keeper,
      gopherPreset = gopherPreset,
      gopherPresets = gopherPresets,
      urlCol = urlCol,
      blockedDomains = strSeqAt("blocked_domains", base.blockedDomains),
      textCol = textCol,
      keyCol = strAt("key_col", base.keyCol),
      strataCol = strAt("strata_col", base.strataCol))
  }

  /** Load a recipe from a file path (.yaml/.yml vs .json by suffix). */
  def load(path: String): Curation.Config = {
    val yaml = path.endsWith(".yaml") || path.endsWith(".yml")
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)), yaml)
  }

  /** [[load]] from the library's own CLASSPATH (leading slash optional)
    * — for recipes that SHIP WITH the engine jar: a filesystem path is
    * relative to the process working directory, which a library must
    * not assume (the registered recipe query failed under a bench
    * harness launched from another directory — cwd is the caller's,
    * not the repo's). Checked-in pipeline recipes keep using [[load]];
    * this is for the engine's own bundled defaults. */
  def loadResource(resource: String): Curation.Config = {
    val path = if (resource.startsWith("/")) resource else s"/$resource"
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"recipe resource $path not on the classpath")
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    parse(text, path.endsWith(".yaml") || path.endsWith(".yml"))
  }
}
