package graft.suite

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.SparkSession

import graft.model.ValidationSuiteResult
import graft.sink.ResultStore

/** Checkpoint descriptor: which suite to run and how. */
final case class CheckpointSpec(
    name: String, suitePath: String, useHistory: Boolean,
    writeDocs: Boolean)

/** The GE "checkpoint" analog — the last piece of the reference's
  * declared expectation surface (its project config scaffolds an empty
  * `checkpoints/` dir next to `expectations/`,
  * /root/reference/great_expectations/great_expectations.yml +
  * checkpoints/.gitkeep): a named, declarative bundle that loads a
  * suite, binds it to data (optionally against the result-store history
  * so drift expectations resolve), runs it, persists the results, and
  * optionally renders data-docs — one call from file to stored verdicts.
  */
object Checkpoint {

  private val knownFields =
    Set("checkpoint_name", "suite", "use_history", "write_docs")

  def parse(text: String, yaml: Boolean = false): CheckpointSpec = {
    val mapper =
      if (yaml) new ObjectMapper(new YAMLFactory()) else new ObjectMapper()
    val root = mapper.readTree(text)
    // Reject unknown keys: a typo like "use_histroy" must not silently
    // drop the declared behavior (same silent-kwarg-default class the
    // suite loader guards against).
    val unknown = {
      import scala.jdk.CollectionConverters._
      root.fieldNames().asScala.filterNot(knownFields).toSeq
    }
    require(unknown.isEmpty,
      s"unknown checkpoint field(s) ${unknown.mkString(", ")} — " +
        s"known: ${knownFields.toSeq.sorted.mkString(", ")}")
    val suite = root.path("suite").asText("")
    require(suite.nonEmpty, s"checkpoint declares no 'suite' path: $root")
    CheckpointSpec(
      name = root.path("checkpoint_name").asText("unnamed"),
      suitePath = suite,
      useHistory = root.path("use_history").asBoolean(false),
      writeDocs = root.path("write_docs").asBoolean(false))
  }

  /** Load from disk or (fallback) the classpath — same resolution as
    * [[SuiteLoader.load]]. */
  def load(path: String): CheckpointSpec = {
    val yaml = path.endsWith(".yaml") || path.endsWith(".yml")
    val p = Paths.get(path)
    val text =
      if (Files.exists(p)) Files.readString(p)
      else {
        val in = getClass.getClassLoader.getResourceAsStream(path)
        require(in != null, s"checkpoint not found on disk or classpath: $path")
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      }
    parse(text, yaml)
  }

  /** Run the checkpoint: suite file → bound checks → fused run →
    * results appended to the store under `runId` (→ readable by the
    * NEXT run's drift expectations) → optional data-docs page. */
  def run(spark: SparkSession, sfDir: String, spec: CheckpointSpec,
          storeDir: String, runId: String,
          docsDir: Option[String] = None): ValidationSuiteResult = {
    val suite = SuiteLoader.load(spec.suitePath)
    val bound =
      if (spec.useHistory) SuiteLoader.bindWithHistory(spark, sfDir, suite, storeDir)
      else SuiteLoader.bind(spark, sfDir, suite)
    val result = ValidationSuite.run(bound)
    ResultStore.write(spark, result, storeDir, runId)
    // "_docs": the underscore prefix hides the directory from Spark's
    // partition discovery — a plain "docs/" subdir inside the partitioned
    // parquet store makes every subsequent store read throw
    // CONFLICTING_DIRECTORY_STRUCTURES.
    if (spec.writeDocs)
      ResultStore.writeDocs(result, docsDir.getOrElse(s"$storeDir/_docs"), runId)
    result
  }
}
