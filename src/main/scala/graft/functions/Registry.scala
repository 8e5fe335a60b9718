package graft.functions

import java.nio.file.{Files, Path}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import scala.collection.concurrent.TrieMap
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession

/** The engine's external-function surface — the reference's Lambda
  * wrapper (/root/reference/aws-lambda.sh) made in-process.
  *
  *  - `list` enumerates function names (aws-lambda.sh:38-40).
  *  - `invoke(name, payload)` validates the payload is JSON
  *    ("third arg json format invalid", aws-lambda.sh:31-33), compacts
  *    it (`jq -c .`, aws-lambda.sh:45), invokes, and returns both the
  *    invocation metadata and the response (aws-lambda.sh:47-51).
  *
  * Functions are `String => String` (JSON in / JSON out). They can
  * additionally be bridged into Spark SQL as UDFs so passthrough SQL
  * can call them — but note a JVM-closure UDF is opaque to Catalyst
  * (no codegen, no pushdown through it); keep them off hot paths.
  */
final case class InvokeResult(
    statusCode: Int,
    executedVersion: String,
    payload: String)

final class FunctionRegistry(spark: Option[SparkSession] = None) {
  private val mapper = new ObjectMapper()
  private val fns = TrieMap[String, String => String]()

  /** Register a JSON→JSON function; optionally expose to Spark SQL as
    * a string UDF of the same name.
    */
  def register(name: String, fn: String => String, asUdf: Boolean = false): Unit = {
    fns.put(name, fn)
    if (asUdf) spark.foreach(_.udf.register(name, fn))
  }

  /** Function names (aws-lambda.sh:39's `.Functions[] | .FunctionName`). */
  def list: Seq[String] = fns.keys.toSeq.sorted

  /** Canonical compact form, `jq -c .` (aws-lambda.sh:45). Throws
    * IllegalArgumentException with the reference's message for
    * malformed payloads (aws-lambda.sh:31-33).
    */
  def compact(json: String): String =
    try mapper.writeValueAsString(mapper.readTree(json))
    catch { case _: Exception =>
      throw new IllegalArgumentException("third arg json format invalid")
    }

  def invoke(name: String, payloadJson: String): InvokeResult = {
    val fn = fns.getOrElse(name,
      throw new NoSuchElementException(s"Function not found: $name"))
    val compacted = compact(payloadJson)
    InvokeResult(statusCode = 200, executedVersion = "$LATEST",
      payload = fn(compacted))
  }

  /** jq-exact 2-space-indent pretty print (`jq '.'`,
    * aws-lambda.sh:48,51). Jackson's defaults differ from jq in three
    * observable ways, each overridden here: field separator (jq emits
    * `"key": v`, Jackson `"key" : v` — Spacing.AFTER), empty object
    * (`{}` vs `{ }`) and empty array (`[]` vs `[ ]`). Arrays indent
    * one-element-per-line like objects. Byte-for-byte parity is
    * asserted against captured jq output in ClientCoreSpec. Throws
    * the same validation error as [[compact]] on malformed input.
    */
  def pretty(json: String): String =
    try {
      import com.fasterxml.jackson.core.util.{DefaultIndenter, DefaultPrettyPrinter, Separators}
      val node = mapper.readTree(json)
      val seps = Separators.createDefaultInstance()
        .withObjectFieldValueSpacing(Separators.Spacing.AFTER)
        .withObjectEmptySeparator("")
        .withArrayEmptySeparator("")
      val printer = new DefaultPrettyPrinter().withSeparators(seps)
      printer.indentArraysWith(DefaultIndenter.SYSTEM_LINEFEED_INSTANCE)
      mapper.writer(printer).writeValueAsString(node)
    } catch { case _: Exception =>
      throw new IllegalArgumentException("third arg json format invalid")
    }

  /** The reference's full observable invoke choreography
    * (/root/reference/aws-lambda.sh:43-53): write the response payload
    * to `response_<yyyyMMdd_HHmmss>.json` in `workDir`, render the CLI
    * metadata and the response pretty-printed under the "AWS CLI
    * Output:" / "Lambda Response:" headers, then DELETE the response
    * file (it is a scratch artifact in the reference).
    *
    * @param now injectable clock for deterministic specs; defaults to
    *   wall time like the reference's `date +%%Y%%m%%d_%%H%%M%%S`.
    * @return (invoke result, rendered text, response file name — the
    *   file no longer exists on return).
    */
  def invokeRendered(name: String, payloadJson: String, workDir: Path,
      now: LocalDateTime = LocalDateTime.now()): (InvokeResult, String, String) = {
    val res = invoke(name, payloadJson)
    val ts = now.format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
    val fileName = s"response_$ts.json"
    val file = workDir.resolve(fileName)
    Files.writeString(file, res.payload)
    try {
      val metaJson = mapper.writeValueAsString {
        val o = mapper.createObjectNode()
        o.put("StatusCode", res.statusCode)
        o.put("ExecutedVersion", res.executedVersion)
      }
      val text = new StringBuilder()
        .append("AWS CLI Output:\n")
        .append(pretty(metaJson)).append("\n")
        .append("\n")
        .append("Lambda Response:\n")
        .append(pretty(Files.readString(file))).append("\n")
        .toString()
      (res, text, fileName)
    } finally Files.deleteIfExists(file)
  }
}

object FunctionRegistry {

  /** A registry preloaded with a few reference-style JSON functions,
    * demonstrating the invoke surface end-to-end.
    */
  def withBuiltins(spark: Option[SparkSession] = None): FunctionRegistry = {
    val r = new FunctionRegistry(spark)
    val mapper = new ObjectMapper()
    r.register("echo", identity)
    r.register("upcase_values", { json =>
      val node = mapper.readTree(json)
      val out = mapper.createObjectNode()
      node.properties().forEach { e =>
        if (e.getValue.isTextual) out.put(e.getKey, e.getValue.asText().toUpperCase)
        else out.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue) // preserve type
      }
      mapper.writeValueAsString(out)
    })
    r
  }
}
