package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parser registry (S8): extension → parser, first match wins,
  * mirroring shared/text_processing/parsers/registry.py:111-225 as a
  * `when`/`otherwise` dispatch column — the whole registry compiles
  * into the scan projection.
  *
  * Formats needing native libraries (pdf, docx, …) are STUBBED: they
  * route to the `binary_stub` parser which emits an empty text and a
  * `parse_status` marker, keeping the dispatch/plumbing real while the
  * heavy parser (Tika on a real cluster) plugs into the same slot.
  */
object Parsers {

  /** parser name → extensions it claims (first match in order). */
  val Registry: Seq[(String, Seq[String])] = Seq(
    "markdown" -> Seq(".md", ".markdown"),
    "code" -> Seq(".py", ".scala", ".java", ".js", ".ts", ".sh"),
    "structured" -> Seq(".json", ".csv", ".xml", ".yaml", ".yml"),
    "html" -> Seq(".html", ".htm"),
    "text" -> Seq(".txt", ""),
    "binary_stub" -> Seq(".pdf", ".docx"))

  /** Dispatch column: the chosen parser name for an extension column
    * (first registry entry claiming the extension; unknown → "text",
    * the reference's fallback parser). */
  def parserFor(extension: Column): Column =
    Registry.foldRight(lit("text")) { case ((name, exts), rest) =>
      when(lower(extension).isin(exts: _*), lit(name)).otherwise(rest)
    }

  /** Parse: (content binary, extension) → (text, parse_status).
    * Pure column ops per parser; the stub emits empty text +
    * "stubbed". */
  def parse(df: DataFrame, contentCol: String = "content",
            extCol: String = "extension"): DataFrame = {
    val parser = parserFor(col(extCol))
    val decoded = Sources.decodeText(col(contentCol))
    val text = when(parser === "binary_stub", lit(""))
      .when(parser === "html",
        // strip tags/scripts — the text-extraction contract of the
        // unstructured parser, collapsed to column ops
        regexp_replace(regexp_replace(decoded,
          "(?is)<(script|style)[^>]*>.*?</\\1>", " "),
          "<[^>]+>", " "))
      .when(parser === "structured", decoded)
      .otherwise(decoded)
    df.withColumn("parser", parser)
      .withColumn("text", text)
      .withColumn("parse_status",
        when(parser === "binary_stub", lit("stubbed")).otherwise(lit("ok")))
  }
}
