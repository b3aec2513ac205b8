package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parser registry (S8): extension → parser, first match wins,
  * mirroring shared/text_processing/parsers/registry.py:111-225 as a
  * `when`/`otherwise` dispatch column — the whole registry compiles
  * into the scan projection.
  *
  * Text formats decode as pure column ops; `pdf`, `docx`, `pptx`,
  * `xlsx` and the legacy OLE family (`doc`, `ppt`, `xls`, `msg`, via
  * the [[Cfb]] compound-file reader) route through [[BinaryParsers]]
  * (pure-JVM extraction — the container has no Tika; a Tika-backed
  * parser plugs into the same slot on a real cluster). RFC822 email
  * (.eml) extracts the message body as column ops.
  */
object Parsers {

  /** parser name → extensions it claims (first match in order). */
  val Registry: Seq[(String, Seq[String])] = Seq(
    "markdown" -> Seq(".md", ".markdown"),
    "code" -> Seq(".py", ".scala", ".java", ".js", ".ts", ".sh"),
    "structured" -> Seq(".json", ".csv", ".xml", ".yaml", ".yml"),
    "html" -> Seq(".html", ".htm"),
    "pdf" -> Seq(".pdf"),
    "docx" -> Seq(".docx"),
    "pptx" -> Seq(".pptx"),
    "xlsx" -> Seq(".xlsx"),
    "eml" -> Seq(".eml"),
    "text" -> Seq(".txt", ""),
    // legacy OLE/CFB formats (.msg is Outlook's OLE container,
    // same family as .doc) — Cfb.scala reads the container
    "doc" -> Seq(".doc"),
    "ppt" -> Seq(".ppt"),
    "xls" -> Seq(".xls"),
    "msg" -> Seq(".msg"))

  /** Dispatch column: the chosen parser name for an extension column
    * (first registry entry claiming the extension; unknown → "text",
    * the reference's fallback parser). */
  def parserFor(extension: Column): Column =
    Registry.foldRight(lit("text")) { case ((name, exts), rest) =>
      when(lower(extension).isin(exts: _*), lit(name)).otherwise(rest)
    }

  /** Binary extraction slot: deterministic, so whole-stage codegen's
    * subexpression elimination evaluates it once per row even when
    * both fields are projected. */
  private val binParse =
    udf((content: Array[Byte], parser: String) =>
      BinaryParsers.parse(content, parser))

  private val BinaryParsed =
    Seq("pdf", "docx", "pptx", "xlsx", "doc", "ppt", "xls", "msg")

  /** Parse: (content binary, extension) → (text, parse_status).
    * Pure column ops per text parser; pdf/docx extract via
    * [[BinaryParsers]]; the stub emits empty text + "stubbed". */
  def parse(df: DataFrame, contentCol: String = "content",
            extCol: String = "extension"): DataFrame = {
    val parser = parserFor(col(extCol))
    val decoded = Sources.decodeText(col(contentCol))
    val isBinary = parser.isin(BinaryParsed: _*)
    val bin = binParse(col(contentCol), parser)
    val text = when(isBinary, bin.getField("text"))
      .when(parser === "html",
        // strip tags/scripts — the text-extraction contract of the
        // unstructured parser, collapsed to column ops
        regexp_replace(regexp_replace(decoded,
          "(?is)<(script|style)[^>]*>.*?</\\1>", " "),
          "<[^>]+>", " "))
      .when(parser === "eml",
        // RFC822 text body: everything after the first blank line
        // (registry.py:26 routes .eml to the unstructured email
        // partitioner, whose text contract is the message body);
        // a headers-only message has an empty body
        when(decoded.rlike("(?s)\\r?\\n\\r?\\n"),
          regexp_replace(decoded, "(?s)^.*?\\r?\\n\\r?\\n", ""))
          .otherwise(lit("")))
      .when(parser === "structured", decoded)
      .otherwise(decoded)
    df.withColumn("parser", parser)
      .withColumn("text", text)
      .withColumn("parse_status",
        when(isBinary, bin.getField("status"))
          .otherwise(lit("ok")))
  }
}
