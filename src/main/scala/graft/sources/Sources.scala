package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-system sources and content detection (SURVEY.md §2.1).
  *
  * S1 directory scan rides Spark's binaryFile source (distributed
  * listing + pruned reads); S7 decode and S9 sniffing are pure column
  * ops over the binary content, so the whole ingest front-end is one
  * narrow scan stage.
  */
object Sources {

  /** Extension → MIME type for the formats the reference routes on
    * (shared/connectors/local.py content-type inference). */
  val MimeByExtension: Map[String, String] = Map(
    ".txt" -> "text/plain", ".md" -> "text/markdown",
    ".markdown" -> "text/markdown", ".html" -> "text/html",
    ".htm" -> "text/html", ".csv" -> "text/csv",
    ".json" -> "application/json", ".xml" -> "application/xml",
    ".yaml" -> "application/yaml", ".yml" -> "application/yaml",
    ".pdf" -> "application/pdf",
    ".docx" -> "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    ".py" -> "text/x-python", ".scala" -> "text/x-scala",
    ".java" -> "text/x-java", ".js" -> "text/javascript",
    ".ts" -> "text/typescript", ".sh" -> "application/x-sh")

  /** S1: recursive directory scan → FileReference rows
    * (uri, filename, extension, mime_type, size_bytes, content,
    * modification_time). Include/exclude via glob + regex; the glob
    * pushes into the file-listing phase (never materializes excluded
    * files). Ref: shared/connectors/local.py:246-304. */
  def scanDirectory(spark: SparkSession, root: String,
                    includeGlob: Option[String] = None,
                    excludePattern: Option[String] = None): DataFrame = {
    var reader = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
    includeGlob.foreach(g => reader = reader.option("pathGlobFilter", g))
    val raw = reader.load(root)
    val filtered = excludePattern match {
      case Some(p) => raw.filter(!col("path").rlike(p))
      case None => raw
    }
    val filename = element_at(split(col("path"), "/"), -1)
    val ext = when(filename.contains("."),
      lower(concat(lit("."), element_at(split(filename, "\\."), -1))))
      .otherwise(lit(""))
    val mimeMap = typedlit(MimeByExtension)
    filtered.select(
      col("path").as("uri"),
      filename.as("filename"),
      ext.as("extension"),
      coalesce(element_at(mimeMap, ext), lit("application/octet-stream"))
        .as("mime_type"),
      col("length").as("size_bytes"),
      col("modificationTime").as("modification_time"),
      col("content"))
  }

  /** S7: decode binary content as UTF-8 text (charset detection
    * collapsed to UTF-8-with-replacement — the corpus contract;
    * ref shared/text_processing/parsers/text.py:60-123). */
  def decodeText(content: Column): Column = decode(content, "UTF-8")

  /** S9: content sniffing — detect is_code / structured-data /
    * scanned-pdf signals from the first bytes, as a `detected` struct
    * column (ref shared/pipeline/sniff.py:231-640). Pure column ops;
    * no cache needed — recomputation is deterministic and free at scan
    * time. */
  def sniff(content: Column): Column = {
    val head = substring(decodeText(content), 1, 4096)
    val trimmed = ltrim(head)
    val isStructured = trimmed.startsWith("{") || trimmed.startsWith("[") ||
      trimmed.startsWith("<?xml") || trimmed.startsWith("<!DOCTYPE") ||
      trimmed.startsWith("---\n")
    val structuredFormat = when(trimmed.startsWith("{") ||
        trimmed.startsWith("["), lit("json"))
      .when(trimmed.startsWith("<?xml") || trimmed.startsWith("<!DOCTYPE"),
        lit("xml"))
      .when(trimmed.startsWith("---\n"), lit("yaml"))
      .otherwise(lit(null).cast("string"))
    val codeMarkers = size(regexp_extract_all(head,
      lit("(?m)^\\s*(def |class |import |function |const |var |public |private )"),
      lit(0)))
    val braceLines = size(regexp_extract_all(head,
      lit("(?m)[;{}]\\s*$"), lit(0)))
    val isCode = codeMarkers >= 2 || braceLines >= 3
    // scanned PDFs: %PDF header but almost no text-extractable bytes
    val isPdf = head.startsWith("%PDF")
    val isScannedPdf = isPdf &&
      size(regexp_extract_all(head, lit("[A-Za-z]{4,}"), lit(0))) < 10
    struct(
      isCode.as("is_code"),
      isScannedPdf.as("is_scanned_pdf"),
      isStructured.as("is_structured_data"),
      structuredFormat.as("structured_format"))
  }

  /** Full S1+S7+S9 front-end: FileReference rows with text and
    * detected struct, ready for predicate routing (P1). */
  def loadFiles(spark: SparkSession, root: String,
                includeGlob: Option[String] = None,
                excludePattern: Option[String] = None): DataFrame =
    scanDirectory(spark, root, includeGlob, excludePattern)
      .withColumn("text", decodeText(col("content")))
      .withColumn("detected", sniff(col("content")))
      .withColumn("content_hash", sha2(col("content"), 256))
}
