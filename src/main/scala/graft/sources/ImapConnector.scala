package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** S3: IMAP mailbox connector (SURVEY.md §2.1).
  *
  * The IMAP wire protocol is a driver/edge concern (a socket per
  * mailbox); the reference itself splits the work the same way —
  * `_enumerate_mailbox` walks the server and defers content to the
  * pipeline (shared/connectors/imap.py:303-531). The Spark-native half
  * implemented here is everything after the socket:
  *
  *  - **staging contract**: one RFC822 file per message at
  *    `{root}/{mailbox}/{uid}.eml`, plus an optional per-mailbox
  *    `{root}/{mailbox}/UIDVALIDITY` marker file — what an edge
  *    fetcher (or `git format-patch`-style export) writes
  *  - **scan**: distributed binaryFile read → typed header parse
  *    (MIME encoded-words, folded headers, RFC2822 dates) → the same
  *    FileReference surface the reference emits (imap.py:484-521):
  *    uri = imap://{host}/{mailbox};uid={uid}, filename from the
  *    sanitized subject, change_hint = uid
  *  - **cursor**: per-mailbox (uidvalidity, last_uid) as an
  *    aggregation, and the incremental `UID last_uid+1:*` search
  *    criteria as a relational filter with the UIDVALIDITY-reset rule
  *    (imap.py:393-412)
  *
  * Header parsing is genuinely imperative (stateful unfolding +
  * encoded-word decoding), so it runs as a typed map over the scan —
  * the same pattern the chunkers use — not as a driver loop.
  */
object ImapConnector {

  final case class ImapSourceConfig(
      host: String,
      mailboxes: Seq[String] = Seq("INBOX"),
      sinceDays: Int = 30,
      maxMessages: Int = 1000)

  /** Parsed message surface (metadata.source in the reference). */
  final case class EmailRow(
      mailbox: String, uid: Long, uidvalidity: Long,
      message_id: String, subject: String, from_addr: String,
      to_addr: String, date: String, filename: String, size_bytes: Long,
      change_hint: String, body: String)

  private val EncodedWord = "=\\?([^?]+)\\?([bBqQ])\\?([^?]*)\\?=".r

  /** Decode RFC 2047 encoded-words (=?charset?B|Q?...?=), mirroring
    * imap.py:32-48 (_decode_mime_header). Unknown charsets fall back
    * to UTF-8; malformed words pass through verbatim. */
  def decodeMimeHeader(h: String): String = {
    if (h == null) return ""
    EncodedWord.replaceAllIn(h, m => {
      val charset = try java.nio.charset.Charset.forName(m.group(1))
        catch { case _: Exception => StandardCharsets.UTF_8 }
      val decoded = try {
        m.group(2).toLowerCase match {
          case "b" => new String(Base64.getMimeDecoder.decode(m.group(3)), charset)
          case _ => // Q: underscore = space, =XX hex bytes
            val q = m.group(3).replace('_', ' ')
            val bytes = new java.io.ByteArrayOutputStream()
            var i = 0
            while (i < q.length) {
              if (q.charAt(i) == '=' && i + 3 <= q.length) {
                bytes.write(Integer.parseInt(q.substring(i + 1, i + 3), 16))
                i += 3
              } else { bytes.write(q.charAt(i).toInt); i += 1 }
            }
            new String(bytes.toByteArray, charset)
        }
      } catch { case _: Exception => m.matched }
      java.util.regex.Matcher.quoteReplacement(decoded)
    })
  }

  /** Unfold folded headers (CRLF + WSP → SP) and extract one header. */
  def header(raw: String, name: String): Option[String] = {
    val unfolded = raw.replaceAll("\r?\n[ \t]+", " ")
    val re = ("(?im)^" + java.util.regex.Pattern.quote(name) +
      ":\\s*(.*)$").r
    re.findFirstMatchIn(unfolded).map(_.group(1).trim)
  }

  /** RFC 2822 date → ISO-8601 UTC, None when unparsable
    * (imap.py:51-60 _format_email_date). */
  def formatEmailDate(s: Option[String]): String =
    s.flatMap { d =>
      try {
        val parsed = java.time.ZonedDateTime.parse(d.trim,
          java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
        Some(parsed.withZoneSameInstant(java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter.ISO_INSTANT))
      } catch { case _: Exception => None }
    }.getOrElse("")

  private val Unsafe = "[<>:\"/\\\\|?*]".r

  /** Parse one staged RFC822 message (imap.py:477-521 field logic). */
  def parseMessage(mailbox: String, uid: Long, uidvalidity: Long,
                   content: Array[Byte]): EmailRow = {
    val text = new String(content, StandardCharsets.UTF_8)
    val headerEnd = {
      val a = text.indexOf("\r\n\r\n")
      val b = text.indexOf("\n\n")
      if (a >= 0 && (b < 0 || a <= b)) a + 4
      else if (b >= 0) b + 2
      else text.length
    }
    val rawHeaders = text.substring(0, math.max(0, headerEnd))
    val body = text.substring(math.min(headerEnd, text.length))
    val subject = header(rawHeaders, "Subject").map(decodeMimeHeader)
      .filter(_.nonEmpty).getOrElse("(No Subject)")
    val messageId = header(rawHeaders, "Message-ID")
      .getOrElse(s"<uid-$uid@$mailbox>")
    val safeSubject =
      if (subject.nonEmpty) Unsafe.replaceAllIn(subject.take(50), "_")
      else s"email_$uid"
    EmailRow(
      mailbox = mailbox, uid = uid, uidvalidity = uidvalidity,
      message_id = messageId, subject = subject,
      from_addr = header(rawHeaders, "From").map(decodeMimeHeader).getOrElse(""),
      to_addr = header(rawHeaders, "To").map(decodeMimeHeader).getOrElse(""),
      date = formatEmailDate(header(rawHeaders, "Date")),
      filename = s"$safeSubject.eml",
      size_bytes = content.length.toLong,
      change_hint = uid.toString,
      body = body)
  }

  /** Internal scan row (public: Spark's codegen'd deserializer must be
    * able to construct it). */
  final case class StagedFile(
      mailbox: String, uid: Long, uidvalidity: Long, content: Array[Byte])

  /** Distributed scan of a staged mailbox root. Output: one row per
    * message with the reference's FileReference surface —
    * (uri, source_type, content_type, filename, extension, mime_type,
    * size_bytes, change_hint) + parsed metadata columns + body. */
  def scanStaging(spark: SparkSession, root: String,
                  cfg: ImapSourceConfig): DataFrame = {
    import java.io.File
    // tiny driver-side read of the per-mailbox UIDVALIDITY markers
    val uidvalidity: Map[String, Long] = cfg.mailboxes.map { mb =>
      val f = new File(new File(root, mb), "UIDVALIDITY")
      mb -> (if (f.isFile)
        new String(java.nio.file.Files.readAllBytes(f.toPath)).trim.toLong
      else 0L)
    }.toMap
    val uvLit = typedlit(uidvalidity)

    val raw = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.eml")
      .load(root)
    val parts = split(col("path"), "/")
    val staged = raw.select(
        element_at(parts, -2).as("mailbox"),
        regexp_replace(element_at(parts, -1), "\\.eml$", "")
          .cast("long").as("uid"),
        coalesce(element_at(uvLit, element_at(parts, -2)), lit(0L))
          .as("uidvalidity"),
        col("content"))
      .filter(col("uid").isNotNull &&
        col("mailbox").isin(cfg.mailboxes: _*))
    parseStaged(staged, cfg.host)
  }

  /** Parse + FileReference projection over any staged relation with
    * (mailbox, uid, uidvalidity, content) columns — the post-socket
    * half of the scan, shared by [[scanStaging]] and synthetic-fixture
    * callers (the driver's imap_scan oracle). */
  def parseStaged(stagedRelation: DataFrame, host: String): DataFrame = {
    val staged = stagedRelation.as(Encoders.product[StagedFile])
    val rows = staged.map(f =>
      parseMessage(f.mailbox, f.uid, f.uidvalidity, f.content))(
      Encoders.product[EmailRow]).toDF()
    rows.select(
      concat(lit(s"imap://$host/"), col("mailbox"), lit(";uid="),
        col("uid")).as("uri"),
      lit("imap").as("source_type"),
      lit("message").as("content_type"),
      col("filename"),
      lit(".eml").as("extension"),
      lit("message/rfc822").as("mime_type"),
      col("size_bytes"), col("change_hint"),
      col("mailbox"), col("uid"), col("uidvalidity"), col("message_id"),
      col("subject"), col("from_addr"), col("to_addr"), col("date"),
      col("body"))
  }

  /** Post-scan cursor: per-mailbox (uidvalidity, last_uid) —
    * the state the reference persists after enumeration
    * (imap.py:523-529). */
  def cursorAfter(scan: DataFrame): DataFrame =
    scan.groupBy("mailbox")
      .agg(max("uidvalidity").as("uidvalidity"),
        max("uid").as("last_uid"))

  /** Incremental selection against a previous cursor
    * (mailbox, uidvalidity, last_uid): keep messages with
    * uid > last_uid, EXCEPT when the mailbox's UIDVALIDITY changed —
    * then the cursor resets and every message is new (imap.py:399-403).
    * Unknown mailboxes are fully new. Relational twin of the
    * `UID last_uid+1:*` search criteria. */
  def newSince(scan: DataFrame, cursor: DataFrame): DataFrame = {
    val c = broadcast(cursor.select(
      col("mailbox"),
      col("uidvalidity").as("_cur_uv"),
      col("last_uid").as("_cur_last")))
    scan.join(c, Seq("mailbox"), "left")
      .filter(col("_cur_last").isNull ||
        col("uidvalidity") =!= col("_cur_uv") ||
        col("uid") > col("_cur_last"))
      .drop("_cur_uv", "_cur_last")
  }
}
