package graft

import java.io.File
import java.nio.file.Files

import graft.sources.ImapConnector
import graft.sources.ImapConnector.ImapSourceConfig

/** S3 staged-mailbox connector: RFC822 parsing, FileReference surface,
  * and the UIDVALIDITY/last-UID incremental cursor
  * (ref shared/connectors/imap.py:303-531). */
class ImapConnectorSpec extends SparkSpec {

  private def write(dir: File, name: String, text: String): Unit = {
    dir.mkdirs()
    Files.writeString(new File(dir, name).toPath, text)
  }

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-imap-").toFile
    val inbox = new File(r, "INBOX")
    write(inbox, "UIDVALIDITY", "4711\n")
    write(inbox, "3.eml",
      "From: Alice <alice@example.com>\r\n" +
        "To: bob@example.com\r\n" +
        "Subject: plain subject\r\n" +
        "Message-ID: <m3@example.com>\r\n" +
        "Date: Tue, 11 Aug 2026 10:00:00 +0200\r\n" +
        "\r\n" +
        "hello body\r\n")
    write(inbox, "7.eml",
      "From: =?utf-8?B?Sm9zw6k=?= <jose@example.com>\r\n" +
        "Subject: =?utf-8?Q?caf=C3=A9_report?=\r\n" +
        "Date: not-a-date\r\n" +
        "\r\n" +
        "latin body\r\n")
    write(inbox, "9.eml",
      "From: noone@example.com\r\n" +
        "Subject: folded\r\n" +
        " across lines\r\n" +
        "\r\n" +
        "x\r\n")
    val archive = new File(r, "Archive")
    write(archive, "2.eml",
      "Subject: archived\r\n\r\nold\r\n")
    r.getAbsolutePath
  }

  private val cfg = ImapSourceConfig(host = "mail.example.com",
    mailboxes = Seq("INBOX", "Archive"))

  test("scan parses staged messages into the FileReference surface") {
    val got = ImapConnector.scanStaging(spark, root, cfg).collect()
      .map(r => r.getAs[Long]("uid") -> r).toMap
    assert(got.keySet == Set(2L, 3L, 7L, 9L))
    val m3 = got(3L)
    assert(m3.getAs[String]("uri") == "imap://mail.example.com/INBOX;uid=3")
    assert(m3.getAs[String]("subject") == "plain subject")
    assert(m3.getAs[String]("from_addr") == "Alice <alice@example.com>")
    assert(m3.getAs[String]("message_id") == "<m3@example.com>")
    assert(m3.getAs[String]("date") == "2026-08-11T08:00:00Z") // UTC
    assert(m3.getAs[String]("filename") == "plain subject.eml")
    assert(m3.getAs[String]("mime_type") == "message/rfc822")
    assert(m3.getAs[String]("change_hint") == "3")
    assert(m3.getAs[String]("body").startsWith("hello body"))
    assert(m3.getAs[Long]("uidvalidity") == 4711L)
    // MIME encoded-words: B in From, Q in Subject; bad date -> empty
    val m7 = got(7L)
    assert(m7.getAs[String]("from_addr") == "José <jose@example.com>")
    assert(m7.getAs[String]("subject") == "café report")
    assert(m7.getAs[String]("date") == "")
    // folded header unfolds; missing Message-ID falls back
    val m9 = got(9L)
    assert(m9.getAs[String]("subject") == "folded across lines")
    assert(m9.getAs[String]("message_id") == "<uid-9@INBOX>")
    // mailbox without UIDVALIDITY marker -> 0
    assert(got(2L).getAs[Long]("uidvalidity") == 0L)
    assert(got(2L).getAs[String]("subject") == "archived")
  }

  test("cursor aggregation and incremental selection") {
    import spark.implicits._
    val scan = ImapConnector.scanStaging(spark, root, cfg)
    val cursor = ImapConnector.cursorAfter(scan).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cursor("INBOX") == (4711L, 9L))
    assert(cursor("Archive") == (0L, 2L))

    // nothing is new against the post-scan cursor
    val cur = ImapConnector.cursorAfter(scan)
    assert(ImapConnector.newSince(scan, cur).count() == 0)

    // a lower last_uid admits newer messages only
    val stale = Seq(("INBOX", 4711L, 3L), ("Archive", 0L, 2L))
      .toDF("mailbox", "uidvalidity", "last_uid")
    val fresh = ImapConnector.newSince(scan, stale)
      .select("uid").collect().map(_.getLong(0)).toSet
    assert(fresh == Set(7L, 9L))

    // UIDVALIDITY change resets the cursor: everything is new again
    val reset = Seq(("INBOX", 999L, 9L), ("Archive", 0L, 2L))
      .toDF("mailbox", "uidvalidity", "last_uid")
    val afterReset = ImapConnector.newSince(scan, reset)
      .select("uid").collect().map(_.getLong(0)).toSet
    assert(afterReset == Set(3L, 7L, 9L))

    // unknown mailbox in the scan (no cursor row) is fully new
    val partial = Seq(("Archive", 0L, 2L))
      .toDF("mailbox", "uidvalidity", "last_uid")
    assert(ImapConnector.newSince(scan, partial).count() == 3)
  }
}
