package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions.{col, explode, floor, greatest, least, length, lit, regexp_extract_all, sequence, size}

import graft.functions.TextFunctions

/** The six chunking strategies (SURVEY.md §2.8, C1-C6) as pure Scala
  * functions exposed to Spark as `flatMap` UDTFs — narrow, shuffle-free,
  * so chunking streams at scan speed over any corpus size.
  *
  * Token semantics: whitespace tokens with chars/4 estimation where the
  * reference estimates (SURVEY.md §7.4 risk 3 pins this deviation; the
  * reference uses tiktoken cl100k_base, which has no JVM twin here).
  *
  * Invariants (tested): `text == content.substring(start, end)` for
  * every chunk; starts strictly increase; every chunk is non-empty
  * after trimming; token_count == whitespace tokens of text.
  *
  * Refs: character_strategy.py:256-409, recursive_strategy.py:63-75,
  * markdown_strategy.py:171-555, semantic_strategy.py:329-788,
  * hierarchical_strategy.py:78-520, hybrid_strategy.py:81-300.
  */
object Chunking {

  final case class ChunkConfig(
      minTokens: Int = 100,
      maxTokens: Int = 1000,
      overlapTokens: Int = 50,
      charsPerToken: Int = 4,
      semanticThreshold: Double = 0.3,
      hierarchicalSizes: Seq[Int] = Seq(2048, 512, 128))

  /** One output chunk; offsets are half-open into the original text. */
  final case class ChunkOut(chunkIndex: Int, text: String, start: Int,
      end: Int, tokenCount: Int)

  /** Hierarchical output row. */
  final case class HierChunkOut(level: Int, chunkId: String,
      parentId: String, chunkIndex: Int, text: String, start: Int,
      end: Int, tokenCount: Int)

  /** Python str.isspace() analogue for the empty-document check:
    * Java's Character.isWhitespace excludes no-break spaces
    * (U+00A0/U+2007/U+202F) and NEL (U+0085) which Python treats as
    * whitespace, so a document of only those must still parse as empty
    * to match the reference's `if not content.strip(): return []`.
    *
    * NOTE on the DuckDB chunk oracles: their doc gate is
    * `regexp_matches(text, '\S')` where RE2's \s is ASCII-only, so a
    * doc containing ONLY non-ASCII whitespace would be "non-empty" to
    * the oracle and "empty" here. The driver corpus is ASCII (the
    * generator emits ASCII words), so the gates agree there;
    * ChunkingGoldenSpec pins the Scala-side semantics directly. */
  private def pyIsSpace(c: Char): Boolean =
    Character.isWhitespace(c) || Character.isSpaceChar(c) || c == '\u0085'

  def countTokens(s: String): Int = {
    var n = 0; var i = 0; var inTok = false
    while (i < s.length) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !inTok) { n += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    n
  }

  private def countTokensIn(s: String, from: Int, until: Int): Int = {
    var n = 0; var i = from; var inTok = false
    while (i < until) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !inTok) { n += 1; inTok = true }
      else if (ws) inTok = false
      i += 1
    }
    n
  }

  /** Trim a [start, end) span to exclude surrounding whitespace. */
  private def trimSpan(s: String, start: Int, end: Int): (Int, Int) = {
    var a = start; var b = end
    while (a < b && Character.isWhitespace(s.charAt(a))) a += 1
    while (b > a && Character.isWhitespace(s.charAt(b - 1))) b -= 1
    (a, b)
  }

  /** Position of the start of the word containing/preceding pos. */
  private def wordBoundaryBefore(s: String, pos: Int): Int = {
    var p = math.min(pos, s.length)
    if (p > 0 && p < s.length && Character.isWhitespace(s.charAt(p))) return p
    while (p > 0 && !Character.isWhitespace(s.charAt(p - 1))) p -= 1
    p
  }

  /** Position of the start of the next word at/after pos. */
  private def wordBoundaryAfter(s: String, pos: Int): Int = {
    var p = math.max(0, pos)
    while (p < s.length && !Character.isWhitespace(s.charAt(p)) &&
      (p == 0 || !Character.isWhitespace(s.charAt(p - 1)))) p += 1
    while (p < s.length && Character.isWhitespace(s.charAt(p))) p += 1
    p
  }

  /** Last sentence end (after `.!?` + whitespace run) at or before pos;
    * -1 if none. Ref: base.py find_sentence_boundary. */
  private def sentenceBoundaryBefore(s: String, pos: Int): Int = {
    var p = math.min(pos, s.length) - 1
    while (p > 0) {
      if (Character.isWhitespace(s.charAt(p)) && ".!?".indexOf(s.charAt(p - 1)) >= 0) {
        var q = p
        while (q < s.length && Character.isWhitespace(s.charAt(q))) q += 1
        return q
      }
      p -= 1
    }
    -1
  }

  /** Move `end` back so [start, end) holds at most maxTokens words. */
  private def capTokens(s: String, start: Int, end: Int, maxTokens: Int): Int = {
    var n = 0; var i = start; var inTok = false; var lastEnd = start
    while (i < end) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !inTok) {
        if (n == maxTokens) return lastEnd
        n += 1; inTok = true
      } else if (ws && inTok) { inTok = false; lastEnd = i }
      i += 1
    }
    end
  }

  // -------------------------------------------------------------------
  // C1: character — fixed char windows with overlap, sentence/word
  // boundary snapped. Ref: character_strategy.py:256-409.
  // -------------------------------------------------------------------
  def character(content: String, cfg: ChunkConfig = ChunkConfig()): Seq[ChunkOut] = {
    if (content == null || content.isEmpty) return Seq.empty
    val len = content.length
    val est = math.max(1, len / cfg.charsPerToken)
    if (est < cfg.minTokens) {
      val (a, b) = trimSpan(content, 0, len)
      if (b <= a) return Seq.empty
      return Seq(ChunkOut(0, content.substring(a, b), a, b, countTokensIn(content, a, b)))
    }
    val csize = cfg.maxTokens * cfg.charsPerToken
    val ov = cfg.overlapTokens * cfg.charsPerToken
    val out = Seq.newBuilder[ChunkOut]
    var pos = 0; var idx = 0; var guard = 0
    val maxIter = len / math.max(1, csize - ov) + 100
    while (pos < len && guard < maxIter) {
      guard += 1
      var start = if (idx == 0) 0 else pos
      var end = math.min(start + csize, len)
      if (end < len) {
        val sb = sentenceBoundaryBefore(content, end)
        if (sb > start && sb <= end) end = sb
        else {
          val wb = wordBoundaryBefore(content, end)
          if (wb > start) end = wb
        }
      }
      if (idx > 0 && start > 0) {
        val adj = wordBoundaryAfter(content, start)
        if (adj < end) start = adj
      }
      end = math.max(capTokens(content, start, end, cfg.maxTokens), math.min(start + 1, len))
      val (a, b) = trimSpan(content, start, end)
      if (b > a) {
        out += ChunkOut(idx, content.substring(a, b), a, b, countTokensIn(content, a, b))
        idx += 1
      }
      if (end >= len) pos = len
      else {
        val next = end - ov
        pos = if (next <= pos) pos + math.max(1, csize / 2) else next
      }
    }
    out.result()
  }

  // -------------------------------------------------------------------
  // C2: recursive — separator hierarchy, recursing into oversized
  // pieces, greedy re-merge. Ref: recursive_strategy.py:63-75,426-520.
  // -------------------------------------------------------------------
  val RecursiveSeparators: Seq[String] =
    Seq("\n\n\n", "\n\n", "\n", ". ", "! ", "? ", "; ", ", ", " ")

  /** Start offset of the `n`th word before `pos` (for overlap splice). */
  private def wordsBack(s: String, pos: Int, n: Int): Int = {
    var p = math.min(pos, s.length); var words = 0
    while (p > 0 && words < n) {
      while (p > 0 && Character.isWhitespace(s.charAt(p - 1))) p -= 1
      while (p > 0 && !Character.isWhitespace(s.charAt(p - 1))) p -= 1
      words += 1
    }
    p
  }

  def recursive(content: String, cfg: ChunkConfig = ChunkConfig()): Seq[ChunkOut] = {
    // not String.trim: Java trim strips ALL chars <= 0x20 (incl. NUL),
    // the reference's str.strip() only whitespace — pyIsSpace matches
    // (incl. the no-break spaces Java isWhitespace misses)
    if (content == null || content.forall(pyIsSpace)) return Seq.empty
    // The reference splices overlap_tokens of the previous chunk's tail
    // onto each chunk and reserves budget for it up front
    // (recursive_strategy.py:299-371: split_budget = max_chars −
    // overlap_chars). Same contract here, token-true instead of the
    // reference's chars_per_token=4 estimate, and with the overlap
    // clamped to half the chunk budget so a config with
    // overlap ≥ max cannot collapse the split budget to nothing (the
    // reference degrades to 1-char splits there).
    val effOverlap = math.min(cfg.overlapTokens, cfg.maxTokens / 2)
    val mergeBudget = cfg.maxTokens - effOverlap

    // split [start,end) into atomic spans each <= mergeBudget
    def atoms(start: Int, end: Int, seps: Seq[String]): Seq[(Int, Int)] = {
      if (countTokensIn(content, start, end) <= mergeBudget) return Seq((start, end))
      seps.headOption match {
        case None =>
          // hard char split (oversized single word / no separators left)
          val w = mergeBudget * cfg.charsPerToken
          (start until end by w).map(a => (a, math.min(a + w, end)))
        case Some(sep) =>
          val pieces = Seq.newBuilder[(Int, Int)]
          var a = start
          var i = content.indexOf(sep, start)
          var found = false
          // i + sep.length <= end (not i < end): a separator straddling
          // the span end must not split — a piece extending past `end`
          // would duplicate content into the next sibling's subtree.
          // Equivalent to scanning the substring content[start, end).
          while (i >= 0 && i + sep.length <= end) {
            found = true
            pieces += ((a, i + sep.length)) // separator stays with the piece
            a = i + sep.length
            i = content.indexOf(sep, a)
          }
          if (a < end) pieces += ((a, end))
          if (!found) atoms(start, end, seps.tail)
          else pieces.result().flatMap { case (pa, pb) =>
            if (countTokensIn(content, pa, pb) <= mergeBudget) Seq((pa, pb))
            else atoms(pa, pb, seps.tail)
          }
      }
    }

    // greedy merge adjacent atoms while within the (overlap-reserving)
    // merge budget
    val merged = Seq.newBuilder[(Int, Int)]
    var curStart = -1; var curEnd = -1
    for ((a, b) <- atoms(0, content.length, RecursiveSeparators)) {
      if (curStart < 0) { curStart = a; curEnd = b }
      else if (countTokensIn(content, curStart, b) <= mergeBudget) curEnd = b
      else { merged += ((curStart, curEnd)); curStart = a; curEnd = b }
    }
    if (curStart >= 0) merged += ((curStart, curEnd))

    // splice the previous chunk's last effOverlap words onto each
    // non-first chunk (word-boundary aligned, offset-faithful)
    val spans = merged.result()
    val overlapped = spans.zipWithIndex.map { case ((a, b), i) =>
      if (i == 0 || effOverlap == 0) (a, b)
      else {
        val prevEnd = spans(i - 1)._2
        (math.min(a, wordsBack(content, prevEnd, effOverlap)), b)
      }
    }

    overlapped.flatMap { case (a0, b0) =>
      val (a, b) = trimSpan(content, a0, b0)
      if (b > a) Some((a, b)) else None
    }.zipWithIndex.map { case ((a, b), i) =>
      ChunkOut(i, content.substring(a, b), a, b, countTokensIn(content, a, b))
    }
  }

  // -------------------------------------------------------------------
  // C3: markdown — header-delimited sections grouped to token budget;
  // oversized sections fall back to recursive.
  // Ref: markdown_strategy.py:171-555.
  // -------------------------------------------------------------------
  private val HeaderLine = "(?m)^#{1,6}\\s".r

  def markdown(content: String, cfg: ChunkConfig = ChunkConfig()): Seq[ChunkOut] = {
    if (content == null || content.forall(pyIsSpace)) return Seq.empty
    val headerStarts = HeaderLine.findAllMatchIn(content).map(_.start).toSeq
    if (headerStarts.isEmpty) return recursive(content, cfg)
    val bounds = (if (headerStarts.head == 0) headerStarts
                  else 0 +: headerStarts) :+ content.length
    val sections = bounds.sliding(2).map { case Seq(a, b) => (a, b) }.toSeq

    // greedy-merge sections into chunks <= maxTokens; oversized
    // sections recurse
    val out = Seq.newBuilder[(Int, Int)]
    var cur: Option[(Int, Int)] = None
    def flush(): Unit = { cur.foreach(out += _); cur = None }
    for ((a, b) <- sections) {
      val t = countTokensIn(content, a, b)
      if (t > cfg.maxTokens) {
        flush()
        recursive(content.substring(a, b), cfg).foreach(c =>
          out += ((a + c.start, a + c.end)))
      } else cur match {
        case Some((ca, _)) if countTokensIn(content, ca, b) <= cfg.maxTokens =>
          cur = Some((ca, b))
        case Some(_) => flush(); cur = Some((a, b))
        case None => cur = Some((a, b))
      }
    }
    flush()
    out.result().flatMap { case (a0, b0) =>
      val (a, b) = trimSpan(content, a0, b0)
      if (b > a) Some((a, b)) else None
    }.zipWithIndex.map { case ((a, b), i) =>
      ChunkOut(i, content.substring(a, b), a, b, countTokensIn(content, a, b))
    }
  }

  // -------------------------------------------------------------------
  // C4: semantic — sentence split, adjacent-Jaccard clustering, merge
  // within min/max tokens. Ref: semantic_strategy.py:329-788.
  // -------------------------------------------------------------------
  def semantic(content: String, cfg: ChunkConfig = ChunkConfig()): Seq[ChunkOut] = {
    if (content == null || content.forall(pyIsSpace)) return Seq.empty
    val sents = TextFunctions.splitSentences(content)
    if (sents.isEmpty) return Seq.empty
    val tokenSets = sents.map(s => TextFunctions.tokenize(s.text, removeStopwords = false).toSet)
    val out = Seq.newBuilder[(Int, Int)]
    var curStart = sents.head.start
    var curEnd = sents.head.end
    var curTokens = countTokensIn(content, curStart, curEnd)
    for (i <- 1 until sents.size) {
      val s = sents(i)
      val sTokens = countTokensIn(content, s.start, s.end)
      val sim = TextFunctions.jaccard(tokenSets(i - 1).toSeq, tokenSets(i).toSeq)
      val wouldOverflow = curTokens + sTokens > cfg.maxTokens
      val semanticBreak = sim < cfg.semanticThreshold && curTokens >= cfg.minTokens
      if (wouldOverflow || semanticBreak) {
        out += ((curStart, curEnd))
        curStart = s.start; curEnd = s.end; curTokens = sTokens
      } else { curEnd = s.end; curTokens += sTokens }
    }
    out += ((curStart, curEnd))
    // A single sentence-run longer than maxTokens still has to respect
    // the budget: the reference re-splits oversized clusters into
    // max_tokens word windows (semantic_strategy.py:372-430). Same
    // here, word-boundary aligned.
    val split = out.result().flatMap { case (a, b) =>
      if (countTokensIn(content, a, b) <= cfg.maxTokens) Seq((a, b))
      else {
        val res = Seq.newBuilder[(Int, Int)]
        var s = a
        while (s < b) {
          val e = capTokens(content, s, b, cfg.maxTokens)
          val e2 = if (e <= s) math.min(s + cfg.maxTokens * cfg.charsPerToken, b) else e
          res += ((s, e2))
          s = e2
          while (s < b && Character.isWhitespace(content.charAt(s))) s += 1
        }
        res.result()
      }
    }
    split.flatMap { case (a0, b0) =>
      val (a, b) = trimSpan(content, a0, b0)
      if (b > a) Some((a, b)) else None
    }.zipWithIndex.map { case ((a, b), i) =>
      ChunkOut(i, content.substring(a, b), a, b, countTokensIn(content, a, b))
    }
  }

  // -------------------------------------------------------------------
  // C5: hierarchical — parent/child/grandchild windows at sizes
  // [2048, 512, 128] tokens with deterministic ids, so links need no
  // join (SURVEY.md §7.4 risk 5). Level = index into sizes (0 = root).
  // Ref: hierarchical_strategy.py:78-520.
  // -------------------------------------------------------------------
  def hierarchical(content: String, cfg: ChunkConfig = ChunkConfig()): Seq[HierChunkOut] = {
    if (content == null || content.forall(pyIsSpace)) return Seq.empty

    // split [a,b) into consecutive windows of `tokens` words
    def windows(a: Int, b: Int, tokens: Int): Seq[(Int, Int)] = {
      val res = Seq.newBuilder[(Int, Int)]
      var s = a
      while (s < b) {
        val e = capTokens(content, s, b, tokens)
        val e2 = if (e <= s) math.min(s + tokens * cfg.charsPerToken, b) else e
        res += ((s, e2))
        s = e2
        while (s < b && Character.isWhitespace(content.charAt(s))) s += 1
      }
      res.result()
    }

    val out = Seq.newBuilder[HierChunkOut]
    // one shared counter per level keeps ids unique and deterministic
    val counters = cfg.hierarchicalSizes.indices.map(_ => Iterator.from(0))
    def emit(level: Int, parentId: String, a: Int, b: Int): Unit = {
      if (level >= cfg.hierarchicalSizes.size) return
      for ((wa0, wb0) <- windows(a, b, cfg.hierarchicalSizes(level))) {
        val (wa, wb) = trimSpan(content, wa0, wb0)
        if (wb > wa) {
          val i = counters(level).next()
          val id = s"L${level}_$i"
          out += HierChunkOut(level, id, parentId, i,
            content.substring(wa, wb), wa, wb, countTokensIn(content, wa, wb))
          emit(level + 1, id, wa, wb)
        }
      }
    }
    emit(0, null, 0, content.length)
    out.result()
  }

  // -------------------------------------------------------------------
  // C6: hybrid — content analysis routes to the best strategy.
  // Ref: hybrid_strategy.py:81-300 (analysis :197-230).
  // -------------------------------------------------------------------
  final case class ContentAnalysis(hasMarkdown: Boolean, hasCode: Boolean,
      hasStructure: Boolean, route: String)

  /** The reference's content-detection predicates and routing table,
    * hybrid_strategy.py:210-340:
    *  - markdown: a `#`-header line (first 50 lines fallback check)
    *  - code: fenced block or 4-space-indented line
    *  - structure: list / table / blockquote markers
    *  - two or more of the above ("mixed") → recursive (:337 routes the
    *    "hybrid" recommendation to the recursive strategy)
    *  - otherwise markdown→markdown, code→markdown (":332 markdown
    *    handles code blocks well"), structured→hierarchical,
    *    narrative (avg sentence > 50 chars) → semantic,
    *    unknown → character. */
  def analyze(content: String): ContentAnalysis = {
    val c = if (content == null) "" else content
    val lines = c.split("\n", -1)
    val hasMarkdown = HeaderLine.findFirstIn(c).isDefined ||
      lines.take(50).exists { l =>
        val t = l.trim; t.startsWith("#") && t.length > 1
      }
    val hasCode = c.contains("```") || c.contains("\n    ")
    val hasStructure =
      Seq("\n- ", "\n* ", "\n1. ", "\n| ", "\n> ").exists(c.contains)
    val sentences = c.count(ch => ch == '.' || ch == '!' || ch == '?')
    val avgSentenceLen = c.length.toDouble / math.max(1, sentences)
    val mixed = Seq(hasMarkdown, hasCode, hasStructure).count(identity) > 1
    val route =
      if (mixed) "recursive"
      else if (hasMarkdown || hasCode) "markdown"
      else if (hasStructure) "hierarchical"
      else if (avgSentenceLen > 50) "semantic"
      else "character"
    ContentAnalysis(hasMarkdown, hasCode, hasStructure, route)
  }

  def hybrid(content: String, cfg: ChunkConfig = ChunkConfig()): Seq[ChunkOut] =
    analyze(content).route match {
      case "markdown" => markdown(content, cfg)
      case "semantic" => semantic(content, cfg)
      case "character" => character(content, cfg)
      case "hierarchical" =>
        // flat view of structured content: the leaf windows of a
        // two-level hierarchy sized by the chunk budget
        val sizes = Seq(cfg.maxTokens * 4, cfg.maxTokens)
        hierarchical(content, cfg.copy(hierarchicalSizes = sizes))
          .filter(_.level == sizes.size - 1).zipWithIndex
          .map { case (h, i) => ChunkOut(i, h.text, h.start, h.end, h.tokenCount) }
      case _ => recursive(content, cfg)
    }

  def byName(name: String): (String, ChunkConfig) => Seq[ChunkOut] = name match {
    case "character" => character
    case "recursive" => recursive
    case "markdown" => markdown
    case "semantic" => semantic
    case "hybrid" => hybrid
    case other => throw new IllegalArgumentException(s"unknown strategy: $other")
  }

  // -------------------------------------------------------------------
  // DataFrame wrappers (the UDTF surface)
  // -------------------------------------------------------------------
  // public: Catalyst's generated deserializers need access
  case class DocIn(id: String, text: String)
  case class ChunkRow(doc_id: String, chunk_index: Int, text: String,
      start_offset: Int, end_offset: Int, token_count: Int)
  case class ChunkRowT(doc_id: String, chunk_index: Int, text: String,
      start_offset: Int, end_offset: Int, token_count: Int,
      total_chunks: Int)
  case class HierRow(doc_id: String, level: Int, chunk_id: String,
      parent_id: String, chunk_index: Int, start_offset: Int,
      end_offset: Int, token_count: Int)

  /** Chunk every document with the named strategy → rows
    * (doc_id, chunk_index, text, start_offset, end_offset, token_count).
    * A flatMap over the scan: no shuffle, embarrassingly parallel. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     strategy: String,
                     cfg: ChunkConfig = ChunkConfig()): DataFrame = {
    val fn = byName(strategy)
    val ds = df.select(col(idCol).cast("string").as("id"),
        col(textCol).as("text"))
      .as(Encoders.product[DocIn])
    ds.flatMap { d =>
      fn(d.text, cfg).map(c => ChunkRow(d.id, c.chunkIndex, c.text,
        c.start, c.end, c.tokenCount))
    }(Encoders.product[ChunkRow]).toDF()
  }

  /** [[chunkDocuments]] + a total_chunks column computed INSIDE the
    * flatMap — the per-doc chunk count is known at emit time, so the
    * ingest pipeline needs no per-doc window/shuffle for it. */
  def chunkDocumentsWithTotal(df: DataFrame, idCol: String, textCol: String,
                              strategy: String,
                              cfg: ChunkConfig = ChunkConfig()): DataFrame = {
    val fn = byName(strategy)
    val ds = df.select(col(idCol).cast("string").as("id"),
        col(textCol).as("text"))
      .as(Encoders.product[DocIn])
    ds.flatMap { d =>
      val chunks = fn(d.text, cfg)
      val n = chunks.size
      chunks.map(c => ChunkRowT(d.id, c.chunkIndex, c.text,
        c.start, c.end, c.tokenCount, n))
    }(Encoders.product[ChunkRowT]).toDF()
  }

  /** Fixed character windows with overlap as a PURE column plan — the
    * strict-window form of C1 with no boundary snapping, so every
    * window is a closed form of (length, window, step) and the whole
    * operator (offsets, content, token counts) is exactly
    * SQL-expressible for a hash-checked DuckDB oracle. sequence +
    * posexplode + substring all stay inside whole-stage codegen; like
    * the flatMap chunkers it is narrow — zero shuffles at any corpus
    * size. Empty documents produce no rows.
    *
    * Windows: n = 1 + max(0, ceil((len - window) / step)); window i
    * covers [i*step, min(i*step + window, len)). token_count counts
    * maximal `\S+` runs — the SQL-expressible form, which agrees with
    * [[countTokens]] on ASCII text but treats exotic Unicode
    * whitespace (U+2028 etc.) as token characters where
    * Character.isWhitespace does not. */
  def fixedWindows(df: DataFrame, idCol: String, textCol: String,
                   cfg: ChunkConfig = ChunkConfig()): DataFrame = {
    val window = cfg.maxTokens * cfg.charsPerToken
    val step = window - cfg.overlapTokens * cfg.charsPerToken
    require(step > 0, s"overlap must be smaller than the window (got " +
      s"window=$window chars, overlap=${window - step})")
    val len = length(col("_text"))
    // ceil((len - window)/step) in exact integer arithmetic
    val extra = greatest(lit(0),
      floor((len - lit(window) + lit(step - 1)).cast("double") / lit(step))
        .cast("int"))
    val start = col("_win") * step
    val end = least(start + lit(window), length(col("_text")))
    df.select(col(idCol).cast("string").as("doc_id"), col(textCol).as("_text"))
      .where(length(col("_text")) > 0)
      .select(col("doc_id"), col("_text"),
        explode(sequence(lit(0), extra)).as("_win"))
      .select(
        col("doc_id"),
        col("_win").cast("int").as("chunk_index"),
        col("_text").substr(start + 1, end - start).as("text"),
        start.cast("int").as("start_offset"),
        end.cast("int").as("end_offset"))
      .withColumn("token_count",
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("int"))
  }

  /** Hierarchical chunking rows with deterministic parent links. */
  def chunkHierarchical(df: DataFrame, idCol: String, textCol: String,
                        cfg: ChunkConfig = ChunkConfig()): DataFrame = {
    val ds = df.select(col(idCol).cast("string").as("id"),
        col(textCol).as("text"))
      .as(Encoders.product[DocIn])
    ds.flatMap { d =>
      hierarchical(d.text, cfg).map(c => HierRow(d.id, c.level,
        s"${d.id}_${c.chunkId}", Option(c.parentId).map(p => s"${d.id}_$p").orNull,
        c.chunkIndex, c.start, c.end, c.tokenCount))
    }(Encoders.product[HierRow]).toDF()
  }
}
