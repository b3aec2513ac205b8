package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Chunking, Rake}

/** Pipeline DAG: typed nodes, predicate-routed edges, validation, and a
  * Spark executor that compiles the whole DAG into ONE DataFrame
  * lineage (SURVEY.md §1.1 / §3.3).
  *
  * Validation rules mirror shared/pipeline/types.py:413-437 /
  * shared/pipeline/validation.py:
  *  1. exactly one EMBEDDER node        5. no cycles
  *  2. edge refs exist (or _source)     6. catch-all edge from _source
  *  3. reachable from _source           7. unique node ids
  *  4. path from every node to embedder 9. parallel path_names unique
  *
  * Execution model: routing predicates become `when`-chained (first
  * match) or array-filtered (parallel fan-out) columns; each route is a
  * sub-lineage tagged with a path_id literal; fan-out is a union of
  * per-path plans (SURVEY.md §1.1 "Pipeline DAG") — so Catalyst sees
  * plain projections/filters/flatMaps and the whole pipeline stays one
  * narrow-scan job per path.
  */
object Dag {

  object NodeType {
    val Parser = "parser"
    val Chunker = "chunker"
    val Extractor = "extractor"
    val Embedder = "embedder"
    val all = Set(Parser, Chunker, Extractor, Embedder)
  }

  final case class Node(id: String, nodeType: String,
      config: Map[String, String] = Map.empty)

  /** `when` = predicate map (P1 language); None/empty = catch-all.
    * `parallel` edges fan one row down several paths (tagged by
    * pathName); non-parallel routing is first-match-wins in edge
    * order. */
  final case class Edge(from: String, to: String,
      when: Map[String, Any] = Map.empty,
      parallel: Boolean = false,
      pathName: Option[String] = None)

  final case class PipelineDag(id: String, nodes: Seq[Node], edges: Seq[Edge])

  val Source = "_source"

  /** All rule violations; empty = valid. */
  def validate(dag: PipelineDag): Seq[String] = {
    val errs = Seq.newBuilder[String]
    val ids = dag.nodes.map(_.id)
    val idSet = ids.toSet
    if (ids.distinct.size != ids.size)
      errs += s"duplicate node ids: ${ids.diff(ids.distinct).distinct.mkString(",")}"
    dag.nodes.filterNot(n => NodeType.all(n.nodeType))
      .foreach(n => errs += s"unknown node type '${n.nodeType}' on ${n.id}")
    val embedders = dag.nodes.filter(_.nodeType == NodeType.Embedder)
    if (embedders.size != 1)
      errs += s"exactly one embedder required, found ${embedders.size}"
    dag.edges.foreach { e =>
      if (e.from != Source && !idSet(e.from)) errs += s"edge from unknown node '${e.from}'"
      if (!idSet(e.to)) errs += s"edge to unknown node '${e.to}'"
    }
    // reachability from _source
    val adj = dag.edges.groupBy(_.from).view.mapValues(_.map(_.to)).toMap
    val seen = collection.mutable.Set[String]()
    def dfs(n: String): Unit =
      adj.getOrElse(n, Seq.empty).foreach { m =>
        if (!seen(m)) { seen += m; dfs(m) }
      }
    dfs(Source)
    idSet.diff(seen.toSet).foreach(n => errs += s"node '$n' unreachable from $Source")
    // path to embedder
    embedders.headOption.foreach { emb =>
      val radj = dag.edges.groupBy(_.to).view.mapValues(_.map(_.from)).toMap
      val back = collection.mutable.Set[String](emb.id)
      def rdfs(n: String): Unit =
        radj.getOrElse(n, Seq.empty).foreach { m =>
          if (!back(m)) { back += m; rdfs(m) }
        }
      rdfs(emb.id)
      idSet.diff(back.toSet).filterNot(_ == emb.id)
        .foreach(n => errs += s"node '$n' has no path to the embedder")
    }
    // cycles: Kahn's algorithm over node ids (+_source)
    val allIds = idSet + Source
    val indeg = collection.mutable.Map(allIds.toSeq.map(_ -> 0): _*)
    dag.edges.foreach(e => if (allIds(e.to)) indeg(e.to) += 1)
    val queue = collection.mutable.Queue(
      allIds.filter(indeg(_) == 0).toSeq.sorted: _*)
    var processed = 0
    while (queue.nonEmpty) {
      val n = queue.dequeue(); processed += 1
      adj.getOrElse(n, Seq.empty).distinct.foreach { m =>
        indeg(m) -= 1
        if (indeg(m) == 0) queue.enqueue(m)
      }
    }
    if (processed < allIds.size) errs += "cycle detected"
    // catch-all from _source among non-parallel edges
    val srcEdges = dag.edges.filter(_.from == Source)
    if (!srcEdges.exists(e => !e.parallel && (e.when == null || e.when.isEmpty)))
      errs += s"no catch-all (empty when, non-parallel) edge from $Source"
    // parallel path_name uniqueness per source node
    dag.edges.filter(_.parallel).groupBy(_.from).foreach { case (f, es) =>
      val names = es.map(_.pathName.getOrElse(""))
      if (names.distinct.size != names.size)
        errs += s"parallel edges from '$f' have duplicate path_names"
    }
    errs.result()
  }

  /** Node transformation registry: each node maps a DataFrame with a
    * `text` column to its output. Parsers/extractors/embedders add
    * columns; chunkers explode rows. */
  private def applyNode(node: Node, df: DataFrame): DataFrame =
    node.nodeType match {
      case NodeType.Parser =>
        // text already decoded by the source scan (S7); normalize
        df.withColumn("text",
          when(col("text").isNull, lit("")).otherwise(col("text")))
      case NodeType.Chunker =>
        val strategy = node.config.getOrElse("strategy", "recursive")
        val cfg = Chunking.ChunkConfig(
          minTokens = node.config.getOrElse("min_tokens", "100").toInt,
          maxTokens = node.config.getOrElse("max_tokens", "1000").toInt,
          overlapTokens = node.config.getOrElse("overlap_tokens", "50").toInt)
        Chunking.chunkDocuments(df, "doc_id", "text", strategy, cfg)
          .withColumnRenamed("text", "chunk_text")
          .join(df.drop("text"), Seq("doc_id"))
          .withColumnRenamed("chunk_text", "text")
      case NodeType.Extractor =>
        val k = node.config.getOrElse("top_k", "5").toInt
        val kw = Rake.extractKeywords(df, "doc_id", "text", k)
          .groupBy(col("doc_id"))
          .agg(collect_list(col("phrase")).as("keywords"))
        df.join(kw, Seq("doc_id"), "left")
      case NodeType.Embedder =>
        val dim = node.config.getOrElse("dim", "64").toInt
        df.withColumn("vector", TextFunctions.mockEmbeddingCol(col("text"), dim))
    }

  /** Execute the DAG over FileReference-shaped rows (needs `doc_id` and
    * `text`; routing predicates may reference any column). Returns the
    * union of all paths' embedder outputs, tagged with `path_id`. */
  def execute(dag: PipelineDag, files: DataFrame): DataFrame = {
    val errors = validate(dag)
    require(errors.isEmpty, s"invalid DAG: ${errors.mkString("; ")}")
    val nodesById = dag.nodes.map(n => n.id -> n).toMap

    // resolve every acyclic path _source -> ... -> embedder
    def paths(from: String): Seq[Seq[Edge]] = {
      val out = dag.edges.filter(_.from == from)
      if (out.isEmpty) Seq(Seq.empty)
      else out.flatMap { e =>
        if (nodesById(e.to).nodeType == NodeType.Embedder) Seq(Seq(e))
        else paths(e.to).map(e +: _)
      }
    }

    // entry routing: parallel edges fan out; non-parallel are
    // first-match-wins in declaration order
    val entryEdges = dag.edges.filter(_.from == Source)
    val firstMatch = Predicates.firstMatchRoute(
      entryEdges.filterNot(_.parallel).map(e =>
        e.pathName.getOrElse(e.to) -> e.when))

    val perPath = entryEdges.flatMap { entry =>
      val pathId = entry.pathName.getOrElse(entry.to)
      val selected =
        if (entry.parallel) files.filter(Predicates.compile(entry.when))
        else files.withColumn("_route", firstMatch)
          .filter(col("_route") === pathId).drop("_route")
      // walk the chain from entry.to following the FIRST outgoing edge
      // at each step — predicate routing happens at the _source entry
      // (the reference's router decides there too); mid-DAG branches
      // beyond the first edge are not traversed in this version
      def chain(nodeId: String, df: DataFrame): DataFrame = {
        val node = nodesById(nodeId)
        val out = applyNode(node, df)
        if (node.nodeType == NodeType.Embedder) out
        else dag.edges.find(_.from == nodeId) match {
          case Some(next) => chain(next.to, out)
          case None => out
        }
      }
      Some(chain(entry.to, selected).withColumn("path_id", lit(pathId)))
    }

    perPath.map(df => df.select(
        col("doc_id"), col("text"), col("vector"), col("path_id")))
      .reduce(_ unionByName _)
  }
}
