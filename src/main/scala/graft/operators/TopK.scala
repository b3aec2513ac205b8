package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed bounded top-k per group — the two-phase pattern that a
  * rank window cannot express: `row_number() over (partition by query)`
  * shuffles EVERY scored row into |Q| partitions before pruning, which
  * at 100 queries × 10⁹ chunks is 10¹¹ rows through a 100-partition
  * exchange. This aggregator instead rides ObjectHashAggregate's
  * map-side partial aggregation: each input partition reduces to at most
  * k candidates per query locally, so the exchange only carries
  * ≤ |parts|·|Q|·k rows and the reduce side merges bounded buffers.
  *
  * Determinism: candidates are ordered by (score desc, chunk_id asc);
  * chunk_id is unique per query, so the top-k set and its order are
  * independent of partitioning and merge order.
  */
object TopK {

  /** One scored candidate; `doc_id` is carried as opaque payload. */
  final case class Hit(doc_id: String, chunk_id: String, score: Double)

  /** Keeps the k best hits by (score desc, chunk_id asc). The buffer is
    * an unordered list pruned whenever it reaches `4k`, giving O(n log k)
    * amortized work per partition without a heap allocation per row. */
  final class TopKHits(k: Int) extends Aggregator[Hit, List[Hit], Seq[Hit]] {
    private val capacity = math.max(4 * k, 64)
    private def lt(a: Hit, b: Hit): Boolean =
      a.score > b.score || (a.score == b.score && a.chunk_id < b.chunk_id)
    private def prune(buf: List[Hit]): List[Hit] =
      if (buf.lengthCompare(k) <= 0) buf else buf.sortWith(lt).take(k)
    override def zero: List[Hit] = Nil
    override def reduce(buf: List[Hit], h: Hit): List[Hit] = {
      val b = h :: buf
      if (b.lengthCompare(capacity) >= 0) prune(b) else b
    }
    override def merge(a: List[Hit], b: List[Hit]): List[Hit] = prune(a ::: b)
    override def finish(buf: List[Hit]): Seq[Hit] = prune(buf).sortWith(lt)
    override def bufferEncoder: Encoder[List[Hit]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Hit]] = ExpressionEncoder()
  }

  /** Per-group top-k over a scored relation carrying
    * (groupCol, doc_id, chunk_id, score). Output:
    * (groupCol, rank, doc_id, chunk_id, score) with rank 1..k ordered by
    * (score desc, chunk_id asc) — the same contract as the rank-window
    * form, minus the full-product shuffle. */
  def perGroup(scored: DataFrame, groupCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKHits(k))
    scored.groupBy(groupCol)
      .agg(agg(col("doc_id"), col("chunk_id"), col("score")).as("hits"))
      .select(col(groupCol), posexplode(col("hits")).as(Seq("pos", "h")))
      .select(col(groupCol), (col("pos") + 1).cast("int").as("rank"),
        col("h.doc_id").as("doc_id"), col("h.chunk_id").as("chunk_id"),
        col("h.score").as("score"))
  }
}
