package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Native bounded top-k aggregate: keeps the `k` best (score DESC, id ASC)
 * pairs seen, as a TypedImperativeAggregate with an O(k) buffer.
 *
 * Why a custom aggregate and not `sort_array(collect_list(...))[0:k]` or a
 * per-group window: both of those materialize EVERY row of a group before
 * truncating — a hot group at corpus scale is an unbounded array on one
 * task. This buffer never holds more than k entries, is map-side
 * combinable (partial states of size ≤k merge associatively), and the
 * result is a pure function of the input SET: the kept entries are the
 * top-k under the TOTAL order (score DESC, id ASC), so merge order —
 * and therefore cluster layout — cannot change the answer.
 *
 * Rows with a null or NaN score are ignored (a NaN has no place in a
 * total order; DuckDB and Spark disagree on NaN comparisons, so admitting
 * them would make results engine-dependent).
 *
 * Returns `array<struct<score:double, id:bigint>>`, best first.
 */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  // analysis-time contract: a wrong-typed score/id fails in the analyzer
  // instead of a ClassCastException deep in executor tasks
  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint) inputs, got " +
        s"(${scoreExpr.dataType.simpleString}, ${idExpr.dataType.simpleString})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_agg"

  /** Strict total order: higher score wins, ties break to the lower id. */
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  override def update(buf: ArrayBuffer[(Double, Long)],
                      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
                     other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach { case (s, i) => insert(buf, s, i) }
    buf
  }

  // buffer kept sorted best-first; linear insertion is O(k) with small k
  private def insert(buf: ArrayBuffer[(Double, Long)], s: Double, i: Long): Unit = {
    if (s.isNaN) return
    if (buf.size == k) {
      val (ws, wi) = buf.last
      if (!better(s, i, ws, wi)) return
    }
    var idx = buf.size
    while (idx > 0 && better(s, i, buf(idx - 1)._1, buf(idx - 1)._2)) idx -= 1
    buf.insert(idx, (s, i))
    if (buf.size > k) buf.remove(buf.size - 1)
    ()
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var j = 0
    while (j < n) { buf += ((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {
  /** Top-k (score DESC, id ASC) of a group as a bounded-memory aggregate. */
  def apply(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKAgg(ColumnBridge.expression(score),
      ColumnBridge.expression(id), k).toAggregateExpression())

  /**
   * Guard for call sites that feed an id column through `.cast("long")`
   * into the aggregate: a non-integral id (string/UUID corpus) would cast
   * to null and the aggregate would silently DROP every row — in a dedup
   * that reads as "no duplicates found". Fail at analysis time instead.
   */
  def requireIntegralId(df: org.apache.spark.sql.DataFrame,
                        idCol: String, op: String): Unit = {
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op: id column '$idCol' must be an integral type (got " +
        s"${dt.simpleString}); hash or map string/UUID ids to long first " +
        "— casting them would yield null and silently drop rows")
  }
}
