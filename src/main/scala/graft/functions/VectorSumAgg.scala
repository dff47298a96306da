package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise SUM over an `array<long>` column — the native aggregate the
  * vector/centroid family needs and Spark lacks (there is no built-in
  * element-wise array sum; the workaround is posexplode → 64 rows per
  * vector → groupBy(key, dim), which multiplies the aggregation input by
  * the dimensionality).
  *
  * A `TypedImperativeAggregate[Array[Long]]` (the percentile_approx /
  * collect_* machinery): the buffer is one primitive long array per group,
  * updates add in place, partial buffers merge element-wise, and the
  * planner runs it as ObjectHashAggregate — map-side combined, so the
  * shuffle carries ONE 8·dim-byte buffer per (partition, group) instead of
  * dim rows per input vector. Long (not double) element type is a
  * deliberate determinism choice: the repo's micro-unit convention makes
  * integer sums order-independent, so the aggregate's result is
  * bit-identical to the explode formulation and to the DuckDB oracle —
  * a double version would inherit partial-aggregation summation order.
  *
  * The dimensionality is learned from the first non-null input (no dim
  * argument to misconfigure); a later length mismatch throws with both
  * lengths named — ragged vectors are a data defect that must not
  * silently truncate. NULL arrays are skipped (SQL aggregate convention);
  * NULL elements inside an array throw for the same reason ragged
  * lengths do. An all-NULL group evaluates to NULL.
  */
case class VectorSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "vec_sum_long"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum_long needs array<bigint>, got ${other.simpleString}")
  }

  /** Empty = "no input seen yet"; sized on first update/merge. */
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = if (buffer.isEmpty) new Array[Long](n) else buffer
    if (buf.length != n) throw new IllegalArgumentException(
      s"vec_sum_long: ragged input — group dimension ${buf.length}, row has $n")
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"vec_sum_long: NULL element at index $i — a defective vector must not silently skip")
      buf(i) += arr.getLong(i)
      i += 1
    }
    buf
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buffer
    if (buffer.isEmpty) return other
    if (buffer.length != other.length) throw new IllegalArgumentException(
      s"vec_sum_long: merging buffers of dimension ${buffer.length} and ${other.length}")
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VectorSumAgg {
  /** Element-wise sum of an `array<bigint>` column as an aggregate Column. */
  def vecSumLong(c: Column): Column =
    GraftSql.aggregateColumn(VectorSumAgg(GraftSql.expression(c)))
}
