package graft.expressions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitters) aggregate over a string column, backed
  * by the Apache DataSketches Misra-Gries `ItemsSketch` — a from-scratch
  * `TypedImperativeAggregate` in the same mold as Spark's internal
  * `BloomFilterAggregate`: per-partition sketches build map-side with
  * NO shuffle of the data (each partial is a bounded `maxMapSize`-entry
  * map regardless of input size), partials merge associatively, and the
  * final buffer evaluates to a MAP of the sketch's frequent items →
  * (est, lb, ub).
  *
  * Why this shape at 100 TB: an exact top-k over a heavy-tailed key
  * needs a full key-hashed shuffle of the corpus; the sketch needs one
  * pass and ships `numPartitions x maxMapSize` entries total. Estimates
  * and which marginal items survive DO depend on merge order, but the
  * sketch's deterministic guarantee — lb <= true_count <= ub, and every
  * item with true count above the error threshold is present under
  * `NO_FALSE_NEGATIVES` — holds for ANY order, which is exactly what
  * the oracle gate checks (the [[graft.operators.Quality.sketchHll]]
  * within-bound convention).
  *
  * `maxMapSize` must be a power of 2 (ItemsSketch contract); error is
  * bounded by 3.5/maxMapSize of the stream length. */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  override def prettyName: String = "graft_freq_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType,
    StructType(Seq(
      StructField("est", LongType, nullable = false),
      StructField("lb", LongType, nullable = false),
      StructField("ub", LongType, nullable = false))),
    valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string column, got ${child.dataType.catalogString}")
    else if (maxMapSize < 8 || (maxMapSize & (maxMapSize - 1)) != 0)
      // >= 8, not 2: ItemsSketch silently clamps lgMaxMapSize to 3, so
      // accepting smaller sizes would misstate the 3.5/maxMapSize bound
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName maxMapSize must be a power of 2 >= 8, got $maxMapSize")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String],
                      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String],
                     other: ItemsSketch[String]): ItemsSketch[String] =
    buffer.merge(other)

  override def eval(buffer: ItemsSketch[String]): Any = {
    val rows = buffer.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    val keys = new Array[Any](rows.length)
    val vals = new Array[Any](rows.length)
    var i = 0
    while (i < rows.length) {
      keys(i) = UTF8String.fromString(rows(i).getItem)
      vals(i) = InternalRow(rows(i).getEstimate, rows(i).getLowerBound,
        rows(i).getUpperBound)
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  // ArrayOfStringsSerDe is not java-serializable and the expression ships
  // to executors — rebuild it lazily per JVM
  @transient private lazy val serDe = new ArrayOfStringsSerDe

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(serDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serDe)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}
