package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Integer vector primitives for fixed-point model training
  * ([[graft.operators.QualityClassifier]]'s gradient loop).
  *
  * The declarative formulations are scale-hostile in two distinct
  * ways, both measured on the classifier at sf0.1:
  *
  *   - gradient via `select(e, posexplode(fvec))` plans the residual
  *     Project ABOVE the Generate, so the interpreted margin
  *     expression re-evaluates once PER EXPLODED SLOT (257× per doc —
  *     43 s/query); the explode also shuffles dim·rows slot rows where
  *     the information content is one dim-length vector per partition.
  *   - margin via `aggregate(zip_with(fvec, lit-array))` is
  *     interpreted lambda evals, and inlining it into any downstream
  *     lambda re-evaluates it per element (CollapseProject).
  *
  * [[GradVecSum]] is the aggregate form of the gradient: per input
  * row it adds `x_j · e` into a dim-length long buffer — map-side
  * combine reduces every partition to ONE vector before the (single)
  * merge, so the shuffle carries partitions·dim longs and the driver
  * receives exactly the model. [[DotWLongK]] is the margin: a tight
  * codegen'd dot product against the weight vector EMBEDDED in the
  * expression (the [[Kernels.ivfAssign]] pattern — the model rides the
  * closure/plan, not a per-row literal array build).
  */
object VecAgg {

  import org.apache.spark.sql.graft.ColumnBridge.{toColumn, toExpression}

  /** Σ_rows vec_j · e as `array<long>` of length `dim` (vec: int-valued
    * array<float>, e: long scalar). Rows with null vec or e are skipped.
    */
  def gradVecSum(vec: Column, e: Column, dim: Int): Column = {
    require(dim > 0, s"gradVecSum: dim must be positive, got $dim")
    toColumn(GradVecSum(toExpression(vec), toExpression(e.cast("long")), Literal(dim))
      .toAggregateExpression())
  }

  /** exact int64 dot product of an int-valued float vector against the
    * frozen long weights: Σ w_j · round-free long(vec_j).
    */
  def dotWLong(vec: Column, w: Array[Long]): Column =
    toColumn(DotWLongK(toExpression(vec), w))

  /** loop body shared by interpreted eval and codegen. */
  def dotWLongEval(vec: ArrayData, w: Array[Long]): Long = {
    val n = math.min(vec.numElements(), w.length)
    var s = 0L
    var j = 0
    while (j < n) { s += vec.getFloat(j).toLong * w(j); j += 1 }
    s
  }
}

case class DotWLongK(child: Expression, w: Array[Long]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    VecAgg.dotWLongEval(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("w", w, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecAgg.dotWLongEval($c, $wRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): DotWLongK = copy(child = newChild)
  override def prettyName: String = "graft_dotw_long"
  // Array-valued constructor params compare by reference under the
  // default case-class equality; compare by content so two plans over
  // the same frozen weights canonicalize identically.
  override def equals(other: Any): Boolean = other match {
    case DotWLongK(c, ow) => c == child && java.util.Arrays.equals(w, ow)
    case _ => false
  }
  override def hashCode(): Int = child.hashCode() * 31 + java.util.Arrays.hashCode(w)
}

case class GradVecSum(
    vecExpr: Expression,
    eExpr: Expression,
    dimExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val dim: Int = dimExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_grad_vec_sum: dim must be an integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(vecExpr, eExpr, dimExpr)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!(vecExpr.dataType.isInstanceOf[ArrayType] &&
          vecExpr.dataType.asInstanceOf[ArrayType].elementType == FloatType &&
          eExpr.dataType == LongType && dimExpr.foldable))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_grad_vec_sum expects (array<float> vec, bigint e, foldable int dim), got " +
          s"(${vecExpr.dataType.sql}, ${eExpr.dataType.sql})")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_grad_vec_sum"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = vecExpr.eval(input)
    val e = eExpr.eval(input)
    if (v != null && e != null) {
      val arr = v.asInstanceOf[ArrayData]
      val el = e.asInstanceOf[Long]
      val n = math.min(arr.numElements(), dim)
      var j = 0
      while (j < n) { buffer(j) += arr.getFloat(j).toLong * el; j += 1 }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < dim) { buffer(j) += other(j); j += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val out = new Array[Any](dim)
    var j = 0
    while (j < dim) { out(j) = buffer(j); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(dim * 8)
    var j = 0
    while (j < dim) { bb.putLong(buffer(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](dim)
    var j = 0
    while (j < dim) { out(j) = bb.getLong(); j += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GradVecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GradVecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GradVecSum =
    copy(vecExpr = newChildren(0), eExpr = newChildren(1), dimExpr = newChildren(2))
}
