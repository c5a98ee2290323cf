package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k-per-group aggregation — the scale-correct form of
  * "rank within key, keep the first k".
  *
  * The window formulation (`row_number() OVER (PARTITION BY key ORDER
  * BY ord)`) funnels every row of a hot key through one task's sort
  * before dropping all but k of them — the canonical straggler when one
  * domain/source holds 10⁸ documents. This aggregate keeps AT MOST k
  * entries per partial state: map-side combine reduces each partition's
  * contribution to ≤ k rows BEFORE the exchange, the shuffle carries
  * O(partitions · k) per key instead of the key's full cardinality, and
  * merge is k-bounded too. State is a binary min-heap on the eviction
  * order — O(log k) per row, O(k) memory, no sort until the final
  * k-element eval.
  *
  * Ordering: best = (ord DESC, id ASC) — deterministic under ties, the
  * same discipline as every keep-rule in the library. Output: the top-k
  * as `array<struct<ord, id>>` sorted best-first (explode for rows).
  */
object TopK {

  import org.apache.spark.sql.graft.ColumnBridge.{toColumn, toExpression}

  /** `topkPairs(ord, id, k)` as a Column aggregate (integer ord). */
  def topkPairs(ord: Column, id: Column, k: Int): Column = {
    require(k > 0, s"topkPairs: k must be positive, got $k")
    toColumn(TopKPairs(
        toExpression(ord.cast("long")), toExpression(id.cast("long")), Literal(k))
      .toAggregateExpression())
  }

  /** `topkPairs` over a DOUBLE ord (cosine/inner-product scores): same
    * k-bounded heap, ordering via the IEEE-754 sortable-bits total
    * order — exact (no fixed-point rounding), identical to
    * `java.lang.Double.compare` incl. NaN-largest, which is Spark's own
    * sort order for doubles. This is the aggregate the ANN top-k paths
    * ride instead of a per-query `row_number()` window.
    */
  def topkPairsDouble(ord: Column, id: Column, k: Int): Column = {
    require(k > 0, s"topkPairsDouble: k must be positive, got $k")
    toColumn(TopKPairs(
        toExpression(ord.cast("double")), toExpression(id.cast("long")), Literal(k))
      .toAggregateExpression())
  }

  /** [[topkPairs]] with a STRING id (long ord): same k-bounded heap,
    * ties → lexicographically smallest id (Spark's own string order).
    * The long-id variants silently null-and-drop non-numeric ids
    * through their `cast("long")` — this is the variant any
    * string-keyed corpus (URLs, UUIDs) must ride.
    */
  def topkPairsStr(ord: Column, id: Column, k: Int): Column = {
    require(k > 0, s"topkPairsStr: k must be positive, got $k")
    toColumn(TopKPairsStr(
        toExpression(ord.cast("long")), toExpression(id.cast("string")), Literal(k))
      .toAggregateExpression())
  }

  /** [[topkPairsStr]] over a DOUBLE ord. */
  def topkPairsStrDouble(ord: Column, id: Column, k: Int): Column = {
    require(k > 0, s"topkPairsStrDouble: k must be positive, got $k")
    toColumn(TopKPairsStr(
        toExpression(ord.cast("double")), toExpression(id.cast("string")), Literal(k))
      .toAggregateExpression())
  }

  /** Type-aware dispatch: resolves the id and ord types against `df`
    * and picks the right variant — the unboxed long-id heap when ids
    * are numeric (the hot ANN/profile path), the string-id heap for
    * string keys, and double ordering whenever ord is fractional
    * (a long cast would truncate 0.93 and 0.41 to the same 0).
    */
  def topkPairsFor(df: org.apache.spark.sql.DataFrame,
                   ord: Column, id: Column, k: Int): Column = {
    val ordFrac = df.select(ord).schema.head.dataType match {
      case FloatType | DoubleType | _: DecimalType => true
      case _ => false
    }
    val idStr = df.select(id).schema.head.dataType == StringType
    (idStr, ordFrac) match {
      case (true, false) => topkPairsStr(ord, id, k)
      case (true, true) => topkPairsStrDouble(ord, id, k)
      case (false, false) => topkPairs(ord, id, k)
      case (false, true) => topkPairsDouble(ord, id, k)
    }
  }

  /** Monotone bijection double → long: preserves `Double.compare` order
    * (negatives flip their low 63 bits; NaN canonicalizes largest).
    * Self-inverse.
    */
  @inline private[functions] def toSortable(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & Long.MaxValue)
  }

  @inline private[functions] def fromSortable(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))
}

/** Mutable k-bounded buffer: a binary min-heap whose root is the WORST
  * kept entry (smallest ord, then largest id), so a beat-the-worst
  * check is O(1) and replacement O(log k).
  */
final class TopKHeap(val k: Int) {
  // parallel arrays — no boxing in the hot path
  private[functions] var ords = new Array[Long](math.min(k, 16))
  private[functions] var ids = new Array[Long](math.min(k, 16))
  private[functions] var n = 0

  /** a strictly worse than b (a evicted first). */
  private def worse(ao: Long, ai: Long, bo: Long, bi: Long): Boolean =
    ao < bo || (ao == bo && ai > bi)

  private def swap(i: Int, j: Int): Unit = {
    val to = ords(i); ords(i) = ords(j); ords(j) = to
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0 && worse(ords(i), ids(i), ords((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var w = i
      if (l < n && worse(ords(l), ids(l), ords(w), ids(w))) w = l
      if (r < n && worse(ords(r), ids(r), ords(w), ids(w))) w = r
      if (w == i) done = true else { swap(i, w); i = w }
    }
  }

  def add(ord: Long, id: Long): Unit =
    if (n < k) {
      if (n == ords.length) {
        val cap = math.min(k.toLong, ords.length * 2L).toInt
        ords = java.util.Arrays.copyOf(ords, cap)
        ids = java.util.Arrays.copyOf(ids, cap)
      }
      ords(n) = ord; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (worse(ords(0), ids(0), ord, id)) {
      ords(0) = ord; ids(0) = id
      siftDown()
    }

  /** (ord, id) pairs best-first: ord DESC, id ASC. */
  def sortedPairs: Array[(Long, Long)] = {
    val out = Array.tabulate(n)(i => (ords(i), ids(i)))
    out.sortBy { case (o, i) => (-o, i) }
  }
}

@ExpressionDescription(
  usage = "_FUNC_(ord, id, k) - top-k (ord, id) pairs per group by (ord DESC, id ASC), k-bounded partial state.")
case class TopKPairs(
    ordExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_topk: k must be an integer literal, got $other")
  }

  private def ordIsDouble: Boolean = ordExpr.dataType == DoubleType

  override def children: Seq[Expression] = Seq(ordExpr, idExpr, kExpr)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!((ordExpr.dataType == LongType || ordExpr.dataType == DoubleType) &&
          idExpr.dataType == LongType &&
          (kExpr.dataType == IntegerType || kExpr.dataType == LongType) && kExpr.foldable))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects (bigint|double ord, bigint id, foldable int k), got " +
          s"(${ordExpr.dataType.sql}, ${idExpr.dataType.sql}, ${kExpr.dataType.sql})")
    else if (k <= 0)
      // same contract as the Column API's require(k > 0) — a silent
      // clamp-to-1 would make graft_topk(ord, id, 0) lie about its k
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk: k must be positive, got $k")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", ordExpr.dataType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(math.max(k, 1))

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val o = ordExpr.eval(input)
    val i = idExpr.eval(input)
    if (o != null && i != null) {
      val ord =
        if (ordIsDouble) TopK.toSortable(o.asInstanceOf[Double])
        else o.asInstanceOf[Long]
      buffer.add(ord, i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.n) { buffer.add(other.ords(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedPairs.map { case (o, i) =>
      if (ordIsDouble) InternalRow(TopK.fromSortable(o), i) else InternalRow(o, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.n)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putLong(buffer.ords(i)); bb.putLong(buffer.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = createAggregationBuffer()
    var i = 0
    while (i < n) { h.add(bb.getLong, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(ordExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}

/** [[TopKHeap]] with STRING ids: same min-heap-on-worst discipline,
  * ties broken by UTF8String (binary-lexicographic — Spark's string
  * sort order) ASC. Stored ids are OWNED copies (update() clones
  * before insert; eval-row UTF8Strings may alias reused buffers).
  */
final class TopKStrHeap(val k: Int) {
  private[functions] var ords = new Array[Long](math.min(k, 16))
  private[functions] var ids = new Array[UTF8String](math.min(k, 16))
  private[functions] var n = 0

  private def worse(ao: Long, ai: UTF8String, bo: Long, bi: UTF8String): Boolean =
    ao < bo || (ao == bo && ai.compareTo(bi) > 0)

  /** true iff add() would keep this entry — lets the caller clone only
    * the ids that actually enter the heap. */
  def wouldAccept(ord: Long, id: UTF8String): Boolean =
    n < k || worse(ords(0), ids(0), ord, id)

  private def swap(i: Int, j: Int): Unit = {
    val to = ords(i); ords(i) = ords(j); ords(j) = to
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0 && worse(ords(i), ids(i), ords((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var w = i
      if (l < n && worse(ords(l), ids(l), ords(w), ids(w))) w = l
      if (r < n && worse(ords(r), ids(r), ords(w), ids(w))) w = r
      if (w == i) done = true else { swap(i, w); i = w }
    }
  }

  def add(ord: Long, id: UTF8String): Unit =
    if (n < k) {
      if (n == ords.length) {
        val cap = math.min(k.toLong, ords.length * 2L).toInt
        ords = java.util.Arrays.copyOf(ords, cap)
        ids = java.util.Arrays.copyOf(ids, cap)
      }
      ords(n) = ord; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (worse(ords(0), ids(0), ord, id)) {
      ords(0) = ord; ids(0) = id
      siftDown()
    }

  /** (ord, id) pairs best-first: ord DESC, id ASC. */
  def sortedPairs: Array[(Long, UTF8String)] = {
    val out = Array.tabulate(n)(i => (ords(i), ids(i)))
    out.sortWith { case ((ao, ai), (bo, bi)) =>
      ao > bo || (ao == bo && ai.compareTo(bi) < 0)
    }
  }
}

@ExpressionDescription(
  usage = "_FUNC_(ord, id, k) - top-k (ord, id) pairs per group with STRING ids, k-bounded partial state.")
case class TopKPairsStr(
    ordExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrHeap] {

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_topk_str: k must be an integer literal, got $other")
  }

  private def ordIsDouble: Boolean = ordExpr.dataType == DoubleType

  override def children: Seq[Expression] = Seq(ordExpr, idExpr, kExpr)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!((ordExpr.dataType == LongType || ordExpr.dataType == DoubleType) &&
          idExpr.dataType == StringType &&
          (kExpr.dataType == IntegerType || kExpr.dataType == LongType) && kExpr.foldable))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk_str expects (bigint|double ord, string id, foldable int k), got " +
          s"(${ordExpr.dataType.sql}, ${idExpr.dataType.sql}, ${kExpr.dataType.sql})")
    else if (k <= 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk_str: k must be positive, got $k")
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", ordExpr.dataType, nullable = false),
      StructField("id", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_topk_str"

  override def createAggregationBuffer(): TopKStrHeap = new TopKStrHeap(math.max(k, 1))

  override def update(buffer: TopKStrHeap, input: InternalRow): TopKStrHeap = {
    val o = ordExpr.eval(input)
    val i = idExpr.eval(input)
    if (o != null && i != null) {
      val ord =
        if (ordIsDouble) TopK.toSortable(o.asInstanceOf[Double])
        else o.asInstanceOf[Long]
      val id = i.asInstanceOf[UTF8String]
      // clone only when the entry is actually kept — the eval result
      // may alias a buffer the next row overwrites
      if (buffer.wouldAccept(ord, id)) buffer.add(ord, id.clone())
    }
    buffer
  }

  override def merge(buffer: TopKStrHeap, other: TopKStrHeap): TopKStrHeap = {
    var i = 0
    while (i < other.n) { buffer.add(other.ords(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKStrHeap): Any =
    new GenericArrayData(buffer.sortedPairs.map { case (o, i) =>
      if (ordIsDouble) InternalRow(TopK.fromSortable(o), i) else InternalRow(o, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKStrHeap): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < buffer.n) { bytes += buffer.ids(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(4 + 12 * buffer.n + bytes)
    bb.putInt(buffer.n)
    i = 0
    while (i < buffer.n) {
      bb.putLong(buffer.ords(i))
      val idb = buffer.ids(i).getBytes
      bb.putInt(idb.length)
      bb.put(idb)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val ord = bb.getLong
      val len = bb.getInt
      val idb = new Array[Byte](len)
      bb.get(idb)
      h.add(ord, UTF8String.fromBytes(idb))
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsStr =
    copy(ordExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}
