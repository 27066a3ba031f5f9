package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bottom-k DISTINCT values of a long column, as a typed imperative
  * aggregate — the buffer is a capped sorted set, so a partial
  * aggregate ships at most k longs per partition per group across the
  * exchange. This is the KMV (k-minimum-values) distinct-count sketch
  * primitive: over uniform hashes, the k-th smallest value estimates
  * the distinct count as (k-1)*P/h_k (see `a20_kmv_sketch`).
  *
  * Unlike `approx_count_distinct` (HLL registers, engine-specific),
  * the bottom-k set is engine-independent: any system that can sort
  * hashes produces the identical sketch, so the estimate itself is
  * DuckDB-oracle-exact. Dedup happens inside the buffer (TreeSet), so
  * no pre-`distinct()` shuffle is needed.
  */
case class BottomKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 1, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottom_k expects a BIGINT argument, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  /** Sorted ascending array of the (<= k) smallest distinct values. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bottom_k"

  override def withNewMutableAggBufferOffset(offset: Int): BottomKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BottomKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BottomKAgg =
    copy(child = c.head)
}

object BottomKAgg {
  import org.apache.spark.sql.{Column => SqlColumn}
  import org.apache.spark.sql.graftbridge.Bridge

  /** `bottom_k(c, k)` as a Column aggregate. */
  def bottomK(c: SqlColumn, k: Int): SqlColumn =
    Bridge.column(BottomKAgg(Bridge.expression(c), k).toAggregateExpression())
}

/** The Poisson-bootstrap trial fold as ONE typed aggregate: for each
  * input row (id, valueCents) it plays all `trials` seeded draws in a
  * tight JVM loop — w(t) from the quadratic hash mod 1e9+7, exactly
  * the integer arithmetic `analytics.Bootstrap` documents — and
  * accumulates per-trial sum(w) and sum(w * valueCents). State is
  * 2*trials+1 longs per partition, so the exchange ships one tiny
  * vector where the explode-by-trial plan shuffled rows x trials
  * records, and the arithmetic runs as JIT'd longs instead of
  * interpreted expression trees (building the per-row trial array in
  * a HOF `transform` feeding a typed aggregate measured 30x WORSE
  * than the explode plan, because project-collapse re-evaluates the
  * array construction interpreted inside every aggregate update).
  * Integer sums are order-free, so the result is bit-identical to the
  * exploded form and the DuckDB oracle replays it unchanged.
  *
  * Output: struct(ws: array<bigint>, wvs: array<bigint>), NULL on an
  * empty relation (mirrors a group-by-trial over zero rows). */
case class BootstrapTrialsAgg(
    id: Expression,
    vc: Expression,
    trials: Int,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // the bounds live HERE, not only in Bootstrap.bootstrapMean: this
  // aggregate is a public API, and an extreme seed would overflow the
  // maxId computation below and silently disable the very guard it
  // feeds (trials*7919 + |seed| wrapping negative makes maxId huge)
  require(trials >= 1 && trials <= 100000,
    s"bootstrap_trials: trials=$trials out of range")
  require(seed > Long.MinValue / 2 && seed < Long.MaxValue / 2,
    s"bootstrap_trials: seed=$seed out of range")

  private val P = 1000000007L
  // two-sided id bound with headroom for the worst-case trial/seed
  // terms (see Bootstrap.bootstrapMean) — enforced per row below so a
  // violation fails loudly instead of wrapping silently
  private val maxId =
    (Long.MaxValue / 2 - (trials.toLong * 7919L + math.abs(seed))) / 1000003L
  // the seed range check above still admits |seed| large enough that
  // maxId collapses to <= 0, after which EVERY id fails the per-row
  // guard with a message blaming the id — fail at plan time with the
  // real cause instead (ADVICE r8)
  require(maxId > 0,
    s"bootstrap_trials: |seed|=$seed leaves no id headroom " +
      s"(maxId=$maxId <= 0); use a smaller |seed|")

  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType == LongType && vc.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bootstrap_trials expects (BIGINT, BIGINT), got " +
        s"(${id.dataType.simpleString}, ${vc.dataType.simpleString})")

  // slots 0..trials-1 = sum(w); trials..2*trials-1 = sum(w*vc);
  // slot 2*trials = rows seen
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * trials + 1)

  private def pmod(x: Long, p: Long): Long = { val m = x % p; if (m < 0) m + p else m }

  private def weight(u: Long): Long =
    if (u < 367880L) 0L else if (u < 735760L) 1L else if (u < 919700L) 2L
    else if (u < 981010L) 3L else if (u < 996340L) 4L else 5L

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val idV = id.eval(input)
    val vcV = vc.eval(input)
    // NULL parity with the exploded formulation (and the DuckDB
    // oracle): a NULL id makes the draw u NULL, and CASE WHEN treats
    // NULL conditions as false, so the weight falls through to the
    // ELSE branch — w = 5 for every trial. A NULL value contributes w
    // to sum(w) but its w*vc product drops out of sum(w*vc) (SQL sum
    // skips NULL terms). Rows are never skipped wholesale.
    if (idV != null) {
      val i = idV.asInstanceOf[Long]
      if (i <= -maxId || i >= maxId) throw new IllegalArgumentException(
        s"bootstrap_trials: |id| must be < ~2^62/1000003 (the draw would overflow)")
    }
    var t = 1
    while (t <= trials) {
      val w =
        if (idV == null) 5L
        else {
          val p1 = pmod(idV.asInstanceOf[Long] * 1000003L + t * 7919L + seed, P)
          weight(pmod(p1 * p1 + p1, P) % 1000000L)
        }
      buf(t - 1) += w
      if (vcV != null) buf(trials + t - 1) += w * vcV.asInstanceOf[Long]
      t += 1
    }
    buf(2 * trials) += 1
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= 2 * trials) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(2 * trials) == 0) null
    else {
      val ws = new Array[Any](trials)
      val wvs = new Array[Any](trials)
      var i = 0
      while (i < trials) { ws(i) = buf(i); wvs(i) = buf(trials + i); i += 1 }
      InternalRow(new GenericArrayData(ws), new GenericArrayData(wvs))
    }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * (2 * trials + 1))
    var i = 0
    while (i <= 2 * trials) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    var i = 0
    while (i <= 2 * trials) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("ws", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("wvs", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(id, vc)
  override def prettyName: String = "bootstrap_trials"

  override def withNewMutableAggBufferOffset(offset: Int): BootstrapTrialsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BootstrapTrialsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BootstrapTrialsAgg =
    copy(id = c(0), vc = c(1))
}

object BootstrapTrialsAgg {
  import org.apache.spark.sql.{Column => SqlColumn}
  import org.apache.spark.sql.graftbridge.Bridge

  def bootstrapTrials(id: SqlColumn, vc: SqlColumn, trials: Int,
                      seed: Long): SqlColumn =
    Bridge.column(BootstrapTrialsAgg(Bridge.expression(id),
      Bridge.expression(vc), trials, seed).toAggregateExpression())
}
