package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token packing (concat-and-chunk): lay every document end-to-end in
  * a global order and cut fixed-length context windows — the standard
  * LM training-data packing step. The hard part at scale is the global
  * running offset: a bare `sum over (order by doc_id)` window has no
  * PARTITION BY, so Spark plans a single-partition sort — one task
  * owns the whole corpus. [[withRunningOffset]] is the scalable form:
  * range-partition by the order column, per-partition cumsum (each
  * partition windows only its own rows), and an exclusive partition
  * offset from the P-row partial-sum table (the only single-partition
  * step is over P rows, not N). Result is bit-identical to the naive
  * global window (PackingSpec) and the t12 oracle's SQL cumsum.
  */
object Packing {

  /** Adds `outCol` = exclusive running sum of `valCol` in `ordCol`
    * order (first row gets 0). `ordCol` must be globally unique —
    * ties would make "the previous rows" ill-defined. */
  def withRunningOffset(df: DataFrame, ordCol: String, valCol: String,
                        outCol: String): DataFrame =
    withRunningOffsets(df, ordCol, Seq(valCol), Seq(outCol))

  /** [[withRunningOffset]] under a COMPOSITE total order (e.g.
    * `cos DESC, vec_id` — e14's knn-rank stride): same two-phase
    * machinery, range-partitioned by the full ordering expression
    * list. RangePartitioner assigns ascending partition ids in range
    * order (desc sort expressions included), so the P-row offset
    * cumsum over `__pid` matches the global order exactly. `ordCols`
    * must be a total order — break ties with a unique column. */
  def withRunningOffsetOrdered(df: DataFrame, ordCols: Seq[Column],
                               valCol: String, outCol: String): DataFrame = {
    val withPid = df.repartitionByRange(ordCols: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withPid.groupBy(col("__pid"))
      .agg(sum(col(valCol)).as("__psum"))
      .select(col("__pid"),
        coalesce(sum(col("__psum")).over(offW), lit(0L)).as("__poff"))
    val local = Window.partitionBy(col("__pid")).orderBy(ordCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    withPid.join(broadcast(offs), "__pid")
      .withColumn(outCol,
        coalesce(sum(col(valCol)).over(local), lit(0L)) + col("__poff"))
      .drop("__pid", "__poff")
  }

  /** Multi-column form of [[withRunningOffset]]: one range exchange
    * and one partial-sum table serve every (valCol -> outCol) pair —
    * callers needing several parallel cumsums over the same order
    * (a28's two-sample CDFs) pay the shuffle once, not per column. */
  def withRunningOffsets(df: DataFrame, ordCol: String,
                         valCols: Seq[String], outCols: Seq[String]): DataFrame = {
    require(valCols.nonEmpty && valCols.length == outCols.length)
    // cache the pid-stamped rows: the partial-sum branch and the main
    // branch below must observe the SAME partition assignment, and
    // without a shared materialization each branch re-executes the
    // range exchange, whose sampled boundaries are not guaranteed to
    // repeat (exchange reuse usually saves this, but correctness must
    // not depend on spark.sql.exchange.reuse)
    val withPid = df.repartitionByRange(col(ordCol))
      .withColumn("__pid", spark_partition_id())
      .cache()
    // P rows — one per partition; the global cumsum over THEM is the
    // one tiny single-partition window (P ~ shuffle partitions)
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withPid.groupBy(col("__pid"))
      .agg(valCols.map(v => sum(col(v)).as(s"__psum_$v")).head,
        valCols.tail.map(v => sum(col(v)).as(s"__psum_$v")): _*)
      .select(col("__pid") +: valCols.map(v =>
        coalesce(sum(col(s"__psum_$v")).over(offW), lit(0L)).as(s"__poff_$v")): _*)
    val local = Window.partitionBy(col("__pid")).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    valCols.zip(outCols).foldLeft(withPid.join(broadcast(offs), "__pid")) {
      case (acc, (v, out)) => acc.withColumn(out,
        coalesce(sum(col(v)).over(local), lit(0L)) + col(s"__poff_$v"))
    }.drop("__pid" +: valCols.map(v => s"__poff_$v"): _*)
  }

  /** Concat-and-chunk packing: each doc's start offset in the global
    * token stream plus the first/last chunk of length `chunkLen` it
    * touches (a doc spanning a boundary lands in both). */
  def packChunks(docs: DataFrame, chunkLen: Long,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val d = docs.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("ntok"))
    withRunningOffset(d, idCol, "ntok", "off")
      .withColumn("chunk_first", expr(s"off div $chunkLen"))
      .withColumn("chunk_last", expr(s"(off + ntok - 1) div $chunkLen"))
  }
}
