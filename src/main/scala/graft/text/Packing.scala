package graft.text

import org.apache.spark.sql.DataFrame
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
                        outCol: String): DataFrame = {
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
      .agg(sum(col(valCol)).as("__psum"))
      .withColumn("__poff", coalesce(sum(col("__psum")).over(offW), lit(0L)))
      .select(col("__pid"), col("__poff"))
    val local = Window.partitionBy(col("__pid")).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    withPid.join(broadcast(offs), "__pid")
      .withColumn(outCol,
        coalesce(sum(col(valCol)).over(local), lit(0L)) + col("__poff"))
      .drop("__pid", "__poff")
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
