package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group top-k whose parallelism does NOT collapse to the
  * group count.
  *
  * The browse/sample surfaces (reference: app/query UI panels that
  * show "largest clusters, 10 exemplar faces each" / "per distance
  * bucket, the 5 most similar" — other_queries.py:279-316, 423-460)
  * are naturally written as `row_number() over (partition by group
  * order by ...) <= k` — but a window clusters by its PARTITION keys,
  * so with tens of groups over a corpus-sized frame the whole corpus
  * sorts on tens of reducers no matter how many executors exist. The
  * scalable form is the standard two-stage candidate cut:
  *
  *   1. rank within (group, salt) — `fanout` deterministic salt values
  *      per group spread the corpus over |groups| x fanout reducers;
  *      every row beyond local rank k is provably outside the global
  *      top-k and is dropped there;
  *   2. rank within group over the <= k x fanout survivors per group —
  *      bounded by the QUERY's constants, not the corpus.
  *
  * The salt is a hash of a caller-named unique column (NOT
  * spark_partition_id: a physical partition id changes under AQE
  * coalescing/retries, and a nondeterministic salt would make stage
  * retries emit different — though still correct — candidate sets;
  * the deterministic hash keeps every execution byte-stable).
  * Ordering must be total (break ties in `orderCols`) for ranks to be
  * well-defined; result == the naive single-window form row-for-row
  * (TopKSpec pins both the equality and the bounded second stage).
  */
object TopK {

  /** Adds `rankCol` = the row's 1-based rank within its group under
    * `orderCols`, keeping only ranks <= k. `saltOn` must be a
    * deterministic per-row expression (any unique id column works). */
  def perGroup(df: DataFrame, k: Int, groupCols: Seq[String],
               orderCols: Seq[Column], saltOn: Column, rankCol: String,
               fanout: Int = 64): DataFrame = {
    require(k > 0 && fanout > 0)
    // the two intermediate names are injected unconditionally — a
    // caller column of the same name would be silently shadowed and
    // then dropped; fail fast instead (same for the output rank name)
    Seq("__salt", "__lr", rankCol).foreach(c =>
      require(!df.columns.contains(c),
        s"TopK.perGroup: input already has a column named '$c'"))
    val gs = groupCols.map(col)
    val local = Window.partitionBy(gs :+ col("__salt"): _*).orderBy(orderCols: _*)
    val global = Window.partitionBy(gs: _*).orderBy(orderCols: _*)
    df.withColumn("__salt", pmod(hash(saltOn), lit(fanout)))
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= k)
      .withColumn(rankCol, row_number().over(global))
      .filter(col(rankCol) <= k)
      .drop("__salt", "__lr")
  }

  /** [[perGroup]] plus the group POPULATION as `countCol` — the
    * browse-surface shape "bucket population + top-k sample"
    * (e15/e19/e20). The naive composition re-aggregates the scored
    * input and broadcast-joins the counts back, which EVALUATES THE
    * INPUT SUBTREE TWICE (for e15/e19 that input is a corpus-sized
    * crossJoin/kmeans pipeline — the second evaluation, not the tiny
    * join, is the cost). Here the population rides the same two window
    * stages perGroup already pays: the local stage counts its
    * (group, salt) slice over the SAME exchange its rank uses, and the
    * global stage sums exactly one surviving slice-count per salt
    * (each nonempty slice's __lr = 1 row always survives the local
    * k-cut) over the SAME exchange the global rank uses. One input
    * pass, zero joins, zero extra exchanges.
    *
    * Window order matters for the WindowGroupLimit pushdown: the count
    * windows sit BELOW their stage's rank window, so the rank-filter
    * group-limit truncates above them and the counts see every row
    * (TopKSpec pins equality against the aggregate+join form). */
  def perGroupWithCount(df: DataFrame, k: Int, groupCols: Seq[String],
      orderCols: Seq[Column], saltOn: Column, rankCol: String,
      countCol: String, fanout: Int = 64): DataFrame = {
    require(k > 0 && fanout > 0)
    Seq("__salt", "__lr", "__lsn", rankCol, countCol).foreach(c =>
      require(!df.columns.contains(c),
        s"TopK.perGroupWithCount: input already has a column named '$c'"))
    val gs = groupCols.map(col)
    val localP = Window.partitionBy(gs :+ col("__salt"): _*)
    val local = localP.orderBy(orderCols: _*)
    val globalP = Window.partitionBy(gs: _*)
    val global = globalP.orderBy(orderCols: _*)
    df.withColumn("__salt", pmod(hash(saltOn), lit(fanout)))
      .withColumn("__lsn", count(lit(1)).over(localP))
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= k)
      // one row per nonempty (group, salt) slice carries the slice
      // count; their sum is the group population (coalesce pins the
      // non-nullable schema of the count() aggregate this replaces —
      // every group partition here has >= 1 surviving __lr = 1 row)
      .withColumn(countCol,
        coalesce(sum(when(col("__lr") === 1, col("__lsn"))).over(globalP),
          lit(0L)))
      .withColumn(rankCol, row_number().over(global))
      .filter(col(rankCol) <= k)
      .drop("__salt", "__lr", "__lsn")
  }
}
