package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Bloom-filter semi-join pruning — the same machinery Spark's own
  * row-level runtime filtering (`InjectRuntimeFilter`) uses, surfaced
  * as library operators so a pipeline can prune a huge probe side
  * against a small build side BEFORE the shuffle join.
  *
  * At 100 TB this is the decontamination move: the held-out n-gram id
  * set is millions of longs (MBs as a Bloom filter) while the train
  * n-gram table is trillions of rows; broadcasting the filter and
  * pruning at the scan turns an all-to-all shuffle of the train side
  * into a shuffle of only the ~0.1% that might match. False positives
  * are removed by the exact join that follows, so results stay exact —
  * the filter only changes the plan, never the answer.
  */
object BloomFns {

  /** Aggregate a long column into one Bloom filter (binary). */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(c),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a Bloom filter binary column. */
  def mightContain(bloom: Column, v: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(bloom), Bridge.expression(v)))

  /** A DataFrame's single value as a scalar-subquery expression —
    * `might_contain` demands its filter be a constant or scalar
    * subquery (never a joined column), matching how
    * `InjectRuntimeFilter` shapes Spark's own runtime bloom filters:
    * the subquery runs once and ships to every task as a literal. */
  private[graft] def scalarSubquery(df: DataFrame): Column = {
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
    Bridge.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(plan))
  }

  /** Prune `probe` to rows whose `keyCol` (long) might be in `build`'s
    * key set: build one Bloom filter over build.keyCol (scalar
    * subquery, shipped to tasks as a constant), filter probe map-side.
    * Follow with the exact join — the output is a superset of the true
    * semi-join by the filter's fpp only. */
  def bloomPrune(probe: DataFrame, build: DataFrame, keyCol: String,
                 expectedItems: Long, numBits: Long): DataFrame = {
    val bf = build.agg(bloomAgg(col(keyCol), expectedItems, numBits).as("__bf"))
    probe.filter(mightContain(scalarSubquery(bf), col(keyCol)))
  }
}
