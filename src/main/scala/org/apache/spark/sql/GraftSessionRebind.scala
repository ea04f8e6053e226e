package org.apache.spark.sql

import org.apache.spark.sql.classic.ClassicConversions._

/** Narrow shim (GraftFunctionRegistry's pattern): move a DataFrame's
  * rows to a SIBLING session of the same SparkContext with ZERO row
  * conversion. The public route — `target.createDataFrame(df.rdd,
  * schema)` — pays a full InternalRow→Row→InternalRow decode/encode of
  * every row (measured +2.5 s on g1's 2.3M-edge rebind at sf0.1);
  * `internalCreateDataFrame` feeds the plan's InternalRow RDD straight
  * into a LogicalRDD on the target session, but is `private[sql]`.
  * Safe here because the first consumer is always an exchange or a
  * cache build (both copy rows as they stream), matching how Spark's
  * own sources hand over unsafe-row RDDs.
  */
object GraftSessionRebind {
  def rebind(target: SparkSession, df: Dataset[Row]): DataFrame =
    target.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
}
