// Lives in org.apache.spark.sql.graft to reach the classic session's
// private[sql] internalCreateDataFrame — the same access pattern Spark's
// own v1 streaming sources (FileStreamSource) use to tag a micro-batch.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}

object StreamingInternal {
  /** Re-tag a batch DataFrame as a streaming micro-batch: the v1
    * `Source.getBatch` contract requires `isStreaming = true` on the
    * returned plan's leaves. Planning happens here; execution stays
    * lazy (the RDD computes when the sink's batch runs). */
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val cs = cdf.sparkSession
    cs.internalCreateDataFrame(cdf.queryExecution.toRdd, cdf.schema,
      isStreaming = true)
  }

  /** The inverse, for v1 `Sink.addBatch`: pin a micro-batch's executed
    * plan as an ordinary batch DataFrame so the sink can run normal
    * multi-action DataFrame code over it (what ForeachBatchSink does
    * before handing the batch to user code). */
  def asBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val cs = cdf.sparkSession
    cs.internalCreateDataFrame(cdf.queryExecution.toRdd, cdf.schema,
      isStreaming = false)
  }
}
