package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Bridge for the V1 streaming `Source` contract.
  *
  * `MicroBatchExecution` asserts that the DataFrame a `Source.getBatch`
  * returns carries `isStreaming = true`; the only way to construct such a
  * frame is `SparkSession.internalCreateDataFrame(rdd, schema,
  * isStreaming = true)`, which is `private[sql]`. This one-function object
  * lives inside the `org.apache.spark.sql` namespace purely to reach that
  * constructor — the exact pattern Spark's own `FileStreamSource` (and
  * external V1 sources such as Delta's) rely on. Nothing else in the repo
  * lives outside the `graft` namespace, and nothing here touches any other
  * internal API.
  *
  * The wrap is lazy at the data level: `queryExecution.toRdd` plans the
  * batch frame but runs no job; rows materialize when the micro-batch's
  * sink executes.
  */
object StreamingBatch {

  /** Re-tag a (batch) DataFrame as streaming for use inside `getBatch`. */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }
}
