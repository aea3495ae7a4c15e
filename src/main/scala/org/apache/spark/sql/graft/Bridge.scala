package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the converters `private[sql]`
  * (ExpressionUtils in columnNodeSupport.scala), so this one-file shim
  * lives in the org.apache.spark.sql namespace — same technique open-source
  * table formats use to host custom Catalyst expressions on Spark 4. */
object Bridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def ofExpr(e: Expression): Column = ExpressionUtils.column(e)

  /** StructType.asNullable is private[spark]; the append path needs it to
    * normalize a footer-embedded writer schema exactly the way
    * HadoopFsRelation normalizes an inferred one (file sources report
    * every field nullable), so footer-derived and read-inferred schemas
    * compare equal. */
  def asNullable(st: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    st.asNullable

  /** Dataset.showString is private[sql] in Spark 4; the shell needs the
    * rendered table as a string for its own output stream. */
  def showString(df: org.apache.spark.sql.DataFrame, numRows: Int, truncate: Int): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .showString(numRows, truncate, vertical = false)

  /** Re-tag a batch plan as a streaming micro-batch. A v1 streaming
    * Source's getBatch must return a DataFrame whose plan reports
    * isStreaming=true (MicroBatchExecution asserts it), and the only
    * constructor for that — `internalCreateDataFrame(rdd, schema,
    * isStreaming)` — is private[sql], hence this shim. Execution stays
    * lazy: `toRdd` is the physical plan's RDD, not a materialization. */
  def streamingBatch(df: org.apache.spark.sql.DataFrame,
                     schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, schema, isStreaming = true)
  }

  /** Inverse of [[streamingBatch]]: re-tag a v1 Sink.addBatch DataFrame
    * (whose plan reports isStreaming=true, so actions on it throw) as an
    * ordinary batch DataFrame over the same physical RDD — the same
    * internalCreateDataFrame re-wrap foreachBatch performs internally. */
  def asBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = false)
  }

  def emptyStreamingBatch(spark: org.apache.spark.sql.SparkSession,
                          schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      classic.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema, isStreaming = true)
  }
}
