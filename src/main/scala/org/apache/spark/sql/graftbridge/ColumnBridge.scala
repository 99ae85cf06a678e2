package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

/** Column ↔ Catalyst Expression bridge. Spark 4's Column is backed by a
  * ColumnNode (Connect split) and the classic converters are
  * `private[sql]`, so libraries that define native expressions expose
  * them through a small accessor in the sql package — the same pattern
  * Spark-ecosystem libraries (Delta, etc.) use. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** InternalRow-level createDataFrame (`private[sql]` on the classic
    * SparkSession): lets RDD-boundary operators (the dense-rank
    * zipWithIndex) stay on UnsafeRows instead of round-tripping through
    * external Row boxing. */
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
