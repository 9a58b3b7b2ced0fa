package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column/Expression boundary.
  *
  * Spark 4 made `Column` wrap a `ColumnNode` and moved the
  * Expression<->Column conversions behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so a library defining
  * native Catalyst expressions needs one file in this package to expose
  * them — the standard extension-library pattern (frameless, sedona, delta
  * all ship an equivalent shim). This is the ONLY graft file outside the
  * graft package; everything else goes through these three members.
  */
object GraftSqlShim {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic sessions). */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Public alias for the `private[sql]` expected-input-type upper bound,
    * so graft expressions can declare `ExpectsInputTypes.inputTypes`.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
