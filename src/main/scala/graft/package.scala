package object graft {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.col

  /** `$"name"` column interpolator, usable without a SparkSession's
    * implicits in scope (queries here are session-agnostic). */
  implicit class ColumnInterpolator(private val sc: StringContext)
      extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
