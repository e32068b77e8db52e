package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling summary — see [[Profile.profile]]. */
object Profile {

  /** Single-pass column profiling — the data-quality summary every
    * ingestion pipeline runs before training (completeness, cardinality,
    * numeric ranges). One aggregation job over the table (the exact
    * distinct counts expand into one shuffle via Spark's Expand, still a
    * single pass over the scan), then a constant-size unpivot to one row
    * per profiled column. min/max are emitted as DOUBLE for numeric
    * columns and NULL otherwise — never strings, whose number formatting
    * diverges across engines. */
  def profile(df: DataFrame, columns: Seq[String],
              numeric: Set[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c")) ++
        (if (numeric(c))
          Seq(min(col(c).cast("double")).as(s"__mn_$c"),
            max(col(c).cast("double")).as(s"__mx_$c"))
        else Nil)
    }
    val total = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = columns.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        (if (numeric(c)) col(s"__mn_$c") else lit(null).cast("double"))
          .as("min_value"),
        (if (numeric(c)) col(s"__mx_$c") else lit(null).cast("double"))
          .as("max_value"))
    }
    total.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
