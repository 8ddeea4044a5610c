package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling and constraint validation — the deequ/Glue-style
  * quality layer a pipeline runs before trusting an ingest batch.
  *
  * Scale shape: both operators are ONE aggregate pass over the table
  * (multiple distinct-aggregates plan as a single Expand + aggregate;
  * map-side partials shrink the shuffle to one row), then a constant-
  * size explode into the long-format report — profiling a 100 TB
  * table costs one scan, never one scan per column.
  */
object Profiling {

  /** Long-format column profile: per column, row count, null count,
    * exact distinct count, and min/max rendered as strings (one
    * report schema across column types). Callers pick columns whose
    * string rendering is engine-stable (integers, strings, dates);
    * floating-point columns belong in a numeric profile, not a
    * string-rendered one.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"),
          countDistinct(col(c)).as(s"_nd_$c"),
          min(col(c)).cast("string").as(s"_mn_$c"),
          max(col(c)).cast("string").as(s"_mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("_n"), aggs: _*)
    row
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"),
               col("_n").as("n_rows"),
               (col("_n") - col(s"_nn_$c")).as("n_nulls"),
               col(s"_nd_$c").as("n_distinct"),
               col(s"_mn_$c").as("min_s"),
               col(s"_mx_$c").as("max_s"))): _*)).as("p"))
      .select(col("p.*"))
  }

  /** Constraint validation: each constraint is a named BOOLEAN
    * AGGREGATE expression over the table (completeness, uniqueness,
    * bounds, domain membership); output is one (check_name, passed)
    * row per constraint. All constraints evaluate in the same single
    * aggregate pass.
    */
  def checkConstraints(df: DataFrame,
                       constraints: Seq[(String, Column)]): DataFrame = {
    require(constraints.nonEmpty, "checkConstraints needs at least one constraint")
    val aggs = constraints.zipWithIndex.map { case ((_, c), i) => c.as(s"_c$i") }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(constraints.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("check_name"), col(s"_c$i").as("passed"))
      }: _*)).as("k"))
      .select(col("k.*"))
  }
}
