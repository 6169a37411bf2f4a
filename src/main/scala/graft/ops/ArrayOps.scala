package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Array / higher-order-function surface over the embedding table: the
  * lambda-function family (`transform`, `filter`, `aggregate`, `zip_with`)
  * plus ordered array ops (`array_sort`, `array_min/max`) and positional
  * un-nesting (`posexplode`).
  *
  * Parity rules with the DuckDB oracle (list lambdas): every float is cast
  * to double BEFORE arithmetic on BOTH engines, and every fold is
  * left-to-right with a zero/first-element seed — `aggregate(e, 0.0d, +)`
  * and DuckDB `list_reduce` produce bit-identical doubles because
  * `0.0 + x1 == x1` exactly. All lambdas run inside whole-stage codegen:
  * no UDFs, no shuffle except the final per-dimension group-by.
  */
object ArrayOps {

  // ---------- higher-order functions (transform/filter/aggregate/zip_with) ----------
  /** Per-vector scalar features computed entirely with array lambdas: the
    * positive-component count, the L2 norm (fold of squares), the dot
    * product with the reversed vector (`zip_with` + fold), the 33rd
    * order statistic (`array_sort`), and the value spread. Scan-side,
    * shuffle-free, embarrassingly parallel at any scale.
    */
  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr("size(filter(embedding, x -> x > 0))").as("n_pos"),
        expr("""round(sqrt(aggregate(embedding, cast(0.0 as double),
            (a, x) -> a + cast(x as double) * cast(x as double))), 6)""").as("l2_norm"),
        expr("""round(aggregate(zip_with(embedding, reverse(embedding),
            (x, y) -> cast(x as double) * cast(y as double)),
            cast(0.0 as double), (a, x) -> a + x), 6)""").as("rev_dot"),
        expr("round(cast(element_at(array_sort(embedding), 33) as double), 6)")
          .as("median_lo"),
        expr("""round(cast(array_max(embedding) as double)
            - cast(array_min(embedding) as double), 6)""").as("spread"))
      .orderBy(col("vec_id"))

  val qArrayFuncsOracle: String =
    """SELECT vec_id,
      len(list_filter(embedding, x -> x > 0)) AS n_pos,
      round(sqrt(list_reduce(list_transform(embedding,
        x -> x::DOUBLE * x::DOUBLE), (a, b) -> a + b)), 6) AS l2_norm,
      round(list_reduce([embedding[i]::DOUBLE
          * embedding[len(embedding) + 1 - i]::DOUBLE
          for i in range(1, len(embedding) + 1)], (a, b) -> a + b), 6) AS rev_dot,
      round(list_sort(embedding)[33]::DOUBLE, 6) AS median_lo,
      round(list_max(embedding)::DOUBLE - list_min(embedding)::DOUBLE, 6) AS spread
      FROM embeddings ORDER BY vec_id"""

  // ---------- positional un-nesting (posexplode ↔ unnest WITH ORDINALITY) ----------
  /** Per-dimension corpus statistics via `posexplode`: each vector emits
    * (position, value), aggregated per position. The generator is
    * codegen'd; the only shuffle is the 64-group aggregate (partial
    * map-side combine carries 64 rows per task regardless of corpus
    * size — the 100 TB shape for feature-wise statistics).
    */
  def qUnnestOrdinal(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("v").cast("double")), 5).as("avg_v"),
        round(max(col("v")).cast("double"), 6).as("max_v"),
        round(min(col("v")).cast("double"), 6).as("min_v"))
      .orderBy(col("pos"))

  val qUnnestOrdinalOracle: String =
    """SELECT pos, count(*) AS n,
      round(avg(v::DOUBLE), 5) AS avg_v,
      round(max(v)::DOUBLE, 6) AS max_v,
      round(min(v)::DOUBLE, 6) AS min_v
      FROM (SELECT (generate_subscripts(embedding, 1) - 1)::INT AS pos,
        unnest(embedding) AS v FROM embeddings) t
      GROUP BY pos ORDER BY pos"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_array_funcs" -> (qArrayFuncs _),
    "q_unnest_ordinal" -> (qUnnestOrdinal _),
  )

  val oracles: Map[String, String] = Map(
    "q_array_funcs" -> qArrayFuncsOracle,
    "q_unnest_ordinal" -> qUnnestOrdinalOracle,
  )
}
