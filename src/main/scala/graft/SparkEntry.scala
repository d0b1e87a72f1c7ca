package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory backing `queries`, §5 for the determinism conventions that
  * make every query hash-match its DuckDB oracle.
  */
object SparkEntry {

  /** All operator modules, in SURVEY §2 order. */
  private def moduleDefs: Seq[(String, Q)] =
    operators.Relational.defs ++
      operators.TimeSeries.defs ++
      operators.Geo.defs ++
      operators.TextOps.defs ++
      operators.Similarity.defs ++
      operators.Multimodal.defs

  /** Round-7 stage-bisection diagnostics for the five driver-red queries
    * (see operators/Diag.scala — temporary, excluded from Bench, retired
    * once the reds turn green; replaces round 6's byte-identical `*2`
    * twins, whose experiment concluded: both twins and originals red, so
    * per-name caching is refuted and the divergence is stage-localizable).
    */
  private def allDefs: Seq[(String, Q)] = moduleDefs ++ operators.Diag.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (n, q) => n -> q.build }.toMap

  /** DuckDB-equivalent SQL for every SQL-expressible query. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (n, q) if q.oracle.isDefined =>
      n -> q.oracle.get.trim.stripMargin
    }.toMap

  /** Headline subset for Bench. */
  def benchQueries: Seq[String] =
    allDefs.collect { case (n, q) if q.bench => n }

  /** Gate-only diagnostic ids (never timed or counted by Bench). */
  def diagNames: Set[String] = operators.Diag.defs.map(_._1).toSet
}
