package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a named DataFrame query over the
  * fixture tables plus (when SQL-expressible) a DuckDB oracle twin.
  *
  * The `fn` is the engine surface a user calls; `oracle` is only the
  * correctness gate (driver runs it in DuckDB at sf0.01 and
  * hash-compares). Column names and row ordering are pinned identical
  * on both sides — see SURVEY.md §5.
  */
final case class GraftQuery(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Central registry: every operator from SURVEY.md §2 plus the
  * LLM-data-pipeline extension surface (dedup / similarity / text).
  */
object Registry {
  lazy val all: Seq[GraftQuery] =
    queries.Relational.queries ++
      queries.Relational.queriesSnapshot ++
      queries.Relational.queriesApprox ++
      queries.EventOps.queries ++
      queries.TextOps.queries ++
      queries.VectorOps.queries ++
      queries.VectorOps.queriesRound13 ++
      queries.MultimodalOps.queries ++
      queries.MultimodalOps.queriesRound9 ++
      queries.RecoOps.queries

  def byName(n: String): GraftQuery =
    all.find(_.name == n).getOrElse(throw new NoSuchElementException(n))
}
