package graft.maintain

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
import org.apache.spark.sql.functions._
import graft.scan.StatsPruning
import graft.table.TsTable

/** DELETE WHERE — copy-on-write predicate delete, the training-data
  * governance operator (redact contaminated documents, strip a source,
  * drop a time range). Not in the reference (its log is append-only);
  * north-rule addition alongside compaction/MERGE/expire.
  *
  * Plan shape at scale:
  *  1. Candidate files via the same 3-valued stats evaluation the scan
  *     uses: a file whose stats prove AlwaysFalse for the predicate
  *     cannot hold a matching row and is left untouched (its bytes and
  *     segment id never change). Conservative by construction — padded/
  *     widened transform rewrites only ever ADD candidates. AlwaysTrue is
  *     deliberately NOT used to drop whole files unread: the Tri algebra
  *     is necessary-condition-oriented under padded rewrites, so "all
  *     rows must match" cannot be concluded from it.
  *  2. Candidates are rewritten keeping `NOT coalesce(cond, false)` —
  *     SQL DELETE semantics: rows where the predicate is NULL are KEPT.
  *  3. One atomic Remove+Add commit (swapSegments — snapshot isolation,
  *     OCC rebase). A hit file whose match count equals its row count is
  *     dropped metadata-only (never read by the rewrite job); only
  *     partially-matched files are rewritten. A DELETE whose hits are all
  *     fully matched degenerates to a pure-Remove commit.
  *  4. Time-series tables get their table-coverage snapshot recomputed
  *     from the surviving segments' sidecars, so a later append into the
  *     deleted range is not falsely rejected as overlap.
  */
object DeleteWhere {

  final case class Report(candidates: Int, filesKept: Int, filesOut: Int,
                          rowsDeleted: Long, survivors: Long, version: Long,
                          filesDroppedMetaOnly: Int = 0)

  def delete(spark: SparkSession, table: TsTable, condition: Column): Report = {
    table.refresh()
    val live = table.state.liveSegments

    // resolve the user predicate against the table schema so stats
    // evaluation sees real AttributeReferences (an unresolved Column would
    // evaluate Unknown everywhere — sound, but pruning-free)
    val resolved: Seq[Expression] = {
      import org.apache.spark.sql.graft.Bridge
      val analyzed = table.scan(spark).where(condition).queryExecution.analyzed
      analyzed.collectFirst { case f: LFilter => f.condition }
        .map(splitConjuncts).getOrElse(Seq(Bridge.toExpr(condition)))
    }
    // DELETE evaluates the predicate in TWO independent jobs (per-file
    // match counts, then the rewrite) and drops whole files on the first
    // evaluation's word — a nondeterministic condition (rand(), now()-
    // derived exprs via the CLI's --where) could delete a row set no
    // single evaluation ever selected. Reject up front, like Delta-style
    // engines do.
    require(resolved.forall(_.deterministic),
      "DELETE WHERE requires a deterministic predicate; " +
        s"got: ${resolved.filterNot(_.deterministic).mkString(", ")}")

    val (candidates, untouched) = live.partition { seg =>
      // a file is a candidate unless SOME conjunct is provably false for
      // every row (conjunction semantics: one false conjunct kills it)
      !resolved.exists(c =>
        StatsPruning.eval(c, seg.stats, seg.rowCount) == StatsPruning.AlwaysFalse)
    }
    val totalRows = live.map(_.rowCount).sum
    if (candidates.isEmpty)
      return Report(0, live.size, 0, 0L, totalRows, table.version)

    val keep = !coalesce(condition, lit(false)) // NULL predicate -> keep
    val matchesCond = coalesce(condition, lit(false)) // rows that DELETE removes

    // per-file MATCH counts in one pass over the candidates: stats are
    // only necessary conditions, so a candidate can hold zero matching
    // rows — such files are never rewritten (their bytes and segment ids
    // survive), and a fully-no-op DELETE returns without committing.
    // Both sides of the attribution compare through PathNorm.canonical,
    // so trailing-slash or relative table roots line up with
    // input_file_name()'s URI form.
    import graft.meta.PathNorm
    val paths = candidates.map(seg => s"${table.root}/${seg.path}")
    val matchedPerFile: Map[String, Long] = spark.read.parquet(paths: _*)
      .where(matchesCond)
      .groupBy(input_file_name().as("f")).count()
      .collect().map(r => PathNorm.canonical(r.getString(0)) -> r.getLong(1)).toMap
    val rowsDeleted = matchedPerFile.values.sum
    if (rowsDeleted == 0L)
      return Report(candidates.size, live.size, 0, 0L, totalRows, table.version)

    var (hit, cleanCandidates) = candidates.partition(seg =>
      matchedPerFile.contains(PathNorm.canonical(s"${table.root}/${seg.path}")))
    // sanity net: every matched file must attribute to a candidate; if any
    // does not (exotic path scheme), fall back to rewriting ALL candidates
    // — sound, just less surgical
    val attributed = candidates
      .map(seg => PathNorm.canonical(s"${table.root}/${seg.path}")).toSet
    if (matchedPerFile.keys.exists(!attributed(_))) { hit = candidates; cleanCandidates = Nil }
    val removeIds = hit.map(_.segmentId)

    // per-file degenerate handling: a hit file whose match count equals
    // its row count has NO survivors — drop it metadata-only (one Remove
    // action) instead of pushing its bytes through the rewrite job. On a
    // curve-clustered table a range DELETE typically fully-matches a few
    // files and grazes the rest; rewriting only the grazed ones is the
    // difference between touching the deleted range and rewriting the
    // table (round-2 finding). Fully-matched and partially-matched files
    // still swap in ONE atomic commit (removeIds covers both).
    val (fullyMatched, partial) = hit.partition(seg =>
      // getOrElse: on the fallback path `hit` includes unattributed files
      // with no recorded matches — those must be rewritten, not dropped
      matchedPerFile.getOrElse(
        PathNorm.canonical(s"${table.root}/${seg.path}"), 0L) == seg.rowCount)

    // the coverage recommit (time-series tables) is part of the SAME
    // commit as the Remove/Add actions — no crash window can leave a
    // stale snapshot rejecting appends into the vacated range
    val repairCov = table.timeSpec.isDefined
    val newSegs: Seq[graft.meta.SegmentMeta] =
      if (partial.isEmpty) {
        table.commitRemovals(removeIds, recomputeCoverage = repairCov); Nil
      } else {
        val partialPaths = partial.map(seg => s"${table.root}/${seg.path}")
        table.swapSegments(spark.read.parquet(partialPaths: _*).where(keep), removeIds,
          recomputeCoverage = repairCov)
      }

    Report(candidates.size, untouched.size + cleanCandidates.size, newSegs.size,
      rowsDeleted, totalRows - rowsDeleted, table.version, fullyMatched.size)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
