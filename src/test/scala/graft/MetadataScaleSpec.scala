package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.log.{LogAction, TableState}
import graft.maintain.Compaction
import graft.meta._
import graft.scan.StatsPruning

/** Driver-side metadata costs at production file counts.
  *
  * At 100 TB with 128 MB data files a table holds ~10⁶ manifest entries,
  * and four driver-side paths are O(files): commit replay
  * (TableState.apply per action), checkpoint serialize/parse, compaction
  * planning (sort + greedy pack), and stats pruning (per-file predicate
  * evaluation in TsFileIndex.listFiles). None of them may touch the
  * data plane, and all of them must stay interactive — a planner that
  * takes minutes at 10⁵ files is a scale bug no sf-scale correctness
  * gate would catch. This spec synthesizes 200 000 segment entries
  * (metadata only, no files) and bounds each path.
  *
  * Bounds are ~10× the times measured on an idle host (replay ~0.2 s,
  * roundtrip ~2 s, plan ~0.3 s, prune ~0.6 s) so host noise cannot flake
  * the suite while a quadratic regression still fails it loudly.
  */
class MetadataScaleSpec extends AnyFunSuite {

  private val N = 200000

  private def seg(i: Int): SegmentMeta = {
    val lo = f"doc-${i.toLong * 1000}%012d"
    val hi = f"doc-${i.toLong * 1000 + 999}%012d"
    SegmentMeta(
      segmentId = f"seg-$i%08d",
      path = f"data/part-$i%08d.parquet",
      format = "parquet",
      rowCount = 3000L,
      // half "small" (below a 64 MB target) so plan() has real packing work
      fileSize = Some(if (i % 2 == 0) 8L * 1024 * 1024 else 64L * 1024 * 1024),
      stats = Map(
        "doc_id" -> ColStats(Some(StatVal.S(lo)), Some(StatVal.S(hi)), 0L),
        "n_tok" -> ColStats(Some(StatVal.L((i % 512).toLong)), Some(StatVal.L((i % 512 + 64).toLong)), 0L),
        "source" -> ColStats(Some(StatVal.S(s"src${i % 20}")), Some(StatVal.S(s"src${i % 20}")), 0L)),
      coveragePath = None)
  }

  private lazy val segs: Vector[SegmentMeta] = (0 until N).map(seg).toVector

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  test(s"commit replay applies $N AddSegment + 10k RemoveSegment in bounded driver time") {
    val ((state, removed), sec) = timed {
      var st = TableState.empty
      segs.foreach(s => st = st.apply(LogAction.AddSegment(s)))
      val victims = (0 until 10000).map(i => segs(i * (N / 10000)).segmentId)
      victims.foreach(id => st = st.apply(LogAction.RemoveSegment(id)))
      (st, victims.size)
    }
    info(f"replay of ${N + removed} actions: $sec%.2f s")
    assert(state.segments.size == N - removed)
    assert(sec < 10.0, f"replay took $sec%.1f s for ${N + removed} actions — superlinear?")
  }

  test(s"checkpoint JSON roundtrip of $N segments stays interactive") {
    val full = segs.foldLeft(TableState.empty)((st, s) => st.apply(LogAction.AddSegment(s)))
      .copy(version = 12345L)
    val (json, serSec) = timed(full.toJson.toString)
    val (back, parseSec) = timed(TableState.fromJson(Json.parse(json)))
    info(f"serialize: $serSec%.2f s (${json.length / 1024 / 1024} MB), parse: $parseSec%.2f s")
    assert(back.version == 12345L)
    assert(back.segments.size == N)
    assert(back.segments("seg-00000007") == segs(7))
    assert(serSec < 20.0 && parseSec < 20.0,
      f"checkpoint roundtrip $serSec%.1f/$parseSec%.1f s at $N files — superlinear?")
  }

  test(s"compaction planning over $N segments is sub-second-scale driver arithmetic") {
    val (bins, sec) = timed(Compaction.plan(segs, targetFileSize = 64L * 1024 * 1024))
    info(f"plan: $sec%.2f s, ${bins.size} bins over ${bins.map(_.segments.size).sum} inputs")
    // the 100k small files (8 MB each) pack into ≥ 2 bins under the
    // 64-file-group cap; none of the 64 MB files are selected
    assert(bins.nonEmpty)
    assert(bins.map(_.segments.size).sum == N / 2)
    val cap = 64L * 1024 * 1024 * 64
    bins.foreach(b => assert(b.bytes <= cap))
    assert(sec < 5.0, f"plan took $sec%.1f s at $N files — superlinear?")
  }

  test(s"row tracking: id allocation + range pruning over $N segments stay driver-cheap") {
    // the commit-time allocation walk (assignRowTracking's shape): one
    // linear pass assigning [hw, hw+rows) per add — bound it like replay
    val (hw, allocSec) = timed {
      var w = 0L
      segs.foreach { s => w += s.rowCount }
      w
    }
    assert(hw == N.toLong * 3000L)
    // scanRowIdRange's prune: interval intersection per file over a ~1%
    // id band (positional arm — stats arm is the same per-file O(1))
    val tracked = segs.zipWithIndex.map { case (s, i) =>
      s.copy(baseRowId = Some(i.toLong * 3000L), rowVersion = Some(7L)) }
    val lo = 1000L * 3000L
    val hi = 3000L * 3000L - 1L
    val (kept, pruneSec) = timed {
      tracked.count(s => s.baseRowId.exists(b => b <= hi && b + s.rowCount - 1 >= lo))
    }
    info(f"alloc walk: $allocSec%.3f s, id-range prune: $pruneSec%.3f s, kept $kept of $N")
    assert(kept == 2000)
    // the per-scan lookup map for the WHOLE table (worst case: a full
    // tracked scan) builds in bounded time too
    val (m, mapSec) = timed {
      tracked.map(s => s.path -> Array(s.baseRowId.get, s.rowVersion.get)).toMap
    }
    assert(m.size == N)
    info(f"lookup-map build: $mapSec%.3f s for $N files")
    assert(allocSec < 2.0 && pruneSec < 2.0 && mapSec < 5.0,
      f"row-tracking metadata pass superlinear? alloc=$allocSec%.1f prune=$pruneSec%.1f map=$mapSec%.1f")
  }

  test(s"stats pruning evaluates a predicate against $N files in bounded time, exact result") {
    val docId = AttributeReference("doc_id", StringType)()
    def slit(s: String) = Literal(UTF8String.fromString(s), StringType)
    // a ~1% doc_id band: files 1000..2999 (ids are 1000 docs per file)
    val pred = And(
      GreaterThanOrEqual(docId, slit(f"doc-${1000L * 1000}%012d")),
      LessThan(docId, slit(f"doc-${3000L * 1000}%012d")))
    val (kept, sec) = timed {
      segs.count(s => StatsPruning.eval(pred, s.stats, s.rowCount) != StatsPruning.AlwaysFalse)
    }
    info(f"prune pass: $sec%.2f s, kept $kept of $N")
    assert(kept == 2000) // exactly the band's files survive
    assert(sec < 5.0, f"prune pass took $sec%.1f s at $N files — superlinear?")
  }
}
