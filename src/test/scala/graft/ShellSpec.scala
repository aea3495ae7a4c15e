package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import graft.cli.Shell
import graft.data.TokenGen
import graft.meta._
import graft.table.TsTable

/** Interactive shell driven by scripted input: meta-commands, statement
  * splitting at unquoted semicolons, time travel, timing. */
class ShellSpec extends SparkFunSuite {

  private def drive(script: String, preload: Map[String, String] = Map.empty): String = {
    val out = new ByteArrayOutputStream()
    Shell.repl(spark, new BufferedReader(new StringReader(script)),
      new PrintStream(out, true, "UTF-8"), preload)
    out.toString("UTF-8")
  }

  test("statement splitter: semicolons in strings/comments don't terminate") {
    assert(Shell.splitFirstStatement("SELECT 1;rest") == (Some("SELECT 1"), "rest"))
    assert(Shell.splitFirstStatement("SELECT ';' ")._1.isEmpty)
    assert(Shell.splitFirstStatement("SELECT 1 -- ;\n")._1.isEmpty)
    assert(Shell.splitFirstStatement("SELECT /* ; */ 1")._1.isEmpty)
    assert(Shell.splitFirstStatement("SELECT /* ; */ 1;")._1.contains("SELECT /* ; */ 1"))
    // backslash-escaped quote inside a string (Spark's default lexer honors
    // \'): the ; stays inside the literal, the statement splits after it
    assert(Shell.splitFirstStatement("SELECT 'it\\'s; fine' AS x; rest") ==
      (Some("SELECT 'it\\'s; fine' AS x"), " rest"))
    // backtick identifiers can contain ';'
    assert(Shell.splitFirstStatement("SELECT `a;b` FROM t")._1.isEmpty)
    assert(Shell.splitFirstStatement("SELECT `a;b` FROM t;")._1.contains("SELECT `a;b` FROM t"))
  }

  test("shell: open, query across lines, .at time travel, timing, quit") {
    val root = tmpDir("shell-tbl")
    val t = TsTable.create(root, TableMeta("tokens",
      TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None))
    t.append(TokenGen.generate(spark, 100))
    val v1 = t.version
    t.append(TokenGen.generate(spark, 50, idStart = 5000))

    val script =
      s""".open $root AS tok
         |.tables
         |.version tok
         |.timing on
         |SELECT count(*) AS n
         |FROM tok;
         |.at tok $v1
         |SELECT count(*) AS n FROM tok;
         |.refresh tok
         |SELECT count(*) AS n FROM tok WHERE doc_id = 'doc-; not a real id';
         |.maxrows 3
         |.history tok
         |.quit
         |""".stripMargin
    val out = drive(script)
    assert(out.contains(s"opened $root as tok"))
    assert(out.contains("tok\t"), s"missing .tables output in:\n$out")
    assert(out.contains("150"), s"full count missing:\n$out") // both appends
    assert(out.contains(s"tok pinned at v$v1"))
    assert(out.contains("100"), s"time-travel count missing:\n$out")
    assert(out.contains("time: "), "timing line missing")
    assert(out.contains("maxrows 3"))
    assert(out.contains("APPEND") && out.contains("operation"),
      s".history output missing:\n$out")
  }

  test("shell: errors are reported, not fatal; unknown meta-command handled") {
    val out = drive(
      """.nope
        |SELECT definitely_not_a_column FROM missing_table;
        |.quit
        |""".stripMargin)
    assert(out.contains("unknown meta-command"))
    assert(out.contains("error:"))
  }

  test("shell: malformed meta-command arguments don't kill the REPL") {
    val root = tmpDir("shell-bad")
    val t = TsTable.create(root, TableMeta("tokens",
      TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None))
    t.append(TokenGen.generate(spark, 10))
    val out = drive(
      s""".open $root AS tok
         |.at tok notanumber
         |.maxrows 99999999999
         |.tables
         |.quit
         |""".stripMargin)
    assert(out.contains("error:") || out.contains("usage:"), s"no error surfaced:\n$out")
    assert(out.contains("tok\t"), s"REPL died before .tables:\n$out")
  }

  test("alias rewrite: quote-aware, backtick-aware, exact-identifier only") {
    import Shell.rewriteSqlAlias
    assert(rewriteSqlAlias("SELECT * FROM seqs", "seqs", "tok") == "SELECT * FROM tok")
    // substring identifiers stay untouched
    assert(rewriteSqlAlias("SELECT seqs2, aseqs FROM seqs", "seqs", "tok") ==
      "SELECT seqs2, aseqs FROM tok")
    // single-quoted strings and comments pass through
    assert(rewriteSqlAlias("SELECT 'seqs' FROM seqs -- seqs\n", "seqs", "tok") ==
      "SELECT 'seqs' FROM tok -- seqs\n")
    assert(rewriteSqlAlias("SELECT /* seqs */ 1 FROM seqs", "seqs", "tok") ==
      "SELECT /* seqs */ 1 FROM tok")
    // backtick identifier matches rewrite quoted; others untouched
    assert(rewriteSqlAlias("SELECT `seqs`.x FROM `seqs`", "seqs", "tok") ==
      "SELECT `tok`.x FROM `tok`")
    assert(rewriteSqlAlias("SELECT `seqs extra` FROM seqs", "seqs", "tok") ==
      "SELECT `seqs extra` FROM tok")
    // escaped backtick content compares unescaped
    assert(rewriteSqlAlias("SELECT * FROM `se``qs`", "se`qs", "x`y") ==
      "SELECT * FROM `x``y`")
    assert(Shell.isValidAlias("_a1") && !Shell.isValidAlias("1a") &&
      !Shell.isValidAlias("a-b") && !Shell.isValidAlias(""))
  }

  test("alias rewrite: table-reference positions only (columns, CTEs, args survive)") {
    import Shell.rewriteSqlAlias
    // a column that happens to share the alias name is NOT a table ref
    assert(rewriteSqlAlias("SELECT seqs FROM x", "seqs", "tok") ==
      "SELECT seqs FROM x")
    assert(rewriteSqlAlias("SELECT f(seqs) FROM x WHERE seqs > 1", "seqs", "tok") ==
      "SELECT f(seqs) FROM x WHERE seqs > 1")
    // AS-aliases and ORDER/GROUP references survive
    assert(rewriteSqlAlias("SELECT a AS seqs FROM x ORDER BY seqs", "seqs", "tok") ==
      "SELECT a AS seqs FROM x ORDER BY seqs")
    // a CTE shadowing the alias pins the name to the CTE everywhere
    assert(rewriteSqlAlias("WITH seqs AS (SELECT 1 AS a) SELECT * FROM seqs", "seqs", "tok") ==
      "WITH seqs AS (SELECT 1 AS a) SELECT * FROM seqs")
    // from-list comma and JOIN are table positions; function-arg commas are not
    assert(rewriteSqlAlias("SELECT * FROM x, seqs", "seqs", "tok") ==
      "SELECT * FROM x, tok")
    assert(rewriteSqlAlias("SELECT * FROM x JOIN seqs ON x.id = seqs.id", "seqs", "tok") ==
      "SELECT * FROM x JOIN tok ON x.id = tok.id")
    assert(rewriteSqlAlias("SELECT coalesce(a, seqs) FROM x, seqs", "seqs", "tok") ==
      "SELECT coalesce(a, seqs) FROM x, tok")
    // qualified-name heads rewrite; qualified TAILS never do
    assert(rewriteSqlAlias("SELECT seqs.x, t.seqs FROM seqs", "seqs", "tok") ==
      "SELECT tok.x, t.seqs FROM tok")
    // comments between keyword and table name are transparent
    assert(rewriteSqlAlias("SELECT * FROM /* c */ seqs", "seqs", "tok") ==
      "SELECT * FROM /* c */ tok")
    assert(rewriteSqlAlias("INSERT INTO seqs SELECT * FROM seqs", "seqs", "tok") ==
      "INSERT INTO tok SELECT * FROM tok")
    // a scalar subquery's inner FROM must not leak from-list state into the
    // enclosing SELECT list; a subquery in the from list still rewrites
    assert(rewriteSqlAlias("SELECT (SELECT 1 FROM t), seqs FROM x", "seqs", "tok") ==
      "SELECT (SELECT 1 FROM t), seqs FROM x")
    assert(rewriteSqlAlias("SELECT * FROM (SELECT 1 FROM seqs) a, seqs", "seqs", "tok") ==
      "SELECT * FROM (SELECT 1 FROM tok) a, tok")
    // a correlation alias shadows the name everywhere (head included)
    assert(rewriteSqlAlias("SELECT seqs.a FROM events seqs", "seqs", "tok") ==
      "SELECT seqs.a FROM events seqs")
    assert(rewriteSqlAlias("SELECT seqs.a FROM events AS seqs", "seqs", "tok") ==
      "SELECT seqs.a FROM events AS seqs")
    // a struct column's qualified head is not a table ref (no FROM seqs here)
    assert(rewriteSqlAlias("SELECT seqs.field FROM t", "seqs", "tok") ==
      "SELECT seqs.field FROM t")
    // CTE column-list form and case-insensitive CTE names both shadow
    assert(rewriteSqlAlias("WITH seqs(a) AS (SELECT 1) SELECT a FROM seqs", "seqs", "tok") ==
      "WITH seqs(a) AS (SELECT 1) SELECT a FROM seqs")
    assert(rewriteSqlAlias("WITH SEQS AS (SELECT 1 AS a) SELECT * FROM seqs", "seqs", "tok") ==
      "WITH SEQS AS (SELECT 1 AS a) SELECT * FROM seqs")
    // relation list resumes after a JOIN condition
    assert(rewriteSqlAlias("SELECT * FROM a JOIN b ON a.id = b.id, seqs", "seqs", "tok") ==
      "SELECT * FROM a JOIN b ON a.id = b.id, tok")
    // MERGE INTO t USING <alias> is a table-ref position…
    assert(rewriteSqlAlias("MERGE INTO dst USING seqs ON dst.id = seqs.id " +
      "WHEN MATCHED THEN UPDATE SET *", "seqs", "tok") ==
      "MERGE INTO dst USING tok ON dst.id = tok.id WHEN MATCHED THEN UPDATE SET *")
    // …while a join's USING (cols) column list is never rewritten
    assert(rewriteSqlAlias("SELECT * FROM a JOIN b USING (seqs), seqs", "seqs", "tok") ==
      "SELECT * FROM a JOIN b USING (seqs), tok")
    // correlation-alias shadowing is SCOPE-LOCAL: the inner subquery's
    // alias must not suppress the outer table reference
    assert(rewriteSqlAlias(
      "SELECT * FROM seqs WHERE x IN (SELECT 1 FROM events seqs)", "seqs", "tok") ==
      "SELECT * FROM tok WHERE x IN (SELECT 1 FROM events seqs)")
    // a nested WITH inside a CTE body must not clear the outer clause's
    // tracking — the sibling CTE after it still shadows
    assert(rewriteSqlAlias(
      "WITH a AS (WITH b AS (SELECT 1) SELECT * FROM b), seqs AS (SELECT 2) SELECT * FROM seqs",
      "seqs", "tok") ==
      "WITH a AS (WITH b AS (SELECT 1) SELECT * FROM b), seqs AS (SELECT 2) SELECT * FROM seqs")
  }

  test("shell: .alias rewrites queries, .unalias drops, invalid names rejected") {
    val root = tmpDir("shell-alias")
    val t = TsTable.create(root, TableMeta("tokens",
      TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None))
    t.append(TokenGen.generate(spark, 25))
    val out = drive(
      s""".open $root AS tok
         |.alias seqs
         |SELECT count(*) AS n FROM seqs;
         |.alias
         |.alias 9bad
         |.unalias seqs
         |SELECT count(*) AS n FROM seqs;
         |.quit
         |""".stripMargin)
    assert(out.contains("alias: seqs -> tok"), s"alias not set:\n$out")
    assert(out.contains("25"), s"aliased query did not run:\n$out")
    assert(out.contains("must match"), s"invalid alias accepted:\n$out")
    assert(out.contains("alias 'seqs' dropped"), out)
    // after unalias the name no longer resolves
    assert(out.contains("TABLE_OR_VIEW_NOT_FOUND") || out.contains("error:"), out)
  }

  test("shell: .pager pipes output through the pager, falls back on spawn failure") {
    val root = tmpDir("shell-pager")
    val t = TsTable.create(root, TableMeta("tokens",
      TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None))
    t.append(TokenGen.generate(spark, 7))
    val sink = tmpDir("shell-pager-sink") + "/paged.txt"
    // pager = shell redirect: proves the rendered table went through the
    // external process's stdin, not the shell's own stream
    val outOk = {
      val bytes = new ByteArrayOutputStream()
      Shell.repl(spark, new BufferedReader(new StringReader(
        s""".open $root AS tok
           |.pager on
           |SELECT count(*) AS n FROM tok;
           |.quit
           |""".stripMargin)),
        new PrintStream(bytes, true, "UTF-8"), Map.empty,
        pagerCmd = Seq("/bin/sh", "-c", s"cat > $sink"))
      bytes.toString("UTF-8")
    }
    assert(outOk.contains("pager on"))
    val paged = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(sink)), "UTF-8")
    assert(paged.contains("7"), s"pager did not receive the rendered table:\n$paged")
    assert(!outOk.contains("| 7 "), s"output bypassed the pager:\n$outOk")

    // nonexistent pager binary: warn + fall back to printing
    val outFb = {
      val bytes = new ByteArrayOutputStream()
      Shell.repl(spark, new BufferedReader(new StringReader(
        s""".open $root AS tok
           |.pager on
           |SELECT count(*) AS n FROM tok;
           |.quit
           |""".stripMargin)),
        new PrintStream(bytes, true, "UTF-8"), Map.empty,
        pagerCmd = Seq("/nonexistent-pager-binary"))
      bytes.toString("UTF-8")
    }
    assert(outFb.contains("warning: failed to launch pager"), outFb)
    assert(outFb.contains("7"), s"fallback lost the output:\n$outFb")
  }

  test("shell: .append lands a parquet file transactionally; .clear abandons a partial statement") {
    val root = tmpDir("shell-append")
    val t = TsTable.create(root, TableMeta("tokens",
      TableKind.Clustered(ClusterSpec(Seq("source", "n_tok", "doc_id"), "zorder")), None, None))
    t.append(TokenGen.generate(spark, 10).coalesce(1))
    // external parquet to append through the shell
    val ext = tmpDir("shell-append-src")
    TokenGen.generate(spark, 5, idStart = 900).coalesce(1).write.mode("overwrite").parquet(ext)
    val file = java.nio.file.Files.list(java.nio.file.Paths.get(ext))
      .filter(_.toString.endsWith(".parquet")).findFirst().get().toString
    val out = drive(
      s""".open $root AS tok
         |SELECT count(*) AS broken_statement
         |.clear
         |.append tok $file
         |SELECT count(*) AS n FROM tok;
         |.quit
         |""".stripMargin)
    assert(out.contains("buffer cleared"), s"mid-statement .clear not honored:\n$out")
    assert(out.contains("to tok -> v"), s".append did not commit:\n$out")
    assert(out.contains("15"), s"appended rows not visible:\n$out")
  }

  test("streaming appId: scheme URIs are cwd-independent, local paths canonicalize") {
    import graft.streaming.StreamingIngest.appId
    assert(appId("s3a://bucket/ck/") == "stream:s3a://bucket/ck")
    assert(appId("hdfs://nn:8020/ck") == "stream:hdfs://nn:8020/ck")
    assert(appId("/tmp/x/../y") == "stream:/tmp/y")
    // every spelling of the same local checkpoint is ONE application —
    // a restart with file:// vs bare path must hit the same txn watermark
    assert(appId("file:/tmp/ck") == "stream:/tmp/ck")
    assert(appId("file:///tmp/ck") == "stream:/tmp/ck")
    assert(appId("file:///tmp/ck") == appId("/tmp/ck"))
  }
}
