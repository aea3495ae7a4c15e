package graft.cli

import java.io.{BufferedReader, PrintStream}
import org.apache.spark.sql.SparkSession
import graft.table.TsTable

/** Interactive shell — the Spark rebuild of the reference CLI shell
  * (timeseries-table-cli/src/shell.rs:401-480 meta-command dispatch,
  * :727-1004 quote/comment-aware statement handling): dot meta-commands
  * plus multi-line SQL statements terminated by an unquoted `;`. Opened
  * tables register as temp views, so plain SQL resolves them by name (the
  * Spark-native equivalent of the reference's alias rewrite).
  *
  * Driven through (in, out) streams so tests can script it; `graft.cli.Main
  * shell` wires it to stdin/stdout.
  */
object Shell {

  private final case class State(
      var tables: Map[String, TsTable] = Map.empty,
      var timing: Boolean = false,
      var maxRows: Int = 20,
      var done: Boolean = false)

  def repl(spark: SparkSession, in: BufferedReader, out: PrintStream,
           preload: Map[String, String] = Map.empty): Unit = {
    val st = State()
    preload.foreach { case (name, root) => openTable(spark, st, out, root, Some(name)) }
    val sqlBuf = new StringBuilder
    out.println("graft shell — .help for commands, SQL statements end with ';'")
    var line = in.readLine()
    while (line != null && !st.done) {
      if (sqlBuf.toString.trim.isEmpty && line.trim.startsWith(".")) {
        sqlBuf.clear() // drop inter-statement whitespace remainder
        // a typo (.at t abc, expired version, …) must not kill the REPL
        try meta(spark, st, out, line.trim)
        catch { case e: Exception => out.println(s"error: ${e.getMessage}") }
      } else {
        sqlBuf.append(line).append('\n')
        // execute every complete (unquoted-;-terminated) statement
        var (stmt, rest) = splitFirstStatement(sqlBuf.toString)
        while (stmt.isDefined) {
          runSql(spark, st, out, stmt.get)
          sqlBuf.clear(); sqlBuf.append(rest)
          val n = splitFirstStatement(sqlBuf.toString); stmt = n._1; rest = n._2
        }
      }
      line = if (st.done) null else in.readLine()
    }
  }

  private def meta(spark: SparkSession, st: State, out: PrintStream, cmd: String): Unit = {
    val parts = cmd.split("\\s+").toSeq
    parts.head match {
      case ".help" => out.println(
        """.open ROOT [AS name]   register a graft table as a view
          |.tables                list registered tables (name, root, version)
          |.schema NAME           show a table's schema
          |.version NAME          show a table's current version
          |.at NAME VERSION       re-register NAME pinned at VERSION (time travel)
          |.refresh NAME          re-register NAME at latest version
          |.timing on|off         print statement wall time
          |.maxrows N             rows shown per statement (default 20)
          |.quit / .exit          leave""".stripMargin)
      case ".open" => parts.tail match {
        case Seq(root) => openTable(spark, st, out, root, None)
        case Seq(root, as, name) if as.equalsIgnoreCase("as") => openTable(spark, st, out, root, Some(name))
        case _ => out.println("usage: .open ROOT [AS name]")
      }
      case ".tables" =>
        if (st.tables.isEmpty) out.println("(none)")
        else st.tables.toSeq.sortBy(_._1).foreach { case (n, t) =>
          out.println(s"$n\t${t.root}\tv${t.version}") }
      case ".schema" => withTable(st, out, parts) { (n, t) =>
        out.println(t.scan(spark).schema.treeString) }
      case ".version" => withTable(st, out, parts) { (n, t) => out.println(s"v${t.version}") }
      case ".at" => parts.tail match {
        case Seq(name, v) if st.tables.contains(name) =>
          st.tables(name).scanAt(spark, v.toLong).createOrReplaceTempView(name)
          out.println(s"$name pinned at v$v")
        case _ => out.println("usage: .at NAME VERSION (open it first)")
      }
      case ".refresh" => withTable(st, out, parts) { (n, t) =>
        t.refresh(); t.scan(spark).createOrReplaceTempView(n); out.println(s"$n at v${t.version}") }
      case ".timing" => parts.tail match {
        case Seq("on")  => st.timing = true;  out.println("timing on")
        case Seq("off") => st.timing = false; out.println("timing off")
        case _ => out.println("usage: .timing on|off")
      }
      case ".maxrows" => parts.tail match {
        case Seq(n) if n.forall(_.isDigit) && n.nonEmpty => st.maxRows = n.toInt; out.println(s"maxrows $n")
        case _ => out.println("usage: .maxrows N")
      }
      case ".quit" | ".exit" => st.done = true
      case other => out.println(s"unknown meta-command '$other' (.help)")
    }
  }

  private def withTable(st: State, out: PrintStream, parts: Seq[String])
                       (f: (String, TsTable) => Unit): Unit = parts.tail match {
    case Seq(name) if st.tables.contains(name) => f(name, st.tables(name))
    case Seq(name) => out.println(s"no such table '$name' (.tables)")
    case _ => out.println(s"usage: ${parts.head} NAME")
  }

  private def openTable(spark: SparkSession, st: State, out: PrintStream,
                        root: String, nameOpt: Option[String]): Unit =
    try {
      val name = nameOpt.getOrElse(
        java.nio.file.Paths.get(root).getFileName.toString.replaceAll("[^A-Za-z0-9_]", "_"))
      val t = TsTable.open(root)
      t.scan(spark).createOrReplaceTempView(name)
      st.tables += name -> t
      out.println(s"opened $root as $name (v${t.version})")
    } catch { case e: Exception => out.println(s"error: ${e.getMessage}") }

  private def runSql(spark: SparkSession, st: State, out: PrintStream, sql: String): Unit = {
    if (sql.trim.isEmpty) return
    val t0 = System.nanoTime()
    try {
      val df = spark.sql(sql)
      // showString is what df.show prints; capture it for our own stream
      out.print(org.apache.spark.sql.graft.Bridge.showString(df, st.maxRows, truncate = 0))
      if (st.timing) out.println(f"time: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    } catch { case e: Exception =>
      out.println(s"error: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
    }
  }

  /** Split off the first statement at an unquoted, uncommented `;`.
    * Returns (Some(statement-without-;), remainder) or (None, input). Same
    * scanner states as Main.rewritePositional (the reference's tokenizer,
    * shell.rs:401-480). */
  private[graft] def splitFirstStatement(text: String): (Option[String], String) = {
    var i = 0
    var state: Char = ' '
    while (i < text.length) {
      val c = text.charAt(i)
      state match {
        case ' ' =>
          if (c == '\'') state = '\''
          else if (c == '"') state = '"'
          else if (c == '-' && i + 1 < text.length && text.charAt(i + 1) == '-') state = '-'
          else if (c == '/' && i + 1 < text.length && text.charAt(i + 1) == '*') { state = '*'; i += 1 }
          else if (c == ';') return (Some(text.substring(0, i)), text.substring(i + 1))
        case '\'' => if (c == '\'') state = ' '
        case '"'  => if (c == '"') state = ' '
        case '-'  => if (c == '\n') state = ' '
        case '*'  => if (c == '*' && i + 1 < text.length && text.charAt(i + 1) == '/') { state = ' '; i += 1 }
      }
      i += 1
    }
    (None, text)
  }
}
