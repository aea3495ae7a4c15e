package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for the native kernels, so every engine function is
  * reachable from plain SQL (and therefore the CLI/shell), not just the
  * Scala API:
  *
  *   SELECT simhash64(text), minhash_signature(text, 5, 64) FROM docs
  *
  * Two entry points, same registry entries:
  *  - `GraftExtensions` for session construction
  *    (`spark.sql.extensions=graft.functions.GraftExtensions`) — the
  *    standard SparkSessionExtensions hook;
  *  - `GraftFunctions.register(spark)` for an already-built session
  *    (tests, notebooks, the shell).
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, usage, builder) for every SQL-exposed kernel. */
  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("simhash64", "simhash64(text) — 64-bit SimHash over whitespace tokens",
      { case Seq(t) => SimHash64(t) }),
    ("minhash_signature",
      "minhash_signature(text, shingleSize, numHashes) — MinHash signature array",
      { case Seq(t, s, n) =>
        MinHashSignature(t, intLit(s, "shingleSize"), intLit(n, "numHashes")) }),
    ("shingle_hashes",
      "shingle_hashes(text, shingleSize) — distinct hashed character shingles",
      { case Seq(t, s) => ShingleHashes(t, intLit(s, "shingleSize")) }),
    ("dot_product", "dot_product(a, b) — dot product of two array<double>",
      { case Seq(a, b) => DotProduct(a, b) }),
    ("probe_blocks",
      "probe_blocks(vec, planes, probes) — multi-probe hyperplane-LSH block keys",
      { case Seq(v, p, q) => ProbeBlocks(v, intLit(p, "planes"), intLit(q, "probes")) }),
    ("date_bin",
      "date_bin(stride, ts, origin) — start of the stride-aligned bin (anchored at origin) containing ts",
      { case Seq(s, t, o) => DateBin(s, t, o) }),
    ("tok_sum",
      "tok_sum(tokens) — BIGINT sum of an array<int>, codegen'd (HOF-aggregate semantics)",
      { case Seq(a) => TokSum(a) }))

  private def entries = functions.map { case (name, usage, builder) =>
    val checked: Seq[Expression] => Expression = exprs =>
      try builder(exprs)
      catch { case _: MatchError => throw new IllegalArgumentException(
        s"wrong argument count for $name; usage: $usage") }
    (FunctionIdentifier(name), new ExpressionInfo("graft.functions.GraftFunctions", name), checked)
  }

  /** Add the functions to an existing session's registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    entries.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }

  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    entries.foreach(ext.injectFunction)
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
