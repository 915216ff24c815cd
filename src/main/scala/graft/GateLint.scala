package graft

import org.apache.spark.sql.types.{DecimalType, DoubleType, StructType}

/** Pre-gate fragility lint (VERDICT r14 task 2): the q145 (r13) and
  * q186 (r14) failures were the same class — a gated output column
  * whose cross-engine rendering is decimal/float-shape-fragile even
  * though VALUES match (round(double)→decimal rendering, and decimal
  * products at the precision-38 widening cap are both
  * engine-VERSION-dependent). This lint makes that class a build-time
  * error instead of a driver-gate surprise:
  *
  *  1. Every gated DOUBLE output column must be recorded in
  *     `tools/gate_double_allowlist.txt` — appending a line is the
  *     conscious act of asserting the column follows a proven-stable
  *     derivation (single IEEE division/multiply/sqrt of exact
  *     integers, order-free decimal sum + round(≤4)→double, or a
  *     per-row fixed-shape expression — the oracle-parity playbook
  *     forms). A new query's double fails here, pre-gate.
  *  2. Every gated DECIMAL output column needs an entry in
  *     [[decimalWaivers]] naming why its rendering is stable.
  *  3. Every oracle whose SQL touches the DECIMAL(38,·) widening cap
  *     needs an entry in [[oracleWideDecimalWaivers]] — products at
  *     precision 38 are exactly what diverged in r14.
  *
  * Runs in [[Verify]] (abort-before-dump, so a fragile query never
  * reaches the driver's DuckDB compare) and in GateLintSpec (so
  * `sbt test` catches it first). */
object GateLint {

  /** (query, column) → why this gated decimal column renders
    * identically on both engines. */
  val decimalWaivers: Map[(String, String), String] = Map(
    ("q143_winsorize", "total") ->
      ("pure decimal SUM: sum(DECIMAL(14,2)) is exact integer-scaled " +
        "arithmetic with scale pinned to 2 on both engines; no product " +
        "or double ever touches it (gate-green since r13)"))

  /** query → why its DECIMAL(38,·) mention in the oracle SQL is safe. */
  val oracleWideDecimalWaivers: Map[String, String] = Map(
    "q143_winsorize" ->
      ("CAST(sum(DECIMAL(14,2)) AS DECIMAL(38,2)) only PINS the shape " +
        "DuckDB's sum already produces — a sum, never a product, so " +
        "the precision-38 widening rules are never exercised"))

  /** Lints one gated query's output schema. Returns flag strings. */
  def lintSchema(name: String, schema: StructType,
                 doubleAllowlist: Set[String]): Seq[String] = {
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case DoubleType if !doubleAllowlist.contains(s"$name.${f.name}") =>
          Some(s"$name.${f.name}: gated DOUBLE column not in " +
            "tools/gate_double_allowlist.txt — derive it via a playbook-" +
            "stable form (single IEEE op over exact integers, or decimal-" +
            "sum + round(<=4) -> double), verify at sf0.01 AND sf0.1, " +
            "then append the line consciously")
        case _: DecimalType
            if !decimalWaivers.contains((name, f.name)) =>
          Some(s"$name.${f.name}: gated DECIMAL output column without a " +
            "GateLint.decimalWaivers entry — decimal rendering is engine-" +
            "version-fragile (q145/q186 class); gate derived integers " +
            "instead, or waive with a named reason")
        case _ => None
      }
    }
  }

  /** Lints one oracle SQL string. */
  def lintOracle(name: String, sql: String): Seq[String] = {
    val wide = "(?i)DECIMAL\\s*\\(\\s*38".r
    if (wide.findFirstIn(sql).isDefined &&
        !oracleWideDecimalWaivers.contains(name))
      Seq(s"$name: oracle SQL reaches DECIMAL(38,.) — the widening-cap " +
        "zone where DuckDB versions disagree (r14 q186). Recompute in " +
        "64-bit integers, or waive in GateLint.oracleWideDecimalWaivers")
    else Seq.empty
  }

  /** Loads the double allowlist; None when unreadable (caller warns). */
  def loadDoubleAllowlist(path: String): Option[Set[String]] = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.isReadable(p)) None
    else {
      import scala.jdk.CollectionConverters._
      Some(java.nio.file.Files.readAllLines(p).asScala
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toSet)
    }
  }
}
