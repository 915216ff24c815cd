package graft

/** The gate-fragility lint (GateLint, VERDICT r14 task 2) as a spec, so
  * `sbt test` catches a fragile gated column before Verify's pre-gate
  * abort ever has to fire. Walks every gated query's output schema
  * (plan-only, sf0.001 — no execution) and every oracle SQL string. */
class GateLintSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no gated double/decimal column escapes the fragility lint") {
    val allow = GateLint.loadDoubleAllowlist("tools/gate_double_allowlist.txt")
      .getOrElse(fail("tools/gate_double_allowlist.txt unreadable"))
    val flags = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        GateLint.lintSchema(name, fn(spark, sf).schema, allow) ++
          SparkEntry.oracleSql.get(name).toSeq
            .flatMap(GateLint.lintOracle(name, _))
    }
    assert(flags.isEmpty, flags.mkString("\n", "\n", ""))
  }

  test("allowlist carries no stale entries for since-removed columns") {
    val allow = GateLint.loadDoubleAllowlist("tools/gate_double_allowlist.txt")
      .getOrElse(fail("tools/gate_double_allowlist.txt unreadable"))
    val live = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val sch = fn(spark, sf).schema
      sch.fields.map(f => s"$name.${f.name}")
    }.toSet
    val stale = allow.filterNot(live.contains)
    assert(stale.isEmpty,
      s"stale allowlist entries (column no longer gated): $stale")
  }

  test("lint actually fires on a fragile schema and a capped oracle") {
    import org.apache.spark.sql.types._
    val s = StructType(Seq(StructField("ok_id", LongType),
      StructField("score", DoubleType),
      StructField("amt", DecimalType(30, 12))))
    val f1 = GateLint.lintSchema("q999_fake", s, Set("q999_fake.other"))
    assert(f1.size == 2, f1)
    assert(GateLint.lintOracle("q999_fake",
      "SELECT CAST(a * b AS DECIMAL(38,2)) FROM t").nonEmpty)
    assert(GateLint.lintOracle("q143_winsorize",
      "SELECT CAST(s AS DECIMAL(38,2)) FROM t").isEmpty) // waived
  }
}
