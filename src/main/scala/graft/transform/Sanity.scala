package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Record-sanity transform library (SURVEY.md §2.2 T1–T11).
  *
  * Re-expresses the reference's driver-side per-record Python helpers
  * (`martech_pipelines/utils/data_sanity_helpers.py:10-177`) as Catalyst
  * `Column` expressions: distributed, whole-stage-codegen'd, no UDFs.
  *
  * Documented deviations from the reference (SURVEY §0.1):
  *  - B5: unparseable `unix_epoch` input yields NULL (reference's error
  *    path is dead code).
  *  - B7: failed int/float/date casts KEEP the original value — kept,
  *    which forces string-typed egress columns (egress is JSON anyway).
  *  - Falsy contract for identity: NULL, empty/whitespace string, and
  *    "0"/"0.0" (numeric zero rendered as string) count as missing.
  */
object Sanity {

  /** T1 `identity_field_check` (data_sanity_helpers.py:10-28): first
    * non-falsy candidate value as string, else NULL (record invalid). */
  def identity(candidates: Seq[Column]): Column = {
    val nonFalsy = candidates.map { c =>
      val s = trim(c.cast(StringType))
      when(s.isNotNull && length(s) > 0 && s =!= "0" && s =!= "0.0", s)
    }
    coalesce(nonFalsy: _*)
  }

  /** T2 `extract_attributes` (data_sanity_helpers.py:31-39): project to
    * allow-listed columns; missing columns silently dropped. */
  def extractAttributes(df: DataFrame, attrs: Seq[String]): DataFrame = {
    val present = attrs.filter(df.columns.contains)
    df.select(present.map(col): _*)
  }

  /** T3 `swap_key_name` (data_sanity_helpers.py:42-53): rename columns by
    * old→new map; collisions overwrite (old dropped first). */
  def swapKeys(df: DataFrame, swap: Map[String, String]): DataFrame = {
    val collisions = swap.collect {
      case (o, n) if df.columns.contains(n) && df.columns.contains(o) && o != n => n
    }.toSeq
    val dropped = collisions.foldLeft(df)(_.drop(_))
    dropped.withColumnsRenamed(swap)
  }

  /** Keep-original-on-failure semantics (B7): the attempted conversion as
    * string if it parsed, else the original value as string. */
  private def keepOriginal(original: Column, attempt: Column): Column =
    coalesce(attempt.cast(StringType), original.cast(StringType))

  /** Date formats the reference's `dateutil.parse` path is exercised with;
    * T4 "date" tries these in order. */
  val dateFormats: Seq[String] =
    Seq("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd", "yyyy/MM/dd", "yyyy-MM-dd'T'HH:mm:ss")

  private def tryParseAny(c: Column, fmts: Seq[String]): Column =
    coalesce(fmts.map(f => try_to_timestamp(c.cast(StringType), lit(f))): _*)

  /** T4 `data_type_transformation` (data_sanity_helpers.py:56-93): per-key
    * cast dispatch. Output columns are string-typed because "keep original
    * on failure" mixes types (egress is JSON — strings are correct). */
  def typeTransform(c: Column, kind: String, key: String = ""): Column = kind match {
    case "string" => c.cast(StringType)
    case "int"    => keepOriginal(c, c.try_cast(LongType))
    case "float"  => keepOriginal(c, c.try_cast(DoubleType))
    case "date" =>
      if (key == "dob") fixDob(c)
      else keepOriginal(c, date_format(tryParseAny(c, dateFormats), "yyyy-MM-dd"))
    case "mobile_sanity" => mobileSanity(c)
    case "modify_reward" => modifyReward(c).cast(StringType)
    case "Unix_epoch" | "unix_epoch" => unixEpoch(c)
    case other => throw new IllegalArgumentException(s"unknown type tag: $other")
  }

  /** Compile a conf-supplied type map into per-column transforms
    * (the §1.3 runtime-driven schema: conf → Seq[Column]). */
  def compileTypeMap(df: DataFrame, typeMap: Map[String, String]): DataFrame = {
    val cols = df.columns.map { name =>
      typeMap.get(name) match {
        case Some(kind) => typeTransform(col(name), kind, name).as(name)
        case None       => col(name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** T5 `mobile_sanity` (data_sanity_helpers.py:96-110): numeric-parse
    * (strips float artifacts like trailing ".0"), last 10 chars, valid iff
    * exactly 10 digits else NULL. */
  def mobileSanity(c: Column): Column = {
    // str(int(float(x))): parse as double, truncate toward zero.
    // try_cast also on the long step: ANSI mode would otherwise THROW on
    // values beyond long range (found by the T5 property test).
    val asNum = c.cast(StringType).try_cast(DoubleType)
      .try_cast(LongType).cast(StringType)
    val last10 = substring(asNum, -10, 10)
    when(last10.rlike("^[0-9]{10}$"), last10)
  }

  /** Sentinel year for pre-1900 DOBs (B6 — CleverTap rejects pre-1900;
    * 1952 is a leap year so Feb-29 survives `replace(year=)`). */
  val DobSentinelYear = 1952

  /** T6 `fix_dob` (data_sanity_helpers.py:124-141) as a DATE column:
    * strip " BC" suffix, try the reference's three formats, pre-1900 →
    * year 1952, unparseable → NULL. */
  def fixDobDate(c: Column, sentinelYear: Int = DobSentinelYear): Column = {
    val cleaned = regexp_replace(c.cast(StringType), " BC$", "")
    val ts = coalesce(
      try_to_timestamp(cleaned, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(cleaned, lit("yyyy-MM-dd")),
      try_to_timestamp(cleaned, lit("yyyy-MM-dd HH:mm:ss.SSSSSS")))
    val d = to_date(ts)
    when(year(d) < 1900, make_date(lit(sentinelYear), month(d), dayofmonth(d)))
      .otherwise(d)
  }

  /** T6 output shape: `yyyy-MM-dd` string. */
  def fixDob(c: Column): Column = date_format(fixDobDate(c), "yyyy-MM-dd")

  /** T7 `modify_reward` (data_sanity_helpers.py:113-121): rupees→paise,
    * `int(value*100)` — Python int() truncates toward zero, so cast (not
    * floor/round). NULL on unparseable. */
  def modifyReward(c: Column): Column =
    (c.cast(StringType).try_cast(DoubleType) * lit(100)).try_cast(LongType)

  /** T8 `unix_epoch` (data_sanity_helpers.py:144-153): `yyyy-MM-dd` →
    * `"$D_<epochSeconds>"` (CleverTap $D_ encoding); NULL on failure (B5).
    * Epoch is computed in the session time zone (pinned UTC here; the
    * reference used driver-local time — documented delta). */
  def unixEpoch(c: Column): Column =
    concat(lit("$D_"),
      unix_timestamp(try_to_timestamp(c.cast(StringType), lit("yyyy-MM-dd")))
        .cast(StringType))

  /** T10 `get_birth_date` (data_sanity_helpers.py:156-162): fixed DOB as
    * `MMM-dd` (e.g. "Sep-03"). */
  def birthDate(c: Column): Column = date_format(fixDobDate(c), "MMM-dd")

  private val signalSchema = MapType(StringType, MapType(StringType, IntegerType))

  /** T9 `get_gender_implicit_data` (data_sanity_helpers.py:165-177): parse
    * the JSON signal column, read the `signalField` object, emit 4 int
    * gender counters (missing ⇒ 0). Whole-record transform — the registry
    * member (B12). */
  def genderImplicit(df: DataFrame, jsonCol: String = "v1__json",
                     signalField: String = "last7days"): DataFrame = {
    val parsed = from_json(col(jsonCol), signalSchema)
    val sig = element_at(parsed, signalField)
    Seq("men", "women", "kids", "home").foldLeft(df) { (d, g) =>
      d.withColumn(s"gender_${g}_dp", coalesce(element_at(sig, g), lit(0)))
    }
  }

  /** T9/B12 registry: named, conf-selected whole-record transforms. */
  val rowTransformRegistry: Map[String, DataFrame => DataFrame] = Map(
    "get_gender_implicit_data" -> (df => genderImplicit(df)))

  /** RFC-4180 CSV field encoding, matching pandas `to_csv`'s default
    * QUOTE_MINIMAL (reference `hooks/netcore.py:83-90`): null → empty;
    * a field containing the separator, a double quote, or a line break is
    * wrapped in quotes with embedded quotes doubled; all other fields are
    * emitted verbatim. Codegen'd column expression — no UDF. */
  def csvField(c: Column): Column = {
    val s = coalesce(c.cast(StringType), lit(""))
    val needsQuote =
      s.contains(",") || s.contains("\"") || s.contains("\n") || s.contains("\r")
    when(needsQuote,
      concat(lit("\""), regexp_replace(s, "\"", "\"\""), lit("\"")))
      .otherwise(s)
  }

  /** One RFC-4180 CSV record from the given columns. Encoding happens
    * BEFORE byte-bound packing (BatchPacker.byteBound measures this
    * encoded line), so the ≤4.5 MB staging cap is exact. */
  def csvLine(cols: Seq[Column]): Column = concat_ws(",", cols.map(csvField): _*)

  /** Driver-side twin of csvField for literal strings (header rows). */
  def csvQuoteString(s: String): String =
    if (s == null) ""
    else if (s.exists(ch => ch == ',' || ch == '"' || ch == '\n' || ch == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** T11 payload envelope (operators/clevertap_user_profile.py:99-110):
    * `{"type":"profile","identity":…,"profileData":{attrs}}` as one JSON
    * string column. */
  def profileEnvelope(identityCol: Column, attrs: Seq[(String, Column)]): Column =
    to_json(struct(
      lit("profile").as("type"),
      identityCol.as("identity"),
      struct(attrs.map { case (n, c) => c.as(n) }: _*).as("profileData")))
}
