package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native language-ID scorer: one pass over the token array, counting
  * marker-word hits per language against precomputed hash sets.
  *
  * Column-level composition recomputes the tokenizer once per language
  * (project collapsing re-inlines the alias into every scorer), which
  * made the HOF version the bench hotspot; a single expression holds the
  * whole argmax. Ties break toward the alphabetically-later language. */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression with UnaryKernelCodegen {
  override protected def resultJava: String =
    "org.apache.spark.unsafe.types.UTF8String"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lang_id expects array<string>, got $t")
  }

  @transient private lazy val sorted = markers.sortBy(_._1)
  @transient private lazy val names: Array[UTF8String] =
    sorted.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    sorted.map { case (_, ws) =>
      val s = new java.util.HashSet[UTF8String]()
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  private val und = UTF8String.fromString("und")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](sets.length)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var l = 0
        while (l < sets.length) { if (sets(l).contains(t)) counts(l) += 1; l += 1 }
      }
      i += 1
    }
    var best = -1; var bestScore = 0
    var l = 0
    while (l < counts.length) { if (counts(l) >= bestScore && counts(l) > 0) { best = l; bestScore = counts(l) }; l += 1 }
    if (best < 0) und else names(best)
  }
  override protected def withNewChildInternal(c: Expression): LangIdExpr =
    copy(child = c)
}

/** Unicode canonical normalization (NFC): composes decomposed
  * sequences to their canonical precomposed forms — the first step of
  * any dedup/fingerprint pipeline over multi-source web text, where the
  * same word arrives both ways and would otherwise hash differently.
  * Spark has no built-in; a native expression keeps it inside
  * whole-stage codegen (`java.text.Normalizer` is the JDK's ICU-free
  * Unicode implementation; DuckDB's `nfc_normalize` is the replay
  * twin). ASCII fast path: scan-and-skip, no allocation — the dominant
  * case for web corpora. */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen {
  override protected def resultJava: String =
    "org.apache.spark.unsafe.types.UTF8String"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize expects string, got $t")
  }
  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[UTF8String]
    if (u.isFullAscii) u // ASCII is NFC-invariant; skip the transcode
    else {
      val s = u.toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }
  override protected def withNewChildInternal(c: Expression): NfcNormalizeExpr =
    copy(child = c)
}

/** Accent stripping with DuckDB-`strip_accents` semantics: canonical
  * decomposition (NFD), then drop every combining mark (Unicode
  * category M*), NO recomposition — é→e, Å→A, ç→c, while non-mark
  * letters like ø/đ/ß pass through (they don't decompose to base +
  * mark; parity probed against DuckDB on precomposed, decomposed,
  * multi-mark, and non-decomposable inputs). */
case class StripAccentsExpr(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen {
  override protected def resultJava: String =
    "org.apache.spark.unsafe.types.UTF8String"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"strip_accents expects string, got $t")
  }
  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[UTF8String]
    if (u.isFullAscii) u // no marks to strip
    else {
      val nfd = java.text.Normalizer.normalize(u.toString,
        java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val cp = nfd.codePointAt(i)
        val t = Character.getType(cp)
        if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
            t != Character.ENCLOSING_MARK)
          sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }
  override protected def withNewChildInternal(c: Expression): StripAccentsExpr =
    copy(child = c)
}

/** Deletion neighborhood for SymSpell-style edit-distance blocking: all
  * DISTINCT strings reachable by deleting up to `maxDeletes` codepoints
  * (including the original, = 0 deletions). Two strings within
  * Levenshtein distance d always share a member when both expand with
  * maxDeletes = d (a substitution is a deletion on each side; an
  * insertion is a deletion on one), so joining on neighborhood members
  * is a complete candidate generator — |neighborhood| is C(n,d)-ish
  * per row instead of the all-pairs cross product. Codepoint-aware
  * (surrogate pairs delete atomically); d ≤ 2 enforced — beyond that
  * the neighborhood explodes and a different blocking wins. */
case class DeletionNeighborhoodExpr(child: Expression, maxDeletes: Int)
    extends UnaryExpression with UnaryKernelCodegen {
  require(maxDeletes >= 0 && maxDeletes <= 2,
    s"deletion neighborhood supports d in [0,2], got $maxDeletes")
  override protected def resultJava: String =
    "org.apache.spark.sql.catalyst.util.ArrayData"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"deletion_neighborhood expects string, got $t")
  }
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val cps = s.codePoints().toArray
    val seen = new java.util.LinkedHashSet[String]()
    seen.add(s)
    def deleteOne(from: Array[Int]): Unit = {
      var i = 0
      while (i < from.length) {
        val out = new Array[Int](from.length - 1)
        System.arraycopy(from, 0, out, 0, i)
        System.arraycopy(from, i + 1, out, i, from.length - 1 - i)
        seen.add(new String(out, 0, out.length))
        i += 1
      }
    }
    if (maxDeletes >= 1) deleteOne(cps)
    if (maxDeletes >= 2 && cps.length >= 1) {
      var i = 0
      while (i < cps.length) {
        val once = new Array[Int](cps.length - 1)
        System.arraycopy(cps, 0, once, 0, i)
        System.arraycopy(cps, i + 1, once, i, cps.length - 1 - i)
        deleteOne(once)
        i += 1
      }
    }
    val arr = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
  override protected def withNewChildInternal(c: Expression): DeletionNeighborhoodExpr =
    copy(child = c)
}

/** Native Naive-Bayes chunk classifier over a token array — the
  * trained twin of [[LangIdExpr]]'s marker scorer, evaluating a
  * COLLECTED [[graft.analyze.TextAnalysis.nbTrain]] model (metadata-
  * sized: ≤ classes × buckets entries, the centroid/codebook
  * convention) in one pass per chunk. Same exact arithmetic as
  * nbScore: bucket = md5-low64(token) & (buckets−1) (power-of-two
  * modulus ≡ Spark pmod ≡ DuckDB UBIGINT %), score the cross-
  * multiplied rational class_docs·(n+S_c)/(class_tokens+B) via BigInt
  * (no float), ties to the smallest label — and 'und' when NO class
  * has any match mass (S_c = 0 ∀c), the mixing-profile convention for
  * evidence-free chunks. */
case class NbClassifyExpr(child: Expression,
                          labels: Seq[String],
                          counts: Seq[Map[Long, Long]],
                          classTokens: Seq[Long],
                          classDocs: Seq[Long],
                          buckets: Int)
    extends UnaryExpression with UnaryKernelCodegen {
  require(labels.nonEmpty && labels.size == counts.size &&
    labels.size == classTokens.size && labels.size == classDocs.size,
    "model arrays must align and be non-empty")
  require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
    s"buckets must be a power of two >= 2; got $buckets")
  override protected def resultJava: String =
    "org.apache.spark.unsafe.types.UTF8String"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nb_classify expects array<string>, got $t")
  }

  // label-sorted model, bucket -> per-class count vector (one lookup
  // per token, not one per (token, class))
  @transient private lazy val order: Array[Int] =
    labels.indices.sortBy(labels(_)).toArray
  @transient private lazy val names: Array[UTF8String] =
    order.map(i => UTF8String.fromString(labels(i)))
  @transient private lazy val ctok: Array[Long] =
    order.map(classTokens(_))
  @transient private lazy val cdoc: Array[Long] = order.map(classDocs(_))
  @transient private lazy val byBucket: java.util.HashMap[Long, Array[Long]] = {
    val m = new java.util.HashMap[Long, Array[Long]]()
    order.zipWithIndex.foreach { case (orig, c) =>
      counts(orig).foreach { case (b, cnt) =>
        val v = m.computeIfAbsent(b, _ => new Array[Long](order.length))
        v(c) += cnt
      }
    }
    m
  }

  private val und = UTF8String.fromString("und")

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val k = names.length
    val s = new Array[Long](k)
    var n = 0L
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        n += 1L
        val b = TokenHash.md5Low64(arr.getUTF8String(i)) & (buckets - 1).toLong
        val hit = byBucket.get(b)
        if (hit != null) {
          var c = 0
          while (c < k) { s(c) += hit(c); c += 1 }
        }
      }
      i += 1
    }
    var any = false
    var c = 0
    while (c < k && !any) { any = s(c) > 0L; c += 1 }
    if (!any) return und
    // argmax of cdoc(c)·(n+s(c)) / (ctok(c)+B) — exact cross-multiply;
    // strictly-greater wins, so the first (smallest) label keeps ties
    var best = 0
    var bestNum = BigInt(cdoc(0)) * (n + s(0))
    var bestDen = BigInt(ctok(0)) + buckets
    c = 1
    while (c < k) {
      val num = BigInt(cdoc(c)) * (n + s(c))
      val den = BigInt(ctok(c)) + buckets
      if (num * bestDen > bestNum * den) {
        best = c; bestNum = num; bestDen = den
      }
      c += 1
    }
    names(best)
  }
  override protected def withNewChildInternal(c: Expression): NbClassifyExpr =
    copy(child = c)
}

/** Viterbi segmentation of ONE word under a frozen unigram-LM
  * vocabulary (SentencePiece's inference step, Kudo 2018) — the
  * subword tokenizer's hot path, as a native expression so the 100 TB
  * segmentation pass stays inside whole-stage codegen with the model
  * (metadata-sized, like the NB classifier's) baked into the kernel.
  *
  * Costs are PINNED INTEGER MILLI-NATS (−1000·ln p, rounded once at
  * model-freeze time), so the optimum is an exact integer comparison
  * any engine replays bit-for-bit. The DP minimizes the combined
  * metric 16·cost + n_pieces — exactly lexicographic (cost, pieces)
  * for words up to 15 code points (n_pieces ≤ length < 16); for
  * longer words it remains a well-defined deterministic optimum of
  * the same combined metric (the oracle replays the identical metric,
  * so parity is length-independent). Lengths and piece boundaries are
  * CODE POINTS (matching Spark substr/length and DuckDB substr — a
  * non-BMP character is one atomic unit, never a surrogate pair split
  * in two). A single code point absent from the vocabulary costs
  * `unkCost` (coverage fallback — never fails).
  * Backtrack tie-break: among minimal predecessors the SMALLEST start
  * index (longest last piece) wins — first-strict-improvement in an
  * ascending scan, deterministic. */
case class UnigramSegmentExpr(child: Expression,
                              pieces: Seq[String], costs: Seq[Long],
                              unkCost: Long, maxPieceLen: Int)
    extends UnaryExpression with UnaryKernelCodegen {
  require(pieces.size == costs.size, "pieces and costs must align")
  require(maxPieceLen >= 1 && maxPieceLen <= 15,
    s"maxPieceLen must be in 1..15; got $maxPieceLen")
  // 2^40 milli-nats is far beyond any probability's -log; the bound
  // makes the 16*cost accumulation overflow-free for any realistic
  // word (length * 2^44 stays far under Long.MaxValue)
  require(unkCost >= 0 && unkCost <= (1L << 40),
    s"unkCost must be in [0, 2^40]; got $unkCost")
  require(costs.forall(c => c >= 0 && c <= (1L << 40)),
    "piece costs must be in [0, 2^40] milli-nats")
  override protected def resultJava: String =
    "org.apache.spark.sql.catalyst.util.ArrayData"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment expects a string word, got $t")
  }

  // values BOXED explicitly: with a scala.Long value type, `get` on a
  // missing key auto-unboxes null to 0L — every out-of-vocab substring
  // would silently cost nothing
  @transient private lazy val vocab: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    pieces.indices.foreach(i =>
      m.put(pieces(i), java.lang.Long.valueOf(costs(i))))
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val w = v.asInstanceOf[UTF8String].toString
    val nUnits = w.length
    if (nUnits == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    // The DP runs over CODE POINTS, not UTF-16 units: `off(k)` is the
    // UTF-16 offset where code point k starts, and every substring is
    // taken between code-point boundaries — a non-BMP character
    // (emoji, supplementary-plane CJK) is one atomic unit, so the UNK
    // fallback can never emit a lone surrogate half, and the length
    // units agree with Spark's substr/length and DuckDB's substr (the
    // oracle replays the identical metric on identical units).
    val off = new Array[Int](w.codePointCount(0, nUnits) + 1)
    var u = 0
    var n = 0
    while (u < nUnits) {
      off(n) = u; u += Character.charCount(w.codePointAt(u)); n += 1
    }
    off(n) = nUnits
    val INF = Long.MaxValue / 4
    val best = Array.fill(n + 1)(INF); best(0) = 0L
    val back = Array.fill(n + 1)(-1)
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (best(i) < INF) {
          val p = w.substring(off(i), off(j))
          val c = vocab.get(p)
          val cost: Long =
            if (c != null) c.longValue()
            else if (j - i == 1) unkCost
            else -1L
          if (cost >= 0L) {
            val cand = best(i) + 16L * cost + 1L
            if (cand < best(j)) { best(j) = cand; back(j) = i }
          }
        }
        i += 1
      }
      j += 1
    }
    val segs = scala.collection.mutable.ArrayBuffer.empty[Any]
    var k = n
    while (k > 0) {
      val i = back(k)
      segs += UTF8String.fromString(w.substring(off(i), off(k)))
      k = i
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      segs.reverse.toArray)
  }
  override protected def withNewChildInternal(c: Expression): UnigramSegmentExpr =
    copy(child = c)
}

/** Compact literal form of a frozen unigram-LM vocabulary for the SQL
  * surface (`unigram_segment(word, model)`):
  *
  *   maxlen=4,unk=20000|<piece>:<costMilli>|<piece>:<costMilli>|...
  *
  * Pieces must not contain `| : ,` (enforced). Round-trips exactly
  * (spec-gated). */
object UnigramModel {
  def serialize(pieces: Seq[String], costs: Seq[Long], unkCost: Long,
                maxPieceLen: Int): String = {
    require(pieces.size == costs.size, "pieces and costs must align")
    pieces.foreach(p => require(p.nonEmpty && !p.exists("|:,".contains(_)),
      s"piece '$p' is empty or contains a reserved separator (| : ,)"))
    (s"maxlen=$maxPieceLen,unk=$unkCost" +:
      pieces.indices.map(i => s"${pieces(i)}:${costs(i)}")).mkString("|")
  }

  def parse(s: String): (Seq[String], Seq[Long], Long, Int) = {
    val segs = s.split('|')
    val head = segs.head.split(',')
    require(head.length == 2 && head(0).startsWith("maxlen=") &&
      head(1).startsWith("unk="),
      s"model must start with maxlen=N,unk=C; got '${segs.head}'")
    val entries = segs.tail.toSeq.map { e =>
      val i = e.lastIndexOf(':')
      require(i > 0, s"vocab entry must be piece:cost; got '$e'")
      (e.substring(0, i), e.substring(i + 1).toLong)
    }
    (entries.map(_._1), entries.map(_._2),
      head(1).stripPrefix("unk=").toLong,
      head(0).stripPrefix("maxlen=").toInt)
  }
}

/** Compact literal form of a trained NB model, so SQL-only consumers
  * can carry a model into `nb_classify(tokens, model)` as one string
  * literal (a SQL surface cannot pass Scala Seqs/Maps):
  *
  *   buckets=64|<label>:docs=D,toks=T,c=B1:C1;B2:C2;...|<label>:...
  *
  * — one `|`-separated segment per class after the buckets header;
  * `c=` lists the bucket→count entries `;`-separated (empty allowed).
  * Labels must not contain `| : , ;` (enforced). Round-trips exactly
  * (spec-gated); [[TextFunctions.nbClassify]] and the SQL function
  * build the identical NbClassifyExpr from either form. */
object NbModel {
  def serialize(labels: Seq[String], counts: Seq[Map[Long, Long]],
                classTokens: Seq[Long], classDocs: Seq[Long],
                buckets: Int): String = {
    require(labels.size == counts.size && labels.size == classTokens.size &&
      labels.size == classDocs.size, "model arrays must align")
    labels.foreach(l => require(!l.exists("|:,;".contains(_)),
      s"label '$l' contains a reserved separator (| : , ;)"))
    val classes = labels.indices.map { i =>
      val cs = counts(i).toSeq.sorted.map { case (b, c) => s"$b:$c" }
        .mkString(";")
      s"${labels(i)}:docs=${classDocs(i)},toks=${classTokens(i)},c=$cs"
    }
    (s"buckets=$buckets" +: classes).mkString("|")
  }

  def parse(s: String): (Seq[String], Seq[Map[Long, Long]], Seq[Long],
      Seq[Long], Int) = {
    val segs = s.split('|')
    require(segs.nonEmpty && segs.head.startsWith("buckets="),
      s"model must start with buckets=N; got '${segs.headOption.getOrElse("")}'")
    val buckets = segs.head.stripPrefix("buckets=").toInt
    val parsed = segs.tail.toSeq.map { seg =>
      val i = seg.indexOf(':')
      require(i > 0, s"class segment missing label: '$seg'")
      val label = seg.substring(0, i)
      val parts = seg.substring(i + 1).split(',')
      require(parts.length == 3 && parts(0).startsWith("docs=") &&
        parts(1).startsWith("toks=") && parts(2).startsWith("c="),
        s"class segment must be label:docs=D,toks=T,c=...; got '$seg'")
      val cnts = parts(2).stripPrefix("c=") match {
        case "" => Map.empty[Long, Long]
        case cs => cs.split(';').map { e =>
          val Array(b, c) = e.split(':')
          b.toLong -> c.toLong
        }.toMap
      }
      (label, cnts, parts(1).stripPrefix("toks=").toLong,
        parts(0).stripPrefix("docs=").toLong)
    }
    (parsed.map(_._1), parsed.map(_._2), parsed.map(_._3),
      parsed.map(_._4), buckets)
  }
}

object TextFunctions {
  import org.apache.spark.sql.graftshim.ColumnBridge
  def langId(tokens: Column, markers: Map[String, Seq[String]]): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(tokens), markers.toSeq))
  def nbClassify(tokens: Column, labels: Seq[String],
                 counts: Seq[Map[Long, Long]], classTokens: Seq[Long],
                 classDocs: Seq[Long], buckets: Int): Column =
    ColumnBridge.column(NbClassifyExpr(ColumnBridge.expression(tokens),
      labels, counts, classTokens, classDocs, buckets))
  def nfcNormalize(s: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(s)))
  def stripAccents(s: Column): Column =
    ColumnBridge.column(StripAccentsExpr(ColumnBridge.expression(s)))
  def deletionNeighborhood(s: Column, maxDeletes: Int): Column =
    ColumnBridge.column(DeletionNeighborhoodExpr(ColumnBridge.expression(s), maxDeletes))
  def unigramSegment(word: Column, pieces: Seq[String], costs: Seq[Long],
                     unkCost: Long, maxPieceLen: Int): Column =
    ColumnBridge.column(UnigramSegmentExpr(ColumnBridge.expression(word),
      pieces, costs, unkCost, maxPieceLen))
}
