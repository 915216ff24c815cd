package graft

import org.apache.spark.sql.functions._
import graft.analyze.{Pq, Similarity}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def clustered: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(5)
    (0 until 4).flatMap { c =>
      val center = Array.tabulate(16)(i => if (i / 4 == c) 10f else 0f)
      (0 until 10).map { j =>
        (c * 10L + j) -> center.map(_ + rnd.nextFloat() * 0.4f)
      }
    }
  }

  test("PQ: codes table shape — m codes per vector, each in [0, ks)") {
    val df = clustered.toDF("id", "v")
    val cb = Pq.buildSampled(df, "id", "v", m = 4, ks = 8)
    assert(cb.subDim == 4 && cb.books.length == 4 && cb.books.head.length == 8)
    val codes = Pq.encode(df, "id", "v", cb)
    assert(codes.count() == 40 * 4)
    val bad = codes.filter(col("code") < 0 || col("code") >= 8).count()
    assert(bad == 0)
  }

  test("PQ: zero quantization error when every vector is a codebook entry") {
    // ks = corpus size ⇒ each subvector quantizes to itself, so the ADC
    // distance must equal the exact L2² distance, bit for bit.
    val small = clustered.take(12)
    val df = small.toDF("id", "v")
    val cb = Pq.buildSampled(df, "id", "v", m = 4, ks = 12)
    val codes = Pq.encode(df, "id", "v", cb)
    val got = Pq.adcTopK(codes, df, "id", "v", cb, k = 11)
      .select("query_id", "neighbor_id", "dist")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, d) => (q, n) -> d }.toMap
    // exact distances via the same decimal dot kernels
    val sides = df.select(col("id"), col("v"),
      Similarity.dotExact(col("v"), col("v")).as("n2"))
    val exact = sides.toDF("ida", "va", "na")
      .crossJoin(sides.toDF("idb", "vb", "nb"))
      .filter(col("ida") =!= col("idb"))
      .select(col("ida"), col("idb"),
        (col("na") + col("nb")
          - Similarity.dotExact(col("va"), col("vb"))
          - Similarity.dotExact(col("va"), col("vb"))).as("d"))
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, d) => (q, n) -> d }.toMap
    assert(got.size == 12 * 11)
    got.foreach { case (k, d) =>
      assert(math.abs(d - exact(k)) < 1e-9, s"$k: adc=$d exact=${exact(k)}")
    }
  }

  test("IVFPQ with exhaustive probing equals the plain ADC scan") {
    import graft.analyze.Ivf
    val df = clustered.toDF("id", "v")
    val ivf = Ivf.buildSampled(df, "id", "v", nlist = 8)
    val cb = Pq.buildSampled(df, "id", "v", m = 4, ks = 16)
    val codes = Pq.encode(df, "id", "v", cb)
    val full = Pq.adcTopK(codes, df, "id", "v", cb, k = 3)
      .as[(Long, Long, Double, Int)].collect().toSet
    val ivfpq = Pq.ivfpqTopK(ivf, cb, codes, df, "id", "v", k = 3, nprobe = 8)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(ivfpq == full)
    // narrow probing finds cluster-mates when cells align with clusters —
    // which needs the k-means build: sampled centroids here are the 8
    // lowest ids, all drawn from cluster 0
    val kmeans = Ivf.build(df, "id", "v", nlist = 4)
    val top1 = Pq.ivfpqTopK(kmeans, cb, codes, df, "id", "v", k = 1, nprobe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top1.length == 40)
    top1.foreach { case (q, n) => assert(q / 10 == n / 10, s"$q -> $n") }
  }

  test("PQ: top-1 recovers cluster-mates on separated clusters") {
    val df = clustered.toDF("id", "v")
    val cb = Pq.buildSampled(df, "id", "v", m = 4, ks = 16)
    val codes = Pq.encode(df, "id", "v", cb)
    val top1 = Pq.adcTopK(codes, df, "id", "v", cb, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top1.length == 40)
    // clusters are far apart: the nearest code-neighbor is a cluster-mate
    top1.foreach { case (q, n) => assert(q / 10 == n / 10, s"$q -> $n") }
  }
}
