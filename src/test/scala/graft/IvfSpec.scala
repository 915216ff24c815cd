package graft

import org.apache.spark.sql.functions._
import graft.analyze.{Ivf, Similarity}
import graft.core.Skew

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(11)
    // 4 well-separated clusters of 20 vectors each
    (0 until 4).flatMap { c =>
      val center = Array.tabulate(8)(i => if (i == c * 2) 10f else 0f)
      (0 until 20).map { j =>
        (c * 20L + j) -> center.map(_ + rnd.nextFloat() * 0.5f)
      }
    }
  }

  test("IVF: probing the right cells recovers the true neighbors") {
    val df = vecs.toDF("id", "v")
    val index = Ivf.build(df, "id", "v", nlist = 4)
    val queries = df.filter($"id".isin(0L, 25L, 45L, 65L))
    val got = Ivf.search(index, queries, "id", "v", k = 3, nprobe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = Similarity.bruteForceTopK(df, queries, "id", "v", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // clusters are well separated: nprobe=1 must equal brute force
    assert(got == brute)
  }

  test("salted join equals plain join; hot keys diagnosed") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (30L, "b")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "v", "name").collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "v", "name").collect().toSet
    assert(salted == plain)
    val hot = Skew.hotKeys(big, "k", minCount = 50).as[(Long, Long)].collect()
    assert(hot.map(_._1).toSeq == Seq(1L))
  }
}
