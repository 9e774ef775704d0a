package graft

import graft.operators.LinkGraph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * PageRank differential test: the distributed run must equal a single-threaded
 * re-implementation of the SAME contract (md5-synthesized graph, scaled-BIGINT
 * ranks, integer DIV everywhere) computed driver-side over the whole corpus —
 * exact equality, not tolerance. Plus the loud-failure contract on gapped id
 * spaces and the sequence(1,0)-descends guard rail the trigram code shares.
 */
class LinkGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val documents = spark.read.parquet(s"$sfDir/documents.parquet")

  private def u32(s: String): Long = TestHash.u32(s)

  /** Single-threaded PageRank over the synthesized graph, same integer contract. */
  private def referenceRanks(n: Int): (Array[Long], Array[Long], Array[Long]) = {
    import LinkGraph._
    val outdeg = Array.tabulate(n)(u => 1L + u32(s"prd:$u") % PrOutMod)
    val dsts = Array.tabulate(n)(u =>
      (0L until outdeg(u)).map(j => (u32(s"pr:$u:$j") % n).toInt).toArray)
    val nIn = new Array[Long](n)
    dsts.foreach(_.foreach(d => nIn(d) += 1))
    val base = PrScale / n
    val tele = base * (PrDampDen - PrDampNum) / PrDampDen
    var r = Array.fill(n)(base)
    (1 to PrIters).foreach { _ =>
      val insum = new Array[Long](n)
      (0 until n).foreach { u =>
        val share = r(u) / outdeg(u)
        dsts(u).foreach(d => insum(d) += share)
      }
      r = insum.map(s => tele + PrDampNum * s / PrDampDen)
    }
    (r, outdeg, nIn)
  }

  test("distributed pagerank equals the single-threaded integer oracle exactly") {
    val n = documents.count().toInt
    val (r, outdeg, nIn) = referenceRanks(n)
    val expected = (0 until n).map(v => (v.toLong, outdeg(v), nIn(v), r(v)))
      .sortBy { case (v, _, _, rank) => (-rank, v) }
      .take(LinkGraph.PrTopK)
    val got = LinkGraph.pagerank(documents)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("rank mass is conserved up to flooring (no mass created, bounded loss)") {
    val n = documents.count().toInt
    val (r, _, _) = referenceRanks(n)
    val total = r.sum
    // mass can only LEAK, never appear; provable per-vertex-per-round worst case:
    // share flooring loses r mod outdeg <= PrOutMod-1, the damp DIV < 1, the
    // teleport floor < 1 (and the r0 init floor < 1 per vertex, once)
    assert(total <= LinkGraph.PrScale)
    assert(total > LinkGraph.PrScale -
      n.toLong * (1 + LinkGraph.PrIters * (LinkGraph.PrOutMod + 2)))
  }

  test("a gapped doc_id space fails loudly instead of dangling edges") {
    val gapped = documents.filter(col("doc_id") =!= 5)
    val e = intercept[IllegalArgumentException] {
      LinkGraph.pagerank(gapped)
    }
    assert(e.getMessage.contains("exactly 0..N-1"))
  }

  test("a duplicate id hiding a gap (count/min/max all plausible) fails loudly too") {
    // {0,1,1,3,...}: count == max+1 and min == 0, so only the distinct-count term
    // catches it — without it, the missing vertex silently drops rank mass and the
    // duplicate double-counts
    val dup = documents.select(
      when(col("doc_id") === 2, 1L).otherwise(col("doc_id")).as("doc_id"))
    val e = intercept[IllegalArgumentException] {
      LinkGraph.pagerank(dup)
    }
    assert(e.getMessage.contains("exactly 0..N-1"))
  }

  test("anchor extraction recovers exactly the generator's link structure") {
    import spark.implicits._
    val spans = graft.sources.Interleave.spansFlat(spark, sfDir)
    val edges = LinkGraph.anchorEdges(spans)
      .as[(Long, Long, Long)].collect().toSeq
    val bySrc = edges.groupBy(_._1)
    val n = documents.count()
    assert(bySrc.keySet.size === n.toInt, "every doc has text spans, so out-edges")
    // content spans self-link; link-farm spans (d % 23 == 0) add hubs 0 and 1
    bySrc.foreach { case (src, es) =>
      val dsts = es.map(_._2).toSet
      if (src % 23 == 0) assert(dsts.subsetOf(Set(0L, 1L, src)) && dsts.contains(0L)
        && dsts.contains(1L), s"$src: $dsts")
      else assert(dsts === Set(src), s"$src: $dsts")
    }
    // hub in-links come from exactly the link-farm docs
    val farmDocs = (0L until n).count(_ % 23 == 0)
    val farmIns = edges.filter(e => e._2 == 1L && e._1 % 23 == 0).map(_._1).distinct.size
    assert(farmIns === farmDocs, s"hub u1 farm in-links $farmIns vs farm docs $farmDocs")
  }

  test("anchor pagerank concentrates rank on the hub documents") {
    val spans = graft.sources.Interleave.spansFlat(spark, sfDir)
    val top = LinkGraph.pagerankAnchors(documents, spans)
      .select(col("doc_id")).collect().map(_.getLong(0)).take(2).toSet
    // every 23rd doc's link-farm span feeds u0 and u1: the hubs must lead
    assert(top === Set(0L, 1L), s"expected hub docs 0 and 1 on top, got $top")
  }

  test("edge synthesis is deterministic and degree-bounded") {
    val n = documents.count()
    val e = LinkGraph.edges(documents.select(col("doc_id")), n)
    val stats = e.agg(min(col("outdeg")), max(col("outdeg")),
      min(col("dst")), max(col("dst")), count(lit(1))).head()
    assert(stats.getLong(0) >= 1 && stats.getLong(1) <= LinkGraph.PrOutMod)
    assert(stats.getLong(2) >= 0 && stats.getLong(3) < n)
    // re-synthesis is bit-identical (pure function of ids)
    assert(e.exceptAll(LinkGraph.edges(documents.select(col("doc_id")), n)).isEmpty)
  }
}
