package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.core.Tables
import graft.operators.SimilarityJoin

class SimilarityJoinSpec extends SparkSpec {
  init()

  private def check(prop: Prop, minTests: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  test("multigroup covers [min,max] with contiguous non-overlapping ranges") {
    val gs = SimilarityJoin.multigroup(3, 200, 0.95)
    assert(gs.head._2 == 3)
    assert(gs.last._3 >= 200)
    gs.sliding(2).foreach {
      case Seq((_, _, hi1), (_, lo2, _)) => assert(lo2 == hi1 + 1)
      case _                             =>
    }
  }

  test("signature completeness property: J >= tau implies a shared signature") {
    // Pure re-implementation of the signature logic for arbitrary token
    // sets: mirrors segSig (hash-mod segment partition, per-group H).
    val tau = 0.8
    val alpha = 0.95
    def sigs(toks: Set[String], gid: Int, h: Int): Set[(Int, Int, String)] =
      (0 until h).map { seg =>
        val sub = toks.filter(t => math.floorMod(scala.util.hashing.MurmurHash3.stringHash(t), h) == seg)
        (gid, seg, sub.toSeq.sorted.mkString(" "))
      }.toSet

    val tokenGen = Gen.choose(5, 60).flatMap { n =>
      Gen.listOfN(n, Gen.choose(0, 500).map(i => s"t$i")).map(_.toSet)
    }
    // generate near-duplicate pairs: y = x minus a few plus a few
    val pairGen = for {
      x <- tokenGen
      nDrop <- Gen.choose(0, math.max(1, x.size / 8))
      nAdd <- Gen.choose(0, math.max(1, x.size / 8))
      dropped <- Gen.pick(math.min(nDrop, x.size), x.toSeq)
      added <- Gen.listOfN(nAdd, Gen.choose(501, 600).map(i => s"t$i"))
    } yield (x, x -- dropped ++ added)

    check(forAll(pairGen) { case (x, y) =>
      val inter = (x intersect y).size
      val uni = (x union y).size
      val j = if (uni == 0) 0.0 else inter.toDouble / uni
      if (j >= tau && x.nonEmpty && y.nonEmpty) {
        // index y in its group; probe x over overlapping groups (both use
        // the group table built over both lengths, as in a self-join)
        val lens = Seq(x.size, y.size)
        val groups = SimilarityJoin.multigroup(lens.min, lens.max, alpha)
        val yGroup = groups.find { case (_, lo, hi) => y.size >= lo && y.size <= hi }.get
        val h = SimilarityJoin.segmentCount(yGroup._3, tau)
        val ySigs = sigs(y, yGroup._1, h)
        // probe x against y's group (x's admissible range must include it)
        val xSigs = sigs(x, yGroup._1, h)
        Prop(xSigs.intersect(ySigs).nonEmpty) :| s"|x|=${x.size} |y|=${y.size} J=$j h=$h"
      } else Prop(true)
    })
  }

  test("similarity self-join on documents matches the brute-force oracle at sf0.001") {
    val docs = Tables(spark, sfSmoke, "documents")
    val got = SimilarityJoin.selfJoin(docs, "doc_id", "text", 0.8)

    val toks = SimilarityJoin.tokenize(docs, "doc_id", "text")
    val a = toks.select(col("sid").as("x_id"), col("toks").as("x_toks"))
    val b = toks.select(col("sid").as("y_id"), col("toks").as("y_toks"))
    val brute = a.crossJoin(b)
      .filter(col("x_id") < col("y_id"))
      .withColumn("inter", size(array_intersect(col("x_toks"), col("y_toks"))))
      .withColumn("uni", size(col("x_toks")) + size(col("y_toks")) - col("inter"))
      .withColumn("jacc", col("inter").cast("double") / col("uni"))
      .filter(col("jacc") >= 0.8)
      .select("x_id", "y_id", "inter", "uni", "jacc")

    assert(got.count() == brute.count())
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("prefix-filter self-join matches the brute-force oracle at sf0.001") {
    val docs = Tables(spark, sfSmoke, "documents")
    val got = SimilarityJoin.prefixSelfJoin(docs, "doc_id", "text", 0.8)

    val toks = SimilarityJoin.tokenize(docs, "doc_id", "text")
    val a = toks.select(col("sid").as("x_id"), col("toks").as("x_toks"))
    val b = toks.select(col("sid").as("y_id"), col("toks").as("y_toks"))
    val brute = a.crossJoin(b)
      .filter(col("x_id") < col("y_id"))
      .withColumn("inter", size(array_intersect(col("x_toks"), col("y_toks"))))
      .withColumn("uni", size(col("x_toks")) + size(col("y_toks")) - col("inter"))
      .withColumn("jacc", col("inter").cast("double") / col("uni"))
      .filter(col("jacc") >= 0.8)
      .select("x_id", "y_id", "inter", "uni", "jacc")

    assert(got.count() == brute.count())
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("prefix-filter join agrees with the segment-signature join at low tau") {
    // τ=0.6 n-gram shape — the regime where the prefix path replaces the
    // segment path in the batch queries; both must produce identical pairs.
    val docs = Tables(spark, sfSmoke, "documents")
    val grams = graft.operators.Dedup.ngramTokens(docs, "doc_id", "text", 2)
    val viaPrefix = SimilarityJoin.prefixJoin(grams, grams, 0.6, selfJoin = true)
      .select("x_id", "y_id", "inter", "uni")
    val viaSegments = SimilarityJoin.joinSets(grams, grams, 0.6, selfJoin = true)
      .select("x_id", "y_id", "inter", "uni")
    assert(viaPrefix.count() == viaSegments.count())
    assert(viaPrefix.exceptAll(viaSegments).isEmpty &&
      viaSegments.exceptAll(viaPrefix).isEmpty)
  }

  test("prefix positional-bound property: no true match is pruned") {
    // Mirrors the candidate filter: for every shared-prefix-token occurrence
    // of a true match (J ≥ τ), min(i−1,j−1)+1+min(|x|−i,|y|−j) ≥ α must
    // hold and the prefixes must intersect.
    val tau = 0.6
    val tokenGen = Gen.choose(5, 60).flatMap { n =>
      Gen.listOfN(n, Gen.choose(0, 300).map(i => s"t$i")).map(_.toSet)
    }
    val pairGen = for {
      x <- tokenGen
      nDrop <- Gen.choose(0, math.max(1, x.size / 4))
      nAdd <- Gen.choose(0, math.max(1, x.size / 4))
      dropped <- Gen.pick(math.min(nDrop, x.size), x.toSeq)
      added <- Gen.listOfN(nAdd, Gen.choose(301, 400).map(i => s"t$i"))
    } yield (x, x -- dropped ++ added)

    // an arbitrary-but-fixed global order stands in for the frequency order
    // (completeness must hold under ANY total order)
    def ordered(s: Set[String]): Vector[String] = s.toVector.sorted
    def prefixLen(n: Int): Int = n - math.ceil(n * tau - 1e-4).toInt + 1

    check(forAll(pairGen) { case (x, y) =>
      val inter = (x intersect y).size
      val uni = (x union y).size
      val j = if (uni == 0) 0.0 else inter.toDouble / uni
      if (j >= tau && x.nonEmpty && y.nonEmpty) {
        val ox = ordered(x); val oy = ordered(y)
        val px = ox.take(prefixLen(ox.size)).zipWithIndex
        val py = oy.take(prefixLen(oy.size)).zipWithIndex.toMap
        val alphaReq = math.ceil((ox.size + oy.size) * (tau / (1 + tau)) - 1e-4)
        val surviving = px.exists { case (t, i) =>
          py.get(t).exists { jp =>
            math.min(i, jp) + 1 +
              math.min(ox.size - i - 1, oy.size - jp - 1) >= alphaReq
          }
        }
        Prop(surviving) :| s"|x|=${ox.size} |y|=${oy.size} J=$j"
      } else Prop(true)
    })
  }

  test("containment self-join matches the brute-force definition at sf0.001") {
    val docs = Tables(spark, sfSmoke, "documents")
    val got = SimilarityJoin.containmentSelfJoin(docs, "doc_id", "text", 0.9)

    val toks = SimilarityJoin.tokenize(docs, "doc_id", "text")
    val a = toks.select(col("sid").as("x_id"), col("toks").as("x_toks"))
    val b = toks.select(col("sid").as("y_id"), col("toks").as("y_toks"))
    val brute = a.crossJoin(b)
      .filter(col("x_id") =!= col("y_id"))
      .withColumn("inter", size(array_intersect(col("x_toks"), col("y_toks"))))
      .filter(col("inter") >= ceil(size(col("x_toks")) * 0.9 - 1e-4))
      .select(col("x_id"), col("y_id"), col("inter"), size(col("x_toks")).as("x_len"))

    assert(got.count() == brute.count())
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("containment is asymmetric: a short doc inside a long one is found one-way") {
    import spark.implicits._
    // x ⊂ y with |x|=3, |y|=20: containment(x→y)=1 but Jaccard=0.15 —
    // the case a symmetric threshold can never surface
    val longToks = (1 to 20).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, "t1 t2 t3"), (2L, longToks)).toDF("doc_id", "text")
    val got = SimilarityJoin.containmentSelfJoin(docs, "doc_id", "text", 0.9)
      .select("x_id", "y_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("similarity join plan contains no cartesian product") {
    // (BroadcastNestedLoopJoin against the ~45-row group table is intended —
    // it's the length-range assignment, not an all-pairs join.)
    val docs = Tables(spark, sfSmoke, "documents")
    val plan = SimilarityJoin.selfJoin(docs, "doc_id", "text", 0.8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"similarity join must not cross join:\n$plan")
  }
}
