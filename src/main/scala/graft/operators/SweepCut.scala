package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conductance sweep cut — the step that turns a diffusion score into an
  * actual LOCAL COMMUNITY (Andersen–Chung–Lang 2006): order nodes by
  * score/degree, walk prefixes S_1 ⊂ S_2 ⊂ …, and take the prefix with
  * the best conductance Φ(S) = cut(S)/min(vol(S), vol(V∖S)). The
  * [[PageRank.personalizedRanks]] output says who is NEAR the seeds;
  * the sweep says where the community BOUNDARY is — the standard
  * seed-expansion recipe (local graph clustering for "give me the
  * near-dup neighborhood of this document", spam-farm perimeters,
  * entity-resolution block growing).
  *
  * Exact-integer contract: the sweep order key is (10¹²·score) div deg
  * carried in DECIMAL(38,0) (floor documented; ties by id), and each
  * prefix's conductance floors in ppm:
  *   cond_ppm(i) = (10⁶·cut_i) div min(vol_i, totvol − vol_i)
  * (min = 0 — the whole graph swallowed — reports 10⁶). cut updates
  * incrementally: each canonical edge belongs to its LATER-ranked
  * endpoint (when both rank), so cut_i = vol_i − 2·Σ_{r≤i} inEdges_r —
  * one equi-join and two prefix sums, never prefix × edges.
  *
  * Scale shape: degree/score join at node grain, top-m selection via
  * the sharded [[TopK]] two-phase rank (never a whole-graph
  * single-partition sort), ONE canonical-edge join to the top-m ranked
  * relation, windows only over the m-row sweep
  * (m ≤ 10⁵ asserted by name — the sweep is a LOCAL method; its
  * candidate set is small by design). Zero-score and isolated nodes
  * never rank (a node with no edges has no conductance meaning).
  *
  * Output, rank ascending: (rank, id, score, degree, vol, cut,
  * cond_ppm, best_rank) with best_rank = the earliest rank attaining
  * the minimum conductance, repeated per row (the [[Concentration]]
  * idiom) — S_best = the rows with rank ≤ best_rank.
  */
object SweepCut {

  def sweep(
      scores: DataFrame, // (id, score) — score a non-negative long
      edges: DataFrame, // (a, b), any orientation / duplication
      m: Int): DataFrame = {
    require(m >= 1 && m <= 100000,
      s"SweepCut.sweep: m must be in [1, 1e5] (a LOCAL method), got $m")
    val und = edges
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .transform(graft.core.Materialize.apply)
    val deg = und.select(col("a").as("id"))
      .unionByName(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val sc = scores.select(
      col("id").cast("long").as("id"),
      when(col("score").cast("long") < 0,
        raise_error(concat(
          lit("SweepCut.sweep: scores must be >= 0, got "),
          col("score").cast("string"))).cast("long"))
        .otherwise(col("score").cast("long")).as("score"))
    // the (10^12*score) div deg key stays DECIMAL(38,0) via the
    // pmod-subtract floor (a BIGINT div would overflow at score ~ 10^12)
    val keyed = sc.filter(col("score") > 0)
      .join(deg, "id")
      .withColumn("__k", expr(
        """CAST((CAST(score AS DECIMAL(38,0)) * 1000000000000
          |       - pmod(CAST(score AS DECIMAL(38,0)) * 1000000000000, degree))
          |      / degree AS DECIMAL(38,0))""".stripMargin))
    // top-m FIRST via the sharded [[TopK]] selection (phase 1 keeps a
    // per-shard top-m in parallel; phase 2 ranks only the surviving
    // ≤ shards·m rows), so no whole-graph sort ever funnels through a
    // single task — the ordering window runs on the m-bounded relation
    val ranked = TopK
      .perGroup(
        keyed.select("id", "score", "degree", "__k"),
        Seq.empty,
        Seq(col("__k").desc, col("id").asc),
        m,
        rankCol = "rank")
      .withColumn("rank", col("rank").cast("long"))
      .select("rank", "id", "score", "degree")
      .transform(graft.core.Materialize.apply)
    val einc = und
      .join(ranked.select(col("id").as("a"), col("rank").as("ra")), "a")
      .join(ranked.select(col("id").as("b"), col("rank").as("rb")), "b")
      .groupBy(greatest(col("ra"), col("rb")).as("rank"))
      .agg(count(lit(1)).as("c"))
    val tot = und.count() * 2
    // the sweep itself is one ≤ m-row partition; __blk (rank − rank) is
    // non-foldable so the window spec survives optimization (the
    // PrefixSum tail discipline)
    val w = Window.partitionBy("__blk").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = ranked
      .join(einc, Seq("rank"), "left")
      .withColumn("__blk", col("rank") - col("rank"))
      .withColumn("vol", sum("degree").over(w))
      .withColumn("__ein", sum(coalesce(col("c"), lit(0L))).over(w))
      .withColumn("cut", col("vol") - lit(2L) * col("__ein"))
      .withColumn("cond_ppm", expr(
        s"""CASE WHEN least(vol, ${tot}L - vol) = 0 THEN 1000000L
           |ELSE (1000000 * cut) div least(vol, ${tot}L - vol) END""".stripMargin))
    val best = swept
      .orderBy(col("cond_ppm").asc, col("rank").asc)
      .select(col("rank").as("best_rank")).limit(1)
    swept
      .crossJoin(broadcast(best))
      .select("rank", "id", "score", "degree", "vol", "cut", "cond_ppm", "best_rank")
  }
}
