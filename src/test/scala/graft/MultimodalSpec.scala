package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  init()

  private lazy val media = Multimodal.mediaFromDocuments(
    Tables(spark, sfSmoke, "documents"))

  test("decode stub is a pure function with fixed output dim") {
    val bytes = "hello multimodal".getBytes("UTF-8")
    val a = Multimodal.decodeStub(bytes)
    val b = Multimodal.decodeStub(bytes)
    assert(a.toSeq == b.toSeq)
    assert(a.length == Multimodal.FeatureDim)
    assert(Multimodal.decodeStub(Array.empty[Byte]).length == Multimodal.FeatureDim)
  }

  test("batched feature extraction covers every row with the right shape") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == media.count())
    assert(feats.filter(size(col("features")) =!= Multimodal.FeatureDim).count() == 0)
    // deterministic across runs
    val a = Multimodal.extractFeatures(media).orderBy("media_id")
    val b = Multimodal.extractFeatures(media).orderBy("media_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("resize rewrites meta and scales payload length") {
    import spark.implicits._
    val one = Seq((1L, "image", "x" * 100, ("image/png", 10, 10, 0)))
      .toDF("media_id", "kind", "s", "m")
      .select(
        col("media_id"), col("kind"),
        encode(col("s"), "UTF-8").as("payload"),
        col("m").cast("struct<mime:string,width:int,height:int,duration_ms:int>").as("meta"))
    val r = Multimodal.resize(one, 5, 5).head()
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getInt(1) == 5 && meta.getInt(2) == 5)
    // area 100 → 25: payload 100 bytes → 25
    assert(r.getAs[Array[Byte]]("payload").length == 25)
  }

  test("frame sampling slices the payload into the documented shape") {
    import spark.implicits._
    val one = Seq((7L, "video", "a" * 450)).toDF("media_id", "kind", "s")
      .withColumn("payload", encode(col("s"), "UTF-8"))
      .withColumn("meta", struct(lit("v").as("mime"), lit(1).as("width"),
        lit(1).as("height"), lit(0).as("duration_ms")))
    val frames = Multimodal.sampleFrames(one)
      .select("frame_idx", "frame_bytes")
      .as[(Int, Int)].collect().toSeq.sorted
    assert(frames == Seq((0, 200), (1, 200), (2, 50)))
  }

  test("frame-count-only consumer prunes the payload from the scan") {
    val counts = Multimodal.sampleFrames(media)
      .groupBy("media_id").agg(count(lit(1)).as("n_frames"))
    val plan = counts.queryExecution.optimizedPlan.toString
    assert(!plan.contains("frame_payload"), s"payload not pruned:\n$plan")
  }

  test("perceptual hash matches an independent MessageDigest replay") {
    import spark.implicits._
    val payload = "the quick brown fox jumps over the lazy dog " * 4 // 180 chars
    val m = Seq((1L, payload)).toDF("media_id", "s")
      .select(col("media_id"), encode(col("s"), "UTF-8").as("payload"))
    val got = Multimodal.perceptualHash(m).head().getLong(1)
    val bl = math.max(1, payload.length / 64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var expected = 0L
    for (b <- 0 until 64) {
      val from = math.min(b * bl, payload.length)
      val until = math.min(from + bl, payload.length)
      val hex = md.digest(payload.substring(from, until).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ((Integer.parseInt(hex.substring(0, 1), 16) % 2) == 1)
        expected |= (1L << b)
    }
    assert(got == expected)
  }

  test("phash pairs: pigeonhole candidates equal the all-pairs Hamming filter") {
    // brute force on the driver over the (bounded, 500-row) fingerprint set
    val fps = Multimodal.perceptualHash(media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val brute = (for {
      (x, xf) <- fps
      (y, yf) <- fps
      if x < y
      h = java.lang.Long.bitCount(xf ^ yf)
      if h <= 3
    } yield (x, y, h.toLong)).toSet
    val got = Multimodal.phashPairs(media, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
      .toSet
    assert(got == brute)
    assert(got.nonEmpty, "the near-dup corpus should produce phash pairs")
  }

  test("phash locality: an edit inside one block flips few bits") {
    import spark.implicits._
    val base = (1 to 128).map(i => ('a' + i % 26).toChar).mkString // 128 chars, bl = 2
    val edited = base.updated(10, 'Z') // one char inside block 5
    val m = Seq((1L, base), (2L, edited)).toDF("media_id", "s")
      .select(col("media_id"), encode(col("s"), "UTF-8").as("payload"))
    val pairs = Multimodal.phashPairs(m, maxHamming = 3).collect()
    assert(pairs.length == 1, "single-block edit must stay within Hamming 3")
    assert(pairs.head.getAs[Number]("hamming").longValue <= 1L)
  }
}
