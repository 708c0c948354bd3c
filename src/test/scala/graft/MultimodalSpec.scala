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

  // --- real-codec seam (round-11): pure-JVM PPM decode + pixel aHash ---

  private def ppm(w: Int, h: Int)(px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val body = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val p = (y * w + x) * 3
      body(p) = r.toByte
      body(p + 1) = g.toByte
      body(p + 2) = b.toByte
    }
    header ++ body
  }

  test("PPM parser decodes a handcrafted image to exact pixels and features") {
    // 4x4 gray image: pixel (x,y) = gray level x + 4y; the 4x4 feature
    // grid has one pixel per cell, so feature g = its exact luminance
    val img = ppm(4, 4)((x, y) => { val v = 10 * (x + 4 * y); (v, v, v) })
    val parsed = Multimodal.parsePpm(img)
    assert(parsed.w == 4 && parsed.h == 4 && parsed.rgb.length == 48)
    assert((parsed.rgb(0) & 0xff) == 0 && (parsed.rgb(45) & 0xff) == 150)
    val feats = Multimodal.decodePpm(img)
    val expect = (0 until 16).map { g =>
      val v = 10.0 * g
      (0.299 * v + 0.587 * v + 0.114 * v).toFloat
    }
    assert(feats.toSeq == expect)
    // malformed payloads are rejected, not misparsed
    intercept[IllegalArgumentException](Multimodal.parsePpm("P5\n1 1\n255\nx".getBytes))
    intercept[IllegalArgumentException](Multimodal.parsePpm(img.dropRight(5)))
  }

  test("the real codec rides the extractFeatures seam unchanged") {
    import spark.implicits._
    val imgs = Seq(
      (1L, ppm(8, 8)((x, y) => (x * 30, y * 30, 128))),
      (2L, ppm(6, 4)((x, y) => (200 - x * 20, 10, y * 50))))
    val media = imgs.toDF("media_id", "payload").withColumn("kind", lit("image"))
    val got = Multimodal.extractFeatures(media, Multimodal.decodePpm)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    imgs.foreach { case (id, bytes) =>
      assert(got(id) == Multimodal.decodePpm(bytes).toSeq, s"media $id")
    }
  }

  test("pixel aHash: brightness-invariant, localized edits flip few bits") {
    def base(dx: Int) = ppm(32, 32)((x, y) => {
      val v = (x * 7 + y * 13 + dx) % 200
      (v, v, v)
    })
    val a = Multimodal.pixelAHash(base(0))
    // uniform +10 brightness (no clamping: values stay < 255): every cell
    // and the mean shift together, the hash is bit-identical
    val brighter = ppm(32, 32)((x, y) => {
      val v = (x * 7 + y * 13) % 200 + 10
      (v, v, v)
    })
    assert(Multimodal.pixelAHash(brighter) == a)
    // blow out one 4x4-pixel patch (= one 8x8-grid cell): that cell's bit
    // moves, plus at most a few cells sitting within the tiny mean shift
    val edited = ppm(32, 32)((x, y) =>
      if (x < 4 && y < 4) (255, 255, 255)
      else { val v = (x * 7 + y * 13) % 200; (v, v, v) })
    val hamEdit = java.lang.Long.bitCount(a ^ Multimodal.pixelAHash(edited))
    assert(hamEdit >= 1 && hamEdit <= 6, s"localized edit flipped $hamEdit bits")
    // an unrelated image (inverted gradient) decorrelates
    val other = ppm(32, 32)((x, y) => {
      val v = 199 - (x * 7 + y * 13) % 200
      (v, v, v)
    })
    assert(java.lang.Long.bitCount(a ^ Multimodal.pixelAHash(other)) > 10)
  }

  test("pixelPhashPairs finds the real near-dup pair over decoded pixels") {
    import spark.implicits._
    def grad(flip: Boolean) = ppm(32, 32)((x, y) => {
      val v0 = (x * 7 + y * 13) % 200
      val v = if (flip) 199 - v0 else v0
      (v, v, v)
    })
    // 2 = copy of 1 with a 2x2-pixel touch-up inside one grid cell
    val touched = ppm(32, 32)((x, y) =>
      if (x >= 8 && x < 10 && y >= 8 && y < 10) (255, 255, 255)
      else { val v = (x * 7 + y * 13) % 200; (v, v, v) })
    val media = Seq((1L, grad(false)), (2L, touched), (3L, grad(true)))
      .toDF("media_id", "payload")
    val pairs = Multimodal.pixelPhashPairs(media, maxHamming = 3)
      .select("x_id", "y_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("CDC fingerprint: insertions/deletions flip O(1) bits (boundaries realign)") {
    import spark.implicits._
    // LCG stream: aperiodic over the sample (a periodic pattern makes
    // chunks repeat and collapses the fingerprint to a few bits)
    def lcgText(seed: Long, n: Int): String = {
      var v = seed
      (1 to n).map { _ => v = (v * 48271 + 11) % 1009; ('a' + v % 26).toChar }.mkString
    }
    val base = lcgText(7, 300)
    val variants = Seq(
      1L -> base,
      2L -> (base.take(150) + "XYZZY" + base.drop(150)), // 5-char insertion
      3L -> (base.take(100) + base.drop(107)),           // 7-char deletion
      4L -> (base.take(150) + "Q" + base.drop(151)),     // same-length edit
      5L -> lcgText(993, 300))                           // unrelated content
    val media = variants.toDF("media_id", "s")
      .select(col("media_id"), encode(col("s"), "UTF-8").as("payload"))
    val fps = Multimodal.cdcFingerprint(media, w = 8)
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(fps(a) ^ fps(b))
    // length-CHANGING edits stay local — the property the linear-block
    // pHash cannot have (its locality contract is scoped to same-length)
    assert(ham(1, 2) >= 1 && ham(1, 2) <= 6, s"insert flipped ${ham(1, 2)}")
    assert(ham(1, 3) >= 1 && ham(1, 3) <= 6, s"delete flipped ${ham(1, 3)}")
    assert(ham(1, 4) >= 1 && ham(1, 4) <= 4, s"substitution flipped ${ham(1, 4)}")
    assert(ham(1, 5) > 6, s"unrelated content only ${ham(1, 5)} apart")
    // and the pigeonhole pair join surfaces exactly the near-dups
    val pairs = Multimodal.cdcPairs(media, maxHamming = 6)
      .select("x_id", "y_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
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

  test("integer-exact aHash matches the float form and the fixture recipe") {
    // away from exact mean ties the integer cross-product compare and the
    // float mean compare agree bit-for-bit
    def img(dx: Int) = ppm(32, 32)((x, y) => {
      val v = (x * 7 + y * 13 + dx) % 200
      (v, (v * 3) % 200, (v * 5) % 200)
    })
    (0 until 5).foreach { dx =>
      assert(
        Multimodal.pixelAHashExact(img(dx)) == Multimodal.pixelAHash(img(dx)),
        s"dx=$dx")
    }
    // the q184 fixture: real PPM bytes through the REAL parser; the edited
    // variant touches exactly one aHash cell, so the pair is hamming-close
    val k = 35L
    val a = Multimodal.pixelAHashExact(Multimodal.mkPpmFixture(k, edited = false))
    val b = Multimodal.pixelAHashExact(Multimodal.mkPpmFixture(k, edited = true))
    val ham = java.lang.Long.bitCount(a ^ b)
    assert(ham <= 3, s"planted near-dup at hamming $ham")
    // deterministic: the recipe regenerates the identical payload and hash
    assert(Multimodal.pixelAHashExact(Multimodal.mkPpmFixture(k, edited = false)) == a)
  }
}
