package graft

import graft.multimodal.{MediaAsset, Multimodal}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub: deterministic features from payload bytes") {
    val asset = MediaAsset(7L, Array[Byte](0, 10, 20), "image/fake", 640, 480)
    val f = Multimodal.decodeStub(asset)
    assert(f.doc_id === 7L)
    assert(f.byte_len === 3L)
    assert(math.abs(f.mean_byte - 10.0) < 1e-12)
    assert(f.head_features === Seq(0.0f, 10 / 255.0f, 20 / 255.0f))
  }

  test("distributed batch decode preserves schema and row count") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.columns.toSeq ===
      Seq("doc_id", "media_type", "byte_len", "mean_byte", "head_features",
        "decoder"))
    // the stub path must be labeled as such in the data
    assert(feats.select("decoder").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("stub"))
    assert(feats.count() === 500)
    // byte_len of the fake payload equals n_chars (ascii text)
    val joined = feats.join(Tables.t(spark, sfDir, "documents"), "doc_id")
      .filter($"byte_len" =!= $"n_chars").count()
    assert(joined === 0)
  }

  test("REAL codec: PNG payloads decode through the mapPartitions batch lifecycle") {
    // Deterministic gray PNGs generated with javax.imageio (the same
    // public codec the executor-side ImageIoDecoder uses — but encode
    // here, decode there, so a bit-identity shortcut can't hide a
    // broken decode path). Pixel (x, y) of doc k = (k * 31 + y * w + x) % 256.
    def pngBytes(k: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, ((k * 31 + y * w + x) % 256).toInt)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val dims = Seq((0L, 5, 4), (1L, 8, 8), (2L, 3, 7), (3L, 1, 1))
    val assets = dims.map { case (k, w, h) =>
      MediaAsset(k, pngBytes(k, w, h), "image/png", w, h)
    }
    val media = spark.createDataset(assets).repartition(3).toDF()
    val feats = Multimodal
      .extractFeaturesWith(spark, media)(() => new Multimodal.ImageIoDecoder)
      .orderBy("doc_id")
      .as[graft.multimodal.MediaFeatures].collect()
    assert(feats.length === 4)
    feats.zip(dims.sortBy(_._1)).foreach { case (f, (k, w, h)) =>
      val px = (0 until w * h).map(i => (k * 31 + i) % 256)
      assert(f.byte_len === w.toLong * h, s"pixel count of doc $k")
      assert(math.abs(f.mean_byte - px.sum.toDouble / px.size) < 1e-12,
        s"mean sample of doc $k")
      assert(f.head_features === px.take(8).map(_ / 255.0f),
        s"head samples of doc $k")
    }
    // undecodable payload fails loudly, not with zeroed features
    val junk = spark.createDataset(Seq(
      MediaAsset(9L, Array[Byte](1, 2, 3), "image/png", 1, 1))).toDF()
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeaturesWith(spark, junk)(
        () => new Multimodal.ImageIoDecoder).collect()
    }
    assert(err.getMessage.contains("undecodable") ||
      Option(err.getCause).exists(_.getMessage.contains("undecodable")))
  }

  test("REAL codec: BMP payloads decode through the same ImageIO dispatch") {
    // A second lossless container through the identical lifecycle —
    // proves the decoder dispatches on the payload's actual format
    // (ImageIO sniffs the magic bytes), not on a hardcoded PNG path.
    // JPEG is deliberately not used for value assertions: DCT is lossy.
    def bmpBytes(k: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, ((k * 17 + y * w + x) % 256).toInt)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "bmp", bos))
      bos.toByteArray
    }
    val dims = Seq((0L, 6, 3), (1L, 2, 9))
    val assets = dims.map { case (k, w, h) =>
      MediaAsset(k, bmpBytes(k, w, h), "image/bmp", w, h)
    }
    val media = spark.createDataset(assets).repartition(2).toDF()
    val feats = Multimodal
      .extractFeaturesWith(spark, media)(() => new Multimodal.ImageIoDecoder)
      .orderBy("doc_id")
      .as[graft.multimodal.MediaFeatures].collect()
    assert(feats.length === 2)
    feats.zip(dims.sortBy(_._1)).foreach { case (f, (k, w, h)) =>
      val px = (0 until w * h).map(i => (k * 17 + i) % 256)
      assert(f.byte_len === w.toLong * h, s"pixel count of doc $k")
      assert(math.abs(f.mean_byte - px.sum.toDouble / px.size) < 1e-12,
        s"mean sample of doc $k")
      assert(f.head_features === px.take(8).map(_ / 255.0f),
        s"head samples of doc $k")
    }
  }

  test("REAL codec: WAV payloads decode through the mapPartitions batch lifecycle") {
    // Deterministic PCM WAVs encoded with javax.sound.sampled (encode
    // here, decode on the executor side via JavaSoundDecoder). Sample i
    // of doc k = ((k * 97 + i * 13) % 1024) - 512.
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}
    def sample(k: Long, i: Int): Int = (((k * 97 + i * 13) % 1024) - 512).toInt
    def wavBytes(k: Long, n: Int, channels: Int): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, channels, true, false) // 16-bit LE PCM
      val raw = new Array[Byte](n * 2 * channels)
      for (i <- 0 until n; c <- 0 until channels) {
        // non-first channels carry junk the decoder must ignore
        val v = if (c == 0) sample(k, i) else 0x7FFF
        val off = (i * channels + c) * 2
        raw(off) = v.toByte; raw(off + 1) = (v >> 8).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val specs = Seq((0L, 20, 1), (1L, 7, 2), (2L, 3, 1))
    val assets = specs.map { case (k, n, ch) =>
      MediaAsset(k, wavBytes(k, n, ch), "audio/wav", n, ch)
    }
    val media = spark.createDataset(assets).repartition(2).toDF()
    val feats = Multimodal
      .extractFeaturesWith(spark, media)(() => new Multimodal.JavaSoundDecoder)
      .orderBy("doc_id")
      .as[graft.multimodal.MediaFeatures].collect()
    assert(feats.length === 3)
    feats.zip(specs.sortBy(_._1)).foreach { case (f, (k, n, _)) =>
      val xs = (0 until n).map(sample(k, _))
      assert(f.byte_len === n.toLong, s"frame count of doc $k")
      assert(math.abs(f.mean_byte - xs.sum.toDouble / n) < 1e-12,
        s"mean sample of doc $k")
      assert(f.head_features === xs.take(8).map(_ / 32768.0f),
        s"head samples of doc $k")
    }
    // undecodable payload fails loudly, not with zeroed features
    val junk = spark.createDataset(Seq(
      MediaAsset(9L, Array[Byte](1, 2, 3), "audio/wav", 1, 1))).toDF()
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeaturesWith(spark, junk)(
        () => new Multimodal.JavaSoundDecoder).collect()
    }
    assert(err.getMessage.contains("undecodable") ||
      Option(err.getCause).exists(_.getMessage.contains("undecodable")))
  }

  test("chunk sampling yields ceil(len/(chunk*stride)) chunks of bounded size") {
    val media = Multimodal.mediaTable(spark, sfDir).limit(20)
    val chunks = Multimodal.sampleChunks(media, chunk = 32, stride = 4)
    val bad = chunks.filter(length($"chunk_bytes") > 32).count()
    assert(bad === 0)
    val counts = chunks.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .join(Tables.t(spark, sfDir, "documents"), "doc_id")
      .select($"n", (($"n_chars" - 1) / 128).cast("int") + 1)
      .as[(Long, Int)].collect()
    counts.foreach { case (n, expected) => assert(n === expected.toLong) }
  }

  test("REAL codec: MJPEG-AVI video decodes frame-by-frame through the " +
    "batch lifecycle; stub refuses video") {
    // Build a 3-frame MJPEG AVI from scratch: JPEG-encode three gray
    // frames (the JDK codec), then assemble the RIFF container by hand
    // — encode here, container-parse + decode there. JPEG is lossy, so
    // expectations come from decoding the SAME jpeg bytes directly:
    // container parsing must be exact even where pixel values are
    // codec-defined.
    val (w, h) = (8, 6)
    def jpegBytes(k: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (k * 60 + y * w + x) % 256)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    val frames = (0 until 3).map(jpegBytes)
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array[Byte]()
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
    }
    def list(subtype: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", subtype.getBytes("US-ASCII") ++ body)
    val avih = new Array[Byte](56)
    Seq(0 -> 40000L, 16 -> frames.size.toLong, 32 -> w.toLong,
      36 -> h.toLong).foreach { case (off, v) =>
      System.arraycopy(le32(v), 0, avih, off, 4)
    }
    val avi = "RIFF".getBytes("US-ASCII") ++ {
      val body = "AVI ".getBytes("US-ASCII") ++
        list("hdrl", chunk("avih", avih)) ++
        list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
      le32(body.length) ++ body
    }
    // expectations: decode the same JPEGs directly
    val expectMeans = frames.map { f =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      var s = 0L
      for (y <- 0 until h; x <- 0 until w) s += img.getRaster.getSample(x, y, 0)
      s.toDouble / (w * h)
    }
    val media = spark.createDataset(Seq(
      MediaAsset(7L, avi, "video/x-msvideo", w, h))).toDF()
    val out = Multimodal
      .extractFeaturesWith(spark, media)(() => new Multimodal.AviMjpegDecoder)
    val f = out.as[graft.multimodal.MediaFeatures].collect().head
    assert(out.select("decoder").head().getString(0) === "real")
    assert(f.byte_len === 3L * w * h, "decoded sample count")
    assert(math.abs(f.mean_byte - expectMeans.sum / 3) < 1e-12)
    assert(f.head_features.size === 3)
    f.head_features.zip(expectMeans).foreach { case (got, m) =>
      assert(math.abs(got - (m / 255.0).toFloat) < 1e-7f)
    }
    // a non-AVI payload fails loudly with the asset id
    val junk = spark.createDataset(Seq(
      MediaAsset(8L, Array[Byte](9, 9, 9, 9), "video/x-msvideo", 1, 1))).toDF()
    val e1 = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeaturesWith(spark, junk)(
        () => new Multimodal.AviMjpegDecoder).collect()
    }
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).mkString)
      .contains("not a RIFF/AVI"))
    // and the STUB refuses video outright — byte-math video features
    // cannot ship even before provenance filtering
    val e2 = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(spark, media).collect()
    }
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).mkString)
      .contains("stub decode refused for video"))
  }
}
