package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media attach: binary payload + typed metadata, schema as declared") {
    val media = Multimodal.attachMedia(Tables(spark, sf).documents)
    val schema = media.schema
    assert(schema("media").dataType.typeName == "binary")
    assert(schema("n_bytes").dataType.typeName == "long")
    val r = media.filter(col("doc_id") === 0).collect().head
    assert(r.media.length == r.n_bytes)
  }

  test("decode is deterministic and preserves row count + partitioning") {
    val media = Multimodal.attachMedia(Tables(spark, sf).documents)
      .repartition(7)
    val f1 = Multimodal.decodeFeatures(media)
    assert(f1.rdd.getNumPartitions == 7, "decode must not reshuffle")
    val a = f1.collect().map(r => r.doc_id -> r.features.toSeq).toMap
    val b = Multimodal.decodeFeatures(media).collect()
      .map(r => r.doc_id -> r.features.toSeq).toMap
    assert(a == b)
    assert(a.size == Tables(spark, sf).documents.count())
  }

  test("features are array<float> consumable by the similarity operators") {
    val feats = Multimodal.decodeFeatures(
      Multimodal.attachMedia(Tables(spark, sf).documents)).toDF()
    val sims = feats.limit(5).select(col("doc_id"), col("features"))
      .crossJoin(feats.limit(1).select(col("features").as("f2")))
      .select(graft.functions.VectorFunctions.cosineSim(
        col("features"), col("f2")).as("c"))
      .collect()
    assert(sims.forall(r => r.isNullAt(0) ||
      (r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)))
  }

  test("patch grid: tiling audit and exact brightest-patch argmax") {
    val rows = SparkEntry.queries("q_patch_grid")(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent per-doc recompute from the text twin
    val texts = Tables(spark, sf).documents
      .filter(col("doc_id") % 3 === 0)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    texts.foreach { case (id, text) =>
      val lim = ((math.min(text.length, 256) / 16) / 4) * 64
      if (lim == 0) assert(!byDoc.contains(id))
      else {
        val r = byDoc(id)
        val bytes = text.getBytes("UTF-8").take(lim).map(_ & 0xff)
        val psums = bytes.zipWithIndex
          .groupBy { case (_, i) => (i / 16 / 4) * 4 + (i % 16) / 4 }
          .view.mapValues(_.map(_._1.toLong).sum).toMap
        assert(r.getAs[Long]("n_patches") == psums.size)
        assert(r.getAs[Long]("total_sum") == bytes.map(_.toLong).sum)
        val (bestP, bestSum) =
          psums.toSeq.maxBy { case (p, s) => (s, -p) }
        assert(r.getAs[Long]("max_patch_sum") == bestSum)
        assert(r.getAs[Long]("max_pr") == bestP / 4)
        assert(r.getAs[Long]("max_pc") == bestP % 4)
      }
    }
  }

  test("real PNG encode/decode roundtrip is pixel-exact per image") {
    import graft.multimodal.Multimodal
    // a handful of ids across the (w, h, channel-base) lattice,
    // decoded LOCALLY through the same batch-iterator kernel the
    // distributed path uses — asserts the exact closed-form sums the
    // oracle of q_multimodal_decode relies on
    val ids = Seq(0L, 3L, 21L, 198L, 399L, 1200L)
    ids.foreach { d =>
      val spark0 = spark
      import spark0.implicits._
      val enc = Multimodal.encodePngs(
        Seq(d).toDF("doc_id")).collect().head
      val dec = Multimodal.ImageDecoder.decode(Iterator(enc)).next()
      val (w, h) = ((4 + d % 8).toInt, (3 + d % 5).toInt)
      assert(dec.width == w && dec.height == h, s"dims for $d")
      assert(dec.sum_r == h.toLong * (w * (d % 200) + w * (w - 1) / 2),
        s"sum_r for $d")
      assert(dec.sum_g == w.toLong * (h * (d % 180) + h * (h - 1) / 2),
        s"sum_g for $d")
      assert(dec.sum_b == w.toLong * h * (d % 100) +
        h.toLong * (w * (w - 1)) / 2 + w.toLong * (h * (h - 1)) / 2,
        s"sum_b for $d")
    }
  }

  test("real WAV encode/decode roundtrip is sample-exact per clip") {
    import graft.multimodal.Multimodal
    // ids across the (n, s0) lattice — wav-format docs are
    // doc_id % 3 == 2; the decode must recover the container-declared
    // format AND the exact closed-form PCM statistics the
    // q_audio_decode oracle recomputes arithmetically
    val ids = Seq(2L, 5L, 41L, 998L, 1202L, 3599L)
    ids.foreach { d =>
      val spark0 = spark
      import spark0.implicits._
      val enc = Multimodal.encodeWavs(
        Seq(d).toDF("doc_id")).collect().head
      // the bytes are a REAL RIFF container, not raw PCM
      assert(new String(enc.media.take(4), "US-ASCII") == "RIFF",
        s"not a RIFF container for $d")
      val dec = Multimodal.AudioDecoder.decode(Iterator(enc)).next()
      val n = (50 + d % 40).toInt
      val s0 = d % 1000
      assert(dec.n_samples == n && dec.sample_rate == 8000L &&
        dec.bits == 16 && dec.channels == 1, s"format for $d: $dec")
      assert(dec.sum_samples == n.toLong * s0 + 7L * n * (n - 1) / 2,
        s"sum_samples for $d")
      assert(dec.max_sample == s0 + 7L * (n - 1), s"max_sample for $d")
    }
  }

  test("real Y4M encode/decode roundtrip is plane-exact per clip") {
    import spark.implicits._
    val ids = Seq(1L, 4L, 7L, 22L, 103L)
    val docs = ids.map(d => (d, s"t$d")).toDF("doc_id", "text")
    val encoded = Multimodal.encodeY4m(docs).collect()
      .map(e => e.doc_id -> e).toMap
    // only doc_id % 3 == 1 carry video
    assert(encoded.keySet == ids.filter(_ % 3 == 1).toSet)
    encoded.foreach { case (d, enc) =>
      // a REAL Y4M stream: magic + C444 declared in the header
      val head = new String(enc.media.take(40), "US-ASCII")
      assert(head.startsWith("YUV4MPEG2 W"), s"not Y4M for $d: $head")
      assert(head.contains("C444"), s"chroma tag missing for $d")
      val dec = Multimodal.Y4mDecoder.decode(Iterator(enc)).next()
      val w = (8 + 2 * (d % 5)).toInt
      val h = (6 + d % 7).toInt
      val f = (2 + d % 4).toInt
      val nPix = w.toLong * h
      assert(dec.width == w && dec.height == h && dec.n_frames == f,
        s"geometry for $d: $dec")
      assert(dec.y_sum ==
        nPix * (f * (d % 100) + 3L * f * (f - 1) / 2) + f * nPix / 2,
        s"y_sum for $d")
      assert(dec.u_sum == nPix * (f * ((d % 80) + 10) + f.toLong * (f - 1)),
        s"u_sum for $d")
      assert(dec.v_sum ==
        nPix * (f * ((d % 60) + 20) + f.toLong * (f - 1) / 2),
        s"v_sum for $d")
    }
    // a truncated stream fails LOUDLY, never a silent short read
    val whole = encoded(ids.filter(_ % 3 == 1).head)
    val torn = Multimodal.EncodedVideo(whole.doc_id,
      whole.media.dropRight(5))
    assertThrows[IllegalArgumentException](
      Multimodal.Y4mDecoder.decode(Iterator(torn)).next())
  }
}
