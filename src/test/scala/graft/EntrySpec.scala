package graft

import graft.operators.DocAssembly

/** Driver-contract smoke tests (SURVEY §5.1): entry returns rows, every
  * declared query runs at sf0.001, oracle keys are consistent, and
  * column names match between Spark results and oracle SQL aliases. */
class EntrySpec extends SparkSpec {

  test("entry returns rows > 0 on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("no duplicate query keys across modules") {
    val names = SparkEntry.allQs.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.length > 1).keys
    assert(dups.isEmpty, s"duplicate keys: $dups")
  }

  test("every declared query executes at sf0.001 (schema + rows)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, sfDir).count(); None
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("PNG codec roundtrip: decode recovers the rendered pixels exactly") {
    val text = "hello world"
    val png = DocAssembly.Png.render(text)
    // Real container: PNG magic bytes.
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (w, h, cs) = DocAssembly.Png.decode(png)
    assert(w == 16 && h == 16)
    // Independent recomputation of the pixel fold from the render rule —
    // proves the codec roundtrip is lossless, not just deterministic.
    val bytes = text.getBytes("UTF-8"); val n = bytes.length
    var expected = 0L
    for (i <- 0 until 256) {
      val rgb = ((bytes(i % n) & 0xff) << 16) |
        ((bytes((i * 3 + 1) % n) & 0xff) << 8) | (bytes((i * 7 + 2) % n) & 0xff)
      expected = expected * 31 + rgb
    }
    assert(cs == expected, "decoded pixel checksum != rendered pixels")
    // Determinism + empty-text totality.
    assert(DocAssembly.Png.render(text).toSeq == png.toSeq)
    val (we, he, cse) = DocAssembly.Png.decode(DocAssembly.Png.render(""))
    assert(we == 16 && he == 16 && cse == 0L)
  }

  test("WAV codec roundtrip: decoded samples match the rendered PCM exactly") {
    val text = "hello world"
    val wav = DocAssembly.Wav.render(text)
    // Real container: RIFF/WAVE magic.
    assert(new String(wav.slice(0, 4)) == "RIFF" &&
      new String(wav.slice(8, 12)) == "WAVE")
    val (sr, samples) = DocAssembly.Wav.decode(wav)
    assert(sr == 8000 && samples.length == text.getBytes("UTF-8").length)
    val expected = text.getBytes("UTF-8")
      .map(b => (((b & 0xff) - 128) << 8).toShort).toSeq
    assert(samples.toSeq == expected, "codec roundtrip must be lossless")
    // Feature sanity on the declared query: duration = n/8000 s, rms in [0,1].
    val rows = DocAssembly.multimodalAudio.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) == 8000)
      assert(math.abs(r.getDouble(4) - r.getLong(3) * 1000.0 / 8000.0) < 1e-9)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getLong(6) >= 0 && r.getLong(6) < r.getLong(3))
    }
  }

  test("multimodal resize produces real 8x8 PNGs; frame-sample deterministic") {
    val resized = DocAssembly.multimodalResize.fn(spark, sfDir).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(r => r.getInt(3) == 8 && r.getInt(4) == 8))
    assert(resized.forall(r => r.getLong(2) < r.getLong(1)),
      "8x8 PNG must be smaller than its 16x16 source")
    // The emitted payload is itself a decodable PNG with the recorded checksum.
    val r0 = resized.head
    val (w, h, cs) = DocAssembly.Png.decode(r0.getAs[Array[Byte]](6))
    assert(w == 8 && h == 8 && cs == r0.getLong(5))
    val frames = DocAssembly.multimodalFrameSample.fn(spark, sfDir)
    val f1 = frames.collect().map(_.toSeq).toSeq
    assert(f1.nonEmpty && f1 == frames.collect().map(_.toSeq).toSeq)
  }

  test("bench headline keys are all declared") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline without query: $missing")
  }
}
