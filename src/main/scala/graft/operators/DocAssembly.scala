package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2-K7 (multimodal columns) + §2-K8 (search-document assembly —
  * the trireme Cassandra-row → Solr-document transform stage). */
object DocAssembly {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** K7 — heterogeneous payloads (text + vector + metadata struct) packed
    * into one nested column, transformed while packed, then unpacked.
    * Proves nested-type plumbing survives transforms losslessly. */
  val multimodalCols = Q(
    "multimodal_cols",
    """SELECT d.doc_id, upper(d.source) AS source_up, length(d.text) AS text_len,
      |  len(e.embedding) AS vec_dim, e.label, d.lang
      |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val packed = t(s, dir, "documents")
      .join(t(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), struct(
        col("text"),
        struct(col("lang"), col("source")).as("meta"),
        col("embedding"), col("label")).as("payload"))
    // Transform while packed (withField rewrites inside the struct), then
    // unpack — the round-trip the K7 contract demands.
    packed
      .withColumn("payload",
        col("payload").withField("meta.source", upper(col("payload.meta.source"))))
      .select(
        col("doc_id"),
        col("payload.meta.source").as("source_up"),
        length(col("payload.text")).as("text_len"),
        size(col("payload.embedding")).as("vec_dim"),
        col("payload.label").as("label"),
        col("payload.meta.lang").as("lang"))
      .orderBy("doc_id")
  }

  /** K7 — opaque binary payload carriage: text encoded to a binary column
    * with typed metadata, shipped through a transform, length+base64
    * verified. The decode stage for real image/audio bytes is
    * [[multimodalDecode]]. */
  val multimodalBinary = Q(
    "multimodal_binary",
    """SELECT doc_id, n_chars AS payload_bytes,
      |  base64(CAST(substr(text, 1, 16) AS BLOB)) AS head_b64, source
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("source"), col("n_chars"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("payload_bytes"),
        base64(substring(col("payload"), 1, 16)).as("head_b64"),
        col("source"))
      .orderBy("doc_id")
  }

  /** Real image codec on the JDK's built-in ImageIO PNG reader/writer —
    * no external codec jars ship in this container, but `javax.imageio`
    * ships in the JDK itself, so the decode/resize kernels run a REAL
    * encode→decode roundtrip. The corpus carries no media bytes, so the
    * ingest step renders a deterministic 16×16 RGB PNG from each
    * document's text (channels cycle over the UTF-8 bytes); every stage
    * after that point is the production pipeline shape: payload bytes →
    * codec → typed record. */
  object Png {
    // ImageIO defaults to a FILE-backed stream cache: every read/write
    // spills through a temp file — a per-row disk roundtrip under 32
    // concurrent tasks (and a non-starter on executors at scale). The
    // payloads here are small in-memory byte arrays; cache in heap.
    javax.imageio.ImageIO.setUseCache(false)
    val Side = 16
    /** Deterministic PNG payload from text (the media-less-corpus ingest
      * stand-in; everything downstream is a real codec call). */
    def render(text: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        Side, Side, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length
      var i = 0
      while (i < Side * Side) {
        val rgb =
          if (n == 0) 0
          else ((bytes(i % n) & 0xff) << 16) |
            ((bytes((i * 3 + 1) % n) & 0xff) << 8) |
            (bytes((i * 7 + 2) % n) & 0xff)
        img.setRGB(i % Side, i / Side, rgb)
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    /** Real decode: (width, height, pixel checksum). Codec-layout-free:
      * the checksum folds decoded pixels, not container bytes. */
    def decode(bytes: Array[Byte]): (Int, Int, Long) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      var cs = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          cs = cs * 31 + (img.getRGB(x, y) & 0xffffff); x += 1
        }
        y += 1
      }
      (img.getWidth, img.getHeight, cs)
    }
    /** Real resize: decode → nearest-neighbor scale → re-encode PNG. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val src = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g.drawImage(src, 0, 0, w, h, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }
  }

  /** Decoded-media record produced by the decoder. */
  final case class DecodedMedia(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, checksum: Long)

  /** K7 — media decode: binary payload → per-partition batch decode via
    * mapPartitions with a typed Encoder (the Scala analogue of mapInPandas
    * batching). The kernel is the JDK ImageIO PNG codec (see [[Png]]) —
    * real bytes in, real decoded pixels out. No SQL oracle (no codec in
    * DuckDB); EntrySpec pins the roundtrip against an independent pixel
    * recomputation. */
  val multimodalDecode = Q.noOracle("multimodal_decode") { (s, dir) =>
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("text").as("text"))
    implicit val enc = Encoders.product[DecodedMedia]
    docs.mapPartitions { rows =>
      // One codec context per partition (expensive init amortized over the
      // batch — the mapInPandas shape). ImageIO readers are per-thread.
      rows.map { r =>
        val id = r.getLong(0)
        val payload = Png.render(r.getString(1)) // ingest: text → PNG bytes
        val (w, h, cs) = Png.decode(payload)     // REAL codec decode
        DecodedMedia(id, payload.length.toLong, w, h, cs)
      }
    }(enc).orderBy("doc_id").toDF()
  }

  /** K8 — search-document assembly: relational row → flat document with
    * dynamic-suffix fields (`*_s` string, `*_d` double, `*_ss` multivalued)
    * — the trireme transform stage. Field map is emitted as sorted `k=v`
    * entries (deterministic; Solr field order is irrelevant). Multivalued
    * fields come from a collect_list aggregation over the child table. */
  val solrDocAssembly = Q(
    "solr_doc_assembly",
    """SELECT c_custkey AS id,
      |  array_to_string(list_sort([
      |    'name_s=' || c_name,
      |    'segment_s=' || c_mktsegment,
      |    'acctbal_d=' || CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR),
      |    'nation_i=' || CAST(c_nationkey AS VARCHAR)]), '|') AS fields,
      |  COALESCE(array_to_string(p.prios, ','), '') AS priorities_ss,
      |  COALESCE(p.n_orders, 0) AS n_orders_i
      |FROM customer LEFT JOIN (
      |  SELECT o_custkey, list_sort(list(DISTINCT o_orderpriority)) AS prios,
      |         COUNT(*) AS n_orders
      |  FROM orders GROUP BY o_custkey) p ON c_custkey = o_custkey
      |ORDER BY id""".stripMargin) { (s, dir) =>
    val doc = map_from_entries(array(
      struct(lit("name_s").as("key"), col("c_name").as("value")),
      struct(lit("segment_s").as("key"), col("c_mktsegment").as("value")),
      struct(lit("acctbal_d").as("key"),
        col("c_acctbal").cast("decimal(12,2)").cast("string").as("value")),
      struct(lit("nation_i").as("key"),
        col("c_nationkey").cast("string").as("value"))))
    val multivalued = t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(
        array_sort(collect_set(col("o_orderpriority"))).as("prios"),
        count(lit(1)).as("n_orders"))
    t(s, dir, "customer")
      .join(multivalued, col("c_custkey") === col("o_custkey"), "left_outer")
      .withColumn("doc", doc)
      .select(
        col("c_custkey").as("id"),
        // Rendered as '|'-joined k=v entries: deterministic AND hashable by
        // the driver's comparator (raw array columns are not).
        array_join(array_sort(transform(map_entries(col("doc")),
          e => concat(e.getField("key"), lit("="), e.getField("value")))), "|")
          .as("fields"),
        array_join(coalesce(col("prios"), array().cast("array<string>")), ",")
          .as("priorities_ss"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders_i"))
      .orderBy("id")
  }

  /** Decoded-audio record: real WAV-container metadata + signal features. */
  final case class AudioFeatures(doc_id: Long, n_bytes: Long,
      sample_rate: Int, n_samples: Long, duration_ms: Double,
      rms: Double, zero_crossings: Long)

  /** K7 — audio decode + feature extraction, the third modality. The JDK
    * ships a real WAV codec (`javax.sound.sampled`): ingest synthesizes a
    * deterministic 8 kHz 16-bit mono PCM clip from each document's text
    * (one byte → one sample, scaled), wraps it in a real WAV container via
    * AudioSystem, and the kernel decodes it back (AudioInputStream) and
    * extracts signal features: RMS energy and zero-crossing count — the
    * standard cheap audio-quality signals. Same mapPartitions typed-batch
    * shape as image decode. */
  val multimodalAudio = Q.noOracle("multimodal_audio_features") { (s, dir) =>
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("text").as("text"))
    implicit val enc = Encoders.product[AudioFeatures]
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val wav = Wav.render(r.getString(1))      // ingest: text → WAV bytes
        val (sr, samples) = Wav.decode(wav)       // REAL codec decode
        var sumSq = 0.0
        var zc = 0L
        var i = 0
        while (i < samples.length) {
          val v = samples(i).toDouble / 32768.0
          sumSq += v * v
          if (i > 0 && ((samples(i) >= 0) != (samples(i - 1) >= 0))) zc += 1
          i += 1
        }
        val n = samples.length
        AudioFeatures(id, wav.length.toLong, sr, n.toLong,
          if (sr == 0) 0.0 else n * 1000.0 / sr,
          if (n == 0) 0.0 else math.sqrt(sumSq / n), zc)
      }
    }(enc).orderBy("doc_id").toDF()
  }

  /** Real audio codec on the JDK's built-in WAV reader/writer. */
  object Wav {
    val SampleRate = 8000
    /** Deterministic 16-bit mono PCM WAV from text: byte b → sample
      * ((b-128) << 8), i.e. full-scale signed audio. */
    def render(text: String): Array[Byte] = {
      val bytes = text.getBytes("UTF-8")
      val pcm = new Array[Byte](bytes.length * 2)
      var i = 0
      while (i < bytes.length) {
        val sample = (((bytes(i) & 0xff) - 128) << 8).toShort
        pcm(2 * i) = (sample & 0xff).toByte           // little-endian
        pcm(2 * i + 1) = ((sample >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        SampleRate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, bytes.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    /** Real decode: WAV container → (sampleRate, 16-bit samples). */
    def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      val raw = ais.readAllBytes()
      val out = new Array[Short](raw.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = (((raw(2 * i + 1) & 0xff) << 8) | (raw(2 * i) & 0xff)).toShort
        i += 1
      }
      (fmt.getSampleRate.toInt, out)
    }
  }

  /** Resized-media record: payload carried through a binary→binary
    * transform with typed size metadata plus the decoded-pixel checksum
    * of the resized image. */
  final case class ResizedMedia(doc_id: Long, orig_bytes: Long,
      resized_bytes: Long, width: Int, height: Int, checksum: Long,
      payload: Array[Byte])

  /** K7 — resize: binary→binary batch transform with the same
    * per-partition batching shape as decode. The kernel is REAL:
    * ImageIO decode → nearest-neighbor 16×16→8×8 scale → PNG re-encode
    * (see [[Png]]). The plumbing (typed encoder, binary column in AND
    * out, partition batching) is the production contract. */
  val multimodalResize = Q.noOracle("multimodal_resize") { (s, dir) =>
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("text").as("text"))
    implicit val enc = Encoders.product[ResizedMedia]
    docs.mapPartitions { rows =>
      val (tw, th) = (8, 8) // per-partition codec config, init once
      rows.map { r =>
        val id = r.getLong(0)
        val orig = Png.render(r.getString(1))   // ingest: text → PNG bytes
        val resized = Png.resize(orig, tw, th)  // REAL decode→scale→encode
        val (w, h, cs) = Png.decode(resized)
        ResizedMedia(id, orig.length.toLong, resized.length.toLong,
          w, h, cs, resized)
      }
    }(enc).orderBy("doc_id").toDF()
  }

  /** K7 — "frame sampling": one binary payload → many frame rows (the
    * video shape: every k-th fixed-size block becomes a frame record).
    * Generator output (one→many) + per-frame checksum, all computed in the
    * partition batch. This is the one remaining stand-in kernel: the JDK
    * ships no video codec (decode/resize above use the real ImageIO PNG
    * path); a production build swaps the block sampler for e.g. javacv
    * frame grabs — the one→many generator shape is the contract. */
  val multimodalFrameSample = Q.noOracle("multimodal_framesample") { (s, dir) =>
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    import s.implicits._
    docs.flatMap { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      val frameSize = 16
      val stride = 4 // sample every 4th frame
      val nFrames = bytes.length / frameSize
      (0 until nFrames by stride).map { f =>
        val frame = java.util.Arrays.copyOfRange(
          bytes, f * frameSize, (f + 1) * frameSize)
        var checksum = 0L
        frame.foreach(b => checksum = checksum * 31 + (b & 0xff))
        (id, f, checksum)
      }
    }.toDF("doc_id", "frame_idx", "frame_checksum")
      .orderBy("doc_id", "frame_idx")
  }

  /** Safe-decode record: null metadata + audit column for poison rows. */
  final case class DecodedMediaSafe(doc_id: Long, n_bytes: Long,
      width: Option[Int], height: Option[Int], checksum: Option[Long],
      error: Option[String])

  /** Per-row SAFE decode: the [[Png.decode]] kernel wrapped in the
    * poison-payload contract (round 15, VERDICT r14 next-item 7) — at
    * 100 TB corrupt binaries are certain, and a codec exception must
    * neither kill the stage nor silently vanish the row. Failures yield
    * NULL metadata plus a deterministic audit tag (the exception class —
    * messages can carry JVM-specific detail; the class is stable), the
    * null+audit twin of the CHECK-constraint dead-letter pattern.
    * ImageIO's two failure modes both divert: an unrecognized container
    * returns null (no reader claimed it), a truncated/corrupt recognized
    * one throws. */
  def decodeSafe(id: Long, payload: Array[Byte]): DecodedMediaSafe =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null)
        DecodedMediaSafe(id, payload.length.toLong, None, None, None,
          Some("UnrecognizedContainer"))
      else {
        var cs = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            cs = cs * 31 + (img.getRGB(x, y) & 0xffffff); x += 1
          }
          y += 1
        }
        DecodedMediaSafe(id, payload.length.toLong, Some(img.getWidth),
          Some(img.getHeight), Some(cs), None)
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        DecodedMediaSafe(id, payload.length.toLong, None, None, None,
          Some(e.getClass.getSimpleName))
    }

  /** Column predicate for the planted-poison id classes — the ONE
    * definition every consumer (the declared key, the Verify selfcheck,
    * MultimodalSafeSpec, the scale probe) derives from; changing the
    * planting scheme here updates them all (code review round-15). */
  def poisonPlanted(idCol: Column): Column =
    idCol % 17 === 0 || idCol % 17 === 5

  /** Deterministic payload corruption for the declared poison fixture:
    * doc_id ≡ 0 (mod 17) truncates the PNG mid-stream (recognized
    * container, then a decode failure); doc_id ≡ 5 (mod 17) zeroes the
    * magic bytes (no reader claims it). Everything else passes through.
    * Keep in lockstep with [[poisonPlanted]]. */
  def plantPoison(id: Long, payload: Array[Byte]): Array[Byte] =
    if (id >= 0 && id % 17 == 0)
      java.util.Arrays.copyOfRange(payload, 0,
        math.max(12, payload.length / 3))
    else if (id >= 0 && id % 17 == 5) {
      val p = payload.clone()
      var i = 0
      while (i < math.min(8, p.length)) { p(i) = 0; i += 1 }
      p
    } else payload

  /** K7-robustness — the declared poison-payload decode: the corpus
    * renders to PNG payloads with ~2/17 of them deterministically
    * corrupted ([[plantPoison]] — one truncation class, one bad-magic
    * class), and the SAFE decode diverts exactly those rows to null
    * metadata + audit while decoding the rest identically to
    * [[multimodalDecode]]'s kernel. No-oracle (no codec in DuckDB);
    * MultimodalSafeSpec pins the diversion partition and clean-row
    * equivalence; the Verify selfcheck re-proves the planted/diverted
    * match every run. */
  val multimodalDecodeSafe = Q.noOracle("multimodal_decode_safe") { (s, dir) =>
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("text").as("text"))
    implicit val enc = Encoders.product[DecodedMediaSafe]
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        decodeSafe(id, plantPoison(id, Png.render(r.getString(1))))
      }
    }(enc).orderBy("doc_id").toDF()
  }

  /** Per-image dHash record: 64-bit perceptual fingerprint. */
  final case class PhashRec(doc_id: Long, phash: Long)

  /** Difference-hash (dHash) of a PNG payload through the REAL codec path:
    * decode → codec nearest-neighbor resize to 9×8 → decode → luminance →
    * bit (x,y) = lum(x,y) > lum(x+1,y), packed into one long. */
  def dHash(payload: Array[Byte]): Long = {
    val small = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.resize(payload, 9, 8)))
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        def lum(px: Int): Double = {
          val r = (px >> 16) & 0xff; val g = (px >> 8) & 0xff; val b = px & 0xff
          0.299 * r + 0.587 * g + 0.114 * b
        }
        if (lum(small.getRGB(x, y)) > lum(small.getRGB(x + 1, y)))
          bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** K7-scale — image near-duplicate pairs via perceptual hash: render →
    * REAL codec dHash per doc (mapPartitions batch), then banded hamming
    * LSH — the 64-bit fingerprint splits into SEVEN bands (6×9 bits +
    * 1×10), candidates EQUI-join on (band index, band value), exact
    * popcount(xor) verifies. With 7 bands, any pair within the declared
    * hamming ≤ 6 threshold has at most 6 corrupted bands, so at least one
    * band matches — FULL recall at the threshold by pigeonhole, never a
    * cross join. The image twin of dedup_simhash; rows-only driver check
    * (no codec in DuckDB), PhashSpec pins the exact-duplicate ⊆ output
    * invariant and the clean-band guarantee.
    *
    * Liveness sentinels (round-6): the shipped corpus has no organic
    * near-dup images at small SFs, so the bare pipeline emits 0 rows and
    * the driver's rows>0 check was vacuous. Two reserved NEGATIVE ids
    * carry byte-identical rendered payloads — a guaranteed hamming-0 pair
    * (-2,-1) in the output at every scale, making the rows-only check
    * detect a broken pipeline (codec, banding, join, or filter) instead
    * of passing on emptiness. Organic pairs are unaffected: sentinel ids
    * cannot collide with corpus doc_ids (all ≥ 0). */
  val multimodalPhash = Q.noOracle("multimodal_phash") { (s, dir) =>
    import s.implicits._
    val sentinels = Seq(
      (-2L, "graft phash liveness sentinel"),
      (-1L, "graft phash liveness sentinel")).toDF("doc_id", "text")
    phashPairs(s, t(s, dir, "documents").select(col("doc_id"), col("text"))
      .unionAll(sentinels))
  }

  /** 7-band split of a 64-bit fingerprint in column `phash`: bands 0-5
    * take 9 bits each, band 6 the top 10 — exactly covering bits 0..63.
    * ≤ 6 bit flips corrupt ≤ 6 bands, leaving ≥ 1 band equal. */
  private[graft] val phashBandExpr =
    """transform(sequence(0, 6),
      |  b -> struct(b as band,
      |    shiftright(phash, b * 9) & (case when b = 6 then 1023 else 511 end)
      |      as bv))""".stripMargin

  /** Shared phash near-dup pipeline over a (doc_id, text) corpus. */
  def phashPairs(s: SparkSession, docs: DataFrame): DataFrame = {
    implicit val enc = Encoders.product[PhashRec]
    val hashed = docs.mapPartitions { rows =>
      rows.map { r => PhashRec(r.getLong(0), dHash(Png.render(r.getString(1)))) }
    }(enc).toDF()
    val banded = hashed.select(col("doc_id"), col("phash"),
      explode(expr(phashBandExpr)).as("bd"))
      .select(col("doc_id"), col("phash"),
        col("bd.band").as("band"), col("bd.bv").as("bv"))
    val a = banded.select(col("doc_id").as("a_id"), col("phash").as("a_hash"),
      col("band"), col("bv"))
    val b = banded.select(col("doc_id").as("b_id"), col("phash").as("b_hash"),
      col("band").as("band2"), col("bv").as("bv2"))
    a.join(b, col("band") === col("band2") && col("bv") === col("bv2") &&
        col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_hash", "b_hash")
      .distinct()
      .select(col("a_id"), col("b_id"),
        expr("cast(bit_count(a_hash ^ b_hash) as bigint)").as("hamming"))
      .filter(col("hamming") <= 6)
      .orderBy("a_id", "b_id")
  }

  val all: Seq[Q] = Seq(multimodalCols, multimodalBinary, multimodalDecode,
    multimodalResize, multimodalAudio, multimodalFrameSample, solrDocAssembly,
    multimodalPhash, multimodalDecodeSafe)
}
