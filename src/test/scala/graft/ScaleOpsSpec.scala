package graft

import org.apache.spark.sql.functions._
import graft.operators.ScaleOps

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: word 3-grams, empty for short docs") {
    val df = Seq("a b c d e", "x y").toDF("text")
      .withColumn("sh", ScaleOps.shingles(ScaleOps.tokens(col("text"))))
    val got = df.select("sh").as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d", "c d e"))
    assert(got(1).isEmpty)
  }

  test("raster_orient with a null orientation passes through (codegen path)") {
    // An EXIF-less JPEG yields a null exif_orientation; the oriented
    // raster must be the UNCHANGED decode, not null — otherwise every
    // EXIF-less crawl image silently drops out of resize/hash/dedup.
    val df = Seq(7L).toDF("seed")
      .withColumn("payload", ScaleOps.synthJpeg(lit(16L), lit(16L), col("seed"), 2))
      .withColumn("r", ScaleOps.imageDecode(col("payload")))
      .withColumn("o", ScaleOps.exifOrientation(col("payload")))
      .withColumn("oriented", ScaleOps.rasterOrient(col("r"), col("o")))
      .select(col("o"), col("r.pixels").as("p0"), col("oriented.pixels").as("p1"))
    val row = df.collect()(0)
    assert(row.isNullAt(0), "plain fixture JPEG has no EXIF")
    assert(java.util.Arrays.equals(row.getAs[Array[Byte]]("p0"),
      row.getAs[Array[Byte]]("p1")))
  }

  test("minhash: identical docs get identical signatures, different docs differ") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words here that share nothing at all"))
      .toDF("doc_id", "text")
    val sig = ScaleOps.withMinhashSignature(df, "text", k = 4).collect()
    val bySig = sig.map(r => (r.getLong(0), (1 to 4).map(i => r.getAs[String](s"sig_$i"))))
    val m = bySig.toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
  }

  test("simhash60: identical -> hamming 0; near-dup small; unrelated large") {
    val df = Seq(
      (1L, "spark catalyst window aggregate shuffle partition broadcast join filter project"),
      (2L, "spark catalyst window aggregate shuffle partition broadcast join filter project"),
      (3L, "spark catalyst window aggregate shuffle partition broadcast join filter scan"),
      (4L, "entirely unrelated vocabulary zebra quantum violin umbrella xylophone"))
      .toDF("doc_id", "text")
      .withColumn("h", ScaleOps.simhash60(ScaleOps.tokens(col("text"))))
    val hs = df.select("doc_id", "h").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(2L)) == 0)
    assert(ham(hs(1L), hs(3L)) < ham(hs(1L), hs(4L)))
  }

  test("dotD / l2norm / cosine on known vectors") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
      .withColumn("dot", ScaleOps.dotD(col("a"), col("b")))
      .withColumn("na", ScaleOps.l2norm(col("a")))
      .withColumn("cos", ScaleOps.cosine(col("a"), col("b"),
        ScaleOps.l2norm(col("a")), ScaleOps.l2norm(col("b"))))
    val r = df.select("dot", "na", "cos").head
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
  }

  test("text stats: exact counts on a known doc") {
    val df = Seq((1L, "the cat and the dog in a house")).toDF("doc_id", "text")
    val r = ScaleOps.withTextStats(df).head
    assert(r.getAs[Long]("n_tokens") == 8)
    assert(r.getAs[Long]("n_distinct_tokens") == 7)  // "the" twice
    assert(r.getAs[Long]("n_stopwords") == 5)        // the, and, the, in, a
    assert(math.abs(r.getAs[Double]("mean_token_len") - 23.0 / 8) < 1e-12)
  }

  test("native textShingles ≡ HOF shingles(tokens) on every edge shape") {
    // consecutive/leading/trailing spaces make EMPTY tokens — the native
    // byte-scan must reproduce them and the exact substring joins;
    // multibyte UTF-8 guards the 0x20 scan; k variants cover bigrams
    val texts = Seq(
      "a b c d e", "a  b c", " a b c", "a b c ", "", " ", "  ",
      "one", "one two", "héllo wörld déjà vu", "tab\tis one token x y",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    Seq(2, 3, 5).foreach { k =>
      val both = df.select(col("id"),
        graft.operators.ScaleOps.shingles(graft.operators.ScaleOps.tokens(col("text")), k).as("hof"),
        graft.operators.ScaleOps.textShingles(col("text"), k).as("native"))
      val bad = both.filter(not(col("hof") <=> col("native"))).count()
      assert(bad == 0, s"k=$k: $bad rows differ between HOF and native shingles")
    }
    // null text: HOF yields empty array (null when-condition falls to
    // otherwise); native must match
    val nullDf = Seq((1L, Option.empty[String]), (2L, Some("x y z w"))).toDF("id", "text")
    val r = nullDf.select(col("id"),
      graft.operators.ScaleOps.shingles(graft.operators.ScaleOps.tokens(col("text"))).as("hof"),
      graft.operators.ScaleOps.textShingles(col("text")).as("native"))
      .filter(not(col("hof") <=> col("native"))).count()
    assert(r == 0, "null-text semantics differ")
  }

  test("repetition stats: hand-computed coverages and caps") {
    val df = Seq(
      (1L, "a b a b a"),      // "a b"×2 → top2 6; "a b a"×2 → top3 10 (>len 9, frac caps); no dup 5-gram
      (2L, "x x x x x x"),    // "x x"×5 → 15; "x x x x x"×2 → dup5 18; len 11 → both cap at 1.0
      (3L, ""),               // no grams, len 0 → guarded zero fracs
      (4L, "é é é"),          // unicode: charlen not bytelen — "é é"×2 → top2 6, len 5 → cap
      (5L, "one two three"))  // all grams unique → dup5 0, top2 = 1·9 ("two three")
      .toDF("doc_id", "text")
    val r = graft.operators.ScaleOps.withRepetitionStats(df)
      .select("doc_id", "top2_cover", "top3_cover", "dup5_cover",
        "top2_frac", "top3_frac", "dup5_frac")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 6L && r(1L).getLong(2) == 10L && r(1L).getLong(3) == 0L)
    assert(math.abs(r(1L).getDouble(4) - 6.0 / 9) < 1e-15)
    assert(r(1L).getDouble(5) == 1.0 && r(1L).getDouble(6) == 0.0)
    assert(r(2L).getLong(1) == 15L && r(2L).getLong(3) == 18L)
    assert(r(2L).getDouble(4) == 1.0 && r(2L).getDouble(6) == 1.0)
    assert(r(3L).getLong(1) == 0L && r(3L).getDouble(4) == 0.0 && r(3L).getDouble(6) == 0.0)
    assert(r(4L).getLong(1) == 6L, s"unicode charlen: got ${r(4L).getLong(1)}")
    assert(r(5L).getLong(1) == 9L && r(5L).getLong(3) == 0L)
  }

  test("native ngram_repetition ≡ explode+groupBy spec on edge shapes") {
    // the aggregate formulation is the executable spec: explode n-grams,
    // count per (doc, gram), max/sum of count·charlen — the native
    // expression must agree on every doc including multi-space empty
    // tokens, unicode, and gram-less short docs
    val texts = Seq(
      "a b a b a", "x x x x x x", "", " ", "a  b a  b", "one",
      "héllo wörld héllo wörld héllo", "p q r s t u v w p q r s t u v w",
      "the the the the the the the the the the")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def specCover(n: Int, dup: Boolean): Map[Long, Long] = {
      val counts = df
        .select(col("doc_id"), explode(ScaleOps.textShingles(col("text"), n)).as("g"))
        .groupBy("doc_id", "g").count()
      val agg = if (dup)
        counts.filter(col("count") >= 2).groupBy("doc_id")
          .agg(sum(col("count") * length(col("g")).cast("long")).as("cover"))
      else counts.groupBy("doc_id")
        .agg(max(col("count") * length(col("g")).cast("long")).as("cover"))
      agg.as[(Long, Long)].collect().toMap.withDefaultValue(0L)
    }
    val spec2 = specCover(2, dup = false)
    val spec3 = specCover(3, dup = false)
    val spec5 = specCover(5, dup = true)
    graft.operators.ScaleOps.withRepetitionStats(df)
      .select("doc_id", "top2_cover", "top3_cover", "dup5_cover")
      .as[(Long, Long, Long, Long)].collect().foreach { case (id, t2, t3, d5) =>
        assert(t2 == spec2(id), s"doc $id top2: native $t2 vs spec ${spec2(id)}")
        assert(t3 == spec3(id), s"doc $id top3: native $t3 vs spec ${spec3(id)}")
        assert(d5 == spec5(id), s"doc $id dup5: native $d5 vs spec ${spec5(id)}")
      }
  }

  test("native rollingHashNative ≡ HOF rollingHash, including empty and unicode") {
    val texts = Seq("", "a", "hello world", "héllo wörld", "a  b",
      "the quick brown fox jumps over the lazy dog", "é世界")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val bad = df.select(
      graft.operators.ScaleOps.rollingHash(col("text")).as("hof"),
      graft.operators.ScaleOps.rollingHashNative(col("text")).as("native"))
      .filter(not(col("hof") <=> col("native"))).count()
    assert(bad == 0, "native rolling hash differs from HOF fold")
    // null text → null on both
    val nulls = Seq((1L, Option.empty[String])).toDF("id", "text").select(
      graft.operators.ScaleOps.rollingHash(col("text")).as("hof"),
      graft.operators.ScaleOps.rollingHashNative(col("text")).as("native")).head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1), "null semantics differ")
  }

  test("decontaminate: distinct shared k-grams per doc; short docs clean") {
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text") // shingles: "a b c","b c d"
    val train = Seq(
      (1L, "x a b c d y"),  // shares both benchmark shingles
      (2L, "z b c d w"),    // shares "b c d" only
      (3L, "p q r s"),      // no overlap
      (4L, "a b"))          // < 3 tokens: no shingles, never contaminated
      .toDF("doc_id", "text")
    val got = ScaleOps.decontaminate(train, bench, "doc_id")
      .select("doc_id", "n_shared_ngrams", "contaminated")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L, true), (2L, 1L, true), (3L, 0L, false), (4L, 0L, false)))
  }

  test("pack_sequences: concat-and-chop offsets, straddle flag, shard independence") {
    // one lang, one shard (ids ≡ 0 mod 8): tokens 3,4,5 against budget 6
    val df = Seq(
      (0L, "en", "a b c"),       // start 0  → seq 0, off 0, fits
      (8L, "en", "a b c d"),     // start 3  → seq 0, off 3, 3+4-1=6 → seq 1: straddles
      (16L, "en", "a b c d e"))  // start 7  → seq 1, off 1, 7+5-1=11 → seq 1: fits
      .toDF("doc_id", "lang", "text")
    val got = graft.operators.ScaleOps.packSequences(df, "doc_id", budget = 6, numShards = 8)
      .select("doc_id", "n_tokens", "seq_id", "offset_in_seq", "spans_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 3L, 0L, 0L, false),
      (8L, 4L, 0L, 3L, true),
      (16L, 5L, 1L, 1L, false)))
    // different shards pack independently: same tokens on shard 1 restart at 0
    val two = Seq((0L, "en", "a b c"), (1L, "en", "a b c")).toDF("doc_id", "lang", "text")
    val s2 = graft.operators.ScaleOps.packSequences(two, "doc_id", budget = 6, numShards = 8)
      .select("doc_id", "offset_in_seq").as[(Long, Long)].collect().toMap
    assert(s2 == Map(0L -> 0L, 1L -> 0L))
  }

  test("multimodal plumbing: payload bytes + fake features deterministic") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val out = ScaleOps.extractFakeFeatures(ScaleOps.withMultimodalPayload(df))
    val r = out.select("n_bytes", "features").head
    assert(r.getLong(0) == 3L)
    val f = r.getSeq[Double](1)
    assert(f.length == 4)
    assert(math.abs(f(0) - 0x61 / 255.0) < 1e-12) // 'a'
    assert(f(3) == 0.0)                           // past payload end
  }

  test("ImageMeta: golden real-file bytes (1x1 PNG, JFIF JPEG, GIF87a)") {
    import org.apache.spark.sql.graftnative.ImageMeta
    def parse(b: Array[Byte]): (String, Any, Any) = {
      val r = ImageMeta.compute(b)
      (r.getUTF8String(0).toString,
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))
    }
    // a complete real 1x1 RGBA PNG file (the canonical transparent pixel)
    val png1x1 = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    assert(parse(png1x1) == (("png", 1L, 1L)))
    // minimal structurally-valid JFIF: SOI, APP0(len 16), SOF0 h=8 w=16, EOI
    val jfif = Array(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10,
      'J', 'F', 'I', 'F', 0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x00, 0x08, 0x00, 0x10,
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01,
      0xFF, 0xD9).map(_.toByte)
    assert(parse(jfif) == (("jpeg", 16L, 8L)))
    // progressive SOF2 + fill bytes before the marker code must also parse
    val prog = Array(0xFF, 0xD8, 0xFF, 0xFF, 0xFF, 0xC2, 0x00, 0x11,
      0x08, 0x01, 0x00, 0x02, 0x00,
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01).map(_.toByte)
    assert(parse(prog) == (("jpeg", 512L, 256L)))
    val gif = "GIF87a".getBytes("US-ASCII") ++
      Array(0x02, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x3B).map(_.toByte)
    assert(parse(gif) == (("gif", 2L, 3L)))
    // corrupt/truncated headers: recognized container, NULL dimensions
    assert(parse(png1x1.take(12)) == (("png", null, null)))
    assert(parse(Array(0xFF, 0xD8, 0x00, 0x00, 0x00).map(_.toByte)) ==
      (("jpeg", null, null)))
    // DHT (C4) must NOT be taken for a frame header: walk skips it, then
    // hits EOI without a SOF -> null dims
    val dht = Array(0xFF, 0xD8, 0xFF, 0xC4, 0x00, 0x04, 0x00, 0x00,
      0xFF, 0xD9).map(_.toByte)
    assert(parse(dht) == (("jpeg", null, null)))
    // reserved marker code 0x00 (stuffed-byte form FF 00) must bail to
    // NULL dims, never be consumed as a length-prefixed segment: treating
    // it as one would jump the garbage-derived "length" 0x0004 straight
    // onto the FF C0 bytes and report a fake 1x1 frame
    val stuffed = Array(0xFF, 0xD8, 0xFF, 0x00, 0x00, 0x04, 0x00, 0x00,
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x00, 0x01, 0x00, 0x01).map(_.toByte)
    assert(parse(stuffed) == (("jpeg", null, null)))
    assert(parse("plain text".getBytes("UTF-8")) == (("unknown", null, null)))
    assert(parse(Array.empty[Byte]) == (("unknown", null, null)))
  }

  test("AudioMeta: golden WAV/FLAC bytes, truncations, unknown") {
    import org.apache.spark.sql.graftnative.AudioMeta
    def parse(b: Array[Byte]): (String, Any, Any, Any, Any) = {
      val r = AudioMeta.compute(b)
      def g(i: Int): Any = if (r.isNullAt(i)) null else r.getLong(i)
      (r.getUTF8String(0).toString, g(1), g(2), g(3), g(4))
    }
    // canonical 44-byte PCM WAV header: mono, 44100 Hz, 16-bit, 2 frames
    // of data (4 bytes), hand-assembled from the RIFF spec
    def le16(v: Int) = Array[Byte]((v & 255).toByte, ((v >> 8) & 255).toByte)
    def le32(v: Int) = Array[Byte]((v & 255).toByte, ((v >> 8) & 255).toByte,
      ((v >> 16) & 255).toByte, ((v >> 24) & 255).toByte)
    val wav = "RIFF".getBytes ++ le32(40) ++ "WAVEfmt ".getBytes ++
      le32(16) ++ le16(1) ++ le16(1) ++ le32(44100) ++ le32(88200) ++
      le16(2) ++ le16(16) ++ "data".getBytes ++ le32(4) ++ le32(0)
    assert(parse(wav) == (("wav", 1L, 44100L, 16L, 2L)))
    // an extra LIST chunk before fmt : the walk must skip it (odd size
    // pads to even per RIFF)
    val listed = "RIFF".getBytes ++ le32(63) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le32(5) ++ Array.fill[Byte](6)(7) ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(8000) ++
      le32(32000) ++ le16(4) ++ le16(16) ++ "data".getBytes ++ le32(40)
    assert(parse(listed) == (("wav", 2L, 8000L, 16L, 10L)))
    // truncated fmt, missing data chunk -> nulls, recognized container
    assert(parse(wav.take(20)) == (("wav", null, null, null, null)))
    assert(parse(wav.take(36)) == (("wav", null, null, null, null)))
    // FLAC: fLaC + STREAMINFO with 48000 Hz, stereo, 24-bit, 7 samples —
    // bit-packed by hand: rate 48000 = 0x0BB80 -> b10=0x0B b11=0xB8,
    // b12 = (rate&0xF)<<4 | (ch-1)<<1 | (bits-1)>>4 = 0x03
    val flac = "fLaC".getBytes ++ Array[Byte](0x80.toByte, 0, 0, 34) ++
      Array.fill[Byte](10)(0) ++
      Array[Byte](0x0B, 0xB8.toByte, 0x03, 0x70, 0, 0, 0, 7) ++
      Array.fill[Byte](16)(0)
    assert(parse(flac) == (("flac", 2L, 48000L, 24L, 7L)))
    // a VORBIS_COMMENT block (type 4) before STREAMINFO is walked over
    val commented = "fLaC".getBytes ++ Array[Byte](4, 0, 0, 3) ++
      Array[Byte](1, 2, 3) ++ Array[Byte](0x80.toByte, 0, 0, 34) ++
      Array.fill[Byte](10)(0) ++
      Array[Byte](0x0B, 0xB8.toByte, 0x03, 0x70, 0, 0, 0, 7) ++
      Array.fill[Byte](16)(0)
    assert(parse(commented) == (("flac", 2L, 48000L, 24L, 7L)))
    // truncated STREAMINFO; zero sample rate (spec-invalid)
    assert(parse(flac.take(20)) == (("flac", null, null, null, null)))
    val zeroRate = flac.clone()
    zeroRate(18) = 0; zeroRate(19) = 0
    zeroRate(20) = (zeroRate(20) & 0x0F).toByte
    assert(parse(zeroRate) == (("flac", null, null, null, null)))
    assert(parse("not audio".getBytes) == (("unknown", null, null, null, null)))
    assert(parse(Array.empty[Byte]) == (("unknown", null, null, null, null)))
  }

  test("Mp4Meta: golden box trees (v0/v1 mvhd, largesize), corrupt trees") {
    import org.apache.spark.sql.graftnative.Mp4Meta
    def parse(b: Array[Byte]): (String, Any, Any) = {
      val r = Mp4Meta.compute(b)
      def g(i: Int): Any = if (r.isNullAt(i)) null else r.getLong(i)
      (r.getUTF8String(0).toString, g(1), g(2))
    }
    def be32(v: Long) = Array[Byte](((v >> 24) & 255).toByte,
      ((v >> 16) & 255).toByte, ((v >> 8) & 255).toByte, (v & 255).toByte)
    def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)
    val ftyp = be32(16) ++ "ftypmp42".getBytes ++ be32(0)
    // free box between ftyp and moov: top-level walk must skip it
    val free = be32(9) ++ "free".getBytes ++ Array[Byte](0)
    def mvhd0(ts: Long, dur: Long) = be32(108) ++ "mvhd".getBytes ++
      Array.fill[Byte](4)(0) ++ be32(0) ++ be32(0) ++ be32(ts) ++ be32(dur) ++
      Array.fill[Byte](80)(0)
    def mvhd1(ts: Long, dur: Long) = be32(120) ++ "mvhd".getBytes ++
      Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](16)(0) ++ be32(ts) ++
      be64(dur) ++ Array.fill[Byte](80)(0)
    val v0 = ftyp ++ free ++ be32(116) ++ "moov".getBytes ++ mvhd0(600, 12345)
    assert(parse(v0) == (("mp42", 600L, 12345L)))
    // v1: u64 duration beyond u32 range
    val v1 = ftyp ++ be32(128) ++ "moov".getBytes ++ mvhd1(90000, 5000000000L)
    assert(parse(v1) == (("mp42", 90000L, 5000000000L)))
    // moov with a leading trak sibling: child walk must skip to mvhd
    val trak = be32(10) ++ "trak".getBytes ++ Array[Byte](0, 0)
    val sib = ftyp ++ be32(126) ++ "moov".getBytes ++ trak ++ mvhd0(600, 77)
    assert(parse(sib) == (("mp42", 600L, 77L)))
    // largesize (size==1) moov
    val big = ftyp ++ be32(1) ++ "moov".getBytes ++ be64(124) ++ mvhd0(48000, 99)
    assert(parse(big) == (("mp42", 48000L, 99L)))
    // no moov; truncated mvhd; first box not ftyp
    assert(parse(ftyp) == (("mp42", null, null)))
    assert(parse(v0.dropRight(60)) == (("mp42", null, null)))
    assert(parse(be32(16) ++ "moovmp42".getBytes ++ be32(0)) ==
      (("unknown", null, null)))
    assert(parse("plain".getBytes) == (("unknown", null, null)))
  }

  test("ImageMeta: synth headers round-trip through the native parser (codegen path)") {
    // boundary sizes included: u16 max for JPEG/GIF, >u16 for PNG
    val dims = Seq((1L, 1L), (16L, 16L), (640L, 480L), (65535L, 65535L))
    val df = dims.toDF("w", "h")
    def roundTrip(payload: org.apache.spark.sql.Column) =
      df.select(col("w"), col("h"), ScaleOps.imageMeta(payload).as("m"))
        .select(col("m.format"), col("m.width") === col("w"),
          col("m.height") === col("h"))
        .as[(String, Boolean, Boolean)].collect()
    assert(roundTrip(ScaleOps.synthPngHeader(col("w"), col("h")))
      .forall(r => r == (("png", true, true))))
    assert(roundTrip(ScaleOps.synthJpegHeader(col("w"), col("h")))
      .forall(r => r == (("jpeg", true, true))))
    assert(roundTrip(ScaleOps.synthGifHeader(col("w"), col("h")))
      .forall(r => r == (("gif", true, true))))
    // PNG width/height are u32: a dimension no u16 container can hold
    val big = Seq((70000L, 123456L)).toDF("w", "h")
      .select(ScaleOps.imageMeta(
        ScaleOps.synthPngHeader(col("w"), col("h"))).as("m"))
      .select(col("m.width"), col("m.height")).as[(Long, Long)].head()
    assert(big == ((70000L, 123456L)))
    // NULL payload -> NULL struct (null-intolerant expression)
    val n = Seq(Tuple1(Option.empty[Array[Byte]])).toDF("p")
      .select(ScaleOps.imageMeta(col("p")).as("m")).head()
    assert(n.isNullAt(0))
  }

  test("ImageMeta: WebP — VP8L synth round-trip, VP8/VP8X goldens, truncation") {
    // VP8L packs (w−1, h−1) in 14 bits each — 16384 is the format max
    val dims = Seq((1L, 1L), (16L, 16L), (640L, 480L), (16384L, 16384L))
    val rt = dims.toDF("w", "h").select(col("w"), col("h"),
        ScaleOps.imageMeta(ScaleOps.synthWebpHeader(col("w"), col("h"))).as("m"))
      .select(col("m.format"), col("m.width") === col("w"),
        col("m.height") === col("h"))
      .as[(String, Boolean, Boolean)].collect()
    assert(rt.forall(_ == (("webp", true, true))))
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le24(v: Int) = le16(v) ++ Array[Byte](((v >> 16) & 0xFF).toByte)
    def le32(v: Int) = le24(v) ++ Array[Byte](((v >> 24) & 0xFF).toByte)
    def parse(bytes: Array[Byte]) = Seq(Tuple1(bytes)).toDF("p")
      .select(ScaleOps.imageMeta(col("p")).as("m"))
      .select(col("m.format"), col("m.width"), col("m.height"))
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).head
    // lossy VP8: frame tag, 9D 01 2A start code, u16-le dims whose two
    // high bits are SCALING and must be masked off
    val vp8 = "RIFF".getBytes ++ le32(22) ++ "WEBPVP8 ".getBytes ++ le32(10) ++
      Array[Byte](0, 0, 0, 0x9D.toByte, 0x01, 0x2A) ++
      le16(320 | 0x4000) ++ le16(240)
    assert(parse(vp8) == (("webp", 320L, 240L)))
    // extended VP8X: u24-le canvas minus one — dims past the 14-bit cap
    val vp8x = "RIFF".getBytes ++ le32(18) ++ "WEBPVP8X".getBytes ++ le32(10) ++
      Array[Byte](0x02, 0, 0, 0) ++ le24(99999) ++ le24(49999)
    assert(parse(vp8x) == (("webp", 100000L, 50000L)))
    // truncated after the fourCC → (webp, NULL, NULL); a RIFF that is
    // not WEBP (a WAV) is not an image at all
    assert(parse(vp8.take(20)) == (("webp", null, null)))
    assert(parse(("RIFF" + "\u0000\u0000\u0000\u0000" + "WAVE").getBytes("ISO-8859-1"))
      == (("unknown", null, null)))
  }

  test("Audio/Mp4 synth headers round-trip through the native parsers (codegen path)") {
    // boundary values: 1-channel 8-bit up to 8-channel 32-bit; FLAC's
    // 20-bit rate ceiling. (Frame counts past u32 are FLAC-only below —
    // WAV's data-chunk size is an inherent u32, the classic RIFF limit.)
    val specs = Seq((1L, 8000L, 8L, 1L), (2L, 44100L, 16L, 1000L),
      (8L, 192000L, 32L, 123456L), (4L, 1048575L, 24L, 100000007L))
    val df = specs.toDF("ch", "rate", "bits", "frames")
    def roundTrip(payload: org.apache.spark.sql.Column) =
      df.select(ScaleOps.audioMeta(payload).as("m"),
          col("ch"), col("rate"), col("bits"), col("frames"))
        .select(col("m.format"), col("m.channels") === col("ch"),
          col("m.sample_rate") === col("rate"),
          col("m.bits_per_sample") === col("bits"),
          col("m.n_frames") === col("frames"))
        .as[(String, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(roundTrip(ScaleOps.synthWavHeader(col("ch"), col("rate"),
        col("bits"), col("frames")))
      .forall(_ == (("wav", true, true, true, true))))
    assert(roundTrip(ScaleOps.synthFlacHeader(col("ch"), col("rate"),
        col("bits"), col("frames")))
      .forall(_ == (("flac", true, true, true, true))))
    // FLAC's 36-bit total-samples field holds counts past u32
    val bigFlac = Seq((2L, 48000L, 16L, 68719476735L)) // 2^36 - 1
      .toDF("ch", "rate", "bits", "frames")
      .select(ScaleOps.audioMeta(ScaleOps.synthFlacHeader(col("ch"),
        col("rate"), col("bits"), col("frames"))).as("m"))
      .select(col("m.n_frames")).as[Long].head()
    assert(bigFlac == 68719476735L)
    // MP4: both mvhd versions; v1 exercises a >u32 duration
    val mp4 = Seq((600L, 12345L, 0), (90000L, 5000000000L, 1))
      .toDF("ts", "dur", "ver")
      .select(ScaleOps.mp4Meta(
          ScaleOps.synthMp4Header(col("ts"), col("dur"), col("ver"))).as("m"),
        col("ts"), col("dur"))
      .select(col("m.brand"), col("m.timescale") === col("ts"),
        col("m.duration") === col("dur"))
      .as[(String, Boolean, Boolean)].collect()
    assert(mp4.forall(_ == (("isom", true, true))))
    // NULL payloads -> NULL structs
    val n = Seq(Tuple1(Option.empty[Array[Byte]])).toDF("p")
      .select(ScaleOps.audioMeta(col("p")).as("a"),
        ScaleOps.mp4Meta(col("p")).as("v")).head()
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("chunkDocuments: windows, overlap, no-suffix trailing rule, short docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                   // shorter than window
      (3L, "solo")).toDF("doc_id", "text")
    // window 8, stride 4 (overlap 4): doc 1 starts 0,4,8 — but start 8's
    // window [8,10) adds nothing beyond [4,12)'s coverage, so it is NOT
    // emitted (8 + 8 - 4 = 12 >= 10)
    val out = ScaleOps.chunkDocuments(docs, "doc_id", window = 8, stride = 4)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, (1 to 8).map(i => s"t$i").mkString(" "), 8L),
      (1L, 1L, (5 to 10).map(i => s"t$i").mkString(" "), 6L),
      (2L, 0L, "a b c", 3L),
      (3L, 0L, "solo", 1L)))
    // every token of every doc is covered by at least one chunk
    val covered = out.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
    // stride == window: disjoint chunks, all tokens exactly once
    val disjoint = ScaleOps.chunkDocuments(docs.filter(col("doc_id") === 1),
        "doc_id", window = 4, stride = 4)
      .as[(Long, Long, String, Long)].collect().toSeq.sortBy(_._2)
    assert(disjoint.map(_._3).mkString(" ") ==
      (1 to 10).map(i => s"t$i").mkString(" "))
    assert(disjoint.map(_._4) == Seq(4L, 4L, 2L))
  }

  test("simhashTable (bulk explode+agg) equals per-row simhash60") {
    val df = Seq((1L, "spark window shuffle join filter"),
      (2L, "data table query row column value"),
      (3L, "a b a b a b a")).toDF("doc_id", "text")
    val perRow = df.withColumn("h", ScaleOps.simhash60(ScaleOps.tokens(col("text"))))
      .select("doc_id", "h").as[(Long, Long)].collect().toMap
    val bulk = ScaleOps.simhashTable(df, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(perRow == bulk)
  }

  test("minhashSignatureTable equals per-row signature (long-hash variant)") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox leaps over the lazy dog"))
      .toDF("doc_id", "text")
    val bulk = ScaleOps.minhashSignatureTable(df, "doc_id", "text", k = 4).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(i => r.getAs[Long](s"sig_$i"))).toMap
    // the zero-shuffle per-row variant must agree component-for-component
    val perRowVariant = ScaleOps.minhashSignaturePerRow(df, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(i => r.getAs[Long](s"sig_$i"))).toMap
    assert(perRowVariant == bulk)
    // recompute per-row: min over shingles of the two 60-bit halves of the
    // salt-1 md5 (components 2i-1 / 2i share digest ${i}, offsets 1 and 17)
    val perRow = df.withColumn("_sh", ScaleOps.shingles(ScaleOps.tokens(col("text"))))
      .withColumn("m1", array_min(transform(col("_sh"), x =>
        conv(substring(md5(concat(lit("1|"), x)), 1, 15), 16, 10).cast("long"))))
      .withColumn("m2", array_min(transform(col("_sh"), x =>
        conv(substring(md5(concat(lit("1|"), x)), 17, 15), 16, 10).cast("long"))))
      .select(col("doc_id"), col("m1"), col("m2"))
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(bulk(1L).take(2) == Seq(perRow(1L)._1, perRow(1L)._2))
    assert(bulk(2L).take(2) == Seq(perRow(2L)._1, perRow(2L)._2))
    assert(bulk(1L) != bulk(2L)) // one-word edit changes some components
    // the two halves of one digest are distinct hash functions
    assert(bulk(1L)(0) != bulk(1L)(1))
    // xxhash64 family: per-row and bulk forms agree component-for-component
    val bulkXx = ScaleOps.minhashSignatureTableXx(df, "doc_id", "text", k = 4).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(i => r.getAs[Long](s"sig_$i"))).toMap
    val perRowXx = ScaleOps.minhashSignaturePerRowXx(df, "doc_id", "text", k = 4).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(i => r.getAs[Long](s"sig_$i"))).toMap
    assert(perRowXx == bulkXx)
    assert(bulkXx(1L) != bulk(1L)) // different hash family, different signatures
  }

  test("native DotProductFloat is bit-identical to the HOF fold on real embeddings") {
    val emb = Tables.embeddings(spark, sf0001).limit(50)
    val pairs = emb.select(col("vec_id").as("id1"), col("embedding").as("e1"))
      .crossJoin(emb.select(col("vec_id").as("id2"), col("embedding").as("e2")))
      .withColumn("d_native", ScaleOps.dotD(col("e1"), col("e2")))
      .withColumn("d_hof", ScaleOps.dotHof(col("e1"), col("e2")))
    val mismatches = pairs.filter(col("d_native") =!= col("d_hof")).count()
    assert(mismatches == 0)
    // and the codegen path actually engages (no fallback warnings = plan contains the expr)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("dotproductfloat") || plan.contains("DotProductFloat"))
  }

  test("LSH ANN: buckets deterministic, self always a candidate, sane recall") {
    val brute = Queries.all("similarity_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = Queries.all("ann_lsh_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    // each query retrieves itself (cos=1 in its own bucket)
    (0L until 10L).foreach(q => assert(lsh.contains((q, q))))
    // bucketing is deterministic across runs
    val lsh2 = Queries.all("ann_lsh_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(lsh == lsh2)
    // 16 tables × 4 bits: recall measured 0.84/0.91 at sf0.001/sf0.01
    // (deterministic — fixed planes, fixed data)
    val recall = brute.count(lsh.contains).toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF ANN: self-retrieval, determinism, sane recall vs brute force") {
    val brute = Queries.all("similarity_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Queries.all("ann_ivf_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    // each query's own list is always probed first (cos with itself = 1
    // dominates its centroid score), so self-retrieval must hold
    (0L until 10L).foreach(q => assert(ivf.contains((q, q)), s"query $q lost itself"))
    val ivf2 = Queries.all("ann_ivf_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivf == ivf2)
    // probing 2 of 16 first-K lists: measured 0.91/0.89 at sf0.001/sf0.01
    // (first-K "centroids" produce unbalanced cells whose biggest spans a
    // label cluster, so 2 probes already cover most true neighbors)
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("trained-codebook IVF: spherical k-means index reaches production recall") {
    val brute = Queries.all("similarity_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Queries.all("ann_ivf_trained_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    (0L until 10L).foreach(q => assert(ivf.contains((q, q)), s"query $q lost itself"))
    // codebook is a memoized fixture -> serving is deterministic in-JVM
    val ivf2 = Queries.all("ann_ivf_trained_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivf == ivf2)
    // (K=8, nProbe=6) measured 0.89/0.94 at sf0.001/sf0.01
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.85, s"recall $recall")
  }

  test("PQ ANN: 4-bit codes + ADC candidates reach recall >= 0.8, deterministic") {
    val brute = Queries.all("similarity_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val pq = Queries.all("ann_pq_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    // the exact re-rank stage restores self-retrieval even though the
    // 8-byte codes only approximate the query's own vector
    (0L until 10L).foreach(q => assert(pq.contains((q, q)), s"query $q lost itself"))
    val pq2 = Queries.all("ann_pq_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(pq == pq2)
    // 8 subspaces × 32 centroids (5 bits), refine=64: the 16-centroid
    // codebook measured 0.69 — at 0.5 bits/dim the ADC candidate list,
    // not the exact re-rank, caps recall
    val recall = brute.count(pq.contains).toDouble / brute.size
    info(f"pq recall@10 = $recall%.2f")
    assert(recall >= 0.8, s"recall $recall")
  }

  test("IVF-PQ ANN: cell-gated ADC reaches recall >= 0.75, deterministic, self-retrieving") {
    val brute = Queries.all("similarity_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivfpq = Queries.all("ann_ivfpq_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    // a query's own vector sits in the cell the query ranks first, so the
    // coarse gate never loses it and the exact re-rank restores it
    (0L until 10L).foreach(q => assert(ivfpq.contains((q, q)), s"query $q lost itself"))
    val again = Queries.all("ann_ivfpq_topk").fn(spark, sf0001)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivfpq == again)
    // the gate can only LOSE candidates the probe misses, so IVF-PQ's
    // recall sits at or below flat PQ's (pinned 0.8) — the measured gap
    // IS the price of scanning only nProbe/K of the code table
    val recall = brute.count(ivfpq.contains).toDouble / brute.size
    info(f"ivfpq recall@10 = $recall%.2f")
    assert(recall >= 0.75, s"recall $recall")
  }

  // ---------------------------------------------------- raster decode

  private def decodeRaster(b: Array[Byte]) =
    Seq(Tuple1(b)).toDF("p")
      .select(ScaleOps.imageDecode(col("p")).as("r"))
      .select(col("r.format"), col("r.width"), col("r.height"),
        col("r.channels"), col("r.pixels"))
      .collect().map(r => (r.getString(0), r.get(1), r.get(2), r.get(3),
        Option(r.get(4)).map(_.asInstanceOf[Array[Byte]].toSeq).orNull)).head

  test("ImageDecode: hand-built PPM bytes (with header comment) decode to exact pixels") {
    val data = Array.tabulate(12)(i => (i * 10).toByte) // 2x2 RGB
    val ppm = "P6\n# fixture comment\n2 2\n255\n".getBytes("US-ASCII") ++ data
    assert(decodeRaster(ppm) == (("ppm", 2, 2, 3, data.toSeq)))
    // P5 grayscale, compact single-space header
    val gray = Array[Byte](9, 8, 7, 6, 5, 4)
    val pgm = "P5 2 3 255\n".getBytes("US-ASCII") ++ gray
    assert(decodeRaster(pgm) == (("pgm", 2, 3, 1, gray.toSeq)))
    // truncated pixel data / maxval beyond one byte -> unknown, never guessed
    assert(decodeRaster(ppm.dropRight(1))._1 == "unknown")
    assert(decodeRaster("P6\n2 2\n65535\n".getBytes ++ data)._1 == "unknown")
  }

  test("ImageDecode: golden BMP bytes — bottom-up, BGR, row padding all undone") {
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = le16(v) ++ le16(v >> 16)
    // logical 2x2 top-down RGB image
    val logical = Seq[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    def header(hRaw: Int) =
      "BM".getBytes ++ le32(70) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(2) ++ le32(hRaw) ++ le16(1) ++ le16(24) ++
        le32(0) ++ le32(16) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    // bottom-up file rows (positive height): y=1 first, BGR, 2 pad bytes
    val bottomUp = header(2) ++ Array[Byte](
      90, 80, 70, 120, 110, 100, 0, 0,
      30, 20, 10, 60, 50, 40, 0, 0)
    assert(decodeRaster(bottomUp) == (("bmp", 2, 2, 3, logical)))
    // negative height = top-down row order, same logical image
    val topDown = header(-2) ++ Array[Byte](
      30, 20, 10, 60, 50, 40, 0, 0,
      90, 80, 70, 120, 110, 100, 0, 0)
    assert(decodeRaster(topDown) == (("bmp", 2, 2, 3, logical)))
    // 32-bpp / compressed / truncated -> unknown (no pixel guessing)
    val bpp32 = "BM".getBytes ++ le32(70) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(32) ++
      le32(0) ++ le32(16) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    assert(decodeRaster(bpp32)._1 == "unknown")
    assert(decodeRaster(bottomUp.dropRight(1))._1 == "unknown")
    assert(decodeRaster("plain".getBytes)._1 == "unknown")
  }

  // --- PNG: hand-built chunks around a STORED-block zlib stream, so the
  // expected bytes are hand-computable without running any deflater
  private def zlibStored(data: Array[Byte]): Array[Byte] = {
    // 0x78 0x01 header, one final stored block, then big-endian Adler-32
    var s1 = 1L; var s2 = 0L
    data.foreach { b => s1 = (s1 + (b & 0xFF)) % 65521; s2 = (s2 + s1) % 65521 }
    val adler = (s2 << 16) | s1
    Array[Byte](0x78, 0x01, 0x01,
      (data.length & 0xFF).toByte, ((data.length >> 8) & 0xFF).toByte,
      (~data.length & 0xFF).toByte, ((~data.length >> 8) & 0xFF).toByte) ++
      data ++ Array[Byte](((adler >> 24) & 0xFF).toByte,
        ((adler >> 16) & 0xFF).toByte, ((adler >> 8) & 0xFF).toByte,
        (adler & 0xFF).toByte)
  }

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    def be32(v: Long) = Array[Byte](((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
  }

  private val pngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def ihdr(w: Int, h: Int, color: Int, depth: Int = 8,
      interlace: Int = 0): Array[Byte] =
    pngChunk("IHDR", Array[Byte](
      (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
      (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
      depth.toByte, color.toByte, 0, 0, interlace.toByte))

  test("ImageDecode: golden PNG bytes — stored-zlib inflate, Sub/Up unfiltering, CRC gate") {
    // 2x2 RGB: row 0 Sub-filtered, row 1 Up-filtered (hand-filtered here)
    val logical = Seq[Byte](1, 2, 3, 4, 6, 8, 11, 22, 33, 14, 26, 38)
    val filtered = Array[Byte](
      1, 1, 2, 3, 3, 4, 5, // Sub: second pixel minus first
      2, 10, 20, 30, 10, 20, 30) // Up: row 1 minus row 0
    val png = pngSig ++ ihdr(2, 2, color = 2) ++
      pngChunk("IDAT", zlibStored(filtered)) ++
      pngChunk("IEND", Array.emptyByteArray)
    assert(decodeRaster(png) == (("png", 2, 2, 3, logical)))
    // IDAT split across two chunks concatenates per spec
    val half = zlibStored(filtered)
    val split = pngSig ++ ihdr(2, 2, color = 2) ++
      pngChunk("IDAT", half.take(5)) ++ pngChunk("IDAT", half.drop(5)) ++
      pngChunk("IEND", Array.emptyByteArray)
    assert(decodeRaster(split) == (("png", 2, 2, 3, logical)))
    // a flipped payload byte fails the chunk CRC: unknown, never wrong pixels
    val corrupt = png.clone()
    corrupt(pngSig.length + ihdr(2, 2, 2).length + 8 + 3) =
      (corrupt(pngSig.length + ihdr(2, 2, 2).length + 8 + 3) ^ 0x40).toByte
    assert(decodeRaster(corrupt)._1 == "unknown")
    // truncation: reject. (Interlace, palette, and 16-bit depth are
    // REAL since round 11 — these streams now reject for honest
    // structural reasons instead: an Adam7 2×2 needs 15 raw bytes and a
    // 16-bit 2×2 needs 26, not the 14 provided, and a type-3 stream
    // without a PLTE chunk has no palette to resolve.)
    assert(decodeRaster(png.dropRight(1))._1 == "unknown")
    assert(decodeRaster(pngSig ++ ihdr(2, 2, 2, interlace = 1) ++
      pngChunk("IDAT", zlibStored(filtered)) ++
      pngChunk("IEND", Array.emptyByteArray))._1 == "unknown")
    assert(decodeRaster(pngSig ++ ihdr(2, 2, 2, depth = 16) ++
      pngChunk("IDAT", zlibStored(filtered)) ++
      pngChunk("IEND", Array.emptyByteArray))._1 == "unknown")
    assert(decodeRaster(pngSig ++ ihdr(2, 2, color = 3) ++
      pngChunk("IDAT", zlibStored(filtered)) ++
      pngChunk("IEND", Array.emptyByteArray))._1 == "unknown")
    // palette: a 2×2 type-3 image over a 2-entry PLTE; index 2 at the
    // last pixel is OUT OF RANGE → reject, never a guessed color
    val palIdx = Array[Byte](0, 0, 1, 0, 1, 0) // rows None-filtered
    val plteOk = pngSig ++ ihdr(2, 2, color = 3) ++
      pngChunk("PLTE", Array[Byte](1, 2, 3, 4, 5, 6)) ++
      pngChunk("IDAT", zlibStored(palIdx)) ++
      pngChunk("IEND", Array.emptyByteArray)
    assert(decodeRaster(plteOk) ==
      (("png", 2, 2, 3, Seq[Byte](1, 2, 3, 4, 5, 6, 4, 5, 6, 1, 2, 3))))
    val palBad = Array[Byte](0, 0, 1, 0, 1, 2)
    assert(decodeRaster(pngSig ++ ihdr(2, 2, color = 3) ++
      pngChunk("PLTE", Array[Byte](1, 2, 3, 4, 5, 6)) ++
      pngChunk("IDAT", zlibStored(palBad)) ++
      pngChunk("IEND", Array.emptyByteArray))._1 == "unknown")
    // inflated volume must be EXACT: drop one filtered byte -> reject
    assert(decodeRaster(pngSig ++ ihdr(2, 2, 2) ++
      pngChunk("IDAT", zlibStored(filtered.dropRight(1))) ++
      pngChunk("IEND", Array.emptyByteArray))._1 == "unknown")
    // corrupt Adler-32 TRAILER with intact data and a recomputed chunk
    // CRC: the stream inflates to exactly the scanline volume, so the
    // DataFormatException fires from the trailing overrun probe — it must
    // reject to 'unknown', not fail the task (adversarial crawl input)
    val badAdler = zlibStored(filtered)
    badAdler(badAdler.length - 1) = (badAdler(badAdler.length - 1) ^ 0x55).toByte
    assert(decodeRaster(pngSig ++ ihdr(2, 2, 2) ++
      pngChunk("IDAT", badAdler) ++
      pngChunk("IEND", Array.emptyByteArray))._1 == "unknown")
  }

  test("ImageDecode: golden GIF bytes — hand-packed LZW, palette map, KwKwK, interlace") {
    // 2x2, 4-entry palette, indices [0,1,2,1]; LZW minCode 2 hand-packed:
    // codes clear(4),0,1,2 at 3 bits then 1,eoi(5) at 4 bits, LSB-first
    val pal4 = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val gif = "GIF89a".getBytes ++ Array[Byte](2, 0, 2, 0, 0x81.toByte, 0, 0) ++
      pal4 ++ Array[Byte](0x2C, 0, 0, 0, 0, 2, 0, 2, 0, 0, 2,
        3, 0x44, 0x14, 0x05, 0, 0x3B)
    val expected = Seq[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 40, 50, 60)
    assert(decodeRaster(gif) == (("gif", 2, 2, 3, expected)))
    // KwKwK (code == dictSize): indices [0,0,0] -> codes 4,0,6,5 packed
    val gifK = "GIF89a".getBytes ++ Array[Byte](3, 0, 1, 0, 0x81.toByte, 0, 0) ++
      pal4 ++ Array[Byte](0x2C, 0, 0, 0, 0, 3, 0, 1, 0, 0, 2,
        2, 0x84.toByte, 0x0B, 0, 0x3B)
    assert(decodeRaster(gifK) ==
      (("gif", 3, 1, 3, Seq[Byte](10, 20, 30, 10, 20, 30, 10, 20, 30))))
    // interlaced 1x5: stream rows land at 0,4,2,1,3 and must be unshuffled;
    // codes clear(8),0,1,2,3,4,eoi(9) at 4 bits (8-entry palette, minCode 3)
    val pal8 = Array.tabulate[Byte](24)(i => (i + 1).toByte)
    val gifI = "GIF89a".getBytes ++ Array[Byte](1, 0, 5, 0, 0x82.toByte, 0, 0) ++
      pal8 ++ Array[Byte](0x2C, 0, 0, 0, 0, 1, 0, 5, 0, 0x40, 3,
        4, 0x08, 0x21, 0x43, 0x09, 0, 0x3B)
    val (fmt, w, h, ch, pix) = decodeRaster(gifI)
    assert((fmt, w, h, ch) == (("gif", 1, 5, 3)))
    // dest row r gets stream index: 0->0, 1->3, 2->2, 3->4, 4->1
    val wantRows = Seq(0, 3, 2, 4, 1)
    assert(pix == wantRows.flatMap(v => pal8.slice(3 * v, 3 * v + 3)))
    // malformations: trailer before image, palette overrun, torn sub-block
    assert(decodeRaster("GIF89a".getBytes ++
      Array[Byte](2, 0, 2, 0, 0, 0, 0, 0x3B))._1 == "unknown")
    // index 2 under a 2-entry palette claim: reject, never guess
    assert(decodeRaster("GIF89a".getBytes ++
      Array[Byte](2, 0, 2, 0, 0x80.toByte, 0, 0) ++ pal4.take(6) ++
      Array[Byte](0x2C, 0, 0, 0, 0, 2, 0, 2, 0, 0, 2,
        3, 0x44, 0x14, 0x05, 0, 0x3B))._1 == "unknown")
    assert(decodeRaster(gif.dropRight(3))._1 == "unknown")
  }

  test("SynthPng / SynthGif: really-compressed fixtures decode back to the formula") {
    // h >= 5 rows: the per-row filter (seed + y) mod 5 hits ALL FIVE
    // spec filters, so this round-trip proves inflate + every unfilter
    val rows = Seq((6L, 7L, 123L), (5L, 5L, 4L), (9L, 8L, 77L))
      .toDF("w", "h", "seed")
    val dec = rows.select(col("seed"),
        ScaleOps.imageDecode(ScaleOps.synthPng(col("w"), col("h"),
          col("seed"), channels = 3)).as("r"),
        ScaleOps.imageDecode(ScaleOps.synthPng(col("w"), col("h"),
          col("seed"), channels = 1)).as("g"),
        ScaleOps.imageDecode(ScaleOps.synthGif(col("w"), col("h"),
          col("seed"))).as("f"),
        col("w"), col("h"))
      .collect()
    dec.foreach { r =>
      val seed = r.getLong(0)
      val w = r.getLong(4).toInt; val h = r.getLong(5).toInt
      def pix(idx: Int) = java.lang.Math.floorMod(seed * 31 + idx * 7, 256)
      val rgb = r.getStruct(1)
      assert(rgb.getString(0) == "png" && rgb.getInt(3) == 3)
      val rgbPx = rgb.getAs[Array[Byte]](4)
      assert(rgbPx.length == w * h * 3)
      rgbPx.zipWithIndex.foreach { case (b, i) =>
        assert((b & 0xFF) == pix(i), s"png rgb seed=$seed byte $i") }
      val gray = r.getStruct(2)
      assert(gray.getString(0) == "png" && gray.getInt(3) == 1)
      gray.getAs[Array[Byte]](4).zipWithIndex.foreach { case (b, i) =>
        assert((b & 0xFF) == pix(i), s"png gray seed=$seed byte $i") }
      val gif = r.getStruct(3)
      assert(gif.getString(0) == "gif" && gif.getInt(3) == 3)
      val gifPx = gif.getAs[Array[Byte]](4)
      (0 until w * h).foreach { p =>
        val v = pix(p)
        assert((gifPx(3 * p) & 0xFF) == v &&
          (gifPx(3 * p + 1) & 0xFF) == (2 * v) % 256 &&
          (gifPx(3 * p + 2) & 0xFF) == (3 * v) % 256,
          s"gif seed=$seed pixel $p")
      }
    }
    // a wide GIF forces the LZW dictionary through a code-width change
    val wide = Seq((200L, 30L, 9L)).toDF("w", "h", "seed")
      .select(ScaleOps.imageDecode(ScaleOps.synthGif(col("w"), col("h"),
        col("seed"))).as("f"))
      .select(col("f.width"), col("f.pixels")).head()
    assert(wide.getInt(0) == 200)
    val widePx = wide.getAs[Array[Byte]](1)
    (0 until 200 * 30).foreach { p =>
      val v = java.lang.Math.floorMod(9L * 31 + p * 7, 256)
      assert((widePx(3 * p) & 0xFF) == v, s"wide gif pixel $p")
    }
  }

  test("SynthJpeg: really entropy-coded fixtures decode back to the exact block formula") {
    import org.apache.spark.sql.graftnative.JpegSynth
    // all three modes over sizes exercising multi-MCU grids, seeds
    // covering all four chroma variants
    val rows = Seq((16L, 16L, 0L), (32L, 16L, 1L), (48L, 32L, 2L),
      (16L, 32L, 3L), (32L, 32L, 5L), (48L, 16L, 6L)).toDF("w", "h", "seed")
    for (mode <- 0 to 2) {
      val dec = rows.select(col("seed"), col("w"), col("h"),
        ScaleOps.imageDecode(ScaleOps.synthJpeg(col("w"), col("h"),
          col("seed"), mode)).as("r")).collect()
      dec.foreach { r =>
        val seed = r.getLong(0)
        val w = r.getLong(1).toInt; val h = r.getLong(2).toInt
        val st = r.getStruct(3)
        assert(st.getString(0) == "jpeg", s"mode=$mode seed=$seed")
        assert(st.getInt(1) == w && st.getInt(2) == h, s"mode=$mode seed=$seed")
        val ch = st.getInt(3)
        assert(ch == (if (mode == 0) 1 else 3))
        val px = st.getAs[Array[Byte]](4)
        val v = JpegSynth.ChromaVariants(java.lang.Math.floorMod(seed, 4).toInt)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val yv = JpegSynth.lumaAt(seed, w, x, y)
            if (ch == 1)
              assert((px(y * w + x) & 0xFF) == yv,
                s"mode=$mode seed=$seed ($x,$y)")
            else {
              val d = (y * w + x) * 3
              assert((px(d) & 0xFF) == yv + v._3 &&
                (px(d + 1) & 0xFF) == yv + v._4 &&
                (px(d + 2) & 0xFF) == yv + v._5,
                s"mode=$mode seed=$seed ($x,$y): got " +
                  s"(${px(d) & 0xFF},${px(d + 1) & 0xFF},${px(d + 2) & 0xFF}) " +
                  s"want Y=$yv + (${v._3},${v._4},${v._5})")
            }
            x += 1
          }
          y += 1
        }
      }
    }
    // non-MCU-multiple dims violate the fixture's exactness contract: null
    assert(rows.limit(1)
      .select(ScaleOps.synthJpeg(lit(12L), lit(16L), lit(1L), 0).isNull)
      .head().getBoolean(0))
  }

  test("SynthJpeg progressive: spectral-selection + successive-approximation scans decode to the exact block formula") {
    import org.apache.spark.sql.graftnative.JpegSynth
    // modes 3-5 = progressive forms of gray / 4:2:0 / 4:4:4; same sizes
    // and chroma-variant coverage as the baseline test — progressive
    // re-codes the identical quantized coefficients losslessly
    val rows = Seq((16L, 16L, 0L), (32L, 16L, 1L), (48L, 32L, 2L),
      (16L, 32L, 3L), (32L, 32L, 5L), (48L, 16L, 6L)).toDF("w", "h", "seed")
    for (mode <- 3 to 5) {
      val dec = rows.select(col("seed"), col("w"), col("h"),
        ScaleOps.imageDecode(ScaleOps.synthJpeg(col("w"), col("h"),
          col("seed"), mode)).as("r")).collect()
      dec.foreach { r =>
        val seed = r.getLong(0)
        val w = r.getLong(1).toInt; val h = r.getLong(2).toInt
        val st = r.getStruct(3)
        assert(st.getString(0) == "jpeg", s"mode=$mode seed=$seed")
        assert(st.getInt(1) == w && st.getInt(2) == h, s"mode=$mode seed=$seed")
        val ch = st.getInt(3)
        assert(ch == (if (mode == 3) 1 else 3))
        val px = st.getAs[Array[Byte]](4)
        val v = JpegSynth.ChromaVariants(java.lang.Math.floorMod(seed, 4).toInt)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val yv = JpegSynth.lumaAt(seed, w, x, y)
            if (ch == 1)
              assert((px(y * w + x) & 0xFF) == yv,
                s"mode=$mode seed=$seed ($x,$y)")
            else {
              val d = (y * w + x) * 3
              assert((px(d) & 0xFF) == yv + v._3 &&
                (px(d + 1) & 0xFF) == yv + v._4 &&
                (px(d + 2) & 0xFF) == yv + v._5,
                s"mode=$mode seed=$seed ($x,$y)")
            }
            x += 1
          }
          y += 1
        }
      }
    }
    // a TRUNCATED progressive stream (EOI before any scan data, or a
    // scan cut mid-entropy-data) rejects — never partial pixels
    val full = rows.limit(1)
      .select(ScaleOps.synthJpeg(lit(16L), lit(16L), lit(1L), 4))
      .head().getAs[Array[Byte]](0)
    def decBytes(b: Array[Byte]): String =
      Seq(Tuple1(b)).toDF("p")
        .select(ScaleOps.imageDecode(col("p")).as("r"))
        .select(col("r.format")).head().getString(0)
    assert(decBytes(full) == "jpeg")
    // drop the EOI plus some scan tail
    assert(decBytes(full.dropRight(8)) == "unknown")
    // cut inside the FIRST scan: find the first SOS and truncate after it
    val firstSos = (0 until full.length - 1).find(i =>
      (full(i) & 0xFF) == 0xFF && (full(i + 1) & 0xFF) == 0xDA).get
    assert(decBytes(full.take(firstSos + 20)) == "unknown")
  }

  test("ImageDecode: golden hand-packed PROGRESSIVE JPEG — negative coefficients, refinement sign, baseline equivalence") {
    // hand-built 8×8 grayscale streams with quant table all-1s and a
    // three-coefficient spectrum (DC, zz1, zz3): the progressive coding
    // (DC first Al=1 → AC first Al=1 → DC refine → AC refine) must
    // reconstruct the identical spectrum as a baseline single scan —
    // negative values pin the arithmetic-vs-toward-zero point transform
    // and the refinement sign conventions the fixture (all-nonnegative
    // ACs) cannot reach
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, marker.toByte,
        (((payload.length + 2) >> 8) & 0xFF).toByte,
        ((payload.length + 2) & 0xFF).toByte) ++ payload
    val dqt = seg(0xDB, Array[Byte](0x00) ++ Array.fill(64)(1.toByte))
    def sof(marker: Int) = seg(marker, Array[Byte](8, 0, 8, 0, 8, 1, 1, 0x11, 0))
    // DC table: categories 0..3 at length 2 ('00'..'11')
    val dhtDc = seg(0xC4, Array[Byte](0x00) ++
      Array[Byte](0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
      Array[Byte](0, 1, 2, 3))
    // AC table: 7 symbols at length 3 ('000'..'110')
    val acSyms = Array(0x00, 0x01, 0x02, 0x03, 0x11, 0x12, 0xF0)
    val dhtAc = seg(0xC4, Array[Byte](0x10) ++
      Array[Byte](0, 0, 7, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
      acSyms.map(_.toByte))
    val acCode = acSyms.zipWithIndex.toMap // symbol -> 3-bit code
    val dcCode = Map(0 -> 0, 1 -> 1, 2 -> 2, 3 -> 3) // 2-bit codes
    class BW {
      val out = collection.mutable.ArrayBuffer.empty[Byte]
      var acc = 0; var n = 0
      def put(v: Int, len: Int): Unit = (len - 1 to 0 by -1).foreach { k =>
        acc = (acc << 1) | ((v >> k) & 1); n += 1
        if (n == 8) {
          out += acc.toByte
          if ((acc & 0xFF) == 0xFF) out += 0 // byte stuffing
          acc = 0; n = 0
        }
      }
      def pad(): Array[Byte] = { if (n > 0) put((1 << (8 - n)) - 1, 8 - n); out.toArray }
    }
    def mag(v: Int, s: Int): Int = if (v >= 0) v else v + (1 << s) - 1
    def bitLen(v: Int) = 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def sos(comps: Array[Byte], ss: Int, se: Int, ah: Int, al: Int,
        body: BW => Unit): Array[Byte] = {
      val hdr = seg(0xDA, Array[Byte]((comps.length / 2).toByte) ++ comps ++
        Array[Byte](ss.toByte, se.toByte, ((ah << 4) | al).toByte))
      val bw = new BW
      body(bw)
      hdr ++ bw.pad()
    }
    def decodePx(b: Array[Byte]): (String, Seq[Byte]) = {
      val st = Seq(Tuple1(b)).toDF("p")
        .select(ScaleOps.imageDecode(col("p")).as("r"))
        .select(col("r.format"), col("r.pixels")).head()
      (st.getString(0),
        Option(st.get(1)).map(_.asInstanceOf[Array[Byte]].toSeq).orNull)
    }
    val soi = Array(0xFF.toByte, 0xD8.toByte)
    val eoi = Array(0xFF.toByte, 0xD9.toByte)
    for ((dc, ac1, ac3) <- Seq((-6, -5, 1), (-6, -5, -1), (7, 4, -3))) {
      // baseline reference: one full scan of the same spectrum
      val base = soi ++ dqt ++ sof(0xC0) ++ dhtDc ++ dhtAc ++
        sos(Array[Byte](1, 0x00), 0, 63, 0, 0, { bw =>
          val sD = bitLen(dc)
          bw.put(dcCode(sD), 2); bw.put(mag(dc, sD), sD)
          val s1 = bitLen(ac1)
          bw.put(acCode(s1), 3); bw.put(mag(ac1, s1), s1) // r=0 at zz1
          val s3 = bitLen(ac3)
          bw.put(acCode(0x10 | s3), 3); bw.put(mag(ac3, s3), s3) // r=1 at zz3
          bw.put(acCode(0x00), 3) // EOB
        }) ++ eoi
      val (fB, pxB) = decodePx(base)
      assert(fB == "jpeg", s"baseline ($dc,$ac1,$ac3)")
      // progressive: the same spectrum across four scans
      val prog = soi ++ dqt ++ sof(0xC2) ++ dhtDc ++ dhtAc ++
        sos(Array[Byte](1, 0x00), 0, 0, 0, 1, { bw =>
          val v = dc >> 1 // arithmetic shift (G.1.2.1)
          val s = bitLen(v)
          bw.put(dcCode(s), 2); if (s > 0) bw.put(mag(v, s), s)
        }) ++
        sos(Array[Byte](1, 0x00), 1, 63, 0, 1, { bw =>
          // toward-zero point transform (G.1.2.2)
          def pt(v: Int) = if (v < 0) -((-v) >> 1) else v >> 1
          val t1 = pt(ac1); val t3 = pt(ac3)
          if (t1 != 0) { val s = bitLen(t1); bw.put(acCode(s), 3); bw.put(mag(t1, s), s) }
          if (t3 != 0) {
            val r = if (t1 != 0) 1 else 2 // zz2 (and zz1 if zero) skipped
            val s = bitLen(t3)
            bw.put(acCode((r << 4) | s), 3); bw.put(mag(t3, s), s)
          }
          bw.put(acCode(0x00), 3) // EOB for the rest
        }) ++
        sos(Array[Byte](1, 0x00), 0, 0, 1, 0, bw => bw.put(dc & 1, 1)) ++
        sos(Array[Byte](1, 0x00), 1, 63, 1, 0, { bw =>
          // G.1.2.3 refinement: history from the Al=1 scan
          def hist(v: Int) = if (v < 0) -((-v) >> 1) else v >> 1
          val brB = collection.mutable.ArrayBuffer.empty[Int]
          var r = 0
          Seq((1, ac1), (2, 0), (3, ac3)).foreach { case (_, v) =>
            val t = math.abs(v)
            if (t == 0) r += 1
            else if (hist(v) != 0) brB += (t & 1)
            else { // newly significant
              bw.put(acCode((r << 4) | 1), 3)
              bw.put(if (v < 0) 0 else 1, 1)
              brB.foreach(bit => bw.put(bit, 1)); brB.clear()
              r = 0
            }
          }
          // trailing zz4..63 all zero-history: one EOB covering the
          // block's remainder, then the still-buffered correction bits
          bw.put(acCode(0x00), 3)
          brB.foreach(bit => bw.put(bit, 1))
        }) ++ eoi
      val (fP, pxP) = decodePx(prog)
      assert(fP == "jpeg", s"progressive ($dc,$ac1,$ac3)")
      assert(pxP == pxB,
        s"progressive pixels must equal baseline for spectrum ($dc,$ac1,$ac3)")
    }
  }

  test("ImageDecode: golden hand-packed JPEG — DC-only blocks, crop, reject matrix") {
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, marker.toByte,
        (((payload.length + 2) >> 8) & 0xFF).toByte,
        ((payload.length + 2) & 0xFF).toByte) ++ payload
    // DQT table 0, zigzag order: DC step 8, everything else 16
    val dqt = seg(0xDB, Array[Byte](0x00) ++
      Array.tabulate[Byte](64)(i => if (i == 0) 8 else 16))
    // custom minimal DHT: DC table = one length-1 code for size 3;
    // AC table = one length-1 code for EOB — the decoder must build
    // these from the DHT bytes, nothing standard about them
    val dhtDc = seg(0xC4, Array[Byte](0x00,
      1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 3))
    val dhtAc = seg(0xC4, Array[Byte](0x10,
      1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0))
    val sos = seg(0xDA, Array[Byte](1, 1, 0x00, 0, 63, 0))
    def sof(w: Int, h: Int): Array[Byte] = seg(0xC0, Array[Byte](8,
      ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
      ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte, 1, 1, 0x11, 0))
    val soi = Array(0xFF.toByte, 0xD8.toByte)
    val eoi = Array(0xFF.toByte, 0xD9.toByte)
    // single 8x8: DC diff 5 (size 3, bits 101), EOB; coefficient 5·8 = 40,
    // flat IDCT value 40/8 + 128 = 133. Stream 0 101 0 + pad 111 = 0x57
    val one = soi ++ dqt ++ sof(8, 8) ++ dhtDc ++ dhtAc ++ sos ++
      Array(0x57.toByte) ++ eoi
    val (f1, w1, h1, c1, p1) = decodeRaster(one)
    assert((f1, w1, h1, c1) == (("jpeg", 8, 8, 1)))
    assert(p1 == Seq.fill(64)(133.toByte))
    // 12x10 (2x2 MCU grid, cropped): DC diffs 5,-5,7,-7 → block values
    // 133,128,135,128 laid out (0,0),(0,1),(1,0),(1,1); bit stream
    // 0 101 0 | 0 010 0 | 0 111 0 | 0 000 0 + pad = 0x51 0x1C 0x0F
    val four = soi ++ dqt ++ sof(12, 10) ++ dhtDc ++ dhtAc ++ sos ++
      Array(0x51.toByte, 0x1C.toByte, 0x0F.toByte) ++ eoi
    val (f4, w4, h4, c4, p4) = decodeRaster(four)
    assert((f4, w4, h4, c4) == (("jpeg", 12, 10, 1)))
    val want = for (y <- 0 until 10; x <- 0 until 12) yield
      (if (y < 8) { if (x < 8) 133 else 128 }
       else { if (x < 8) 135 else 128 }).toByte
    assert(p4 == want)
    // reject matrix: header-only (no scan), progressive SOF2, truncated
    // entropy data, nonzero restart interval, 12-bit precision
    val headerOnly = Seq(Tuple1(1L)).toDF("i")
      .select(ScaleOps.imageDecode(
        ScaleOps.synthJpegHeader(lit(64L), lit(48L))).getField("format"))
      .head().getString(0)
    assert(headerOnly == "unknown")
    val sof2 = one.clone()
    sof2(dqt.length + 2 + 1) = 0xC2.toByte // SOF0 → SOF2 marker byte
    // a progressive frame with a BASELINE-shaped scan header (Ss=0,
    // Se=63) violates G.1.2's DC-scan rule — still a reject, but for
    // the header, not the (round-11-supported) SOF2 marker itself
    assert(decodeRaster(sof2)._1 == "unknown")
    assert(decodeRaster(one.dropRight(3))._1 == "unknown") // torn scan
    val deep = soi ++ dqt ++ seg(0xC0, Array[Byte](12, 0, 8, 0, 8, 1, 1,
      0x11, 0)) ++ dhtDc ++ dhtAc ++ sos ++ Array(0x57.toByte) ++ eoi
    assert(decodeRaster(deep)._1 == "unknown")

    // ---- restart intervals (round 11: DRI was an honest reject before)
    // DRI with a single MCU never reaches a boundary: same pixels
    val driOne = soi ++ dqt ++ sof(8, 8) ++ dhtDc ++ dhtAc ++
      seg(0xDD, Array[Byte](0, 4)) ++ sos ++ Array(0x57.toByte) ++ eoi
    assert(decodeRaster(driOne) == (("jpeg", 8, 8, 1, p1)))
    // 12x10 four-MCU grid, DRI = 1: an RSTn between every MCU, each
    // resetting DC prediction — diffs ARE the block values (5, 4, 7, 4 →
    // flat blocks 133, 132, 135, 132); each MCU's bits pad to a byte
    // (0 sss 0 + 1-pad): 5→0x57, 4→0x47, 7→0x77
    def rst(k: Int) = Array(0xFF.toByte, (0xD0 + k).toByte)
    val driFour = soi ++ dqt ++ sof(12, 10) ++ dhtDc ++ dhtAc ++
      seg(0xDD, Array[Byte](0, 1)) ++ sos ++
      Array(0x57.toByte) ++ rst(0) ++ Array(0x47.toByte) ++ rst(1) ++
      Array(0x77.toByte) ++ rst(2) ++ Array(0x47.toByte) ++ eoi
    val (fR, wR, hR, cR, pR) = decodeRaster(driFour)
    assert((fR, wR, hR, cR) == (("jpeg", 12, 10, 1)))
    val wantR = for (y <- 0 until 10; x <- 0 until 12) yield
      (if (y < 8) { if (x < 8) 133 else 132 }
       else { if (x < 8) 135 else 132 }).toByte
    assert(pR == wantR, "restart-separated MCUs with DC-pred resets")
    // the RSTn cycle is checked: swapping the first two markers rejects
    val driBad = soi ++ dqt ++ sof(12, 10) ++ dhtDc ++ dhtAc ++
      seg(0xDD, Array[Byte](0, 1)) ++ sos ++
      Array(0x57.toByte) ++ rst(1) ++ Array(0x47.toByte) ++ rst(0) ++
      Array(0x77.toByte) ++ rst(2) ++ Array(0x47.toByte) ++ eoi
    assert(decodeRaster(driBad)._1 == "unknown")
  }

  test("SynthWebpL: really Huffman-coded fixtures decode back to the formula") {
    // sizes span single-pixel to multi-row; seeds vary the histograms
    // (and therefore the constructed code lengths) per image. 16×16 at
    // an odd seed pins the uniform-histogram collapse: 256 pixels hit
    // every red value exactly once → all code lengths equal → the
    // code-length code itself is single-symbol (zero bits per token)
    val rows = Seq((1L, 1L, 0L), (5L, 3L, 1L), (13L, 11L, 7L), (8L, 9L, 42L),
      (16L, 16L, 1L), (16L, 16L, 2L), (32L, 32L, 3L)).toDF("w", "h", "seed")
    val dec = rows.select(col("seed"), col("w"), col("h"),
      ScaleOps.imageDecode(ScaleOps.synthWebpL(col("w"), col("h"),
        col("seed"))).as("r")).collect()
    dec.foreach { r =>
      val seed = r.getLong(0)
      val w = r.getLong(1).toInt; val h = r.getLong(2).toInt
      val st = r.getStruct(3)
      assert(st.getString(0) == "webp", s"seed=$seed")
      assert(st.getInt(1) == w && st.getInt(2) == h && st.getInt(3) == 3)
      val px = st.getAs[Array[Byte]](4)
      def pix(idx: Int) = java.lang.Math.floorMod(seed * 31 + idx * 7, 256)
      px.zipWithIndex.foreach { case (b, i) =>
        assert((b & 0xFF) == pix(i), s"webp seed=$seed byte $i") }
    }
  }

  test("WebpCodec: golden hand-packed VP8L transforms — all 14 predictor modes, cross-color, meta-Huffman, under-subscription") {
    // LSB-first bit writer (duplicated from the LZ77 golden test — these
    // goldens pin the spec semantics by hand, independent of the
    // encoder/decoder pair, so they share nothing with WebpSynth)
    class BW {
      val out = collection.mutable.ArrayBuffer.empty[Int]
      var acc = 0L; var n = 0
      def put(v: Long, len: Int): Unit = {
        acc |= (v & ((1L << len) - 1)) << n; n += len
        while (n >= 8) { out += (acc & 0xFF).toInt; acc >>>= 8; n -= 8 }
      }
      def code(c: Int, len: Int): Unit =
        (len - 1 to 0 by -1).foreach(k => put((c >> k) & 1, 1))
      def flush(): Unit = if (n > 0) { out += (acc & 0xFF).toInt; n = 0 }
    }
    def riff(payload: Seq[Int]): Array[Byte] = {
      def le32(v: Int) = Seq(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF,
        (v >> 24) & 0xFF)
      val p = payload ++ (if (payload.size % 2 == 1) Seq(0) else Seq())
      (Seq('R', 'I', 'F', 'F').map(_.toInt) ++ le32(4 + 8 + p.size) ++
        Seq('W', 'E', 'B', 'P', 'V', 'P', '8', 'L').map(_.toInt) ++
        le32(payload.size) ++ p).map(_.toByte).toArray
    }
    def header(bw: BW, w: Int, h: Int): Unit = {
      bw.put(w - 1, 14); bw.put(h - 1, 14); bw.put(0, 1); bw.put(0, 3)
    }
    def simpleOne(bw: BW, sym: Int): Unit = {
      bw.put(1, 1); bw.put(0, 1); bw.put(1, 1); bw.put(sym, 8)
    }
    // two-symbol simple code, 1 bit per symbol; s0 < s1 so canonical
    // assignment gives s0 = '0', s1 = '1'
    def simpleTwo(bw: BW, s0: Int, s1: Int): Unit = {
      require(s0 < s1)
      bw.put(1, 1); bw.put(1, 1); bw.put(1, 1); bw.put(s0, 8); bw.put(s1, 8)
    }
    def greenTwoSymbols(bw: BW, lit: Int, special: Int, alphabet: Int): Unit = {
      bw.put(0, 1); bw.put(19 - 4, 4)
      val lens = Map(0 -> 2, 1 -> 2, 17 -> 2, 18 -> 2)
      Seq(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
        .foreach(s => bw.put(lens.getOrElse(s, 0).toLong, 3))
      bw.put(0, 1)
      def tok1(): Unit = bw.code(1, 2)
      def zeros(n0: Int): Unit = {
        var left = n0
        while (left > 0) {
          if (left >= 11) { val t = math.min(left, 138)
            bw.code(3, 2); bw.put(t - 11, 7); left -= t }
          else if (left >= 3) { bw.code(2, 2); bw.put(left - 3, 3); left = 0 }
          else { bw.code(0, 2); left -= 1 }
        }
      }
      zeros(lit); tok1(); zeros(special - lit - 1); tok1()
      zeros(alphabet - special - 1)
    }
    // a 1×1 entropy-coded sub-image (predictor-mode / color / entropy
    // image): cache bit + five codes; all-single codes → zero pixel bits
    def subImage1(bw: BW, green: Int, red: Int, blue: Int): Unit = {
      bw.put(0, 1) // no color cache
      simpleOne(bw, green); simpleOne(bw, red); simpleOne(bw, blue)
      simpleOne(bw, 255); simpleOne(bw, 0)
    }

    // ---- all 14 predictor modes on a 3×2 image, one 4-px block (so the
    // block mode applies at the two interior pixels; the (2,1) pixel also
    // exercises the rightmost-column top-right WRAP rule). Expected
    // pixels computed by an independent per-channel reference
    // implementation of the spec's mode formulas.
    type Px = (Int, Int, Int) // (r, g, b); alpha is 255 throughout
    def add(a: Px, b: Px): Px =
      ((a._1 + b._1) & 0xFF, (a._2 + b._2) & 0xFF, (a._3 + b._3) & 0xFF)
    def avg2(a: Px, b: Px): Px =
      ((a._1 + b._1) / 2, (a._2 + b._2) / 2, (a._3 + b._3) / 2)
    def clamp(v: Int) = math.max(0, math.min(255, v))
    def refPred(m: Int, l: Px, t: Px, tr: Px, tl: Px): Px = m match {
      case 0 => (0, 0, 0)
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 =>
        // Select: Manhattan distance to the gradient L + T − TL (alpha
        // channel contributes 0 here — all alphas equal)
        def d(p: Px, q: Px) =
          math.abs(p._1 - q._1) + math.abs(p._2 - q._2) + math.abs(p._3 - q._3)
        val g = (l._1 + t._1 - tl._1, l._2 + t._2 - tl._2, l._3 + t._3 - tl._3)
        if (d(g, l) < d(g, t)) l else t
      case 12 => (clamp(l._1 + t._1 - tl._1), clamp(l._2 + t._2 - tl._2),
        clamp(l._3 + t._3 - tl._3))
      case 13 =>
        val a = avg2(l, t)
        (clamp(a._1 + (a._1 - tl._1) / 2), clamp(a._2 + (a._2 - tl._2) / 2),
          clamp(a._3 + (a._3 - tl._3) / 2))
    }
    val res = Array[Px]((3, 5, 7), (9, 11, 13), (3, 11, 7),
      (9, 5, 13), (3, 5, 7), (9, 11, 13))
    for (mode <- 0 to 13) {
      val bw = new BW
      bw.put(0x2F, 8); header(bw, 3, 2)
      bw.put(1, 1); bw.put(0, 2) // predictor transform
      bw.put(0, 3) // size_bits − 2 = 0 → 4-px blocks → 1×1 mode image
      subImage1(bw, green = mode, red = 0, blue = 0)
      bw.put(0, 1) // end of transforms
      bw.put(0, 1) // no color cache
      bw.put(0, 1) // no meta-Huffman
      greenTwoSymbols(bw, lit = 5, special = 11, alphabet = 280)
      simpleTwo(bw, 3, 9) // red
      simpleTwo(bw, 7, 13) // blue
      simpleOne(bw, 255) // alpha
      simpleOne(bw, 0) // distance
      res.foreach { case (r, g, b) =>
        bw.put(if (g == 11) 1 else 0, 1)
        bw.put(if (r == 9) 1 else 0, 1)
        bw.put(if (b == 13) 1 else 0, 1)
      }
      bw.flush()
      val p0 = res(0)
      val p1 = add(p0, res(1))
      val p2 = add(p1, res(2))
      val p3 = add(p0, res(3))
      val p4 = add(refPred(mode, p3, p1, p2, p0), res(4))
      val p5 = add(refPred(mode, p4, p2, p3, p1), res(5)) // TR wraps to p3
      val want = Seq(p0, p1, p2, p3, p4, p5)
        .flatMap(p => Seq(p._1, p._2, p._3)).map(_.toByte)
      val (f, w, h, c, px) = decodeRaster(riff(bw.out.toSeq))
      assert((f, w, h, c) == (("webp", 3, 2, 3)), s"mode $mode header")
      assert(px == want, s"mode $mode pixels")
    }
    // spot-check two modes against fully hand-computed numbers (the
    // reference above re-derives the spec; these two rows were worked on
    // paper): p0=(3,5,7) p1=(12,16,20) p2=(15,27,27) p3=(12,10,20)
    //   mode 7 (avg2(L,T)): p4 = ((12+15)/2+3? no: L=p3,T=p1) =
    //   ((12+12)/2, (10+16)/2, (20+20)/2) = (12,13,20) + (3,5,7) = (15,18,27)
    locally {
      val p0 = (3, 5, 7); val p1 = add(p0, res(1)); val p3 = add(p0, res(3))
      assert(add(avg2(p3, p1), res(4)) == ((15, 18, 27)))
    }
    // mode > 13 in the mode image must reject
    locally {
      val bw = new BW
      bw.put(0x2F, 8); header(bw, 3, 2)
      bw.put(1, 1); bw.put(0, 2); bw.put(0, 3)
      subImage1(bw, green = 14, red = 0, blue = 0)
      bw.put(0, 1); bw.put(0, 1); bw.put(0, 1)
      greenTwoSymbols(bw, lit = 5, special = 11, alphabet = 280)
      simpleTwo(bw, 3, 9); simpleTwo(bw, 7, 13)
      simpleOne(bw, 255); simpleOne(bw, 0)
      res.foreach { case (r, g, b) =>
        bw.put(if (g == 11) 1 else 0, 1); bw.put(if (r == 9) 1 else 0, 1)
        bw.put(if (b == 13) 1 else 0, 1)
      }
      bw.flush()
      assert(decodeRaster(riff(bw.out.toSeq))._1 == "unknown")
    }

    // ---- cross-color transform, 2×1: cte green_to_red = 32 (delta = g),
    // stored in the sub-image pixel's BLUE channel. Second pixel's green
    // 130 is NEGATIVE as int8 — pins the signed multiplier semantics.
    locally {
      val bw = new BW
      bw.put(0x2F, 8); header(bw, 2, 1)
      bw.put(1, 1); bw.put(1, 2) // color transform
      bw.put(0, 3)
      subImage1(bw, green = 0, red = 0, blue = 32) // g2b=0, r2b=0, g2r=32
      bw.put(0, 1); bw.put(0, 1); bw.put(0, 1)
      greenTwoSymbols(bw, lit = 7, special = 130, alphabet = 280)
      simpleTwo(bw, 5, 200) // red
      simpleTwo(bw, 1, 9) // blue
      simpleOne(bw, 255); simpleOne(bw, 0)
      // p0 = (r5, g7, b9); p1 = (r200, g130, b1)
      bw.put(0, 1); bw.put(0, 1); bw.put(1, 1)
      bw.put(1, 1); bw.put(1, 1); bw.put(0, 1)
      bw.flush()
      val (f, w, h, _, px) = decodeRaster(riff(bw.out.toSeq))
      assert((f, w, h) == (("webp", 2, 1)))
      // red' = r + (32·(int8)g >> 5) = r + g (g=7) / r − 126 (g=130→−126)
      assert(px == Seq(12, 7, 9, 74, 130, 1).map(_.toByte))
    }
    // cross-color red_to_blue chains on the RECOVERED red, 1×1
    locally {
      val bw = new BW
      bw.put(0x2F, 8); header(bw, 1, 1)
      bw.put(1, 1); bw.put(1, 2)
      bw.put(0, 3)
      subImage1(bw, green = 16, red = 224, blue = 0) // g2b=16, r2b=−32
      bw.put(0, 1); bw.put(0, 1); bw.put(0, 1)
      simpleOne(bw, 64) // green
      simpleOne(bw, 100) // red
      simpleOne(bw, 50) // blue
      simpleOne(bw, 255); simpleOne(bw, 0)
      bw.flush()
      val (_, _, _, _, px) = decodeRaster(riff(bw.out.toSeq))
      // blue' = 50 + (16·64 >> 5) + (−32·(int8)100 >> 5) = 50+32−100 = 238
      assert(px == Seq(100, 64, 238 - 256).map(_.toByte))
    }

    // ---- meta-Huffman, 8×1: entropy image 2×1 routes the two 4-px
    // blocks to two distinct all-single-code groups
    locally {
      val bw = new BW
      bw.put(0x2F, 8); header(bw, 8, 1)
      bw.put(0, 1) // no transforms
      bw.put(0, 1) // no color cache
      bw.put(1, 1) // meta-Huffman
      bw.put(0, 3) // huffman_bits − 2 = 0 → 4-px cells → 2×1 image
      bw.put(0, 1) // entropy sub-image: no cache
      greenTwoSymbols(bw, lit = 0, special = 1, alphabet = 280)
      simpleOne(bw, 0); simpleOne(bw, 0); simpleOne(bw, 255); simpleOne(bw, 0)
      bw.put(0, 1); bw.put(1, 1) // entropy pixels: groups 0, 1
      // group 0: constant (r1, g100, b2); group 1: constant (r3, g200, b4)
      simpleOne(bw, 100); simpleOne(bw, 1); simpleOne(bw, 2)
      simpleOne(bw, 255); simpleOne(bw, 0)
      simpleOne(bw, 200); simpleOne(bw, 3); simpleOne(bw, 4)
      simpleOne(bw, 255); simpleOne(bw, 0)
      // 8 pixels, zero bits each
      bw.flush()
      val (f, w, h, _, px) = decodeRaster(riff(bw.out.toSeq))
      assert((f, w, h) == (("webp", 8, 1)))
      assert(px == (Seq.fill(4)(Seq(1, 100, 2)) ++
        Seq.fill(4)(Seq(3, 200, 4))).flatten.map(_.toByte))
    }

    // ---- LZ77 distance coverage (round-11 advice): a 2D-mapped
    // distance code > 1 and a linear distance > 120. 3×2 image: four
    // literals with alternating red, then a length-2 backref at distance
    // code 4 → DistMap(3) = (−1, 1) → d = 1·3 − 1 = 2; a wrong distance
    // (1 or 3) would copy the opposite red parity.
    locally {
      val bw = new BW
      bw.put(0x2F, 8); header(bw, 3, 2)
      bw.put(0, 1); bw.put(0, 1); bw.put(0, 1)
      greenTwoSymbols(bw, lit = 50, special = 257, alphabet = 280) // len code 1 → length 2
      simpleTwo(bw, 60, 70) // red alternates
      simpleOne(bw, 80) // blue
      simpleOne(bw, 255) // alpha
      simpleOne(bw, 3) // distance code 3 → prefix value 4 → DistMap(3)
      // literals: (g50, r60/70 alternating, b80) ×4, then green '1' = 257
      for (i <- 0 until 4) { bw.code(0, 1); bw.put(i & 1, 1) }
      bw.code(1, 1) // backref: length 2, distance from the single-symbol code
      bw.flush()
      val (f, w, h, _, px) = decodeRaster(riff(bw.out.toSeq))
      assert((f, w, h) == (("webp", 3, 2)))
      val lits = Seq(Seq(60, 50, 80), Seq(70, 50, 80), Seq(60, 50, 80),
        Seq(70, 50, 80))
      val want = (lits ++ Seq(lits(2), lits(3))).flatten.map(_.toByte)
      assert(px == want, "2D distance code 4 must resolve to d = 2")
    }
    // linear distance: 11×12 image, 122 literals with alternating red,
    // then a length-10 backref at distance code 13 + 5 extra bits 25 →
    // dRaw = (3 << 5) + 25 + 1 = 122 > 120 → LINEAR distance
    // dRaw − 120 = 2 (mistaking the raw 122 for the distance would
    // reject — only 122 pixels exist — and any off-by-one flips the
    // copied red parity).
    locally {
      val bw = new BW
      bw.put(0x2F, 8); header(bw, 11, 12)
      bw.put(0, 1); bw.put(0, 1); bw.put(0, 1)
      greenTwoSymbols(bw, lit = 90, special = 262, alphabet = 280) // len code 6
      simpleTwo(bw, 10, 20) // red alternates
      simpleOne(bw, 30) // blue
      simpleOne(bw, 255)
      simpleOne(bw, 13) // distance code 13: 5 extra bits
      for (i <- 0 until 122) { bw.code(0, 1); bw.put(i & 1, 1) }
      bw.code(1, 1) // green 262 → length prefix 6 → 2 extra bits
      bw.put(1, 2) // length = 8 + 1 + 1 = 10
      bw.put(25, 5) // distance = (3 << 5) + 25 + 1 = 122 → linear d = 2
      bw.flush()
      val (f, w, h, _, px) = decodeRaster(riff(bw.out.toSeq))
      assert((f, w, h) == (("webp", 11, 12)))
      // pixels 122..131 copy from pos−2: red parity equals (k−2) % 2 = k%2
      (122 until 132).foreach { k =>
        val r = px(3 * k) & 0xFF
        assert(r == (if (k % 2 == 0) 10 else 20), s"pixel $k red $r")
        assert((px(3 * k + 1) & 0xFF) == 90 && (px(3 * k + 2) & 0xFF) == 30)
      }
    }

    // ---- under-subscribed normal code must reject (Kraft gate): three
    // length-2 symbols fill only 3/4 of the code space
    locally {
      val bw = new BW
      bw.put(0x2F, 8); header(bw, 2, 2)
      bw.put(0, 1); bw.put(0, 1); bw.put(0, 1)
      // green: normal code, cl lengths {0:2, 2:2, 17:2, 18:2} (complete
      // cl code), then tokens: three '2'-length symbols at 0,1,2 and
      // zeros elsewhere → under-subscribed green code
      bw.put(0, 1); bw.put(19 - 4, 4)
      val lens = Map(0 -> 2, 2 -> 2, 17 -> 2, 18 -> 2)
      Seq(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
        .foreach(s => bw.put(lens.getOrElse(s, 0).toLong, 3))
      bw.put(0, 1) // no max-symbol shortcut
      // canonical cl codes over {0,2,17,18} all len 2: 0='00', 2='01',
      // 17='10', 18='11'
      bw.code(1, 2); bw.code(1, 2); bw.code(1, 2) // three len-2 symbols
      // zeros for the remaining 277 green slots
      var left = 277
      while (left > 0) {
        if (left >= 11) { val t = math.min(left, 138)
          bw.code(3, 2); bw.put(t - 11, 7); left -= t }
        else { bw.code(0, 2); left -= 1 }
      }
      bw.flush()
      assert(decodeRaster(riff(bw.out.toSeq))._1 == "unknown")
    }
  }

  test("WebpCodec: golden hand-packed VP8L color-indexing — packing, delta palette, out-of-range index, combo reject") {
    class BW {
      val out = collection.mutable.ArrayBuffer.empty[Int]
      var acc = 0L; var n = 0
      def put(v: Long, len: Int): Unit = {
        acc |= (v & ((1L << len) - 1)) << n; n += len
        while (n >= 8) { out += (acc & 0xFF).toInt; acc >>>= 8; n -= 8 }
      }
      def code(c: Int, len: Int): Unit =
        (len - 1 to 0 by -1).foreach(k => put((c >> k) & 1, 1))
      def flush(): Unit = if (n > 0) { out += (acc & 0xFF).toInt; n = 0 }
    }
    def riff(payload: Seq[Int]): Array[Byte] = {
      def le32(v: Int) = Seq(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF,
        (v >> 24) & 0xFF)
      val p = payload ++ (if (payload.size % 2 == 1) Seq(0) else Seq())
      (Seq('R', 'I', 'F', 'F').map(_.toInt) ++ le32(4 + 8 + p.size) ++
        Seq('W', 'E', 'B', 'P', 'V', 'P', '8', 'L').map(_.toInt) ++
        le32(payload.size) ++ p).map(_.toByte).toArray
    }
    def simpleOne(bw: BW, sym: Int): Unit = {
      bw.put(1, 1); bw.put(0, 1); bw.put(1, 1); bw.put(sym, 8)
    }
    def simpleTwo(bw: BW, s0: Int, s1: Int): Unit = {
      require(s0 < s1)
      bw.put(1, 1); bw.put(1, 1); bw.put(1, 1); bw.put(s0, 8); bw.put(s1, 8)
    }
    // 5×2 image, 3-color palette → widthBits 2 (4 px per coded pixel,
    // 2 bits each, LSB-first), coded width ceil(5/4) = 2. Palette
    // (10,20,30), (15,25,35), (20,30,40) — DELTAS (10,20,30), (5,5,5),
    // (5,5,5), every channel a real 2-symbol code. Index grid
    // (row-major): row0 = 0,1,2,0,1 ; row1 = 2,0,1,2,3 — the last index
    // (3) is OUT OF RANGE for a 3-color palette → 0x00000000 per spec.
    val bw2 = new BW
    bw2.put(0x2F, 8)
    bw2.put(5 - 1, 14); bw2.put(2 - 1, 14); bw2.put(0, 1); bw2.put(0, 3)
    bw2.put(1, 1); bw2.put(3, 2)
    bw2.put(3 - 1, 8)
    bw2.put(0, 1) // palette sub-image: no cache
    simpleTwo(bw2, 5, 20) // green deltas {20, 5, 5}: 20->'1'? no: 5<20 so 5='0',20='1'
    simpleTwo(bw2, 5, 10) // red deltas {10, 5, 5}
    simpleTwo(bw2, 5, 30) // blue deltas {30, 5, 5}
    simpleTwo(bw2, 0, 255) // alpha deltas {255, 0, 0}
    simpleOne(bw2, 0) // distance
    // palette pixels: delta0 (a255,r10,g20,b30): g'1' r'1' b'1' a'1';
    // deltas 1,2 (a0,r5,g5,b5): g'0' r'0' b'0' a'0' ×2
    bw2.put(1, 1); bw2.put(1, 1); bw2.put(1, 1); bw2.put(1, 1)
    bw2.put(0, 1); bw2.put(0, 1); bw2.put(0, 1); bw2.put(0, 1)
    bw2.put(0, 1); bw2.put(0, 1); bw2.put(0, 1); bw2.put(0, 1)
    bw2.put(0, 1) // end of transforms
    bw2.put(0, 1) // main image: no color cache
    bw2.put(0, 1) // no meta-Huffman
    // packed greens, 2 bits per index LSB-first:
    // row0: (0,1,2,0)->0b00_10_01_00=0x24, (1)->0x01
    // row1: (2,0,1,2)->0b10_01_00_10=0x92, (3)->0x03
    // distinct greens {0x24, 0x01, 0x92, 0x03}: 4 symbols — use a
    // normal green code? simple codes carry max 2 symbols; use two
    // 2-symbol... not possible. Emit greens via an 8-bit-first simple
    // code is out; instead reuse the LZ77 golden's greenTwoSymbols for
    // a 4-symbol normal code.
    def greenFour(bwx: BW, syms: Seq[Int]): Unit = {
      // normal code with four length-2 symbols through the code-length
      // coding (cl lengths {0:2, 2:2, 17:2, 18:2})
      bwx.put(0, 1); bwx.put(19 - 4, 4)
      val lens = Map(0 -> 2, 2 -> 2, 17 -> 2, 18 -> 2)
      Seq(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
        .foreach(s => bwx.put(lens.getOrElse(s, 0).toLong, 3))
      bwx.put(0, 1) // no max-symbol shortcut
      // cl codes: 0='00', 2='01', 17='10', 18='11'
      def zeros(n0: Int): Unit = {
        var left = n0
        while (left > 0) {
          if (left >= 11) { val t = math.min(left, 138)
            bwx.code(3, 2); bwx.put(t - 11, 7); left -= t }
          else if (left >= 3) { bwx.code(2, 2); bwx.put(left - 3, 3); left = 0 }
          else { bwx.code(0, 2); left -= 1 }
        }
      }
      var prev = -1
      syms.sorted.foreach { s =>
        zeros(s - prev - 1); bwx.code(1, 2); prev = s // cl symbol 2
      }
      zeros(280 - prev - 1)
    }
    val packedSyms = Seq(0x24, 0x01, 0x92, 0x03)
    greenFour(bw2, packedSyms)
    simpleOne(bw2, 0); simpleOne(bw2, 0); simpleOne(bw2, 255); simpleOne(bw2, 0)
    // canonical codes for sorted {0x01,0x03,0x24,0x92}: '00','01','10','11'
    val gc = packedSyms.sorted.zipWithIndex.toMap
    Seq(0x24, 0x01, 0x92, 0x03).foreach(s => bw2.code(gc(s), 2))
    bw2.flush()
    val st = Seq(Tuple1(riff(bw2.out.toSeq))).toDF("p")
      .select(ScaleOps.imageDecode(col("p")).as("r"))
      .select(col("r.format"), col("r.width"), col("r.height"), col("r.pixels"))
      .head()
    assert((st.getString(0), st.getInt(1), st.getInt(2)) == (("webp", 5, 2)))
    val px = st.getAs[Array[Byte]](3).map(_ & 0xFF).toSeq
    val pal = Seq(Seq(10, 20, 30), Seq(15, 25, 35), Seq(20, 30, 40))
    val want = (Seq(0, 1, 2, 0, 1).map(pal) ++
      Seq(2, 0, 1, 2).map(pal) :+ Seq(0, 0, 0)).flatten // idx 3 → black
    assert(px == want, s"palette pixels: got $px want $want")

    // combined transforms with indexing reject (decoder scope line)
    val bw3 = new BW
    bw3.put(0x2F, 8)
    bw3.put(1, 14); bw3.put(0, 14); bw3.put(0, 1); bw3.put(0, 3)
    bw3.put(1, 1); bw3.put(2, 2) // subtract-green first
    bw3.put(1, 1); bw3.put(3, 2) // then color-indexing
    bw3.put(1 - 1, 8)
    bw3.put(0, 1)
    simpleOne(bw3, 0); simpleOne(bw3, 0); simpleOne(bw3, 0); simpleOne(bw3, 255)
    simpleOne(bw3, 0)
    bw3.put(0, 1); bw3.put(0, 1); bw3.put(0, 1)
    simpleOne(bw3, 0); simpleOne(bw3, 0); simpleOne(bw3, 0); simpleOne(bw3, 255)
    simpleOne(bw3, 0)
    bw3.flush()
    assert(Seq(Tuple1(riff(bw3.out.toSeq))).toDF("p")
      .select(ScaleOps.imageDecode(col("p")).as("r"))
      .select(col("r.format")).head().getString(0) == "unknown")
  }

  test("SynthWebpLPalette: palette fixtures decode back to the index/palette formulas") {
    // seeds sweep palette sizes 2..32 → all four bundling widths
    val rows = (0L until 40L).map { seed =>
      (3 + seed % 11, 3 + seed % 9, seed)
    }.toDF("w", "h", "seed")
    val got = rows.select(col("seed"),
      ScaleOps.imageDecode(ScaleOps.synthWebpLPalette(
        col("w"), col("h"), col("seed"))).as("r"))
      .select(col("seed"), col("r.format"), col("r.width"), col("r.height"),
        col("r.pixels"))
      .collect()
    got.foreach { r =>
      val seed = r.getLong(0)
      assert(r.getString(1) == "webp", s"seed $seed rejected")
      val w = r.getInt(2); val h = r.getInt(3)
      val size = 2 + (seed % 31).toInt
      val px = r.get(4).asInstanceOf[Array[Byte]]
      var p = 0
      while (p < w * h) {
        val idx = java.lang.Math.floorMod(seed * 31 + p * 7L, size).toInt
        val er = java.lang.Math.floorMod(seed * 13 + idx * 11L, 256).toInt
        val eg = java.lang.Math.floorMod(seed * 17 + idx * 7L, 256).toInt
        val eb = java.lang.Math.floorMod(seed * 19 + idx * 3L, 256).toInt
        assert((px(3 * p) & 0xFF) == er && (px(3 * p + 1) & 0xFF) == eg &&
          (px(3 * p + 2) & 0xFF) == eb, s"seed $seed pixel $p")
        p += 1
      }
    }
  }

  test("SynthWebpLPred: predictor + meta-Huffman fixtures decode back to the formula") {
    // the round-trip across many (w, h, seed): every predictor mode and
    // the two-group meta path appear; equality is per-pixel exact
    val rows = (0L until 40L).map { seed =>
      (3 + seed % 11, 3 + seed % 9, seed)
    }.toDF("w", "h", "seed")
    val got = rows.select(col("seed"),
      ScaleOps.imageDecode(ScaleOps.synthWebpLPred(
        col("w"), col("h"), col("seed"))).as("r"))
      .select(col("seed"), col("r.format"), col("r.width"), col("r.height"),
        col("r.pixels"))
      .collect()
    got.foreach { r =>
      val seed = r.getLong(0)
      assert(r.getString(1) == "webp", s"seed $seed rejected")
      val w = r.getInt(2); val h = r.getInt(3)
      assert((w, h) == ((3 + seed % 11).toInt, (3 + seed % 9).toInt))
      val px = r.get(4).asInstanceOf[Array[Byte]]
      var p = 0
      while (p < 3 * w * h) {
        val want = java.lang.Math.floorMod(seed * 31 + p * 7, 256).toInt
        assert((px(p) & 0xFF) == want, s"seed $seed byte $p")
        p += 1
      }
    }
  }

  test("WebpCodec: golden hand-packed VP8L — LZ77 backref, color cache, reject matrix") {
    // LSB-first bit writer (the VP8L stream convention); Huffman codes
    // are emitted MSB-of-code-first via single-bit puts
    class BW {
      val out = collection.mutable.ArrayBuffer.empty[Int]
      var acc = 0L; var n = 0
      def put(v: Long, len: Int): Unit = {
        acc |= (v & ((1L << len) - 1)) << n; n += len
        while (n >= 8) { out += (acc & 0xFF).toInt; acc >>>= 8; n -= 8 }
      }
      def code(c: Int, len: Int): Unit =
        (len - 1 to 0 by -1).foreach(k => put((c >> k) & 1, 1))
      def flush(): Unit = if (n > 0) { out += (acc & 0xFF).toInt; n = 0 }
    }
    def riff(payload: Seq[Int]): Array[Byte] = {
      def le32(v: Int) = Seq(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF,
        (v >> 24) & 0xFF)
      val p = payload ++ (if (payload.size % 2 == 1) Seq(0) else Seq())
      (Seq('R', 'I', 'F', 'F').map(_.toInt) ++ le32(4 + 8 + p.size) ++
        Seq('W', 'E', 'B', 'P', 'V', 'P', '8', 'L').map(_.toInt) ++
        le32(payload.size) ++ p).map(_.toByte).toArray
    }
    def header(bw: BW, w: Int, h: Int): Unit = {
      bw.put(w - 1, 14); bw.put(h - 1, 14)
      bw.put(0, 1) // alpha hint
      bw.put(0, 3) // version
    }
    // a normal green code with exactly two length-1 symbols (lit, special),
    // emitted through the real code-length coding: a complete 4-symbol
    // cl code {0:'00', 1:'01', 17:'10', 18:'11'} so both repeat codes
    // AND single explicit zeros are expressible
    def greenTwoSymbols(bw: BW, lit: Int, special: Int, alphabet: Int): Unit = {
      bw.put(0, 1) // normal form
      bw.put(19 - 4, 4) // all 19 length slots, storage order 17,18,0,1,...
      val lens = Map(0 -> 2, 1 -> 2, 17 -> 2, 18 -> 2)
      Seq(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
        .foreach(s => bw.put(lens.getOrElse(s, 0).toLong, 3))
      bw.put(0, 1) // no max-symbol shortcut
      def tok1(): Unit = bw.code(1, 2) // cl symbol 1 ('01')
      def zeros(n0: Int): Unit = {
        var left = n0
        while (left > 0) {
          if (left >= 11) { val t = math.min(left, 138)
            bw.code(3, 2); bw.put(t - 11, 7); left -= t } // 18
          else if (left >= 3) { bw.code(2, 2); bw.put(left - 3, 3); left = 0 } // 17
          else { bw.code(0, 2); left -= 1 } // explicit single zero
        }
      }
      zeros(lit); tok1()
      zeros(special - lit - 1); tok1()
      zeros(alphabet - special - 1)
    }
    def simpleOne(bw: BW, sym: Int): Unit = {
      bw.put(1, 1); bw.put(0, 1); bw.put(1, 1); bw.put(sym, 8)
    }
    def decode(bytes: Array[Byte]) = decodeRaster(bytes)

    // ---- LZ77 golden: 2x2, literal (g10,r20,b30,a255) then a length-3
    // backref at distance 1 → four identical RGB pixels
    val lz = new BW
    lz.put(0x2F, 8); header(lz, 2, 2)
    lz.put(0, 1) // no transforms
    lz.put(0, 1) // no color cache
    lz.put(0, 1) // no meta-Huffman
    greenTwoSymbols(lz, lit = 10, special = 258, alphabet = 280)
    simpleOne(lz, 20); simpleOne(lz, 30); simpleOne(lz, 255) // r, b, a
    simpleOne(lz, 1) // distance code 1 → prefix value 2 → map (1,0) → 1
    lz.code(0, 1) // green '0' = literal 10 (r/b/a codes cost zero bits)
    lz.code(1, 1) // green '1' = symbol 258 → length prefix 2 → length 3
    lz.flush()
    val (f1, w1, h1, c1, p1) = decode(riff(lz.out.toSeq))
    assert((f1, w1, h1, c1) == (("webp", 2, 2, 3)))
    assert(p1 == Seq.fill(4)(Seq(20, 10, 30)).flatten.map(_.toByte))

    // ---- color-cache golden: 2x1, cache_bits=1; literal ARGB
    // 0xFF140A1E hashes (0x1E35A7BD·px >>> 31) to index 0, so green
    // symbol 280 replays it from the cache
    val cc = new BW
    cc.put(0x2F, 8); header(cc, 2, 1)
    cc.put(0, 1) // no transforms
    cc.put(1, 1); cc.put(1, 4) // color cache, 1 bit
    cc.put(0, 1) // no meta-Huffman
    greenTwoSymbols(cc, lit = 10, special = 280, alphabet = 282)
    simpleOne(cc, 20); simpleOne(cc, 30); simpleOne(cc, 255)
    simpleOne(cc, 0) // distance (unused)
    cc.code(0, 1) // literal
    cc.code(1, 1) // cache index 0
    cc.flush()
    val (f2, w2, h2, _, p2) = decode(riff(cc.out.toSeq))
    assert((f2, w2, h2) == (("webp", 2, 1)))
    assert(p2 == Seq(20, 10, 30, 20, 10, 30).map(_.toByte))

    // ---- reject matrix: truncated transform/meta headers (the
    // predictor and meta paths themselves are real since round 11 —
    // these streams end mid-field), bad version, truncation, backref
    // past start
    def rejected(build: BW => Unit): Unit = {
      val bw = new BW
      bw.put(0x2F, 8)
      build(bw)
      bw.flush()
      assert(decode(riff(bw.out.toSeq))._1 == "unknown")
    }
    rejected { bw => header(bw, 2, 2); bw.put(1, 1); bw.put(0, 2) } // predictor, truncated
    rejected { bw => header(bw, 2, 2); bw.put(0, 1); bw.put(0, 1); bw.put(1, 1) } // meta, truncated
    rejected { bw => header(bw, 2, 2); bw.put(1, 1); bw.put(3, 2) } // color-indexing: out of scope
    rejected { bw =>
      bw.put(1, 14); bw.put(1, 14); bw.put(0, 1); bw.put(1, 3) } // version != 0
    assert(decode(riff(lz.out.toSeq).dropRight(4))._1 == "unknown")
    rejected { bw => // backref with nothing emitted yet
      header(bw, 2, 2)
      bw.put(0, 1); bw.put(0, 1); bw.put(0, 1)
      greenTwoSymbols(bw, lit = 10, special = 258, alphabet = 280)
      simpleOne(bw, 20); simpleOne(bw, 30); simpleOne(bw, 255)
      simpleOne(bw, 1)
      bw.code(1, 1) // immediate length symbol at pos 0
    }
  }

  test("WebpCodec: golden deep-prefix VP8L — literal crossing the 45-bit peek") {
    // Regression for the literal fast path: G+R+B code lengths can sum
    // past 30 bits, at which point the alpha lookup window extends
    // beyond the 45-bit peek and its tail is zero padding — a complete
    // code resolves SOME symbol from padding, silently wrong and (when
    // the padded walk exits the tree early) with a wrong bit count that
    // desyncs every later pixel. This stream packs G=15, R=15, B=3 bits
    // (offset 33) and a true 15-bit all-ones alpha code whose padded
    // walk resolves a 13-bit sibling: the next pixel then decodes from
    // the two leftover alpha bits and comes out wrong.
    class BW {
      val out = collection.mutable.ArrayBuffer.empty[Int]
      var acc = 0L; var n = 0
      def put(v: Long, len: Int): Unit = {
        acc |= (v & ((1L << len) - 1)) << n; n += len
        while (n >= 8) { out += (acc & 0xFF).toInt; acc >>>= 8; n -= 8 }
      }
      def code(c: Int, len: Int): Unit =
        (len - 1 to 0 by -1).foreach(k => put((c >> k) & 1, 1))
      def flush(): Unit = if (n > 0) { out += (acc & 0xFF).toInt; n = 0 }
    }
    def riff(payload: Seq[Int]): Array[Byte] = {
      def le32(v: Int) = Seq(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF,
        (v >> 24) & 0xFF)
      val p = payload ++ (if (payload.size % 2 == 1) Seq(0) else Seq())
      (Seq('R', 'I', 'F', 'F').map(_.toInt) ++ le32(4 + 8 + p.size) ++
        Seq('W', 'E', 'B', 'P', 'V', 'P', '8', 'L').map(_.toInt) ++
        le32(payload.size) ++ p).map(_.toByte).toArray
    }
    // "ladder" code over symbols 0..15: lengths 1,2,...,14,15,15 — a
    // complete code whose deep symbols are runs of 1-bits (symbol k<14
    // is 1^k then 0; symbol 14 is 1^14 0; symbol 15 is 1^15). Emitted
    // through the real code-length coding: cl symbol 1 at length 3,
    // cl symbols 2..15 at length 4 (Kraft 1/8 + 14/16 = 1), with the
    // max-symbol shortcut capping the read at 16 symbols.
    def ladder(bw: BW): Unit = {
      bw.put(0, 1) // normal form
      bw.put(19 - 4, 4) // all 19 cl slots, storage order 17,18,0,1,...
      val lens = (1 -> 3) +: (2 to 15).map(_ -> 4)
      val m = lens.toMap
      Seq(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
        .foreach(s => bw.put(m.getOrElse(s, 0).toLong, 3))
      bw.put(1, 1); bw.put(1, 3); bw.put(14, 4) // max-symbol = 2 + 14 = 16
      // canonical cl codes: symbol 1 -> 000; symbols 2..15 -> their own
      // value as a 4-bit code (codes start at 2)
      def cl(v: Int): Unit = if (v == 1) bw.code(0, 3) else bw.code(v, 4)
      (0 to 15).foreach(sym => cl(if (sym <= 13) sym + 1 else 15))
    }
    val bw = new BW
    bw.put(0x2F, 8)
    bw.put(2 - 1, 14); bw.put(1 - 1, 14) // 2x1
    bw.put(0, 1); bw.put(0, 3) // alpha hint, version
    bw.put(0, 1) // no transforms
    bw.put(0, 1) // no color cache
    bw.put(0, 1) // no meta-Huffman
    ladder(bw) // G (alphabet 280; all ladder symbols < 256 = literals)
    ladder(bw) // R
    ladder(bw) // B
    ladder(bw) // A
    bw.put(1, 1); bw.put(0, 1); bw.put(0, 1); bw.put(0, 1) // dist: single sym 0
    // pixel 0: G=sym14 (1^14 0), R=sym15 (1^15), B=sym2 (110, offset now
    // 33), A=sym15 (1^15 — bits 33..47, past the 45-bit peek)
    bw.code((1 << 15) - 2, 15)
    bw.code((1 << 15) - 1, 15)
    bw.code(6, 3)
    bw.code((1 << 15) - 1, 15)
    // pixel 1: all sym0 (code 0, 1 bit each)
    bw.code(0, 1); bw.code(0, 1); bw.code(0, 1); bw.code(0, 1)
    bw.flush()
    val (f, w, h, c, px) = decodeRaster(riff(bw.out.toSeq))
    assert((f, w, h, c) == (("webp", 2, 1, 3)))
    assert(px == Seq[Byte](15, 14, 2, 0, 0, 0))
  }

  test("ImageResizeNN + RasterChannelSums: hand-computed NN kernel and exact sums") {
    // 4x2 single-channel ramp: NN to 2x2 keeps sx in {0,2}, sy in {0,1}
    val pgm = "P5\n4 2\n255\n".getBytes("US-ASCII") ++
      Array.tabulate(8)(_.toByte)
    val resized = Seq(Tuple1(pgm)).toDF("p")
      .select(ScaleOps.imageResizeNN(
        ScaleOps.imageDecode(col("p")), 2, 2).as("r"))
      .select(col("r.width"), col("r.height"), col("r.pixels")).head()
    assert(resized.getInt(0) == 2 && resized.getInt(1) == 2)
    assert(resized.getAs[Array[Byte]](2).toSeq == Seq[Byte](0, 2, 4, 6))
    // RGB channel sums on the golden 2x2 image
    val data = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ data
    val sums = Seq(Tuple1(ppm)).toDF("p")
      .select(ScaleOps.rasterChannelSums(
        ScaleOps.imageDecode(col("p"))).as("s"))
      .as[Seq[Long]].head()
    assert(sums == Seq(220L, 260L, 300L))
    // unknown raster: resize passes through, sums are NULL
    val unk = Seq(Tuple1("nope".getBytes)).toDF("p")
      .select(ScaleOps.imageResizeNN(
          ScaleOps.imageDecode(col("p")), 2, 2).as("r"),
        ScaleOps.rasterChannelSums(ScaleOps.imageDecode(col("p"))).as("s"))
      .select(col("r.format"), col("s")).head()
    assert(unk.getString(0) == "unknown" && unk.isNullAt(1))
  }

  test("synthPpm and synthBmp encode the SAME logical image; decode inverts both") {
    // the image_pixels fixture contract: one (w, h, seed) triple, two
    // container encodings, identical decoded pixel arrays
    val df = Seq((5L, 4L, 3L), (8L, 3L, 17L), (4L, 6L, 42L)).toDF("w", "h", "seed")
    val both = df.select(
        ScaleOps.imageDecode(ScaleOps.synthPpm(col("w"), col("h"), col("seed"))).as("p"),
        ScaleOps.imageDecode(ScaleOps.synthBmp(col("w"), col("h"), col("seed"))).as("b"),
        col("w"), col("h"), col("seed"))
      .collect()
    both.foreach { r =>
      val p = r.getStruct(0)
      val b = r.getStruct(1)
      assert(p.getString(0) == "ppm" && b.getString(0) == "bmp")
      assert(p.getInt(1) == r.getLong(2).toInt && p.getInt(2) == r.getLong(3).toInt)
      assert(b.getInt(1) == p.getInt(1) && b.getInt(2) == p.getInt(2))
      val pp = p.getAs[Array[Byte]](4).toSeq
      val bp = b.getAs[Array[Byte]](4).toSeq
      assert(pp == bp, "PPM and BMP must decode to identical pixels")
      // and the pixels match the generative formula
      val (w, seed) = (r.getLong(2), r.getLong(4))
      val want = pp.indices.map(i => ((seed * 31 + i * 7) % 256).toByte)
      assert(pp == want)
      assert(w * r.getLong(3) * 3 == pp.length)
    }
  }

  test("decodeBatches: REAL raster path — decoded per-channel means as features") {
    import graft.operators.ScaleOps.MediaIn
    // 2x2 RGB PPM: channel means over the 4x4 NN-resize are exact
    // because NN only replicates source samples
    val data = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ data
    val out = graft.operators.ScaleOps.decodeBatches(
      Seq(MediaIn(9L, ppm)).toDS()).collect().head
    assert(out.n_frames == 2, "n_frames = decoded scan lines")
    // 4x4 NN-resize of a 2x2 image replicates each pixel 4 times, so the
    // mean equals the plain per-channel mean: R (10+40+70+100)/4 = 55
    assert(math.abs(out.features(0) - 55.0 / 255.0) < 1e-12)
    assert(math.abs(out.features(1) - 65.0 / 255.0) < 1e-12)
    assert(math.abs(out.features(2) - 75.0 / 255.0) < 1e-12)
    assert(out.features(3) == 0.0, "pad beyond channel count")
  }

  test("decodeBatches: non-raster payloads keep the documented byte-sampling fallback") {
    import graft.operators.ScaleOps.{MediaIn, MediaOut}
    val ds = Seq(
      MediaIn(1L, Array.tabulate(64)(_.toByte)),   // 4 frames of 16B, stride 2 -> 2 sampled
      MediaIn(2L, Array[Byte](127, 1, 2))          // single partial frame
    ).toDS()
    val out = graft.operators.ScaleOps.decodeBatches(ds).collect().sortBy(_.doc_id)
    assert(out(0).doc_id == 1L && out(0).n_bytes == 64L && out(0).n_frames == 2)
    assert(out(0).features.toSeq == Seq(0.0, 32 / 255.0, 0.0, 0.0))
    assert(out(1).n_frames == 1 && out(1).features(0) == 127 / 255.0)
  }

  test("resizeBatches: fixed output shape, NN downsample, zero-pad upsample") {
    import graft.operators.ScaleOps.MediaIn
    val big = Array.tabulate(64)(_.toByte)     // 64 -> 32: every 2nd byte
    val small = Array[Byte](1, 2, 3)           // 3 -> 32: pad with zeros
    val out = ScaleOps.resizeBatches(Seq(
      MediaIn(1L, big), MediaIn(2L, small)).toDS(), targetBytes = 32)
      .collect().sortBy(_.doc_id)
    assert(out.forall(_.frame.length == 32), "uniform tensor shape is the contract")
    assert(out(0).frame.toSeq == (0 until 64 by 2).map(_.toByte))
    assert(out(1).frame.take(3).toSeq == Seq[Byte](1, 2, 3))
    assert(out(1).frame.drop(3).forall(_ == 0) && out(1).n_bytes == 3L)
  }

  test("minhash signature agreement estimates jaccard similarity") {
    // pairs of docs with known overlap: agreement fraction across K
    // components must track true shingle-set jaccard
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, base),
      (2L, base),                                             // j = 1.0
      (3L, base.replace("mu", "nu")),                         // high overlap
      (4L, "one two three four five six seven eight nine ten eleven twelve")) // j = 0
      .toDF("doc_id", "text")
    val k = 64
    val sig = graft.operators.ScaleOps.minhashSignatureTable(docs, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> (1 to k).map(i => r.getAs[Long](s"sig_$i"))).toMap
    def agree(a: Long, b: Long) =
      sig(a).zip(sig(b)).count { case (x, y) => x == y }.toDouble / k
    assert(agree(1L, 2L) == 1.0)
    assert(agree(1L, 3L) > 0.5)   // true jaccard = 8/12 (3 of 10 shingles change)
    assert(agree(1L, 3L) < 1.0)
    assert(agree(1L, 4L) < 0.1)
  }

  test("approx corpus stats track exact within sketch tolerance") {
    val exact = Queries.all("corpus_stats").fn(spark, sf0001)
      .select("lang", "n_docs", "vocab_size").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Queries.all("corpus_stats_approx").fn(spark, sf0001)
      .select("lang", "n_docs_approx", "vocab_approx").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (lang, (docs, vocab)) =>
      val (dA, vA) = approx(lang)
      assert(math.abs(dA - docs).toDouble / docs < 0.1, s"$lang docs $dA vs $docs")
      assert(math.abs(vA - vocab).toDouble / vocab < 0.1, s"$lang vocab $vA vs $vocab")
    }
    // percentiles: must be per-document (not token-weighted) — compare to
    // the exact per-doc median computed in plain Scala
    val p50 = Queries.all("corpus_stats_approx").fn(spark, sf0001)
      .select("lang", "p50_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = Tables.documents(spark, sf0001)
      .select("lang", "n_chars").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    byLang.foreach { case (lang, sorted) =>
      val exactMedian = sorted(sorted.length / 2).toDouble
      assert(math.abs(p50(lang) - exactMedian) / exactMedian < 0.1,
        s"$lang p50 ${p50(lang)} vs ~$exactMedian")
    }
  }

  test("native dot product matches HOF on malformed vectors (null, not partial sums)") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),        // ok
      (2L, Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 4.0f)))  // truncated right side
      .toDF("id", "a", "b")
    val r = df.withColumn("dn", ScaleOps.dotD(col("a"), col("b")))
      .withColumn("dh", ScaleOps.dotHof(col("a"), col("b")))
      .select("id", "dn", "dh").orderBy("id").collect()
    assert(r(0).getDouble(1) == 11.0 && r(0).getDouble(2) == 11.0)
    assert(r(1).isNullAt(1) && r(1).isNullAt(2), "length mismatch must be NULL on both paths")
  }

  test("dataset split is ~8/1/1, content-stable, and covers every doc") {
    val split = Queries.all("dataset_split").fn(spark, sf0001)
      .select("split").as[String].collect()
    val n = split.length.toDouble
    assert(n == 500)
    val frac = split.groupBy(identity).view.mapValues(_.length / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08, s"train ${frac("train")}")
    assert(frac.getOrElse("validation", 0.0) > 0.03 && frac.getOrElse("test", 0.0) > 0.03)
    // stable across runs
    val again = Queries.all("dataset_split").fn(spark, sf0001)
      .select("split").as[String].collect()
    assert(split.toSeq == again.toSeq)
  }

  test("stratified sample is deterministic and roughly honors fractions") {
    val s1 = Queries.all("stratified_sample").fn(spark, sf0001)
      .select("doc_id").as[Long].collect().toSeq
    val s2 = Queries.all("stratified_sample").fn(spark, sf0001)
      .select("doc_id").as[Long].collect().toSeq
    assert(s1 == s2, "sampleBy with fixed seed must be deterministic")
    val byLang = Queries.all("stratified_sample").fn(spark, sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, sf0001).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang("en").toDouble / totals("en")
    assert(enRate > 0.3 && enRate < 0.7, s"en rate $enRate vs target 0.5")
  }

  test("bucket cap: degenerate corpus (one token in every doc) expands no quadratic bucket") {
    // 200 docs all share token "x": uncapped, its bucket alone would expand
    // to 19,900 pairs. With the cap the bucket is skipped entirely and the
    // skew stats surface it for monitoring.
    val docs = (1 to 200).map(i => (i.toLong, s"x u$i")).toDF("doc_id", "text")
    val tok = docs.select(col("doc_id"), explode(ScaleOps.tokens(col("text"))).as("token"))
    val buckets = tok.groupBy("token").agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    assert(ScaleOps.cappedBuckets(buckets, "ids").count() == 0,
      "unique tokens are singletons; the shared token must be cap-skipped")
    val stats = ScaleOps.bucketSkewStats(buckets, "ids").head
    assert(stats.getAs[Long]("n_skipped") == 1L)
    assert(stats.getAs[Int]("max_bucket") == 200)
  }

  test("embedding_neardup LSH path: precision 1.0, recall >= 0.85 vs brute force") {
    val got = Queries.all("embedding_neardup").fn(spark, sf0001)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val e = Tables.embeddings(spark, sf0001)
      .withColumn("nv", ScaleOps.l2norm(col("embedding")))
    val a = e.select(col("vec_id").as("id1"), col("label"),
      col("embedding").as("e1"), col("nv").as("n1"))
    val b = e.select(col("vec_id").as("id2"), col("label"),
      col("embedding").as("e2"), col("nv").as("n2"))
    val truth = a.join(b, Seq("label")).filter(col("id1") < col("id2"))
      .withColumn("cos", ScaleOps.cosine(col("e1"), col("e2"), col("n1"), col("n2")))
      .filter(col("cos") > 0.25)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(truth), "exact-cosine verify: no false positives possible")
    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.85, s"recall $recall (measured 0.907 on this testdata)")
  }

  test("semantic_dedup: precision 1.0 vs brute force, recall floor, deterministic") {
    val q = Queries.all("semantic_dedup")
    val s1 = q.fn(spark, sf0001).select("vec_id").as[Long].collect().toSet
    val s2 = q.fn(spark, sf0001).select("vec_id").as[Long].collect().toSet
    assert(s1 == s2 && s1.nonEmpty, "semantic dedup must be deterministic")
    // brute-force ground truth: keep-min removal over ALL pairs with
    // cosine >= the operator's threshold (no label hint — semantic dedup
    // sees only geometry)
    val e = Tables.embeddings(spark, sf0001)
      .withColumn("nv", ScaleOps.l2norm(col("embedding")))
    val a = e.select(col("vec_id").as("id1"), col("embedding").as("e1"), col("nv").as("n1"))
    val b = e.select(col("vec_id").as("id2"), col("embedding").as("e2"), col("nv").as("n2"))
    val truthRemoved = a.join(b, col("id1") < col("id2"))
      .filter(ScaleOps.cosine(col("e1"), col("e2"), col("n1"), col("n2")) >= 0.25)
      .select(col("id2")).distinct().as[Long].collect().toSet
    val allIds = e.select("vec_id").as[Long].collect().toSet
    val gotRemoved = allIds -- s1
    assert(gotRemoved.subsetOf(truthRemoved),
      "every removal must be justified by an exact brute-force pair")
    val recall = gotRemoved.size.toDouble / truthRemoved.size
    assert(recall >= 0.9,
      s"cluster capture recall $recall vs brute-force dedup (measured 0.958 at K=8, nAssign=2)")
  }

  test("stratified_sample_hash: deterministic, content-stable, honors per-lang rates") {
    val q = Queries.all("stratified_sample_hash")
    val s1 = q.fn(spark, sf0001).select("doc_id").as[Long].collect().toSeq
    val s2 = q.fn(spark, sf0001).select("doc_id").as[Long].collect().toSeq
    assert(s1 == s2 && s1.nonEmpty)
    val byLang = q.fn(spark, sf0001).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, sf0001).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang("en").toDouble / totals("en")
    assert(enRate > 0.3 && enRate < 0.7, s"en rate $enRate vs target 0.5")
    // content-stable: membership survives corpus growth (subset property)
    val half = Tables.documents(spark, sf0001).filter(col("doc_id") % 2 === 0)
    // same hash predicate applied to the half corpus must select exactly
    // the even members of the full sample
    val fullSample = s1.toSet
    val halfExpected = fullSample.filter(_ % 2 == 0)
    val permille = when(col("lang") === "en", lit(500L))
      .when(col("lang") === "zh", lit(100L)).otherwise(lit(200L))
    val bucket = pmod(conv(substring(md5(concat(col("lang"), lit("|"),
      col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long"), lit(1000L))
    val halfSample = half.withColumn("b", bucket).filter(col("b") < permille)
      .select("doc_id").as[Long].collect().toSet
    assert(halfSample == halfExpected)
  }

  test("minhash_dedup_prod (xxhash64): finds every exact duplicate; candidates track the md5 form") {
    val md5Pairs = Queries.all("minhash_dedup").fn(spark, sf0001)
      .select("id1", "id2", "n_shared_bands")
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val xxPairs = Queries.all("minhash_dedup_prod").fn(spark, sf0001)
      .select("id1", "id2", "n_shared_bands")
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    // every doc with >= 3 tokens has a shifted exact copy at id+100000:
    // identical shingles -> identical signature (in BOTH hash families) ->
    // all 4 bands agree, so the pair must surface unless its bucket was
    // cap-skipped — and at sf0.001 none are
    val docs = Tables.documents(spark, sf0001)
      .filter(size(ScaleOps.tokens(col("text"))) >= 3)
      .select("doc_id").as[Long].collect()
    docs.foreach { id =>
      assert(xxPairs.get((id, id + 100000L)).contains(4L), s"xx lost exact dup $id")
      assert(md5Pairs.get((id, id + 100000L)).contains(4L), s"md5 lost exact dup $id")
    }
    // beyond exact dups the two hash families bucket near-identically on
    // this corpus (near-dup signal dominates hash noise)
    val overlap = xxPairs.keySet.intersect(md5Pairs.keySet).size.toDouble
    assert(overlap / md5Pairs.size >= 0.7, s"xx recall of md5 pairs ${overlap / md5Pairs.size}")
    assert(overlap / xxPairs.size >= 0.7, s"md5 recall of xx pairs ${overlap / xxPairs.size}")
  }

  test("dedup_pipeline: every shifted copy is removed, shingle-less docs survive untouched") {
    val surv = Queries.all("dedup_pipeline").fn(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    val byLen = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(ScaleOps.tokens(col("text"))).as("n"))
      .as[(Long, Int)].collect()
    val (eligible, shingleless) = byLen.partition(_._2 >= 3)
    // an exact copy shares the full signature -> all 4 bands -> jaccard 1:
    // the +100000 copy of every shingle-able doc must be removed
    eligible.foreach { case (id, _) =>
      assert(!surv.contains(id + 100000L), s"copy of $id survived") }
    // docs too short to shingle produce no candidates; both copies survive
    shingleless.foreach { case (id, _) =>
      assert(surv.contains(id) && surv.contains(id + 100000L), s"short doc $id dropped") }
    // keep-min: an original is removed only for a smaller near-dup original
    assert(surv.count(_ < 100000L) >= 450 && surv.count(_ < 100000L) <= 500)
  }

  test("dedup_pipeline_prod (xxhash64): survivor set equals the md5 pipeline's") {
    // verification is hash-free exact jaccard over candidate pairs, so
    // the survivor sets can only differ where the two hash families'
    // candidate recall differs; on the fixture corpus (exact +100000
    // copies, which share ALL bands in either family) they must agree
    // exactly — pinning that the prod twin is the same operator, not a
    // lookalike
    val md5Surv = Queries.all("dedup_pipeline").fn(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    val xxSurv = Queries.all("dedup_pipeline_prod").fn(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    assert(md5Surv == xxSurv,
      s"survivor sets differ: md5-only=${(md5Surv -- xxSurv).take(5)} " +
        s"xx-only=${(xxSurv -- md5Surv).take(5)}")
    // and the pipeline actually removed something (not vacuously equal)
    assert(md5Surv.size < Queries.all("dedup_exact").fn(spark, sf0001).count() * 2)
  }

  test("connectedComponents: chains, stars, multiple components, empty input") {
    // chain 1-2-3-4-5 (diameter 4 forces >1 contraction round),
    // pair 10-11, triangle-ish 20-21, 21-22, and duplicate/reversed edges
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (11L, 10L), (20L, 21L), (21L, 22L), (20L, 21L)).toDF("src", "dst")
    val got = ScaleOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      11L -> 10L, 21L -> 20L, 22L -> 20L))
    // representatives and isolated nodes are absent (they map to self)
    assert(!got.contains(1L) && !got.contains(10L) && !got.contains(20L))
    val empty = ScaleOps.connectedComponents(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(empty.isEmpty)
    assert(empty.columns.toSeq == Seq("node", "rep"))
  }

  test("connectedComponents: parquet-checkpoint path (the cluster-durable form) matches localCheckpoint") {
    // Same graph through checkpointDir — each round must round-trip its
    // edge frame through parquet and still converge to identical clusters.
    // Each call namespaces under its own cc_run_* dir (a shared dir is
    // safe for repeated/concurrent calls) keeping ONLY its final round —
    // which must stay readable, since it backs the returned frame.
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (20L, 21L), (21L, 22L)).toDF("src", "dst")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cc_ckpt_").toFile
    try {
      val durableDf = ScaleOps.connectedComponents(edges,
        checkpointDir = Some(ckpt.getPath))
      val durable = durableDf.as[(Long, Long)].collect().toMap
      val local = ScaleOps.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap
      assert(durable == local)
      assert(durable == Map(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
        11L -> 10L, 21L -> 20L, 22L -> 20L))
      def roundDirs() = ckpt.listFiles().filter(_.getName.startsWith("cc_run_"))
        .flatMap(_.listFiles()).map(_.getName).filter(_.startsWith("cc_round_"))
      assert(roundDirs().length == 1,
        s"expected only the last round kept, got ${roundDirs().toSeq}")
      // a second call into the SAME dir gets its own run namespace: it
      // neither clobbers the first run's final round (still backing
      // durableDf) nor inherits its state
      // a second run via the handle-returning form: its namespace comes
      // back as a value, and releaseCcRun closes the caller-owns-cleanup
      // obligation without touching the first run's live backing
      val (rerunDf, rerunDir) = ScaleOps.connectedComponentsDurable(
        Seq((10L, 11L)).toDF("src", "dst"),
        checkpointDir = ckpt.getPath)
      assert(rerunDf.as[(Long, Long)].collect().toMap == Map(11L -> 10L))
      assert(roundDirs().length == 2, s"per-run namespaces: ${roundDirs().toSeq}")
      ScaleOps.releaseCcRun(spark, rerunDir)
      assert(!new java.io.File(rerunDir).exists(), "released run dir remains")
      assert(roundDirs().length == 1, "release removed the wrong namespace")
      // the first result is STILL readable after the second run + release
      assert(durableDf.as[(Long, Long)].collect().toMap == durable)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(ckpt)
    }
  }

  test("dedup_cc vs keep-min: star graph is the separating case") {
    // edges (1,3),(2,3): keep-min removes only 3 (1 and 2 have no smaller
    // neighbor), CC puts all three in one component with rep 1 — the
    // documented semantic difference between the two dedup rules
    val reps = ScaleOps.connectedComponents(
      Seq((1L, 3L), (2L, 3L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(reps == Map(2L -> 1L, 3L -> 1L))
    // keep-min on the same pairs: removed = {id2 per pair} = {3}
    val keepMinRemoved = Seq((1L, 3L), (2L, 3L)).toDF("id1", "id2")
      .select(col("id2")).distinct().as[Long].collect().toSet
    assert(keepMinRemoved == Set(3L))
    // CC-removed {2, 3} is a strict superset of keep-min-removed {3}
    assert(reps.keySet.map(identity) == Set(2L, 3L))
  }

  test("dedup_cc on the fixture corpus: survivors subset of keep-min, copies clustered to originals") {
    val cc = Queries.all("dedup_cc").fn(spark, sf0001)
      .select("doc_id", "rep_id", "kept").as[(Long, Long, Int)].collect()
    val ccSurv = cc.collect { case (id, _, 1) => id }.toSet
    val keepMinSurv = Queries.all("dedup_pipeline").fn(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    // every keep-min-removed doc has a smaller verified neighbor, hence is
    // not its component minimum — so CC can only remove MORE
    assert(ccSurv.subsetOf(keepMinSurv),
      s"CC kept docs keep-min removed: ${(ccSurv -- keepMinSurv).take(5)}")
    // a shifted copy never represents its cluster: its original (id
    // - 100000) is always a smaller member of the same component
    cc.foreach { case (id, rep, _) =>
      if (id >= 100000L) assert(rep < 100000L || rep == id,
        s"copy $id represented by copy $rep") }
    // kept is exactly the self-representative predicate
    cc.foreach { case (id, rep, kept) =>
      assert((kept == 1) == (rep == id), s"kept/rep mismatch for $id") }
  }

  test("dedup_cc_prod (xxhash64): clustering equals the md5 form's") {
    // same argument as dedup_pipeline_prod: verification is hash-free
    // exact jaccard, so the (doc_id, rep_id, kept) clustering can only
    // differ where candidate recall differs — and exact +100000 copies
    // share all bands in either family
    val md5 = Queries.all("dedup_cc").fn(spark, sf0001)
      .as[(Long, Long, Int)].collect().toSet
    val xx = Queries.all("dedup_cc_prod").fn(spark, sf0001)
      .as[(Long, Long, Int)].collect().toSet
    assert(md5 == xx,
      s"clusterings differ: md5-only=${(md5 -- xx).take(5)} xx-only=${(xx -- md5).take(5)}")
    assert(md5.exists(_._3 == 0), "clustering removed nothing (vacuous)")
  }

  test("bucket skew stats surface cap behavior on the live minhash/simhash bucket frames") {
    val mh = QueriesScale.minhashBucketStats(spark, sf0001).head
    assert(mh.getAs[Long]("n_buckets") > 0)
    // the duped corpus guarantees 2+-member buckets exist
    assert(mh.getAs[Int]("max_bucket") >= 2)
    assert(mh.getAs[Long]("n_skipped") >= 0)
    val sh = QueriesScale.simhashBucketStats(spark, sf0001).head
    assert(sh.getAs[Long]("n_buckets") > 0)
    assert(sh.getAs[Int]("max_bucket") >= 2)
    // the production (xxhash64) banding is observable too — its bucket
    // population differs from md5's, so it needs its own stats
    val xx = QueriesScale.minhashBucketStats(spark, sf0001, prod = true).head
    assert(xx.getAs[Long]("n_buckets") > 0)
    assert(xx.getAs[Int]("max_bucket") >= 2)
  }

  test("lshBucketsFused is bit-identical to the composed per-table buckets") {
    // real embeddings, the embedding_neardup setting (16 tables × 4 bits)
    val emb = Tables.embeddings(spark, sf0001)
    val composed = emb.select(Seq(col("vec_id")) ++
        ScaleOps.lshBuckets(col("embedding"), dim = 64, tables = 16): _*)
      .collect()
      .map(r => r.getLong(0) -> (0 until 16).map(t => r.getAs[Int](s"bucket_$t"))).toMap
    val fused = emb.select(col("vec_id"),
        ScaleOps.lshBucketsFused(col("embedding"), dim = 64, tables = 16).as("b"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toIndexedSeq).toMap
    assert(fused == composed)
    // and the fused expression actually reaches the generated plan
    val plan = emb.select(ScaleOps.lshBucketsFused(col("embedding"), dim = 64))
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("lshbuckets"))
  }

  test("lshBucketsFused degenerate inputs yield all-zero buckets like the composed form") {
    // composed: dot is NULL on length mismatch / null element -> when(dot>0)
    // is false -> bucket 0; fused must agree (and never return NULL)
    val df = Seq(
      (1L, Some(Seq.fill(64)(0.5f))),       // ok
      (2L, Some(Seq(1.0f, 2.0f))),          // wrong length
      (3L, None: Option[Seq[Float]]))       // null embedding
      .toDF("id", "embedding")
    val got = df.select(col("id"),
        ScaleOps.lshBucketsFused(col("embedding"), dim = 64, tables = 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(2L) == Seq(0, 0, 0, 0))
    assert(got(3L) == Seq(0, 0, 0, 0))
    val composedOk = df.filter(col("id") === 1L)
      .select(ScaleOps.lshBuckets(col("embedding"), dim = 64, tables = 4): _*)
      .head
    assert(got(1L) == (0 until 4).map(t => composedOk.getAs[Int](s"bucket_$t")))
  }

  test("pii_scrub: every injected contact line is found and redacted") {
    val out = Queries.all("pii_scrub").fn(spark, sf0001)
    // every doc got exactly one synthetic email + one phone injected
    assert(out.filter(col("n_emails") =!= 1L || col("n_phones") =!= 1L).count() == 0)
    // redaction semantics on a crafted string, same patterns as the query
    val clean = Seq("reach a.b-c@x.co or 123-456-7890 ok").toDF("t")
      .select(regexp_replace(regexp_replace(col("t"), QueriesScale.piiEmailRe, "<EMAIL>"),
        QueriesScale.piiPhoneRe, "<PHONE>").as("c"))
      .head.getString(0)
    assert(clean == "reach <EMAIL> or <PHONE> ok")
  }

  test("quality_filter: repetitive text fails the bigram rule, normal prose passes") {
    val out = Queries.all("quality_filter").fn(spark, sf0001)
    // the synthetic corpus is sampled natural-ish vocab: most docs pass
    val n = out.count()
    val pass = out.filter(col("passes")).count()
    assert(n == 500 && pass > n / 2, s"pass rate $pass/$n")
    // metric sanity on the whole frame
    assert(out.filter(col("distinct_bigram_ratio") > 1.0 ||
      col("distinct_bigram_ratio") < 0.0).count() == 0)
    // direct rule check: a looped doc has distinct_bigram_ratio ~ 0
    val rep = ("spam ham " * 50).trim
    val crafted = Seq((1L, rep), (2L, "the quick brown fox is one of many animals in the field"))
      .toDF("doc_id", "text")
      .withColumn("_bi", ScaleOps.shingles(ScaleOps.tokens(col("text")), k = 2))
      .withColumn("r", size(array_distinct(col("_bi"))).cast("double") / size(col("_bi")).cast("double"))
      .select("doc_id", "r").as[(Long, Double)].collect().toMap
    assert(rep.nonEmpty && crafted(1L) < 0.3 && crafted(2L) >= 0.9)
  }

  test("text_normalize: URLs stripped, case folded, whitespace collapsed") {
    val out = Queries.all("text_normalize").fn(spark, sf0001)
    // exactly one URL injected per doc; all found
    assert(out.filter(col("n_urls") =!= 1L).count() == 0)
    // direct semantics on a crafted string using the same expression shape
    val got = Seq("HELLO  world  see https://x.co/a?b=c  tail")
      .toDF("t")
      .select(trim(regexp_replace(
        lower(regexp_replace(col("t"), """https?://[^ ]+""", " ")), "  +", " ")).as("n"))
      .head.getString(0)
    assert(got == "hello world see tail")
  }

  test("hamming column function matches bitCount") {
    val df = Seq((0xF0L, 0x0FL)).toDF("a", "b")
      .withColumn("h", ScaleOps.hamming(col("a"), col("b")))
    assert(df.select("h").head.getInt(0) == 8)
  }

  test("bm25Search: ranking semantics on a crafted corpus") {
    val docs = Seq(
      (1L, "hash join hash join hash"), // both terms, high tf, short
      (2L, "hash join over a long table with many other filler words here"),
      (3L, "hash only appears once in this document"),
      (4L, "nothing relevant at all in here"))
      .toDF("doc_id", "text")
    val qs = Seq((0L, Seq("hash", "join")), (1L, Seq("zzz_absent")))
      .toDF("query_id", "terms")
    val out = ScaleOps.bm25Search(docs, qs, "doc_id")
      .orderBy("query_id", "rank")
      .collect()
    // absent-term query produces no rows at all
    assert(out.forall(_.getLong(0) == 0L))
    val ranked = out.map(r => (r.getLong(2), r.getLong(1), r.getLong(4)))
    // doc 4 matches nothing; docs 1-3 all surface
    assert(ranked.map(_._1).toSet == Set(1L, 2L, 3L))
    val byDoc = ranked.map(t => t._1 -> t).toMap
    // doc 1 (both terms, max tf, shortest) must outrank the others;
    // doc 2 (both terms, diluted) outranks doc 3 (one term)
    assert(byDoc(1L)._2 == 1L && byDoc(2L)._2 == 2L && byDoc(3L)._2 == 3L)
    // n_matched counts distinct matched terms
    assert(byDoc(1L)._3 == 2L && byDoc(3L)._3 == 1L)
    // scores are positive and strictly decreasing down the ranking
    val scores = out.map(_.getDouble(3))
    assert(scores.forall(_ > 0) &&
      scores.sliding(2).forall(p => p.length < 2 || p(0) > p(1)))
  }

  test("ArtifactMemo.parquetDurable: cold memo re-opens complete artifacts, rebuilds partial ones") {
    var builds = 0
    val key = s"durable_test_${System.nanoTime()}"
    def build() = ArtifactMemo.parquetDurable(spark, key, "durable_test",
      Seq("part")) {
      builds += 1
      Seq((1L, 0), (2L, 1), (3L, 0)).toDF("v", "part")
    }
    val p1 = build()
    assert(builds == 1)
    assert(new java.io.File(new java.net.URI(p1).getPath, "_SUCCESS").exists()
      || new java.io.File(p1, "_SUCCESS").exists())
    // same JVM, memo warm: no FS work, same path
    assert(build() == p1 && builds == 1)
    // cold-memo (fresh-process) state over a COMPLETE directory: re-open
    ArtifactMemo.forgetForTest(key)
    val p2 = build()
    assert(p2 == p1 && builds == 1, "complete artifact must be re-opened, not rebuilt")
    assert(spark.read.parquet(p2).count() == 3)
    // partition layout materialized for pruning
    val dir = new java.io.File(if (p1.startsWith("file:"))
      new java.net.URI(p1).getPath else p1)
    assert(dir.listFiles().exists(_.getName.startsWith("part=")))
    // cold memo over a PARTIAL directory (no _SUCCESS): rebuild
    assert(new java.io.File(dir, "_SUCCESS").delete())
    ArtifactMemo.forgetForTest(key)
    val p3 = build()
    assert(p3 == p1 && builds == 2, "partial artifact must be rebuilt")
    assert(spark.read.parquet(p3).count() == 3)
    // cleanup
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(dir)
  }

  test("bm25 index: a cold process RE-OPENS a complete on-disk index instead of rebuilding") {
    // Simulate the fresh-JVM-over-surviving-warehouse state: build, copy
    // the committed directories aside, DROP the managed tables (which
    // deletes their locations), restore the copies — on-disk index
    // present, catalog empty, exactly what a second process sees.
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"),
      (3L, "delta alone here")).toDF("doc_id", "text")
    val pt = "bm25_postings_testreopen"
    val st = "bm25_stats_testreopen"
    val wh = new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)
    def whDir(t: String) = new java.io.File(wh, t.toLowerCase)
    def copyTree(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) { dst.mkdirs(); src.listFiles().foreach(f =>
        copyTree(f, new java.io.File(dst, f.getName))) }
      else java.nio.file.Files.copy(src.toPath, dst.toPath): Unit
    }
    val stash = java.nio.file.Files.createTempDirectory("graft_bm25_stash_").toFile
    try {
      ScaleOps.buildBm25Index(docs, "doc_id", pt, st)
      val served1 = ScaleOps.bm25ServeFromIndex(spark, pt, st,
        Seq((0L, Seq("alpha", "beta"))), "doc_id").collect().toSeq
      assert(served1.nonEmpty)
      copyTree(whDir(pt), new java.io.File(stash, pt))
      copyTree(whDir(st), new java.io.File(stash, st))
      spark.sql(s"DROP TABLE `$pt`"); spark.sql(s"DROP TABLE `$st`")
      assert(!whDir(pt).exists(), "managed drop should delete the location")
      copyTree(new java.io.File(stash, pt), whDir(pt))
      copyTree(new java.io.File(stash, st), whDir(st))
      // a rebuild from THIS corpus would produce different postings —
      // serving the original rows proves the build re-opened, not re-ran
      val poison = Seq((9L, "zzz")).toDF("doc_id", "text")
      ScaleOps.buildBm25Index(poison, "doc_id", pt, st)
      val served2 = ScaleOps.bm25ServeFromIndex(spark, pt, st,
        Seq((0L, Seq("alpha", "beta"))), "doc_id").collect().toSeq
      assert(served2 == served1, "cold re-open must serve the ORIGINAL index")
      // and the re-opened registration still bucket-prunes
      val plan = ScaleOps.bm25ServeFromIndex(spark, pt, st,
          Seq((0L, Seq("alpha"))), "doc_id")
        .queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.initialPlan
          case p => p
        }
      val scan = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.metadata.get("Location").exists(_.contains(pt)) => s
      }
      assert(scan.nonEmpty)
      val sel = scan.head.metadata.get("SelectedBucketsCount")
      assert(sel.isDefined && sel.get.trim.split(" ")(0).toInt < 16,
        s"re-opened index lost bucket pruning: ${scan.head.metadata}")
      // incomplete directory (no _SUCCESS) is debris -> rebuilt, not reused
      // (the re-opened tables are EXTERNAL: drop keeps the files, so
      // clear them before restoring fresh copies)
      spark.sql(s"DROP TABLE `$pt`"); spark.sql(s"DROP TABLE `$st`")
      def rmDir(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmDir)); f.delete(): Unit
      }
      rmDir(whDir(pt)); rmDir(whDir(st))
      copyTree(new java.io.File(stash, pt), whDir(pt))
      copyTree(new java.io.File(stash, st), whDir(st))
      assert(new java.io.File(whDir(pt), "_SUCCESS").delete())
      ScaleOps.buildBm25Index(poison, "doc_id", pt, st)
      assert(ScaleOps.bm25ServeFromIndex(spark, pt, st,
        Seq((0L, Seq("alpha"))), "doc_id").collect().isEmpty,
        "partial directory must trigger a rebuild from the new corpus")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS `$pt`")
      spark.sql(s"DROP TABLE IF EXISTS `$st`")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(stash); rm(whDir(pt)); rm(whDir(st))
    }
  }

  test("unigram logprob: hand-computed scores; values independent of headSize routing") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val freq = ScaleOps.unigramFreq(docs)
    assert(freq.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    def score(headSize: Int) =
      ScaleOps.withUnigramLogProb(docs, freq, "doc_id", headSize = headSize)
        .select("doc_id", "n_tokens", "sum_logprob", "avg_logprob")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .sortBy(_._1)
    def q(p: Double) = math.floor(math.log(p) * 1048576.0) / 1048576.0
    val got = score(headSize = 1024) // everything head-resolved
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 3L), (2L, 2L)))
    assert(got(0)._3 == 3 * q(2.0 / 5.0)) // a a b, each ln(2/5)
    assert(got(1)._3 == q(2.0 / 5.0) + q(1.0 / 5.0)) // b c
    assert(got(0)._4 == got(0)._3 / 3.0 && got(1)._4 == got(1)._3 / 2.0)
    // the hot/cold join split is pure routing: all-tail (headSize=0) and
    // a genuine split (headSize=1: "a" broadcast, b/c shuffled) agree bitwise
    assert(score(headSize = 0).sameElements(got))
    assert(score(headSize = 1).sameElements(got))
  }

  test("dsir: likelihood-ratio direction, target exclusion, bounded weights, deterministic") {
    val target = (1L to 5L).map(i => (i, "tgt", "alpha beta alpha beta alpha beta alpha beta"))
    val rawGood = (11L to 13L).map(i => (i, "raw", "alpha beta alpha beta alpha beta alpha beta"))
    val rawBad = (21L to 23L).map(i => (i, "raw", "zeta eta zeta eta zeta eta zeta eta"))
    val docs = (target ++ rawGood ++ rawBad).toDF("doc_id", "source", "text")
    val isTgt = col("source") === "tgt"
    // oracle (md5) form and production (xxhash64) twin satisfy the same
    // semantic contract — only the hash family differs
    val variants = Seq(
      (ScaleOps.dsirWeights(docs, isTgt),
        (w: org.apache.spark.sql.DataFrame) => ScaleOps.dsirSelect(docs, w, isTgt, k = 6)),
      (ScaleOps.dsirWeightsXx(docs, isTgt),
        (w: org.apache.spark.sql.DataFrame) => ScaleOps.dsirSelectXx(docs, w, isTgt, k = 6)))
    for ((w, select) <- variants) {
      // fixed feature space: the weight table can never exceed nBuckets rows
      assert(w.count() <= 4096)
      val rows = select(w).collect()
      assert(select(w).collect().sameElements(rows),
        "hash-Gumbel selection must be deterministic")
      val byId = rows.map(r => r.getLong(0) -> r.getAs[Double]("logw")).toMap
      // target docs are never candidates; at k=6 all six raws surface
      assert(byId.keySet == Set(11L, 12L, 13L, 21L, 22L, 23L))
      val good = Seq(11L, 12L, 13L).map(byId)
      val bad = Seq(21L, 22L, 23L).map(byId)
      // importance weights point the right way: target-like text scores
      // above off-target text, with the smoothed LLR signs matching
      // (shared vocabulary -> positive, target-absent vocabulary -> negative)
      assert(good.min > bad.max, s"LLR direction wrong: good=$good bad=$bad")
      assert(good.forall(_ > 0) && bad.forall(_ < 0), s"good=$good bad=$bad")
    }
  }

  test("dsir feature map: native shingle form == HOF executable spec") {
    // the hot path builds uni+bigram features with the native WordShingles
    // expression; pin equivalence against the interpreted HOF formulation
    // the DuckDB oracle mirrors, including the 1-token edge (empty bigrams)
    val docs = Seq("alpha beta gamma", "solo", "a b", "x y z w").toDF("text")
    val hof = concat(ScaleOps.tokens(col("text")),
      coalesce(ScaleOps.shingles(ScaleOps.tokens(col("text")), 2),
        array().cast("array<string>")))
    val r = docs.select(
      ScaleOps.hashedNgramFeats(col("text")).as("native"), hof.as("spec"))
      .filter(not(col("native") === col("spec"))).count()
    assert(r == 0, "native feature map diverges from HOF spec")
  }

  test("native CharEntropyStats == explode+groupBy spec, incl. unicode and edge shapes") {
    // crafted edges: single repeated char (entropy 0), two equiprobable
    // chars, surrogate-pair emoji (code-point counting), mixed-width
    // unicode, and the real sf0.001 corpus
    val crafted = Seq(
      (1L, "aaaaaaaa"),
      (2L, "abababab"),
      (3L, "aé中😀 mixed"),
      (4L, " leading and trailing "),
      (5L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, sf0001).select("doc_id", "text")
    Seq(crafted, corpus).foreach { docs =>
      val e = org.apache.spark.sql.graftnative.TextExpressions
        .char_entropy(col("text"))
      val native = docs.filter(length(col("text")) > 0)
        .select(col("doc_id"),
          e.getField("n_distinct_chars").as("n_distinct_chars"),
          e.getField("entropy_nats").as("entropy_nats"))
      val spec = QueriesScale.charEntropyExplode(docs)
      assert(native.exceptAll(spec).count() == 0 &&
        spec.exceptAll(native).count() == 0,
        "native entropy diverges from explode spec")
    }
    // known values: uniform over k symbols = quantized ln(k); constant = 0
    val row = crafted.limit(2)
      .select(org.apache.spark.sql.graftnative.TextExpressions
        .char_entropy(col("text")).as("e"))
      .select(col("e.n_distinct_chars"), col("e.entropy_nats"))
      .collect().sortBy(_.getLong(0))
    assert(row(0).getLong(0) == 1L && row(0).getDouble(1) == 0.0)
    val ln2q = 2 * (math.floor(-0.5 * math.log(0.5) * 1048576.0) / 1048576.0)
    assert(row(1).getLong(0) == 2L && math.abs(row(1).getDouble(1) - ln2q) < 1e-12)
  }

  test("dedup_incremental: exact copies all flag against history, reversed docs never do") {
    // the fixture batch is half verbatim copies of history (+100000, even
    // source ids) and half token-reversed docs (+200000, odd ids): an
    // exact copy shares every band with its original and verifies at
    // jaccard 1.0; token reversal changes every ordered 3-shingle, so a
    // reversed doc must not clear the 0.7 threshold against ANY original
    val out = Queries.all("dedup_incremental").fn(spark, sf0001).cache()
    val copies = out.filter(col("doc_id") < 200000)
    val reversed = out.filter(col("doc_id") >= 200000)
    assert(copies.count() > 0 && reversed.count() > 0)
    assert(copies.filter(!col("is_dup")).count() == 0,
      "every exact copy must flag as a duplicate of history")
    assert(reversed.filter(col("is_dup")).count() == 0,
      "no token-reversed doc may flag as a duplicate")
    // a copy always verifies against its own original, so the smallest
    // match is AT MOST that original (strictly smaller when the original
    // itself has a lower-id near-dup in history — both ids verify)
    assert(copies.filter(col("dup_of") > col("doc_id") - 100000).count() == 0,
      "an exact copy's best match can never exceed its own original")
    // production twin (xxhash64 signatures): the flag SET must agree with
    // the md5 oracle family — exact copies share all bands in either hash
    // family and verification is hash-free exact jaccard
    val prod = Queries.all("dedup_incremental_prod").fn(spark, sf0001)
      .select(col("doc_id"), col("is_dup").as("is_dup_prod"))
    assert(out.select("doc_id", "is_dup").join(prod, "doc_id")
      .filter(col("is_dup") =!= col("is_dup_prod")).count() == 0,
      "md5 and xxhash64 incremental flags diverge")
    out.unpersist()
  }

  test("MisraGriesAgg: heavy hitters survive a compressing sketch within the error bound") {
    // crafted skew where the sketch actually compresses (capacity 8 ≪ 100
    // distinct keys): hot keys appear 200/100 times, 100 tail keys once
    // each, N = 400 → guaranteed survival above N/9 ≈ 44, undercount ≤ 44
    val rows = Seq.fill(200)("hot1") ++ Seq.fill(100)("hot2") ++
      (1 to 100).map(i => s"tail$i")
    val df = rows.toDF("k")
    val mg = org.apache.spark.sql.functions.udaf(
      new graft.functions.MisraGriesAgg(8), org.apache.spark.sql.Encoders.STRING)
    val sketch = df.agg(mg(col("k")).as("s")).selectExpr("explode(s) as (k, c)")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch.size <= 8, s"sketch exceeded capacity: ${sketch.size}")
    assert(sketch.contains("hot1") && sketch.contains("hot2"),
      s"heavy hitters lost: $sketch")
    assert(sketch("hot1") <= 200 && sketch("hot1") >= 200 - 45,
      s"hot1 bound violated: ${sketch("hot1")}")
    assert(sketch("hot2") <= 100 && sketch("hot2") >= 100 - 45,
      s"hot2 bound violated: ${sketch("hot2")}")
  }

  test("BottomKDistinctAgg: distinctness, cap, merge-order invariance") {
    val agg = new graft.functions.BottomKDistinctAgg(4)
    // duplicates collapse; only the 4 smallest distinct values survive
    val xs = Seq(9L, 3L, 7L, 3L, 1L, 9L, 5L, 2L, 8L, 1L)
    val direct = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    assert(direct == Seq(1L, 2L, 3L, 5L))
    // merging partials in any order yields the same set as one pass
    val (l, r) = xs.splitAt(3)
    val b1 = l.foldLeft(agg.zero)(agg.reduce)
    val b2 = r.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(b1.clone(), b2.clone())) == direct)
    assert(agg.finish(agg.merge(b2.clone(), b1.clone())) == direct)
    // fewer than k distinct values: the sketch is exhaustive
    val small = agg.finish(Seq(5L, 5L, 2L).foldLeft(agg.zero)(agg.reduce))
    assert(small == Seq(2L, 5L))
    // single-pass merge == sorted-distinct-union-take-k, across sizes and
    // overlap patterns (empty/partial/full buffers, shared values, one
    // side exhausted early)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val l2 = Seq.fill(rnd.nextInt(8))(rnd.nextInt(12).toLong)
      val r2 = Seq.fill(rnd.nextInt(8))(rnd.nextInt(12).toLong)
      val bl = l2.foldLeft(agg.zero)(agg.reduce)
      val br = r2.foldLeft(agg.zero)(agg.reduce)
      val want = (bl ++ br).distinct.sorted.take(4).toSeq
      assert(agg.finish(agg.merge(bl, br)) == want,
        s"merge($l2, $r2) diverged from reference")
    }
  }

  test("corpus_stats_kmv: estimate within the KMV error bound of exact vocab") {
    // k=64 → standard deviation ≈ 1/sqrt(62) ≈ 12.7%; assert a 3-sigma-ish
    // band so the pin is tight enough to catch a broken estimator but
    // never flakes on an unlucky hash draw
    val exact = Queries.all("corpus_stats").fn(spark, sf0001)
      .select("lang", "vocab_size").as[(String, Long)].collect().toMap
    val kmv = Queries.all("corpus_stats_kmv").fn(spark, sf0001)
      .select("lang", "vocab_kmv").as[(String, Double)].collect().toMap
    assert(kmv.keySet == exact.keySet)
    kmv.foreach { case (lang, est) =>
      val truth = exact(lang).toDouble
      assert(math.abs(est - truth) / truth < 0.4,
        s"$lang: KMV estimate $est vs exact $truth off by >40%")
    }
  }

  test("ngram_counts_approx: sketch candidates + exact re-count reproduce the exact top-5") {
    // the Misra-Gries pass only GENERATES candidates; ranks come from an
    // exact re-count, so if the true top-5 survives the sketch (this
    // near-uniform corpus needs the 2048 capacity — see the query's
    // scaladoc) the outputs must be identical rows
    val exact = Queries.all("ngram_counts").fn(spark, sf0001)
      .select("lang", "bigram", "n", "rank")
    val approx = Queries.all("ngram_counts_approx").fn(spark, sf0001)
      .select("lang", "bigram", "n", "rank")
    assert(exact.exceptAll(approx).count() == 0 &&
      approx.exceptAll(exact).count() == 0,
      "sketch-driven top-5 diverges from exact top-5")
  }

  test("bigram_logprob: hand corpus — interpolated probabilities from exact counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bglm_").toString
    Seq(
      (1L, "a b a b a", "en", "s", 0L), // c2(ab)=2 c2(ba)=2 c1(a)=2 c1(b)=2
      (2L, "solo", "en", "s", 0L)       // <2 tokens -> absent
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Queries.all("bigram_logprob").fn(spark, dir)
      .select("doc_id", "n_bigrams", "sum_logprob", "avg_logprob")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.length == 1 && out(0)._1 == 1L && out(0)._2 == 4L)
    // unigram totals span the WHOLE corpus including the bigram-less doc:
    // cu(a)=3 cu(b)=2 cu(solo)=1 N=6;
    // p(ab)=.5*(2/2)+.5*(2/6)=2/3, p(ba)=.5*(2/2)+.5*(3/6)=3/4
    def q(x: Double) = math.floor(math.log(x) * 1048576.0) / 1048576.0
    val expected = 2 * q(0.5 * (2.0 / 2.0) + 0.5 * (2.0 / 6.0)) +
      2 * q(0.5 * (2.0 / 2.0) + 0.5 * (3.0 / 6.0))
    assert(out(0)._3 == expected, s"sum ${out(0)._3} != $expected")
    assert(out(0)._4 == expected / 4.0)
  }

  test("ann_ivf_append: union-of-segments serving equals the monolithic rebuild") {
    // frozen codebook + per-row assignment => appending a segment must
    // reproduce the full-rebuild results EXACTLY (same rows, same cos,
    // same ranks) — if this ever drifts, assignment stopped being
    // per-row (e.g. someone normalized against a segment-local stat)
    val rebuilt = Queries.all("ann_ivf_trained_topk").fn(spark, sf0001)
    val appended = Queries.all("ann_ivf_append").fn(spark, sf0001)
    assert(rebuilt.exceptAll(appended).count() == 0 &&
      appended.exceptAll(rebuilt).count() == 0,
      "segmented serving diverged from monolithic assignment")
  }

  test("corpus_diff: all four delta classes appear and partition the id space") {
    import spark.implicits._
    val out = Queries.all("corpus_diff").fn(spark, sf0001)
      .as[(Long, String)].collect().toMap
    assert(Set("added", "removed", "changed", "unchanged")
      .subsetOf(out.values.toSet))
    // spot rules from the derived snapshot: 17-multiples removed (unless
    // re-added under a shifted id), 13-multiples changed, 11-multiple
    // copies added
    assert(out(17L) == "removed" && out(13L) == "changed")
    assert(out(200011L) == "added" && out(1L) == "unchanged")
    // 221 = 13*17: dropped wins over edited (the edit never materializes)
    assert(out(221L) == "removed")
  }

  test("split_leakage_safe: no near-dup cluster straddles a split boundary") {
    val out = Queries.all("split_leakage_safe").fn(spark, sf0001).cache()
    try {
      // cluster-atomicity: every rep_id maps to exactly one split
      val straddling = out.groupBy("rep_id")
        .agg(countDistinct("split").as("n_splits"))
        .filter(col("n_splits") > 1).count()
      assert(straddling == 0, s"$straddling clusters straddle splits")
      // the duped fixture pairs (doc, doc+100000) are exact copies ->
      // same cluster -> same split, and clusters really exist (kept <
      // total would be the dedup check; here: some rep_id covers 2 docs)
      val multi = out.groupBy("rep_id").count().filter(col("count") > 1).count()
      assert(multi > 0, "fixture should produce multi-member clusters")
      // split proportions are rep-hash driven: all three splits non-empty
      assert(out.select("split").distinct().count() == 3)
    } finally { out.unpersist(); () }
  }

  test("bigram_logprob: prod twin (xxhash64 keys) agrees with the string-keyed form") {
    // hashing the join keys must not change any count — with no 64-bit
    // collisions on the fixture vocabulary the quantized logprobs are
    // bit-identical
    val str = Queries.all("bigram_logprob").fn(spark, sf0001)
    val xx = Queries.all("bigram_logprob_prod").fn(spark, sf0001)
    assert(str.exceptAll(xx).count() == 0 && xx.exceptAll(str).count() == 0,
      "hashed-key bigram LM diverges from string-keyed form")
  }

  test("span_dedup: prod twin (xxhash64) agrees with the md5 oracle form") {
    // identical plan, different span key — with 60-bit+ keys over ~26k
    // distinct spans a collision that flips a count>1 decision is
    // essentially impossible, so the full per-doc stats must agree
    val md5Form = Queries.all("span_dedup").fn(spark, sf0001)
      .select("doc_id", "n_spans", "n_dup_spans", "flagged")
    val xxForm = Queries.all("span_dedup_prod").fn(spark, sf0001)
      .select("doc_id", "n_spans", "n_dup_spans", "flagged")
    assert(md5Form.exceptAll(xxForm).count() == 0 &&
      xxForm.exceptAll(md5Form).count() == 0,
      "span stats differ between md5 and xxhash64 key forms")
  }

  test("span_dedup: hand corpus — shared and repeated spans count, short docs drop") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_span_").toString
    // doc 1 and 2 share one 5-token span; doc 3 repeats its own span via
    // a 6-token window (two overlapping spans, the repeated one counted
    // once per occurrence); doc 4 is 4 tokens -> no spans -> absent
    Seq(
      (1L, "a b c d e x y", "en", "s", 0L),
      (2L, "z a b c d e", "en", "s", 0L),
      (3L, "p q r s t p q r s t", "en", "s", 0L),
      (4L, "too short to span", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Queries.all("span_dedup").fn(spark, dir)
      .select("doc_id", "n_spans", "n_dup_spans", "flagged")
      .as[(Long, Long, Long, Boolean)].collect()
      .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    // doc1: spans {abcde,bcdex,cdexy}; abcde also in doc2 -> 1 dup
    assert(out(1L) == ((3L, 1L, false)))
    // doc2: {zabcd,abcde}; abcde dup -> frac 0.5 NOT > 0.5 -> unflagged
    assert(out(2L) == ((2L, 1L, false)))
    // doc3: 6 spans; "p q r s t" occurs twice (positions 1 and 6) ->
    // both occurrences dup; the other 4 spans are unique
    assert(out(3L) == ((6L, 2L, false)))
    assert(!out.contains(4L), "sub-window doc must be absent")
  }

  // ------------------------------------------- fixed-point PageRank

  test("pageRankFixedPoint: golden graph equals the exact integer reference; dangling leaks; isolated at teleport floor") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node") // 4 dangling, 5 isolated
    val edgeSeq = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L), (1L, 4L))
    val edges = edgeSeq.toDF("src", "dst")
    val scale = 1000000L
    val iters = 4
    val got = ScaleOps.pageRankFixedPoint(nodes, edges,
        iterations = iters, scale = scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // plain-Scala reference with IDENTICAL integer arithmetic: uniform
    // init scale/n, contrib = rank/outdeg (trunc div), damp = sum*85/100
    val ids = Seq(1L, 2L, 3L, 4L, 5L)
    val n = ids.size
    val tele = (scale * 15 / 100) / n
    val adj = edgeSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var rank = ids.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      adj.foreach { case (u, vs) =>
        val c = rank(u) / vs.size
        vs.foreach(v => inflow(v) += c)
      }
      rank = ids.map(v => v -> (tele + inflow(v) * 85 / 100)).toMap
    }
    assert(got == rank)
    // isolated node: pure teleport floor every round
    assert(got(5L) == tele)
    // node 4 (dangling, two in-edges) holds more than the floor, and
    // total mass strictly leaked (dangling node + floor truncation)
    assert(got(4L) > tele)
    assert(got.values.sum < scale)
    // zero iterations short-circuits to the uniform start
    val zero = ScaleOps.pageRankFixedPoint(nodes, edges,
        iterations = 0, scale = scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zero.values.toSet == Set(scale / n))
  }

  test("pageRankFixedPoint: durable checkpointDir mode is bit-equal and resumable from parquet") {
    // the 100 TB story: per-round state in a durable parquet namespace
    // instead of executor-local checkpoint blocks. This pins (a) the
    // durable mode produces BIT-EQUAL ranks, and (b) the final round's
    // parquet is independently re-readable — the executor-loss /
    // driver-restart resume path (a resumed run reads the round file
    // cold, exactly as this test does).
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L),
      (1L, 4L)).toDF("src", "dst")
    val iters = 4
    val local = ScaleOps.pageRankFixedPoint(nodes, edges, iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("pr_durable").toString
    try {
      val durable = ScaleOps.pageRankFixedPoint(nodes, edges,
        iterations = iters, checkpointDir = Some(dir))
      val got = durable.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == local, "durable mode must be bit-equal to local mode")
      // the run namespace holds exactly the FINAL round (earlier rounds
      // pruned) plus the degree-annotated edge frame
      val runDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      assert(runDirs.length == 1, "one run namespace")
      val rounds = runDirs.head.listFiles().map(_.getName).sorted
      assert(rounds.contains(s"pr_round_$iters"), rounds.mkString(","))
      assert(!rounds.exists(n2 => n2.startsWith("pr_round_") &&
        n2 != s"pr_round_$iters"), "earlier rounds pruned: " + rounds.mkString(","))
      assert(rounds.contains("pr_edges"))
      // cold re-read of the final round — the resume path
      val reread = spark.read
        .parquet(s"${runDirs.head.getAbsolutePath}/pr_round_$iters")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reread == local, "resume re-read must reproduce the ranks")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("quantile_sketch: every answer honors the GK rank bound against exact order statistics") {
    val rows = Queries.all("quantile_sketch").fn(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // exact per-symbol sorted closes, straight from the same projection
    val bySym = Tables.ohlcv(spark, sf0001)
      .select(col("symbol"), col("close")).collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(rows.map(_.getString(0)).toSet == bySym.keySet)
    val qs = Seq(0.25, 0.50, 0.75, 0.90, 0.99)
    rows.foreach { r =>
      val sym = r.getString(0)
      val sorted = bySym(sym)
      val n = sorted.length
      assert(r.getLong(1) == n.toLong)
      // GK guarantee: the returned value's rank is within n/accuracy of
      // the target rank (+1 slack for the duplicate-value rank interval)
      val tolRanks = n.toDouble / Queries.QuantileSketchAccuracy + 1
      qs.zipWithIndex.foreach { case (q, i) =>
        val v = r.getDouble(2 + i)
        val lo = sorted.count(_ < v) // smallest rank holding value v
        val hi = sorted.count(_ <= v) // largest rank holding value v
        val target = math.ceil(q * n)
        assert(target >= lo - tolRanks && target <= hi + tolRanks,
          s"$sym p$q: value $v spans ranks [$lo,$hi], target $target, n=$n")
      }
    }
  }

  test("pageRankConverge: warm-start lands on the cold fixed point in fewer rounds") {
    val n = 400L
    val ids = spark.range(0, n)
    def both(e: org.apache.spark.sql.DataFrame) =
      e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    // irregular base graph (chain + hubs) so convergence takes real rounds
    val base = both(
      ids.filter(col("id") < n - 1)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
        .unionAll(ids.select(col("id").as("src"), (col("id") % 37).as("dst"))
          .filter(col("src") =!= col("dst"))))
    val nodes = ids.select(col("id").as("node"))
    val scale = 1000000000000L
    val tol = scale / n / 20 // 5% of the uniform rank
    val (rBase, kBase) = ScaleOps.pageRankConverge(nodes, base, tol = tol,
      scale = scale)
    // the daily delta: a localized skip rail over the first 60 nodes
    val full = base.unionAll(both(
      ids.filter(col("id") < 60)
        .select(col("id").as("src"), (col("id") + 5).as("dst"))))
    val (rCold, kCold) = ScaleOps.pageRankConverge(nodes, full, tol = tol,
      scale = scale)
    val (rWarm, kWarm) = ScaleOps.pageRankConverge(nodes, full, tol = tol,
      scale = scale, init = Some(rBase))
    info(s"rounds: base=$kBase cold=$kCold warm=$kWarm")
    assert(kWarm < kCold, s"warm $kWarm !< cold $kCold")
    // both stopped within tol of the same fixed point: the geometric
    // tail bounds each at tol·d/(1−d) ≈ 5.7·tol from it (d = 0.85)
    val maxDiff = rWarm.withColumnRenamed("rank", "w")
      .join(rCold.withColumnRenamed("rank", "c"), "node")
      .agg(max(abs(col("w") - col("c")))).head().getLong(0)
    info(s"∞-norm warm-vs-cold = $maxDiff (tol = $tol)")
    assert(maxDiff <= 12 * tol, s"diff $maxDiff > ${12 * tol}")
    // restarting from an already-converged vector is nearly free
    val (_, kAgain) = ScaleOps.pageRankConverge(nodes, full, tol = tol,
      scale = scale, init = Some(rCold))
    assert(kAgain <= 3, s"restart took $kAgain rounds")
    // new nodes absent from init start at the uniform rank: extending
    // the node set must not throw and must rank every node
    val wider = ids.unionAll(spark.range(n, n + 10)).select(col("id").as("node"))
    val (rWide, _) = ScaleOps.pageRankConverge(wider, full, tol = tol,
      scale = scale, init = Some(rCold), maxIterations = 2)
    assert(rWide.count() == n + 10)
  }

  test("pageRankConverge: runDir parquet path matches localCheckpoint and persists the joined frames") {
    val nodes = (1L to 6L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 4L),
      (1L, 6L)).toDF("src", "dst")
    val dir = java.nio.file.Files.createTempDirectory("graft_prc_run_").toFile
    try {
      val (durable, kD) = ScaleOps.pageRankConverge(nodes, edges,
        tol = 1000000L, runDir = Some(dir.getPath))
      val (local, kL) = ScaleOps.pageRankConverge(nodes, edges,
        tol = 1000000L)
      assert(kD == kL, "round count must be path-independent")
      assert(durable.as[(Long, Long)].collect().toMap ==
        local.as[(Long, Long)].collect().toMap,
        "converged ranks must be path-independent")
      // the contribution edges every round joins AND the rank rounds
      // must live in parquet — executor-local blocks would die with an
      // executor and kill the warm run at scale
      val names = dir.listFiles().map(_.getName)
      assert(names.contains("pr_conv_edges"),
        s"degree-annotated edges must persist, got ${names.toSeq}")
      assert(names.count(_.startsWith("pr_conv_ranks_")) >= 2,
        s"per-round rank frames must persist, got ${names.toSeq}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
  }

  test("labelPropagationConverged: stops when no label changes and agrees with any bounded run past that point") {
    // two dense communities bridged by one edge — LPA converges in a few
    // rounds to two stable labels
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val es = clique(Seq(0L, 1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L, 14L, 15L)) ++ Seq((4L, 10L))
    val edges = es.toDF("src", "dst")
    val (conv, rounds) = ScaleOps.labelPropagationConverged(edges)
    val convMap = conv.as[(Long, Long)].collect().toMap
    info(s"converged in $rounds rounds")
    assert(rounds >= 1 && rounds < 40)
    // the converged assignment IS the bounded-round assignment for any
    // round count >= the convergence point (each round is a pure
    // function of the previous labels, and a fixed point stays fixed)
    Seq(rounds, rounds + 2).foreach { k =>
      val bounded = ScaleOps.labelPropagation(edges, k)
        .as[(Long, Long)].collect().toMap
      assert(bounded == convMap, s"bounded k=$k diverged from converged")
    }
    // a converged state has every node on a community label
    assert(convMap.values.toSet.size == 2,
      s"expected 2 communities, got ${convMap.values.toSet}")
    // negative node ids violate the min-tie-break precondition: the
    // adjacency builder must raise, never silently mis-break ties
    val neg = Seq((-1L, 2L), (2L, 3L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      ScaleOps.labelPropagation(neg, 1).collect()
    }
    assert(ex.getMessage.contains("nonnegative"))
  }

  test("lpaRound contract: a label-domain node absent from the adjacency drops out (label ⊆ adjacency required)") {
    // the round's output is the neighbor-argmax frame itself (no join
    // back to the label frame), so an ISOLATED node's label row silently
    // disappears — documented on lpaRound; callers must keep the label
    // domain a subset of the adjacency node domain (both current callers
    // initialize labels FROM the adjacency node set)
    val und = Seq((1L, 2L), (2L, 1L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 2L), (99L, 99L)).toDF("node", "label")
    val out = ScaleOps.lpaRound(und, labels).as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 2L),
      s"isolated node must drop out of the round's output, got $out")
    assert(out == Map(1L -> 2L, 2L -> 1L),
      s"neighbors adopt each other's label, got $out")
  }

  test("labelPropagationConverged: runDir parquet path matches localCheckpoint and persists the joined frames") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L, 14L)) ++ Seq((4L, 10L)))
      .toDF("src", "dst")
    val dir = java.nio.file.Files.createTempDirectory("graft_lpa_run_").toFile
    try {
      val (durable, kD) = ScaleOps.labelPropagationConverged(edges,
        runDir = Some(dir.getPath))
      val (local, kL) = ScaleOps.labelPropagationConverged(edges)
      assert(kD == kL, "round count must be path-independent")
      assert(durable.as[(Long, Long)].collect().toMap ==
        local.as[(Long, Long)].collect().toMap,
        "converged labels must be path-independent")
      // the adjacency every round joins AND the label rounds must live in
      // parquet — executor-local blocks would die with an executor
      val names = dir.listFiles().map(_.getName)
      assert(names.contains("lpa_adj"),
        s"adjacency must persist, got ${names.toSeq}")
      assert(names.exists(_.startsWith("lpa_labels_")),
        s"per-round label frames must persist, got ${names.toSeq}")
      // two-rounds-back frames are swept, not hoarded: at most the two
      // live rounds (the probe reads the previous one) plus labels_0
      assert(names.count(_.startsWith("lpa_labels_")) <= 3,
        s"stale label rounds must be deleted, got ${names.toSeq}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
  }

  test("ssspConverged: empty-frontier stop, bounded-form agreement, runDir matches localCheckpoint") {
    // weighted chain with a shortcut: convergence needs several rounds,
    // and the shortcut makes a later round IMPROVE an already-set node
    // (the frontier-reentry invariant, not just first-touch BFS order)
    val edges = Seq(
      (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (4L, 5L, 1L), (0L, 5L, 10L), (5L, 6L, 1L))
      .toDF("src", "dst", "weight")
    val seeds = Seq(0L).toDF("node")
    val (conv, rounds) = ScaleOps.ssspConverged(edges, seeds)
    val convMap = conv.as[(Long, Long)].collect().toMap
    info(s"converged in $rounds rounds")
    assert(rounds >= 2 && rounds < 64)
    assert(convMap == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
      4L -> 4L, 5L -> 5L, 6L -> 6L))
    // converged == bounded for any bound >= the convergence point (each
    // round is a pure function of the previous distances)
    Seq(rounds, rounds + 2).foreach { k =>
      val bounded = ScaleOps.ssspWeighted(edges, seeds, k)
        .as[(Long, Long)].collect().toMap
      assert(bounded == convMap, s"bounded k=$k diverged from converged")
    }
    // durable mode: identical distances + the frames the rounds depend on
    // live in parquet (adjacency joined every round, per-round merged)
    val dir = java.nio.file.Files.createTempDirectory("graft_sssp_run_").toFile
    try {
      val (durable, kD) = ScaleOps.ssspConverged(edges, seeds,
        runDir = Some(dir.getPath))
      assert(kD == rounds, "round count must be path-independent")
      assert(durable.as[(Long, Long)].collect().toMap == convMap,
        "distances must be path-independent")
      val names = dir.listFiles().map(_.getName)
      assert(names.contains("sssp_adj"),
        s"adjacency must persist, got ${names.toSeq}")
      assert(names.count(_.startsWith("sssp_merged_")) == 1,
        s"exactly the live merged round must remain, got ${names.toSeq}")
      // bounded entry point threads the same escape hatch
      val viaBounded = ScaleOps.ssspWeighted(edges, seeds, rounds,
        runDir = Some(dir.getPath)).as[(Long, Long)].collect().toMap
      assert(viaBounded == convMap)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
  }

  test("pagerank_prod: xxhash64-family ranks bit-equal the md5 family on the fixture corpus") {
    val md5Ranks = QueriesScale.all("pagerank").fn(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val xxRanks = QueriesScale.all("pagerank_prod").fn(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(md5Ranks == xxRanks,
      "integer PageRank is hash-free past the candidate stage — rank " +
        "vectors must agree wherever the verified edge sets do")
  }

  test("pageRankFixedPoint: parquet-checkpoint path matches localCheckpoint, edges durable too") {
    // the durable form must put EVERYTHING the rounds depend on through
    // parquet — the per-round rank frames AND the degree-annotated edge
    // list every round joins against (executor-local blocks for either
    // would die with an executor and kill the run)
    val nodes = (1L to 6L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 4L),
      (1L, 6L)).toDF("src", "dst")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pr_ckpt_").toFile
    try {
      val durable = ScaleOps.pageRankFixedPoint(nodes, edges,
          iterations = 3, checkpointDir = Some(ckpt.getPath))
        .as[(Long, Long)].collect().toMap
      val local = ScaleOps.pageRankFixedPoint(nodes, edges, iterations = 3)
        .as[(Long, Long)].collect().toMap
      assert(durable == local, "fixed-point ranks must be path-independent")
      val runFiles = ckpt.listFiles().filter(_.getName.startsWith("cc_run_"))
        .flatMap(_.listFiles()).map(_.getName)
      assert(runFiles.contains("pr_edges"),
        s"degree-annotated edges must persist in the run dir, got ${runFiles.toSeq}")
      assert(runFiles.count(_.startsWith("pr_round_")) == 1,
        s"only the last round should be kept, got ${runFiles.toSeq}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(ckpt)
    }
  }

  // ------------------------------------------- shard shuffle (prod twin)

  test("shuffle_shard_prod: valid permutation per shard, doc set preserved, bounded balance, md5-twin equivalence of shape") {
    val dir = sf0001
    val out = QueriesScale.all("shuffle_shard_prod").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.documents(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == docs, "every doc exactly once")
    val byShard = out.groupBy(_._2)
    byShard.foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions must be exactly 1..${rows.length}")
    }
    val sizes = byShard.values.map(_.length)
    assert(byShard.size == 16, "all 16 shards populated at 500 docs")
    assert(sizes.max <= 3 * (out.length / 16),
      "no shard above 3x the mean — hash balance")
    // the md5 (oracle) twin has the same shape properties with
    // different assignments — same doc set, same shard count
    val md5Out = QueriesScale.all("shuffle_shard").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(md5Out.map(_._1).toSet == docs)
    assert(md5Out.groupBy(_._2).size == 16)
  }

  // ------------------------------------------- content-defined chunking

  /** Independent per-position reference: explicit w-term polynomial over
    * code points in BigInt (no rolling update, no masking tricks).
    */
  private def cdcReference(s: String, w: Int, mask: Int): Seq[Int] = {
    val cps = s.codePoints().toArray
    val m = BigInt(2).pow(31)
    val coefs = (0 until w).map(t => BigInt(31).pow(t).mod(m))
    (w to cps.length - 1).filter { p => // 1-based p in [w, len-1]
      val h = (0 until w).map(t => BigInt(cps(p - 1 - t)) * coefs(t)).sum.mod(m)
      h % (mask + 1) == 0
    }
  }

  private def cdcCutsOf(s: String, w: Int = 16, mask: Int = 15): Seq[Int] =
    Seq(Tuple1(s)).toDF("t")
      .select(ScaleOps.cdcCuts(col("t"), w, mask).as("c"))
      .head().getSeq[Int](0).toSeq

  test("CdcCuts: rolling hash equals the explicit polynomial reference; code-point semantics; edges") {
    // mask 15 (expected chunk 16) so short fixtures actually cut
    val ascii = ("the quick brown fox jumps over the lazy dog " * 8).trim
    assert(cdcCutsOf(ascii) == cdcReference(ascii, 16, 15))
    assert(cdcCutsOf(ascii).nonEmpty, "fixture long enough to cut")
    // multibyte: CJK (3-byte UTF-8) and a supplementary-plane char
    // (surrogate pair in UTF-16) — positions count CODE POINTS
    val cjk = "深度学习模型需要大规模预训练语料库" * 5 + new String(Character.toChars(0x1F600)) + "end of stream padding here"
    assert(cdcCutsOf(cjk) == cdcReference(cjk, 16, 15))
    // shorter than the window: no position is eligible
    assert(cdcCutsOf("short") == Seq())
    // exactly window long: p = w = len is the final position — suppressed
    assert(cdcCutsOf("abcdefghijklmnop") == Seq())
    // null text: empty, not null
    val nullRow = Seq[Option[String]](None).toDF("t")
      .select(ScaleOps.cdcCuts(col("t"), 16, 15).as("c")).head()
    assert(!nullRow.isNullAt(0) && nullRow.getSeq[Int](0).isEmpty)
  }

  test("CdcCuts: insertion moves only boundaries within one window of the edit") {
    val base = ("content defined chunking is robust to local edits " * 10).trim
    val editAt = 200 // 0-based char offset of the insertion
    val ins = "XYZ"
    val edited = base.substring(0, editAt) + ins + base.substring(editAt)
    val cutsBase = cdcCutsOf(base)
    val cutsEdit = cdcCutsOf(edited)
    // every boundary strictly before the edit is preserved as-is
    assert(cutsEdit.filter(_ < editAt) == cutsBase.filter(_ < editAt))
    // every boundary at least one window past the edit is preserved,
    // shifted by exactly the insertion length — the CDC property that
    // keeps per-chunk hashes re-matching a standing chunk store
    val horizon = editAt + ins.length + 16
    assert(cutsEdit.filter(_ >= horizon).map(_ - ins.length) ==
      cutsBase.filter(_ >= horizon - ins.length))
  }

  test("cdc_chunk: chunks reassemble the document exactly and respect the cut rule") {
    val rows = QueriesScale.all("cdc_chunk").fn(spark, sf0001)
      .select("doc_id", "chunk_idx", "off", "chunk_len")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val texts = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.groupBy(_._1).foreach { case (doc, chunks) =>
      val sorted = chunks.sortBy(_._2)
      // offsets tile [1, len] with no gap or overlap
      assert(sorted.head._3 == 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 == a._3 + a._4, s"doc $doc gap")
        case _ =>
      }
      val last = sorted.last
      assert(last._3 + last._4 - 1 ==
        texts(doc).codePointCount(0, texts(doc).length))
    }
  }

  // ------------------------------------------------ PCM / Y4M decode

  private def le16b(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32b(v: Int) = le16b(v) ++ le16b(v >> 16)
  private def wavBytes(ch: Int, rate: Int, bits: Int, data: Array[Byte]) =
    "RIFF".getBytes ++ le32b(36 + data.length) ++ "WAVEfmt ".getBytes ++
      le32b(16) ++ le16b(1) ++ le16b(ch) ++ le32b(rate) ++
      le32b(rate * ch * bits / 8) ++ le16b(ch * bits / 8) ++ le16b(bits) ++
      "data".getBytes ++ le32b(data.length) ++ data

  private def decodePcm(b: Array[Byte]) =
    Seq(Tuple1(b)).toDF("p")
      .select(ScaleOps.pcmDecode(col("p")).as("d"))
      .select(col("d.format"), col("d.channels"), col("d.n_frames"),
        col("d.samples"), col("d"))
      .head()

  test("PcmDecode: golden 16-bit stereo bytes — LE two's complement, interleave, stats") {
    val data = Seq(100, -200, -1, 32767, -32768, 0)
      .flatMap(v => le16b(v & 0xFFFF)).toArray
    val r = decodePcm(wavBytes(2, 8000, 16, data))
    assert(r.getString(0) == "wav" && r.getInt(1) == 2 && r.getInt(2) == 3)
    assert(r.getSeq[Int](3) == Seq(100, -200, -1, 32767, -32768, 0))
    val st = Seq(Tuple1(wavBytes(2, 8000, 16, data))).toDF("p")
      .select(ScaleOps.pcmChannelStats(ScaleOps.pcmDecode(col("p"))).as("s"))
      .select(col("s.sums"), col("s.peaks"), col("s.zero_crossings")).head()
    // ch0: 100, -1, -32768 (one + -> - flip); ch1: -200, 32767, 0 (one - -> + flip)
    assert(st.getSeq[Long](0) == Seq(-32669L, 32567L))
    assert(st.getSeq[Long](1) == Seq(32768L, 32767L))
    assert(st.getSeq[Long](2) == Seq(1L, 1L))
  }

  test("PcmDecode: 8-bit mono bias, truncated-frame drop, non-PCM and corrupt fallbacks") {
    // 8-bit WAV is UNSIGNED with a 128 bias
    val r = decodePcm(wavBytes(1, 8000, 8, Array[Byte](128.toByte, 127, 129.toByte, 0)))
    assert(r.getSeq[Int](3) == Seq(0, -1, 1, -128))
    val st = Seq(Tuple1(wavBytes(1, 8000, 8, Array[Byte](128.toByte, 127, 129.toByte, 0))))
      .toDF("p")
      .select(ScaleOps.pcmChannelStats(ScaleOps.pcmDecode(col("p"))).as("s"))
      .select(col("s.sums"), col("s.peaks"), col("s.zero_crossings")).head()
    assert(st.getSeq[Long](0) == Seq(-128L))
    assert(st.getSeq[Long](1) == Seq(128L))
    assert(st.getSeq[Long](2) == Seq(3L)) // +,-,+,- : three sign flips
    // a torn final frame is dropped, not guessed: 7 data bytes at
    // blockAlign 4 -> 1 whole frame
    val torn = decodePcm(wavBytes(2, 8000, 16, Array.fill[Byte](7)(1)))
    assert(torn.getInt(2) == 1 && torn.getSeq[Int](3).length == 2)
    // an OVERSTATED data-size field must not salvage trailing bytes of
    // the file (or of subsequent chunks) as samples: reject, don't guess
    val overstated = wavBytes(1, 8000, 8, Array[Byte](1, 2, 3, 4))
    overstated(overstated.length - 8 + 2) = 99.toByte // dataSize 4 -> huge
    assert(decodePcm(overstated).getString(0) == "wav" &&
      decodePcm(overstated).isNullAt(3))
    // float PCM (fmt tag 3) and non-RIFF payloads: samples never guessed
    val floatWav = wavBytes(1, 8000, 16, Array[Byte](0, 0))
      .updated(20, 3.toByte)
    assert(decodePcm(floatWav).getString(0) == "wav" && decodePcm(floatWav).isNullAt(3))
    assert(decodePcm("not audio".getBytes).getString(0) == "unknown")
    // stats on an unknown decode: NULL through
    val unk = Seq(Tuple1("nope".getBytes)).toDF("p")
      .select(ScaleOps.pcmChannelStats(ScaleOps.pcmDecode(col("p"))).as("s")).head()
    assert(unk.isNullAt(0))
  }

  private def y4m(b: Array[Byte], stride: Int) =
    Seq(Tuple1(b)).toDF("p")
      .select(ScaleOps.y4mFrameLuma(col("p"), stride).as("v"))
      .select(col("v.width"), col("v.height"), col("v.colorspace"),
        col("v.n_frames"), col("v.frame_idx"), col("v.y_sums"))
      .head()

  test("Y4mFrameLuma: golden mono stream — header tags, frame walk, stride sampling") {
    val s = "YUV4MPEG2 W2 H2 F25:1 Ip Cmono\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes ++ Array[Byte](1, 2, 3, 4) ++
      "FRAME\n".getBytes ++ Array[Byte](5, 6, 7, 8) ++
      "FRAMEXsome_param\n".getBytes ++ Array[Byte](10, 20, 30, 40)
    val r = y4m(s, 2)
    assert(r.getInt(0) == 2 && r.getInt(1) == 2 && r.getString(2) == "mono")
    assert(r.getInt(3) == 3)
    assert(r.getSeq[Int](4) == Seq(0, 2))
    assert(r.getSeq[Long](5) == Seq(10L, 100L))
  }

  test("Y4mFrameLuma: 4:2:0 chroma skip is real; default colorspace; torn streams never salvage") {
    // W2 H2 C420: frame = 4 luma + 2 chroma bytes; the walk must skip
    // the chroma to find the next FRAME marker
    val s420 = "YUV4MPEG2 W2 H2 C420jpeg\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes ++ Array[Byte](1, 2, 3, 4, 9, 9) ++
      "FRAME\n".getBytes ++ Array[Byte](5, 5, 5, 5, 7, 7)
    val r = y4m(s420, 1)
    assert(r.getString(2) == "420jpeg" && r.getInt(3) == 2)
    assert(r.getSeq[Long](5) == Seq(10L, 20L))
    // absent C tag defaults to 420 per spec: same payload minus the tag
    val sDefault = "YUV4MPEG2 W2 H2\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes ++ Array[Byte](1, 2, 3, 4, 9, 9)
    val rd = y4m(sDefault, 1)
    assert(rd.getString(2) == "420" && rd.getSeq[Long](5) == Seq(10L))
    // truncated final frame / bad marker / bad magic: NULL, not a prefix
    assert(y4m(s420.dropRight(1), 1).isNullAt(0))
    val badMarker = "YUV4MPEG2 W2 H2 Cmono\n".getBytes("US-ASCII") ++
      "FRUME\n".getBytes ++ Array[Byte](1, 2, 3, 4)
    assert(y4m(badMarker, 1).isNullAt(0))
    assert(y4m("MPEG4".getBytes, 1).isNullAt(0))
  }

  test("SynthFlac: really Rice-coded fixtures decode back to the WAV formula") {
    import org.apache.spark.sql.graftnative.FlacSynth
    // seeds cover both widths, mono/stereo, multi-frame streams, and the
    // fixed-order rotation (order = (seed + frame + channel) mod 5)
    val rows = Seq((1L, 8000L, 50L, 0L), (2L, 12000L, 199L, 1L),
      (1L, 44100L, 64L, 2L), (2L, 16000L, 130L, 7L)).toDF("ch", "rate", "fr", "seed")
    for (bits <- Seq(8, 16)) {
      val dec = rows.select(col("ch"), col("fr"), col("seed"),
        ScaleOps.pcmDecode(ScaleOps.synthFlac(col("ch"), col("rate"),
          col("fr"), col("seed"), bits)).as("d")).collect()
      dec.foreach { r =>
        val ch = r.getLong(0).toInt; val fr = r.getLong(1).toInt
        val seed = r.getLong(2)
        val st = r.getStruct(3)
        assert(st.getString(0) == "flac", s"bits=$bits seed=$seed")
        assert(st.getInt(1) == ch && st.getInt(3) == bits &&
          st.getInt(4) == fr, s"bits=$bits seed=$seed")
        val samples = st.getSeq[Int](5)
        assert(samples.length == fr * ch)
        samples.zipWithIndex.foreach { case (v, k) =>
          assert(v == FlacSynth.sampleAt(seed, k, bits),
            s"bits=$bits seed=$seed sample $k")
        }
      }
    }
  }

  test("FlacCodec: golden stereo decorrelation, wasted bits, 4-byte frame numbers") {
    // same independent CRC/bit-writer helpers as the mono golden test
    def crc8(bs: Seq[Int]): Int = bs.foldLeft(0) { (c0, b) =>
      (0 until 8).foldLeft(c0 ^ b) { (c, _) =>
        if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF }
    }
    def crc16(bs: Seq[Int]): Int = bs.foldLeft(0) { (c0, b) =>
      (0 until 8).foldLeft(c0 ^ (b << 8)) { (c, _) =>
        if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
        else (c << 1) & 0xFFFF }
    }
    class BW {
      val out = collection.mutable.ArrayBuffer.empty[Int]
      var acc = 0; var n = 0
      def put(v: Long, len: Int): Unit = (len - 1 to 0 by -1).foreach { k =>
        acc = (acc << 1) | ((v >> k) & 1L).toInt; n += 1
        if (n == 8) { out += acc; acc = 0; n = 0 }
      }
      def align(): Unit = if (n > 0) put(0L, 8 - n)
    }
    def streamInfo(total: Int, channels: Int) = Seq(
      'f'.toInt, 'L'.toInt, 'a'.toInt, 'C'.toInt,
      0x80, 0, 0, 34,
      0, 4, 0, 4, 0, 0, 0, 0, 0, 0,
      8000 >> 12, (8000 >> 4) & 0xFF,
      ((8000 & 0xF) << 4) | ((channels - 1) << 1) | 0,
      (7 << 4) | 0, 0, 0, 0, total) ++ Seq.fill(16)(0)
    // frame header: sync/fixed, bs code 6 + rate-from-streaminfo, 8-bit
    // samples (ss code 1), channel assignment from the argument
    def frame(chAsgn: Int, body: BW => Unit): Seq[Int] = {
      val hdr = Seq(0xFF, 0xF8, 0x60, (chAsgn << 4) | (1 << 1), 0, 3)
      val bw = new BW
      body(bw)
      bw.align()
      val f = hdr ++ Seq(crc8(hdr)) ++ bw.out
      val c = crc16(f)
      f ++ Seq((c >> 8) & 0xFF, c & 0xFF)
    }
    def decode(ints: Seq[Int]) = {
      val st = Seq(Tuple1(ints.map(_.toByte).toArray)).toDF("b")
        .select(ScaleOps.pcmDecode(col("b")).as("d")).head().getStruct(0)
      (st.getString(0), if (st.isNullAt(5)) null else st.getSeq[Int](5))
    }
    def const(bw: BW, v: Int, bits: Int): Unit = {
      bw.put(0, 1); bw.put(0, 6); bw.put(0, 1)
      bw.put(v.toLong & ((1L << bits) - 1), bits)
    }
    // LEFT-SIDE (chAsgn 8): L constant 100 (8 bits), side constant 30 at
    // bps+1 = 9 bits → R = L − side = 70
    val ls = streamInfo(4, 2) ++ frame(8, { bw =>
      const(bw, 100, 8); const(bw, 30, 9) })
    assert(decode(ls) == (("flac", Seq.fill(4)(Seq(100, 70)).flatten)))
    // RIGHT-SIDE (chAsgn 9): side constant 25 (9 bits, channel 0), R
    // constant 50 (8 bits) → L = side + R = 75
    val rs = streamInfo(4, 2) ++ frame(9, { bw =>
      const(bw, 25, 9); const(bw, 50, 8) })
    assert(decode(rs) == (("flac", Seq.fill(4)(Seq(75, 50)).flatten)))
    // MID-SIDE (chAsgn 10): mid 7 (8 bits), side 6 (9 bits) → the spec
    // reconstruction (mid<<1 | side&1 ± side) >> 1 = (L 10, R 4); a
    // NEGATIVE side in a second frame pins the sign handling: mid −3,
    // side −5 → mid2 = −6|1 = −5 → L = (−5−5)>>1 = −5, R = (−5+5)>>1 = 0
    val ms = streamInfo(4, 2) ++ frame(10, { bw =>
      const(bw, 7, 8); const(bw, 6, 9) })
    assert(decode(ms) == (("flac", Seq.fill(4)(Seq(10, 4)).flatten)))
    val msNeg = streamInfo(4, 2) ++ frame(10, { bw =>
      const(bw, -3, 8); const(bw, -5, 9) })
    assert(decode(msNeg) == (("flac", Seq.fill(4)(Seq(-5, 0)).flatten)))
    // WASTED BITS: mono VERBATIM, wasted = 1 (flag 1 + unary 0 → q=0),
    // samples stored at 7 effective bits, output shifted left by 1
    val wb = streamInfo(4, 1) ++ frame(0, { bw =>
      bw.put(0, 1); bw.put(1, 6) // VERBATIM
      bw.put(1, 1) // wasted-bits flag
      bw.put(1, 1) // unary 0 → wasted = 1
      Seq(3, -5, 7, 0).foreach(v => bw.put(v.toLong & 0x7F, 7))
    })
    assert(decode(wb) == (("flac", Seq(6, -10, 14, 0))))

    // 4-byte coded frame numbers: past frame index 0xFFFF the encoder
    // must emit the 0xF0 lead form (round-11 advice; 3-byte-only
    // encoding produced invalid streams beyond ~4.19M samples). One
    // frame past the boundary: 0x10001 blocks of 64 mono samples.
    import org.apache.spark.sql.graftnative.{FlacSynth, FlacCodec}
    val frames = (0x10001L) * 64L
    val big = FlacSynth.flacBytes(1, 8000, 8, frames, seed = 3L)
    assert(big != null)
    val st = Seq(Tuple1(big)).toDF("b")
      .select(ScaleOps.pcmDecode(col("b")).as("d")).head().getStruct(0)
    assert(st.getString(0) == "flac", "boundary stream must decode")
    assert(st.getInt(4) == frames.toInt)
    val samples = st.getSeq[Int](5)
    assert(samples.length == frames.toInt)
    // spot-check samples inside the first 4-byte-numbered frame
    Seq(0, 0x10000 * 64, frames.toInt - 1).foreach { k =>
      assert(samples(k) == FlacSynth.sampleAt(3L, k, 8), s"sample $k")
    }
  }

  test("FlacCodec: golden hand-built streams — CONSTANT/VERBATIM/LPC, escape, CRC gates") {
    // independent CRC implementations (poly 0x07 / 0x8005, init 0)
    def crc8(bs: Seq[Int]): Int = bs.foldLeft(0) { (c0, b) =>
      (0 until 8).foldLeft(c0 ^ b) { (c, _) =>
        if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF }
    }
    def crc16(bs: Seq[Int]): Int = bs.foldLeft(0) { (c0, b) =>
      (0 until 8).foldLeft(c0 ^ (b << 8)) { (c, _) =>
        if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
        else (c << 1) & 0xFFFF }
    }
    class BW {
      val out = collection.mutable.ArrayBuffer.empty[Int]
      var acc = 0; var n = 0
      def put(v: Long, len: Int): Unit = (len - 1 to 0 by -1).foreach { k =>
        acc = (acc << 1) | ((v >> k) & 1L).toInt; n += 1
        if (n == 8) { out += acc; acc = 0; n = 0 }
      }
      def align(): Unit = if (n > 0) put(0L, 8 - n)
    }
    // STREAMINFO for mono 8-bit rate 8000, total 4 samples, block 4
    def streamInfo(total: Int) = Seq(
      'f'.toInt, 'L'.toInt, 'a'.toInt, 'C'.toInt,
      0x80, 0, 0, 34,
      0, 4, 0, 4, 0, 0, 0, 0, 0, 0,
      8000 >> 12, (8000 >> 4) & 0xFF, ((8000 & 0xF) << 4) | (0 << 1) | 0,
      (7 << 4) | 0, 0, 0, 0, total) ++ Seq.fill(16)(0)
    // frame header: sync/fixed, bs code 6 + rate-from-streaminfo,
    // mono + 8-bit (ss code 1), frame 0, blocksize-1
    def frameHdr(bsMinus1: Int) =
      Seq(0xFF, 0xF8, 0x60, (0 << 4) | (1 << 1), 0, bsMinus1)
    def frame(body: BW => Unit, corruptCrc16: Boolean = false): Seq[Int] = {
      val hdr = frameHdr(3)
      val bw = new BW
      body(bw)
      bw.align()
      val f = hdr ++ Seq(crc8(hdr)) ++ bw.out
      val c = crc16(f) ^ (if (corruptCrc16) 0x40 else 0)
      f ++ Seq((c >> 8) & 0xFF, c & 0xFF)
    }
    def decode(ints: Seq[Int]) = {
      val st = Seq(Tuple1(ints.map(_.toByte).toArray)).toDF("b")
        .select(ScaleOps.pcmDecode(col("b")).as("d")).head().getStruct(0)
      (st.getString(0), if (st.isNullAt(5)) null else st.getSeq[Int](5))
    }
    // CONSTANT subframe, value 5: pad 0, type 000000, wasted 0, 8-bit 5
    val const = streamInfo(4) ++ frame { bw =>
      bw.put(0, 1); bw.put(0, 6); bw.put(0, 1); bw.put(5, 8) }
    assert(decode(const) == (("flac", Seq(5, 5, 5, 5))))
    // VERBATIM subframe [1, -2, 3, -4]
    val verbatim = streamInfo(4) ++ frame { bw =>
      bw.put(0, 1); bw.put(1, 6); bw.put(0, 1)
      Seq(1, -2, 3, -4).foreach(v => bw.put(v.toLong & 0xFF, 8)) }
    assert(decode(verbatim) == (("flac", Seq(1, -2, 3, -4))))
    // LPC order 1, precision 3, shift 1, coef 2 → pred = s[i-1]; warm-up
    // 4, residuals +1 each (samples 4,5,6,7), Rice k=1
    val lpc = streamInfo(4) ++ frame { bw =>
      bw.put(0, 1); bw.put(32, 6); bw.put(0, 1) // LPC order 1 (type 100000)
      bw.put(4, 8) // warm-up
      bw.put(2, 4) // precision − 1
      bw.put(1, 5) // shift
      bw.put(2, 3) // coef = 2
      bw.put(0, 2); bw.put(0, 4) // method 0, partition order 0
      bw.put(1, 4) // Rice param k = 1
      (1 to 3).foreach { _ => bw.put(1, 2); bw.put(0, 1) } // u=2: q=1, r=0
    }
    assert(decode(lpc) == (("flac", Seq(4, 5, 6, 7))))
    // escape-coded partition: param 1111, 4 raw bits each [-3, 2, -1, 0]
    val esc = streamInfo(4) ++ frame { bw =>
      bw.put(0, 1); bw.put(8, 6); bw.put(0, 1) // FIXED order 0
      bw.put(0, 2); bw.put(0, 4)
      bw.put(15, 4); bw.put(4, 5)
      Seq(-3, 2, -1, 0).foreach(v => bw.put(v.toLong & 0xF, 4))
    }
    assert(decode(esc) == (("flac", Seq(-3, 2, -1, 0))))
    // corrupt frame CRC-16 → unknown, never wrong samples
    val bad = streamInfo(4) ++ frame({ bw =>
      bw.put(0, 1); bw.put(0, 6); bw.put(0, 1); bw.put(5, 8) },
      corruptCrc16 = true)
    assert(decode(bad)._1 == "unknown" || decode(bad)._2 == null)
    // truncation and a samples-vs-STREAMINFO shortfall also reject
    assert(decode(const.dropRight(3))._2 == null)
    assert(decode(streamInfo(9) ++ frame { bw =>
      bw.put(0, 1); bw.put(0, 6); bw.put(0, 1); bw.put(5, 8) })._2 == null)
  }

  test("synthWavPcm / synthY4m: fixtures decode back to the generative formulas") {
    // the audio_pcm fixture contract: container value (seed*13 + k*7)
    // mod 2^bits, frame-major interleave
    val wav16 = Seq(Tuple1(7L)).toDF("seed")
      .select(ScaleOps.pcmDecode(ScaleOps.synthWavPcm(
        lit(2L), lit(8000L), 16, lit(5L), col("seed"))).as("d"))
      .select(col("d.channels"), col("d.n_frames"), col("d.samples")).head()
    assert(wav16.getInt(0) == 2 && wav16.getInt(1) == 5)
    val want16 = (0 until 10).map { k =>
      val u = (7L * 13 + k * 7) % 65536
      (if (u >= 32768) u - 65536 else u).toInt
    }
    assert(wav16.getSeq[Int](2) == want16)
    val wav8 = Seq(Tuple1(3L)).toDF("seed")
      .select(ScaleOps.pcmDecode(ScaleOps.synthWavPcm(
        lit(1L), lit(8000L), 8, lit(4L), col("seed"))).as("d"))
      .select(col("d.samples")).head()
    assert(wav8.getSeq[Int](0) ==
      (0 until 4).map(k => ((3L * 13 + k * 7) % 256 - 128).toInt))
    // video: mono and 420 streams of the SAME (w, h, seed) yield the
    // SAME luma sums — chroma planes change the walk, not the signal
    val vids = Seq(Tuple1(11L)).toDF("seed")
      .select(
        ScaleOps.y4mFrameLuma(ScaleOps.synthY4m(
          lit(4L), lit(4L), lit(3L), col("seed"), "mono"), 1).as("m"),
        ScaleOps.y4mFrameLuma(ScaleOps.synthY4m(
          lit(4L), lit(4L), lit(3L), col("seed"), "420jpeg"), 1).as("c"))
      .select(col("m.y_sums"), col("c.y_sums"), col("m.n_frames")).head()
    val wantLuma = (0 until 3).map { f =>
      (0 until 16).map(o => (11L * 31 + f * 11 + o * 7) % 256).sum
    }
    assert(vids.getSeq[Long](0) == wantLuma)
    assert(vids.getSeq[Long](1) == wantLuma)
    assert(vids.getInt(2) == 3)
    // odd dims in 420jpeg: the fixture sizes chroma with the SAME ceil
    // arithmetic as the parser, so the stream decodes instead of
    // silently yielding NULL from a payload-size disagreement
    val odd = Seq(Tuple1(5L)).toDF("seed")
      .select(ScaleOps.y4mFrameLuma(ScaleOps.synthY4m(
        lit(3L), lit(5L), lit(2L), col("seed"), "420jpeg"), 1).as("v"))
      .select(col("v.n_frames"), col("v.y_sums")).head()
    assert(odd.getInt(0) == 2)
    assert(odd.getSeq[Long](1) == (0 until 2).map { f =>
      (0 until 15).map(o => (5L * 31 + f * 11 + o * 7) % 256).sum
    })
  }

  test("video_dhash_neardup: twin recall 1.0 — every MP4 frame reps to its AVI twin or earlier") {
    val rows = Queries.all("video_dhash_neardup").fn(spark, sf0001).collect()
    val rep = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nDocs = Tables.documents(spark, sf0001).count().toInt
    var twins = 0
    for (d <- 0 until nDocs) {
      val frames = 3 + d % 4
      for (f <- 0 until frames) {
        val aviPid = (2L * d) * 64 + f
        val mp4Pid = (2L * d + 1) * 64 + f
        // the MP4 frame's hash equals its AVI twin's, so it can never
        // be a cluster representative ahead of the twin
        assert(rep.contains(mp4Pid), s"doc $d frame $f: twin not deduped")
        assert(rep(mp4Pid) <= aviPid, s"doc $d frame $f: rep after twin")
        twins += 1
      }
    }
    assert(twins == (0 until nDocs).map(d => 3 + d % 4).sum)
    // star output is linear: strictly fewer rows than total frames
    assert(rows.length < 2 * twins)
  }

  test("dhashHammingClusters: perturbed twins recover 100%, chains merge transitively") {
    // well-separated random bases (seeded; pairwise distance asserted)
    val rnd = new scala.util.Random(4242)
    val bases = (0 until 40).map(_ => rnd.nextLong())
    for (i <- bases.indices; j <- 0 until i)
      assert(java.lang.Long.bitCount(bases(i) ^ bases(j)) > 8,
        s"bases $i/$j too close for an unambiguous fixture")
    // per base: an exact twin, a 1-bit perturbation, a 2-bit perturbation
    val rows = bases.zipWithIndex.flatMap { case (h, k) =>
      val pid = 100L * k
      Seq((pid, h), (pid + 1, h),
        (pid + 2, h ^ (1L << (k % 64))),
        (pid + 3, h ^ (1L << ((k + 7) % 64)) ^ (1L << ((k + 29) % 64))))
    }
    val rep = ScaleOps.dhashHammingClusters(rows.toDF("pid", "dh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- bases.indices; o <- 1 to 3)
      assert(rep(100L * k + o) == 100L * k,
        s"base $k offset $o: perturbed twin not recovered")
    for (k <- bases.indices)
      assert(!rep.contains(100L * k), "representatives emit no row")
    // transitive chain: ham(a,b)=4, ham(b,c)=4, ham(a,c)=8 — CC must
    // merge all three even though a-c exceeds the per-edge budget
    val a = 0x0123456789ABCDEFL
    val b = a ^ 0xFL
    val c = b ^ (0xFL << 20)
    assert(java.lang.Long.bitCount(a ^ c) == 8)
    val chain = ScaleOps.dhashHammingClusters(
      Seq((1L, a), (2L, b), (3L, c)).toDF("pid", "dh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chain == Map(2L -> 1L, 3L -> 1L), s"chain merge: $chain")
    // hamming 5 stays separate under the default budget of 4
    val far = ScaleOps.dhashHammingClusters(
      Seq((1L, a), (2L, a ^ 0x1FL)).toDF("pid", "dh")).collect()
    assert(far.isEmpty, "hamming 5 must not merge at budget 4")
  }

  test("video_dhash_neardup: banding runs on the REP side (reps well under frames)") {
    // the scale contract behind the two-stage shape: stage 1's exact
    // grouping collapses the guaranteed cross-container twins, so the
    // banded pair expansion sees at most half the frame count
    val docs = Tables.documents(spark, sf0001)
    val w = lit(16L) * (lit(2L) + col("doc_id") % 3)
    val h = lit(32L)
    val frames = lit(3L) + col("doc_id") % 4
    val pids = docs.select(
        ScaleOps.videoFrameDhashes(
          ScaleOps.synthAvi(w, h, frames, col("doc_id")), 1).as("v"))
      .unionAll(docs.select(
        ScaleOps.videoFrameDhashes(
          ScaleOps.synthMp4Mjpeg(w, h, frames, col("doc_id")), 1).as("v")))
      .select(explode(col("v.dhash")).as("dh"))
    val nFrames = pids.count()
    val nReps = pids.distinct().count()
    assert(nReps * 2 <= nFrames,
      s"reps $nReps vs frames $nFrames: stage 1 must collapse the twins")
  }
}
