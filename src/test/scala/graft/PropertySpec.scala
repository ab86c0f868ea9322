package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** Property-based pins for the two subtlest kernels: the BPE
  * boundary-correct merge apply (vs a direct recursive reference
  * implementation) and the AsOfJoin composition (vs a brute-force
  * per-row scan). Examples catch the cases we thought of; these catch
  * the ones we didn't.
  */
class PropertySpec extends AnyFunSuite {

  // seeded generation: deterministic across runs (no RNG flake), broad
  // enough to hit the boundary cases examples miss
  private def rng(seed: Long) = new scala.util.Random(seed)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- BPE merge apply vs the textbook greedy-left merge

  /** Reference Sennrich merge: walk symbols left to right, replacing each
    * non-overlapping adjacent (a, b) occurrence with the merged symbol. */
  private def refMerge(syms: List[String], a: String, b: String, m: String): List[String] =
    syms match {
      case x :: y :: rest if x == a && y == b => m :: refMerge(rest, a, b, m)
      case x :: rest                          => x :: refMerge(rest, a, b, m)
      case Nil                                => Nil
    }

  /** The Scala twin of TextQueries.applyMergeSql (identical padded
    * replace; equality with the SQL form is pinned by example in
    * PipelineOpsSpec and by the oracle gate). */
  private def applyMerge(s: String, pr: String, m: String): String =
    (" " + s.replace(" ", "  ") + " ")
      .replace(" " + pr.replace(" ", "  ") + " ", " " + m + " ")
      .replace("  ", " ").trim

  test("BPE merge apply equals the textbook greedy-left merge on random symbol strings") {
    val r = rng(42)
    // tiny alphabet on purpose: maximizes suffix collisions ("ab" vs "b")
    // and consecutive pair runs — the two failure modes of substring merge
    def symbol() = (1 to (1 + r.nextInt(3))).map(_ => ('a' + r.nextInt(2)).toChar).mkString
    (1 to 500).foreach { _ =>
      val syms = List.fill(r.nextInt(13))(symbol())
      val (a, b) = (symbol(), symbol())
      val want = refMerge(syms, a, b, a + b)
      val got = applyMerge(syms.mkString(" "), s"$a $b", a + b)
      assert(got == want.mkString(" "),
        s"syms=$syms pair=($a,$b): got '$got', want '${want.mkString(" ")}'")
    }
  }

  // ---- AsOfJoin vs brute force

  test("AsOfJoin equals the brute-force latest-at-or-before scan on random tables") {
    import spark.implicits._
    val r = rng(7)
    def rows(n: Int) = List.fill(n)((r.nextInt(4).toLong, r.nextInt(21).toLong))
    (1 to 12).foreach { _ =>
      val leftRows = rows(1 + r.nextInt(15))
      val rightRows = rows(r.nextInt(16))
      val left = leftRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("lid", "key", "lts")
      val right = rightRows.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong * 10 + t) }.toDF("key", "rts", "payload")
      val got = AsOfJoin.join(left, right, "key", "lts", "rts",
          Seq("payload"), tieBreak = Some("payload"))
        .select("lid", "asof_payload").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      leftRows.zipWithIndex.foreach { case ((k, t), i) =>
        // latest right at-or-before; duplicate (key, ts) resolved by the
        // LAST payload in tie-break order
        val want = rightRows.zipWithIndex
          .map { case ((rk, rt), j) => (rk, rt, j.toLong * 10 + rt) }
          .filter { case (rk, rt, _) => rk == k && rt <= t }
          .sortBy { case (_, rt, p) => (rt, p) }
          .lastOption.map(_._3)
        assert(got(i.toLong) == want, s"left row $i (key=$k, ts=$t)")
      }
    }
  }

  test("backward AsOfJoin with tolerance equals the brute-force latest-within-gap scan") {
    import spark.implicits._
    val r = rng(23)
    def rows(n: Int) = List.fill(n)((r.nextInt(4).toLong, r.nextInt(21).toLong))
    (1 to 12).foreach { _ =>
      val leftRows = rows(1 + r.nextInt(15))
      val rightRows = rows(r.nextInt(16))
      val gap = r.nextInt(8).toLong
      val left = leftRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("lid", "key", "lts")
      val right = rightRows.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong * 100 + t) }.toDF("key", "rts", "payload")
      val got = AsOfJoin.join(left, right, "key", "lts", "rts",
          Seq("payload"), tieBreak = Some("payload"), tolerance = Some(gap))
        .select("lid", "asof_payload").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      leftRows.zipWithIndex.foreach { case ((k, t), i) =>
        // latest right at-or-before within the gap — the gate must use
        // the ABSOLUTE distance (here the match sits BELOW the left ts)
        val want = rightRows.zipWithIndex
          .map { case ((rk, rt), j) => (rk, rt, j.toLong * 100 + rt) }
          .filter { case (rk, rt, _) => rk == k && rt <= t && t - rt <= gap }
          .sortBy { case (_, rt, p) => (rt, p) }
          .lastOption.map(_._3)
        assert(got(i.toLong) == want, s"left row $i (key=$k, ts=$t, gap=$gap)")
      }
    }
  }

  test("forward AsOfJoin with tolerance equals the brute-force earliest-within-gap scan") {
    import spark.implicits._
    val r = rng(19)
    def rows(n: Int) = List.fill(n)((r.nextInt(4).toLong, r.nextInt(21).toLong))
    (1 to 12).foreach { _ =>
      val leftRows = rows(1 + r.nextInt(15))
      val rightRows = rows(r.nextInt(16))
      val gap = r.nextInt(8).toLong
      val left = leftRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("lid", "key", "lts")
      val right = rightRows.zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong * 100 + t) }.toDF("key", "rts", "payload")
      val got = AsOfJoin.join(left, right, "key", "lts", "rts",
          Seq("payload"), tieBreak = Some("payload"),
          direction = "forward", tolerance = Some(gap))
        .select("lid", "asof_payload").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      leftRows.zipWithIndex.foreach { case ((k, t), i) =>
        // earliest right at-or-after within the gap; duplicate (key, ts)
        // resolved by the FIRST payload in tie-break order
        val want = rightRows.zipWithIndex
          .map { case ((rk, rt), j) => (rk, rt, j.toLong * 100 + rt) }
          .filter { case (rk, rt, _) => rk == k && rt >= t && rt - t <= gap }
          .sortBy { case (_, rt, p) => (rt, p) }
          .headOption.map(_._3)
        assert(got(i.toLong) == want, s"left row $i (key=$k, ts=$t, gap=$gap)")
      }
    }
  }

  // ---- PDF crypto primitives: decrypt ∘ encrypt = id across every
  // ---- cipher family and arbitrary payloads/object ids

  test("PdfCrypto round-trip: RC4, AES-128 and AES-256 decrypt what they encrypt, for arbitrary payloads") {
    import graft.ingest.PdfCrypto
    val r = rng(0xc0ffee)
    for (trial <- 0 until 50) {
      val data = Array.fill(r.nextInt(600))(r.nextInt(256).toByte)
      val obj = r.nextInt(100000)
      val gen = r.nextInt(10)
      // RC4 under an Algorithm-2 key (5..16 bytes via /Length and /R)
      val o = Array.fill(32)(r.nextInt(256).toByte)
      val id0 = Array.fill(16)(r.nextInt(256).toByte)
      val rc4Key = PdfCrypto.fileKey(o, r.nextInt(), id0, r = 3, lengthBits = 40 + 8 * r.nextInt(12))
      assert(PdfCrypto.decrypt(rc4Key, obj, gen, aes = false,
        PdfCrypto.encrypt(rc4Key, obj, gen, aes = false, data)).sameElements(data),
        s"RC4 round-trip failed at trial $trial (${data.length} bytes)")
      // AES-128 under the 16-byte Algorithm-2 key (per-object derivation)
      val aesKey = PdfCrypto.fileKey(o, r.nextInt(), id0, r = 4, lengthBits = 128)
      assert(PdfCrypto.decrypt(aesKey, obj, gen, aes = true,
        PdfCrypto.encrypt(aesKey, obj, gen, aes = true, data)).sameElements(data),
        s"AES-128 round-trip failed at trial $trial (${data.length} bytes)")
      // AES-256 under a raw 32-byte file key (V5: no per-object derivation)
      val k256 = Array.fill(32)(r.nextInt(256).toByte)
      assert(PdfCrypto.decrypt(k256, obj, gen, aes = true,
        PdfCrypto.encrypt(k256, obj, gen, aes = true, data)).sameElements(data),
        s"AES-256 round-trip failed at trial $trial (${data.length} bytes)")
    }
  }

  test("AES-256 user-key entry inverts: the /UE written for a key recovers that key, for arbitrary passwords") {
    import graft.ingest.PdfCrypto
    val r = rng(0xfeed)
    for (trial <- 0 until 10) {
      val pw = Array.fill(r.nextInt(20))(r.nextInt(256).toByte)
      val fileKey = Array.fill(32)(r.nextInt(256).toByte)
      val vsalt = Array.fill(8)(r.nextInt(256).toByte)
      val ksalt = Array.fill(8)(r.nextInt(256).toByte)
      for (rev <- Seq(5, 6)) {
        val u = PdfCrypto.aes256Hash(rev, pw, vsalt) ++ vsalt ++ ksalt
        val ue = PdfCrypto.aes256UserKeyEntry(rev, pw, u, fileKey)
        assert(PdfCrypto.checkUserAes256(rev, pw, u), s"/R $rev /U self-check failed (trial $trial)")
        assert(!PdfCrypto.checkUserAes256(rev, pw :+ 1.toByte, u),
          s"/R $rev accepted a wrong password (trial $trial)")
        assert(PdfCrypto.aes256FileKey(rev, pw, u, ue).sameElements(fileKey),
          s"/R $rev file-key recovery failed (trial $trial)")
      }
    }
  }

  test("SignLshBuckets equals a scala reference on random vectors, hyperplanes, and degenerate dims") {
    import org.apache.spark.sql.functions.{col, typedlit}
    import graft.functions.VectorFunctions.signLshBuckets
    import spark.implicits._
    // scala reference: same index-order double accumulation as DotProduct,
    // dimension mismatch -> dot 0.0 -> bit unset
    def ref(v: Seq[Float], hps: Seq[Seq[Float]], tables: Int): Seq[Long] = {
      val perTable = hps.size / tables
      (0 until tables).map { t =>
        (0 until perTable).foldLeft(0L) { (acc, i) =>
          val h = hps(t * perTable + i)
          val dot =
            if (v.isEmpty || h.size != v.size) 0.0
            else v.indices.foldLeft(0.0)((d, k) => d + v(k).toDouble * h(k).toDouble)
          if (dot > 0.0) acc | (1L << i) else acc
        }
      }
    }
    val r = rng(0x51b5L)
    (0 until 20).foreach { trial =>
      val dim = Seq(0, 1, 3, 64)(trial % 4) // incl. empty vector
      val tables = 1 + trial % 4
      val perTable = 1 + trial % 8
      val hps: Seq[Seq[Float]] = Seq.fill(tables * perTable)(
        // every few trials a hyperplane of the WRONG dimension (guard path)
        if (trial % 5 == 4) Seq.fill(dim + 1)(r.nextFloat() - 0.5f)
        else Seq.fill(dim)(r.nextFloat() - 0.5f))
      val vecs: Seq[Seq[Float]] = Seq.fill(6)(Seq.fill(dim)(r.nextFloat() - 0.5f))
      val got = vecs.zipWithIndex.toDF("v", "i")
        .select(col("i"), signLshBuckets(col("v"), typedlit(hps), tables).as("b"))
        .collect().map(row => row.getInt(0) -> row.getSeq[Long](1)).toMap
      vecs.zipWithIndex.foreach { case (v, i) =>
        assert(got(i) == ref(v, hps, tables),
          s"trial $trial vec $i: got ${got(i)}, want ${ref(v, hps, tables)}")
      }
    }
  }

  // ---- AGL glyph-name resolution (Type3 / re-encoded simple fonts)

  test("AdobeGlyphs: every ASCII name round-trips; uni/u forms agree with Character.toChars") {
    import graft.ingest.AdobeGlyphs
    // the encode side (fixture) and decode side (extractor) must be exact
    // inverses over the whole printable-ASCII table
    AdobeGlyphs.asciiNames.foreach { case (cp, name) =>
      assert(AdobeGlyphs.unicode(name).contains(cp.toChar.toString),
        s"name $name does not round-trip to U+$cp")
    }
    val r = rng(0xA61L)
    (0 until 200).foreach { _ =>
      val cp = r.nextInt(0xFFFF + 1)
      val viaUni = AdobeGlyphs.unicode(f"uni$cp%04X")
      assert(viaUni.contains(cp.toChar.toString), f"uni$cp%04X")
      // uXXXX[X..] covers astral planes through surrogate pairs
      val astral = 0x10000 + r.nextInt(0x10000)
      assert(AdobeGlyphs.unicode(f"u$astral%05X")
        .contains(new String(Character.toChars(astral))), f"u$astral%05X")
    }
    // malformed names resolve to None, never throw
    for (bad <- Seq("uni", "uniZZZZ", "u12", "g76", "uni123", "f_f_i", ""))
      assert(AdobeGlyphs.unicode(bad).isEmpty, s"'$bad' should not resolve")
  }

  test("parseDifferences: random interleavings of restarts and names replay exactly") {
    import graft.ingest.AdobeGlyphs
    val ex = graft.ingest.CharPdfExtractor()
    val r = rng(0xD1FFL)
    (0 until 50).foreach { trial =>
      // build a random Differences array and its expected map in lockstep
      val names = AdobeGlyphs.asciiNames.values.toVector.sorted
      var code = 0
      val expect = Map.newBuilder[Int, String]
      val toks = Seq.newBuilder[String]
      (0 until 1 + r.nextInt(30)).foreach { _ =>
        if (r.nextBoolean()) { code = r.nextInt(256); toks += code.toString }
        else {
          val useOpaque = r.nextInt(10) == 0
          val n = if (useOpaque) s"g${r.nextInt(99)}" else names(r.nextInt(names.size))
          toks += s"/$n"
          AdobeGlyphs.unicode(n).foreach(u => expect += code -> u)
          code += 1
        }
      }
      // later entries overwrite earlier ones for the same code, as in the
      // builder's Map semantics
      val got = ex.parseDifferences(toks.result().mkString(" "))
      assert(got == expect.result().toMap, s"trial $trial")
    }
  }

  // ---- B9 chunk accumulator on adversarial text

  test("TextChunker: adversarial unicode never throws; hardMax, non-blank and index invariants hold") {
    import graft.ingest.TextChunker
    val fz = new scala.util.Random(2024)
    def randomText(): String = {
      val n = fz.nextInt(6000)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        fz.nextInt(6) match {
          case 0 => sb.append(fz.nextPrintableChar())
          case 1 => sb.append(" .?!\n\t".charAt(fz.nextInt(6)))
          case 2 => sb.append((0x4e00 + fz.nextInt(100)).toChar) // CJK, no sentence marks
          case 3 => sb.append("🎉")                    // surrogate pair
          case 4 => sb.append(fz.nextInt(0x20).toChar)           // control chars incl NUL
          case 5 => sb.append('x')
        }
      }
      sb.toString
    }
    (0 until 300).foreach { trial =>
      val t = randomText()
      val cs = try TextChunker.chunk(t)
      catch { case e: Throwable => fail(s"chunk threw on trial $trial: $e") }
      cs.zipWithIndex.foreach { case (c, i) =>
        assert(c.chunkIdx == i, s"trial $trial: indices must be dense from 0")
        assert(c.text.trim.nonEmpty, s"trial $trial: blank chunk emitted")
        assert(c.text.length <= 1500,
          s"trial $trial: chunk ${c.chunkIdx} exceeds hardMax (${c.text.length})")
      }
    }
    // degenerate shapes the random mix can miss
    assert(TextChunker.chunk(null).isEmpty)
    assert(TextChunker.chunk("   \n\t  ").isEmpty)
    assert(TextChunker.chunk(".").size <= 1)
    assert(TextChunker.chunk(" " * 3000).forall(_.text.length <= 1500))
  }

  // ---- word-entropy arithmetic (the micro-floored -p·log2 p sum)

  test("word entropy micro-sum is bounded by log2(n_tokens) and exact on uniform docs") {
    val r = rng(0xE27L)
    def hMicro(toks: Seq[String]): Long = {
      val n = toks.size.toDouble
      toks.groupBy(identity).values.map { g =>
        val p = g.size / n
        math.floor(p * (-math.log(p) / math.log(2.0)) * 1e6).toLong
      }.sum
    }
    (0 until 100).foreach { _ =>
      val vocab = 1 + r.nextInt(12)
      val toks = Seq.fill(1 + r.nextInt(200))(s"w${r.nextInt(vocab)}")
      val h = hMicro(toks)
      assert(h >= 0, "entropy must be non-negative")
      // H <= log2(#distinct) <= log2(n); micro-floor only shrinks it
      val bound = math.ceil(math.log(toks.distinct.size.max(1)) / math.log(2.0) * 1e6).toLong
      assert(h <= bound, s"H=$h exceeds log2(distinct)=$bound")
    }
    (1 to 16).foreach { k =>
      val uniform = (0 until k).map(i => s"w$i")
      val h = hMicro(uniform)
      val exact = math.log(k) / math.log(2.0) * 1e6
      assert(math.abs(h - exact) <= k, s"uniform k=$k: $h vs $exact")
    }
  }
}
