package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential tests: each native codegen'd expression must agree with the
  * composable (interpreted) formulation it replaces, including null/empty
  * edge cases — the composable path is the executable spec. */
class ExpressionSpec extends SparkSpec {

  test("graft_dot equals aggregate(zip_with(...)) on random-ish vectors") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.0, 0.0), Seq(0.0, 0.0)),
      (Seq(-1.5, 2.25, 1e10, 1e-10), Seq(2.0, -4.0, 1e-10, 1e10)))
      .toDF("a", "b")
    val composable = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(call_function("graft_dot", $"a", $"b").as("native"),
      composable.as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("graft_char_counts equals the 27x replace() formulation (incl. case folding, null, empty, non-ASCII)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Some("The quick brown Fox jumps over the LAZY dog"),
      Some(""),
      Some("    "),
      Some("ZzzAaa zzz"),
      Some("punct!?;.,:-_#42 and d1g1ts"),
      Some("café naïve 你好"), // non-ASCII counts nothing extra
      None)
      .toDF("text")
    val alpha = array((('a' to 'z').map(c => lit(c.toString)) :+ lit(" ")): _*)
    val t = lower($"text")
    val composable = transform(alpha,
      c => (length(t) - length(call_function("replace", t, c))).cast("long"))
    val rows = df.select($"text", call_function("graft_char_counts", $"text").as("native"),
      composable.as("ref")).collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) {
        // native is null-intolerant (NULL in, NULL out); the composable
        // transform over a literal alphabet degrades to [null x 27] instead
        assert(r.isNullAt(1), "graft_char_counts(NULL) must be NULL")
      } else assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"mismatch: $r")
    }
  }

  test("graft_dot null propagation") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
    assert(df.select(call_function("graft_dot", $"a", $"b")).head().isNullAt(0))
  }

  test("graft_minhash is a well-formed MinHash (order-invariant, dup-invariant, monotone under containment)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("c d e", "a b c", "b c d")),          // same set, different order
      (3L, Seq("a b c", "a b c", "b c d", "c d e")), // same set with dups
      (4L, Seq("a b c", "b c d"))                    // subset
    ).toDF("id", "sh")
    val sigs = df.select($"id", DedupFunctions.minhashSignature($"sh", 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) === sigs(3L))
    // every subset minimum is >= the superset minimum
    sigs(4L).zip(sigs(1L)).foreach { case (sub, sup) => assert(sub >= sup) }
    assert(sigs(1L).distinct.size > 1) // not degenerate
  }

  test("graft_minhash null on empty array, null on null") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some(Seq.empty[String])), (2L, None))
      .toDF("id", "sh")
    val rows = df.select(DedupFunctions.minhashSignature($"sh", 4)).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("graft_simhash equals the composable md5-nibble formulation") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Seq("alpha", "beta", "gamma", "delta"),
      Seq("alpha"),
      Seq("x", "x", "y"),
      (1 to 50).map(i => s"tok$i"))
      .toDF("toks")
    val rows = df.select(
      DedupFunctions.simhash($"toks").as("native"),
      DedupFunctions.simhashOfHashes(DedupFunctions.tokenHashes($"toks")).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // empty array: all-bit-set by tie rule (2*0 >= 0) in both formulations
    val empty = Seq(Seq.empty[String]).toDF("toks").select(
      DedupFunctions.simhash($"toks").as("native"),
      DedupFunctions.simhashOfHashes(DedupFunctions.tokenHashes($"toks")).as("ref"))
      .head()
    assert(empty.getLong(0) === empty.getLong(1))
  }

  test("graft_simhash width dial: 16-bit key is the top 16 bits of the 32-bit key") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Seq("alpha", "beta", "gamma", "delta"),
      Seq("alpha"),
      Seq("x", "x", "y"),
      (1 to 50).map(i => s"tok$i"))
      .toDF("toks")
    val rows = df.select(
      DedupFunctions.simhash($"toks").as("h16"),
      DedupFunctions.simhashWide($"toks", 16).as("w16"),
      DedupFunctions.simhashWide($"toks", 32).as("w32"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) === r.getLong(1), "width 16 must equal the fixed-16 expression")
      assert(r.getLong(0) === (r.getLong(2) >> 16),
        "widening appends LOW bits — wide buckets refine narrow ones, never re-mix them")
    }
  }

  test("pairExpand produces ordered pairs") {
    val s = spark
    import s.implicits._
    val df = Seq(Seq(3L, 5L, 9L)).toDF("ids")
    val pairs = df.select(explode(DedupFunctions.pairExpand($"ids")).as("p"))
      .select($"p.a", $"p.b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((3L, 5L), (3L, 9L), (5L, 9L)))
  }

  test("graft_winnow equals a naive O(n·k·w) reference; coverage + shift invariance hold") {
    val s = spark
    import s.implicits._
    val K = 8; val W = 4; val M = 1 << 20

    // independent reference: positional polynomial hash + per-window
    // rightmost-argmin, no rolling update, no incremental selection
    def ref(text: String): Seq[Long] = {
      val n = text.length; val npos = n - K + 1
      if (npos < W) return Seq.empty
      val hs = (0 until npos).map { i =>
        (0 until K).foldLeft(0L)((h, j) => (h * 31 + text.charAt(i + j)) % M)
      }
      val sel = (0 to npos - W).map { t =>
        (t until t + W).reduceLeft((b, u) => if (hs(u) <= hs(b)) u else b)
      }
      sel.map(hs).distinct.sorted
    }

    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa",          // all-equal hashes: rightmost ties
      "short",                         // no gram window at all
      "", "exactly11ch",               // empty / boundary length w+k-1
      "abcdefghijklmnopqrstuvwxyz0123456789",
      "ab" * 40)                       // period-2 repetition
    for (t <- texts) {
      val got = Seq(t).toDF("t")
        .select(call_function("graft_winnow", $"t", lit(K), lit(W)))
        .head().getSeq[Long](0)
      assert(got === ref(t), s"text='$t'")
    }

    // winnowing guarantee: a shared substring of length >= w+k-1 shares a
    // fingerprint regardless of position shift
    val shared = "zqxjkvbwpfmg9317dlroca"  // 22 chars >= 11
    val a = s"AAAA $shared BBBB"
    val b = s"completely different preamble text $shared and different tail"
    val fpA = Seq(a).toDF("t").select(call_function("graft_winnow", $"t", lit(K), lit(W)))
      .head().getSeq[Long](0).toSet
    val fpB = Seq(b).toDF("t").select(call_function("graft_winnow", $"t", lit(K), lit(W)))
      .head().getSeq[Long](0).toSet
    assert((fpA & fpB).nonEmpty)
  }

  test("graft_intersect_size equals size(array_intersect) on sorted long arrays") {
    val s = spark
    import s.implicits._
    val cases: Seq[(Seq[Long], Seq[Long])] = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(), Seq(1L, 2L)),
      (Seq(5L), Seq(5L)),
      (Seq(1L, 3L, 5L, 7L), Seq(2L, 4L, 6L)),
      ((1L to 100L), (50L to 150L)) match { case (a, b) => (a.toSeq, b.toSeq) })
    for ((a, b) <- cases) {
      val row = Seq((a, b)).toDF("a", "b")
        .select(call_function("graft_intersect_size", $"a", $"b").as("native"),
          size(array_intersect($"a", $"b")).cast("long").as("ref"))
        .head()
      assert(row.getLong(0) === row.getLong(1), s"a=$a b=$b")
    }
    // null propagation
    val df = Seq((Some(Seq(1L)), None: Option[Seq[Long]])).toDF("a", "b")
    assert(df.select(call_function("graft_intersect_size", $"a", $"b")).head().isNullAt(0))
  }

  test("graft_intersect_size rejects arrays with nullable elements at analysis time") {
    val s = spark
    import s.implicits._
    // Option elements => ArrayType(LongType, containsNull = true); getLong is
    // undefined on null entries, so the type check must fail closed instead
    // of silently corrupting the count.
    val df = Seq((Seq(Some(1L), None), Seq(Some(1L)))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(call_function("graft_intersect_size", $"a", $"b")).head()
    }
    assert(e.getMessage.contains("non-null elements"), e.getMessage)
    // and the null-free path still works when elements are provably non-null
    // (array_compact narrows containsNull to false; a lambda filter does not)
    val ok = df.select(call_function("graft_intersect_size",
      array_compact($"a"), array_compact($"b")).as("n")).head()
    assert(ok.getLong(0) === 1L)
  }

  test("graft_winnow wrong arity from SQL fails with the usage message, not IndexOutOfBounds") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_winnow('abcdefghijkl')").head()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("graft_winnow(text, k, w)"))),
      s"expected the usage message in the failure chain, got: $e")
    assert(!chain(e).exists(_.isInstanceOf[IndexOutOfBoundsException]))
  }

  test("graft_winnow positions are UTF-16 code units — divergence from character-indexed oracles is confined to non-BMP input") {
    val s = spark
    import s.implicits._
    val K = 8; val W = 4; val M = 1 << 20
    // same naive reference as above — charAt-based, i.e. UTF-16 code units
    def ref(text: String): Seq[Long] = {
      val n = text.length; val npos = n - K + 1
      if (npos < W) return Seq.empty
      val hs = (0 until npos).map { i =>
        (0 until K).foldLeft(0L)((h, j) => (h * 31 + text.charAt(i + j)) % M)
      }
      val sel = (0 to npos - W).map { t =>
        (t until t + W).reduceLeft((b, u) => if (hs(u) <= hs(b)) u else b)
      }
      sel.map(hs).distinct.sorted
    }
    // a supplementary-plane char (🚀 = 2 code units): the native expression
    // matches the UTF-16 reference exactly — the q53 ORACLE (DuckDB ascii()
    // by character position) would NOT. The corpus-side BMP-only convention
    // that keeps both in sync is pinned in TextQueriesSpec.
    val nonBmp = "prefix 🚀 and some more text after the rocket"
    val got = Seq(nonBmp).toDF("t")
      .select(call_function("graft_winnow", $"t", lit(K), lit(W)))
      .head().getSeq[Long](0)
    assert(got === ref(nonBmp))
  }

  test("graft_repetition equals a naive Scala multiset reference (incl. ties, empties, null skip)") {
    val s = spark
    import s.implicits._
    def ref(toks: Seq[String]): (Long, Long, Option[String], Long, Option[String], Long, Long, Long) = {
      def top(ms: Seq[String]): (Option[String], Long) =
        if (ms.isEmpty) (None, 0L)
        else {
          val counts = ms.groupBy(identity).view.mapValues(_.size).toMap
          val mx = counts.values.max
          // ties -> lexicographically smallest
          (Some(counts.filter(_._2 == mx).keys.min), mx.toLong)
        }
      val bgs = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val tgs = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      val (tt, tc) = top(toks)
      val (bt, bc) = top(bgs)
      (toks.size.toLong, toks.distinct.size.toLong, tt, tc, bt, bc,
        tgs.size.toLong, tgs.distinct.size.toLong)
    }
    val cases = Seq(
      Seq("a", "b", "a", "b", "a"),          // bigram ties: "a b" x2 vs "b a" x2
      Seq("z", "y", "z", "y"),               // token tie -> "y" wins lexicographically
      Seq("solo"),
      Seq("x", "x", "x", "x"),
      Seq.empty[String],
      Seq("p", "q"),
      (1 to 40).map(i => s"t${i % 7}"))
    for (toks <- cases) {
      val r = Seq(toks).toDF("toks")
        .select(call_function("graft_repetition", $"toks").as("r"))
        .select($"r.*").head()
      val (n, nd, tt, tc, bt, bc, ntg, ndtg) = ref(toks)
      assert(r.getLong(0) === n, s"n_tokens $toks")
      assert(r.getLong(1) === nd, s"n_distinct $toks")
      assert(Option(r.getString(2)) === tt, s"top_tok $toks")
      assert(r.getLong(3) === tc, s"top_tok_cnt $toks")
      assert(Option(r.getString(4)) === bt, s"top_bigram $toks")
      assert(r.getLong(5) === bc, s"top_bigram_cnt $toks")
      assert(r.getLong(6) === ntg, s"n_trigrams $toks")
      assert(r.getLong(7) === ndtg, s"n_distinct_trigrams $toks")
    }
    // null elements are skipped, not counted and not crashed on
    val withNull = Seq((Seq(Some("a"), None, Some("a"), Some("b")))).toDF("toks")
      .select(call_function("graft_repetition", $"toks").as("r")).select($"r.*").head()
    assert(withNull.getLong(0) === 3L)
    assert(withNull.getString(2) === "a")
    assert(withNull.getString(4) === "a a") // null gap: bigrams re-pair across it
  }

  test("shingles (native) equals both the composable formulation and plain Scala") {
    val s = spark
    import s.implicits._
    for (text <- Seq("a b c d e", "a", "", "x y", "a a a a", "p q r",
                     "é 中 文 x y", "a b a b a b")) {
      val df = Seq(text).toDF("t")
        .select(TextFunctions.tokens($"t").as("toks"))
      val got = df.select(TextFunctions.shingles($"toks", 3)).head().getSeq[String](0)
      val ref = df.select(TextFunctions.shinglesComposable($"toks", 3)).head().getSeq[String](0)
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val want = if (toks.size < 3) Seq.empty
                 else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      assert(got === want, s"text='$text'")
      assert(got === ref, s"native vs composable, text='$text'")
    }
  }

  test("graft_md5_lanes equals the composable conv(substring(md5)) formulation") {
    val s = spark
    import s.implicits._
    val H = 64
    val df = Seq("alpha beta gamma", "", "中文 multibyte ȼ", "x", "0:edge", "a b")
      .toDF("g")
    val composable = array((0 until H).map(j =>
      conv(substring(md5(concat(lit(s"$j:"), $"g")), 1, 15), 16, 10).cast("long")): _*)
    val rows = df.select(
      call_function("graft_md5_lanes", $"g", lit(H)).as("native"),
      composable.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
    // null propagates, not throws
    val n = Seq[Option[String]](None).toDF("g")
      .select(call_function("graft_md5_lanes", $"g", lit(4))).head()
    assert(n.isNullAt(0))
  }
}
