package graft

import graft.ingest.{Ingest, Normalize, Quotation, Schemas}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based laws (SURVEY.md §5.3): serde round trips, quotation fold
  * algebra, dedup idempotence, analytic invariants. Raw ScalaCheck
  * (Prop.forAll + Test.check) — the scalatest bridge isn't in the offline
  * dependency cache.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val genUnits = Gen.chooseNum(-1000000L, 1000000L)
  private val genNano  = Gen.chooseNum(-999999999, 999999999)

  test("quotation fold: toDouble equals units + nano/1e9 and toDecimal is lossless") {
    check(Prop.forAll(genUnits, genNano) { (u: Long, n: Int) =>
      val row = Seq((u, n)).toDF("units", "nano")
        .select(
          Quotation.toDouble(col("units"), col("nano")).as("d"),
          Quotation.toDecimal(col("units"), col("nano")).as("dec"))
        .collect().head
      val exactNanos = java.math.BigInteger.valueOf(u)
        .multiply(java.math.BigInteger.valueOf(1000000000L))
        .add(java.math.BigInteger.valueOf(n.toLong))
      row.getDouble(0) == u + n / 1e9 &&
        row.getDecimal(1).compareTo(new java.math.BigDecimal(exactNanos, 9)) == 0
    }, n = 50)
  }

  test("wire round trip: serialize then parseTable is identity on valid candles") {
    val genCandle = for {
      id  <- Gen.chooseNum(1, 9999)
      sec <- Gen.chooseNum(0L, 86399L)
      o   <- Gen.chooseNum(1, 100000).map(_ / 100.0)
      v   <- Gen.chooseNum(1L, 100000L)
    } yield (s"FIGI$id",
      java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.ofEpochSecond(1700000000L + sec, 0, java.time.ZoneOffset.UTC)),
      o, o + 1.0, o - 1.0, o + 0.5, v)

    check(Prop.forAll(Gen.listOfN(5, genCandle)) { rows =>
      val df = rows.toDF("company_id", "ts", "open", "high", "low", "close", "volume")
        .select(col("company_id"),
          date_format(col("ts"), Schemas.TsFormat).as("timestamp"),
          col("open"), col("high"), col("low"), col("close"), col("volume"))
      val back = Ingest.parseTable(Normalize.serialize(df), "candles")
      val sent = df.withColumn("timestamp",
        to_timestamp(col("timestamp"), Schemas.TsFormat))
      back.exceptAll(sent).isEmpty && sent.exceptAll(back).isEmpty
    }, n = 10)
  }

  test("salted join equals the plain join for any salt count and skew") {
    val genRows = Gen.listOfN(60, for {
      k <- Gen.frequency(7 -> Gen.const(0L), 3 -> Gen.chooseNum(1L, 4L))
      v <- Gen.chooseNum(1L, 1000L)
    } yield (k, v))
    val genSalts = Gen.chooseNum(1, 9)
    check(Prop.forAll(genRows, genSalts) { (rows, salts) =>
      val fact = rows.toDF("k", "v")
      val dim = (0L to 4L).map(k => (k, s"d$k")).toDF("k", "label")
      val plain = fact.join(dim, "k")
        .select("k", "v", "label").as[(Long, Long, String)].collect().sorted.toSeq
      val salted = graft.operators.SaltedJoin.join(fact, dim, "k", salts)
        .select("k", "v", "label").as[(Long, Long, String)].collect().sorted.toSeq
      salted == plain
    }, n = 10)
  }

  test("exact dedup is idempotent: a corpus deduped to one doc per hash has zero dupes") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = "/tmp/graft_test_dedup_idem"
    // keep exactly one doc per (source, normalized-content hash) …
    docs.withColumn("h",
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))).cast("binary")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source", "h").orderBy("doc_id")))
      .where(col("rn") === 1)
      .drop("h", "rn")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // … then Dedup.exact itself must report n_dupes = 0 everywhere, with the
    // per-source unique counts preserved from the original corpus
    val after = llm.Dedup.exact(spark, out).collect()
    assert(after.nonEmpty && after.forall(_.getAs[Long]("n_dupes") == 0L))
    val uniqueBefore = llm.Dedup.exact(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_unique")).toMap
    val docsAfter = after.map(r => r.getString(0) -> r.getAs[Long]("n_docs")).toMap
    assert(docsAfter == uniqueBefore)
  }

  test("pii redaction is idempotent and leaves no raw match behind") {
    import graft.llm.Governance
    val word = Gen.oneOf("alpha", "beta", "x9", "end.", "a+b")
    val pii = Gen.oneOf(
      Gen.chooseNum(0, 999).map(n => s"user$n@mail$n.org"),
      Gen.chooseNum(0, 254).map(n => s"192.168.$n.${254 - n}"),
      Gen.chooseNum(0L, 999999999L).map(n => f"+7999$n%06d"))
    val genLine = Gen.listOfN(8, Gen.frequency(3 -> word, 2 -> pii)).map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(20, genLine)) { lines =>
      val df = lines.toDF("line")
        .select(Governance.redactPii(col("line")).as("r1"))
        .select(col("r1"), Governance.redactPii(col("r1")).as("r2"),
          size(regexp_extract_all(col("r1"), lit(Governance.EmailRe), lit(0))).as("ne"),
          size(regexp_extract_all(col("r1"), lit(Governance.Ipv4Re), lit(0))).as("ni"),
          size(regexp_extract_all(col("r1"), lit(Governance.PhoneRe), lit(0))).as("np"))
      df.collect().forall { r =>
        r.getString(0) == r.getString(1) &&
          r.getInt(2) == 0 && r.getInt(3) == 0 && r.getInt(4) == 0
      }
    }, n = 10)
  }

  test("imbalance is bounded in [-1, 1] and volatility non-negative on real data") {
    val imb = analytics.Analytics.imbalance(spark, sfDir).collect()
    assert(imb.nonEmpty && imb.forall(r => math.abs(r.getDouble(7)) <= 1.0))
    val vol = analytics.Analytics.volatility(spark, sfDir).collect()
    assert(vol.nonEmpty && vol.forall(r => r.getDouble(4) >= 0.0))
  }

  test("exact quantiles are monotone in q and are data elements") {
    val genVals = Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L))
    check(Prop.forAll(genVals) { vs: List[Long] =>
      val df = vs.map(("g", _)).toDF("g", "v")
      val qs = Seq(0.0, 0.1, 0.5, 0.9, 1.0)
      val row = operators.ExactQuantile.groupQuantilesDisc(df, Seq("g"), "v", qs)
        .collect().head
      val picked = qs.indices.map(i => row.getLong(i + 1))
      picked.sliding(2).forall(p => p.head <= p.last) && // monotone in q
        picked.forall(vs.contains) &&                    // always a data element
        row.getLong(qs.size + 1) == vs.size.toLong       // n
    }, n = 30)
  }

  test("overlap join is symmetric: swapping sides yields the mirrored pair set") {
    val genIv = Gen.listOfN(12, for {
      k <- Gen.chooseNum(1L, 2L)
      s <- Gen.chooseNum(0L, 90L)
      len <- Gen.chooseNum(0L, 40L) // includes empty intervals
    } yield (k, s, s + len))
    check(Prop.forAll(genIv, genIv) { (ls, rs) =>
      val l = ls.zipWithIndex.map { case ((k, s, e), i) => (k, s, e, i.toLong) }
        .toDF("k", "s", "e", "lid")
      val r = rs.zipWithIndex.map { case ((k, s, e), i) => (k, s, e, i.toLong) }
        .toDF("k", "s", "e", "rid")
      val fwd = operators.RangeJoin.joinOverlap(l, r, "k", "s", "e", "s", "e", 16L)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val bwd = operators.RangeJoin.joinOverlap(r, l, "k", "s", "e", "s", "e", 16L)
        .select("rid", "lid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      fwd == bwd.map(_.swap) || { println(s"fwd=$fwd bwd=$bwd"); false }
    }, n = 15)
  }
}
