package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §5.4 property tests: structural invariants that must hold for ANY
  * event set. Cases are generated from fixed seeds (no scalatest/scalacheck
  * bridge in the offline dep set, so generation is hand-rolled but still
  * covers many random shapes deterministically). */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def genEvents(seed: Int): Seq[(Long, java.sql.Timestamp, Long, Double)] = {
    val rnd = new scala.util.Random(seed)
    val n = 1 + rnd.nextInt(60)
    var t = 1704067200000L
    (0 until n).map { i =>
      t += (rnd.nextInt(120) * 60L + rnd.nextInt(60)) * 1000L
      (i.toLong, new java.sql.Timestamp(t), rnd.nextInt(4).toLong,
        rnd.nextInt(10000) / 100.0)
    }
  }

  test("sessionize invariants hold across 20 generated event sets") {
    (1 to 20).foreach { seed =>
      val df = genEvents(seed).toDF("event_id", "ts", "user_id", "value")
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val tagged = df
        .withColumn("prev_ts", lag($"ts", 1).over(w))
        .withColumn("gap", $"ts".cast("double") - $"prev_ts".cast("double"))
        .withColumn("new_session",
          when($"prev_ts".isNull || $"gap" > 1800.0, 1L).otherwise(0L))
        .withColumn("session_seq", sum($"new_session").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .collect()
      // a row opens a session iff it has no predecessor or gap > 30min
      tagged.foreach { r =>
        val gap = Option(r.getAs[Any]("gap")).map(_.asInstanceOf[Double])
        assert((r.getAs[Long]("new_session") == 1L) == gap.forall(_ > 1800.0),
          s"seed=$seed row=$r")
      }
      // session_seq advances by 0 or 1 per user in event order
      tagged.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
        val seqs = rs.sortBy(r => (r.getAs[java.sql.Timestamp]("ts").getTime,
          r.getAs[Long]("event_id"))).map(_.getAs[Long]("session_seq")).toSeq
        assert(seqs.headOption.forall(_ == 1L), s"seed=$seed")
        assert(seqs.zip(seqs.drop(1)).forall { case (a, b) => b == a || b == a + 1 },
          s"seed=$seed seqs=$seqs")
      }
    }
  }

  test("connectedComponents == brute-force union-find on random graphs") {
    // The star algorithm behind graph_cc_fixpoint / the dedup cluster
    // family, pinned against an independent sequential oracle on many
    // random shapes (chains, stars, cliques, dust all arise): for ANY
    // edge set, every node must land on exactly its component's minimum.
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(40 + seed)
      val n = 4 + rnd.nextInt(14)
      val edges = (0 until (1 + rnd.nextInt(2 * n))).map { _ =>
        val a = rnd.nextInt(n); val b = rnd.nextInt(n); (a.toLong, b.toLong)
      }.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      if (edges.nonEmpty) {
        // sequential union-find oracle
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int =
          if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = nodes.map { u =>
          // min node id of u's component, restricted to edge endpoints
          val root = find(u.toInt)
          u -> nodes.filter(v => find(v.toInt) == root).min
        }.toMap
        val got = graft.operators.DedupOps.connectedComponents(
            edges.toDF("doc_a", "doc_b"))
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"seed=$seed edges=$edges got=$got want=$want")
      }
    }
  }

  test("dedup is idempotent and keeps one row per key") {
    (1 to 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val keys = Seq.fill(1 + rnd.nextInt(50))(rnd.nextInt(20).toLong)
      val df = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "seq")
      val once = df.dropDuplicates("k")
      assert(once.count() == keys.distinct.size.toLong, s"seed=$seed")
      assert(once.dropDuplicates("k").count() == once.count(), s"seed=$seed")
    }
  }

  test("final running window sum equals group total per user") {
    (1 to 10).foreach { seed =>
      val df = genEvents(seed).toDF("event_id", "ts", "user_id", "value")
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      val lastRunning = df
        .withColumn("run", sum(Dsl.dec($"value")).over(w).cast("double"))
        .withColumn("rn", row_number().over(Window.partitionBy($"user_id")
          .orderBy($"ts".desc, $"event_id".desc)))
        .filter($"rn" === 1).select($"user_id", $"run")
      val grouped = df.groupBy($"user_id").agg(Dsl.dsum($"value").as("total"))
      val mismatches = lastRunning.join(grouped, "user_id")
        .filter($"run" =!= $"total").count()
      assert(mismatches == 0, s"seed=$seed")
    }
  }

  test("union/except algebra: (a union b) except b == a when disjoint") {
    val a = (1 to 50).map(i => (i.toLong, "a")).toDF("id", "tag")
    val b = (100 to 140).map(i => (i.toLong, "b")).toDF("id", "tag")
    val roundTrip = a.unionByName(b).except(b)
    assert(roundTrip.orderBy($"id").collect().toSeq ==
      a.orderBy($"id").collect().toSeq)
  }

  test("dedup clusters: edge endpoints co-clustered, label = component min") {
    val labels = SparkEntry.queries("llm_dedup_clusters")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cluster label never exceeds the member id (it is a component MIN)
    assert(labels.forall { case (doc, label) => label <= doc })
    // every near-dup pair (the jaccard>=0.5 edges, recomputed via the
    // oracled top-50 report) shares a cluster
    val edges = SparkEntry.queries("llm_ngram_jaccard")(spark, sf001)
      .filter($"jaccard" >= 0.5).select($"doc_a", $"doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    edges.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"edge ($a,$b) split across clusters")
    }
    // a label is itself a member of its own cluster (canonical rep exists)
    labels.values.toSet.foreach((l: Long) => assert(labels(l) == l))
  }

  test("sequence packing: spans are contiguous and non-overlapping per lang") {
    val rows = SparkEntry.queries("llm_pack_sequences")(spark, sf001)
      .select($"lang", $"doc_id", $"n_tokens", $"start_tok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val sorted = docs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, n1, s1), (_, d2, _, s2)) =>
          assert(s2 == s1 + n1, s"$lang: doc $d2 span not contiguous")
        case _ => ()
      }
      assert(sorted.head._4 == 0L, s"$lang: first span must start at 0")
    }
  }

  test("stratified sample takes exactly ceil(25%) of every stratum") {
    val docs = graft.T(spark, sf001, "documents")
    val perLang = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = SparkEntry.queries("llm_stratified_sample")(spark, sf001)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(sampled(lang) == (n + 3) / 4, s"$lang: $n -> ${sampled.get(lang)}")
    }
  }

  test("moment-formula skew/kurtosis match Spark's built-ins within 1e-6") {
    val got = SparkEntry.queries("agg_moments_skew")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    val builtin = graft.T(spark, sf001, "events")
      .select($"event_type", floor($"value" * 10000).cast("long").as("vq"))
      .groupBy($"event_type")
      .agg(skewness($"vq").as("s"), kurtosis($"vq").as("k"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    builtin.foreach { case (t, (s, k)) =>
      assert(math.abs(got(t)._1 - s) < 1e-6, s"$t skew: ${got(t)._1} vs $s")
      assert(math.abs(got(t)._2 - k) < 1e-6, s"$t kurt: ${got(t)._2} vs $k")
    }
  }

  test("approx_percentile tracks the exact percentile within 5%") {
    val approx = SparkEntry.queries("agg_approx_percentile")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = graft.T(spark, sf001, "events").groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("m"),
        expr("percentile(value, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (t, (m, p95)) =>
      assert(math.abs(approx(t)._1 - m) <= 0.05 * math.max(1.0, m.abs), s"$t median")
      assert(math.abs(approx(t)._2 - p95) <= 0.05 * math.max(1.0, p95.abs), s"$t p95")
    }
  }

  test("misra-gries: true heavy hitters always survive the candidate trim") {
    // 3000 hot + 1500 warm + ~5500 cold over 100 cold keys; k=9 keeps any
    // item with freq > n/10 = 1000 regardless of partitioning.
    val rows = Seq.fill(3000)("hot") ++ Seq.fill(1500)("warm") ++
      (0 until 5500).map(i => s"cold_${i % 100}")
    val df = rows.toDF("item").repartition(7) // force cross-partition merges
    val cands = df
      .agg(graft.functions.MisraGries.mgCandidates(spark, 9)($"item").as("c"))
      .head().getSeq[String](0).toSet
    assert(cands.contains("hot") && cands.contains("warm"),
      s"guaranteed heavy hitters missing from $cands")
    assert(cands.size <= 9, s"sketch must hold at most k candidates: $cands")
    // end-to-end key equals plain GROUP BY/HAVING at sf0.001
    val got = SparkEntry.queries("agg_heavy_hitters")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = graft.T(spark, sf001, "events").groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
      .crossJoin(graft.T(spark, sf001, "events").agg(count(lit(1)).as("t")))
      .filter($"n" * 10 > $"t").select($"event_type", $"n")
      .orderBy($"event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("trend forecast: integer-moment OLS matches Spark's regr_slope/intercept within 1e-9") {
    val got = SparkEntry.queries("evt_trend_forecast")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val builtin = graft.T(spark, sf001, "events")
      .groupBy($"event_type", expr("unix_date(to_date(ts))").cast("long").as("dayn"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"event_type")
      .agg(expr("regr_slope(cnt, dayn)").as("s"),
        expr("regr_intercept(cnt, dayn)").as("i"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(builtin.nonEmpty)
    builtin.foreach { case (t, (s, i)) =>
      assert(math.abs(got(t)._1 - s) < 1e-9, s"$t slope: ${got(t)._1} vs $s")
      assert(math.abs(got(t)._2 - i) < 1e-6 * math.max(1.0, i.abs),
        s"$t intercept: ${got(t)._2} vs $i")
    }
  }

  test("top paths: the rn cap bounds every path at 8 steps") {
    val paths = SparkEntry.queries("evt_top_paths")(spark, sf001)
      .collect().map(_.getString(0))
    assert(paths.nonEmpty)
    paths.foreach { p =>
      assert(p.split(">").length <= 8, s"path longer than the 8-step cap: $p")
    }
  }

  test("streaming misra-gries: guaranteed candidate survives >k types with decrements") {
    // One day, 20 distinct types (> k=9) so decrements DO fire; 'hot' has
    // freq 4000 > n/10 = 955 — MG guarantees it survives and its counter
    // undercounts by at most n/(k+1) = 955, so the n*10 > total emission
    // threshold still passes (4000 - 955 = 3045 > 955).
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    def ev(id: Long, typ: String) =
      graft.streaming.StreamOps.Event(id, base, 1000L + id % 50, typ, 0.0)
    val events = (0 until 4000).map(i => ev(i, "hot")) ++
      (0 until 5550).map(i => ev(10000 + i, s"cold_${i % 19}"))
    val mem = MemoryStream[graft.streaming.StreamOps.Event]
    val q = graft.streaming.StreamOps.heavyHitterStream(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("t_mg_adv").start()
    try {
      events.grouped(2000).foreach { c => mem.addData(c); q.processAllAvailable() }
      val far = new java.sql.Timestamp(base.getTime + 40L * 24 * 3600 * 1000)
      mem.addData(Seq(ev(99991, "view").copy(ts = far)))
      q.processAllAvailable()
      mem.addData(Seq(ev(99992, "view").copy(ts = new java.sql.Timestamp(far.getTime + 1000))))
      q.processAllAvailable()
      val hot = spark.table("t_mg_adv")
        .filter($"event_type" === "hot").collect()
      assert(hot.length == 1, "guaranteed heavy hitter not emitted")
      val n = hot.head.getLong(2)
      // MG lower bound: true freq minus at most n_total/(k+1)
      assert(n <= 4000 && n >= 4000 - 9550 / 10, s"counter estimate $n out of MG bounds")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("hll sketch union: two-level merge == single-level sketch, near exact") {
    // Lossless merge property: union of daily sketches must equal one
    // sketch over all rows — same registers, same estimate, bit-equal.
    val twoLevel = SparkEntry.queries("agg_hll_sketch_union")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneLevel = graft.T(spark, sf001, "events").groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(twoLevel == oneLevel, "sketch merge must be lossless")
    val exact = graft.T(spark, sf001, "events").groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      assert(math.abs(twoLevel(t) - n) <= math.max(2.0, 0.05 * n),
        s"$t: sketch ${twoLevel(t)} vs exact $n")
    }
  }

  test("z-score flags agree with Spark's built-in population stddev") {
    val e = graft.T(spark, sf001, "events")
      .select($"event_id", $"event_type",
        floor($"value" * 10000).cast("long").as("vq"))
    val stats = e.groupBy($"event_type")
      .agg(avg($"vq").as("mu"), stddev_pop($"vq").as("sd"))
    val expected = e.join(stats, "event_type")
      .filter(abs(($"vq" - $"mu") / $"sd") > 3)
      .select($"event_id").collect().map(_.getLong(0)).toSet
    val got = SparkEntry.queries("evt_anomaly_zscore")(spark, sf001)
      .select($"event_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("SCD-2 intervals: contiguous versions, touching bounds, real changes") {
    val rows = SparkEntry.queries("evt_scd2_state")(spark, sf001)
      .select($"user_id", $"version", $"state", $"valid_from_us",
        $"valid_to_us", $"n_events", $"is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5),
        r.getBoolean(6)))
      .groupBy(_._1)
    val eventCounts = graft.T(spark, sf001, "events")
      .groupBy($"user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (user, ivs) =>
      val s = ivs.sortBy(_._2)
      // versions are exactly 1..k
      assert(s.map(_._2).toSeq == (1L to s.length).toSeq, s"user $user versions")
      s.sliding(2).foreach {
        case Array(a, b) =>
          // intervals touch: prev valid_to == next valid_from
          assert(a._5.contains(b._4), s"user $user gap at v${a._2}")
          // a new island means the state actually changed
          assert(a._3 != b._3, s"user $user no-op change at v${a._2}")
        case _ => ()
      }
      // exactly the LAST interval is current/open
      assert(s.init.forall(iv => !iv._7 && iv._5.nonEmpty) &&
        s.last._7 && s.last._5.isEmpty, s"user $user current flags")
      // island sizes partition the user's events
      assert(s.map(_._6).sum == eventCounts(user), s"user $user n_events")
    }
  }

  test("line dedup: agg-based first-occurrence == window formulation, and rewrite invariants") {
    // The registered key computes "first instance of each line" as a
    // min(struct) hash agg (skew-immune); re-derive the same result with
    // the straightforward row_number-over-hash window and compare frames.
    val lines = T(spark, sf001, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, greatest(cast(ceil(size(toks) / 8.0) as int), 1)), " +
          "i -> concat_ws(' ', slice(toks, (i - 1) * 8 + 1, 8)))")))
      .withColumnRenamed("pos", "line_no").withColumnRenamed("col", "line")
    val byWindow = lines
      .withColumn("rn", row_number().over(
        Window.partitionBy(md5(col("line"))).orderBy(col("doc_id"), col("line_no"))))
      .filter(col("rn") === 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_lines"),
        collect_list(struct(col("line_no"), col("line"))).as("ls"))
      .select(col("doc_id"), col("kept_lines"),
        md5(expr("array_join(transform(array_sort(ls), x -> x.line), ' ')"))
          .as("clean_sig"))
    val key = SparkEntry.queries("llm_line_dedup")(spark, sf001)
    val mismatch = key.join(byWindow, Seq("doc_id"))
      .filter(key("kept_lines") =!= byWindow("kept_lines") ||
        key("clean_sig") =!= byWindow("clean_sig"))
    assert(mismatch.count() == 0, "agg-based dedup != window-based dedup")
    // rewrite invariants: kept <= total everywhere; a doc with zero dup
    // lines reassembles to its ORIGINAL text (split/rejoin fixed point)
    assert(key.filter(col("kept_lines") > col("total_lines")).count() == 0)
    val orig = T(spark, sf001, "documents")
      .select(col("doc_id"), md5(col("text")).as("orig_sig"))
    val undupped = key.filter(col("kept_lines") === col("total_lines"))
      .join(orig, "doc_id")
    assert(undupped.limit(1).count() == 1, "fixture has no dup-free doc")
    assert(undupped.filter(col("clean_sig") =!= col("orig_sig")).count() == 0,
      "dup-free doc did not reassemble to its original text")
  }

  test("metrics rates: zero-filled gaps pull the EWMA down but not to zero") {
    val df = SparkEntry.queries("evt_metrics_rates")(spark, sf001).cache()
    try {
      // grid fill produced silent minutes, and the EWMA carries momentum
      // through them (rate_1m = 0 but ewma > 0 right after activity)
      assert(df.filter(col("rate_1m") === 0 && col("ewma_rate") > 0)
        .limit(1).count() == 1, "no gap minute with EWMA momentum found")
      // per-row algebra: 31*ewma == 16x0+8x1+4x2+2x3+x4 and 5*rate_5m ==
      // sum of the same taps — verified via self-lags over the emitted grid
      val w = Window.partitionBy(col("event_type")).orderBy(col("m"))
      def l(k: Int) = lag(col("rate_1m"), k, 0).over(w)
      val bad = df
        .withColumn("num16", col("rate_1m") * 16 + l(1) * 8 + l(2) * 4 + l(3) * 2 + l(4))
        .withColumn("sum5", col("rate_1m") + l(1) + l(2) + l(3) + l(4))
        // compare via the SAME division (bit-identical recomputation);
        // multiplying the rounded quotient back would reintroduce a ulp
        .filter(col("ewma_rate") =!= col("num16").cast("double") / 31.0 ||
          col("rate_5m") =!= col("sum5").cast("double") / 5.0)
      assert(bad.count() == 0, "metrics algebra violated on emitted grid")
    } finally df.unpersist()
  }

  test("epochDay/epochMinute floor like date_trunc, both sides of the epoch") {
    import graft.streaming.StreamOps.{epochDay, epochMinute}
    // exhaustive boundary sweep: ±2 days of µs around zero plus random
    // far offsets — truncating division would round the negative half
    // toward zero and shift every pre-1970 bucket by one
    val probes = Seq(-2L, -1L, 0L, 1L, 2L).flatMap(d =>
      Seq(-1L, 0L, 1L).map(eps => d * 86400000000L + eps)) ++
      Seq(-123456789012345L, 98765432109876L)
    probes.foreach { us =>
      val expectDay = Math.floorDiv(us, 86400000000L)
      val expectMin = Math.floorDiv(us, 60000000L)
      assert(epochDay(us) == expectDay, s"epochDay($us)")
      assert(epochMinute(us) == expectMin, s"epochMinute($us)")
      // and the helper agrees with Spark's own date_trunc day arithmetic
    }
    val df = spark.sql(
      "SELECT unix_micros(date_trunc('DAY', ts)) div 86400000000 AS d, " +
        "unix_micros(ts) AS us FROM VALUES " +
        "(TIMESTAMP '1969-12-31 23:59:59.999999'), " +
        "(TIMESTAMP '1970-01-01 00:00:00'), " +
        "(TIMESTAMP '1969-07-20 20:17:40'), " +
        "(TIMESTAMP '2024-02-29 12:00:00') AS t(ts)")
    df.collect().foreach { r =>
      assert(epochDay(r.getLong(1)) == r.getLong(0),
        s"epochDay diverges from date_trunc at us=${r.getLong(1)}")
    }
  }

  test("cdc apply: tombstone retention — an older changelog row cannot resurrect a delete") {
    import org.apache.spark.sql.functions._
    // user 7: base partition's LATEST op is a delete (event_id 8, %3!=0);
    // the changelog carries an OLDER update (event_id 3, %3==0). A
    // snapshot that compacted away its tombstone would resurrect user 7
    // with the stale row; the key must keep them deleted. user 9 is a
    // plain alive control.
    val rows = Seq(
      (3L, ts("2024-01-01 10:00:00"), 7L, "view", 1.0), // older U, %3==0
      (8L, ts("2024-01-01 11:00:00"), 7L, "error", 0.0), // newest: D, %3!=0
      (4L, ts("2024-01-01 09:00:00"), 9L, "view", 2.0),
      (6L, ts("2024-01-01 12:00:00"), 9L, "purchase", 5.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("evt_cdc_apply")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!out.contains(7L), s"tombstoned user resurrected: $out")
    assert(out.get(9L).contains(6L), s"alive user lost or stale: $out")
  }

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
}
